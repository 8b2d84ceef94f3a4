"""Batched-scenario Pallas kernel: thousands of solves per chip.

BASELINE config 3 asks for 4096 (map, goal-set) solves per chip. The vmapped
XLA path (:mod:`epic_tpu.solver.batched`) materializes per-sweep
intermediates through HBM and lands far from the bandwidth roofline. This
kernel blocks the lane dimension into VMEM and runs K sweeps per HBM round
trip, exactly like the single-map VMEM kernel but over a [LB, H, W] brick:

- grid over lane blocks; each program holds LB maps resident in VMEM for
  the whole K-sweep chunk (HBM traffic 1/K of a per-sweep implementation);
- per-lane delta of the chunk's first sweep (the staggered check) reduces
  over the map axes only, written as a [LB] block;
- lane retirement is expressed through the frozen mask: a retired lane's
  frozen plane is all-True, so it stops changing — the host-side lockstep
  solve (solve_batch) retires lanes by editing the mask between chunks,
  keeping per-lane reference-exact iteration counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

_LOG2N_2D = np.float32(np.log(np.float64(4.0)))


def _batched_kernel(it_ref, u_ref, frozen_ref, u_out, delta_ref, *, num_sweeps):
    t0 = it_ref[0]
    u0 = u_ref[:]
    lb, h, w = u0.shape
    not_frozen = frozen_ref[:] == 0
    row = jax.lax.broadcasted_iota(jnp.int32, (lb, h, w), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (lb, h, w), 2)
    parity = (row + col) % 2

    def sweep(u, k):
        un = pltpu.roll(u, 1, 1)
        us = pltpu.roll(u, h - 1, 1)
        uw = pltpu.roll(u, 1, 2)
        ue = pltpu.roll(u, w - 1, 2)
        m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
        s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
        val = (m + jnp.log(s)) - _LOG2N_2D
        update = (parity != ((t0 + k) % 2)) & not_frozen
        return jnp.where(update, val, u)

    u = sweep(u0, 0)
    # Rank-1 VMEM outputs need 128-multiple blocks; broadcast the per-lane
    # delta across a 128-lane row instead (caller reads column 0).
    d = jnp.max(jnp.abs(u - u0), axis=(1, 2))
    delta_ref[:] = jnp.broadcast_to(d[:, None], (lb, 128))

    def body(k, u):
        return sweep(u, k + 1)

    u = jax.lax.fori_loop(0, num_sweeps - 1, body, u)
    u_out[:] = u


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "lane_block", "interpret"),
    donate_argnums=(0,),
)
def sweep_chunk_batch(
    u: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    lane_block: int = 32,
    interpret: bool = False,
):
    """K sweeps over a [B, Hp, Wp] batch (B % lane_block == 0, Hp % 8 == 0,
    Wp % 128 == 0; use :func:`pad_batch`). frozen: int32 [B, Hp, Wp].

    Returns (u, delta[B]) with delta from the first sweep per lane."""
    b, h, w = u.shape
    assert b % lane_block == 0, (b, lane_block)
    out_u, out_delta = pl.pallas_call(
        functools.partial(_batched_kernel, num_sweeps=num_sweeps),
        grid=(b // lane_block,),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lane_block, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lane_block, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((lane_block, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lane_block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(iteration.reshape(1), u, frozen)
    return out_u, out_delta[:, 0]


def pad_batch(u: np.ndarray, locked: np.ndarray, lane_block: int = 32):
    """Pad a [B, H, W] batch to kernel alignment; returns (u, frozen, B, H, W).

    frozen covers locked cells, the per-map boundary ring, alignment
    padding, and whole padded lanes."""
    b, h, w = u.shape
    bp = -(-b // lane_block) * lane_block
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    u_p = np.full((bp, hp, wp), np.float32(C.LOG_SPACE_OBSTACLE), np.float32)
    u_p[:b, :h, :w] = u
    # Start from all-frozen, then open each lane's unlocked interior cells.
    frozen = np.ones((bp, hp, wp), dtype=np.int32)
    interior = np.zeros((h, w), dtype=bool)
    interior[1:-1, 1:-1] = True
    frozen[:b, :h, :w] = np.where(
        interior[None], np.asarray(locked).astype(np.int32), 1
    )
    return (
        jnp.asarray(u_p),
        jnp.asarray(frozen),
        b,
        h,
        w,
    )


def solve_batch(
    u: np.ndarray | jax.Array,
    locked: np.ndarray | jax.Array,
    epsilon: float = C.DEFAULT_EPSILON,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    lane_block: int = 32,
    interpret: bool | None = None,
):
    """Lockstep solve of B scenarios on the batched Pallas kernel.

    Per-lane exactness as :func:`epic_tpu.solver.batched.solve_batch`: a lane
    retires (its frozen plane set all-True) the moment its staggered check
    satisfies delta < eps and iter + 1 >= max(H, W); chunks are
    host-orchestrated (one device call per stagger window).

    Returns (u[B, H, W] np.float32, iterations[B], deltas[B], converged[B]).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u = np.asarray(u, np.float32)
    locked_np = np.asarray(locked).astype(bool)
    b, h, w = u.shape
    u_d, frozen, _, _, _ = pad_batch(u, locked_np, lane_block)
    bp = u_d.shape[0]
    m_max = max(h, w)

    iters = np.zeros(bp, np.int64)
    deltas = np.full(bp, epsilon + 1.0, np.float32)
    retired = np.zeros(bp, bool)
    retired[b:] = True
    t = 0
    frozen_host = np.array(frozen)  # writable copy (lane retirement edits)
    while not retired.all() and t < max_iterations:
        # One check sweep.
        u_d, d = sweep_chunk_batch(
            u_d, jnp.asarray(frozen_host), jnp.int32(t), 1, lane_block, interpret
        )
        d = np.asarray(d)
        active = ~retired
        deltas[active] = d[active]
        t += 1
        iters[active] = t
        just_done = active & (d < epsilon) & (t >= m_max)
        if just_done.any():
            retired |= just_done
            frozen_host[just_done] = 1
        if retired.all():
            break
        # stagger - 1 plain sweeps.
        u_d, _ = sweep_chunk_batch(
            u_d, jnp.asarray(frozen_host), jnp.int32(t), stagger - 1,
            lane_block, interpret,
        )
        active = ~retired
        iters[active] = t + stagger - 1
        t += stagger - 1
    u_out = np.asarray(u_d)[:b, :h, :w]
    return u_out, iters[:b].astype(np.int32), deltas[:b], retired[:b]
