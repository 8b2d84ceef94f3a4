"""Pallas TPU kernel: VMEM-resident multi-sweep red-black relaxation in 3D.

The reference implements its 3D solver on CPU only — harmonic_update_3d_cpu
(/root/reference/libepic/src/harmonic/harmonic_cpu.cpp:81-133); its CUDA path
is 2D-only (harmonic_gpu.cu:158-165 returns 0 blocks otherwise). This module
takes the 3D variant onto the TPU: the same VMEM-resident K-sweep design as
:mod:`epic_tpu.solver.pallas_sweep`, extended to the 6-neighbour logsumexp
stencil over ``f32[D, H, W]`` volumes.

Design notes (vs the 2D kernel):

- The volume is flattened to a rank-2 ``[D*Hp, Wp]`` array inside the
  kernel (slabs of ``Hp`` rows per depth plane). All six neighbours are
  then rank-2 ``pltpu.roll``s — x±1 are lane rolls, y±1 are row rolls by
  ±1, z±1 are row rolls by ±Hp — the exact shift pattern the 2D kernel
  proved fast (~110 G cell-visits/s). A first rank-3 variant (slice+concat
  on an untiled major axis) compiled under Mosaic but ran 30x slower
  (tools/tpu_probe13.py); the flattened layout removes every whole-volume
  copy from the sweep body.
- Row rolls that cross slab boundaries deliver garbage (the y=0 row reads
  the previous slab's last row; z=0 reads the wrap-around slab) — but every
  such destination is a frozen face/padding cell, so the ``where`` mask
  discards it, the same trick the 2D kernel uses to avoid interior slicing.
- Parity is ``(z + y + x) % 2`` with ``z = r // Hp``, ``y = r - z*Hp``
  derived from row/lane iotas; iteration t updates the class ``== t % 2``
  (the reference's x1-even offset negation flips the 2D convention,
  harmonic_cpu.cpp:89-100; see reference_np.sweep_3d).

Update numerics are pinned to :func:`epic_tpu.solver.reference_np.sweep_3d`:
max tree then left-associated exp sum over the neighbour order
(z-, z+, y-, y+, x-, x+), log, subtract log(6).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..grid import GridState
from ._padding import box_mask
from ._sweep_body import lse6


# Same scoped-VMEM model as the 2D kernel (~20 MB per 1M cells, measured in
# round 2); the volume + frozen mask + stencil temporaries must stay resident.
VMEM_CELL_BUDGET = 2_000_000
_VMEM_LIMIT = 128 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_vmem(shape: tuple[int, int, int]) -> bool:
    d, h, w = shape
    return d * _round_up(h, 8) * _round_up(w, 128) <= VMEM_CELL_BUDGET


def make_sweep3d_fn(u0, not_frozen, t0, hp: int):
    """The 6-neighbour red-black logsumexp sweep over a VMEM-resident volume
    flattened to ``[D*Hp, Wp]`` (``hp`` rows per depth slab)."""
    r, w = u0.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    zz = rr // hp
    yy = rr - zz * hp
    parity = (zz + yy + xx) % 2

    def sweep(u, k):
        # Neighbour order matches reference_np.sweep_3d (z-, z+, y-, y+, x-, x+)
        # so the max tree and exp-sum association are bit-identical.
        val = lse6(u, r, w, hp)
        # 3D updates the class == t%2 (the x1-even offset negation flips the
        # 2D convention, harmonic_cpu.cpp:96-99; reference_np.sweep_3d).
        update = (parity != ((t0 + k + 1) % 2)) & not_frozen
        return jnp.where(update, val, u)

    return sweep


def _multisweep3d_kernel(
    it_ref, u_ref, frozen_ref, u_out_ref, delta_ref, *, num_sweeps, hp
):
    """K sweeps over a VMEM-resident flattened volume; delta from sweep 0."""
    t0 = it_ref[0]
    u0 = u_ref[:]
    sweep = make_sweep3d_fn(u0, jnp.logical_not(frozen_ref[:]), t0, hp)

    u = sweep(u0, 0)
    delta = jnp.max(jnp.abs(u - u0))

    def body(k, u):
        return sweep(u, k + 1)

    u = jax.lax.fori_loop(0, num_sweeps - 1, body, u)
    u_out_ref[:] = u
    delta_ref[0] = delta


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "hp", "interpret"), donate_argnums=(0,)
)
def sweep3d_chunk_flat(
    u2: jax.Array,
    frozen2: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    hp: int,
    interpret: bool = False,
):
    """Run ``num_sweeps`` 3D sweeps on a FLAT padded volume ``[D*Hp, Wp]``
    (``hp`` rows per depth slab). The flat form is the production loop body:
    keeping reshapes out of the solve/anytime loops is worth ~1.6x
    (tools/tpu_probe14/15).

    Returns (u_new, delta_of_first_sweep)."""
    r, w = u2.shape
    out_u, out_delta = pl.pallas_call(
        functools.partial(_multisweep3d_kernel, num_sweeps=num_sweeps, hp=hp),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(iteration.reshape(1), u2, frozen2)
    return out_u, out_delta[0]


def sweep3d_chunk(
    u: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    interpret: bool = False,
):
    """Run ``num_sweeps`` 3D red-black sweeps on a padded volume.

    Args:
      u: f32[D, H, W], H % 8 == 0, W % 128 == 0 (use :func:`pad_state`).
      frozen: bool[D, H, W]; True where a cell must never update.
      iteration: i32 scalar, ``currentIteration`` at entry.
      num_sweeps: chunk length (static).
      interpret: run in interpreter mode (CPU testing).

    Returns (u_new, delta_of_first_sweep). Convenience 3D-shaped wrapper over
    :func:`sweep3d_chunk_flat`; loops should use the flat form directly.
    """
    d, h, w = u.shape
    out_u, delta = sweep3d_chunk_flat(
        u.reshape(d * h, w),
        frozen.reshape(d * h, w),
        iteration,
        num_sweeps,
        h,
        interpret,
    )
    return out_u.reshape(d, h, w), delta


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedVolume:
    """Tile-aligned view of a 3D GridState for the Pallas solver.

    ``frozen`` = locked | outside-original-interior | padding, carrying the
    reference's interior-only update semantics (harmonic_cpu.cpp:85-88)
    entirely in the mask.
    """

    u: jax.Array        # f32[D, Hp, Wp]
    frozen: jax.Array   # bool[D, Hp, Wp]
    depth: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))


@functools.partial(jax.jit, static_argnames=("d", "h", "w", "hp", "wp"))
def _pad_arrays(u, locked, d: int, h: int, w: int, hp: int, wp: int):
    # One device program: no host interior-mask upload, XLA-managed
    # transients (see solver/_padding.py).
    up = jnp.pad(u, ((0, 0), (0, hp - h), (0, wp - w)),
                 constant_values=np.float32(C.LOG_SPACE_OBSTACLE))
    frozen = jnp.pad(locked, ((0, 0), (0, hp - h), (0, wp - w)),
                     constant_values=True)
    frozen = frozen | ~box_mask((d, hp, wp), (1, 1, 1), (d - 1, h - 1, w - 1))
    return up, frozen


def pad_state(state: GridState) -> PaddedVolume:
    d, h, w = state.u.shape
    hp, wp = _round_up(h, 8), _round_up(w, 128)
    u, frozen = _pad_arrays(state.u, state.locked, d, h, w, hp, wp)
    return PaddedVolume(u=u, frozen=frozen, depth=d, height=h, width=w)


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _check_shape(state: GridState, interpret: bool) -> None:
    if state.u.ndim != 3:
        raise ValueError(f"pallas_sweep3d requires a 3D grid, got {state.u.ndim}D")
    if not interpret and not fits_vmem(state.u.shape):
        raise ValueError(
            f"volume {state.u.shape} exceeds the VMEM-resident budget; use "
            "solver.core (XLA) for big volumes"
        )


def update_n(state: GridState, num_steps: int, interpret: bool | None = None) -> GridState:
    """Anytime chunk stepper on the 3D Pallas path; semantics identical to
    :func:`epic_tpu.solver.core.update_n` (delta from the first sweep)."""
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    if interpret is None:
        interpret = _is_cpu()
    _check_shape(state, interpret)
    padded = pad_state(state)
    d, hp, wp = padded.u.shape
    u, delta = sweep3d_chunk_flat(
        padded.u.reshape(d * hp, wp),
        padded.frozen.reshape(d * hp, wp),
        state.iteration,
        num_steps,
        hp,
        interpret,
    )
    u = u.reshape(d, hp, wp)
    return dataclasses.replace(
        state,
        u=u[:, : padded.height, : padded.width],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "interpret", "m_max", "hp"),
    donate_argnums=(0,),
)
def _solve_padded(u, frozen, epsilon, stagger, max_iterations, interpret, m_max, hp):
    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        u, delta = sweep3d_chunk_flat(u, frozen, iteration, 1, hp, interpret)
        iteration = iteration + 1
        done = (delta < epsilon) & (iteration >= m_max)

        def run_rest(args):
            u, iteration = args
            u, _ = sweep3d_chunk_flat(u, frozen, iteration, stagger - 1, hp, interpret)
            return u, iteration + (stagger - 1)

        u, iteration = jax.lax.cond(done, lambda a: a, run_rest, (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


def solve(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    interpret: bool | None = None,
) -> GridState:
    """Relax a 3D volume to convergence on the Pallas path; protocol identical
    to :func:`epic_tpu.solver.core.solve` / harmonic_complete_cpu: exit only
    right after a staggered check with delta < eps and ``iter >= max(shape)``.
    """
    if interpret is None:
        interpret = _is_cpu()
    _check_shape(state, interpret)
    padded = pad_state(state)
    d, hp, wp = padded.u.shape
    u, iteration, delta, converged = _solve_padded(
        padded.u.reshape(d * hp, wp),
        padded.frozen.reshape(d * hp, wp),
        state.epsilon,
        stagger,
        max_iterations,
        interpret,
        max(state.u.shape),
        hp,
    )
    u = u.reshape(d, hp, wp)
    return dataclasses.replace(
        state,
        u=u[:, : padded.height, : padded.width],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )
