"""Parity-packed Pallas kernel: compute only the active checkerboard half.

SUPERSEDED: measured SLOWER than the masked VMEM kernel on v5e (the sweep
is VMEM-bandwidth-bound there, not transcendental-bound — see
docs/BENCH_NOTES.md); :mod:`pallas_sweep` is production. Kept as a tested
variant for exp-bound hardware generations.

The masked VMEM kernel (:mod:`epic_tpu.solver.pallas_sweep`) evaluates the
logsumexp for *every* cell and throws half away with the parity mask — the
sweep is transcendental-bound, so that's a 2x waste. This kernel stores the
two parity classes separately:

    R[i, j] = u[i, 2j + (i % 2)]        # cells with (y + x) even
    B[i, j] = u[i, 2j + 1 - (i % 2)]    # cells with (y + x) odd

With this layout (derived from the row-major checkerboard):
  - the north/south neighbours of a B cell are R[i-1, j] and R[i+1, j]
    (same packed column!), and symmetrically for R cells;
  - west/east neighbours are a row-parity-selected single-lane shift:
    for B: west = R[i, j] (even rows) / R[i, j-1] (odd rows),
           east = R[i, j+1] (even rows) / R[i, j] (odd rows);
    for R the selects are mirrored.

One reference iteration updates one parity class (harmonic_cpu.cpp:46-51),
so a K-sweep chunk alternates B/R updates starting from the parity selected
by ``iteration``; each update runs the max-shifted logsumexp on a [H, W/2]
array — half the transcendentals and half the delta/select traffic of the
masked kernel. Numerics are unchanged; results match the oracle exactly like
the masked kernel does (same op order per cell).
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

_LOG2N_2D = np.float32(np.log(np.float64(4.0)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack(arr: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split [H, W] (W even) into parity-packed (R, B) of [H, W/2]."""
    h, w = arr.shape
    even_rows = (jnp.arange(h) % 2 == 0)[:, None]
    a0 = arr[:, 0::2]  # columns 0, 2, 4, ...
    a1 = arr[:, 1::2]  # columns 1, 3, 5, ...
    r = jnp.where(even_rows, a0, a1)
    b = jnp.where(even_rows, a1, a0)
    return r, b


def unpack(r: jax.Array, b: jax.Array) -> jax.Array:
    """Inverse of :func:`pack`."""
    h, half = r.shape
    even_rows = (jnp.arange(h) % 2 == 0)[:, None]
    a0 = jnp.where(even_rows, r, b)
    a1 = jnp.where(even_rows, b, r)
    out = jnp.zeros((h, 2 * half), r.dtype)
    out = out.at[:, 0::2].set(a0)
    out = out.at[:, 1::2].set(a1)
    return out


def _neighbor_update(tgt, src, row_even, half, h, log_update):
    """Logsumexp update of the target parity plane from the source plane.

    row_even: bool[H, 1] broadcast mask of even rows.
    log_update selects which lane-shift orientation applies (True when the
    target is the odd-parity plane B; False for R, where the selects mirror).
    """
    north = pltpu.roll(src, 1, 0)
    south = pltpu.roll(src, h - 1, 0)
    left = pltpu.roll(src, 1, 1)       # src[i, j-1]
    right = pltpu.roll(src, half - 1, 1)  # src[i, j+1]
    if log_update:
        # Updating B: west = src (even rows) / src[j-1] (odd rows);
        #             east = src[j+1] (even rows) / src (odd rows).
        west = jnp.where(row_even, src, left)
        east = jnp.where(row_even, right, src)
    else:
        # Updating R: mirrored selects.
        west = jnp.where(row_even, left, src)
        east = jnp.where(row_even, src, right)
    m = jnp.maximum(jnp.maximum(north, south), jnp.maximum(west, east))
    s = (
        (jnp.exp(north - m) + jnp.exp(south - m)) + jnp.exp(west - m)
    ) + jnp.exp(east - m)
    return (m + jnp.log(s)) - _LOG2N_2D


def _packed_kernel(
    r_ref, b_ref, rf_ref, bf_ref, r_out, b_out, delta_ref,
    *, num_sweeps, start_parity
):
    """Straight-line kernel: the sweep schedule (which plane updates when) is
    compiled in via the static ``start_parity`` — no per-sweep lax.cond,
    which Mosaic executes poorly. Iteration t updates parity (1 - t%2): the
    B plane when t is even, R when odd (SURVEY §0 derivation)."""
    r = r_ref[:]
    b = b_ref[:]
    h, half = r.shape
    r_open = rf_ref[:] == 0
    b_open = bf_ref[:] == 0
    row_even = (
        jax.lax.broadcasted_iota(jnp.int32, (h, half), 0) % 2
    ) == 0

    def sweep_b(r, b):
        val = _neighbor_update(b, r, row_even, half, h, True)
        b_new = jnp.where(b_open, val, b)
        return r, b_new, jnp.max(jnp.abs(b_new - b))

    def sweep_r(r, b):
        val = _neighbor_update(r, b, row_even, half, h, False)
        r_new = jnp.where(r_open, val, r)
        return r_new, b, jnp.max(jnp.abs(r_new - r))

    first_sweep = sweep_b if start_parity == 0 else sweep_r
    second_sweep = sweep_r if start_parity == 0 else sweep_b

    # First sweep carries the staggered-check delta.
    r, b, delta = first_sweep(r, b)

    n_rest = num_sweeps - 1
    def body(k, carry):
        r, b = carry
        r, b, _ = second_sweep(r, b)
        r, b, _ = first_sweep(r, b)
        return r, b

    r, b = jax.lax.fori_loop(0, n_rest // 2, body, (r, b))
    if n_rest % 2:
        r, b, _ = second_sweep(r, b)

    r_out[:] = r
    b_out[:] = b
    delta_ref[0] = delta


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "start_parity", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_chunk_packed(
    r: jax.Array,
    b: jax.Array,
    r_frozen: jax.Array,
    b_frozen: jax.Array,
    num_sweeps: int,
    start_parity: int = 0,
    interpret: bool = False,
):
    """num_sweeps red-black sweeps on parity-packed planes.

    start_parity = iteration % 2 at chunk entry (STATIC: the sweep schedule
    is compiled in — in the reference protocol chunks always start at
    multiples of the stagger, i.e. parity 0). Returns
    (r, b, delta_of_first_sweep)."""
    h, half = r.shape
    out_r, out_b, out_delta = pl.pallas_call(
        functools.partial(
            _packed_kernel, num_sweeps=num_sweeps, start_parity=start_parity
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, half), jnp.float32),
            jax.ShapeDtypeStruct((h, half), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(r, b, r_frozen, b_frozen)
    return out_r, out_b, out_delta[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedGrid:
    r: jax.Array
    b: jax.Array
    r_frozen: jax.Array
    b_frozen: jax.Array
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))


def pack_state(state: GridState) -> PackedGrid:
    """Pad to (8k, 256m) and parity-pack u + frozen masks.

    The lane (packed-column) dimension is W/2, so W pads to a multiple of
    256 to keep packed planes lane-aligned at 128.
    """
    h, w = state.u.shape
    hp = _round_up(h, 8)
    wp = _round_up(w, 256)
    u = jnp.pad(
        state.u,
        ((0, hp - h), (0, wp - w)),
        constant_values=np.float32(C.LOG_SPACE_OBSTACLE),
    )
    interior = np.zeros((hp, wp), dtype=bool)
    interior[1 : h - 1, 1 : w - 1] = True
    frozen = jnp.pad(state.locked, ((0, hp - h), (0, wp - w)), constant_values=True)
    # int32 mask planes: Mosaic on v5e rejects int8 vector comparisons
    # ("Target does not support this comparison"), int32 compares are fine.
    frozen = (frozen | jnp.asarray(~interior)).astype(jnp.int32)
    r, b = pack(u)
    rf, bf = pack(frozen)
    return PackedGrid(r=r, b=b, r_frozen=rf, b_frozen=bf, height=h, width=w)


def unpack_state(packed: PackedGrid, state: GridState, r, b) -> jax.Array:
    return unpack(r, b)[: packed.height, : packed.width]


def update_n(state: GridState, num_steps: int, interpret: bool | None = None) -> GridState:
    """Anytime chunk on the packed path; semantics of core.update_n.

    Reads iteration parity to the host (one scalar; the reference paid a
    4-byte D2H per staggered check, harmonic_gpu.cu:402) so the sweep
    schedule compiles statically."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = pack_state(state)
    start_parity = int(state.iteration) % 2
    r, b, delta = sweep_chunk_packed(
        p.r, p.b, p.r_frozen, p.b_frozen, num_steps, start_parity, interpret
    )
    u = unpack(r, b)[: p.height, : p.width]
    return dataclasses.replace(
        state,
        u=u,
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )
