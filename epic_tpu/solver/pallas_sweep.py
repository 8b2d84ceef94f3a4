"""Pallas TPU kernel: VMEM-resident multi-sweep red-black relaxation.

This replaces the reference's CUDA stencil kernels
(/root/reference/libepic/src/harmonic/harmonic_gpu.cu:39-153) with a
TPU-native design. The CUDA version launches one kernel per iteration (one
block per row, threads striding the columns) and runs a two-stage shared-mem
delta reduction with a 4-byte D2H copy per staggered check
(harmonic_gpu.cu:266-290,402). Here:

- A whole *chunk* of K sweeps runs inside one kernel invocation with ``u``
  resident in VMEM: HBM traffic and kernel-dispatch overhead are both
  amortized K-fold. Applies to grids up to ~450k cells (maze, umass,
  c_space, small_maze classes) — the kernel holds ~8 grid-sized f32
  temporaries against ~16 MB of VMEM; bigger grids use the XLA or tiled
  paths (see fits_vmem).
- The delta max-reduction is a VPU ``jnp.max`` over the updated cells of the
  chunk's first sweep, written to SMEM — no shared-memory tree, no D2H copy;
  the solve loop reads it device-side.
- The checkerboard parity mask is generated on the fly with
  ``broadcasted_iota`` (zero memory traffic), not stored.

The update numerics are pinned to the oracle
(:mod:`epic_tpu.solver.reference_np`): max tree over ((N,S),(W,E)),
left-associated exp sum, log, subtract log(4) — see harmonic_cpu.cpp:59-70.

Grids larger than VMEM fall back to :mod:`epic_tpu.solver.core` (XLA); a
tiled halo-exchange kernel and the multi-chip path live in
:mod:`epic_tpu.parallel`.
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
from ._sweep_body import lse4


# VMEM budget: Mosaic's scoped-VMEM footprint for the whole-array kernel is
# ~20 MB per 1M cells (measured via scoped-vmem OOM sizes, round-2 probes).
# The kernel raises vmem_limit_bytes past the 16 MB default (v5e's physical
# VMEM is far larger), so grids up to ~2M cells stay on the fastest
# VMEM-resident path (~50 G cell-updates/s, tools/tpu_probe5.py); bigger
# grids use solver.pallas_biggrid.
VMEM_CELL_BUDGET = 2_000_000
_VMEM_LIMIT = 128 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_vmem(shape: tuple[int, int]) -> bool:
    h, w = shape
    return _round_up(h, 8) * _round_up(w, 128) <= VMEM_CELL_BUDGET


def make_sweep_fn(u0, not_frozen, t0):
    """The red-black logsumexp sweep as a closure over a VMEM-resident grid.

    Works on the full (padded) grid with circular shifts: wrapped-around
    neighbour values at the edges are garbage, but every edge/padding cell is
    frozen (never updated), so they are masked out — mirroring how the
    reference only touches interior cells (harmonic_cpu.cpp:46-51). This
    avoids interior slicing, which Mosaic cannot lower efficiently. Shared by
    the single-grid and batched-collage kernels.
    """
    h, w = u0.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    parity = (row + col) % 2

    def sweep(u, k):
        val = lse4(u, h, w)
        update = (parity != ((t0 + k) % 2)) & not_frozen
        return jnp.where(update, val, u)

    return sweep


def _multisweep_kernel(it_ref, u_ref, frozen_ref, u_out_ref, delta_ref, *, num_sweeps):
    """K sweeps over a VMEM-resident grid; delta recorded from sweep 0."""
    t0 = it_ref[0]
    u0 = u_ref[:]
    sweep = make_sweep_fn(u0, jnp.logical_not(frozen_ref[:]), t0)

    # Only the first sweep carries the staggered-check delta; the remaining
    # sweeps skip the full |u'-u| max-reduction entirely.
    u = sweep(u0, 0)
    delta = jnp.max(jnp.abs(u - u0))

    def body(k, u):
        return sweep(u, k + 1)

    u = jax.lax.fori_loop(0, num_sweeps - 1, body, u)
    u_out_ref[:] = u
    delta_ref[0] = delta


def _multisweep_check_kernel(it_ref, u_ref, frozen_ref, u_out_ref, u1_out_ref,
                             delta_ref, *, num_sweeps):
    """Check variant: also writes the post-first-sweep state, so the solve
    protocol can run an ENTIRE stagger cycle as one kernel — on a passing
    check the loop exits with u1 (the reference's post-check-sweep state),
    otherwise the remaining sweeps already ran (same fold as
    pallas_biggrid.sweep_chunk_dma_check / pallas_cycle.*_check)."""
    t0 = it_ref[0]
    u0 = u_ref[:]
    sweep = make_sweep_fn(u0, jnp.logical_not(frozen_ref[:]), t0)

    u1 = sweep(u0, 0)
    delta_ref[0] = jnp.max(jnp.abs(u1 - u0))
    u1_out_ref[:] = u1

    def body(k, u):
        return sweep(u, k + 1)

    u_out_ref[:] = jax.lax.fori_loop(0, num_sweeps - 1, body, u1)


def _solve_whole_kernel(scal_ref, eps_ref, u_ref, frozen_ref, u_out_ref,
                        it_ref, delta_ref, done_ref, *, stagger):
    """The ENTIRE solve protocol in ONE kernel launch.

    Even with the exit decision folded into a per-cycle kernel (the
    round-4 ``_multisweep_solve_kernel`` experiment, deleted once this
    superseded it) the maze-class solve paid ~55 us of per-cycle overhead
    against the open chunk chain — not u1 writebacks or host selects
    (both removed, 334k vs 409k sweeps/s) and not while_loop sync (the
    rejected double-cycle body), but the in-program pallas dispatch
    floor itself.
    A VMEM-resident grid needs no dispatch boundary at all: the
    convergence while-loop runs INSIDE the kernel (scalar-carried
    iteration/delta/done, the grid as a VMEM value), so a 50k-sweep solve
    is one launch. Exit semantics are bit-identical to
    harmonic_cpu.cpp:158-173: the staggered check rides each cycle's
    first sweep, and a passing check keeps u1 (the cycle's remaining
    sweeps are computed and discarded once, at exit — vector selects are
    cheaper in-loop than a scalar branch). scal = [m_max,
    max_iterations]."""
    m_max = scal_ref[0]
    max_iterations = scal_ref[1]
    eps = eps_ref[0]
    u0 = u_ref[:]
    sweep = make_sweep_fn(u0, jnp.logical_not(frozen_ref[:]), 0)

    def cond(carry):
        _, it, _, done = carry
        return jnp.logical_not(done) & (it < max_iterations)

    def body(carry):
        u, it, _, _ = carry
        u1 = sweep(u, it)
        delta = jnp.max(jnp.abs(u1 - u))
        done = (delta < eps) & (it + 1 >= m_max)
        u_full = jax.lax.fori_loop(
            1, stagger, lambda s, x: sweep(x, it + s), u1)
        u = jnp.where(done, u1, u_full)
        it = it + jnp.where(done, 1, stagger)
        return u, it, delta, done

    u, it, delta, done = jax.lax.while_loop(
        cond, body, (u0, jnp.int32(0), eps + 1.0, jnp.asarray(False)))
    u_out_ref[:] = u
    it_ref[0] = it
    delta_ref[0] = delta
    done_ref[0] = done.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("stagger", "interpret"), donate_argnums=(0,)
)
def _solve_whole(u, frozen, epsilon, m_max, max_iterations, stagger: int,
                 interpret: bool = False):
    """Dispatch the single-launch whole-solve kernel; returns
    (u', iterations, delta, converged)."""
    h, w = u.shape
    scal = jnp.stack([jnp.asarray(m_max, jnp.int32),
                      jnp.asarray(max_iterations, jnp.int32)])
    out_u, out_it, out_delta, out_done = pl.pallas_call(
        functools.partial(_solve_whole_kernel, stagger=stagger),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scal, jnp.asarray(epsilon, jnp.float32).reshape(1), u, frozen)
    return out_u, out_it[0], out_delta[0], out_done[0] != 0


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "interpret"), donate_argnums=(0,)
)
def sweep_chunk_check(
    u: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    interpret: bool = False,
):
    """num_sweeps sweeps returning ``(u_k, u1, delta)`` where u1 is the
    post-first-sweep state and delta its residual (see
    :func:`_multisweep_check_kernel`)."""
    h, w = u.shape
    out_u, out_u1, out_delta = pl.pallas_call(
        functools.partial(_multisweep_check_kernel, num_sweeps=num_sweeps),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(iteration.reshape(1), u, frozen)
    return out_u, out_u1, out_delta[0]


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "interpret"), donate_argnums=(0,)
)
def sweep_chunk(
    u: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    interpret: bool = False,
):
    """Run ``num_sweeps`` red-black sweeps on a padded grid.

    Args:
      u: f32[H, W], H % 8 == 0, W % 128 == 0 (use :func:`pad_state`).
      frozen: bool[H, W]; True where a cell must never update (locked cells,
        the original boundary ring, and alignment padding).
      iteration: i32 scalar, the reference's ``currentIteration`` at entry.
      num_sweeps: chunk length (static).
      interpret: run in interpreter mode (CPU testing).

    Returns (u_new, delta_of_first_sweep).
    """
    h, w = u.shape
    out_u, out_delta = pl.pallas_call(
        functools.partial(_multisweep_kernel, num_sweeps=num_sweeps),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
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
    )(iteration.reshape(1), u, frozen)
    return out_u, out_delta[0]


# ---------------------------------------------------------------------------
# Padded-state wrapper: aligns the grid to TPU tiles and carries the frozen
# mask so kernel calls are allocation-free.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedGrid:
    """Tile-aligned view of a GridState for the Pallas solver.

    ``frozen`` = locked | outside-original-interior | padding, so the kernel
    needs no knowledge of the original extent: exactness w.r.t. the
    reference's interior-only updates (harmonic_cpu.cpp:46-51) is carried by
    the mask.
    """

    u: jax.Array        # f32[Hp, Wp]
    frozen: jax.Array   # bool[Hp, Wp]
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))


@functools.partial(jax.jit, static_argnames=("h", "w", "hp", "wp"))
def _pad_arrays(u, locked, h: int, w: int, hp: int, wp: int):
    # One device program: no host interior-mask upload, XLA-managed
    # transients (see solver/_padding.py).
    up = jnp.pad(u, ((0, hp - h), (0, wp - w)),
                 constant_values=np.float32(C.LOG_SPACE_OBSTACLE))
    frozen = jnp.pad(locked, ((0, hp - h), (0, wp - w)),
                     constant_values=True)
    frozen = frozen | ~box_mask((hp, wp), (1, 1), (h - 1, w - 1))
    return up, frozen


def pad_state(state: GridState) -> PaddedGrid:
    h, w = state.u.shape
    hp, wp = _round_up(h, 8), _round_up(w, 128)
    u, frozen = _pad_arrays(state.u, state.locked, h, w, hp, wp)
    return PaddedGrid(u=u, frozen=frozen, height=h, width=w)


def unpad(padded: PaddedGrid, state: GridState) -> GridState:
    return dataclasses.replace(state, u=padded.u[: padded.height, : padded.width])


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def update_n(state: GridState, num_steps: int, interpret: bool | None = None) -> GridState:
    """Anytime chunk stepper on the Pallas path; semantics identical to
    :func:`epic_tpu.solver.core.update_n` (delta from the first sweep)."""
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    if interpret is None:
        interpret = _is_cpu()
    if not interpret and not fits_vmem(state.u.shape):
        raise ValueError(
            f"grid {state.u.shape} exceeds the VMEM-resident budget; use "
            "solver.core (XLA) or solver.pallas_biggrid"
        )
    padded = pad_state(state)
    u, delta = sweep_chunk(padded.u, padded.frozen, state.iteration, num_steps, interpret)
    return dataclasses.replace(
        state,
        u=u[: padded.height, : padded.width],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


def solve(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    interpret: bool | None = None,
) -> GridState:
    """Relax to convergence on the Pallas path; protocol identical to
    :func:`epic_tpu.solver.core.solve` (and harmonic_complete_cpu): exit only
    right after a staggered check with delta < eps and the propagation guard
    satisfied. The whole loop is one jitted program; the host reads nothing
    until it finishes."""
    if interpret is None:
        interpret = _is_cpu()
    if not interpret and not fits_vmem(state.u.shape):
        raise ValueError(
            f"grid {state.u.shape} exceeds the VMEM-resident budget; use "
            "solver.core (XLA) or solver.pallas_biggrid"
        )
    padded = pad_state(state)
    u, iteration, delta, converged = _solve_whole(
        padded.u,
        padded.frozen,
        state.epsilon,
        max(padded.height, padded.width),
        max_iterations,
        stagger,
        interpret,
    )
    return dataclasses.replace(
        state,
        u=u[: padded.height, : padded.width],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )
