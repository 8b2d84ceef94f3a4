"""Big-volume 3D Pallas kernel: stacked overlapping plane-bands, K sweeps/chunk.

3D volumes beyond the VMEM-resident budget of
:mod:`epic_tpu.solver.pallas_sweep3d` (~2M cells) previously fell back to
the XLA path (:mod:`epic_tpu.solver.core`, ~4 G updates/s at big-grid
scale). This module carries the 2D big-grid design
(:mod:`epic_tpu.solver.pallas_biggrid` — stacked overlapping bands, K
sweeps per HBM round trip, temporal-blocking trapezoid) into 3D. The
reference has no analogue at all: its 3D solver is a scalar CPU loop
(/root/reference/libepic/src/harmonic/harmonic_cpu.cpp:81-133).

Layout: the volume is flattened slab-wise to ``[Dp*Hp, Wp]`` exactly as the
VMEM 3D kernel does, so all six neighbour fetches are rank-2 rolls (y = ±1
row, z = ±Hp rows, x = ±1 lane). Banding happens at **plane granularity**:

- ``K`` frozen guard planes pad the volume top/bottom; ``nb`` overlapping
  extended bands of ``band + 2K`` planes are stacked by ONE XLA row gather
  per chunk;
- each band runs K guarded sweeps in VMEM. A cell's y/x neighbours live in
  its own plane (face rows/columns are frozen, so no within-plane
  dependency ever crosses a plane boundary) — correctness therefore shrinks
  by exactly one *plane* per sweep, giving the same trapezoid guard as the
  2D kernel's row-validity, at plane granularity;
- only the ``band`` centre planes are written back, which concatenate to
  the original plane order (no reassembly transpose);
- the staggered-check delta comes from sweep 0, reduced over bands via an
  SMEM vector (halo-plane updates duplicate the owning band's arithmetic
  exactly, so including them changes nothing).

Exactness: a chunk of K sweeps is bit-identical to K global sweeps of the
oracle (tested vs reference_np.sweep_3d and solver.core in interpret mode).

Halo economics differ from 2D: a halo is 2K whole planes (a 32-plane
extended band at 256^2 planes is 2x-redundant at K=8), so the stacking
gather that is negligible in 2D (~3% overlap) would materialize ~2x the
volume through XLA per chunk. The production chunk is therefore
:func:`sweep_chunk_dma`: because bands overlap in CONTIGUOUS plane ranges,
each grid step manually DMAs its extended slice of the guard-padded volume
(and of the un-stacked frozen mask) from HBM into VMEM scratch — no
stacked array exists, and grid steps run sequentially so step i prefetches
band i+1's slice into the other scratch slot while computing (cross-step
double buffering). The gather chunk (:func:`sweep_chunk_bands`) is kept as
a bit-identical cross-check. Measured at 256^3 with 4800-sweep timed
regions and cross-validated checksums: single-buffered DMA 38.0 G
visits/s best (tools/tpu_probe18.py) vs gather 26.3; double-buffered
**49.0 G visits/s = 24.5 G cell-updates/s** at the default b12_k2 layout
(tools/tpu_probe20.py, reproducible to 0.2%) — ~6x the XLA fallback
(~4 G updates/s) and 86% of the VMEM-resident 3D kernel (28.5 G).
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

EXT_BAND_CELL_BUDGET = 2 * 1024 * 1024
_VMEM_LIMIT = 128 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def choose_layout(shape: tuple[int, int, int], chunk_depth: int = 2):
    """Pick (band, k) in PLANES for a volume: the deepest K <= chunk_depth
    whose extended band fits the per-slot VMEM budget (the double-buffered
    DMA kernel holds two extended slots), halo <= half the extended band,
    planes spread evenly over the bands.

    The per-slot budget is BYTES-aware: with the frozen mask stored as
    int8 a slot pair costs 5 B/cell instead of 8, so the cell budget is
    EXT_BAND_CELL_BUDGET * 4/5 per slot (= the same bytes the int32-mask
    kernel proved safe). The round-3 on-chip scan at 256³ with int8 masks
    (BENCH_NOTES "int8 frozen masks"): b20_k2 30.7 G
    updates/s vs b12_k2 29.3, b28_k2 25.1, b24_k4 24.4 — the deeper band
    the relaxed budget admits is the win; deeper K loses to volumetric
    halo redundancy. (Round-2 int32 scan history: tools/attic/tpu_probe20
    — b12_k2 24.5 G vs b28_k2 23.6, b24_k4 22.7, k=1 14.5.)"""
    d, h, w = shape
    plane = _round_up(h, 8) * _round_up(w, 128)
    ext_max = max(3, (EXT_BAND_CELL_BUDGET * 4 // 5) // plane)
    k = max(1, min(chunk_depth, ext_max // 4))
    band_max = max(1, ext_max - 2 * k)
    nb = -(-d // band_max)
    band = -(-d // nb)
    return band, k


def feasible(shape: tuple[int, int, int], chunk_depth: int = 2) -> bool:
    """Whether the plane-banded layout fits the Mosaic scoped-VMEM wall.

    Banding happens at whole-plane granularity, so the minimum extended
    band is 3 planes (1 centre + 1 guard each side); once a single padded
    plane exceeds ~EXT_BAND_CELL_BUDGET/3 cells (~700k, e.g. 1024x1024
    planes are 1.05M), every band OOMs scoped VMEM (probe24 measured the
    ~2M-cell ext-band wall). Wide-plane volumes must use a different
    decomposition — the auto-dispatch falls back to the XLA path."""
    d, h, w = shape
    plane = _round_up(h, 8) * _round_up(w, 128)
    band, k = choose_layout(shape, chunk_depth)
    return (band + 2 * k) * plane <= EXT_BAND_CELL_BUDGET


def _band3d_kernel(it_ref, u_ref, f_ref, u_out, delta_ref,
                   *, num_sweeps, band, k, hp, w):
    """K guarded sweeps on one extended plane-band of the stacked layout."""
    i = pl.program_id(0)
    ext = band + 2 * k          # extended band depth in planes
    rows = ext * hp
    t0 = it_ref[0]
    u0 = u_ref[:]
    # frozen rides HBM/VMEM as int8 (4x less mask DMA); Mosaic v5e rejects
    # int8 vector COMPARES, so widen before testing.
    not_frozen = f_ref[:].astype(jnp.int32) == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    local_plane = local_row // hp
    y = local_row - local_plane * hp
    # Global plane of extended-local plane p is i*band - k + p; the guard
    # planes shift the padded array by k, so the padded-global plane
    # (i*band + p) differs from the true plane by k — parity only needs
    # the true plane's parity, matching pallas_biggrid's row derivation.
    parity = (local_plane + i * band - k + y + col) % 2

    def sweep(s, u):
        val = lse6(u, rows, w, hp)
        valid = (local_plane > s) & (local_plane < ext - 1 - s)
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[i, 0] = jnp.max(jnp.abs(u1 - u0))
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_out[:] = u[k * hp : (k + band) * hp, :]


def _stack_rows(dp: int, hp: int, band: int, k: int) -> np.ndarray:
    """Flat-row gather indices stacking overlapping plane-bands."""
    nb = (dp - 2 * k) // band
    starts = np.arange(nb) * band                         # in planes
    planes = starts[:, None] + np.arange(band + 2 * k)[None, :]
    rows = planes[..., None] * hp + np.arange(hp)[None, None, :]
    return rows.reshape(-1)


def stack_frozen(frozen_pad: jax.Array, hp: int, band: int, k: int) -> jax.Array:
    """Pre-stack the (static per solve) frozen mask into the overlapping
    band layout so chunks don't rebuild it."""
    dp = frozen_pad.shape[0] // hp
    return frozen_pad[jnp.asarray(_stack_rows(dp, hp, band, k))]


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "hp", "interpret")
)
def sweep_chunk_bands(
    u_pad: jax.Array,
    frozen_ext: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    hp: int,
    interpret: bool = False,
):
    """num_sweeps (<= k) 3D sweeps over the guard-padded flat volume.

    u_pad: f32[(k + nb*band + k)*hp, Wp]; frozen_ext: int8 pre-stacked mask
    from :func:`stack_frozen`. Returns (u_pad', delta of the chunk's first
    sweep). Guard planes pass through untouched.
    """
    rp, wp = u_pad.shape
    dp = rp // hp
    nb = (dp - 2 * k) // band
    assert nb * band + 2 * k == dp, (dp, band, k)
    assert num_sweeps <= k
    ext = band + 2 * k

    u_ext = u_pad[jnp.asarray(_stack_rows(dp, hp, band, k))]

    out_u, out_delta = pl.pallas_call(
        functools.partial(_band3d_kernel, num_sweeps=num_sweeps,
                          band=band, k=k, hp=hp, w=wp),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band * hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ext * hp, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ext * hp, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((band * hp, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_ext, frozen_ext)

    u_new = jax.lax.dynamic_update_slice(u_pad, out_u, (k * hp, 0))
    return u_new, jnp.max(out_delta)


def _band3d_kernel_dma(it_ref, u_hbm, f_hbm, u_out, delta_ref,
                       u_vmem, f_vmem, sems,
                       *, num_sweeps, band, k, hp, w):
    """DMA variant of :func:`_band3d_kernel`: the extended band is a
    CONTIGUOUS row range of the guard-padded volume (bands overlap by 2K
    whole planes), so each grid step copies its slice straight from HBM
    into VMEM scratch — no XLA row-gather materializing a 2x-volume stacked
    array per chunk, and no pre-stacked frozen mask. At ext/band = 2 the
    gather was the dominant HBM cost of the chunk (tools/tpu_probe18.py).

    Double-buffered: grid steps run sequentially on TPU, so step i starts
    band i+1's copies into the other scratch slot before computing on band
    i — the copy rides under the K sweeps of compute (pallas guide's
    double-buffering pattern, applied across grid steps)."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    ext = band + 2 * k
    rows = ext * hp

    def copies(band_idx, slot):
        start = band_idx * band * hp
        return (
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, rows), :], u_vmem.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(start, rows), :], f_vmem.at[slot], sems.at[slot, 1]
            ),
        )

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cu, cf = copies(0, 0)
        cu.start()
        cf.start()

    @pl.when(i + 1 < nb)
    def _():
        cu, cf = copies(i + 1, jax.lax.rem(i + 1, 2))
        cu.start()
        cf.start()

    cu, cf = copies(i, slot)
    cu.wait()
    cf.wait()

    t0 = it_ref[0]
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    local_plane = local_row // hp
    y = local_row - local_plane * hp
    parity = (local_plane + i * band - k + y + col) % 2

    def sweep(s, u):
        val = lse6(u, rows, w, hp)
        valid = (local_plane > s) & (local_plane < ext - 1 - s)
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[i, 0] = jnp.max(jnp.abs(u1 - u0))
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_out[:] = u[k * hp : (k + band) * hp, :]


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "hp", "interpret")
)
def sweep_chunk_dma(
    u_pad: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    hp: int,
    interpret: bool = False,
):
    """num_sweeps (<= k) 3D sweeps via the manual-DMA banded kernel.

    Unlike :func:`sweep_chunk_bands` this takes the UN-stacked frozen mask
    (``frozen_pad``, same shape as ``u_pad``) — each band DMAs its own
    contiguous slice of both arrays. Semantics and results are bit-identical
    to the gather path (cross-tested in tests/test_pallas_biggrid3d.py).
    """
    rp, wp = u_pad.shape
    dp = rp // hp
    nb = (dp - 2 * k) // band
    assert nb * band + 2 * k == dp, (dp, band, k)
    assert num_sweeps <= k
    ext = band + 2 * k

    out_u, out_delta = pl.pallas_call(
        functools.partial(_band3d_kernel_dma, num_sweeps=num_sweeps,
                          band=band, k=k, hp=hp, w=wp),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band * hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((band * hp, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext * hp, wp), jnp.float32),
            pltpu.VMEM((2, ext * hp, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_pad, frozen_pad)

    u_new = jax.lax.dynamic_update_slice(u_pad, out_u, (k * hp, 0))
    return u_new, jnp.max(out_delta)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandedVolume:
    u: jax.Array          # f32[(k + nb*band + k)*hp, Wp]
    frozen: jax.Array     # int8 same shape (4x less DMA per chunk)
    depth: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    hp: int = dataclasses.field(metadata=dict(static=True))
    band: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))


def pad_state(state: GridState, chunk_depth: int = 2,
              band: int | None = None, k: int | None = None) -> BandedVolume:
    d, h, w = state.u.shape
    if band is None or k is None:
        band, k = choose_layout((d, h, w), chunk_depth)
    hp, wp = _round_up(h, 8), _round_up(w, 128)
    nb = -(-d // band)
    dp = nb * band + 2 * k
    u, frozen = _pad_arrays(state.u, state.locked, d, h, w, dp, hp, wp, k)
    return BandedVolume(u=u, frozen=frozen, depth=d, height=h, width=w,
                        hp=hp, band=band, k=k)


@functools.partial(
    jax.jit, static_argnames=("d", "h", "w", "dp", "hp", "wp", "k"))
def _pad_arrays(u, locked, d: int, h: int, w: int, dp: int, hp: int,
                wp: int, k: int):
    # One device program: no host interior-mask upload, XLA-managed
    # transients (see solver/_padding.py).
    up = jnp.full((dp * hp, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    u3 = jnp.pad(
        u,
        ((0, 0), (0, hp - h), (0, wp - w)),
        constant_values=np.float32(C.LOG_SPACE_OBSTACLE),
    ).reshape(d * hp, wp)
    up = jax.lax.dynamic_update_slice(up, u3, (k * hp, 0))
    frozen3 = jnp.pad(
        locked, ((0, 0), (0, hp - h), (0, wp - w)), constant_values=True
    ).astype(jnp.int8).reshape(d * hp, wp)
    frozen = jnp.ones((dp * hp, wp), dtype=jnp.int8)
    frozen = jax.lax.dynamic_update_slice(frozen, frozen3, (k * hp, 0))
    interior = box_mask((dp, hp, wp), (k + 1, 1, 1), (k + d - 1, h - 1, w - 1))
    frozen = jnp.where(interior.reshape(dp * hp, wp), frozen,
                       jnp.int8(1))
    return up, frozen


def unpad(g: BandedVolume) -> jax.Array:
    dp = g.u.shape[0] // g.hp
    u3 = g.u.reshape(dp, g.hp, g.u.shape[1])
    return u3[g.k : g.k + g.depth, : g.height, : g.width]


def update_n(state: GridState, num_steps: int,
             chunk_depth: int = 2, interpret: bool | None = None) -> GridState:
    """Anytime chunk stepper; semantics identical to core.update_n (delta
    from the overall first sweep). Full K-chunks run through the 3D
    ping-pong cycle kernel (pallas_cycle.sweep_cycle3d) — ONE dispatch
    instead of num_steps/k chained dispatches + full-volume DUS copies
    (production k is 2, so the old path paid 50 of each per 100 sweeps);
    a shallow remainder runs as a single DMA chunk."""
    from . import pallas_cycle

    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if state.u.ndim != 3:
        raise ValueError(f"pallas_biggrid3d requires a 3D grid, got {state.u.ndim}D")
    g = pad_state(state, chunk_depth)
    u = g.u
    delta = None
    t = 0
    n_full, rem = divmod(num_steps, g.k)
    if n_full:
        u, _, delta = pallas_cycle.run_chain(
            pallas_cycle.sweep_cycle3d, u, None, g.frozen, state.iteration,
            n_full, g.k, g.band, g.hp, interpret=interpret,
        )
        t = n_full * g.k
    if rem:
        u, dd = sweep_chunk_dma(
            u, g.frozen, state.iteration + t, rem, g.band, g.k, g.hp,
            interpret
        )
        if delta is None:
            delta = dd
    dp = u.shape[0] // g.hp
    u3 = u.reshape(dp, g.hp, u.shape[1])
    return dataclasses.replace(
        state,
        u=u3[g.k : g.k + g.depth, : g.height, : g.width],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "band", "k", "hp",
                     "interpret", "m_max"),
    donate_argnums=(0,),
)
def _solve_banded(
    u, frozen_pad, epsilon, stagger: int, max_iterations, band: int,
    k: int, hp: int, interpret: bool, m_max: int, it0=None,
    conv0=None, delta0=None,
):
    """Full solve protocol on the banded 3D path, one device program.

    The per-cycle plain sweeps run through the 3D ping-pong cycle kernel
    (pallas_cycle.sweep_cycle3d): at the production k=2, the chained
    structure paid ~50 chunk dispatches + 50 full-volume DUS copies per
    100-sweep cycle (probe37: +38% at 256³, bit-exact). The twin is a
    FRESH ``jnp.full(-1e6)`` created inside the loop body — only its guard
    planes are ever read (centers are write-before-read), and keeping it
    out of the while carry avoids XLA copies at the cond joins (probe42
    A/B: 18.7 vs 18.2 G updates/s at 256³, delta-bit-equal)."""
    from .pallas_cycle import cycle_fill, sweep_cycle3d

    cycle_fn = sweep_cycle3d.__wrapped__
    # NOTE: the whole-cycle in-kernel check (sweep_cycle*_check) that wins
    # in 2D (probe49/50) LOSES here — probe51 A/B at 256³: 14.7 vs this
    # structure's 15.1 G updates/s, delta-bit-equal. At plane-banded
    # layouts the check variant's per-band u1 centre staging (a full
    # band*hp x w VMEM copy + DMA on chunk 0's critical path) costs more
    # than the 1-sweep check chunk + paste it replaces, so 3D keeps the
    # check-chunk + cycle-fill body.
    n_full, rem = divmod(stagger - 1, k)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        u, delta = sweep_chunk_dma.__wrapped__(
            u, frozen_pad, iteration, 1, band, k, hp, interpret
        )
        iteration = iteration + 1
        done = (delta < epsilon) & (iteration >= m_max)

        def run_rest(args):
            u, iteration = args
            if n_full:
                u, _ = cycle_fill(cycle_fn, u, frozen_pad, iteration,
                                  n_full, k, band, hp, interpret=interpret)
                iteration = iteration + n_full * k
            if rem:
                u, _ = sweep_chunk_dma.__wrapped__(
                    u, frozen_pad, iteration, rem, band, k, hp, interpret
                )
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(
            done, lambda a: a, run_rest, (u, iteration)
        )
        return u, iteration, delta, done

    # max_iterations is a TRACED bound and it0 a traced start, so
    # solve_segments can resume the identical loop across watchdog-safe
    # dispatch segments without per-segment recompiles (the
    # pallas_biggrid.solve_segments pattern).
    from .._segments import carry_defaults

    start, cv0, dl0 = carry_defaults(epsilon, it0, conv0, delta0)
    # A segment entered with conv0=True is a no-op pass-through (the
    # while cond fails immediately), so the pipelined segment driver can
    # dispatch past the converging segment (epic_tpu._segments).
    u_out, iteration, delta, converged = jax.lax.while_loop(
        cond, body, (u, start, dl0, cv0))
    return u_out, iteration, delta, converged


def solve(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 2,
    interpret: bool | None = None,
) -> GridState:
    """Relax a big 3D volume to convergence; protocol identical to
    core.solve (harmonic_complete_cpu), one device program."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if state.u.ndim != 3:
        raise ValueError(f"pallas_biggrid3d requires a 3D grid, got {state.u.ndim}D")
    g = pad_state(state, chunk_depth)
    u, iteration, delta, converged = _solve_banded(
        g.u, g.frozen, state.epsilon, stagger, max_iterations, g.band,
        g.k, g.hp, interpret, max(state.u.shape),
    )
    dp = u.shape[0] // g.hp
    u3 = u.reshape(dp, g.hp, u.shape[1])
    return dataclasses.replace(
        state,
        u=u3[g.k : g.k + g.depth, : g.height, : g.width],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )


def solve_segments(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    segment_iterations: int = 5_000,
    chunk_depth: int = 2,
    interpret: bool | None = None,
) -> GridState:
    """Big-volume solve-to-convergence as watchdog-safe compiled SEGMENTS
    (the pallas_biggrid.solve_segments pattern, 3D twin): each dispatch
    resumes the SAME compiled while loop at the previous segment's
    iteration, donating the padded buffers across dispatches —
    bit-identical trajectories to :func:`solve`. Deep volumes whose
    ``iter >= max(shape)`` floor holds tens of seconds of device work
    need this in remote-watchdog environments."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if state.u.ndim != 3:
        raise ValueError(f"pallas_biggrid3d requires a 3D grid, got {state.u.ndim}D")
    g = pad_state(state, chunk_depth)
    u = g.u
    from .._segments import run_pipelined

    def seg(uu, bound, it0, cv, dl):
        return _solve_banded(
            uu, g.frozen, state.epsilon, stagger, bound, g.band, g.k,
            g.hp, interpret, max(state.u.shape), it0=it0, conv0=cv, delta0=dl,
        )

    u, it, delta, converged = run_pipelined(
        seg, u, state.epsilon, max_iterations, segment_iterations)
    dp = u.shape[0] // g.hp
    u3 = u.reshape(dp, g.hp, u.shape[1])
    return dataclasses.replace(
        state,
        u=u3[g.k : g.k + g.depth, : g.height, : g.width],
        iteration=it,
        delta=delta,
        converged=converged,
    )
