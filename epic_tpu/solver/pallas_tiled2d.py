"""Big-grid Pallas kernel v3: 2D (row x column) tiled DMA chunks.

The row-banded kernels (pallas_biggrid) keep extended bands under a ~2M-cell
scoped-VMEM budget, so at 16384-wide grids bands are only 96 rows tall and
the K-deep halo re-reads 1.33x the grid per chunk (2.0x at 32768) — Mosaic
rejects every larger band outright (tools/tpu_probe24.py: all >2M-cell ext
blocks OOM scoped VMEM). This module tiles the other axis too: each grid
step DMAs a strided slab of ``(band + 2k) x (wt + 256)`` cells (128 guard
columns per side keep lane alignment; the shrinking-frontier argument needs
only ``num_sweeps <= min(k, 128)``), so bands stay hundreds of rows tall at
ANY grid width and total halo redundancy is ``(1 + 2k/band)(1 + 256/wt)``
~= 1.10 instead of growing with W.

Same temporal-blocking trapezoid as the banded kernels, now in both axes:
after sweep ``s`` only cells with local row AND column in ``(s, ext-1-s)``
are bit-equal to ``s`` global sweeps; the chunk writes back only the
``band x wt`` center, whose cells sit >= k inside both frontiers. Sweep-0
delta per slab maxes to the exact global delta (halo cells duplicate the
owning tile's arithmetic).

Chunk semantics are bit-identical to pallas_biggrid.sweep_chunk_* and to K
global sweeps of the oracle (cross-tested). Replaces the CUDA per-sweep
stencil + two-stage delta reduction
(/root/reference/libepic/src/harmonic/harmonic_gpu.cu:39-153) in the
wide-grid regime.
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
from .pallas_biggrid import EXT_BAND_CELL_BUDGET, _VMEM_LIMIT, _round_up
from ._padding import box_mask
from ._sweep_body import lse4
_HX = 128  # column guard per side (lane-tile aligned; >= any supported k)


def tile_layouts(shape: tuple[int, int], chunk_depth: int = 16):
    """Candidate (band, k, wt) layouts with their total halo redundancy.

    The default k is 16: probe25 measured k=16 faster than k=8 at every
    shape despite its slightly higher redundancy (42.6 vs 40.3 G updates/s
    at 16384² — deeper chunks amortize writeback traffic and give the
    cross-step DMA prefetch more room, matching the banded K-scan,
    probe10), and probe33 rejected stagger-aligned k=20 (redundancy beats
    dispatch count). ``chunk_depth`` can still pick other multiples of 4."""
    h, w = shape
    # k needs 2k ≡ 0 (mod 8) for sublane alignment, i.e. k a multiple of 4.
    k = min(32, max(8, chunk_depth // 4 * 4))
    out = []
    wp = _round_up(w, 128)
    candidates = [wt for wt in (1024, 2048, 4096, 8192) if wt <= wp] or [1024]
    for wt in candidates:
        # wt wider than the (padded) grid would pad narrow grids out to
        # wt + 2*_HX columns of mostly dead cells (matches the 3D layout
        # chooser's filtering).
        wext = wt + 2 * _HX
        ext_max = (EXT_BAND_CELL_BUDGET // wext) // 8 * 8
        band_max = ext_max - 2 * k
        if band_max < 8:
            continue
        nb = -(-h // band_max)
        band = _round_up(-(-h // nb), 8)
        band = max(8, band)
        red = (band + 2 * k) / band * wext / wt
        out.append((red, band, k, wt))
    return sorted(out)


def choose_tiled_layout(shape: tuple[int, int], chunk_depth: int = 16):
    """Lowest-redundancy tiled layout at the production chunk depth."""
    cands = tile_layouts(shape, chunk_depth)
    if not cands:
        raise ValueError(f"no tiled layout fits the VMEM budget for {shape}")
    _, band, k, wt = cands[0]
    return band, k, wt


def redundancy_tiled(shape: tuple[int, int], chunk_depth: int = 16) -> float:
    cands = tile_layouts(shape, chunk_depth)
    return cands[0][0] if cands else float("inf")


def prefer_tiled(shape: tuple[int, int], chunk_depth: int = 16) -> bool:
    """Production regime selection: the tiled kernel wins only where the
    row-banded layout's redundancy substantially exceeds the tiled one —
    its strided slab DMAs cost a little versus the banded kernel's
    contiguous row slices (probe25: 16384² tiled 42.6 vs banded 38.0 G
    updates/s, but 8192² banded 42.4 vs tiled 40.3). Rule: tiled iff
    banded redundancy exceeds tiled by > 0.04 (true from ~13k widths
    up). The threshold was 0.1 when the banded layout used int32 masks;
    the round-3 int8 masks deepened its bands (16384²: band 96 -> 168,
    redundancy 1.33 -> 1.19) which silently flipped this gate back to
    banded at 16384² — where the measured rates still favour tiled
    (round-4 battery: tiled 43.6 vs banded 41.0 update, and the banded
    SOLVE's small bands pay even more). 0.04 restores the measured
    crossover: banded at 8192² (diff -0.06) and 12288² (-0.01), tiled at
    16384² (+0.05).

    Solves follow the same rule: with the banded solve restructured to
    always-DMA chunks + the folded check (probe32/33: 33.9/40.7/38.9 G at
    2048²/4096²/8192², beating the tiled solve's 17.2/37.3/36-38), the
    crossover where tiled wins solves coincides with the chunk crossover."""
    from .pallas_biggrid import choose_layout

    band_b, k_b = choose_layout(shape, chunk_depth)
    red_banded = (band_b + 2 * k_b) / band_b
    return red_banded - redundancy_tiled(shape, chunk_depth) > 0.04


def _tile_kernel_impl(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                      u_vmem, f_vmem, sems,
                      *, num_sweeps, band, k, wt):
    """num_sweeps guarded sweeps on one (ext_r x wext) slab, double-buffered
    across the flattened (band, tile) grid: step i prefetches slab i+1's
    strided HBM slice into the other scratch slot before computing (grid
    steps run sequentially on TPU). When ``u1_out`` is a ref (the check
    variant), the post-first-sweep center is also written so the solve
    protocol can fold the staggered convergence check into a full K-chunk
    and still exit with the exact post-check-sweep state the reference
    exits with (harmonic_cpu.cpp:158-173)."""
    j = pl.program_id(0)
    c = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    ext_r = band + 2 * k
    wext = wt + 2 * _HX

    def copies(band_idx, tile_idx, slot):
        r0 = band_idx * band
        c0 = tile_idx * wt
        return (
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(r0, ext_r), pl.ds(c0, wext)],
                u_vmem.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(r0, ext_r), pl.ds(c0, wext)],
                f_vmem.at[slot], sems.at[slot, 1],
            ),
        )

    lin = j * nt + c
    slot = jax.lax.rem(lin, 2)

    @pl.when(lin == 0)
    def _():
        cu, cf = copies(0, 0, 0)
        cu.start()
        cf.start()

    @pl.when(lin + 1 < nb * nt)
    def _():
        nxt = lin + 1
        cu, cf = copies(nxt // nt, jax.lax.rem(nxt, nt), jax.lax.rem(nxt, 2))
        cu.start()
        cf.start()

    cu, cf = copies(j, c, slot)
    cu.wait()
    cf.wait()

    t0 = it_ref[0]
    u0 = u_vmem[slot]
    # Masks stay int32 on the TILED path: int8 slabs measured ~3%
    # SLOWER on chip (strided int8 row copies pay more DMA overhead per
    # byte) and the slab budget cannot grow anyway — int8 pays only on
    # the contiguous banded kernels (see pallas_biggrid).
    not_frozen = f_vmem[slot] == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (ext_r, wext), 0)
    local_col = jax.lax.broadcasted_iota(jnp.int32, (ext_r, wext), 1)
    # Original coords: row = j*band + lr - k, col = c*wt + lc - _HX; the
    # -_HX term is even, so parity = (lr + lc + j*band + c*wt + k) % 2.
    parity = (local_row + local_col + j * band + c * wt + k) % 2

    def sweep(s, u):
        val = lse4(u, ext_r, wext)
        valid = (
            (local_row > s) & (local_row < ext_r - 1 - s)
            & (local_col > s) & (local_col < wext - 1 - s)
        )
        update = (parity != ((t0 + s) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[j, c] = jnp.max(jnp.abs(u1 - u0))
    if u1_out is not None:
        u1_out[:] = u1[k : k + band, _HX : _HX + wt]
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_out[:] = u[k : k + band, _HX : _HX + wt]


def _tile_kernel(it_ref, u_hbm, f_hbm, u_out, delta_ref,
                 u_vmem, f_vmem, sems,
                 *, num_sweeps, band, k, wt):
    _tile_kernel_impl(it_ref, u_hbm, f_hbm, u_out, None, delta_ref,
                      u_vmem, f_vmem, sems,
                      num_sweeps=num_sweeps, band=band, k=k, wt=wt)


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "wt", "interpret")
)
def sweep_chunk_tiled(
    u_pad: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    wt: int,
    interpret: bool = False,
):
    """num_sweeps (<= k) sweeps over the guard-padded grid via 2D tiles.

    u_pad: f32[k + nb*band + k, _HX + nt*wt + _HX]; frozen_pad: int32 same
    shape (guard ring, boundary ring, and alignment padding frozen).
    Returns (u_pad', delta of the chunk's first sweep).
    """
    hp, wp = u_pad.shape
    nb = (hp - 2 * k) // band
    nt = (wp - 2 * _HX) // wt
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert nt * wt + 2 * _HX == wp, (wp, wt)
    assert num_sweeps <= min(k, _HX)
    ext_r = band + 2 * k
    wext = wt + 2 * _HX

    out_u, out_delta = pl.pallas_call(
        functools.partial(_tile_kernel, num_sweeps=num_sweeps,
                          band=band, k=k, wt=wt),
        grid=(nb, nt),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band, nt * wt), jnp.float32),
            jax.ShapeDtypeStruct((nb, nt), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((band, wt), lambda j, c: (j, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext_r, wext), jnp.float32),
            pltpu.VMEM((2, ext_r, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_pad, frozen_pad)

    u_new = jax.lax.dynamic_update_slice(u_pad, out_u, (k, _HX))
    return u_new, jnp.max(out_delta)


def _tile_kernel_check(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                       u_vmem, f_vmem, sems,
                       *, num_sweeps, band, k, wt):
    _tile_kernel_impl(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                      u_vmem, f_vmem, sems,
                      num_sweeps=num_sweeps, band=band, k=k, wt=wt)


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "wt", "interpret")
)
def sweep_chunk_tiled_check(
    u_pad: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    wt: int,
    interpret: bool = False,
):
    """Check chunk: num_sweeps sweeps, returning the raw center blocks
    ``(out_uk, out_u1, delta)`` where out_u1 is the post-first-sweep state
    and delta its residual. The caller dynamic-update-slices whichever
    center the protocol selects (only one DUS executes under lax.cond)."""
    hp, wp = u_pad.shape
    nb = (hp - 2 * k) // band
    nt = (wp - 2 * _HX) // wt
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert nt * wt + 2 * _HX == wp, (wp, wt)
    assert num_sweeps <= min(k, _HX)
    ext_r = band + 2 * k
    wext = wt + 2 * _HX

    out_uk, out_u1, out_delta = pl.pallas_call(
        functools.partial(_tile_kernel_check, num_sweeps=num_sweeps,
                          band=band, k=k, wt=wt),
        grid=(nb, nt),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band, nt * wt), jnp.float32),
            jax.ShapeDtypeStruct((nb * band, nt * wt), jnp.float32),
            jax.ShapeDtypeStruct((nb, nt), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((band, wt), lambda j, c: (j, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, wt), lambda j, c: (j, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext_r, wext), jnp.float32),
            pltpu.VMEM((2, ext_r, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_pad, frozen_pad)

    return out_uk, out_u1, jnp.max(out_delta)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledGrid:
    u: jax.Array          # f32[k + nb*band + k, _HX + nt*wt + _HX]
    frozen: jax.Array     # int32 same shape
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    band: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    wt: int = dataclasses.field(metadata=dict(static=True))


@functools.partial(jax.jit, static_argnames=("h", "w", "hp", "wp", "k"))
def _pad_arrays(u, locked, h: int, w: int, hp: int, wp: int, k: int):
    # One device program: no host interior-mask upload, XLA-managed
    # transients (see solver/_padding.py).
    up = jnp.full((hp, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    up = up.at[k : k + h, _HX : _HX + w].set(u)
    frozen = jnp.ones((hp, wp), dtype=jnp.int32)
    frozen = frozen.at[k : k + h, _HX : _HX + w].set(locked.astype(jnp.int32))
    frozen = jnp.where(
        box_mask((hp, wp), (k + 1, _HX + 1), (k + h - 1, _HX + w - 1)),
        frozen, 1)
    return up, frozen


def pad_state(state: GridState, chunk_depth: int = 16,
              band: int | None = None, k: int | None = None,
              wt: int | None = None) -> TiledGrid:
    h, w = state.u.shape
    if band is None or k is None or wt is None:
        band, k, wt = choose_tiled_layout((h, w), chunk_depth)
    nb = -(-h // band)
    nt = -(-w // wt)
    hp = nb * band + 2 * k
    wp = nt * wt + 2 * _HX
    u, frozen = _pad_arrays(state.u, state.locked, h, w, hp, wp, k)
    return TiledGrid(u=u, frozen=frozen, height=h, width=w,
                     band=band, k=k, wt=wt)


def unpad(g: TiledGrid) -> jax.Array:
    return g.u[g.k : g.k + g.height, _HX : _HX + g.width]


def update_n(state: GridState, num_steps: int,
             chunk_depth: int = 16, interpret: bool | None = None) -> GridState:
    """Anytime chunk stepper; semantics identical to core.update_n (delta
    from the overall first sweep)."""
    from . import pallas_cycle

    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = pad_state(state, chunk_depth)
    u = g.u
    delta = None
    t = 0
    n_full, rem = divmod(num_steps, g.k)
    if n_full:
        u, _, delta = pallas_cycle.run_chain(
            pallas_cycle.sweep_cycle_tiled, u, None, g.frozen,
            state.iteration, n_full, g.k, g.band, g.wt, interpret=interpret,
        )
        t = n_full * g.k
    if rem:
        u, dd = sweep_chunk_tiled(
            u, g.frozen, state.iteration + t, rem, g.band, g.k, g.wt,
            interpret
        )
        if delta is None:
            delta = dd
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, _HX : _HX + g.width],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "band", "k", "wt",
                     "interpret", "height", "width"),
    donate_argnums=(0,),
)
def _solve_tiled(
    u, frozen, epsilon, stagger: int, max_iterations, band: int,
    k: int, wt: int, interpret: bool, height: int, width: int,
    it0=None, conv0=None, delta0=None,
):
    """Full solve protocol on the tiled path, one device program.

    Unlike pallas_biggrid._solve_banded (whose staggered check is a
    dedicated 1-sweep chunk — a full HBM round trip for one sweep), the
    check here is FOLDED into the first K-deep chunk of each cycle via
    :func:`sweep_chunk_tiled_check`, which returns both the post-check-sweep
    and post-K-sweep states. On a passing check the loop exits with the
    exact post-check-sweep state and ``iteration ≡ 1 (mod stagger)``, as
    the reference does (harmonic_cpu.cpp:158-173); otherwise the K sweeps
    already ran and the cycle continues with stagger-K more.
    """
    from .pallas_cycle import (cycle_fill, sweep_cycle_tiled,
                               sweep_cycle_tiled_check)

    m_max = max(height, width)
    chunk_fn = sweep_chunk_tiled.__wrapped__
    check_fn = sweep_chunk_tiled_check.__wrapped__
    cycle_fn = sweep_cycle_tiled.__wrapped__
    cycle_check_fn = sweep_cycle_tiled_check.__wrapped__
    # Each stagger cycle runs through the ping-pong cycle kernel with a
    # FRESH fill twin created inside the loop body (carrying the aliased
    # pair loses to XLA copies at the cond joins — probe36 vs probe40/42).
    # With stagger >= k the staggered check is folded into chunk 0 OF THE
    # CYCLE (sweep_cycle_tiled_check): one dispatch per whole cycle, no
    # separate check chunk, no per-cycle paste — the passing-check exit
    # state is u1 pasted into either output buffer (non-centre cells of
    # both are the constant pad value). See pallas_biggrid._solve_banded
    # (probe49: +2.7%/+14% at 4096²/8192² banded).

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    if stagger >= k:
        n_cycle, rem = divmod(stagger, k)

        def body(carry):
            u, iteration, _, _ = carry
            alt = jnp.full_like(u, jnp.float32(C.LOG_SPACE_OBSTACLE))
            a, b, u1, deltas = cycle_check_fn(
                u, alt, frozen, iteration, n_cycle, k, band, wt, interpret
            )
            u_end = b if n_cycle % 2 else a
            delta = deltas[0]
            done = (delta < epsilon) & (iteration + 1 >= m_max)

            def finish(args):
                u_end, iteration = args
                return (
                    jax.lax.dynamic_update_slice(u_end, u1, (k, _HX)),
                    iteration + 1,
                )

            def run_rest(args):
                u_end, iteration = args
                iteration = iteration + n_cycle * k
                if rem:
                    u_end, _ = chunk_fn(u_end, frozen, iteration, rem,
                                        band, k, wt, interpret)
                    iteration = iteration + rem
                return u_end, iteration

            u, iteration = jax.lax.cond(done, finish, run_rest,
                                        (u_end, iteration))
            return u, iteration, delta, done

    else:
        cd = min(k, stagger)

        def body(carry):
            u, iteration, _, _ = carry
            out_uk, out_u1, delta = check_fn(
                u, frozen, iteration, cd, band, k, wt, interpret
            )
            done = (delta < epsilon) & (iteration + 1 >= m_max)

            def finish(args):
                u, iteration = args
                return (
                    jax.lax.dynamic_update_slice(u, out_u1, (k, _HX)),
                    iteration + 1,
                )

            def run_rest(args):
                u, iteration = args
                u = jax.lax.dynamic_update_slice(u, out_uk, (k, _HX))
                iteration = iteration + cd
                rest = stagger - cd
                n_full, rem = divmod(rest, k)
                if n_full:
                    u, _ = cycle_fill(cycle_fn, u, frozen, iteration,
                                      n_full, k, band, wt,
                                      interpret=interpret)
                    iteration = iteration + n_full * k
                if rem:
                    u, _ = chunk_fn(u, frozen, iteration, rem, band, k, wt,
                                    interpret)
                    iteration = iteration + rem
                return u, iteration

            u, iteration = jax.lax.cond(done, finish, run_rest,
                                        (u, iteration))
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
    return jax.lax.while_loop(cond, body, (u, start, dl0, cv0))


def solve(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 16,
    interpret: bool | None = None,
) -> GridState:
    """Relax to convergence; protocol identical to core.solve
    (harmonic_complete_cpu), 2D-tiled big-grid kernel, one device program."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = pad_state(state, chunk_depth)
    u, iteration, delta, converged = _solve_tiled(
        g.u, g.frozen, state.epsilon, stagger, max_iterations, g.band,
        g.k, g.wt, interpret, g.height, g.width,
    )
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, _HX : _HX + g.width],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )


def solve_segments(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    segment_iterations: int = 5_000,
    chunk_depth: int = 16,
    interpret: bool | None = None,
) -> GridState:
    """Solve-to-convergence as watchdog-safe compiled SEGMENTS (the
    pallas_biggrid.solve_segments pattern, tiled twin): each dispatch
    resumes the SAME compiled while loop at the previous segment's
    iteration, donating the padded buffers across dispatches —
    bit-identical trajectories to :func:`solve`. The wide-grid regime
    (prefer_tiled, ~12k widths up) NEEDS this: its ``iter >= max(H, W)``
    floor alone can exceed the ~45 s remote-worker watchdog
    (probe26/27)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = pad_state(state, chunk_depth)
    u = g.u
    from .._segments import run_pipelined

    def seg(uu, bound, it0, cv, dl):
        return _solve_tiled(
            uu, g.frozen, state.epsilon, stagger, bound, g.band, g.k,
            g.wt, interpret, g.height, g.width, it0=it0, conv0=cv,
            delta0=dl,
        )

    u, it, delta, converged = run_pipelined(
        seg, u, state.epsilon, max_iterations, segment_iterations)
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, _HX : _HX + g.width],
        iteration=it,
        delta=delta,
        converged=converged,
    )
