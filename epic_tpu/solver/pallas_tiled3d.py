"""Big-volume 3D Pallas kernel v2: (z-band x y-tile x x-tile) DMA slabs.

The plane-banded big-volume kernel (:mod:`pallas_biggrid3d`) bands at
whole-plane granularity, so once a single padded plane exceeds ~700k cells
(e.g. 1024x1024 planes are 1.05M) even the minimal 3-plane extended band
blows the ~2M-cell scoped-VMEM wall (probe24) and the kernel cannot
compile at all — wide-plane volumes previously fell back to the XLA path
(~4 G updates/s). This module carries the 2D row-x-column tiling idea
(:mod:`pallas_tiled2d`) into 3D: each grid step DMAs a
``(band + 2k) x (yt + 2*_HY) x (wt + 2*_HX)`` slab — guard planes in z,
8-aligned guard rows in y, 128-aligned guard columns in x — so slab size
is bounded at ANY plane area. The reference has no analogue: its 3D
solver is a scalar CPU loop (harmonic_cpu.cpp:81-133).

Layout: the guard-padded volume stays flattened to ``[dp*hp2, wp]`` rows
(``hp2`` rows per plane, y guards folded into each plane's padding), so a
slab is ``ext_z`` contiguous row-ranges — one strided rank-2 copy per
plane per slab, unrolled statically (``ext_z`` is small), double-buffered
across the linearized (band, y-tile, x-tile) grid exactly like
:func:`pallas_tiled2d._tile_kernel_impl`. Compute runs on the rank-2
``(ext_z*yext, wext)`` scratch with the shared 6-neighbour body
(:func:`_sweep_body.lse6`, ``hp=yext``): z neighbours are ±yext-row rolls,
and the plane-edge wrap garbage of the y rolls lands only on guard rows
the validity frontier excludes.

Trapezoid correctness now shrinks in all three axes: after sweep ``s``
only cells with local plane AND row AND column in ``(s, ext-1-s)`` equal
``s`` global sweeps, so ``num_sweeps <= min(k, _HY, _HX)``. Only the
``band x yt x wt`` centre is written back. Sweep-0 deltas per slab max to
the exact global delta (halo cells duplicate the owning slab's
arithmetic). Chunk results are bit-identical to global oracle sweeps
(tested vs reference_np.sweep_3d / solver.core in interpret mode).

Halo economics: redundancy ``(1 + 2k/band)(yext/yt)(wext/wt)`` is ~2.5-3x
(3D halos are volumetric), so the compute ceiling is ~110/(2*2.5) ~ 22 G
updates/s — well below the banded kernel where that one fits, but ~4-5x
the XLA fallback in the wide-plane regime where nothing else runs.
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
from .pallas_biggrid import _VMEM_LIMIT, _round_up
from .pallas_biggrid3d import EXT_BAND_CELL_BUDGET
from ._padding import box_mask
from ._sweep_body import lse6

_HY = 16   # y guard rows per side (sublane-aligned; >= any supported k)
_HX = 128  # x guard cols per side (lane-aligned)


def tile_layouts(shape: tuple[int, int, int], chunk_depth: int = 2):
    """Candidate (band, k, yt, wt) layouts with total halo redundancy.

    Slab cells (``(band+2k)(yt+2*_HY)(wt+2*_HX)``) are capped at the
    ~2M-cell scoped-VMEM wall (probe24; the 2D tiled kernel runs the same
    cap with the identical two-slot scratch). Redundancy is the product of
    the three per-axis halo ratios; candidates are sorted by it, deeper k
    breaking ties (amortizes writeback traffic)."""
    d, h, w = shape
    out = []
    for k in (2, 4):
        if k > max(2, chunk_depth):
            continue
        for band in (2, 4, 8, 16, 32):
            if band > max(1, d):
                continue
            ext_z = band + 2 * k
            for yt in (32, 64, 96, 224, 480, 992):
                if yt > _round_up(h, 8):
                    continue
                yext = yt + 2 * _HY
                for wt in (256, 512, 768, 1024, 1792, 3840):
                    if wt > _round_up(w, 128):
                        continue
                    wext = wt + 2 * _HX
                    # int8 masks would admit 8/5 the slab cells in the same
                    # scoped-VMEM bytes, but the bigger slabs measured
                    # SLOWER on chip despite lower redundancy (18.2 vs
                    # 19.9 G at 32x2048x2048, band 16 vs 8 — DMA overlap
                    # degrades before the redundancy saving pays), so the
                    # cell cap stays at the proven slab size.
                    if ext_z * yext * wext > EXT_BAND_CELL_BUDGET:
                        continue
                    red = (ext_z / band) * (yext / yt) * (wext / wt)
                    out.append((red, -k, band, k, yt, wt))
    return sorted(out)


def choose_layout(shape: tuple[int, int, int], chunk_depth: int = 2):
    cands = tile_layouts(shape, chunk_depth)
    if not cands:
        raise ValueError(f"no 3D-tiled layout fits the VMEM budget for {shape}")
    _, _, band, k, yt, wt = cands[0]
    return band, k, yt, wt


def feasible(shape: tuple[int, int, int], chunk_depth: int = 2) -> bool:
    """This kernel serves the regime where plane-banding cannot compile.

    Where BOTH layouts fit (mid-plane volumes, e.g. 128x512x512 where the
    banded layout degenerates to band=2, k=1), the banded kernel keeps
    production anyway: its cycle-kernel structure removes the per-sweep
    paste that k=1 would otherwise pay, and it wins both chains (16.3 vs
    15.6 G updates/s) and solves (14.0 vs 11.7 G) — probe45/46. A
    per-sweep traffic heuristic ((red+1)/k) predicts the opposite and is
    deliberately NOT wired into dispatch."""
    return bool(tile_layouts(shape, chunk_depth))


def _tile3d_kernel_impl(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                        u_vmem, f_vmem, sems,
                        *, num_sweeps, band, k, yt, wt, hp2):
    """num_sweeps guarded sweeps on one (ext_z x yext x wext) slab of the
    flattened padded volume, double-buffered across the linearized
    (band, y-tile, x-tile) grid. When ``u1_out`` is a ref (check variant)
    the post-first-sweep centre is also written, so the solve protocol can
    fold the staggered check into a full K-chunk (harmonic_cpu.cpp:158-173
    exit-state semantics)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = pl.program_id(2)
    nb = pl.num_programs(0)
    ny = pl.num_programs(1)
    nx = pl.num_programs(2)
    ext_z = band + 2 * k
    yext = yt + 2 * _HY
    wext = wt + 2 * _HX
    rows = ext_z * yext

    def copies(band_idx, jy, cx, slot):
        r0y = jy * yt
        c0 = cx * wt
        cs = []
        for p in range(ext_z):
            src_row = (band_idx * band + p) * hp2 + r0y
            cs.append(pltpu.make_async_copy(
                u_hbm.at[pl.ds(src_row, yext), pl.ds(c0, wext)],
                u_vmem.at[slot, pl.ds(p * yext, yext), :],
                sems.at[slot, 2 * p],
            ))
            cs.append(pltpu.make_async_copy(
                f_hbm.at[pl.ds(src_row, yext), pl.ds(c0, wext)],
                f_vmem.at[slot, pl.ds(p * yext, yext), :],
                sems.at[slot, 2 * p + 1],
            ))
        return cs

    lin = (i * ny + j) * nx + c
    slot = jax.lax.rem(lin, 2)

    @pl.when(lin == 0)
    def _():
        for cp in copies(0, 0, 0, 0):
            cp.start()

    @pl.when(lin + 1 < nb * ny * nx)
    def _():
        nxt = lin + 1
        ci = nxt // (ny * nx)
        cr = jax.lax.rem(nxt, ny * nx)
        for cp in copies(ci, cr // nx, jax.lax.rem(cr, nx),
                         jax.lax.rem(nxt, 2)):
            cp.start()

    for cp in copies(i, j, c, slot):
        cp.wait()

    t0 = it_ref[0]
    u0 = u_vmem[slot]
    # Masks stay int32 on the TILED path: int8 slabs measured ~1-3%
    # slower on chip (strided int8 row copies); int8 pays only on the
    # contiguous banded kernels (see pallas_biggrid3d).
    not_frozen = f_vmem[slot] == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (rows, wext), 0)
    lx = jax.lax.broadcasted_iota(jnp.int32, (rows, wext), 1)
    lz = local_row // yext
    ly = local_row - lz * yext
    # True coords: z = i*band + lz - k, y = j*yt + ly - _HY,
    # x = c*wt + lx - _HX; _HY and _HX are even, and -k flips nothing mod 2
    # beyond the k term itself (same derivation as pallas_biggrid3d).
    parity = (lz + i * band - k + ly + j * yt + lx + c * wt) % 2

    def sweep(s, u):
        val = lse6(u, rows, wext, yext)
        valid = (
            (lz > s) & (lz < ext_z - 1 - s)
            & (ly > s) & (ly < yext - 1 - s)
            & (lx > s) & (lx < wext - 1 - s)
        )
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[i, j * nx + c] = jnp.max(jnp.abs(u1 - u0))
    if u1_out is not None:
        for p in range(band):
            u1_out[p] = u1[(k + p) * yext + _HY : (k + p) * yext + _HY + yt,
                           _HX : _HX + wt]
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    for p in range(band):
        u_out[p] = u[(k + p) * yext + _HY : (k + p) * yext + _HY + yt,
                     _HX : _HX + wt]


def _tile3d_kernel(it_ref, u_hbm, f_hbm, u_out, delta_ref,
                   u_vmem, f_vmem, sems,
                   *, num_sweeps, band, k, yt, wt, hp2):
    _tile3d_kernel_impl(it_ref, u_hbm, f_hbm, u_out, None, delta_ref,
                        u_vmem, f_vmem, sems, num_sweeps=num_sweeps,
                        band=band, k=k, yt=yt, wt=wt, hp2=hp2)


def _tile3d_kernel_check(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                         u_vmem, f_vmem, sems,
                         *, num_sweeps, band, k, yt, wt, hp2):
    _tile3d_kernel_impl(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                        u_vmem, f_vmem, sems, num_sweeps=num_sweeps,
                        band=band, k=k, yt=yt, wt=wt, hp2=hp2)


def _chunk_call(u_pad, frozen_pad, iteration, num_sweeps, band, k, yt, wt,
                hp2, interpret, with_check):
    rp, wp = u_pad.shape
    yext = yt + 2 * _HY
    wext = wt + 2 * _HX
    nx = (wp - 2 * _HX) // wt
    assert nx * wt + 2 * _HX == wp, (wp, wt)
    assert rp % hp2 == 0, (rp, hp2)
    dp = rp // hp2
    nb = (dp - 2 * k) // band
    ny = (hp2 - 2 * _HY) // yt
    assert nb * band + 2 * k == dp, (dp, band, k)
    assert ny * yt + 2 * _HY == hp2, (hp2, yt)
    assert num_sweeps <= min(k, _HY, _HX)

    out_shapes = [
        jax.ShapeDtypeStruct((nb * band, ny * yt, nx * wt), jnp.float32),
        jax.ShapeDtypeStruct((nb, ny * nx), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((band, yt, wt), lambda i, j, c: (i, j, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if with_check:
        out_shapes.insert(1, out_shapes[0])
        out_specs.insert(1, out_specs[0])
        kern = _tile3d_kernel_check
    else:
        kern = _tile3d_kernel

    outs = pl.pallas_call(
        functools.partial(kern, num_sweeps=num_sweeps, band=band, k=k,
                          yt=yt, wt=wt, hp2=hp2),
        grid=(nb, ny, nx),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((2, (band + 2 * k) * yext, wext), jnp.float32),
            pltpu.VMEM((2, (band + 2 * k) * yext, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2 * (band + 2 * k))),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_pad, frozen_pad)
    return outs, (dp, hp2, nb, ny, nx)


def _paste(u_pad, center, k, hp2):
    """DUS the (nb*band, ny*yt, nx*wt) centre block back into the flat
    padded volume."""
    wp = u_pad.shape[1]
    dp = u_pad.shape[0] // hp2
    u3 = u_pad.reshape(dp, hp2, wp)
    u3 = jax.lax.dynamic_update_slice(u3, center, (k, _HY, _HX))
    return u3.reshape(dp * hp2, wp)


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "yt", "wt", "hp2",
                              "interpret")
)
def sweep_chunk_tiled3d(
    u_pad: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    yt: int,
    wt: int,
    hp2: int,
    interpret: bool = False,
):
    """num_sweeps (<= k) 3D sweeps over the guard-padded flat volume via
    (z, y, x) tiles. Returns (u_pad', delta of the chunk's first sweep)."""
    (out_u, out_delta), _ = _chunk_call(
        u_pad, frozen_pad, iteration, num_sweeps, band, k, yt, wt, hp2,
        interpret, with_check=False)
    return _paste(u_pad, out_u, k, hp2), jnp.max(out_delta)


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "yt", "wt", "hp2",
                              "interpret")
)
def sweep_chunk_tiled3d_check(
    u_pad: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    yt: int,
    wt: int,
    hp2: int,
    interpret: bool = False,
):
    """Check chunk: returns ``(out_uk, out_u1, delta)`` centre blocks; the
    caller pastes whichever the protocol selects (folded staggered check)."""
    (out_uk, out_u1, out_delta), _ = _chunk_call(
        u_pad, frozen_pad, iteration, num_sweeps, band, k, yt, wt, hp2,
        interpret, with_check=True)
    return out_uk, out_u1, jnp.max(out_delta)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledVolume:
    u: jax.Array          # f32[(nb*band + 2k) * (ny*yt + 2*_HY), nx*wt + 2*_HX]
    frozen: jax.Array     # int32 same shape (int8 slabs measured slower)
    depth: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    hp2: int = dataclasses.field(metadata=dict(static=True))
    band: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    yt: int = dataclasses.field(metadata=dict(static=True))
    wt: int = dataclasses.field(metadata=dict(static=True))


def pad_state(state: GridState, chunk_depth: int = 2,
              band: int | None = None, k: int | None = None,
              yt: int | None = None, wt: int | None = None) -> TiledVolume:
    d, h, w = state.u.shape
    if band is None or k is None or yt is None or wt is None:
        band, k, yt, wt = choose_layout((d, h, w), chunk_depth)
    nb = -(-d // band)
    ny = -(-h // yt)
    nx = -(-w // wt)
    dp = nb * band + 2 * k
    hp2 = ny * yt + 2 * _HY
    wp = nx * wt + 2 * _HX
    u, frozen = _pad_arrays(state.u, state.locked, d, h, w, dp, hp2, wp, k)
    return TiledVolume(u=u, frozen=frozen,
                       depth=d, height=h, width=w, hp2=hp2,
                       band=band, k=k, yt=yt, wt=wt)


@functools.partial(
    jax.jit, static_argnames=("d", "h", "w", "dp", "hp2", "wp", "k"))
def _pad_arrays(u, locked, d: int, h: int, w: int, dp: int, hp2: int,
                wp: int, k: int):
    # One device program: no host interior-mask upload, XLA-managed
    # transients (see solver/_padding.py).
    up = jnp.full((dp, hp2, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    up = jax.lax.dynamic_update_slice(
        up, u.astype(jnp.float32), (k, _HY, _HX))
    frozen = jnp.ones((dp, hp2, wp), dtype=jnp.int32)
    frozen = jax.lax.dynamic_update_slice(
        frozen, locked.astype(jnp.int32), (k, _HY, _HX))
    interior = box_mask((dp, hp2, wp), (k + 1, _HY + 1, _HX + 1),
                        (k + d - 1, _HY + h - 1, _HX + w - 1))
    frozen = jnp.where(interior, frozen, 1)
    return up.reshape(dp * hp2, wp), frozen.reshape(dp * hp2, wp)


def unpad(g: TiledVolume) -> jax.Array:
    dp = g.u.shape[0] // g.hp2
    u3 = g.u.reshape(dp, g.hp2, g.u.shape[1])
    return u3[g.k : g.k + g.depth, _HY : _HY + g.height, _HX : _HX + g.width]


def update_n(state: GridState, num_steps: int,
             chunk_depth: int = 2, interpret: bool | None = None) -> GridState:
    """Anytime chunk stepper; semantics identical to core.update_n (delta
    from the overall first sweep). Full K-chunks run through the
    (z, y, x)-tiled ping-pong cycle kernel (one dispatch per power-of-two
    span instead of one per K sweeps + a full-volume paste each)."""
    from . import pallas_cycle

    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if state.u.ndim != 3:
        raise ValueError(f"pallas_tiled3d requires a 3D grid, got {state.u.ndim}D")
    g = pad_state(state, chunk_depth)
    u = g.u
    delta = None
    t = 0
    n_full, rem = divmod(num_steps, g.k)
    if n_full:
        u, _, delta = pallas_cycle.run_chain(
            pallas_cycle.sweep_cycle_tiled3d, u, None, g.frozen,
            state.iteration, n_full, g.k, g.band, g.yt, g.wt, g.hp2,
            interpret=interpret,
        )
        t = n_full * g.k
    if rem:
        u, dd = sweep_chunk_tiled3d(
            u, g.frozen, state.iteration + t, rem, g.band, g.k, g.yt, g.wt,
            g.hp2, interpret)
        if delta is None:
            delta = dd
    return dataclasses.replace(
        state,
        u=unpad(dataclasses.replace(g, u=u)),
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "band", "k", "yt", "wt",
                     "hp2", "interpret", "m_max"),
    donate_argnums=(0,),
)
def _solve_tiled3d(
    u, frozen_pad, epsilon, stagger: int, max_iterations, band: int,
    k: int, yt: int, wt: int, hp2: int, interpret: bool, m_max: int,
    it0=None, conv0=None, delta0=None,
):
    """Full solve protocol on the 3D-tiled path, one device program, with
    the staggered check folded into the first K-chunk of each cycle
    (harmonic_cpu.cpp:158-173 exit-state semantics). The post-check sweeps
    run through the (z, y, x)-tiled ping-pong cycle kernel with a fresh
    fill twin (probe40/42 pattern; at the production k=2 the chunked fori
    paid ~50 dispatches + 50 full-volume pastes per 100-sweep cycle —
    probe43 measured that structure at 5.9 G updates/s vs the 19.5 G
    chunk-chain rate)."""
    from .pallas_cycle import cycle_fill, sweep_cycle_tiled3d

    chunk_fn = sweep_chunk_tiled3d.__wrapped__
    check_fn = sweep_chunk_tiled3d_check.__wrapped__
    cycle_fn = sweep_cycle_tiled3d.__wrapped__
    cd = min(k, stagger)

    def paste(uu, center):
        return _paste(uu, center, k, hp2)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        out_uk, out_u1, delta = check_fn(
            u, frozen_pad, iteration, cd, band, k, yt, wt, hp2, interpret)
        done = (delta < epsilon) & (iteration + 1 >= m_max)

        def finish(args):
            u, iteration = args
            return paste(u, out_u1), iteration + 1

        def run_rest(args):
            u, iteration = args
            u = paste(u, out_uk)
            iteration = iteration + cd
            n_full, rem = divmod(stagger - cd, k)
            if n_full:
                u, _ = cycle_fill(cycle_fn, u, frozen_pad, iteration,
                                  n_full, k, band, yt, wt, hp2,
                                  interpret=interpret)
                iteration = iteration + n_full * k
            if rem:
                u, _ = chunk_fn(u, frozen_pad, iteration, rem, band, k, yt,
                                wt, hp2, interpret)
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(done, finish, run_rest, (u, iteration))
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
    chunk_depth: int = 2,
    interpret: bool | None = None,
) -> GridState:
    """Relax a wide-plane 3D volume to convergence; protocol identical to
    core.solve (harmonic_complete_cpu), one device program."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if state.u.ndim != 3:
        raise ValueError(f"pallas_tiled3d requires a 3D grid, got {state.u.ndim}D")
    g = pad_state(state, chunk_depth)
    u, iteration, delta, converged = _solve_tiled3d(
        g.u, g.frozen, state.epsilon, stagger, max_iterations, g.band,
        g.k, g.yt, g.wt, g.hp2, interpret, max(state.u.shape),
    )
    return dataclasses.replace(
        state,
        u=unpad(dataclasses.replace(g, u=u)),
        iteration=iteration,
        delta=delta,
        converged=converged,
    )


def solve_segments(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    segment_iterations: int = 1_000,
    chunk_depth: int = 2,
    interpret: bool | None = None,
) -> GridState:
    """Wide-plane solve-to-convergence as watchdog-safe compiled SEGMENTS
    (the pallas_biggrid.solve_segments pattern): each dispatch resumes
    the SAME compiled while loop at the previous segment's iteration,
    donating the padded buffers across dispatches — bit-identical
    trajectories to :func:`solve`. Wide-plane volumes NEED this: their
    ``iter >= max(shape)`` floor (e.g. 2048 at 32x2048x2048) rarely fits
    one sub-watchdog dispatch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if state.u.ndim != 3:
        raise ValueError(f"pallas_tiled3d requires a 3D grid, got {state.u.ndim}D")
    g = pad_state(state, chunk_depth)
    u = g.u
    from .._segments import run_pipelined

    def seg(uu, bound, it0, cv, dl):
        return _solve_tiled3d(
            uu, g.frozen, state.epsilon, stagger, bound, g.band,
            g.k, g.yt, g.wt, g.hp2, interpret, max(state.u.shape), it0=it0, conv0=cv, delta0=dl,
        )

    u, it, delta, converged = run_pipelined(
        seg, u, state.epsilon, max_iterations, segment_iterations)
    return dataclasses.replace(
        state,
        u=unpad(dataclasses.replace(g, u=u)),
        iteration=it,
        delta=delta,
        converged=converged,
    )
