"""Resident guard-aligned 3D shard layout: tile-pure halo exchange.

The 3D sharded composition's 3.1x tax (9.9 vs 30.6 G updates/s at 256³ on
a 1x1 mesh — ROADMAP 3b, VERDICT r3 item 1) is NOT the per-shard kernel:
it is the per-chunk XLA relayout around it. Every k=2 sweeps,
:mod:`epic_tpu.parallel.sharded3d` concatenates halo strips into a
lane/sublane-misaligned extended volume, pads it (u AND mask) to the
banded kernel layout, and slices the centre back — four to five
full-volume copies per two sweeps. This module removes all of them:

- each shard's state lives PERMANENTLY in the
  :mod:`epic_tpu.solver.pallas_tiled3d` padded layout
  ``f32[(nb*band + 2k) * (2*_HY + h_loc + 2*_HY... see below), wp]`` —
  precisely, planes ``[k, k+d)`` hold the volume, each plane padded with
  ``_HY`` (16) guard rows per side and ``_HX`` (128) guard lanes per side.
  In the unsharded kernel those guards are frozen padding; here they hold
  the y/x NEIGHBOUR faces, refreshed by a tile-pure exchange — every
  guard write is a static-offset ``dynamic_update_slice`` on (8, 128)
  tile boundaries (the k-wide strip DUS that read-modify-writes crossed
  tiles measured 5.8 G — ROADMAP 3b);
- the per-chunk compute is the tiled3d ping-pong cycle kernel
  (:func:`epic_tpu.solver.pallas_cycle._cycle_kernel_tiled3d`, nc=1) for
  every chunk — full k-sweep chunks and shallow ``ns`` remainder/check
  chunks alike (no pastes anywhere). Its parity math assumes even global
  offsets, which the 8-aligned shard rows and 128-aligned shard lanes
  guarantee, so shard coordinates change nothing mod 2;
- slabs whose halo reaches a shard edge read the guard areas exactly as
  the unsharded kernel reads its frozen padding — except the cells are
  unfrozen neighbour data, updated transiently under the slab trapezoid,
  duplicating the owning shard's arithmetic (the same temporal-blocking
  argument as :func:`epic_tpu.parallel.sharded3d._band_shard3d_kernel`),
  so sweep-0 deltas pmax to the exact global staggered-check residual;
- the ping-pong twin is a FRESH fill per chunk: carried aliased pairs
  cost full-array copies at loop joins (probe36/40/42), while the twin is
  write-only in the kernel (centres land in it, its guards are refreshed
  by the next exchange, its padding holds the pad fill).

z stays resident per shard (plane-sharded ``P(None, 'my', 'mx')`` meshes
only — the regime the banded composition serves); bands tile z inside the
kernel. Guard redundancy is ``(yext/yt)(wext/wt)`` minus the unsharded
kernel's own padding — e.g. +29% at 256³ shards, +9% at 1024-wide shards
— against the four full-volume relayout copies it removes. Unlike the
plane-banded per-shard kernel, the slab budget is bounded at ANY plane
area, so this layout also serves the >=1k-wide shards where plane-banding
cannot compile at all (probe24 wall). The reference has no analogue: its
grids must fit one device (harmonic_model_gpu.cu:76-106) and its CUDA
path refuses 3D outright (harmonic_gpu.cu:158-165).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..grid import GridState
from ..solver.pallas_tiled3d import _HX, _HY
from .sharded import _neighbor_perm
from .sharded3d import _has_z, _pad_for_mesh, padded_shape

_VMEM_LIMIT = 128 * 1024 * 1024


def tile_layouts(d: int, h_loc: int, w_loc: int, chunk_depth: int = 2):
    """Candidate (band, k, yt, wt) slab layouts for one shard, sorted by
    total halo redundancy. The structure is pallas_tiled3d.tile_layouts
    — tile extents need NOT divide the shard: y/x round-up padding lives
    BEYOND the guard rows/tiles (interior at (_HY, _HX), guards
    immediately after it at (_HY + h_loc, _HX + w_loc), frozen padding
    filling the remainder of the tile grid; the padded cells are frozen
    and their kernel writebacks are overwritten by the next exchange).
    An earlier divisor-constrained chooser cost 12.5% redundancy (2.81 vs
    2.5) plus 45% more slabs at 64x1024x1024 shards. The candidate lists
    add small tiles (yt 8/16) so shallow shards — (8, 1)-mesh strips —
    stay representable."""
    from ..solver.pallas_biggrid3d import EXT_BAND_CELL_BUDGET
    from ..solver.pallas_tiled3d import _round_up

    out = []
    for k in (2, 4):
        if k > max(2, chunk_depth):
            continue
        for band in (2, 4, 8, 16, 32):
            if band > max(1, d):
                continue
            ext_z = band + 2 * k
            for yt in (8, 16, 32, 64, 96, 224, 480, 992):
                if yt > _round_up(h_loc, 8):
                    continue
                yext = yt + 2 * _HY
                for wt in (128, 256, 512, 768, 1024, 1792, 3840):
                    if wt > _round_up(w_loc, 128):
                        continue
                    wext = wt + 2 * _HX
                    if ext_z * yext * wext > EXT_BAND_CELL_BUDGET:
                        continue
                    red = (ext_z / band) * (yext / yt) * (wext / wt)
                    out.append((red, -k, band, k, yt, wt))
    return sorted(out)


def eligible(d: int, h_loc: int, w_loc: int, chunk_depth: int = 2) -> bool:
    """Whether a shard extent can take the resident layout: tile-pure
    guard writes need 8-aligned rows and 128-aligned lanes (which also
    keep the reused kernels' parity math exact — shard offsets vanish
    mod 2, and the guard row/lane offsets _HY + h_loc / _HX + w_loc stay
    tile-aligned), and a slab layout must fit the scoped-VMEM budget."""
    return (h_loc % 8 == 0 and w_loc % 128 == 0
            and bool(tile_layouts(d, h_loc, w_loc, chunk_depth)))


def choose_layout(d: int, h_loc: int, w_loc: int, chunk_depth: int = 2):
    cands = tile_layouts(d, h_loc, w_loc, chunk_depth)
    if not cands:
        raise ValueError(
            f"no resident 3D slab layout fits the VMEM budget for a "
            f"{d}x{h_loc}x{w_loc} shard")
    _, _, band, k, yt, wt = cands[0]
    return band, k, yt, wt


def _plane_dims(h_loc: int, w_loc: int, yt: int, wt: int):
    """(hp2, wp): per-plane padded extents for a shard under (yt, wt)."""
    ny = -(-h_loc // yt)
    nx = -(-w_loc // wt)
    return ny * yt + 2 * _HY, nx * wt + 2 * _HX


def _check_shard(shape, mesh: Mesh, chunk_depth: int) -> None:
    if _has_z(mesh):
        raise ValueError(
            "the resident 3D layout needs a plane-sharded mesh (z "
            "resident); z-sharded meshes use sharded3d kernel='pallas'")
    dp, hp, wp = padded_shape(shape, mesh)
    h_loc = hp // mesh.shape["my"]
    w_loc = wp // mesh.shape["mx"]
    if not eligible(dp, h_loc, w_loc, chunk_depth):
        raise ValueError(
            "the resident 3D layout needs 8-aligned shard rows, "
            "128-aligned shard lanes and a feasible divisor slab layout "
            f"(got {dp}x{h_loc}x{w_loc} local blocks); use "
            "sharded3d.update_n/solve for such shards")


# ---------------------------------------------------------------------------
# tile-pure guard exchange (inside shard_map)
# ---------------------------------------------------------------------------


def _exchange_guards(u_flat, mesh: Mesh, h_loc: int, w_loc: int, hp2: int):
    """Refresh the y guard rows and x guard lane-tiles of every plane.

    Phase 1 ppermutes the _HY interior face rows (all planes, full width)
    into the neighbour's guard rows; phase 2 ppermutes the full-height
    interior face lane tiles (_HX lanes), carrying the just-written guard
    rows so corners arrive transitively. Every write is a static-offset
    rank-3 ``dynamic_update_slice`` on (8, 128) tile boundaries.
    Out-of-mesh guards arrive as ppermute zero-fill and are frozen by the
    resident mask (:func:`_pad_resident`)."""
    rp, wp = u_flat.shape
    dp = rp // hp2
    u = u_flat.reshape(dp, hp2, wp)
    nmy = mesh.shape["my"]
    nmx = mesh.shape["mx"]
    # Interior rows are [_HY, _HY + h_loc); bottom face = last _HY of them.
    top = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, h_loc, h_loc + _HY, axis=1),
        "my", _neighbor_perm(nmy, +1))
    bot = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, _HY, 2 * _HY, axis=1),
        "my", _neighbor_perm(nmy, -1))
    u = jax.lax.dynamic_update_slice(u, top, (0, 0, 0))
    u = jax.lax.dynamic_update_slice(u, bot, (0, _HY + h_loc, 0))
    # Interior lanes are [_HX, _HX + w_loc); faces are whole lane tiles.
    left = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, w_loc, _HX + w_loc, axis=2),
        "mx", _neighbor_perm(nmx, +1))
    right = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, _HX, 2 * _HX, axis=2),
        "mx", _neighbor_perm(nmx, -1))
    u = jax.lax.dynamic_update_slice(u, left, (0, 0, 0))
    u = jax.lax.dynamic_update_slice(u, right, (0, 0, _HX + w_loc))
    return u.reshape(rp, wp)


def _pad_resident(u_loc, frozen_loc, mesh: Mesh, k: int, dp: int,
                  hp2: int, wp: int):
    """Build the resident pair (u f32[dp*hp2, wp], frozen int32 — the
    tiled kernels keep int32 masks) from a shard's local volume, ONCE per
    entry call. Interior at (k, _HY, _HX); guard rows/tiles immediately
    after it; round-up tile padding frozen beyond them. The frozen guards
    are exchanged here (the mask is static within a call); ppermute
    zero-fill marks out-of-mesh guards frozen."""
    d, h_loc, w_loc = u_loc.shape
    u = jnp.pad(
        u_loc,
        ((k, dp - d - k), (_HY, hp2 - h_loc - _HY), (_HX, wp - w_loc - _HX)),
        constant_values=np.float32(C.LOG_SPACE_OBSTACLE),
    ).reshape(dp * hp2, wp)
    u = _exchange_guards(u, mesh, h_loc, w_loc, hp2)
    unfrozen = jnp.pad(
        (~frozen_loc).astype(jnp.float32),
        ((k, dp - d - k), (_HY, hp2 - h_loc - _HY), (_HX, wp - w_loc - _HX)),
        constant_values=0.0,
    ).reshape(dp * hp2, wp)
    unfrozen = _exchange_guards(unfrozen, mesh, h_loc, w_loc, hp2)
    frozen = (unfrozen == 0.0).astype(jnp.int32)
    return u, frozen


# ---------------------------------------------------------------------------
# per-shard chunk dispatches (reusing the tiled3d kernel bodies)
# ---------------------------------------------------------------------------


def _grid_dims(rp: int, wp: int, band: int, k: int, yt: int, wt: int,
               hp2: int):
    dp = rp // hp2
    nb = (dp - 2 * k) // band
    ny = (hp2 - 2 * _HY) // yt
    nx = (wp - 2 * _HX) // wt
    assert nb * band + 2 * k == dp, (dp, band, k)
    assert ny * yt + 2 * _HY == hp2, (hp2, yt)
    assert nx * wt + 2 * _HX == wp, (wp, wt)
    return nb, ny, nx


def _chunk_cycle(u_src, u_dst, f_res, it, band, k, yt, wt, hp2, interpret,
                 interior=None, ns=None):
    """One ns-sweep chunk (ns <= k, default k) through the ping-pong
    tiled3d cycle kernel (nc=1): slabs read the src buffer, centres land
    straight in the dst buffer — no paste, even for shallow remainder /
    check chunks. Returns (stale, current, delta) where stale aliases
    ``u_src`` and current aliases ``u_dst``. With
    ``interior=(d, h_loc, w_loc)`` the delta is the INTERIOR-ONLY sweep-0
    diff (bit-equal to an interior-only diff over the same sweep — the
    pad-safe folded check); else it is the raw pad-poisoned slab delta
    (discard it)."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..solver.pallas_cycle import _cycle_kernel_tiled3d

    if ns == k:
        ns = None  # one jaxpr for the full-depth chunk
    rp, wp = u_src.shape
    nb, ny, nx = _grid_dims(rp, wp, band, k, yt, wt, hp2)
    nsteps = nb * ny * nx
    ext_z = band + 2 * k
    yext = yt + 2 * _HY
    wext = wt + 2 * _HX
    scal = jnp.asarray(it).astype(jnp.int32).reshape(1)
    vma = frozenset({"my", "mx"})
    a_out, b_out, deltas = pl.pallas_call(
        _ft.partial(_cycle_kernel_tiled3d, k=k, band=band, yt=yt, wt=wt,
                    hy=_HY, hx=_HX, hp2=hp2, nb=nb, ny=ny, nx=nx, nc=1,
                    interior=interior, ns=ns),
        grid=(1, nsteps),
        out_shape=(
            jax.ShapeDtypeStruct((rp, wp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((rp, wp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, nsteps), jnp.float32, vma=vma),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext_z * yext, wext), jnp.float32),
            pltpu.VMEM((2, ext_z * yext, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3, ext_z)),
            pltpu.SemaphoreType.DMA((2, band)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(scal, u_src, u_dst, f_res)
    return a_out, b_out, jnp.max(deltas)


def _fill_twin(rp: int, wp: int, interpret: bool):
    """Fresh ping-pong twin (see resident.py::_fill_twin: pcast marks the
    replicated fill varying for the manual-axes type system; skipped on
    the check_vma=False interpret path)."""
    twin = jnp.full((rp, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    if not interpret:
        twin = jax.lax.pvary(twin, ("my", "mx"))
    return twin


# ---------------------------------------------------------------------------
# entry points (shard_map programs)
# ---------------------------------------------------------------------------

_SPEC = P(None, "my", "mx")


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "chunk_depth", "interpret"),
    donate_argnums=(0,),
)
def _update_n_resident(
    u, frozen, iteration, mesh: Mesh, num_steps: int,
    chunk_depth: int = 2, interpret: bool = False,
):
    """num_steps 3D sweeps on the resident layout: ONE pad+guard-exchange
    at entry, full k-chunks through the ping-pong cycle dispatch with
    tile-pure guard refreshes between them (guards must be fresh per
    chunk — slab trapezoids only cover within-chunk staleness), a
    remainder chunk through the functional kernel, ONE centre slice at
    exit. Delta (pmax) from the overall first sweep — the first cycle
    chunk's interior-MASKED in-kernel sweep-0 delta (raw slab deltas
    include guard cells poisoned by round-up tile padding — the r4
    delta-poisoning lesson; the mask restores exactness with zero extra
    passes)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_SPEC, _SPEC, P()),
        out_specs=(_SPEC, P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, it0):
        d, h_loc, w_loc = u_loc.shape
        band, k, yt, wt = choose_layout(d, h_loc, w_loc, chunk_depth)
        nb = -(-d // band)
        dp = nb * band + 2 * k
        hp2, wp = _plane_dims(h_loc, w_loc, yt, wt)
        u_res, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, dp, hp2,
                                     wp)

        def chunk2(cur, alt, it, ns=None, interior=None):
            cur = _exchange_guards(cur, mesh, h_loc, w_loc, hp2)
            return _chunk_cycle(cur, alt, f_res, it, band, k, yt, wt,
                                hp2, interpret, interior, ns)

        # The overall-first-sweep delta is FOLDED into the first cycle
        # chunk as its interior-masked sweep-0 delta (pad-safe, bit-equal
        # to the 1-sweep prologue + interior diff it replaced); every
        # chunk — including shallow remainders — is ping-pong (no
        # pastes), the resident.py structure.
        ns1 = min(k, num_steps)
        alt = _fill_twin(dp * hp2, wp, interpret)
        stale, u_res, delta = chunk2(u_res, alt, it0, ns=ns1,
                                     interior=(d, h_loc, w_loc))
        it = it0 + ns1
        n_full, rem = divmod(num_steps - ns1, k)
        n2, odd = divmod(n_full, 2)

        def body(i, carry):
            # TWO chunks per fori body keep the carried pair's
            # positions stable, so both back-edge outputs alias their
            # inputs and the loop carries ZERO copies (the 2D
            # resident-iso probe A/B: 41.9 G paired vs 37.7
            # fresh-fill per chunk at 4096²).
            a, b, it2 = carry
            a_stale, b_new, _ = chunk2(a, b, it2)
            b_stale, a_new, _ = chunk2(b_new, a_stale, it2 + k)
            return a_new, b_stale, it2 + 2 * k

        u_res, stale, it = jax.lax.fori_loop(
            0, n2, body, (u_res, stale, it))
        if odd:
            stale, u_res, _ = chunk2(u_res, stale, it)
            it = it + k
        if rem:
            stale, u_res, _ = chunk2(u_res, stale, it, ns=rem)
        delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
        u3 = u_res.reshape(dp, hp2, wp)
        out = jax.lax.slice(
            u3, (k, _HY, _HX), (k + d, _HY + h_loc, _HX + w_loc))
        return out, delta.reshape(1)

    u, delta = run(u, frozen, iteration)
    return u, delta[0]


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stagger", "dims",
                     "chunk_depth", "interpret"),
    donate_argnums=(0,),
)
def _solve_resident(
    u, frozen, epsilon, mesh: Mesh, stagger: int, max_iterations,
    dims, chunk_depth: int = 2, interpret: bool = False, it0=None,
    conv0=None, delta0=None,
):
    """Solve-to-convergence with the while-loop INSIDE shard_map: the
    layout is built once and stays resident across the whole solve; the
    staggered-check delta is pmax-reduced so every shard takes identical
    branches (plain SPMD). Protocol identical to core.solve
    (harmonic_cpu.cpp:158-173). The staggered check is FOLDED into the
    cycle's first k-chunk (VERDICT r4 item 3): the kernel's
    interior-MASKED sweep-0 delta is the check value — pad-safe with
    zero extra passes, unlike the u1-staging fold that lost in the
    unsharded 3D solve (probe51: per-band u1 plane staging beat the tiny
    check chunk there; this fold stages nothing). The rare done-exit
    recomputes the single post-check sweep from the intact ping-pong
    src."""
    m_max = max(dims)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_SPEC, _SPEC, P(), P(), P(), P(), P()),
        out_specs=(_SPEC, P(), P(), P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, eps, mi, i0, cv0, dl0):
        d, h_loc, w_loc = u_loc.shape
        band, k, yt, wt = choose_layout(d, h_loc, w_loc, chunk_depth)
        nb = -(-d // band)
        dp = nb * band + 2 * k
        hp2, wp = _plane_dims(h_loc, w_loc, yt, wt)
        u_res, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, dp, hp2,
                                     wp)

        def chunk2(cur, alt, it, ns=None, interior=None):
            cur = _exchange_guards(cur, mesh, h_loc, w_loc, hp2)
            return _chunk_cycle(cur, alt, f_res, it, band, k, yt, wt,
                                hp2, interpret, interior, ns)

        ns1 = min(k, stagger)
        n_full, rem = divmod(stagger - ns1, k)
        n2, odd = divmod(n_full, 2)

        def cond(carry):
            _, _, iteration, _, done = carry
            return ~done & (iteration < mi)

        def body(carry):
            # NO lax.cond around the cycle's rest: pallas chunk chains
            # inside a cond branch measured 13.9 vs 18.0 G without it
            # (probe resident3d-solve-iso while-nocond) — instead the
            # pre-check src buffer survives the body (the first chunk only
            # READS it; the rest ping-pongs between the check chunk's dst
            # and a SECOND fresh twin), the rest runs unconditionally (one
            # wasted cycle per solve at the done-exit), and the 1-sweep
            # finish runs AFTER the loop from the preserved src —
            # bit-identical results, iteration-exact.
            u_res, twin1, iteration, _, _ = carry
            # twin1 RECYCLES the dead preserved-src carry slot (see
            # resident.py: centres fully overwrite, guards re-exchange,
            # stale round-up bytes are frozen and unread).
            src, cur, delta = chunk2(u_res, twin1, iteration, ns=ns1,
                                     interior=(d, h_loc, w_loc))
            delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
            done = (delta < eps) & (iteration + 1 >= m_max)
            twin2 = _fill_twin(dp * hp2, wp, interpret)
            it = iteration + ns1

            def fbody(i, c):
                a, b, it2 = c
                a_stale, b_new, _ = chunk2(a, b, it2)
                b_stale, a_new, _ = chunk2(b_new, a_stale, it2 + k)
                return a_new, b_stale, it2 + 2 * k

            cur, twin2, it = jax.lax.fori_loop(
                0, n2, fbody, (cur, twin2, it))
            if odd:
                twin2, cur, _ = chunk2(cur, twin2, it)
                it = it + k
            if rem:
                twin2, cur, _ = chunk2(cur, twin2, it, ns=rem)
                it = it + rem
            return cur, src, it, delta, done

        u_res, src, it_next, delta, converged = jax.lax.while_loop(
            cond, body,
            (u_res, _fill_twin(dp * hp2, wp, interpret),
             i0.astype(jnp.int32), dl0, cv0),
        )

        def finish(args):
            u_res, src, it_base = args
            # One 1-sweep ping-pong chunk from the preserved pre-check
            # src reproduces the post-check-sweep exit state.
            _, u1, _ = chunk2(src, u_res, it_base, ns=1)
            return u1

        u_res = jax.lax.cond(
            converged & ~cv0, finish, lambda args: args[0],
            (u_res, src, it_next - stagger))
        iteration = jnp.where(converged & ~cv0,
                              it_next - stagger + 1, it_next)
        u3 = u_res.reshape(dp, hp2, wp)
        out = jax.lax.slice(
            u3, (k, _HY, _HX), (k + d, _HY + h_loc, _HX + w_loc))
        return (out, iteration.reshape(1), delta.reshape(1),
                converged.reshape(1))

    # max_iterations is a TRACED bound and it0 a traced start, so
    # solve_segments can resume the identical loop across watchdog-safe
    # dispatch segments (the pallas_biggrid.solve_segments pattern; the
    # interior slice + re-pad roundtrip between segments is exact — the
    # next body re-exchanges guards from interiors either way).
    from .._segments import carry_defaults

    start, cv, dl = carry_defaults(epsilon, it0, conv0, delta0)
    u, iteration, delta, converged = run(
        u, frozen, epsilon, jnp.asarray(max_iterations, jnp.int32), start, cv, dl)
    return u, iteration[0], delta[0], converged[0]


def update_n(state: GridState, num_steps: int, mesh: Mesh,
             chunk_depth: int = 2,
             interpret: bool | None = None) -> GridState:
    """Sharded 3D anytime chunk on the resident layout; semantics of
    core.update_n on a device mesh (delta from the overall first sweep)."""
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    _check_shard(state.u.shape, mesh, chunk_depth)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    d, h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, _SPEC)
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, delta = _update_n_resident(u, frozen, state.iteration, mesh,
                                  num_steps, chunk_depth, interpret)
    return dataclasses.replace(
        state,
        u=u[:d, :h, :w],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


def solve(
    state: GridState,
    mesh: Mesh,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 2,
    interpret: bool | None = None,
) -> GridState:
    """Sharded 3D solve-to-convergence on the resident layout; protocol
    identical to core.solve."""
    _check_shard(state.u.shape, mesh, chunk_depth)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    d, h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, _SPEC)
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, iteration, delta, converged = _solve_resident(
        u, frozen, state.epsilon, mesh, stagger, max_iterations,
        (d, h, w), chunk_depth, interpret,
    )
    return dataclasses.replace(
        state,
        u=u[:d, :h, :w],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )


def solve_segments(
    state: GridState,
    mesh: Mesh,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    segment_iterations: int = 2_000,
    chunk_depth: int = 2,
    interpret: bool | None = None,
) -> GridState:
    """Sharded 3D solve-to-convergence as watchdog-safe compiled SEGMENTS
    (the pallas_biggrid.solve_segments pattern on the resident layout):
    each dispatch resumes the SAME compiled shard_map while loop at the
    previous segment's iteration — bit-identical trajectories to
    :func:`solve`. Mega-volume sharded convergences hold minutes of
    device work and never fit one sub-watchdog dispatch."""
    _check_shard(state.u.shape, mesh, chunk_depth)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    d, h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, _SPEC)
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    from .._segments import run_pipelined

    def seg(uu, bound, it0, cv, dl):
        return _solve_resident(
            uu, frozen, state.epsilon, mesh, stagger, bound,
            (d, h, w), chunk_depth, interpret, it0=it0, conv0=cv,
            delta0=dl,
        )

    u, it, delta, converged = run_pipelined(
        seg, u, state.epsilon, max_iterations, segment_iterations)
    return dataclasses.replace(
        state,
        u=u[:d, :h, :w],
        iteration=it,
        delta=delta,
        converged=converged,
    )
