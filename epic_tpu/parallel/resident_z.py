"""Z-resident 3D shard layout: cube-regime volumes at banded-kernel rates.

The cube regime (≲832² planes, e.g. the 256³ battery volume) is the 3D
banded kernel's home: 30.5 G updates/s unsharded. Both existing sharded
compositions lose most of that there (VERDICT r4 item 2): the banded
composition pays 4-5 full-volume XLA relayout copies per chunk (9.9 G),
and the plane-guard resident layout (:mod:`epic_tpu.parallel.resident3d`)
pays ~2x plane redundancy once shards are ≤256 lanes wide — its _HY/_HX
guard tiles are sized for wide-plane shards (8.7 G). The fix is to shard
the OTHER axis: over a z-only mesh (``make_mesh3d((n, 1, 1))``) every
shard keeps its full H x W planes local and the decomposition is
plane-granular —

- each shard's state lives PERMANENTLY in the
  :mod:`epic_tpu.solver.pallas_biggrid3d` flattened plane layout
  ``f32[(k + nb*band + k) * hp, wp]``: k guard PLANES per side, interior
  planes [k, k + d_loc), the top guard immediately after the interior
  (round-up band padding beyond it, frozen), in-plane faces frozen rings
  exactly as the unsharded kernel's;
- the guard exchange is two contiguous ``[k*hp, wp]`` row-block
  ppermutes + static-offset DUS (hp % 8 == 0 keeps every write
  tile-pure) — there is no in-plane exchange at all, and guard
  redundancy is 2k/d_loc planes (~6% at 32-plane shards) instead of the
  plane-guard layout's ~2x;
- the per-chunk compute is a ping-pong plane-banded DMA kernel
  (:func:`_resident_z_kernel` — the 2D :func:`epic_tpu.parallel.resident.
  _resident_kernel` pattern at plane granularity): bands DMA from the src
  buffer, band-centre planes land straight in the dst buffer, cross-band
  prefetch double-buffered; sweep math (parity incl. the 3D class
  convention, trapezoid, lse6 op order) is identical to
  :func:`epic_tpu.solver.pallas_biggrid3d._band3d_kernel_dma` with the
  shard's global z origin added, so results are bit-equal to the
  unsharded kernel and the sharded3d composition;
- check/update deltas are the kernel's INTERIOR-masked sweep-0 deltas
  (guard planes adjacent to frozen round-up padding are pad-poisoned —
  the resident3d lesson — and out-of-scope of the check anyway).

Solve runs the whole convergence while-loop inside shard_map with the
staggered check FOLDED into the cycle's first chunk (the resident.py
structure): no dedicated check chunk, no pastes; the rare done-exit
recomputes the single post-check sweep from the intact ping-pong src.

The reference has no analogue: its grids must fit one device
(harmonic_model_gpu.cu:76-106) and its CUDA path refuses 3D outright
(harmonic_gpu.cu:158-165).
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
from ..solver.pallas_biggrid3d import EXT_BAND_CELL_BUDGET, _round_up
from .sharded import _neighbor_perm
from .sharded3d import _has_z, _pad_for_mesh, padded_shape

_VMEM_LIMIT = 128 * 1024 * 1024
_SPEC = P("mz", "my", "mx")


def _layout(d_loc: int, h: int, w: int, chunk_depth: int = 2):
    """(band, k, nb, hp, wp, dp): plane-band structure for one shard —
    the pallas_biggrid3d budget math (int8 masks => 4/5 byte budget), k
    capped by the chunk depth. Bands need not divide d_loc: round-up
    planes live beyond the top guard, frozen."""
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    plane = hp * wp
    ext_max = max(3, (EXT_BAND_CELL_BUDGET * 4 // 5) // plane)
    k = max(1, min(chunk_depth, ext_max // 4))
    band_max = max(1, ext_max - 2 * k)
    nb = -(-d_loc // band_max)
    band = -(-d_loc // nb)
    return band, k, nb, hp, wp, nb * band + 2 * k


def eligible(d_loc: int, h: int, w: int, chunk_depth: int = 2) -> bool:
    """Whether a shard can take the z-resident layout: the plane-banded
    budget needs a >=3-plane extended band (the probe24 scoped-VMEM wall
    — wide-plane volumes route to resident3d instead)."""
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    band, k, *_ = _layout(d_loc, h, w, chunk_depth)
    return d_loc >= 1 and (band + 2 * k) * hp * wp <= EXT_BAND_CELL_BUDGET


def _check_shard(shape, mesh: Mesh, chunk_depth: int) -> None:
    if not _has_z(mesh):
        raise ValueError(
            "the z-resident layout needs a z-sharded mesh "
            "(make_mesh3d((n, 1, 1))); plane-sharded meshes use "
            "parallel.resident3d")
    if mesh.shape["my"] != 1 or mesh.shape["mx"] != 1:
        raise ValueError(
            "the z-resident layout shards z ONLY (my = mx = 1); mixed "
            "z+plane meshes use sharded3d kernel='pallas'")
    dp, hp_, wp_ = padded_shape(shape, mesh)
    d_loc = dp // mesh.shape["mz"]
    if not eligible(d_loc, hp_, wp_, chunk_depth):
        raise ValueError(
            "no z-resident plane-band layout fits the VMEM budget for a "
            f"{d_loc}x{hp_}x{wp_} shard (plane too wide — use "
            "parallel.resident3d for wide-plane volumes)")


# ---------------------------------------------------------------------------
# contiguous plane-block guard exchange (inside shard_map)
# ---------------------------------------------------------------------------


def _exchange_guards(u_flat, mesh: Mesh, k: int, d_loc: int, hp: int):
    """Refresh the k guard planes per side: two contiguous [k*hp, wp]
    row-block ppermutes, static-offset DUS on 8-row boundaries
    (hp % 8 == 0). Out-of-mesh guards arrive as ppermute zero-fill and
    are frozen by the resident mask (:func:`_pad_resident`)."""
    nmz = mesh.shape["mz"]
    # Interior planes are [k, k + d_loc); top face = last k of them.
    top = jax.lax.ppermute(
        jax.lax.slice_in_dim(u_flat, d_loc * hp, (d_loc + k) * hp, axis=0),
        "mz", _neighbor_perm(nmz, +1))
    bot = jax.lax.ppermute(
        jax.lax.slice_in_dim(u_flat, k * hp, 2 * k * hp, axis=0),
        "mz", _neighbor_perm(nmz, -1))
    u_flat = jax.lax.dynamic_update_slice(u_flat, top, (0, 0))
    u_flat = jax.lax.dynamic_update_slice(u_flat, bot, ((k + d_loc) * hp, 0))
    return u_flat


def _pad_resident(u_loc, frozen_loc, mesh: Mesh, k: int, hp: int, wp: int,
                  dp: int):
    """Build the resident pair (u f32[dp*hp, wp], frozen int8) from a
    shard's local volume, ONCE per entry call. Interior planes [k,
    k+d_loc), guard planes immediately around it, round-up band padding
    frozen beyond the top guard. The frozen guards are exchanged here
    (the mask is static within a call); ppermute zero-fill marks
    out-of-mesh guards frozen."""
    d_loc, h, w = u_loc.shape
    u = jnp.pad(
        u_loc,
        ((k, dp - d_loc - k), (0, hp - h), (0, wp - w)),
        constant_values=np.float32(C.LOG_SPACE_OBSTACLE),
    ).reshape(dp * hp, wp)
    u = _exchange_guards(u, mesh, k, d_loc, hp)
    unfrozen = jnp.pad(
        (~frozen_loc).astype(jnp.float32),
        ((k, dp - d_loc - k), (0, hp - h), (0, wp - w)),
        constant_values=0.0,
    ).reshape(dp * hp, wp)
    unfrozen = _exchange_guards(unfrozen, mesh, k, d_loc, hp)
    frozen = (unfrozen == 0.0).astype(jnp.int8)
    return u, frozen


# ---------------------------------------------------------------------------
# ping-pong resident plane-banded kernel
# ---------------------------------------------------------------------------


def _resident_z_kernel(scal_ref, u_src_in, u_dst_in, f_hbm, src_ref, dst_ref,
                       delta_ref, u_vmem, f_vmem, rsem, wsem,
                       *, num_sweeps, band, k, hp, wp, d_loc):
    """One <=k-sweep chunk on the z-resident layout: extended plane-bands
    DMA from the src buffer, band-centre planes DMA straight into the dst
    buffer (aliased HBM ping-pong — no output array, no paste).

    Sweep semantics match :func:`pallas_biggrid3d._band3d_kernel_dma`
    exactly (same parity incl. the 3D class convention, same plane
    trapezoid, same lse6 op order) with two resident-layout additions:
    the shard's global z origin z0 enters the parity, and ``edge_ok``
    keeps the outermost top guard plane (and everything beyond) read-only
    — the distance>=1 rule of the true k-extended block, the
    resident._resident_kernel guard at plane granularity. The sweep-0
    delta is INTERIOR-masked (planes [k, k+d_loc) only): guard planes
    adjacent to the frozen round-up band padding read the pad where the
    owning shard reads real data, so their raw |u1-u0| never decays (the
    resident3d delta-poisoning failure). scal = [t0, z0]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..solver._sweep_body import lse6

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    ext = band + 2 * k
    rows = ext * hp

    def copies(band_idx, slot):
        start = band_idx * band * hp
        return (
            pltpu.make_async_copy(
                src_ref.at[pl.ds(start, rows), :], u_vmem.at[slot],
                rsem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(start, rows), :], f_vmem.at[slot],
                rsem.at[slot, 1],
            ),
        )

    slot = jax.lax.rem(i, 2)

    def wait_write(wslot):
        # Drain one outstanding band writeback on wsem[wslot]; DMA waits
        # are (semaphore, size) pairs and every writeback shares one
        # shape, so a same-shaped descriptor stands in for the original.
        pltpu.make_async_copy(
            u_vmem.at[0, pl.ds(k * hp, band * hp), :],
            dst_ref.at[pl.ds(k * hp, band * hp), :],
            wsem.at[wslot],
        ).wait()

    # Deferred writeback (the resident._resident_kernel pattern): wait
    # the PREVIOUS program's write before the prefetch below overwrites
    # its u_vmem slot.
    @pl.when(i >= 1)
    def _():
        wait_write(jax.lax.rem(i + 1, 2))

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

    t0 = scal_ref[0]
    z0 = scal_ref[1]
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    local_plane = local_row // hp
    y = local_row - local_plane * hp
    parity = (z0 + local_plane + i * band - k + y + col) % 2
    # Update only the distance>=1 planes of the true k-extended block:
    # padded planes <= d_loc + 2k - 2 (the outermost top guard plane and
    # the round-up padding beyond it stay read-only).
    edge_ok = local_plane + i * band <= d_loc + 2 * k - 2

    def sweep(s, u):
        val = lse6(u, rows, wp, hp)
        valid = (local_plane > s) & (local_plane < ext - 1 - s) & edge_ok
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    d0 = jnp.abs(u1 - u0)
    gz = local_plane + i * band
    d0 = jnp.where((gz >= k) & (gz < k + d_loc), d0, 0.0)
    delta_ref[i, 0] = jnp.max(d0)
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_vmem[slot] = u
    pltpu.make_async_copy(
        u_vmem.at[slot, pl.ds(k * hp, band * hp), :],
        dst_ref.at[pl.ds((k + i * band) * hp, band * hp), :],
        wsem.at[slot],
    ).start()

    @pl.when(i == nb - 1)
    def _():
        wait_write(slot)


def _chunk_resident(u_src, u_dst, f_res, it0, z0, num_sweeps, band, k,
                    hp, wp, d_loc, interpret):
    """Dispatch one z-resident chunk; returns (stale, current, delta)
    with stale aliasing ``u_src`` and current aliasing ``u_dst``; delta
    is the interior-masked sweep-0 diff (the folded check value)."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rp, _ = u_src.shape
    nb = (rp // hp - 2 * k) // band
    scal = jnp.stack([it0, z0]).astype(jnp.int32)
    ext = band + 2 * k
    vma = frozenset({"mz", "my", "mx"})
    src_out, dst_out, deltas = pl.pallas_call(
        _ft.partial(_resident_z_kernel, num_sweeps=num_sweeps, band=band,
                    k=k, hp=hp, wp=wp, d_loc=d_loc),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((rp, wp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((rp, wp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32, vma=vma),
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
            pltpu.VMEM((2, ext * hp, wp), jnp.float32),
            pltpu.VMEM((2, ext * hp, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(scal, u_src, u_dst, f_res)
    return src_out, dst_out, jnp.max(deltas)


def _fill_twin(rp: int, wp: int, interpret: bool):
    """Fresh ping-pong twin (see resident.py::_fill_twin)."""
    twin = jnp.full((rp, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    if not interpret:
        twin = jax.lax.pvary(twin, ("mz", "my", "mx"))
    return twin


# ---------------------------------------------------------------------------
# entry points (shard_map programs)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "chunk_depth", "interpret"),
    donate_argnums=(0,),
)
def _update_n_resident(
    u, frozen, iteration, mesh: Mesh, num_steps: int,
    chunk_depth: int = 2, interpret: bool = False,
):
    """num_steps 3D sweeps on the z-resident layout: ONE
    pad+guard-exchange at entry, ping-pong plane-banded chunks with
    contiguous plane-block guard refreshes between them, ONE centre slice
    at exit. Delta (pmax) from the overall first sweep — the first
    chunk's interior-masked in-kernel sweep-0 delta."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_SPEC, _SPEC, P()),
        out_specs=(_SPEC, P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, it0):
        d_loc, h, w = u_loc.shape
        band, k, nb, hp, wp, dp = _layout(d_loc, h, w, chunk_depth)
        z0 = jax.lax.axis_index("mz") * d_loc
        u_res, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, hp, wp, dp)

        def chunk2(cur, alt, it, ns):
            cur = _exchange_guards(cur, mesh, k, d_loc, hp)
            return _chunk_resident(cur, alt, f_res, it, z0, ns, band, k,
                                   hp, wp, d_loc, interpret)

        ns1 = min(k, num_steps)
        alt = _fill_twin(dp * hp, wp, interpret)
        stale, u_res, delta = chunk2(u_res, alt, it0, ns1)
        it = it0 + ns1
        n_full, rem = divmod(num_steps - ns1, k)
        n2, odd = divmod(n_full, 2)

        def body(i, carry):
            # TWO chunks per fori body keep the carried pair's positions
            # stable (zero back-edge copies — resident.py's body).
            a, b, it2 = carry
            a_stale, b_new, _ = chunk2(a, b, it2, k)
            b_stale, a_new, _ = chunk2(b_new, a_stale, it2 + k, k)
            return a_new, b_stale, it2 + 2 * k

        u_res, stale, it = jax.lax.fori_loop(
            0, n2, body, (u_res, stale, it))
        if odd:
            stale, u_res, _ = chunk2(u_res, stale, it, k)
            it = it + k
        if rem:
            stale, u_res, _ = chunk2(u_res, stale, it, rem)
        delta = jax.lax.pmax(
            jax.lax.pmax(jax.lax.pmax(delta, "mz"), "my"), "mx")
        u3 = u_res.reshape(dp, hp, wp)
        out = jax.lax.slice(u3, (k, 0, 0), (k + d_loc, h, w))
        return out, delta.reshape(1)

    u, delta = run(u, frozen, iteration)
    return u, delta[0]


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stagger", "dims", "chunk_depth", "interpret"),
    donate_argnums=(0,),
)
def _solve_resident(
    u, frozen, epsilon, mesh: Mesh, stagger: int, max_iterations,
    dims, chunk_depth: int = 2, interpret: bool = False, it0=None,
    conv0=None, delta0=None,
):
    """Solve-to-convergence with the while-loop INSIDE shard_map on the
    z-resident layout; protocol identical to core.solve
    (harmonic_cpu.cpp:158-173). The staggered check is FOLDED into the
    cycle's first chunk (interior-masked in-kernel sweep-0 delta); the
    rare done-exit recomputes the single post-check sweep from the intact
    ping-pong src. max_iterations/it0 are traced so solve_segments can
    resume the identical loop."""
    m_max = max(dims)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_SPEC, _SPEC, P(), P(), P(), P(), P()),
        out_specs=(_SPEC, P(), P(), P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, eps, mi, i0, cv0, dl0):
        d_loc, h, w = u_loc.shape
        band, k, nb, hp, wp, dp = _layout(d_loc, h, w, chunk_depth)
        z0 = jax.lax.axis_index("mz") * d_loc
        u_res, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, hp, wp, dp)

        def chunk2(cur, alt, it, ns):
            cur = _exchange_guards(cur, mesh, k, d_loc, hp)
            return _chunk_resident(cur, alt, f_res, it, z0, ns, band, k,
                                   hp, wp, d_loc, interpret)

        def pmax3(x):
            return jax.lax.pmax(
                jax.lax.pmax(jax.lax.pmax(x, "mz"), "my"), "mx")

        ns1 = min(k, stagger)
        n_full, rem = divmod(stagger - ns1, k)
        n2, odd = divmod(n_full, 2)

        def cond(carry):
            _, _, iteration, _, done = carry
            return ~done & (iteration < mi)

        def body(carry):
            # NO lax.cond around the cycle's rest (probe
            # resident3d-solve-iso: pallas chunk chains inside a cond
            # branch measured 13.9 vs 18.0 G without it): the pre-check
            # src survives the body (the check chunk only READS it; the
            # rest ping-pongs between the check chunk's dst and a SECOND
            # fresh twin), the rest runs unconditionally (one wasted
            # cycle per solve at the done-exit), and the 1-sweep finish
            # runs AFTER the loop from the preserved src.
            u_res, twin1, iteration, _, _ = carry
            # twin1 RECYCLES the dead preserved-src carry slot (see
            # resident.py: centres fully overwrite, guards re-exchange,
            # stale round-up bytes are frozen and unread).
            src, cur, delta = chunk2(u_res, twin1, iteration, ns1)
            delta = pmax3(delta)
            done = (delta < eps) & (iteration + 1 >= m_max)
            twin2 = _fill_twin(dp * hp, wp, interpret)
            it = iteration + ns1

            def fbody(i, c):
                a, b, it2 = c
                a_stale, b_new, _ = chunk2(a, b, it2, k)
                b_stale, a_new, _ = chunk2(b_new, a_stale, it2 + k, k)
                return a_new, b_stale, it2 + 2 * k

            cur, twin2, it = jax.lax.fori_loop(
                0, n2, fbody, (cur, twin2, it))
            if odd:
                twin2, cur, _ = chunk2(cur, twin2, it, k)
                it = it + k
            if rem:
                twin2, cur, _ = chunk2(cur, twin2, it, rem)
                it = it + rem
            return cur, src, it, delta, done

        u_res, src, it_next, delta, converged = jax.lax.while_loop(
            cond, body,
            (u_res, _fill_twin(dp * hp, wp, interpret),
             i0.astype(jnp.int32), dl0, cv0),
        )

        def finish(args):
            u_res, src, it_base = args
            _, u1, _ = chunk2(src, u_res, it_base, 1)
            return u1

        u_res = jax.lax.cond(
            converged & ~cv0, finish, lambda args: args[0],
            (u_res, src, it_next - stagger))
        iteration = jnp.where(converged & ~cv0,
                              it_next - stagger + 1, it_next)
        u3 = u_res.reshape(dp, hp, wp)
        out = jax.lax.slice(u3, (k, 0, 0), (k + d_loc, h, w))
        return (out, iteration.reshape(1), delta.reshape(1),
                converged.reshape(1))

    from .._segments import carry_defaults

    start, cv, dl = carry_defaults(epsilon, it0, conv0, delta0)
    u, iteration, delta, converged = run(
        u, frozen, epsilon, jnp.asarray(max_iterations, jnp.int32), start, cv, dl)
    return u, iteration[0], delta[0], converged[0]


def update_n(state: GridState, num_steps: int, mesh: Mesh,
             chunk_depth: int = 2,
             interpret: bool | None = None) -> GridState:
    """Sharded 3D anytime chunk on the z-resident layout; semantics of
    core.update_n on a z-sharded device mesh."""
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
    """Sharded 3D solve-to-convergence on the z-resident layout; protocol
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
    """Sharded 3D solve as watchdog-safe compiled SEGMENTS resuming the
    SAME shard_map while loop — bit-identical trajectories to
    :func:`solve` (the pallas_biggrid.solve_segments pattern)."""
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
