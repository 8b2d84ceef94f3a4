"""Resident TILED 2D shard layout: wide shards at tiled-kernel rates.

The guard-aligned banded layout (:mod:`epic_tpu.parallel.resident`) hits
the banded redundancy knee on very wide shards — at 16384-lane shards its
ext-band budget shrinks the bands until guard rows dominate (measured
29-31 G vs the unsharded tiled solve's 43.3; ROADMAP 3c). This module is
the tiled twin, built exactly like :mod:`epic_tpu.parallel.resident3d`:
the shard lives PERMANENTLY in the UNMODIFIED
:mod:`epic_tpu.solver.pallas_tiled2d` padded layout
``f32[k + nb*band + k, _HX + nt*wt + _HX]`` with the guards in the halo
areas —

- interior at ``(k, _HX)``; top guard = the kernel's k halo rows, bottom
  guard = the k rows immediately below the interior (inside the tile
  round-up region when tiles round up, the kernel's bottom halo
  otherwise), left/right guards = 128-lane tiles flanking the interior;
- the exchange is tile-pure (k % 8 == 0 row blocks, 128-lane tiles,
  static-offset DUS; corners arrive transitively via the two-phase
  order), identical in structure to :func:`resident._exchange_guards`;
- the per-chunk compute is the unmodified tiled kernels
  (:func:`pallas_cycle.sweep_cycle_tiled` ping-pong chunks,
  shallow-``ns`` cycle chunks for remainders); their
  parity math assumes even global offsets, guaranteed by 8-aligned shard
  rows and 128-aligned shard lanes;
- check/update deltas are the cycle kernel's INTERIOR-MASKED in-kernel
  sweep-0 deltas: the raw slab deltas include transiently-updated guard
  cells that read frozen round-up padding where the owning shard reads
  real data — the delta-poisoning failure mode caught on resident3d
  (test_resident3d_solve_nondivisor_layout_converges); the mask zeroes
  them with no extra passes.

Dispatch: :func:`prefer_tiled_shards` applies the unsharded regime rule
(banded-vs-tiled redundancy) to the SHARD extent; ``kernel="resident"``
in :mod:`epic_tpu.parallel.sharded` picks this module for wide shards.
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
from ..solver.pallas_tiled2d import _HX
from .sharded import DEFAULT_CHUNK_DEPTH, _neighbor_perm, padded_shape


def layout(h_loc: int, w_loc: int, chunk_depth: int = DEFAULT_CHUNK_DEPTH):
    """(band, k, wt, nb, nt, hp, wp) for one shard — the unsharded tiled
    chooser (no divisor constraint; round-up padding lives beyond the
    guards)."""
    from ..solver.pallas_tiled2d import choose_tiled_layout

    band, k, wt = choose_tiled_layout((h_loc, w_loc), chunk_depth)
    nb = -(-h_loc // band)
    nt = -(-w_loc // wt)
    return band, k, wt, nb, nt, nb * band + 2 * k, nt * wt + 2 * _HX


def eligible(h_loc: int, w_loc: int,
             chunk_depth: int = DEFAULT_CHUNK_DEPTH) -> bool:
    """Tile-pure guard writes need 8-aligned shard rows, 128-aligned
    shard lanes, and an 8-aligned exchange depth (k is 8 or 16 for every
    tiled layout)."""
    if h_loc % 8 or w_loc % 128:
        return False
    try:
        band, k, *_ = layout(h_loc, w_loc, chunk_depth)
    except ValueError:
        return False
    return k % 8 == 0 and k <= min(h_loc, _HX)


def prefer_tiled_shards(h_loc: int, w_loc: int,
                        chunk_depth: int = DEFAULT_CHUNK_DEPTH) -> bool:
    """The unsharded banded-vs-tiled regime rule applied to the shard
    extent (pallas_tiled2d.prefer_tiled: tiled wins when the banded
    layout's redundancy exceeds the tiled one by > 0.1, ~12k widths
    up)."""
    from ..solver.pallas_tiled2d import prefer_tiled

    return (eligible(h_loc, w_loc, chunk_depth)
            and prefer_tiled((h_loc, w_loc), chunk_depth))


def _check_shard(shape: tuple[int, int], mesh: Mesh,
                 chunk_depth: int) -> None:
    hp, wp = padded_shape(shape, mesh)
    h_loc = hp // mesh.shape["my"]
    w_loc = wp // mesh.shape["mx"]
    if not eligible(h_loc, w_loc, chunk_depth):
        raise ValueError(
            "the resident tiled layout needs 8-aligned shard rows and "
            f"128-aligned shard lanes (got {h_loc}x{w_loc} local blocks); "
            "use parallel.resident or sharded.update_n/solve instead")


# ---------------------------------------------------------------------------
# tile-pure guard exchange (inside shard_map)
# ---------------------------------------------------------------------------


def _exchange_guards(u, mesh: Mesh, k: int, h_loc: int, w_loc: int):
    """Refresh the k guard rows and 128-lane guard tiles.

    Interior rows are [k, k + h_loc), interior lanes [_HX, _HX + w_loc);
    guards sit immediately adjacent (top rows [0, k), bottom rows
    [k + h_loc, k + h_loc + k), left lanes [0, _HX), right lanes
    [_HX + w_loc, _HX + w_loc + _HX)). Phase order carries corners
    transitively; ppermute zero-fill marks out-of-mesh guards frozen via
    the mask exchange in :func:`_pad_resident`."""
    nmy = mesh.shape["my"]
    nmx = mesh.shape["mx"]
    top = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, h_loc, h_loc + k, axis=0),
        "my", _neighbor_perm(nmy, +1))
    bot = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, k, 2 * k, axis=0),
        "my", _neighbor_perm(nmy, -1))
    u = jax.lax.dynamic_update_slice(u, top, (0, 0))
    u = jax.lax.dynamic_update_slice(u, bot, (k + h_loc, 0))
    left = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, w_loc, _HX + w_loc, axis=1),
        "mx", _neighbor_perm(nmx, +1))
    right = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, _HX, 2 * _HX, axis=1),
        "mx", _neighbor_perm(nmx, -1))
    u = jax.lax.dynamic_update_slice(u, left, (0, 0))
    u = jax.lax.dynamic_update_slice(u, right, (0, _HX + w_loc))
    return u


def _pad_resident(u_loc, frozen_loc, mesh: Mesh, k: int, hp: int, wp: int):
    """Build the resident pair (u f32[hp, wp], frozen int32 — the tiled
    kernels keep int32 masks) from a shard's local block, ONCE per entry
    call. Out-of-mesh guards arrive as ppermute zero-fill and stay
    frozen."""
    h_loc, w_loc = u_loc.shape
    u = jnp.pad(
        u_loc,
        ((k, hp - h_loc - k), (_HX, wp - w_loc - _HX)),
        constant_values=np.float32(C.LOG_SPACE_OBSTACLE),
    )
    u = _exchange_guards(u, mesh, k, h_loc, w_loc)
    unfrozen = jnp.pad(
        (~frozen_loc).astype(jnp.float32),
        ((k, hp - h_loc - k), (_HX, wp - w_loc - _HX)),
        constant_values=0.0,
    )
    unfrozen = _exchange_guards(unfrozen, mesh, k, h_loc, w_loc)
    frozen = (unfrozen == 0.0).astype(jnp.int32)
    return u, frozen


def _fill_twin(hp: int, wg: int, interpret: bool):
    twin = jnp.full((hp, wg), np.float32(C.LOG_SPACE_OBSTACLE))
    if not interpret:
        twin = jax.lax.pvary(twin, ("my", "mx"))
    return twin


def _chunk_cycle(cur, alt, f_res, it, k, band, wt, interpret,
                 interior=None, ns=None):
    """One ns-sweep chunk (ns <= k, default k) through the ping-pong
    tiled cycle kernel (pallas_cycle._cycle_kernel_tiled, nc=1): slabs
    read cur, centres land straight in alt — no paste, even for shallow
    remainder chunks (the functional-kernel + paste remainder cost ~2
    extra full-array passes per stagger cycle — the bulk of the r4
    sharded-converge residual, 34.6 vs 43.3 G). Re-dispatched for the
    vma annotation (shard_map's manual-axes checker needs it;
    the resident3d pattern). Returns (stale, current, delta)
    with stale aliasing ``cur``; with ``interior=(h_loc, w_loc)`` the
    delta is the INTERIOR-ONLY sweep-0 diff (bit-equal to
    the interior diff over the same sweep — the folded staggered
    check), else the raw pad-poisoned slab delta (discard it)."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..solver.pallas_cycle import _cycle_kernel_tiled
    from ..solver.pallas_tiled2d import _VMEM_LIMIT

    if ns == k:
        ns = None  # one jaxpr for the full-depth chunk
    hp, wp = cur.shape
    nb = (hp - 2 * k) // band
    nt = (wp - 2 * _HX) // wt
    ext_r = band + 2 * k
    wext = wt + 2 * _HX
    vma = frozenset({"my", "mx"})
    scal = jnp.asarray(it).astype(jnp.int32).reshape(1)
    a_out, b_out, deltas = pl.pallas_call(
        _ft.partial(_cycle_kernel_tiled, k=k, band=band, wt=wt,
                    hx=_HX, nb=nb, nt=nt, nc=1, interior=interior,
                    ns=ns),
        grid=(1, nb, nt),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, nb, nt), jnp.float32, vma=vma),
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
            pltpu.VMEM((2, ext_r, wext), jnp.float32),
            pltpu.VMEM((2, ext_r, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(scal, cur, alt, f_res)
    return a_out, b_out, jnp.max(deltas)


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
    chunk_depth: int = DEFAULT_CHUNK_DEPTH, interpret: bool = False,
):
    """num_steps sweeps on the resident tiled layout: ONE
    pad+guard-exchange at entry, ping-pong cycle chunks with tile-pure
    guard refreshes between them, ONE centre slice at exit. Delta (pmax)
    from the overall first sweep — the first chunk's interior-masked
    in-kernel sweep-0 delta (pad-safe, zero extra passes)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("my", "mx"), P("my", "mx"), P()),
        out_specs=(P("my", "mx"), P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, it0):
        h_loc, w_loc = u_loc.shape
        band, k, wt, nb, nt, hp, wp = layout(h_loc, w_loc, chunk_depth)
        u_res, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, hp, wp)

        def chunk2(cur, alt, it, ns=None, interior=None):
            cur = _exchange_guards(cur, mesh, k, h_loc, w_loc)
            return _chunk_cycle(cur, alt, f_res, it, k, band, wt,
                                interpret, interior, ns)

        # The overall-first-sweep delta is FOLDED into the first cycle
        # chunk as its interior-masked sweep-0 delta (bit-equal to the
        # 1-sweep prologue + interior diff it replaced); every chunk —
        # including shallow remainders — is ping-pong (no pastes), the
        # resident.py structure.
        ns1 = min(k, num_steps)
        alt = _fill_twin(hp, wp, interpret)
        stale, u_res, delta = chunk2(u_res, alt, it0, ns=ns1,
                                     interior=(h_loc, w_loc))
        it = it0 + ns1
        n_full, rem = divmod(num_steps - ns1, k)
        n2, odd = divmod(n_full, 2)

        def body(i, carry):
            # TWO chunks per fori body keep the carried pair's
            # positions stable (zero back-edge copies — see
            # resident._update_n_resident.body).
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
        out = jax.lax.slice(u_res, (k, _HX), (k + h_loc, _HX + w_loc))
        return out, delta.reshape(1)

    u, delta = run(u, frozen, iteration)
    return u, delta[0]


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stagger", "height", "width",
                     "chunk_depth", "interpret"),
    donate_argnums=(0,),
)
def _solve_resident(
    u, frozen, epsilon, mesh: Mesh, stagger: int, max_iterations,
    height: int, width: int, chunk_depth: int = DEFAULT_CHUNK_DEPTH,
    interpret: bool = False, it0=None, conv0=None,
    delta0=None,
):
    """Solve-to-convergence with the while-loop INSIDE shard_map on the
    resident tiled layout; protocol identical to core.solve
    (harmonic_cpu.cpp:158-173). The check sweep runs the functional slab
    kernel + interior-diff delta; the stagger-1 rest runs ping-pong
    cycle chunks. max_iterations/it0 are traced so solve_segments can
    resume the identical loop."""
    m_max = max(height, width)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("my", "mx"), P("my", "mx"), P(), P(), P(), P(), P()),
        out_specs=(P("my", "mx"), P(), P(), P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, eps, mi, i0, cv0, dl0):
        h_loc, w_loc = u_loc.shape
        band, k, wt, nb, nt, hp, wp = layout(h_loc, w_loc, chunk_depth)
        u_res, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, hp, wp)

        def chunk2(cur, alt, it, ns=None, interior=None):
            cur = _exchange_guards(cur, mesh, k, h_loc, w_loc)
            return _chunk_cycle(cur, alt, f_res, it, k, band, wt,
                                interpret, interior, ns)

        # The staggered check is FOLDED into the cycle's first chunk
        # (VERDICT r4 item 1, the resident.py structure made pad-safe):
        # the kernel's interior-masked sweep-0 delta IS the check value —
        # no dedicated 1-sweep check chunk, no pastes anywhere (shallow
        # remainders are ping-pong chunks too). NO lax.cond around the
        # cycle's rest (probe resident3d-solve-iso: pallas chunk chains
        # inside a cond branch measured 13.9 vs 18.0 G without it): the
        # pre-check src survives the body, the rest runs unconditionally
        # (one wasted cycle per solve at the done-exit), and the 1-sweep
        # finish runs AFTER the loop from the preserved src.
        ns1 = min(k, stagger)
        n_full, rem = divmod(stagger - ns1, k)
        n2, odd = divmod(n_full, 2)

        def cond(carry):
            _, _, iteration, _, done = carry
            return ~done & (iteration < mi)

        def body(carry):
            u_res, twin1, iteration, _, _ = carry
            # twin1 RECYCLES the dead preserved-src carry slot (see
            # resident.py: centres fully overwrite, guards re-exchange,
            # stale round-up bytes are frozen and unread).
            src, cur, delta = chunk2(u_res, twin1, iteration, ns=ns1,
                                     interior=(h_loc, w_loc))
            delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
            done = (delta < eps) & (iteration + 1 >= m_max)
            twin2 = _fill_twin(hp, wp, interpret)
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
            (u_res, _fill_twin(hp, wp, interpret),
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
        out = jax.lax.slice(u_res, (k, _HX), (k + h_loc, _HX + w_loc))
        return (out, iteration.reshape(1), delta.reshape(1),
                converged.reshape(1))

    from .._segments import carry_defaults

    start, cv, dl = carry_defaults(epsilon, it0, conv0, delta0)
    u, iteration, delta, converged = run(
        u, frozen, epsilon, jnp.asarray(max_iterations, jnp.int32), start, cv, dl)
    return u, iteration[0], delta[0], converged[0]


def update_n(state: GridState, num_steps: int, mesh: Mesh,
             chunk_depth: int = DEFAULT_CHUNK_DEPTH,
             interpret: bool | None = None) -> GridState:
    """Sharded anytime chunk on the resident tiled layout; semantics of
    core.update_n on a device mesh."""
    from .sharded import _pad_for_mesh

    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    _check_shard(state.u.shape, mesh, chunk_depth)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, P("my", "mx"))
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, delta = _update_n_resident(u, frozen, state.iteration, mesh,
                                  num_steps, chunk_depth, interpret)
    return dataclasses.replace(
        state,
        u=u[:h, :w],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


def solve(
    state: GridState,
    mesh: Mesh,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = DEFAULT_CHUNK_DEPTH,
    interpret: bool | None = None,
) -> GridState:
    """Sharded solve-to-convergence on the resident tiled layout;
    protocol identical to core.solve."""
    from .sharded import _pad_for_mesh

    _check_shard(state.u.shape, mesh, chunk_depth)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, P("my", "mx"))
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, iteration, delta, converged = _solve_resident(
        u, frozen, state.epsilon, mesh, stagger, max_iterations, h, w,
        chunk_depth, interpret,
    )
    return dataclasses.replace(
        state,
        u=u[:h, :w],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )


def solve_segments(
    state: GridState,
    mesh: Mesh,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    segment_iterations: int = 5_000,
    chunk_depth: int = DEFAULT_CHUNK_DEPTH,
    interpret: bool | None = None,
) -> GridState:
    """Sharded tiled solve as watchdog-safe compiled SEGMENTS resuming
    the SAME shard_map while loop — bit-identical trajectories to
    :func:`solve` (the pallas_biggrid.solve_segments pattern)."""
    from .sharded import _pad_for_mesh

    _check_shard(state.u.shape, mesh, chunk_depth)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, P("my", "mx"))
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    from .._segments import run_pipelined

    def seg(uu, bound, it0, cv, dl):
        return _solve_resident(
            uu, frozen, state.epsilon, mesh, stagger, bound, h, w,
            chunk_depth, interpret, it0=it0, conv0=cv, delta0=dl,
        )

    u, it, delta, converged = run_pipelined(
        seg, u, state.epsilon, max_iterations, segment_iterations)
    return dataclasses.replace(
        state,
        u=u[:h, :w],
        iteration=it,
        delta=delta,
        converged=converged,
    )
