"""Resident guard-aligned shard layout: the tile-pure halo-exchange path.

The measured tax of the banded shard composition (ROADMAP 3b; VERDICT r3
items 1/4) is NOT the kernel — it is the per-chunk XLA relayout around it:
``_exchange_halos_k`` concatenates k-deep halo strips into a
lane/sublane-MISALIGNED ``[h+2k, w+2k]`` array, ``_sweep_k_local_banded``
pads it to the kernel layout, and the centre slice peels it back, i.e.
three to four full-array copies per k sweeps. This module removes all of
them:

- each shard's state lives PERMANENTLY in its banded kernel layout
  ``f32[nb*band + 2k, 128 + w_loc + 128]`` — k guard rows per side
  (k % 8 == 0) and one 128-lane guard tile per side;
- the halo exchange is tile-pure: interior face ROW blocks (k rows, full
  width) ppermute into the neighbour's guard rows, then full-height
  interior face COLUMN TILES (128 lanes) ppermute into the guard tiles —
  the column phase moves strips of the already row-exchanged array, so
  corner blocks arrive transitively exactly as in
  :func:`epic_tpu.parallel.sharded._exchange_halos_k`. Every write is a
  static-offset ``dynamic_update_slice`` on (8, 128) tile boundaries: no
  read-modify-write of crossed tiles (the k-lane strip DUS that measured
  5.8 G at 256³ — ROADMAP 3b);
- the per-shard kernel is a ping-pong aliased-HBM banded DMA kernel
  (:mod:`epic_tpu.solver.pallas_cycle`'s write pattern): chunk reads the
  src buffer, writes band centres straight into the dst buffer — no
  fresh output array, no DUS paste;
- update region, trapezoid guards and the sweep-0 delta are IDENTICAL to
  :func:`epic_tpu.parallel.sharded._band_shard_kernel` (the guard tile
  simply holds 128 fresh neighbour columns where the old layout held k),
  so resident results are bit-equal to the banded shard path and to the
  unsharded kernels (tests/test_resident.py).

Cost model: the guard tiles add ``(256 + (k rows)) / shard extent``
redundant compute+DMA — ~6% at 4096-wide shards, ~12% at 2048, ~100% at
256 — so the layout is WIDTH-GATED (:func:`eligible`): shards below
``MIN_WIDTH`` lanes keep the old path, wide shards (the realistic
multi-chip regime, e.g. the 16k² config of BASELINE) drop the relayout
copies. The reference has no analogue: its grids must fit one device
(harmonic_model_gpu.cu:76-106).

Solve runs the whole convergence while-loop INSIDE shard_map: the
staggered-check delta is ``pmax``-reduced, so every shard takes identical
branches (plain SPMD), and the layout stays resident across the entire
solve instead of being rebuilt per stagger segment. The ping-pong twin is
a fresh fill buffer per cycle body — carrying an aliased pair through a
while cond join makes XLA materialize copies (probe36/40/42).
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
from ..solver.pallas_biggrid import EXT_BAND_CELL_BUDGET
from .sharded import (
    DEFAULT_CHUNK_DEPTH,
    _frozen_mask,
    _neighbor_perm,
    _round_up,
    padded_shape,
)

GC = 128  # guard tile width (one lane tile per side)

# Below this shard width the 256 redundant guard lanes cost more than the
# relayout copies they remove (the 256³-shard regime where both prototypes
# measured slower — ROADMAP 3b); the probe A/Bs pin the boundary.
MIN_WIDTH = 512

# Solve-loop exchange depth: deeper chunks amortize the per-cycle
# structure better than the k=16 the open update chain prefers (on-chip
# scan at 4096²: 35.3 / 40.6 / 38.4 G at depth 16/32/48 pre-fold);
# trajectories are depth-invariant (chunks are elementwise-exact).
SOLVE_CHUNK_DEPTH = 32


def solve_chunk_depth(h_loc: int, w_loc: int) -> int:
    """Width-gated solve depth: k=32 wins while the band layout keeps its
    guard-row redundancy moderate, but wide shards shrink the band (the
    ext budget divides by the guarded width) until 2k/band dominates —
    measured at 16384-wide shards: 27.8 G at depth 32 (band 128, 50%
    redundancy) vs 30.6 at depth 16. Trajectories are depth-invariant."""
    k, band, _, _, _ = _layout(h_loc, w_loc, SOLVE_CHUNK_DEPTH)
    return DEFAULT_CHUNK_DEPTH if 2 * k / band > 0.25 else SOLVE_CHUNK_DEPTH


def eligible(h_loc: int, w_loc: int, min_width: int = MIN_WIDTH) -> bool:
    """Whether a shard extent can take the resident layout: tile-pure
    guard writes need 8-aligned rows and 128-aligned lanes, and the guard
    redundancy must be amortized by a wide-enough shard."""
    return h_loc % 8 == 0 and w_loc % 128 == 0 and w_loc >= min_width


def _layout(h_loc: int, w_loc: int, chunk_depth: int):
    """(k, band, nb, hp, wg): guard depth k (multiple of 8, <= extents and
    <= GC), band structure from the same scoped-VMEM budget math as
    :func:`epic_tpu.parallel.sharded._sweep_k_local_banded` (int8 masks,
    redundancy-conditional deeper bands)."""
    k = max(8, chunk_depth // 8 * 8)
    k = min(k, GC, h_loc // 8 * 8, w_loc)
    wg = GC + w_loc + GC
    ext_max = max(32, (EXT_BAND_CELL_BUDGET // wg) // 8 * 8)
    band_max = max(8, ext_max - 2 * k)
    nb = -(-h_loc // band_max)
    band = _round_up(-(-h_loc // nb), 8)
    if 2 * k / band > 0.12:
        ext_max = max(32, (EXT_BAND_CELL_BUDGET * 8 // 5 // wg) // 8 * 8)
        band_max = max(8, ext_max - 2 * k)
        nb = -(-h_loc // band_max)
        band = _round_up(-(-h_loc // nb), 8)
    hp = nb * band + 2 * k
    return k, band, nb, hp, wg


# ---------------------------------------------------------------------------
# tile-pure guard exchange (inside shard_map)
# ---------------------------------------------------------------------------


def _exchange_guards(u, mesh: Mesh, k: int, h_loc: int, w_loc: int):
    """Refresh the guard rows/tiles of a resident-layout shard.

    Phase 1 ppermutes the k interior face rows (full width, 8-aligned
    blocks) into the neighbour's guard rows; phase 2 ppermutes the
    full-height interior face lane tiles (128 lanes) into the guard tiles,
    carrying the just-written guard rows so corners arrive transitively.
    Out-of-mesh guards arrive as ppermute zero-fill and are frozen by the
    resident mask (:func:`_pad_resident`)."""
    nmy = mesh.shape["my"]
    nmx = mesh.shape["mx"]
    # Interior rows are [k, k + h_loc); bottom face = last k of them.
    top = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, h_loc, h_loc + k, axis=0),
        "my", _neighbor_perm(nmy, +1))
    bot = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, k, 2 * k, axis=0),
        "my", _neighbor_perm(nmy, -1))
    u = jax.lax.dynamic_update_slice(u, top, (0, 0))
    u = jax.lax.dynamic_update_slice(u, bot, (k + h_loc, 0))
    # Interior lanes are [GC, GC + w_loc); faces are whole lane tiles.
    left = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, w_loc, GC + w_loc, axis=1),
        "mx", _neighbor_perm(nmx, +1))
    right = jax.lax.ppermute(
        jax.lax.slice_in_dim(u, GC, 2 * GC, axis=1),
        "mx", _neighbor_perm(nmx, -1))
    u = jax.lax.dynamic_update_slice(u, left, (0, 0))
    u = jax.lax.dynamic_update_slice(u, right, (0, GC + w_loc))
    return u


def _pad_resident(u_loc, frozen_loc, mesh: Mesh, k: int, hp: int):
    """Build the resident pair (u_res f32[hp, wg], frozen_res int8) from a
    shard's local block, ONCE per entry call. The frozen guards are
    exchanged here (the mask is static within a call): neighbours'
    interior masks land in the guard cells, ppermute zero-fill marks
    out-of-mesh guards frozen (exchanged as 'unfrozen', the
    sharded.py convention)."""
    h_loc, w_loc = u_loc.shape
    u = jnp.pad(
        u_loc,
        ((k, hp - h_loc - k), (GC, GC)),
        constant_values=np.float32(C.LOG_SPACE_OBSTACLE),
    )
    u = _exchange_guards(u, mesh, k, h_loc, w_loc)
    unfrozen = jnp.pad(
        (~frozen_loc).astype(jnp.float32),
        ((k, hp - h_loc - k), (GC, GC)),
        constant_values=0.0,
    )
    unfrozen = _exchange_guards(unfrozen, mesh, k, h_loc, w_loc)
    frozen = (unfrozen == 0.0).astype(jnp.int8)
    return u, frozen


# ---------------------------------------------------------------------------
# ping-pong resident banded kernel
# ---------------------------------------------------------------------------


def _resident_kernel(scal_ref, u_src_in, u_dst_in, f_hbm, src_ref, dst_ref,
                     delta_ref, u_vmem, f_vmem, rsem, wsem,
                     *, num_sweeps, band, k, wg, h_loc, w_loc):
    """One k-sweep chunk on the resident layout: bands DMA from the src
    buffer, band centres DMA straight into the dst buffer (aliased HBM
    ping-pong — no output array, no paste).

    Semantics match :func:`epic_tpu.parallel.sharded._band_shard_kernel`
    exactly: same trapezoid, same static edge guards (translated to the
    guard-tile coordinates: interior lanes [GC, GC+w_loc), halo depth k),
    same sweep-0 delta. Reads and writes go to DIFFERENT buffers, so the
    cross-band prefetch is unconditionally safe (no read-after-write
    overlap inside a chunk). scal = [t0, row0, col0] with row0/col0 ≡ the
    global coordinates of resident cell (0, 0) mod 2."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    ext = band + 2 * k

    def copies(band_idx, slot):
        start = band_idx * band
        return (
            pltpu.make_async_copy(
                src_ref.at[pl.ds(start, ext), :], u_vmem.at[slot],
                rsem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(start, ext), :], f_vmem.at[slot],
                rsem.at[slot, 1],
            ),
        )

    slot = jax.lax.rem(i, 2)

    def wait_write(wslot):
        # Drain one outstanding band writeback on wsem[wslot]; DMA waits
        # are (semaphore, size) pairs and every writeback shares one
        # shape, so a same-shaped descriptor stands in for the original.
        pltpu.make_async_copy(
            u_vmem.at[0, pl.ds(k, band), :],
            dst_ref.at[pl.ds(k, band), :],
            wsem.at[wslot],
        ).wait()

    # Deferred writeback (the _cycle_kernel3d pattern): wait the PREVIOUS
    # program's write here — before the prefetch below overwrites its
    # u_vmem slot (write i-1 reads slot (i+1)%2, exactly the slot
    # prefetch i+1 fills) — instead of stalling each band on its own
    # write in-step.
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
    row0 = scal_ref[1]
    col0 = scal_ref[2]
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    lr = jax.lax.broadcasted_iota(jnp.int32, (ext, wg), 0)
    lc = jax.lax.broadcasted_iota(jnp.int32, (ext, wg), 1)
    parity = (lr + i * band + row0 + lc + col0) % 2
    # Update exactly the distance>=1 cells of the true k-extended block:
    # lanes [GC-k+1, GC+w_loc+k-2] and shard-ext rows <= h_loc+2k-2 (the
    # outermost halo lane/row is read-only) — _band_shard_kernel's guards
    # translated by the guard-tile offset.
    edge_ok = ((lc >= GC - k + 1) & (lc <= GC + w_loc + k - 2)
               & (lr + i * band <= h_loc + 2 * k - 2))

    def sweep(s, u):
        from ..solver._sweep_body import lse4

        val = lse4(u, ext, wg)
        valid = (lr > s) & (lr < ext - 1 - s) & edge_ok
        update = (parity != ((t0 + s) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[i, 0] = jnp.max(jnp.abs(u1 - u0))
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_vmem[slot] = u
    pltpu.make_async_copy(
        u_vmem.at[slot, pl.ds(k, band), :],
        dst_ref.at[pl.ds(k + i * band, band), :],
        wsem.at[slot],
    ).start()

    @pl.when(i == nb - 1)
    def _():
        wait_write(slot)


def _chunk_resident(u_src, u_dst, f_res, it0, row0, col0, num_sweeps,
                    band, k, h_loc, w_loc, interpret):
    """Dispatch one resident chunk; returns (src', dst', delta) with the
    new state in dst' (both aliased in place)."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hp, wg = u_src.shape
    nb = (hp - 2 * k) // band
    scal = jnp.stack([it0, row0, col0]).astype(jnp.int32)
    ext = band + 2 * k
    vma = frozenset({"my", "mx"})
    src_out, dst_out, deltas = pl.pallas_call(
        _ft.partial(_resident_kernel, num_sweeps=num_sweeps, band=band,
                    k=k, wg=wg, h_loc=h_loc, w_loc=w_loc),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wg), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((hp, wg), jnp.float32, vma=vma),
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
            pltpu.VMEM((2, ext, wg), jnp.float32),
            pltpu.VMEM((2, ext, wg), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, u_src, u_dst, f_res)
    return src_out, dst_out, jnp.max(deltas)


def _fill_twin(hp: int, wg: int, interpret: bool):
    """Fresh ping-pong twin. The constant fill is replicated (unvarying) to
    the manual-axes type system while the kernel outputs vary over the mesh
    axes; pcast marks it varying so loop carries type-check (the interpret
    path runs check_vma=False, where pcast must be skipped)."""
    twin = jnp.full((hp, wg), np.float32(C.LOG_SPACE_OBSTACLE))
    if not interpret:
        twin = jax.lax.pvary(twin, ("my", "mx"))
    return twin


# ---------------------------------------------------------------------------
# entry points (shard_map programs)
# ---------------------------------------------------------------------------


def _origin(mesh: Mesh, h_loc: int, w_loc: int, k: int):
    """Global coordinates of resident cell (0, 0) for the parity offsets
    (guard offsets k and GC are even, so mod 2 they vanish)."""
    row0 = jax.lax.axis_index("my") * h_loc + k
    col0 = jax.lax.axis_index("mx") * w_loc + GC
    return row0, col0


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "chunk_depth", "interpret"),
    donate_argnums=(0,),
)
def _update_n_resident(
    u, frozen, iteration, mesh: Mesh, num_steps: int,
    chunk_depth: int = DEFAULT_CHUNK_DEPTH, interpret: bool = False,
):
    """num_steps sweeps on the resident layout: ONE pad+guard-exchange at
    entry, then ceil(num_steps / k) ping-pong chunks with tile-pure guard
    refreshes between them, ONE centre slice at exit. Delta (pmax) from
    the overall first sweep, like sharded._update_n_sharded."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("my", "mx"), P("my", "mx"), P()),
        out_specs=(P("my", "mx"), P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, it0):
        h_loc, w_loc = u_loc.shape
        k, band, nb, hp, wg = _layout(h_loc, w_loc, chunk_depth)
        row0, col0 = _origin(mesh, h_loc, w_loc, k)
        u_a, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, hp)
        u_b = _fill_twin(hp, wg, interpret)

        def chunk2(cur, alt, it, ns):
            # One exchange + one ping-pong dispatch; returns
            # (stale, current, delta) where stale aliases `cur` and
            # current aliases `alt`. The entry exchange already ran in
            # _pad_resident for the first call — harmless (idempotent on
            # fresh guards) and keeps one call site.
            cur = _exchange_guards(cur, mesh, k, h_loc, w_loc)
            return _chunk_resident(
                cur, alt, f_res, it, row0, col0, ns, band, k, h_loc,
                w_loc, interpret)

        ns1 = min(k, num_steps)
        stale, cur, delta = chunk2(u_a, u_b, it0, ns1)
        n_full, rem = divmod(num_steps - ns1, k)
        n2, odd = divmod(n_full, 2)

        def body(i, carry):
            # TWO chunks per fori body keep the carried pair's positions
            # stable (a_new aliases a, b_stale aliases b), so both
            # back-edge outputs alias their inputs and the loop carries
            # ZERO copies. A one-chunk body forces XLA to copy the fresh
            # buffer into the carry slot every iteration (the resident-iso
            # probe A/B: 41.9 G paired vs 37.7 fresh-fill vs 34.7
            # swapped-pair at 4096²).
            a, b, it = carry
            a_stale, b_new, _ = chunk2(a, b, it, k)
            b_stale, a_new, _ = chunk2(b_new, a_stale, it + k, k)
            return a_new, b_stale, it + 2 * k

        cur, stale, it = jax.lax.fori_loop(
            0, n2, body, (cur, stale, it0 + ns1))
        if odd:
            stale, cur, _ = chunk2(cur, stale, it, k)
            it = it + k
        if rem:
            stale, cur, _ = chunk2(cur, stale, it, rem)
        delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
        out = jax.lax.slice(cur, (k, GC), (k + h_loc, GC + w_loc))
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
    """Solve-to-convergence with the while-loop INSIDE shard_map: the
    layout is built once and stays resident across the whole solve; the
    staggered-check delta is pmax-reduced so every shard takes identical
    branches (plain SPMD). Protocol identical to core.solve
    (harmonic_cpu.cpp:158-173): check sweep, exit only right after a
    passing check with iter >= max(H, W), stagger-1 plain sweeps
    otherwise. The ping-pong twin is re-created fresh inside the body —
    aliased pairs carried through cond joins make XLA copy (probe36/40)."""
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
        k, band, nb, hp, wg = _layout(h_loc, w_loc, chunk_depth)
        row0, col0 = _origin(mesh, h_loc, w_loc, k)
        u_res, f_res = _pad_resident(u_loc, frozen_loc, mesh, k, hp)
        ns1 = min(k, stagger)
        n_full, rem = divmod(stagger - ns1, k)
        n2, odd = divmod(n_full, 2)

        def chunk2(cur, alt, it, ns):
            cur = _exchange_guards(cur, mesh, k, h_loc, w_loc)
            return _chunk_resident(
                cur, alt, f_res, it, row0, col0, ns, band, k, h_loc,
                w_loc, interpret)

        def cond(carry):
            _, _, iteration, _, done = carry
            return ~done & (iteration < mi)

        def body(carry):
            # ONE fresh fill twin pair per while body (a carried pair
            # costs copies at the loop joins — probe36/40/42); inside the
            # body the chunks ping-pong through paired fori chunks with
            # stable carry positions (zero back-edge copies, see
            # _update_n_resident.body). The staggered check is FOLDED
            # into the cycle's first k-chunk: the kernel's per-chunk
            # delta IS its sweep-0 delta, i.e. the check value, so no
            # dedicated 1-sweep check chunk runs. NO lax.cond around the
            # rest (probe resident3d-solve-iso: pallas chunk chains
            # inside a cond branch measured 13.9 vs 18.0 G without it in
            # 3D): the pre-check src survives the body (the check chunk
            # only READS it; the rest ping-pongs between the check
            # chunk's dst and a SECOND fresh twin), the rest runs
            # unconditionally (one wasted cycle per solve at the
            # done-exit), and the 1-sweep finish runs AFTER the loop
            # from the preserved src — bit-identical, iteration-exact.
            u_res, twin1, iteration, _, _ = carry
            # twin1 RECYCLES the dead preserved-src carry slot (no
            # refill: the check chunk overwrites every centre row, guards
            # are re-exchanged before any read, and stale round-up /
            # guard bytes are frozen and never read by interior cells) —
            # so the cond-free body costs the same one fill per body as
            # the cond version it replaced.
            src, cur, delta = chunk2(u_res, twin1, iteration, ns1)
            delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
            done = (delta < eps) & (iteration + 1 >= m_max)
            twin2 = _fill_twin(hp, wg, interpret)
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
            (u_res, _fill_twin(hp, wg, interpret),
             i0.astype(jnp.int32), dl0, cv0),
        )

        def finish(args):
            u_res, src, it_base = args
            # One 1-sweep ping-pong chunk from the preserved pre-check
            # src reproduces the post-check-sweep exit state.
            _, u1, _ = chunk2(src, u_res, it_base, 1)
            return u1

        u_res = jax.lax.cond(
            converged & ~cv0, finish, lambda args: args[0],
            (u_res, src, it_next - stagger))
        iteration = jnp.where(converged & ~cv0,
                              it_next - stagger + 1, it_next)
        out = jax.lax.slice(u_res, (k, GC), (k + h_loc, GC + w_loc))
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


def _check_shard(shape: tuple[int, int], mesh: Mesh) -> None:
    """Reject shard extents the tile-pure layout cannot represent with a
    clear error (mirrors the tiny-shard guard on the banded path,
    sharded.py): guard-row DUS needs 8-aligned shard rows (k is a multiple
    of 8) and the guard tiles need 128-aligned shard lanes. MIN_WIDTH is
    advisory (auto-dispatch) — explicit callers may run narrow shards."""
    hp, wp = padded_shape(shape, mesh)
    h_loc = hp // mesh.shape["my"]
    w_loc = wp // mesh.shape["mx"]
    if not eligible(h_loc, w_loc, min_width=128):
        raise ValueError(
            "the resident layout needs 8-aligned shard rows and 128-aligned "
            f"shard lanes of at least 128 (got {h_loc}x{w_loc} local "
            "blocks); use sharded.update_n/solve for such shards")


def update_n(state: GridState, num_steps: int, mesh: Mesh,
             chunk_depth: int = DEFAULT_CHUNK_DEPTH,
             interpret: bool | None = None) -> GridState:
    """Sharded anytime chunk on the resident layout; semantics of
    core.update_n on a device mesh (delta from the overall first sweep)."""
    from .sharded import _pad_for_mesh

    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    _check_shard(state.u.shape, mesh)
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
    chunk_depth: int | None = None,
    interpret: bool | None = None,
) -> GridState:
    """Sharded solve-to-convergence on the resident layout; protocol
    identical to core.solve. chunk_depth=None picks the width-gated
    solve depth (:func:`solve_chunk_depth`; trajectories are
    depth-invariant)."""
    from .sharded import _pad_for_mesh

    _check_shard(state.u.shape, mesh)
    if chunk_depth is None:
        hp_, wp_ = padded_shape(state.u.shape, mesh)
        chunk_depth = solve_chunk_depth(hp_ // mesh.shape["my"],
                                        wp_ // mesh.shape["mx"])
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
    chunk_depth: int | None = None,
    interpret: bool | None = None,
) -> GridState:
    """Sharded solve-to-convergence as watchdog-safe compiled SEGMENTS
    (the pallas_biggrid.solve_segments pattern on the resident layout):
    each dispatch resumes the SAME compiled shard_map while loop at the
    previous segment's iteration — bit-identical trajectories to
    :func:`solve`. Mega-grid sharded convergences (e.g. the 16k²
    BASELINE config on few chips) hold minutes of device work and never
    fit one sub-watchdog dispatch."""
    from .sharded import _pad_for_mesh

    _check_shard(state.u.shape, mesh)
    if chunk_depth is None:
        hp_, wp_ = padded_shape(state.u.shape, mesh)
        chunk_depth = solve_chunk_depth(hp_ // mesh.shape["my"],
                                        wp_ // mesh.shape["mx"])
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
