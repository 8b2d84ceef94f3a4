"""Multi-chip spatial decomposition of 3D volumes: shard_map + halo exchange.

The reference cannot scale 3D at all — its 3D solver is a scalar CPU loop
(/root/reference/libepic/src/harmonic/harmonic_cpu.cpp:81-133) and its CUDA
path refuses 3D outright (harmonic_gpu.cu:158-165). This module carries the
2D decomposition (:mod:`epic_tpu.parallel.sharded`) to volumes:

- ``u[D, H, W]`` is sharded ``P(None, 'my', 'mx')`` — every shard holds the
  FULL depth of its (y, x) tile, so the z-neighbour reads of the 6-point
  stencil are always local and only y/x halos cross the mesh. (Depth is the
  small axis of typical volumes; the plane axes carry the parallelism.)
- DEEP volumes (z >> plane) can shard the depth too: a mesh built with
  :func:`make_mesh3d` carries an extra ``'mz'`` axis and the same entry
  points run ``P('mz', 'my', 'mx')`` with a three-phase halo exchange and a
  z-shrinking validity trapezoid (the 2D analog applied to all three axes).
- K-deep halos ride the same multi-phase exchange as 2D (each later axis
  exchanges strips of the already-extended array, so corner blocks arrive
  transitively), one ``ppermute`` pair per axis per K sweeps.
- The staggered-check delta is a cross-shard ``pmax``; the solve protocol
  (exit right after a check sweep with delta < eps and iter >= max(dims))
  is identical to :mod:`epic_tpu.solver.core`.

Per-shard compute: the XLA 6-neighbour sweep with a y/x-shrinking validity
trapezoid (z never shrinks — the full depth is resident), or the flattened
[D*He, We] Pallas kernel on TPU (same rank-2 roll pattern as
:mod:`epic_tpu.solver.pallas_sweep3d`).

A sharded solve equals the single-device solve bit/tolerance-exactly
(tested on virtual 8-device CPU meshes, tests/test_sharded3d.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.sharding import Mesh

from .. import constants as C
from ..grid import GridState
from .sharded import _neighbor_perm, make_mesh  # noqa: F401  (re-export mesh helper)

from ..solver._padding import box_mask
from ..solver._sweep_body import LOG2N_3D as _LOG2N_3D, lse6


def make_mesh3d(shape: tuple[int, int, int] | None = None, devices=None) -> Mesh:
    """A 3-axis ('mz', 'my', 'mx') mesh for deep volumes (z sharded too).

    Default: all devices on the z axis (deep volumes are z-dominant, so
    depth carries the parallelism); pass an explicit shape to mix axes."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size, 1, 1)
    return Mesh(devices.reshape(shape), ("mz", "my", "mx"))


def choose_mesh3d(shape: tuple[int, int, int], devices=None) -> Mesh:
    """Pick the mesh ORIENTATION for a volume: z-major for cube-regime
    volumes, plane-sharded for wide planes.

    The decomposition axis decides the composition's rate class
    (BENCH_NOTES r5): cube-regime volumes (plane fits the plane-banded
    budget) run the z-resident layout at ~94% of the unsharded kernel
    (28.7 G at 256³) where plane-sharding pays ~2x guard redundancy on
    narrow shards (8.7 G); wide-plane volumes cannot plane-band at all
    and need the plane-sharded resident3d layout (z stays resident).
    Returns a ``make_mesh3d((n,1,1))`` z-mesh when every z-shard is
    z-resident-eligible and z has enough depth, else the 2D plane mesh
    (``make_mesh``'s near-square shape with an mz=1 axis)."""
    from . import resident_z

    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    d, h, w = shape
    d_loc = -(-d // n)
    if d >= n and resident_z.eligible(d_loc, h, w):
        return make_mesh3d((n, 1, 1), devices=devices)
    my = int(np.floor(np.sqrt(n)))
    while n % my:
        my -= 1
    return make_mesh((my, n // my), devices=devices)


def _has_z(mesh: Mesh) -> bool:
    return "mz" in mesh.shape


def _exchange_halos_k(u: jax.Array, mesh: Mesh, k: int):
    """K-deep halos (including corners) for a rank-3 [D, h, w] block via
    the multi-phase exchange (sharded.py:_exchange_halos_k, one rank up).
    Meshes with an 'mz' axis exchange z-slabs first; the later y/x phases
    move strips of the already-z-extended array, so z-corners arrive
    transitively."""
    if _has_z(mesh):
        nmz = mesh.shape["mz"]
        zlo = jax.lax.ppermute(u[-k:, :, :], "mz", _neighbor_perm(nmz, +1))
        zhi = jax.lax.ppermute(u[:k, :, :], "mz", _neighbor_perm(nmz, -1))
        u = jnp.concatenate([zlo, u, zhi], axis=0)
    nmy = mesh.shape["my"]
    nmx = mesh.shape["mx"]
    north = jax.lax.ppermute(u[:, -k:, :], "my", _neighbor_perm(nmy, +1))
    south = jax.lax.ppermute(u[:, :k, :], "my", _neighbor_perm(nmy, -1))
    rows = jnp.concatenate([north, u, south], axis=1)
    west = jax.lax.ppermute(rows[:, :, -k:], "mx", _neighbor_perm(nmx, +1))
    east = jax.lax.ppermute(rows[:, :, :k], "mx", _neighbor_perm(nmx, -1))
    return jnp.concatenate([west, rows, east], axis=2)


def _exchange_frozen_k(frozen: jax.Array, mesh: Mesh, k: int):
    """Extended frozen mask, exchanged as 'unfrozen' so ppermute's zero-fill
    marks out-of-mesh cells frozen."""
    unfrozen = (~frozen).astype(jnp.int32)
    ext = _exchange_halos_k(unfrozen, mesh, k)
    return ext == 0


def _sweep_k_local(u_ext, frozen_ext, parity_ext, it0, num_sweeps,
                   z_sharded: bool = False):
    """num_sweeps (<= k) 6-neighbour sweeps on the extended local block.

    The y/x validity ring shrinks one cell per side per sweep; depth shrinks
    too iff the mesh shards z (otherwise z-neighbours are resident and the
    full depth stays valid). Delta comes from sweep 0 — halo updates
    duplicate the owning shard's arithmetic, so the cross-shard pmax equals
    the global staggered-check delta exactly.
    """
    d, he, we = u_ext.shape
    ly = jax.lax.broadcasted_iota(jnp.int32, (d, he, we), 1)
    lx = jax.lax.broadcasted_iota(jnp.int32, (d, he, we), 2)
    lz = jax.lax.broadcasted_iota(jnp.int32, (d, he, we), 0)
    not_frozen = ~frozen_ext

    def sweep(s, u):
        uzm = jnp.roll(u, 1, 0)
        uzp = jnp.roll(u, -1, 0)
        uym = jnp.roll(u, 1, 1)
        uyp = jnp.roll(u, -1, 1)
        uxm = jnp.roll(u, 1, 2)
        uxp = jnp.roll(u, -1, 2)
        m = jnp.maximum(uzm, uzp)
        m = jnp.maximum(m, uym)
        m = jnp.maximum(m, uyp)
        m = jnp.maximum(m, uxm)
        m = jnp.maximum(m, uxp)
        ssum = jnp.exp(uzm - m)
        ssum = ssum + jnp.exp(uzp - m)
        ssum = ssum + jnp.exp(uym - m)
        ssum = ssum + jnp.exp(uyp - m)
        ssum = ssum + jnp.exp(uxm - m)
        ssum = ssum + jnp.exp(uxp - m)
        val = (m + jnp.log(ssum)) - _LOG2N_3D
        valid = (ly >= s + 1) & (ly < he - 1 - s) & (lx >= s + 1) & (lx < we - 1 - s)
        if z_sharded:
            valid &= (lz >= s + 1) & (lz < d - 1 - s)
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity_ext != ((it0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u_ext)
    delta = jnp.max(jnp.abs(u1 - u_ext))
    u_out = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    return u_out, delta


def _sweep_k_local_kernel(scal_ref, u_ref, f_ref, u_out, delta_ref,
                          *, num_sweeps, d, he, we, z_sharded):
    """Pallas twin of :func:`_sweep_k_local` on the [D*He, We] flattened
    block (all six neighbours are rank-2 rolls; slab-crossing wrap garbage
    lands only on frozen/invalid cells; scal = [t0, z0, y0, x0])."""
    from jax.experimental.pallas import tpu as pltpu

    rows = d * he
    t0 = scal_ref[0]
    z0 = scal_ref[1]
    y0 = scal_ref[2]
    x0 = scal_ref[3]
    u0 = u_ref[:]
    not_frozen = f_ref[:] == 0
    lr = jax.lax.broadcasted_iota(jnp.int32, (rows, we), 0)
    lc = jax.lax.broadcasted_iota(jnp.int32, (rows, we), 1)
    lz = lr // he
    ly = lr - lz * he
    parity = (lz + z0 + ly + y0 + lc + x0) % 2

    def sweep(s, u):
        val = lse6(u, rows, we, he)
        valid = (ly >= s + 1) & (ly < he - 1 - s) & (lc >= s + 1) & (lc < we - 1 - s)
        if z_sharded:
            valid &= (lz >= s + 1) & (lz < d - 1 - s)
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[0] = jnp.max(jnp.abs(u1 - u0))
    u_out[:] = jax.lax.fori_loop(1, num_sweeps, sweep, u1)


def _sweep_k_local_pallas(u_ext, frozen_ext, it0, z0, y0, x0, num_sweeps,
                          interpret, z_sharded=False):
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, he, we = u_ext.shape
    scal = jnp.stack([it0, z0, y0, x0]).astype(jnp.int32)
    vma = (frozenset({"mz", "my", "mx"}) if z_sharded
           else frozenset({"my", "mx"}))
    out_u, out_delta = pl.pallas_call(
        _ft.partial(_sweep_k_local_kernel, num_sweeps=num_sweeps,
                    d=d, he=he, we=we, z_sharded=z_sharded),
        out_shape=(
            jax.ShapeDtypeStruct((d * he, we), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1,), jnp.float32, vma=vma),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )(scal, u_ext.reshape(d * he, we), frozen_ext.astype(jnp.int32).reshape(d * he, we))
    return out_u.reshape(d, he, we), out_delta[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _band_shard3d_kernel(scal_ref, u_hbm, f_hbm, u_out, delta_ref,
                         u_vmem, f_vmem, sems,
                         *, num_sweeps, band, k, he8, wp, he, we):
    """Per-shard plane-banded DMA kernel: the beyond-VMEM per-shard compute
    of the 3D shard_map composition (the volume analog of
    sharded.py::_band_shard_kernel; plane-band structure from
    pallas_biggrid3d._band3d_kernel_dma).

    The shard's extended block [Dp, he8, wp] is flattened to rows so all six
    neighbours are rank-2 rolls; bands tile the (resident) z axis in
    contiguous flat-row ranges, DMA'd HBM->VMEM double-buffered. The z
    validity trapezoid is the band's temporal-blocking guard; the y/x shard
    halos use static edge guards (1 <= y <= he-2, 1 <= x <= we-2): staleness
    from the read-only outermost halo faces travels one cell per sweep and
    never reaches the centre within k sweeps, while the sweep-0 delta covers
    exactly the distance>=1 cells of the true extended block (halo updates
    duplicate the owning shard's arithmetic, so the cross-shard pmax is
    exact). scal = [t0, y0, x0]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    ext = band + 2 * k          # extended band depth in planes
    rows = ext * he8

    def copies(band_idx, slot):
        start = band_idx * band * he8
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

    t0 = scal_ref[0]
    y0 = scal_ref[1]
    x0 = scal_ref[2]
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    lr = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
    lc = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    lz = lr // he8
    ly = lr - lz * he8
    # Volume z of band-local plane lz is i*band - k + lz ((-k) ≡ (+k) mod 2).
    parity = (lz + i * band + k + ly + y0 + lc + x0) % 2
    edge_ok = ((ly >= 1) & (ly <= he - 2)
               & (lc >= 1) & (lc <= we - 2))

    def sweep(s, u):
        val = lse6(u, rows, wp, he8)
        valid = (lz > s) & (lz < ext - 1 - s) & edge_ok
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[i, 0] = jnp.max(jnp.abs(u1 - u0))
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_out[:] = u[k * he8 : (k + band) * he8, :]


def banded3d_layout(d: int, he8: int, wp: int, k: int):
    """(band, nb) in planes for the per-shard banded kernel: the deepest
    band whose double-buffered extended slot fits the scoped-VMEM budget."""
    from ..solver.pallas_biggrid3d import EXT_BAND_CELL_BUDGET

    plane = he8 * wp
    # int8 mask slots cost 5 B/cell vs the int32 era's 8 — same proven
    # bytes, more planes (solver.pallas_biggrid3d.choose_layout's scan).
    ext_max = max(2 * k + 1, (EXT_BAND_CELL_BUDGET * 4 // 5) // plane)
    band_max = max(1, ext_max - 2 * k)
    nb = -(-d // band_max)
    band = -(-d // nb)
    return band, nb


def _sweep_k_local_banded3d(u_ext, frozen_ext, it0, y0, x0, num_sweeps, k,
                            interpret):
    """Run num_sweeps (<= k) sweeps on one shard's y/x-extended volume
    through the plane-banded DMA kernel; returns (centre [d, h_loc, w_loc],
    delta). Requires a plane-sharded mesh (z resident per shard)."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, he, we = u_ext.shape
    h_loc = he - 2 * k
    w_loc = we - 2 * k
    he8 = _round_up(he, 8)
    wp = _round_up(we, 128)
    band, nb = banded3d_layout(d, he8, wp, k)
    dp = nb * band + 2 * k
    ext = band + 2 * k

    u_pad = jnp.pad(u_ext, ((k, dp - d - k), (0, he8 - he), (0, wp - we)),
                    constant_values=np.float32(C.LOG_SPACE_OBSTACLE))
    f_pad = jnp.pad(frozen_ext.astype(jnp.int8),
                    ((k, dp - d - k), (0, he8 - he), (0, wp - we)),
                    constant_values=1)
    scal = jnp.stack([it0, y0, x0]).astype(jnp.int32)
    vma = frozenset({"my", "mx"})
    out_u, out_delta = pl.pallas_call(
        _ft.partial(_band_shard3d_kernel, num_sweeps=num_sweeps,
                    band=band, k=k, he8=he8, wp=wp, he=he, we=we),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band * he8, wp), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32, vma=vma),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((band * he8, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext * he8, wp), jnp.float32),
            pltpu.VMEM((2, ext * he8, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, u_pad.reshape(dp * he8, wp),
      f_pad.reshape(dp * he8, wp))
    # Band centres cover volume planes 0..nb*band; slice the real extent.
    vol = out_u.reshape(nb * band, he8, wp)
    return vol[:d, k : k + h_loc, k : k + w_loc], jnp.max(out_delta)


def _local_parity_ext(shape_local, mesh, k):
    """Global (z + y + x) % 2 for the extended block ((-k) ≡ k mod 2)."""
    d, h, w = shape_local
    zsh = _has_z(mesh)
    de = d + 2 * k if zsh else d
    iy = jax.lax.axis_index("my") * h
    ix = jax.lax.axis_index("mx") * w
    lz = jax.lax.broadcasted_iota(jnp.int32, (de, h + 2 * k, w + 2 * k), 0)
    if zsh:
        lz = lz + jax.lax.axis_index("mz") * d + k
    ly = jax.lax.broadcasted_iota(jnp.int32, (de, h + 2 * k, w + 2 * k), 1) + iy + k
    lx = jax.lax.broadcasted_iota(jnp.int32, (de, h + 2 * k, w + 2 * k), 2) + ix + k
    return (lz + ly + lx) % 2


@functools.partial(jax.jit, static_argnames=("d", "h", "w"))
def _frozen_arrays(locked, d: int, h: int, w: int):
    # Device-built boundary shell — a host mask upload here cost a
    # full-volume H2D per update call (see solver/_padding.py).
    return locked | ~box_mask((d, h, w), (1, 1, 1), (d - 1, h - 1, w - 1))


def _frozen_mask(state: GridState) -> jax.Array:
    d, h, w = state.u.shape
    return _frozen_arrays(state.locked, d, h, w)


def padded_shape(shape, mesh: Mesh):
    d, h, w = shape
    nmz = mesh.shape["mz"] if _has_z(mesh) else 1
    nmy, nmx = mesh.shape["my"], mesh.shape["mx"]
    return (-(-d // nmz) * nmz, -(-h // nmy) * nmy, -(-w // nmx) * nmx)


def _pad_for_mesh(state: GridState, mesh: Mesh):
    d, h, w = state.u.shape
    dp, hp, wp = padded_shape((d, h, w), mesh)
    u = jnp.pad(state.u, ((0, dp - d), (0, hp - h), (0, wp - w)),
                constant_values=np.float32(C.LOG_SPACE_OBSTACLE))
    frozen = jnp.pad(_frozen_mask(state), ((0, dp - d), (0, hp - h), (0, wp - w)),
                     constant_values=True)
    return u, frozen


def _spec(mesh: Mesh):
    return P("mz", "my", "mx") if _has_z(mesh) else P(None, "my", "mx")


def _pmax(x, mesh: Mesh):
    if _has_z(mesh):
        x = jax.lax.pmax(x, "mz")
    return jax.lax.pmax(jax.lax.pmax(x, "my"), "mx")


DEFAULT_CHUNK_DEPTH = 8


def _prefers_resident(shape, mesh: Mesh, chunk_depth: int) -> bool:
    """auto-dispatch gate for the resident 3D layout: TPU backend,
    plane-sharded mesh, tile-aligned shard extents, and a shard whose
    plane-banded layout cannot hold a non-degenerate band (the wide-plane
    regime — probe24's scoped-VMEM wall): there the banded composition
    collapses to band=1 / XLA while the resident tiled3d composition runs
    17.2 G at 64x1024x1024 shards (92% of the unsharded kernel, probe
    sharded3d-resident). Small-plane shards (256³-class) KEEP the banded
    path: its k=2 halos out-run the resident layout's 128-lane guard
    redundancy there (9.9 vs 8.75 G measured)."""
    import jax

    from ..solver import pallas_biggrid3d
    from . import resident3d

    if jax.default_backend() != "tpu":
        return False
    if _has_z(mesh):
        # z-only meshes: the z-resident plane-band layout keeps full
        # planes local (guard cost 2k/d_loc planes) and removes the
        # exchange+repad relayout of the generic z path — prefer it
        # whenever a shard's plane-band layout fits the VMEM budget.
        from . import resident_z

        if mesh.shape["my"] != 1 or mesh.shape["mx"] != 1:
            return False
        dp, hp, wp = padded_shape(shape, mesh)
        return resident_z.eligible(dp // mesh.shape["mz"], hp, wp)
    dp, hp, wp = padded_shape(shape, mesh)
    h_loc = hp // mesh.shape["my"]
    w_loc = wp // mesh.shape["mx"]
    depth = min(chunk_depth, h_loc, w_loc)
    banded_ok = pallas_biggrid3d.feasible(
        (dp, h_loc + 2 * depth, w_loc + 2 * depth))
    return (not banded_ok
            and resident3d.eligible(dp, h_loc, w_loc))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "chunk_depth", "kernel"),
    donate_argnums=(0,),
)
def _update_n_sharded(
    u, frozen, iteration, mesh: Mesh, num_steps: int,
    chunk_depth: int = DEFAULT_CHUNK_DEPTH,
    kernel: str = "auto",
):
    """num_steps 3D sweeps as ceil(num_steps / chunk_depth) halo-exchange
    rounds; delta (pmax-reduced) from the overall first sweep."""
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
    if kernel not in ("pallas", "pallas_interpret", "pallas_banded",
                      "pallas_banded_interpret", "xla"):
        # "resident" is a layout, not a per-shard kernel: it must be
        # routed at the entry points (update_n / update_n_resident3d /
        # solve), never fall through to the XLA local-sweep branch (the
        # 2D _update_n_sharded rule).
        raise ValueError(f"unknown sharded 3D kernel {kernel!r}")
    interpret = kernel.endswith("_interpret")
    zsh = _has_z(mesh)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_spec(mesh), _spec(mesh), P()),
        out_specs=(_spec(mesh), P()),
        check_vma=not interpret,
    )
    def run(u_loc, frozen_loc, it0):
        from ..solver.pallas_biggrid3d import EXT_BAND_CELL_BUDGET
        from ..solver.pallas_sweep import VMEM_CELL_BUDGET

        d, h_loc, w_loc = u_loc.shape
        depth = min(chunk_depth, h_loc, w_loc)
        if zsh:
            depth = min(depth, d)
        kern = kernel
        if kern in ("pallas", "pallas_interpret") and not zsh:
            # Beyond-VMEM shards take the plane-banded DMA path (the z axis
            # is resident on plane-sharded meshes, so bands tile it like
            # pallas_biggrid3d; z-sharded meshes keep the VMEM/XLA paths).
            ext_cells = (d * _round_up(h_loc + 2 * depth, 8)
                         * _round_up(w_loc + 2 * depth, 128))
            if ext_cells > VMEM_CELL_BUDGET:
                kern = ("pallas_banded_interpret" if interpret
                        else "pallas_banded")
        use_banded = kern in ("pallas_banded", "pallas_banded_interpret")
        use_pallas = kern in ("pallas", "pallas_interpret")
        if use_banded:
            if zsh:
                raise ValueError(
                    "the banded per-shard kernel needs a plane-sharded mesh "
                    "(z resident); z-sharded meshes use 'pallas'/'xla'")
            # The double-buffered extended slot ((band + 2*depth) planes)
            # must fit the scoped-VMEM budget even at band=1 (int8 mask
            # slots: 5 B/cell per slot pair vs the int32 era's 8).
            plane = (_round_up(h_loc + 2 * depth, 8)
                     * _round_up(w_loc + 2 * depth, 128))
            depth_max = max(1, ((EXT_BAND_CELL_BUDGET * 4 // 5) // plane - 1) // 2)
            depth = max(1, min(depth, depth_max))
        frozen_full = _exchange_frozen_k(frozen_loc, mesh, depth)

        def chunk(u_loc, it, ns):
            k = depth if use_banded else ns
            u_ext = _exchange_halos_k(u_loc, mesh, k)
            d0 = depth - k
            zs = slice(d0, d0 + d + 2 * k) if zsh else slice(None)
            frozen_ext = frozen_full[zs, d0 : d0 + h_loc + 2 * k,
                                     d0 : d0 + w_loc + 2 * k]
            if use_banded:
                y0 = jax.lax.axis_index("my") * h_loc + k
                x0 = jax.lax.axis_index("mx") * w_loc + k
                return _sweep_k_local_banded3d(
                    u_ext, frozen_ext, it, y0, x0, ns, k, interpret
                )
            if use_pallas:
                z0 = jax.lax.axis_index("mz") * d + k if zsh else jnp.int32(0)
                y0 = jax.lax.axis_index("my") * h_loc + k
                x0 = jax.lax.axis_index("mx") * w_loc + k
                u_ext, dd = _sweep_k_local_pallas(
                    u_ext, frozen_ext, it, z0, y0, x0, ns, interpret, zsh
                )
            else:
                parity_ext = _local_parity_ext(u_loc.shape, mesh, k)
                u_ext, dd = _sweep_k_local(
                    u_ext, frozen_ext, parity_ext, it, ns, zsh
                )
            zc = slice(k, -k) if zsh else slice(None)
            return u_ext[zc, k:-k, k:-k], dd

        d1 = min(depth, num_steps)
        u_loc, delta = chunk(u_loc, it0, d1)
        n_full, rem = divmod(num_steps - d1, depth)

        def body(i, carry):
            u_loc, it = carry
            u_loc, _ = chunk(u_loc, it, depth)
            return u_loc, it + depth

        u_loc, it = jax.lax.fori_loop(0, n_full, body, (u_loc, it0 + d1))
        if rem:
            u_loc, _ = chunk(u_loc, it, rem)
        delta = _pmax(delta, mesh)
        return u_loc, delta.reshape(1)

    u, delta = run(u, frozen, iteration)
    return u, delta[0]


# ---------------------------------------------------------------------------
# Mesh-resident 3D anytime state (the 2D ShardedGrid pattern for volumes):
# padded arrays stay resident on the mesh across warm-started update/edit
# cycles; edits are scatters into the sharded arrays, never a re-layout.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedVolume:
    """Mesh-resident padded 3D state for the sharded anytime loop."""

    u: jax.Array          # f32[Dp, Hp, Wp], sharded _spec(mesh)
    frozen: jax.Array     # bool[Dp, Hp, Wp], sharded
    iteration: jax.Array
    delta: jax.Array
    epsilon: jax.Array
    depth: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))


def shard_state3d(state: GridState, mesh: Mesh) -> ShardedVolume:
    """Pad + place a 3D GridState on the mesh once; later updates and
    edits keep the buffers resident."""
    d, h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, _spec(mesh))
    # Commit the scalars to the mesh (replicated) — see shard_state: a
    # committed-ness mismatch between fresh and post-solve scalars
    # recompiles the tick jit (~20 s through the remote service).
    rep = NamedSharding(mesh, P())
    return ShardedVolume(
        u=jax.device_put(u, sharding),
        frozen=jax.device_put(frozen, sharding),
        iteration=jax.device_put(jnp.asarray(state.iteration, jnp.int32),
                                 rep),
        delta=jax.device_put(jnp.asarray(state.delta, jnp.float32), rep),
        epsilon=jax.device_put(jnp.asarray(state.epsilon, jnp.float32),
                               rep),
        depth=d, height=h, width=w,
    )


def unshard3d(sv: ShardedVolume) -> GridState:
    """Gather back to a host-side GridState (e.g. for path extraction).
    The boundary faces come back locked (the sharded representation folds
    ``locked | ~interior`` into one mask)."""
    import numpy as _np

    u = _np.asarray(sv.u)[: sv.depth, : sv.height, : sv.width]
    locked = _np.asarray(sv.frozen)[: sv.depth, : sv.height, : sv.width]
    return GridState(
        u=jnp.asarray(u),
        locked=jnp.asarray(locked),
        iteration=sv.iteration,
        delta=sv.delta,
        converged=jnp.asarray(False),
        epsilon=sv.epsilon,
    )


def set_cells_resident3d(sv: ShardedVolume, xyz, types) -> ShardedVolume:
    """SetCells on the sharded volume (skip-invalid, last-wins — shared
    preprocessing with grid.set_cells_3d): a scatter into the resident
    buffers. Values on the boundary faces are written like the
    reference's, but face voxels stay frozen in the sharded mask (no
    solver path updates faces, and an unfrozen face would read
    out-of-mesh halo fill — the 2D set_cells_resident rule)."""
    from .. import grid as G

    xyz, u_vals, locked_vals = G.sanitize_cell_edits_3d(
        xyz, types, sv.width, sv.height, sv.depth
    )
    if xyz.shape[0] == 0:
        return sv
    on_face = (
        (xyz[:, 0] == 0) | (xyz[:, 0] == sv.width - 1)
        | (xyz[:, 1] == 0) | (xyz[:, 1] == sv.height - 1)
        | (xyz[:, 2] == 0) | (xyz[:, 2] == sv.depth - 1)
    )
    f_vals = locked_vals | on_face
    zs = jnp.asarray(xyz[:, 2])
    ys = jnp.asarray(xyz[:, 1])
    xs = jnp.asarray(xyz[:, 0])
    return dataclasses.replace(
        sv,
        u=sv.u.at[zs, ys, xs].set(jnp.asarray(u_vals)),
        frozen=sv.frozen.at[zs, ys, xs].set(jnp.asarray(f_vals)),
    )


def _route_resident3d(sv: ShardedVolume, mesh: Mesh, chunk_depth: int,
                      kernel: str):
    """(module, interp) for the resident layout serving this mesh, or
    (None, None) when no resident layout applies (generic path)."""
    from . import resident3d, resident_z

    interp = (kernel.endswith("_interpret")
              or jax.default_backend() == "cpu")
    if _has_z(mesh):
        if mesh.shape["my"] == 1 and mesh.shape["mx"] == 1:
            d_loc = sv.u.shape[0] // mesh.shape["mz"]
            if resident_z.eligible(d_loc, sv.u.shape[1], sv.u.shape[2]):
                return resident_z, interp
        return None, None
    dp, hp, wp = sv.u.shape
    h_loc = hp // mesh.shape["my"]
    w_loc = wp // mesh.shape["mx"]
    if resident3d.eligible(dp, h_loc, w_loc, min(chunk_depth, 2)):
        return resident3d, interp
    return None, None


def update_n_resident3d(
    sv: ShardedVolume, num_steps: int, mesh: Mesh,
    chunk_depth: int = DEFAULT_CHUNK_DEPTH, kernel: str = "auto",
) -> ShardedVolume:
    """Anytime chunk on a mesh-resident volume: no re-pad, no re-upload;
    the sharded buffers are donated across ticks. kernel="resident"
    (picked by "auto" when a resident layout fits the mesh/shape) runs
    the z-resident or plane-resident layout directly on the buffers."""
    route = kernel in ("resident", "resident_interpret") or (
        kernel == "auto" and jax.default_backend() == "tpu")
    mod = interp = None
    if route:
        mod, interp = _route_resident3d(sv, mesh, chunk_depth, kernel)
        if mod is None and kernel != "auto":
            raise ValueError(
                "no resident 3D layout fits this mesh/shape; use "
                "kernel='pallas'/'xla'")
    if mod is not None:
        u, delta = mod._update_n_resident(
            sv.u, sv.frozen, sv.iteration, mesh, num_steps,
            min(chunk_depth, 2), interp)
    else:
        kern = "xla" if kernel in ("auto", "resident",
                                   "resident_interpret") else kernel
        if jax.default_backend() == "tpu" and kernel == "auto":
            kern = "pallas"
        u, delta = _update_n_sharded(
            sv.u, sv.frozen, sv.iteration, mesh, num_steps, chunk_depth,
            kern)
    return dataclasses.replace(
        sv, u=u, iteration=sv.iteration + num_steps, delta=delta
    )


def solve_resident3d(
    sv: ShardedVolume, mesh: Mesh,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = DEFAULT_CHUNK_DEPTH,
    kernel: str = "auto",
    segment_iterations: int | None = None,
):
    """Blocking solve-to-convergence directly ON the mesh-resident volume
    buffers (the 2D sharded.solve_resident pattern). Returns
    ``(sv', converged)``; ``segment_iterations`` runs pipelined
    watchdog-safe segments."""
    from .._segments import run_pipelined

    mod, interp = _route_resident3d(sv, mesh, chunk_depth, kernel)
    dims = (sv.depth, sv.height, sv.width)
    if mod is None:
        if segment_iterations is not None:
            raise ValueError(
                "segment_iterations requires a resident 3D layout")
        st = GridState(
            u=sv.u[: sv.depth, : sv.height, : sv.width],
            locked=sv.frozen[: sv.depth, : sv.height, : sv.width],
            iteration=sv.iteration,
            delta=sv.delta,
            converged=jnp.asarray(False),
            epsilon=sv.epsilon,
        )
        out = solve(st, mesh, stagger, max_iterations, kernel)
        return shard_state3d(out, mesh), out.converged
    depth = min(chunk_depth, 2)
    if segment_iterations is None:
        u, it, delta, conv = mod._solve_resident(
            sv.u, sv.frozen, sv.epsilon, mesh, stagger, max_iterations,
            dims, depth, interp)
    else:
        frozen = sv.frozen

        def seg(uu, bound, it0, cv, dl):
            return mod._solve_resident(
                uu, frozen, sv.epsilon, mesh, stagger, bound, dims,
                depth, interp, it0=it0, conv0=cv, delta0=dl)

        u, it, delta, conv = run_pipelined(
            seg, sv.u, sv.epsilon, max_iterations, segment_iterations)
    return dataclasses.replace(sv, u=u, iteration=it, delta=delta), conv


def update_n(state: GridState, num_steps: int, mesh: Mesh,
             chunk_depth: int = DEFAULT_CHUNK_DEPTH,
             kernel: str = "auto") -> GridState:
    """Sharded 3D anytime chunk; semantics of core.update_n on a mesh.

    kernel="resident" routes to the resident layouts — no per-chunk
    relayout copies: plane-sharded meshes take the tile-pure guard-
    aligned layout (:mod:`epic_tpu.parallel.resident3d`, 8/128-aligned
    shards only); z-only meshes take the z-resident plane-band layout
    (:mod:`epic_tpu.parallel.resident_z` — the cube regime's home). "auto"
    picks them for wide-plane shards where plane-banding degenerates and
    for eligible z-only meshes."""
    if kernel == "auto" and _prefers_resident(state.u.shape, mesh,
                                              chunk_depth):
        kernel = "resident"
    if kernel in ("resident", "resident_interpret"):
        interp = True if kernel.endswith("_interpret") else None
        if _has_z(mesh):
            from . import resident_z

            return resident_z.update_n(
                state, num_steps, mesh, min(chunk_depth, 2),
                interpret=interp)
        from . import resident3d

        return resident3d.update_n(
            state, num_steps, mesh, min(chunk_depth, 2),
            interpret=interp)
    d, h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, _spec(mesh))
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, delta = _update_n_sharded(u, frozen, state.iteration, mesh, num_steps,
                                 chunk_depth, kernel)
    return dataclasses.replace(
        state,
        u=u[:d, :h, :w],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stagger", "max_iterations", "dims", "kernel"),
    donate_argnums=(0, 1),
)
def _solve_sharded(
    u, frozen, epsilon, mesh: Mesh, stagger: int, max_iterations: int,
    dims, kernel: str,
):
    m_max = max(dims)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        u, delta = _update_n_sharded.__wrapped__(
            u, frozen, iteration, mesh, 1, DEFAULT_CHUNK_DEPTH, kernel
        )
        iteration = iteration + 1
        done = (delta < epsilon) & (iteration >= m_max)

        def run_rest(args):
            u, iteration = args
            u, _ = _update_n_sharded.__wrapped__(
                u, frozen, iteration, mesh, stagger - 1,
                DEFAULT_CHUNK_DEPTH, kernel,
            )
            return u, iteration + (stagger - 1)

        u, iteration = jax.lax.cond(done, lambda a: a, run_rest, (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


def solve(
    state: GridState,
    mesh: Mesh,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    kernel: str = "auto",
    segment_iterations: int | None = None,
) -> GridState:
    """Sharded 3D solve-to-convergence; protocol identical to core.solve.

    kernel="resident" keeps the whole while-loop inside shard_map on the
    tile-pure guard-aligned layout (:mod:`epic_tpu.parallel.resident3d`);
    "auto" picks it for wide-plane shards where plane-banding
    degenerates. segment_iterations runs the resident solve as
    watchdog-safe compiled segments (bit-identical trajectories)."""
    if kernel == "auto" and _prefers_resident(
            state.u.shape, mesh, DEFAULT_CHUNK_DEPTH):
        kernel = "resident"
    if kernel in ("resident", "resident_interpret"):
        interp = True if kernel.endswith("_interpret") else None
        if _has_z(mesh):
            from . import resident_z

            if segment_iterations is not None:
                return resident_z.solve_segments(
                    state, mesh, stagger, max_iterations,
                    segment_iterations, interpret=interp)
            return resident_z.solve(
                state, mesh, stagger, max_iterations, interpret=interp)
        from . import resident3d

        if segment_iterations is not None:
            return resident3d.solve_segments(
                state, mesh, stagger, max_iterations, segment_iterations,
                interpret=interp)
        return resident3d.solve(
            state, mesh, stagger, max_iterations, interpret=interp)
    if segment_iterations is not None:
        raise ValueError(
            "segment_iterations requires the resident layout "
            "(kernel='resident' or an auto-eligible wide-plane shard)")
    d, h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, _spec(mesh))
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, iteration, delta, converged = _solve_sharded(
        u, frozen, state.epsilon, mesh, stagger, max_iterations,
        (d, h, w), kernel,
    )
    return dataclasses.replace(
        state,
        u=u[:d, :h, :w],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )
