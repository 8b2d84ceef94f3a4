"""Batched-scenario solving on TPU: VMEM-resident collage blocks.

BASELINE config 3 asks for 4096 (map, goal-set) solves per chip. Designs
that fell short on v5e (see git history): vmapped XLA (intermediates
through HBM), a 3D lane-brick kernel (Mosaic lowers 3D rolls poorly), and
manual-DMA row-band tiling over a stacked grid (band DMAs serialize).

The design that works composes two facts:

- maps with frozen boundary rings are *independent*: arranged side by side
  in a collage, a stencil read across a seam only feeds a masked-out
  update, and even tile offsets preserve each map's checkerboard parity;
- a **pallas grid over VMEM-sized blocks needs no halos** when block
  boundaries coincide with frozen seams — so each grid step runs the
  proven VMEM-resident K-sweep body on its own block while Mosaic
  auto-pipelines the next block's HBM->VMEM transfer.

Layout: maps are grouped (gpr x gpc) per block (default 4x4 of 128² maps =
one 512x512 block, comfortably VMEM-resident with temporaries), blocks
stacked vertically. Per-lane staggered-check deltas reduce on device
between passes; lane retirement freezes the lane's tile.

Dispatch guidance (lane-count x lane-size regime map, measured on chip —
tools/probe.py batched-map, docs/BENCH_NOTES.md "Batched regime map"):

- solves/s scales with LANES at fixed size (64²: 10.7k -> 17.8k going
  1024 -> 4096 lanes; 128²: 5.0k -> 6.0k) — pack the batch as full as
  HBM allows; per-dispatch overhead amortizes across the whole collage.
- cell-update throughput scales with LANE SIZE: 64² lanes reach only
  ~14 G updates/s (blocks too shallow to hide retirement bookkeeping),
  128² ~35 G, 256² ~38 G — within ~20% of the big-grid kernels' ~47 G.
- batching exists for INDEPENDENT scenarios (BASELINE config 3). For one
  big domain, the big-grid kernels win: a single 4096² solve runs ~45 G
  while 1024 retiring 128² lanes of equal area run ~35 G and converge on
  each lane's own schedule. Pick batch when you have many maps/goal-sets;
  pick biggrid/tiled2d when you have one grid.
- pre-stage inputs on device and keep results device-resident: the
  tunnel moves ~41/14 MB/s H2D/D2H, so un-staged batch timing measures
  the transport, not the solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ._padding import box_mask
from .pallas_sweep import _VMEM_LIMIT, make_sweep_fn

# Per-block cell budget: the kernel materializes ~8 block-sized f32
# temporaries per sweep; 300k cells * 4 B * 8 ≈ 9.6 MB against 16 MB VMEM.
BLOCK_CELL_BUDGET = 300_000


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_kernel(it_ref, u_ref, frozen_ref, u_out, delta_ref, *, num_sweeps):
    """The shared VMEM multi-sweep body applied to one collage block."""
    t0 = it_ref[0]
    u0 = u_ref[:]
    sweep = make_sweep_fn(u0, frozen_ref[:] == 0, t0)

    u = sweep(u0, 0)
    delta_ref[pl.program_id(0), 0] = jnp.max(jnp.abs(u - u0))

    def body(k, u):
        return sweep(u, k + 1)

    u = jax.lax.fori_loop(0, num_sweeps - 1, body, u)
    u_out[:] = u


# No donation: the solve protocol needs the pre-check-sweep array alive for
# the per-lane delta reduction.
@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "block_rows", "interpret")
)
def sweep_chunk_blocks(
    u: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    block_rows: int,
    interpret: bool = False,
):
    """K sweeps over a [n_blocks*block_rows, cols] collage whose block
    boundaries are frozen seams. Returns (u, per-block first-sweep delta)."""
    hp, cols = u.shape
    assert hp % block_rows == 0
    n_blocks = hp // block_rows
    out_u, out_delta = pl.pallas_call(
        functools.partial(_block_kernel, num_sweeps=num_sweeps),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((hp, cols), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # Whole delta vector visible to every (sequential) program;
            # each writes its own row — per-block SMEM blocks of size 1
            # violate TPU block-shape rules.
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(iteration.reshape(1), u, frozen)
    return out_u, out_delta[:, 0]


def pad_batch(
    u: np.ndarray,
    locked: np.ndarray,
    group_shape: tuple[int, int] | None = None,
):
    """Arrange a [B, H, W] batch into a block collage.

    Returns (u_collage, frozen_collage, meta). Each block holds a
    (gpr x gpc) group of maps; blocks stack vertically. Unused tiles are
    fully frozen.
    """
    b, h, w = u.shape
    # ONE source of truth for the collage geometry: batch_meta. The
    # device-built goal collages (make_goal_batch) are bit-equality-gated
    # against this host builder, so the group-shape heuristic must never
    # fork.
    meta = batch_meta(b, h, w, group_shape)
    wp, hp8 = meta["wp"], meta["hp8"]
    gpr, gpc = meta["gpr"], meta["gpc"]
    n_blocks, block_rows = meta["n_blocks"], meta["block_rows"]
    cols = meta["cols"]
    per_group = gpr * gpc
    hp = n_blocks * block_rows

    n_lanes = n_blocks * per_group

    # Vectorized tile layout (a python per-lane loop costs seconds at 4096
    # lanes): pad each lane to (hp8, wp), pad the lane axis with fully
    # frozen tiles, then [n_lanes, hp8, wp] -> [nb, gpr, gpc, hp8, wp]
    # -> transpose -> the collage (exact inverse of unstack).
    u_np = np.asarray(u, np.float32)
    l_np = np.asarray(locked).astype(np.int32)
    u_t = np.pad(
        u_np,
        ((0, n_lanes - b), (0, hp8 - h), (0, wp - w)),
        constant_values=np.float32(C.LOG_SPACE_OBSTACLE),
    )
    interior = np.zeros((hp8, wp), dtype=np.int32)
    interior[1 : h - 1, 1 : w - 1] = 1
    f_t = np.pad(l_np, ((0, n_lanes - b), (0, hp8 - h), (0, wp - w)),
                 constant_values=1)
    f_t = np.where(interior[None], f_t, 1)
    u_c = (
        u_t.reshape(n_blocks, gpr, gpc, hp8, wp)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n_blocks * gpr * hp8, gpc * wp)
    )
    frozen = (
        f_t.reshape(n_blocks, gpr, gpc, hp8, wp)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n_blocks * gpr * hp8, gpc * wp)
    )
    return jnp.asarray(u_c), jnp.asarray(np.ascontiguousarray(frozen)), meta


def unstack(u_collage: jax.Array, meta) -> np.ndarray:
    b, h, w = meta["b"], meta["h"], meta["w"]
    hp8, wp = meta["hp8"], meta["wp"]
    gpr, gpc, nb = meta["gpr"], meta["gpc"], meta["n_blocks"]
    arr = np.asarray(u_collage).reshape(nb, gpr, hp8, gpc, wp)
    arr = arr.transpose(0, 1, 3, 2, 4).reshape(nb * gpr * gpc, hp8, wp)
    return arr[:b, :h, :w]


def sweep_chunk_batch(
    u_collage: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    meta,
    interpret: bool = False,
):
    """num_sweeps sweeps over the whole batch (one grid pass)."""
    return sweep_chunk_blocks(
        u_collage, frozen, iteration, num_sweeps, meta["block_rows"], interpret
    )


@functools.partial(
    jax.jit, static_argnames=("nb", "gpr", "gpc", "hp8", "wp")
)
def _per_lane_delta(u_new, u_old, nb: int, gpr: int, gpc: int, hp8: int, wp: int):
    diff = jnp.abs(u_new - u_old).reshape(nb, gpr, hp8, gpc, wp)
    per_tile = jnp.max(diff, axis=(2, 4))  # [nb, gpr, gpc]
    return per_tile.reshape(nb * gpr * gpc)


def _block_kernel_gated(it_ref, active_ref, u_ref, frozen_ref, u_out,
                        *, num_sweeps):
    """Block body with per-block gating: blocks whose lanes have all retired
    skip the sweeps entirely (their tiles pass through unchanged), the
    device-side analog of the reference retiring a finished solve."""
    i = pl.program_id(0)

    @pl.when(active_ref[i] != 0)
    def _():
        t0 = it_ref[0]
        u0 = u_ref[:]
        sweep = make_sweep_fn(u0, frozen_ref[:] == 0, t0)
        u_out[:] = jax.lax.fori_loop(
            0, num_sweeps, lambda k, u: sweep(u, k), u0
        )

    @pl.when(active_ref[i] == 0)
    def _():
        u_out[:] = u_ref[:]


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "block_rows", "interpret")
)
def _sweep_chunk_gated(
    u: jax.Array,
    frozen: jax.Array,
    active_blocks: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    block_rows: int,
    interpret: bool = False,
):
    hp, cols = u.shape
    n_blocks = hp // block_rows
    return pl.pallas_call(
        functools.partial(_block_kernel_gated, num_sweeps=num_sweeps),
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((hp, cols), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(iteration.reshape(1), active_blocks, u, frozen)


@functools.partial(
    jax.jit,
    static_argnames=(
        "stagger", "max_iterations", "m_max", "nb", "gpr", "gpc", "hp8",
        "wp", "block_rows", "interpret",
    ),
)
def _solve_collage_device(
    u_c,
    frozen_c,
    retired0,
    epsilon,
    stagger: int,
    max_iterations: int,
    m_max: int,
    nb: int,
    gpr: int,
    gpc: int,
    hp8: int,
    wp: int,
    block_rows: int,
    interpret: bool,
):
    """The whole lockstep solve protocol as ONE device program.

    Equivalent to the reference's per-solve loop (harmonic_gpu.cu:226-305)
    run for every lane at once: check sweep -> per-lane delta -> retirement
    -> stagger-1 plain sweeps, repeated until all lanes exit. No host
    readbacks, no re-uploads: lane retirement is a device-side mask update.
    """
    n_lanes = nb * gpr * gpc

    def expand(retired):
        # [n_lanes] -> per-cell retirement mask [hp, cols] in collage layout.
        r = retired.reshape(nb, gpr, 1, gpc, 1)
        r = jnp.broadcast_to(r, (nb, gpr, hp8, gpc, wp))
        return r.reshape(nb * gpr * hp8, gpc * wp)

    def block_active(retired):
        return jnp.any(
            ~retired.reshape(nb, gpr * gpc), axis=1
        ).astype(jnp.int32)

    def per_lane_delta(u_new, u_old):
        diff = jnp.abs(u_new - u_old).reshape(nb, gpr, hp8, gpc, wp)
        return jnp.max(diff, axis=(2, 4)).reshape(n_lanes)

    def cond(carry):
        _, retired, _, _, t = carry
        return (~jnp.all(retired)) & (t < max_iterations)

    def body(carry):
        u, retired, iters, deltas, t = carry
        frozen_eff = jnp.maximum(frozen_c, expand(retired).astype(jnp.int32))
        u_prev = u
        u = _sweep_chunk_gated.__wrapped__(
            u, frozen_eff, block_active(retired), t, 1, block_rows, interpret
        )
        d = per_lane_delta(u, u_prev)
        active = ~retired
        deltas = jnp.where(active, d, deltas)
        t = t + 1
        iters = jnp.where(active, t, iters)
        just_done = active & (d < epsilon) & (t >= m_max)
        retired = retired | just_done

        def rest(u):
            frozen_eff = jnp.maximum(
                frozen_c, expand(retired).astype(jnp.int32)
            )
            return _sweep_chunk_gated.__wrapped__(
                u, frozen_eff, block_active(retired), t, stagger - 1,
                block_rows, interpret,
            )

        all_done = jnp.all(retired)
        u = jax.lax.cond(all_done, lambda u: u, rest, u)
        t = jnp.where(all_done, t, t + (stagger - 1))
        iters = jnp.where(~retired, t, iters)
        return u, retired, iters, deltas, t

    return jax.lax.while_loop(
        cond,
        body,
        (
            u_c,
            retired0,
            jnp.zeros((n_lanes,), jnp.int32),
            jnp.full((n_lanes,), epsilon + 1.0, jnp.float32),
            jnp.int32(0),
        ),
    )


def solve_batch_device(
    u: np.ndarray | jax.Array,
    locked: np.ndarray | jax.Array,
    epsilon: float = C.DEFAULT_EPSILON,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    group_shape: tuple[int, int] | None = None,
    interpret: bool | None = None,
):
    """Lockstep solve of B scenarios entirely on device (one dispatch).

    Protocol identical to :func:`solve_batch` (per-lane reference-exact), but
    the check/retire/freeze loop is compiled: per-lane deltas reduce on
    device, retirement is a mask update, fully-retired blocks skip their
    sweeps. Replaces the host-driven loop's per-check readbacks and
    full-collage re-uploads (round-1 bottleneck).

    Returns (u[B, H, W], iterations[B], deltas[B], converged[B]).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u = np.asarray(u, np.float32)
    locked_np = np.asarray(locked).astype(bool)
    b, h, w = u.shape
    m_max = max(h, w)

    u_c, frozen_c, meta = pad_batch(u, locked_np, group_shape)
    gpr, gpc, nb = meta["gpr"], meta["gpc"], meta["n_blocks"]
    hp8, wp = meta["hp8"], meta["wp"]
    n_lanes = nb * gpr * gpc

    retired0 = np.zeros(n_lanes, bool)
    retired0[b:] = True  # padding lanes never run

    u_out, retired, iters, deltas, _ = _solve_collage_device(
        u_c,
        frozen_c,
        jnp.asarray(retired0),
        jnp.float32(epsilon),
        stagger,
        max_iterations,
        m_max,
        nb,
        gpr,
        gpc,
        hp8,
        wp,
        meta["block_rows"],
        interpret,
    )
    return (
        unstack(u_out, meta),
        np.asarray(iters)[:b],
        np.asarray(deltas)[:b],
        np.asarray(retired)[:b],
    )


def batch_meta(b: int, h: int, w: int,
               group_shape: tuple[int, int] | None = None):
    """The collage layout for B (h x w) lanes, data-free (pad_batch's
    geometry only — shared by the goal-delta builder below)."""
    if h % 2:
        raise ValueError("map height must be even for collage batching")
    wp = _round_up(w, 128)
    hp8 = _round_up(h, 8)
    if group_shape is None:
        gpc = max(1, min(b, 1024 // wp)) if wp <= 1024 else 1
        per_col_cells = hp8 * gpc * wp
        gpr = max(1, BLOCK_CELL_BUDGET // per_col_cells)
        group_shape = (gpr, gpc)
    gpr, gpc = group_shape
    per_group = gpr * gpc
    n_blocks = -(-b // per_group)
    return dict(b=b, h=h, w=w, hp8=hp8, wp=wp, gpr=gpr, gpc=gpc,
                n_blocks=n_blocks, block_rows=gpr * hp8, cols=gpc * wp)


@functools.partial(
    jax.jit,
    static_argnames=("b", "h", "w", "hp8", "wp", "gpr", "gpc", "n_blocks"),
)
def _goal_batch_arrays(base_u, base_locked, goal_xy, obstacle_xy,
                       b: int, h: int, w: int, hp8: int, wp: int,
                       gpr: int, gpc: int, n_blocks: int):
    """One device program: broadcast the base tile to every lane, scatter
    the per-lane goal cells (u = 0, frozen) and extra obstacle cells
    (u = -1e6, frozen), and fold into the collage layout. Negative /
    out-of-range coordinates are dropped (ragged goal sets pad with -1)."""
    n_lanes = n_blocks * gpr * gpc
    fill = np.float32(C.LOG_SPACE_OBSTACLE)
    u_tile = jnp.pad(base_u.astype(jnp.float32),
                     ((0, hp8 - h), (0, wp - w)), constant_values=fill)
    interior = box_mask((hp8, wp), (1, 1), (h - 1, w - 1))
    f_pad = jnp.pad(base_locked.astype(jnp.int32),
                    ((0, hp8 - h), (0, wp - w)), constant_values=1)
    f_tile = jnp.where(interior, f_pad, 1)
    u_t = jnp.broadcast_to(u_tile, (n_lanes, hp8, wp))
    f_t = jnp.broadcast_to(f_tile, (n_lanes, hp8, wp))
    # Padding lanes beyond b are fully frozen.
    lane_ids = jnp.arange(n_lanes)[:, None, None]
    f_t = jnp.where(lane_ids < b, f_t, 1)

    def scatter(u_t, f_t, xy, value):
        # xy: [b, G, 2] (x, y); a negative coordinate drops the pair.
        # JAX array indexing WRAPS negative indices (a -1 pad would write
        # the lane's far corner), so remap them to an always-OOB sentinel
        # that mode="drop" discards.
        oob = jnp.int32(1 << 30)
        lanes = jnp.broadcast_to(jnp.arange(b)[:, None], xy.shape[:2])
        # LOGICAL bounds decide the drop, not padded-array bounds: a
        # positive coord inside the padded tile (w <= x < wp or
        # h <= y < hp8) must not scatter into the frozen padding.
        bad = ((xy[..., 0] < 0) | (xy[..., 1] < 0)
               | (xy[..., 0] >= w) | (xy[..., 1] >= h))
        xs = jnp.where(bad, oob, xy[..., 0])
        ys = jnp.where(bad, oob, xy[..., 1])
        u_t = u_t.at[lanes, ys, xs].set(value, mode="drop")
        f_t = f_t.at[lanes, ys, xs].set(1, mode="drop")
        return u_t, f_t

    if obstacle_xy is not None:
        u_t, f_t = scatter(u_t, f_t, obstacle_xy, fill)
    u_t, f_t = scatter(u_t, f_t, goal_xy, np.float32(C.LOG_SPACE_GOAL))
    u_c = (u_t.reshape(n_blocks, gpr, gpc, hp8, wp)
           .transpose(0, 1, 3, 2, 4)
           .reshape(n_blocks * gpr * hp8, gpc * wp))
    f_c = (f_t.reshape(n_blocks, gpr, gpc, hp8, wp)
           .transpose(0, 1, 3, 2, 4)
           .reshape(n_blocks * gpr * hp8, gpc * wp))
    return u_c, f_c


def make_goal_batch(
    base_u,
    base_locked,
    goal_xy,
    obstacle_xy=None,
    group_shape: tuple[int, int] | None = None,
):
    """Collage for B scenarios SHARING one base grid, each lane with its
    own goal set (and optional extra obstacles) — SURVEY §7 Phase 2's
    (goal-mask, obstacle-delta) axes. The host uploads ONE (h x w) base
    map plus index arrays instead of B full grids: at 4096 128² lanes the
    full-collage upload is ~0.5 GB over a ~41 MB/s link (~13 s); this
    builder moves ~190 KB.

    goal_xy: int [B, G, 2] of (x, y) cell coords per lane; pad ragged
    sets with (-1, -1). obstacle_xy: optional [B, K, 2] per-lane extra
    obstacles (applied before goals, so a goal wins a collision, matching
    set_cells last-wins order). Returns (u_collage, frozen_collage, meta)
    for :func:`solve_collage_device` / the chunk steppers.
    """
    base_u = jnp.asarray(base_u, jnp.float32)
    goal_xy = jnp.asarray(goal_xy, jnp.int32)
    b = goal_xy.shape[0]
    h, w = base_u.shape
    meta = batch_meta(b, h, w, group_shape)
    u_c, f_c = _goal_batch_arrays(
        base_u, jnp.asarray(base_locked), goal_xy,
        None if obstacle_xy is None else jnp.asarray(obstacle_xy, jnp.int32),
        b, h, w, meta["hp8"], meta["wp"], meta["gpr"], meta["gpc"],
        meta["n_blocks"])
    return u_c, f_c, meta


def solve_batch_goals(
    base_u,
    base_locked,
    goal_xy,
    obstacle_xy=None,
    epsilon: float = C.DEFAULT_EPSILON,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    group_shape: tuple[int, int] | None = None,
    interpret: bool | None = None,
):
    """Device-resident lockstep solve of B distinct-goal scenarios on one
    shared base grid (:func:`make_goal_batch` + the compiled
    check/retire/freeze loop of :func:`solve_batch_device`).

    Returns (u[B, H, W], iterations[B], deltas[B], converged[B]).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u_c, frozen_c, meta = make_goal_batch(base_u, base_locked, goal_xy,
                                          obstacle_xy, group_shape)
    b, h, w = meta["b"], meta["h"], meta["w"]
    gpr, gpc, nb = meta["gpr"], meta["gpc"], meta["n_blocks"]
    n_lanes = nb * gpr * gpc
    retired0 = np.zeros(n_lanes, bool)
    retired0[b:] = True
    u_out, retired, iters, deltas, _ = _solve_collage_device(
        u_c, frozen_c, jnp.asarray(retired0), jnp.float32(epsilon),
        stagger, max_iterations, max(h, w), nb, gpr, gpc,
        meta["hp8"], meta["wp"], meta["block_rows"], interpret,
    )
    return (
        unstack(u_out, meta),
        np.asarray(iters)[:b],
        np.asarray(deltas)[:b],
        np.asarray(retired)[:b],
    )


def solve_batch(
    u: np.ndarray | jax.Array,
    locked: np.ndarray | jax.Array,
    epsilon: float = C.DEFAULT_EPSILON,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    group_shape: tuple[int, int] | None = None,
    interpret: bool | None = None,
):
    """Lockstep solve of B scenarios through the block-collage kernel.

    Per-lane exactness as :func:`epic_tpu.solver.batched.solve_batch`: the
    check sweep runs as its own pass, per-lane deltas reduce on device, and
    a lane retires (tile frozen) when delta < eps and iter + 1 >= max(H, W).

    Returns (u[B, H, W], iterations[B], deltas[B], converged[B]).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u = np.asarray(u, np.float32)
    locked_np = np.asarray(locked).astype(bool)
    b, h, w = u.shape
    m_max = max(h, w)

    u_c, frozen_c, meta = pad_batch(u, locked_np, group_shape)
    gpr, gpc, nb = meta["gpr"], meta["gpc"], meta["n_blocks"]
    hp8, wp = meta["hp8"], meta["wp"]

    n_lanes = nb * gpr * gpc
    iters = np.zeros(n_lanes, np.int64)
    deltas = np.full(n_lanes, epsilon + 1.0, np.float32)
    retired = np.zeros(n_lanes, bool)
    retired[b:] = True
    frozen_host = np.array(frozen_c)

    def freeze_lane(lane):
        g, idx = divmod(lane, gpr * gpc)
        r, c = divmod(idx, gpc)
        y0 = g * meta["block_rows"] + r * hp8
        frozen_host[y0 : y0 + hp8, c * wp : (c + 1) * wp] = 1

    t = 0
    frozen_dev = jnp.asarray(frozen_host)
    while not retired.all() and t < max_iterations:
        u_prev = u_c
        u_c, _ = sweep_chunk_batch(u_c, frozen_dev, jnp.int32(t), 1, meta, interpret)
        d = np.asarray(_per_lane_delta(u_c, u_prev, nb, gpr, gpc, hp8, wp))
        active = ~retired
        deltas[active] = d[active]
        t += 1
        iters[active] = t
        just_done = active & (d < epsilon) & (t >= m_max)
        if just_done.any():
            retired |= just_done
            for lane in np.nonzero(just_done)[0]:
                freeze_lane(lane)
            frozen_dev = jnp.asarray(frozen_host)
        if retired.all():
            break
        u_c, _ = sweep_chunk_batch(
            u_c, frozen_dev, jnp.int32(t), stagger - 1, meta, interpret
        )
        t += stagger - 1
        active = ~retired
        iters[active] = t

    return (
        unstack(u_c, meta),
        iters[:b].astype(np.int32),
        deltas[:b],
        retired[:b],
    )
