"""Batched-scenario solving on TPU: the collage design.

BASELINE config 3 asks for 4096 (map, goal-set) solves per chip. Designs
that fell short on v5e:

- vmapped XLA (:mod:`epic_tpu.solver.batched`): per-sweep intermediates
  through HBM, ~26x off roofline;
- a 3D [lanes, H, W] Pallas brick: Mosaic lowers 3D rolls poorly;
- a tall [B*H, W] stack through the tiled kernel: only 128 lanes wide, so
  thousands of tiny serialized DMA bands dominate.

The winning layout is a near-square **collage**: B maps arranged in a
(Gr x Gc) grid of tiles, one big 2D array of (Gr*H, Gc*W). Because every
map keeps its frozen boundary ring and H, W are padded even, the collage
preserves each map's checkerboard parity (tile offsets are even) and the
frozen seams keep maps independent — a stencil read across a seam only
feeds a masked-out update. The whole batch then runs through the proven 2D
temporal-blocking kernel (:mod:`epic_tpu.solver.pallas_tiled`) with wide
bands and K sweeps per HBM round trip.

Per-lane staggered-check deltas reduce on device between passes
(one reshape + max over tile axes), and a lane retires (its tile's frozen
plane set all-True) exactly per the reference protocol.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from . import pallas_tiled


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_batch(
    u: np.ndarray,
    locked: np.ndarray,
    num_sweeps: int = 16,
    band: int = 256,
    grid_cols: int | None = None,
):
    """Arrange a [B, H, W] batch into a collage for the tiled kernel.

    ``num_sweeps`` (the guard depth) must be a multiple of 8 — Mosaic
    requires 8-aligned DMA window heights and offsets.

    Returns (u_collage, frozen_collage, meta). W pads to a lane multiple;
    unused tiles (when Gr*Gc > B) are fully frozen.
    """
    b, h, w = u.shape
    if h % 2:
        raise ValueError("map height must be even for collage batching")
    wp = _round_up(w, 128)
    if grid_cols is None:
        # Aim for a few thousand lanes of width.
        grid_cols = max(1, min(b, 4096 // wp if wp <= 4096 else 1))
    gc = grid_cols
    gr = -(-b // gc)
    k = num_sweeps

    rows = gr * h
    hp = _round_up(rows, band) + 2 * k
    cols = gc * wp

    u_c = np.full((hp, cols), np.float32(C.LOG_SPACE_OBSTACLE), np.float32)
    frozen = np.ones((hp, cols), dtype=np.int32)
    interior = np.zeros((h, w), dtype=bool)
    interior[1:-1, 1:-1] = True
    u_np = np.asarray(u, np.float32)
    l_np = np.asarray(locked).astype(np.int32)
    for lane in range(b):
        r, c = divmod(lane, gc)
        y0 = k + r * h
        x0 = c * wp
        u_c[y0 : y0 + h, x0 : x0 + w] = u_np[lane]
        frozen[y0 : y0 + h, x0 : x0 + w] = np.where(interior, l_np[lane], 1)
    meta = dict(b=b, h=h, w=w, k=k, gr=gr, gc=gc, wp=wp, hp=hp,
                cols=cols, band=band)
    return jnp.asarray(u_c), jnp.asarray(frozen), meta


def unstack(u_collage: jax.Array, meta) -> np.ndarray:
    b, h, w, k = meta["b"], meta["h"], meta["w"], meta["k"]
    gr, gc, wp = meta["gr"], meta["gc"], meta["wp"]
    arr = np.asarray(u_collage)[k : k + gr * h, :].reshape(gr, h, gc, wp)
    arr = arr.transpose(0, 2, 1, 3).reshape(gr * gc, h, wp)[:b, :, :w]
    return arr


def sweep_chunk_batch(
    u_collage: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    meta,
    interpret: bool = False,
):
    """num_sweeps sweeps over the collage (one tiled-kernel pass);
    num_sweeps <= meta['k'] (the guard depth baked into the layout)."""
    assert num_sweeps <= meta["k"], (num_sweeps, meta["k"])
    return pallas_tiled.sweep_chunk_tiled(
        u_collage, frozen, iteration, num_sweeps, meta["band"], interpret,
        guard=meta["k"],
    )


@functools.partial(jax.jit, static_argnames=("gr", "gc", "h", "wp", "k"))
def _per_lane_delta(u_new, u_old, gr: int, gc: int, h: int, wp: int, k: int):
    diff = jnp.abs(u_new - u_old)[k : k + gr * h, :]
    per_tile = jnp.max(diff.reshape(gr, h, gc, wp), axis=(1, 3))
    return per_tile.reshape(gr * gc)


def solve_batch(
    u: np.ndarray | jax.Array,
    locked: np.ndarray | jax.Array,
    epsilon: float = C.DEFAULT_EPSILON,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 16,
    band: int = 256,
    grid_cols: int | None = None,
    interpret: bool | None = None,
):
    """Lockstep solve of B scenarios through the collage tiled kernel.

    Per-lane exactness as :func:`epic_tpu.solver.batched.solve_batch`: the
    check sweep runs as its own pass, per-lane deltas reduce on device, and
    a lane retires (tile frozen) when delta < eps and iter + 1 >= max(H, W).
    The stagger-1 plain sweeps run as full chunk_depth passes plus one
    remainder pass.

    Returns (u[B, H, W], iterations[B], deltas[B], converged[B]).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u = np.asarray(u, np.float32)
    locked_np = np.asarray(locked).astype(bool)
    b, h, w = u.shape
    m_max = max(h, w)

    u_c, frozen_c, meta = pad_batch(
        u, locked_np, num_sweeps=chunk_depth, band=band, grid_cols=grid_cols
    )
    k, gr, gc, wp = meta["k"], meta["gr"], meta["gc"], meta["wp"]

    n_lanes = gr * gc
    iters = np.zeros(n_lanes, np.int64)
    deltas = np.full(n_lanes, epsilon + 1.0, np.float32)
    retired = np.zeros(n_lanes, bool)
    retired[b:] = True
    frozen_host = np.array(frozen_c)

    def freeze_lane(lane):
        r, c = divmod(lane, gc)
        frozen_host[k + r * h : k + (r + 1) * h, c * wp : (c + 1) * wp] = 1

    t = 0
    frozen_dev = jnp.asarray(frozen_host)
    while not retired.all() and t < max_iterations:
        u_prev = u_c
        # The protocol's check sweep, as its own shallow pass.
        u_c, _ = sweep_chunk_batch(
            u_c, frozen_dev, jnp.int32(t), 1, meta, interpret
        )
        d = np.asarray(_per_lane_delta(u_c, u_prev, gr, gc, h, wp, k))
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
        rest = stagger - 1
        while rest > 0:
            depth = min(chunk_depth, rest)
            u_c, _ = sweep_chunk_batch(
                u_c, frozen_dev, jnp.int32(t), depth, meta, interpret
            )
            t += depth
            rest -= depth
        active = ~retired
        iters[active] = t

    return (
        unstack(u_c, meta),
        iters[:b].astype(np.int32),
        deltas[:b],
        retired[:b],
    )
