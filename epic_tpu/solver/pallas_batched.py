"""Batched-scenario solving on TPU: the stacked-grid design.

BASELINE config 3 asks for 4096 (map, goal-set) solves per chip. Two earlier
designs fell short on v5e: the vmapped XLA path materializes per-sweep
intermediates through HBM (~26x off roofline), and a 3D [lanes, H, W] Pallas
brick lowers poorly in Mosaic (per-slice serialization). The winning
observation: every map's boundary ring is frozen and H is padded even, so

  - stacking the batch **vertically** into one [B*H, W] grid keeps the
    checkerboard parity of every map intact ((b*H + y + x) % 2 == (y+x) % 2
    for even H), and
  - the frozen seams make the maps independent — a stencil read across a
    seam only feeds a frozen cell's masked-out update.

The batch therefore runs through the proven 2D kernels unchanged: the
temporal row-band tiled kernel (:mod:`epic_tpu.solver.pallas_tiled`) does K
sweeps per HBM round trip over the tall grid. Per-lane staggered-check
deltas are computed between kernel passes with one cheap XLA reduction over
the stacked layout (the check sweep is split out exactly as the reference
protocol requires).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from . import pallas_tiled


def pad_batch(u: np.ndarray, locked: np.ndarray, num_sweeps: int = 10):
    """Stack a [B, H, W] batch into a tall tiled-kernel grid.

    Returns (u_stacked, frozen_stacked, meta) where meta carries the layout
    for :func:`sweep_chunk_batch` / :func:`unstack`. Width pads to 128; each
    map keeps its own frozen boundary ring; K guard rows top and bottom.
    """
    b, h, w = u.shape
    if h % 2:
        raise ValueError("map height must be even for stacked batching")
    k = num_sweeps
    wp = -(-w // 128) * 128
    hs = b * h
    band = h  # one map per band keeps halos within neighbouring maps
    nbands = b
    hp = nbands * band + 2 * k

    u_p = np.full((hp, wp), np.float32(C.LOG_SPACE_OBSTACLE), np.float32)
    frozen = np.ones((hp, wp), dtype=np.int32)
    interior = np.zeros((h, w), dtype=bool)
    interior[1:-1, 1:-1] = True
    u_flat = np.asarray(u, np.float32)
    l_flat = np.asarray(locked).astype(bool)
    u_p[k : k + hs, :w] = u_flat.reshape(hs, w)
    frozen[k : k + hs, :w] = np.where(
        np.tile(interior, (b, 1)), l_flat.reshape(hs, w).astype(np.int32), 1
    )
    meta = dict(b=b, h=h, w=w, k=k, hp=hp, wp=wp, band=band)
    return jnp.asarray(u_p), jnp.asarray(frozen), meta


def unstack(u_stacked: jax.Array, meta) -> np.ndarray:
    b, h, w, k = meta["b"], meta["h"], meta["w"], meta["k"]
    arr = np.asarray(u_stacked)[k : k + b * h, :w]
    return arr.reshape(b, h, w)


def sweep_chunk_batch(
    u_stacked: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    meta,
    interpret: bool = False,
):
    """num_sweeps sweeps over the stacked batch (one tiled-kernel pass).

    num_sweeps must equal meta["k"] (the guard/halo depth baked into the
    layout) or be split into passes of that depth by the caller.
    """
    assert num_sweeps <= meta["k"], (num_sweeps, meta["k"])
    u, delta = pallas_tiled.sweep_chunk_tiled(
        u_stacked, frozen, iteration, num_sweeps, meta["band"], interpret,
        guard=meta["k"],
    )
    return u, delta


@functools.partial(jax.jit, static_argnames=("b", "h", "wp", "k"))
def _per_lane_delta(u_new, u_old, b: int, h: int, wp: int, k: int):
    diff = jnp.abs(u_new - u_old)[k : k + b * h, :]
    return jnp.max(diff.reshape(b, h * wp), axis=1)


def solve_batch(
    u: np.ndarray | jax.Array,
    locked: np.ndarray | jax.Array,
    epsilon: float = C.DEFAULT_EPSILON,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 10,
    interpret: bool | None = None,
):
    """Lockstep solve of B scenarios through the stacked tiled kernel.

    Per-lane exactness as :func:`epic_tpu.solver.batched.solve_batch`: the
    check sweep runs as its own pass, per-lane deltas reduce on device, and
    a lane retires (frozen plane set all-True) when delta < eps and
    iter + 1 >= max(H, W). ``stagger - 1`` must be divisible by
    ``chunk_depth`` (default 10 fits the reference's stagger of 100).

    Returns (u[B, H, W], iterations[B], deltas[B], converged[B]).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if (stagger - 1) % chunk_depth:
        raise ValueError("stagger - 1 must be divisible by chunk_depth")
    u = np.asarray(u, np.float32)
    locked_np = np.asarray(locked).astype(bool)
    b, h, w = u.shape
    m_max = max(h, w)

    # Layout for the plain-sweep passes (depth K) and the check pass (K=1).
    u_s, frozen_s, meta = pad_batch(u, locked_np, num_sweeps=chunk_depth)
    k = meta["k"]

    iters = np.zeros(b, np.int64)
    deltas = np.full(b, epsilon + 1.0, np.float32)
    retired = np.zeros(b, bool)
    frozen_host = np.array(frozen_s)
    lane_rows = lambda lane: slice(k + lane * h, k + (lane + 1) * h)

    # A 1-sweep layout shares the same padded shape (guards just deeper
    # than needed), so we can reuse u_s/frozen_s for the check pass by
    # running the K-deep kernel for 1 sweep via a separate meta.
    t = 0
    while not retired.all() and t < max_iterations:
        frozen_dev = jnp.asarray(frozen_host)
        u_prev = u_s
        # Check sweep (single sweep through the tiled kernel at depth K=1
        # semantics: we run depth-K kernel with num_sweeps=K but need only
        # the first sweep's per-lane delta -> run a 1-sweep pass instead).
        u_s, _ = pallas_tiled.sweep_chunk_tiled(
            u_s, frozen_dev, jnp.int32(t), 1, meta["band"], interpret,
            guard=k,
        )
        d = np.asarray(
            _per_lane_delta(u_s, u_prev, b, h, meta["wp"], k)
        )
        active = ~retired
        deltas[active] = d[active]
        t += 1
        iters[active] = t
        just_done = active & (d < epsilon) & (t >= m_max)
        if just_done.any():
            retired |= just_done
            for lane in np.nonzero(just_done)[0]:
                frozen_host[lane_rows(lane)] = 1
            frozen_dev = jnp.asarray(frozen_host)
        if retired.all():
            break
        # stagger - 1 plain sweeps in depth-K passes.
        for _ in range((stagger - 1) // chunk_depth):
            u_s, _ = pallas_tiled.sweep_chunk_tiled(
                u_s, frozen_dev, jnp.int32(t), chunk_depth, meta["band"],
                interpret, guard=k,
            )
            t += chunk_depth
        active = ~retired
        iters[active] = t

    return unstack(u_s, meta), iters.astype(np.int32), deltas, retired
