"""Device-side padded-layout construction shared by the kernel modules.

Every kernel regime pads (u, locked) into its HBM layout before sweeping.
Through round 2 each ``pad_state`` built the interior mask as a host NumPy
array and uploaded it with ``jnp.asarray`` — a FULL-GRID H2D transfer per
pad call. Production surfaces (update_n / solve / planner ticks) pad every
call, so each tick dragged a grid-sized bool/int32 mask through the
~100 MB/s tunnel (≈5.5 s at 32768x16384, ≈0.7 s at 8192²) and issued ~6
separate eager dispatches whose full-size intermediates churned HBM (the
r3 battery OOMed the 32768x16384 pad+cycle sequence).

:func:`box_mask` builds the same axis-aligned interior box from
``broadcasted_iota`` ON DEVICE; the callers wrap their whole pad in one
``jax.jit`` program (static dims), so padding is a single dispatch with
XLA-managed transients and no host mask upload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_mask(shape, lo, hi):
    """True where lo[d] <= index_d < hi[d] on every axis (trace-time)."""
    m = None
    for ax, (l, h) in enumerate(zip(lo, hi)):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        t = (i >= l) & (i < h)
        m = t if m is None else m & t
    return m
