"""The pinned-op-order logsumexp stencil bodies shared by the production
Pallas kernels (pallas_sweep, pallas_sweep3d, pallas_biggrid,
pallas_tiled2d, pallas_biggrid3d, pallas_cycle; the superseded round-1/2
variants — pallas_packed/banded/tiled — were retired in round 3).

Float op order in the update is LOAD-BEARING: max tree over ((N,S),(W,E))
then a left-associated sum of shifted exponentials, log, add max, subtract
log(2n) — matching harmonic_cpu.cpp:59-70 / harmonic_gpu.cu:51-61 makes
every kernel bit-identical to the NumPy oracle and to each other on the
same backend. Keeping the sequence in ONE place keeps that bit-identity
from silently drifting when a kernel is edited.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

LOG2N_2D = np.float32(np.log(np.float64(4.0)))
LOG2N_3D = np.float32(np.log(np.float64(6.0)))


def lse4(u, n_rows: int, n_cols: int):
    """4-neighbour shifted logsumexp minus log(4) over a [n_rows, n_cols]
    VMEM block (neighbours fetched as rank-2 rolls; wrap garbage lands only
    on rows/columns the callers' validity masks exclude)."""
    un = pltpu.roll(u, 1, 0)
    us = pltpu.roll(u, n_rows - 1, 0)
    uw = pltpu.roll(u, 1, 1)
    ue = pltpu.roll(u, n_cols - 1, 1)
    m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
    s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
    return (m + jnp.log(s)) - LOG2N_2D


def lse6(u, n_rows: int, n_cols: int, hp: int):
    """6-neighbour shifted logsumexp minus log(6) over a volume flattened
    to [n_rows, n_cols] with plane height ``hp`` (z = ±hp-row rolls)."""
    uzm = pltpu.roll(u, hp, 0)
    uzp = pltpu.roll(u, n_rows - hp, 0)
    uym = pltpu.roll(u, 1, 0)
    uyp = pltpu.roll(u, n_rows - 1, 0)
    uxm = pltpu.roll(u, 1, 1)
    uxp = pltpu.roll(u, n_cols - 1, 1)
    m = jnp.maximum(uzm, uzp)
    m = jnp.maximum(m, uym)
    m = jnp.maximum(m, uyp)
    m = jnp.maximum(m, uxm)
    m = jnp.maximum(m, uxp)
    s = jnp.exp(uzm - m)
    s = s + jnp.exp(uzp - m)
    s = s + jnp.exp(uym - m)
    s = s + jnp.exp(uyp - m)
    s = s + jnp.exp(uxm - m)
    s = s + jnp.exp(uxp - m)
    return (m + jnp.log(s)) - LOG2N_3D
