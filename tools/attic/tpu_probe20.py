#!/usr/bin/env python
"""TPU probe 20: double-buffered DMA 3D chunks at 256^3.

probe18 (single-buffered DMA): 38.0 / 34.2 / 32.6 G visits/s at k=4/8/2.
The DMA waits serialized with compute; cross-grid-step double buffering
(start band i+1's copy before computing band i) should recover the stall —
k=2 (1.14x redundancy) becomes interesting if copies are fully hidden.
Same measurement discipline as probe18/19.
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_biggrid3d as bg  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def volume(d, h, w, density=0.1, seed=1):
    rng = np.random.default_rng(seed)
    u = np.full((d, h, w), -1e6, dtype=np.float32)
    locked = np.zeros((d, h, w), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    locked |= rng.random((d, h, w)) < density
    u[d // 2, h // 2, w // 2] = 0.0
    locked[d // 2, h // 2, w // 2] = True
    return make_state(u, locked, epsilon=1e-2)


@functools.partial(jax.jit, static_argnames=("band", "k", "hp", "reps"))
def _chunks_dma(u_pad, frozen_pad, band, k, hp, reps):
    def body(i, carry):
        u, it = carry
        u, _ = bg.sweep_chunk_dma(u, frozen_pad, it, k, band, k, hp, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


@jax.jit
def _checksum(u):
    return jnp.sum(jnp.where(u > -1e5, u, 0.0))


def run(st, band, k, sweeps_target=4800):
    d, h, w = st.u.shape
    try:
        g = bg.pad_state(st, band=band, k=k)
        reps = max(1, sweeps_target // k)
        t0 = time.perf_counter()
        out, _ = _chunks_dma(g.u, g.frozen, band, k, g.hp, reps)
        _ = float(_checksum(out).block_until_ready())
        _ = np.asarray(out[0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, _ = _chunks_dma(g.u, g.frozen, band, k, g.hp, reps)
        _ = np.asarray(out[0, 0])
        dt = time.perf_counter() - t0
        checksum = float(np.asarray(_checksum(out)))
        sweeps = k * reps
        cells = d * h * w
        report(f"dmadb_b{band}_k{k}",
               ext_planes=band + 2 * k, nb=-(-d // band),
               compile_s=round(compile_s, 1), warm_s=round(dt, 3),
               sweeps=sweeps,
               g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
               g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
               checksum=checksum)
    except Exception as e:
        report(f"dmadb_b{band}_k{k}", error=str(e)[-200:])


def main():
    report("env", backend=jax.default_backend())
    st = volume(256, 256, 256)
    # Halve ext so 2x scratch slots stay inside the same scoped budget.
    for band, k in [(24, 4), (12, 2), (28, 2), (8, 4)]:
        run(st, band, k)
    # Round 2: k=1 (minimal redundancy, exchange every sweep — DMA may be
    # fully hidden now) + a b12_k2 repeat for variance.
    for band, k in [(14, 1), (30, 1), (12, 2)]:
        run(st, band, k)


if __name__ == "__main__":
    main()
