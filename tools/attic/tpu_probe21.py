#!/usr/bin/env python
"""TPU probe 21: double-buffered 2D DMA chunks vs the gather baseline.

probe19 (single-buffered 2D DMA) tied the gather path. With cross-step
double buffering the DMA path should pull ahead where halo redundancy and
band count are highest (16384²: band 96, 1.33x), and possibly at 4096²
with SMALLER bands (more grid steps to pipeline). Scan both, plus halved
ext (two scratch slots resident).
Discipline: probe18/19's (warm chunk+checksum, >=2 s regions, 4-byte
barrier, checksums cross-checked vs the gather path).
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
from epic_tpu.solver import pallas_biggrid as bg  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def grid(h, w, density=0.1, seed=1):
    rng = np.random.default_rng(seed)
    u = np.full((h, w), -1e6, dtype=np.float32)
    locked = np.zeros((h, w), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked |= rng.random((h, w)) < density
    u[h // 2, w // 2] = 0.0
    locked[h // 2, w // 2] = True
    return make_state(u, locked, epsilon=1e-2)


@functools.partial(jax.jit, static_argnames=("band", "k", "reps"))
def _chunks_gather(u_pad, frozen_ext, band, k, reps):
    def body(i, carry):
        u, it = carry
        u, _ = bg.sweep_chunk_bands(u, frozen_ext, it, k, band, k, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("band", "k", "reps"))
def _chunks_dma(u_pad, frozen_pad, band, k, reps):
    def body(i, carry):
        u, it = carry
        u, _ = bg.sweep_chunk_dma(u, frozen_pad, it, k, band, k, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


@jax.jit
def _checksum(u):
    return jnp.sum(jnp.where(u > -1e5, u, 0.0))


def run(st, variant, band, k, sweeps_target):
    h, w = st.u.shape
    try:
        g = bg.pad_state(st, band=band, k=k)
        reps = max(1, sweeps_target // k)
        if variant == "gather":
            frozen = bg.stack_frozen(g.frozen, band, k)
            fn = lambda: _chunks_gather(g.u, frozen, band, k, reps)
        else:
            fn = lambda: _chunks_dma(g.u, g.frozen, band, k, reps)
        t0 = time.perf_counter()
        out, _ = fn()
        _ = float(_checksum(out).block_until_ready())
        _ = np.asarray(out[0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, _ = fn()
        _ = np.asarray(out[0, 0])
        dt = time.perf_counter() - t0
        checksum = float(np.asarray(_checksum(out)))
        sweeps = k * reps
        cells = h * w
        report(f"{variant}_{h}_b{band}_k{k}",
               ext=band + 2 * k, nb=-(-h // band),
               compile_s=round(compile_s, 1), warm_s=round(dt, 3),
               sweeps=sweeps,
               g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
               g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
               checksum=checksum)
        return checksum
    except Exception as e:
        report(f"{variant}_{h}_b{band}_k{k}", error=str(e)[-160:])
        return None


def main():
    report("env", backend=jax.default_backend())
    # 16384²: redundancy-limited regime. Halve ext for the two slots.
    st = grid(16384, 16384)
    for band, k in [(96, 16), (48, 8), (56, 4), (24, 8)]:
        cs_d = run(st, "dma", band, k, sweeps_target=600)
    cs_g = run(st, "gather", 96, 16, sweeps_target=600)
    del st
    # 4096²: small-band double-buffered layouts vs the 41.6 G gather best.
    st = grid(4096, 4096)
    for band, k in [(224, 16), (96, 8), (240, 8)]:
        run(st, "dma", band, k, sweeps_target=6000)
    run(st, "gather", 456, 16, sweeps_target=6000)


if __name__ == "__main__":
    main()
