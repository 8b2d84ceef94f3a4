#!/usr/bin/env python
"""TPU probe 19: 2D biggrid gather-chunk vs manual-DMA chunk, 4096^2-16384^2.

Same discipline as probe18: warm chunk + checksum programs before timing,
>= 2 s timed regions, data-dependent 4-byte D2H barrier, checksums
cross-checked gather-vs-DMA per layout. Also scans K=32 (deeper temporal
blocking — with the gather gone the redundancy trade moves).
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
        report(f"{variant}_{h}x{w}_b{band}_k{k}",
               ext=band + 2 * k, nb=-(-h // band),
               compile_s=round(compile_s, 1), warm_s=round(dt, 3),
               sweeps=sweeps,
               g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
               g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
               checksum=checksum)
        return checksum
    except Exception as e:
        report(f"{variant}_{h}x{w}_b{band}_k{k}", error=str(e)[-160:])
        return None


def main():
    report("env", backend=jax.default_backend())
    # 4096^2: default layout (auto) at K=16, plus K=32 deeper blocking.
    st = grid(4096, 4096)
    for band, k in [bg.choose_layout((4096, 4096)), (448, 32)]:
        cs_g = run(st, "gather", band, k, sweeps_target=6000)
        cs_d = run(st, "dma", band, k, sweeps_target=6000)
        if cs_g is not None and cs_d is not None:
            report(f"xcheck_4096_b{band}_k{k}", match=bool(cs_g == cs_d))
    del st
    # 8192^2 and 16384^2: DMA at the auto layout vs gather baseline.
    for n, sweeps in ((8192, 1600), (16384, 400)):
        st = grid(n, n)
        band, k = bg.choose_layout((n, n))
        cs_g = run(st, "gather", band, k, sweeps_target=sweeps)
        cs_d = run(st, "dma", band, k, sweeps_target=sweeps)
        if cs_g is not None and cs_d is not None:
            report(f"xcheck_{n}_b{band}_k{k}", match=bool(cs_g == cs_d))
        del st


if __name__ == "__main__":
    main()
