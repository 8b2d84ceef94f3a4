#!/usr/bin/env python
"""TPU probe 24: can BIGGER extended bands buy back halo redundancy?

The 2M-cell ext-band budget caps 16384-wide bands at 128 rows (band 96,
k=16 -> 1.33x redundancy; compute ceiling 110/2/1.33 = 41 G updates/s,
measured 38). If Mosaic accepts 4M/8M-cell ext blocks under the 128M
vmem limit, redundancy drops to 1.14x/1.07x (ceilings 48/51 G). Scan
band sizes upward at 16384/8192/4096 for both chunk variants and record
wins or OOMs. Discipline: probe21's (>= 2 s regions, 4-byte barrier,
checksums cross-checked across variants at the same layout).
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
               redundancy=round((band + 2 * k) / band, 3),
               compile_s=round(compile_s, 1), warm_s=round(dt, 3),
               sweeps=sweeps,
               g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
               g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
               checksum=checksum)
        return checksum
    except Exception as e:
        report(f"{variant}_{h}_b{band}_k{k}", error=str(e)[-200:])
        return None


def main():
    report("env", backend=jax.default_backend())

    # 16384²: the redundancy-limited regime (current prod: dma b96 k16,
    # 38.0 G). ext 256 rows = 4M cells, ext 512 = 8.4M.
    st = grid(16384, 16384)
    cs = {}
    cs["dma_224"] = run(st, "dma", 224, 16, sweeps_target=600)
    cs["gather_224"] = run(st, "gather", 224, 16, sweeps_target=600)
    cs["gather_480"] = run(st, "gather", 480, 16, sweeps_target=600)
    cs["dma_480"] = run(st, "dma", 480, 16, sweeps_target=600)
    # Reference row at the current production layout for cross-checking:
    cs["dma_96"] = run(st, "dma", 96, 16, sweeps_target=600)
    vals = {v for v in cs.values() if v is not None}
    report("checksums_16384", distinct=len(vals), values=cs)
    del st

    # 8192²: prod b224 k16 (39.3 G, 1.14x). Try 1.07x and 1.03x layouts.
    st = grid(8192, 8192)
    run(st, "dma", 480, 16, sweeps_target=2400)
    run(st, "gather", 480, 16, sweeps_target=2400)
    run(st, "gather", 992, 16, sweeps_target=2400)
    del st

    # 4096²: prod gather b456 k16 (41.5 G, 1.07x). Try 1.03x.
    st = grid(4096, 4096)
    run(st, "gather", 968, 16, sweeps_target=6000)
    run(st, "dma", 968, 16, sweeps_target=6000)


if __name__ == "__main__":
    main()
