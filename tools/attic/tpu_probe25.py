#!/usr/bin/env python
"""TPU probe 25: the 2D-tiled DMA kernel (pallas_tiled2d) vs the row-banded
production kernel in the redundancy-limited regime.

probe24 proved Mosaic rejects ext bands above the 2M-cell scoped-VMEM
budget, so at 16384-wide grids the banded layout is stuck at 1.33x halo
redundancy (38.0 G updates/s). Column tiling keeps redundancy ~1.10 at any
width. Scan tiled layouts at 16384/8192/4096 and an ultra-wide
32768x16384 (banded redundancy there: 1.33x), cross-checking checksums
between tiled and banded at identical sweep counts.

Discipline: probe21's (>= 2 s regions, 4-byte barrier, warm reps identical
to timed reps, device-side input construction — the tunnel moves 41 MB/s
H2D, so NumPy staging of GB-scale grids would dominate wall time).
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
from epic_tpu.solver import pallas_tiled2d as t2  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _grid_device(h: int, w: int, seed: int = 1, density: float = 0.1):
    key = jax.random.PRNGKey(seed)
    u = jnp.full((h, w), -1e6, dtype=jnp.float32)
    locked = jax.random.uniform(key, (h, w)) < density
    edge_r = (jnp.arange(h) % (h - 1)) == 0
    edge_c = (jnp.arange(w) % (w - 1)) == 0
    locked = locked | edge_r[:, None] | edge_c[None, :]
    u = u.at[h // 2, w // 2].set(0.0)
    locked = locked.at[h // 2, w // 2].set(True)
    return u, locked


def state_device(h, w):
    u, locked = _grid_device(h, w)
    return make_state(u, locked, epsilon=1e-2)


@functools.partial(jax.jit, static_argnames=("band", "k", "wt", "reps"))
def _chunks_tiled(u_pad, frozen_pad, band, k, wt, reps):
    def body(i, carry):
        u, it = carry
        u, _ = t2.sweep_chunk_tiled(u, frozen_pad, it, k, band, k, wt, False)
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


def run(st, variant, layout, sweeps):
    h, w = st.u.shape
    try:
        if variant == "tiled":
            band, k, wt = layout
            g = t2.pad_state(st, band=band, k=k, wt=wt)
            reps = sweeps // k
            fn = lambda: _chunks_tiled(g.u, g.frozen, band, k, wt, reps)
            red = round((band + 2 * k) / band * (wt + 256) / wt, 3)
            tag = f"tiled_{h}x{w}_b{band}_k{k}_wt{wt}"
        else:
            band, k = layout
            g = bg.pad_state(st, band=band, k=k)
            reps = sweeps // k
            fn = lambda: _chunks_dma(g.u, g.frozen, band, k, reps)
            red = round((band + 2 * k) / band, 3)
            tag = f"dma_{h}x{w}_b{band}_k{k}"
        assert reps * k == sweeps, (reps, k, sweeps)
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
        cells = h * w
        report(tag, redundancy=red,
               compile_s=round(compile_s, 1), warm_s=round(dt, 3),
               sweeps=sweeps,
               g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
               g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
               checksum=checksum)
        return checksum
    except Exception as e:
        report(f"{variant}_{h}x{w}_{layout}", error=str(e)[-200:])
        return None


def main():
    report("env", backend=jax.default_backend())

    st = state_device(16384, 16384)
    auto = t2.choose_tiled_layout((16384, 16384))
    report("auto_layout_16384", band=auto[0], k=auto[1], wt=auto[2])
    cs = {}
    cs["tiled_auto"] = run(st, "tiled", auto, sweeps=608)
    cs["tiled_k16"] = run(st, "tiled", (448, 16, 4096), sweeps=608)
    cs["tiled_w8192"] = run(st, "tiled", (232, 8, 8192), sweeps=608)
    cs["banded_prod"] = run(st, "banded", (96, 16), sweeps=608)
    vals = {v for v in cs.values() if v is not None}
    report("checksums_16384", distinct=len(vals), values=cs)
    del st

    st = state_device(8192, 8192)
    auto = t2.choose_tiled_layout((8192, 8192))
    cs = {}
    cs["tiled_auto"] = run(st, "tiled", auto, sweeps=2400)
    cs["banded_prod"] = run(st, "banded", (224, 16), sweeps=2400)
    report("checksums_8192", distinct=len({v for v in cs.values() if v}), values=cs)
    del st

    st = state_device(4096, 4096)
    auto = t2.choose_tiled_layout((4096, 4096))
    run(st, "tiled", auto, sweeps=6000)
    del st

    # Ultra-wide: the banded layout degrades to 1.33x here; tiled stays 1.10.
    st = state_device(32768, 16384)
    auto = t2.choose_tiled_layout((32768, 16384))
    run(st, "tiled", auto, sweeps=304)
    run(st, "banded", bg.choose_layout((32768, 16384)), sweeps=304)


if __name__ == "__main__":
    main()
