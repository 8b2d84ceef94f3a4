#!/usr/bin/env python
"""TPU probe 17: biggrid3d layout scan at 256^3.

probe16: k=8/band=16 (ext 32 planes, 50% halo redundancy) = 23.4 G
visits/s; k=4/band=24 unexpectedly 4.8x slower. Scan bigger extended
bands (the 128 MB vmem limit allows ~4x the 2M-cell ext budget at this
plane size) to cut redundancy, and re-measure the k=4 oddity.
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
from epic_tpu.solver import pallas_biggrid3d  # noqa: E402


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
def _chunks(u_pad, frozen_ext, band, k, hp, reps):
    def body(i, carry):
        u, it = carry
        u, _ = pallas_biggrid3d.sweep_chunk_bands(
            u, frozen_ext, it, k, band, k, hp, False
        )
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


def run(st, band, k, sweeps_target=800):
    d, h, w = st.u.shape
    try:
        g = pallas_biggrid3d.pad_state(st, band=band, k=k)
        frozen_ext = pallas_biggrid3d.stack_frozen(g.frozen, g.hp, band, k)
        reps = max(1, sweeps_target // k)
        t0 = time.perf_counter()
        out, _ = _chunks(g.u, frozen_ext, band, k, g.hp, reps)
        _ = np.asarray(out[0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, _ = _chunks(g.u, frozen_ext, band, k, g.hp, reps)
        checksum = float(np.asarray(jnp.sum(jnp.where(out > -1e5, out, 0.0))))
        dt = time.perf_counter() - t0
        sweeps = k * reps
        cells = d * h * w
        report(f"b{band}_k{k}", ext_planes=band + 2 * k,
               nb=-(-d // band), compile_s=round(compile_s, 1),
               warm_s=round(dt, 3),
               g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
               g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
               checksum=checksum)
    except Exception as e:
        report(f"b{band}_k{k}", error=str(e)[-200:])


def main():
    report("env", backend=jax.default_backend())
    st = volume(256, 256, 256)
    for band, k in [(16, 8), (48, 8), (32, 16), (112, 8), (96, 16), (24, 4)]:
        run(st, band, k)


if __name__ == "__main__":
    main()
