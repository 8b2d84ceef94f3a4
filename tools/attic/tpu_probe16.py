#!/usr/bin/env python
"""TPU probe 16: big-volume 3D banded kernel (pallas_biggrid3d) on chip.

1. correctness: chunked sweeps vs the numpy oracle on a small volume
2. throughput at 256^3 (16.7M cells, ~8x the VMEM-resident budget) for
   chunk_depth 4 and 8 (halo redundancy vs HBM round-trip trade)
3. XLA fallback baseline (core.update_n) at the same volume

Measurement discipline: >= 2 s device work per timed region, warm == timed
static args, close with a data-dependent D2H readback.
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
from epic_tpu.solver import core, pallas_biggrid3d, reference_np  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def volume(d, h, w, density=0.1, seed=0):
    rng = np.random.default_rng(seed)
    u = np.full((d, h, w), -1e6, dtype=np.float32)
    locked = np.zeros((d, h, w), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    if density:
        locked |= rng.random((d, h, w)) < density
    u[d // 2, h // 2, w // 2] = 0.0
    locked[d // 2, h // 2, w // 2] = True
    return make_state(u, locked, epsilon=1e-2)


def correctness():
    st = volume(24, 20, 140, density=0.15, seed=3)
    t0 = time.perf_counter()
    out = pallas_biggrid3d.update_n(st, 9, chunk_depth=4, interpret=False)
    got = np.asarray(out.u)
    compile_s = time.perf_counter() - t0
    ref = np.asarray(st.u)
    locked = np.asarray(st.locked)
    for it in range(9):
        ref, d = reference_np.sweep_3d(ref, locked, it)
        if it == 0:
            d0 = d
    err = float(np.max(np.abs(got - ref)))
    report("biggrid3d_correctness", compile_s=round(compile_s, 1),
           max_abs_err=err, delta_err=abs(float(out.delta) - float(d0)),
           ok=bool(err < 1e-3))
    return err < 1e-3


@functools.partial(jax.jit, static_argnames=("band", "k", "hp", "reps"))
def _chunks(u_pad, frozen_ext, band, k, hp, reps):
    def body(i, carry):
        u, it = carry
        u, _ = pallas_biggrid3d.sweep_chunk_bands(
            u, frozen_ext, it, k, band, k, hp, False
        )
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


def throughput(chunk_depth, sweeps_target=400):
    d, h, w = 256, 256, 256
    st = volume(d, h, w, density=0.1, seed=1)
    band, k = pallas_biggrid3d.choose_layout((d, h, w), chunk_depth)
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
    report(f"biggrid3d_256_k{k}", band=band, k=k, reps=reps,
           compile_s=round(compile_s, 1), warm_s=round(dt, 3),
           sweeps_per_s=round(sweeps / dt),
           g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
           g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
           checksum=checksum)


def xla_baseline(num_steps=200):
    d, h, w = 256, 256, 256
    st = volume(d, h, w, density=0.1, seed=1)
    t0 = time.perf_counter()
    out = core.update_n(st, num_steps)
    _ = np.asarray(out.u[0, 0, 0])
    compile_s = time.perf_counter() - t0
    st = volume(d, h, w, density=0.1, seed=1)
    t0 = time.perf_counter()
    out = core.update_n(st, num_steps)
    _ = np.asarray(out.u)
    dt = time.perf_counter() - t0
    cells = d * h * w
    report("xla3d_256", compile_s=round(compile_s, 1), warm_s=round(dt, 3),
           g_visits_per_s=round(num_steps * cells / dt / 1e9, 1),
           g_updates_per_s=round(num_steps * cells / 2 / dt / 1e9, 1))


def main():
    report("env", backend=jax.default_backend())
    if not correctness():
        return
    throughput(4)
    throughput(8)
    xla_baseline()


if __name__ == "__main__":
    main()
