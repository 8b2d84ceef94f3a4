#!/usr/bin/env python
"""TPU probe 13: 3D Pallas kernel — Mosaic compile validation, exactness
vs the oracle on the real chip, and VMEM-resident throughput.

The 3D kernel (solver/pallas_sweep3d) is new in this round; interpret-mode
tests are green, but v5e Mosaic has rejected constructs before (int8 vector
compares, rank-1 values), so the compiled path needs on-chip validation:
rank-3 pltpu.roll on the minor axes + slice/concat on the untiled major axis.

Programs (kept few — each distinct jaxpr costs minutes of remote compile):
  1. small-volume update_n chunk (correctness vs numpy oracle, elementwise)
  2. throughput: fori over K-sweep chunks on a ~2M-cell volume, >=2 s of
     device work in one dispatch, closed by a data-dependent D2H readback
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
from epic_tpu.solver import pallas_sweep3d, reference_np  # noqa: E402


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
    return u, locked


def correctness():
    u, locked = volume(10, 24, 140, density=0.15, seed=3)
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = pallas_sweep3d.update_n(st, 9, interpret=False)
    got = np.asarray(out.u)
    compile_s = time.perf_counter() - t0
    ref = u
    for it in range(9):
        ref, d = reference_np.sweep_3d(ref, locked, it)
        if it == 0:
            d0 = d
    err = float(np.max(np.abs(got - ref)))
    report(
        "3d_correctness",
        compile_s=round(compile_s, 1),
        max_abs_err=err,
        delta_err=abs(float(out.delta) - float(d0)),
        ok=bool(err < 1e-3),
    )
    return err < 1e-3


@functools.partial(jax.jit, static_argnames=("k", "reps", "hp"))
def _chunks(u2, frozen2, k, reps, hp):
    def body(i, carry):
        u2, it = carry
        u2, delta = pallas_sweep3d.sweep3d_chunk_flat(u2, frozen2, it, k, hp, False)
        return u2, it + k

    return jax.lax.fori_loop(0, reps, body, (u2, jnp.int32(0)))


def throughput():
    # 30 x 256 x 256 = 1.97M cells: the largest tile-aligned VMEM-resident
    # class (pallas_sweep3d.fits_vmem budget). NOTE reps is static: warm and
    # timed runs MUST use the same reps or the "warm" timing includes a fresh
    # compile (the round-1 trap; cost this probe a bogus 30x-slowdown read).
    d, h, w = 30, 256, 256
    u, locked = volume(d, h, w, density=0.1, seed=1)
    st = make_state(u, locked, epsilon=1e-2)
    padded = pallas_sweep3d.pad_state(st)
    u2 = padded.u.reshape(d * h, w)
    frozen2 = padded.frozen.reshape(d * h, w)
    k, reps = 100, 400  # 40k sweeps ≈ 2 s of device work at ~39 G visits/s
    t0 = time.perf_counter()
    out, _ = _chunks(u2, frozen2, k, reps, h)
    _ = np.asarray(out[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, it = _chunks(u2, frozen2, k, reps, h)
    checksum = float(np.asarray(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))))
    dt = time.perf_counter() - t0
    sweeps = k * reps
    cells = d * h * w
    report(
        "3d_throughput",
        compile_s=round(compile_s, 1),
        warm_s=round(dt, 3),
        sweeps_per_s=round(sweeps / dt),
        g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
        g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
        checksum=checksum,
    )


def main():
    report("env", backend=jax.default_backend(), devices=len(jax.devices()))
    if correctness():
        throughput()


if __name__ == "__main__":
    main()
