#!/usr/bin/env python
"""TPU probe 45: banded vs (z, y, x)-tiled for MID-plane volumes.

At 512x512 planes (262k padded cells) the plane-banded layout still fits
scoped VMEM but degenerates to band=1, k=1 — per-sweep HBM traffic
(red+1)/k = 4.0x — while the 3D-tiled layout runs k=2 at ~2.5x redundancy
(traffic 1.75x). If tiled wins here, the auto-dispatch should prefer it
by traffic score instead of "banded whenever feasible". A/B at
128x512x512: chunk chains and capped solves, both pre-padded, checksums/
deltas compared (tolerance: the two kernels use different k so chunk
boundaries differ — sweep-exactness of each is already bit-tested)."""

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
from epic_tpu.solver import pallas_biggrid3d as b3  # noqa: E402
from epic_tpu.solver import pallas_tiled3d as t3  # noqa: E402
from tools.tpu_probe43 import _volume_device, run_chunks  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "band", "k", "hp"),
    donate_argnums=(0,),
)
def run_banded(u_pad, frozen_pad, it0, n_chunks, band, k, hp):
    def body(i, u):
        u, _ = b3.sweep_chunk_dma.__wrapped__(
            u, frozen_pad, it0 + i * k, k, band, k, hp, False)
        return u

    return jax.lax.fori_loop(0, n_chunks, body, u_pad)


def main():
    report("env", backend=jax.default_backend())
    d, h, w = 128, 512, 512
    u, locked = _volume_device(d, h, w)
    visits = d * h * w
    csum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
    sweeps = 304  # divisible by both k=1, 2 and by 2-chunk counts

    st = make_state(u, locked, epsilon=1e-2)
    gb = b3.pad_state(st)
    report("banded_layout", band=gb.band, k=gb.k)
    ub = gb.u
    for rep in range(3):
        t0 = time.perf_counter()
        ub = run_banded(ub, gb.frozen, jnp.int32(rep * sweeps),
                        sweeps // gb.k, gb.band, gb.k, gb.hp)
        float(np.asarray(csum(ub)))
        dt = time.perf_counter() - t0
        if rep:
            report(f"banded_rep{rep}", s=round(dt, 2),
                   gup=round(sweeps * visits / 2 / dt / 1e9, 1))

    st = make_state(u, locked, epsilon=1e-2)
    gt = t3.pad_state(st)
    report("tiled_layout", band=gt.band, k=gt.k, yt=gt.yt, wt=gt.wt)
    ut = gt.u
    for rep in range(3):
        t0 = time.perf_counter()
        ut = run_chunks(ut, gt.frozen, jnp.int32(rep * sweeps),
                        sweeps // gt.k, gt.band, gt.k, gt.yt, gt.wt, gt.hp2)
        float(np.asarray(csum(ut)))
        dt = time.perf_counter() - t0
        if rep:
            report(f"tiled_rep{rep}", s=round(dt, 2),
                   gup=round(sweeps * visits / 2 / dt / 1e9, 1))

    # --- solves, pre-padded, capped; delta equality (same protocol) -------
    cap = 2000
    best = {}
    checks = {}
    for rep in range(3):
        gg = b3.pad_state(make_state(u, locked, epsilon=1e-2))
        t0 = time.perf_counter()
        _, it_b, d_b, _ = b3._solve_banded(
            gg.u, gg.frozen, st.epsilon, 100, cap, gg.band, gg.k, gg.hp,
            False, max((d, h, w)))
        it_b = int(it_b)
        checks["banded"] = float(np.asarray(d_b))
        dt_b = time.perf_counter() - t0
        gg = t3.pad_state(make_state(u, locked, epsilon=1e-2))
        t0 = time.perf_counter()
        _, it_t, d_t, _ = t3._solve_tiled3d(
            gg.u, gg.frozen, st.epsilon, 100, cap, gg.band, gg.k, gg.yt,
            gg.wt, gg.hp2, False, max((d, h, w)))
        it_t = int(it_t)
        checks["tiled"] = float(np.asarray(d_t))
        dt_t = time.perf_counter() - t0
        assert it_b == it_t, (it_b, it_t)
        if rep:
            best["banded"] = max(best.get("banded", 0),
                                 it_b * visits / 2 / dt_b / 1e9)
            best["tiled"] = max(best.get("tiled", 0),
                                it_t * visits / 2 / dt_t / 1e9)
    report("solve_verdict", deltas_equal=checks["banded"] == checks["tiled"],
           banded_g=round(best["banded"], 1), tiled_g=round(best["tiled"], 1),
           banded_delta=checks["banded"], tiled_delta=checks["tiled"])


if __name__ == "__main__":
    main()
