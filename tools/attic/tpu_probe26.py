#!/usr/bin/env python
"""TPU probe 26: tiled-kernel exactness pin + ultra-wide k16 + 16k solve.

probe25 left three loose ends: (a) the k8 tiled run's f32 checksum differed
from the banded run by 2 ulps — reduction-shape rounding or a real
divergence? Pin it with an on-device elementwise max|diff| (order-free) at
the production layout. (b) the ultra-wide row was measured with the k8
layout the old chooser picked; re-measure with the production k16. (c) the
full solve protocol at 16384² through _solve_tiled (one device program).
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


def main():
    report("env", backend=jax.default_backend())

    h = w = 16384
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)

    # (a) exactness: 608 sweeps through both kernels, order-free max|diff|.
    band_t, k_t, wt = t2.choose_tiled_layout((h, w))
    gt = t2.pad_state(st, band=band_t, k=k_t, wt=wt)
    ut, _ = _chunks_tiled(gt.u, gt.frozen, band_t, k_t, wt, 608 // k_t)
    gb = bg.pad_state(st, band=96, k=16)
    ub, _ = _chunks_dma(gb.u, gb.frozen, 96, 16, 38)

    @jax.jit
    def _maxdiff(a, b):
        at = a[k_t : k_t + h, t2._HX : t2._HX + w]
        bt = b[16 : 16 + h, :w]
        return jnp.max(jnp.abs(at - bt))

    md = float(np.asarray(_maxdiff(ut, ub)))
    report("exactness_16384_tiled_vs_banded", layout=[band_t, k_t, wt],
           sweeps=608, max_abs_diff=md)
    del ut, ub, gt, gb

    # (c) full solve protocol at 16384² (one device program).
    t0 = time.perf_counter()
    out = t2.solve(st, max_iterations=20_000)
    iters = int(out.iteration)
    _ = float(np.asarray(out.delta))
    dt = time.perf_counter() - t0  # includes this program's compile
    t0 = time.perf_counter()
    st2 = make_state(u, locked, epsilon=1e-2)
    out2 = t2.solve(st2, max_iterations=20_000)
    iters2 = int(out2.iteration)
    _ = float(np.asarray(out2.delta))
    dt2 = time.perf_counter() - t0
    report("solve_16384_tiled", iters=iters, cold_s=round(dt, 1),
           warm_iters=iters2, warm_s=round(dt2, 2),
           sweeps_per_s=round(iters2 / dt2),
           g_updates_per_s=round(iters2 * h * w / 2 / dt2 / 1e9, 1),
           converged=bool(out2.converged))
    del out, out2, st, st2, u, locked

    # (b) ultra-wide with the production k16 layout.
    hh, ww = 32768, 16384
    u, locked = _grid_device(hh, ww)
    st = make_state(u, locked, epsilon=1e-2)
    band_t, k_t, wt = t2.choose_tiled_layout((hh, ww))
    gt = t2.pad_state(st, band=band_t, k=k_t, wt=wt)
    reps = 304 // k_t
    t0 = time.perf_counter()
    out, _ = _chunks_tiled(gt.u, gt.frozen, band_t, k_t, wt, reps)
    _ = np.asarray(out[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, _ = _chunks_tiled(gt.u, gt.frozen, band_t, k_t, wt, reps)
    _ = np.asarray(out[0, 0])
    dt = time.perf_counter() - t0
    sweeps = reps * k_t
    report(f"tiled_{hh}x{ww}_b{band_t}_k{k_t}_wt{wt}",
           redundancy=round((band_t + 2 * k_t) / band_t * (wt + 256) / wt, 3),
           compile_s=round(compile_s, 1), warm_s=round(dt, 3), sweeps=sweeps,
           g_updates_per_s=round(sweeps * hh * ww / 2 / dt / 1e9, 1))


if __name__ == "__main__":
    main()
