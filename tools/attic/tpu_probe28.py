#!/usr/bin/env python
"""TPU probe 28: 16k tiled solve-protocol rate (bounded dispatch) and the
ultra-wide k16 chunk rate (probe26 crashed before reaching these).

probe27 showed the 16384² tiled solve is healthy at bounded iteration caps;
probe26's 20k-iteration run (~70 s in one dispatch) killed the worker —
consistent with a remote-worker watchdog on long dispatches, not a kernel
fault. Stay under ~45 s per dispatch here.
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


def main():
    report("env", backend=jax.default_backend())

    # 16k solve-protocol rate: warm twice at cap 10_000 (~32 s dispatches).
    h = w = 16384
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = t2.solve(st, max_iterations=10_000)
    iters = int(out.iteration)
    cold = time.perf_counter() - t0
    del out
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = t2.solve(st, max_iterations=10_000)
    iters2 = int(out.iteration)
    _ = float(np.asarray(out.delta))
    warm = time.perf_counter() - t0
    report("solve_16384_tiled_cap10k", iters=iters, cold_s=round(cold, 1),
           warm_iters=iters2, warm_s=round(warm, 2),
           sweeps_per_s=round(iters2 / warm),
           g_updates_per_s=round(iters2 * h * w / 2 / warm / 1e9, 1),
           converged=bool(out.converged))
    del out, st, u, locked

    # Ultra-wide chunk rate at the production k16 layout.
    hh, ww = 32768, 16384
    u, locked = _grid_device(hh, ww)
    st = make_state(u, locked, epsilon=1e-2)
    band, k, wt = t2.choose_tiled_layout((hh, ww))
    g = t2.pad_state(st, band=band, k=k, wt=wt)
    reps = 304 // k
    t0 = time.perf_counter()
    out, _ = _chunks_tiled(g.u, g.frozen, band, k, wt, reps)
    _ = np.asarray(out[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, _ = _chunks_tiled(g.u, g.frozen, band, k, wt, reps)
    _ = np.asarray(out[0, 0])
    dt = time.perf_counter() - t0
    sweeps = reps * k
    report(f"tiled_{hh}x{ww}_b{band}_k{k}_wt{wt}",
           redundancy=round((band + 2 * k) / band * (wt + 256) / wt, 3),
           compile_s=round(compile_s, 1), warm_s=round(dt, 3), sweeps=sweeps,
           g_updates_per_s=round(sweeps * hh * ww / 2 / dt / 1e9, 1))


if __name__ == "__main__":
    main()
