#!/usr/bin/env python
"""TPU probe 29: solve-protocol rate with the folded check chunk.

probe28 measured the 16k tiled solve at 224 sweeps/s (30.0 G) vs the
42.6 G chunk rate; part of the gap was a dedicated 1-sweep check chunk (a
full HBM round trip for one sweep) per 100-sweep cycle. The check is now
folded into the first K-chunk (sweep_chunk_tiled_check). Re-measure 16k,
and race the folded-check tiled solve against the banded solve at 8192²
(where banded wins on chunks) — if tiled wins on SOLVES, solve dispatch
should prefer it earlier than chunk dispatch does.
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


def time_solve(tag, solve_fn, h, w, cap):
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = solve_fn(st, max_iterations=cap)
    iters = int(out.iteration)
    _ = float(np.asarray(out.delta))
    cold = time.perf_counter() - t0
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = solve_fn(st, max_iterations=cap)
    iters2 = int(out.iteration)
    _ = float(np.asarray(out.delta))
    warm = time.perf_counter() - t0
    report(tag, iters=iters2, cold_s=round(cold, 1), warm_s=round(warm, 2),
           sweeps_per_s=round(iters2 / warm),
           g_updates_per_s=round(iters2 * h * w / 2 / warm / 1e9, 1))
    del out, st, u, locked


def main():
    report("env", backend=jax.default_backend())
    time_solve("solve_16384_tiled_foldedcheck", t2.solve, 16384, 16384, 10_000)
    time_solve("solve_8192_tiled_foldedcheck", t2.solve, 8192, 8192, 10_000)
    time_solve("solve_8192_banded", bg.solve, 8192, 8192, 10_000)
    time_solve("solve_4096_tiled_foldedcheck", t2.solve, 4096, 4096, 10_000)
    time_solve("solve_4096_banded", bg.solve, 4096, 4096, 10_000)


if __name__ == "__main__":
    main()
