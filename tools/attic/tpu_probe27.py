#!/usr/bin/env python
"""TPU probe 27: isolate the 16384² tiled-solve worker crash (probe26).

Stages: 1-sweep and 3-sweep tiled chunks at the 16k layout (the solve
protocol's check-sweep and remainder-chunk programs), then the full solve
at 8192², then a bounded solve at 16384². Each stage flushes before the
next so the crash point is unambiguous.
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


def main():
    report("env", backend=jax.default_backend())

    h = w = 16384
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    band, k, wt = t2.choose_tiled_layout((h, w))
    g = t2.pad_state(st, band=band, k=k, wt=wt)

    for ns in (1, 3, 16):
        t0 = time.perf_counter()
        out, d = t2.sweep_chunk_tiled(
            g.u, g.frozen, jnp.int32(0), ns, band, k, wt, False
        )
        dd = float(np.asarray(d))
        report(f"chunk_ns{ns}_16384", ok=True, delta=dd,
               s=round(time.perf_counter() - t0, 1))
        del out

    del g, st, u, locked

    hh = ww = 8192
    u, locked = _grid_device(hh, ww)
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = t2.solve(st, max_iterations=300)
    iters = int(out.iteration)
    report("solve_8192_tiled_cap300", iters=iters,
           s=round(time.perf_counter() - t0, 1))
    del out, st, u, locked

    h = w = 16384
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = t2.solve(st, max_iterations=300)
    iters = int(out.iteration)
    report("solve_16384_tiled_cap300", iters=iters,
           s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
