#!/usr/bin/env python
"""TPU probe 32: the restructured banded solve (always-DMA chunks + folded
check) vs probe30's gather-based numbers (2048²: 29.7 G, 4096²: 33.4 G),
and vs the tiled solve at 4096² (35.1) to re-check the dispatch threshold.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_biggrid as bg  # noqa: E402
from epic_tpu.solver import pallas_tiled2d as t2  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def time_solve(tag, solve_fn, h, w, cap, reps=2):
    u, locked = _grid_device(h, w)
    best = None
    iters2 = 0
    for r in range(reps + 1):  # first run includes compile
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = solve_fn(st, max_iterations=cap)
        iters2 = int(out.iteration)
        _ = float(np.asarray(out.delta))
        dt = time.perf_counter() - t0
        if r > 0:
            best = dt if best is None else min(best, dt)
    report(tag, iters=iters2, best_warm_s=round(best, 2),
           sweeps_per_s=round(iters2 / best),
           g_updates_per_s=round(iters2 * h * w / 2 / best / 1e9, 1))


def main():
    report("env", backend=jax.default_backend())
    time_solve("solve_2048_banded_dma_folded", bg.solve, 2048, 2048, 30_000)
    time_solve("solve_4096_banded_dma_folded", bg.solve, 4096, 4096, 10_000)
    time_solve("solve_4096_tiled_folded", t2.solve, 4096, 4096, 10_000)


if __name__ == "__main__":
    main()
