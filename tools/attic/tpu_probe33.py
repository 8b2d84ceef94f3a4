#!/usr/bin/env python
"""TPU probe 33: solve-dispatch re-tuning after the banded DMA+folded
restructure (probe32: banded now beats tiled at 4096², 40.7 vs 37.3).

Measure the new banded solve at 8192²/16384², and stagger-aligned k=20
layouts (5 dispatches per 100-sweep cycle instead of 7) for both kernels.
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


def time_solve(tag, solve_fn, h, w, cap, reps=2, **kw):
    u, locked = _grid_device(h, w)
    best = None
    iters2 = 0
    for r in range(reps + 1):
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = solve_fn(st, max_iterations=cap, **kw)
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
    time_solve("solve_8192_banded_dma_folded", bg.solve, 8192, 8192, 10_000)
    time_solve("solve_8192_tiled_k20", t2.solve, 8192, 8192, 10_000,
               chunk_depth=20)
    time_solve("solve_8192_banded_k20", bg.solve, 8192, 8192, 10_000,
               chunk_depth=20)
    time_solve("solve_16384_banded_dma_folded", bg.solve, 16384, 16384,
               10_000, reps=1)
    time_solve("solve_16384_tiled_k20", t2.solve, 16384, 16384, 10_000,
               reps=1, chunk_depth=20)


if __name__ == "__main__":
    main()
