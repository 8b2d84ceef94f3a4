#!/usr/bin/env python
"""TPU probe 35: banded solve with the ping-pong cycle inside (3 dispatches
per 100-sweep cycle) vs probe32/33's chunked-solve numbers
(33.9/40.7/38.9 G at 2048²/4096²/8192²)."""

import json
import pathlib
import sys
import time

import numpy as np

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_biggrid as bg  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def time_solve(tag, h, w, cap, reps=2):
    u, locked = _grid_device(h, w)
    best = None
    iters2 = 0
    for r in range(reps + 1):
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = bg.solve(st, max_iterations=cap)
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
    time_solve("solve_2048_banded_cycle", 2048, 2048, 30_000)
    time_solve("solve_4096_banded_cycle", 4096, 4096, 10_000)
    time_solve("solve_8192_banded_cycle", 8192, 8192, 10_000)


if __name__ == "__main__":
    main()
