#!/usr/bin/env python
"""TPU probe 31: folded vs unfolded tiled solve at 16384², SAME process,
interleaved A/B runs (probe28/29/30 measured them in different processes
and tunnel variance ran to 15%)."""

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
from tools.tpu_probe30 import _grid_device, _solve_tiled_unfolded  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def main():
    report("env", backend=jax.default_backend())
    h = w = 16384
    cap = 10_000
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    g0 = t2.pad_state(st)

    def run_folded():
        s2 = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = t2.solve(s2, max_iterations=cap)
        iters = int(out.iteration)
        _ = float(np.asarray(out.delta))
        return iters, time.perf_counter() - t0

    def run_unfolded():
        g = t2.pad_state(st)
        t0 = time.perf_counter()
        _, iters, delta, _ = _solve_tiled_unfolded(
            g.u, g.frozen, st.epsilon, 100, cap, g0.band, g0.k, g0.wt, h, w)
        iters = int(iters)
        _ = float(np.asarray(delta))
        return iters, time.perf_counter() - t0

    # compile both
    i1, c1 = run_folded()
    i2, c2 = run_unfolded()
    report("compiles", folded_s=round(c1, 1), unfolded_s=round(c2, 1))
    rows = []
    for rep in range(2):
        for tag, fn in (("folded", run_folded), ("unfolded", run_unfolded)):
            iters, dt = fn()
            rows.append((tag, dt))
            report(f"{tag}_rep{rep}", iters=iters, warm_s=round(dt, 2),
                   sweeps_per_s=round(iters / dt),
                   g_updates_per_s=round(iters * h * w / 2 / dt / 1e9, 1))
    f = [dt for t_, dt in rows if t_ == "folded"]
    uf = [dt for t_, dt in rows if t_ == "unfolded"]
    report("verdict_16384", folded_best_s=round(min(f), 2),
           unfolded_best_s=round(min(uf), 2))


if __name__ == "__main__":
    main()
