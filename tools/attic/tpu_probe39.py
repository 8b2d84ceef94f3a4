#!/usr/bin/env python
"""TPU probe 39: a FULL 16384² solve to convergence on one chip.

The compiled solve cannot finish this grid through the tunnel (the
propagation guard forces >= 16384 sweeps ~= 60+ s in one dispatch; the
remote worker kills it — probe26). The host-driven protocol loop
(solver.host_solve.solve_py_tiled) runs one stagger cycle per dispatch
batch and completes anywhere. Reports total wall time, iteration count,
and sustained updates/s for the whole convergence run.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import host_solve  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def main():
    report("env", backend=jax.default_backend())
    h = w = 16384
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)

    checks = []

    def on_check(it, delta):
        checks.append((it, delta))
        if it % 2000 == 0:
            report("progress", iteration=it, delta=delta)

    t0 = time.perf_counter()
    out = host_solve.solve_py_tiled(st, on_check=on_check)
    wall = time.perf_counter() - t0
    iters = int(out.iteration)
    report("solve_16384_full_convergence",
           iters=iters, converged=bool(out.converged),
           delta=float(np.asarray(out.delta)),
           wall_s=round(wall, 1),
           sweeps_per_s=round(iters / wall),
           g_updates_per_s=round(iters * h * w / 2 / wall / 1e9, 1),
           checks=len(checks))


if __name__ == "__main__":
    main()
