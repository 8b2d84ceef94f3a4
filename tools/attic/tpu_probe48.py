#!/usr/bin/env python
"""TPU probe 48: the host-driven wide-plane 3D solve on chip.

solve_py_tiled3d is the only route to convergence for volumes whose
>= max(shape) floor exceeds a single dispatch. First run (2026-08-18,
open 32x2048x2048, eps 1e-1): the host loop CONVERGED at 8001 iterations
in 133 s (81 staggered checks, delta 0.0983, 4.0 G updates/s sustained
through ~2,400 tunnel dispatches), while the compiled solve capped at
5000 exited unconverged (delta 0.287) — 8001 iterations in one dispatch
would blow the remote watchdog. This revision asserts protocol equality
on a shared capped horizon (both structures run whole stagger cycles, so
iteration counts and per-check deltas must match exactly)."""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import host_solve  # noqa: E402
from epic_tpu.solver import pallas_tiled3d as t3  # noqa: E402
from tools.tpu_probe43 import _volume_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def main():
    report("env", backend=jax.default_backend())
    d, h, w = 32, 2048, 2048
    u, locked = _volume_device(d, h, w, density=0.0)  # open: converges fast
    visits = d * h * w

    cap = 3000  # shared capped horizon, well under the dispatch watchdog
    checks = []
    st = make_state(u, locked, epsilon=1e-1)
    t0 = time.perf_counter()
    out_h = host_solve.solve_py_tiled3d(
        st, max_iterations=cap,
        on_check=lambda it, dd: checks.append((it, dd)))
    it_h = int(out_h.iteration)
    d_h = float(np.asarray(out_h.delta))
    dt_h = time.perf_counter() - t0
    report("host_solve", s=round(dt_h, 2), iters=it_h, delta=d_h,
           converged=bool(out_h.converged), n_checks=len(checks),
           gup=round(it_h * visits / 2 / dt_h / 1e9, 1))

    st = make_state(u, locked, epsilon=1e-1)
    t0 = time.perf_counter()
    out_c = t3.solve(st, max_iterations=cap)
    it_c = int(out_c.iteration)
    d_c = float(np.asarray(out_c.delta))
    dt_c = time.perf_counter() - t0
    report("compiled_solve", s=round(dt_c, 2), iters=it_c, delta=d_c,
           converged=bool(out_c.converged),
           gup=round(it_c * visits / 2 / dt_c / 1e9, 1))

    assert it_h == it_c, (it_h, it_c)
    assert d_h == d_c, (d_h, d_c)
    assert bool(out_h.converged) == bool(out_c.converged)
    report("verdict", protocol_equal=True)


if __name__ == "__main__":
    main()
