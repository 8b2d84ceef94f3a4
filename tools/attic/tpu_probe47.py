#!/usr/bin/env python
"""TPU probe 47: wide-plane VolumePlanner end-to-end on chip.

The tiled3d planner tick (pad-cache + run_chain donation across ticks)
and the wide-plane solve dispatch are hermetically tested; this drives
the real thing on hardware: a 32x2048x2048 session (plane-banded layout
infeasible -> pallas_tiled3d), anytime ticks, a cell edit mid-session, a
full solve to convergence, and a streamline."""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from epic_tpu.planner3d import VolumePlanner, VolumePlannerConfig  # noqa: E402
from epic_tpu.solver import pallas_biggrid3d, pallas_tiled3d  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def main():
    report("env", backend=jax.default_backend())
    d, h, w = 32, 2048, 2048
    assert not pallas_biggrid3d.feasible((d, h, w))
    assert pallas_tiled3d.feasible((d, h, w))

    # eps 1e-1: an OPEN 2048-wide volume at tighter epsilons needs tens of
    # thousands of sweeps (cf. maze 49.5k at 1e-3); the smoke validates
    # the wide-plane planner path, not deep convergence.
    p = VolumePlanner(VolumePlannerConfig(epsilon=1e-1, steps_per_update=50))
    p.init(w, h, d)
    assert p._kernel_module() is pallas_tiled3d
    p.add_goals([(float(w // 2), float(h // 2), float(d // 2))])

    for i in range(3):
        t0 = time.perf_counter()
        p.update(50)
        float(np.asarray(p.state.delta))
        dt = time.perf_counter() - t0
        report(f"tick{i}", s=round(dt, 2),
               gup=round(50 * d * h * w / 2 / dt / 1e9, 1))
    assert int(p.state.iteration) == 150

    p.set_cells([(100, 100, 10)], [1])  # warm obstacle edit mid-session
    p.update(50)
    assert int(p.state.iteration) == 200

    # Capped solve segments: one dispatch stays well under the remote
    # worker's ~45-60 s watchdog (probe26/27 hazard); loop on converged
    # from the host — each segment's verdict carries the full protocol
    # guard within the segment.
    t0 = time.perf_counter()
    total = 0
    for seg in range(12):
        p.solve(max_iterations=3000)
        total += int(p.state.iteration)
        if bool(p.state.converged):
            break
    dt = time.perf_counter() - t0
    st = p.state
    it = int(st.iteration)
    report("solve", s=round(dt, 2), seg_iters=it, total_iters=total,
           segments=seg + 1, converged=bool(st.converged),
           delta=float(np.asarray(st.delta)),
           gup=round(total * d * h * w / 2 / dt / 1e9, 1))
    assert bool(st.converged)
    assert it % 100 == 1 and it >= max((d, h, w))

    path = p.compute_path((float(w // 2 + 300), float(h // 2 + 300),
                           float(d // 2 + 5)), step_size=0.5,
                          cd_precision=0.5)
    report("path", n_poses=len(path))
    assert len(path) > 10


if __name__ == "__main__":
    main()
