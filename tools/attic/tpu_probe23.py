#!/usr/bin/env python
"""TPU probe 23: cascade warm start vs cold solve on the reference fixtures.

Measures, on the real chip, the end-to-end solve-to-convergence wall time of
(a) the cold Pallas solve (the battery's log_pallas row) and (b)
solver.cascade with native-C++ coarse levels + the Pallas fine level — the
production split on hosts where per-shape compiles are expensive.

Timing discipline: both paths warmed (identical statics) before timing; every
timed region closed by D2H readbacks; percent-valid computed per row.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import epic_tpu  # noqa: E402
from epic_tpu import analysis, maps  # noqa: E402
from epic_tpu.solver import cascade, pallas_sweep  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def load(name):
    ref = maps.reference_map_path(f"{name}.png")
    img = maps.load_png(ref)
    if not (img == 255).any():
        free = np.argwhere(img >= 250)
        y, x = free[len(free) // 2]
        img = img.copy()
        img[y, x] = 255
    return img


def main():
    for name in ["umass", "large_maze"]:
        img = load(name)
        goal = img == 255
        eps = 1e-3

        # --- cold Pallas solve (warm the program first) -------------------
        out = pallas_sweep.solve(epic_tpu.from_occupancy_image(img, epsilon=eps))
        _ = int(out.iteration)
        t0 = time.perf_counter()
        out = pallas_sweep.solve(epic_tpu.from_occupancy_image(img, epsilon=eps))
        it_cold = int(out.iteration)
        dt_cold = time.perf_counter() - t0
        pv_cold = analysis.percent_valid(np.asarray(out.u),
                                         np.asarray(out.locked), goal)

        # --- cascade: native coarse + Pallas fine -------------------------
        def fine(st, stagger, max_iterations):
            return pallas_sweep.solve(st, stagger=stagger,
                                      max_iterations=max_iterations)

        outc, stats = cascade.solve_cascade(
            epic_tpu.from_occupancy_image(img, epsilon=eps),
            solver=fine, coarse_solver=cascade.native_solver)
        _ = int(outc.iteration)
        t0 = time.perf_counter()
        outc, stats = cascade.solve_cascade(
            epic_tpu.from_occupancy_image(img, epsilon=eps),
            solver=fine, coarse_solver=cascade.native_solver)
        it_fine = int(outc.iteration)
        dt_casc = time.perf_counter() - t0
        pv_casc = analysis.percent_valid(np.asarray(outc.u),
                                         np.asarray(outc.locked), goal)

        report("cascade_vs_cold", domain=name, shape=list(img.shape),
               epsilon=eps,
               cold_iterations=it_cold, cold_wall_s=round(dt_cold, 3),
               cold_percent_valid=pv_cold,
               cascade_levels=list(stats.iterations),
               cascade_shapes=[list(s) for s in stats.shapes],
               fine_iterations=it_fine,
               cascade_wall_s=round(dt_casc, 3),
               cascade_percent_valid=pv_casc,
               speedup=round(dt_cold / dt_casc, 2),
               converged=bool(outc.converged))


if __name__ == "__main__":
    main()
