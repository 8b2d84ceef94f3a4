#!/usr/bin/env python
"""Precision-comparison overlay — re-creation of compare_precision.py.

Mirrors /root/reference/libepic/tests/batch/compare_precision.py:192-252:
solve one map with (a) float SOR, (b) double SOR, (c) the log-space solver,
compute each solution's valid region (gradient alive + goal-reachable), and
overlay them as gray levels in one image:

  level 60  — valid only under log-space
  level 90  — also valid under double SOR
  level 120 — also valid under float SOR (i.e. valid everywhere)

plus obstacles black and goals white. Writes a PNG + prints the percentages.

Usage: python tools/compare_precision.py [--domain maze] [--out overlay.png]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--domain", default="maze")
    ap.add_argument("--epsilon", type=float, default=1e-4)
    ap.add_argument("--out", default="precision_overlay.png")
    args = ap.parse_args()

    import epic_tpu
    from epic_tpu import analysis, viz
    from epic_tpu.solver import core, legacy
    from batch_bench import load_domain

    img = load_domain(args.domain)
    goal = img == 255

    regions = {}
    for dtype, name in ((np.float32, "sor_f32"), (np.float64, "sor_f64")):
        u0, locked = legacy.from_image(img, dtype=dtype)
        u_out, _ = legacy.sor(u0, locked, epsilon=args.epsilon, omega=1.5,
                              dtype=dtype)
        grad_ok = analysis.valid_gradient_mask(u_out) & ~locked
        passable = grad_ok | goal
        regions[name] = analysis.reachable_from(goal, passable) & ~locked

    st = epic_tpu.from_occupancy_image(img, epsilon=args.epsilon)
    out = core.solve(st)
    u_log = np.asarray(out.u)
    locked = np.asarray(out.locked)
    grad_ok = analysis.valid_gradient_mask(u_log) & ~locked
    regions["log"] = analysis.reachable_from(goal, grad_ok | goal) & ~locked

    free = ~locked
    overlay = np.zeros(img.shape, dtype=np.uint8)
    overlay[regions["log"]] = 60
    overlay[regions["log"] & regions["sor_f64"]] = 90
    overlay[regions["log"] & regions["sor_f64"] & regions["sor_f32"]] = 120
    overlay[img == 0] = 0
    overlay[goal] = 255

    viz.save_png(args.out, np.stack([overlay] * 3, axis=-1))
    n_free = free.sum()
    for name, region in regions.items():
        print(f"{name}: {region.sum() / n_free:.3%} of free cells valid")
    print(f"overlay written to {args.out}")


if __name__ == "__main__":
    main()
