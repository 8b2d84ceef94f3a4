#!/usr/bin/env python
"""Benchmark battery — re-creation of the reference's batch harness.

Mirrors /root/reference/libepic/tests/batch/batch.py:105-164: for each
domain, run (a) legacy CPU SOR (omega 1.5), (b) the log-space solver on CPU
(XLA), and (c) the log-space solver on the accelerator (Pallas on TPU), then
emit a CSV with ``Percent Valid, Time per Update, Time to Converge`` per
solver at the requested precision.

Domains are procedural stand-ins for the reference's PNG battery (same sizes:
c_space 348x274, small_maze 802x242, umass 218x700, large_maze 962x962 ...),
or the reference's own PNGs when /root/reference is mounted.

Usage: python tools/batch_bench.py [--domain large_maze] [--epsilon 1e-3]
       [--out results.csv]
"""

import argparse
import csv
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DOMAINS = {
    # name: (height, width) — sizes from BASELINE.md workload table.
    "c_space": (274, 348),
    "small_maze": (242, 802),
    "umass": (700, 218),
    "large_maze": (962, 962),
    "small_mine": (954, 1280),
    "maze": (482, 482),
}


def load_domain(name: str):
    from epic_tpu import maps

    ref = maps.reference_map_path(f"{name}.png")
    if ref is not None:
        img = maps.load_png(ref)
        # Reference PNGs may lack a goal pixel (255); add one mid-free-space.
        if not (img == 255).any():
            free = np.argwhere(img >= 250)
            if len(free) == 0:
                free = np.argwhere(img > 0)
            y, x = free[len(free) // 2]
            img = img.copy()
            img[y, x] = 255
        return img
    h, w = DOMAINS[name]
    return maps.recursive_maze(h, w, seed=0, corridor=max(6, min(h, w) // 40))


def run(domain: str, epsilon: float, out_path: str | None):
    import jax

    import epic_tpu
    from epic_tpu import analysis, maps
    from epic_tpu.solver import core, legacy, pallas_sweep

    img = load_domain(domain)
    goal = img == 255
    rows = []

    # --- legacy CPU SOR (float32 and float64) ---------------------------
    for dtype, label in ((np.float32, "cpu_sor_f32"), (np.float64, "cpu_sor_f64")):
        u0, locked = legacy.from_image(img, dtype=dtype)
        t0 = time.perf_counter()
        u_out, iters = legacy.sor(u0, locked, epsilon=epsilon, omega=1.5,
                                  dtype=dtype)
        dt = time.perf_counter() - t0
        pv = analysis.percent_valid(u_out, locked, goal)
        rows.append([domain, label, epsilon, pv, dt / max(iters, 1), dt, iters])

    # --- log-space solver, XLA (CPU or current backend) ------------------
    st = epic_tpu.from_occupancy_image(img, epsilon=epsilon)
    t0 = time.perf_counter()
    out = core.solve(st)
    iters = int(out.iteration)  # D2H readback = reliable completion barrier
    dt = time.perf_counter() - t0
    pv = analysis.percent_valid(np.asarray(out.u), np.asarray(out.locked), goal)
    rows.append([domain, f"log_xla_{jax.default_backend()}", epsilon, pv,
                 dt / max(iters, 1), dt, iters])

    # --- log-space solver, Pallas (VMEM-resident) ------------------------
    if pallas_sweep.fits_vmem(img.shape):
        st = epic_tpu.from_occupancy_image(img, epsilon=epsilon)
        out = pallas_sweep.solve(st)
        _ = int(out.iteration)  # compile warm-up + completion
        # Warm (steady-state) timing, second run:
        st = epic_tpu.from_occupancy_image(img, epsilon=epsilon)
        t0 = time.perf_counter()
        out = pallas_sweep.solve(st)
        iters = int(out.iteration)  # D2H readback barrier
        dt = time.perf_counter() - t0
        pv = analysis.percent_valid(np.asarray(out.u), np.asarray(out.locked), goal)
        rows.append([domain, f"log_pallas_{jax.default_backend()}", epsilon, pv,
                     dt / max(iters, 1), dt, iters])

    header = ["Domain", "Solver", "Epsilon", "Percent Valid",
              "Time per Update", "Time to Converge", "Iterations"]
    writer = csv.writer(open(out_path, "w", newline="") if out_path else sys.stdout)
    writer.writerow(header)
    for r in rows:
        writer.writerow(r)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--domain", default="maze", choices=sorted(DOMAINS))
    ap.add_argument("--epsilon", type=float, default=1e-3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    run(args.domain, args.epsilon, args.out)
