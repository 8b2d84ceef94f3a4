#!/usr/bin/env python
"""Scaling harness: sweeps/s of the halo-exchange solver vs mesh size.

BASELINE.md's north star asks for solves/s efficiency at 1 chip / 1 host /
N hosts. Real multi-chip hardware is not present in this environment, so
this harness measures the *sharded program* (ppermute halos + pmax residual,
epic_tpu.parallel.sharded) on a virtual device mesh
(--xla_force_host_platform_device_count) — validating the scaling path and
its efficiency accounting end-to-end; on a real slice the same script runs
unchanged with JAX_PLATFORMS=tpu.

CAVEAT recorded in the CSV: virtual CPU devices SHARE the host's physical
cores (this image has 4), so dividing by N (efficiency_vs_first) is the
wrong normalization here — the compute budget does not grow with N. The
meaningful virtual-mesh number is throughput_vs_1dev: N-device sharded
throughput over 1-device throughput at the SAME total size. Cores are the
bottleneck either way, so ~1.0 means the sharded program (ppermute halos,
trapezoid redundancy, per-shard dispatch) adds no overhead over the
single-device program; < 1 would flag a program regression. On real chips
the compute budget DOES grow with N and efficiency_vs_first becomes true
scaling efficiency.

Usage: python tools/scaling_bench.py [--sizes 1024 4096] [--sweeps 200]
       [--devices 1 2 4 8] [--kernel auto] [--csv docs/results_scaling.csv]

REAL-HARDWARE MODE (the BASELINE ">=80% scaling efficiency at >=2 hosts"
artifact, runnable the day a multi-chip slice exists) is ONE command:

    JAX_PLATFORMS=tpu python tools/scaling_bench.py \
        --sizes 16384 --sweeps 400 --devices 1 2 4 8 \
        --assert-efficiency 0.8 --csv docs/results_scaling.csv

On a real backend (anything but the virtual-CPU platform) the script exits
nonzero if any >=2-device row's efficiency_vs_first falls below the
--assert-efficiency bound; on the virtual platform the assertion is
skipped (shared physical cores make per-device efficiency meaningless —
see the CAVEAT above). Multi-host slices: launch one process per host
under your cluster runner; epic_tpu.parallel.multihost.initialize() picks
up the coordinator from the standard env vars.
"""

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1024])
    ap.add_argument("--sweeps", type=int, default=100)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--kernel", default="auto",
                    help="per-shard kernel (auto/xla/pallas/pallas_banded...)")
    ap.add_argument("--chunk-depth", type=int, default=16)
    ap.add_argument("--csv", default=None,
                    help="append rows to this CSV (written with header if new)")
    ap.add_argument("--cpu", action="store_true", default=None,
                    help="force the virtual-CPU platform (default when no TPU)")
    ap.add_argument("--assert-efficiency", type=float, default=None,
                    help="on a REAL backend, exit nonzero if any >=2-device "
                         "row's efficiency_vs_first is below this bound "
                         "(BASELINE: 0.8); ignored on the virtual platform")
    args = ap.parse_args()

    max_dev = max(args.devices)
    if args.cpu or os.environ.get("JAX_PLATFORMS") != "tpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max_dev}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max_dev)
    else:
        import jax

    import numpy as np

    import epic_tpu
    from epic_tpu import maps
    from epic_tpu.parallel import make_mesh, sharded

    rows = []
    for size in args.sizes:
        img = maps.random_obstacles(size, size, density=0.1, seed=0)
        base = None
        print(f"grid {size}^2, {args.sweeps} sweeps per measurement, "
              f"backend={jax.default_backend()}, kernel={args.kernel}")
        print("devices  mesh      sweeps/s   cell-updates/s   eff/dev  vs-1dev")
        for n in args.devices:
            my = int(np.floor(np.sqrt(n)))
            while n % my:
                my -= 1
            mesh = make_mesh((my, n // my),
                             devices=np.asarray(jax.devices()[:n]))
            st = epic_tpu.from_occupancy_image(img, epsilon=1e-6)
            # Warm-up/compile.
            out = sharded.update_n(st, args.sweeps, mesh,
                                   chunk_depth=args.chunk_depth,
                                   kernel=args.kernel)
            _ = float(out.delta)
            st2 = epic_tpu.from_occupancy_image(img, epsilon=1e-6)
            t0 = time.perf_counter()
            out = sharded.update_n(st2, args.sweeps, mesh,
                                   chunk_depth=args.chunk_depth,
                                   kernel=args.kernel)
            _ = np.asarray(out.u).sum()  # full D2H barrier
            dt = time.perf_counter() - t0
            sps = args.sweeps / dt
            cups = (size - 2) ** 2 / 2 * sps
            if base is None:
                base = (sps, n)
            eff = sps / (base[0] * n / base[1])
            tput = sps / base[0]
            print(f"{n:7d}  ({my},{n//my})   {sps:9.1f}  {cups:13.3e}   "
                  f"{eff:6.2f}  x{tput:5.2f}")
            rows.append(dict(
                backend=jax.default_backend(), kernel=args.kernel,
                size=size, devices=n, mesh=f"{my}x{n//my}",
                sweeps=args.sweeps, chunk_depth=args.chunk_depth,
                sweeps_per_s=round(sps, 2), cell_updates_per_s=round(cups),
                efficiency_vs_first=round(eff, 3),
                throughput_vs_1dev=round(tput, 3),
                caveat=("virtual-cpu-devices-share-4-cores"
                        if jax.default_backend() == "cpu" else ""),
            ))

    if args.csv:
        import csv

        path = pathlib.Path(args.csv)
        new = not path.exists()
        with path.open("a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            if new:
                w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows -> {path}")

    if args.assert_efficiency is not None:
        if jax.default_backend() == "cpu":
            print("efficiency assertion skipped: virtual-CPU platform "
                  "(shared physical cores)")
        else:
            bad = [r for r in rows
                   if r["devices"] >= 2
                   and r["efficiency_vs_first"] < args.assert_efficiency]
            if bad:
                print(f"FAIL: {len(bad)} rows below efficiency bound "
                      f"{args.assert_efficiency}: "
                      + ", ".join(f"{r['devices']}dev@{r['size']}="
                                  f"{r['efficiency_vs_first']}" for r in bad))
                sys.exit(1)
            print(f"scaling efficiency >= {args.assert_efficiency} on all "
                  f">=2-device rows")


if __name__ == "__main__":
    main()
