#!/usr/bin/env python
"""epic_tpu headline benchmark — prints ONE JSON line.

Workload: the reference's primary fixture class (maze, 482x482 — the ROS demo
map, maps/maze.yaml) relaxed with the Pallas VMEM-resident multi-sweep kernel
on one chip. Metric: red-black stencil sweeps/s at steady state, reported as
cell-updates/s (one update = 4 neighbour reads + max-shifted logsumexp on one
parity class = half the interior per sweep; SURVEY §6).

vs_baseline: ratio against the reference's most demanding published real-time
requirement — its umass launch configuration sustains 100 sweeps per 33 ms
tick = 3030 sweeps/s (launch/epic_navigation_node_umass.launch:11-12; the
repo publishes no other numbers, BASELINE.md). Values > 1 beat the reference
protocol's budget.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import epic_tpu
    from epic_tpu import maps
    from epic_tpu.solver import pallas_sweep

    # Prefer the reference's own maze map when mounted; else a procedural
    # stand-in of the same size/occupancy class.
    ref = maps.reference_map_path("maze.png")
    if ref is not None:
        img = maps.load_png(ref)
    else:
        img = maps.random_obstacles(482, 482, density=0.1, seed=0)

    state = epic_tpu.from_occupancy_image(img, epsilon=1e-3)
    padded = pallas_sweep.pad_state(state)
    interpret = jax.default_backend() == "cpu"

    u, frozen = padded.u, padded.frozen
    chunk = 100  # the reference's numIterationsToStaggerCheck
    # Warm-up / compile.
    u, d = pallas_sweep.sweep_chunk(u, frozen, jnp.int32(0), chunk, interpret)
    u.block_until_ready()

    reps = 3 if interpret else 20
    t0 = time.perf_counter()
    for i in range(reps):
        u, d = pallas_sweep.sweep_chunk(
            u, frozen, jnp.int32(chunk * (i + 1)), chunk, interpret
        )
    u.block_until_ready()
    dt = time.perf_counter() - t0

    sweeps = reps * chunk
    h, w = state.u.shape
    cell_updates = (h - 2) * (w - 2) / 2 * sweeps
    sweeps_per_s = sweeps / dt
    updates_per_s = cell_updates / dt

    # Reference anytime budget: 100 sweeps / 33 ms tick (umass launch).
    baseline_sweeps_per_s = 3030.0

    print(
        json.dumps(
            {
                "metric": "stencil_cell_updates_per_s_per_chip",
                "value": round(updates_per_s),
                "unit": "cell-updates/s",
                "vs_baseline": round(sweeps_per_s / baseline_sweeps_per_s, 2),
                "detail": {
                    "grid": f"{h}x{w}",
                    "sweeps_per_s": round(sweeps_per_s),
                    "backend": jax.default_backend(),
                    "baseline": "reference umass anytime budget 3030 sweeps/s "
                    "(launch/epic_navigation_node_umass.launch:11-12)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
