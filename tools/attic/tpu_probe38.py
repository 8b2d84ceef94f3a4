#!/usr/bin/env python
"""TPU probe 38: confirm the donated run_chain path holds the probe34/36
cycle rates (the review refactor added donation, power-of-two chain
decomposition, and twin reuse — should be same-or-faster than the measured
46.8 G at 4096²). Planner-tick style: repeated chains reusing the twin."""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_biggrid as bg  # noqa: E402
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def main():
    report("env", backend=jax.default_backend())
    h = w = 4096
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    band, k = bg.choose_layout((h, w))
    g = bg.pad_state(st)
    sweeps_per_tick = 6016  # ~1.2 s of device work per tick; 376 chunks
    n_full = sweeps_per_tick // k
    cells = h * w
    report("layout", band=band, k=k, n_full=n_full,
           chain=pc.chain_lengths(n_full))

    cur, alt = g.u, None
    it = jnp.int32(0)
    for tick in range(4):
        t0 = time.perf_counter()
        cur, alt, delta = pc.run_chain(
            pc.sweep_cycle, cur, alt, g.frozen, it, n_full, k, band,
            interpret=False,
        )
        _ = np.asarray(cur[0, 0])
        dt = time.perf_counter() - t0
        it = it + n_full * k
        if tick == 0:
            # tick0 includes the cold compiles of every power-of-two cycle
            # program in the chain — never fold it into throughput numbers.
            report("tick0_cold", compile_and_run_s=round(dt, 1))
        else:
            report(f"tick{tick}", warm_s=round(dt, 3),
                   g_updates_per_s=round(sweeps_per_tick * cells / 2 / dt / 1e9, 1),
                   delta=float(np.asarray(delta)))


if __name__ == "__main__":
    main()
