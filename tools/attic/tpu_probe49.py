#!/usr/bin/env python
"""TPU probe 49: whole-cycle-check solve vs the cycle-fill structure.

The new _solve_banded body (stagger >= k) runs an ENTIRE stagger cycle as
one sweep_cycle_check dispatch — no separate check chunk, no per-cycle
pastes (the passing-check exit state is u1 pasted into either ping-pong
buffer, whose non-centre cells are the constant pad value). A/B against
the previous production body (probe40's cycle-fill: check chunk + paste +
cycle + rem), pre-padded, delta bit-equality asserted."""

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
from tools.tpu_probe30 import _grid_device  # noqa: E402
from tools.tpu_probe40 import _solve_banded_cyclefill  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def run_ab(h, w, cap):
    u, locked = _grid_device(h, w)
    g = bg.pad_state(make_state(u, locked, epsilon=1e-2))
    best = {}
    checks = {}
    iters = {}
    for rep in range(3):
        st = make_state(u, locked, epsilon=1e-2)
        gg = bg.pad_state(st)
        t0 = time.perf_counter()
        _, it_o, d_o, _ = _solve_banded_cyclefill(
            gg.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, h, w)
        it_o = int(it_o)
        checks["old"], iters["old"] = float(np.asarray(d_o)), it_o
        dt_o = time.perf_counter() - t0
        st = make_state(u, locked, epsilon=1e-2)
        gg = bg.pad_state(st)
        t0 = time.perf_counter()
        _, it_n, d_n, _ = bg._solve_banded(
            gg.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, False, h, w)
        it_n = int(it_n)
        checks["new"], iters["new"] = float(np.asarray(d_n)), it_n
        dt_n = time.perf_counter() - t0
        assert it_o == it_n, (it_o, it_n)
        if rep:
            best["old"] = max(best.get("old", 0), it_o * h * w / 2 / dt_o / 1e9)
            best["new"] = max(best.get("new", 0), it_n * h * w / 2 / dt_n / 1e9)
    assert checks["old"] == checks["new"], checks
    report(f"verdict_{h}", deltas_equal=True, iters=iters["new"],
           old_g=round(best["old"], 1), new_g=round(best["new"], 1))


def main():
    report("env", backend=jax.default_backend())
    run_ab(4096, 4096, 10_000)
    run_ab(8192, 8192, 4_000)


if __name__ == "__main__":
    main()
