#!/usr/bin/env python
"""TPU probe 51: whole-cycle-check 3D solve at 256³.

A/B the integrated sweep_cycle3d_check solve body (one 50-chunk dispatch
per 100-sweep cycle, no 1-sweep check chunk, no pastes) against the
previous structure (probe42's fill-twin body: 1-sweep check chunk +
49-chunk cycle + 1-sweep remainder). Pre-padded, delta bit-equality."""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_biggrid3d as bg3  # noqa: E402
from tools.tpu_probe42 import _solve3d_fillwin  # noqa: E402


def main():
    print(json.dumps({"name": "env", "backend": jax.default_backend()}),
          flush=True)
    d = h = w = 256
    cap = 3000
    key = jax.random.PRNGKey(1)
    u = jnp.full((d, h, w), -1e6, dtype=jnp.float32)
    locked = jax.random.uniform(key, (d, h, w)) < 0.1
    for ax in range(3):
        edge = (jnp.arange((d, h, w)[ax]) % ((d, h, w)[ax] - 1)) == 0
        shape = [1, 1, 1]
        shape[ax] = -1
        locked = locked | edge.reshape(shape)
    u = u.at[d // 2, h // 2, w // 2].set(0.0)
    locked = locked.at[d // 2, h // 2, w // 2].set(True)
    g = bg3.pad_state(make_state(u, locked, epsilon=1e-2))
    visits = d * h * w

    best = {}
    checks = {}
    for rep in range(3):
        st = make_state(u, locked, epsilon=1e-2)
        gg = bg3.pad_state(st)
        t0 = time.perf_counter()
        _, it_o, d_o, _ = _solve3d_fillwin(
            gg.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.hp,
            False, max((d, h, w)))
        it_o = int(it_o)
        checks["old"] = float(np.asarray(d_o))
        dt_o = time.perf_counter() - t0
        st = make_state(u, locked, epsilon=1e-2)
        gg = bg3.pad_state(st)
        t0 = time.perf_counter()
        _, it_n, d_n, _ = bg3._solve_banded(
            gg.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.hp,
            False, max((d, h, w)))
        it_n = int(it_n)
        checks["new"] = float(np.asarray(d_n))
        dt_n = time.perf_counter() - t0
        assert it_o == it_n, (it_o, it_n)
        if rep:
            best["old"] = max(best.get("old", 0), it_o * visits / 2 / dt_o / 1e9)
            best["new"] = max(best.get("new", 0), it_n * visits / 2 / dt_n / 1e9)
    assert checks["old"] == checks["new"], checks
    print(json.dumps({"name": "verdict_256", "deltas_equal": True,
                      "old_g": round(best["old"], 1),
                      "new_g": round(best["new"], 1)}), flush=True)


if __name__ == "__main__":
    main()
