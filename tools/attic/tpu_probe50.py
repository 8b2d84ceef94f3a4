#!/usr/bin/env python
"""TPU probe 50: whole-cycle-check TILED solve at 16384².

Same A/B as probe49 but for the wide-grid tiled solve: the previous
production body (folded-check chunk + paste + cycle-fill + rem)
reconstructed here, vs the integrated whole-cycle sweep_cycle_tiled_check
body. Pre-padded, delta bit-equality asserted."""

import functools
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402
from epic_tpu.solver import pallas_tiled2d as t2  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "wt",
                     "height", "width"),
    donate_argnums=(0,),
)
def _solve_tiled_cyclefill(u, frozen, epsilon, stagger, max_iterations,
                           band, k, wt, height, width):
    """The pre-probe49 tiled body: folded-check chunk + cycle-fill."""
    m_max = max(height, width)
    chunk_fn = t2.sweep_chunk_tiled.__wrapped__
    check_fn = t2.sweep_chunk_tiled_check.__wrapped__
    cycle_fn = pc.sweep_cycle_tiled.__wrapped__
    hx = t2._HX
    cd = min(k, stagger)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        out_uk, out_u1, delta = check_fn(u, frozen, iteration, cd, band, k,
                                         wt, False)
        done = (delta < epsilon) & (iteration + 1 >= m_max)

        def finish(args):
            u, iteration = args
            return (jax.lax.dynamic_update_slice(u, out_u1, (k, hx)),
                    iteration + 1)

        def run_rest(args):
            u, iteration = args
            u = jax.lax.dynamic_update_slice(u, out_uk, (k, hx))
            iteration = iteration + cd
            n_full, rem = divmod(stagger - cd, k)
            if n_full:
                u, _ = pc.cycle_fill(cycle_fn, u, frozen, iteration,
                                     n_full, k, band, wt, interpret=False)
                iteration = iteration + n_full * k
            if rem:
                u, _ = chunk_fn(u, frozen, iteration, rem, band, k, wt,
                                False)
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(done, finish, run_rest, (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


def main():
    report("env", backend=jax.default_backend())
    h = w = 16384
    cap = 4000
    u, locked = _grid_device(h, w)
    g = t2.pad_state(make_state(u, locked, epsilon=1e-2))
    best = {}
    checks = {}
    for rep in range(3):
        st = make_state(u, locked, epsilon=1e-2)
        gg = t2.pad_state(st)
        t0 = time.perf_counter()
        _, it_o, d_o, _ = _solve_tiled_cyclefill(
            gg.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.wt, h, w)
        it_o = int(it_o)
        checks["old"] = float(np.asarray(d_o))
        dt_o = time.perf_counter() - t0
        st = make_state(u, locked, epsilon=1e-2)
        gg = t2.pad_state(st)
        t0 = time.perf_counter()
        _, it_n, d_n, _ = t2._solve_tiled(
            gg.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.wt,
            False, h, w)
        it_n = int(it_n)
        checks["new"] = float(np.asarray(d_n))
        dt_n = time.perf_counter() - t0
        assert it_o == it_n, (it_o, it_n)
        if rep:
            best["old"] = max(best.get("old", 0), it_o * h * w / 2 / dt_o / 1e9)
            best["new"] = max(best.get("new", 0), it_n * h * w / 2 / dt_n / 1e9)
    assert checks["old"] == checks["new"], checks
    report("verdict_16384", deltas_equal=True,
           old_g=round(best["old"], 1), new_g=round(best["new"], 1))


if __name__ == "__main__":
    main()
