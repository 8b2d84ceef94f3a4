#!/usr/bin/env python
"""TPU probe 42: FAIR loop-vs-loop A/B of the cycle-fill solve bodies.

probe41 compared the old loops (timed pre-padded) against the new public
solve() entries (which pad inside the timed region), confounding the cycle
savings with pad_state cost. Here both sides are the raw jitted loop on
pre-padded buffers:

  A. banded 4096²:  chunked-fori body vs the integrated cycle-fill body
  B. tiled 16384²:  chunked-fori body vs the integrated cycle-fill body
  C. 3D 256³:       production carried-pair cycle body vs a fill-twin body
                    (fresh jnp.full inside run_rest, no alt in the carry)

Delta bit-equality asserted on every pair."""

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
from epic_tpu.solver import pallas_biggrid as bg  # noqa: E402
from epic_tpu.solver import pallas_biggrid3d as bg3  # noqa: E402
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402
from epic_tpu.solver import pallas_tiled2d as t2  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402
from tools.tpu_probe41 import (  # noqa: E402
    _solve_banded_chunked, _solve_tiled_chunked)


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "hp",
                     "interpret", "m_max"),
    donate_argnums=(0,),
)
def _solve3d_fillwin(u, frozen_pad, epsilon, stagger, max_iterations,
                     band, k, hp, interpret, m_max):
    """3D solve body with a FRESH fill twin per cycle (probe40's 2D trick)
    instead of carrying (u, alt) through the while loop."""
    cycle_fn = pc.sweep_cycle3d.__wrapped__
    chunk_fn = bg3.sweep_chunk_dma.__wrapped__
    n_full, rem = divmod(stagger - 1, k)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        u, delta = chunk_fn(u, frozen_pad, iteration, 1, band, k, hp,
                            interpret)
        iteration = iteration + 1
        done = (delta < epsilon) & (iteration >= m_max)

        def run_rest(args):
            u, iteration = args
            if n_full:
                alt = jnp.full_like(u, jnp.float32(-1e6))
                a, b, _ = cycle_fn(u, alt, frozen_pad, iteration, n_full,
                                   k, band, hp, interpret)
                u = b if n_full % 2 else a
                iteration = iteration + n_full * k
            if rem:
                u, _ = chunk_fn(u, frozen_pad, iteration, rem, band, k, hp,
                                interpret)
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(done, lambda a: a, run_rest,
                                    (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


def _ab(name, make_args, run_old, run_new, updates_per_it):
    best = {}
    checks = {}
    for rep in range(3):
        for key, runner in (("old", run_old), ("new", run_new)):
            args = make_args()
            t0 = time.perf_counter()
            _, it, delta, _ = runner(*args)
            it = int(it)
            checks[key] = float(np.asarray(delta))
            dt = time.perf_counter() - t0
            if rep > 0:
                best[key] = max(best.get(key, 0.0),
                                it * updates_per_it / dt / 1e9)
    assert checks["old"] == checks["new"], (name, checks)
    report(name, deltas_equal=True, old_g=round(best["old"], 1),
           new_g=round(best["new"], 1))


def main():
    report("env", backend=jax.default_backend())

    h = w = 4096
    u, locked = _grid_device(h, w)
    g = bg.pad_state(make_state(u, locked, epsilon=1e-2))

    def args_b():
        st = make_state(u, locked, epsilon=1e-2)
        return (bg.pad_state(st).u, g.frozen, st.epsilon, 100, 10_000,
                g.band, g.k, h, w)

    _ab("banded_4096",
        args_b,
        lambda *a: _solve_banded_chunked(*a),
        lambda u_, f, e, s, m, b_, k_, hh, ww: bg._solve_banded(
            u_, f, e, s, m, b_, k_, False, hh, ww),
        h * w / 2)

    h2 = w2 = 16384
    u2, locked2 = _grid_device(h2, w2)
    gt = t2.pad_state(make_state(u2, locked2, epsilon=1e-2))

    def args_t():
        st = make_state(u2, locked2, epsilon=1e-2)
        return (t2.pad_state(st).u, gt.frozen, st.epsilon, 100, 4_000,
                gt.band, gt.k, gt.wt, h2, w2)

    _ab("tiled_16384",
        args_t,
        lambda *a: _solve_tiled_chunked(*a),
        lambda u_, f, e, s, m, b_, k_, wt_, hh, ww: t2._solve_tiled(
            u_, f, e, s, m, b_, k_, wt_, False, hh, ww),
        h2 * w2 / 2)

    d3 = h3 = w3 = 256
    key = jax.random.PRNGKey(1)
    u3 = jnp.full((d3, h3, w3), -1e6, dtype=jnp.float32)
    locked3 = jax.random.uniform(key, (d3, h3, w3)) < 0.1
    for ax in range(3):
        idx = jnp.arange((d3, h3, w3)[ax]) % ((d3, h3, w3)[ax] - 1) == 0
        shape = [1, 1, 1]
        shape[ax] = -1
        locked3 = locked3 | idx.reshape(shape)
    u3 = u3.at[d3 // 2, h3 // 2, w3 // 2].set(0.0)
    locked3 = locked3.at[d3 // 2, h3 // 2, w3 // 2].set(True)
    g3 = bg3.pad_state(make_state(u3, locked3, epsilon=1e-2))

    def args_3():
        st = make_state(u3, locked3, epsilon=1e-2)
        return (bg3.pad_state(st).u, g3.frozen, st.epsilon, 100, 3_000,
                g3.band, g3.k, g3.hp, False, max((d3, h3, w3)))

    _ab("vol_256",
        args_3,
        lambda *a: bg3._solve_banded(*a),
        lambda *a: _solve3d_fillwin(*a),
        d3 * h3 * w3 / 2)


if __name__ == "__main__":
    main()
