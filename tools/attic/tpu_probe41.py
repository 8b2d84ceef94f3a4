#!/usr/bin/env python
"""TPU probe 41: validate the INTEGRATED cycle-fill solve loops.

probe40 proved the fresh-fill cycle body beats the chunked fori body in a
standalone jit (40.5 vs 36.4 G at 4096² banded). This probe A/Bs the now-
integrated production entry points (pallas_biggrid.solve at 4096²,
pallas_tiled2d.solve at 16384²) against the OLD chunked loop bodies
(reconstructed here verbatim), asserting final-delta bit equality."""

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
from epic_tpu.solver import pallas_tiled2d as t2  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "height",
                     "width"),
    donate_argnums=(0,),
)
def _solve_banded_chunked(u, frozen_pad, epsilon, stagger, max_iterations,
                          band, k, height, width):
    """The pre-probe40 _solve_banded body: fori over K-chunks."""
    m_max = max(height, width)
    chunk_fn = bg.sweep_chunk_dma.__wrapped__
    check_fn = bg.sweep_chunk_dma_check.__wrapped__
    cd = min(k, stagger)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        out_uk, out_u1, delta = check_fn(u, frozen_pad, iteration, cd,
                                         band, k, False)
        done = (delta < epsilon) & (iteration + 1 >= m_max)

        def finish(args):
            u, iteration = args
            return (jax.lax.dynamic_update_slice(u, out_u1, (k, 0)),
                    iteration + 1)

        def run_rest(args):
            u, iteration = args
            u = jax.lax.dynamic_update_slice(u, out_uk, (k, 0))
            iteration = iteration + cd
            n_full, rem = divmod(stagger - cd, k)

            def chunk_body(i, carry):
                u, it = carry
                u, _ = chunk_fn(u, frozen_pad, it, k, band, k, False)
                return u, it + k

            u, iteration = jax.lax.fori_loop(0, n_full, chunk_body,
                                             (u, iteration))
            if rem:
                u, _ = chunk_fn(u, frozen_pad, iteration, rem, band, k,
                                False)
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(done, finish, run_rest, (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "wt",
                     "height", "width"),
    donate_argnums=(0,),
)
def _solve_tiled_chunked(u, frozen, epsilon, stagger, max_iterations,
                         band, k, wt, height, width):
    """The pre-probe40 _solve_tiled body: fori over K-chunks."""
    m_max = max(height, width)
    chunk_fn = t2.sweep_chunk_tiled.__wrapped__
    check_fn = t2.sweep_chunk_tiled_check.__wrapped__
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

            def chunk_body(i, carry):
                u, it = carry
                u, _ = chunk_fn(u, frozen, it, k, band, k, wt, False)
                return u, it + k

            u, iteration = jax.lax.fori_loop(0, n_full, chunk_body,
                                             (u, iteration))
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


def run_banded(h, w, cap):
    u, locked = _grid_device(h, w)
    best = {}
    checks = {}
    for rep in range(3):
        st = make_state(u, locked, epsilon=1e-2)
        g = bg.pad_state(st)
        t0 = time.perf_counter()
        _, it_o, d_o, _ = _solve_banded_chunked(
            g.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, h, w)
        it_o = int(it_o)
        checks["old"] = float(np.asarray(d_o))
        dt_o = time.perf_counter() - t0
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = bg.solve(st, max_iterations=cap)
        it_n = int(out.iteration)
        checks["new"] = float(np.asarray(out.delta))
        dt_n = time.perf_counter() - t0
        assert it_o == it_n, (it_o, it_n)
        if rep > 0:
            for key, dt, it in (("old", dt_o, it_o), ("new", dt_n, it_n)):
                g_rate = it * h * w / 2 / dt / 1e9
                best[key] = max(best.get(key, 0.0), g_rate)
            report(f"banded_{h}_rep{rep}", old_s=round(dt_o, 2),
                   new_s=round(dt_n, 2))
    assert checks["old"] == checks["new"], checks
    report(f"verdict_banded_{h}", deltas_equal=True,
           old_g=round(best["old"], 1), new_g=round(best["new"], 1))


def run_tiled(h, w, cap):
    u, locked = _grid_device(h, w)
    best = {}
    checks = {}
    for rep in range(3):
        st = make_state(u, locked, epsilon=1e-2)
        g = t2.pad_state(st)
        t0 = time.perf_counter()
        _, it_o, d_o, _ = _solve_tiled_chunked(
            g.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.wt, h, w)
        it_o = int(it_o)
        checks["old"] = float(np.asarray(d_o))
        dt_o = time.perf_counter() - t0
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = t2.solve(st, max_iterations=cap)
        it_n = int(out.iteration)
        checks["new"] = float(np.asarray(out.delta))
        dt_n = time.perf_counter() - t0
        assert it_o == it_n, (it_o, it_n)
        if rep > 0:
            for key, dt, it in (("old", dt_o, it_o), ("new", dt_n, it_n)):
                g_rate = it * h * w / 2 / dt / 1e9
                best[key] = max(best.get(key, 0.0), g_rate)
            report(f"tiled_{h}_rep{rep}", old_s=round(dt_o, 2),
                   new_s=round(dt_n, 2))
    assert checks["old"] == checks["new"], checks
    report(f"verdict_tiled_{h}", deltas_equal=True,
           old_g=round(best["old"], 1), new_g=round(best["new"], 1))


def main():
    report("env", backend=jax.default_backend())
    run_banded(4096, 4096, 10_000)
    # 16384²: cap 4000 keeps each solve dispatch ~15 s (watchdog ~45 s).
    run_tiled(16384, 16384, 4_000)


if __name__ == "__main__":
    main()
