#!/usr/bin/env python
"""TPU probe 30: folded-check vs unfolded (dedicated 1-sweep check) tiled
solve loops, and the 2048² solve regime.

probe29: the folded check LOST at 16384² (26.9 vs probe28's unfolded
30.0 G) but the tiled solve beat the banded solve at 8192²/4096². This
probe runs the UNFOLDED tiled loop (replicated inline) at every size so
the two effects separate cleanly, plus the 2048² solves.
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu import constants as C  # noqa: E402
from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_biggrid as bg  # noqa: E402
from epic_tpu.solver import pallas_tiled2d as t2  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _grid_device(h: int, w: int, seed: int = 1, density: float = 0.1):
    key = jax.random.PRNGKey(seed)
    u = jnp.full((h, w), -1e6, dtype=jnp.float32)
    locked = jax.random.uniform(key, (h, w)) < density
    edge_r = (jnp.arange(h) % (h - 1)) == 0
    edge_c = (jnp.arange(w) % (w - 1)) == 0
    locked = locked | edge_r[:, None] | edge_c[None, :]
    u = u.at[h // 2, w // 2].set(0.0)
    locked = locked.at[h // 2, w // 2].set(True)
    return u, locked


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "wt",
                     "height", "width"),
    donate_argnums=(0,),
)
def _solve_tiled_unfolded(u, frozen, epsilon, stagger, max_iterations,
                          band, k, wt, height, width):
    """The pre-fold _solve_tiled body: dedicated 1-sweep check chunk."""
    m_max = max(height, width)
    chunk_fn = t2.sweep_chunk_tiled.__wrapped__

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        u, delta = chunk_fn(u, frozen, iteration, 1, band, k, wt, False)
        iteration = iteration + 1
        done = (delta < epsilon) & (iteration >= m_max)

        def run_rest(args):
            u, iteration = args
            rest = stagger - 1
            n_full, rem = divmod(rest, k)

            def chunk_body(i, carry):
                u, it = carry
                u, _ = chunk_fn(u, frozen, it, k, band, k, wt, False)
                return u, it + k

            u, iteration = jax.lax.fori_loop(0, n_full, chunk_body,
                                             (u, iteration))
            if rem:
                u, _ = chunk_fn(u, frozen, iteration, rem, band, k, wt, False)
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(done, lambda a: a, run_rest,
                                    (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


def time_unfolded(h, w, cap):
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    g = t2.pad_state(st)
    t0 = time.perf_counter()
    _, iters, delta, _ = _solve_tiled_unfolded(
        g.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.wt, h, w)
    iters = int(iters)
    _ = float(np.asarray(delta))
    cold = time.perf_counter() - t0
    g = t2.pad_state(st)
    t0 = time.perf_counter()
    _, iters, delta, _ = _solve_tiled_unfolded(
        g.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.wt, h, w)
    iters = int(iters)
    _ = float(np.asarray(delta))
    warm = time.perf_counter() - t0
    report(f"solve_{h}_tiled_unfolded", iters=iters, cold_s=round(cold, 1),
           warm_s=round(warm, 2), sweeps_per_s=round(iters / warm),
           g_updates_per_s=round(iters * h * w / 2 / warm / 1e9, 1))


def time_solve(tag, solve_fn, h, w, cap):
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = solve_fn(st, max_iterations=cap)
    _ = float(np.asarray(out.delta))
    cold = time.perf_counter() - t0
    st = make_state(u, locked, epsilon=1e-2)
    t0 = time.perf_counter()
    out = solve_fn(st, max_iterations=cap)
    iters2 = int(out.iteration)
    _ = float(np.asarray(out.delta))
    warm = time.perf_counter() - t0
    report(tag, iters=iters2, cold_s=round(cold, 1), warm_s=round(warm, 2),
           sweeps_per_s=round(iters2 / warm),
           g_updates_per_s=round(iters2 * h * w / 2 / warm / 1e9, 1))


def main():
    report("env", backend=jax.default_backend())
    time_unfolded(16384, 16384, 10_000)
    time_unfolded(8192, 8192, 10_000)
    time_unfolded(4096, 4096, 10_000)
    time_unfolded(2048, 2048, 30_000)
    time_solve("solve_2048_tiled_folded", t2.solve, 2048, 2048, 30_000)
    time_solve("solve_2048_banded", bg.solve, 2048, 2048, 30_000)


if __name__ == "__main__":
    main()
