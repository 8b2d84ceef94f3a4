#!/usr/bin/env python
"""TPU probe 36: (a) tiled ping-pong cycle vs chained tiled chunks at
16384² (in-process A/B, exactness-gated); (b) banded solve cycle-inside vs
chunked-inside at 4096² (in-process A/B — probe32 vs probe35 disagreed
within tunnel variance)."""

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
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402
from epic_tpu.solver import pallas_tiled2d as t2  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(jax.jit, static_argnames=("band", "k", "wt", "reps"))
def _chunks_tiled(u_pad, frozen_pad, band, k, wt, reps):
    def body(i, carry):
        u, it = carry
        u, _ = t2.sweep_chunk_tiled(u, frozen_pad, it, k, band, k, wt, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "height",
                     "width"),
    donate_argnums=(0,),
)
def _solve_banded_chunked(u, frozen_pad, epsilon, stagger, max_iterations,
                          band, k, height, width):
    """probe32's solve structure: folded check + fori of chunk dispatches
    (no cycle kernel) — the A/B baseline."""
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
                u, _ = chunk_fn(u, frozen_pad, iteration, rem, band, k, False)
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(done, finish, run_rest, (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


def main():
    report("env", backend=jax.default_backend())

    # (a) 16384² chunk chains: chained vs cycle, exactness-gated.
    h = w = 16384
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    band, k, wt = t2.choose_tiled_layout((h, w))
    g = t2.pad_state(st, band=band, k=k, wt=wt)
    reps = 608 // k
    sweeps = reps * k
    cells = h * w

    out_c = None
    rows = []
    for rep in range(3):  # rep 0 = compile
        t0 = time.perf_counter()
        oc, _ = _chunks_tiled(g.u, g.frozen, band, k, wt, reps)
        _ = np.asarray(oc[0, 0])
        dt_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        a, b, _ = pc.sweep_cycle_tiled(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                                       reps, k, band, wt, False)
        fin = b if reps % 2 else a
        _ = np.asarray(fin[0, 0])
        dt_y = time.perf_counter() - t0
        if rep == 0:
            md = float(np.asarray(jnp.max(jnp.abs(fin - oc))))
            report("exactness_16384_cycle_vs_chained", max_abs_diff=md)
        else:
            rows.append((dt_c, dt_y))
            report(f"ab_16384_rep{rep}",
                   chained_s=round(dt_c, 3), cycle_s=round(dt_y, 3),
                   chained_g=round(sweeps * cells / 2 / dt_c / 1e9, 1),
                   cycle_g=round(sweeps * cells / 2 / dt_y / 1e9, 1))
    best_c = min(r[0] for r in rows)
    best_y = min(r[1] for r in rows)
    report("verdict_16384_chunks",
           chained_g=round(sweeps * cells / 2 / best_c / 1e9, 1),
           cycle_g=round(sweeps * cells / 2 / best_y / 1e9, 1))
    del g, st, u, locked, out_c

    # (b) 4096² solves: cycle-inside (production bg.solve) vs chunked.
    h = w = 4096
    u, locked = _grid_device(h, w)
    band, k = bg.choose_layout((h, w))
    cap = 10_000
    rows = []
    for rep in range(3):
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = bg.solve(st, max_iterations=cap)
        it1 = int(out.iteration)
        _ = float(np.asarray(out.delta))
        dt_y = time.perf_counter() - t0
        st = make_state(u, locked, epsilon=1e-2)
        g = bg.pad_state(st)
        t0 = time.perf_counter()
        _, it2, d2, _ = _solve_banded_chunked(
            g.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, h, w)
        it2 = int(it2)
        _ = float(np.asarray(d2))
        dt_c = time.perf_counter() - t0
        if rep > 0:
            rows.append((dt_c, dt_y))
            report(f"ab_solve4096_rep{rep}",
                   chunked_s=round(dt_c, 2), cycle_s=round(dt_y, 2),
                   chunked_g=round(it2 * h * w / 2 / dt_c / 1e9, 1),
                   cycle_g=round(it1 * h * w / 2 / dt_y / 1e9, 1))
    report("verdict_solve4096",
           chunked_g=round(cap * h * w / 2 / min(r[0] for r in rows) / 1e9, 1),
           cycle_g=round(cap * h * w / 2 / min(r[1] for r in rows) / 1e9, 1))


if __name__ == "__main__":
    main()
