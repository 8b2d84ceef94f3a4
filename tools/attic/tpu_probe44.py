#!/usr/bin/env python
"""TPU probe 44: the (z, y, x)-tiled cycle kernel on chip.

probe43 measured the wide-plane chunk chain at 19.5 G updates/s but the
chunked solve at only 5.9 G (k=2: ~50 dispatches + 50 full-volume pastes
per 100-sweep cycle). This probe A/Bs, at 32x2048x2048:

  chain: fori-chained chunks vs the cycle kernel (bit-equal checksums)
  solve: the old chunked-fori loop body vs the integrated cycle-fill body
         (pre-padded, loop-vs-loop; delta bit-equality asserted)
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

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402
from epic_tpu.solver import pallas_tiled3d as t3  # noqa: E402
from tools.tpu_probe43 import _volume_device, run_chunks  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "yt", "wt",
                     "hp2", "m_max"),
    donate_argnums=(0,),
)
def _solve_tiled3d_chunked(u, frozen_pad, epsilon, stagger, max_iterations,
                           band, k, yt, wt, hp2, m_max):
    """The pre-cycle _solve_tiled3d body: fori over K-chunks."""
    chunk_fn = t3.sweep_chunk_tiled3d.__wrapped__
    check_fn = t3.sweep_chunk_tiled3d_check.__wrapped__
    cd = min(k, stagger)

    def paste(uu, center):
        return t3._paste(uu, center, k, hp2)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        out_uk, out_u1, delta = check_fn(
            u, frozen_pad, iteration, cd, band, k, yt, wt, hp2, False)
        done = (delta < epsilon) & (iteration + 1 >= m_max)

        def finish(args):
            u, iteration = args
            return paste(u, out_u1), iteration + 1

        def run_rest(args):
            u, iteration = args
            u = paste(u, out_uk)
            iteration = iteration + cd
            n_full, rem = divmod(stagger - cd, k)

            def chunk_body(i, carry):
                u, it = carry
                u, _ = chunk_fn(u, frozen_pad, it, k, band, k, yt, wt,
                                hp2, False)
                return u, it + k

            u, iteration = jax.lax.fori_loop(0, n_full, chunk_body,
                                             (u, iteration))
            if rem:
                u, _ = chunk_fn(u, frozen_pad, iteration, rem, band, k, yt,
                                wt, hp2, False)
                iteration = iteration + rem
            return u, iteration

        u, iteration = jax.lax.cond(done, finish, run_rest, (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "band", "k", "yt", "wt", "hp2"),
    donate_argnums=(0, 1),
)
def run_cycle(u_a, u_b, frozen_pad, it0, n_chunks, band, k, yt, wt, hp2):
    a, b, _ = pc.sweep_cycle_tiled3d.__wrapped__(
        u_a, u_b, frozen_pad, it0, n_chunks, k, band, yt, wt, hp2, False)
    return a, b


def main():
    report("env", backend=jax.default_backend())
    d, h, w = 32, 2048, 2048
    u, locked = _volume_device(d, h, w)
    st = make_state(u, locked, epsilon=1e-2)
    g = t3.pad_state(st)
    band, k, yt, wt = g.band, g.k, g.yt, g.wt
    report("layout", band=band, k=k, yt=yt, wt=wt)
    visits = d * h * w
    csum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))

    # --- chain A/B: chunked fori vs cycle, bit-equal checksums ------------
    nc = 150  # 300 sweeps
    up = g.u
    cs_chain = None
    for rep in range(3):
        t0 = time.perf_counter()
        up = run_chunks(up, g.frozen, jnp.int32(rep * nc * k), nc,
                        band, k, yt, wt, g.hp2)
        cs = float(np.asarray(csum(up)))
        dt = time.perf_counter() - t0
        if rep == 0:
            cs_chain = cs
        else:
            report(f"chunked_rep{rep}", s=round(dt, 2),
                   gup=round(nc * k * visits / 2 / dt / 1e9, 1))
    # run_chunks donated the previous pad's buffers; rebuild for the cycle.
    g2 = t3.pad_state(make_state(u, locked, epsilon=1e-2))
    ua, ub = g2.u, jnp.copy(g2.u)
    cs_cycle = None
    for rep in range(3):
        t0 = time.perf_counter()
        ua, ub = run_cycle(ua, ub, g2.frozen, jnp.int32(rep * nc * k), nc,
                           band, k, yt, wt, g.hp2)
        out = ub if nc % 2 else ua
        cs = float(np.asarray(csum(out)))
        dt = time.perf_counter() - t0
        if rep == 0:
            cs_cycle = cs
        else:
            report(f"cycle_rep{rep}", s=round(dt, 2),
                   gup=round(nc * k * visits / 2 / dt / 1e9, 1))
    report("chain_verdict", checksums_equal=(cs_chain == cs_cycle),
           chunked=cs_chain, cycle=cs_cycle)
    assert cs_chain == cs_cycle, (cs_chain, cs_cycle)

    # --- solve A/B: chunked body vs integrated cycle-fill body ------------
    cap = 2000
    best = {}
    checks = {}
    for rep in range(3):
        gg = t3.pad_state(make_state(u, locked, epsilon=1e-2))
        t0 = time.perf_counter()
        _, it_o, d_o, _ = _solve_tiled3d_chunked(
            gg.u, gg.frozen, st.epsilon, 100, cap, band, k, yt, wt, g.hp2,
            max((d, h, w)))
        it_o = int(it_o)
        checks["old"] = float(np.asarray(d_o))
        dt_o = time.perf_counter() - t0
        gg = t3.pad_state(make_state(u, locked, epsilon=1e-2))
        t0 = time.perf_counter()
        _, it_n, d_n, _ = t3._solve_tiled3d(
            gg.u, gg.frozen, st.epsilon, 100, cap, band, k, yt, wt, g.hp2,
            False, max((d, h, w)))
        it_n = int(it_n)
        checks["new"] = float(np.asarray(d_n))
        dt_n = time.perf_counter() - t0
        assert it_o == it_n, (it_o, it_n)
        if rep:
            for key, dt, it in (("old", dt_o, it_o), ("new", dt_n, it_n)):
                best[key] = max(best.get(key, 0.0),
                                it * visits / 2 / dt / 1e9)
    assert checks["old"] == checks["new"], checks
    report("solve_verdict", deltas_equal=True, old_g=round(best["old"], 1),
           new_g=round(best["new"], 1))


if __name__ == "__main__":
    main()
