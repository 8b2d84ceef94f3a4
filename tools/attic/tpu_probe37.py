#!/usr/bin/env python
"""TPU probe 37: the 3D ping-pong cycle at 256³ — chunk chains (A/B vs
chained DMA chunks, exactness-gated) and a cycle-inside solve loop vs the
chunked solve (in 3D k=2, so a 100-sweep cycle is ~50 chained dispatches +
50 full-volume DUS copies — the cycle's best case; the 2D finding that the
while-carry copies eat the gain may flip here)."""

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
from epic_tpu.solver import pallas_biggrid3d as bg3  # noqa: E402
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(jax.jit, static_argnames=("d", "h", "w"))
def _vol_device(d: int, h: int, w: int, seed: int = 1, density: float = 0.1):
    key = jax.random.PRNGKey(seed)
    u = jnp.full((d, h, w), -1e6, dtype=jnp.float32)
    locked = jax.random.uniform(key, (d, h, w)) < density
    ez = (jnp.arange(d) % (d - 1)) == 0
    ey = (jnp.arange(h) % (h - 1)) == 0
    ex = (jnp.arange(w) % (w - 1)) == 0
    locked = (locked | ez[:, None, None] | ey[None, :, None]
              | ex[None, None, :])
    u = u.at[d // 2, h // 2, w // 2].set(0.0)
    locked = locked.at[d // 2, h // 2, w // 2].set(True)
    return u, locked


@functools.partial(jax.jit, static_argnames=("band", "k", "hp", "reps"))
def _chunks_dma3d(u_pad, frozen_pad, band, k, hp, reps):
    def body(i, carry):
        u, it = carry
        u, _ = bg3.sweep_chunk_dma(u, frozen_pad, it, k, band, k, hp, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "max_iterations", "band", "k", "hp", "m_max"),
    donate_argnums=(0,),
)
def _solve3d_cycle(u, frozen_pad, epsilon, stagger, max_iterations,
                   band, k, hp, m_max):
    """3D solve with the cycle kernel inside run_rest."""
    cycle_fn = pc.sweep_cycle3d.__wrapped__
    chunk_fn = bg3.sweep_chunk_dma.__wrapped__
    n_full, rem = divmod(stagger - 1, k)

    def cond(carry):
        _, _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, alt, iteration, _, _ = carry
        u, delta = chunk_fn(u, frozen_pad, iteration, 1, band, k, hp, False)
        iteration = iteration + 1
        done = (delta < epsilon) & (iteration >= m_max)

        def run_rest(args):
            u, alt, iteration = args
            if n_full:
                a, b, _ = cycle_fn(u, alt, frozen_pad, iteration, n_full,
                                   k, band, hp, False)
                u, alt = (b, a) if n_full % 2 else (a, b)
                iteration = iteration + n_full * k
            if rem:
                u, _ = chunk_fn(u, frozen_pad, iteration, rem, band, k, hp,
                                False)
                iteration = iteration + rem
            return u, alt, iteration

        u, alt, iteration = jax.lax.cond(
            done, lambda a: a, run_rest, (u, alt, iteration))
        return u, alt, iteration, delta, done

    u_out, _, iteration, delta, converged = jax.lax.while_loop(
        cond, body, (u, u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )
    return u_out, iteration, delta, converged


def main():
    report("env", backend=jax.default_backend())
    d = h = w = 256
    u, locked = _vol_device(d, h, w)
    st = make_state(u, locked, epsilon=1e-2)
    band, k = bg3.choose_layout((d, h, w))
    g = bg3.pad_state(st)
    report("layout", band=band, k=k, hp=g.hp)
    sweeps = 1200
    reps = sweeps // k
    cells = d * h * w

    # (a) chunk chains A/B.
    rows = []
    for rep in range(3):
        t0 = time.perf_counter()
        oc, _ = _chunks_dma3d(g.u, g.frozen, band, k, g.hp, reps)
        _ = np.asarray(oc[0, 0])
        dt_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        a, b, _ = pc.sweep_cycle3d(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                                   reps, k, band, g.hp, False)
        fin = b if reps % 2 else a
        _ = np.asarray(fin[0, 0])
        dt_y = time.perf_counter() - t0
        if rep == 0:
            md = float(np.asarray(jnp.max(jnp.abs(fin - oc))))
            report("exactness_256_cycle_vs_chained", max_abs_diff=md)
        else:
            rows.append((dt_c, dt_y))
            report(f"ab_chunks_rep{rep}", chained_s=round(dt_c, 3),
                   cycle_s=round(dt_y, 3),
                   chained_g=round(sweeps * cells / 2 / dt_c / 1e9, 1),
                   cycle_g=round(sweeps * cells / 2 / dt_y / 1e9, 1))
    report("verdict_256_chunks",
           chained_g=round(sweeps * cells / 2 / min(r[0] for r in rows) / 1e9, 1),
           cycle_g=round(sweeps * cells / 2 / min(r[1] for r in rows) / 1e9, 1))

    # (b) solves A/B (cap bounded).
    cap = 4000
    rows = []
    for rep in range(3):
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = bg3.solve(st, max_iterations=cap)
        it1 = int(out.iteration)
        _ = float(np.asarray(out.delta))
        dt_c = time.perf_counter() - t0
        g2 = bg3.pad_state(make_state(u, locked, epsilon=1e-2))
        t0 = time.perf_counter()
        _, it2, d2, _ = _solve3d_cycle(
            g2.u, g2.frozen, jnp.float32(1e-2), 100, cap, band, k, g2.hp, 256)
        it2 = int(it2)
        _ = float(np.asarray(d2))
        dt_y = time.perf_counter() - t0
        if rep > 0:
            rows.append((dt_c, dt_y))
            report(f"ab_solve_rep{rep}", chunked_s=round(dt_c, 2),
                   cycle_s=round(dt_y, 2),
                   chunked_g=round(it1 * cells / 2 / dt_c / 1e9, 1),
                   cycle_g=round(it2 * cells / 2 / dt_y / 1e9, 1))
    report("verdict_256_solve",
           chunked_g=round(cap * cells / 2 / min(r[0] for r in rows) / 1e9, 1),
           cycle_g=round(cap * cells / 2 / min(r[1] for r in rows) / 1e9, 1))


if __name__ == "__main__":
    main()
