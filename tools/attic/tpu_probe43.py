#!/usr/bin/env python
"""TPU probe 43: the (z, y, x)-tiled wide-plane 3D kernel on chip.

Wide-plane volumes (padded plane > ~700k cells) are exactly the regime the
plane-banded kernel cannot compile for (probe24 scoped-VMEM wall), so the
comparison twin is the XLA path. Sections:

  exact:  16x512x1536 — 6 sweeps tiled3d vs core (XLA), elementwise diff
  chunks: 32x2048x2048 — N-chunk chain in one dispatch, tiled3d vs XLA twin
  solve:  32x2048x2048 — capped t3.solve, protocol rate
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
from epic_tpu.solver import core  # noqa: E402
from epic_tpu.solver import pallas_tiled3d as t3  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def _volume_device(d, h, w, seed=1, density=0.1):
    key = jax.random.PRNGKey(seed)
    u = jnp.full((d, h, w), -1e6, dtype=jnp.float32)
    locked = jax.random.uniform(key, (d, h, w)) < density
    for ax, n in enumerate((d, h, w)):
        edge = (jnp.arange(n) % (n - 1)) == 0
        shape = [1, 1, 1]
        shape[ax] = -1
        locked = locked | edge.reshape(shape)
    u = u.at[d // 2, h // 2, w // 2].set(0.0)
    locked = locked.at[d // 2, h // 2, w // 2].set(True)
    return u, locked


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "band", "k", "yt", "wt", "hp2"),
    donate_argnums=(0,),
)
def run_chunks(u_pad, frozen_pad, it0, n_chunks, band, k, yt, wt, hp2):
    def body(i, u):
        u, _ = t3.sweep_chunk_tiled3d.__wrapped__(
            u, frozen_pad, it0 + i * k, k, band, k, yt, wt, hp2, False)
        return u

    return jax.lax.fori_loop(0, n_chunks, body, u_pad)


@functools.partial(jax.jit, static_argnames=("n_sweeps",), donate_argnums=(0,))
def run_xla(u, locked, it0, n_sweeps):
    def body(i, u):
        u, _ = core.sweep(u, locked, it0 + i)
        return u

    return jax.lax.fori_loop(0, n_sweeps, body, u)


def main():
    report("env", backend=jax.default_backend())

    # --- exactness: tiled3d vs XLA on a wide-plane volume -----------------
    d, h, w = 16, 512, 1536
    u, locked = _volume_device(d, h, w)
    st = make_state(u, locked, epsilon=1e-2)
    out_t3 = t3.update_n(st, 6)
    a = np.asarray(out_t3.u)
    st = make_state(u, locked, epsilon=1e-2)
    b = np.asarray(core.update_n(st, 6).u)
    md = float(np.max(np.abs(a - b)))
    report("exact_16x512x1536", max_abs_diff=md,
           checksum=float(a.sum(dtype=np.float64)))
    assert md <= 1e-5, md

    # --- chunk-chain throughput vs the XLA twin ---------------------------
    d, h, w = 32, 2048, 2048
    u, locked = _volume_device(d, h, w)
    st = make_state(u, locked, epsilon=1e-2)
    g = t3.pad_state(st)
    band, k, yt, wt = g.band, g.k, g.yt, g.wt
    report("layout", band=band, k=k, yt=yt, wt=wt)
    visits = d * h * w
    nc = 300 // k
    # Data-dependent readback = ONE f32 scalar (a full-array np.asarray
    # would drag ~700 MB through the ~14 MB/s tunnel INSIDE the timed
    # region — the BENCH_NOTES measurement hazard).
    csum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
    up = g.u
    for rep in range(3):
        t0 = time.perf_counter()
        up = run_chunks(up, g.frozen, jnp.int32(rep * nc * k), nc,
                        band, k, yt, wt, g.hp2)
        cs = float(np.asarray(csum(up)))
        dt = time.perf_counter() - t0
        if rep:
            report(f"chain_rep{rep}", s=round(dt, 2),
                   gup=round(nc * k * visits / 2 / dt / 1e9, 1), checksum=cs)
    ux = jnp.asarray(np.asarray(make_state(u, locked, epsilon=1e-2).u))
    lk = jnp.asarray(np.asarray(locked))
    for rep in range(3):
        t0 = time.perf_counter()
        ux = run_xla(ux, lk, jnp.int32(rep * 100), 100)
        float(np.asarray(csum(ux)))
        dt = time.perf_counter() - t0
        if rep:
            report(f"xla_rep{rep}", s=round(dt, 2),
                   gup=round(100 * visits / 2 / dt / 1e9, 1))

    # --- capped solve through the protocol --------------------------------
    cap = 2000
    for rep in range(2):
        st = make_state(u, locked, epsilon=1e-2)
        t0 = time.perf_counter()
        out = t3.solve(st, max_iterations=cap)
        it = int(out.iteration)
        _ = float(np.asarray(out.delta))
        dt = time.perf_counter() - t0
        report(f"solve_rep{rep}", s=round(dt, 2), iters=it,
               gup=round(it * visits / 2 / dt / 1e9, 1))


if __name__ == "__main__":
    main()
