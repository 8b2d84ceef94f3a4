#!/usr/bin/env python
"""TPU probe round 9 (reordered probe8: warm solve timings + batched body-cost isolation.

probe6 timed solves cold (compile included) — re-measure warm. And the
batched device solve at 256 lanes ran ~200 ms per while iteration where
~15 ms is explained; isolate the gated kernel vs masks vs deltas.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import epic_tpu  # noqa: E402
from epic_tpu import maps  # noqa: E402
from epic_tpu.solver import (  # noqa: E402
    core,
    pallas_batched,
    pallas_biggrid,
    pallas_sweep,
)


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def warm_solve(name, fn, st):
    try:
        t0 = time.perf_counter()
        out = fn(st)
        it1 = int(out.iteration)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(st)
        it = int(out.iteration)
        dt = time.perf_counter() - t0
        report(name, iters=it, cold_s=round(cold, 2), warm_s=round(dt, 3),
               warm_sweeps_per_s=round(it / dt),
               converged=bool(out.converged))
    except Exception as e:
        report(name, error=str(e)[-300:])


def transfer_rates():
    rng = np.random.default_rng(0)
    big = np.float32(rng.normal(0, 1, (8192, 8192)))  # 268 MB
    t0 = time.perf_counter()
    d = jax.device_put(big)
    d.block_until_ready()
    h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(d)
    d2h = time.perf_counter() - t0
    report("XFER_268MB", h2d_s=round(h2d, 2), d2h_s=round(d2h, 2),
           h2d_mb_s=round(268 / h2d), d2h_mb_s=round(268 / d2h))
    del d, big


def main():
    report("env", backend=jax.default_backend())
    batched_isolation()
    transfer_rates()
    solves()
    report("done")


def solves():
    ref = maps.reference_map_path("maze.png")
    img = maps.load_png(ref) if ref is not None else maps.random_obstacles(
        482, 482, density=0.1, seed=0)
    st = epic_tpu.from_occupancy_image(img, epsilon=1e-3)
    # Fresh states per call: core.solve donates its input buffers.
    warm_solve("SOLVE_maze_xla_warm",
               lambda s: core.solve(epic_tpu.from_occupancy_image(img, epsilon=1e-3)), st)


def batched_isolation():
    # --- batched body isolation at 256 lanes of 128^2 --------------------
    from tools.batched_bench_tpu import make_batch

    b, h, w = 256, 128, 128
    u, locked = make_batch(b, h, w)
    u_c, frozen_c, meta = pallas_batched.pad_batch(
        np.asarray(u, np.float32), np.asarray(locked).astype(bool))
    nb, gpr, gpc = meta["n_blocks"], meta["gpr"], meta["gpc"]
    hp8, wp = meta["hp8"], meta["wp"]
    block_rows = meta["block_rows"]
    n_lanes = nb * gpr * gpc
    active = jnp.ones((nb,), jnp.int32)
    retired = jnp.zeros((n_lanes,), bool)

    def timeit(name, fn, *args, iters=30):
        try:
            r = fn(*args, jnp.int32(1))
            _ = np.asarray(r)
            t0 = time.perf_counter()
            r = fn(*args, jnp.int32(iters))
            _ = np.asarray(r)
            dt = time.perf_counter() - t0
            report(name, ms_per_iter=round(dt / iters * 1e3, 2))
        except Exception as e:
            report(name, error=str(e)[-250:])

    # B1: plain (ungated) chunk(100) over the collage.
    @jax.jit
    def b1(u, n):
        def body(i, u):
            u2, _ = pallas_batched.sweep_chunk_blocks.__wrapped__(
                u, frozen_c, i, 100, block_rows, False)
            return u2

        return jax.lax.fori_loop(0, n, body, u)[0, :8].sum()

    timeit("B1_plain_chunk100", b1, u_c)

    # B2: gated chunk(100), all blocks active.
    @jax.jit
    def b2(u, n):
        def body(i, u):
            return pallas_batched._sweep_chunk_gated.__wrapped__(
                u, frozen_c, active, i, 100, block_rows, False)

        return jax.lax.fori_loop(0, n, body, u)[0, :8].sum()

    timeit("B2_gated_chunk100", b2, u_c)

    # B3: the full while-body minus kernels (mask expand + frozen_eff +
    # per-lane delta + bookkeeping).
    @jax.jit
    def b3(u, n):
        def expand(retired):
            r = retired.reshape(nb, gpr, 1, gpc, 1)
            r = jnp.broadcast_to(r, (nb, gpr, hp8, gpc, wp))
            return r.reshape(nb * gpr * hp8, gpc * wp)

        def body(i, c):
            u, ret = c
            fe = jnp.maximum(frozen_c, expand(ret).astype(jnp.int32))
            d = jnp.abs(u - u * 0.999).reshape(nb, gpr, hp8, gpc, wp)
            dl = jnp.max(d, axis=(2, 4)).reshape(n_lanes)
            ret = ret | (dl < -1.0)
            u = u + fe.astype(jnp.float32) * 0.0
            return u, ret

        u, ret = jax.lax.fori_loop(0, n, body, (u, retired))
        return u[0, :8].sum()

    timeit("B3_maskwork_only", b3, u_c)

    # B4: one full while-iteration equivalent under fori: gated chunk(1) +
    # gated chunk(99) + B3's mask work.
    @jax.jit
    def b4(u, n):
        def expand(retired):
            r = retired.reshape(nb, gpr, 1, gpc, 1)
            r = jnp.broadcast_to(r, (nb, gpr, hp8, gpc, wp))
            return r.reshape(nb * gpr * hp8, gpc * wp)

        def body(i, c):
            u, ret = c
            fe = jnp.maximum(frozen_c, expand(ret).astype(jnp.int32))
            up = u
            u = pallas_batched._sweep_chunk_gated.__wrapped__(
                u, fe, active, i, 1, block_rows, False)
            d = jnp.abs(u - up).reshape(nb, gpr, hp8, gpc, wp)
            dl = jnp.max(d, axis=(2, 4)).reshape(n_lanes)
            ret = ret | (dl < -1.0)
            fe = jnp.maximum(frozen_c, expand(ret).astype(jnp.int32))
            u = pallas_batched._sweep_chunk_gated.__wrapped__(
                u, fe, active, i, 99, block_rows, False)
            return u, ret

        u, ret = jax.lax.fori_loop(0, n, body, (u, retired))
        return u[0, :8].sum()

    timeit("B4_full_body_fori", b4, u_c)


if __name__ == "__main__":
    main()
