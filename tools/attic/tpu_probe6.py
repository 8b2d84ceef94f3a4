#!/usr/bin/env python
"""TPU probe round 6: validate the productionized configurations on-chip.

1. pallas_sweep with the raised 2M-cell budget at large_maze (962^2) and
   willow-class (1397x1213) shapes: compiles? rate? exact vs XLA twin?
2. pallas_biggrid with choose_layout's new bands at 2048^2/4096^2/8192^2:
   rate + on-chip exactness vs the XLA roll-sweep twin (32 sweeps compare).
3. pallas_sweep.solve full protocol on maze: iteration count matches the
   CPU oracle's (protocol exactness of the compiled while_loop on-chip).
4. solve_batch_device, 256 lanes of 128^2: converges, rate, spot-exactness.
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
    pallas_biggrid,
    pallas_sweep,
    pallas_batched,
)

LOG4 = np.float32(np.log(np.float64(4.0)))


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def xla_sweeps(u, frozen, it0, n):
    """The identical-semantics XLA twin (bench.py's gate)."""

    def inner(k, u):
        un = jnp.roll(u, 1, 0)
        us = jnp.roll(u, -1, 0)
        uw = jnp.roll(u, 1, 1)
        ue = jnp.roll(u, -1, 1)
        m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
        s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
        val = (m + jnp.log(s)) - LOG4
        row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
        upd = (((row + col) % 2) != ((it0 + k) % 2)) & ~frozen
        return jnp.where(upd, val, u)

    return jax.lax.fori_loop(0, n, inner, u)


def vmem_budget_cases():
    for h, w, chunk, n_outer in [(962, 962, 100, 30), (1397, 1213, 100, 15)]:
        name = f"VMEM2M_{h}x{w}"
        try:
            rng = np.random.default_rng(0)
            hp = -(-h // 8) * 8
            wp = -(-w // 128) * 128
            u = np.float32(-np.abs(rng.normal(2, 1, (hp, wp))))
            fz = np.zeros((hp, wp), bool)
            fz[0, :] = fz[-1, :] = fz[:, 0] = fz[:, -1] = True
            fz[h:, :] = True
            fz[:, w:] = True
            ud = jax.device_put(jnp.asarray(u))
            fd = jax.device_put(jnp.asarray(fz))

            @jax.jit
            def run(u, frozen, n):
                def body(i, u):
                    u, _ = pallas_sweep.sweep_chunk.__wrapped__(
                        u, frozen, i * chunk, chunk, False
                    )
                    return u

                return jax.lax.fori_loop(0, n, body, u)[0, :8].sum()

            t0 = time.perf_counter()
            _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(np.asarray(run(ud, fd, jnp.int32(n_outer))))
            dt = time.perf_counter() - t0
            visits = hp * wp * chunk * n_outer
            # Exactness: 32 pallas sweeps vs XLA twin.
            @jax.jit
            def both(u, frozen):
                p, _ = pallas_sweep.sweep_chunk.__wrapped__(
                    u, frozen, jnp.int32(0), 32, False
                )
                x = xla_sweeps(u, frozen, jnp.int32(0), 32)
                return jnp.max(jnp.abs(p - x))

            md = float(np.asarray(both(jnp.asarray(u), fd)))
            report(name, compile_s=round(compile_s, 1), total_s=round(dt, 2),
                   gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
                   sweeps_per_s=round(chunk * n_outer / dt),
                   max_diff_vs_xla=md)
        except Exception as e:
            report(name, error=str(e)[-300:])


def biggrid_cases():
    for n, n_outer in [(2048, 500), (4096, 150), (8192, 40)]:
        band, k = pallas_biggrid.choose_layout((n, n))
        name = f"BIGNEW_{n}_b{band}k{k}"
        try:
            rng = np.random.default_rng(0)
            u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
            st = epic_tpu.make_state(u, np.zeros((n, n), bool))
            g = pallas_biggrid.pad_state(st)
            fext = pallas_biggrid.stack_frozen(g.frozen, g.band, g.k)
            ud = jax.device_put(g.u)
            fd = jax.device_put(fext)

            @jax.jit
            def run(u_pad, fext, n_):
                def body(i, u_pad):
                    u_pad, _ = pallas_biggrid.sweep_chunk_bands.__wrapped__(
                        u_pad, fext, i * k, k, band, k, False
                    )
                    return u_pad

                return jax.lax.fori_loop(0, n_, body, u_pad)[0, :8].sum()

            t0 = time.perf_counter()
            _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(np.asarray(run(ud, fd, jnp.int32(n_outer))))
            dt = time.perf_counter() - t0
            visits = n * n * k * n_outer

            # On-chip exactness vs XLA twin over one chunk (k sweeps).
            frozen_full = jnp.asarray(
                np.array(g.frozen[g.k:g.k + n, :n]).astype(bool))

            @jax.jit
            def both(u_pad, fext, u0):
                p, _ = pallas_biggrid.sweep_chunk_bands.__wrapped__(
                    u_pad, fext, jnp.int32(0), k, band, k, False
                )
                x = xla_sweeps(u0, frozen_full, jnp.int32(0), k)
                return jnp.max(jnp.abs(p[g.k:g.k + n, :n] - x))

            md = float(np.asarray(both(jnp.asarray(g.u), fd, jnp.asarray(u))))
            report(name, compile_s=round(compile_s, 1), total_s=round(dt, 2),
                   gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
                   sweeps_per_s=round(k * n_outer / dt),
                   max_diff_vs_xla=md)
            del ud, fd
        except Exception as e:
            report(name, error=str(e)[-300:])


def solve_protocol_case():
    try:
        ref = maps.reference_map_path("maze.png")
        img = maps.load_png(ref) if ref is not None else maps.random_obstacles(
            482, 482, density=0.1, seed=0)
        st = epic_tpu.from_occupancy_image(img, epsilon=1e-3)
        # CPU-oracle iteration count comes from the hermetic test suite;
        # here compare on-chip pallas solve vs on-chip XLA solve.
        from epic_tpu.solver import core

        t0 = time.perf_counter()
        out_p = pallas_sweep.solve(st)
        it_p = int(out_p.iteration)
        dt_p = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_x = core.solve(st)
        it_x = int(out_x.iteration)
        dt_x = time.perf_counter() - t0
        md = float(np.max(np.abs(np.asarray(out_p.u) - np.asarray(out_x.u))))
        report("SOLVE_maze", pallas_iters=it_p, xla_iters=it_x,
               pallas_s=round(dt_p, 2), xla_s=round(dt_x, 2),
               max_field_diff=md,
               pallas_sweeps_per_s=round(it_p / dt_p),
               converged=bool(out_p.converged))
    except Exception as e:
        report("SOLVE_maze", error=str(e)[-300:])


def batched_case():
    try:
        sys.argv = ["x"]
        from tools.batched_bench_tpu import make_batch

        b, h, w = 256, 128, 128
        u, locked = make_batch(b, h, w)
        t0 = time.perf_counter()
        u_out, iters, deltas, conv = pallas_batched.solve_batch_device(
            u, locked, epsilon=1e-2
        )
        compile_s = time.perf_counter() - t0
        u2, locked2 = make_batch(b, h, w, seed=1)
        t0 = time.perf_counter()
        u_out2, iters2, _, conv2 = pallas_batched.solve_batch_device(
            u2, locked2, epsilon=1e-2
        )
        dt = time.perf_counter() - t0
        report("BATCH_256", compile_s=round(compile_s, 1),
               wall_s=round(dt, 2), solves_per_s=round(b / dt, 1),
               all_converged=bool(conv2.all()),
               mean_iters=round(float(iters2.mean()), 1))
    except Exception as e:
        report("BATCH_256", error=str(e)[-300:])


def main():
    report("env", backend=jax.default_backend())
    vmem_budget_cases()
    biggrid_cases()
    solve_protocol_case()
    batched_case()
    report("done")


if __name__ == "__main__":
    main()
