#!/usr/bin/env python
"""TPU probe round 7: where does the while_loop solve overhead come from?

SOLVE_maze (probe6) ran at 14k sweeps/s although the same kernel under
fori_loop runs 398k sweeps/s — ~3.4 ms per while iteration. Separate:
while-vs-fori trip cost, per-pallas-call cost inside each, XLA body cost.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.solver import pallas_sweep  # noqa: E402

LOG4 = np.float32(np.log(np.float64(4.0)))


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def timed(fn, args, iters_label):
    t0 = time.perf_counter()
    r = fn(*args)
    _ = np.asarray(r[0] if isinstance(r, tuple) else r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = fn(*args)
    _ = np.asarray(r[0] if isinstance(r, tuple) else r)
    dt = time.perf_counter() - t0
    report(iters_label["name"], total_s=round(dt, 3),
           compile_s=round(compile_s, 1),
           ms_per_iter=round(dt / iters_label["iters"] * 1e3, 3))


def main():
    report("env", backend=jax.default_backend())
    h, w = 488, 512
    rng = np.random.default_rng(0)
    u0 = jax.device_put(jnp.asarray(
        np.float32(-np.abs(rng.normal(2, 1, (h, w))))))
    fz = np.zeros((h, w), bool)
    fz[0, :] = fz[-1, :] = fz[:, 0] = fz[:, -1] = True
    f0 = jax.device_put(jnp.asarray(fz))

    N = 500

    # W1: while_loop, trivial scalar body.
    @jax.jit
    def w1(x):
        def cond(c):
            return c[0] < 200000

        def body(c):
            i, x = c
            return i + 1, x * 1.0000001

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

    timed(w1, (jnp.float32(1.0),), dict(name="W1_while_scalar", iters=200000))

    # W2: while_loop, one pallas chunk(100) per iteration.
    @jax.jit
    def w2(u, frozen):
        def cond(c):
            return c[0] < N

        def body(c):
            i, u = c
            u, _ = pallas_sweep.sweep_chunk.__wrapped__(
                u, frozen, i * 100, 100, False)
            return i + 1, u

        return jax.lax.while_loop(cond, body, (jnp.int32(0), u))

    timed(w2, (u0, f0), dict(name="W2_while_1call", iters=N))

    # W3: fori_loop, same body.
    @jax.jit
    def w3(u, frozen):
        def body(i, u):
            u, _ = pallas_sweep.sweep_chunk.__wrapped__(
                u, frozen, i * 100, 100, False)
            return u

        return jax.lax.fori_loop(0, N, body, u)

    timed(w3, (u0, f0), dict(name="W3_fori_1call", iters=N))

    # W4: while_loop, two pallas calls (1 + 99) per iteration — the current
    # solve-body structure.
    @jax.jit
    def w4(u, frozen):
        def cond(c):
            return c[0] < N

        def body(c):
            i, u = c
            u, d = pallas_sweep.sweep_chunk.__wrapped__(
                u, frozen, i * 100, 1, False)
            u, _ = pallas_sweep.sweep_chunk.__wrapped__(
                u, frozen, i * 100 + 1, 99, False)
            return i + 1, u

        return jax.lax.while_loop(cond, body, (jnp.int32(0), u))

    timed(w4, (u0, f0), dict(name="W4_while_2calls", iters=N))

    # W5: while_loop with the solve-style cond reading a device scalar
    # (delta) computed by the kernel — does the data dependence on an SMEM
    # output add cost?
    @jax.jit
    def w5(u, frozen):
        def cond(c):
            i, u, d = c
            return (i < N) & (d > -1.0)

        def body(c):
            i, u, _ = c
            u, d = pallas_sweep.sweep_chunk.__wrapped__(
                u, frozen, i * 100, 100, False)
            return i + 1, u, d

        return jax.lax.while_loop(cond, body, (jnp.int32(0), u, jnp.float32(1.0)))

    timed(w5, (u0, f0), dict(name="W5_while_delta_cond", iters=N))

    # W6: while_loop, XLA fused 100-sweep body (core-style).
    @jax.jit
    def w6(u, frozen):
        def cond(c):
            return c[0] < N

        def body(c):
            i, u = c

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
                upd = (((row + col) % 2) != (k % 2)) & ~frozen
                return jnp.where(upd, val, u)

            return i + 1, jax.lax.fori_loop(0, 100, inner, u)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), u))

    timed(w6, (u0, f0), dict(name="W6_while_xla_body", iters=N))

    report("done")


if __name__ == "__main__":
    main()
