#!/usr/bin/env python
"""TPU probe round 11: mask-precompute micro-optimization candidate.

The sweep body computes `(parity != (t0+k)%2) & not_frozen` every sweep
(compare + and, ~2 of ~22 ops). Precomputing both parity masks once per
kernel call and selecting per sweep saves those ops if Mosaic lowers the
select efficiently. Compare against the production kernel at the maze shape.
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.solver import pallas_sweep  # noqa: E402

LOG4 = np.float32(np.log(np.float64(4.0)))


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def make_premask_kernel(h, w, chunk):
    def kern(it_ref, u_ref, f_ref, o_ref, delta_ref):
        t0 = it_ref[0]
        u0 = u_ref[:]
        nf = f_ref[:] == 0
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        parity = (row + col) % 2
        m0 = (parity != 0) & nf  # masks for even/odd global iteration
        m1 = (parity != 1) & nf

        def sweep(u, k):
            un = pltpu.roll(u, 1, 0)
            us = pltpu.roll(u, h - 1, 0)
            uw = pltpu.roll(u, 1, 1)
            ue = pltpu.roll(u, w - 1, 1)
            m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
            s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
            val = (m + jnp.log(s)) - LOG4
            even = ((t0 + k) % 2) == 0
            mask = jax.lax.select(
                jnp.broadcast_to(even, (h, w)), m0, m1
            )
            return jnp.where(mask, val, u)

        u = sweep(u0, 0)
        delta_ref[0] = jnp.max(jnp.abs(u - u0))
        u = jax.lax.fori_loop(0, chunk - 1, lambda k, u: sweep(u, k + 1), u)
        o_ref[:] = u

    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )


def main():
    report("env", backend=jax.default_backend())
    h, w, chunk = 488, 512, 100
    rng = np.random.default_rng(0)
    u0 = jax.device_put(jnp.asarray(
        np.float32(-np.abs(rng.normal(2, 1, (h, w))))))
    fz = np.zeros((h, w), bool)
    fz[0, :] = fz[-1, :] = fz[:, 0] = fz[:, -1] = True
    f0 = jax.device_put(jnp.asarray(fz))
    N = 8000

    # Production kernel baseline.
    @jax.jit
    def prod(u, frozen, n):
        def body(i, u):
            u, _ = pallas_sweep.sweep_chunk.__wrapped__(
                u, frozen, i * chunk, chunk, False)
            return u

        return jax.lax.fori_loop(0, n, body, u)[0, :8].sum()

    # Pre-masked variant.
    call = make_premask_kernel(h, w, chunk)

    @jax.jit
    def prem(u, frozen, n):
        fi = frozen.astype(jnp.int32)

        def body(i, u):
            u, _ = call(jnp.full((1,), i * chunk, jnp.int32), u, fi)
            return u

        return jax.lax.fori_loop(0, n, body, u)[0, :8].sum()

    for name, fn in [("PROD", prod), ("PREMASK", prem)]:
        try:
            t0 = time.perf_counter()
            a = float(np.asarray(fn(u0, f0, jnp.int32(1))))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            b = float(np.asarray(fn(u0, f0, jnp.int32(N))))
            dt = time.perf_counter() - t0
            report(name, compile_s=round(compile_s, 1), total_s=round(dt, 2),
                   sweeps_per_s=round(N * chunk / dt),
                   gupdates_per_s=round(h * w * chunk * N / 2 / dt / 1e9, 2),
                   check=round(b, 3))
        except Exception as e:
            report(name, error=str(e)[-250:])

    report("done")


if __name__ == "__main__":
    main()
