#!/usr/bin/env python
"""TPU probe round 5: vmem_limit_bytes headroom + long-duration rates.

probe4 found (a) timed regions still too short (rates are lower bounds) and
(b) Mosaic's default 16 MB scoped-VMEM limit rejects wide bands. Many TPU
Pallas kernels raise CompilerParams(vmem_limit_bytes=...); if v5e's physical
VMEM exceeds the default, bands can widen and K deepen. This probe measures
with >=2 s timed regions and scans the limit.
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

from epic_tpu.solver import pallas_biggrid, pallas_sweep  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def biggrid_call(band, k, num_sweeps, wp, nb, vmem_limit):
    ext = band + 2 * k
    params = {}
    if vmem_limit:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
            dimension_semantics=("parallel",),
        )
    else:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    return pl.pallas_call(
        functools.partial(pallas_biggrid._band_kernel, num_sweeps=num_sweeps,
                          band=band, k=k, w=wp),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ext, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ext, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        **params,
    )


def bench_biggrid(n, band, k, vmem_limit, n_outer, label):
    try:
        import epic_tpu

        rng = np.random.default_rng(0)
        u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
        st = epic_tpu.make_state(u, np.zeros((n, n), bool))
        g = pallas_biggrid.pad_state(st, band=band, k=k)
        fext = pallas_biggrid.stack_frozen(g.frozen, band, k)
        hp, wp = g.u.shape
        nb = (hp - 2 * k) // band
        rows_idx = jnp.asarray(pallas_biggrid._stack_rows(hp, band, k))
        call = biggrid_call(band, k, k, wp, nb, vmem_limit)
        ud = jax.device_put(g.u)
        fd = jax.device_put(fext)
        del st, u, g

        @jax.jit
        def run(u_pad, fext, n_):
            def body(i, u_pad):
                u_ext = u_pad[rows_idx]
                out_u, _ = call(jnp.full((1,), i * k, jnp.int32), u_ext, fext)
                return jax.lax.dynamic_update_slice(u_pad, out_u, (k, 0))

            return jax.lax.fori_loop(0, n_, body, u_pad)[0, :8].sum()

        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(n_outer))))
        dt = time.perf_counter() - t0
        visits = n * n * k * n_outer
        report(label, total_s=round(dt, 2), compile_s=round(compile_s, 1),
               gvisits_per_s=round(visits / dt / 1e9, 2),
               gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
               sweeps_per_s=round(k * n_outer / dt))
    except Exception as e:
        msg = str(e)
        short = msg[msg.find("Scoped allocation"):][:120] if "Scoped" in msg else msg[-200:]
        report(label, error=short)


def bench_prod(h, w, chunk, n_outer, label):
    try:
        rng = np.random.default_rng(0)
        u = np.float32(-np.abs(rng.normal(2, 1, (h, w))))
        fz = np.zeros((h, w), bool)
        fz[0, :] = fz[-1, :] = fz[:, 0] = fz[:, -1] = True
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
        visits = h * w * chunk * n_outer
        report(label, total_s=round(dt, 2), compile_s=round(compile_s, 1),
               gvisits_per_s=round(visits / dt / 1e9, 2),
               gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
               sweeps_per_s=round(chunk * n_outer / dt))
    except Exception as e:
        report(label, error=str(e)[-200:])


def main():
    report("env", backend=jax.default_backend())
    M = 1024 * 1024
    bench_prod(488, 512, 100, 3000, "PROD_488x512_long")
    bench_biggrid(2048, 224, 16, None, 2000, "BIG5_2048_b224_default")
    bench_biggrid(4096, 96, 16, 32 * M, 600, "BIG5_4096_b96_lim32M")
    bench_biggrid(4096, 224, 16, 64 * M, 600, "BIG5_4096_b224_lim64M")
    bench_biggrid(8192, 96, 16, 64 * M, 150, "BIG5_8192_b96_lim64M")
    bench_biggrid(8192, 224, 16, 128 * M, 150, "BIG5_8192_b224_lim128M")
    bench_biggrid(16384, 48, 8, 64 * M, 70, "BIG5_16384_b48_lim64M")
    bench_biggrid(16384, 96, 16, 128 * M, 35, "BIG5_16384_b96_lim128M")
    report("done")


if __name__ == "__main__":
    main()
