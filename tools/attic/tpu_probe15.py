#!/usr/bin/env python
"""TPU probe 15: 3D kernel layout duel + lane-width effect.

probe14 found the production 2D kernel runs 39 G visits/s on a [7680, 256]
array vs ~100+ G on wide shapes (BENCH_NOTES) — hypothesis: lane width
(minor-dim extent) sets VPU efficiency, rows are cheap. Two 3D flattenings
of a [D, Hp, Wp] volume:

  tall: [D*Hp, Wp]   (z = row roll by Hp)      — current production
  wide: [Hp, D*Wp]   (z = lane roll by Wp)     — candidate

plus 2D controls at [7680, 256] vs [1920, 1024] vs [240, 8192] to measure
the pure width effect at constant cell count.
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

K, REPS = 100, 400
LOG6 = np.float32(np.log(6.0))


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def _kernel_3d(it_ref, u_ref, f_ref, out_ref, d_ref, *, layout, hp, wp):
    t0 = it_ref[0]
    u0 = u_ref[:]
    not_frozen = jnp.logical_not(f_ref[:])
    r, w = u0.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, w), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    if layout == "tall":
        zz = rr // hp
        yy = rr - zz * hp
        xx = ll
        z_axis, z_stride = 0, hp
    else:  # wide: row = y, lane = z*wp + x
        yy = rr
        zz = ll // wp
        xx = ll - zz * wp
        z_axis, z_stride = 1, wp
    parity = (zz + yy + xx) % 2
    n_ax = (r, w)[z_axis]

    def sweep(u, k):
        uzm = pltpu.roll(u, z_stride, z_axis)
        uzp = pltpu.roll(u, n_ax - z_stride, z_axis)
        uym = pltpu.roll(u, 1, 0)
        uyp = pltpu.roll(u, r - 1, 0)
        uxm = pltpu.roll(u, 1, 1)
        uxp = pltpu.roll(u, w - 1, 1)
        m = jnp.maximum(uzm, uzp)
        m = jnp.maximum(m, uym)
        m = jnp.maximum(m, uyp)
        m = jnp.maximum(m, uxm)
        m = jnp.maximum(m, uxp)
        s = jnp.exp(uzm - m)
        s = s + jnp.exp(uzp - m)
        s = s + jnp.exp(uym - m)
        s = s + jnp.exp(uyp - m)
        s = s + jnp.exp(uxm - m)
        s = s + jnp.exp(uxp - m)
        val = (m + jnp.log(s)) - LOG6
        update = (parity != ((t0 + k) % 2)) & not_frozen
        return jnp.where(update, val, u)

    u = sweep(u0, 0)
    delta = jnp.max(jnp.abs(u - u0))

    def body(k, u):
        return sweep(u, k + 1)

    u = jax.lax.fori_loop(0, K - 1, body, u)
    out_ref[:] = u
    d_ref[0] = delta


@functools.partial(jax.jit, static_argnames=("layout", "hp", "wp"))
def run_3d(u2, frozen2, layout, hp, wp):
    r, w = u2.shape
    call = pl.pallas_call(
        functools.partial(_kernel_3d, layout=layout, hp=hp, wp=wp),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), jnp.float32),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )

    def body(i, carry):
        u2, it = carry
        out, _ = call(it.reshape(1), u2, frozen2)
        return out, it + K

    return jax.lax.fori_loop(0, REPS, body, (u2, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=())
def run_2d(u2, frozen2):
    def body(i, carry):
        u2, it = carry
        out, _ = pallas_sweep.sweep_chunk(u2, frozen2, it, K, False)
        return out, it + K

    return jax.lax.fori_loop(0, REPS, body, (u2, jnp.int32(0)))


def time_run(name, fn, *args, cells, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    _ = np.asarray(out[0])[0]
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    _ = np.asarray(out[0])
    dt = time.perf_counter() - t0
    report(name, cold_s=round(cold, 1), warm_s=round(dt, 2),
           g_visits_per_s=round(K * REPS * cells / dt / 1e9, 1))


def volume_flat(d, hp, wp, layout, seed=1):
    rng = np.random.default_rng(seed)
    u = np.float32(rng.normal(-10, 3, (d, hp, wp)))
    frozen = rng.random((d, hp, wp)) < 0.15
    frozen[0], frozen[-1] = True, True
    frozen[:, 0], frozen[:, -1] = True, True
    frozen[:, :, 0], frozen[:, :, -1] = True, True
    if layout == "tall":
        u2 = u.reshape(d * hp, wp)
        f2 = frozen.reshape(d * hp, wp)
    else:
        u2 = np.transpose(u, (1, 0, 2)).reshape(hp, d * wp)
        f2 = np.transpose(frozen, (1, 0, 2)).reshape(hp, d * wp)
    return jnp.asarray(u2), jnp.asarray(f2)


def main():
    report("env", backend=jax.default_backend())
    rng = np.random.default_rng(0)

    # 2D width controls at ~2M cells.
    for (r, w) in [(7680, 256), (1920, 1024), (240, 8192)]:
        u2 = jnp.asarray(np.float32(rng.normal(-10, 3, (r, w))))
        f2 = jnp.asarray(rng.random((r, w)) < 0.15)
        time_run(f"2d_{r}x{w}", run_2d, u2, f2, cells=r * w)

    # 3D layout duel, 30x256x256.
    d, hp, wp = 30, 256, 256
    for layout in ("tall", "wide"):
        u2, f2 = volume_flat(d, hp, wp, layout)
        time_run(
            f"3d_{layout}_{d}x{hp}x{wp}",
            run_3d, u2, f2, cells=d * hp * wp, layout=layout, hp=hp, wp=wp,
        )

    # 3D wide on a shallow-wide volume (worst case for tall).
    d, hp, wp = 16, 64, 1024
    for layout in ("tall", "wide"):
        u2, f2 = volume_flat(d, hp, wp, layout)
        time_run(
            f"3d_{layout}_{d}x{hp}x{wp}",
            run_3d, u2, f2, cells=d * hp * wp, layout=layout, hp=hp, wp=wp,
        )


if __name__ == "__main__":
    main()
