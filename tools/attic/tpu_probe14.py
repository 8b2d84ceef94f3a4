#!/usr/bin/env python
"""TPU probe 14: isolate why the 3D kernel runs ~2-4 G visits/s when the 2D
kernel does ~110 G on the same flattened shape.

Variants (all on a [7680, 256] f32 array = 30x256x256 flattened):
  a. control: the production 2D sweep kernel (4 rolls, 4 exp)
  b. 2D kernel + 2 extra row-rolls by +-256 fed into the same max/sum tree
     (the 3D neighbour pattern, 6 rolls, 6 exp) — isolates the z-roll cost
  c. the actual 3D kernel (adds slab parity derivation via // and %)
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

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_sweep, pallas_sweep3d  # noqa: E402

R, W = 7680, 256
HP = 256
K, REPS = 100, 80
LOG4 = np.float32(np.log(4.0))
LOG6 = np.float32(np.log(6.0))


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def _kernel_variant(it_ref, u_ref, f_ref, out_ref, d_ref, *, six_rolls):
    t0 = it_ref[0]
    u0 = u_ref[:]
    not_frozen = jnp.logical_not(f_ref[:])
    r, w = u0.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (r, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    parity = (row + col) % 2

    def sweep(u, k):
        un = pltpu.roll(u, 1, 0)
        us = pltpu.roll(u, r - 1, 0)
        uw = pltpu.roll(u, 1, 1)
        ue = pltpu.roll(u, w - 1, 1)
        if six_rolls:
            uzm = pltpu.roll(u, HP, 0)
            uzp = pltpu.roll(u, r - HP, 0)
            m = jnp.maximum(jnp.maximum(uzm, uzp), jnp.maximum(un, us))
            m = jnp.maximum(m, jnp.maximum(uw, ue))
            s = jnp.exp(uzm - m) + jnp.exp(uzp - m) + jnp.exp(un - m)
            s = s + jnp.exp(us - m) + jnp.exp(uw - m) + jnp.exp(ue - m)
            val = (m + jnp.log(s)) - LOG6
        else:
            m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
            s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
            val = (m + jnp.log(s)) - LOG4
        update = (parity != ((t0 + k) % 2)) & not_frozen
        return jnp.where(update, val, u)

    u = sweep(u0, 0)
    delta = jnp.max(jnp.abs(u - u0))

    def body(k, u):
        return sweep(u, k + 1)

    u = jax.lax.fori_loop(0, K - 1, body, u)
    out_ref[:] = u
    d_ref[0] = delta


@functools.partial(jax.jit, static_argnames=("six_rolls",))
def run_variant(u, frozen, six_rolls):
    call = pl.pallas_call(
        functools.partial(_kernel_variant, six_rolls=six_rolls),
        out_shape=(
            jax.ShapeDtypeStruct((R, W), jnp.float32),
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
        u, it = carry
        u, _ = call(it.reshape(1), u, frozen)
        return u, it + K

    return jax.lax.fori_loop(0, REPS, body, (u, jnp.int32(0)))


def time_variant(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out)[0]
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    arr = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(arr)
    dt = time.perf_counter() - t0
    visits = K * REPS * R * W
    report(name, cold_s=round(cold, 1), warm_s=round(dt, 2),
           g_visits_per_s=round(visits / dt / 1e9, 1))


def main():
    report("env", backend=jax.default_backend())
    rng = np.random.default_rng(0)
    u = jnp.asarray(np.float32(rng.normal(-10, 3, (R, W))))
    frozen = jnp.asarray(rng.random((R, W)) < 0.15)

    time_variant("a_2d_control", run_variant, u, frozen, False)
    time_variant("b_six_rolls", run_variant, u, frozen, True)

    # c: the production 3D path end-to-end
    uu = np.full((30, 256, 256), -1e6, dtype=np.float32)
    locked = np.zeros((30, 256, 256), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    uu[15, 128, 128] = 0.0
    locked[15, 128, 128] = True
    st = make_state(uu, locked, epsilon=1e-2)
    padded = pallas_sweep3d.pad_state(st)

    @functools.partial(jax.jit, static_argnames=())
    def run3d(u, frozen):
        def body(i, carry):
            u, it = carry
            u, _ = pallas_sweep3d.sweep3d_chunk(u, frozen, it, K, False)
            return u, it + K

        return jax.lax.fori_loop(0, REPS, body, (u, jnp.int32(0)))

    time_variant("c_3d_production", run3d, padded.u, padded.frozen)


if __name__ == "__main__":
    main()
