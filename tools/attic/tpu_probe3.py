#!/usr/bin/env python
"""TPU probe round 3: robust timing (>=2 s per measured call).

probe2's difference method drowned in dispatch variance (negative deltas).
Here every measured call runs ~2-5 s of device work, so the ~30 ms dispatch
overhead is <2% error. One call per case, D2H readback barrier.

Also reproduces the pallas_banded remote-compile failure with a full error.
"""

import json
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG4 = np.float32(np.log(np.float64(4.0)))


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def make_loop(h, w, inner, with_mask, with_frozen, with_smem_it,
              with_delta, with_alias):
    def kern(*refs):
        i = 0
        if with_smem_it:
            it_ref = refs[i]; i += 1
        x_ref = refs[i]; i += 1
        if with_frozen:
            f_ref = refs[i]; i += 1
        o_ref = refs[i]; i += 1
        delta_ref = refs[i + 1] if with_delta else None

        x = x_ref[:]
        t0 = it_ref[0] if with_smem_it else jnp.int32(0)
        nf = (f_ref[:] == 0) if with_frozen else None
        if with_mask:
            row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            parity = (row + col) % 2

        def sweep(k, x):
            un = pltpu.roll(x, 1, 0)
            us = pltpu.roll(x, h - 1, 0)
            uw = pltpu.roll(x, 1, 1)
            ue = pltpu.roll(x, w - 1, 1)
            m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
            s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
            val = (m + jnp.log(s)) - LOG4
            if with_mask:
                upd = parity != ((t0 + k) % 2)
                if with_frozen:
                    upd = upd & nf
                return jnp.where(upd, val, x)
            return val

        x1 = sweep(0, x)
        if with_delta:
            delta_ref[0] = jnp.max(jnp.abs(x1 - x))
        o_ref[:] = jax.lax.fori_loop(
            0, inner - 1, lambda k, x: sweep(k + 1, x), x1)

    in_specs = []
    if with_smem_it:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if with_frozen:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if with_delta:
        out_shape = (jax.ShapeDtypeStruct((h, w), jnp.float32),
                     jax.ShapeDtypeStruct((1,), jnp.float32))
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.SMEM))
    else:
        out_shape = jax.ShapeDtypeStruct((h, w), jnp.float32)
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    aliases = {}
    if with_alias:
        aliases = {1 if with_smem_it else 0: 0}

    call = pl.pallas_call(kern, out_shape=out_shape, in_specs=in_specs,
                          out_specs=out_specs, input_output_aliases=aliases)

    @jax.jit
    def run(x, frozen, n):
        def body(i, x):
            args = []
            if with_smem_it:
                args.append(jnp.full((1,), i, jnp.int32))
            args.append(x)
            if with_frozen:
                args.append(frozen)
            out = call(*args)
            return out[0] if with_delta else out

        return jax.lax.fori_loop(0, n, body, x)[0, :8].sum()

    return run


def measure(run, x0, f0, inner, n_outer, budget_sweeps):
    # warm/compile
    t0 = time.perf_counter()
    _ = float(np.asarray(run(x0, f0, jnp.int32(1))))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(np.asarray(run(x0, f0, jnp.int32(n_outer))))
    dt = time.perf_counter() - t0
    sweeps = n_outer * inner
    return compile_s, dt, dt / sweeps


def battery_shapes():
    """Sweep-loop rate vs array shape (is the production 512-lane width the
    problem?), with production features off (bare val, no mask)."""
    INNER = 500
    for h, w, n_outer in [
        (256, 1024, 2000),   # probe1's B shape
        (488, 512, 4000),    # production maze shape
        (488, 1024, 2000),
        (488, 2048, 1000),
        (256, 512, 8000),
        (128, 2048, 2000),
        (1024, 2048, 250),
    ]:
        try:
            rng = np.random.default_rng(0)
            x0 = jax.device_put(jnp.asarray(
                np.float32(-np.abs(rng.normal(2, 1, (h, w))))))
            run = make_loop(h, w, INNER, 0, 0, 0, 0, 0)
            compile_s, dt, per = measure(run, x0, None, INNER, n_outer, None)
            report(f"S_{h}x{w}", total_s=round(dt, 2),
                   ns_per_sweep=round(per * 1e9, 1),
                   gvisits_per_s=round(h * w / per / 1e9, 2),
                   compile_s=round(compile_s, 1))
        except Exception as e:
            report(f"S_{h}x{w}", error=str(e)[:200])


def battery_features():
    """Feature toggles at the production maze shape, robust timing."""
    h, w = 488, 512
    INNER = 500
    N = 3000
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(np.float32(-np.abs(rng.normal(2, 1, (h, w))))))
    fz = np.zeros((h, w), np.int32)
    fz[0, :] = fz[-1, :] = 1
    fz[:, 0] = fz[:, -1] = 1
    f0 = jax.device_put(jnp.asarray(fz))
    cases = [
        ("F1_bare",             0, 0, 0, 0, 0),
        ("F2_mask",             1, 0, 0, 0, 0),
        ("F3_mask_frozen",      1, 1, 0, 0, 0),
        ("F4_mask_frozen_smem", 1, 1, 1, 0, 0),
        ("F5_prod_noalias",     1, 1, 1, 1, 0),
        ("F6_prod_alias",       1, 1, 1, 1, 1),
    ]
    for name, m, f, s, d, a in cases:
        try:
            run = make_loop(h, w, INNER, m, f, s, d, a)
            compile_s, dt, per = measure(run, x0, f0, INNER, N, None)
            report(name, total_s=round(dt, 2), ns_per_sweep=round(per * 1e9, 1),
                   gvisits_per_s=round(h * w / per / 1e9, 2),
                   compile_s=round(compile_s, 1))
        except Exception as e:
            report(name, error=str(e)[:200])


def battery_banded():
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from epic_tpu.solver import pallas_banded

    for n, K, band, n_outer in [(2048, 16, 512, 40), (2048, 16, 256, 40),
                                (4096, 16, 512, 10)]:
        try:
            rng = np.random.default_rng(0)
            u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
            frozen = np.zeros((n, n), np.int32)
            frozen[0, :] = frozen[-1, :] = 1
            frozen[:, 0] = frozen[:, -1] = 1
            ud = jax.device_put(jnp.asarray(u))
            fd = jax.device_put(jnp.asarray(frozen))

            @jax.jit
            def run(u, frozen, reps):
                def body(i, u):
                    u, _ = pallas_banded.sweep_chunk_banded.__wrapped__(
                        u, frozen, i * K, K, band, False, 16
                    )
                    return u

                return jax.lax.fori_loop(0, reps, body, u)[0, :8].sum()

            t0 = time.perf_counter()
            _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(np.asarray(run(ud, fd, jnp.int32(n_outer))))
            dt = time.perf_counter() - t0
            visits = n * n * K * n_outer
            report(f"BANDED_{n}_b{band}", total_s=round(dt, 2),
                   gvisits_per_s=round(visits / dt / 1e9, 2),
                   gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
                   compile_s=round(compile_s, 1))
        except Exception:
            report(f"BANDED_{n}_b{band}",
                   error=traceback.format_exc()[-1500:])


def main():
    report("env", backend=jax.default_backend())
    battery_features()
    battery_shapes()
    battery_banded()
    report("done")


if __name__ == "__main__":
    main()
