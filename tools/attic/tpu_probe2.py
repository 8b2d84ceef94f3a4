#!/usr/bin/env python
"""TPU probe round 2: close the 9x gap between the production kernel and the
measured sweep speed of light (~109 G visits/s, tools/tpu_probe.py).

Hypotheses to separate:
  H1 array width (512 lanes vs 2048): lane-dim underutilization
  H2 frozen-mask VMEM read per sweep
  H3 SMEM scalar input / SMEM delta output / input_output_aliases
  H4 the existing pallas_banded halo-concatenate design is fine when
     measured single-dispatch (round-1 slowness was an artifact)
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG4 = np.float32(np.log(np.float64(4.0)))


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def timed(fn, args, reps):
    t0 = time.perf_counter()
    _ = float(np.asarray(fn(*args, jnp.int32(1))))
    compile_s = time.perf_counter() - t0
    out = []
    for n in reps:
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args, jnp.int32(n))))
        out.append((n, time.perf_counter() - t0))
    return out, compile_s


# -- C: shape/width scan of the plain B9 sweep loop (no mask read) ----------

def make_plain(h, w, inner):
    def kern(x_ref, o_ref):
        x = x_ref[:]

        def sweep(i, x):
            un = pltpu.roll(x, 1, 0)
            us = pltpu.roll(x, h - 1, 0)
            uw = pltpu.roll(x, 1, 1)
            ue = pltpu.roll(x, w - 1, 1)
            m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
            s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
            return (m + jnp.log(s)) - LOG4

        o_ref[:] = jax.lax.fori_loop(0, inner, sweep, x)

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: call(x), x)[0, :8].sum()

    return run


def battery_c():
    INNER = 200
    for h, w in [(256, 1024), (488, 512), (2048, 128), (128, 2048),
                 (256, 512), (512, 512), (480, 512), (482, 482)]:
        try:
            rng = np.random.default_rng(0)
            x0 = jax.device_put(jnp.asarray(
                np.float32(-np.abs(rng.normal(2, 1, (h, w))))))
            run = make_plain(h, w, INNER)
            times, compile_s = timed(run, (x0,), [2, 6])
            (n1, t1), (n2, t2) = times
            per = (t2 - t1) / (n2 - n1) / INNER
            report(f"C_plain_{h}x{w}", ns_per_sweep=round(per * 1e9, 1),
                   gvisits_per_s=round(h * w / per / 1e9, 2),
                   compile_s=round(compile_s, 1))
        except Exception as e:
            report(f"C_plain_{h}x{w}", error=str(e)[:200])


# -- D: feature toggles at (488, 512), the production maze shape ------------

def make_toggled(h, w, inner, with_mask, with_frozen, with_smem_it,
                 with_delta, with_alias):
    def kern(*refs):
        i = 0
        if with_smem_it:
            it_ref = refs[i]; i += 1
        x_ref = refs[i]; i += 1
        if with_frozen:
            f_ref = refs[i]; i += 1
        o_ref = refs[i]; i += 1
        delta_ref = refs[i] if with_delta else None

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
        o_ref[:] = jax.lax.fori_loop(0, inner - 1, lambda k, x: sweep(k + 1, x), x1)

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


def battery_d():
    h, w = 488, 512
    INNER = 200
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(np.float32(-np.abs(rng.normal(2, 1, (h, w))))))
    fz = np.zeros((h, w), np.int32)
    fz[0, :] = fz[-1, :] = 1
    fz[:, 0] = fz[:, -1] = 1
    f0 = jax.device_put(jnp.asarray(fz))
    cases = [
        # name            mask frozen smem delta alias
        ("D1_bare",        0,   0,    0,   0,    0),
        ("D2_mask",        1,   0,    0,   0,    0),
        ("D3_mask_frozen", 1,   1,    0,   0,    0),
        ("D4_all_prod",    1,   1,    1,   1,    1),  # == pallas_sweep today
        ("D5_all_noalias", 1,   1,    1,   1,    0),
        ("D6_mask_frozen_smem", 1, 1, 1,   0,    0),
    ]
    for name, m, f, s, d, a in cases:
        try:
            run = make_toggled(h, w, INNER, m, f, s, d, a)
            times, compile_s = timed(run, (x0, f0), [2, 6])
            (n1, t1), (n2, t2) = times
            per = (t2 - t1) / (n2 - n1) / INNER
            report(name, ns_per_sweep=round(per * 1e9, 1),
                   gvisits_per_s=round(h * w / per / 1e9, 2),
                   compile_s=round(compile_s, 1))
        except Exception as e:
            report(name, error=str(e)[:200])


# -- E: the real pallas_banded at big sizes, single-dispatch ---------------

def battery_e():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from epic_tpu.solver import pallas_banded

    for n in (2048, 4096, 8192):
        try:
            rng = np.random.default_rng(0)
            u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
            frozen = np.zeros((n, n), np.int32)
            frozen[0, :] = frozen[-1, :] = 1
            frozen[:, 0] = frozen[:, -1] = 1
            ud = jax.device_put(jnp.asarray(u))
            fd = jax.device_put(jnp.asarray(frozen))
            K, BAND = 16, 512

            @jax.jit
            def run(u, frozen, reps):
                def body(i, u):
                    u, _ = pallas_banded.sweep_chunk_banded.__wrapped__(
                        u, frozen, i * K, K, BAND, False, 16
                    )
                    return u

                return jax.lax.fori_loop(0, reps, body, u)[0, :8].sum()

            t0 = time.perf_counter()
            _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
            compile_s = time.perf_counter() - t0
            out = []
            for reps in (2, 6):
                t0 = time.perf_counter()
                _ = float(np.asarray(run(ud, fd, jnp.int32(reps))))
                out.append((reps, time.perf_counter() - t0))
            (n1, t1), (n2, t2) = out
            per_pass = (t2 - t1) / (n2 - n1)
            visits = n * n * K
            report(f"E_banded_{n}", s_per_pass=round(per_pass, 5),
                   gvisits_per_s=round(visits / per_pass / 1e9, 2),
                   gupdates_per_s=round(visits / 2 / per_pass / 1e9, 2),
                   compile_s=round(compile_s, 1))
        except Exception as e:
            report(f"E_banded_{n}", error=str(e)[:300])


def main():
    report("env", backend=jax.default_backend())
    battery_c()
    battery_d()
    battery_e()
    report("done")


if __name__ == "__main__":
    main()
