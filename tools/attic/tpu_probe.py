#!/usr/bin/env python
"""TPU probe battery: locate the per-grid-step fixed cost + VPU ceilings.

Round-1 left a unified mystery (docs/BENCH_NOTES.md): every Pallas kernel
with a grid (banded/tiled/collage) pays ~2.4-3.7 ms per grid STEP on this
stack, while grid-less whole-array kernels don't. This battery isolates the
cause by toggling one structural feature at a time on a fixed workload, and
measures VPU op ceilings to anchor "speed of light" claims.

Measurement rules (CLAUDE.md): one process, one distinct jaxpr per
experiment, dynamic rep counts (traced fori bounds) so two timings don't
recompile, and every timed region closed by a data-dependent D2H readback.

Run: python tools/tpu_probe.py  (background, generous timeout)
"""

import functools
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


def timed(fn, args, reps_list):
    """fn(*args, n) -> scalar checksum. Returns [(n, seconds), ...]."""
    # compile + warm
    t0 = time.perf_counter()
    _ = float(np.asarray(fn(*args, jnp.int32(1))))
    compile_s = time.perf_counter() - t0
    out = []
    for n in reps_list:
        t0 = time.perf_counter()
        c = float(np.asarray(fn(*args, jnp.int32(n))))
        out.append((n, time.perf_counter() - t0))
    return out, compile_s, c


# ---------------------------------------------------------------------------
# A. Grid-step fixed-cost battery: 2048x2048 grid, 16 bands of 128x2048.
# Collage-style independent bands (frozen seams, no halos) — the structure
# shared by pallas_batched and (plus halo inputs) pallas_banded.
# ---------------------------------------------------------------------------

H, W = 2048, 2048
BAND = 128
NB = H // BAND


def make_band_kernel(num_sweeps, delta_mode, semantics, trivial, alias):
    """delta_mode: 'smem_shared' (round-1 design), 'vmem_blocked', 'none'."""

    def kern_smem(it_ref, u_ref, f_ref, u_out, delta_ref):
        _body(it_ref, u_ref, f_ref, u_out, lambda d: delta_ref.__setitem__((pl.program_id(0), 0), d))

    def kern_vmem(it_ref, u_ref, f_ref, u_out, delta_ref):
        _body(it_ref, u_ref, f_ref, u_out, lambda d: delta_ref.__setitem__((0, 0), d))

    def kern_none(it_ref, u_ref, f_ref, u_out):
        _body(it_ref, u_ref, f_ref, u_out, None)

    def _body(it_ref, u_ref, f_ref, u_out, put_delta):
        if trivial:
            u_out[:] = u_ref[:] + 1.0
            if put_delta is not None:
                put_delta(u_ref[0, 0])
            return
        t0 = it_ref[0]
        u0 = u_ref[:]
        h, w = u0.shape
        nf = f_ref[:] == 0
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        parity = (row + col) % 2

        def sweep(u, k):
            un = pltpu.roll(u, 1, 0)
            us = pltpu.roll(u, h - 1, 0)
            uw = pltpu.roll(u, 1, 1)
            ue = pltpu.roll(u, w - 1, 1)
            m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
            s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
            val = (m + jnp.log(s)) - LOG4
            return jnp.where((parity != ((t0 + k) % 2)) & nf, val, u)

        u = sweep(u0, 0)
        if put_delta is not None:
            put_delta(jnp.max(jnp.abs(u - u0)))
        u = jax.lax.fori_loop(0, num_sweeps - 1, lambda k, u: sweep(u, k + 1), u)
        u_out[:] = u

    band_spec = pl.BlockSpec((BAND, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        band_spec,
        band_spec,
    ]
    if delta_mode == "smem_shared":
        kern = kern_smem
        out_shape = (
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1), jnp.float32),
        )
        out_specs = (band_spec, pl.BlockSpec(memory_space=pltpu.SMEM))
    elif delta_mode == "vmem_blocked":
        kern = kern_vmem
        out_shape = (
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((NB * 8, 128), jnp.float32),
        )
        out_specs = (
            band_spec,
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
    else:
        kern = kern_none
        out_shape = jax.ShapeDtypeStruct((H, W), jnp.float32)
        out_specs = band_spec

    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,)
        )
    aliases = {1: 0} if alias else {}

    call = pl.pallas_call(
        kern,
        grid=(NB,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases=aliases,
        **params,
    )

    @jax.jit
    def run(u, frozen, n):
        def body(i, u):
            out = call(jnp.full((1,), i, jnp.int32), u, frozen)
            return out[0] if delta_mode != "none" else out

        u = jax.lax.fori_loop(0, n, body, u)
        return u[0, :8].sum()

    return run


def battery_a():
    rng = np.random.default_rng(0)
    u = np.float32(-np.abs(rng.normal(2.0, 1.0, (H, W))))
    frozen = np.zeros((H, W), np.int32)
    frozen[::BAND, :] = 1
    frozen[BAND - 1 :: BAND, :] = 1
    frozen[:, 0] = frozen[:, -1] = 1
    ud = jax.device_put(jnp.asarray(u))
    fd = jax.device_put(jnp.asarray(frozen))

    cases = [
        # name                      K    delta         sem        triv  alias
        ("A1_k100_smemdelta",       100, "smem_shared", None,      0, 0),
        ("A2_k100_vmemdelta",       100, "vmem_blocked", None,     0, 0),
        ("A3_k100_nodelta",         100, "none",        None,      0, 0),
        ("A4_k8_nodelta",           8,   "none",        None,      0, 0),
        ("A5_k8_smemdelta",         8,   "smem_shared", None,      0, 0),
        ("A6_k8_nodelta_parallel",  8,   "none",        "parallel", 0, 0),
        ("A7_trivial_nodelta",      1,   "none",        None,      1, 0),
        ("A8_k8_nodelta_aliased",   8,   "none",        None,      0, 1),
        ("A9_k8_smem_parallel",     8,   "smem_shared", "parallel", 0, 0),
    ]
    for name, k, dmode, sem, triv, alias in cases:
        try:
            run = make_band_kernel(k, dmode, sem, triv, alias)
            reps = [5, 15] if k >= 100 else [20, 60]
            times, compile_s, _ = timed(run, (ud, fd), reps)
            (n1, t1), (n2, t2) = times
            dev_s_per_pass = (t2 - t1) / (n2 - n1)
            per_step_ms = dev_s_per_pass / NB * 1e3
            visits = H * W * k
            report(
                name,
                k=k,
                compile_s=round(compile_s, 1),
                t_raw=[round(t1, 4), round(t2, 4)],
                s_per_pass=round(dev_s_per_pass, 5),
                ms_per_grid_step=round(per_step_ms, 3),
                gvisits_per_s=round(visits / dev_s_per_pass / 1e9, 2),
            )
        except Exception as e:
            report(name, error=f"{type(e).__name__}: {e}"[:300])


# ---------------------------------------------------------------------------
# B. VPU ceilings on a VMEM-resident (256, 1024) array (grid-less).
# ---------------------------------------------------------------------------

BH, BW = 256, 1024


def make_elementwise(body_fn, iters_per_call):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        x = jax.lax.fori_loop(0, iters_per_call, lambda i, x: body_fn(x, i), x)
        o_ref[:] = x

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((BH, BW), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(x, n):
        x = jax.lax.fori_loop(0, n, lambda i, x: call(x), x)
        return x[0, :8].sum()

    return run


def battery_b():
    rng = np.random.default_rng(1)
    x0 = jax.device_put(jnp.asarray(np.float32(rng.uniform(0.1, 0.9, (BH, BW)))))
    INNER = 400

    half = np.float32(0.5)

    def b_add1(x, i):
        return x + half

    def b_add8(x, i):
        for _ in range(8):
            x = x + half
        return x

    def b_mixed8(x, i):
        # alternating add/mul/max — independent simple ops
        x = x + half
        x = x * half
        x = jnp.maximum(x, half)
        x = x + half
        x = x * half
        x = jnp.maximum(x, half)
        x = x + half
        x = x * half
        return x

    def b_exp1(x, i):
        return jnp.exp(x - 1.0)

    def b_exp4_log1(x, i):
        # transcendental mix of the real sweep: 4 exp + 1 log
        s = jnp.exp(x - 1.0) + jnp.exp(x - 1.25) + jnp.exp(x - 1.5) + jnp.exp(x - 1.75)
        return jnp.log(s) * half

    def b_roll_sub(x, i):
        return pltpu.roll(x, 1, 0) + half

    def b_roll_lane(x, i):
        return pltpu.roll(x, 1, 1) + half

    def b_roll4(x, i):
        return (
            pltpu.roll(x, 1, 0)
            + pltpu.roll(x, BH - 1, 0)
            + pltpu.roll(x, 1, 1)
            + pltpu.roll(x, BW - 1, 1)
        ) * np.float32(0.25)

    def b_sweep(x, i):
        un = pltpu.roll(x, 1, 0)
        us = pltpu.roll(x, BH - 1, 0)
        uw = pltpu.roll(x, 1, 1)
        ue = pltpu.roll(x, BW - 1, 1)
        m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
        s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
        return (m + jnp.log(s)) - LOG4

    def b_sweep_masked(x, i):
        row = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
        parity = (row + col) % 2
        un = pltpu.roll(x, 1, 0)
        us = pltpu.roll(x, BH - 1, 0)
        uw = pltpu.roll(x, 1, 1)
        ue = pltpu.roll(x, BW - 1, 1)
        m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
        s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
        val = (m + jnp.log(s)) - LOG4
        return jnp.where(parity != (i % 2), val, x)

    cases = [
        ("B1_add1", b_add1, 1),
        ("B2_add8", b_add8, 8),
        ("B3_mixed8", b_mixed8, 8),
        ("B4_exp1", b_exp1, 1),
        ("B5_exp4log1", b_exp4_log1, 5),
        ("B6_roll_sublane", b_roll_sub, 1),
        ("B7_roll_lane", b_roll_lane, 1),
        ("B8_roll4", b_roll4, 4),
        ("B9_full_sweep_nomask", b_sweep, 0),
        ("B10_full_sweep_masked", b_sweep_masked, 0),
    ]
    for name, body, nops in cases:
        try:
            run = make_elementwise(body, INNER)
            times, compile_s, _ = timed(run, (x0,), [2, 6])
            (n1, t1), (n2, t2) = times
            dev_s = (t2 - t1) / (n2 - n1) / INNER  # per inner iteration
            elems = BH * BW
            report(
                name,
                compile_s=round(compile_s, 1),
                ns_per_iter=round(dev_s * 1e9, 1),
                gelems_per_s=round(elems / dev_s / 1e9, 2),
                ps_per_elem=round(dev_s / elems * 1e12, 2),
            )
        except Exception as e:
            report(name, error=f"{type(e).__name__}: {e}"[:300])


def main():
    report("env", backend=jax.default_backend(), devices=str(jax.devices()))
    battery_b()
    battery_a()
    report("done")


if __name__ == "__main__":
    main()
