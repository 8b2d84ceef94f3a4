#!/usr/bin/env python
"""TPU probe round 4: the real production kernels, robust timing.

- F5/F6 redo (delta output + input_output_aliases toggles) — probe3 harness
  indexing bug.
- The actual pallas_sweep.sweep_chunk at the maze shape (is the round-1
  12 G visits/s real, or was that measurement depressed?).
- The new pallas_biggrid.sweep_chunk_bands at 2048^2..16384^2 with both
  conservative and aggressive band layouts (VMEM scoped limit is 16 MB;
  probe3 showed scoped ~= array + ~1 MB for whole-array kernels).
- Whole-array sweep_chunk at ~1M cells (raising VMEM_CELL_BUDGET).
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.solver import pallas_biggrid, pallas_sweep  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def run_case(name, make_run, args, sweeps_per_outer, cells, n_outer):
    try:
        run = make_run()
        t0 = time.perf_counter()
        _ = float(np.asarray(run(*args, jnp.int32(1))))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(run(*args, jnp.int32(n_outer))))
        dt = time.perf_counter() - t0
        visits = cells * sweeps_per_outer * n_outer
        report(name, total_s=round(dt, 2), compile_s=round(compile_s, 1),
               gvisits_per_s=round(visits / dt / 1e9, 2),
               gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
               sweeps_per_s=round(sweeps_per_outer * n_outer / dt))
    except Exception as e:
        report(name, error=str(e)[-400:])


def battery_prod_sweep():
    """The actual production VMEM kernel at maze shape and at ~1M cells."""
    for h, w, chunk, n_outer in [(488, 512, 100, 150), (960, 1024, 100, 40)]:
        rng = np.random.default_rng(0)
        u = np.float32(-np.abs(rng.normal(2, 1, (h, w))))
        fz = np.zeros((h, w), bool)
        fz[0, :] = fz[-1, :] = fz[:, 0] = fz[:, -1] = True
        ud = jax.device_put(jnp.asarray(u))
        fd = jax.device_put(jnp.asarray(fz))

        def make_run():
            @jax.jit
            def run(u, frozen, n):
                def body(i, u):
                    u, _ = pallas_sweep.sweep_chunk.__wrapped__(
                        u, frozen, i * chunk, chunk, False
                    )
                    return u

                return jax.lax.fori_loop(0, n, body, u)[0, :8].sum()

            return run

        run_case(f"PROD_sweep_{h}x{w}", make_run, (ud, fd), chunk, h * w,
                 n_outer)


def battery_biggrid():
    cases = [
        # n, band, k, n_outer(chunks)
        (2048, 224, 16, 60),
        (2048, 96, 16, 60),
        (4096, 96, 16, 16),
        (4096, 224, 16, 16),   # aggressive: ext 256x4096 = 4 MB
        (8192, 32, 16, 6),
        (8192, 96, 16, 6),     # aggressive: ext 128x8192 = 4 MB
        (16384, 16, 8, 2),
        (16384, 48, 8, 2),     # aggressive: ext 64x16384 = 4 MB
    ]
    for n, band, k, n_outer in cases:
        rng = np.random.default_rng(0)
        u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
        import epic_tpu

        st = epic_tpu.make_state(u, np.zeros((n, n), bool))
        g = pallas_biggrid.pad_state(st, band=band, k=k)
        fext = pallas_biggrid.stack_frozen(g.frozen, band, k)
        ud = jax.device_put(g.u)
        fd = jax.device_put(fext)
        del st, u

        def make_run(band=band, k=k):
            @jax.jit
            def run(u, fext, n_):
                def body(i, u):
                    u, _ = pallas_biggrid.sweep_chunk_bands.__wrapped__(
                        u, fext, i * k, k, band, k, False
                    )
                    return u

                return jax.lax.fori_loop(0, n_, body, u)[0, :8].sum()

            return run

        run_case(f"BIG_{n}_b{band}k{k}", make_run, (ud, fd), k, n * n,
                 n_outer)
        del ud, fd


def battery_delta_alias():
    """Delta SMEM output and aliasing toggles on the whole-array kernel."""
    h, w = 488, 512
    rng = np.random.default_rng(0)
    u = np.float32(-np.abs(rng.normal(2, 1, (h, w))))
    fz = np.zeros((h, w), bool)
    fz[0, :] = fz[-1, :] = fz[:, 0] = fz[:, -1] = True
    ud = jax.device_put(jnp.asarray(u))
    fd = jax.device_put(jnp.asarray(fz))
    chunk = 100

    def make_run():
        # Same as PROD but without donation/aliasing: copy of sweep_chunk's
        # pallas_call minus input_output_aliases.
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        call = pl.pallas_call(
            functools.partial(pallas_sweep._multisweep_kernel,
                              num_sweeps=chunk),
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
        )

        @jax.jit
        def run(u, frozen, n):
            def body(i, u):
                u, _ = call(jnp.full((1,), i * chunk, jnp.int32), u, frozen)
                return u

            return jax.lax.fori_loop(0, n, body, u)[0, :8].sum()

        return run

    run_case("PROD_noalias_488x512", make_run, (ud, fd), chunk, h * w, 150)


def main():
    report("env", backend=jax.default_backend())
    battery_prod_sweep()
    battery_delta_alias()
    battery_biggrid()
    report("done")


if __name__ == "__main__":
    main()
