#!/usr/bin/env python
"""TPU probe round 12: can the strip-input banded kernel beat biggrid?

pallas_banded feeds halo strips as separate blocked inputs (no full-grid
gather, no dynamic_update_slice writeback — per-chunk XLA traffic is only
the 2K-row strips). It OOM'd Mosaic's default scoped limit at wide shapes;
with vmem_limit raised it may now compile and reclaim biggrid's ~28% gap
to the compute ceiling. Also re-times pallas_tiled (manual DMA) correctly.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.solver import pallas_banded, pallas_tiled  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def case_banded(n, band, k, n_outer):
    name = f"BANDED12_{n}_b{band}k{k}"
    try:
        rng = np.random.default_rng(0)
        u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
        frozen = np.zeros((n, n), np.int32)
        frozen[0, :] = frozen[-1, :] = 1
        frozen[:, 0] = frozen[:, -1] = 1
        hp = -(-n // band) * band
        up = np.full((hp, n), np.float32(-1e6), np.float32)
        up[:n] = u
        fp = np.ones((hp, n), np.int32)
        fp[:n] = frozen
        ud = jax.device_put(jnp.asarray(up))
        fd = jax.device_put(jnp.asarray(fp))

        @jax.jit
        def run(u, frozen, n_):
            def body(i, u):
                u, _ = pallas_banded.sweep_chunk_banded.__wrapped__(
                    u, frozen, i * k, k, band, False, k
                )
                return u

            return jax.lax.fori_loop(0, n_, body, u)[0, :8].sum()

        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(n_outer))))
        dt = time.perf_counter() - t0
        visits = hp * n * k * n_outer
        report(name, compile_s=round(compile_s, 1), total_s=round(dt, 2),
               gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
               sweeps_per_s=round(k * n_outer / dt))
        del ud, fd
    except Exception as e:
        msg = str(e)
        short = msg[msg.find("Scoped allocation"):][:120] if "Scoped" in msg else msg[-200:]
        report(name, error=short)


def case_tiled(n, band, k, n_outer):
    name = f"TILED12_{n}_b{band}k{k}"
    try:
        rng = np.random.default_rng(0)
        u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
        import epic_tpu

        st = epic_tpu.make_state(u, np.zeros((n, n), bool))
        tg = pallas_tiled.pad_for_tiles(st, num_sweeps=k, band=band)
        ud = jax.device_put(tg.u)
        fd = jax.device_put(tg.frozen)

        @jax.jit
        def run(u, frozen, n_):
            def body(i, u):
                u, _ = pallas_tiled.sweep_chunk_tiled.__wrapped__(
                    u, frozen, i * k, k, band, False, k
                )
                return u

            return jax.lax.fori_loop(0, n_, body, u)[0, :8].sum()

        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(n_outer))))
        dt = time.perf_counter() - t0
        visits = n * n * k * n_outer
        report(name, compile_s=round(compile_s, 1), total_s=round(dt, 2),
               gupdates_per_s=round(visits / 2 / dt / 1e9, 2))
        del ud, fd
    except Exception as e:
        msg = str(e)
        short = msg[msg.find("Scoped allocation"):][:120] if "Scoped" in msg else msg[-200:]
        report(name, error=short)


def main():
    report("env", backend=jax.default_backend())
    case_banded(4096, 224, 16, 150)
    case_banded(4096, 456, 16, 150)
    case_banded(8192, 224, 16, 40)
    case_tiled(4096, 224, 16, 100)
    report("done")


if __name__ == "__main__":
    main()
