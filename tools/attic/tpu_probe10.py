#!/usr/bin/env python
"""TPU probe round 10: deeper temporal blocking for the biggrid kernel.

K=16 measured 38-40 G updates/s; deeper K amortizes the gather/DUS round
trip further at the cost of more halo redundancy (2K/band). Scan K at
4096^2 and 8192^2.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import epic_tpu  # noqa: E402
from epic_tpu.solver import pallas_biggrid  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def case(n, band, k, n_outer):
    name = f"K_{n}_b{band}k{k}"
    try:
        rng = np.random.default_rng(0)
        u = np.float32(-np.abs(rng.normal(2, 1, (n, n))))
        st = epic_tpu.make_state(u, np.zeros((n, n), bool))
        g = pallas_biggrid.pad_state(st, band=band, k=k)
        fext = pallas_biggrid.stack_frozen(g.frozen, band, k)
        ud = jax.device_put(g.u)
        fd = jax.device_put(fext)
        del st, u

        @jax.jit
        def run(u_pad, fext, n_):
            def body(i, u_pad):
                u_pad, _ = pallas_biggrid.sweep_chunk_bands.__wrapped__(
                    u_pad, fext, i * k, k, band, k, False
                )
                return u_pad

            return jax.lax.fori_loop(0, n_, body, u_pad)[0, :8].sum()

        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(1))))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(np.asarray(run(ud, fd, jnp.int32(n_outer))))
        dt = time.perf_counter() - t0
        visits = n * n * k * n_outer
        report(name, compile_s=round(compile_s, 1), total_s=round(dt, 2),
               gupdates_per_s=round(visits / 2 / dt / 1e9, 2),
               sweeps_per_s=round(k * n_outer / dt))
        del ud, fd
    except Exception as e:
        msg = str(e)
        short = msg[msg.find("Scoped allocation"):][:120] if "Scoped" in msg else msg[-200:]
        report(name, error=short)


def main():
    report("env", backend=jax.default_backend())
    case(4096, 456, 16, 150)   # current choice (reference point)
    case(4096, 416, 32, 80)
    case(4096, 320, 48, 60)
    case(4096, 256, 64, 45)
    case(8192, 224, 16, 40)    # current choice
    case(8192, 192, 32, 25)
    case(8192, 128, 48, 20)
    report("done")


if __name__ == "__main__":
    main()
