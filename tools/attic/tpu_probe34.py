#!/usr/bin/env python
"""TPU probe 34: the ping-pong cycle kernel vs chained chunk dispatches.

Measures sweep_cycle (N chunks per dispatch, no DUS, no per-chunk drains)
against the production chained sweep_chunk_dma loop at 2048²/4096²/8192²,
with in-process elementwise exactness gates (max|diff| vs the chained
path at identical sweep counts).
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from epic_tpu.grid import make_state  # noqa: E402
from epic_tpu.solver import pallas_biggrid as bg  # noqa: E402
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402
from tools.tpu_probe30 import _grid_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(jax.jit, static_argnames=("band", "k", "reps"))
def _chunks_dma(u_pad, frozen_pad, band, k, reps):
    def body(i, carry):
        u, it = carry
        u, _ = bg.sweep_chunk_dma(u, frozen_pad, it, k, band, k, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


def run(h, w, sweeps_target):
    u, locked = _grid_device(h, w)
    st = make_state(u, locked, epsilon=1e-2)
    band, k = bg.choose_layout((h, w))
    g = bg.pad_state(st, band=band, k=k)
    reps = sweeps_target // k
    sweeps = reps * k
    cells = h * w

    # Chained baseline.
    t0 = time.perf_counter()
    out_c, _ = _chunks_dma(g.u, g.frozen, band, k, reps)
    _ = np.asarray(out_c[0, 0])
    compile_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_c, _ = _chunks_dma(g.u, g.frozen, band, k, reps)
    _ = np.asarray(out_c[0, 0])
    dt_c = time.perf_counter() - t0
    report(f"chained_{h}_b{band}_k{k}", compile_s=round(compile_c, 1),
           warm_s=round(dt_c, 3), sweeps=sweeps,
           g_updates_per_s=round(sweeps * cells / 2 / dt_c / 1e9, 1))

    # Cycle kernel.
    try:
        t0 = time.perf_counter()
        a, b, _ = pc.sweep_cycle(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                                 reps, k, band, False)
        final = b if reps % 2 else a
        _ = np.asarray(final[0, 0])
        compile_y = time.perf_counter() - t0
        # exactness vs the chained result
        md = float(np.asarray(jnp.max(jnp.abs(final - out_c))))
        t0 = time.perf_counter()
        a, b, _ = pc.sweep_cycle(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                                 reps, k, band, False)
        final = b if reps % 2 else a
        _ = np.asarray(final[0, 0])
        dt_y = time.perf_counter() - t0
        report(f"cycle_{h}_b{band}_k{k}", compile_s=round(compile_y, 1),
               warm_s=round(dt_y, 3), sweeps=sweeps,
               g_updates_per_s=round(sweeps * cells / 2 / dt_y / 1e9, 1),
               max_abs_diff_vs_chained=md)
    except Exception as e:
        report(f"cycle_{h}", error=str(e)[-300:])


def main():
    report("env", backend=jax.default_backend())
    run(2048, 2048, 12000)
    run(4096, 4096, 6000)
    run(8192, 8192, 2400)


if __name__ == "__main__":
    main()
