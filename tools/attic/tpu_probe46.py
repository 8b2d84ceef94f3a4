#!/usr/bin/env python
"""TPU probe 46: the PRODUCTION banded chain (cycle3d) at mid-plane shapes.

probe45 compared the tiled chain (15.6 G) against a fori'd
sweep_chunk_dma banded chain (11.6 G) at 128x512x512 — but production
banded chains run the 3D cycle kernel, which at the degenerate k=1 layout
removes the per-sweep paste entirely (the banded SOLVE, all-cycle,
measured 14.0 G). This measures the production structure: one cycle
dispatch of n_chunks at the banded layout, fill twin."""

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
from epic_tpu.solver import pallas_biggrid3d as b3  # noqa: E402
from epic_tpu.solver import pallas_cycle as pc  # noqa: E402
from tools.tpu_probe43 import _volume_device  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "band", "k", "hp"),
    donate_argnums=(0,),
)
def run_cycle_chain(u_pad, frozen_pad, it0, n_chunks, band, k, hp):
    alt = jnp.full_like(u_pad, jnp.float32(-1e6))
    a, b, _ = pc.sweep_cycle3d.__wrapped__(
        u_pad, alt, frozen_pad, it0, n_chunks, k, band, hp, False)
    return b if n_chunks % 2 else a


def main():
    report("env", backend=jax.default_backend())
    d, h, w = 128, 512, 512
    u, locked = _volume_device(d, h, w)
    visits = d * h * w
    csum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
    sweeps = 304

    st = make_state(u, locked, epsilon=1e-2)
    g = b3.pad_state(st)
    report("banded_layout", band=g.band, k=g.k)
    up = g.u
    for rep in range(3):
        t0 = time.perf_counter()
        up = run_cycle_chain(up, g.frozen, jnp.int32(rep * sweeps),
                             sweeps // g.k, g.band, g.k, g.hp)
        float(np.asarray(csum(up)))
        dt = time.perf_counter() - t0
        if rep:
            report(f"banded_cycle_rep{rep}", s=round(dt, 2),
                   gup=round(sweeps * visits / 2 / dt / 1e9, 1))


if __name__ == "__main__":
    main()
