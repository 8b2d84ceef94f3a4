#!/usr/bin/env python
"""TPU probe 18: biggrid3d gather-chunk vs manual-DMA chunk at 256^3.

probe16/17 disagreed (9.6 vs 23-25 G visits/s for the same layouts) because
their timed regions were < 2 s and the first config's timed call compiled
the checksum program in-region. This probe fixes the discipline:

- every (variant, layout) warms BOTH the chunk program AND the checksum
  program before its timed region;
- timed region = 4800 sweeps (>= 2 s even at 40 G visits/s), closed by a
  data-dependent 4-byte D2H;
- checksum computed after the clock stops, and cross-checked between the
  gather and DMA variants (identical sweep counts -> identical fields).
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
from epic_tpu.solver import pallas_biggrid3d as bg  # noqa: E402


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def volume(d, h, w, density=0.1, seed=1):
    rng = np.random.default_rng(seed)
    u = np.full((d, h, w), -1e6, dtype=np.float32)
    locked = np.zeros((d, h, w), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    locked |= rng.random((d, h, w)) < density
    u[d // 2, h // 2, w // 2] = 0.0
    locked[d // 2, h // 2, w // 2] = True
    return make_state(u, locked, epsilon=1e-2)


@functools.partial(jax.jit, static_argnames=("band", "k", "hp", "reps"))
def _chunks_gather(u_pad, frozen_ext, band, k, hp, reps):
    def body(i, carry):
        u, it = carry
        u, _ = bg.sweep_chunk_bands(u, frozen_ext, it, k, band, k, hp, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("band", "k", "hp", "reps"))
def _chunks_dma(u_pad, frozen_pad, band, k, hp, reps):
    def body(i, carry):
        u, it = carry
        u, _ = bg.sweep_chunk_dma(u, frozen_pad, it, k, band, k, hp, False)
        return u, it + k

    return jax.lax.fori_loop(0, reps, body, (u_pad, jnp.int32(0)))


@jax.jit
def _checksum(u):
    return jnp.sum(jnp.where(u > -1e5, u, 0.0))


def run(st, variant, band, k, sweeps_target=4800):
    d, h, w = st.u.shape
    try:
        g = bg.pad_state(st, band=band, k=k)
        reps = max(1, sweeps_target // k)
        if variant == "gather":
            frozen = bg.stack_frozen(g.frozen, g.hp, band, k)
            fn = lambda: _chunks_gather(g.u, frozen, band, k, g.hp, reps)
        else:
            fn = lambda: _chunks_dma(g.u, g.frozen, band, k, g.hp, reps)
        t0 = time.perf_counter()
        out, _ = fn()
        _ = float(_checksum(out).block_until_ready())
        _ = np.asarray(out[0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, _ = fn()
        _ = np.asarray(out[0, 0])  # data-dependent barrier
        dt = time.perf_counter() - t0
        checksum = float(np.asarray(_checksum(out)))
        sweeps = k * reps
        cells = d * h * w
        report(f"{variant}_b{band}_k{k}",
               ext_planes=band + 2 * k, nb=-(-d // band),
               compile_s=round(compile_s, 1), warm_s=round(dt, 3),
               sweeps=sweeps,
               g_visits_per_s=round(sweeps * cells / dt / 1e9, 1),
               g_updates_per_s=round(sweeps * cells / 2 / dt / 1e9, 1),
               checksum=checksum)
        return checksum
    except Exception as e:
        report(f"{variant}_b{band}_k{k}", error=str(e)[-160:])
        return None


def main():
    report("env", backend=jax.default_backend())
    st = volume(256, 256, 256)
    for band, k in [(16, 8), (24, 4), (28, 2)]:
        cs_g = run(st, "gather", band, k)
        cs_d = run(st, "dma", band, k)
        if cs_g is not None and cs_d is not None:
            report(f"xcheck_b{band}_k{k}", match=bool(cs_g == cs_d))


if __name__ == "__main__":
    main()
