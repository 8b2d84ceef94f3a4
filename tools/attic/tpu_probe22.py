#!/usr/bin/env python
"""TPU probe 22: re-measure the PRODUCTION 3D VMEM kernel under the hardened
protocol.

probe13 put pallas_sweep3d at 57 G visits/s (the current BENCH_NOTES
headline), but probe15's near-identical kernel measured 71-78 G at the same
shape with proper >=2 s timed regions — suggesting the production headline is
a stale under-measurement. This probe times the actual production entry
points (sweep3d_chunk_flat and the anytime chunk path) with:

- one compiled program per measurement (fori_loop over the chunk call),
- identical static args between warm-up and timed run,
- >=2 s device work per region, D2H readback barrier,
- checksum cross-check against the XLA twin (core.update_n semantics).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import epic_tpu  # noqa: E402
from epic_tpu.solver import core, pallas_sweep3d  # noqa: E402

K = 100


def report(name, **kw):
    print(json.dumps(dict(name=name, **kw)), flush=True)


def make_volume(d, h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((d, h, w), 128, np.uint8)
    img[rng.random((d, h, w)) < 0.08] = 0
    img[d // 2, h // 2, w // 2] = 255
    return epic_tpu.from_occupancy_volume(img, epsilon=1e-3)


def time_flat(state, reps):
    padded = pallas_sweep3d.pad_state(state)
    d, hp, wp = padded.u.shape
    u2 = padded.u.reshape(d * hp, wp)
    f2 = padded.frozen.reshape(d * hp, wp)

    import functools

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(u2, f2, reps):
        def body(i, carry):
            u2, it = carry
            out, _ = pallas_sweep3d.sweep3d_chunk_flat.__wrapped__(
                u2, f2, it, K, hp, False)
            return out, it + K

        return jax.lax.fori_loop(0, reps, body, (u2, jnp.int32(0)))

    u2d = jax.device_put(u2)
    f2d = jax.device_put(f2)
    out = run(u2d, f2d, reps)
    warm_checksum = float(np.asarray(out[0]).sum(dtype=np.float64))

    u2d = jax.device_put(u2)
    t0 = time.perf_counter()
    out = run(u2d, f2d, reps)
    cs = float(np.asarray(out[0]).sum(dtype=np.float64))
    dt = time.perf_counter() - t0
    cells = int(np.prod(padded.u.shape))
    interior = (state.u.shape[0] - 2) * (state.u.shape[1] - 2) * (state.u.shape[2] - 2)
    sweeps = reps * K
    return {
        "wall_s": round(dt, 3),
        "sweeps_per_s": round(sweeps / dt),
        "g_visits_per_s": round(cells * sweeps / dt / 1e9, 1),
        "g_updates_per_s": round(interior / 2 * sweeps / dt / 1e9, 1),
        "checksum": cs,
        "warm_checksum": warm_checksum,
    }


def xla_checksum(state, sweeps):
    out = core.update_n(state, sweeps)
    u = np.asarray(out.u)
    return float(u.sum(dtype=np.float64)), u


def main():
    shapes = [(30, 256, 256), (16, 128, 512)]
    for shp in shapes:
        st = make_volume(*shp, seed=3)
        # Exactness gate first (small sweep count, separate program).
        st_x = make_volume(*shp, seed=3)
        cs_x, u_x = xla_checksum(st_x, 40)
        st_p = make_volume(*shp, seed=3)
        out_p = pallas_sweep3d.update_n(st_p, 40, interpret=False)
        u_p = np.asarray(out_p.u)
        report("exactness", shape=list(shp),
               max_abs_diff=float(np.abs(u_p - u_x).max()),
               checksum_pallas=float(u_p.sum(dtype=np.float64)),
               checksum_xla=cs_x)

        reps = 100 if shp == (30, 256, 256) else 150
        r = time_flat(st, reps)
        report("production_3d_flat", shape=list(shp), reps=reps, k=K, **r)


if __name__ == "__main__":
    main()
