#!/usr/bin/env python
"""Named, reproducible performance experiments — the provenance harness.

Every headline number in README / docs/BENCH_NOTES.md is reproducible by
name from this one file (VERDICT r2 #7: the one-off tpu_probe2..51 scripts
established the numbers; this harness re-runs them as a suite and is the
regression guard). The ad-hoc probes live in tools/attic/ for archaeology.

Usage:
    python tools/probe.py --list
    python tools/probe.py maze-chunk biggrid-update
    python tools/probe.py all                  # the full battery (one process)
    python tools/probe.py --quick maze-chunk   # tiny shapes, CPU-safe smoke

Measurement discipline (docs/BENCH_NOTES.md):
- one process for the whole battery (remote-compile warmup is per-process);
- timed regions hold >= ~2 s of device work in few dispatches;
- every timed region is closed by a data-dependent D2H readback
  (block_until_ready can return early through remote-execution tunnels);
- rates are exactness-gated: each experiment validates its kernel against
  an independent path (XLA twin or a structurally different kernel) in the
  same process before reporting.

Each experiment prints ONE JSON line: {"exp": ..., metrics...}.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

EXPERIMENTS = {}


def experiment(name, ref):
    """Register an experiment; ref = the BENCH_NOTES section it backs."""

    def deco(fn):
        EXPERIMENTS[name] = (fn, fn.__doc__ or "", ref)
        return fn

    return deco


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _grid_np(h: int, w: int, seed: int = 1, density: float = 0.1):
    """Synthetic workload grid, prepared in NumPy (no device compiles):
    random obstacles, boundary ring locked, one centre goal."""
    rng = np.random.default_rng(seed)
    u = np.full((h, w), -1e6, np.float32)
    locked = rng.random((h, w)) < density
    locked[0], locked[-1], locked[:, 0], locked[:, -1] = True, True, True, True
    u[h // 2, w // 2] = 0.0
    locked[h // 2, w // 2] = True
    return u, locked


def _vol_np(d: int, h: int, w: int, seed: int = 1, density: float = 0.08):
    rng = np.random.default_rng(seed)
    u = np.full((d, h, w), -1e6, np.float32)
    locked = rng.random((d, h, w)) < density
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    u[d // 2, h // 2, w // 2] = 0.0
    locked[d // 2, h // 2, w // 2] = True
    return u, locked


def _state(u, locked, eps=1e-2):
    from epic_tpu.grid import make_state

    return make_state(u, locked, epsilon=eps)


def _readback_sum(x) -> float:
    """Full D2H completion barrier with a data-dependent result."""
    return float(np.asarray(x).sum(dtype=np.float64))


def _stage(*arrays) -> None:
    """Force pending H2D transfers to completion BEFORE a timed region.

    device_put / jnp.asarray uploads are async; without this barrier the
    input staging rides the ~100 MB/s tunnel INSIDE the timed window. The
    first r3 battery read 4.1 G/s at 16384² from exactly this — the excess
    wall time matched the input byte count at tunnel bandwidth across all
    four sizes, not any kernel regression. A tiny device-side reduction of
    each buffer is a data-dependent barrier (block_until_ready can return
    early through the remote-execution tunnel — docs/BENCH_NOTES.md).
    """
    import jax.numpy as jnp

    for a in arrays:
        if hasattr(a, "u"):  # GridState / BandedGrid / TiledGrid pytrees
            _stage(*(getattr(a, f) for f in ("u", "frozen", "locked")
                     if getattr(a, f, None) is not None))
            continue
        idx = (0,) * (a.ndim - 1)
        float(np.asarray(jnp.sum(a[idx][:1].astype(jnp.float32))))


def _device_equal(a, b) -> bool:
    """Bit-equality gate evaluated ON DEVICE (full-grid D2H of a 16384²
    array costs ~70 s through the ~14 MB/s tunnel; the first r3 battery
    spent most of its 500 s wall in gate readbacks)."""
    import jax.numpy as jnp

    return bool(np.asarray(jnp.all(a == b)))


def _device_max_abs_diff(a, b) -> float:
    import jax.numpy as jnp

    return float(np.asarray(jnp.max(jnp.abs(a - b))))


def _interpret() -> bool:
    import jax

    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# 2D experiments
# ---------------------------------------------------------------------------


@experiment("maze-chunk", "Headline: maze 482x482")
def maze_chunk(q):
    """VMEM-resident multi-sweep kernel on the maze-class fixture: 100-sweep
    chunks chained in one program; XLA-twin exactness gate."""
    import jax
    import jax.numpy as jnp

    from epic_tpu import maps
    from epic_tpu.solver import pallas_sweep as ps
    from epic_tpu.solver._sweep_body import lse4  # noqa: F401 (import check)

    interp = _interpret()
    ref = maps.reference_map_path("maze.png")
    img = maps.load_png(ref) if ref is not None else maps.random_obstacles(
        482, 482, density=0.1, seed=0)
    h, w = img.shape
    hp, wp = -(-h // 8) * 8, -(-w // 128) * 128
    goal, obstacle = img == 255, img == 0
    u_np = np.full((hp, wp), -1e6, np.float32)
    u_np[:h, :w] = np.where(goal, 0.0, -1e6)
    frozen_np = np.ones((hp, wp), bool)
    frozen_np[1 : h - 1, 1 : w - 1] = (goal | obstacle)[1:-1, 1:-1]
    u = jax.device_put(jnp.asarray(u_np))
    frozen = jax.device_put(jnp.asarray(frozen_np))
    chunk = 100
    reps = 2 if q else 16000

    def programs(reps):
        @jax.jit
        def run(u, it0):
            def body(i, u):
                u, _ = ps.sweep_chunk.__wrapped__(
                    u, frozen, it0 + i * chunk, chunk, interp)
                return u

            u = jax.lax.fori_loop(0, reps, body, u)
            # Device-side checksum: the timing barrier fetches 4 bytes that
            # depend on every cell, instead of a ~1 MB full-grid D2H through
            # the ~14 MB/s tunnel (which cost the driver bench ~4% of the
            # probe rate in round 2 — VERDICT r2 #4).
            return u, jnp.sum(u)

        @jax.jit
        def run_xla(u, it0):
            def body(i, u):
                def inner(k, u):
                    un, us = jnp.roll(u, 1, 0), jnp.roll(u, -1, 0)
                    uw, ue = jnp.roll(u, 1, 1), jnp.roll(u, -1, 1)
                    m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
                    s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
                    val = (m + jnp.log(s)) - np.float32(np.log(4.0))
                    row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
                    col = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
                    upd = (((row + col) % 2) != ((it0 + i * chunk + k) % 2)) & ~frozen
                    return jnp.where(upd, val, u)

                return jax.lax.fori_loop(0, chunk, inner, u)

            u = jax.lax.fori_loop(0, reps, body, u)
            return u, jnp.sum(u)

        return run, run_xla

    # Exactness gate at a short length (cheap XLA twin), timing at full.
    gate_reps = 2
    run_g, run_xla_g = programs(gate_reps)
    p = np.asarray(run_g(u, jnp.int32(0))[0])
    x = np.asarray(run_xla_g(u, jnp.int32(0))[0])
    max_diff = float(np.max(np.abs(p - x)))
    assert max_diff <= 1e-4, max_diff

    run, _ = programs(reps)
    u_warm, cs = run(u, jnp.int32(0))
    float(cs)  # warm/compile barrier (scalar, data-dependent on all cells)
    t0 = time.perf_counter()
    _, cs = run(u_warm, jnp.int32(reps * chunk))
    checksum = float(cs)
    dt = time.perf_counter() - t0
    sweeps = reps * chunk
    return dict(grid=f"{h}x{w}", sweeps_per_s=round(sweeps / dt),
                g_updates_per_s=round((h - 2) * (w - 2) / 2 * sweeps / dt / 1e9, 2),
                # The kernel sweeps the whole padded array each sweep
                # (masked): padded visits/s against the ~110 G visits/s VPU
                # ceiling (docs/BENCH_NOTES.md probe3) is the hardware-
                # utilization (MFU) figure; interior cell-updates/s is the
                # useful-work figure.
                g_padded_visits_per_s=round(hp * wp * sweeps / dt / 1e9, 2),
                mfu_vs_110g=round(hp * wp * sweeps / dt / 110e9, 3),
                max_abs_diff_vs_xla=max_diff, checksum=checksum)


@experiment("maze-solve", "Solve-to-convergence (full protocol)")
def maze_solve(q):
    """Full solve protocol (staggered checks, min-iterations guard) on the
    maze fixture through the VMEM kernel — one device program."""
    from epic_tpu import maps
    import epic_tpu
    from epic_tpu.solver import pallas_sweep as ps

    ref = maps.reference_map_path("maze.png")
    img = maps.load_png(ref) if ref is not None else maps.random_obstacles(
        482, 482, density=0.1, seed=0)
    eps = 1e-1 if q else 1e-3
    out = ps.solve(epic_tpu.from_occupancy_image(img, epsilon=eps))  # warm
    iters = int(out.iteration)
    # One solve is ~0.2 s of device work — repeat so the timed region
    # carries >= 2 s (round-2's single-dispatch 312k sweeps/s figure sat
    # inside dispatch jitter). States pre-built + staged so the per-rep
    # H2D upload stays out of the timed window.
    reps = 1 if q else 12
    states = [epic_tpu.from_occupancy_image(img, epsilon=eps)
              for _ in range(reps)]
    _stage(*states)
    t0 = time.perf_counter()
    for st in states:
        out = ps.solve(st)
        assert int(out.iteration) == iters  # per-solve D2H sync
    dt = (time.perf_counter() - t0) / reps
    h, w = img.shape
    assert iters % 100 == 1
    return dict(grid=f"{h}x{w}", iterations=iters, converged=bool(out.converged),
                solve_wall_s=round(dt, 4), reps=reps,
                sweeps_per_s=round(iters / dt),
                g_updates_per_s=round((h - 2) * (w - 2) / 2 * iters / dt / 1e9, 2))


def _biggrid_prep(size_h, size_w, chunk_depth=16):
    from epic_tpu.solver import pallas_biggrid as bg

    u, locked = _grid_np(size_h, size_w)
    g = bg.pad_state(_state(u, locked), chunk_depth)
    return g


@experiment("biggrid-update", "Ping-pong cycle kernel")
def biggrid_update(q, sizes=(2048, 4096, 8192, 16384)):
    """Open chunk chains (anytime update_n) through the banded ping-pong
    cycle kernel, ONE dispatch (probe34 structure; n_chunks capped — very
    long chains overflow the SMEM delta vector); gate = bit-equality vs
    chained manual-DMA chunks."""
    import jax.numpy as jnp

    from epic_tpu.solver import pallas_biggrid as bg
    from epic_tpu.solver import pallas_cycle as pc

    interp = _interpret()
    if q:
        sizes = (256,)
    rows = []
    for size in sizes:
        g = _biggrid_prep(size, size)
        k, band = g.k, g.band
        # Gate: a 2-chunk cycle == two chained DMA chunks, bit-equal.
        a, b, _ = pc.sweep_cycle(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                                 2, k, band, interp)
        g2 = _biggrid_prep(size, size)
        u_ref, _ = bg.sweep_chunk_dma(g2.u, g2.frozen, jnp.int32(0), k, band,
                                      k, interp)
        u_ref, _ = bg.sweep_chunk_dma(u_ref, g2.frozen, jnp.int32(k), k, band,
                                      k, interp)
        assert _device_equal(a, u_ref), size
        del a, b, g2, u_ref
        # Timed: one cycle dispatch of ~60 G updates (capped chunk count).
        target = 1e6 if q else 60e9
        n_chunks = min(750, max(2, int(target / (size * size / 2 * k))))
        g = _biggrid_prep(size, size)
        a, b, _ = pc.sweep_cycle(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                                 n_chunks, k, band, interp)
        final = b if n_chunks % 2 else a
        _ = np.asarray(final[0, :128])  # warm barrier
        del a, b, final
        g = _biggrid_prep(size, size)
        _stage(g)
        t0 = time.perf_counter()
        a, b, _ = pc.sweep_cycle(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                                 n_chunks, k, band, interp)
        final = b if n_chunks % 2 else a
        checksum = float(np.asarray(final[0, :128]).sum(dtype=np.float64))
        dt = time.perf_counter() - t0
        sweeps = n_chunks * k
        rows.append(dict(size=size, band=band, k=k, sweeps=sweeps,
                         g_updates_per_s=round(size * size / 2 * sweeps / dt / 1e9, 2),
                         checksum=checksum))
    return dict(rows=rows)


@experiment("biggrid-solve", "Solve-to-convergence (full protocol)")
def biggrid_solve(q, sizes=((2048, 12000), (4096, 10000), (8192, 4000))):
    """Whole-cycle in-kernel-check banded solve (one dispatch per stagger
    cycle); capped so one while-loop dispatch stays under the remote-worker
    watchdog. Reports iterations + rate; iteration count must be ≡ 1 mod
    stagger on a converged exit. Entries may carry a third element — the
    chunk depth k. (k=20 would divide stagger 100 into exactly 5 chunks,
    killing the per-cycle 4-sweep remainder the k=16 layout pays, but the
    check-cycle kernel slices at k-row offsets and Mosaic cannot prove
    8-divisibility for k=20 — compile fails; the remainder costs ~1-2%
    in-program, so k stays 16.)"""
    from epic_tpu.solver import pallas_biggrid as bg

    interp = _interpret()
    if q:
        sizes = ((256, 600),)
    rows = []
    for entry in sizes:
        size, cap = entry[0], entry[1]
        depth = entry[2] if len(entry) > 2 else 16
        u, locked = _grid_np(size, size)
        st = _state(u, locked)
        g = bg.pad_state(st, depth)
        out = bg._solve_banded(g.u, g.frozen, st.epsilon, 100, cap, g.band,
                               g.k, interp, size, size)
        iters = int(out[1])
        best = None
        for _ in range(1 if q else 2):  # best-of-2 (tunnel dispatch jitter)
            st = _state(u, locked)
            g = bg.pad_state(st, depth)
            _stage(g)
            t0 = time.perf_counter()
            uu, it, delta, conv = bg._solve_banded(
                g.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, interp,
                size, size)
            # Scalar loop outputs are the completion barrier: a full-grid
            # D2H rides the ~14 MB/s tunnel and would dominate the timing
            # (it cost the first r3 battery a bogus 2.5x solve slowdown).
            checksum = float(np.asarray(delta)) + int(np.asarray(it))
            dt = time.perf_counter() - t0
            it = int(it)
            assert it == iters
            if best is None or dt < best:
                best = dt
        assert (not bool(conv)) or it % 100 == 1
        rows.append(dict(size=size, band=g.band, k=g.k, iterations=it,
                         converged=bool(conv),
                         delta=float(np.asarray(delta)),
                         g_updates_per_s=round(size * size / 2 * it / best / 1e9, 2),
                         checksum=checksum))
    return dict(rows=rows)


@experiment("biggrid-converge", "Solve-to-convergence (full protocol)")
def biggrid_converge(q, size=4096, segment=10000, cap=200_000):
    """A CONVERGED mega-grid solve (VERDICT r3 item 5: the
    solve-to-convergence contract, harmonic_cpu.cpp:158-173, deserves a
    driver-visible converged row — round 3's 4096² solve sat at delta
    0.10 vs eps 0.01 at its 10k-iteration rate cap). Runs
    pallas_biggrid.solve_segments: the SAME compiled while loop as
    solve(), resumed across watchdog-safe dispatch segments
    (bit-identical trajectories — tests/test_pallas_biggrid.py)."""
    from epic_tpu.solver import pallas_biggrid as bg

    interp = _interpret()
    if q:
        size, segment, cap = 128, 60, 4000
    u, locked = _grid_np(size, size)
    out = bg.solve_segments(_state(u, locked), max_iterations=cap,
                            segment_iterations=segment,
                            interpret=interp)  # warm (segment programs)
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = bg.solve_segments(st, max_iterations=cap,
                            segment_iterations=segment, interpret=interp)
    iters = int(out.iteration)  # host-synced per segment already
    dt = time.perf_counter() - t0
    assert bool(out.converged), (iters, float(out.delta))
    assert iters % 100 == 1 or q
    return dict(size=size, iterations=iters, converged=bool(out.converged),
                delta=float(out.delta), solve_wall_s=round(dt, 1),
                segment_iterations=segment,
                g_updates_per_s=round(size * size / 2 * iters / dt / 1e9, 2))


@experiment("tiled-update", "Wide grids: 2D-tiled DMA chunks")
def tiled_update(q, sizes=((16384, 16384), (32768, 16384))):
    """Wide-grid regime: the 2D-tiled cycle kernel chunk chain; gate =
    bit-equality vs the tiled DMA chunk."""
    import jax.numpy as jnp

    from epic_tpu.solver import pallas_cycle as pc
    from epic_tpu.solver import pallas_tiled2d as t2

    interp = _interpret()
    if q:
        sizes = ((256, 384),)
    rows = []
    for idx, (hh, ww) in enumerate(sizes):
        import gc

        u, locked = _grid_np(hh, ww)
        g = t2.pad_state(_state(u, locked))
        k, band, wt = g.k, g.band, g.wt
        if idx == 0:
            # Gate on the first (smallest) size only: the full-size gate at
            # 32768x16384 holds ~14 GB of padded twins (int32 frozen doubles
            # every state) and OOMed the first r3 battery; the kernel code
            # is shape-generic and stays gated at the 16384² layout.
            a, b, _ = pc.sweep_cycle_tiled(g.u, jnp.copy(g.u), g.frozen,
                                           jnp.int32(0), 2, k, band, wt,
                                           interp)
            g2 = t2.pad_state(_state(u, locked))
            u_ref, _ = t2.sweep_chunk_tiled(g2.u, g2.frozen, jnp.int32(0), k,
                                            band, k, wt, interp)
            u_ref, _ = t2.sweep_chunk_tiled(u_ref, g2.frozen, jnp.int32(k), k,
                                            band, k, wt, interp)
            assert _device_equal(a, u_ref), (hh, ww)
            del a, b, g2, u_ref
            gc.collect()
            g = t2.pad_state(_state(u, locked))  # gate donated g.u
        target = 1e6 if q else 60e9
        n_chunks = min(750, max(2, int(target / (hh * ww / 2 * k))))
        a, b, _ = pc.sweep_cycle_tiled(g.u, jnp.copy(g.u), g.frozen,
                                       jnp.int32(0), n_chunks, k, band, wt,
                                       interp)
        final = b if n_chunks % 2 else a
        _ = np.asarray(final[0, :128])  # warm barrier
        del a, b, final, g
        gc.collect()
        g = t2.pad_state(_state(u, locked))
        _stage(g)
        t0 = time.perf_counter()
        a, b, _ = pc.sweep_cycle_tiled(g.u, jnp.copy(g.u), g.frozen,
                                       jnp.int32(0), n_chunks, k, band, wt,
                                       interp)
        final = b if n_chunks % 2 else a
        checksum = float(np.asarray(final[0, :128]).sum(dtype=np.float64))
        dt = time.perf_counter() - t0
        sweeps = n_chunks * k
        rows.append(dict(size=f"{hh}x{ww}", band=band, k=k, wt=wt,
                         g_updates_per_s=round(hh * ww / 2 * sweeps / dt / 1e9, 2),
                         checksum=checksum))
    return dict(rows=rows)


@experiment("tiled-solve", "Solve-to-convergence (full protocol)")
def tiled_solve(q, sizes=((16384, 16384, 2500),)):
    """Whole-cycle in-kernel-check TILED solve at the wide-grid regime.
    Entries may carry a fourth element: the chunk depth k."""
    from epic_tpu.solver import pallas_tiled2d as t2

    interp = _interpret()
    if q:
        sizes = ((256, 384, 600),)
    rows = []
    for entry in sizes:
        hh, ww, cap = entry[0], entry[1], entry[2]
        depth = entry[3] if len(entry) > 3 else 16
        u, locked = _grid_np(hh, ww)
        st = _state(u, locked)
        g = t2.pad_state(st, depth)
        out = t2._solve_tiled(g.u, g.frozen, st.epsilon, 100, cap, g.band,
                              g.k, g.wt, interp, hh, ww)
        iters = int(out[1])
        best = None
        for _ in range(1 if q else 2):  # best-of-2 (tunnel dispatch jitter)
            st = _state(u, locked)
            g = t2.pad_state(st, depth)
            _stage(g)
            t0 = time.perf_counter()
            uu, it, delta, conv = t2._solve_tiled(
                g.u, g.frozen, st.epsilon, 100, cap, g.band, g.k, g.wt,
                interp, hh, ww)
            checksum = float(np.asarray(delta)) + int(np.asarray(it))
            dt = time.perf_counter() - t0
            it = int(it)
            assert it == iters
            if best is None or dt < best:
                best = dt
        rows.append(dict(size=f"{hh}x{ww}", band=g.band, k=g.k, wt=g.wt,
                         iterations=it, converged=bool(conv),
                         g_updates_per_s=round(hh * ww / 2 * it / best / 1e9, 2),
                         checksum=checksum))
    return dict(rows=rows)


@experiment("tiled-converge", "Solve-to-convergence (full protocol)")
def tiled_converge(q, size=16384, segment=5000, cap=200_000):
    """The full 16k x 16k BASELINE mega-grid solved TO CONVERGENCE at the
    tiled kernel's full rate via t2.solve_segments (bit-identical to the
    single-dispatch solve; each ~5000-iteration segment holds ~16 s of
    device work — under the remote watchdog). Round-3 could only converge
    this shape through host_solve's per-cycle dispatches (386 s)."""
    from epic_tpu.solver import pallas_tiled2d as t2

    interp = _interpret()
    if q:
        size, segment, cap = 384, 120, 4000
    u, locked = _grid_np(size, size)
    # Warm the segment program (one short capped run — same jaxpr).
    out = t2.solve_segments(_state(u, locked), max_iterations=min(segment, cap),
                            segment_iterations=segment, interpret=interp)
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = t2.solve_segments(st, max_iterations=cap,
                            segment_iterations=segment, interpret=interp)
    checksum = float(out.delta) + int(out.iteration)
    dt = time.perf_counter() - t0
    iters = int(out.iteration)
    assert bool(out.converged) or q, (iters, float(out.delta))
    return dict(size=size, iterations=iters, converged=bool(out.converged),
                delta=float(out.delta), solve_wall_s=round(dt, 1),
                segment_iterations=segment,
                g_updates_per_s=round(size * size / 2 * iters / dt / 1e9, 2),
                checksum=checksum)


def _batch_np(lanes, size, seed=0):
    rng = np.random.default_rng(seed)
    u = np.full((lanes, size, size), -1e6, np.float32)
    locked = rng.random((lanes, size, size)) < 0.1
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    gy = rng.integers(1, size - 1, lanes)
    gx = rng.integers(1, size - 1, lanes)
    u[np.arange(lanes), gy, gx] = 0.0
    locked[np.arange(lanes), gy, gx] = True
    return u, locked


def _batched_staged_run(lanes, size, seed, eps=1e-2, cap=2000):
    """Pre-stage a scenario collage on device and time the compiled
    lockstep solve only (production keeps scenarios device-resident; the
    tunnel moves 41/14 MB/s H2D/D2H, so un-staged timing measures the
    tunnel — docs/BENCH_NOTES.md)."""
    import jax
    import jax.numpy as jnp

    from epic_tpu.solver import pallas_batched as pb

    u, locked = _batch_np(lanes, size, seed)
    u_c, frozen_c, meta = pb.pad_batch(u, locked)
    u_c = jax.device_put(u_c)
    frozen_c = jax.device_put(frozen_c)
    _stage(u_c, frozen_c)  # readback barrier: block_until_ready can
    # return before the tunnelled H2D completes
    gpr, gpc, nb = meta["gpr"], meta["gpc"], meta["n_blocks"]
    retired0 = np.zeros(nb * gpr * gpc, bool)
    retired0[lanes:] = True
    m_max = max(size, size)

    def run():
        out = pb._solve_collage_device(
            u_c, frozen_c, jnp.asarray(retired0), jnp.float32(eps), 100,
            cap, m_max, nb, gpr, gpc, meta["hp8"], meta["wp"],
            meta["block_rows"], _interpret())
        u_out, retired, iters, deltas, _ = out
        # Completion barrier on the small, loop-dependent outputs.
        return u_out, np.asarray(iters)[:lanes], np.asarray(retired)[:lanes]

    run()  # compile + warm
    t0 = time.perf_counter()
    u_out, iters, conv = run()
    dt = time.perf_counter() - t0
    return u_out, iters, conv, dt, meta


@experiment("batched-solve", "Batched scenarios (BASELINE config 3)")
def batched_solve(q, lanes=4096, size=128):
    """Device-resident lockstep batch solve: B maze-class lanes, per-block
    retirement gating; solves/s with inputs pre-staged on device. Gate:
    one sampled lane re-solved solo through the XLA path."""
    from epic_tpu.solver import core as score
    from epic_tpu.solver import pallas_batched as pb

    if q:
        lanes, size = 8, 32
    u_out, iters, conv, dt, meta = _batched_staged_run(lanes, size, seed=1)
    assert conv.all(), f"{(~conv).sum()} lanes failed to converge"
    # Exactness gate: lane 0 vs a solo XLA solve of the same scenario.
    u, locked = _batch_np(lanes, size, seed=1)
    solo = score.solve(_state(u[0], locked[0]))
    u0 = pb.unstack(u_out, meta)[0]
    lane_diff = float(np.max(np.abs(u0 - np.asarray(solo.u))))
    assert int(solo.iteration) == int(iters[0]), (int(solo.iteration),
                                                  int(iters[0]))
    assert lane_diff <= 1e-4, lane_diff
    return dict(lanes=lanes, size=size, solves_per_s=round(lanes / dt),
                mean_iterations=float(np.mean(iters)),
                lane0_max_abs_diff_vs_xla=lane_diff,
                batch_wall_s=round(dt, 2), staged=True)


@experiment("batched-goals", "Batched scenarios (BASELINE config 3)")
def batched_goals(q, lanes=4096, size=128):
    """Distinct-goal lanes on ONE shared base map (SURVEY §7 Phase 2's
    goal-mask axis; VERDICT r3 item 8): the collage is built ON DEVICE
    from one staged base grid + a [B, 1, 2] goal-index array, so the
    upload is ~(size² + 8B) bytes instead of B full grids (~0.5 GB at
    4096x128² through the ~41 MB/s tunnel). Gate: the built collage is
    BIT-equal to pad_batch over the host-materialized batch."""
    import jax
    import jax.numpy as jnp

    from epic_tpu import maps
    from epic_tpu.solver import batched, pallas_batched as pb

    if q:
        lanes, size = 8, 32
    img = maps.random_obstacles(size, size, density=0.12, seed=5)
    rng = np.random.default_rng(5)
    free_y, free_x = np.nonzero(img != 0)
    picks = rng.choice(len(free_y), size=lanes, replace=True)
    goal_xy = np.stack([free_x[picks], free_y[picks]], axis=-1)[:, None, :]
    base_u = np.full(img.shape, np.float32(-1e6))
    base_locked = img == 0

    # Gate at a small lane count: device-built collage == host-built.
    gate_n = min(64, lanes)
    u_h, l_h = batched.batch_from_goal_sets(
        img, [[tuple(goal_xy[i, 0])] for i in range(gate_n)])
    u_ref, f_ref, _ = pb.pad_batch(np.asarray(u_h), np.asarray(l_h))
    u_dev, f_dev, _ = pb.make_goal_batch(base_u, base_locked,
                                         goal_xy[:gate_n])
    assert _device_equal(u_dev, u_ref)
    assert _device_equal(f_dev, jnp.asarray(np.asarray(f_ref)))

    # Stage ONLY the base grid + indices, then build + solve, leaving the
    # collage device-resident (production extracts per-lane paths from
    # device gathers; a full-collage D2H rides the ~14 MB/s tunnel and
    # would measure the transport). Completion barrier = the small
    # loop-dependent iters/retired outputs, as in _batched_staged_run.
    base_u_d = jnp.asarray(base_u)
    base_l_d = jnp.asarray(base_locked)
    gxy_d = jnp.asarray(goal_xy, jnp.int32)
    meta = pb.batch_meta(lanes, size, size)
    gpr, gpc, nb = meta["gpr"], meta["gpc"], meta["n_blocks"]
    retired0 = np.zeros(nb * gpr * gpc, bool)
    retired0[lanes:] = True

    def run():
        u_c, f_c, _ = pb.make_goal_batch(base_u_d, base_l_d, gxy_d)
        # cap 8000: randomly-placed goals make a long convergence tail
        # (the first run saw 12/4096 lanes still over eps at 2000).
        out = pb._solve_collage_device(
            u_c, f_c, jnp.asarray(retired0), jnp.float32(1e-2), 100,
            8000, size, nb, gpr, gpc, meta["hp8"], meta["wp"],
            meta["block_rows"], _interpret())
        u_out, retired, iters, deltas, _ = out
        return u_out, np.asarray(iters)[:lanes], np.asarray(retired)[:lanes]

    run()  # compile + warm
    _stage(base_u_d, gxy_d)
    float(jnp.sum(base_l_d.astype(jnp.float32)[0]))
    t0 = time.perf_counter()
    u_out, iters, conv = run()
    dt = time.perf_counter() - t0
    assert conv.all(), f"{(~conv).sum()} lanes failed to converge"
    return dict(lanes=lanes, size=size, solves_per_s=round(lanes / dt),
                mean_iterations=float(np.mean(iters)),
                batch_wall_s=round(dt, 2), upload="base+indices")


@experiment("batched-map", "Batched scenarios (BASELINE config 3)")
def batched_map(q, combos=((1024, 64), (4096, 64), (1024, 128), (4096, 128),
                           (256, 256), (1024, 256))):
    """Lane-count x grid-size regime map for the batched solver (VERDICT r2
    #9): when does batching beat the big-grid collage? All runs staged."""
    if q:
        combos = ((8, 32), (16, 32))
    rows = []
    for lanes, size in combos:
        _, iters, conv, dt, _ = _batched_staged_run(lanes, size, seed=0)
        mean_it = float(np.mean(iters))
        rows.append(dict(lanes=lanes, size=size,
                         solves_per_s=round(lanes / dt),
                         fraction_converged=float(np.mean(conv)),
                         g_updates_per_s=round(
                             lanes * (size - 2) ** 2 / 2 * mean_it / dt / 1e9, 2),
                         mean_iterations=mean_it, batch_wall_s=round(dt, 2)))
    return dict(rows=rows)


@experiment("solve-body-iso", "Solve-to-convergence (full protocol)")
def solve_body_iso(q, size=4096, cycles=100):
    """Isolate the banded solve's per-cycle body (check-cycle kernel + rem
    chunk + fill twin) from the while/cond protocol around it: run the
    exact body in a fori loop, no convergence logic. The gap between this
    rate and biggrid-solve's is the while_loop/cond/select cost; the gap
    between this and biggrid-update's is the structural cost of the fold
    (u1 writeback + fill twin + remainder chunk)."""
    import functools
    import jax
    import jax.numpy as jnp

    from epic_tpu import constants as Cc
    from epic_tpu.solver import pallas_biggrid as bg
    from epic_tpu.solver import pallas_cycle as pc

    interp = _interpret()
    if q:
        size, cycles = 256, 3
    u, locked = _grid_np(size, size)
    st = _state(u, locked)
    g = bg.pad_state(st)
    band, k = g.band, g.k
    n_cycle, rem = divmod(100, k)

    @functools.partial(jax.jit, static_argnames=())
    def run(u_pad, frozen):
        def body(i, carry):
            u_pad, it = carry
            alt = jnp.full_like(u_pad, jnp.float32(Cc.LOG_SPACE_OBSTACLE))
            a, b, u1, deltas = pc.sweep_cycle_check.__wrapped__(
                u_pad, alt, frozen, it, n_cycle, k, band, interp)
            u_end = b if n_cycle % 2 else a
            it = it + n_cycle * k
            if rem:
                u_end, _ = bg.sweep_chunk_dma.__wrapped__(
                    u_end, frozen, it, rem, band, k, interp)
                it = it + rem
            return u_end, it

        u_pad, it = jax.lax.fori_loop(0, cycles, body,
                                      (u_pad, jnp.int32(0)))
        return u_pad, it, jnp.sum(u_pad)

    _, it, cs = run(g.u, g.frozen)
    float(cs)  # warm barrier
    g = bg.pad_state(st)
    _stage(g)
    t0 = time.perf_counter()
    _, it, cs = run(g.u, g.frozen)
    checksum = float(cs)
    dt = time.perf_counter() - t0
    sweeps = cycles * 100
    return dict(size=size, band=band, k=k, cycles=cycles,
                g_updates_per_s=round(size * size / 2 * sweeps / dt / 1e9, 2),
                checksum=checksum)


# ---------------------------------------------------------------------------
# 3D experiments
# ---------------------------------------------------------------------------


@experiment("vol-update", "Big volumes (plane-banded DMA chunks)")
def vol_update(q, shape=(256, 256, 256), n_chunks=512, reps=3,
               prod_steps=1024):
    """3D ping-pong cycle kernel at 256³ — the kernel headline: ``reps``
    512-chunk cycles inside ONE program (jitted fori, biggrid-update's
    structure — per-dispatch tunnel latency is ~0.5 s, so multi-dispatch
    chains measure the tunnel, not the kernel). Gate = bit-equality vs
    chained DMA chunks. Also reports the PRODUCTION rate through
    b3.update_n(prod_steps) — pad/unpad + one capped cycle dispatch —
    which is what planner ticks actually get."""
    import functools

    import jax
    import jax.numpy as jnp

    from epic_tpu.solver import pallas_biggrid3d as b3
    from epic_tpu.solver import pallas_cycle as pc

    interp = _interpret()
    if q:
        shape, n_chunks, reps, prod_steps = (16, 24, 32), 4, 2, 8
    u, locked = _vol_np(*shape)
    st = _state(u, locked)
    g = b3.pad_state(st)
    band, k, hp = g.band, g.k, g.hp
    # Gate: a 2-chunk cycle == two chained DMA chunks, bit-equal.
    a, b, _ = pc.sweep_cycle3d(g.u, jnp.copy(g.u), g.frozen, jnp.int32(0),
                               2, k, band, hp, interp)
    g2 = b3.pad_state(_state(u, locked))
    u_ref, _ = b3.sweep_chunk_dma(g2.u, g2.frozen, jnp.int32(0), k, band, k,
                                  hp, interp)
    u_ref, _ = b3.sweep_chunk_dma(u_ref, g2.frozen, jnp.int32(k), k, band, k,
                                  hp, interp)
    assert _device_equal(a, u_ref), shape
    del a, b, g2, u_ref

    @functools.partial(jax.jit, static_argnames=("r",))
    def run(u0, u1, frozen, r):
        def body(i, carry):
            ua, ub = carry
            a, b, _ = pc.sweep_cycle3d.__wrapped__(
                ua, ub, frozen, i * n_chunks * k, n_chunks, k, band, hp,
                interp)
            return (b, a) if n_chunks % 2 else (a, b)

        ua, ub = jax.lax.fori_loop(0, r, body, (u0, u1))
        return ua, jnp.sum(ua[:128, :128])

    g = b3.pad_state(_state(u, locked))
    _, cs = run(g.u, jnp.copy(g.u), g.frozen, reps)
    float(cs)  # warm barrier
    g = b3.pad_state(_state(u, locked))
    _stage(g)
    t0 = time.perf_counter()
    _, cs = run(g.u, jnp.copy(g.u), g.frozen, reps)
    checksum = float(cs)
    dt = time.perf_counter() - t0
    cells = int(np.prod(shape))
    sweeps = reps * n_chunks * k
    res = dict(shape="x".join(map(str, shape)), sweeps=sweeps,
               band=band, k=k,
               g_updates_per_s=round(cells / 2 * sweeps / dt / 1e9, 2),
               checksum=checksum)
    # Production surface (cold): update_n (pad + capped cycle chain +
    # unpad per call).
    st = _state(u, locked)
    out = b3.update_n(st, prod_steps)  # warm
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = b3.update_n(st, prod_steps)
    res["prod_checksum"] = float(out.delta)
    dt = time.perf_counter() - t0
    res["prod_steps"] = prod_steps
    res["prod_g_updates_per_s"] = round(cells / 2 * prod_steps / dt / 1e9, 2)

    # Production surface (warm): VolumePlanner anytime ticks with the
    # padded-buffer cache resident across ticks (VERDICT r3 item 3 — the
    # service tick must run within ~2% of the kernel rate).
    from epic_tpu.planner3d import VolumePlanner, VolumePlannerConfig

    pl3 = VolumePlanner(VolumePlannerConfig(epsilon=1e-2))
    pl3.init(shape[2], shape[1], shape[0])
    occ = np.where(locked, np.int8(100), np.int8(0))
    occ[tuple(np.argwhere(u == 0.0)[0])] = 0
    pl3.update_occupancy(occ)
    gz, gy, gx = [int(v) for v in np.argwhere(u == 0.0)[0]]
    pl3.add_goals([(gx, gy, gz)])
    tick = max(1, prod_steps // 8)
    pl3.update(tick)  # warm: builds the pad cache + compiles the tick
    pl3.update(tick)
    float(np.asarray(pl3.state.delta))
    t0 = time.perf_counter()
    for _ in range(8):
        pl3.update(tick)
    res["planner_tick_checksum"] = float(np.asarray(pl3.state.delta))
    dt = time.perf_counter() - t0
    res["planner_g_updates_per_s"] = round(
        cells / 2 * 8 * tick / dt / 1e9, 2)

    # Matched-granularity tick (VERDICT r3 item 3): tick == prod_steps
    # puts one FULL 512-chunk cycle per dispatch — the same dispatch
    # granularity as the kernel headline above. The residual tax of the
    # small-tick row is cycle-length amortization (64 chunks/dispatch at
    # tick=128), not planner overhead.
    pl3.update(prod_steps)  # warm the big-tick program
    float(np.asarray(pl3.state.delta))
    t0 = time.perf_counter()
    for _ in range(3):
        pl3.update(prod_steps)
    res["planner_bigtick_checksum"] = float(np.asarray(pl3.state.delta))
    dt = time.perf_counter() - t0
    res["planner_bigtick_g_updates_per_s"] = round(
        cells / 2 * 3 * prod_steps / dt / 1e9, 2)
    return res


@experiment("vol-solve", "Big volumes (plane-banded DMA chunks)")
def vol_solve(q, shape=(256, 256, 256), cap=2000):
    """3D solve protocol at 256^3 (check-chunk + cycle-fill structure —
    probe51 showed the whole-cycle fold loses in 3D)."""
    from epic_tpu.solver import pallas_biggrid3d as b3

    if q:
        shape, cap = (16, 24, 32), 400
    u, locked = _vol_np(*shape)
    out = b3.solve(_state(u, locked), max_iterations=cap)  # warm
    iters = int(out.iteration)
    # One solve is ~1 s of device work — repeat so the timed region
    # carries >= 2 s (dispatch jitter through the tunnel cost the first
    # r3 run a bogus 10.75-vs-16 G read on a single solve).
    reps = 1 if q else 3
    states = [_state(u, locked) for _ in range(reps)]
    _stage(*states)
    t0 = time.perf_counter()
    for st in states:
        out = b3.solve(st, max_iterations=cap)
        assert int(out.iteration) == iters  # per-solve D2H sync
    checksum = float(out.delta) + int(out.iteration)
    dt = (time.perf_counter() - t0) / reps
    cells = np.prod(shape)
    return dict(shape="x".join(map(str, shape)), iterations=iters, reps=reps,
                converged=bool(out.converged),
                g_updates_per_s=round(cells / 2 * iters / dt / 1e9, 2),
                checksum=checksum)


@experiment("wideplane-update", "Wide-plane volumes (z-band x y x x tiles)")
def wideplane_update(q, shape=(32, 2048, 2048), steps=1024):
    """Wide-plane regime (padded plane > biggrid3d's scoped-VMEM wall):
    three rows decomposing where the time goes —

    - ``kernel``: the DMA chunk chain, jitted fori over sweep_chunk_tiled3d
      in ONE program on pre-padded donated buffers (probe43's structure —
      the 19.5 G headline);
    - ``cycle``: the ping-pong cycle kernel, one dispatch, pre-padded
      buffers (probe44 found it ties the chunk chain in-program);
    - ``prod``: t3.update_n(steps) — what planner ticks get: pad_state +
      capped cycle chain + unpad, each pad/unpad op its own tunnel
      dispatch."""
    import functools

    import jax
    import jax.numpy as jnp

    from epic_tpu.solver import pallas_cycle as pc
    from epic_tpu.solver import pallas_tiled3d as t3

    interp = _interpret()
    if q:
        shape, steps = (8, 256, 512), 4
    u, locked = _vol_np(*shape)
    st = _state(u, locked)
    g = t3.pad_state(st)
    band, k, yt, wt, hp2 = g.band, g.k, g.yt, g.wt, g.hp2
    n_chunks = steps // k
    cells = int(np.prod(shape))
    res = dict(shape="x".join(map(str, shape)), steps=steps, band=band,
               k=k, yt=yt, wt=wt)

    @functools.partial(jax.jit, static_argnames=("nc",), donate_argnums=(0,))
    def run_chunks(u_pad, frozen, nc):
        def body(i, u):
            u, _ = t3.sweep_chunk_tiled3d.__wrapped__(
                u, frozen, i * k, k, band, k, yt, wt, hp2, interp)
            return u

        u_pad = jax.lax.fori_loop(0, nc, body, u_pad)
        return u_pad, jnp.sum(u_pad[:128, :128])

    _, cs = run_chunks(g.u, g.frozen, n_chunks)
    float(cs)  # warm barrier
    g = t3.pad_state(_state(u, locked))
    _stage(g)
    t0 = time.perf_counter()
    _, cs = run_chunks(g.u, g.frozen, n_chunks)
    res["kernel_checksum"] = float(cs)
    dt = time.perf_counter() - t0
    res["kernel_g_updates_per_s"] = round(cells / 2 * steps / dt / 1e9, 2)

    # Cycle kernel, one dispatch on pre-padded buffers.
    g = t3.pad_state(_state(u, locked))
    a, b, _ = pc.sweep_cycle_tiled3d(g.u, jnp.copy(g.u), g.frozen,
                                     jnp.int32(0), n_chunks, k, band, yt,
                                     wt, hp2, interp)
    final = b if n_chunks % 2 else a
    _ = np.asarray(final[0, :128])  # warm barrier
    del a, b, final
    g = t3.pad_state(_state(u, locked))
    _stage(g)
    t0 = time.perf_counter()
    a, b, _ = pc.sweep_cycle_tiled3d(g.u, jnp.copy(g.u), g.frozen,
                                     jnp.int32(0), n_chunks, k, band, yt,
                                     wt, hp2, interp)
    final = b if n_chunks % 2 else a
    res["cycle_checksum"] = float(np.asarray(final[0, :128]).sum(dtype=np.float64))
    dt = time.perf_counter() - t0
    res["cycle_g_updates_per_s"] = round(cells / 2 * steps / dt / 1e9, 2)
    del a, b, final, g

    # Production surface.
    st = _state(u, locked)
    out = t3.update_n(st, steps)  # warm
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = t3.update_n(st, steps)
    res["prod_checksum"] = float(out.delta)
    dt = time.perf_counter() - t0
    res["prod_g_updates_per_s"] = round(cells / 2 * steps / dt / 1e9, 2)
    return res


@experiment("wideplane-redscan", "Wide-plane volumes (z-band x y x x tiles)")
def wideplane_redscan(q, shape=(32, 2048, 2048), steps=1024):
    """Attack the wide-plane halo redundancy directly (VERDICT r4 item 4):
    scan slab layouts by EFFECTIVE redundancy (round-up-aware
    nb*ext_z/d * ny*yext/h * nx*wext/w), including y-guard depth hy=8 —
    _HY=16 is twice the deepest supported k (4), so halving it buys
    ~12% redundancy at the same scoped-VMEM budget. Every candidate is
    device-equality-gated against the production layout (chunks are
    elementwise-exact at ANY layout). Rows: rate + effective redundancy
    per candidate."""
    import functools

    import jax
    import jax.numpy as jnp

    from epic_tpu.solver import pallas_tiled3d as t3

    interp = _interpret()
    if q:
        shape, steps = (8, 256, 512), 4
    u, locked = _vol_np(*shape)
    d, h, w = shape
    cells = int(np.prod(shape))
    # (hy, band, k, yt, wt); None = production chooser under that hy.
    # yt=112/hy=8 mis-executes on the COMPILED path at this shape (device
    # equality caught it; the interpret path is exact — a Mosaic geometry
    # issue, not a semantics bug) and is excluded from the scan/chooser.
    cands = [(16, None, None, None, None),
             (8, 8, 2, 96, 1024),
             (8, 8, 2, 104, 1024)]
    if q:
        cands = [(16, None, None, None, None), (8, 4, 2, 32, 256)]
    rows = []
    ref_u = None
    old_hy = t3._HY
    try:
        for hy, band, k, yt, wt in cands:
            t3._HY = hy
            g = t3.pad_state(_state(u, locked), band=band, k=k, yt=yt,
                             wt=wt)
            b_, k_, yt_, wt_, hp2 = g.band, g.k, g.yt, g.wt, g.hp2
            wp = g.u.shape[1]
            nb = (g.u.shape[0] // hp2 - 2 * k_) // b_
            ny = (hp2 - 2 * hy) // yt_
            nx = (wp - 2 * t3._HX) // wt_
            red = ((nb * (b_ + 2 * k_)) / d
                   * (ny * (yt_ + 2 * hy)) / h
                   * (nx * (wt_ + 2 * t3._HX)) / w)
            n_chunks = max(1, steps // k_)

            @functools.partial(jax.jit, static_argnames=("nc",),
                               donate_argnums=(0,))
            def run_chunks(u_pad, frozen, nc, b_=b_, k_=k_, yt_=yt_,
                           wt_=wt_, hp2=hp2):
                def body(i, uu):
                    uu, _ = t3.sweep_chunk_tiled3d.__wrapped__(
                        uu, frozen, i * k_, k_, b_, k_, yt_, wt_, hp2,
                        interp)
                    return uu

                u_pad = jax.lax.fori_loop(0, nc, body, u_pad)
                return u_pad, jnp.sum(u_pad[:128, :128])

            out, cs = run_chunks(g.u, g.frozen, n_chunks)
            float(cs)  # warm barrier
            vol = t3.TiledVolume(u=out, frozen=g.frozen, depth=d, height=h,
                                 width=w, hp2=hp2, band=b_, k=k_, yt=yt_,
                                 wt=wt_)
            got = t3.unpad(vol)
            if ref_u is None:
                ref_u = got
                dmax = 0.0
            else:
                dmax = _device_max_abs_diff(got, ref_u)
                assert dmax == 0.0, (hy, b_, k_, yt_, wt_, dmax)
            del out, got, vol
            g = t3.pad_state(_state(u, locked), band=band, k=k, yt=yt,
                             wt=wt)
            _stage(g)
            t0 = time.perf_counter()
            out, cs = run_chunks(g.u, g.frozen, n_chunks)
            ck = float(cs)
            dt = time.perf_counter() - t0
            sweeps = n_chunks * k_
            rows.append(dict(
                hy=hy, band=b_, k=k_, yt=yt_, wt=wt_,
                eff_redundancy=round(red, 3),
                g_updates_per_s=round(cells / 2 * sweeps / dt / 1e9, 2),
                max_abs_diff_vs_prod=dmax, checksum=ck))
            del out, g
    finally:
        t3._HY = old_hy
    return dict(shape="x".join(map(str, shape)), steps=steps, rows=rows)


@experiment("wideplane-solve", "Wide-plane volumes (z-band x y x x tiles)")
def wideplane_solve(q, shape=(32, 2048, 2048), segment=500, cap=20_000):
    """Wide-plane 3D solve TO CONVERGENCE via segmented compiled
    while-loops (t3.solve_segments, bit-identical to solve() — the
    >= max(shape) floor of wide-plane volumes never fit one sub-watchdog
    dispatch, so round-3 could only report a rate-capped row)."""
    from epic_tpu.solver import pallas_tiled3d as t3

    if q:
        shape, segment, cap = (8, 256, 512), 100, 600
    u, locked = _vol_np(*shape)
    out = t3.solve_segments(_state(u, locked), max_iterations=cap,
                            segment_iterations=segment)  # warm
    iters = int(out.iteration)
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = t3.solve_segments(st, max_iterations=cap,
                            segment_iterations=segment)
    checksum = float(out.delta) + int(out.iteration)
    dt = time.perf_counter() - t0
    assert int(out.iteration) == iters
    assert bool(out.converged) or q, (iters, float(out.delta))
    cells = np.prod(shape)
    return dict(shape="x".join(map(str, shape)), iterations=iters,
                converged=bool(out.converged),
                segment_iterations=segment, solve_wall_s=round(dt, 1),
                g_updates_per_s=round(cells / 2 * iters / dt / 1e9, 2),
                checksum=checksum)


@experiment("tunnel-rates", "Tunnel transfer rates (measurement hazard)")
def tunnel_rates(q, mb=256):
    """H2D / D2H bandwidth through the tunnel (the numbers that set the
    staging discipline: round-2 measured 41/14 MB/s; the round-3 staging
    artifacts implied ~100 MB/s effective H2D — pin it)."""
    import jax
    import jax.numpy as jnp

    if q:
        mb = 2
    n = mb * 1024 * 1024 // 4
    x = np.random.default_rng(0).random(n, np.float32)
    # H2D: device_put + data-dependent readback barrier.
    jax.device_put(x[: 1024]).block_until_ready()  # warm the path
    t0 = time.perf_counter()
    d = jax.device_put(x)
    float(np.asarray(jnp.sum(d[:1])))  # tiny data-dependent barrier
    h2d = mb / (time.perf_counter() - t0)
    # D2H: full readback.
    t0 = time.perf_counter()
    back = np.asarray(d)
    d2h = mb / (time.perf_counter() - t0)
    assert back[0] == x[0] and back[-1] == x[-1]
    return dict(mb=mb, h2d_mb_per_s=round(h2d, 1), d2h_mb_per_s=round(d2h, 1))


# ---------------------------------------------------------------------------
# multi-chip composition (single chip: validates compile + rate of the
# shard_map + banded-DMA path; equivalence vs the unsharded kernel)
# ---------------------------------------------------------------------------


@experiment("sharded-banded", "Scaling across devices")
def sharded_banded(q, size=4096, steps=8192):
    """The beyond-VMEM per-shard Pallas path (shard_map + banded DMA kernel)
    on a 1x1 mesh over the real chip: proves the composition compiles and
    runs at big-grid rates on hardware; gate = equality vs the unsharded
    banded kernel."""
    import jax

    import epic_tpu
    from epic_tpu import maps
    from epic_tpu.parallel import make_mesh, sharded
    from epic_tpu.solver import pallas_biggrid as bg

    interp = _interpret()
    kern = "pallas_banded_interpret" if interp else "pallas_banded"
    if q:
        size, steps = 64, 16
    u, locked = _grid_np(size, size)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    out_s = sharded.update_n(_state(u, locked), steps, mesh, chunk_depth=16,
                             kernel=kern)
    out_b = bg.update_n(_state(u, locked), steps)
    d = _device_max_abs_diff(out_s.u, out_b.u)
    assert d == 0.0, d
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out_s = sharded.update_n(st, steps, mesh, chunk_depth=16,
                             kernel=kern)
    checksum = float(out_s.delta)  # scalar program output = barrier
    dt = time.perf_counter() - t0
    return dict(size=size, steps=steps, mesh="1x1", kernel=kern,
                max_abs_diff_vs_biggrid=d,
                g_updates_per_s=round(size * size / 2 * steps / dt / 1e9, 2),
                checksum=checksum)


@experiment("sharded-resident", "Scaling across devices")
def sharded_resident(q, sizes=((4096, 8192), (8192, 4096))):
    """The tile-pure resident shard layout (guard rows + 128-lane guard
    tiles, ping-pong aliased-HBM per-shard kernel — VERDICT r3 items 1/4)
    on a 1x1 mesh over the real chip, A/B against the banded shard path it
    replaces at the same shard width; gate = bit-equality between the two
    compositions (the virtual-mesh suite pins both to core). ``sizes`` is
    (size, steps) pairs: the 8192 row shows the guard-redundancy tax
    shrinking with shard width ((256 guard lanes)/width — the layout's
    cost model)."""
    import jax

    from epic_tpu.parallel import make_mesh, sharded

    interp = _interpret()
    kern_b = "pallas_banded_interpret" if interp else "pallas_banded"
    kern_r = "resident_interpret" if interp else "resident"
    if q:
        sizes = ((128, 16),)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    rows = []
    for size, steps in sizes:
        u, locked = _grid_np(size, size)
        out_b = sharded.update_n(_state(u, locked), steps, mesh,
                                 chunk_depth=16, kernel=kern_b)
        out_r = sharded.update_n(_state(u, locked), steps, mesh,
                                 chunk_depth=16, kernel=kern_r)
        d = _device_max_abs_diff(out_r.u, out_b.u)
        assert d == 0.0, (size, d)
        for kern in (kern_b, kern_r):
            st = _state(u, locked)
            _stage(st)
            t0 = time.perf_counter()
            out = sharded.update_n(st, steps, mesh, chunk_depth=16,
                                   kernel=kern)
            checksum = float(out.delta)  # scalar program output = barrier
            dt = time.perf_counter() - t0
            rows.append(dict(size=size, steps=steps, kernel=kern,
                             max_abs_diff_resident_vs_banded=d,
                             g_updates_per_s=round(
                                 size * size / 2 * steps / dt / 1e9, 2),
                             checksum=checksum))
    return dict(mesh="1x1", rows=rows)


@experiment("sharded-solve", "Scaling across devices")
def sharded_solve(q, size=4096):
    """Sharded solve TO CONVERGENCE on a 1x1 mesh over the real chip: the
    whole convergence while-loop runs INSIDE shard_map on the resident
    layout (pmax-reduced staggered checks, layout resident across the
    entire solve — ONE dispatch). Gates: iteration count == the unsharded
    banded solve (kernels are elementwise-identical) and device equality
    of the converged fields."""
    import jax

    from epic_tpu.parallel import make_mesh, sharded
    from epic_tpu.solver import pallas_biggrid as bg

    interp = _interpret()
    kern = "resident_interpret" if interp else "resident"
    if q:
        size = 256
    u, locked = _grid_np(size, size)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    out_u = bg.solve(_state(u, locked), max_iterations=40_000)
    out_s = sharded.solve(_state(u, locked), mesh, max_iterations=40_000,
                          kernel=kern)
    d = _device_max_abs_diff(out_s.u, out_u.u)
    iters = int(out_s.iteration)
    assert iters == int(out_u.iteration), (iters, int(out_u.iteration))
    assert d == 0.0, d
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out_s = sharded.solve(st, mesh, max_iterations=40_000, kernel=kern)
    checksum = float(out_s.delta) + int(out_s.iteration)
    dt = time.perf_counter() - t0
    return dict(size=size, mesh="1x1", kernel=kern, iterations=iters,
                converged=bool(out_s.converged),
                max_abs_diff_vs_unsharded=d, solve_wall_s=round(dt, 2),
                g_updates_per_s=round(size * size / 2 * iters / dt / 1e9, 2),
                checksum=checksum)


@experiment("sharded-converge", "Scaling across devices")
def sharded_converge(q, size=16384, segment=8000, cap=200_000):
    """The 16k x 16k BASELINE mega-grid solved TO CONVERGENCE through the
    SHARDED composition (resident layout, whole while-loop inside
    shard_map, watchdog-safe segments — resident.solve_segments): the
    multi-chip code path driven end-to-end at the config it exists for,
    on a 1x1 mesh here. Trajectory gate: the resident chunks are
    elementwise-identical to the unsharded kernels, so the iteration
    count must match the unsharded converged solve of the same grid
    (tiled-converge: 55,901)."""
    import jax

    from epic_tpu.parallel import make_mesh, resident_tiled, sharded

    interp = _interpret()
    kern = "resident_interpret" if interp else "resident"
    if q:
        size, segment, cap = 512, 200, 4000
    u, locked = _grid_np(size, size)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    layout = ("tiled" if resident_tiled.prefer_tiled_shards(size, size)
              else "banded")
    # Warm the segment program (one short capped run — same jaxpr).
    out = sharded.solve(_state(u, locked), mesh,
                        max_iterations=min(segment, cap), kernel=kern,
                        segment_iterations=segment)
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = sharded.solve(st, mesh, max_iterations=cap, kernel=kern,
                        segment_iterations=segment)
    checksum = float(out.delta) + int(out.iteration)
    dt = time.perf_counter() - t0
    iters = int(out.iteration)
    assert bool(out.converged) or q, (iters, float(out.delta))
    return dict(size=size, mesh="1x1", layout=layout, iterations=iters,
                converged=bool(out.converged), delta=float(out.delta),
                solve_wall_s=round(dt, 1), segment_iterations=segment,
                g_updates_per_s=round(size * size / 2 * iters / dt / 1e9, 2),
                checksum=checksum)


@experiment("resident-iso", "Scaling across devices")
def resident_iso(q, size=4096, steps=8192):
    """Attribute the resident layout's residual vs the banded shard path:
    run the resident chunk loop with (a) fresh-fill twins per chunk (the
    cycle_fill pattern), (b) same but the guard exchange REPLACED by a
    no-op (wrong results — times the 4 ppermute+DUS per chunk), (c) a
    POSITIONALLY-STABLE carried pair running TWO chunks per fori body
    (a->b then b->a, so both back-edge outputs alias their inputs and the
    loop carries zero copies — the swapped-pair carry measured 34.7 G and
    the fresh-fill body 37.8 vs banded 39.7). Rates are NOT
    exactness-gated for (b); this is a diagnostic, not a product path."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from epic_tpu.parallel import make_mesh, resident
    from epic_tpu.parallel.sharded import _pad_for_mesh

    interp = _interpret()
    if q:
        size, steps = 128, 16
    u, locked = _grid_np(size, size)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))

    def program(no_exchange, paired):
        @functools.partial(
            jax.jit, static_argnames=("mesh", "num_steps", "interpret"),
            donate_argnums=(0,),
        )
        def upd(uu, frozen, iteration, mesh, num_steps, interpret):
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(P("my", "mx"), P("my", "mx"), P()),
                out_specs=(P("my", "mx"), P()),
                check_vma=not interpret,
            )
            def run(u_loc, frozen_loc, it0):
                h_loc, w_loc = u_loc.shape
                k, band, nb, hp, wg = resident._layout(h_loc, w_loc, 16)
                row0, col0 = resident._origin(mesh, h_loc, w_loc, k)
                u_a, f_res = resident._pad_resident(
                    u_loc, frozen_loc, mesh, k, hp)

                def chunk2(cur, alt, it):
                    if not no_exchange:
                        cur = resident._exchange_guards(
                            cur, mesh, k, h_loc, w_loc)
                    src, dst, d = resident._chunk_resident(
                        cur, alt, f_res, it, row0, col0, k, band, k,
                        h_loc, w_loc, interpret)
                    return src, dst, d

                def chunk(cur, it):
                    alt = resident._fill_twin(hp, wg, interpret)
                    _, dst, d = chunk2(cur, alt, it)
                    return dst, d

                if paired:
                    u_b = resident._fill_twin(hp, wg, interpret)
                    stale, cur, delta = chunk2(u_a, u_b, it0)

                    def body(i, carry):
                        a, b, it = carry
                        # a = current, b = twin; two chunks keep the carry
                        # positions stable (a2 aliases a, b2 aliases b).
                        a_stale, b_new, _ = chunk2(a, b, it)
                        b_stale, a2, _ = chunk2(b_new, a_stale, it + k)
                        return a2, b_stale, it + 2 * k

                    n2 = (num_steps // k - 1) // 2
                    u_a, _, _ = jax.lax.fori_loop(
                        0, n2, body, (cur, stale, it0 + k))
                else:
                    u_a, delta = chunk(u_a, it0)

                    def body(i, carry):
                        cur, it = carry
                        cur, _ = chunk(cur, it)
                        return cur, it + k

                    u_a, _ = jax.lax.fori_loop(
                        0, num_steps // k - 1, body, (u_a, it0 + k))
                delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
                out = jax.lax.slice(
                    u_a, (k, resident.GC), (k + h_loc, resident.GC + w_loc))
                return out, delta.reshape(1)

            return run(uu, frozen, iteration)

        return upd

    rows = []
    for name, no_ex, paired in (("full", False, False),
                                ("no-exchange", True, False),
                                ("paired", False, True)):
        upd = program(no_ex, paired)
        st = _state(u, locked)
        uu, frozen = _pad_for_mesh(st, mesh)
        sharding = NamedSharding(mesh, P("my", "mx"))
        uu = jax.device_put(uu, sharding)
        frozen = jax.device_put(frozen, sharding)
        # warm
        out, d = upd(uu, frozen, jnp.int32(0), mesh, steps, interp)
        float(d[0])
        uu2, frozen2 = _pad_for_mesh(_state(u, locked), mesh)
        uu2 = jax.device_put(uu2, sharding)
        frozen2 = jax.device_put(frozen2, sharding)
        _stage(uu2, frozen2)
        t0 = time.perf_counter()
        out, d = upd(uu2, frozen2, jnp.int32(0), mesh, steps, interp)
        checksum = float(d[0])
        dt = time.perf_counter() - t0
        rows.append(dict(variant=name,
                         g_updates_per_s=round(size * size / 2 * steps / dt / 1e9, 2),
                         checksum=checksum))
    return dict(size=size, steps=steps, mesh="1x1", rows=rows)


@experiment("sharded3d-banded", "Scaling across devices")
def sharded3d_banded(q, shape=(256, 256, 256), steps=1024, depths=(2, 4, 8)):
    """The 3D beyond-VMEM per-shard Pallas path (shard_map + plane-banded
    DMA kernel) on a 1x1 mesh over the real chip — the on-chip twin of the
    virtual-mesh sharded3d tests; gate = equality vs the unsharded banded
    volume kernel. 256³ is the banded kernel's home regime (small planes —
    mid-plane shapes degenerate the layout: 3.78 G at 128x512x512,
    probe_r3c.jsonl). Scans the exchange chunk depth: the halo exchange +
    banded repad amortize over k sweeps, so deeper chunks trade kernel
    trapezoid redundancy against per-chunk copy traffic."""
    import jax

    from epic_tpu.parallel import make_mesh, sharded3d
    from epic_tpu.solver import pallas_biggrid3d as b3

    interp = _interpret()
    kern = "pallas_banded_interpret" if interp else "pallas_banded"
    if q:
        shape, steps, depths = (12, 16, 64), 8, (2, 4)
    u, locked = _vol_np(*shape)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    out_b = b3.update_n(_state(u, locked), steps)
    rows = []
    for depth in depths:
        out_s = sharded3d.update_n(_state(u, locked), steps, mesh,
                                   chunk_depth=depth, kernel=kern)
        d = _device_max_abs_diff(out_s.u, out_b.u)
        assert d == 0.0, (depth, d)
        st = _state(u, locked)
        _stage(st)
        t0 = time.perf_counter()
        out_s = sharded3d.update_n(st, steps, mesh, chunk_depth=depth,
                                   kernel=kern)
        checksum = float(out_s.delta)  # scalar program output = barrier
        dt = time.perf_counter() - t0
        cells = int(np.prod(shape))
        rows.append(dict(depth=depth,
                         g_updates_per_s=round(cells / 2 * steps / dt / 1e9, 2),
                         checksum=checksum))
    return dict(shape="x".join(map(str, shape)), steps=steps, mesh="1x1",
                kernel=kern, rows=rows)


@experiment("sharded3d-solve", "Scaling across devices")
def sharded3d_solve(q, shape=(64, 1024, 1024), cap=20_000):
    """Sharded 3D solve TO CONVERGENCE on a 1x1 mesh over the real chip:
    the whole while-loop inside shard_map on the resident3d wide-plane
    layout (one dispatch). Gates: iteration count == the unsharded tiled3d
    solve (kernels elementwise-identical) and device equality of the
    converged fields."""
    import jax

    from epic_tpu.parallel import make_mesh, sharded3d
    from epic_tpu.solver import pallas_tiled3d as t3

    interp = _interpret()
    kern = "resident_interpret" if interp else "resident"
    if q:
        shape, cap = (8, 32, 256), 800
    u, locked = _vol_np(*shape)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    out_u = t3.solve(_state(u, locked), max_iterations=cap)
    out_s = sharded3d.solve(_state(u, locked), mesh, max_iterations=cap,
                            kernel=kern)
    d = _device_max_abs_diff(out_s.u, out_u.u)
    iters = int(out_s.iteration)
    assert iters == int(out_u.iteration), (iters, int(out_u.iteration))
    assert d == 0.0, d
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out_s = sharded3d.solve(st, mesh, max_iterations=cap, kernel=kern)
    checksum = float(out_s.delta) + int(out_s.iteration)
    dt = time.perf_counter() - t0
    cells = int(np.prod(shape))
    return dict(shape="x".join(map(str, shape)), mesh="1x1", kernel=kern,
                iterations=iters, converged=bool(out_s.converged),
                max_abs_diff_vs_unsharded=d, solve_wall_s=round(dt, 2),
                g_updates_per_s=round(cells / 2 * iters / dt / 1e9, 2),
                checksum=checksum)


@experiment("sharded3d-resident", "Scaling across devices")
def sharded3d_resident(q, shape=(256, 256, 256), steps=1024,
                       wide_shape=(64, 1024, 1024), wide_steps=256):
    """The tile-pure resident 3D shard layout (VERDICT r3 item 1) on a 1x1
    mesh over the real chip: A/B against the banded 3D shard path at 256³
    (its home regime, 9.9 G in round 3), and alone at a 1k-wide shard
    (where plane-banding cannot compile — probe24 wall — and round 3 had
    no Pallas composition at all); gates = bit-equality vs the banded
    composition / the unsharded tiled3d kernel."""
    import jax

    from epic_tpu.parallel import make_mesh, resident3d, sharded3d
    from epic_tpu.solver import pallas_tiled3d as t3

    interp = _interpret()
    kern_b = "pallas_banded_interpret" if interp else "pallas_banded"
    if q:
        shape, steps = (12, 16, 128), 8
        wide_shape, wide_steps = (8, 16, 256), 4
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    rows = []

    u, locked = _vol_np(*shape)
    out_b = sharded3d.update_n(_state(u, locked), steps, mesh,
                               chunk_depth=2, kernel=kern_b)
    out_r = resident3d.update_n(_state(u, locked), steps, mesh)
    d = _device_max_abs_diff(out_r.u, out_b.u)
    assert d == 0.0, d
    cells = int(np.prod(shape))
    for name, fn in (
        ("banded", lambda st: sharded3d.update_n(st, steps, mesh,
                                                 chunk_depth=2,
                                                 kernel=kern_b)),
        ("resident", lambda st: resident3d.update_n(st, steps, mesh)),
    ):
        st = _state(u, locked)
        _stage(st)
        t0 = time.perf_counter()
        out = fn(st)
        checksum = float(out.delta)  # scalar program output = barrier
        dt = time.perf_counter() - t0
        rows.append(dict(shape="x".join(map(str, shape)), kernel=name,
                         steps=steps,
                         g_updates_per_s=round(cells / 2 * steps / dt / 1e9, 2),
                         checksum=checksum))

    # Wide shard: no banded composition exists; gate vs unsharded tiled3d.
    uw, lockedw = _vol_np(*wide_shape)
    out_t = t3.update_n(_state(uw, lockedw), wide_steps)
    out_r = resident3d.update_n(_state(uw, lockedw), wide_steps, mesh)
    dw = _device_max_abs_diff(out_r.u, out_t.u)
    assert dw == 0.0, dw
    cellsw = int(np.prod(wide_shape))
    for name, fn in (
        ("tiled3d-unsharded", lambda st: t3.update_n(st, wide_steps)),
        ("resident", lambda st: resident3d.update_n(st, wide_steps, mesh)),
    ):
        st = _state(uw, lockedw)
        _stage(st)
        t0 = time.perf_counter()
        out = fn(st)
        checksum = float(out.delta)
        dt = time.perf_counter() - t0
        rows.append(dict(shape="x".join(map(str, wide_shape)), kernel=name,
                         steps=wide_steps,
                         g_updates_per_s=round(cellsw / 2 * wide_steps / dt / 1e9, 2),
                         checksum=checksum))
    return dict(mesh="1x1", max_abs_diff_vs_banded=d,
                max_abs_diff_wide_vs_tiled3d=dw, rows=rows)


@experiment("mesh-planner", "Scaling across devices")
def mesh_planner(q, size=4096, tick_steps=16384, segment=5000):
    """MeshPlanner's service plane ON the chip (VERDICT r4 item 5): the
    mesh-resident verb surface driven end-to-end at a production size —
    warm anytime tick rate (must ride the resident layout at ~kernel
    rates, not the XLA fallback the r4 ADVICE found), then a
    SetCells -> tick -> warm-started segmented converge session. Gates:
    tick device-equality vs parallel.resident.update_n, converge
    iteration equality vs the direct sharded solve."""
    import jax
    import jax.numpy as jnp

    from epic_tpu.parallel import make_mesh, resident, sharded
    from epic_tpu.planner import PlannerConfig
    from epic_tpu.planner_mesh import MeshPlanner

    interp = _interpret()
    kern = "resident_interpret" if interp else "resident"
    if q:
        size, tick_steps, segment = 512, 64, 200
    u, locked = _grid_np(size, size)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    cells = size * size
    rows = []

    def planner():
        mp = MeshPlanner(PlannerConfig(epsilon=1e-2), mesh=mesh,
                         kernel=kern)
        mp.state = _state(u, locked)
        return mp

    # Gate: the planner tick IS the resident layout (device equality).
    mp = planner()
    mp.update(64)
    ref = resident.update_n(_state(u, locked), 64, mesh,
                            interpret=interp if interp else None)
    d = _device_max_abs_diff(mp._sh.u[:size, :size], ref.u)
    assert d == 0.0, d

    # Warm tick rate at a clean region size (warm the same static count).
    mp = planner()
    mp.update(tick_steps)
    float(np.asarray(mp._sh.u[0, :8]).sum())
    mp = planner()
    _stage(mp._sh.u, mp._sh.frozen)
    t0 = time.perf_counter()
    mp.update(tick_steps)
    ck = float(np.asarray(mp._sh.u[0, :8]).sum())  # final-u barrier
    dt = time.perf_counter() - t0
    rows.append(dict(verb="update", steps=tick_steps,
                     g_updates_per_s=round(cells / 2 * tick_steps / dt / 1e9, 2),
                     checksum=ck))

    # Converge gate + timing: planner solve == direct sharded solve.
    ref_out = sharded.solve(_state(u, locked), mesh, kernel=kern,
                            segment_iterations=segment)
    ref_iters = int(ref_out.iteration)
    # Warm the planner's own programs (scatter + small tick + solve) so
    # the timed session holds no cold remote compiles.
    ys, xs = np.mgrid[size // 3:size // 3 + 40, size // 3:size // 3 + 40]
    xy = np.stack([xs.ravel(), ys.ravel()], axis=1)
    mp = planner()
    mp.set_cells(xy, [1] * len(xy))
    mp.update(min(1024, tick_steps))
    mp.solve(segment_iterations=segment)
    int(np.asarray(mp._sh.iteration))
    mp = planner()
    _stage(mp._sh.u, mp._sh.frozen)
    t0 = time.perf_counter()
    mp.solve(segment_iterations=segment)
    iters = int(np.asarray(mp._sh.iteration))
    ck = float(np.asarray(mp._sh.u[0, :8]).sum())
    dt = time.perf_counter() - t0
    assert iters == ref_iters, (iters, ref_iters)
    assert bool(np.asarray(mp.state.converged))
    rows.append(dict(verb="solve-converge", iterations=iters,
                     g_updates_per_s=round(cells / 2 * iters / dt / 1e9, 2),
                     checksum=ck))

    # Edit-resume session: scatter an obstacle block into the resident
    # shards, tick, warm-started re-converge (all on device).
    t0 = time.perf_counter()
    mp.set_cells(xy, [1] * len(xy))
    mp.update(min(1024, tick_steps))
    mp.solve(segment_iterations=segment)
    iters2 = int(np.asarray(mp._sh.iteration))
    ck = float(np.asarray(mp._sh.u[0, :8]).sum())
    dt = time.perf_counter() - t0
    assert bool(np.asarray(mp.state.converged))
    rows.append(dict(verb="edit-resume-converge",
                     resumed_iterations=iters2,
                     wall_s=round(dt, 2), checksum=ck))
    return dict(size=size, mesh="1x1", kernel=kern, rows=rows)


@experiment("mesh-planner3d", "Scaling across devices")
def mesh_planner3d(q, shape=(256, 256, 256), tick_steps=8192, cap=2000):
    """MeshVolumePlanner's verb surface ON the chip: warm anytime tick at
    the z-resident layout's rate, then a blocking converge and an
    edit->tick->warm-re-converge session on the mesh-resident
    ShardedVolume buffers. Gates: tick device-equality vs
    resident_z.update_n, converge iteration equality vs the unsharded
    banded solve."""
    import jax
    import jax.numpy as jnp

    from epic_tpu.parallel import resident_z
    from epic_tpu.parallel.sharded3d import make_mesh3d
    from epic_tpu.planner3d import VolumePlannerConfig
    from epic_tpu.planner_mesh import MeshVolumePlanner
    from epic_tpu.solver import pallas_biggrid3d as b3

    interp = _interpret()
    kern = "resident_interpret" if interp else "resident"
    if q:
        shape, tick_steps, cap = (12, 16, 128), 8, 200
    u, locked = _vol_np(*shape)
    mesh = make_mesh3d((1, 1, 1), devices=np.asarray(jax.devices()[:1]))
    cells = int(np.prod(shape))
    rows = []

    def planner():
        mp = MeshVolumePlanner(VolumePlannerConfig(epsilon=1e-2),
                               mesh=mesh, kernel=kern)
        mp.state = _state(u, locked)
        return mp

    mp = planner()
    mp.update(8)
    ref = resident_z.update_n(_state(u, locked), 8, mesh,
                              interpret=interp if interp else None)
    d = _device_max_abs_diff(
        mp._sv.u[:shape[0], :shape[1], :shape[2]], ref.u)
    assert d == 0.0, d

    mp = planner()
    mp.update(tick_steps)
    float(np.asarray(mp._sv.u[0, 0, :8]).sum())
    mp = planner()
    _stage(mp._sv.u, mp._sv.frozen)
    t0 = time.perf_counter()
    mp.update(tick_steps)
    ck = float(np.asarray(mp._sv.u[0, 0, :8]).sum())
    dt = time.perf_counter() - t0
    rows.append(dict(verb="update", steps=tick_steps,
                     g_updates_per_s=round(cells / 2 * tick_steps / dt / 1e9, 2),
                     checksum=ck))

    ref_out = b3.solve(_state(u, locked), max_iterations=cap)
    ref_iters = int(ref_out.iteration)
    zs, ys, xs = np.mgrid[shape[0] // 3:shape[0] // 3 + 8,
                          shape[1] // 3:shape[1] // 3 + 8,
                          shape[2] // 3:shape[2] // 3 + 8]
    xyz = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1)
    # Warm the PLANNER's own programs (solve, small tick, the
    # session-sized scatter) — the unsharded oracle above is a different
    # jaxpr and does not warm them.
    mp = planner()
    mp.solve(max_iterations=cap)
    mp.set_cells(xyz, [1] * len(xyz))
    mp.update(min(512, tick_steps))
    int(np.asarray(mp._sv.iteration))
    mp = planner()
    _stage(mp._sv.u, mp._sv.frozen)
    t0 = time.perf_counter()
    mp.solve(max_iterations=cap)
    iters = int(np.asarray(mp._sv.iteration))
    ck = float(np.asarray(mp._sv.u[0, 0, :8]).sum())
    dt = time.perf_counter() - t0
    assert iters == ref_iters, (iters, ref_iters)
    assert bool(np.asarray(mp.state.converged)) or q
    rows.append(dict(verb="solve-converge", iterations=iters,
                     g_updates_per_s=round(cells / 2 * iters / dt / 1e9, 2),
                     checksum=ck))

    t0 = time.perf_counter()
    mp.set_cells(xyz, [1] * len(xyz))
    mp.update(min(512, tick_steps))
    mp.solve(max_iterations=cap)
    iters2 = int(np.asarray(mp._sv.iteration))
    ck = float(np.asarray(mp._sv.u[0, 0, :8]).sum())
    dt = time.perf_counter() - t0
    rows.append(dict(verb="edit-resume-converge",
                     resumed_iterations=iters2,
                     wall_s=round(dt, 2), checksum=ck))
    return dict(shape="x".join(map(str, shape)), mesh="1x1x1 (z)",
                kernel=kern, rows=rows)


@experiment("sharded3d-zresident", "Scaling across devices")
def sharded3d_zresident(q, shape=(256, 256, 256), steps=8192, cap=2000):
    """The z-resident plane-band shard layout (VERDICT r4 item 2: the cube
    regime) on a 1x1x1 z-mesh over the real chip: full planes stay local,
    guards are contiguous plane blocks, the per-shard kernel is the
    banded-kernel ping-pong twin. Gates: device equality vs the unsharded
    banded volume kernel (update) and iteration equality + device equality
    vs the unsharded banded solve (capped). The plane-guard resident layout
    measured 8.7 G here and the banded composition 9.9 G vs the unsharded
    kernel's 30.5 G (r4) — this layout exists to close that."""
    import jax

    from epic_tpu.parallel import resident_z
    from epic_tpu.parallel.sharded3d import make_mesh3d
    from epic_tpu.solver import pallas_biggrid3d as b3

    interp = _interpret()
    if q:
        shape, steps, cap = (12, 16, 64), 8, 200
    u, locked = _vol_np(*shape)
    mesh = make_mesh3d((1, 1, 1), devices=np.asarray(jax.devices()[:1]))
    cells = int(np.prod(shape))
    rows = []

    out_b = b3.update_n(_state(u, locked), steps)
    out_r = resident_z.update_n(_state(u, locked), steps, mesh,
                                interpret=interp)
    d = _device_max_abs_diff(out_r.u, out_b.u)
    assert d == 0.0, d
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out_r = resident_z.update_n(st, steps, mesh, interpret=interp)
    ck = float(out_r.delta)
    dt = time.perf_counter() - t0
    rows.append(dict(variant="update", steps=steps,
                     g_updates_per_s=round(cells / 2 * steps / dt / 1e9, 2),
                     checksum=ck))

    out_bs = b3.solve(_state(u, locked), max_iterations=cap)
    out_rs = resident_z.solve(_state(u, locked), mesh, max_iterations=cap,
                              interpret=interp)
    ds = _device_max_abs_diff(out_rs.u, out_bs.u)
    iters = int(out_rs.iteration)
    assert iters == int(out_bs.iteration), (iters, int(out_bs.iteration))
    assert ds == 0.0, ds
    # Timing run: impossible eps so the while loop runs exactly 4*steps
    # sweeps (the converging run above is too short for a clean region).
    tcap = steps // 2
    st = _state(u, locked, eps=1e-12)
    out_w = resident_z.solve(st, mesh, max_iterations=200, interpret=interp)
    int(out_w.iteration)
    st = _state(u, locked, eps=1e-12)
    _stage(st)
    t0 = time.perf_counter()
    out_rs = resident_z.solve(st, mesh, max_iterations=tcap,
                              interpret=interp)
    sw = int(out_rs.iteration)
    ck = float(out_rs.delta) + sw
    dt = time.perf_counter() - t0
    rows.append(dict(variant="solve", iterations_converged=iters,
                     sweeps_timed=sw,
                     g_updates_per_s=round(cells / 2 * sw / dt / 1e9, 2),
                     checksum=ck))
    return dict(shape="x".join(map(str, shape)), mesh="1x1x1 (z)",
                max_abs_diff_vs_unsharded=max(d, ds), rows=rows)


@experiment("resident2d-solve-iso", "Scaling across devices")
def resident2d_solve_iso(q, size=4096, steps=14000):
    """Attribute the 2D banded resident SOLVE tax vs its own open chain
    (r5: solve 39.9 vs chain 41.8 at 4096²): (a) one update_n call of
    ``steps`` sweeps, (b) a capped never-converging solve of the same
    sweep count through the cond-free body. Both use the width-gated
    solve chunk depth so the chunk structure matches."""
    import jax

    from epic_tpu.parallel import make_mesh, resident

    interp = _interpret()
    if q:
        size, steps = 512, 60
    u, locked = _grid_np(size, size)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    cells = size * size
    rows = []
    depth = resident.solve_chunk_depth(size, size)

    st = _state(u, locked)
    out = resident.update_n(st, steps, mesh, chunk_depth=depth)  # warm
    float(out.delta)
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = resident.update_n(st, steps, mesh, chunk_depth=depth)
    ck = float(out.delta)
    dt = time.perf_counter() - t0
    rows.append(dict(variant="chain", sweeps=steps, depth=depth,
                     g_updates_per_s=round(cells / 2 * steps / dt / 1e9, 2),
                     checksum=ck))

    st = _state(u, locked, eps=1e-12)
    out = resident.solve(st, mesh, max_iterations=200)  # warm
    int(out.iteration)
    st = _state(u, locked, eps=1e-12)
    _stage(st)
    t0 = time.perf_counter()
    out = resident.solve(st, mesh, max_iterations=steps)
    iters = int(out.iteration)
    ck = float(out.delta) + iters
    dt = time.perf_counter() - t0
    rows.append(dict(variant="solve-capped", sweeps=iters, depth=depth,
                     g_updates_per_s=round(cells / 2 * iters / dt / 1e9, 2),
                     checksum=ck))
    return dict(size=size, mesh="1x1", rows=rows)


@experiment("resident3d-solve-iso", "Scaling across devices")
def resident3d_solve_iso(q, shape=(64, 1024, 1024), steps=2000):
    """Attribute the resident 3D SOLVE tax vs its own open chain (r4: 13.8
    solve vs 17.2 chain): time (a) one update_n call of ``steps`` sweeps
    (single fori of paired chunks) and (b) a capped never-converging solve
    of the same sweep count (eps impossible -> while bodies of one stagger
    cycle each: folded check chunk + cond branch with paired fori + odd
    chunk). Same layout, same per-chunk kernels; the difference is the
    while/cond/twin-per-body structure. Diagnostic, not a product path."""
    import jax

    from epic_tpu.parallel import make_mesh, resident3d

    interp = _interpret()
    if q:
        shape, steps = (8, 16, 256), 40
    u, locked = _vol_np(*shape)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    cells = int(np.prod(shape))
    rows = []

    # (a) open chain, one call.
    st = _state(u, locked)
    out = resident3d.update_n(st, steps, mesh)  # warm
    float(out.delta)
    st = _state(u, locked)
    _stage(st)
    t0 = time.perf_counter()
    out = resident3d.update_n(st, steps, mesh)
    ck = float(out.delta)
    dt = time.perf_counter() - t0
    rows.append(dict(variant="chain", sweeps=steps,
                     g_updates_per_s=round(cells / 2 * steps / dt / 1e9, 2),
                     checksum=ck))

    # (b) capped solve, impossible eps: every body runs the full stagger
    # cycle; iterations overshoot the cap to the cycle boundary.
    st = _state(u, locked, eps=1e-12)
    out = resident3d.solve(st, mesh, max_iterations=min(steps, 200))  # warm
    int(out.iteration)
    st = _state(u, locked, eps=1e-12)
    _stage(st)
    t0 = time.perf_counter()
    out = resident3d.solve(st, mesh, max_iterations=steps)
    iters = int(out.iteration)
    ck = float(out.delta) + iters
    dt = time.perf_counter() - t0
    rows.append(dict(variant="solve-capped", sweeps=iters,
                     g_updates_per_s=round(cells / 2 * iters / dt / 1e9, 2),
                     checksum=ck))

    # (c)/(d) bisect the while/cond structure with local loop rebuilds
    # sharing resident3d's internals: (c) while loop whose body is ONE
    # stagger cycle of paired chunks with NO check chunk and NO cond
    # (pure while tax); (d) check-fold chunk + UNCONDITIONAL rest (cond
    # removed; protocol-wrong at the exit, timing-only).
    import functools

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from epic_tpu.parallel.sharded3d import _pad_for_mesh as _pfm

    def build(variant):
        @functools.partial(
            jax.jit, static_argnames=("mesh", "n_bodies", "interpret"),
            donate_argnums=(0,))
        def run_loop(uu, frozen, mesh, n_bodies, interpret):
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(resident3d._SPEC, resident3d._SPEC),
                out_specs=(resident3d._SPEC, P()),
                check_vma=not interpret,
            )
            def run(u_loc, frozen_loc):
                d, h_loc, w_loc = u_loc.shape
                band, k, yt, wt = resident3d.choose_layout(d, h_loc, w_loc, 2)
                nb = -(-d // band)
                dp = nb * band + 2 * k
                hp2, wp2 = resident3d._plane_dims(h_loc, w_loc, yt, wt)
                u_res, f_res = resident3d._pad_resident(
                    u_loc, frozen_loc, mesh, k, dp, hp2, wp2)

                def chunk2(cur, alt, it, ns=None, interior=None):
                    cur = resident3d._exchange_guards(cur, mesh, h_loc,
                                                      w_loc, hp2)
                    return resident3d._chunk_cycle(
                        cur, alt, f_res, it, band, k, yt, wt, hp2,
                        interpret, interior, ns)

                stagger = 100
                ns1 = min(k, stagger)
                n_full, rem = divmod(stagger - ns1, k)
                n2, odd = divmod(n_full, 2)

                def rest(cur, stale, it):
                    def fbody(i, c):
                        a, b, it2 = c
                        a_s, b_n, _ = chunk2(a, b, it2)
                        b_s, a_n, _ = chunk2(b_n, a_s, it2 + k)
                        return a_n, b_s, it2 + 2 * k

                    cur, stale, it = jax.lax.fori_loop(
                        0, n2, fbody, (cur, stale, it))
                    if odd:
                        stale, cur, _ = chunk2(cur, stale, it)
                        it = it + k
                    if rem:
                        stale, cur, _ = chunk2(cur, stale, it, ns=rem)
                        it = it + rem
                    return cur, it

                def body_nocheck(carry):
                    u_res, it, delta = carry
                    alt = resident3d._fill_twin(dp * hp2, wp2, interpret)
                    stale, cur, _ = chunk2(u_res, alt, it, ns=ns1)
                    cur, it = rest(cur, stale, it + ns1)
                    return cur, it, delta

                def body_nocond(carry):
                    u_res, it, _ = carry
                    alt = resident3d._fill_twin(dp * hp2, wp2, interpret)
                    stale, cur, delta = chunk2(u_res, alt, it, ns=ns1,
                                               interior=(d, h_loc, w_loc))
                    delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
                    cur, it = rest(cur, stale, it + ns1)
                    return cur, it, delta

                body = dict(nocheck=body_nocheck,
                            nocond=body_nocond)[variant]
                bound = n_bodies * stagger

                def cond(carry):
                    return carry[1] < bound

                u_res, it, delta = jax.lax.while_loop(
                    cond, body, (u_res, jnp.int32(0), jnp.float32(0)))
                u3 = u_res.reshape(dp, hp2, wp2)
                out = jax.lax.slice(
                    u3, (k, resident3d._HY, resident3d._HX),
                    (k + d, resident3d._HY + h_loc,
                     resident3d._HX + w_loc))
                return out, delta.reshape(1)

            return run(uu, frozen)

        return run_loop

    from epic_tpu.parallel.sharded3d import _spec as _sp3

    n_bodies = max(1, steps // 100)
    for variant in ("nocheck", "nocond"):
        fn = build(variant)
        st = _state(u, locked)
        uu, fz = _pfm(st, mesh)
        shd = NamedSharding(mesh, _sp3(mesh))
        uu = jax.device_put(uu, shd)
        fz = jax.device_put(fz, shd)
        # warm with the SAME static body count (the static-arg recompile
        # trap would otherwise put a compile inside the timed region)
        out_u, dd = fn(uu, fz, mesh, n_bodies, interp)
        float(dd[0])
        st = _state(u, locked)
        uu, fz = _pfm(st, mesh)
        uu = jax.device_put(uu, shd)
        fz = jax.device_put(fz, shd)
        _stage(uu, fz)
        t0 = time.perf_counter()
        out_u, dd = fn(uu, fz, mesh, n_bodies, interp)
        ck = float(dd[0]) + float(out_u[0, 0, 0])
        dt = time.perf_counter() - t0
        sweeps = n_bodies * 100
        rows.append(dict(
            variant=f"while-{variant}", sweeps=sweeps,
            g_updates_per_s=round(cells / 2 * sweeps / dt / 1e9, 2),
            checksum=ck))
    return dict(shape="x".join(map(str, shape)), mesh="1x1", rows=rows)


@experiment("resident3d-iso", "Scaling across devices")
def resident3d_iso(q, shape=(64, 1024, 1024), steps=256):
    """Attribute the resident 3D layout's tax vs the unsharded tiled3d
    kernel at a 1k-wide shard: (a) full semantics at chunk_depth 2, (b)
    the guard exchange REPLACED by a no-op (wrong results — times the 4
    ppermute+DUS per chunk), (c) chunk_depth 4 (half the exchanges and
    dispatches, more z-trapezoid redundancy). Diagnostic, not a product
    path."""
    import jax

    from epic_tpu.parallel import make_mesh, resident3d

    interp = _interpret()
    if q:
        shape, steps = (8, 16, 256), 4
    u, locked = _vol_np(*shape)
    mesh = make_mesh((1, 1), devices=np.asarray(jax.devices()[:1]))
    cells = int(np.prod(shape))
    rows = []

    def timed(name, depth):
        st = _state(u, locked)
        out = resident3d.update_n(st, steps, mesh, chunk_depth=depth)  # warm
        float(out.delta)
        st = _state(u, locked)
        _stage(st)
        t0 = time.perf_counter()
        out = resident3d.update_n(st, steps, mesh, chunk_depth=depth)
        checksum = float(out.delta)
        dt = time.perf_counter() - t0
        rows.append(dict(variant=name, depth=depth,
                         g_updates_per_s=round(cells / 2 * steps / dt / 1e9, 2),
                         checksum=checksum))

    timed("full", 2)
    timed("depth4", 4)
    real_exchange = resident3d._exchange_guards
    resident3d._exchange_guards = lambda u_flat, *a, **k: u_flat
    resident3d._update_n_resident.clear_cache()
    try:
        timed("no-exchange", 2)
    finally:
        resident3d._exchange_guards = real_exchange
        resident3d._update_n_resident.clear_cache()

    # Diagnostic (d): the same slab kernel but 8 chunks per cycle DISPATCH
    # (exchange every 8 chunks — WRONG at shard edges beyond the guard
    # freshness, fine on a 1x1 mesh where guards are frozen): isolates the
    # per-chunk dispatch boundary bubble from the kernel itself.
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from epic_tpu.parallel.sharded3d import _pad_for_mesh
    from epic_tpu.solver.pallas_tiled3d import _HX, _HY

    NC = 8

    def cycle_nc(u_src, u_dst, f_res, it, band, k, yt, wt, hp2, interp):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from epic_tpu.solver.pallas_cycle import _cycle_kernel_tiled3d

        rp, wp = u_src.shape
        nb, ny, nx = resident3d._grid_dims(rp, wp, band, k, yt, wt, hp2)
        nsteps = nb * ny * nx
        ext_z, yext, wext = band + 2 * k, yt + 2 * _HY, wt + 2 * _HX
        scal = jnp.asarray(it).astype(jnp.int32).reshape(1)
        vma = frozenset({"my", "mx"})
        a_out, b_out, deltas = pl.pallas_call(
            functools.partial(_cycle_kernel_tiled3d, k=k, band=band, yt=yt,
                              wt=wt, hy=_HY, hx=_HX, hp2=hp2, nb=nb, ny=ny,
                              nx=nx, nc=NC),
            grid=(NC, nsteps),
            out_shape=(
                jax.ShapeDtypeStruct((rp, wp), jnp.float32, vma=vma),
                jax.ShapeDtypeStruct((rp, wp), jnp.float32, vma=vma),
                jax.ShapeDtypeStruct((NC, nsteps), jnp.float32, vma=vma),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((2, ext_z * yext, wext), jnp.float32),
                pltpu.VMEM((2, ext_z * yext, wext), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 3, ext_z)),
                pltpu.SemaphoreType.DMA((2, band)),
            ],
            input_output_aliases={1: 0, 2: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interp,
        )(scal, u_src, u_dst, f_res)
        return a_out, b_out, jnp.max(deltas)

    @functools.partial(
        jax.jit, static_argnames=("mesh", "num_steps", "interpret"),
        donate_argnums=(0,))
    def upd8(uu, frozen, iteration, mesh, num_steps, interpret):
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(resident3d._SPEC, resident3d._SPEC, P()),
            out_specs=(resident3d._SPEC, P()),
            check_vma=not interpret,
        )
        def run(u_loc, frozen_loc, it0):
            d, h_loc, w_loc = u_loc.shape
            band, k, yt, wt = resident3d.choose_layout(d, h_loc, w_loc, 2)
            nb = -(-d // band)
            dp = nb * band + 2 * k
            hp2, wp2 = resident3d._plane_dims(h_loc, w_loc, yt, wt)
            u_res, f_res = resident3d._pad_resident(
                u_loc, frozen_loc, mesh, k, dp, hp2, wp2)
            alt = resident3d._fill_twin(dp * hp2, wp2, interpret)

            def cyc(cur, other, it):
                cur = resident3d._exchange_guards(cur, mesh, h_loc, w_loc,
                                                  hp2)
                a, b, dd = cycle_nc(cur, other, f_res, it, band, k, yt, wt,
                                    hp2, interpret)
                return (b, a, dd) if NC % 2 else (a, b, dd)

            u_res, alt, delta = cyc(u_res, alt, it0)
            n2 = (num_steps // (k * NC) - 1) // 2

            def body(i, carry):
                a, b, it2 = carry
                b2, a2, _ = cyc(a, b, it2)
                a3, b3, _ = cyc(b2, a2, it2 + k * NC)
                return b3, a3, it2 + 2 * k * NC

            u_res, alt, _ = jax.lax.fori_loop(
                0, n2, body, (u_res, alt, it0 + k * NC))
            delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
            u3 = u_res.reshape(dp, hp2, wp2)
            out = jax.lax.slice(
                u3, (k, _HY, _HX), (k + d, _HY + h_loc, _HX + w_loc))
            return out, delta.reshape(1)

        return run(uu, frozen, iteration)

    st = _state(u, locked)
    uu, frozen = _pad_for_mesh(st, mesh)
    sharding = NamedSharding(mesh, resident3d._SPEC)
    uu = jax.device_put(uu, sharding)
    frozen = jax.device_put(frozen, sharding)
    out, d8 = upd8(uu, frozen, jnp.int32(0), mesh, steps, _interpret())
    float(d8[0])  # warm
    uu2, frozen2 = _pad_for_mesh(_state(u, locked), mesh)
    uu2 = jax.device_put(uu2, sharding)
    frozen2 = jax.device_put(frozen2, sharding)
    _stage(uu2, frozen2)
    t0 = time.perf_counter()
    out, d8 = upd8(uu2, frozen2, jnp.int32(0), mesh, steps, _interpret())
    checksum = float(d8[0])
    dt = time.perf_counter() - t0
    # The paired cycle loop runs an odd dispatch count; account the sweeps
    # actually executed.
    k_used = 2
    steps_eff = (1 + 2 * max(0, (steps // (k_used * NC) - 1) // 2)) * k_used * NC
    rows.append(dict(variant="cycle8-dispatch", depth=2, steps_eff=steps_eff,
                     g_updates_per_s=round(cells / 2 * steps_eff / dt / 1e9, 2),
                     checksum=checksum))
    return dict(shape="x".join(map(str, shape)), steps=steps, mesh="1x1",
                rows=rows)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

# Ordered smallest-footprint first: the 32768x16384 tiled shapes run LAST
# so a worker OOM there cannot poison the rest of the battery (the first
# r3 battery lost 8 experiments to exactly that cascade).
BATTERY = [
    "tunnel-rates", "maze-chunk", "maze-solve", "batched-solve",
    "batched-goals", "batched-map", "vol-update", "vol-solve",
    "wideplane-update", "wideplane-solve", "biggrid-update",
    "biggrid-solve", "biggrid-converge", "solve-body-iso", "sharded-banded",
    "sharded-resident", "sharded-solve", "sharded-converge", "sharded3d-banded",
    "sharded3d-resident", "sharded3d-solve", "sharded3d-zresident",
    "mesh-planner", "mesh-planner3d", "tiled-solve", "tiled-converge", "tiled-update",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exps", nargs="*", help="experiment names, or 'all'")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes (smoke of the harness itself)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the ambient env pins a "
                         "tunnelled TPU; env vars set late cannot switch)")
    ap.add_argument("--out", default=None, help="append JSON lines here too")
    ap.add_argument("--isolate", action="store_true",
                    help="run each experiment in its own subprocess (a "
                         "worker OOM cannot wedge the rest of the battery; "
                         "costs one remote-compile warmup per experiment)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.list or not args.exps:
        for name in BATTERY:
            fn, doc, ref = EXPERIMENTS[name]
            print(f"{name:18s} [{ref}] {' '.join(doc.split())[:90]}")
        return

    names = BATTERY if args.exps == ["all"] else args.exps

    if args.isolate:
        import subprocess

        for name in names:
            cmd = [sys.executable, __file__, name]
            cmd += ["--quick"] if args.quick else []
            cmd += ["--cpu"] if args.cpu else []
            cmd += ["--out", args.out] if args.out else []
            subprocess.run(cmd)  # one TPU client at a time; serialized
        return

    import gc

    import jax

    sink = open(args.out, "a") if args.out else None
    for name in names:
        fn, _, ref = EXPERIMENTS[name]
        t0 = time.perf_counter()
        try:
            res = fn(args.quick)
            res = dict(exp=name, backend=jax.default_backend(),
                       wall_s=round(time.perf_counter() - t0, 1), **res)
        except Exception as e:  # keep the battery going
            res = dict(exp=name, backend=jax.default_backend(),
                       error=f"{type(e).__name__}: {e}")
        gc.collect()  # drop device buffers before the next experiment
        line = json.dumps(res)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()
    if sink:
        sink.close()


if __name__ == "__main__":
    main()
