"""Timers and throughput counters (SURVEY §5 "tracing/profiling").

The reference returns (wall, cpu) timing pairs from ``Harmonic.solve``
(harmonic.py:80-98) and derives per-update time as total/iterations
(batch.py:142,154). This module generalises that: ``SolveStats`` wraps a
solve with wall/CPU timers and derives sweeps/s and cell-updates/s; ``trace``
hooks the JAX profiler for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class SolveStats:
    wall_s: float
    cpu_s: float
    iterations: int
    cells: int

    @property
    def time_per_update(self) -> float:
        """Seconds per sweep — the reference's 'Time per Update' column."""
        return self.wall_s / max(self.iterations, 1)

    @property
    def sweeps_per_s(self) -> float:
        return self.iterations / self.wall_s if self.wall_s > 0 else float("inf")

    @property
    def cell_updates_per_s(self) -> float:
        """One update = one parity cell per sweep = half the cells."""
        return self.cells / 2 * self.sweeps_per_s


@contextlib.contextmanager
def timed(result: dict):
    """Context manager filling ``result`` with wall/cpu seconds."""
    t0, c0 = time.perf_counter(), time.process_time()
    try:
        yield
    finally:
        result["wall_s"] = time.perf_counter() - t0
        result["cpu_s"] = time.process_time() - c0


def timed_solve(solve_fn, state, **kwargs) -> tuple[object, SolveStats]:
    """Run ``solve_fn(state, **kwargs)``, blocking on the result, and return
    (out_state, SolveStats)."""
    h_w = 1
    for d in state.u.shape:
        h_w *= d
    res: dict = {}
    with timed(res):
        out = solve_fn(state, **kwargs)
        out.u.block_until_ready()
    return out, SolveStats(
        wall_s=res["wall_s"],
        cpu_s=res["cpu_s"],
        iterations=int(out.iteration),
        cells=h_w,
    )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/epic_tpu_trace"):
    """JAX profiler trace around a block (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
