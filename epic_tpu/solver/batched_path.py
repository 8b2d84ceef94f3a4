"""Batched on-device streamline extraction: B walkers in lockstep.

The reference extracts one path at a time in a scalar CPU loop
(harmonic_path_cpu.cpp:154-221) — fine for a single replan, hopeless for
thousands of scenario rollouts. This walker runs B gradient-ascent
streamlines simultaneously as one jitted program: per step, a batched
bilinear gather + central-difference gradient + unit step, with per-lane
termination (locked cell reached / stuck against a 5-point ring buffer /
step budget) exactly mirroring the host walker's rules.

Semantics per lane match :func:`epic_tpu.path.compute_path` with
``mode="bilinear"`` (the non-extrapolating interpolation; the host-exact
"reference" corner selection is also available). Lanes that terminate keep
their final position; outputs are the trajectory tensor, per-lane lengths,
and a reached-goal flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C


def _corners(x, y, h, w, mode: str):
    if mode == "bilinear":
        xl = jnp.clip(x.astype(jnp.int32), 0, w - 2)
        yl = jnp.clip(y.astype(jnp.int32), 0, h - 2)
        xr, yb = xl + 1, yl + 1
    elif mode == "reference":
        # Truncation of (v - 0.5) toward zero, clamped at 0 — may give
        # alpha/beta > 1 (the reference's extrapolation quirk).
        xl = jnp.maximum((x - 0.5).astype(jnp.int32), 0)
        yl = jnp.maximum((y - 0.5).astype(jnp.int32), 0)
        xr = jnp.clip((x + 0.5).astype(jnp.int32), 0, w - 1)
        yb = jnp.clip((y + 0.5).astype(jnp.int32), 0, h - 1)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return xl, yl, xr, yb


def _potential(u, x, y, mode: str):
    """Batched interpolated potential; x, y: f32[B]."""
    h, w = u.shape
    xl, yl, xr, yb = _corners(x, y, h, w, mode)
    alpha = x - xl.astype(jnp.float32)
    beta = y - yl.astype(jnp.float32)
    top = (1.0 - alpha) * u[yl, xl] + alpha * u[yl, xr]
    bot = (1.0 - alpha) * u[yb, xl] + alpha * u[yb, xr]
    return (1.0 - beta) * top + beta * bot


def _cell_index(v):
    return (v + 0.5).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("max_steps", "mode", "record_trajectories"),
)
def walk(
    u: jax.Array,
    locked: jax.Array,
    starts: jax.Array,
    step_size: float = C.DEFAULT_STEP_SIZE,
    cd_precision: float = C.DEFAULT_CD_PRECISION,
    max_steps: int = 2048,
    mode: str = "bilinear",
    record_trajectories: bool = True,
):
    """Walk B streamlines on device.

    Args:
      u: f32[H, W] solved log-potential.
      locked: bool[H, W].
      starts: f32[B, 2] (x, y) start positions.

    Returns a dict:
      positions: f32[B, max_steps + 1, 2] (only when record_trajectories;
        padded by repeating the final position),
      lengths: i32[B] number of recorded points per lane (>= 1),
      reached_goal: bool[B] ended in a locked cell with u == 0,
      terminated: bool[B] lane stopped before the step budget.
    """
    h, w = u.shape
    b = starts.shape[0]
    x = starts[:, 0].astype(jnp.float32)
    y = starts[:, 1].astype(jnp.float32)

    def in_bounds(xc, yc):
        return (xc >= 0) & (yc >= 0) & (xc < w) & (yc < h)

    def cell_locked(xc, yc):
        xs = jnp.clip(xc, 0, w - 1)
        ys = jnp.clip(yc, 0, h - 1)
        return locked[ys, xs]

    xc, yc = _cell_index(x), _cell_index(y)
    # Invalid starts (off-map or obstacle cell) never walk.
    start_obstacle = cell_locked(xc, yc) & (
        u[jnp.clip(yc, 0, h - 1), jnp.clip(xc, 0, w - 1)] < 0.0
    )
    active0 = in_bounds(xc, yc) & ~start_obstacle & ~cell_locked(xc, yc)

    # Ring of the last 5 points (newest first), matching the host walker's
    # stuck window (points n-2 .. n-6). +inf rows: no spurious hits before
    # 5 real entries exist.
    history0 = jnp.full(
        (b, C.PATH_STUCK_HISTORY_LENGTH, 2), jnp.inf, jnp.float32
    )
    history0 = history0.at[:, 0, :].set(jnp.stack([x, y], -1))

    if record_trajectories:
        traj0 = jnp.zeros((b, max_steps + 1, 2), jnp.float32)
        traj0 = traj0.at[:, 0, 0].set(x).at[:, 0, 1].set(y)
    else:
        traj0 = jnp.zeros((b, 1, 2), jnp.float32)

    def body(k, carry):
        x, y, active, lengths, history, traj = carry
        cd = jnp.float32(cd_precision)
        v0 = _potential(u, x - cd, y, mode)
        v1 = _potential(u, x + cd, y, mode)
        v2 = _potential(u, x, y - cd, mode)
        v3 = _potential(u, x, y + cd, mode)
        gx = (v1 - v0) / (2.0 * cd)
        gy = (v3 - v2) / (2.0 * cd)
        norm = jnp.sqrt(gx * gx + gy * gy)
        grad_ok = (norm > 0.0) & jnp.isfinite(norm)
        safe = jnp.where(grad_ok, norm, 1.0)
        nx = x + gx / safe * step_size
        ny = y + gy / safe * step_size

        stepped = active & grad_ok
        nx = jnp.where(stepped, nx, x)
        ny = jnp.where(stepped, ny, y)

        # Stuck: new point within step/2 of any of the last 5 points.
        pos = jnp.stack([nx, ny], -1)
        dist = jnp.linalg.norm(history - pos[:, None, :], axis=-1)
        stuck = jnp.any(dist < step_size / 2.0, axis=1)

        xc, yc = _cell_index(nx), _cell_index(ny)
        off = ~in_bounds(xc, yc)
        hit_locked = cell_locked(xc, yc)

        lengths = jnp.where(stepped, lengths + 1, lengths)
        if record_trajectories:
            traj = traj.at[jnp.arange(b), jnp.clip(lengths, 0, max_steps), 0].set(nx)
            traj = traj.at[jnp.arange(b), jnp.clip(lengths, 0, max_steps), 1].set(ny)

        # Shift history ring (newest first). Inactive lanes push their frozen
        # position, which cannot change their (already final) outcome.
        history = jnp.concatenate([pos[:, None, :], history[:, :-1, :]], axis=1)

        active = stepped & ~stuck & ~off & ~hit_locked
        return nx, ny, active, lengths, history, traj

    x, y, active, lengths, history, traj = jax.lax.fori_loop(
        0,
        max_steps,
        body,
        (x, y, active0, jnp.zeros((b,), jnp.int32), history0, traj0),
    )

    xc = jnp.clip(_cell_index(x), 0, w - 1)
    yc = jnp.clip(_cell_index(y), 0, h - 1)
    reached_goal = locked[yc, xc] & (u[yc, xc] == 0.0)

    out = {
        "lengths": lengths + 1,
        "reached_goal": reached_goal,
        "terminated": ~active,
        "end_xy": jnp.stack([x, y], -1),
    }
    if record_trajectories:
        # Pad the tail with the final position for clean downstream use.
        steps = jnp.arange(max_steps + 1)[None, :]
        mask = steps < (lengths + 1)[:, None]
        final = jnp.stack([x, y], -1)[:, None, :]
        out["positions"] = jnp.where(mask[:, :, None], traj, final)
    return out
