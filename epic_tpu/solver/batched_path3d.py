"""Batched on-device 3D streamline extraction: B walkers in lockstep.

The 3D analogue of :mod:`epic_tpu.solver.batched_path`, with the semantics
of the host 3D walker (:mod:`epic_tpu.path3d` — itself an epic_tpu
extension: the reference has a 3D solver but no 3D path extraction,
harmonic_path_cpu.cpp is 2D-only). Per step: batched trilinear gather over
``u[z, y, x]``, central-difference gradient on all three axes, unit step,
per-lane termination (locked cell / 5-point stuck ring / budget).

Interpolation is the fixed (never-extrapolating) variant throughout — the
``mode="reference"`` quirk is a 2D behaviour with no 3D reference twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import constants as C


def _potential(u, x, y, z):
    """Batched trilinear potential; x, y, z: f32[B] over u[D, H, W]."""
    d, h, w = u.shape
    x0 = jnp.clip(x.astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(y.astype(jnp.int32), 0, h - 2)
    z0 = jnp.clip(z.astype(jnp.int32), 0, d - 2)
    a = x - x0.astype(jnp.float32)
    b = y - y0.astype(jnp.float32)
    c = z - z0.astype(jnp.float32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
    one = jnp.float32(1.0)
    c00 = (one - a) * u[z0, y0, x0] + a * u[z0, y0, x1]
    c01 = (one - a) * u[z0, y1, x0] + a * u[z0, y1, x1]
    c10 = (one - a) * u[z1, y0, x0] + a * u[z1, y0, x1]
    c11 = (one - a) * u[z1, y1, x0] + a * u[z1, y1, x1]
    c0 = (one - b) * c00 + b * c01
    c1 = (one - b) * c10 + b * c11
    return (one - c) * c0 + c * c1


def _cell_index(v):
    return (v + 0.5).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("max_steps", "record_trajectories")
)
def walk(
    u: jax.Array,
    locked: jax.Array,
    starts: jax.Array,
    step_size: float = C.DEFAULT_STEP_SIZE,
    cd_precision: float = C.DEFAULT_CD_PRECISION,
    max_steps: int = 2048,
    record_trajectories: bool = True,
):
    """Walk B 3D streamlines on device.

    Args:
      u: f32[D, H, W] solved log-potential volume.
      locked: bool[D, H, W].
      starts: f32[B, 3] (x, y, z) start positions.

    Returns a dict: lengths i32[B], reached_goal bool[B], terminated
    bool[B], end_xyz f32[B, 3], and (when record_trajectories)
    positions f32[B, max_steps + 1, 3] padded with the final position.
    """
    d, h, w = u.shape
    b = starts.shape[0]
    x = starts[:, 0].astype(jnp.float32)
    y = starts[:, 1].astype(jnp.float32)
    z = starts[:, 2].astype(jnp.float32)

    def in_bounds(xc, yc, zc):
        return (xc >= 0) & (yc >= 0) & (zc >= 0) & \
            (xc < w) & (yc < h) & (zc < d)

    def cell_locked(xc, yc, zc):
        xs = jnp.clip(xc, 0, w - 1)
        ys = jnp.clip(yc, 0, h - 1)
        zs = jnp.clip(zc, 0, d - 1)
        return locked[zs, ys, xs]

    xc, yc, zc = _cell_index(x), _cell_index(y), _cell_index(z)
    active0 = in_bounds(xc, yc, zc) & ~cell_locked(xc, yc, zc)

    history0 = jnp.full(
        (b, C.PATH_STUCK_HISTORY_LENGTH, 3), jnp.inf, jnp.float32
    )
    history0 = history0.at[:, 0, :].set(jnp.stack([x, y, z], -1))

    if record_trajectories:
        traj0 = jnp.zeros((b, max_steps + 1, 3), jnp.float32)
        traj0 = traj0.at[:, 0, 0].set(x).at[:, 0, 1].set(y).at[:, 0, 2].set(z)
    else:
        traj0 = jnp.zeros((b, 1, 3), jnp.float32)

    def body(k, carry):
        x, y, z, active, lengths, history, traj = carry
        cd = jnp.float32(cd_precision)
        gx = (_potential(u, x + cd, y, z) - _potential(u, x - cd, y, z)) / (2.0 * cd)
        gy = (_potential(u, x, y + cd, z) - _potential(u, x, y - cd, z)) / (2.0 * cd)
        gz = (_potential(u, x, y, z + cd) - _potential(u, x, y, z - cd)) / (2.0 * cd)
        norm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
        grad_ok = (norm > 0.0) & jnp.isfinite(norm)
        safe = jnp.where(grad_ok, norm, 1.0)
        nx = x + gx / safe * step_size
        ny = y + gy / safe * step_size
        nz = z + gz / safe * step_size

        stepped = active & grad_ok
        nx = jnp.where(stepped, nx, x)
        ny = jnp.where(stepped, ny, y)
        nz = jnp.where(stepped, nz, z)

        pos = jnp.stack([nx, ny, nz], -1)
        dist = jnp.linalg.norm(history - pos[:, None, :], axis=-1)
        stuck = jnp.any(dist < step_size / 2.0, axis=1)

        xc, yc, zc = _cell_index(nx), _cell_index(ny), _cell_index(nz)
        off = ~in_bounds(xc, yc, zc)
        hit_locked = cell_locked(xc, yc, zc)

        lengths = jnp.where(stepped, lengths + 1, lengths)
        if record_trajectories:
            idx = jnp.clip(lengths, 0, max_steps)
            lane = jnp.arange(b)
            traj = traj.at[lane, idx, 0].set(nx)
            traj = traj.at[lane, idx, 1].set(ny)
            traj = traj.at[lane, idx, 2].set(nz)

        history = jnp.concatenate([pos[:, None, :], history[:, :-1, :]], axis=1)

        active = stepped & ~stuck & ~off & ~hit_locked
        return nx, ny, nz, active, lengths, history, traj

    x, y, z, active, lengths, history, traj = jax.lax.fori_loop(
        0, max_steps, body,
        (x, y, z, active0, jnp.zeros((b,), jnp.int32), history0, traj0),
    )

    xc = jnp.clip(_cell_index(x), 0, w - 1)
    yc = jnp.clip(_cell_index(y), 0, h - 1)
    zc = jnp.clip(_cell_index(z), 0, d - 1)
    reached_goal = locked[zc, yc, xc] & (u[zc, yc, xc] == 0.0)

    out = {
        "lengths": lengths + 1,
        "reached_goal": reached_goal,
        "terminated": ~active,
        "end_xyz": jnp.stack([x, y, z], -1),
    }
    if record_trajectories:
        steps = jnp.arange(max_steps + 1)[None, :]
        mask = steps < (lengths + 1)[:, None]
        final = jnp.stack([x, y, z], -1)[:, None, :]
        out["positions"] = jnp.where(mask[:, :, None], traj, final)
    return out
