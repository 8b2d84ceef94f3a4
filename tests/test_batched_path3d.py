"""Batched on-device 3D streamline walker vs the host 3D walker (path3d)."""

import jax.numpy as jnp
import numpy as np

import epic_tpu
from epic_tpu import path3d
from epic_tpu.solver import batched_path3d, core


def _solved_volume(d=16, h=40, w=48, eps=1e-3, seed=0, density=0.08):
    rng = np.random.default_rng(seed)
    img = np.full((d, h, w), 128, np.uint8)
    img[rng.random((d, h, w)) < density] = 0
    img[d // 2, h // 2, w // 2] = 255
    out = core.solve(epic_tpu.from_occupancy_volume(img, epsilon=eps))
    return np.asarray(out.u), np.asarray(out.locked)


def test_batched3d_matches_host_walker():
    u, locked = _solved_volume()
    d, h, w = u.shape
    starts = np.array(
        [[4.0, 4.0, 3.0], [w - 5.0, h - 5.0, d - 4.0], [6.0, h - 6.0, 4.0]],
        np.float32,
    )
    out = batched_path3d.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
        step_size=0.2, cd_precision=0.4, max_steps=2048,
    )
    for lane in range(len(starts)):
        try:
            host = path3d.compute_path(
                u, locked, float(starts[lane, 0]), float(starts[lane, 1]),
                float(starts[lane, 2]), step_size=0.2, cd_precision=0.4,
            )
        except Exception:
            continue
        n = int(out["lengths"][lane])
        dev = np.asarray(out["positions"])[lane, :n]
        m = min(n, len(host))
        assert abs(n - len(host)) <= 2
        # The device norm is f32 (the host accumulates in f64); the walks
        # follow the same streamline but drift measurably after ~hundreds of
        # chaotic steps — pin the prefix tightly and the outcome exactly.
        k = min(m - 1, 150)
        np.testing.assert_allclose(dev[:k], host[:k], atol=2e-2)
        assert bool(out["reached_goal"][lane]) == path3d.path_reaches_goal(
            u, locked, host
        )


def test_batched3d_goal_rate_open_volume():
    u, locked = _solved_volume(d=12, h=32, w=32, density=0.0)
    d, h, w = u.shape
    rng = np.random.default_rng(1)
    free = np.argwhere(~locked)
    idx = rng.choice(len(free), 64, replace=False)
    starts = free[idx][:, ::-1].astype(np.float32)  # (z,y,x) -> (x,y,z)
    out = batched_path3d.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
        step_size=0.2, cd_precision=0.4, max_steps=4096,
    )
    rate = float(jnp.mean(out["reached_goal"]))
    assert rate >= 0.9, rate


def test_batched3d_invalid_starts_never_move():
    u, locked = _solved_volume(d=10, h=24, w=24, density=0.0, eps=1e-2)
    starts = np.array(
        [[0.0, 0.0, 0.0], [-3.0, 5.0, 5.0], [500.0, 2.0, 2.0]], np.float32
    )
    out = batched_path3d.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts), max_steps=32
    )
    assert bool(jnp.all(out["lengths"] == 1))
    assert bool(jnp.all(~out["reached_goal"]))


def test_volume_planner_batch_api():
    """VolumePlanner.compute_paths_batch: per-lane contract + endpoints agree
    with the scalar ComputePath verb."""
    from epic_tpu.planner3d import VolumePlanner, VolumePlannerConfig

    d, h, w = 12, 20, 24
    vol = np.zeros((d, h, w), dtype=np.int8)
    pl = VolumePlanner(VolumePlannerConfig(epsilon=1e-2))
    pl.update_occupancy(vol)
    assert pl.add_goals([(12.0, 10.0, 6.0)])
    pl.solve()

    starts = [(4.0, 4.0, 3.0), (20.0, 16.0, 9.0), (-5.0, 0.0, 0.0)]
    batch = pl.compute_paths_batch(starts, step_size=0.2, cd_precision=0.4)
    assert batch[2] is None
    for i in range(2):
        assert batch[i] is not None and len(batch[i]) > 2
        solo = pl.compute_path(starts[i], step_size=0.2, cd_precision=0.4)
        np.testing.assert_allclose(
            [batch[i][-1].x, batch[i][-1].y, batch[i][-1].z],
            [solo[-1].x, solo[-1].y, solo[-1].z], atol=0.5)
