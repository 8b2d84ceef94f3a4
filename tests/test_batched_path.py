"""Batched on-device streamline walker vs the host walker."""

import numpy as np
import jax.numpy as jnp

import epic_tpu
from epic_tpu import maps, path
from epic_tpu.solver import batched_path, core


def _solved(img, eps=1e-3):
    out = core.solve(epic_tpu.from_occupancy_image(img, epsilon=eps))
    return np.asarray(out.u), np.asarray(out.locked)


def test_batched_walk_matches_host_walker():
    img = maps.open_room(48, 64, goal=(50, 30))
    u, locked = _solved(img)
    starts = np.array([[5.0, 5.0], [40.0, 40.0], [10.0, 40.0]], np.float32)
    out = batched_path.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
        step_size=0.2, cd_precision=0.4, max_steps=1024, mode="bilinear",
    )
    assert bool(jnp.all(out["reached_goal"]))
    for lane in range(len(starts)):
        host = path.compute_path(
            u, locked, float(starts[lane, 0]), float(starts[lane, 1]),
            0.2, 0.4, mode="bilinear",
        )
        n = int(out["lengths"][lane])
        dev = np.asarray(out["positions"])[lane, :n]
        assert abs(n - len(host)) <= 1
        m = min(n, len(host))
        np.testing.assert_allclose(dev[:m], host[:m], atol=2e-2)


def test_batched_walk_maze_goal_rate():
    img = maps.recursive_maze(96, 96, seed=2)
    u, locked = _solved(img)
    ys, xs = np.nonzero(img == 128)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ys), 128, replace=False)
    starts = np.stack([xs[idx], ys[idx]], -1).astype(np.float32)
    out = batched_path.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
        step_size=0.2, cd_precision=0.4, max_steps=4096, mode="bilinear",
    )
    rate = float(jnp.mean(out["reached_goal"]))
    assert rate >= 0.85, rate


def test_batched_walk_invalid_starts_never_move():
    img = maps.open_room(32, 32)
    u, locked = _solved(img, eps=1e-2)
    starts = np.array([[0.0, 0.0], [-5.0, 3.0], [500.0, 2.0]], np.float32)
    out = batched_path.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
        max_steps=64,
    )
    assert bool(jnp.all(out["lengths"] == 1))
    assert bool(jnp.all(~out["reached_goal"][1:]))


def test_batched_walk_endpoints_only_mode():
    img = maps.open_room(40, 40)
    u, locked = _solved(img)
    starts = np.array([[5.0, 5.0], [30.0, 8.0]], np.float32)
    out = batched_path.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
        max_steps=1024, record_trajectories=False,
    )
    assert "positions" not in out
    assert bool(jnp.all(out["reached_goal"]))


def test_batched_walk_reference_mode_matches_host():
    # The extrapolating "reference" corner selection on device vs host.
    img = maps.open_room(48, 64, goal=(50, 30))
    u, locked = _solved(img)
    starts = np.array([[5.0, 5.0], [40.0, 12.0]], np.float32)
    out = batched_path.walk(
        jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
        step_size=0.2, cd_precision=0.4, max_steps=1024, mode="reference",
    )
    for lane in range(len(starts)):
        host = path.compute_path(
            u, locked, float(starts[lane, 0]), float(starts[lane, 1]),
            0.2, 0.4, mode="reference", impl="numpy",
        )
        n = int(out["lengths"][lane])
        dev = np.asarray(out["positions"])[lane, :n]
        m = min(n, len(host))
        np.testing.assert_allclose(dev[:m], host[:m], atol=5e-2)


def test_batched_walk_reference_mode_fuzz_grids():
    """Reference-mode (extrapolating) corner selection on random grids:
    device lanes must track the host reference walker step for step until
    f32-vs-f64 norm rounding legitimately diverges near walls (ROADMAP #8)."""
    rng = np.random.default_rng(5)
    for seed in (0, 1, 2):
        img = maps.random_obstacles(40, 56, density=0.12, seed=seed)
        u, locked = _solved(img, eps=1e-3)
        free_ys, free_xs = np.nonzero(~locked)
        idx = rng.choice(len(free_ys), 12, replace=False)
        starts = np.stack([free_xs[idx], free_ys[idx]], -1).astype(np.float32)
        out = batched_path.walk(
            jnp.asarray(u), jnp.asarray(locked), jnp.asarray(starts),
            step_size=0.2, cd_precision=0.4, max_steps=2048, mode="reference",
        )
        agree = 0
        compared = 0
        for lane in range(len(starts)):
            try:
                host = path.compute_path(
                    u, locked, float(starts[lane, 0]), float(starts[lane, 1]),
                    0.2, 0.4, mode="reference", impl="numpy",
                )
            except Exception:
                continue
            n = int(out["lengths"][lane])
            dev = np.asarray(out["positions"])[lane, :n]
            m = min(n, len(host), 48)
            if m >= 3:
                np.testing.assert_allclose(
                    dev[:m], host[:m], atol=5e-2,
                    err_msg=f"seed {seed} lane {lane}",
                )
                compared += 1
            host_reached = path.path_reaches_goal(u, locked, host)
            if bool(out["reached_goal"][lane]) == bool(host_reached):
                agree += 1
        assert compared >= 6, f"seed {seed}: too few comparable lanes"
        assert agree >= 0.75 * len(starts), f"seed {seed}: reach-flag agreement"
