"""Legacy SOR twins + the paper's headline comparison: log-space keeps
streamline validity where linear-space float collapses."""

import numpy as np
import pytest

import jax.numpy as jnp

import epic_tpu
from epic_tpu import analysis, maps
from epic_tpu.errors import InvalidLocationError
from epic_tpu.solver import core, legacy


def test_from_image_conventions():
    img = maps.open_room(8, 8, goal=(4, 4))
    u, locked = legacy.from_image(img)
    assert u[4, 4] == 0.0 and locked[4, 4]
    assert u[2, 2] == 1.0 and not locked[2, 2]
    assert u[0, 0] == 1.0 and locked[0, 0]
    uf, _ = legacy.from_image(img, flipped=True)
    assert uf[4, 4] == 1.0 and uf[2, 2] == 0.0


def test_red_black_jax_reaches_same_fixed_point():
    img = maps.open_room(24, 24)
    u, locked = legacy.from_image(img, dtype=np.float32)
    u_ref, _ = legacy.sor_numpy(u.copy(), locked, epsilon=1e-6,
                                min_iterations=2000, max_iterations=4000)
    u_jax, iters, delta = legacy.sor_red_black_jax(
        jnp.asarray(u), jnp.asarray(locked), 1e-6, min_iterations=2000,
        max_iterations=4000,
    )
    np.testing.assert_allclose(np.asarray(u_jax), u_ref, atol=1e-4)


def test_legacy_path_descends_to_goal():
    img = maps.open_room(32, 32, goal=(24, 16))
    u, locked = legacy.from_image(img)
    u_solved, _ = legacy.sor(u, locked, epsilon=1e-6, min_iterations=3000)
    pts = legacy.compute_path(u_solved, locked, 5.0, 5.0, 0.2, 0.4,
                              mode="bilinear")
    ex, ey = pts[-1]
    assert abs(ex - 24) < 2 and abs(ey - 16) < 2


def test_legacy_path_flipped_ascends():
    img = maps.open_room(32, 32, goal=(24, 16))
    u, locked = legacy.from_image(img, flipped=True)
    # Flipped: goals hold 1.0; relax the complementary field.
    u_solved, _ = legacy.sor(u, locked, epsilon=1e-6, min_iterations=3000)
    pts = legacy.compute_path(u_solved, locked, 5.0, 5.0, 0.2, 0.4,
                              flipped=True, mode="bilinear")
    ex, ey = pts[-1]
    assert abs(ex - 24) < 2 and abs(ey - 16) < 2


def test_legacy_path_start_in_obstacle_rejected():
    img = maps.open_room(16, 16)
    u, locked = legacy.from_image(img)
    with pytest.raises(InvalidLocationError):
        legacy.compute_path(u, locked, 0.0, 0.0)


def test_log_space_keeps_validity_where_float_sor_collapses():
    # The IROS paper's core claim, reproduced end-to-end: same maze, f32
    # linear SOR loses a large fraction of valid cells; the log-space solver
    # keeps essentially all of them.
    img = maps.recursive_maze(140, 140, seed=1, corridor=8)
    goal = img == 255

    u32, locked = legacy.from_image(img, dtype=np.float32)
    sor32, _ = legacy.sor(u32, locked, epsilon=1e-4, min_iterations=20000,
                          dtype=np.float32)
    pv_sor32 = analysis.percent_valid(sor32, locked, goal)

    st = epic_tpu.from_occupancy_image(img, epsilon=1e-4)
    out = core.solve(st)
    u_log = np.asarray(out.u)
    # Log-space validity: gradient of the log-potential never underflows on
    # reachable cells; use the same percent-valid machinery.
    pv_log = analysis.percent_valid(u_log, np.asarray(out.locked), goal,
                                    gradient_threshold=1e-10)
    assert pv_log > 0.99, pv_log
    assert pv_log > pv_sor32 + 0.2, (pv_log, pv_sor32)
