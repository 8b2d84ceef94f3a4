"""Batched scenario solves: per-lane results equal solo solves."""

import numpy as np
import jax.numpy as jnp

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import batched, core


def test_batch_lanes_match_solo_solves():
    base = maps.random_obstacles(24, 32, density=0.15, seed=7)
    goal_sets = [[(5, 5)], [(25, 18)], [(5, 5), (25, 18)], [(16, 12)]]
    u, locked = batched.batch_from_goal_sets(base, goal_sets)
    u_host = np.asarray(u)  # snapshot: solve_batch donates its input buffer
    u_out, iters, deltas, converged = batched.solve_batch(
        u, locked, epsilon=1e-2, stagger=10
    )
    assert bool(jnp.all(converged))
    for lane in range(len(goal_sets)):
        st = epic_tpu.make_state(
            u_host[lane], np.asarray(locked)[lane], epsilon=1e-2
        )
        solo = core.solve(st, stagger=10)
        assert int(iters[lane]) == int(solo.iteration), f"lane {lane}"
        np.testing.assert_allclose(
            np.asarray(u_out)[lane], np.asarray(solo.u), rtol=2e-6, atol=1e-3
        )


def test_batch_early_retiring_lane_freezes():
    # Lane 0: no goals -> flat field retires at iteration m_max-rounded;
    # lane 1: a real scenario that needs longer. Lane 0's field must stay
    # exactly flat after retirement.
    base = maps.open_room(24, 24)
    base[base == 255] = 128  # strip the generator's goal
    u, locked = batched.batch_from_goal_sets(base, [[], [(12, 12)]])
    u_out, iters, deltas, converged = batched.solve_batch(
        u, locked, epsilon=1e-3, stagger=10
    )
    assert bool(jnp.all(converged))
    assert int(iters[0]) <= int(iters[1])
    flat = np.asarray(u_out)[0][1:-1, 1:-1]
    assert np.all(flat == np.float32(-1e6))


def test_update_n_batch_matches_solo():
    base = maps.random_obstacles(16, 20, density=0.1, seed=2)
    u, locked = batched.batch_from_goal_sets(base, [[(4, 4)], [(15, 10)]])
    u_host = np.asarray(u)
    u_out, deltas = batched.update_n_batch(u, locked, jnp.int32(0), 5)
    for lane in range(2):
        st = epic_tpu.make_state(u_host[lane], np.asarray(locked)[lane])
        solo = core.update_n(st, 5)
        np.testing.assert_allclose(
            np.asarray(u_out)[lane], np.asarray(solo.u), rtol=2e-6, atol=1e-4
        )
        np.testing.assert_allclose(
            float(deltas[lane]), float(solo.delta), rtol=1e-5, atol=1e-6
        )


def test_goals_in_obstacles_skipped():
    base = maps.open_room(16, 16)
    base[8, 8] = 0  # obstacle
    u, locked = batched.batch_from_goal_sets(base, [[(8, 8), (4, 4)]])
    assert float(u[0, 8, 8]) == float(epic_tpu.constants.LOG_SPACE_OBSTACLE)
    assert float(u[0, 4, 4]) == 0.0
