"""Device-built distinct-goal collages == host-materialized batches
(SURVEY §7 Phase 2's (goal-mask, obstacle-delta) axes on one shared base
grid; VERDICT r3 item 8). The builder must be BIT-equal to pad_batch over
batched.batch_from_goal_sets — it changes where the collage is built (one
base upload + index arrays instead of B full grids), not what it holds."""

import numpy as np
import jax.numpy as jnp

from epic_tpu import maps
from epic_tpu.solver import batched, pallas_batched


def _base(h=24, w=32, seed=7):
    img = maps.random_obstacles(h, w, density=0.15, seed=seed)
    u = np.where(img == 0, np.float32(-1e6), np.float32(-1e6))
    locked = img == 0
    return u, locked


def _goal_xy(goal_sets, pad_to=None):
    g = max(len(s) for s in goal_sets) if pad_to is None else pad_to
    out = np.full((len(goal_sets), g, 2), -1, np.int32)
    for i, s in enumerate(goal_sets):
        for j, (x, y) in enumerate(s):
            out[i, j] = (x, y)
    return out


def test_goal_collage_bit_equals_host_built():
    img = maps.random_obstacles(24, 32, density=0.15, seed=7)
    goal_sets = [[(5, 5)], [(25, 18)], [(5, 5), (25, 18)]]
    u, locked = batched.batch_from_goal_sets(img, goal_sets)
    u_ref, f_ref, meta_ref = pallas_batched.pad_batch(
        np.asarray(u), np.asarray(locked))

    base_u = np.full(img.shape, np.float32(-1e6))
    base_locked = img == 0
    u_dev, f_dev, meta = pallas_batched.make_goal_batch(
        base_u, base_locked, _goal_xy(goal_sets))
    assert meta == meta_ref
    np.testing.assert_array_equal(np.asarray(u_dev), np.asarray(u_ref))
    np.testing.assert_array_equal(np.asarray(f_dev), np.asarray(f_ref))


def test_solve_batch_goals_matches_device_solve():
    img = maps.random_obstacles(24, 32, density=0.1, seed=3)
    goal_sets = [[(5, 5)], [(25, 18)], [(5, 5), (25, 18)], [(10, 12)]]
    u, locked = batched.batch_from_goal_sets(img, goal_sets)
    u1, it1, d1, c1 = pallas_batched.solve_batch_device(
        np.asarray(u), np.asarray(locked), epsilon=1e-2, stagger=10)

    base_u = np.full(img.shape, np.float32(-1e6))
    u2, it2, d2, c2 = pallas_batched.solve_batch_goals(
        base_u, img == 0, _goal_xy(goal_sets), epsilon=1e-2, stagger=10)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(it1, it2)
    np.testing.assert_array_equal(c1, c2)
    assert c2.all()


def test_obstacle_deltas_and_goal_priority():
    """Per-lane obstacle deltas apply; a goal at the same cell wins (the
    set_cells last-wins order); -1 padding is dropped, not wrapped."""
    base_u, base_locked = _base()
    goal_xy = _goal_xy([[(5, 5)], [(5, 5)]])
    obstacle_xy = np.array(
        [[[10, 10], [-1, -1]],     # one obstacle + ragged pad
         [[5, 5], [11, 10]]],      # first collides with the goal
        np.int32)
    u_c, f_c, meta = pallas_batched.make_goal_batch(
        base_u, base_locked, goal_xy, obstacle_xy)
    lanes_u = pallas_batched.unstack(u_c, meta)
    arr_f = np.asarray(f_c)
    lanes_f = pallas_batched.unstack(
        jnp.asarray(arr_f, jnp.float32), meta)
    # lane 0: obstacle at (10,10), goal at (5,5)
    assert lanes_u[0, 10, 10] == np.float32(-1e6) and lanes_f[0, 10, 10] == 1
    assert lanes_u[0, 5, 5] == 0.0
    # lane 1: goal overrides the colliding obstacle
    assert lanes_u[1, 5, 5] == 0.0 and lanes_f[1, 5, 5] == 1
    assert lanes_u[1, 10, 11] == np.float32(-1e6)
    # -1 padding wrote nowhere: lane 0's far corner is untouched base
    hp8, wp = meta["hp8"], meta["wp"]
    blk = np.asarray(u_c)[:hp8, :wp]
    assert blk[hp8 - 1, wp - 1] == np.float32(-1e6)


def test_out_of_logical_range_coords_dropped():
    """Positive coords beyond the LOGICAL map extent are dropped even when
    they land inside the padded tile (ADVICE r4): the collage bytes equal
    a collage built without the bad coords."""
    base_u, base_locked = _base()
    h, w = base_u.shape
    goal_xy = _goal_xy([[(5, 5)], [(6, 6)]])
    # In-pad but out-of-logical obstacle coords: x in [w, wp), y in [h, hp8).
    obstacle_xy = np.array(
        [[[w, 1], [w + 1, 2]],
         [[1, h], [3, h + 1]]], np.int32)
    u_bad, f_bad, _ = pallas_batched.make_goal_batch(
        base_u, base_locked, goal_xy, obstacle_xy)
    u_ref, f_ref, _ = pallas_batched.make_goal_batch(
        base_u, base_locked, goal_xy,
        np.full_like(obstacle_xy, -1))
    np.testing.assert_array_equal(np.asarray(u_bad), np.asarray(u_ref))
    np.testing.assert_array_equal(np.asarray(f_bad), np.asarray(f_ref))
