"""Sampling-based node (the reference's unbuilt OMPL node, completed).

Covers the service state machine (map -> one goal -> start via compute_path
-> anytime update -> populated path), validity semantics, the single-goal
rules, and both implemented planners (RRT-Connect, RRT*)."""

from __future__ import annotations

import numpy as np
import pytest

from epic_tpu import constants as C
from epic_tpu.services import messages as msg
from epic_tpu.services import sampling_node
from epic_tpu.services.sampling_node import (
    ALGORITHM_LAZY_PRM,
    ALGORITHM_RRT_CONNECT,
    ALGORITHM_RRT_STAR,
    EpicNavigationNodeSampling,
    SamplingPlanner,
)


def _grid_with_wall(n=32):
    """Occupancy grid: vertical wall with a gap."""
    data = np.zeros((n, n), dtype=np.int8)
    data[:, n // 2] = 100
    data[n // 2 - 2 : n // 2 + 2, n // 2] = 0   # gap
    return msg.OccupancyGrid(
        width=n, height=n, resolution=1.0, origin_x=0.0, origin_y=0.0,
        data=data.reshape(-1).tolist(),
    )


def _pose(x, y):
    return msg.PoseStamped(x=x, y=y, yaw=0.0, frame_id="map", stamp=0.0)


def _segments_collision_free(pts, obstacle):
    for a, b in zip(pts[:-1], pts[1:]):
        n = max(2, int(np.ceil(np.linalg.norm(b - a) / 0.25)) + 1)
        for t in np.linspace(0, 1, n):
            p = a + t * (b - a)
            if obstacle[int(p[1]), int(p[0])]:
                return False
    return True


@pytest.mark.parametrize("algorithm", [ALGORITHM_RRT_CONNECT, ALGORITHM_RRT_STAR])
def test_planner_finds_collision_free_path(algorithm):
    n = 32
    obstacle = np.zeros((n, n), dtype=bool)
    obstacle[:, 16] = True
    obstacle[14:18, 16] = False
    obstacle[0, :] = obstacle[-1, :] = obstacle[:, 0] = obstacle[:, -1] = True
    p = SamplingPlanner(algorithm, seed=3)
    p.setup(obstacle, start=(4.0, 4.0), goal=(27.0, 27.0))
    assert p.solve(iterations=4000)
    pts = p.solution_path()
    assert pts is not None and len(pts) >= 2
    np.testing.assert_allclose(pts[0], [4.0, 4.0])
    np.testing.assert_allclose(pts[-1], [27.0, 27.0])
    assert _segments_collision_free(pts, obstacle)


def test_rrt_star_keeps_optimizing():
    """RRT* keeps shortening the path with more budget (path-length
    objective, epic_navigation_node_ompl.cpp:122-126)."""
    n = 24
    obstacle = np.zeros((n, n), dtype=bool)
    obstacle[0, :] = obstacle[-1, :] = obstacle[:, 0] = obstacle[:, -1] = True
    p = SamplingPlanner(ALGORITHM_RRT_STAR, seed=11)
    p.setup(obstacle, start=(2.0, 2.0), goal=(21.0, 21.0))
    assert p.solve(iterations=600)
    len_early = p._path_len(p.solution_path())
    p.solve(iterations=4000)
    len_late = p._path_len(p.solution_path())
    straight = float(np.hypot(19.0, 19.0))
    assert len_late <= len_early + 1e-9
    assert len_late <= straight * 1.15   # near-optimal in free space


def test_unknown_algorithm_raises():
    with pytest.raises(ValueError):
        SamplingPlanner(17)


def _walled_obstacle(h=24, w=24):
    """A wall across the middle with one door — lazy planners must discard
    the straight-line shortcut their unvalidated edges propose."""
    obstacle = np.zeros((h, w), dtype=bool)
    obstacle[0, :] = obstacle[-1, :] = obstacle[:, 0] = obstacle[:, -1] = True
    obstacle[h // 2, :] = True
    obstacle[h // 2, w - 6 : w - 2] = False   # the door
    return obstacle


@pytest.mark.parametrize("alg", [
    sampling_node.ALGORITHM_LAZY_RRT,
    sampling_node.ALGORITHM_LAZY_PRM,
    sampling_node.ALGORITHM_PRM_STAR,
    sampling_node.ALGORITHM_LAZY_PRM_STAR,
])
def test_all_enum_slots_solve_walled_map(alg):
    """Every reference enum slot (epic_navigation_node_ompl.h:47-53) is now
    constructed; each must route through the door, with every returned
    segment collision-free (the lazy variants must not leak an
    unvalidated through-wall edge into the solution)."""
    obstacle = _walled_obstacle()
    p = SamplingPlanner(alg, seed=9)
    p.setup(obstacle, start=(3.0, 3.0), goal=(20.0, 20.0))
    assert p.solve(iterations=6000)
    path = p.solution_path()
    assert path is not None and len(path) >= 2
    np.testing.assert_allclose(path[0], (3.0, 3.0))
    np.testing.assert_allclose(path[-1], (20.0, 20.0))
    for a, b in zip(path, path[1:]):
        assert p._motion_valid(a, b), (a, b)


def test_prm_star_keeps_optimizing():
    obstacle = np.zeros((24, 24), dtype=bool)
    obstacle[0, :] = obstacle[-1, :] = obstacle[:, 0] = obstacle[:, -1] = True
    p = SamplingPlanner(sampling_node.ALGORITHM_PRM_STAR, seed=3)
    p.setup(obstacle, start=(2.0, 2.0), goal=(21.0, 21.0))
    assert p.solve(iterations=500)
    len_early = p._path_len(p.solution_path())
    p.solve(iterations=3000)
    len_late = p._path_len(p.solution_path())
    straight = float(np.hypot(19.0, 19.0))
    assert len_late <= len_early + 1e-9
    assert len_late <= straight * 1.15


def test_node_state_machine_and_path_population():
    node = EpicNavigationNodeSampling(seed=5)
    # compute_path before anything: uninitialized -> empty path.
    res = node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 3.0)))
    assert res.path.poses == []

    node.sub_occupancy_grid(_grid_with_wall())

    # Exactly one goal per request (epic_navigation_node_ompl.cpp:303-307).
    assert not node.srv_add_goals(
        msg.ModifyGoalsRequest(goals=[_pose(1, 1), _pose(2, 2)])
    ).success
    # Goal at an obstacle rejected (:314-318).
    assert not node.srv_add_goals(
        msg.ModifyGoalsRequest(goals=[_pose(16.2, 2.0)])
    ).success
    assert node.srv_add_goals(msg.ModifyGoalsRequest(goals=[_pose(28.0, 28.0)])).success

    # First compute_path assigns the start and constructs the planner; the
    # search hasn't run yet so the path is still empty (anytime contract).
    res = node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 3.0)))
    assert node.planner is not None
    assert res.path.poses == []

    node.update(iterations=4000)
    res = node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 3.0)))
    poses = res.path.poses
    assert len(poses) >= 2
    # First pose is the request's start verbatim (:449).
    assert poses[0] == _pose(3.0, 3.0)
    # Last pose reaches the goal (world == map coords at res 1.0, origin 0).
    assert np.hypot(poses[-1].x - 28.0, poses[-1].y - 28.0) < 1e-6
    # Yaw matches atan2 of the segment (:452).
    p1, p2 = poses[-2], poses[-1]
    assert poses[-1].yaw == pytest.approx(np.arctan2(p2.y - p1.y, p2.x - p1.x))


def test_node_goal_remove_and_map_reset():
    node = EpicNavigationNodeSampling(seed=5)
    node.sub_occupancy_grid(_grid_with_wall())
    assert node.srv_add_goals(msg.ModifyGoalsRequest(goals=[_pose(28.0, 28.0)])).success
    node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 3.0)))
    node.update(iterations=3000)
    assert node.planner is not None and node.planner.solved

    # Removing a non-matching goal leaves the goal assigned (:355-361).
    node.srv_remove_goals(msg.ModifyGoalsRequest(goals=[_pose(5.0, 5.0)]))
    assert node.goal is not None
    # Removing the actual goal unassigns it and resets the planner.
    node.srv_remove_goals(msg.ModifyGoalsRequest(goals=[_pose(28.0, 28.0)]))
    assert node.goal is None and node.planner is None

    # set_cells with a GOAL type reassigns the single goal (:395-397).
    assert node.srv_set_cells(
        msg.SetCellsRequest(v=[26, 26], types=[C.CELL_TYPE_GOAL])
    ).success
    assert node.goal == (26.0, 26.0)

    # A map refresh resets the algorithm (:263) but a same-size refresh
    # preserves the goal cell.
    node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 3.0)))
    node.update(iterations=2000)
    assert node.planner is not None
    node.sub_occupancy_grid(_grid_with_wall())
    assert node.planner is None
    assert node.goal == (26.0, 26.0)

    # rviz twins: set_goal then set_start returns a (possibly empty) path.
    assert node.set_goal(_pose(20.0, 8.0))
    node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 3.0)))
    node.update(iterations=4000)
    res = node.set_start(_pose(3.0, 3.0))
    assert len(res.path.poses) >= 2


def test_obstacle_edits_respected():
    """A wall drawn via set_cells must divert the path."""
    node = EpicNavigationNodeSampling(seed=9)
    n = 32
    data = np.zeros((n, n), dtype=np.int8)
    node.sub_occupancy_grid(msg.OccupancyGrid(
        width=n, height=n, resolution=1.0, origin_x=0.0, origin_y=0.0,
        data=data.reshape(-1).tolist(),
    ))
    # Full wall at x=16 except a gap at the top.
    xs, types = [], []
    for y in range(1, n - 1):
        if y > 4:
            xs += [16, y]
            types.append(C.CELL_TYPE_OBSTACLE)
    node.srv_set_cells(msg.SetCellsRequest(v=xs, types=types))
    assert node.srv_add_goals(msg.ModifyGoalsRequest(goals=[_pose(28.0, 28.0)])).success
    node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 28.0)))
    node.update(iterations=8000)
    res = node.srv_compute_path(msg.ComputePathRequest(start=_pose(3.0, 28.0)))
    pts = np.array([[p.x, p.y] for p in res.path.poses])
    assert len(pts) >= 2
    # The path must pass through the gap region (y <= 5 near x = 16).
    crossing_y = None
    for a, b in zip(pts[:-1], pts[1:]):
        if (a[0] - 16.0) * (b[0] - 16.0) <= 0 and a[0] != b[0]:
            t = (16.0 - a[0]) / (b[0] - a[0])
            crossing_y = a[1] + t * (b[1] - a[1])
            break
    assert crossing_y is not None and crossing_y <= 5.5
