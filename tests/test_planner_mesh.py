"""MeshPlanner (service verbs over mesh-resident sharded state) must run
the same anytime session as the single-device Planner: same verb results,
same fields to float tolerance, same convergence verdicts."""

import numpy as np
import pytest

import jax

from epic_tpu import maps
from epic_tpu.parallel import make_mesh
from epic_tpu.planner import Planner, PlannerConfig
from epic_tpu.planner_mesh import MeshPlanner


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh((2, 4))


def _session(pl, img, ticks=6, steps=25):
    """One full service session: ingest -> goal -> ticks -> edit -> ticks."""
    occ = np.where(np.asarray(img) != 0, np.int8(0), np.int8(100))
    h, w = img.shape
    pl.init(w, h)
    pl.update_occupancy(occ)
    gy, gx = [int(v) for v in np.argwhere(np.asarray(img) == 255)[0]]
    assert pl.add_goals([(gx, gy)])
    for _ in range(ticks):
        pl.update(steps)
    assert pl.set_cells([(5, 7), (9, 3)], [1, 1])
    for _ in range(ticks):
        pl.update(steps)
    return pl


def test_mesh_session_matches_planner(mesh8):
    img = maps.recursive_maze(64, 64, seed=4)
    p1 = _session(Planner(PlannerConfig(epsilon=1e-2)), img)
    p2 = _session(MeshPlanner(PlannerConfig(epsilon=1e-2), mesh=mesh8), img)
    assert int(p1.state.iteration) == int(p2.state.iteration)
    np.testing.assert_allclose(
        np.asarray(p1.state.u), np.asarray(p2.state.u), rtol=2e-6, atol=1e-4
    )
    # Verb round-trips on the resident state.
    assert p2.get_cell(5, 7) == pytest.approx(p1.get_cell(5, 7))
    pth1 = None
    pth2 = None
    free = np.argwhere(~np.asarray(p1.state.locked))
    sy, sx = free[len(free) // 2]
    try:
        pth1 = p1.compute_path((float(sx), float(sy)), 0.2, 0.4)
        pth2 = p2.compute_path((float(sx), float(sy)), 0.2, 0.4)
    except Exception:
        pass  # anytime contract: may not be relaxed enough yet
    assert (pth1 is None) == (pth2 is None)
    if pth1 is not None:
        assert len(pth1) == len(pth2)


def test_mesh_solve_matches_planner(mesh8):
    img = maps.recursive_maze(64, 64, seed=9)
    p1 = Planner(PlannerConfig(epsilon=1e-2))
    p2 = MeshPlanner(PlannerConfig(epsilon=1e-2), mesh=mesh8)
    for pl in (p1, p2):
        occ = np.where(np.asarray(img) != 0, np.int8(0), np.int8(100))
        pl.init(img.shape[1], img.shape[0])
        pl.update_occupancy(occ)
        gy, gx = [int(v) for v in np.argwhere(np.asarray(img) == 255)[0]]
        assert pl.add_goals([(gx, gy)])
        pl.solve()
    assert bool(p1.state.converged) and bool(p2.state.converged)
    assert int(p1.state.iteration) == int(p2.state.iteration)
    np.testing.assert_allclose(
        np.asarray(p1.state.u), np.asarray(p2.state.u), rtol=2e-6, atol=1e-3
    )


def test_mesh_reset_and_goal_guard(mesh8):
    img = maps.recursive_maze(64, 64, seed=4)
    p2 = _session(MeshPlanner(PlannerConfig(epsilon=1e-2), mesh=mesh8), img)
    # Goals inside obstacles are refused (reference obstacle guard).
    locked = np.asarray(p2.state.locked)
    u = np.asarray(p2.state.u)
    oy, ox = np.argwhere(locked & (u == np.float32(-1e6)))[0]
    assert not p2.add_goals([(float(ox), float(oy))])
    # reset_free_cells clears every unlocked cell back to FREE.
    assert p2.reset_free_cells()
    st = p2.state
    free_vals = np.asarray(st.u)[~np.asarray(st.locked)]
    assert (free_vals == np.float32(-1e6)).all()
    # The session keeps ticking after the reset (warm-start contract).
    p2.update(10)
    assert int(p2.state.iteration) > 0


def test_mesh_single_step_convergence_verdict(mesh8):
    """n==1 ticks carry the converged verdict, as core.update_n does."""
    img = maps.recursive_maze(64, 64, seed=9)
    p2 = MeshPlanner(PlannerConfig(epsilon=1e-2), mesh=mesh8)
    occ = np.where(np.asarray(img) != 0, np.int8(0), np.int8(100))
    p2.init(img.shape[1], img.shape[0])
    p2.update_occupancy(occ)
    gy, gx = [int(v) for v in np.argwhere(np.asarray(img) == 255)[0]]
    assert p2.add_goals([(gx, gy)])
    p2.solve()
    assert bool(p2.state.converged)
    p2.update(1)   # relaxation continues; a converged field stays converged
    assert bool(p2.state.converged)


def test_navigation_node_runs_on_mesh_planner(mesh8):
    """The service node is planner-agnostic: injecting a MeshPlanner
    (the server's --mesh flag) runs the same verb session as the default
    single-device planner."""
    import numpy as np

    from epic_tpu.services import messages as msg
    from epic_tpu.services.navigation_node import EpicNavigationNodeRviz

    cfg = PlannerConfig(epsilon=1e-2, steps_per_update=10)
    n1 = EpicNavigationNodeRviz(cfg)
    n2 = EpicNavigationNodeRviz(
        cfg, planner=MeshPlanner(cfg, mesh=mesh8))
    occ = np.zeros((24, 32), dtype=np.int8)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = 100
    for n in (n1, n2):
        n.sub_occupancy_grid(msg.OccupancyGrid(32, 24, 1.0, 0.0, 0.0, occ))
        assert n.srv_add_goals(
            msg.ModifyGoalsRequest([msg.PoseStamped(16.0, 12.0)])).success
        n.update()
        assert n.srv_set_cells(
            msg.SetCellsRequest([5, 5], [1])).success
        n.update()
        assert n.srv_get_cell(msg.GetCellRequest(16, 12)).success
    assert int(n1.planner.state.iteration) == int(n2.planner.state.iteration)
    np.testing.assert_allclose(
        np.asarray(n1.planner.state.u), np.asarray(n2.planner.state.u),
        rtol=2e-6, atol=1e-4)
