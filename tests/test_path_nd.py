"""Rank-generic streamline walker (path_nd): 3D agreement with the
dedicated trilinear walker, and an end-to-end 4D solve + walk."""

import numpy as np
import pytest

import epic_tpu
from epic_tpu import path3d, path_nd
from epic_tpu.errors import (
    InvalidGradientError,
    InvalidLocationError,
    InvalidPathError,
)
from epic_tpu.solver import core


def _solved_volume():
    st = epic_tpu.empty_volume(10, 14, 18, epsilon=1e-3)
    u = np.asarray(st.u).copy()
    locked = np.asarray(st.locked).copy()
    u[5, 7, 9] = 0.0
    locked[5, 7, 9] = True
    out = core.solve(epic_tpu.make_state(u, locked, epsilon=1e-3))
    return np.asarray(out.u), np.asarray(out.locked)


def test_nd_walker_matches_trilinear_walker_in_3d():
    """On a 3D volume the generic walker must track path3d (coordinates in
    array-axis (z, y, x) order vs path3d's (x, y, z))."""
    u, locked = _solved_volume()
    p3 = path3d.compute_path(u, locked, 2.0, 3.0, 2.0,
                             step_size=0.2, cd_precision=0.4)
    pn = path_nd.compute_path(u, locked, (2.0, 3.0, 2.0),
                              step_size=0.2, cd_precision=0.4)
    assert len(p3) == len(pn)
    # p3 rows are (x, y, z); pn rows are (z, y, x).
    np.testing.assert_allclose(pn[:, ::-1], p3, atol=1e-5)
    assert path_nd.path_reaches_goal(u, locked, pn)

    # Potential / gradient spot checks.
    pot3 = path3d.compute_potential(u, locked, 4.2, 5.1, 3.3)
    potn = path_nd.compute_potential(u, locked, (3.3, 5.1, 4.2))
    assert potn == pytest.approx(pot3, abs=1e-6)
    g3 = path3d.compute_gradient(u, locked, 4.2, 5.1, 3.3, 0.4)
    gn = path_nd.compute_gradient(u, locked, (3.3, 5.1, 4.2), 0.4)
    np.testing.assert_allclose(gn[::-1], g3, atol=1e-6)


def test_nd_walker_4d_end_to_end():
    """4D: solve a hypergrid and walk from a corner to the goal — the
    capability the reference stubs out entirely."""
    state = epic_tpu.empty_grid_nd((7, 8, 9, 10), epsilon=1e-3)
    u = np.asarray(state.u).copy()
    locked = np.asarray(state.locked).copy()
    u[3, 4, 4, 5] = 0.0
    locked[3, 4, 4, 5] = True
    out = core.solve(epic_tpu.make_state(u, locked, epsilon=1e-3))
    assert bool(out.converged)
    uu, ll = np.asarray(out.u), np.asarray(out.locked)
    p = path_nd.compute_path(uu, ll, (1.5, 1.5, 1.5, 1.5),
                             step_size=0.2, cd_precision=0.4)
    assert path_nd.path_reaches_goal(uu, ll, p)


def test_nd_walker_contracts():
    u, locked = _solved_volume()
    with pytest.raises(InvalidLocationError):
        path_nd.compute_path(u, locked, (-3.0, 1.0, 1.0))
    with pytest.raises(InvalidLocationError):
        path_nd.compute_path(u, locked, (0.0, 0.0, 0.0))  # boundary obstacle
    # Unrelaxed field: anytime rejection.
    st = epic_tpu.empty_grid_nd((6, 6, 6), epsilon=1e-2)
    uu = np.asarray(st.u).copy()
    ll = np.asarray(st.locked).copy()
    uu[3, 3, 3] = 0.0
    ll[3, 3, 3] = True
    with pytest.raises((InvalidPathError, InvalidGradientError)):
        path_nd.compute_path(uu, ll, (1.2, 1.2, 1.2))
