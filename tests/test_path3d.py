"""3D streamline extraction over solved volumes (an extension: the
reference's path code is 2D-only, so the oracle here is geometric — paths
must ascend the potential and terminate in the goal cell)."""

import numpy as np
import pytest

from epic_tpu import path3d
from epic_tpu.errors import (
    InvalidLocationError,
    InvalidPathError,
)
from epic_tpu.grid import make_state
from epic_tpu.solver import core


def _solved_volume(d=14, h=14, w=14, goal=None, epsilon=1e-3):
    u = np.full((d, h, w), -1e6, dtype=np.float32)
    locked = np.zeros((d, h, w), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    gz, gy, gx = goal or (d // 2, h // 2, w // 2)
    u[gz, gy, gx] = 0.0
    locked[gz, gy, gx] = True
    out = core.solve(make_state(u, locked, epsilon=epsilon), stagger=10)
    return np.asarray(out.u), np.asarray(out.locked)


def test_potential_interpolates_and_matches_cell_centres():
    u, locked = _solved_volume()
    # At an exact cell centre the trilinear value is the cell value.
    assert path3d.compute_potential(u, locked, 3.0, 4.0, 5.0) == pytest.approx(
        float(u[5, 4, 3]), abs=1e-6
    )
    # Midpoints stay between the straddled cell values.
    v = path3d.compute_potential(u, locked, 3.5, 4.0, 5.0)
    lo = min(u[5, 4, 3], u[5, 4, 4])
    hi = max(u[5, 4, 3], u[5, 4, 4])
    assert lo - 1e-4 <= v <= hi + 1e-4


def test_gradient_is_unit_length_and_points_uphill():
    u, locked = _solved_volume()
    px, py, pz = path3d.compute_gradient(u, locked, 3.0, 3.0, 3.0)
    assert np.sqrt(px**2 + py**2 + pz**2) == pytest.approx(1.0, abs=1e-5)
    # The goal sits at the volume centre: from the low corner the gradient
    # must have positive components toward it.
    assert px > 0 and py > 0 and pz > 0


def test_path_reaches_goal_from_corners():
    u, locked = _solved_volume()
    for start in [(2.0, 2.0, 2.0), (11.0, 2.0, 10.0), (2.0, 11.0, 11.0)]:
        p = path3d.compute_path(u, locked, *start, step_size=0.2)
        assert p.shape[1] == 3
        assert path3d.path_reaches_goal(u, locked, p)
        # Monotone-ish ascent: end potential far above start potential.
        v0 = path3d.compute_potential(u, locked, *map(float, p[0]))
        v1 = path3d.compute_potential(u, locked, *map(float, p[-2]))
        assert v1 > v0


def test_start_inside_obstacle_rejected():
    u, locked = _solved_volume()
    with pytest.raises(InvalidLocationError):
        path3d.compute_path(u, locked, 0.0, 0.0, 0.0)  # boundary face cell


def test_unrelaxed_field_raises_invalid_path():
    # Fresh (unsolved) volume: flat -1e6 free space, zero gradient — the
    # anytime contract surfaces as InvalidPathError/InvalidGradientError.
    u = np.full((10, 10, 10), -1e6, dtype=np.float32)
    locked = np.zeros((10, 10, 10), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    u[5, 5, 5] = 0.0
    locked[5, 5, 5] = True
    with pytest.raises(Exception) as exc_info:
        path3d.compute_path(u, locked, 2.0, 2.0, 2.0)
    assert exc_info.type.__name__ in (
        "InvalidPathError",
        "InvalidGradientError",
    )


def test_path_starting_in_goal_cell_is_short_and_invalid():
    u, locked = _solved_volume()
    with pytest.raises(InvalidPathError):
        path3d.compute_path(u, locked, 7.0, 7.0, 7.0)
