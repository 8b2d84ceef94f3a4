"""Multi-device halo-exchange solver == single-device solver, on a virtual
8-device CPU mesh (SURVEY §4: "multi-host = single-chip equivalence on
halo-decomposed grids")."""

import numpy as np
import pytest

import jax

import epic_tpu
from epic_tpu import maps
from epic_tpu.parallel import make_mesh, sharded
from epic_tpu.solver import core


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh((2, 4))


def _state(img, eps=1e-2):
    return epic_tpu.from_occupancy_image(img, epsilon=eps)


def test_mesh_default_shape():
    m = make_mesh()
    assert m.shape["my"] * m.shape["mx"] == len(jax.devices())


def test_sharded_update_matches_core(mesh8):
    img = maps.random_obstacles(48, 64, density=0.15, seed=3)
    st1, st2 = _state(img), _state(img)
    out1 = core.update_n(st1, 5)
    out2 = sharded.update_n(st2, 5, mesh8)
    assert int(out1.iteration) == int(out2.iteration)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out1.delta), float(out2.delta), rtol=1e-5, atol=1e-6
    )


def test_sharded_solve_matches_core(mesh8):
    img = maps.random_obstacles(40, 48, density=0.1, seed=5)
    st1, st2 = _state(img), _state(img)
    out1 = core.solve(st1, stagger=10)
    out2 = sharded.solve(st2, mesh8, stagger=10)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out2.converged)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-3
    )


def test_sharded_nonaligned_grid(mesh8):
    # Grid not divisible by the mesh: padding must not leak into results.
    img = maps.open_room(35, 53)
    st1, st2 = _state(img), _state(img)
    out1 = core.update_n(st1, 4)
    out2 = sharded.update_n(st2, 4, mesh8)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-4
    )


def test_sharded_1d_mesh():
    mesh = make_mesh((8, 1))
    img = maps.open_room(40, 40)
    st1, st2 = _state(img), _state(img)
    out1 = core.update_n(st1, 3)
    out2 = sharded.update_n(st2, 3, mesh)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-4
    )
