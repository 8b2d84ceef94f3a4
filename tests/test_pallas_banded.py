"""Banded (BlockSpec-pipelined) big-grid kernel: exactness vs the XLA core."""

import numpy as np
import pytest

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import core, pallas_banded


def _pair(img):
    return epic_tpu.from_occupancy_image(img), epic_tpu.from_occupancy_image(img)


@pytest.mark.parametrize("steps,band,depth", [(20, 16, 8), (11, 16, 8), (8, 32, 16)])
def test_banded_matches_core(steps, band, depth):
    img = maps.random_obstacles(70, 150, density=0.15, seed=4)
    st1, st2 = _pair(img)
    a = core.update_n(st1, steps)
    b = pallas_banded.update_n(st2, steps, band=band, chunk_depth=depth)
    assert int(b.iteration) == steps
    np.testing.assert_allclose(
        np.asarray(b.u), np.asarray(a.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(float(b.delta), float(a.delta), rtol=1e-5, atol=1e-6)


def test_banded_band_not_dividing_height():
    img = maps.open_room(37, 130)
    st1, st2 = _pair(img)
    a = core.update_n(st1, 8)
    b = pallas_banded.update_n(st2, 8, band=24, chunk_depth=8)
    np.testing.assert_allclose(
        np.asarray(b.u), np.asarray(a.u), rtol=2e-6, atol=1e-4
    )


def test_banded_odd_iteration_start():
    img = maps.random_obstacles(40, 140, density=0.1, seed=2)
    st1, st2 = _pair(img)
    a = core.update_n(core.update_n(st1, 3), 8)
    b = pallas_banded.update_n(
        pallas_banded.update_n(st2, 3, band=16), 8, band=16
    )
    np.testing.assert_allclose(
        np.asarray(b.u), np.asarray(a.u), rtol=2e-6, atol=1e-4
    )
