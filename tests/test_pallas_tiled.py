"""Tiled temporal-blocking kernel: exactness vs the XLA core (interpret mode)."""

import numpy as np
import pytest

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import core, pallas_tiled


def _state(img, eps=1e-2):
    return epic_tpu.from_occupancy_image(img, epsilon=eps)


@pytest.mark.parametrize("num_sweeps,band", [(4, 16), (8, 32)])
def test_tiled_matches_core(num_sweeps, band):
    img = maps.random_obstacles(70, 150, density=0.15, seed=4)
    st1, st2 = _state(img), _state(img)
    out_ref = core.update_n(st1, num_sweeps)
    out = pallas_tiled.update_n(st2, num_sweeps, band=band)
    assert int(out.iteration) == num_sweeps
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(out_ref.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.delta), float(out_ref.delta), rtol=1e-5, atol=1e-6
    )


def test_tiled_chained_passes():
    # Multiple K-sweep passes chain exactly (the 100-sweep chunk = passes).
    img = maps.random_obstacles(48, 140, density=0.1, seed=1)
    st1, st2 = _state(img), _state(img)
    out_ref = core.update_n(st1, 12)
    out = st2
    for _ in range(3):
        out = pallas_tiled.update_n(out, 4, band=16)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(out_ref.u), rtol=2e-6, atol=1e-4
    )


def test_tiled_band_not_dividing_height():
    img = maps.open_room(37, 130)
    st1, st2 = _state(img), _state(img)
    out_ref = core.update_n(st1, 4)
    out = pallas_tiled.update_n(st2, 4, band=16)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(out_ref.u), rtol=2e-6, atol=1e-4
    )
