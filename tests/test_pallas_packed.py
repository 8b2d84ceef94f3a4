"""Parity-packed kernel: pack/unpack roundtrip + exactness vs the XLA core."""

import numpy as np
import jax.numpy as jnp
import pytest

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import core, pallas_packed


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(10, 12)).astype(np.float32))
    r, b = pallas_packed.pack(a)
    assert r.shape == (10, 6)
    out = pallas_packed.unpack(r, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(a))
    # R really holds the (y+x)-even cells.
    a_np = np.asarray(a)
    for i in range(10):
        for j in range(6):
            x = 2 * j + (i % 2)
            assert np.asarray(r)[i, j] == a_np[i, x]
            assert (i + x) % 2 == 0


@pytest.mark.parametrize("steps", [1, 2, 7])
def test_packed_matches_core(steps):
    img = maps.random_obstacles(24, 40, density=0.2, seed=3)
    st1 = epic_tpu.from_occupancy_image(img)
    st2 = epic_tpu.from_occupancy_image(img)
    out_ref = core.update_n(st1, steps)
    out = pallas_packed.update_n(st2, steps)
    assert int(out.iteration) == steps
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(out_ref.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out.delta), float(out_ref.delta), rtol=1e-5, atol=1e-6
    )


def test_packed_odd_iteration_start():
    # Chunks starting at an odd iteration update R first.
    img = maps.random_obstacles(16, 24, density=0.15, seed=5)
    st1 = epic_tpu.from_occupancy_image(img)
    st2 = epic_tpu.from_occupancy_image(img)
    a = core.update_n(st1, 3)
    b = pallas_packed.update_n(pallas_packed.update_n(st2, 1), 2)
    np.testing.assert_allclose(
        np.asarray(a.u), np.asarray(b.u), rtol=2e-6, atol=1e-4
    )


def test_packed_nonaligned_shape():
    img = maps.open_room(33, 130)
    st1 = epic_tpu.from_occupancy_image(img)
    st2 = epic_tpu.from_occupancy_image(img)
    out_ref = core.update_n(st1, 4)
    out = pallas_packed.update_n(st2, 4)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(out_ref.u), rtol=2e-6, atol=1e-4
    )
