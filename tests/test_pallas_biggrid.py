"""Big-grid banded kernel v2 (stacked overlapping bands): exactness vs the
oracle and the XLA solver, interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import core, pallas_biggrid, reference_np


def _state(h, w, seed=0, eps=1e-2):
    img = maps.random_obstacles(h, w, density=0.12, seed=seed)
    return epic_tpu.from_occupancy_image(img, epsilon=eps)


@pytest.mark.parametrize("h,w,band,k", [
    (96, 64, 16, 8),     # several bands, k < band
    (64, 96, 8, 8),      # k == band (max redundancy)
    (40, 200, 16, 8),    # ragged height, wide
])
def test_chunk_bitmatches_global_sweeps(h, w, band, k):
    st = _state(h, w, seed=3)
    g = pallas_biggrid.pad_state(st, band=band, k=k)
    frozen_ext = pallas_biggrid.stack_frozen(g.frozen, band, k)

    u_np = np.asarray(st.u)
    locked = np.asarray(st.locked)

    u_pad = g.u
    t = 0
    for depth in (k, 3, k):  # full chunks and a shallow remainder chunk
        u_pad, delta = pallas_biggrid.sweep_chunk_bands(
            u_pad, frozen_ext, jnp.int32(t), depth, band, k, True
        )
        for s in range(depth):
            u_np, d_ref = reference_np.sweep(u_np, locked, t + s)
            if s == 0:
                assert float(delta) == pytest.approx(float(d_ref), abs=1e-6)
        t += depth
        got = np.asarray(u_pad[k : k + h, :w])
        np.testing.assert_allclose(got, u_np, rtol=0, atol=2e-6,
                                   err_msg=f"after t={t}")


def test_update_n_matches_core():
    st = _state(80, 120, seed=5)
    out_big = pallas_biggrid.update_n(st, 37, chunk_depth=16)
    out_ref = core.update_n(st, 37)
    np.testing.assert_allclose(
        np.asarray(out_big.u), np.asarray(out_ref.u), rtol=0, atol=2e-6
    )
    assert int(out_big.iteration) == int(out_ref.iteration)


def test_solve_matches_core_protocol():
    st = _state(64, 80, seed=7, eps=1e-2)
    out_big = pallas_biggrid.solve(st, stagger=13)
    out_ref = core.solve(st, stagger=13)
    assert int(out_big.iteration) == int(out_ref.iteration)
    assert bool(out_big.converged)
    np.testing.assert_allclose(
        np.asarray(out_big.u), np.asarray(out_ref.u), rtol=0, atol=1e-5
    )
    assert float(out_big.delta) == pytest.approx(float(out_ref.delta), abs=1e-6)


def test_choose_layout_budget():
    for shape in [(2048, 2048), (4096, 4096), (8192, 8192), (16384, 16384),
                  (482, 482), (1000, 3000)]:
        band, k = pallas_biggrid.choose_layout(shape)
        wp = -(-shape[1] // 128) * 128
        # int8 masks: a slot pair costs 5 B/cell vs the int32 era's 8, so
        # the proven scoped-VMEM bytes admit 8/5 the band rows.
        assert (band + 2 * k) * wp <= pallas_biggrid.EXT_BAND_CELL_BUDGET * 8 // 5
        assert band % 8 == 0 and k % 8 == 0 and k >= 8
        assert 2 * k <= 2 * band  # redundancy bounded


@pytest.mark.parametrize("h,w,band,k", [
    (96, 64, 16, 8),     # several bands, k < band
    (40, 200, 16, 8),    # ragged height, wide
])
def test_dma_chunk_bitmatches_gather_chunk(h, w, band, k):
    """The manual-DMA chunk (contiguous HBM row slices per band) must be
    bit-identical to the gather chunk across chunk depths and parities."""
    st = _state(h, w, seed=5)
    g = pallas_biggrid.pad_state(st, band=band, k=k)
    frozen_ext = pallas_biggrid.stack_frozen(g.frozen, band, k)
    u_g, u_d = g.u, g.u
    t = 0
    for depth in (k, 1, 5):
        u_g, del_g = pallas_biggrid.sweep_chunk_bands(
            u_g, frozen_ext, jnp.int32(t), depth, band, k, True
        )
        u_d, del_d = pallas_biggrid.sweep_chunk_dma(
            u_d, g.frozen, jnp.int32(t), depth, band, k, True
        )
        assert float(del_g) == float(del_d)
        np.testing.assert_array_equal(np.asarray(u_g), np.asarray(u_d))
        t += depth


@pytest.mark.parametrize("stagger,eps", [(5, 1e-2), (13, 1e-1), (100, 1e-1)])
def test_solve_check_fold_protocol_edges(stagger, eps):
    """The folded DMA check chunk must preserve the exit rules exactly
    across stagger < k, stagger > k with remainders, and early convergence."""
    st = _state(48, 150, seed=11, eps=eps)
    out_b = pallas_biggrid.solve(st, stagger=stagger)
    out_ref = core.solve(st, stagger=stagger)
    assert int(out_b.iteration) == int(out_ref.iteration)
    assert int(out_b.iteration) % stagger == 1
    assert bool(out_b.converged) == bool(out_ref.converged)
    np.testing.assert_allclose(
        np.asarray(out_b.u), np.asarray(out_ref.u), rtol=0, atol=1e-5
    )
    assert float(out_b.delta) == pytest.approx(float(out_ref.delta), abs=1e-6)


def test_solve_segments_bit_equals_solve():
    """Segmented solving (watchdog-safe mega-grid convergence, VERDICT r3
    item 5) must be BIT-identical to the single-dispatch solve: same
    compiled loop, segmented iteration bounds, including a cap that lands
    mid-segment."""
    import numpy as np

    import epic_tpu
    from epic_tpu import maps
    from epic_tpu.solver import pallas_biggrid as bg

    img = maps.random_obstacles(96, 128, density=0.1, seed=4)
    st1 = epic_tpu.from_occupancy_image(img, epsilon=1e-2)
    st2 = epic_tpu.from_occupancy_image(img, epsilon=1e-2)
    out1 = bg.solve(st1, stagger=10)
    out2 = bg.solve_segments(st2, stagger=10, segment_iterations=37)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out1.converged) and bool(out2.converged)
    np.testing.assert_array_equal(np.asarray(out1.u), np.asarray(out2.u))
    assert float(out1.delta) == float(out2.delta)

    st3 = epic_tpu.from_occupancy_image(img, epsilon=1e-8)
    st4 = epic_tpu.from_occupancy_image(img, epsilon=1e-8)
    cap = 85
    out3 = bg.solve(st3, stagger=10, max_iterations=cap)
    out4 = bg.solve_segments(st4, stagger=10, max_iterations=cap,
                             segment_iterations=40)
    assert int(out3.iteration) == int(out4.iteration)
    assert bool(out3.converged) == bool(out4.converged)
    np.testing.assert_array_equal(np.asarray(out3.u), np.asarray(out4.u))
