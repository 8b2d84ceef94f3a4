"""Big-volume 3D banded kernel (stacked overlapping plane-bands): exactness
vs the 3D oracle and the XLA solver, interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from epic_tpu.grid import make_state
from epic_tpu.solver import core, pallas_biggrid3d, reference_np


def _volume(d, h, w, density=0.12, seed=0, eps=1e-2):
    rng = np.random.default_rng(seed)
    u = np.full((d, h, w), -1e6, dtype=np.float32)
    locked = np.zeros((d, h, w), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    if density:
        locked |= rng.random((d, h, w)) < density
    u[d // 2, h // 2, w // 2] = 0.0
    locked[d // 2, h // 2, w // 2] = True
    return make_state(u, locked, epsilon=eps)


@pytest.mark.parametrize("d,h,w,band,k", [
    (24, 10, 20, 4, 2),    # several bands, k < band
    (16, 8, 30, 2, 2),     # k == band (max redundancy)
    (13, 9, 140, 4, 3),    # ragged depth (remainder band), non-aligned h/w
])
def test_chunk_bitmatches_global_sweeps(d, h, w, band, k):
    st = _volume(d, h, w, seed=3)
    g = pallas_biggrid3d.pad_state(st, band=band, k=k)
    frozen_ext = pallas_biggrid3d.stack_frozen(g.frozen, g.hp, band, k)

    u_np = np.asarray(st.u)
    locked = np.asarray(st.locked)

    u_pad = g.u
    t = 0
    for depth in (k, 1, k):  # full chunks and a shallow remainder chunk
        u_pad, delta = pallas_biggrid3d.sweep_chunk_bands(
            u_pad, frozen_ext, jnp.int32(t), depth, band, k, g.hp, True
        )
        for s in range(depth):
            u_np, d_ref = reference_np.sweep_3d(u_np, locked, t + s)
            if s == 0:
                assert float(delta) == pytest.approx(float(d_ref), abs=1e-6)
        t += depth
        dp = u_pad.shape[0] // g.hp
        got = np.asarray(u_pad.reshape(dp, g.hp, -1)[k : k + d, :h, :w])
        np.testing.assert_allclose(got, u_np, rtol=0, atol=2e-6,
                                   err_msg=f"after t={t}")


def test_update_n_matches_core():
    st = _volume(20, 12, 24, seed=5)
    out_big = pallas_biggrid3d.update_n(st, 11, chunk_depth=4)
    out_ref = core.update_n(st, 11)
    np.testing.assert_allclose(
        np.asarray(out_big.u), np.asarray(out_ref.u), rtol=0, atol=2e-6
    )
    assert int(out_big.iteration) == int(out_ref.iteration)


def test_solve_matches_core_protocol():
    st = _volume(14, 10, 18, seed=7, eps=1e-2)
    out_big = pallas_biggrid3d.solve(st, stagger=7, chunk_depth=3)
    out_ref = core.solve(st, stagger=7)
    assert int(out_big.iteration) == int(out_ref.iteration)
    assert bool(out_big.converged)
    np.testing.assert_allclose(
        np.asarray(out_big.u), np.asarray(out_ref.u), rtol=0, atol=1e-5
    )
    assert float(out_big.delta) == pytest.approx(float(out_ref.delta), abs=1e-6)


def test_solve_segments_bit_equals_solve():
    """Segmented big-volume solving (watchdog-safe deep-volume
    convergence) must be BIT-identical to the single-dispatch solve —
    same compiled loop, segmented iteration bounds — and must route
    through the public solve_volume dispatch when segment_iterations is
    passed."""
    from epic_tpu import solver as S

    st1 = _volume(14, 10, 18, seed=7, eps=1e-2)
    st2 = _volume(14, 10, 18, seed=7, eps=1e-2)
    out1 = pallas_biggrid3d.solve(st1, stagger=7, chunk_depth=3)
    out2 = pallas_biggrid3d.solve_segments(st2, stagger=7, chunk_depth=3,
                                           segment_iterations=19)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out1.converged) and bool(out2.converged)
    np.testing.assert_array_equal(np.asarray(out1.u), np.asarray(out2.u))
    assert float(out1.delta) == float(out2.delta)

    # Public dispatch: segment_iterations routes to solve_segments (CPU
    # backend goes through core.solve, which drops the kwarg — exercise
    # the routing logic directly on the protocol level instead).
    st3 = _volume(14, 10, 18, seed=7, eps=1e-2)
    out3 = S.solve_volume(st3, stagger=7)
    assert int(out3.iteration) == int(out1.iteration)


def test_choose_layout_budget():
    for shape in [(256, 256, 256), (128, 512, 512), (64, 128, 128),
                  (100, 100, 100), (512, 64, 64)]:
        band, k = pallas_biggrid3d.choose_layout(shape)
        hp = -(-shape[1] // 8) * 8
        wp = -(-shape[2] // 128) * 128
        assert (band + 2 * k) * hp * wp <= pallas_biggrid3d.EXT_BAND_CELL_BUDGET
        assert band >= 1 and k >= 1
        nb = -(-shape[0] // band)
        assert nb * band >= shape[0]


def test_feasible_wide_plane_cutoff():
    # Deep, modest-plane volumes fit the plane-banded layout ...
    assert pallas_biggrid3d.feasible((256, 256, 256))
    assert pallas_biggrid3d.feasible((128, 512, 512))
    # ... wide-plane volumes exceed the 3-plane minimum ext band (probe24's
    # ~2M-cell scoped-VMEM wall) and must fall back (solver.solve_volume).
    assert not pallas_biggrid3d.feasible((4, 1024, 1024))
    assert not pallas_biggrid3d.feasible((64, 4096, 4096))
    # The auto-dispatch honors the predicate even off-CPU: the wide-plane
    # shape would pick a 3-plane band whose pad_state alone is fine but
    # whose kernel cannot compile; the cutoff is what keeps solve_volume
    # from routing there.
    band, k = pallas_biggrid3d.choose_layout((4, 1024, 1024))
    plane = -(-1024 // 8) * 8 * (-(-1024 // 128) * 128)
    assert (band + 2 * k) * plane > pallas_biggrid3d.EXT_BAND_CELL_BUDGET


def test_rejects_2d():
    img = np.full((8, 8), 128, dtype=np.uint8)
    st2 = make_state(np.full((8, 8), -1e6, np.float32), np.zeros((8, 8), bool), 1e-2)
    with pytest.raises(ValueError):
        pallas_biggrid3d.update_n(st2, 1)


@pytest.mark.parametrize("d,h,w,band,k", [
    (24, 10, 20, 4, 2),
    (13, 9, 140, 4, 3),    # ragged depth, non-aligned h/w
])
def test_dma_chunk_bitmatches_gather_chunk(d, h, w, band, k):
    """The manual-DMA chunk (contiguous HBM slices per band) must be
    bit-identical to the gather chunk across chunk depths and parities."""
    st = _volume(d, h, w, seed=5)
    g = pallas_biggrid3d.pad_state(st, band=band, k=k)
    frozen_ext = pallas_biggrid3d.stack_frozen(g.frozen, g.hp, band, k)
    u_g, u_d = g.u, g.u
    t = 0
    for depth in (k, 1, k):
        u_g, del_g = pallas_biggrid3d.sweep_chunk_bands(
            u_g, frozen_ext, jnp.int32(t), depth, band, k, g.hp, True
        )
        u_d, del_d = pallas_biggrid3d.sweep_chunk_dma(
            u_d, g.frozen, jnp.int32(t), depth, band, k, g.hp, True
        )
        assert float(del_g) == float(del_d)
        np.testing.assert_array_equal(np.asarray(u_g), np.asarray(u_d))
        t += depth
