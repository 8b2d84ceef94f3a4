"""Big-grid 2D-tiled DMA kernel (pallas_tiled2d): exactness vs the oracle,
the banded kernel, and the XLA solver — interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import core, pallas_biggrid, pallas_tiled2d, reference_np


def _state(h, w, seed=0, eps=1e-2):
    img = maps.random_obstacles(h, w, density=0.12, seed=seed)
    return epic_tpu.from_occupancy_image(img, epsilon=eps)


@pytest.mark.parametrize("h,w,band,k,wt", [
    (96, 300, 16, 8, 128),    # several bands x several tiles
    (64, 140, 8, 8, 128),     # k == band, ragged width (padded last tile)
    (40, 520, 16, 8, 256),    # wide, 256-col tiles
    (30, 130, 16, 16, 128),   # single band, two tiles
])
def test_tiled_chunk_bitmatches_global_sweeps(h, w, band, k, wt):
    st = _state(h, w, seed=3)
    g = pallas_tiled2d.pad_state(st, band=band, k=k, wt=wt)
    u_np = np.asarray(st.u)
    locked = np.asarray(st.locked)

    u_pad = g.u
    t = 0
    # Full chunks and a shallow remainder; total sweeps stay ~20 so the
    # XLA-CPU-vs-NumPy transcendental drift stays under the 2e-6 bar (the
    # kernel is bit-exact vs the banded chunks at any depth — next test).
    for depth in (k, 3, min(k, 20 - k - 3)):
        u_pad, delta = pallas_tiled2d.sweep_chunk_tiled(
            u_pad, g.frozen, jnp.int32(t), depth, band, k, wt, True
        )
        for s in range(depth):
            u_np, d_ref = reference_np.sweep(u_np, locked, t + s)
            if s == 0:
                assert float(delta) == pytest.approx(float(d_ref), abs=1e-6)
        t += depth
        got = np.asarray(
            u_pad[k : k + h, pallas_tiled2d._HX : pallas_tiled2d._HX + w]
        )
        np.testing.assert_allclose(got, u_np, rtol=0, atol=2e-6,
                                   err_msg=f"after t={t}")


@pytest.mark.parametrize("band,k", [(16, 8), (16, 16)])
def test_tiled_chunk_bitmatches_banded_chunk(band, k):
    """Tiled and row-banded chunks must produce identical grids (both are
    bit-exact re-tilings of the same global sweeps) at any chunk depth."""
    st = _state(72, 280, seed=5)
    gt = pallas_tiled2d.pad_state(st, band=band, k=k, wt=128)
    gb = pallas_biggrid.pad_state(st, band=band, k=k)
    u_t, u_b = gt.u, gb.u
    t = 0
    for depth in (k, 1, 5):
        u_t, del_t = pallas_tiled2d.sweep_chunk_tiled(
            u_t, gt.frozen, jnp.int32(t), depth, band, k, 128, True
        )
        u_b, del_b = pallas_biggrid.sweep_chunk_dma(
            u_b, gb.frozen, jnp.int32(t), depth, band, k, True
        )
        assert float(del_t) == float(del_b)
        np.testing.assert_array_equal(
            np.asarray(u_t[k : k + 72, 128 : 128 + 280]),
            np.asarray(u_b[k : k + 72, :280]),
        )
        t += depth


def test_update_n_matches_core():
    st = _state(80, 260, seed=5)
    out_t = pallas_tiled2d.update_n(st, 37, chunk_depth=16)
    out_ref = core.update_n(st, 37)
    np.testing.assert_allclose(
        np.asarray(out_t.u), np.asarray(out_ref.u), rtol=0, atol=2e-6
    )
    assert int(out_t.iteration) == int(out_ref.iteration)


def test_solve_matches_core_protocol():
    st = _state(64, 160, seed=7, eps=1e-2)
    out_t = pallas_tiled2d.solve(st, stagger=13)
    out_ref = core.solve(st, stagger=13)
    assert int(out_t.iteration) == int(out_ref.iteration)
    assert bool(out_t.converged)
    np.testing.assert_allclose(
        np.asarray(out_t.u), np.asarray(out_ref.u), rtol=0, atol=1e-5
    )
    assert float(out_t.delta) == pytest.approx(float(out_ref.delta), abs=1e-6)


def test_solve_segments_bit_equals_solve():
    """Segmented wide-grid solving (watchdog-safe mega-grid convergence)
    must be BIT-identical to the single-dispatch solve — same compiled
    loop, segmented iteration bounds, including a cap landing
    mid-segment."""
    st1 = _state(64, 160, seed=7, eps=1e-2)
    st2 = _state(64, 160, seed=7, eps=1e-2)
    out1 = pallas_tiled2d.solve(st1, stagger=13)
    out2 = pallas_tiled2d.solve_segments(st2, stagger=13,
                                         segment_iterations=41)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out1.converged) and bool(out2.converged)
    np.testing.assert_array_equal(np.asarray(out1.u), np.asarray(out2.u))
    assert float(out1.delta) == float(out2.delta)

    st3 = _state(64, 160, seed=7, eps=1e-8)
    st4 = _state(64, 160, seed=7, eps=1e-8)
    out3 = pallas_tiled2d.solve(st3, stagger=13, max_iterations=95)
    out4 = pallas_tiled2d.solve_segments(st4, stagger=13, max_iterations=95,
                                         segment_iterations=50)
    assert int(out3.iteration) == int(out4.iteration)
    assert bool(out3.converged) == bool(out4.converged)
    np.testing.assert_array_equal(np.asarray(out3.u), np.asarray(out4.u))


def test_layout_chooser_budget_and_redundancy():
    for shape in [(16384, 16384), (32768, 32768), (8192, 8192),
                  (4096, 65536)]:
        band, k, wt = pallas_tiled2d.choose_tiled_layout(shape)
        assert (band + 2 * k) * (wt + 256) <= pallas_biggrid.EXT_BAND_CELL_BUDGET
        assert band % 8 == 0 and k in (8, 16) and wt % 128 == 0
    # The point of the tiled kernel: redundancy stays ~1.1 at widths where
    # the row-banded layout degrades toward 1.33-2x.
    red_16k = pallas_tiled2d.redundancy_tiled((16384, 16384))
    band_b, k_b = pallas_biggrid.choose_layout((16384, 16384))
    red_band_16k = (band_b + 2 * k_b) / band_b
    assert red_16k < 1.15 < red_band_16k
    assert pallas_tiled2d.redundancy_tiled((32768, 32768)) < 1.15


@pytest.mark.parametrize("stagger,eps", [(5, 1e-2), (13, 1e-1), (100, 1e-1)])
def test_solve_check_fold_protocol_edges(stagger, eps):
    """The folded check chunk must preserve the exit rules exactly across
    stagger < k, stagger > k with remainders, and early convergence."""
    st = _state(48, 150, seed=11, eps=eps)
    out_t = pallas_tiled2d.solve(st, stagger=stagger)
    out_ref = core.solve(st, stagger=stagger)
    assert int(out_t.iteration) == int(out_ref.iteration)
    assert int(out_t.iteration) % stagger == 1
    assert bool(out_t.converged) == bool(out_ref.converged)
    np.testing.assert_allclose(
        np.asarray(out_t.u), np.asarray(out_ref.u), rtol=0, atol=1e-5
    )
    assert float(out_t.delta) == pytest.approx(float(out_ref.delta), abs=1e-6)


@pytest.mark.parametrize("variant", ["tiled", "banded"])
def test_host_solve_matches_compiled_protocol(variant):
    """The host-driven (watchdog-safe) solve must reproduce the compiled
    protocol exactly and surface per-check deltas."""
    from epic_tpu.solver import host_solve

    st = _state(64, 160, seed=7, eps=1e-2)
    checks = []
    fn = (host_solve.solve_py_tiled if variant == "tiled"
          else host_solve.solve_py_banded)
    out_h = fn(st, stagger=13,
               on_check=lambda it, d: checks.append((it, d)))
    out_ref = core.solve(st, stagger=13)
    assert int(out_h.iteration) == int(out_ref.iteration)
    assert bool(out_h.converged)
    np.testing.assert_allclose(
        np.asarray(out_h.u), np.asarray(out_ref.u), rtol=0, atol=1e-5
    )
    assert float(out_h.delta) == pytest.approx(float(out_ref.delta), abs=1e-6)
    # one observed residual per stagger cycle, at check iterations 0, 13, ...
    assert [it for it, _ in checks] == list(range(0, int(out_h.iteration), 13))
