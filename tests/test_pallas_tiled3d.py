"""(z, y, x)-tiled wide-plane 3D kernel: exactness vs the 3D oracle and the
XLA solver, interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from epic_tpu.grid import make_state
from epic_tpu.solver import (core, pallas_biggrid3d, pallas_tiled3d,
                             reference_np)


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


@pytest.mark.parametrize("d,h,w,band,k,yt,wt", [
    (10, 20, 150, 2, 2, 8, 128),   # ragged everything, several tiles/axis
    (8, 18, 140, 4, 2, 16, 128),   # single y-remainder tile, k < band
    (6, 16, 130, 2, 2, 16, 128),   # k == band (max z redundancy)
])
def test_chunk_bitmatches_banded_kernel_and_oracle(d, h, w, band, k, yt, wt):
    """Chunks must BIT-match the production banded 3D kernel on the same
    backend (the bit-identity contract; some fixtures hit 1-ulp jnp-vs-np
    exp/log differences, so the NumPy oracle is a tolerance check)."""
    st = _volume(d, h, w, seed=3)
    g = pallas_tiled3d.pad_state(st, band=band, k=k, yt=yt, wt=wt)
    gb = pallas_biggrid3d.pad_state(st, band=2, k=2)

    u_np = np.asarray(st.u)
    locked = np.asarray(st.locked)

    u_pad = g.u
    ub_pad = gb.u
    t = 0
    for depth in (k, 1, k):  # full chunks and a shallow remainder chunk
        u_pad, delta = pallas_tiled3d.sweep_chunk_tiled3d(
            u_pad, g.frozen, jnp.int32(t), depth, band, k, yt, wt, g.hp2,
            True
        )
        for s in range(depth):
            ub_pad, db = pallas_biggrid3d.sweep_chunk_dma(
                ub_pad, gb.frozen, jnp.int32(t + s), 1, 2, 2, gb.hp, True)
            u_np, d_ref = reference_np.sweep_3d(u_np, locked, t + s)
            if s == 0:
                assert float(delta) == pytest.approx(float(d_ref), abs=1e-6)
                assert float(delta) == float(db)
        t += depth
        got = np.asarray(
            pallas_tiled3d.unpad(
                pallas_tiled3d.TiledVolume(
                    u=u_pad, frozen=g.frozen, depth=d, height=h, width=w,
                    hp2=g.hp2, band=band, k=k, yt=yt, wt=wt)))
        got_banded = np.asarray(
            pallas_biggrid3d.unpad(
                pallas_biggrid3d.BandedVolume(
                    u=ub_pad, frozen=gb.frozen, depth=d, height=h, width=w,
                    hp=gb.hp, band=2, k=2)))
        np.testing.assert_array_equal(got, got_banded)
        np.testing.assert_allclose(got, u_np, atol=1e-5)


def test_check_chunk_matches_plain_chunk():
    st = _volume(8, 18, 140, seed=5)
    g = pallas_tiled3d.pad_state(st, band=2, k=2, yt=16, wt=128)
    u2, delta2 = pallas_tiled3d.sweep_chunk_tiled3d(
        g.u, g.frozen, jnp.int32(0), 2, 2, 2, 16, 128, g.hp2, True)
    out_uk, out_u1, deltac = pallas_tiled3d.sweep_chunk_tiled3d_check(
        g.u, g.frozen, jnp.int32(0), 2, 2, 2, 16, 128, g.hp2, True)
    assert float(delta2) == float(deltac)
    pasted = pallas_tiled3d._paste(g.u, out_uk, 2, g.hp2)
    np.testing.assert_array_equal(np.asarray(pasted), np.asarray(u2))
    u1, _ = pallas_tiled3d.sweep_chunk_tiled3d(
        g.u, g.frozen, jnp.int32(0), 1, 2, 2, 16, 128, g.hp2, True)
    pasted1 = pallas_tiled3d._paste(g.u, out_u1, 2, g.hp2)
    np.testing.assert_array_equal(np.asarray(pasted1), np.asarray(u1))


def test_update_n_matches_core():
    st = _volume(8, 18, 140, seed=7)
    ref = core.update_n(_volume(8, 18, 140, seed=7), 5)
    # Force a small explicit layout via pad_state's chooser bypass: route
    # through update_n's default chooser only if it can pick one; here we
    # call the chunk path directly through update_n with a patched layout.
    g = pallas_tiled3d.pad_state(st, band=2, k=2, yt=8, wt=128)
    u = g.u
    t = 0
    delta = None
    while t < 5:
        ns = min(2, 5 - t)
        u, dd = pallas_tiled3d.sweep_chunk_tiled3d(
            u, g.frozen, jnp.int32(t), ns, 2, 2, 8, 128, g.hp2, True)
        if delta is None:
            delta = dd
        t += ns
    got = np.asarray(pallas_tiled3d.unpad(
        pallas_tiled3d.TiledVolume(
            u=u, frozen=g.frozen, depth=8, height=18, width=140,
            hp2=g.hp2, band=2, k=2, yt=8, wt=128)))
    np.testing.assert_allclose(got, np.asarray(ref.u), atol=2e-6)
    assert float(delta) == pytest.approx(float(ref.delta), abs=1e-6)


def test_solve_matches_core_protocol():
    st = _volume(8, 34, 140, density=0.05, seed=9, eps=1e-1)
    ref = core.solve(_volume(8, 34, 140, density=0.05, seed=9, eps=1e-1),
                     stagger=10)
    g = pallas_tiled3d.pad_state(st, band=2, k=2, yt=8, wt=128)
    u, iteration, delta, converged = pallas_tiled3d._solve_tiled3d(
        g.u, g.frozen, st.epsilon, 10, 100_000, 2, 2, 8, 128, g.hp2, True,
        max(st.u.shape))
    assert bool(converged)
    assert int(iteration) == int(ref.iteration)
    assert float(delta) == pytest.approx(float(ref.delta), abs=1e-6)
    got = np.asarray(pallas_tiled3d.unpad(
        pallas_tiled3d.TiledVolume(
            u=u, frozen=g.frozen, depth=8, height=34, width=140,
            hp2=g.hp2, band=2, k=2, yt=8, wt=128)))
    np.testing.assert_allclose(got, np.asarray(ref.u), atol=2e-6)


@pytest.mark.parametrize("n_chunks", [1, 2, 3])
def test_cycle_bitmatches_chained_chunks(n_chunks):
    """The (z, y, x)-tiled ping-pong cycle kernel must reproduce chained
    sweep_chunk_tiled3d calls bit-exactly (odd AND even chain lengths —
    the final state lands in different buffers)."""
    from epic_tpu.solver import pallas_cycle

    d, h, w, band, k, yt, wt = 10, 20, 150, 2, 2, 8, 128
    st = _volume(d, h, w, seed=11)
    g = pallas_tiled3d.pad_state(st, band=band, k=k, yt=yt, wt=wt)

    u_ref = g.u
    deltas_ref = []
    for c in range(n_chunks):
        u_ref, dd = pallas_tiled3d.sweep_chunk_tiled3d(
            u_ref, g.frozen, jnp.int32(c * k), k, band, k, yt, wt, g.hp2,
            True)
        deltas_ref.append(float(dd))

    a, b, deltas = pallas_cycle.sweep_cycle_tiled3d(
        g.u, jnp.copy(g.u), g.frozen, jnp.int32(0), n_chunks, k, band, yt,
        wt, g.hp2, True)
    out = b if n_chunks % 2 else a
    np.testing.assert_array_equal(np.asarray(out), np.asarray(u_ref))
    np.testing.assert_allclose(np.asarray(deltas), deltas_ref, rtol=0)


def test_update_n_cycle_path_matches_core():
    """update_n (which routes full K-chunks through the cycle chain) must
    stay exact vs the XLA oracle, including a remainder sweep."""
    st = _volume(10, 34, 140, density=0.05, seed=13)
    ref = core.update_n(_volume(10, 34, 140, density=0.05, seed=13), 5)
    out = pallas_tiled3d.update_n(st, 5)
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), atol=1e-5)
    assert float(out.delta) == pytest.approx(float(ref.delta), abs=1e-6)
    assert int(out.iteration) == int(ref.iteration)


def test_host_solve_matches_compiled_protocol():
    """The host-driven (watchdog-safe) wide-plane solve must reproduce the
    compiled protocol exactly and surface per-check deltas — it is the
    ONLY way to convergence when the volume's >= max(shape) propagation
    floor exceeds a single-dispatch budget."""
    from epic_tpu.solver import host_solve

    st = _volume(8, 34, 140, density=0.05, seed=9, eps=1e-1)
    checks = []
    out_h = host_solve.solve_py_tiled3d(
        st, stagger=13, on_check=lambda it, d: checks.append((it, d)))
    out_ref = core.solve(_volume(8, 34, 140, density=0.05, seed=9, eps=1e-1),
                         stagger=13)
    assert int(out_h.iteration) == int(out_ref.iteration)
    assert bool(out_h.converged)
    np.testing.assert_allclose(
        np.asarray(out_h.u), np.asarray(out_ref.u), rtol=0, atol=1e-5
    )
    assert float(out_h.delta) == pytest.approx(float(out_ref.delta), abs=1e-6)
    assert [it for it, _ in checks] == list(range(0, int(out_h.iteration), 13))


def test_layout_chooser_budget_and_coverage():
    for shape in [(64, 4096, 4096), (4, 1024, 1024), (16, 2048, 8192),
                  (128, 512, 512)]:
        band, k, yt, wt = pallas_tiled3d.choose_layout(shape)
        ext = ((band + 2 * k) * (yt + 2 * pallas_tiled3d._HY)
               * (wt + 2 * pallas_tiled3d._HX))
        assert ext <= pallas_biggrid3d.EXT_BAND_CELL_BUDGET
        assert k >= 2
    # Exactly the regime the banded kernel cannot serve:
    assert not pallas_biggrid3d.feasible((4, 1024, 1024))
    assert pallas_tiled3d.feasible((4, 1024, 1024))
    assert not pallas_biggrid3d.feasible((64, 4096, 4096))
    assert pallas_tiled3d.feasible((64, 4096, 4096))


def test_rejects_2d():
    st2 = make_state(np.full((40, 140), -1e6, np.float32),
                     np.zeros((40, 140), bool), 1e-2)
    with pytest.raises(ValueError):
        pallas_tiled3d.update_n(st2, 1)


def test_tiled3d_solve_segments_bit_equals_solve():
    """Segmented wide-plane solving must be BIT-identical to the
    single-dispatch solve (same compiled loop, segmented bounds)."""
    import numpy as np

    from epic_tpu.grid import make_state
    from epic_tpu.solver import pallas_tiled3d as t3

    rng = np.random.default_rng(3)
    u = np.full((6, 40, 272), -1e6, np.float32)
    locked = rng.random(u.shape) < 0.08
    locked[0] = locked[-1] = True
    locked[:, 0] = locked[:, -1] = True
    locked[:, :, 0] = locked[:, :, -1] = True
    u[3, 20, 136] = 0.0
    locked[3, 20, 136] = True
    out1 = t3.solve(make_state(u, locked, epsilon=1e-2), stagger=10)
    out2 = t3.solve_segments(make_state(u, locked, epsilon=1e-2),
                             stagger=10, segment_iterations=37)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out1.converged) and bool(out2.converged)
    np.testing.assert_array_equal(np.asarray(out1.u), np.asarray(out2.u))
