"""Sharded 3D volumes == single-device 3D solver, virtual 8-device CPU mesh
(the 3D extension of tests/test_sharded.py; the reference cannot scale 3D
at all — CPU-only scalar loop)."""

import numpy as np
import pytest

import jax

from epic_tpu.grid import make_state
from epic_tpu.parallel import make_mesh, sharded3d
from epic_tpu.solver import core


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh((2, 4))


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


def test_sharded3d_update_matches_core(mesh8):
    st1 = _volume(10, 24, 32, seed=3)
    st2 = _volume(10, 24, 32, seed=3)
    out1 = core.update_n(st1, 5)
    out2 = sharded3d.update_n(st2, 5, mesh8)
    assert int(out1.iteration) == int(out2.iteration)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out1.delta), float(out2.delta), rtol=1e-5, atol=1e-6
    )


def test_sharded3d_solve_matches_core(mesh8):
    st1 = _volume(8, 20, 28, seed=5, density=0.08)
    st2 = _volume(8, 20, 28, seed=5, density=0.08)
    out1 = core.solve(st1, stagger=10)
    out2 = sharded3d.solve(st2, mesh8, stagger=10)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out2.converged)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-3
    )


def test_sharded3d_nonaligned_volume(mesh8):
    # h, w not divisible by the (2, 4) mesh: padding must not leak.
    st1 = _volume(7, 21, 37, seed=7)
    st2 = _volume(7, 21, 37, seed=7)
    out1 = core.update_n(st1, 9)
    out2 = sharded3d.update_n(st2, 9, mesh8)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-4
    )


def test_sharded3d_chunk_depths_equivalent(mesh8):
    """Different K (halo depths per exchange) must not change results —
    the y/x trapezoid guard is exact at any chunking."""
    base = None
    for depth in (1, 3, 8):
        st = _volume(9, 24, 40, seed=11)
        out = sharded3d.update_n(st, 11, mesh8, chunk_depth=depth)
        u = np.asarray(out.u)
        if base is None:
            base = u
        else:
            np.testing.assert_array_equal(base, u)


def test_sharded3d_pallas_composition_matches_xla(mesh8):
    """Per-shard flattened Pallas kernel (interpret mode) == XLA local
    sweeps inside the same halo loop."""
    st1 = _volume(6, 16, 32, seed=13)
    st2 = _volume(6, 16, 32, seed=13)
    out_x = sharded3d.update_n(st1, 7, mesh8, kernel="xla")
    out_p = sharded3d.update_n(st2, 7, mesh8, kernel="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(out_x.u), np.asarray(out_p.u))
    assert float(out_x.delta) == float(out_p.delta)


def test_sharded3d_1d_mesh():
    mesh = make_mesh((8, 1))
    st1 = _volume(8, 32, 24, seed=17)
    st2 = _volume(8, 32, 24, seed=17)
    out1 = core.update_n(st1, 6)
    out2 = sharded3d.update_n(st2, 6, mesh)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-4
    )


def test_sharded3d_z_axis_update_matches_core():
    """Deep-volume decomposition: z sharded over an ('mz','my','mx') mesh
    (VERDICT r2 #8 — volumes with z >> plane scale past one chip)."""
    mesh = sharded3d.make_mesh3d((8, 1, 1))
    st1 = _volume(33, 12, 20, seed=19)
    st2 = _volume(33, 12, 20, seed=19)
    out1 = core.update_n(st1, 9)
    out2 = sharded3d.update_n(st2, 9, mesh, chunk_depth=3)
    assert int(out1.iteration) == int(out2.iteration)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out1.delta), float(out2.delta), rtol=1e-5, atol=1e-6
    )


def test_sharded3d_z_and_plane_mixed_mesh():
    """(2, 2, 2) mesh: z AND both plane axes sharded simultaneously, with a
    non-mesh-aligned shape; pallas-interpret per-shard kernel equals XLA."""
    mesh = sharded3d.make_mesh3d((2, 2, 2))
    st1 = _volume(11, 18, 26, seed=23)
    st2 = _volume(11, 18, 26, seed=23)
    st3 = _volume(11, 18, 26, seed=23)
    out1 = core.update_n(st1, 7)
    out_x = sharded3d.update_n(st2, 7, mesh, chunk_depth=4, kernel="xla")
    out_p = sharded3d.update_n(st3, 7, mesh, chunk_depth=4,
                               kernel="pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out_x.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out_x.u), np.asarray(out_p.u))
    assert float(out_x.delta) == float(out_p.delta)


def test_sharded3d_z_axis_solve_matches_core():
    """Full solve protocol through the z-sharded decomposition."""
    mesh = sharded3d.make_mesh3d((4, 2, 1))
    st1 = _volume(16, 14, 18, seed=29, density=0.08)
    st2 = _volume(16, 14, 18, seed=29, density=0.08)
    out1 = core.solve(st1, stagger=10)
    out2 = sharded3d.solve(st2, mesh, stagger=10)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out2.converged)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-3
    )


def test_sharded3d_banded_composition_matches_xla(mesh8):
    """shard_map + per-shard plane-banded DMA kernel (beyond-VMEM regime,
    forced via kernel=) equals the XLA path bit-for-bit, including a
    remainder chunk shallower than the exchange depth."""
    st1 = _volume(12, 20, 28, seed=31)
    st2 = _volume(12, 20, 28, seed=31)
    out_x = sharded3d.update_n(st1, 11, mesh8, chunk_depth=4, kernel="xla")
    out_b = sharded3d.update_n(st2, 11, mesh8, chunk_depth=4,
                               kernel="pallas_banded_interpret")
    np.testing.assert_array_equal(np.asarray(out_x.u), np.asarray(out_b.u))
    assert float(out_x.delta) == float(out_b.delta)


def test_sharded3d_banded_multiband(mesh8, monkeypatch):
    """Several plane-bands per shard (tiny ext budget forces the split)."""
    from epic_tpu.solver import pallas_biggrid3d

    monkeypatch.setattr(pallas_biggrid3d, "EXT_BAND_CELL_BUDGET", 40_000)
    st1 = _volume(14, 16, 20, seed=37)
    st2 = _volume(14, 16, 20, seed=37)
    out_x = sharded3d.update_n(st1, 5, mesh8, chunk_depth=2, kernel="xla")
    out_b = sharded3d.update_n(st2, 5, mesh8, chunk_depth=2,
                               kernel="pallas_banded_interpret")
    np.testing.assert_array_equal(np.asarray(out_x.u), np.asarray(out_b.u))
    assert float(out_x.delta) == float(out_b.delta)


def test_sharded3d_banded_solve_matches_core(mesh8):
    """Full 3D solve protocol through the banded per-shard kernel."""
    st1 = _volume(10, 18, 22, seed=41, density=0.06)
    st2 = _volume(10, 18, 22, seed=41, density=0.06)
    out1 = core.solve(st1, stagger=10)
    out2 = sharded3d.solve(st2, mesh8, stagger=10,
                           kernel="pallas_banded_interpret")
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out2.converged)
    np.testing.assert_allclose(
        np.asarray(out1.u), np.asarray(out2.u), rtol=2e-6, atol=1e-3
    )
