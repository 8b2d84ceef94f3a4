"""Resident guard-aligned 3D shard layout == banded 3D shard path == core,
on virtual CPU meshes (VERDICT r3 item 1: the tile-pure layout must be
bit-equal to the paths it replaces before it can claim their rates)."""

import numpy as np
import pytest

import jax

from epic_tpu.grid import make_state
from epic_tpu.parallel import make_mesh, resident3d, sharded3d
from epic_tpu.solver import core


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh((2, 4))


def _volume(d, h, w, density=0.1, seed=0, eps=1e-2):
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


@pytest.mark.parametrize("steps", [1, 2, 5, 8])
def test_resident3d_update_bit_equals_banded(mesh8, steps):
    """Every chunk count (full cycles, remainders, sub-k) must be
    BIT-equal to the banded 3D shard path — the layout changes where
    bytes live, not what arithmetic runs."""
    st1 = _volume(8, 16, 512, seed=3)
    st2 = _volume(8, 16, 512, seed=3)
    out_b = sharded3d.update_n(st1, steps, mesh8, chunk_depth=2,
                               kernel="pallas_banded_interpret")
    out_r = resident3d.update_n(st2, steps, mesh8)
    np.testing.assert_array_equal(np.asarray(out_b.u), np.asarray(out_r.u))
    assert float(out_b.delta) == float(out_r.delta)


def test_resident3d_update_matches_core(mesh8):
    st1 = _volume(10, 16, 512, seed=7)
    st2 = _volume(10, 16, 512, seed=7)
    out_c = core.update_n(st1, 7)
    out_r = resident3d.update_n(st2, 7, mesh8)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out_c.delta), float(out_r.delta), rtol=1e-5, atol=1e-6
    )


def test_resident3d_solve_matches_core():
    mesh = make_mesh((4, 2))
    st1 = _volume(6, 32, 256, seed=5, density=0.06)
    st2 = _volume(6, 32, 256, seed=5, density=0.06)
    out_c = core.solve(st1, stagger=10)
    out_r = resident3d.solve(st2, mesh, stagger=10)
    assert int(out_c.iteration) == int(out_r.iteration)
    assert bool(out_r.converged)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-3
    )


@pytest.mark.parametrize("cap", [7, 30])
def test_resident3d_solve_cap_matches_banded(cap):
    """Capped exits must match the banded sharded3d solve exactly (both
    overshoot the cap to the end of the current stagger cycle)."""
    mesh = make_mesh((4, 2))
    st1 = _volume(6, 32, 256, seed=2, density=0.05, eps=1e-6)
    st2 = _volume(6, 32, 256, seed=2, density=0.05, eps=1e-6)
    out_b = sharded3d.solve(st1, mesh, stagger=10, max_iterations=cap,
                            kernel="pallas_banded_interpret")
    out_r = resident3d.solve(st2, mesh, stagger=10, max_iterations=cap)
    assert int(out_b.iteration) == int(out_r.iteration)
    assert bool(out_b.converged) == bool(out_r.converged)
    np.testing.assert_array_equal(np.asarray(out_b.u), np.asarray(out_r.u))


def test_resident3d_sharded3d_routing(mesh8):
    """sharded3d.update_n/solve(kernel='resident') route to this module."""
    st1 = _volume(8, 16, 512, seed=6)
    st2 = _volume(8, 16, 512, seed=6)
    out_r = resident3d.update_n(st1, 4, mesh8)
    out_s = sharded3d.update_n(st2, 4, mesh8, kernel="resident")
    np.testing.assert_array_equal(np.asarray(out_r.u), np.asarray(out_s.u))


def test_resident3d_ineligible_raises(mesh8):
    """Misaligned shard extents and z-sharded meshes fail with clear
    errors, not trace-time shape errors."""
    st = _volume(8, 14, 500, seed=8)   # 7x125 local planes on (2,4)
    with pytest.raises(ValueError, match="resident 3D layout"):
        resident3d.update_n(st, 3, mesh8)
    with pytest.raises(ValueError, match="resident 3D layout"):
        resident3d.solve(st, mesh8, stagger=10)
    from epic_tpu.parallel.sharded3d import make_mesh3d

    zmesh = make_mesh3d((2, 2, 2))
    st2 = _volume(8, 16, 256, seed=8)
    with pytest.raises(ValueError, match="plane-sharded"):
        resident3d.update_n(st2, 3, zmesh)


def test_resident3d_eligibility_and_layouts():
    assert resident3d.eligible(256, 256, 256)
    assert resident3d.eligible(256, 1024, 1024)   # the wide-shard regime
    assert not resident3d.eligible(256, 250, 256)   # rows not 8-aligned
    assert not resident3d.eligible(256, 256, 200)   # lanes not 128-aligned
    # The chooser is the UNSHARDED one (no divisor constraint): the shard
    # pads beyond its guards, so the layout matches pallas_tiled3d's.
    from epic_tpu.solver import pallas_tiled3d as t3

    assert (resident3d.choose_layout(64, 1024, 1024)
            == t3.choose_layout((64, 1024, 1024)))
    band, k, yt, wt = resident3d.choose_layout(256, 1024, 1024)
    assert k >= 2 and band >= 1


def test_resident3d_nondivisor_tiles_bit_equal(mesh8):
    """Shard extents that do NOT divide into the chosen tile grid (round-up
    padding beyond the guards) must still be bit-equal to the banded shard
    path."""
    st1 = _volume(8, 48, 1024, seed=12)  # 24-row shards: tiles round up
    st2 = _volume(8, 48, 1024, seed=12)
    out_b = sharded3d.update_n(st1, 4, mesh8, chunk_depth=2,
                               kernel="pallas_banded_interpret")
    out_r = resident3d.update_n(st2, 4, mesh8)
    np.testing.assert_array_equal(np.asarray(out_b.u), np.asarray(out_r.u))
    assert float(out_b.delta) == float(out_r.delta)


def test_resident3d_solve_nondivisor_layout_converges():
    """REGRESSION: solve on a non-divisor slab layout with a real
    lower-neighbour shard. Guard cells adjacent to the frozen round-up
    tile padding read the pad where the owning shard reads real data, so
    their transient updates never settle; with the in-kernel slab deltas
    feeding the staggered check the residual stuck at ~0.27 and the
    solve ran to its cap (states stayed exact — the poison sits >= _HY
    rows from the interior and k-sweep chunks cannot carry it in). The
    check delta is now the interior-only diff (_interior_delta)."""
    mesh = make_mesh((2, 1), devices=np.asarray(jax.devices()[:2]))
    st1 = _volume(8, 48, 128, seed=9, density=0.08)
    st2 = _volume(8, 48, 128, seed=9, density=0.08)
    # 24-row shards: yt=16 rounds up to 32 -> frozen padding right below
    # the bottom guard rows.
    band, k, yt, wt = resident3d.choose_layout(8, 24, 128)
    assert 24 % yt, "fixture must exercise a non-divisor tile layout"
    out_c = core.solve(st1, stagger=10, max_iterations=2000)
    out_r = resident3d.solve(st2, mesh, stagger=10, max_iterations=2000)
    assert bool(out_c.converged) and bool(out_r.converged)
    assert int(out_c.iteration) == int(out_r.iteration)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-3
    )


def test_resident3d_solve_segments_bit_equals_solve():
    """Segmented sharded 3D solving must be BIT-identical to the
    single-dispatch resident solve — same compiled shard_map loop,
    segmented bounds."""
    mesh = make_mesh((4, 2))
    st1 = _volume(6, 32, 256, seed=5, density=0.06)
    st2 = _volume(6, 32, 256, seed=5, density=0.06)
    out1 = resident3d.solve(st1, mesh, stagger=10)
    out2 = resident3d.solve_segments(st2, mesh, stagger=10,
                                     segment_iterations=37)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out1.converged) and bool(out2.converged)
    np.testing.assert_array_equal(np.asarray(out1.u), np.asarray(out2.u))
    assert float(out1.delta) == float(out2.delta)
    st3 = _volume(6, 32, 256, seed=5, density=0.06)
    out3 = sharded3d.solve(st3, mesh, stagger=10,
                           kernel="resident_interpret",
                           segment_iterations=37)
    assert int(out3.iteration) == int(out1.iteration)
    with pytest.raises(ValueError, match="resident"):
        sharded3d.solve(_volume(6, 32, 256), mesh, stagger=10,
                        kernel="pallas_banded_interpret",
                        segment_iterations=9)


def test_auto_dispatch_gate3d(monkeypatch):
    """'auto' routes wide-plane shards (plane-banding degenerate) to the
    resident 3D layout on TPU and keeps small-plane shards banded."""
    from epic_tpu.parallel.sharded3d import _prefers_resident, make_mesh3d

    mesh1 = make_mesh((1, 1), devices=np.array(jax.devices()[:1]))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _prefers_resident((64, 1024, 1024), mesh1, 2)
    assert not _prefers_resident((256, 256, 256), mesh1, 2)   # banded wins
    assert not _prefers_resident((64, 1002, 1024), mesh1, 2)  # misaligned
    zmesh = make_mesh3d((1, 1, 1), devices=np.array(jax.devices()[:1]))
    assert not _prefers_resident((64, 1024, 1024), zmesh, 2)  # z-sharded
