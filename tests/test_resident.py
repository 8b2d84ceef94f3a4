"""Resident guard-aligned shard layout == banded shard path == core, on a
virtual 8-device CPU mesh (VERDICT r3 items 1/4: the tile-pure layout must
be bit-equal to the paths it replaces before it can claim their rates)."""

import numpy as np
import pytest

import jax

import epic_tpu
from epic_tpu import maps
from epic_tpu.parallel import make_mesh, resident, sharded
from epic_tpu.solver import core


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh((2, 4))


def _state(img, eps=1e-2):
    return epic_tpu.from_occupancy_image(img, epsilon=eps)


def _aligned_img(h, w, seed=3, density=0.12):
    return maps.random_obstacles(h, w, density=density, seed=seed)


@pytest.mark.parametrize("steps", [1, 5, 16, 37])
def test_resident_update_bit_equals_banded(mesh8, steps):
    """Every resident chunk count must be BIT-equal to the banded shard
    path (same update set, same guards, same fresh halo values) — the
    layout changes where bytes live, not what arithmetic runs."""
    img = _aligned_img(32, 512)
    st1, st2 = _state(img), _state(img)
    out_b = sharded.update_n(st1, steps, mesh8,
                             kernel="pallas_banded_interpret")
    out_r = resident.update_n(st2, steps, mesh8)
    np.testing.assert_array_equal(np.asarray(out_b.u), np.asarray(out_r.u))
    assert float(out_b.delta) == float(out_r.delta)


def test_resident_update_matches_core(mesh8):
    img = _aligned_img(48, 1024, seed=7)
    st1, st2 = _state(img), _state(img)
    out_c = core.update_n(st1, 9)
    out_r = resident.update_n(st2, 9, mesh8)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out_c.delta), float(out_r.delta), rtol=1e-5, atol=1e-6
    )


def test_resident_solve_bit_equals_banded_solve(mesh8):
    img = _aligned_img(32, 512, seed=5, density=0.1)
    st1, st2 = _state(img), _state(img)
    out_b = sharded.solve(st1, mesh8, stagger=10,
                          kernel="pallas_banded_interpret")
    out_r = resident.solve(st2, mesh8, stagger=10)
    assert int(out_b.iteration) == int(out_r.iteration)
    assert bool(out_b.converged) == bool(out_r.converged)
    np.testing.assert_array_equal(np.asarray(out_b.u), np.asarray(out_r.u))
    assert float(out_b.delta) == float(out_r.delta)


def test_resident_solve_matches_core(mesh8):
    img = _aligned_img(32, 512, seed=11, density=0.08)
    st1, st2 = _state(img), _state(img)
    out_c = core.solve(st1, stagger=10)
    out_r = resident.solve(st2, mesh8, stagger=10)
    assert int(out_c.iteration) == int(out_r.iteration)
    assert bool(out_r.converged)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-3
    )


def test_resident_solve_segments_bit_equals_solve(mesh8):
    """Segmented sharded solving (watchdog-safe mega-grid convergence on
    the mesh) must be BIT-identical to the single-dispatch resident
    solve — same compiled shard_map loop, segmented bounds; the
    interior-slice + re-pad roundtrip between segments is exact."""
    img = _aligned_img(32, 512, seed=5, density=0.1)
    st1, st2, st3 = _state(img), _state(img), _state(img)
    out1 = resident.solve(st1, mesh8, stagger=10)
    out2 = resident.solve_segments(st2, mesh8, stagger=10,
                                   segment_iterations=37)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out1.converged) and bool(out2.converged)
    np.testing.assert_array_equal(np.asarray(out1.u), np.asarray(out2.u))
    assert float(out1.delta) == float(out2.delta)
    # sharded.solve routes the kwarg (and rejects it off the resident path).
    out3 = sharded.solve(st3, mesh8, stagger=10, kernel="resident_interpret",
                         segment_iterations=37)
    assert int(out3.iteration) == int(out1.iteration)
    with pytest.raises(ValueError, match="resident"):
        sharded.solve(_state(img), mesh8, stagger=10,
                      kernel="pallas_banded_interpret", segment_iterations=9)


@pytest.mark.parametrize("cap", [7, 30, 105])
def test_resident_solve_cap_matches_banded(mesh8, cap):
    """Capped exits must match the banded sharded solve exactly (both
    overshoot the cap to the end of the current stagger cycle — the
    while-cond re-checks only at cycle boundaries)."""
    img = _aligned_img(16, 512, seed=2, density=0.05)
    st1, st2 = _state(img, eps=1e-6), _state(img, eps=1e-6)
    out_b = sharded.solve(st1, mesh8, stagger=10, max_iterations=cap,
                          kernel="pallas_banded_interpret")
    out_r = resident.solve(st2, mesh8, stagger=10, max_iterations=cap)
    assert int(out_b.iteration) == int(out_r.iteration)
    assert bool(out_b.converged) == bool(out_r.converged)
    np.testing.assert_array_equal(np.asarray(out_b.u), np.asarray(out_r.u))


def test_resident_1d_mesh_and_shallow_shards():
    """(8,1) mesh: shards 8 rows tall force k down to the shard height."""
    mesh = make_mesh((8, 1))
    img = _aligned_img(64, 256, seed=4)
    st1, st2 = _state(img), _state(img)
    out_c = core.update_n(st1, 6)
    out_r = resident.update_n(st2, 6, mesh)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )


def test_resident_maze_goal_field(mesh8):
    """A maze fixture end-to-end: goals/walls survive the guard layout."""
    img = maps.recursive_maze(32, 512, seed=9)
    st1, st2 = _state(img, eps=1e-3), _state(img, eps=1e-3)
    out_b = sharded.update_n(st1, 50, mesh8,
                             kernel="pallas_banded_interpret")
    out_r = resident.update_n(st2, 50, mesh8)
    np.testing.assert_array_equal(np.asarray(out_b.u), np.asarray(out_r.u))


def test_sharded_kernel_routing(mesh8):
    """sharded.update_n/solve(kernel='resident') route to this module."""
    img = _aligned_img(32, 512, seed=6)
    st1, st2 = _state(img), _state(img)
    out_r = resident.update_n(st1, 5, mesh8)
    out_s = sharded.update_n(st2, 5, mesh8, kernel="resident")
    np.testing.assert_array_equal(np.asarray(out_r.u), np.asarray(out_s.u))


def test_ineligible_shard_raises(mesh8):
    """Misaligned shard extents fail with a clear error, not a trace-time
    shape error (the banded-path tiny-shard guard's twin)."""
    img = _aligned_img(30, 500, seed=8)   # 15x125 local blocks on (2,4)
    with pytest.raises(ValueError, match="resident layout"):
        resident.update_n(_state(img), 3, mesh8)
    with pytest.raises(ValueError, match="resident layout"):
        resident.solve(_state(img), mesh8, stagger=10)


def test_eligible_gate():
    assert resident.eligible(2048, 2048)
    assert not resident.eligible(2048, 2000)      # lanes not 128-aligned
    assert not resident.eligible(2043, 2048)      # rows not 8-aligned
    assert not resident.eligible(2048, 256)       # below MIN_WIDTH
    assert resident.eligible(8, 512)


def test_auto_dispatch_gate(monkeypatch):
    """'auto' routes beyond-VMEM aligned shards to the resident layout on
    TPU (measured faster than the banded relayout path), keeps VMEM-sized
    and misaligned shards on the classic paths, and never fires on CPU."""
    from epic_tpu.parallel.sharded import _prefers_resident

    mesh1 = make_mesh((1, 1), devices=np.array(jax.devices()[:1]))
    assert not _prefers_resident((4096, 4096), mesh1, 16)  # cpu backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _prefers_resident((4096, 4096), mesh1, 16)
    assert not _prefers_resident((482, 482), mesh1, 16)    # fits VMEM
    assert not _prefers_resident((4100, 4100), mesh1, 16)  # misaligned
