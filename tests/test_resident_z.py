"""Z-resident 3D shard layout == z-sharded composition == core, on virtual
CPU meshes (VERDICT r4 item 2: the cube regime must not pay the plane-guard
redundancy; z-major sharding keeps the wide plane axes local)."""

import numpy as np
import pytest

import jax

from epic_tpu.grid import make_state
from epic_tpu.parallel import make_mesh, resident_z, sharded3d
from epic_tpu.parallel.sharded3d import make_mesh3d
from epic_tpu.solver import core


@pytest.fixture(scope="module")
def meshz8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh3d((8, 1, 1))


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
def test_resident_z_update_matches_zsharded(meshz8, steps):
    """Every chunk count (sub-k, full cycles, remainders) matches the
    z-sharded XLA composition (pinned-op-order kernels: tolerance across
    the XLA/Pallas boundary, tight)."""
    st1 = _volume(32, 24, 256, seed=3)
    st2 = _volume(32, 24, 256, seed=3)
    out_s = sharded3d.update_n(st1, steps, meshz8, kernel="xla")
    out_r = resident_z.update_n(st2, steps, meshz8)
    np.testing.assert_allclose(
        np.asarray(out_s.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out_s.delta), float(out_r.delta), rtol=1e-5, atol=1e-6
    )


def test_resident_z_update_matches_core(meshz8):
    st1 = _volume(24, 24, 256, seed=7)
    st2 = _volume(24, 24, 256, seed=7)
    out_c = core.update_n(st1, 7)
    out_r = resident_z.update_n(st2, 7, meshz8)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out_c.delta), float(out_r.delta), rtol=1e-5, atol=1e-6
    )


def test_resident_z_odd_shard_depth_parity():
    """Odd per-shard depths make the z parity origin odd on alternate
    shards (z0 = mz * d_loc); results must still match core."""
    mesh = make_mesh3d((4, 1, 1), devices=np.asarray(jax.devices()[:4]))
    st1 = _volume(36, 16, 128, seed=5)   # d_loc = 9
    st2 = _volume(36, 16, 128, seed=5)
    out_c = core.update_n(st1, 5)
    out_r = resident_z.update_n(st2, 5, mesh)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )


def test_resident_z_nonaligned_depth():
    """Volume depth not divisible by the mesh: padded tail shards are
    fully frozen; results match core."""
    mesh = make_mesh3d((4, 1, 1), devices=np.asarray(jax.devices()[:4]))
    st1 = _volume(22, 16, 128, seed=4)
    st2 = _volume(22, 16, 128, seed=4)
    out_c = core.update_n(st1, 6)
    out_r = resident_z.update_n(st2, 6, mesh)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )


def test_resident_z_solve_matches_core(meshz8):
    """Solve-to-convergence through the folded in-kernel check:
    iteration-exact vs core, converged states equal. The 8-shard split of
    a 24-plane volume (3-plane shards, non-divisor bands, real
    neighbours both sides) exercises the guard/pad adjacency."""
    st1 = _volume(24, 24, 128, seed=5, density=0.06)
    st2 = _volume(24, 24, 128, seed=5, density=0.06)
    out_c = core.solve(st1, stagger=10)
    out_r = resident_z.solve(st2, meshz8, stagger=10)
    assert int(out_c.iteration) == int(out_r.iteration)
    assert bool(out_r.converged)
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-3
    )


@pytest.mark.parametrize("cap", [7, 105])
def test_resident_z_solve_cap_matches_zsharded(cap):
    """Capped exits match the z-sharded composition's iteration counts
    (both overshoot the cap to the stagger-cycle boundary)."""
    mesh = make_mesh3d((2, 1, 1), devices=np.asarray(jax.devices()[:2]))
    st1 = _volume(12, 32, 128, seed=2, density=0.05, eps=1e-6)
    st2 = _volume(12, 32, 128, seed=2, density=0.05, eps=1e-6)
    out_s = sharded3d.solve(st1, mesh, stagger=10, max_iterations=cap,
                            kernel="xla")
    out_r = resident_z.solve(st2, mesh, stagger=10, max_iterations=cap)
    assert int(out_s.iteration) == int(out_r.iteration)
    assert bool(out_s.converged) == bool(out_r.converged)
    np.testing.assert_allclose(
        np.asarray(out_s.u), np.asarray(out_r.u), rtol=2e-6, atol=1e-4
    )


def test_resident_z_solve_segments_bit_equals_solve(meshz8):
    st1 = _volume(24, 24, 128, seed=5, density=0.06)
    st2 = _volume(24, 24, 128, seed=5, density=0.06)
    out1 = resident_z.solve(st1, meshz8, stagger=10)
    out2 = resident_z.solve_segments(st2, meshz8, stagger=10,
                                     segment_iterations=37)
    assert int(out1.iteration) == int(out2.iteration)
    assert bool(out1.converged) and bool(out2.converged)
    np.testing.assert_array_equal(np.asarray(out1.u), np.asarray(out2.u))
    assert float(out1.delta) == float(out2.delta)


def test_resident_z_rejects_wrong_meshes(meshz8):
    st = _volume(16, 16, 128, seed=1)
    with pytest.raises(ValueError, match="z-sharded mesh"):
        resident_z.update_n(st, 2, make_mesh((2, 4)))
    mixed = make_mesh3d((2, 2, 2))
    with pytest.raises(ValueError, match="z ONLY"):
        resident_z.update_n(st, 2, mixed)
    wide = _volume(16, 1024, 1024, seed=1, density=0.0)
    with pytest.raises(ValueError, match="VMEM budget"):
        resident_z.update_n(wide, 2, meshz8)


def test_resident_z_sharded3d_routing(meshz8):
    """sharded3d.update_n/solve(kernel='resident') route z-only meshes
    here."""
    st1 = _volume(32, 24, 256, seed=6)
    st2 = _volume(32, 24, 256, seed=6)
    out_r = resident_z.update_n(st1, 4, meshz8)
    out_s = sharded3d.update_n(st2, 4, meshz8, kernel="resident")
    np.testing.assert_array_equal(np.asarray(out_r.u), np.asarray(out_s.u))


def test_choose_mesh3d_orientation():
    """choose_mesh3d picks z-major meshes for cube-regime volumes and
    plane meshes for wide planes (BENCH_NOTES r5: the orientation decides
    the composition's rate class)."""
    devs = np.asarray(jax.devices())
    cube = sharded3d.choose_mesh3d((256, 256, 256), devices=devs)
    assert "mz" in cube.shape and cube.shape["mz"] == len(devs)
    wide = sharded3d.choose_mesh3d((32, 2048, 2048), devices=devs)
    assert "mz" not in wide.shape
    shallow = sharded3d.choose_mesh3d((4, 64, 128), devices=devs)  # d < n
    assert "mz" not in shallow.shape
    # End-to-end through the chosen cube mesh: routes to resident_z.
    st1 = _volume(32, 24, 256, seed=11)
    st2 = _volume(32, 24, 256, seed=11)
    out_c = core.update_n(st1, 4)
    out_z = sharded3d.update_n(st2, 4, cube, kernel="resident")
    np.testing.assert_allclose(
        np.asarray(out_c.u), np.asarray(out_z.u), rtol=2e-6, atol=1e-4
    )
