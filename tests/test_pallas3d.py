"""3D Pallas kernel equivalence vs the oracle and the XLA core (interpret
mode on CPU; the reference's 3D solver is CPU-only — harmonic_cpu.cpp:81-133
— so the TPU kernel is held to our own oracle, which test_oracle pins to the
reference parity/update derivation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from epic_tpu.grid import make_state
from epic_tpu.solver import core, pallas_sweep3d, reference_np


def _volume(d, h, w, density=0.0, seed=0):
    """Boundary-locked volume with one goal cell and optional random
    obstacles, mirroring test_oracle.test_3d_solve_converges."""
    rng = np.random.default_rng(seed)
    u = np.full((d, h, w), -1e6, dtype=np.float32)
    locked = np.zeros((d, h, w), dtype=bool)
    locked[0], locked[-1] = True, True
    locked[:, 0], locked[:, -1] = True, True
    locked[:, :, 0], locked[:, :, -1] = True, True
    if density:
        locked |= rng.random((d, h, w)) < density
    gz, gy, gx = d // 2, h // 2, w // 2
    u[gz, gy, gx] = 0.0
    locked[gz, gy, gx] = True
    return u, locked


def test_pad_roundtrip_and_frozen_mask():
    u, locked = _volume(6, 10, 40)
    st = make_state(u, locked, epsilon=1e-2)
    padded = pallas_sweep3d.pad_state(st)
    assert padded.u.shape[0] == 6
    assert padded.u.shape[1] % 8 == 0 and padded.u.shape[2] % 128 == 0
    np.testing.assert_array_equal(np.asarray(padded.u)[:, :10, :40], u)
    # Padding cells are frozen obstacles; the face cells are frozen too.
    frozen = np.asarray(padded.frozen)
    assert np.all(frozen[:, :, 40:])
    assert np.all(np.asarray(padded.u)[:, :, 40:] == np.float32(-1e6))
    assert np.all(frozen[0]) and np.all(frozen[-1])
    assert np.all(frozen[:, 0]) and np.all(frozen[:, :, 0])


def test_single_sweep_matches_oracle():
    u, locked = _volume(7, 9, 21, density=0.15, seed=3)
    st = make_state(u, locked, epsilon=1e-2)
    out = pallas_sweep3d.update_n(st, 1)
    u_ref, d_ref = reference_np.sweep_3d(u, locked, 0)
    np.testing.assert_allclose(np.asarray(out.u), u_ref, rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(float(out.delta), d_ref, rtol=1e-5, atol=1e-6)


def test_multisweep_matches_repeated_oracle():
    u, locked = _volume(6, 8, 17, density=0.1, seed=1)
    st = make_state(u, locked, epsilon=1e-2)
    out = pallas_sweep3d.update_n(st, 7)
    u_ref = u
    for it in range(7):
        u_ref, d = reference_np.sweep_3d(u_ref, locked, it)
        if it == 0:
            d_first = d
    assert int(out.iteration) == 7
    np.testing.assert_allclose(np.asarray(out.u), u_ref, rtol=2e-6, atol=1e-3)
    np.testing.assert_allclose(float(out.delta), d_first, rtol=1e-5, atol=1e-6)


def test_solve_matches_core_solve_and_protocol():
    u, locked = _volume(10, 12, 14, density=0.1, seed=2)
    u_ref, iters_ref, _ = reference_np.solve(u, locked, epsilon=1e-2, stagger=10)
    out_core = core.solve(make_state(u, locked, epsilon=1e-2), stagger=10)
    out_p = pallas_sweep3d.solve(make_state(u, locked, epsilon=1e-2), stagger=10)
    assert int(out_p.iteration) == iters_ref == int(out_core.iteration)
    assert bool(out_p.converged)
    np.testing.assert_allclose(np.asarray(out_p.u), u_ref, rtol=2e-6, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_p.u), np.asarray(out_core.u), rtol=2e-6, atol=1e-3
    )


def test_nonaligned_shapes_are_exact():
    # H, W deliberately not multiples of (8, 128): padding must not leak.
    u, locked = _volume(5, 9, 131)
    st = make_state(u, locked, epsilon=1e-2)
    out = pallas_sweep3d.update_n(st, 3)
    u_ref = u
    for it in range(3):
        u_ref, _ = reference_np.sweep_3d(u_ref, locked, it)
    np.testing.assert_allclose(np.asarray(out.u), u_ref, rtol=2e-6, atol=1e-3)


def test_rejects_2d_and_oversize():
    st2 = make_state(
        np.full((8, 8), -1e6, np.float32), np.zeros((8, 8), bool), 1e-2
    )
    with pytest.raises(ValueError):
        pallas_sweep3d.update_n(st2, 1)
    assert pallas_sweep3d.fits_vmem((64, 64, 128))
    assert not pallas_sweep3d.fits_vmem((128, 256, 512))
