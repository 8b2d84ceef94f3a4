"""Pallas multi-sweep kernel equivalence vs the XLA core (interpret mode on
CPU; the real-TPU path is exercised by bench.py / __graft_entry__)."""

import numpy as np
import pytest

import jax.numpy as jnp

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import core, pallas_sweep, reference_np


def _state(img, eps=1e-2):
    return epic_tpu.from_occupancy_image(img, epsilon=eps)


def test_pad_unpad_roundtrip():
    img = maps.open_room(30, 45)
    st = _state(img)
    padded = pallas_sweep.pad_state(st)
    assert padded.u.shape[0] % 8 == 0 and padded.u.shape[1] % 128 == 0
    np.testing.assert_array_equal(
        np.asarray(padded.u)[:30, :45], np.asarray(st.u)
    )
    # Padding cells are frozen obstacles.
    assert np.all(np.asarray(padded.frozen)[:, 45:])
    assert np.all(np.asarray(padded.u)[:, 45:] == np.float32(-1e6))
    # Original boundary ring frozen even though not all locked.
    assert np.all(np.asarray(padded.frozen)[0, :])


def test_single_sweep_matches_oracle():
    img = maps.random_obstacles(24, 40, density=0.2, seed=3)
    st = _state(img)
    u_np = np.asarray(st.u)
    locked = np.asarray(st.locked)
    out = pallas_sweep.update_n(st, 1)
    u_ref, d_ref = reference_np.sweep(u_np, locked, 0)
    np.testing.assert_allclose(np.asarray(out.u), u_ref, rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(float(out.delta), d_ref, rtol=1e-5, atol=1e-6)


def test_multisweep_matches_repeated_oracle():
    img = maps.random_obstacles(16, 20, density=0.15, seed=1)
    st = _state(img)
    u_ref = np.asarray(st.u)
    locked = np.asarray(st.locked)
    out = pallas_sweep.update_n(st, 7)
    for it in range(7):
        u_ref, d = reference_np.sweep(u_ref, locked, it)
        if it == 0:
            d_first = d
    assert int(out.iteration) == 7
    np.testing.assert_allclose(np.asarray(out.u), u_ref, rtol=2e-6, atol=1e-3)
    np.testing.assert_allclose(float(out.delta), d_first, rtol=1e-5, atol=1e-6)


def test_solve_matches_core_solve():
    img = maps.random_obstacles(20, 24, density=0.15, seed=2)
    st1 = _state(img)
    st2 = _state(img)
    out_core = core.solve(st1, stagger=10)
    out_pallas = pallas_sweep.solve(st2, stagger=10)
    assert int(out_core.iteration) == int(out_pallas.iteration)
    assert bool(out_pallas.converged)
    np.testing.assert_allclose(
        np.asarray(out_core.u), np.asarray(out_pallas.u), rtol=2e-6, atol=1e-3
    )


def test_nonaligned_shapes_are_exact():
    # Shapes deliberately not multiples of (8, 128): padding must not leak.
    img = maps.open_room(33, 131)
    st = _state(img)
    out = pallas_sweep.update_n(st, 3)
    u_ref = np.asarray(st.u)
    for it in range(3):
        u_ref, _ = reference_np.sweep(u_ref, np.asarray(st.locked), it)
    np.testing.assert_allclose(np.asarray(out.u), u_ref, rtol=2e-6, atol=1e-3)


def test_fits_vmem_classifier():
    assert pallas_sweep.fits_vmem((482, 482))     # maze
    assert pallas_sweep.fits_vmem((700, 218))     # umass
    assert pallas_sweep.fits_vmem((962, 962))     # large_maze (round-2 budget)
    assert pallas_sweep.fits_vmem((1397, 1213))   # willow_garage
    # ~20 MB scoped VMEM per 1M cells caps the budget at ~2M cells:
    assert not pallas_sweep.fits_vmem((1735, 1419))   # large_mine -> biggrid
    assert not pallas_sweep.fits_vmem((4096, 4096))   # -> biggrid


def test_sweep_chunk_check_matches_plain_chunks():
    """The check variant's u1/u_k outputs are bit-identical to 1-sweep and
    k-sweep plain chunks, and its delta is the first sweep's residual."""
    import jax.numpy as jnp

    img = maps.random_obstacles(24, 20, density=0.2, seed=7)
    st = _state(img)
    padded = pallas_sweep.pad_state(st)
    u_k, u1, delta = pallas_sweep.sweep_chunk_check(
        padded.u, padded.frozen, jnp.int32(3), 9, True
    )
    padded2 = pallas_sweep.pad_state(st)
    u1_ref, d_ref = pallas_sweep.sweep_chunk(
        padded2.u, padded2.frozen, jnp.int32(3), 1, True
    )
    padded3 = pallas_sweep.pad_state(st)
    uk_ref, _ = pallas_sweep.sweep_chunk(
        padded3.u, padded3.frozen, jnp.int32(3), 9, True
    )
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u1_ref))
    np.testing.assert_array_equal(np.asarray(u_k), np.asarray(uk_ref))
    assert float(delta) == float(d_ref)


@pytest.mark.parametrize("cap", [200, 250, 1000_000])
def test_solve_speculative_double_cycle_matches_core(cap):
    """The solve while-body runs ONE check-folded stagger cycle per
    iteration (a speculative double-cycle body was measured and rejected —
    commit ab7771e); trajectories must stay step-for-step identical to
    core.solve, including capped exits at max_iterations values that are
    not a multiple of the stagger cycle (the body single-steps the
    remainder near the cap)."""
    import numpy as np

    import epic_tpu
    from epic_tpu import maps
    from epic_tpu.solver import core, pallas_sweep as ps

    img = maps.recursive_maze(48, 64, seed=9)
    out_p = ps.solve(epic_tpu.from_occupancy_image(img, epsilon=1e-4),
                     max_iterations=cap)
    out_c = core.solve(epic_tpu.from_occupancy_image(img, epsilon=1e-4),
                       max_iterations=cap)
    assert int(out_p.iteration) == int(out_c.iteration)
    assert bool(out_p.converged) == bool(out_c.converged)
    np.testing.assert_array_equal(np.asarray(out_p.u), np.asarray(out_c.u))
