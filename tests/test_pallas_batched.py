"""Collage batched solver: per-lane exactness vs the vmapped XLA path."""

import numpy as np
import jax.numpy as jnp

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import batched, core, pallas_batched


def _batch(n_goals=3, h=24, w=32):
    base = maps.random_obstacles(h, w, density=0.15, seed=7)
    goal_sets = [[(5, 5)], [(25, 18)], [(5, 5), (25, 18)]][:n_goals]
    return batched.batch_from_goal_sets(base, goal_sets)


def test_chunk_matches_vmapped_core():
    u, locked = _batch()
    u_host = np.asarray(u)
    u_s, frozen, meta = pallas_batched.pad_batch(u_host, np.asarray(locked))
    out, _ = pallas_batched.sweep_chunk_batch(
        u_s, frozen, jnp.int32(0), 8, meta, interpret=True
    )
    ref_u, _ = batched.update_n_batch(u, locked, jnp.int32(0), 8)
    np.testing.assert_allclose(
        pallas_batched.unstack(out, meta), np.asarray(ref_u),
        rtol=2e-6, atol=1e-4,
    )


def test_parity_preserved_across_stacked_maps():
    # The stacking argument requires even H; verify map index doesn't shift
    # the checkerboard: lane 2's result equals a solo run of lane 2.
    u, locked = _batch()
    u_host = np.asarray(u)
    u_s, frozen, meta = pallas_batched.pad_batch(u_host, np.asarray(locked))
    out, _ = pallas_batched.sweep_chunk_batch(
        u_s, frozen, jnp.int32(0), 8, meta, interpret=True
    )
    lane = 2
    st = epic_tpu.make_state(u_host[lane], np.asarray(locked)[lane])
    solo = core.update_n(st, 8)
    np.testing.assert_allclose(
        pallas_batched.unstack(out, meta)[lane], np.asarray(solo.u),
        rtol=2e-6, atol=1e-4,
    )


def test_solve_batch_matches_solo():
    u, locked = _batch()
    u_host = np.asarray(u)
    locked_host = np.asarray(locked)
    u_out, iters, deltas, conv = pallas_batched.solve_batch(
        u_host, locked_host, epsilon=1e-2, stagger=11,
        interpret=True,
    )
    assert conv.all()
    for lane in range(u_host.shape[0]):
        st = epic_tpu.make_state(u_host[lane], locked_host[lane], epsilon=1e-2)
        solo = core.solve(st, stagger=11)
        assert int(iters[lane]) == int(solo.iteration), lane
        np.testing.assert_allclose(
            u_out[lane], np.asarray(solo.u), rtol=2e-6, atol=1e-3
        )


def test_odd_height_rejected():
    u = np.zeros((2, 9, 16), np.float32)
    locked = np.zeros((2, 9, 16), bool)
    try:
        pallas_batched.pad_batch(u, locked)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_solve_batch_deep_chunks_relaxed_protocol():
    # Production serving can trade check cadence for amortization: a larger
    # stagger with deep chunk passes is the same protocol at a different
    # cadence (still exact per-lane for that cadence).
    u, locked = _batch()
    u_host = np.asarray(u)
    out, iters, deltas, conv = pallas_batched.solve_batch(
        u_host, np.asarray(locked), epsilon=1e-2, stagger=64, interpret=True,
    )
    assert conv.all()
    ref = epic_tpu.make_state(u_host[0], np.asarray(locked)[0], epsilon=1e-2)
    solo = core.solve(ref, stagger=64)
    assert int(iters[0]) == int(solo.iteration)
    np.testing.assert_allclose(out[0], np.asarray(solo.u), rtol=2e-6, atol=1e-3)


def test_solve_batch_device_matches_host_protocol():
    """The one-dispatch device solve must reproduce the host-driven lockstep
    protocol lane for lane: same fields, iteration counts, deltas."""
    u, locked = _batch()
    u_host = np.asarray(u)
    locked_host = np.asarray(locked)
    d_u, d_it, d_dl, d_cv = pallas_batched.solve_batch_device(
        u_host, locked_host, epsilon=1e-2, stagger=11, interpret=True
    )
    h_u, h_it, h_dl, h_cv = pallas_batched.solve_batch(
        u_host, locked_host, epsilon=1e-2, stagger=11, interpret=True
    )
    assert d_cv.all() and h_cv.all()
    np.testing.assert_array_equal(d_it, h_it)
    np.testing.assert_allclose(d_dl, h_dl, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d_u, h_u, rtol=0, atol=1e-5)


def test_solve_batch_device_matches_solo_solves():
    u, locked = _batch()
    u_host = np.asarray(u)
    locked_host = np.asarray(locked)
    u_out, iters, deltas, conv = pallas_batched.solve_batch_device(
        u_host, locked_host, epsilon=1e-2, stagger=11, interpret=True
    )
    assert conv.all()
    for lane in range(u_host.shape[0]):
        st = epic_tpu.make_state(u_host[lane], locked_host[lane], epsilon=1e-2)
        solo = core.solve(st, stagger=11)
        assert int(solo.iteration) == iters[lane]
        np.testing.assert_allclose(
            u_out[lane], np.asarray(solo.u), rtol=2e-6, atol=1e-4
        )


def test_solve_batch_device_uneven_retirement():
    """Lanes with very different difficulty retire at different iterations;
    early retirees' fields must stay frozen while others keep relaxing."""
    base = maps.open_room(24, 24)
    goal_sets = [[(12, 12)], [(2, 2)], [(12, 12), (2, 2), (20, 20)]]
    u, locked = batched.batch_from_goal_sets(base, goal_sets)
    u_host, locked_host = np.asarray(u), np.asarray(locked)
    u_out, iters, deltas, conv = pallas_batched.solve_batch_device(
        u_host, locked_host, epsilon=1e-2, stagger=7, interpret=True
    )
    assert conv.all()
    for lane in range(3):
        st = epic_tpu.make_state(u_host[lane], locked_host[lane], epsilon=1e-2)
        solo = core.solve(st, stagger=7)
        assert int(solo.iteration) == iters[lane], lane
        np.testing.assert_allclose(
            u_out[lane], np.asarray(solo.u), rtol=2e-6, atol=1e-4
        )
