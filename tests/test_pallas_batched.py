"""Batched Pallas kernel: per-lane exactness vs the vmapped XLA path."""

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
    u_d, frozen, b, h, w = pallas_batched.pad_batch(
        u_host, np.asarray(locked), lane_block=4
    )
    out, d = pallas_batched.sweep_chunk_batch(
        u_d, frozen, jnp.int32(0), 5, lane_block=4, interpret=True
    )
    ref_u, ref_d = batched.update_n_batch(u, locked, jnp.int32(0), 5)
    np.testing.assert_allclose(
        np.asarray(out)[:b, :h, :w], np.asarray(ref_u), rtol=2e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d)[:b], np.asarray(ref_d), rtol=1e-5, atol=1e-6
    )


def test_solve_batch_matches_solo():
    u, locked = _batch()
    u_host = np.asarray(u)
    locked_host = np.asarray(locked)
    u_out, iters, deltas, conv = pallas_batched.solve_batch(
        u_host, locked_host, epsilon=1e-2, stagger=10, lane_block=4,
        interpret=True,
    )
    assert conv.all()
    for lane in range(u_host.shape[0]):
        st = epic_tpu.make_state(u_host[lane], locked_host[lane], epsilon=1e-2)
        solo = core.solve(st, stagger=10)
        assert int(iters[lane]) == int(solo.iteration), lane
        np.testing.assert_allclose(
            u_out[lane], np.asarray(solo.u), rtol=2e-6, atol=1e-3
        )


def test_lane_padding_isolated():
    # B not a multiple of lane_block: padded lanes must not affect results.
    u, locked = _batch(n_goals=2)
    u_host = np.asarray(u)
    u_out, iters, deltas, conv = pallas_batched.solve_batch(
        u_host, np.asarray(locked), epsilon=1e-2, stagger=10, lane_block=8,
        interpret=True,
    )
    assert u_out.shape == u_host.shape
    assert conv.all()
