"""N-dimensional solver support (the reference stubs 4D out entirely —
harmonic_cpu.cpp:193-195 leaves ``harmonic_update_4d_cpu`` commented out and
harmonic_update_cpu silently does nothing for n=4).

The generic scalar oracle (reference_np.sweep_scalar_nd) follows the
reference's literal loop recursion — offset from (t, x0), negated per even
middle coordinate, innermost loop strided by 2 — so proving it reproduces the
2D AND 3D oracles pins the 4D+ parity convention to the reference's own
pattern rather than to a guess.
"""

import numpy as np
import pytest

import epic_tpu
from epic_tpu.solver import core, reference_np


def _random_grid(shape, density=0.15, seed=0):
    rng = np.random.default_rng(seed)
    u = np.full(shape, -1e6, dtype=np.float32)
    locked = np.zeros(shape, dtype=bool)
    shell = np.ones(shape, dtype=bool)
    shell[(slice(1, -1),) * len(shape)] = False
    locked |= shell
    locked |= rng.random(shape) < density
    goal = tuple(s // 2 for s in shape)
    u[goal] = 0.0
    locked[goal] = True
    return u, locked


@pytest.mark.parametrize("shape", [(9, 12), (7, 9, 8)])
def test_scalar_nd_reproduces_2d_and_3d_oracles(shape):
    """The generic loop recursion must equal the dedicated 2D/3D oracles
    (which are themselves golden-tested against the prebuilt binary)."""
    u, locked = _random_grid(shape, seed=1)
    dedicated = (
        reference_np.sweep_scalar
        if len(shape) == 2
        else reference_np.sweep_3d
    )
    cur_a, cur_b = u.copy(), u.copy()
    for t in range(6):
        cur_a, da = reference_np.sweep_scalar_nd(cur_a, locked, t)
        cur_b, db = dedicated(cur_b, locked, t)
        np.testing.assert_array_equal(cur_a, cur_b)
        assert da == pytest.approx(float(db), abs=1e-6)


@pytest.mark.parametrize("shape", [(6, 7, 6, 8), (5, 5, 6, 5, 7)])
def test_vectorized_nd_matches_scalar_nd(shape):
    u, locked = _random_grid(shape, seed=2)
    cur_a, cur_b = u.copy(), u.copy()
    for t in range(4):
        cur_a, da = reference_np.sweep_scalar_nd(cur_a, locked, t)
        cur_b, db = reference_np.sweep_nd(cur_b, locked, t)
        np.testing.assert_allclose(cur_a, cur_b, atol=2e-6)
        assert da == pytest.approx(float(db), abs=1e-5)


def test_core_sweep_matches_nd_oracle_4d():
    shape = (6, 8, 7, 9)
    u, locked = _random_grid(shape, seed=3)
    import jax.numpy as jnp

    cur_j = jnp.asarray(u)
    cur_n = u.copy()
    locked_j = jnp.asarray(locked)
    for t in range(6):
        cur_j, dj = core.sweep(cur_j, locked_j, jnp.int32(t))
        cur_n, dn = reference_np.sweep_nd(cur_n, locked, t)
        np.testing.assert_allclose(np.asarray(cur_j), cur_n, atol=2e-6)
        assert float(dj) == pytest.approx(float(dn), abs=1e-5)


def test_solve_protocol_4d_matches_oracle():
    """Full convergence protocol on a 4D hypergrid: identical iteration
    counts and fields between the XLA solver and the NumPy oracle."""
    state = epic_tpu.empty_grid_nd((5, 6, 6, 7), epsilon=1e-2)
    u = np.asarray(state.u).copy()
    locked = np.asarray(state.locked).copy()
    u[2, 3, 3, 3] = 0.0
    locked[2, 3, 3, 3] = True

    solved = core.solve(epic_tpu.make_state(u, locked, epsilon=1e-2), stagger=10)
    u_ref, iters_ref, delta_ref = reference_np.solve(
        u, locked, epsilon=1e-2, stagger=10
    )
    assert int(solved.iteration) == iters_ref
    assert iters_ref % 10 == 1  # protocol invariant: ≡ 1 mod stagger
    assert bool(solved.converged)
    np.testing.assert_allclose(np.asarray(solved.u), u_ref, atol=5e-6)
    assert float(solved.delta) == pytest.approx(float(delta_ref), abs=1e-6)


def test_update_n_4d_and_empty_grid_nd():
    state = epic_tpu.empty_grid_nd((5, 5, 6, 7), epsilon=1e-2)
    locked = np.asarray(state.locked)
    shell = np.ones(locked.shape, dtype=bool)
    shell[1:-1, 1:-1, 1:-1, 1:-1] = False
    assert locked[shell].all()
    assert not locked[~shell].any()
    # Real 4D dynamics: free interior (-1e6) with a single locked goal —
    # empty_grid_nd's interior is all-zero u, so locking every u == 0.0
    # cell would freeze the whole hypergrid and make the sweeps no-ops.
    u = np.asarray(state.u).copy()
    u[1:-1, 1:-1, 1:-1, 1:-1] = -1e6
    u[2, 2, 3, 3] = 0.0
    locked_goal = locked.copy()
    locked_goal[2, 2, 3, 3] = True
    state = epic_tpu.make_state(u, locked_goal, epsilon=1e-2)
    out = core.update_n(state, 5)
    assert int(out.iteration) == 5
    assert np.isfinite(float(out.delta))
    # The goal's neighbours must have moved off the free value.
    assert float(out.delta) > 0.0
    assert float(np.asarray(out.u)[2, 2, 3, 4]) > -1e6


def test_make_state_rejects_rank1():
    with pytest.raises(ValueError):
        epic_tpu.make_state(
            np.zeros(5, np.float32), np.zeros(5, bool), epsilon=1e-2
        )
