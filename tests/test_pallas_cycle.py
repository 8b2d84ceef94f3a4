"""Ping-pong cycle kernel (pallas_cycle): N chunks in one dispatch must be
bit-identical to chained sweep_chunk_dma calls — interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epic_tpu
from epic_tpu import maps
from epic_tpu.solver import pallas_biggrid, pallas_cycle


def _state(h, w, seed=0, eps=1e-2):
    img = maps.random_obstacles(h, w, density=0.12, seed=seed)
    return epic_tpu.from_occupancy_image(img, epsilon=eps)


@pytest.mark.parametrize("h,w,band,k,n_chunks", [
    (96, 64, 16, 8, 4),     # nb=6, cross-chunk prefetch path, even chain
    (96, 64, 16, 8, 3),     # odd chain (final state in B)
    (40, 200, 16, 16, 5),   # k == band, nb small -> fallback prefetch
    (34, 72, 16, 8, 2),     # nb=3 ragged height
    (20, 72, 16, 8, 3),     # nb=2: no cross-chunk prefetch
])
def test_cycle_bitmatches_chained_chunks(h, w, band, k, n_chunks):
    st = _state(h, w, seed=3)
    g = pallas_biggrid.pad_state(st, band=band, k=k)

    # Reference: chained single-chunk dispatches.
    u_ref = g.u
    deltas_ref = []
    for c in range(n_chunks):
        u_ref, d = pallas_biggrid.sweep_chunk_dma(
            u_ref, g.frozen, jnp.int32(c * k), k, band, k, True
        )
        deltas_ref.append(float(d))

    a, b, deltas = pallas_cycle.sweep_cycle(
        g.u, jnp.copy(g.u), g.frozen, jnp.int32(0), n_chunks, k, band, True
    )
    final = b if n_chunks % 2 else a
    np.testing.assert_array_equal(np.asarray(final), np.asarray(u_ref))
    np.testing.assert_allclose(np.asarray(deltas), deltas_ref, atol=0)


@pytest.mark.parametrize("h,w,band,k,n_chunks", [
    (96, 64, 16, 8, 4),     # even chain (final state in A)
    (34, 72, 16, 8, 3),     # odd chain, ragged height
    (20, 72, 16, 8, 2),     # nb=2: no cross-chunk prefetch
])
def test_cycle_check_bitmatches_chunks_and_exposes_u1(h, w, band, k,
                                                      n_chunks):
    """sweep_cycle_check must reproduce the plain cycle bit-exactly AND
    surface chunk 0's post-first-sweep centres (the staggered-check exit
    state) plus its residual, with a fill twin (only guards read)."""
    st = _state(h, w, seed=5)
    g = pallas_biggrid.pad_state(st, band=band, k=k)

    u_ref = g.u
    deltas_ref = []
    for c in range(n_chunks):
        u_ref, d = pallas_biggrid.sweep_chunk_dma(
            u_ref, g.frozen, jnp.int32(c * k), k, band, k, True
        )
        deltas_ref.append(float(d))
    u1_ref, d1_ref = pallas_biggrid.sweep_chunk_dma(
        g.u, g.frozen, jnp.int32(0), 1, band, k, True
    )

    alt = jnp.full_like(g.u, jnp.float32(-1e6))
    a, b, u1, deltas = pallas_cycle.sweep_cycle_check(
        g.u, alt, g.frozen, jnp.int32(0), n_chunks, k, band, True
    )
    final = b if n_chunks % 2 else a
    np.testing.assert_array_equal(np.asarray(final), np.asarray(u_ref))
    np.testing.assert_allclose(np.asarray(deltas), deltas_ref, atol=0)
    assert float(deltas[0]) == float(d1_ref)
    # u1 pasted into EITHER output buffer reconstructs the exact 1-sweep
    # state (non-centre cells of both buffers are the constant pad value).
    for buf in (a, b):
        pasted = jax.lax.dynamic_update_slice(buf, u1, (k, 0))
        np.testing.assert_array_equal(np.asarray(pasted), np.asarray(u1_ref))


def test_tiled_cycle_check_bitmatches_and_exposes_u1():
    """The tiled check-cycle twin: bit-equal to chained tiled chunks, u1
    reconstructs the exact 1-sweep state in either output buffer."""
    from epic_tpu.solver import pallas_tiled2d

    h, w, band, k, wt, n_chunks = 40, 300, 16, 8, 128, 3
    st = _state(h, w, seed=9)
    g = pallas_tiled2d.pad_state(st, band=band, k=k, wt=wt)
    hx = pallas_tiled2d._HX

    u_ref = g.u
    deltas_ref = []
    for c in range(n_chunks):
        u_ref, d = pallas_tiled2d.sweep_chunk_tiled(
            u_ref, g.frozen, jnp.int32(c * k), k, band, k, wt, True
        )
        deltas_ref.append(float(d))
    u1_ref, _ = pallas_tiled2d.sweep_chunk_tiled(
        g.u, g.frozen, jnp.int32(0), 1, band, k, wt, True
    )

    alt = jnp.full_like(g.u, jnp.float32(-1e6))
    a, b, u1, deltas = pallas_cycle.sweep_cycle_tiled_check(
        g.u, alt, g.frozen, jnp.int32(0), n_chunks, k, band, wt, True
    )
    final = b if n_chunks % 2 else a
    np.testing.assert_array_equal(np.asarray(final), np.asarray(u_ref))
    np.testing.assert_allclose(np.asarray(deltas), deltas_ref, atol=0)
    for buf in (a, b):
        pasted = jax.lax.dynamic_update_slice(buf, u1, (k, hx))
        np.testing.assert_array_equal(np.asarray(pasted), np.asarray(u1_ref))


def test_cycle_chains_across_calls():
    """Consecutive cycle calls (reusing the ping-pong pair) continue the
    relaxation exactly."""
    st = _state(48, 80, seed=5)
    g = pallas_biggrid.pad_state(st, band=16, k=8)

    u_ref = g.u
    for c in range(5):
        u_ref, _ = pallas_biggrid.sweep_chunk_dma(
            u_ref, g.frozen, jnp.int32(c * 8), 8, 16, 8, True
        )

    a, b, _ = pallas_cycle.sweep_cycle(
        g.u, jnp.copy(g.u), g.frozen, jnp.int32(0), 2, 8, 16, True
    )
    # 2 chunks done (final in a); continue with 3 more from iteration 16.
    a, b, _ = pallas_cycle.sweep_cycle(
        a, b, g.frozen, jnp.int32(16), 3, 8, 16, True
    )
    np.testing.assert_array_equal(np.asarray(b), np.asarray(u_ref))


@pytest.mark.parametrize("h,w,band,k,wt,n_chunks", [
    (96, 300, 16, 8, 128, 4),   # nb x nt grid, even chain
    (96, 300, 16, 8, 128, 3),   # odd chain (final in B)
    (40, 520, 16, 16, 256, 2),  # k == band, 256-col tiles
    (20, 260, 16, 8, 128, 3),   # nb=2: no cross-chunk prefetch
])
def test_tiled_cycle_bitmatches_chained_tiled_chunks(h, w, band, k, wt,
                                                     n_chunks):
    from epic_tpu.solver import pallas_tiled2d

    st = _state(h, w, seed=7)
    g = pallas_tiled2d.pad_state(st, band=band, k=k, wt=wt)

    u_ref = g.u
    deltas_ref = []
    for c in range(n_chunks):
        u_ref, d = pallas_tiled2d.sweep_chunk_tiled(
            u_ref, g.frozen, jnp.int32(c * k), k, band, k, wt, True
        )
        deltas_ref.append(float(d))

    a, b, deltas = pallas_cycle.sweep_cycle_tiled(
        g.u, jnp.copy(g.u), g.frozen, jnp.int32(0), n_chunks, k, band, wt, True
    )
    final = b if n_chunks % 2 else a
    np.testing.assert_array_equal(np.asarray(final), np.asarray(u_ref))
    np.testing.assert_allclose(np.asarray(deltas), deltas_ref, atol=0)


@pytest.mark.parametrize("shape,band,k,n_chunks", [
    ((14, 12, 40), 2, 2, 5),   # nb=7, production-like k=2, odd chain
    ((14, 12, 40), 2, 2, 4),   # even chain
    ((8, 10, 24), 2, 2, 3),    # nb=4
    ((6, 10, 24), 2, 2, 2),    # nb=3: (nb-2)*band >= k boundary
])
def test_cycle3d_bitmatches_chained_chunks(shape, band, k, n_chunks):
    from epic_tpu.grid import make_state
    from epic_tpu.solver import pallas_biggrid3d

    rng = np.random.default_rng(9)
    d, h, w = shape
    u = np.full(shape, -1e6, dtype=np.float32)
    locked = np.zeros(shape, dtype=bool)
    shell = np.ones(shape, dtype=bool)
    shell[1:-1, 1:-1, 1:-1] = False
    locked |= shell
    locked |= rng.random(shape) < 0.1
    u[d // 2, h // 2, w // 2] = 0.0
    locked[d // 2, h // 2, w // 2] = True
    st = make_state(u, locked, epsilon=1e-2)
    g = pallas_biggrid3d.pad_state(st, band=band, k=k)

    u_ref = g.u
    deltas_ref = []
    for c in range(n_chunks):
        u_ref, dd = pallas_biggrid3d.sweep_chunk_dma(
            u_ref, g.frozen, jnp.int32(c * k), k, band, k, g.hp, True
        )
        deltas_ref.append(float(dd))

    a, b, deltas = pallas_cycle.sweep_cycle3d(
        g.u, jnp.copy(g.u), g.frozen, jnp.int32(0), n_chunks, k, band, g.hp, True
    )
    final = b if n_chunks % 2 else a
    np.testing.assert_array_equal(np.asarray(final), np.asarray(u_ref))
    np.testing.assert_allclose(np.asarray(deltas), deltas_ref, atol=0)


def test_chain_lengths_cap_and_reuse():
    """Long chains must split below MAX_CHUNKS_PER_DISPATCH: an uncapped
    2048-chunk dispatch allocates a 1 MB deltas block in scoped SMEM and
    fails Mosaic compilation (hit on chip by biggrid3d.update_n(st, 6000)
    at k=2). The decomposition must still sum exactly and stay a small,
    reusable program set."""
    from epic_tpu.solver import pallas_cycle as pc

    for n in (1, 2, 3, 511, 512, 513, 750, 3000, 4096, 5000):
        parts = pc.chain_lengths(n)
        assert sum(parts) == n, n
        assert all(p <= pc.MAX_CHUNKS_PER_DISPATCH for p in parts), (n, parts)
        # Reuse: at most one program per power of two plus the cap program.
        assert len(set(parts)) <= 11, (n, parts)
    assert pc.chain_lengths(0) == []
