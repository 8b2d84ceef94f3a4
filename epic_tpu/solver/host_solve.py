"""Host-driven solve protocol for the big-grid kernels.

The compiled solves (pallas_biggrid/_tiled2d ``solve``) run the whole
convergence protocol in ONE device dispatch. On a 16384²+ grid the
propagation guard forces >= max(H, W) sweeps before the first possible
exit, i.e. ~60+ s of device work in one dispatch — which remote-worker
environments kill (probe26/27; docs/BENCH_NOTES.md). This loop runs the
SAME protocol from the host, one stagger cycle (a check chunk + a cycle
chain + a remainder chunk) per ~0.3-0.5 s batch of dispatches, so it
completes on any infrastructure and exposes per-check deltas to the caller
— the big-grid twin of :func:`epic_tpu.solver.core.solve_py` and of the
reference's commented per-100-iteration delta printfs
(harmonic_cpu.cpp:175-180).

Protocol-exact (harmonic_complete_cpu): exit only right after a passing
staggered check with ``iteration >= max(shape)``; final iteration counts
are ≡ 1 (mod stagger); the exit state is the post-check-sweep state.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..grid import GridState
from . import pallas_cycle


def _host_protocol(
    u: jax.Array,
    frozen: jax.Array,
    epsilon: float,
    stagger: int,
    max_iterations: int,
    m_max: int,
    k: int,
    check_fn: Callable,      # (u, it, ns) -> (out_uk, out_u1, delta)
    paste_fn: Callable,      # (u, center_block) -> u'
    chunk_fn: Callable,      # (u, it, ns) -> (u', delta)
    cycle_fn: Callable,      # run_chain-compatible cycle kernel wrapper
    on_check: Callable[[int, float], None] | None = None,
):
    it = 0
    alt = None
    delta = float(epsilon) + 1.0
    converged = False
    cd = min(k, stagger)
    n_full, rem = divmod(stagger - cd, k)
    while it < max_iterations:
        out_uk, out_u1, d = check_fn(u, jnp.int32(it), cd)
        delta = float(np.asarray(d))
        if on_check is not None:
            on_check(it, delta)
        if delta < float(epsilon) and it + 1 >= m_max:
            u = paste_fn(u, out_u1)
            it += 1
            converged = True
            break
        u = paste_fn(u, out_uk)
        it += cd
        if n_full:
            u, alt, _ = pallas_cycle.run_chain(
                cycle_fn, u, alt, frozen, jnp.int32(it), n_full, k
            )
            it += n_full * k
        if rem:
            u, _ = chunk_fn(u, jnp.int32(it), rem)
            it += rem
    return u, it, delta, converged


def solve_py_tiled(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 16,
    interpret: bool | None = None,
    on_check: Callable[[int, float], None] | None = None,
) -> GridState:
    """Host-driven tiled big-grid solve (watchdog-safe mega-grid variant);
    semantics identical to :func:`pallas_tiled2d.solve`. ``on_check(it,
    delta)`` observes every staggered residual."""
    from . import pallas_tiled2d as t2

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = t2.pad_state(state, chunk_depth)
    hx = t2._HX

    def check_fn(u, it, ns):
        return t2.sweep_chunk_tiled_check(
            u, g.frozen, it, ns, g.band, g.k, g.wt, interpret)

    def paste_fn(u, center):
        return jax.lax.dynamic_update_slice(u, center, (g.k, hx))

    def chunk_fn(u, it, ns):
        return t2.sweep_chunk_tiled(
            u, g.frozen, it, ns, g.band, g.k, g.wt, interpret)

    def cycle_fn(u, alt, frozen, it, nc, k, _unused_interpret=False):
        return pallas_cycle.sweep_cycle_tiled(
            u, alt, frozen, it, nc, k, g.band, g.wt, interpret)

    u, it, delta, converged = _host_protocol(
        g.u, g.frozen, float(np.asarray(state.epsilon)), stagger,
        max_iterations, max(state.u.shape), g.k,
        check_fn, paste_fn, chunk_fn, cycle_fn, on_check,
    )
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, hx : hx + g.width],
        iteration=jnp.int32(it),
        delta=jnp.float32(delta),
        converged=jnp.asarray(converged),
    )


def solve_py_tiled3d(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 2,
    interpret: bool | None = None,
    on_check: Callable[[int, float], None] | None = None,
) -> GridState:
    """Host-driven wide-plane 3D solve; semantics identical to
    :func:`pallas_tiled3d.solve`.

    Needed where the compiled solve cannot run at all: a deep wide-plane
    volume's convergence floor is ``>= max(shape)`` sweeps (e.g. a
    64x4096x4096 volume needs >= 4096, ~2 minutes of device work in ONE
    dispatch at the kernel's ~19.5 G updates/s), which both exceeds
    remote-worker watchdogs AND cannot be split into capped compiled
    segments — a segment shorter than the propagation guard can never
    return a converged verdict."""
    from . import pallas_tiled3d as t3

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = t3.pad_state(state, chunk_depth)

    def check_fn(u, it, ns):
        return t3.sweep_chunk_tiled3d_check(
            u, g.frozen, it, ns, g.band, g.k, g.yt, g.wt, g.hp2, interpret)

    def paste_fn(u, center):
        return t3._paste(u, center, g.k, g.hp2)

    def chunk_fn(u, it, ns):
        return t3.sweep_chunk_tiled3d(
            u, g.frozen, it, ns, g.band, g.k, g.yt, g.wt, g.hp2, interpret)

    def cycle_fn(u, alt, frozen, it, nc, k, _unused_interpret=False):
        return pallas_cycle.sweep_cycle_tiled3d(
            u, alt, frozen, it, nc, k, g.band, g.yt, g.wt, g.hp2, interpret)

    u, it, delta, converged = _host_protocol(
        g.u, g.frozen, float(np.asarray(state.epsilon)), stagger,
        max_iterations, max(state.u.shape), g.k,
        check_fn, paste_fn, chunk_fn, cycle_fn, on_check,
    )
    return dataclasses.replace(
        state,
        u=t3.unpad(dataclasses.replace(g, u=u)),
        iteration=jnp.int32(it),
        delta=jnp.float32(delta),
        converged=jnp.asarray(converged),
    )


def solve_py_banded(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 16,
    interpret: bool | None = None,
    on_check: Callable[[int, float], None] | None = None,
) -> GridState:
    """Host-driven banded big-grid solve; semantics identical to
    :func:`pallas_biggrid.solve`."""
    from . import pallas_biggrid as bg

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = bg.pad_state(state, chunk_depth)

    def check_fn(u, it, ns):
        return bg.sweep_chunk_dma_check(
            u, g.frozen, it, ns, g.band, g.k, interpret)

    def paste_fn(u, center):
        return jax.lax.dynamic_update_slice(u, center, (g.k, 0))

    def chunk_fn(u, it, ns):
        return bg.sweep_chunk_dma(
            u, g.frozen, it, ns, g.band, g.k, interpret)

    def cycle_fn(u, alt, frozen, it, nc, k, _unused_interpret=False):
        return pallas_cycle.sweep_cycle(
            u, alt, frozen, it, nc, k, g.band, interpret)

    u, it, delta, converged = _host_protocol(
        g.u, g.frozen, float(np.asarray(state.epsilon)), stagger,
        max_iterations, max(state.u.shape), g.k,
        check_fn, paste_fn, chunk_fn, cycle_fn, on_check,
    )
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, : g.width],
        iteration=jnp.int32(it),
        delta=jnp.float32(delta),
        converged=jnp.asarray(converged),
    )
