"""Tiled Pallas kernel for grids larger than VMEM: temporal row-band blocking.

SUPERSEDED: production big-grid paths are :mod:`pallas_biggrid` (banded
DMA chunks), :mod:`pallas_tiled2d` (wide grids), and :mod:`pallas_cycle`
(chunk chains); this variant is kept as a tested historical baseline.

The VMEM-resident kernel (:mod:`epic_tpu.solver.pallas_sweep`) needs the
whole grid on-chip; beyond ~1M cells it cannot apply. A plain per-sweep
stencil at that scale is HBM-bandwidth-bound (read u + frozen + write u every
sweep) — XLA's fusion already achieves that roofline, so a Pallas kernel only
wins by *reducing traffic*. This kernel runs K sweeps per HBM round trip
(overlapped temporal blocking):

- the grid is split into row bands of height B;
- each band DMAs B + 2K rows (K halo rows per side) from the *input* array
  into VMEM, runs K red-black sweeps locally — the valid region shrinks by
  one row per side per sweep — and writes the B fully-K-swept central rows
  to the *output* array;
- halo rows are recomputed redundantly by adjacent bands (2K/B overhead),
  buying a ~K x reduction in HBM traffic vs per-sweep kernels;
- the first sweep's delta (the staggered-check semantics) is max-reduced
  across bands into SMEM.

Input and output are separate buffers: every band reads sweep-0 state for
its halo, keeping bands independent, so the result is identical to K global
sweeps (tested against the oracle). Overlapping windows are not expressible
with BlockSpec index maps, hence the manual double-buffer-free DMA design
(the sequential band loop still overlaps the *output* writeback of band i
with the input DMA of band i+1 via separate semaphores).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..grid import GridState

_LOG2N_2D = np.float32(np.log(np.float64(4.0)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tiled_kernel(it_ref, u_hbm, f_hbm, out_hbm, delta_ref, *, num_sweeps, band, guard):
    i = pl.program_id(0)
    k = guard  # halo depth baked into the layout (>= num_sweeps)
    ext = band + 2 * k
    w = u_hbm.shape[1]
    t0 = it_ref[0]

    # (int32 masks: v5e Mosaic rejects int8 vector comparisons.)
    def inner(u_vmem, f_vmem, in_sem, out_sem):
        win0 = i * band  # window start row in the padded array
        in_u = pltpu.make_async_copy(
            u_hbm.at[pl.ds(win0, ext), :], u_vmem, in_sem.at[0]
        )
        in_f = pltpu.make_async_copy(
            f_hbm.at[pl.ds(win0, ext), :], f_vmem, in_sem.at[1]
        )
        in_u.start()
        in_f.start()
        in_u.wait()
        in_f.wait()

        u = u_vmem[:]
        not_frozen = f_vmem[:] == 0
        # Real-cell parity: the padded layout shifts rows by K, and
        # (-K) ≡ (+K) mod 2, so parity = (padded_row + col + K) % 2.
        row = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 0) + win0
        col = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 1)
        parity = (row + col + k) % 2
        local_row = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 0)

        def body(s, carry):
            u, delta = carry
            un = pltpu.roll(u, 1, 0)
            us = pltpu.roll(u, ext - 1, 0)
            uw = pltpu.roll(u, 1, 1)
            ue = pltpu.roll(u, w - 1, 1)
            m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
            ssum = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(
                ue - m
            )
            val = (m + jnp.log(ssum)) - _LOG2N_2D
            valid = (local_row > s) & (local_row < ext - 1 - s)
            update = (parity != ((t0 + s) % 2)) & not_frozen & valid
            u_new = jnp.where(update, val, u)
            d = jnp.max(jnp.abs(u_new - u))
            delta = jnp.where(s == 0, d, delta)
            return u_new, delta

        u, delta = jax.lax.fori_loop(0, num_sweeps, body, (u, jnp.float32(0.0)))
        u_vmem[:] = u

        out = pltpu.make_async_copy(
            u_vmem.at[pl.ds(k, band), :],
            out_hbm.at[pl.ds(win0 + k, band), :],
            out_sem,
        )
        out.start()
        out.wait()

        @pl.when(i == 0)
        def _():
            delta_ref[0] = delta

        @pl.when(i != 0)
        def _():
            delta_ref[0] = jnp.maximum(delta_ref[0], delta)

    pl.run_scoped(
        inner,
        pltpu.VMEM((ext, w), jnp.float32),
        pltpu.VMEM((ext, w), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "band", "interpret", "guard"),
)
def sweep_chunk_tiled(
    u: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int = 8,
    band: int = 256,
    interpret: bool = False,
    guard: int | None = None,
):
    """K sweeps over a band-padded grid (see :func:`pad_for_tiles`).

    ``guard`` is the halo depth baked into the padded layout (defaults to
    num_sweeps); a layout with deeper guards can run shallower chunks — e.g.
    the reference protocol's single check sweep — without re-padding.

    Returns (u_new, delta_of_first_sweep). The guard rows (top/bottom) and
    right padding are frozen, so they pass through unchanged.
    """
    if guard is None:
        guard = num_sweeps
    assert num_sweeps <= guard
    hp, wp = u.shape
    k = guard
    # Mosaic requires DMA window heights (band + 2*guard) and the writeback
    # offset (guard) to be sublane-aligned.
    assert (band + 2 * k) % 8 == 0, (band, k, "window height must be 8-aligned")
    nbands = (hp - 2 * k) // band
    assert nbands * band + 2 * k == hp, (hp, band, k)

    out_u, out_delta = pl.pallas_call(
        functools.partial(_tiled_kernel, num_sweeps=num_sweeps, band=band, guard=guard),
        grid=(nbands,),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(iteration.reshape(1), u, frozen.astype(jnp.int32))
    # Guard rows are never written by any band's output copy; restore them
    # from the input so the padded layout stays intact across chunks.
    out_u = out_u.at[:k, :].set(u[:k, :])
    out_u = out_u.at[hp - k :, :].set(u[hp - k :, :])
    return out_u, out_delta[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledGrid:
    u: jax.Array
    frozen: jax.Array
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    num_sweeps: int = dataclasses.field(metadata=dict(static=True))
    band: int = dataclasses.field(metadata=dict(static=True))


def pad_for_tiles(state: GridState, num_sweeps: int = 8, band: int = 256) -> TiledGrid:
    """Pad (u, frozen) to [K + nbands*band + K, Wp] with frozen guard rows so
    every band's halo window is in bounds; right-pad W to a lane multiple."""
    h, w = state.u.shape
    k = num_sweeps
    wp = _round_up(w, 128)
    nbands = -(-h // band)
    hp = nbands * band + 2 * k
    u = jnp.full((hp, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    u = u.at[k : k + h, :w].set(state.u)
    interior = np.zeros((hp, wp), dtype=bool)
    interior[k + 1 : k + h - 1, 1 : w - 1] = True
    frozen = jnp.ones((hp, wp), dtype=bool)
    frozen = frozen.at[k : k + h, :w].set(state.locked)
    frozen = frozen | jnp.asarray(~interior)
    return TiledGrid(u=u, frozen=frozen, height=h, width=w,
                     num_sweeps=k, band=band)


def update_n(
    state: GridState,
    num_steps: int,
    band: int = 256,
    interpret: bool | None = None,
) -> GridState:
    """Anytime chunk on the tiled path; delta from the first sweep.

    num_steps is the temporal-blocking depth K of a single kernel pass; for
    num_steps > ~16 the halo overhead grows, so large chunks should chain
    multiple passes (e.g. 100 sweeps = 10 passes of K=10): use
    :func:`update_chunked`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tiled = pad_for_tiles(state, num_steps, band)
    u, delta = sweep_chunk_tiled(
        tiled.u, tiled.frozen, state.iteration, num_steps, band, interpret
    )
    k = num_steps
    return dataclasses.replace(
        state,
        u=u[k : k + tiled.height, : tiled.width],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )
