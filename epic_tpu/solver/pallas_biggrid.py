"""Big-grid Pallas kernel v2: stacked overlapping row-bands, K sweeps/chunk.

Replaces the round-1 big-grid attempts (pallas_tiled's manual DMA and
pallas_banded's in-kernel halo concatenation — the latter fails to compile at
wide shapes on current Mosaic and both carried structural overheads). The
probe batteries (tools/tpu_probe*.py, docs/BENCH_NOTES.md round 2) showed the
fast structure is the plain band-grid kernel: BlockSpec row bands, VMEM
blocks, fori sweeps inside — ~110 G cell-visits/s with no per-grid-step
fixed cost. This module feeds that structure overlapping inputs:

- the grid is padded with K frozen guard rows top/bottom and stacked into
  ``nb`` overlapping extended bands of ``band + 2K`` rows via ONE XLA row
  gather per chunk (HBM cost ~(1 + 2K/band) grid reads, amortized over K
  sweeps);
- a Pallas grid over the stacked array runs K red-black sweeps per band with
  a shrinking row-validity guard (temporal-blocking trapezoid), writing back
  only the ``band`` center rows — which concatenate to the original row
  order, so no reassembly transpose exists;
- the staggered-check delta comes from sweep 0 of the chunk: every band
  writes its max to an SMEM vector, reduced with the chunk result. Halo-row
  updates duplicate the owning band's arithmetic exactly, so including them
  changes nothing (same argument as the sharded trapezoid,
  epic_tpu/parallel/sharded.py).

Exactness: a chunk of K sweeps is bit-identical to K global sweeps of the
oracle (tested vs reference_np and solver.core in interpret mode).

Replaces the CUDA per-sweep stencil + two-stage delta reduction
(/root/reference/libepic/src/harmonic/harmonic_gpu.cu:39-153): one kernel
call per K sweeps instead of one per sweep, delta never leaves the device.
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
from ._padding import box_mask
from ._sweep_body import lse4

# Extended-band VMEM budget in f32 cells. Mosaic's scoped-VMEM footprint is
# ~3.5x the extended block; the 16 MB default limit rejects wide bands, but
# v5e's physical VMEM is far larger — the kernel raises vmem_limit_bytes to
# _VMEM_LIMIT; 2 M-cell extended blocks with 96-688-row bands measure
# 38-40 G cell-updates/s at 2048^2-8192^2 and 34 G at 16384^2
# (tools/tpu_probe5/6/10, vs 4.3 G for round-1's XLA path).
EXT_BAND_CELL_BUDGET = 2 * 1024 * 1024
_VMEM_LIMIT = 128 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _layout_for(ext_max: int, h: int, chunk_depth: int):
    k = min(chunk_depth, ext_max // 4)  # at most half the band is halo
    # k needs 2k ≡ 0 (mod 8) for sublane alignment, i.e. a multiple of 4.
    # (k=20 would make stagger-100 cycles exactly 5 chunks, but the
    # check-cycle kernel slices at k-row offsets and Mosaic cannot prove
    # 8-divisibility for k=20 — it fails to compile; k stays 16.)
    k = max(8, k // 4 * 4)
    band_max = ext_max - 2 * k
    nb = -(-h // band_max)
    band = _round_up(-(-h // nb), 8)
    return max(8, band), k


def choose_layout(shape: tuple[int, int], chunk_depth: int = 16):
    """Pick (band, k) for a grid: the deepest K <= chunk_depth whose extended
    band fits the VMEM budget, with rows spread evenly over the bands so
    padding waste stays below one sublane tile per band.

    int8 mask slots cost 5 B/cell vs the int32 era's 8, so the proven
    scoped-VMEM bytes could admit 8/5 the band rows — but deeper bands
    only PAY where the old layout's halo redundancy was high (round-3
    on-chip A/B: 16384² 41.2 vs 38.3 G and 8192² 44.4 vs 43.6 G for the
    deeper band, while 2048²/4096² LOST 4-5% — at low redundancy the
    larger DMA slices degrade double-buffer overlap before the ~2%
    redundancy saving pays, the same effect the tiled3d slab scan hit).
    The budget therefore extends only when the proven-size layout spends
    more than ~12% of its traffic on halos."""
    h, w = shape
    wp = _round_up(w, 128)
    ext_max = max(32, (EXT_BAND_CELL_BUDGET // wp) // 8 * 8)
    band, k = _layout_for(ext_max, h, chunk_depth)
    if 2 * k / band > 0.12:
        ext_max = max(32, (EXT_BAND_CELL_BUDGET * 8 // 5 // wp) // 8 * 8)
        band, k = _layout_for(ext_max, h, chunk_depth)
    return band, k


def _band_kernel(it_ref, u_ref, f_ref, u_out, delta_ref,
                 *, num_sweeps, band, k, w):
    """K guarded sweeps on one extended band of the stacked layout."""
    i = pl.program_id(0)
    ext = band + 2 * k
    t0 = it_ref[0]
    u0 = u_ref[:]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_ref[:].astype(jnp.int32) == 0
    # Global row of extended-local row r is i*band - k + r (guard rows make
    # every index valid in the padded array). Parity needs the global row.
    local_row = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 1)
    parity = (local_row + i * band - k + col) % 2

    def sweep(s, u):
        val = lse4(u, ext, w)
        valid = (local_row > s) & (local_row < ext - 1 - s)
        update = (parity != ((t0 + s) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[i, 0] = jnp.max(jnp.abs(u1 - u0))
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_out[:] = u[k : k + band, :]


def _stack_rows(hp: int, band: int, k: int) -> np.ndarray:
    nb = (hp - 2 * k) // band
    starts = np.arange(nb) * band
    return (starts[:, None] + np.arange(band + 2 * k)[None, :]).reshape(-1)


def stack_frozen(frozen_pad: jax.Array, band: int, k: int) -> jax.Array:
    """Pre-stack the (static per solve) frozen mask into the overlapping
    band layout so chunks don't rebuild it."""
    return frozen_pad[jnp.asarray(_stack_rows(frozen_pad.shape[0], band, k))]


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "interpret")
)
def sweep_chunk_bands(
    u_pad: jax.Array,
    frozen_ext: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    interpret: bool = False,
):
    """num_sweeps (<= k) sweeps over the guard-padded grid.

    u_pad: f32[k + nb*band + k, Wp]; frozen_ext: int8[nb*(band+2k), Wp],
    the pre-stacked mask from :func:`stack_frozen` (guard rows, boundary
    ring, and alignment padding frozen).

    Returns (u_pad', delta of the chunk's first sweep). Guard rows pass
    through untouched (they are never written).
    """
    hp, wp = u_pad.shape
    nb = (hp - 2 * k) // band
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert num_sweeps <= k
    ext = band + 2 * k

    # Stack overlapping extended bands: one gather, [nb*ext, Wp].
    u_ext = u_pad[jnp.asarray(_stack_rows(hp, band, k))]
    f_ext = frozen_ext

    out_u, out_delta = pl.pallas_call(
        functools.partial(_band_kernel, num_sweeps=num_sweeps,
                          band=band, k=k, w=wp),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ext, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ext, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_ext, f_ext)

    u_new = jax.lax.dynamic_update_slice(u_pad, out_u, (k, 0))
    return u_new, jnp.max(out_delta)


def _band_kernel_dma_impl(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                          u_vmem, f_vmem, sems,
                          *, num_sweeps, band, k, w):
    """DMA variant of :func:`_band_kernel`: extended bands are CONTIGUOUS
    row ranges of the guard-padded grid, so each grid step copies its slice
    straight from HBM into VMEM scratch instead of reading a pre-gathered
    stacked array — saving the gather's read+write of ~(1 + 2K/band) grids
    per chunk and the pre-stacked frozen mask entirely (the 3D kernel
    proved the pattern, tools/tpu_probe18.py; 2D gain measured in
    tools/tpu_probe19.py). Double-buffered: step i prefetches band i+1's
    slice into the other scratch slot before computing (grid steps run
    sequentially on TPU)."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    ext = band + 2 * k

    def copies(band_idx, slot):
        start = band_idx * band
        return (
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, ext), :], u_vmem.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(start, ext), :], f_vmem.at[slot], sems.at[slot, 1]
            ),
        )

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cu, cf = copies(0, 0)
        cu.start()
        cf.start()

    @pl.when(i + 1 < nb)
    def _():
        cu, cf = copies(i + 1, jax.lax.rem(i + 1, 2))
        cu.start()
        cf.start()

    cu, cf = copies(i, slot)
    cu.wait()
    cf.wait()

    t0 = it_ref[0]
    u0 = u_vmem[slot]
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 1)
    parity = (local_row + i * band - k + col) % 2

    def sweep(s, u):
        val = lse4(u, ext, w)
        valid = (local_row > s) & (local_row < ext - 1 - s)
        update = (parity != ((t0 + s) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[i, 0] = jnp.max(jnp.abs(u1 - u0))
    if u1_out is not None:
        # Check variant: also write the post-first-sweep center so the
        # solve protocol can fold the staggered check into a full K-chunk
        # (same trick as pallas_tiled2d.sweep_chunk_tiled_check).
        u1_out[:] = u1[k : k + band, :]
    u = jax.lax.fori_loop(1, num_sweeps, sweep, u1)
    u_out[:] = u[k : k + band, :]


def _band_kernel_dma(it_ref, u_hbm, f_hbm, u_out, delta_ref,
                     u_vmem, f_vmem, sems,
                     *, num_sweeps, band, k, w):
    _band_kernel_dma_impl(it_ref, u_hbm, f_hbm, u_out, None, delta_ref,
                          u_vmem, f_vmem, sems,
                          num_sweeps=num_sweeps, band=band, k=k, w=w)


def _band_kernel_dma_check(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                           u_vmem, f_vmem, sems,
                           *, num_sweeps, band, k, w):
    _band_kernel_dma_impl(it_ref, u_hbm, f_hbm, u_out, u1_out, delta_ref,
                          u_vmem, f_vmem, sems,
                          num_sweeps=num_sweeps, band=band, k=k, w=w)


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "interpret")
)
def sweep_chunk_dma_check(
    u_pad: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    interpret: bool = False,
):
    """Check chunk: num_sweeps sweeps via the manual-DMA banded kernel,
    returning the raw center blocks ``(out_uk, out_u1, delta)`` where
    out_u1 is the post-first-sweep state and delta its residual; the
    caller dynamic-update-slices whichever center the protocol selects."""
    hp, wp = u_pad.shape
    nb = (hp - 2 * k) // band
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert num_sweeps <= k
    ext = band + 2 * k

    out_uk, out_u1, out_delta = pl.pallas_call(
        functools.partial(_band_kernel_dma_check, num_sweeps=num_sweeps,
                          band=band, k=k, w=wp),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb * band, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext, wp), jnp.float32),
            pltpu.VMEM((2, ext, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_pad, frozen_pad)

    return out_uk, out_u1, jnp.max(out_delta)


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "k", "interpret")
)
def sweep_chunk_dma(
    u_pad: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    num_sweeps: int,
    band: int,
    k: int,
    interpret: bool = False,
):
    """num_sweeps (<= k) sweeps via the manual-DMA banded kernel.

    Takes the UN-stacked frozen mask (``frozen_pad``, same shape as
    ``u_pad``); each band DMAs its contiguous slice of both arrays.
    Bit-identical to :func:`sweep_chunk_bands` (cross-tested)."""
    hp, wp = u_pad.shape
    nb = (hp - 2 * k) // band
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert num_sweeps <= k
    ext = band + 2 * k

    out_u, out_delta = pl.pallas_call(
        functools.partial(_band_kernel_dma, num_sweeps=num_sweeps,
                          band=band, k=k, w=wp),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((nb * band, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext, wp), jnp.float32),
            pltpu.VMEM((2, ext, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_pad, frozen_pad)

    u_new = jax.lax.dynamic_update_slice(u_pad, out_u, (k, 0))
    return u_new, jnp.max(out_delta)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandedGrid:
    u: jax.Array          # f32[k + nb*band + k, Wp]
    frozen: jax.Array     # int8 same shape (4x less mask DMA)
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    band: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))


@functools.partial(jax.jit, static_argnames=("h", "w", "hp", "wp", "k"))
def _pad_arrays(u, locked, h: int, w: int, hp: int, wp: int, k: int):
    # One device program: no host interior-mask upload, XLA-managed
    # transients (see solver/_padding.py).
    up = jnp.full((hp, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    up = up.at[k : k + h, :w].set(u)
    frozen = jnp.ones((hp, wp), dtype=jnp.int8)
    frozen = frozen.at[k : k + h, :w].set(locked.astype(jnp.int8))
    frozen = jnp.where(
        box_mask((hp, wp), (k + 1, 1), (k + h - 1, w - 1)), frozen,
        jnp.int8(1))
    return up, frozen


def pad_state(state: GridState, chunk_depth: int = 16,
              band: int | None = None, k: int | None = None) -> BandedGrid:
    h, w = state.u.shape
    if band is None or k is None:
        band, k = choose_layout((h, w), chunk_depth)
    wp = _round_up(w, 128)
    nb = -(-h // band)
    hp = nb * band + 2 * k
    u, frozen = _pad_arrays(state.u, state.locked, h, w, hp, wp, k)
    return BandedGrid(u=u, frozen=frozen, height=h, width=w, band=band, k=k)


def unpad(g: BandedGrid) -> jax.Array:
    return g.u[g.k : g.k + g.height, : g.width]


def update_n(state: GridState, num_steps: int,
             chunk_depth: int = 16, interpret: bool | None = None) -> GridState:
    """Anytime chunk stepper; semantics identical to core.update_n (delta
    from the overall first sweep). Full K-chunks run through the ping-pong
    cycle kernel (one dispatch for all of them — probe34: 43.8-46.8 G
    updates/s vs 42.3-44.5 for chained chunk dispatches, bit-identical);
    a shallow remainder runs as a single DMA chunk."""
    from . import pallas_cycle

    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = pad_state(state, chunk_depth)
    u = g.u
    delta = None
    t = 0
    n_full, rem = divmod(num_steps, g.k)
    if n_full:
        u, _, delta = pallas_cycle.run_chain(
            pallas_cycle.sweep_cycle, u, None, g.frozen, state.iteration,
            n_full, g.k, g.band, interpret=interpret,
        )
        t = n_full * g.k
    if rem:
        u, dd = sweep_chunk_dma(
            u, g.frozen, state.iteration + t, rem, g.band, g.k, interpret
        )
        if delta is None:
            delta = dd
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, : g.width],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


@functools.partial(
    jax.jit,
    static_argnames=("stagger", "band", "k", "interpret",
                     "height", "width"),
    donate_argnums=(0,),
)
def _solve_banded(
    u, frozen_pad, epsilon, stagger: int, max_iterations, band: int,
    k: int, interpret: bool, height: int, width: int, it0=None,
    conv0=None, delta0=None,
):
    """Full solve protocol on the banded path, one device program.

    ``max_iterations`` is a TRACED bound and ``it0`` a traced start
    iteration, so :func:`solve_segments` can resume the identical while
    loop across watchdog-safe dispatch segments without recompiling per
    segment (the remote compile service costs minutes per distinct
    jaxpr).

    The staggered check is FOLDED into the first K-chunk of each cycle via
    :func:`sweep_chunk_dma_check` (which also returns the post-check-sweep
    state, so a passing check exits with exactly the reference's state and
    ``iteration ≡ 1 (mod stagger)``, harmonic_cpu.cpp:158-173). The solve
    loop always runs the manual-DMA chunks: the gather chunk would
    re-materialize the stacked array inside the loop every chunk — probe32
    measured the gather solve at 29.7 G updates/s at 2048² vs this loop's
    DMA+folded structure, despite the gather chunk winning the RAW chunk
    race at low redundancy (probe19/21).
    """
    from .pallas_cycle import cycle_fill, sweep_cycle, sweep_cycle_check

    m_max = max(height, width)
    chunk_fn = sweep_chunk_dma.__wrapped__
    check_fn = sweep_chunk_dma_check.__wrapped__
    cycle_fn = sweep_cycle.__wrapped__
    cycle_check_fn = sweep_cycle_check.__wrapped__
    # Each stagger cycle runs through the ping-pong cycle kernel with a
    # FRESH ``jnp.full(-1e6)`` twin created inside the loop body (carrying
    # the aliased pair loses to XLA copies at the cond joins — probe36 vs
    # probe40/42). With stagger >= k the staggered check is folded into
    # chunk 0 OF THE CYCLE (sweep_cycle_check): the whole cycle is ONE
    # dispatch with no separate check chunk and no per-cycle paste — on a
    # passing check the exit state is u1 pasted into either output buffer
    # (every non-centre cell of both buffers is the constant pad value;
    # the fill twin guarantees it for b). The final cycle's post-check
    # sweeps are computed and discarded — one cycle of spare work per
    # SOLVE versus two full-grid pastes per cycle.

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    if stagger >= k:
        n_cycle, rem = divmod(stagger, k)

        def body(carry):
            u, iteration, _, _ = carry
            alt = jnp.full_like(u, jnp.float32(C.LOG_SPACE_OBSTACLE))
            a, b, u1, deltas = cycle_check_fn(
                u, alt, frozen_pad, iteration, n_cycle, k, band, interpret
            )
            u_end = b if n_cycle % 2 else a
            delta = deltas[0]
            done = (delta < epsilon) & (iteration + 1 >= m_max)

            def finish(args):
                u_end, iteration = args
                return (
                    jax.lax.dynamic_update_slice(u_end, u1, (k, 0)),
                    iteration + 1,
                )

            def run_rest(args):
                u_end, iteration = args
                iteration = iteration + n_cycle * k
                if rem:
                    u_end, _ = chunk_fn(
                        u_end, frozen_pad, iteration, rem, band, k,
                        interpret
                    )
                    iteration = iteration + rem
                return u_end, iteration

            u, iteration = jax.lax.cond(done, finish, run_rest,
                                        (u_end, iteration))
            return u, iteration, delta, done

    else:
        cd = min(k, stagger)

        def body(carry):
            u, iteration, _, _ = carry
            out_uk, out_u1, delta = check_fn(
                u, frozen_pad, iteration, cd, band, k, interpret
            )
            done = (delta < epsilon) & (iteration + 1 >= m_max)

            def finish(args):
                u, iteration = args
                return (
                    jax.lax.dynamic_update_slice(u, out_u1, (k, 0)),
                    iteration + 1,
                )

            def run_rest(args):
                u, iteration = args
                u = jax.lax.dynamic_update_slice(u, out_uk, (k, 0))
                iteration = iteration + cd
                n_full, rem = divmod(stagger - cd, k)
                if n_full:
                    u, _ = cycle_fill(cycle_fn, u, frozen_pad, iteration,
                                      n_full, k, band, interpret=interpret)
                    iteration = iteration + n_full * k
                if rem:
                    u, _ = chunk_fn(
                        u, frozen_pad, iteration, rem, band, k, interpret
                    )
                    iteration = iteration + rem
                return u, iteration

            u, iteration = jax.lax.cond(done, finish, run_rest,
                                        (u, iteration))
            return u, iteration, delta, done

    from .._segments import carry_defaults

    start, cv0, dl0 = carry_defaults(epsilon, it0, conv0, delta0)
    # A segment entered with conv0=True is a no-op pass-through (the
    # while cond fails immediately), so the pipelined segment driver can
    # dispatch past the converging segment (epic_tpu._segments).
    return jax.lax.while_loop(cond, body, (u, start, dl0, cv0))


def solve(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    chunk_depth: int = 16,
    interpret: bool | None = None,
) -> GridState:
    """Relax to convergence; protocol identical to core.solve
    (harmonic_complete_cpu), big-grid banded kernel, one device program."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = pad_state(state, chunk_depth)
    u, iteration, delta, converged = _solve_banded(
        g.u, g.frozen, state.epsilon, stagger, max_iterations, g.band,
        g.k, interpret, g.height, g.width,
    )
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, : g.width],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )


def solve_segments(
    state: GridState,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
    segment_iterations: int = 5_000,
    chunk_depth: int = 16,
    interpret: bool | None = None,
) -> GridState:
    """Solve-to-convergence as watchdog-safe compiled SEGMENTS.

    One dispatch holding more than ~45-60 s of device work crashes the
    remote TPU worker this environment tunnels through (probe26/27), so a
    mega-grid convergence cannot always run as :func:`solve`'s single
    while-loop dispatch. This wrapper runs the SAME compiled loop
    (:func:`_solve_banded`) with a traced iteration window: each segment
    resumes at the previous segment's iteration and stops at the next
    multiple of ``segment_iterations`` (always on a stagger-cycle
    boundary, where the protocol re-checks anyway), donating the padded
    buffers across dispatches. Trajectories are BIT-identical to
    :func:`solve` — one program, segmented bounds — unlike
    :mod:`epic_tpu.solver.host_solve`, which pays one dispatch per
    stagger cycle (hundreds of tunnel round-trips on a long solve).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = pad_state(state, chunk_depth)
    u = g.u
    from .._segments import run_pipelined

    def seg(uu, bound, it0, cv, dl):
        return _solve_banded(
            uu, g.frozen, state.epsilon, stagger, bound, g.band, g.k,
            interpret, g.height, g.width, it0=it0, conv0=cv, delta0=dl,
        )

    u, it, delta, converged = run_pipelined(
        seg, u, state.epsilon, max_iterations, segment_iterations)
    return dataclasses.replace(
        state,
        u=u[g.k : g.k + g.height, : g.width],
        iteration=it,
        delta=delta,
        converged=converged,
    )
