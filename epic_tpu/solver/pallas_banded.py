"""Banded big-grid kernel: BlockSpec row bands + precomputed halo inputs.

SUPERSEDED: production big-grid paths are :mod:`pallas_biggrid` (banded
DMA chunks, no per-pass halo rebuild) and :mod:`pallas_tiled2d` (wide
grids — this variant OOMs scoped VMEM there); kept as a tested variant.

The collage-style successor to :mod:`epic_tpu.solver.pallas_tiled` (whose
manual per-band DMA costs ~8 ms of fixed overhead per grid step). Here the
grid is split into non-overlapping row bands served by ordinary BlockSpec
pipelining — the overlap a K-sweep temporal block needs is carried by a
*second blocked input*: per-band halo strips of 2K rows (K above, K below),
built once per pass with cheap XLA slicing. Mosaic then double-buffers all
block transfers exactly as in the (fast) collage kernel; there is no manual
DMA and no run_scoped allocation in the kernel at all.

Exactness: identical to K global sweeps — every band computes its K sweeps
from sweep-0 state (its block + halos), with the valid region shrinking one
row per side per sweep, and writes back only its own band; halo rows are
recomputed redundantly by the adjacent band (2K/band overhead).
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
from .pallas_sweep import make_sweep_fn


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _banded_kernel(
    it_ref, u_ref, f_ref, ut_ref, ub_ref, ft_ref, fb_ref, u_out, delta_ref,
    *, num_sweeps, band, halo
):
    """One row band: block (band, W) + halo strips (1, halo, W) above/below.
    num_sweeps <= halo (the layout's strip depth)."""
    t0 = it_ref[0]
    k = halo
    u0 = jnp.concatenate([ut_ref[:], u_ref[:], ub_ref[:]], axis=0)
    frozen = jnp.concatenate([ft_ref[:], f_ref[:], fb_ref[:]], axis=0)
    ext = band + 2 * k
    w = u0.shape[1]

    # Band start is a sublane multiple and K is 8-aligned, so local parity
    # equals global parity: (local_row + col) % 2 == (y + x) % 2.
    sweep = make_sweep_fn(u0, frozen == 0, t0)
    local_row = jax.lax.broadcasted_iota(jnp.int32, (ext, w), 0)

    def guarded_sweep(u, s):
        # Valid rows after sweep s: distance from the ext edge > s.
        u_new = sweep(u, s)
        valid = (local_row > s) & (local_row < ext - 1 - s)
        return jnp.where(valid, u_new, u)

    u = guarded_sweep(u0, 0)
    delta_ref[pl.program_id(0), 0] = jnp.max(jnp.abs(u - u0))

    def body(s, u):
        return guarded_sweep(u, s + 1)

    u = jax.lax.fori_loop(0, num_sweeps - 1, body, u)
    u_out[:] = u[k : k + band, :]


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "band", "interpret", "halo")
)
def sweep_chunk_banded(
    u: jax.Array,
    frozen: jax.Array,
    iteration: jax.Array,
    num_sweeps: int = 16,
    band: int = 512,
    interpret: bool = False,
    halo: int | None = None,
):
    """num_sweeps sweeps over [Hp, Wp] (Hp % band == 0, band % 8 == 0,
    Wp % 128 == 0; frozen int32 covering boundary/padding). ``halo`` is the
    8-aligned strip depth (default: num_sweeps rounded up to 8); shallower
    chunks reuse a deeper layout.

    Returns (u_new, per-band first-sweep delta max-reduced to a scalar).
    """
    hp, wp = u.shape
    if halo is None:
        halo = _round_up(max(num_sweeps, 8), 8)
    k = halo
    assert num_sweeps <= k and k % 8 == 0
    assert hp % band == 0 and band % 8 == 0, (hp, band, k)
    nbands = hp // band

    # Halo strips: K rows above/below each band, frozen obstacle rows past
    # the grid edges. Built with plain XLA ops — cheap relative to K sweeps.
    u_pad = jnp.pad(u, ((k, k), (0, 0)),
                    constant_values=np.float32(C.LOG_SPACE_OBSTACLE))
    f_pad = jnp.pad(frozen, ((k, k), (0, 0)), constant_values=1)
    idx = jnp.arange(nbands)
    top_rows = idx[:, None] * band + jnp.arange(k)[None, :]          # above
    bot_rows = idx[:, None] * band + band + k + jnp.arange(k)[None, :]
    # Flattened to 2D [nbands*K, Wp]: 3D blocked inputs lower poorly in
    # Mosaic; 2D (K, Wp) blocks pipeline like any other band.
    u_top = u_pad[top_rows].reshape(nbands * k, wp)
    u_bot = u_pad[bot_rows].reshape(nbands * k, wp)
    f_top = f_pad[top_rows].reshape(nbands * k, wp)
    f_bot = f_pad[bot_rows].reshape(nbands * k, wp)

    out_u, out_delta = pl.pallas_call(
        functools.partial(_banded_kernel, num_sweeps=num_sweeps, band=band,
                          halo=k),
        grid=(nbands,),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((nbands, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        # Bands are independent within a pass (reads from the input array,
        # writes only their own rows): a parallel grid dimension lets Mosaic
        # overlap band pipelines instead of flushing between steps. The
        # vmem limit is raised past the 16 MB default (see pallas_biggrid).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u, frozen, u_top, u_bot, f_top, f_bot)
    return out_u, jnp.max(out_delta)


def pad_for_bands(state: GridState, band: int = 512):
    """Pad (u, frozen int32) so Hp % band == 0 and Wp % 128 == 0."""
    h, w = state.u.shape
    hp = _round_up(h, band)
    wp = _round_up(w, 128)
    u = jnp.full((hp, wp), np.float32(C.LOG_SPACE_OBSTACLE))
    u = u.at[:h, :w].set(state.u)
    interior = np.zeros((hp, wp), dtype=bool)
    interior[1 : h - 1, 1 : w - 1] = True
    frozen = jnp.ones((hp, wp), dtype=jnp.int32)
    frozen = frozen.at[:h, :w].set(state.locked.astype(jnp.int32))
    frozen = jnp.where(jnp.asarray(interior), frozen, 1)
    return u, frozen, h, w


def update_n(
    state: GridState,
    num_steps: int,
    band: int = 512,
    chunk_depth: int = 16,
    interpret: bool | None = None,
) -> GridState:
    """Anytime chunk via banded passes of up to chunk_depth sweeps each
    (the remainder pass runs shallower inside the same halo layout). Delta
    from the overall first sweep; semantics of core.update_n."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    u, frozen, h, w = pad_for_bands(state, band)
    halo = _round_up(max(chunk_depth, 8), 8)
    t = 0
    delta = None
    while t < num_steps:
        depth = min(chunk_depth, num_steps - t)
        u, d = sweep_chunk_banded(
            u, frozen, state.iteration + t, depth, band, interpret, halo
        )
        if delta is None:
            delta = d
        t += depth
    return dataclasses.replace(
        state,
        u=u[:h, :w],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )
