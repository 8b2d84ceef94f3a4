"""Ping-pong cycle kernel: N banded K-sweep chunks in ONE Pallas dispatch.

The big-grid chunk loops (pallas_biggrid) dispatch one ``pallas_call`` per
K sweeps and stitch results with a ``dynamic_update_slice``; at 2048²-8192²
that costs per-chunk pipeline drains plus a full-grid DUS copy per chunk —
the measured gap between the chunk rate (42.4 G updates/s at 8192²) and
the redundancy-adjusted compute ceiling (~48 G). This kernel compiles a
whole CHAIN of chunks into one dispatch over a ``(n_chunks, nb)`` grid:

- two full guard-padded grids ``A``/``B`` ride along as input/output
  ALIASED buffers; chunk ``c`` reads bands from one and writes centers to
  the other (ping-pong), so no DUS ever materializes;
- each band's write-back DMA is waited in the same grid step (~3% of a
  step's compute), which makes every previously-written row visible to
  all later reads with no cross-step semaphore bookkeeping;
- the next band's slab is prefetched during compute as in
  :func:`pallas_biggrid.sweep_chunk_dma`; the prefetch may cross a chunk
  boundary only when the first slab of the next chunk cannot overlap the
  row range this step is about to write (``(nb-2)·band >= k``, checked
  statically) — otherwise the read simply starts at the next step.

Chunk results are bit-identical to chained ``sweep_chunk_dma`` calls
(tested, including nb=2 fallback, k == band, and odd/even chain lengths).
Replaces the CUDA driver's one-launch-per-iteration loop
(/root/reference/libepic/src/harmonic/harmonic_gpu.cu:266-290) at the
other extreme: one launch per ~``n_chunks·k`` iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_biggrid import _VMEM_LIMIT
from ._sweep_body import lse4, lse6


def _cycle_kernel(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref, delta_ref,
                  u_vmem, f_vmem, rsem, wsem,
                  *, k, band, w, nb, nc):
    _cycle_kernel_impl(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref, None,
                       delta_ref, u_vmem, f_vmem, rsem, wsem, None, None,
                       k=k, band=band, w=w, nb=nb, nc=nc)


def _cycle_kernel_check(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref,
                        u1_ref, delta_ref, u_vmem, f_vmem, rsem, wsem,
                        u1_vmem, usem, *, k, band, w, nb, nc):
    _cycle_kernel_impl(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref, u1_ref,
                       delta_ref, u_vmem, f_vmem, rsem, wsem, u1_vmem,
                       usem, k=k, band=band, w=w, nb=nb, nc=nc)


def _cycle_kernel_impl(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref, u1_ref,
                       delta_ref, u_vmem, f_vmem, rsem, wsem, u1_vmem,
                       usem, *, k, band, w, nb, nc):
    ext = band + 2 * k
    c = pl.program_id(0)
    i = pl.program_id(1)
    lin = c * nb + i
    slot = jax.lax.rem(lin, 2)
    # Chunk c reads src(c) = A if c even else B, writes the other.
    cross_prefetch = (nb - 2) * band >= k and nb >= 2

    def start_read(cc, band_idx, rslot):
        start = band_idx * band

        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            pltpu.make_async_copy(
                a_ref.at[pl.ds(start, ext), :], u_vmem.at[rslot],
                rsem.at[rslot, 0],
            ).start()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            pltpu.make_async_copy(
                b_ref.at[pl.ds(start, ext), :], u_vmem.at[rslot],
                rsem.at[rslot, 1],
            ).start()

        pltpu.make_async_copy(
            f_hbm.at[pl.ds(start, ext), :], f_vmem.at[rslot],
            rsem.at[rslot, 2],
        ).start()

    def wait_read(cc, band_idx, rslot):
        start = band_idx * band

        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            pltpu.make_async_copy(
                a_ref.at[pl.ds(start, ext), :], u_vmem.at[rslot],
                rsem.at[rslot, 0],
            ).wait()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            pltpu.make_async_copy(
                b_ref.at[pl.ds(start, ext), :], u_vmem.at[rslot],
                rsem.at[rslot, 1],
            ).wait()

        pltpu.make_async_copy(
            f_hbm.at[pl.ds(start, ext), :], f_vmem.at[rslot],
            rsem.at[rslot, 2],
        ).wait()

    @pl.when(lin == 0)
    def _():
        start_read(0, 0, 0)

    # Prefetch the next step's slab.
    if cross_prefetch:
        @pl.when(lin + 1 < nc * nb)
        def _():
            nxt = lin + 1
            start_read(nxt // nb, jax.lax.rem(nxt, nb), jax.lax.rem(nxt, 2))
    else:
        # Only prefetch within the chunk; the first slab of the next chunk
        # could overlap rows this step is about to write.
        @pl.when(i + 1 < nb)
        def _():
            start_read(c, i + 1, jax.lax.rem(lin + 1, 2))

        @pl.when((i == 0) & (lin > 0))
        def _():
            start_read(c, 0, slot)

    wait_read(c, i, slot)

    t0 = it_ref[0] + c * k
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
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
    delta_ref[c, i] = jnp.max(jnp.abs(u1 - u0))
    if u1_ref is not None:
        # Check variant: chunk 0's post-first-sweep centres are the exact
        # state a passing staggered check exits with
        # (harmonic_cpu.cpp:158-173); stage them in scratch and DMA out.
        @pl.when(c == 0)
        def _():
            u1_vmem[:] = u1[k : k + band, :]
            ucp = pltpu.make_async_copy(
                u1_vmem,
                u1_ref.at[pl.ds(i * band, band), :],
                usem.at[jax.lax.rem(i, 2)],
            )
            ucp.start()
            ucp.wait()

    u = jax.lax.fori_loop(1, k, sweep, u1)
    # Write the center back into this slot's scratch, DMA it to dst, and
    # wait in-step: all written rows are visible to every later read.
    u_vmem[slot] = u

    def write_to(dst, wslot):
        return pltpu.make_async_copy(
            u_vmem.at[slot, pl.ds(k, band), :],
            dst.at[pl.ds(k + i * band, band), :],
            wsem.at[wslot],
        )

    @pl.when(jax.lax.rem(c, 2) == 0)
    def _():
        wcp = write_to(b_ref, 0)
        wcp.start()
        wcp.wait()

    @pl.when(jax.lax.rem(c, 2) == 1)
    def _():
        wcp = write_to(a_ref, 1)
        wcp.start()
        wcp.wait()


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "k", "band", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_cycle(
    u_a: jax.Array,
    u_b: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    n_chunks: int,
    k: int,
    band: int,
    interpret: bool = False,
):
    """``n_chunks`` K-sweep chunks (= ``n_chunks * k`` red-black sweeps) in
    one dispatch.

    ``u_a`` holds the current guard-padded state; ``u_b`` is the ping-pong
    twin (only its guard rows matter — ``jnp.copy(u_a)`` on the first call,
    the previous call's other buffer afterwards; the two must be DISTINCT
    buffers). Returns ``(a', b', deltas)`` where ``deltas[c]`` is the max
    residual of chunk ``c``'s first sweep; the final state is in ``b'``
    when ``n_chunks`` is odd, ``a'`` otherwise. BOTH inputs are DONATED
    (aliased in-place, zero-copy chaining across calls); do not reuse them.
    Use :func:`run_chain` for the standard chained-call pattern.
    """
    hp, wp = u_a.shape
    nb = (hp - 2 * k) // band
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert n_chunks >= 1
    ext = band + 2 * k

    a_out, b_out, deltas = pl.pallas_call(
        functools.partial(_cycle_kernel, k=k, band=band, w=wp, nb=nb,
                          nc=n_chunks),
        grid=(n_chunks, nb),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, nb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext, wp), jnp.float32),
            pltpu.VMEM((2, ext, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_a, u_b, frozen_pad)

    return a_out, b_out, jnp.max(deltas, axis=1)


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "k", "band", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_cycle_check(
    u_a: jax.Array,
    u_b: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    n_chunks: int,
    k: int,
    band: int,
    interpret: bool = False,
):
    """:func:`sweep_cycle` with the staggered check FOLDED into chunk 0.

    Returns ``(a', b', u1, deltas)``: the usual ping-pong pair plus
    ``u1`` — chunk 0's post-first-sweep centre rows (nb*band x wp), the
    exact state a passing check exits with — and per-chunk first-sweep
    deltas (``deltas[0]`` is the check residual). Lets a solve loop run a
    WHOLE stagger cycle as one dispatch with no separate check chunk and
    no paste: on a passing check the exit state is ``u1`` pasted into
    either output buffer (every non-centre cell of both buffers is the
    constant frozen pad value — buffer b starts as the fill twin)."""
    hp, wp = u_a.shape
    nb = (hp - 2 * k) // band
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert n_chunks >= 1
    ext = band + 2 * k

    a_out, b_out, u1_out, deltas = pl.pallas_call(
        functools.partial(_cycle_kernel_check, k=k, band=band, w=wp,
                          nb=nb, nc=n_chunks),
        grid=(n_chunks, nb),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb * band, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, nb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext, wp), jnp.float32),
            pltpu.VMEM((2, ext, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((band, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_a, u_b, frozen_pad)

    return a_out, b_out, u1_out, jnp.max(deltas, axis=1)


def _cycle_kernel_tiled(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref,
                        delta_ref, u_vmem, f_vmem, rsem, wsem,
                        *, k, band, wt, hx, nb, nt, nc, interior=None,
                        ns=None):
    _cycle_kernel_tiled_impl(
        it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref, None, delta_ref,
        u_vmem, f_vmem, rsem, wsem, None, None,
        k=k, band=band, wt=wt, hx=hx, nb=nb, nt=nt, nc=nc,
        interior=interior, ns=ns)


def _cycle_kernel_tiled_check(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref,
                              u1_ref, delta_ref, u_vmem, f_vmem, rsem,
                              wsem, u1_vmem, usem,
                              *, k, band, wt, hx, nb, nt, nc):
    _cycle_kernel_tiled_impl(
        it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref, u1_ref, delta_ref,
        u_vmem, f_vmem, rsem, wsem, u1_vmem, usem,
        k=k, band=band, wt=wt, hx=hx, nb=nb, nt=nt, nc=nc)


def _cycle_kernel_tiled_impl(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref,
                             u1_ref, delta_ref, u_vmem, f_vmem, rsem, wsem,
                             u1_vmem, usem,
                             *, k, band, wt, hx, nb, nt, nc, interior=None,
                             ns=None):
    """2D-tiled ping-pong cycle step: same structure as :func:`_cycle_kernel`
    but over an (n_chunks, nb, nt) grid with strided (ext_r x wext) slabs
    (the pallas_tiled2d layout: 128 guard columns per side). With
    ``u1_ref`` (the check variant), chunk 0's post-first-sweep centres are
    staged and DMA'd out per tile.

    ``interior=(h_int, w_int)`` masks the per-slab deltas to cells whose
    array coordinates lie in [k, k+h_int) x [hx, hx+w_int) — the resident
    shard layouts need INTERIOR-ONLY check deltas (guard cells adjacent to
    frozen round-up padding read the pad where the owning shard reads real
    data, so their |u1-u0| never decays — the resident3d delta-poisoning
    failure, BENCH_NOTES r4). Sweep-0 halo cells inside the mask are
    elementwise-exact duplicates of their owning slab's values, so the
    masked max equals the interior diff bit-for-bit."""
    ext_r = band + 2 * k
    wext = wt + 2 * hx
    c = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    lin = (c * nb + i) * nt + j
    slot = jax.lax.rem(lin, 2)
    # Cross-chunk prefetch reads rows [0, ext_r) of dst while this step is
    # writing band nb-1's rows: safe iff they cannot overlap.
    cross_prefetch = (nb - 2) * band >= k and nb >= 2

    def read_copies(src, band_idx, tile_idx, rslot, sem_idx):
        r0 = band_idx * band
        c0 = tile_idx * wt
        return pltpu.make_async_copy(
            src.at[pl.ds(r0, ext_r), pl.ds(c0, wext)],
            u_vmem.at[rslot], rsem.at[rslot, sem_idx],
        )

    def start_read(cc, band_idx, tile_idx, rslot):
        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            read_copies(a_ref, band_idx, tile_idx, rslot, 0).start()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            read_copies(b_ref, band_idx, tile_idx, rslot, 1).start()

        pltpu.make_async_copy(
            f_hbm.at[pl.ds(band_idx * band, ext_r),
                     pl.ds(tile_idx * wt, wext)],
            f_vmem.at[rslot], rsem.at[rslot, 2],
        ).start()

    def wait_read(cc, band_idx, tile_idx, rslot):
        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            read_copies(a_ref, band_idx, tile_idx, rslot, 0).wait()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            read_copies(b_ref, band_idx, tile_idx, rslot, 1).wait()

        pltpu.make_async_copy(
            f_hbm.at[pl.ds(band_idx * band, ext_r),
                     pl.ds(tile_idx * wt, wext)],
            f_vmem.at[rslot], rsem.at[rslot, 2],
        ).wait()

    @pl.when(lin == 0)
    def _():
        start_read(0, 0, 0, 0)

    steps_per_chunk = nb * nt
    if cross_prefetch:
        @pl.when(lin + 1 < nc * steps_per_chunk)
        def _():
            nxt = lin + 1
            cc = nxt // steps_per_chunk
            r = jax.lax.rem(nxt, steps_per_chunk)
            start_read(cc, r // nt, jax.lax.rem(r, nt), jax.lax.rem(nxt, 2))
    else:
        in_chunk = i * nt + j

        @pl.when(in_chunk + 1 < steps_per_chunk)
        def _():
            nxt = in_chunk + 1
            start_read(c, nxt // nt, jax.lax.rem(nxt, nt),
                       jax.lax.rem(lin + 1, 2))

        @pl.when((in_chunk == 0) & (lin > 0))
        def _():
            start_read(c, 0, 0, slot)

    wait_read(c, i, j, slot)

    t0 = it_ref[0] + c * k
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (ext_r, wext), 0)
    local_col = jax.lax.broadcasted_iota(jnp.int32, (ext_r, wext), 1)
    parity = (local_row + local_col + i * band + j * wt + k) % 2

    def sweep(s, u):
        val = lse4(u, ext_r, wext)
        valid = (
            (local_row > s) & (local_row < ext_r - 1 - s)
            & (local_col > s) & (local_col < wext - 1 - s)
        )
        update = (parity != ((t0 + s) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    d0 = jnp.abs(u1 - u0)
    if interior is not None:
        h_int, w_int = interior
        g_row = local_row + i * band
        g_col = local_col + j * wt
        inside = ((g_row >= k) & (g_row < k + h_int)
                  & (g_col >= hx) & (g_col < hx + w_int))
        d0 = jnp.where(inside, d0, 0.0)
    delta_ref[c, i, j] = jnp.max(d0)
    if u1_ref is not None:
        @pl.when(c == 0)
        def _():
            u1_vmem[:] = u1[k : k + band, hx : hx + wt]
            ucp = pltpu.make_async_copy(
                u1_vmem,
                u1_ref.at[pl.ds(i * band, band), pl.ds(j * wt, wt)],
                usem.at[jax.lax.rem(i * nt + j, 2)],
            )
            ucp.start()
            ucp.wait()

    # ns < k runs a SHALLOW chunk on the same k-deep slabs (nc must be 1:
    # chunk chaining assumes k sweeps per chunk) — bit-identical to the
    # functional tile kernel at num_sweeps=ns, but ping-pong (no paste);
    # the resident solve's stagger remainders use it.
    u = jax.lax.fori_loop(1, k if ns is None else ns, sweep, u1)
    u_vmem[slot] = u

    def write_to(dst, wslot):
        return pltpu.make_async_copy(
            u_vmem.at[slot, pl.ds(k, band), pl.ds(hx, wt)],
            dst.at[pl.ds(k + i * band, band), pl.ds(hx + j * wt, wt)],
            wsem.at[wslot],
        )

    @pl.when(jax.lax.rem(c, 2) == 0)
    def _():
        wcp = write_to(b_ref, 0)
        wcp.start()
        wcp.wait()

    @pl.when(jax.lax.rem(c, 2) == 1)
    def _():
        wcp = write_to(a_ref, 1)
        wcp.start()
        wcp.wait()


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "k", "band", "wt", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_cycle_tiled(
    u_a: jax.Array,
    u_b: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    n_chunks: int,
    k: int,
    band: int,
    wt: int,
    interpret: bool = False,
):
    """Tiled twin of :func:`sweep_cycle` for the pallas_tiled2d layout
    (wide grids): ``n_chunks * k`` sweeps in one dispatch over an
    (n_chunks, nb, nt) grid. Same contract: final state in ``b'`` when
    ``n_chunks`` is odd, ``a'`` otherwise; deltas[c] is chunk c's
    first-sweep residual."""
    from .pallas_tiled2d import _HX

    hp, wp = u_a.shape
    nb = (hp - 2 * k) // band
    nt = (wp - 2 * _HX) // wt
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert nt * wt + 2 * _HX == wp, (wp, wt)
    assert n_chunks >= 1 and k <= _HX
    ext_r = band + 2 * k
    wext = wt + 2 * _HX

    a_out, b_out, deltas = pl.pallas_call(
        functools.partial(_cycle_kernel_tiled, k=k, band=band, wt=wt,
                          hx=_HX, nb=nb, nt=nt, nc=n_chunks),
        grid=(n_chunks, nb, nt),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, nb, nt), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext_r, wext), jnp.float32),
            pltpu.VMEM((2, ext_r, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_a, u_b, frozen_pad)

    return a_out, b_out, jnp.max(deltas.reshape(n_chunks, -1), axis=1)


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "k", "band", "wt", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_cycle_tiled_check(
    u_a: jax.Array,
    u_b: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    n_chunks: int,
    k: int,
    band: int,
    wt: int,
    interpret: bool = False,
):
    """:func:`sweep_cycle_tiled` with the staggered check folded into
    chunk 0 (see :func:`sweep_cycle_check`): returns
    ``(a', b', u1, deltas)`` where ``u1`` is the (nb*band x nt*wt) centre
    block of the post-first-sweep state."""
    from .pallas_tiled2d import _HX

    hp, wp = u_a.shape
    nb = (hp - 2 * k) // band
    nt = (wp - 2 * _HX) // wt
    assert nb * band + 2 * k == hp, (hp, band, k)
    assert nt * wt + 2 * _HX == wp, (wp, wt)
    assert n_chunks >= 1 and k <= _HX
    ext_r = band + 2 * k
    wext = wt + 2 * _HX

    a_out, b_out, u1_out, deltas = pl.pallas_call(
        functools.partial(_cycle_kernel_tiled_check, k=k, band=band, wt=wt,
                          hx=_HX, nb=nb, nt=nt, nc=n_chunks),
        grid=(n_chunks, nb, nt),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((nb * band, nt * wt), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, nb, nt), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext_r, wext), jnp.float32),
            pltpu.VMEM((2, ext_r, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((band, wt), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_a, u_b, frozen_pad)

    return (a_out, b_out, u1_out,
            jnp.max(deltas.reshape(n_chunks, -1), axis=1))


def _cycle_kernel3d(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref, delta_ref,
                    u_vmem, f_vmem, rsem, wsem,
                    *, k, band, hp, w, nb, nc):
    """3D ping-pong cycle step over an (n_chunks, nb) grid of plane-banded
    slabs (the pallas_biggrid3d flattened [D*Hp, Wp] layout; band/k in
    PLANES). Same structure as :func:`_cycle_kernel`. No check variant on
    purpose: probe51 measured the in-kernel u1 staging SLOWER than the
    1-sweep check chunk it would replace at plane-banded layouts (14.7 vs
    15.1 G updates/s at 256³)."""
    ext = band + 2 * k
    rows = ext * hp
    c = pl.program_id(0)
    i = pl.program_id(1)
    lin = c * nb + i
    slot = jax.lax.rem(lin, 2)
    cross_prefetch = (nb - 2) * band >= k and nb >= 2

    def start_read(cc, band_idx, rslot):
        start = band_idx * band * hp

        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            pltpu.make_async_copy(
                a_ref.at[pl.ds(start, rows), :], u_vmem.at[rslot],
                rsem.at[rslot, 0],
            ).start()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            pltpu.make_async_copy(
                b_ref.at[pl.ds(start, rows), :], u_vmem.at[rslot],
                rsem.at[rslot, 1],
            ).start()

        pltpu.make_async_copy(
            f_hbm.at[pl.ds(start, rows), :], f_vmem.at[rslot],
            rsem.at[rslot, 2],
        ).start()

    def wait_read(cc, band_idx, rslot):
        start = band_idx * band * hp

        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            pltpu.make_async_copy(
                a_ref.at[pl.ds(start, rows), :], u_vmem.at[rslot],
                rsem.at[rslot, 0],
            ).wait()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            pltpu.make_async_copy(
                b_ref.at[pl.ds(start, rows), :], u_vmem.at[rslot],
                rsem.at[rslot, 1],
            ).wait()

        pltpu.make_async_copy(
            f_hbm.at[pl.ds(start, rows), :], f_vmem.at[rslot],
            rsem.at[rslot, 2],
        ).wait()

    def wait_write(wslot):
        # Drain one outstanding band writeback on wsem[wslot]. DMA waits
        # are (semaphore, size) pairs and every writeback shares one
        # shape, so a same-shaped descriptor stands in for the original.
        pltpu.make_async_copy(
            u_vmem.at[0, pl.ds(k * hp, band * hp), :],
            a_ref.at[pl.ds(k * hp, band * hp), :],
            wsem.at[wslot],
        ).wait()

    # Deferred writeback (3D bands are SHALLOW — band*hp rows, ~30 us of
    # compute at 256³ — so an in-step start+wait stalled every band on its
    # ~5 MB writeback): wait the PREVIOUS program's write here, before the
    # prefetch below overwrites its u_vmem slot (write lin-1 reads slot
    # (lin+1)%2, exactly the slot prefetch lin+1 fills). At most one write
    # is ever in flight, so the only write/read DMA overlap is program
    # lin's own write vs the chunk-boundary prefetch — disjoint under the
    # same (nb-2)*band >= k condition that gates cross_prefetch.
    @pl.when(lin >= 1)
    def _():
        wait_write(jax.lax.rem(lin + 1, 2))

    @pl.when(lin == 0)
    def _():
        start_read(0, 0, 0)

    if cross_prefetch:
        @pl.when(lin + 1 < nc * nb)
        def _():
            nxt = lin + 1
            start_read(nxt // nb, jax.lax.rem(nxt, nb), jax.lax.rem(nxt, 2))
    else:
        @pl.when(i + 1 < nb)
        def _():
            start_read(c, i + 1, jax.lax.rem(lin + 1, 2))

        @pl.when((i == 0) & (lin > 0))
        def _():
            start_read(c, 0, slot)

    wait_read(c, i, slot)

    t0 = it_ref[0] + c * k
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    local_plane = local_row // hp
    y = local_row - local_plane * hp
    parity = (local_plane + i * band - k + y + col) % 2

    def sweep(s, u):
        val = lse6(u, rows, w, hp)
        valid = (local_plane > s) & (local_plane < ext - 1 - s)
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    delta_ref[c, i] = jnp.max(jnp.abs(u1 - u0))
    u = jax.lax.fori_loop(1, k, sweep, u1)
    u_vmem[slot] = u

    def write_to(dst, wslot):
        return pltpu.make_async_copy(
            u_vmem.at[slot, pl.ds(k * hp, band * hp), :],
            dst.at[pl.ds((k + i * band) * hp, band * hp), :],
            wsem.at[wslot],
        )

    # Start the writeback on the program-parity semaphore and return;
    # program lin+1 (or the kernel-exit drain) waits it.
    @pl.when(jax.lax.rem(c, 2) == 0)
    def _():
        write_to(b_ref, slot).start()

    @pl.when(jax.lax.rem(c, 2) == 1)
    def _():
        write_to(a_ref, slot).start()

    @pl.when(lin == nc * nb - 1)
    def _():
        wait_write(slot)


@functools.partial(
    jax.jit, static_argnames=("n_chunks", "k", "band", "hp", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_cycle3d(
    u_a: jax.Array,
    u_b: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    n_chunks: int,
    k: int,
    band: int,
    hp: int,
    interpret: bool = False,
):
    """3D twin of :func:`sweep_cycle` for the pallas_biggrid3d layout:
    ``n_chunks * k`` 6-neighbour sweeps in one dispatch. Because 3D chunks
    are shallow (production k=2), a 100-sweep span is 50 chained dispatches
    + 50 full-volume DUS copies on the old path — the cycle's best case.
    Same contract: final state in ``b'`` when ``n_chunks`` is odd."""
    rp, wp = u_a.shape
    dp = rp // hp
    nb = (dp - 2 * k) // band
    assert nb * band + 2 * k == dp, (dp, band, k)
    assert n_chunks >= 1
    ext = band + 2 * k

    a_out, b_out, deltas = pl.pallas_call(
        functools.partial(_cycle_kernel3d, k=k, band=band, hp=hp, w=wp,
                          nb=nb, nc=n_chunks),
        grid=(n_chunks, nb),
        out_shape=(
            jax.ShapeDtypeStruct((rp, wp), jnp.float32),
            jax.ShapeDtypeStruct((rp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, nb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext * hp, wp), jnp.float32),
            pltpu.VMEM((2, ext * hp, wp), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_a, u_b, frozen_pad)

    return a_out, b_out, jnp.max(deltas, axis=1)


def _cycle_kernel_tiled3d(it_ref, u_a_in, u_b_in, f_hbm, a_ref, b_ref,
                          delta_ref, u_vmem, f_vmem, rsem, wsem,
                          *, k, band, yt, wt, hy, hx, hp2, nb, ny, nx, nc,
                          interior=None, ns=None):
    """3D (z, y, x)-tiled ping-pong cycle step over an (n_chunks, nsteps)
    grid (nsteps = nb*ny*nx slabs, linearized — the pallas_tiled3d
    wide-plane layout). Each slab is ext_z contiguous row-ranges of the
    flattened padded volume, copied plane by plane like
    pallas_tiled3d._tile3d_kernel_impl; chunk parity picks the source
    buffer, centres are written plane by plane to the other (waited
    in-step).

    ``interior=(d_int, h_int, w_int)`` masks the per-slab deltas to cells
    whose volume coordinates lie in [k, k+d_int) x [hy, hy+h_int) x
    [hx, hx+w_int) — the resident 3D shard layout's pad-safe check delta
    (see the 2D note on :func:`_cycle_kernel_tiled_impl`): sweep-0 halo
    cells inside the mask duplicate their owning slab's arithmetic, so
    the masked max equals the interior diff bit-for-bit."""
    ext_z = band + 2 * k
    yext = yt + 2 * hy
    wext = wt + 2 * hx
    rows = ext_z * yext
    c = pl.program_id(0)
    step = pl.program_id(1)
    nsteps = nb * ny * nx
    lin = c * nsteps + step
    slot = jax.lax.rem(lin, 2)
    i = step // (ny * nx)
    r = jax.lax.rem(step, ny * nx)
    j = r // nx
    cx = jax.lax.rem(r, nx)
    # Cross-chunk prefetch reads planes [0, ext_z) of dst while this step
    # writes band nb-1's planes [k + (nb-1)*band, ...): disjoint iff
    # (nb-2)*band >= k (same derivation as the 2D tiled cycle).
    cross_prefetch = (nb - 2) * band >= k and nb >= 2

    def read_copies(src, band_idx, jy, cxx, rslot, sem_idx):
        r0y = jy * yt
        c0 = cxx * wt
        cs = []
        for p in range(ext_z):
            src_row = (band_idx * band + p) * hp2 + r0y
            cs.append(pltpu.make_async_copy(
                src.at[pl.ds(src_row, yext), pl.ds(c0, wext)],
                u_vmem.at[rslot, pl.ds(p * yext, yext), :],
                rsem.at[rslot, sem_idx, p],
            ))
        return cs

    def frozen_copies(band_idx, jy, cxx, rslot):
        r0y = jy * yt
        c0 = cxx * wt
        cs = []
        for p in range(ext_z):
            src_row = (band_idx * band + p) * hp2 + r0y
            cs.append(pltpu.make_async_copy(
                f_hbm.at[pl.ds(src_row, yext), pl.ds(c0, wext)],
                f_vmem.at[rslot, pl.ds(p * yext, yext), :],
                rsem.at[rslot, 2, p],
            ))
        return cs

    def start_read(cc, band_idx, jy, cxx, rslot):
        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            for cp in read_copies(a_ref, band_idx, jy, cxx, rslot, 0):
                cp.start()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            for cp in read_copies(b_ref, band_idx, jy, cxx, rslot, 1):
                cp.start()

        for cp in frozen_copies(band_idx, jy, cxx, rslot):
            cp.start()

    def wait_read(cc, band_idx, jy, cxx, rslot):
        @pl.when(jax.lax.rem(cc, 2) == 0)
        def _():
            for cp in read_copies(a_ref, band_idx, jy, cxx, rslot, 0):
                cp.wait()

        @pl.when(jax.lax.rem(cc, 2) == 1)
        def _():
            for cp in read_copies(b_ref, band_idx, jy, cxx, rslot, 1):
                cp.wait()

        for cp in frozen_copies(band_idx, jy, cxx, rslot):
            cp.wait()

    def decompose(stp):
        bi = stp // (ny * nx)
        rr = jax.lax.rem(stp, ny * nx)
        return bi, rr // nx, jax.lax.rem(rr, nx)

    @pl.when(lin == 0)
    def _():
        start_read(0, 0, 0, 0, 0)

    if cross_prefetch:
        @pl.when(lin + 1 < nc * nsteps)
        def _():
            nxt = lin + 1
            cc = nxt // nsteps
            bi, jy, cxx = decompose(jax.lax.rem(nxt, nsteps))
            start_read(cc, bi, jy, cxx, jax.lax.rem(nxt, 2))
    else:
        @pl.when(step + 1 < nsteps)
        def _():
            bi, jy, cxx = decompose(step + 1)
            start_read(c, bi, jy, cxx, jax.lax.rem(lin + 1, 2))

        @pl.when((step == 0) & (lin > 0))
        def _():
            start_read(c, 0, 0, 0, slot)

    wait_read(c, i, j, cx, slot)

    t0 = it_ref[0] + c * k
    u0 = u_vmem[slot]
    # int8 mask widened before the compare (Mosaic v5e rejects int8
    # vector compares, not int8 DMAs).
    not_frozen = f_vmem[slot].astype(jnp.int32) == 0
    local_row = jax.lax.broadcasted_iota(jnp.int32, (rows, wext), 0)
    lx = jax.lax.broadcasted_iota(jnp.int32, (rows, wext), 1)
    lz = local_row // yext
    ly = local_row - lz * yext
    parity = (lz + i * band - k + ly + j * yt + lx + cx * wt) % 2

    def sweep(s, u):
        val = lse6(u, rows, wext, yext)
        valid = (
            (lz > s) & (lz < ext_z - 1 - s)
            & (ly > s) & (ly < yext - 1 - s)
            & (lx > s) & (lx < wext - 1 - s)
        )
        # 3D updates the class == t%2 (reference_np.sweep_3d parity note).
        update = (parity != ((t0 + s + 1) % 2)) & not_frozen & valid
        return jnp.where(update, val, u)

    u1 = sweep(0, u0)
    d0 = jnp.abs(u1 - u0)
    if interior is not None:
        d_int, h_int, w_int = interior
        gz = lz + i * band
        gy = ly + j * yt
        gx = lx + cx * wt
        inside = ((gz >= k) & (gz < k + d_int)
                  & (gy >= hy) & (gy < hy + h_int)
                  & (gx >= hx) & (gx < hx + w_int))
        d0 = jnp.where(inside, d0, 0.0)
    delta_ref[c, step] = jnp.max(d0)
    # ns < k: shallow chunk on the k-deep slabs (nc must be 1) — see the
    # 2D note in _cycle_kernel_tiled_impl.
    u = jax.lax.fori_loop(1, k if ns is None else ns, sweep, u1)
    u_vmem[slot] = u

    def write_to(dst, wslot):
        cs = []
        for p in range(band):
            dst_row = (k + i * band + p) * hp2 + hy + j * yt
            cs.append(pltpu.make_async_copy(
                u_vmem.at[slot, pl.ds((k + p) * yext + hy, yt),
                          pl.ds(hx, wt)],
                dst.at[pl.ds(dst_row, yt), pl.ds(hx + cx * wt, wt)],
                wsem.at[wslot, p],
            ))
        return cs

    @pl.when(jax.lax.rem(c, 2) == 0)
    def _():
        for wcp in write_to(b_ref, 0):
            wcp.start()
        for wcp in write_to(b_ref, 0):
            wcp.wait()

    @pl.when(jax.lax.rem(c, 2) == 1)
    def _():
        for wcp in write_to(a_ref, 1):
            wcp.start()
        for wcp in write_to(a_ref, 1):
            wcp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n_chunks", "k", "band", "yt", "wt", "hp2",
                     "interpret"),
    donate_argnums=(0, 1),
)
def sweep_cycle_tiled3d(
    u_a: jax.Array,
    u_b: jax.Array,
    frozen_pad: jax.Array,
    iteration: jax.Array,
    n_chunks: int,
    k: int,
    band: int,
    yt: int,
    wt: int,
    hp2: int,
    interpret: bool = False,
):
    """(z, y, x)-tiled 3D twin of :func:`sweep_cycle` for the
    pallas_tiled3d wide-plane layout: ``n_chunks * k`` 6-neighbour sweeps
    in one dispatch. Wide-plane chunks are shallow (production k=2) with
    many slabs per chunk, so the chained path pays ~50 dispatches + 50
    full-volume paste copies per 100-sweep span — the cycle's best case.
    Same contract as every cycle kernel: final state in ``b'`` when
    ``n_chunks`` is odd, both inputs DONATED."""
    from .pallas_tiled3d import _HX, _HY

    rp, wp = u_a.shape
    dp = rp // hp2
    nb = (dp - 2 * k) // band
    ny = (hp2 - 2 * _HY) // yt
    nx = (wp - 2 * _HX) // wt
    assert nb * band + 2 * k == dp, (dp, band, k)
    assert ny * yt + 2 * _HY == hp2, (hp2, yt)
    assert nx * wt + 2 * _HX == wp, (wp, wt)
    assert n_chunks >= 1 and k <= min(_HY, _HX)
    ext_z = band + 2 * k
    yext = yt + 2 * _HY
    wext = wt + 2 * _HX
    nsteps = nb * ny * nx

    a_out, b_out, deltas = pl.pallas_call(
        functools.partial(_cycle_kernel_tiled3d, k=k, band=band, yt=yt,
                          wt=wt, hy=_HY, hx=_HX, hp2=hp2, nb=nb, ny=ny,
                          nx=nx, nc=n_chunks),
        grid=(n_chunks, nsteps),
        out_shape=(
            jax.ShapeDtypeStruct((rp, wp), jnp.float32),
            jax.ShapeDtypeStruct((rp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, nsteps), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ext_z * yext, wext), jnp.float32),
            pltpu.VMEM((2, ext_z * yext, wext), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3, ext_z)),
            pltpu.SemaphoreType.DMA((2, band)),
        ],
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(iteration.reshape(1), u_a, u_b, frozen_pad)

    return a_out, b_out, jnp.max(deltas, axis=1)


# Hard ceiling on chunks per cycle DISPATCH. The kernels emit one deltas
# row per chunk, padded to 128 lanes in scoped SMEM (1 MB total on v5e):
# an uncapped 2048-chunk dispatch allocates 2048*128*4 = exactly 1 MB and
# fails Mosaic compilation (hit by update_n(state, 6000) at k=2 — 3000
# chunks). 512 chunks keep the deltas block at 256 KB and, at big-grid
# shapes, one dispatch under the ~45 s remote-worker watchdog.
MAX_CHUNKS_PER_DISPATCH = 512


def chain_lengths(n_full: int) -> list[int]:
    """Decompose a chunk count into full MAX_CHUNKS_PER_DISPATCH cycles
    plus descending powers of two, so every distinct total reuses a
    log-sized set of compiled cycle programs instead of baking each
    n_chunks into its own program (the remote compile service costs
    minutes per distinct jaxpr — CLAUDE.md environment hazards)."""
    out = [MAX_CHUNKS_PER_DISPATCH] * (n_full // MAX_CHUNKS_PER_DISPATCH)
    n_full %= MAX_CHUNKS_PER_DISPATCH
    b = 1 << (n_full.bit_length() - 1) if n_full > 0 else 0
    while n_full:
        if n_full >= b:
            out.append(b)
            n_full -= b
        b >>= 1
    return out


def cycle_fill(cycle_fn, u, frozen, iteration, n_full, *layout,
               interpret=False):
    """Trace-time helper for SOLVE loop bodies: run ``n_full`` K-chunks
    through ``cycle_fn`` with a FRESH fill twin and return
    ``(u', deltas)``.

    The twin only needs valid guard cells — every centre is written before
    it is read — so a ``jnp.full(-1e6)`` created inside the loop body (no
    read traffic, no while-carry) captures the cycle's drain/DUS savings
    without the cond-join copies a carried pair costs (probe36 vs
    probe40/42). Pass the UNJITTED kernel (``.__wrapped__``); ``layout``
    is the kernel's static tail with ``layout[0] == k``. The odd/even
    output-buffer selection lives here and in :func:`run_chain` only."""
    from .. import constants as _C

    # The fill value must equal the solve paths' pad constant (the checked
    # cycle solves' exit-state argument relies on every non-centre cell of
    # both buffers holding the SAME pad value).
    alt = jnp.full_like(u, jnp.float32(_C.LOG_SPACE_OBSTACLE))
    a, b, deltas = cycle_fn(u, alt, frozen, iteration, n_full, *layout,
                            interpret)
    return (b if n_full % 2 else a), deltas


def run_chain(cycle_fn, u, alt, frozen, iteration, n_full, *layout,
              interpret=False):
    """Run ``n_full`` K-chunks through ``cycle_fn`` as a power-of-two chain
    of cycle dispatches, ping-ponging (current, twin) across calls.

    ``alt`` may be None (a twin is created with ``jnp.copy`` — one copy);
    pass the previous chain's twin to stay zero-copy across anytime ticks.
    Returns ``(u_final, twin, delta_of_first_sweep)``.
    """
    if alt is None:
        alt = jnp.copy(u)
    delta = None
    for nc in chain_lengths(n_full):
        a, b, deltas = cycle_fn(u, alt, frozen, iteration, nc, *layout,
                                interpret)
        u, alt = (b, a) if nc % 2 else (a, b)
        if delta is None:
            delta = deltas[0]
        iteration = iteration + nc * layout[0]
    return u, alt, delta
