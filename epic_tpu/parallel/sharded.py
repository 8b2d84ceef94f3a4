"""Multi-chip spatial domain decomposition: shard_map + halo exchange.

The reference is strictly single-GPU — the whole grid must fit one device
(harmonic_model_gpu.cu:76-106). The TPU-native scaling analog (SURVEY §5,
"long-context analog") is 2D spatial decomposition over a device Mesh:

- the grid is sharded P('my', 'mx') across a 2D mesh;
- each red-black sweep needs exactly a 1-cell halo from each neighbour,
  exchanged with ``jax.lax.ppermute`` (rides ICI within a slice, DCN across
  hosts when ``jax.distributed`` is initialised);
- the staggered convergence check is a ``jax.lax.pmax`` of the local deltas —
  replacing the reference's two-stage shared-memory block reduction plus
  4-byte D2H copy (harmonic_gpu.cu:113-153, 402);
- the solve protocol (exit right after a check iteration with delta < eps and
  iter >= max(H, W)) is bit-identical to the single-chip path.

Update numerics are pinned to the oracle exactly as in
:mod:`epic_tpu.solver.core`; a sharded solve equals the single-device solve
to float tolerance (tested on a virtual 8-device CPU mesh).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..grid import GridState

_LOG2N_2D = np.float32(np.log(np.float64(4.0)))


def make_mesh(shape: tuple[int, int] | None = None, devices=None) -> Mesh:
    """A 2D ('my', 'mx') mesh. Default: all devices in a near-square grid."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        my = int(np.floor(np.sqrt(n)))
        while n % my:
            my -= 1
        shape = (my, n // my)
    return Mesh(devices.reshape(shape), ("my", "mx"))


def _neighbor_perm(n: int, direction: int):
    """Non-wrapping shift permutation: direction +1 sends shard j -> j+1."""
    if direction > 0:
        return [(j, j + 1) for j in range(n - 1)]
    return [(j, j - 1) for j in range(1, n)]


def _exchange_halos(u: jax.Array, mesh: Mesh):
    """Fetch the 4 one-cell halos for a local block via ppermute.

    Returns u_ext: f32[h+2, w+2]; corners and out-of-mesh halos are zeros
    (never read by an updated cell: the global boundary ring is frozen).
    """
    nmy = mesh.shape["my"]
    nmx = mesh.shape["mx"]
    # North halo = the shard above's bottom row (shift down, j -> j+1).
    north = jax.lax.ppermute(u[-1:, :], "my", _neighbor_perm(nmy, +1))
    south = jax.lax.ppermute(u[:1, :], "my", _neighbor_perm(nmy, -1))
    west = jax.lax.ppermute(u[:, -1:], "mx", _neighbor_perm(nmx, +1))
    east = jax.lax.ppermute(u[:, :1], "mx", _neighbor_perm(nmx, -1))
    rows = jnp.concatenate([north, u, south], axis=0)
    zc = jnp.zeros((1, 1), u.dtype)
    west_ext = jnp.concatenate([zc, west, zc], axis=0)
    east_ext = jnp.concatenate([zc, east, zc], axis=0)
    return jnp.concatenate([west_ext, rows, east_ext], axis=1)


def _local_sweep(u, frozen, parity, iteration, mesh):
    """One sweep of the local block with fresh halos. Every local cell is
    treated as stencil-interior; frozen masks out the global boundary."""
    u_ext = _exchange_halos(u, mesh)
    un = u_ext[:-2, 1:-1]
    us = u_ext[2:, 1:-1]
    uw = u_ext[1:-1, :-2]
    ue = u_ext[1:-1, 2:]
    m = jnp.maximum(jnp.maximum(un, us), jnp.maximum(uw, ue))
    s = ((jnp.exp(un - m) + jnp.exp(us - m)) + jnp.exp(uw - m)) + jnp.exp(ue - m)
    val = (m + jnp.log(s)) - _LOG2N_2D
    update = (parity != (iteration % 2)) & ~frozen
    u_new = jnp.where(update, val, u)
    delta = jnp.max(jnp.abs(u_new - u))
    return u_new, delta


def _local_parity(shape_local, mesh):
    """Global (y + x) % 2 for this shard's block, from the mesh coordinates."""
    h, w = shape_local
    iy = jax.lax.axis_index("my") * h
    ix = jax.lax.axis_index("mx") * w
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + iy
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + ix
    return (row + col) % 2


def _frozen_mask(state: GridState) -> jax.Array:
    h, w = state.u.shape
    interior = np.zeros((h, w), dtype=bool)
    interior[1:-1, 1:-1] = True
    return state.locked | jnp.asarray(~interior)


def padded_shape(shape: tuple[int, int], mesh: Mesh) -> tuple[int, int]:
    h, w = shape
    nmy, nmx = mesh.shape["my"], mesh.shape["mx"]
    return (-(-h // nmy) * nmy, -(-w // nmx) * nmx)


def _pad_for_mesh(state: GridState, mesh: Mesh):
    h, w = state.u.shape
    hp, wp = padded_shape((h, w), mesh)
    u = jnp.pad(state.u, ((0, hp - h), (0, wp - w)),
                constant_values=np.float32(C.LOG_SPACE_OBSTACLE))
    frozen = jnp.pad(_frozen_mask(state), ((0, hp - h), (0, wp - w)),
                     constant_values=True)
    return u, frozen


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps"),
    donate_argnums=(0,),
)
def _update_n_sharded(u, frozen, iteration, mesh: Mesh, num_steps: int):
    """num_steps sweeps; delta (pmax-reduced) from the first sweep."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("my", "mx"), P("my", "mx"), P()),
        out_specs=(P("my", "mx"), P()),
    )
    def run(u_loc, frozen_loc, it0):
        parity = _local_parity(u_loc.shape, mesh)

        def body(k, carry):
            u, delta = carry
            u, d = _local_sweep(u, frozen_loc, parity, it0 + k, mesh)
            return u, jnp.where(k == 0, d, delta)

        # The initial delta must carry the same varying-axes type as the body
        # output under shard_map's manual-axes typing.
        delta0 = jax.lax.pvary(jnp.float32(0.0), ("my", "mx"))
        u_loc, delta = jax.lax.fori_loop(0, num_steps, body, (u_loc, delta0))
        delta = jax.lax.pmax(jax.lax.pmax(delta, "my"), "mx")
        return u_loc, delta.reshape(1)

    u, delta = run(u, frozen, iteration)
    return u, delta[0]


def update_n(state: GridState, num_steps: int, mesh: Mesh) -> GridState:
    """Sharded anytime chunk; semantics of core.update_n on a device mesh."""
    h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, P("my", "mx"))
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, delta = _update_n_sharded(u, frozen, state.iteration, mesh, num_steps)
    return dataclasses.replace(
        state,
        u=u[:h, :w],
        iteration=state.iteration + num_steps,
        delta=delta,
        converged=(delta < state.epsilon) if num_steps == 1 else jnp.asarray(False),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stagger", "max_iterations", "height", "width"),
    donate_argnums=(0, 1),
)
def _solve_sharded(
    u, frozen, epsilon, mesh: Mesh, stagger: int, max_iterations: int,
    height: int, width: int,
):
    m_max = max(height, width)

    def cond(carry):
        _, iteration, _, converged = carry
        return ~converged & (iteration < max_iterations)

    def body(carry):
        u, iteration, _, _ = carry
        u, delta = _update_n_sharded.__wrapped__(u, frozen, iteration, mesh, 1)
        iteration = iteration + 1
        done = (delta < epsilon) & (iteration >= m_max)

        def run_rest(args):
            u, iteration = args
            u, _ = _update_n_sharded.__wrapped__(u, frozen, iteration, mesh, stagger - 1)
            return u, iteration + (stagger - 1)

        u, iteration = jax.lax.cond(done, lambda a: a, run_rest, (u, iteration))
        return u, iteration, delta, done

    return jax.lax.while_loop(
        cond, body, (u, jnp.int32(0), epsilon + 1.0, jnp.asarray(False))
    )


def solve(
    state: GridState,
    mesh: Mesh,
    stagger: int = C.DEFAULT_STAGGER,
    max_iterations: int = 1_000_000,
) -> GridState:
    """Sharded solve-to-convergence; protocol identical to core.solve."""
    h, w = state.u.shape
    u, frozen = _pad_for_mesh(state, mesh)
    sharding = NamedSharding(mesh, P("my", "mx"))
    u = jax.device_put(u, sharding)
    frozen = jax.device_put(frozen, sharding)
    u, iteration, delta, converged = _solve_sharded(
        u, frozen, state.epsilon, mesh, stagger, max_iterations, h, w
    )
    return dataclasses.replace(
        state,
        u=u[:h, :w],
        iteration=iteration,
        delta=delta,
        converged=converged,
    )
