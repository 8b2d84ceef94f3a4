"""GridState persistence — save/resume of in-flight relaxations.

The reference has no on-disk checkpointing; its warm restart is purely
in-memory (SURVEY §5: u/locked persist across service edits,
``harmonic_update_model_gpu`` re-uploads a host-modified state). Here the
same state is one pytree, so persistence is trivial — and valuable: an
anytime planner can survive process restarts mid-relaxation, and batch jobs
can shard/resume long mega-grid solves.

Format: a single .npz with the five leaves + epsilon. No framework lock-in;
loadable with plain NumPy.
"""

from __future__ import annotations

import pathlib

import numpy as np

from .grid import GridState, make_state


def save(path: str | pathlib.Path, state: GridState) -> None:
    np.savez_compressed(
        path,
        u=np.asarray(state.u),
        locked=np.asarray(state.locked),
        iteration=np.asarray(state.iteration),
        delta=np.asarray(state.delta),
        converged=np.asarray(state.converged),
        epsilon=np.asarray(state.epsilon),
    )


def load(path: str | pathlib.Path) -> GridState:
    import dataclasses

    import jax.numpy as jnp

    with np.load(path) as z:
        state = make_state(z["u"], z["locked"], epsilon=float(z["epsilon"]))
        return dataclasses.replace(
            state,
            iteration=jnp.int32(int(z["iteration"])),
            delta=jnp.float32(float(z["delta"])),
            converged=jnp.asarray(bool(z["converged"])),
        )


def save_planner(path: str | pathlib.Path, planner) -> None:
    """Persist a whole planner session: grid state + service-plane config
    (world transforms, epsilon, pause flag), so an anytime node survives a
    process restart mid-relaxation and resumes warm."""
    st = planner.state
    if st is None:
        raise ValueError("planner not initialized")
    cfg = planner.config
    np.savez_compressed(
        path,
        u=np.asarray(st.u),
        locked=np.asarray(st.locked),
        iteration=np.asarray(st.iteration),
        delta=np.asarray(st.delta),
        converged=np.asarray(st.converged),
        epsilon=np.asarray(st.epsilon),
        planner_meta=np.asarray([
            cfg.resolution, cfg.origin_x, cfg.origin_y,
            float(cfg.steps_per_update), float(planner.paused),
        ]),
        interpolation=np.asarray(cfg.interpolation),
    )


def save_volume_planner(path: str | pathlib.Path, planner) -> None:
    """Persist a 3D planner session (:class:`epic_tpu.planner3d.VolumePlanner`):
    volume state + transforms + pause flag, the 3D twin of
    :func:`save_planner`."""
    st = planner.state
    if st is None:
        raise ValueError("planner not initialized")
    cfg = planner.config
    np.savez_compressed(
        path,
        u=np.asarray(st.u),
        locked=np.asarray(st.locked),
        iteration=np.asarray(st.iteration),
        delta=np.asarray(st.delta),
        converged=np.asarray(st.converged),
        epsilon=np.asarray(st.epsilon),
        volume_meta=np.asarray([
            cfg.resolution, cfg.origin_x, cfg.origin_y, cfg.origin_z,
            float(cfg.steps_per_update), float(planner.paused),
        ]),
    )


def load_volume_planner(path: str | pathlib.Path, config=None):
    """Restore a 3D planner session saved by :func:`save_volume_planner`.
    Same override contract as :func:`load_planner`."""
    import dataclasses
    import jax.numpy as jnp

    from .planner3d import VolumePlanner, VolumePlannerConfig

    state = load(path)
    with np.load(path) as z:
        meta = z["volume_meta"]
    if config is not None:
        cfg = dataclasses.replace(config)
        if cfg.epsilon != VolumePlannerConfig().epsilon:
            state = dataclasses.replace(state, epsilon=jnp.float32(cfg.epsilon))
        else:
            cfg.epsilon = float(state.epsilon)
    else:
        cfg = VolumePlannerConfig(epsilon=float(state.epsilon))
    cfg.resolution = float(meta[0])
    cfg.origin_x = float(meta[1])
    cfg.origin_y = float(meta[2])
    cfg.origin_z = float(meta[3])
    cfg.steps_per_update = int(meta[4])
    planner = VolumePlanner(cfg)
    planner.state = state
    planner.paused = bool(meta[5])
    return planner


def load_planner(path: str | pathlib.Path, config=None):
    """Restore a planner session saved by :func:`save_planner`.

    ``config`` optionally overrides solver settings — its epsilon (when it
    differs from the default) replaces the snapshot's, and its
    backend/kernel selection applies. Transforms, interpolation mode,
    steps_per_update, and the pause flag always come from the snapshot.
    The caller's config object is never mutated (a copy is taken).
    """
    import dataclasses
    import jax.numpy as jnp

    from .planner import Planner, PlannerConfig

    state = load(path)
    with np.load(path) as z:
        meta = z["planner_meta"]
        interpolation = str(z["interpolation"])
    if config is not None:
        cfg = dataclasses.replace(config)
        if cfg.epsilon != PlannerConfig().epsilon:
            # Explicit override: re-target the resumed relaxation.
            state = dataclasses.replace(
                state, epsilon=jnp.float32(cfg.epsilon)
            )
        else:
            cfg.epsilon = float(state.epsilon)
    else:
        cfg = PlannerConfig(epsilon=float(state.epsilon))
    cfg.resolution = float(meta[0])
    cfg.origin_x = float(meta[1])
    cfg.origin_y = float(meta[2])
    cfg.steps_per_update = int(meta[3])
    cfg.interpolation = interpolation
    planner = Planner(cfg)
    planner.state = state
    planner.paused = bool(meta[4])
    return planner
