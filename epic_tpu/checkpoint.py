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


def load_planner(path: str | pathlib.Path, config=None):
    """Restore a planner session saved by :func:`save_planner`.

    ``config`` optionally overrides the solver/backend settings; transforms
    and pause state always come from the snapshot.
    """
    from .planner import Planner, PlannerConfig

    state = load(path)
    with np.load(path) as z:
        meta = z["planner_meta"]
        interpolation = str(z["interpolation"])
    cfg = config or PlannerConfig()
    planner = Planner(cfg)
    planner.config.resolution = float(meta[0])
    planner.config.origin_x = float(meta[1])
    planner.config.origin_y = float(meta[2])
    planner.config.steps_per_update = int(meta[3])
    planner.config.interpolation = interpolation
    planner.config.epsilon = float(state.epsilon)
    planner.state = state
    planner.paused = bool(meta[4])
    return planner
