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
