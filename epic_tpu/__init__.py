"""epic_tpu — a TPU-native log-space harmonic-function path-planning engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference CUDA/C++/ROS package `epic` (kylewray/epic): occupancy-grid ingest,
log-space red-black relaxation of a harmonic potential, gradient-ascent
streamline extraction, incremental warm-started replanning services, batched
multi-scenario solves, and multi-chip spatial domain decomposition.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: first-compile latency dominates interactive
# use (remote-compile TPU backends especially); cache across processes.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/epic_tpu_jax"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # config name drift across jax versions — best effort
        pass

from . import analysis, checkpoint, config, constants, errors, maps, path, path3d, path_nd, profiling, viz
from .grid import (
    GridState,
    empty_grid_nd,
    empty_state,
    empty_volume,
    from_occupancy_image,
    from_occupancy_volume,
    make_state,
    reset_free_cells,
    set_cells,
    set_cells_3d,
)
from .planner import Planner, PlannerConfig
from .planner_mesh import MeshPlanner
from .planner3d import VolumePlanner, VolumePlannerConfig
from .solver import core as solver_core
from .solver import reference_np as solver_oracle

__version__ = "0.1.0"

__all__ = [
    "GridState",
    "MeshPlanner",
    "Planner",
    "PlannerConfig",
    "VolumePlanner",
    "VolumePlannerConfig",
    "analysis",
    "checkpoint",
    "config",
    "constants",
    "errors",
    "empty_grid_nd",
    "empty_state",
    "empty_volume",
    "from_occupancy_image",
    "from_occupancy_volume",
    "make_state",
    "maps",
    "path",
    "path3d",
    "path_nd",
    "profiling",
    "reset_free_cells",
    "set_cells",
    "set_cells_3d",
    "solver_core",
    "solver_oracle",
    "viz",
]
