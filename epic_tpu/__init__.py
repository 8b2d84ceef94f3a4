"""epic_tpu — a TPU-native log-space harmonic-function path-planning engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference CUDA/C++/ROS package `epic` (kylewray/epic): occupancy-grid ingest,
log-space red-black relaxation of a harmonic potential, gradient-ascent
streamline extraction, incremental warm-started replanning services, batched
multi-scenario solves, and multi-chip spatial domain decomposition.
"""

from . import constants, errors
from .grid import (
    GridState,
    empty_state,
    from_occupancy_image,
    make_state,
    reset_free_cells,
    set_cells,
)
from .solver import core as solver_core
from .solver import reference_np as solver_oracle

__version__ = "0.1.0"

__all__ = [
    "GridState",
    "constants",
    "errors",
    "empty_state",
    "from_occupancy_image",
    "make_state",
    "reset_free_cells",
    "set_cells",
    "solver_core",
    "solver_oracle",
]
