"""Typed configuration for the solver stack (SURVEY §5 "config/flag system").

The reference's configuration surface is ROS parameters + keyword defaults
scattered across launch files (epic_navigation_node_main.cpp:43-68,
launch/*.launch). Here it is one dataclass tree covering solver numerics,
kernel selection/tiling, mesh shape, and service endpoints. PlannerConfig
(epic_tpu.planner) embeds SolverConfig semantics for the anytime node.
"""

from __future__ import annotations

import dataclasses

from . import constants as C


@dataclasses.dataclass
class SolverConfig:
    """Numerics + kernel selection."""

    epsilon: float = C.DEFAULT_EPSILON_NODE
    stagger: int = C.DEFAULT_STAGGER
    max_iterations: int = 1_000_000
    # backend: "auto" = pallas on TPU when the grid fits VMEM, else XLA.
    backend: str = "auto"            # "auto" | "xla" | "pallas"
    # kernel: the masked full-grid layout (the parity-packed half-grid
    # variant measured worse on v5e — lane shifts/selects cost more than the
    # saved logsumexps, docs/BENCH_NOTES.md — and was retired in round 3
    # with pallas_packed; "masked" is the only value).
    kernel: str = "masked"           # "masked"
    # Big-grid (beyond-VMEM) kernel parameters (solver.pallas_biggrid):
    # tile_depth is the temporal-blocking K (sweeps per HBM round trip;
    # K=16 measured best, docs/BENCH_NOTES.md); tile_band overrides the
    # auto row-band height (None = choose_layout picks from the VMEM
    # budget). Consumed by Planner's big-grid update path.
    tile_band: int | None = None
    tile_depth: int = 16
    # Opt-in coarse-to-fine warm start for blocking solves (solver.cascade):
    # same convergence certificate, fewer fine-grid sweeps on open domains.
    cascade: bool = False


@dataclasses.dataclass
class MeshConfig:
    """Multi-chip decomposition (epic_tpu.parallel)."""

    shape: tuple[int, int] | None = None   # None -> near-square over devices
    axis_names: tuple[str, str] = ("my", "mx")


@dataclasses.dataclass
class ServiceConfig:
    """Service-plane endpoints (epic_tpu.services.server)."""

    host: str = "127.0.0.1"
    port: int = 7171
    steps_per_update: int = 50
    update_rate_hz: float = 10.0


@dataclasses.dataclass
class EpicConfig:
    """The full configuration tree. Consumed by :class:`epic_tpu.planner.
    Planner` (pass it in place of a PlannerConfig), the service-server CLI
    (``python -m epic_tpu.services.server``), and ``tools/batch_bench.py``."""

    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    service: ServiceConfig = dataclasses.field(default_factory=ServiceConfig)
