from . import (
    batched,
    batched_path,
    core,
    legacy,
    pallas_banded,
    pallas_batched,
    pallas_biggrid,
    pallas_packed,
    pallas_sweep,
    pallas_sweep3d,
    pallas_tiled,
    reference_np,
)

__all__ = [
    "batched",
    "batched_path",
    "core",
    "legacy",
    "pallas_banded",
    "pallas_batched",
    "pallas_biggrid",
    "pallas_packed",
    "pallas_sweep",
    "pallas_sweep3d",
    "pallas_tiled",
    "reference_np",
]
