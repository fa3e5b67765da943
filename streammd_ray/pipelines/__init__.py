from .flagship import FlagshipResult, SketchTail, default_sketch_specs, run_flagship
from .mark_duplicates import (
    CapacityExceeded,
    MarkResult,
    compute_metrics,
    mark_duplicates,
)

__all__ = [
    "CapacityExceeded",
    "MarkResult",
    "compute_metrics",
    "mark_duplicates",
    "FlagshipResult",
    "SketchTail",
    "default_sketch_specs",
    "run_flagship",
]
