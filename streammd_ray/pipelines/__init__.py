from .mark_duplicates import (
    CapacityExceeded,
    MarkResult,
    compute_metrics,
    mark_duplicates,
)

__all__ = ["CapacityExceeded", "MarkResult", "compute_metrics", "mark_duplicates"]
