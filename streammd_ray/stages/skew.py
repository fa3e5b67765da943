"""Skew-aware grouped aggregation — the explicit hot-key pattern the
north_rule requires for conv_id at 10^12-turn scale.

A bare ``groupby(conv_id)`` routes every row of a hot conversation (the
zipf head — the synthetic fixture plants one conversation ~50x the median)
to ONE reducer. ``salted_groupby`` splits each key into ``salt_buckets``
sub-keys for the first (wide) aggregation, then combines the per-salt
partials in a second, tiny aggregation keyed on the original key — the
classic two-level / partial-aggregate decomposition. Works for any
aggregate with an associative combine (sum, count, min, max here; the
sketch UDAFs compose the same way via their merge()).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_COMBINE = {
    "sum": "sum",  # sum of partial sums
    "count": "sum",  # sum of partial counts
    "min": "min",
    "max": "max",
}


def salted_groupby(
    ds,
    key: str,
    aggs: dict[str, tuple[str, str]],
    *,
    salt_buckets: int = 16,
):
    """Two-level grouped aggregation.

    ``aggs``: output name → (op, column), op in {sum, count, min, max}
    (count ignores its column). Returns a Dataset keyed on ``key``.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def add_salt(t: pa.Table) -> pa.Table:
        # salt by row position so a hot key spreads evenly across buckets —
        # a plain arange-mod is uniform per batch and costs nothing (the
        # round-1 version hashed a fresh list of position STRINGS per batch)
        salt = (np.arange(len(t), dtype=np.int64) % salt_buckets).astype(np.int32)
        return t.append_column("__salt", pa.array(salt, pa.int32()))

    def mk(op, col, name):
        if op == "count":
            return Count(alias_name=name)
        cls = {"sum": Sum, "min": Min, "max": Max}[op]
        return cls(col, alias_name=name)

    first = (
        ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "__salt"])
        .aggregate(*[mk(op, col, name) for name, (op, col) in aggs.items()])
    )
    second = first.groupby(key).aggregate(
        *[
            mk(_COMBINE[op], name, name)
            for name, (op, col) in aggs.items()
        ]
    )
    return second
