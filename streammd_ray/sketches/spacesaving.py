"""SpaceSaving — deterministic top-k heavy hitters in k counters (Metwally,
Agrawal & El Abbadi, ICDT 2005 "Efficient Computation of Frequent and Top-k
Elements in Data Streams").

Role in the engine: the CMS+heap pattern (cms.py) estimates frequencies but
cannot bound which keys it tracks; SpaceSaving guarantees that EVERY key with
true frequency > N/k is among its k counters, and each reported count
overestimates the truth by at most its recorded error ≤ N/k. That is the
right tool for "top tools / top domains / top licenses over 10^12 rows"
where the answer set must be provably complete above a frequency floor.

Insertion is batch-first: a batch collapses to (unique value, count) via
Arrow ``value_counts`` before touching the counter map, so the per-item
Python cost is per *distinct key per batch*, not per row — for the
heavy-hitter workloads this sketch exists for (low-cardinality hot keys over
huge streams) that is thousands of times fewer operations.

Merge follows the mergeable-summaries construction (Agarwal, Cormode,
Huang, Phillips, Wei & Yi, PODS 2012 §3.2): counts of common keys add;
a key absent from one side contributes that side's minimum counter value
(its maximum possible count there) to both count and error; the union is
re-truncated to the k largest. The N/k error bound is preserved under
arbitrary merge trees, which is what lets per-partition states tree-reduce
in any order (north_rule merge-associativity requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Sketch, SketchError


class SpaceSaving(Sketch):
    kind = "spacesaving"

    def __init__(self, *, k: int = 64):
        if k < 1:
            raise SketchError("SpaceSaving needs k >= 1")
        self.k = int(k)
        # key -> [count, err]; count includes err (count is an upper bound,
        # count - err a lower bound on the true frequency)
        self.counters: dict = {}
        self.total = 0

    # --- insertion ---------------------------------------------------------

    def insert_batch(self, values, counts=None) -> None:
        """Insert a column (optionally pre-aggregated with integer counts).
        Nulls are skipped — a null key is not a frequency candidate."""
        if not isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = pa.array(values)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if counts is None:
            if len(values) == 0:
                return
            vc = values.drop_null().value_counts()
            keys = vc.field("values").to_pylist()
            cnts = np.asarray(vc.field("counts"), dtype=np.int64)
        else:
            keys = values.to_pylist()
            cnts = np.ascontiguousarray(counts, dtype=np.int64)
            keep = [i for i, v in enumerate(keys) if v is not None]
            keys = [keys[i] for i in keep]
            cnts = cnts[keep]
        for key, c in zip(keys, cnts.tolist()):
            self._offer(key, c, 0)
            self.total += c

    def _offer(self, key, count: int, err: int) -> None:
        cur = self.counters.get(key)
        if cur is not None:
            cur[0] += count
            cur[1] += err
            return
        if len(self.counters) < self.k:
            self.counters[key] = [count, err]
            return
        # evict the minimum counter; the newcomer inherits its count as error
        min_key = min(self.counters, key=lambda x: self.counters[x][0])
        m = self.counters[min_key][0]
        del self.counters[min_key]
        self.counters[key] = [m + count, m + err]

    # --- summary -----------------------------------------------------------

    def top_k(self, k: int | None = None) -> list[tuple]:
        """(key, count_upper_bound, err) sorted by count desc, key asc."""
        items = sorted(
            self.counters.items(), key=lambda kv: (-kv[1][0], str(kv[0]))
        )
        return [(key, c, e) for key, (c, e) in items[: k or self.k]]

    def estimate(self) -> dict:
        return {"total": self.total, "top": self.top_k()}

    def guaranteed(self) -> list[tuple]:
        """Keys whose LOWER bound (count - err) beats every other counter's
        upper bound floor — provably in the true top set."""
        if not self.counters:
            return []
        min_count = min(c for c, _ in self.counters.values())
        return [
            (key, c, e)
            for key, c, e in self.top_k()
            if c - e > min_count or len(self.counters) < self.k
        ]

    # --- merge (Agarwal et al. 2012 §3.2) -----------------------------------

    def _compat_key(self) -> tuple:
        return (self.kind, self.k)

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        self.check_compatible(other)
        m1 = (
            min(c for c, _ in self.counters.values())
            if len(self.counters) >= self.k
            else 0
        )
        m2 = (
            min(c for c, _ in other.counters.values())
            if len(other.counters) >= other.k
            else 0
        )
        merged: dict = {}
        for key, (c, e) in self.counters.items():
            oc, oe = other.counters.get(key, (m2, m2))
            merged[key] = [c + oc, e + oe]
        for key, (c, e) in other.counters.items():
            if key not in merged:
                merged[key] = [c + m1, e + m1]
        top = sorted(merged.items(), key=lambda kv: (-kv[1][0], str(kv[0])))
        self.counters = dict(top[: self.k])
        self.total += other.total
        return self
