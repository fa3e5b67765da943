"""Count–min sketch — frequency / heavy-hitter estimation (Cormode &
Muthukrishnan 2005).

Role in the engine: heavy-hitter tool / role frequencies over 10^12 turns
without a per-key groupby shuffle. Point estimate f̂(x) = min over d rows;
guarantee f̂(x) ≤ f(x) + ε·N with probability ≥ 1−δ, where ε = e/width and
δ = e^-depth. Merge = elementwise addition of the count matrices —
exactly associative/commutative.

Heavy hitters: the sketch itself cannot enumerate keys, so a small candidate
map of the current top-K (by CMS estimate) rides along with the counts —
classic "CMS + heap" pattern; candidate maps union on merge and re-truncate,
so heavy hitters survive arbitrary partition orders as long as K is
comfortably larger than the true number of heavy keys per partition.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import HASHER_ID, SEED_A, SEED_B, hash_pair_batch, valid_mask
from .base import Sketch


class CountMinSketch(Sketch):
    kind = "cms"

    def __init__(
        self,
        *,
        eps: float = 1e-4,
        delta: float = 1e-4,
        track_heavy: int = 0,
        seeds: tuple[int, int] = (SEED_A, SEED_B),
    ):
        """eps/delta sizing: width = ceil(e/eps), depth = ceil(ln(1/delta))."""
        self.eps = float(eps)
        self.delta = float(delta)
        self.width = math.ceil(math.e / eps)
        self.depth = math.ceil(math.log(1.0 / delta))
        self.seeds = tuple(seeds)
        self.hasher = HASHER_ID
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0
        self.track_heavy = int(track_heavy)
        self.heavy: dict = {}  # key -> CMS estimate at last update

    def _indices(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        j = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + j * h2[None, :]) % np.uint64(self.width)).astype(
            np.int64
        )

    def insert_batch(self, values, counts=None) -> None:
        """Add each value (optionally with per-value integer counts).
        Null values are skipped — they are not a frequency key."""
        h1, h2 = hash_pair_batch(values, *self.seeds)
        if counts is None:
            w = np.ones(len(h1), dtype=np.int64)
        else:
            w = np.ascontiguousarray(counts, dtype=np.int64)
        valid = valid_mask(values)
        if valid is not None:
            h1, h2, w = h1[valid], h2[valid], w[valid]
        if len(h1) == 0:
            return
        idx = self._indices(h1, h2)
        for j in range(self.depth):
            np.add.at(self.counts[j], idx[j], w)
        self.total += int(w.sum())
        if self.track_heavy:
            vals = values.to_pylist() if hasattr(values, "to_pylist") else list(values)
            if valid is not None:
                vals = [v for v, ok in zip(vals, valid) if ok]
            self._update_heavy(vals, idx)

    def _update_heavy(self, vals: list, idx: np.ndarray) -> None:
        est = self.counts[np.arange(self.depth)[:, None], idx].min(axis=0)
        for v, e in zip(vals, est):
            if v is None:
                continue
            cur = self.heavy.get(v)
            if cur is None or e > cur:
                self.heavy[v] = int(e)
        self._truncate_heavy()

    def _truncate_heavy(self) -> None:
        if len(self.heavy) > 4 * self.track_heavy:
            top = sorted(self.heavy.items(), key=lambda kv: (-kv[1], kv[0]))
            self.heavy = dict(top[: 2 * self.track_heavy])

    def query(self, value) -> int:
        h1, h2 = hash_pair_batch([value], *self.seeds)
        idx = self._indices(h1, h2)
        return int(self.counts[np.arange(self.depth), idx[:, 0]].min())

    def query_batch(self, values) -> np.ndarray:
        h1, h2 = hash_pair_batch(values, *self.seeds)
        idx = self._indices(h1, h2)
        return self.counts[np.arange(self.depth)[:, None], idx].min(axis=0)

    def top_k(self, k: int | None = None) -> list[tuple[str, int]]:
        """Current heavy-hitter candidates re-scored against the full counts."""
        keys = list(self.heavy)
        if not keys:
            return []
        est = self.query_batch(keys)
        ranked = sorted(zip(keys, est.tolist()), key=lambda kv: (-kv[1], kv[0]))
        return ranked[: k or self.track_heavy or len(ranked)]

    def estimate(self) -> dict:
        return {"total": self.total, "top": self.top_k()}

    def _compat_key(self) -> tuple:
        return (self.kind, self.width, self.depth, self.seeds, self.hasher)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.check_compatible(other)
        self.counts += other.counts
        self.total += other.total
        if self.track_heavy or other.track_heavy:
            self.track_heavy = max(self.track_heavy, other.track_heavy)
            union = sorted(set(self.heavy) | set(other.heavy))
            est = self.query_batch(union) if union else []
            self.heavy = {k: int(e) for k, e in zip(union, est)}
            self._truncate_heavy()
        return self
