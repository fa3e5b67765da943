"""t-digest — quantile sketch (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests", 2019). Merging-digest variant.

Role in the engine: turn-length and latency quantiles over 10^12 turns.
Centroids are kept sorted by mean; a centroid at quantile position q may hold
at most the weight allowed by the k1 scale function
k(q) = (δ/2π)·asin(2q−1), which concentrates resolution at the tails.
Merge = concatenate centroid lists + recompress — associative within the
published accuracy envelope (estimates from different merge orders agree to
within the digest's quantile error, property-tested).

Implementation is numpy-vectorized: values are buffered per batch and folded
into the centroid set with one sort + one greedy linear merge pass.
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch


class TDigest(Sketch):
    kind = "tdigest"

    def __init__(self, delta: float = 200.0, buffer_size: int = 65536):
        self.delta = float(delta)
        self.buffer_size = int(buffer_size)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.total = 0.0
        self.min = math.inf
        self.max = -math.inf
        self._buf: list[np.ndarray] = []
        self._buf_len = 0

    # --- scale function (k1) --------------------------------------------------

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * math.pi)) * np.arcsin(2.0 * np.clip(q, 0, 1) - 1.0)

    # --- inserts --------------------------------------------------------------

    def insert_batch(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            if len(w) != len(v):
                raise ValueError(
                    f"weights length {len(w)} != values length {len(v)}"
                )
            keep = ~np.isnan(v)
            v, w = v[keep], w[keep]
        else:
            v = v[~np.isnan(v)]
            w = None
        if v.size == 0:
            return
        pairs = np.stack([v, w if w is not None else np.ones_like(v)])
        self._buf.append(pairs)
        self._buf_len += v.size
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        if self._buf_len >= self.buffer_size:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            bm = np.concatenate([p[0] for p in self._buf])
            bw = np.concatenate([p[1] for p in self._buf])
            means = np.concatenate([self.means, bm])
            weights = np.concatenate([self.weights, bw])
            self._buf, self._buf_len = [], 0
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # greedy linear pass: grow current centroid while the k-size bound allows
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        q0 = 0.0
        k0 = float(self._k(np.array([0.0]))[0])
        klim = k0 + 1.0
        klim_arg = np.clip((2.0 * math.pi / self.delta) * klim, -math.pi / 2, math.pi / 2)
        qlim = float(0.5 * (math.sin(klim_arg) + 1.0))
        for i in range(1, means.size):
            proposed = cur_w + weights[i]
            if (w_so_far + proposed) / total <= qlim:
                cur_m += (means[i] - cur_m) * (weights[i] / proposed)
                cur_w = proposed
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                q0 = w_so_far / total
                k0 = float(self._k(np.array([q0]))[0])
                klim = k0 + 1.0
                klim_arg = np.clip((2.0 * math.pi / self.delta) * klim, -math.pi / 2, math.pi / 2)
                qlim = float(0.5 * (math.sin(klim_arg) + 1.0))
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)
        self.total = float(total)

    # --- queries --------------------------------------------------------------

    def quantile(self, q) -> float | np.ndarray:
        """Estimate the q-quantile(s), q in [0,1]."""
        self._compress()
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            out = np.full_like(qs, math.nan)
            return float(out[0]) if scalar else out
        w = self.weights
        cum = np.cumsum(w) - 0.5 * w  # centroid midpoints in cumulative weight
        targets = qs * self.total
        out = np.interp(targets, cum, self.means, left=self.min, right=self.max)
        out = np.clip(out, self.min, self.max)
        return float(out[0]) if scalar else out

    def cdf(self, x: float) -> float:
        self._compress()
        if self.means.size == 0:
            return math.nan
        if x <= self.min:
            return 0.0
        if x >= self.max:
            return 1.0
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        return float(np.interp(x, self.means, cum) / self.total)

    def estimate(self) -> dict:
        return {q: self.quantile(q) for q in (0.5, 0.9, 0.99)}

    # --- serde ----------------------------------------------------------------

    def __getstate__(self):
        # compress before pickling: a serialized partial is ~delta centroids
        # (a few KB), not the raw insert buffer (up to buffer_size floats) —
        # partials travel through the object store and driver merges
        self._compress()
        return self.__dict__

    # --- merge ----------------------------------------------------------------

    def _compat_key(self) -> tuple:
        return (self.kind, self.delta)

    def merge(self, other: "TDigest") -> "TDigest":
        self.check_compatible(other)
        other._compress()
        self._compress()
        if other.means.size:
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
            self.min = min(self.min, other.min)
            self.max = max(self.max, other.max)
            self._compress()
        return self
