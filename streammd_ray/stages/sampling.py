"""Deterministic sampling operators — seeded, engine-independent, and
therefore DuckDB-oracle-checkable (unlike ``Dataset.random_sample``, whose
row selection depends on task layout).

Rule: a row with integer key ``k`` is kept iff

    LCG(k + seed) < floor(rate · 2^64)

where ``LCG(x) = (x · 6364136223846793005 + 1442695040888963407) mod 2^64``
— Knuth's MMIX multiplicative constants (public domain, TAOCP Vol. 2). The
same arithmetic is expressible in ANSI SQL via 128-bit integers, so the Ray
filter and the SQL oracle select byte-identical row sets on any engine.

Both operators are one stateless ``map_batches`` filter over pruned columns:
no shuffle, no driver state, embarrassingly parallel at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LCG_MULT = 6364136223846793005
LCG_ADD = 1442695040888963407
TWO64 = 1 << 64


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * TWO64)


def _lcg_u64(keys: np.ndarray, seed: int) -> np.ndarray:
    x = keys.astype(np.uint64, copy=False) + np.uint64(seed)
    return x * np.uint64(LCG_MULT) + np.uint64(LCG_ADD)  # native mod-2^64 wrap


def sample_uniform(ds, *, rate: float, key_col: str, seed: int = 0):
    """Keep ~rate of rows, chosen deterministically by the keyed LCG rule."""
    thr_int = _threshold(rate)
    keep_all = thr_int >= TWO64  # rate == 1.0: threshold 2^64 overflows u64
    thr = np.uint64(min(thr_int, TWO64 - 1))

    def flt(t: pa.Table) -> pa.Table:
        if keep_all:
            return t
        keys = t[key_col].to_numpy(zero_copy_only=False)
        keep = _lcg_u64(keys, seed) < thr
        return t.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def sample_stratified(
    ds,
    *,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 0,
):
    """Per-stratum deterministic sampling: each row's keep-threshold comes
    from its stratum's configured rate (``default_rate`` otherwise). One
    vectorized pass — thresholds resolved via a per-batch dict lookup on the
    (few) distinct strata, applied with numpy, no per-row Python."""
    thr_map = {k: _threshold(v) for k, v in rates.items()}
    default_thr = _threshold(default_rate)

    def flt(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        strata = t[strata_col].to_numpy(zero_copy_only=False)
        # factorize the batch's strata (codes) then map each CODE once
        uniq, codes = np.unique(strata, return_inverse=True)
        thrs = [thr_map.get(u, default_thr) for u in uniq]
        # rate == 1.0 gives threshold 2^64, one past uint64 range: carry a
        # keep-all flag per code instead of overflowing
        keep_all = np.array([x >= TWO64 for x in thrs], dtype=bool)
        thr_per_code = np.array(
            [min(x, TWO64 - 1) for x in thrs], dtype=np.uint64
        )
        keep = (_lcg_u64(keys, seed) < thr_per_code[codes]) | keep_all[codes]
        return t.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def sample_sql_predicate(rate: float, key_col: str, seed: int = 0) -> str:
    """The identical keep-rule as ANSI SQL (DuckDB HUGEINT arithmetic).

    The key+seed sum is normalized into [0, 2^64) BEFORE the multiply —
    numpy's uint64 cast wraps negative int64 keys mod 2^64, and without the
    same normalization the SQL side would carry a negative value through the
    multiply and select different rows (ADVICE.md round 2). The normalized
    product peaks at (2^64)·MULT ≈ 2^126.5, inside HUGEINT's 2^127 − 1.
    """
    thr = _threshold(rate)
    norm = f"(((CAST({key_col} AS HUGEINT) + {seed}) % {TWO64} + {TWO64}) % {TWO64})"
    return (
        f"CAST(({norm} * {LCG_MULT} + {LCG_ADD}) % {TWO64} AS UBIGINT) < {thr}"
    )
