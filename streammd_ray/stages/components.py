"""Distributed connected components over a near-duplicate pair graph.

The missing step between "near-dup PAIRS" and "deduplicated CORPUS": LSH /
Jaccard verification emits edges (id_a, id_b); removal needs one survivor
per connected COMPONENT (a 3-doc cluster A~B~C must keep exactly one doc
even when the pair (A, C) itself was never emitted). Union-find is the
single-machine answer; this module implements the distributed one —
**Hash-to-Min** (Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013): every node v carries a
cluster set C_v (initially its neighborhood); per round each v sends C_v to
its minimum member m and {m} to every other member. Converges in O(log d)
rounds (d = largest component diameter) with total communication
O(log n · |C|); on near-dup graphs — overwhelmingly small dense clusters —
it converges in 2-3 rounds.

Ray-Data-first shape (SURVEY.md custom-operator rule):

- State is a Dataset of (node, member) int64 pairs — EDGE-table sized, never
  corpus-sized: only documents that appear in a near-dup pair enter the
  loop. At 100 TB the corpus streams once through LSH; this loop touches
  only the (much smaller) pair graph.
- Each round is ONE hash shuffle of that pair table
  (:func:`..windows.partitioned_group_apply` — every (node, *) row lands in
  one partition, the per-partition kernel is pure numpy lexsort/reduceat
  across ALL groups at once, no per-node Python).
- Convergence is detected from a LABEL FINGERPRINT (count + order-free
  mixed sum of (node, min-member) pairs, computed as per-batch partials and
  Sum-aggregated) — the driver holds two integers per round, never the
  labels.
- Survivor assignment back onto the corpus is a hash join (doc stream ⋈
  small label table), not a broadcast: on web-scale corpora 30-50% of docs
  can sit in some component, so the label table is only *relatively* small.

Reference parity note: the reference engine (streammd) has no fuzzy-dedup
analog — its dedup is exact-key only (src/markdups.cxx process_qname_group);
this operator extends the engine-native dedup family (SURVEY.md §2.8/§2.10)
the way Lee et al. 2022 / SlimPajama-style pipelines compose MinHash-LSH →
components → keep-one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .windows import partitioned_group_apply

# Order-free fingerprint: TWO independent 64-bit mixes over (node, member)
# (SplitMix64-style and Murmur3-fmix-style finalizer constants), each summed
# EXACTLY per batch (32-bit-halves trick — no uint64 wrap for < 2^31 rows,
# far above any Arrow batch) and reduced mod a prime. A single 40-bit sum
# could collide silently at web scale; count + two independent 42-bit sums
# give ~2^-84 per-round collision probability. The modulus is the largest
# prime below 2^42 so each per-batch partial < 2^42 and Ray's int64 Sum
# stays exact for up to 2^21 (~2M) blocks — orders of magnitude above any
# real label table's block count.
_FP_MOD = (1 << 42) - 11  # largest prime < 2^42


def _mix_pairs(a: np.ndarray, b: np.ndarray, c1: int, c2: int, c3: int) -> int:
    z = (a.astype(np.uint64) * np.uint64(c1)) ^ (b.astype(np.uint64) * np.uint64(c2))
    z ^= z >> np.uint64(31)
    z *= np.uint64(c3)
    z ^= z >> np.uint64(27)
    # exact sum of uint64 values via 32-bit halves (each half-sum fits int64
    # for < 2^31 rows — far above any Arrow batch), then one Python-int mod
    lo = int((z & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
    hi = int((z >> np.uint64(32)).sum(dtype=np.uint64))
    return (lo + (hi << 32)) % _FP_MOD


def _label_fingerprint(labels) -> tuple[int, int, int]:
    """(row count, two independent order-free mixed sums) of a
    (node, component) Dataset. Equal fingerprints across rounds are treated
    as label-set equality; see the collision-probability note above."""

    def partial(t: pa.Table) -> pa.Table:
        n = np.asarray(t["node"], dtype=np.int64)
        c = np.asarray(t["component"], dtype=np.int64)
        s1 = _mix_pairs(n, c, 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB)
        s2 = _mix_pairs(n, c, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D)
        return pa.table(
            {
                "n": pa.array([len(n)], pa.int64()),
                "s1": pa.array([s1], pa.int64()),
                "s2": pa.array([s2], pa.int64()),
            }
        )

    agg = labels.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum(["n", "s1", "s2"])
    return (
        int(agg["sum(n)"] or 0),
        int(agg["sum(s1)"] or 0) % _FP_MOD,
        int(agg["sum(s2)"] or 0) % _FP_MOD,
    )


def _dedupe_groups(df: pd.DataFrame):
    """Partition frame → deduped (v, x) arrays + per-group starts/counts."""
    v = df["node"].to_numpy(np.int64)
    x = df["member"].to_numpy(np.int64)
    o = np.lexsort((x, v))
    v, x = v[o], x[o]
    keep = np.ones(len(v), dtype=bool)
    keep[1:] = (v[1:] != v[:-1]) | (x[1:] != x[:-1])
    v, x = v[keep], x[keep]
    starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]]) if len(v) else np.empty(0, np.int64)
    counts = np.diff(np.r_[starts, len(v)]) if len(v) else np.empty(0, np.int64)
    return v, x, starts, counts


def _round_partition(df: pd.DataFrame) -> pd.DataFrame:
    """One Hash-to-Min round over a complete-groups partition: per node v
    with members C_v, m = min(C_v ∪ {v}); emit (x, m) for every x ∈ C_v ∪
    {v} and (m, x) for every x ∈ C_v ∪ {v}. Pure numpy across all groups."""
    v, x, starts, counts = _dedupe_groups(df)
    if not len(v):
        return pd.DataFrame({"node": v, "member": x})
    vg = v[starts]
    m = np.minimum(np.minimum.reduceat(x, starts), vg)
    mrep = np.repeat(m, counts)
    node = np.concatenate([x, mrep, vg, m])
    member = np.concatenate([mrep, x, m, vg])
    # local dedupe before the shuffle (the next round's partition pass
    # finishes the global dedupe — all rows of a node meet there)
    o = np.lexsort((member, node))
    node, member = node[o], member[o]
    keep = np.ones(len(node), dtype=bool)
    keep[1:] = (node[1:] != node[:-1]) | (member[1:] != member[:-1])
    return pd.DataFrame({"node": node[keep], "member": member[keep]})


def _labels_partition(df: pd.DataFrame) -> pd.DataFrame:
    v, x, starts, _ = _dedupe_groups(df)
    if not len(v):
        return pd.DataFrame({"node": v, "component": x})
    vg = v[starts]
    return pd.DataFrame(
        {"node": vg, "component": np.minimum(np.minimum.reduceat(x, starts), vg)}
    )


def connected_components(
    edges,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int = 64,
    max_rounds: int | None = None,
):
    """Hash-to-Min connected components over an undirected edge Dataset.

    Returns a Dataset of (node, component) int64 rows, one per node that
    appears in ≥1 edge; ``component`` is the minimum node id of the node's
    connected component. Nodes absent from every edge are their own
    singleton components — callers join this table back and coalesce
    (:func:`near_dup_components` does exactly that).
    """

    def init(t: pa.Table) -> pa.Table:
        a = np.asarray(t[id_a], dtype=np.int64)
        b = np.asarray(t[id_b], dtype=np.int64)
        # symmetric neighborhoods + self-membership
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b, a, b]), pa.int64()),
                "member": pa.array(np.concatenate([b, a, a, b]), pa.int64()),
            }
        )

    state = edges.map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    n_rows = state.count()
    if n_rows == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
            )
        )
    if max_rounds is None:
        # Hash-to-Min is proven O(log n) rounds but only with constants —
        # Rastogi et al. show 4·log n on path graphs — so budget generously:
        # near-dup graphs converge in 2-3 rounds and unused budget is free,
        # while a tight bound risks aborting a legitimately hard topology.
        max_rounds = 4 * int(np.ceil(np.log2(n_rows + 2))) + 8

    from ..context import drop_empty_blocks

    # empty partitions of the per-partition label kernel yield SCHEMA-LESS
    # pandas blocks; whether one reaches a downstream consumer (e.g. the
    # corpus join in q_fuzzy_dedup_components) is scheduling-dependent — a
    # rare flake seen once in ~10 suite runs. Strip them at the source so
    # every consumer sees the (node, component) schema unconditionally.
    _label_schema = pa.schema([("node", pa.int64()), ("component", pa.int64())])

    prev_fp = None
    labels = None
    for _ in range(max_rounds):
        state = partitioned_group_apply(
            state, "node", _round_partition, num_partitions=num_partitions
        ).materialize()
        labels = drop_empty_blocks(
            partitioned_group_apply(
                state, "node", _labels_partition, num_partitions=num_partitions
            ),
            empty_schema=_label_schema,
        ).materialize()
        fp = _label_fingerprint(labels)
        if fp == prev_fp:
            return labels
        prev_fp = fp
    # Budget exhausted on an adversarial topology: return the best labels
    # with a loud warning rather than abort — the caller may still find them
    # converged (the fingerprint only PROVES stability when it repeats).
    import warnings

    warnings.warn(
        f"connected_components did not provably converge in {max_rounds} "
        f"rounds ({n_rows} initial membership rows); returning the last "
        "round's labels — verify component stability before relying on them",
        RuntimeWarning,
        stacklevel=2,
    )
    return labels
