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

# order-free fingerprint mix: SplitMix64 finalizer over (node, member),
# summed mod 2^40 so any realistic partial count stays far below int64
_MIX_MOD = 1 << 40


def _mix_pairs(a: np.ndarray, b: np.ndarray) -> int:
    z = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    )
    z ^= z >> np.uint64(31)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(27)
    return int((z % np.uint64(_MIX_MOD)).sum())


def _label_fingerprint(labels) -> tuple[int, int]:
    """(row count, order-free mixed sum) of a (node, component) Dataset."""

    def partial(t: pa.Table) -> pa.Table:
        n = np.asarray(t["node"], dtype=np.int64)
        c = np.asarray(t["component"], dtype=np.int64)
        return pa.table(
            {"n": pa.array([len(n)], pa.int64()), "s": pa.array([_mix_pairs(n, c)], pa.int64())}
        )

    agg = labels.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum(["n", "s"])
    return (int(agg["sum(n)"] or 0), int(agg["sum(s)"] or 0))


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
        # O(log d) convergence; d ≤ n ≤ state rows. +4 absorbs the final
        # no-change confirmation round and tiny-graph constants.
        max_rounds = 2 * int(np.ceil(np.log2(n_rows + 2))) + 4

    prev_fp = None
    for _ in range(max_rounds):
        state = partitioned_group_apply(
            state, "node", _round_partition, num_partitions=num_partitions
        ).materialize()
        labels = partitioned_group_apply(
            state, "node", _labels_partition, num_partitions=num_partitions
        ).materialize()
        fp = _label_fingerprint(labels)
        if fp == prev_fp:
            return labels
        prev_fp = fp
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        f"({n_rows} initial membership rows) — the Hash-to-Min bound is "
        "O(log n) rounds, so this indicates a defect, not a hard graph"
    )
