"""Distributed embedding clustering + SemDeDup-style semantic dedup.

Implements the pipeline of Abbas et al. 2023 ("SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): k-means over the
corpus embedding column, then *within-cluster* pairwise cosine similarity to
mark semantic duplicates — the clustering step is exactly what makes
pairwise similarity tractable at web scale (O(n·m) with m = cluster size
instead of O(n^2) over the corpus).

Reference parity note: the reference engine (streammd) has no embedding
operators at all — its dedup is exact-key Bloom marking only
(src/markdups.cxx process_qname_group); this module extends the engine's
near-dup family (SURVEY.md §2.8) with the canonical ITERATIVE pattern the
catalog otherwise lacks: a fixed-point loop of broadcast → assign →
partial-aggregate → tiny driver update.

Ray-Data-first shape, and how it scales to 10^12 rows:

- **Centroids are broadcast, never joined.** Each iteration `ray.put`s the
  (k × dim) float64 centroid matrix ONCE; every assignment batch reads it
  zero-copy from the object store. No shuffle of the embedding table for
  assignment.
- **The update is a combiner.** Per batch the assign stage emits at most k
  partial rows (cluster, count, per-dimension sums flattened to columns),
  so the `groupby("cluster").sum(...)` that produces new centroids moves
  O(blocks × k × dim) bytes — independent of row count.
- **Iterations re-execute the (column-pruned) read.** The embedding table
  is NOT materialized between iterations: each pass streams from Parquet
  again. At petabyte scale, persist the projected (id, embedding) once via
  ``state.stages.StageCheckpoint`` and iterate over that instead; the
  iteration count is small and fixed, so re-reads are the cheaper default
  below that scale.
- **Within-cluster pairwise is partition-local.** The final dedup pass
  hash-partitions on the cluster label (`windows.partitioned_group_apply`)
  and computes the gram matrix per cluster in row-blocks of
  ``pair_block_rows`` so memory stays O(block × m), never O(m^2) floats at
  once. SemDeDup's premise — choose k so n/k is modest — bounds m.

Cross-engine determinism (the SQL-oracle contract, pipelines/queries.py
``sql_semdedup``): embeddings are cast to float64 BEFORE any arithmetic
(float32 → float64 is exact, so both engines see identical inputs),
distances and cosines are rounded to 6 decimals before comparison/argmin,
and argmin ties break toward the lowest cluster index — the same three
rules are expressed in the SQL twin, so assignments match exactly instead
of merely approximately.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .windows import partitioned_group_apply

# distances/cosines are rounded to this many decimals before any compare so
# the engine and the SQL oracle (different summation orders, ~1e-15 apart)
# make identical discrete decisions
ROUND_DECIMALS = 6


def _embedding_matrix(col, dim: int | None = None) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix (exact f32→f64 cast)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    if n == 0:
        return flat.reshape(0, dim or 0)
    d = dim or len(flat) // n
    return flat.reshape(n, d)


# cap on the (rows × k × dim) float64 difference tensor one _assign slice
# may allocate (~256 MB); rows are chunked to respect it, so realistic
# SemDeDup cluster counts (k ~ 10^4) cannot blow a worker heap
_ASSIGN_TENSOR_ELEMS = 32_000_000


def _assign(emb: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(rounded Euclidean distance, argmin cluster) per row; ties → lowest
    cluster index (np.argmin takes the first minimum)."""
    n = len(emb)
    k, dim = centroids.shape
    dist = np.empty(n, dtype=np.float64)
    labels = np.empty(n, dtype=np.int64)
    step = max(1, _ASSIGN_TENSOR_ELEMS // max(1, k * dim))
    for s in range(0, n, step):
        e = emb[s : s + step]
        # direct (x - c)^2 per element — same per-element squares the SQL
        # twin's list_distance computes, so 6-decimal rounding aligns both
        diff = e[:, None, :] - centroids[None, :, :]
        d = np.sqrt(np.einsum("bkd,bkd->bk", diff, diff))
        d = np.round(d, ROUND_DECIMALS)
        lab = d.argmin(axis=1)
        labels[s : s + step] = lab
        dist[s : s + step] = d[np.arange(len(lab)), lab]
    return dist, labels


def _init_centroids(ds, *, col: str, id_col: str, k: int) -> np.ndarray:
    """Deterministic seeding: the embeddings of the k smallest ids, ordered
    by id — cluster j is seeded from the (j+1)-th smallest id. Scale shape:
    a per-batch partial top-k first (each block emits ≤ k rows), so the
    global sort ranks only blocks×k rows instead of shuffling the corpus."""

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        if len(ids) <= k:
            return t
        idx = np.argpartition(ids, k)[:k]
        return t.take(pa.array(np.sort(idx)))

    rows = (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(id_col)
        .limit(k)
        .take_all()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the {len(rows)} available rows")
    return np.stack([np.asarray(r[col], dtype=np.float64) for r in rows])


def kmeans(
    ds,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
):
    """Fixed-iteration Lloyd's k-means over an embedding column.

    Returns ``(assignments, centroids)``: a Dataset of
    (id_col, cluster:int32, dist:float64) rows — the assignment against the
    FINAL centroids — and the (k, dim) float64 centroid matrix. Clusters
    that lose every member keep their previous centroid (same rule as the
    SQL twin's COALESCE).
    """
    import ray

    centroids = _init_centroids(ds, col=col, id_col=id_col, k=k)
    dim = centroids.shape[1]
    sum_cols = [f"s{j}" for j in range(dim)]

    for _ in range(iters):
        cref = ray.put(centroids)

        def partials(t: pa.Table, _cref=cref) -> pa.Table:
            import ray as _ray

            cents = _ray.get(_cref)
            emb = _embedding_matrix(t[col], dim)
            _, labels = _assign(emb, cents)
            out = {"cluster": pa.array(np.arange(k, dtype=np.int32), pa.int32())}
            counts = np.bincount(labels, minlength=k).astype(np.int64)
            out["n"] = pa.array(counts, pa.int64())
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, labels, emb)
            for j, name in enumerate(sum_cols):
                out[name] = pa.array(sums[:, j], pa.float64())
            return pa.table(out)

        agg = (
            ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("cluster")
            .sum(["n"] + sum_cols)
        ).to_pandas()
        agg = agg.sort_values("cluster")
        n = agg["sum(n)"].to_numpy(np.int64)
        sums = agg[[f"sum({c})" for c in sum_cols]].to_numpy(np.float64)
        new = centroids.copy()  # empty clusters keep their centroid
        nonempty = n > 0
        new[nonempty] = sums[nonempty] / n[nonempty, None]
        centroids = new

    cref = ray.put(centroids)

    def assign_final(t: pa.Table, _cref=cref) -> pa.Table:
        import ray as _ray

        cents = _ray.get(_cref)
        emb = _embedding_matrix(t[col], dim)
        dist, labels = _assign(emb, cents)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(labels.astype(np.int32), pa.int32()),
                "dist": pa.array(dist, pa.float64()),
            }
        )

    return (
        ds.map_batches(assign_final, batch_format="pyarrow", zero_copy_batch=True),
        centroids,
    )


def semantic_dedup(
    ds,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    tau: float = 0.5,
    num_partitions: int = 16,
    pair_block_rows: int = 1024,
):
    """SemDeDup: k-means, then mark every row whose cosine similarity to a
    LOWER-id member of the SAME cluster is ≥ tau (keep-first, the same
    survivor rule as exact dedup). Returns a Dataset of
    (id_col, cluster:int32, is_semantic_dup:bool).
    """

    _, centroids = kmeans(ds, col=col, id_col=id_col, k=k, iters=iters)
    dim = centroids.shape[1]

    import ray

    # ship (id, cluster, embedding) into cluster partitions: the embedding
    # must meet its cluster-mates somewhere, so this shuffle is inherent to
    # the algorithm; it moves dim×8 bytes/row exactly once
    cref = ray.put(centroids)

    def assign_with_embedding(t: pa.Table, _cref=cref) -> pa.Table:
        import ray as _ray

        cents = _ray.get(_cref)
        emb = _embedding_matrix(t[col], dim)
        _, labels = _assign(emb, cents)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(labels.astype(np.int32), pa.int32()),
                col: t[col],
            }
        )

    with_cluster = ds.map_batches(
        assign_with_embedding, batch_format="pyarrow", zero_copy_batch=True
    )

    def mark_cluster(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cluster, g in df.groupby("cluster", sort=False):
            g = g.sort_values(id_col, kind="stable")
            emb = np.stack([np.asarray(e, dtype=np.float64) for e in g[col]])
            norms = np.sqrt((emb * emb).sum(axis=1))
            norms[norms == 0] = 1.0
            unit = emb / norms[:, None]
            m = len(unit)
            dup = np.zeros(m, dtype=bool)
            cols = np.arange(m)
            # row-blocked gram products: O(block × m) memory, never m^2
            for s in range(0, m, pair_block_rows):
                e = min(s + pair_block_rows, m)
                sims = np.round(unit[s:e] @ unit.T, ROUND_DECIMALS)
                # only strictly-earlier (lower-id) members count as "seen"
                earlier = cols[None, :] < np.arange(s, e)[:, None]
                dup[s:e] = ((sims >= tau) & earlier).any(axis=1)
            out.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "cluster": np.full(m, cluster, dtype=np.int32),
                        "is_semantic_dup": dup,
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=np.int64),
                    "cluster": pd.Series(dtype=np.int32),
                    "is_semantic_dup": pd.Series(dtype=bool),
                }
            )
        return pd.concat(out, ignore_index=True)

    return partitioned_group_apply(
        with_cluster, "cluster", mark_cluster, num_partitions=num_partitions
    )
