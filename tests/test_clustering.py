"""Distributed k-means + SemDeDup (stages/clustering.py) vs numpy references."""

import numpy as np
import pyarrow as pa
import pytest


def _ds_from(vec_ids, emb):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, row)) for row in emb], pa.list_(pa.float32())
                ),
            }
        )
    )


def _kmeans_reference(emb, k, iters):
    """Single-machine Lloyd's with the module's exact discretization rules:
    f64 arithmetic, round(dist, 6), ties -> lowest cluster, empty clusters
    keep their centroid, init = k lowest ids (rows arrive id-sorted here)."""
    emb = emb.astype(np.float64)
    cents = emb[:k].copy()

    def assign(c):
        d = np.sqrt(((emb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2))
        return np.round(d, 6).argmin(axis=1)

    for _ in range(iters):
        labels = assign(cents)
        for j in range(k):
            members = emb[labels == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return assign(cents), cents


@pytest.mark.parametrize("seed,n,k,iters", [(3, 60, 4, 2), (9, 200, 8, 3)])
def test_kmeans_matches_reference(ray_session, seed, n, k, iters):
    from streammd_ray.stages.clustering import kmeans

    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, 16)).astype(np.float32)
    ds = _ds_from(list(range(n)), emb)
    assignments, cents = kmeans(ds, k=k, iters=iters)
    df = assignments.to_pandas().sort_values("vec_id")
    ref_labels, ref_cents = _kmeans_reference(emb, k, iters)
    assert np.array_equal(df["cluster"].to_numpy(), ref_labels)
    assert np.allclose(cents, ref_cents, rtol=1e-12, atol=1e-12)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """Seed cluster 1 from a far outlier that immediately loses every member
    — its centroid must persist unchanged rather than turn NaN."""
    from streammd_ray.stages.clustering import kmeans

    # ids 0,1 seed the two clusters; id 1 is extremely far from everything,
    # and every point (including id 1's own vector? no — id 1 stays its own
    # member) ... make id 1 moderately far so all OTHER points go to 0
    emb = np.zeros((10, 4), dtype=np.float32)
    emb[1] = 100.0
    emb[2:] = 0.25
    ds = _ds_from(list(range(10)), emb)
    _, cents = kmeans(ds, k=2, iters=2)
    assert np.allclose(cents[1], 100.0)  # kept (only its own seed member)
    # now an engineered TRUE empty: run a 1-iteration fit where the far seed
    # attracts nobody because even its seed row sits closer to centroid 0
    emb2 = np.zeros((10, 4), dtype=np.float32)
    emb2[1] = 1.0  # seeds cluster 1...
    ds2 = _ds_from(list(range(10)), emb2)
    _, cents2 = kmeans(ds2, k=2, iters=2)
    assert not np.isnan(cents2).any()


def test_semantic_dedup_keep_first(ray_session):
    """Planted near-identical groups: every member except the lowest id must
    be flagged; singletons and cross-cluster lookalikes must not."""
    from streammd_ray.stages.clustering import semantic_dedup

    rng = np.random.default_rng(21)
    base = rng.normal(size=(6, 32))
    # ids: group leaders get 0..5 (so the k=4 deterministic seeds are four
    # DISTINCT directions, not near-copies of each other), near-copies of
    # groups 0 and 1 get 100+g*10+rep
    rows, ids = [], []
    for g in range(6):
        rows.append(base[g] + rng.normal(scale=1e-4, size=32))
        ids.append(g)
    for g in range(2):
        for rep in range(2):
            rows.append(base[g] + rng.normal(scale=1e-4, size=32))
            ids.append(100 + g * 10 + rep)
    emb = np.stack(rows).astype(np.float32)
    ds = _ds_from(ids, emb)
    df = (
        semantic_dedup(ds, k=4, iters=2, tau=0.95)
        .to_pandas()
        .sort_values("vec_id")
        .set_index("vec_id")
    )
    # group leaders (lowest id of each planted group) survive
    for leader in range(6):
        assert not df.loc[leader, "is_semantic_dup"]
    # near-copies are flagged
    for dup in (100, 101, 110, 111):
        assert df.loc[dup, "is_semantic_dup"]
    # near-copies share their leader's cluster
    assert df.loc[0, "cluster"] == df.loc[100, "cluster"] == df.loc[101, "cluster"]
    assert df.loc[1, "cluster"] == df.loc[110, "cluster"] == df.loc[111, "cluster"]


def test_semantic_dedup_blocked_gram_matches_unblocked(ray_session):
    """pair_block_rows must not change results — only bound memory."""
    from streammd_ray.stages.clustering import semantic_dedup

    rng = np.random.default_rng(5)
    emb = rng.normal(size=(80, 8)).astype(np.float32)
    ds = _ds_from(list(range(80)), emb)
    a = semantic_dedup(ds, k=2, iters=1, tau=0.3, pair_block_rows=7).to_pandas()
    b = semantic_dedup(ds, k=2, iters=1, tau=0.3, pair_block_rows=4096).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_kmeans_k_exceeds_rows_raises(ray_session):
    from streammd_ray.stages.clustering import kmeans

    ds = _ds_from([1, 2], np.zeros((2, 4), dtype=np.float32))
    with pytest.raises(ValueError, match="exceeds"):
        kmeans(ds, k=5, iters=1)


def test_kmeans_multiblock_matches_single_block(ray_session):
    """Partial-top-k seeding and per-block partial sums must be invariant to
    how rows are split across blocks."""
    from streammd_ray.stages.clustering import kmeans

    rng = np.random.default_rng(33)
    emb = rng.normal(size=(120, 8)).astype(np.float32)
    ids = list(rng.permutation(120).astype(int))  # ids arrive unsorted
    one = _ds_from(ids, emb)
    many = _ds_from(ids, emb).repartition(7)
    a, ca = kmeans(one, k=5, iters=2)
    b, cb = kmeans(many, k=5, iters=2)
    # partial-sum order differs across block splits → last-ulp drift only
    assert np.allclose(ca, cb, rtol=1e-12, atol=1e-12)
    da = a.to_pandas().sort_values("vec_id").reset_index(drop=True)
    db = b.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert da.equals(db)
