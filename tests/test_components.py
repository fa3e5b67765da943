"""Connected components (stages/components.py) vs a union-find reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _uf_reference(edges, nodes=None):
    """Plain union-find: {node: min-id of its component}."""
    parent = {}

    def find(a):
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for a in set(parent) | set(nodes or ()):
        out[a] = find(a) if a in parent else a
    return out


def _run(edges, ray_session, **kw):
    import ray.data as rd

    from streammd_ray.stages.components import connected_components

    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.int64()),
            "id_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    df = connected_components(rd.from_arrow(t), **kw).to_pandas()
    return dict(zip(df["node"].astype(int), df["component"].astype(int)))


CASES = [
    ("single_edge", [(1, 2)]),
    ("triangle", [(1, 2), (2, 3), (1, 3)]),
    ("transitive_no_direct_edge", [(10, 20), (20, 30)]),
    ("two_components", [(1, 2), (5, 6), (6, 7)]),
    # worst case for min-label propagation (O(n) rounds there): a chain —
    # hash-to-min must still converge within the O(log) budget
    ("chain_64", [(i, i + 1) for i in range(64)]),
    ("star", [(100, i) for i in range(50)]),
    ("self_loop", [(4, 4), (4, 5)]),
    ("duplicate_edges", [(1, 2), (1, 2), (2, 1)]),
    ("reversed_min", [(9, 3), (3, 7), (7, 1)]),
]


@pytest.mark.parametrize("edges", [c[1] for c in CASES], ids=[c[0] for c in CASES])
def test_components_match_union_find(ray_session, edges):
    assert _run(edges, ray_session, num_partitions=8) == _uf_reference(edges)


def test_components_empty(ray_session):
    import ray.data as rd

    from streammd_ray.stages.components import connected_components

    t = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    out = connected_components(rd.from_arrow(t))
    # Ray's to_pandas drops columns on a zero-row dataset; the schema is the
    # contract worth pinning here
    assert out.count() == 0
    assert [f.name for f in out.schema().base_schema] == ["node", "component"]


def test_components_random_graphs_property(ray_session):
    rng = np.random.default_rng(17)
    for trial in range(3):
        n = int(rng.integers(20, 120))
        m = int(rng.integers(0, 2 * n))
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
        ]
        assert _run(edges, ray_session, num_partitions=8) == _uf_reference(edges)


def test_components_round_budget_is_logarithmic(ray_session):
    """A 64-node chain (diameter 64) must converge inside the O(log) budget
    — this is the property that separates hash-to-min from naive min-label
    propagation, which needs 64 rounds here and would raise."""
    import ray.data as rd

    from streammd_ray.stages.components import connected_components

    edges = [(i, i + 1) for i in range(64)]
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.int64()),
            "id_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    # 2*ceil(log2(4*64+2))+4 = 22 rounds available; min-label needs 64+
    df = connected_components(rd.from_arrow(t), num_partitions=4).to_pandas()
    assert (df["component"] == 0).all() and len(df) == 65


def test_mix_pairs_exact_sum_and_bound():
    """_mix_pairs must equal an exact Python-int reference (no uint64 wrap,
    no float rounding) and every partial must sit below 2^42 so the int64
    Sum aggregate cannot overflow before ~2M blocks."""
    from streammd_ray.stages.components import _FP_MOD, _mix_pairs

    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**62, 100_000).astype(np.int64)
    b = rng.integers(0, 2**62, 100_000).astype(np.int64)
    c1, c2, c3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    M = 1 << 64

    def ref_one(x, y):
        z = ((x % M) * c1 % M) ^ ((y % M) * c2 % M)
        z ^= z >> 31
        z = z * c3 % M
        z ^= z >> 27
        return z

    expected = sum(ref_one(int(x) % M, int(y) % M) for x, y in zip(a, b)) % _FP_MOD
    got = _mix_pairs(a, b, c1, c2, c3)
    assert got == expected
    assert 0 <= got < _FP_MOD < (1 << 42)


def test_fingerprint_uses_two_independent_mixes(ray_session):
    """Two label tables engineered to collide under ONE SplitMix-sum would
    still differ in the second sum; assert the fingerprint is a 3-tuple and
    differs between genuinely different label sets of equal size."""
    import ray.data as rd

    from streammd_ray.stages.components import _label_fingerprint

    t1 = pa.table(
        {"node": pa.array([1, 2, 3], pa.int64()), "component": pa.array([1, 1, 1], pa.int64())}
    )
    t2 = pa.table(
        {"node": pa.array([1, 2, 3], pa.int64()), "component": pa.array([1, 1, 2], pa.int64())}
    )
    f1 = _label_fingerprint(rd.from_arrow(t1))
    f2 = _label_fingerprint(rd.from_arrow(t2))
    assert len(f1) == len(f2) == 3
    assert f1[0] == f2[0] == 3
    assert f1[1:] != f2[1:]
    # and both mixed sums changed — the two mixes are independent signals
    assert f1[1] != f2[1] and f1[2] != f2[2]


def test_components_budget_exhaustion_warns_not_raises(ray_session):
    """With an absurdly small round budget the operator must warn and return
    its best labels instead of aborting the whole job (round-4 advice)."""
    import warnings

    import ray.data as rd

    from streammd_ray.stages.components import connected_components

    edges = [(i, i + 1) for i in range(32)]
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.int64()),
            "id_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_components(rd.from_arrow(t), num_partitions=4, max_rounds=1)
    assert any("did not provably converge" in str(w.message) for w in caught)
    # best-effort labels still cover every node
    assert out.count() == 33
