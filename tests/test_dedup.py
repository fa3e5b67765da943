"""Dedup pipelines: bloom-marked output vs generator ground truth and vs the
exact-dedup oracle — the engine's analog of the reference's golden-file
conformance (SURVEY.md §5 layers 3-4; acceptance criteria §7.4)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from streammd_ray.pipelines import CapacityExceeded, compute_metrics, mark_duplicates
from streammd_ray.sources import generate_transcripts
from streammd_ray.stages import dedup_exact_first


@pytest.fixture(scope="module")
def fixture_table(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("transcripts"))
    paths, truth = generate_transcripts(
        out, n_turns=20_000, seed=17, dup_frac=0.3, null_frac=0.03, return_truth=True
    )
    return out, truth.to_pandas()


def _labels(df: pd.DataFrame) -> pd.Series:
    return df.sort_values(["conv_id", "turn_idx"]).set_index(["conv_id", "turn_idx"])[
        "is_duplicate"
    ]


def test_bloom_mark_counts_match_truth(ray_session, fixture_table):
    """Arrival order varies, but the *set* sizes are deterministic: exactly
    one survivor per distinct key ⇒ dup count == truth dup count (p tiny)."""
    path, truth = fixture_table
    res = mark_duplicates(rd.read_parquet(path), p=1e-9, num_shards=4)
    got = res.marked.to_pandas()
    assert len(got) == len(truth)
    assert got["is_duplicate"].sum() == truth["is_duplicate"].sum()
    # null texts are never marked
    assert not got.loc[got["text"].isna(), "is_duplicate"].any()
    # per-key invariant: every distinct text keeps exactly one non-dup row
    nn = got[got["text"].notna()]
    survivors = nn[~nn["is_duplicate"]].groupby("text").size()
    assert (survivors == 1).all()
    assert set(nn["text"]) == set(survivors.index)


def test_bloom_metrics(ray_session, fixture_table):
    path, truth = fixture_table
    res = mark_duplicates(rd.read_parquet(path), p=1e-9, num_shards=4, materialize=True)
    m = compute_metrics(res.marked)
    assert m["TURNS"] == len(truth)
    assert m["TURNS_NULL_TEXT"] == int(truth["text"].isna().sum())
    assert m["TURNS_MARKED_DUPLICATE"] == int(truth["is_duplicate"].sum())
    assert m["CONVERSATIONS"] == truth["conv_id"].nunique()
    denom = m["TURNS"] - m["TURNS_NULL_TEXT"]
    assert m["TURN_DUPLICATE_FRACTION"] == round(m["TURNS_MARKED_DUPLICATE"] / denom, 4)


def test_exact_first_matches_truth_rowwise(ray_session, fixture_table):
    """dedup_exact_first is fully deterministic: row-level labels equal the
    generator's first-seen-wins ground truth."""
    path, truth = fixture_table
    out = dedup_exact_first(rd.read_parquet(path)).to_pandas()
    got, want = _labels(out), _labels(truth)
    assert got.equals(want)


def test_remove_duplicates(ray_session, fixture_table):
    path, truth = fixture_table
    res = mark_duplicates(
        rd.read_parquet(path), p=1e-9, num_shards=4, remove_duplicates=True
    )
    kept = res.dataset.to_pandas()
    n_nonnull_distinct = truth.loc[truth["text"].notna(), "text"].nunique()
    n_null = int(truth["text"].isna().sum())
    assert len(kept) == n_nonnull_distinct + n_null
    assert not kept["is_duplicate"].any()


def test_strip_previous_semantics(ray_session, tmp_path):
    """Pre-marked non-duplicates: kept marked by default, cleared with
    strip_previous (reference src/markdups.cxx:126-130 behaviour)."""
    import pyarrow as pa

    rows = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "turn_idx": np.arange(4, dtype=np.int32),
            "role": ["user"] * 4,
            "text": ["a", "b", "a", "c"],
            "tool": [None] * 4,
            "ts": pd.to_datetime(["2025-01-01"] * 4),
            # rows 1 ('b') and 3 ('c') carry stale marks; row 2 is a real dup
            "is_duplicate": [False, True, False, True],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(rows, preserve_index=False))
    # default: stale marks survive, real dup added
    res = mark_duplicates(ds, p=1e-9, num_shards=2)
    got = res.marked.to_pandas().sort_values("turn_idx")["is_duplicate"].tolist()
    assert got == [False, True, True, True]
    # strip_previous: only the real dup stays marked
    ds2 = rd.from_arrow(pa.Table.from_pandas(rows, preserve_index=False))
    res2 = mark_duplicates(ds2, p=1e-9, num_shards=2, strip_previous=True)
    got2 = res2.marked.to_pandas().sort_values("turn_idx")["is_duplicate"].tolist()
    assert got2 == [False, False, True, False]


def test_scope_conversation(ray_session):
    """Per-conversation scope: same text in two conversations is NOT a dup;
    within one conversation it is."""
    import pyarrow as pa

    rows = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": np.array([0, 1, 0, 1], dtype=np.int32),
            "role": ["user"] * 4,
            "text": ["same", "same", "same", "other"],
            "tool": [None] * 4,
            "ts": pd.to_datetime(["2025-01-01"] * 4),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(rows, preserve_index=False))
    res = mark_duplicates(ds, p=1e-9, num_shards=2, scope="conversation")
    got = res.marked.to_pandas().sort_values(["conv_id", "turn_idx"])
    assert got["is_duplicate"].tolist() == [False, True, False, False]


def test_capacity_guard(ray_session):
    import pyarrow as pa

    n = 5000
    rows = pd.DataFrame(
        {
            "conv_id": ["c"] * n,
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": ["user"] * n,
            "text": [f"t{i}" for i in range(n)],
            "tool": [None] * n,
            "ts": pd.to_datetime(["2025-01-01"] * n),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(rows, preserve_index=False))
    res = mark_duplicates(ds, p=1e-3, total_capacity=2048, num_shards=2)
    res.marked.materialize()
    with pytest.raises(CapacityExceeded):
        res.check_capacity()
    report = res.check_capacity(allow_overcapacity=True)
    assert report["overcapacity_shards"] == 2
    assert report["max_marginal_fpr"] > 1e-3


def test_merged_filter_estimates(ray_session, fixture_table):
    path, truth = fixture_table
    res = mark_duplicates(rd.read_parquet(path), p=1e-6, num_shards=4)
    res.marked.materialize()
    merged = res.merged_filter()
    true_distinct = truth.loc[truth["text"].notna(), "text"].nunique()
    assert abs(merged.count_estimate() - true_distinct) / true_distinct < 0.02


def test_validate_conversations(ray_session):
    import pyarrow as pa

    from streammd_ray.stages import ConversationValidationError, validate_conversations

    good = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": np.array([0, 1, 0], dtype=np.int32),
            "role": ["user"] * 3,
            "text": ["a", "b", "c"],
            "tool": pd.array([None] * 3, dtype="string"),
            "ts": pd.to_datetime(["2025-01-01", "2025-01-02", "2025-01-01"]),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(good, preserve_index=False))
    validate_conversations(ds)  # no raise

    bad = good.copy()
    bad.loc[1, "turn_idx"] = 5  # gap
    ds2 = rd.from_arrow(pa.Table.from_pandas(bad, preserve_index=False))
    with pytest.raises(ConversationValidationError, match="contiguous"):
        validate_conversations(ds2)

    bad2 = good.copy()
    bad2.loc[1, "ts"] = pd.Timestamp("2024-01-01")  # ts regression
    ds3 = rd.from_arrow(pa.Table.from_pandas(bad2, preserve_index=False))
    with pytest.raises(ConversationValidationError, match="monotone"):
        validate_conversations(ds3)


def test_exact_first_strategies_equivalent(ray_session, fixture_table):
    """'join' (two slim exchanges + payload join), 'partition' (one payload
    shuffle), and 'groups' (per-group reference) must agree cell-for-cell,
    INCLUDING dtypes — the driver's schema hash sees any divergence."""
    path, _ = fixture_table
    outs = {}
    for s in ("join", "partition", "groups"):
        df = dedup_exact_first(rd.read_parquet(path), strategy=s).to_pandas()
        cols = sorted(df.columns)
        outs[s] = (
            df[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
    assert outs["join"].dtypes.equals(outs["partition"].dtypes)
    assert outs["join"].equals(outs["partition"])
    assert outs["join"].equals(outs["groups"])
