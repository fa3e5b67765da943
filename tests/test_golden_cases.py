"""Golden-pair conformance corpus (FIXTURES.md F2) — handwritten mini-cases
with expected per-row is_duplicate labels and metrics, compared key-wise on
(conv_id, turn_idx) exactly like the reference's (qname,rname,pos)→FLAG map
compare (/root/reference/tests/test_util.cxx:12-21, behaviour only).

Each case runs through BOTH engines: the sharded-Bloom pipeline (counts +
order-independent label sets) and the exact-first path (row-exact labels).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from streammd_ray.pipelines import compute_metrics, mark_duplicates
from streammd_ray.stages import dedup_exact_first


def _case(rows):
    """rows: list of (conv_id, turn_idx, text, expected_dup)"""
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "want"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["role"] = "user"
    df["tool"] = None
    df["ts"] = pd.to_datetime("2025-01-01") + pd.to_timedelta(
        np.arange(len(df)), unit="s"
    )
    return df


CASES = {
    # no duplicates at all
    "no_dups": _case([("c1", 0, "a", False), ("c1", 1, "b", False), ("c2", 0, "c", False)]),
    # all rows one key: first kept
    "all_dups": _case([("c1", 0, "x", False), ("c1", 1, "x", True), ("c2", 0, "x", True)]),
    # first-vs-last ordering: order-min wins, not file order
    "first_by_order": _case([("c2", 0, "k", True), ("c1", 5, "k", True), ("c1", 2, "k", False)]),
    # null text: counted, never marked
    "null_text": _case([("c1", 0, None, False), ("c1", 1, None, False), ("c1", 2, "a", False)]),
    # cross-conversation duplicate
    "cross_conv": _case([("c1", 0, "z", False), ("c9", 3, "z", True)]),
    # single-turn conversations
    "singletons": _case([(f"c{i}", 0, f"t{i}", False) for i in range(6)]),
    # empty string is a real key, distinct from null
    "empty_vs_null": _case([("c1", 0, "", False), ("c1", 1, None, False), ("c1", 2, "", True)]),
    # unicode + whitespace sensitivity (keys are exact bytes)
    "unicode_exact": _case([("c1", 0, "héllo", False), ("c1", 1, "héllo ", False), ("c1", 2, "héllo", True)]),
    # interleaved keys
    "interleaved": _case([("c1", 0, "a", False), ("c1", 1, "b", False), ("c1", 2, "a", True), ("c1", 3, "b", True), ("c1", 4, "c", False)]),
    # long texts (key derivation over multi-KB values)
    "long_text": _case([("c1", 0, "lorem " * 2000, False), ("c2", 0, "lorem " * 2000, True), ("c3", 0, "ipsum " * 2000, False)]),
}


def _ds(df: pd.DataFrame):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return rd.from_arrow(pa.Table.from_pandas(df[cols], preserve_index=False))


@pytest.mark.parametrize("name", sorted(CASES))
def test_exact_first_golden(ray_session, name):
    df = CASES[name]
    out = (
        dedup_exact_first(_ds(df))
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])["is_duplicate"]
    )
    want = df.set_index(["conv_id", "turn_idx"])["want"]
    got = out.reindex(want.index)
    assert got.tolist() == want.tolist(), (name, got, want)


@pytest.mark.parametrize("name", sorted(CASES))
def test_bloom_golden_counts(ray_session, name):
    df = CASES[name]
    res = mark_duplicates(_ds(df), p=1e-9, num_shards=2, materialize=True)
    m = compute_metrics(res.marked)
    assert m["TURNS"] == len(df)
    assert m["TURNS_NULL_TEXT"] == int(df["text"].isna().sum())
    assert m["TURNS_MARKED_DUPLICATE"] == int(df["want"].sum()), name
    assert m["CONVERSATIONS"] == df["conv_id"].nunique()
    # per-key invariant: exactly one unmarked row per distinct non-null text
    got = res.marked.to_pandas()
    nn = got[got["text"].notna()]
    assert (nn.groupby("text")["is_duplicate"].agg(lambda s: (~s).sum()) == 1).all()
