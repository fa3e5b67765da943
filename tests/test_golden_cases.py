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


# ---------------------------------------------------------------------------
# round-2 conformance breadth (VERDICT.md "What's missing" #1)
# ---------------------------------------------------------------------------

CASES["all_null"] = _case(
    [("c1", 0, None, False), ("c2", 0, None, False), ("c3", 0, None, False)]
)


def test_scope_divergence_conversation_vs_global(ray_session):
    """The same text in two conversations: global scope marks the second
    occurrence duplicate, conversation scope marks neither — the documented
    semantic difference between the two key rules."""
    df = _case(
        [
            ("c1", 0, "same", False),
            ("c1", 1, "other", False),
            ("c2", 0, "same", True),  # global expectation
        ]
    )
    glob = (
        dedup_exact_first(_ds(df))
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])["is_duplicate"]
    )
    conv = (
        dedup_exact_first(_ds(df), key_cols=("text", "conv_id"))
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])["is_duplicate"]
    )
    assert glob.loc[("c2", 0)] == True  # noqa: E712
    assert conv.loc[("c2", 0)] == False  # noqa: E712
    assert not conv.any()

    # same divergence through the Bloom engine (count-level)
    m_glob = compute_metrics(
        mark_duplicates(_ds(df), p=1e-9, num_shards=2, materialize=True).marked
    )
    m_conv = compute_metrics(
        mark_duplicates(
            _ds(df), p=1e-9, num_shards=2, scope="conversation", materialize=True
        ).marked
    )
    assert m_glob["TURNS_MARKED_DUPLICATE"] == 1
    assert m_conv["TURNS_MARKED_DUPLICATE"] == 0


@pytest.mark.parametrize("strip", [False, True])
@pytest.mark.parametrize("remove", [False, True])
def test_strip_previous_remove_matrix(ray_session, strip, remove):
    """strip_previous × remove_duplicates over an input that already carries
    an is_duplicate column: default keeps prior marks (OR), strip clears
    them unless re-marked now; remove drops whatever ends up marked."""
    df = _case(
        [
            ("c1", 0, "a", False),  # previously marked TRUE (stale mark)
            ("c1", 1, "b", False),
            ("c1", 2, "b", True),  # true duplicate this run
        ]
    )
    df["is_duplicate"] = [True, False, False]
    res = mark_duplicates(
        _ds_with_mark(df),
        p=1e-9,
        num_shards=2,
        strip_previous=strip,
        remove_duplicates=remove,
        materialize=True,
    )
    marked = res.marked.to_pandas().set_index(["conv_id", "turn_idx"])
    # row (c1,0): stale prior mark survives unless strip_previous
    assert marked.loc[("c1", 0), "is_duplicate"] == (not strip)
    assert marked.loc[("c1", 1), "is_duplicate"] == False  # noqa: E712
    assert marked.loc[("c1", 2), "is_duplicate"] == True  # noqa: E712
    out = res.dataset.to_pandas()
    want_rows = 3 - (1 + (0 if strip else 1)) if remove else 3
    assert len(out) == want_rows


def _ds_with_mark(df: pd.DataFrame):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "is_duplicate"]
    return rd.from_arrow(pa.Table.from_pandas(df[cols], preserve_index=False))


def test_cross_wave_duplicate_survives_checkpoint_resume(
    ray_session, tmp_path, monkeypatch
):
    """A duplicate whose first occurrence was in an EARLIER, already-
    checkpointed wave must still be marked after a mid-run crash + resume —
    the resumed shards reload the wave-0 Bloom snapshot. The crash is
    injected at the moment wave 1 would durably record itself done (the
    reference crash window: work done, manifest not yet updated)."""
    import os

    import pyarrow.parquet as pq

    from streammd_ray.state import checkpoint as ck

    def wave_file(i, texts):
        t = pa.table(
            {
                "conv_id": [f"w{i}c{j}" for j in range(len(texts))],
                "turn_idx": pa.array([0] * len(texts), pa.int32()),
                "role": ["user"] * len(texts),
                "text": texts,
                "tool": pa.nulls(len(texts), pa.string()),
                "ts": pa.array([0] * len(texts), pa.timestamp("us")),
            }
        )
        path = str(tmp_path / f"wave-in-{i}.parquet")
        pq.write_table(t, path)
        return path

    f1 = wave_file(0, ["shared", "only0"])
    f2 = wave_file(1, ["shared", "only1"])  # 'shared' first seen in wave 0
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    real_write = ck._atomic_write_json

    def crashing_write(path, obj):
        if path.endswith("manifest.json") and "1" in obj.get("waves", {}):
            raise RuntimeError("injected crash before wave-1 commit")
        real_write(path, obj)

    monkeypatch.setattr(ck, "_atomic_write_json", crashing_write)
    with pytest.raises(RuntimeError, match="injected crash"):
        ck.run_with_checkpoint(
            [f1, f2], ckpt_dir=ckpt, out_dir=out, wave_size=1, num_shards=2
        )
    monkeypatch.setattr(ck, "_atomic_write_json", real_write)

    # the wave-0 snapshot must have survived the crash (deletion is
    # deferred until the NEXT wave is durably recorded)
    assert os.path.exists(os.path.join(ckpt, "shards", "wave-0", "shard-0.bloom"))

    m2 = ck.run_with_checkpoint(
        [f1, f2], ckpt_dir=ckpt, out_dir=out, wave_size=1, num_shards=2
    )
    assert m2["metrics"]["TURNS_MARKED_DUPLICATE"] == 1
    wave1 = pq.read_table(os.path.join(out, "wave-1")).to_pandas()
    dup_rows = wave1[wave1["is_duplicate"]]
    assert len(dup_rows) == 1 and dup_rows.iloc[0]["text"] == "shared"


def test_bloom_identity_divergence_documented(ray_session):
    """INTENTIONAL DIVERGENCE (the reference's [!shouldfail] analog,
    tests/test_picard.cxx:56-72 pattern): under parallel arrival the Bloom
    engine guarantees exactly ONE surviving (unmarked) row per distinct key,
    but WHICH row survives is arrival-order nondeterministic — unlike
    dedup_exact_first, whose survivor is always min(conv_id, turn_idx).
    The invariant tested here is the guaranteed one; row-identity equality
    with the exact path is deliberately NOT asserted."""
    rows = [(f"c{i}", j, f"key{i % 7}", None) for i in range(21) for j in range(2)]
    df = _case([(c, t, x, False) for c, t, x, _ in rows])
    res = mark_duplicates(_ds(df), p=1e-9, num_shards=4, materialize=True)
    out = res.marked.to_pandas()
    survivors = out[~out["is_duplicate"]].groupby("text").size()
    # exactly one survivor per distinct key, every other row marked
    assert (survivors == 1).all()
    assert survivors.sum() + out["is_duplicate"].sum() == len(df)
