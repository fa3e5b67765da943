"""Exact substring (span-level) dedup — the removal pass of Lee et al. 2022
(stages/corpus.py span_dedup): handwritten golden spans, full-coverage edge,
position extraction, and SQL identity on the real sf0.001 corpus."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from streammd_ray.stages.corpus import (
    ngram_hashes,
    ngram_hashes_pos,
    span_dedup,
    span_dedup_sql,
)

SF = "/root/testdata/sf0.001"


def _docs(samples):
    return pa.table(
        {"doc_id": pa.array(range(len(samples)), pa.int64()), "text": samples}
    )


class TestNgramHashesPos:
    def test_positions_are_1based_and_per_doc(self):
        tbl = _docs(["a b c d", "x y z"])
        h, parents, pos = ngram_hashes_pos(tbl["text"].combine_chunks(), 2)
        assert list(parents) == [0, 0, 0, 1, 1]
        assert list(pos) == [1, 2, 3, 1, 2]

    def test_hashes_match_ngram_hashes(self):
        tbl = _docs(["a b c d", None, "", "x y z", "solo"])
        text = tbl["text"].combine_chunks()
        h0, p0 = ngram_hashes(text, 2)
        h1, p1, _ = ngram_hashes_pos(text, 2)
        assert np.array_equal(h0, h1) and np.array_equal(p0, p1)

    def test_empty_and_short(self):
        tbl = _docs([None, "", "one"])
        h, p, pos = ngram_hashes_pos(tbl["text"].combine_chunks(), 2)
        assert len(h) == len(p) == len(pos) == 0


@pytest.mark.usefixtures("ray_session")
class TestSpanDedup:
    def test_handwritten_spans(self):
        import ray.data as rd

        docs = _docs(
            [
                # 'a b c' at pos 1 and 6 (within-doc repeat) + in doc1;
                # 'b c d' in doc0 and doc1 → merged spans [1,4] and [6,8]
                "a b c d e a b c x",
                "z a b c d q",
                "entirely unique vocabulary here",
                "a",  # no 3-grams
                None,  # null text
            ]
        )
        out = (
            span_dedup(rd.from_arrow(docs), n=3)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out.index) == [0, 1]
        assert out.loc[0, "n_tokens"] == 9
        assert out.loc[0, "dup_tokens"] == 7
        assert out.loc[0, "n_spans"] == 2
        assert out.loc[0, "clean_text"] == "e x"
        assert out.loc[1, "n_tokens"] == 6
        assert out.loc[1, "dup_tokens"] == 4
        assert out.loc[1, "n_spans"] == 1
        assert out.loc[1, "clean_text"] == "z q"

    def test_fully_covered_doc_yields_empty_string(self):
        import ray.data as rd

        docs = _docs(["p q r", "p q r", "m n m n m n"])
        out = (
            span_dedup(rd.from_arrow(docs), n=2)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # docs 0/1 duplicate each other entirely; doc 2's 2-grams all repeat
        # within itself → every token of every doc is covered
        assert list(out.index) == [0, 1, 2]
        assert (out["dup_tokens"] == out["n_tokens"]).all()
        assert (out["n_spans"] == 1).all()
        assert (out["clean_text"] == "").all()

    def test_min_count_threshold(self):
        import ray.data as rd

        docs = _docs(["a b c", "a b c", "a b c"])
        # 'a b c' occurs 3 times; min_count=4 → nothing marked
        out = span_dedup(rd.from_arrow(docs), n=3, min_count=4).to_pandas()
        assert len(out) == 0

    def test_matches_sql_on_real_table(self):
        from streammd_ray.sources.io import read_parquet_clean

        ds = read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        mine = (
            span_dedup(ds, n=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        theirs = (
            con.execute(span_dedup_sql(4))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(mine) > 0, "synthetic corpus should contain repeats"
        assert mine.shape == theirs.shape
        for col in ("doc_id", "n_tokens", "dup_tokens", "n_spans"):
            assert (
                mine[col].astype("int64") == theirs[col].astype("int64")
            ).all(), col
        assert (mine["clean_text"] == theirs["clean_text"]).all()
