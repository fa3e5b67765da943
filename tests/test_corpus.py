"""Corpus-level training-data operators (stages/corpus.py): SQL-identity on
adversarial handwritten samples, distributed semantics (decontamination,
corpus-repeat stats, packing) on the real sf0.001 tables, and edge cases the
synthetic corpus can't exercise (newline-heavy texts, nulls, short docs)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from streammd_ray.stages.corpus import (
    PACK_BUCKET,
    ngram_hashes,
    ngram_sql_cte,
    pack_sequences,
    pack_sequences_sql,
    repetition_stats,
    repetition_stats_sql,
)

SF = "/root/testdata/sf0.001"

SAMPLES = [
    "a\nb\na\na",  # 4 lines, 'a' ×3 → dup lines
    "one two three two one two",  # word repeats, no line repeats
    "",  # empty → 1 empty line, 0 words
    None,  # null → null stats
    "same\nsame\nsame",  # all-duplicate lines
    "Hello, World! hello world",  # case-folding + punctuation splits
    "x",  # single word
    "\n\n",  # 3 empty lines (dups of each other, 0 chars)
    "tab\there and\nnewline mix",
]


def _docs(samples=SAMPLES):
    return pa.table(
        {"doc_id": pa.array(range(len(samples)), pa.int64()), "text": samples}
    )


def _duck(sql: str, tbl: pa.Table) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql).df()


class TestRepetitionStats:
    def test_matches_sql_on_adversarial_samples(self):
        tbl = _docs()
        mine = (
            repetition_stats(tbl)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        theirs = (
            _duck(repetition_stats_sql(), tbl)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for col in (
            "n_lines",
            "dup_line_frac",
            "dup_line_char_frac",
            "top_word_frac",
            "dup_word_frac",
        ):
            a = mine[col].astype(float).to_numpy()
            b = theirs[col].astype(float).to_numpy()
            assert np.allclose(a, b, equal_nan=True), (col, a, b)

    def test_handwritten_values(self):
        out = repetition_stats(_docs()).to_pandas().set_index("doc_id")
        # "a\nb\na\na": 4 lines, 'a' repeats 2x beyond first → 2/4
        assert out.loc[0, "n_lines"] == 4
        assert out.loc[0, "dup_line_frac"] == pytest.approx(0.5)
        # repeated chars: two extra 'a' lines of 1 char over 4 total chars
        assert out.loc[0, "dup_line_char_frac"] == pytest.approx(0.5)
        # "one two three two one two": top word 'two' 3/6
        assert out.loc[1, "top_word_frac"] == pytest.approx(0.5)
        assert out.loc[1, "dup_word_frac"] == pytest.approx(0.5)
        # all-duplicate lines
        assert out.loc[4, "dup_line_frac"] == pytest.approx(2 / 3)
        # null text → null stats
        assert pd.isna(out.loc[3, "dup_line_frac"])
        # case folding: hello/world each twice → dup_word_frac 0.5
        assert out.loc[5, "dup_word_frac"] == pytest.approx(0.5)
        # single word: top fraction 1
        assert out.loc[6, "top_word_frac"] == pytest.approx(1.0)

    def test_empty_batch(self):
        out = repetition_stats(_docs([]))
        assert out.num_rows == 0
        assert "dup_line_frac" in out.schema.names


class TestNgramHashes:
    def test_counts_and_boundaries(self):
        tbl = _docs(["a b c d", "a b", None, "", "x y z"])
        h, parents = ngram_hashes(tbl["text"].combine_chunks(), 3)
        # doc0: 2 grams; doc1: too short; doc4: 1 gram
        assert np.bincount(parents, minlength=5).tolist() == [2, 0, 0, 0, 1]
        # gram strings are position-sensitive: 'a b c' != 'b c d'
        assert h[0] != h[1]

    def test_grams_never_cross_documents(self):
        # 'c d' + 'e f' must NOT produce gram 'd e'
        tbl = _docs(["c d", "e f"])
        h2, _ = ngram_hashes(tbl["text"].combine_chunks(), 2)
        joined = _docs(["c d e f"])
        h1, _ = ngram_hashes(joined["text"].combine_chunks(), 2)
        # the joined doc has 3 grams incl. 'd e'; the split pair only 2
        assert len(h2) == 2 and len(h1) == 3
        assert set(h2.tolist()) < set(h1.tolist())

    def test_matches_sql_gram_multiset(self):
        tbl = _docs()
        h, parents = ngram_hashes(tbl["text"].combine_chunks(), 2)
        mine = pd.Series(parents).value_counts().sort_index()
        sql = (
            f"WITH {ngram_sql_cte(2)[1:]} "
            "SELECT doc_id, count(*) AS c FROM grams_2 GROUP BY doc_id"
        )
        theirs = _duck(sql, tbl).set_index("doc_id")["c"]
        for doc, c in theirs.items():
            assert mine.get(doc, 0) == c
        # distinct hashes == distinct gram strings (no collisions here)
        sql2 = f"WITH {ngram_sql_cte(2)[1:]} SELECT count(DISTINCT g) FROM grams_2"
        con = duckdb.connect()
        con.register("documents", tbl)
        assert con.execute(sql2).fetchone()[0] == len(np.unique(h))


@pytest.mark.usefixtures("ray_session")
class TestDecontaminateDistributed:
    def test_flags_exact_overlap_only(self):
        import ray
        import ray.data as rd

        from streammd_ray.stages.corpus import (
            Decontaminate,
            benchmark_gram_hashes,
        )

        bench = rd.from_arrow(_docs(["the secret eval answer is here"]))
        corpus = rd.from_arrow(
            _docs(
                [
                    "totally clean document text",
                    "leaked: the secret eval answer is verbatim",
                    "secret eval",  # shares words but no 3-gram
                    None,
                ]
            )
        )
        ref = ray.put(benchmark_gram_hashes(bench, n=3))
        out = (
            corpus.map_batches(
                Decontaminate,
                fn_constructor_kwargs={"bench_ref": ref, "n": 3},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
            .set_index("doc_id")["contaminated"]
        )
        assert not out.loc[0]
        assert out.loc[1]
        assert not out.loc[2]
        assert not out.loc[3]


@pytest.mark.usefixtures("ray_session")
class TestDupNgramStatsDistributed:
    def test_corpus_level_repeats(self):
        import ray.data as rd

        from streammd_ray.stages.corpus import dup_ngram_stats

        docs = _docs(
            [
                "alpha beta gamma delta",  # 'alpha beta' repeats in doc2
                "epsilon zeta eta theta",  # unique
                "alpha beta something else",
                "short",  # no 2-grams
            ]
        )
        out = (
            dup_ngram_stats(rd.from_arrow(docs), n=2)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "n_grams"] == 3 and out.loc[0, "n_repeated"] == 1
        assert out.loc[1, "n_repeated"] == 0
        assert out.loc[2, "n_repeated"] == 1
        # doc3 has no grams → absent from the exploded set entirely
        assert 3 not in out.index


@pytest.mark.usefixtures("ray_session")
class TestPackSequences:
    def test_matches_sql_on_real_table(self):
        from streammd_ray.sources.io import read_parquet_clean

        ds = read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        mine = (
            pack_sequences(ds, chunk_len=256)
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
            con.execute(pack_sequences_sql(256))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert mine.shape == theirs.shape
        for col in ("n_tokens", "tok_start", "chunk_first", "chunk_last"):
            assert (
                mine[col].astype("int64") == theirs[col].astype("int64")
            ).all(), col

    def test_offsets_are_contiguous_and_cross_bucket(self):
        import ray.data as rd

        # ids straddling a PACK_BUCKET boundary → prefix must carry across
        ids = [PACK_BUCKET - 2, PACK_BUCKET - 1, PACK_BUCKET, PACK_BUCKET + 1]
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": ["one two", "three", "", "four five six"],
            }
        )
        out = (
            pack_sequences(rd.from_arrow(docs), chunk_len=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # empty doc dropped; starts are the exclusive prefix over doc order
        assert out["doc_id"].tolist() == [ids[0], ids[1], ids[3]]
        assert out["tok_start"].tolist() == [0, 2, 3]
        assert out["chunk_first"].tolist() == [0, 0, 0]
        # doc at tok 3..5 with L=4 spans chunks 0-1
        assert out["chunk_last"].tolist() == [0, 0, 1]
