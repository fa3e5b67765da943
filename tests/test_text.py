"""Text-analysis stages: Ray results vs the DuckDB renderings of the same
rules (the oracle identity), plus semantic sanity on handwritten samples."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from streammd_ray.stages.text import (
    fingerprint,
    fingerprint_sql,
    lang_id,
    lang_id_sql,
    text_stats,
    text_stats_sql,
)

SAMPLES = [
    "The quick brown fox jumps over the lazy dog, and it is happy!",
    "Der Hund ist nicht der Freund von der Katze und das ist gut.",
    "Le chat est dans la maison et les chiens sont dans le jardin.",
    "El perro es el amigo de los gatos y las casas son una maravilla.",
    "这是一个中文句子。",
    "xyzzy plugh qwerty",  # no markers → und
    "",  # empty
    None,  # null
    "  a  to in of the  ",  # stopword-heavy
]


def _batch():
    return pa.table({"doc_id": list(range(len(SAMPLES))), "text": SAMPLES})


def _duck(sql_cols: list[str]) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", _batch())
    return con.execute(
        "SELECT doc_id, " + ", ".join(sql_cols) + " FROM t ORDER BY doc_id"
    ).fetchdf()


def test_lang_id_semantics():
    out = lang_id(_batch()).to_pandas()
    assert out["lang_pred"].tolist() == [
        "en", "de", "fr", "es", "zh", "und", "und", None, "en",
    ]


def test_lang_id_matches_sql():
    got = lang_id(_batch()).to_pandas()[["doc_id", "lang_pred"]]
    want = _duck([lang_id_sql()])
    assert got["lang_pred"].where(got["lang_pred"].notna(), None).tolist() == \
        want["lang_pred"].where(want["lang_pred"].notna(), None).tolist()


def test_text_stats_matches_sql():
    got = text_stats(_batch()).to_pandas()
    want = _duck(text_stats_sql())
    for c in ("n_chars", "n_tokens", "n_words"):
        pd.testing.assert_series_equal(
            got[c].astype("float64"), want[c].astype("float64"), check_names=False
        )
    for c in ("punct_ratio", "stop_ratio", "quality"):
        g, w = got[c].to_numpy(np.float64), want[c].to_numpy(np.float64)
        assert np.allclose(g, w, atol=1e-9, equal_nan=True), c


def test_text_stats_values():
    out = text_stats(pa.table({"text": ["a b  c", "Hello, world!"]})).to_pandas()
    assert out["n_tokens"].tolist() == [3, 2]
    assert out["n_chars"].tolist() == [6, 13]
    assert out["n_words"].tolist() == [3, 2]
    assert out.loc[1, "punct_ratio"] == round(2 / 13, 6)


def test_fingerprint_md5_matches_sql():
    got = fingerprint(_batch(), algo="md5").to_pandas()[["doc_id", "fingerprint"]]
    want = _duck([fingerprint_sql()])
    assert got["fingerprint"].tolist() == want["fingerprint"].tolist()


def test_fingerprint_xxh_normalization():
    out = fingerprint(
        pa.table({"text": ["Hello   World", "hello world", "other"]})
    ).to_pandas()
    # case + whitespace normalization collide the first two
    assert out.loc[0, "fingerprint"] == out.loc[1, "fingerprint"]
    assert out.loc[0, "fingerprint"] != out.loc[2, "fingerprint"]


def test_stages_in_ray_pipeline(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = (
        ds.map_batches(text_stats, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lang_id, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
    )
    df = out.to_pandas()
    assert len(df) == 500
    assert df["n_tokens"].gt(0).all()
    assert df["fingerprint"].notna().all()
    assert df["quality"].between(0, 1).all()


def test_redact_pii_matches_duckdb_on_adversarial_strings():
    """Engine redaction vs the SQL twin on crafted edge strings (both run
    RE2, so identical patterns must make identical decisions) — including
    null text, boundary-length digit runs, malformed emails/IPs."""
    import duckdb
    import pyarrow as pa

    from streammd_ray.stages.text import redact_pii, redact_pii_sql

    samples = [
        "mail a.b-c%d+e@ex-ample.co.uk or 10.0.0.1 now",
        "call 12345678 and 123456 or 1.2.3.4567",
        "x@y.z a@@b.cc 999.999.999.999 12345678901234567890",
        None,
        "",
        "no pii here",
        "ip 001.002.003.004 edge",
        "u1@a.bc u2@a.bc same line 7777777",
        "glued7777777@x.yz end",
        "dot.end. 1234567.",
    ]
    t = pa.table({"text": pa.array(samples, pa.string())})
    got = redact_pii(t).to_pandas()

    con = duckdb.connect()
    exprs = ",\n".join(redact_pii_sql("s"))
    want = con.execute(
        f"SELECT {exprs} FROM (SELECT unnest(?) AS s)", [samples]
    ).fetchdf()
    for c in ("n_email", "n_ipv4", "n_digits", "text_redacted"):
        assert got[c].where(got[c].notna(), None).tolist() == \
            want[c].where(want[c].notna(), None).tolist(), c
