"""Query catalog — one entry per operator/pipeline from SURVEY.md §2 plus the
training-data-pipeline operators, each as a ``fn(sf_dir) -> Dataset |
DataFrame | Table`` with (where exactly reproducible) a DuckDB oracle SQL
built from the same single-source-of-truth rules.

Column names are kept identical between the Ray result and the SQL (the
driver hash-compares after sorting columns by name). Approximate sketch
queries deliberately have NO oracle (the driver records a rows-only check);
each has an exact twin that IS oracle-checked, so every semantic rule is
value-verified and the sketch accuracy itself is covered by the pytest
error-bound suite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.transcripts import derive_transcripts, transcripts_sql
from ..stages.dedup import dedup_exact_first
from ..stages.text import (
    fingerprint,
    fingerprint_sql,
    lang_id,
    lang_id_sql,
    text_stats,
    text_stats_sql,
)

T_CTE = f"WITH transcripts AS (\n{transcripts_sql()}\n)"

_CACHE_ROOT = "/tmp/streammd_cache"
_DERIVE_VERSION = "v1"  # bump when the derivation rules change


def transcripts_ds(sf_dir: str, *, columns: list[str] | None = None):
    """The derived transcripts table, materialized once per sf_dir to a
    parquet cache under /tmp (atomic rename) — the derivation is
    deterministic, so every query over transcripts then starts from a
    column-prunable parquet read instead of re-running the derivation's
    shuffle. This is the derive-once / read-many layout a real deployment
    would use for a derived table."""
    import hashlib
    import os
    import shutil

    import ray.data as rd

    tag = hashlib.md5(f"{sf_dir}:{_DERIVE_VERSION}".encode()).hexdigest()[:16]
    cache = os.path.join(_CACHE_ROOT, f"transcripts-{tag}")
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        tmp = cache + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        derive_transcripts(sf_dir).write_parquet(tmp)
        open(os.path.join(tmp, "_DONE"), "w").write("ok")
        shutil.rmtree(cache, ignore_errors=True)
        os.replace(tmp, cache)
    return rd.read_parquet(cache, columns=columns)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def exact_quantile_disc(ds, col: str, qs: tuple[float, ...]) -> list:
    """Exact discrete quantiles at scale: shuffle only (value, count) pairs
    (a groupby pre-aggregation), never the raw column; the driver folds the
    tiny histogram. Matches DuckDB quantile_disc (rank = ceil(q·n)−1)."""
    from ray.data.aggregate import Count

    hist = ds.groupby(col).aggregate(Count(alias_name="n")).to_pandas()
    hist = hist.dropna(subset=[col]).sort_values(col)
    counts = hist["n"].to_numpy(np.int64)
    values = hist[col].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(0, int(np.ceil(q * n)) - 1)  # DuckDB quantile_disc rank rule
        out.append(values[np.searchsorted(cum, rank + 1, side="left")])
    return out


def _one_row(d: dict) -> pa.Table:
    return pa.table({k: [v] for k, v in d.items()})


# ---------------------------------------------------------------------------
# transcripts + dedup family
# ---------------------------------------------------------------------------


def q_transcripts(sf_dir: str):
    return derive_transcripts(sf_dir)


def sql_transcripts() -> str:
    return f"{T_CTE} SELECT * FROM transcripts"


def q_dedup_exact_first(sf_dir: str):
    out = dedup_exact_first(transcripts_ds(sf_dir))
    return out.select_columns(["conv_id", "turn_idx", "is_duplicate"])


def sql_dedup_exact_first() -> str:
    return f"""{T_CTE}
SELECT conv_id, turn_idx,
  CASE WHEN text IS NULL THEN FALSE
       ELSE row_number() OVER (PARTITION BY text ORDER BY conv_id, turn_idx) > 1
  END AS is_duplicate
FROM transcripts"""


def q_dedup_per_conversation(sf_dir: str):
    out = dedup_exact_first(
        transcripts_ds(sf_dir), key_cols=("text", "conv_id")
    )
    return out.select_columns(["conv_id", "turn_idx", "is_duplicate"])


def sql_dedup_per_conversation() -> str:
    return f"""{T_CTE}
SELECT conv_id, turn_idx,
  CASE WHEN text IS NULL THEN FALSE
       ELSE row_number() OVER (PARTITION BY conv_id, text ORDER BY conv_id, turn_idx) > 1
  END AS is_duplicate
FROM transcripts"""


def q_dedup_remove(sf_dir: str):
    out = dedup_exact_first(transcripts_ds(sf_dir))
    kept = out.map_batches(
        lambda t: t.filter(pc.invert(t["is_duplicate"].combine_chunks())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return kept.select_columns(["conv_id", "turn_idx", "role", "text"])


def sql_dedup_remove() -> str:
    return f"""{T_CTE}
SELECT conv_id, turn_idx, role, text FROM (
  SELECT *,
    CASE WHEN text IS NULL THEN FALSE
         ELSE row_number() OVER (PARTITION BY text ORDER BY conv_id, turn_idx) > 1
    END AS dup
  FROM transcripts
) WHERE NOT dup"""


def q_dedup_bloom_metrics(sf_dir: str):
    """The flagship's metrics through the REAL sharded-Bloom path.

    p=1e-9 so the expected false-positive count at validation scale is ~1e-5
    — the aggregate counters then equal the exact-dedup counts and the query
    is oracle-checkable despite the probabilistic engine underneath."""
    from .mark_duplicates import compute_metrics, mark_duplicates

    ds = transcripts_ds(sf_dir)
    res = mark_duplicates(ds, p=1e-9, num_shards=4, materialize=True)
    m = compute_metrics(res.marked)
    return _one_row(
        {
            "turns": int(m["TURNS"]),
            "turns_null_text": int(m["TURNS_NULL_TEXT"]),
            "turns_marked_duplicate": int(m["TURNS_MARKED_DUPLICATE"]),
            "conversations": int(m["CONVERSATIONS"]),
            "turn_duplicate_fraction": float(m["TURN_DUPLICATE_FRACTION"]),
        }
    )


def sql_dedup_bloom_metrics() -> str:
    return f"""{T_CTE}
SELECT
  count(*) AS turns,
  count(*) FILTER (WHERE text IS NULL) AS turns_null_text,
  count(text) - count(DISTINCT text) AS turns_marked_duplicate,
  count(DISTINCT conv_id) AS conversations,
  round((count(text) - count(DISTINCT text)) / CAST(count(text) AS DOUBLE), 4)
    AS turn_duplicate_fraction
FROM transcripts"""


# ---------------------------------------------------------------------------
# cardinality / heavy hitters / quantiles: exact twins + sketch versions
# ---------------------------------------------------------------------------


def q_distinct_conversations_exact(sf_dir: str):
    from ray.data.aggregate import Count

    ds = transcripts_ds(sf_dir, columns=["conv_id"])
    # distinct via groupby-count (one hash shuffle of the key column);
    # ds.unique() in this Ray version trips on arrow-string blocks
    n = ds.groupby("conv_id").aggregate(Count(alias_name="n")).count()
    return _one_row({"n_conversations": int(n)})


def sql_distinct_conversations_exact() -> str:
    return f"{T_CTE} SELECT count(DISTINCT conv_id) AS n_conversations FROM transcripts"


def q_hll_distinct_conversations(sf_dir: str):
    from ..sketches.hll import HyperLogLog
    from ..stages.sketch_agg import sketch_column

    ds = transcripts_ds(sf_dir, columns=["conv_id"])
    hll = sketch_column(ds, "conv_id", HyperLogLog())
    return _one_row(
        {"estimate": float(hll.estimate()), "relative_error": hll.relative_error}
    )


def q_heavy_tools_exact(sf_dir: str):
    from ray.data.aggregate import Count

    ds = transcripts_ds(sf_dir, columns=["tool"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["tool"].combine_chunks())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    top = (
        ds.groupby("tool")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "tool"], descending=[True, False])
        .limit(5)
    )
    return top


def sql_heavy_tools_exact() -> str:
    return f"""{T_CTE}
SELECT tool, count(*) AS n FROM transcripts WHERE tool IS NOT NULL
GROUP BY tool ORDER BY n DESC, tool LIMIT 5"""


def q_cms_heavy_tools(sf_dir: str):
    from ..sketches.cms import CountMinSketch
    from ..stages.sketch_agg import sketch_column

    ds = transcripts_ds(sf_dir, columns=["tool"])
    cms = sketch_column(
        ds, "tool", CountMinSketch(eps=1e-4, delta=1e-3, track_heavy=8)
    )
    top = cms.top_k(5)
    return pa.table(
        {
            "tool": [t for t, _ in top],
            "est_n": [int(n) for _, n in top],
        }
    )


def q_turn_length_quantiles_exact(sf_dir: str):
    ds = transcripts_ds(sf_dir, columns=["text"])
    ds = ds.map_batches(
        lambda t: pa.table({"len": pc.utf8_length(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    p50, p90, p99 = exact_quantile_disc(ds, "len", (0.5, 0.9, 0.99))
    return _one_row({"p50": int(p50), "p90": int(p90), "p99": int(p99)})


def sql_turn_length_quantiles_exact() -> str:
    return f"""{T_CTE}
SELECT quantile_disc(length(text), 0.5) AS p50,
       quantile_disc(length(text), 0.9) AS p90,
       quantile_disc(length(text), 0.99) AS p99
FROM transcripts WHERE text IS NOT NULL"""


def q_tdigest_turn_length_quantiles(sf_dir: str):
    from ..sketches.tdigest import TDigest
    from ..stages.sketch_agg import sketch_column

    ds = transcripts_ds(sf_dir, columns=["text"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"len": pc.cast(pc.utf8_length(t["text"]), pa.float64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    td = sketch_column(ds, "len", TDigest())
    return _one_row(
        {
            "p50": float(td.quantile(0.5)),
            "p90": float(td.quantile(0.9)),
            "p99": float(td.quantile(0.99)),
        }
    )


def _latency_ds(sf_dir: str):
    """Inter-turn latency (microseconds) per conversation."""
    ds = transcripts_ds(sf_dir, columns=["conv_id", "turn_idx", "ts"])

    def diffs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        dt = g["ts"].astype("int64").diff().iloc[1:]
        return pd.DataFrame({"dt_us": dt.astype(np.int64)})

    return ds.groupby("conv_id").map_groups(diffs, batch_format="pandas")


def q_latency_quantiles_exact(sf_dir: str):
    dt = _latency_ds(sf_dir)
    p50, p90, p99 = exact_quantile_disc(dt, "dt_us", (0.5, 0.9, 0.99))
    return _one_row({"p50": int(p50), "p90": int(p90), "p99": int(p99)})


def sql_latency_quantiles_exact() -> str:
    return f"""{T_CTE},
d AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
         AS dt_us
  FROM transcripts
)
SELECT quantile_disc(dt_us, 0.5) AS p50,
       quantile_disc(dt_us, 0.9) AS p90,
       quantile_disc(dt_us, 0.99) AS p99
FROM d WHERE dt_us IS NOT NULL"""


def q_kll_latency_quantiles(sf_dir: str):
    from ..sketches.kll import KLL
    from ..stages.sketch_agg import sketch_column

    dt = _latency_ds(sf_dir)
    kll = sketch_column(dt, "dt_us", KLL(k=200))
    return _one_row(
        {
            "p50": float(kll.quantile(0.5)),
            "p90": float(kll.quantile(0.9)),
            "p99": float(kll.quantile(0.99)),
            "n": int(kll.n),
        }
    )


# ---------------------------------------------------------------------------
# text analysis over documents
# ---------------------------------------------------------------------------


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def q_text_stats(sf_dir: str):
    out = _docs(sf_dir).map_batches(
        text_stats, batch_format="pyarrow", zero_copy_batch=True
    )
    return out.select_columns(
        ["doc_id", "n_chars", "n_tokens", "n_words", "punct_ratio", "stop_ratio", "quality"]
    )


def sql_text_stats() -> str:
    return "SELECT doc_id, " + ", ".join(text_stats_sql()) + " FROM documents"


def q_lang_id(sf_dir: str):
    out = _docs(sf_dir).map_batches(
        lang_id, batch_format="pyarrow", zero_copy_batch=True
    )
    return out.select_columns(["doc_id", "lang_pred"])


def sql_lang_id() -> str:
    return f"SELECT doc_id, {lang_id_sql()} FROM documents"


def q_fingerprint(sf_dir: str):
    out = _docs(sf_dir).map_batches(
        lambda t: fingerprint(t, algo="md5"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return out.select_columns(["doc_id", "fingerprint"])


def sql_fingerprint() -> str:
    return f"SELECT doc_id, {fingerprint_sql()} FROM documents"


def q_token_count_by_source(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    ds = ds.map_batches(
        lambda t: text_stats(t).select(["source", "n_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds.groupby("source").aggregate(
        Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs")
    )


def sql_token_count_by_source() -> str:
    return """SELECT source,
  sum(coalesce(length(regexp_extract_all(text, '\\S+')), 0)) AS total_tokens,
  count(*) AS n_docs
FROM documents GROUP BY source"""


# ---------------------------------------------------------------------------
# similarity / near-dup over documents + embeddings
# ---------------------------------------------------------------------------


def q_minhash_dup_pairs(sf_dir: str):
    from ..stages.similarity import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(sf_dir), num_perm=128, bands=32, shingle_k=3, threshold=0.8
    )


def q_simhash_dup_pairs(sf_dir: str):
    from ..stages.similarity import simhash_pairs

    return simhash_pairs(_docs(sf_dir), max_hamming=3)


def q_embedding_knn(sf_dir: str):
    import ray.data as rd

    from ..stages.similarity import embedding_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = sorted(ds.take(3), key=lambda r: r["vec_id"])
    q = np.stack([r["embedding"] for r in qrows if r["vec_id"] < 3])
    # queries are vec_id 0,1,2 (take(3) of a sorted-by-construction table)
    got = embedding_topk(ds, q, k=5)
    got["score"] = got["score"].round(5)
    # re-rank on the rounded score so ranking matches the SQL exactly
    out = []
    for qid, g in got.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(5)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g)
    res = pd.concat(out).reset_index(drop=True)
    res["query_id"] = res["query_id"].astype(np.int64)
    return res[["query_id", "vec_id", "score", "rank"]]


def sql_embedding_knn() -> str:
    return """WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 5) AS score
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 5"""


def q_embedding_near_dup(sf_dir: str):
    import ray.data as rd

    from ..stages.similarity import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(ds, threshold=0.5)
    df = pairs.to_pandas()
    if df.empty:  # an empty Dataset drops its schema through to_pandas
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype=np.int64),
                "id_b": pd.Series(dtype=np.int64),
                "cosine": pd.Series(dtype=np.float64),
            }
        )
    df["cosine"] = df["cosine"].round(5)
    return df.astype({"id_a": np.int64, "id_b": np.int64})


def sql_embedding_near_dup() -> str:
    return """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 5) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.5"""


def q_media_features(sf_dir: str):
    import ray.data as rd

    from ..stages.multimodal import decode_media, make_fake_media_table

    ds = rd.from_arrow(make_fake_media_table(128, seed=11))
    out = decode_media(ds, decoder="fake", batch_size=16)
    return out.select_columns(["media_id", "n_bytes", "width", "height", "channels"])


# ---------------------------------------------------------------------------
# general relational ops (groupby/agg/window) on the TPC-H-ish tables
# ---------------------------------------------------------------------------


def q_q1_lineitem(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def revenue(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return t.append_column("disc_price", disc)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )
    df = out.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_disc_price"] = df["sum_disc_price"].round(2)
    return df


def sql_q1_lineitem() -> str:
    return """SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus"""


def q_events_windowed(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def hour(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "value": t["value"],
            }
        )

    out = (
        ds.map_batches(hour, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
    )
    df = out.to_pandas()
    df["total_value"] = df["total_value"].round(4)
    return df


def sql_events_windowed() -> str:
    return """SELECT event_type, date_trunc('hour', ts) AS hour,
  count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY event_type, date_trunc('hour', ts)"""


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

QUERIES = {
    "transcripts": q_transcripts,
    "dedup_exact_first": q_dedup_exact_first,
    "dedup_per_conversation": q_dedup_per_conversation,
    "dedup_remove": q_dedup_remove,
    "dedup_bloom_metrics": q_dedup_bloom_metrics,
    "distinct_conversations_exact": q_distinct_conversations_exact,
    "hll_distinct_conversations": q_hll_distinct_conversations,
    "heavy_tools_exact": q_heavy_tools_exact,
    "cms_heavy_tools": q_cms_heavy_tools,
    "turn_length_quantiles_exact": q_turn_length_quantiles_exact,
    "tdigest_turn_length_quantiles": q_tdigest_turn_length_quantiles,
    "latency_quantiles_exact": q_latency_quantiles_exact,
    "kll_latency_quantiles": q_kll_latency_quantiles,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "token_count_by_source": q_token_count_by_source,
    "minhash_dup_pairs": q_minhash_dup_pairs,
    "simhash_dup_pairs": q_simhash_dup_pairs,
    "embedding_knn": q_embedding_knn,
    "embedding_near_dup": q_embedding_near_dup,
    "media_features": q_media_features,
    "q1_lineitem": q_q1_lineitem,
    "events_windowed": q_events_windowed,
}

ORACLES = {
    "transcripts": sql_transcripts(),
    "dedup_exact_first": sql_dedup_exact_first(),
    "dedup_per_conversation": sql_dedup_per_conversation(),
    "dedup_remove": sql_dedup_remove(),
    "dedup_bloom_metrics": sql_dedup_bloom_metrics(),
    "distinct_conversations_exact": sql_distinct_conversations_exact(),
    "heavy_tools_exact": sql_heavy_tools_exact(),
    "turn_length_quantiles_exact": sql_turn_length_quantiles_exact(),
    "latency_quantiles_exact": sql_latency_quantiles_exact(),
    "text_stats": sql_text_stats(),
    "lang_id": sql_lang_id(),
    "fingerprint": sql_fingerprint(),
    "token_count_by_source": sql_token_count_by_source(),
    "embedding_knn": sql_embedding_knn(),
    "embedding_near_dup": sql_embedding_near_dup(),
    "q1_lineitem": sql_q1_lineitem(),
    "events_windowed": sql_events_windowed(),
}
