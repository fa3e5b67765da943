"""Deterministic sampling operators: reproducibility, rate accuracy,
stratification, and DuckDB-rule parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from streammd_ray.stages.sampling import (
    sample_sql_predicate,
    sample_stratified,
    sample_uniform,
)


def _tbl(n=20_000, seed=1):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice([f"s{i}" for i in range(5)], n),
        }
    )


def test_uniform_rate_and_determinism(ray_session):
    t = _tbl()
    ds = rd.from_arrow(t).repartition(8)
    a = sample_uniform(ds, rate=0.2, key_col="doc_id", seed=3).to_pandas()
    b = sample_uniform(
        rd.from_arrow(t).repartition(3), rate=0.2, key_col="doc_id", seed=3
    ).to_pandas()
    # identical row SET regardless of partition layout
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert abs(len(a) / len(t) - 0.2) < 0.02
    # a different seed selects a different set
    c = sample_uniform(ds, rate=0.2, key_col="doc_id", seed=4).to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])


def test_uniform_matches_duckdb_predicate(ray_session):
    t = _tbl(5_000)
    ds = rd.from_arrow(t)
    got = sorted(
        sample_uniform(ds, rate=0.33, key_col="doc_id", seed=11).to_pandas()["doc_id"]
    )
    con = duckdb.connect()
    con.register("tbl", t)
    pred = sample_sql_predicate(0.33, "doc_id", seed=11)
    want = sorted(
        con.execute(f"SELECT doc_id FROM tbl WHERE {pred}").df()["doc_id"]
    )
    assert got == want


def test_uniform_edge_rates(ray_session):
    ds = rd.from_arrow(_tbl(1_000))
    assert sample_uniform(ds, rate=0.0, key_col="doc_id").count() == 0
    assert sample_uniform(ds, rate=1.0, key_col="doc_id").count() == 1_000
    with pytest.raises(ValueError):
        sample_uniform(ds, rate=1.5, key_col="doc_id")


def test_stratified_rates(ray_session):
    t = _tbl(50_000)
    ds = rd.from_arrow(t).repartition(4)
    out = sample_stratified(
        ds,
        rates={"s0": 0.5, "s1": 1.0, "s2": 0.0},
        strata_col="source",
        key_col="doc_id",
        default_rate=0.1,
        seed=2,
    ).to_pandas()
    frac = out.groupby("source").size() / (
        t.to_pandas().groupby("source").size()
    )
    assert abs(frac.get("s0") - 0.5) < 0.05
    assert frac.get("s1") == 1.0
    assert out[out["source"] == "s2"].empty
    assert abs(frac.get("s3") - 0.1) < 0.03  # default rate
    # uniform consistency: the s0 rows kept here are exactly the uniform
    # 0.5-sample of the s0 stratum (same key rule)
    s0_uniform = sample_uniform(
        rd.from_arrow(t.filter(pa.compute.equal(t["source"], "s0"))),
        rate=0.5,
        key_col="doc_id",
        seed=2,
    ).to_pandas()
    assert sorted(out[out["source"] == "s0"]["doc_id"]) == sorted(
        s0_uniform["doc_id"]
    )
