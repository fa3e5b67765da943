"""Benchmark harness — prints ONE JSON line with the headline number.

Headline: the flagship single-pass over a deterministic synthetic transcripts
table (input_hint shape, generated once and cached under /tmp): sharded-Bloom
duplicate marking + the 4 estimate sketches (HLL conv_id, CMS tool, t-digest
and KLL over turn length) — reported as seconds and turns/sec.

Also times a representative query set over $GRAFT_SF_DIR (default
/root/testdata/sf0.1): transcripts derivation, exact dedup, heavy tools,
exact quantiles, q1 aggregate.

Usage:
    python bench.py                 # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling       # fresh 8-CPU and 32-CPU subprocesses on
                                    # the same input + scaling efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "8000000"))
BENCH_DIR = f"/tmp/streammd_bench/transcripts-{BENCH_TURNS}"


def ensure_bench_data() -> str:
    marker = os.path.join(BENCH_DIR, "_DONE")
    if not os.path.exists(marker):
        from streammd_ray.sources.transcripts import generate_transcripts

        generate_transcripts(
            BENCH_DIR, n_turns=BENCH_TURNS, seed=42, dup_frac=0.25, n_files=32
        )
        open(marker, "w").write("ok")
    return BENCH_DIR


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def headline(num_shards: int, mark_concurrency) -> tuple[float, int]:
    """Bloom-mark the synthetic turns + merge the marked count; returns
    (n_rows, n_dups). One streaming pass, consumed by the metrics
    aggregation (no materialization of the table)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from streammd_ray.pipelines.mark_duplicates import mark_duplicates
    from streammd_ray.stages.sketch_agg import global_counts

    ds = rd.read_parquet(ensure_bench_data())
    res = mark_duplicates(
        ds,
        p=1e-6,
        mem="256MiB",
        num_shards=num_shards,
        mark_concurrency=mark_concurrency,
        batch_size=32768,
    )
    agg = global_counts(
        res.marked,
        {
            "n": lambda t: len(t),
            "dups": lambda t: int(pc.sum(pc.cast(t["is_duplicate"], "int64")).as_py()),
        },
    )
    return int(agg["n"]), int(agg["dups"])


def sketch_pass() -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from streammd_ray.sketches import KLL, CountMinSketch, HyperLogLog, TDigest
    from streammd_ray.stages.sketch_agg import run_sketches

    ds = rd.read_parquet(ensure_bench_data(), columns=["conv_id", "tool", "text"])

    def lens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "tool": t["tool"],
                "len": pc.cast(
                    pc.fill_null(pc.utf8_length(t["text"]), 0), pa.float64()
                ),
            }
        )

    ds = ds.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)
    merged = run_sketches(
        ds,
        {
            "convs": ("conv_id", HyperLogLog()),
            "tools": ("tool", CountMinSketch(eps=1e-4, delta=1e-3, track_heavy=8)),
            "len_td": ("len", TDigest()),
            "len_kll": ("len", KLL()),
        },
        concurrency=(max(2, NUM_CPUS - 4), max(2, NUM_CPUS - 4)),
    )
    return {
        "convs_est": round(merged["convs"].estimate()),
        "top_tool": merged["tools"].top_k(1)[0][0] if merged["tools"].heavy else None,
        "len_p50": float(merged["len_td"].quantile(0.5)),
    }


def run_queries() -> dict:
    from streammd_ray.pipelines.queries import QUERIES

    names = [
        "transcripts",
        "dedup_exact_first",
        "heavy_tools_exact",
        "turn_length_quantiles_exact",
        "q1_lineitem",
    ]
    times = {}
    for name in names:
        def consume(n=name):
            res = QUERIES[n](SF_DIR)
            if hasattr(res, "count") and not isinstance(res, (int, float)):
                try:
                    return res.count()
                except Exception:
                    pass
            return len(res) if hasattr(res, "__len__") else res
        times[name], _ = timed(consume)
        times[name] = round(times[name], 3)
    return times


def single_run() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False

        ensure_bench_data()
        # warm the page cache so we measure compute+shuffle, not first read
        import pyarrow.parquet as pq
        import glob as _g

        for p in _g.glob(os.path.join(BENCH_DIR, "*.parquet")):
            pq.read_metadata(p)

        num_shards = max(4, NUM_CPUS // 4)
        # fixed-size mark pool: shards cost ceil(num_shards/4) CPUs; leave 2
        # CPUs for read/finish tasks so nothing starves
        pool = max(2, NUM_CPUS - (num_shards + 3) // 4 - 2)
        # untimed warmup: spawns worker processes, pays imports and the
        # first-read page cache, so the timed runs measure compute + shuffle
        headline(num_shards, mark_concurrency=(pool, pool))
        sketch_pass()
        t_mark, (n_rows, n_dups) = timed(
            lambda: headline(num_shards, mark_concurrency=(pool, pool))
        )
        t_sketch, sk = timed(sketch_pass)
        qt = run_queries()
        total = t_mark + t_sketch
        return {
            "metric": "bloom_dedup_plus_sketch_turns_per_sec",
            "value": round(total, 3),
            "unit": "sec",
            "turns": n_rows,
            "dups_marked": n_dups,
            "turns_per_sec": round(n_rows * 2 / total),  # two passes over the table
            "mark_sec": round(t_mark, 3),
            "sketch_sec": round(t_sketch, 3),
            "sketch_summary": sk,
            "queries": qt,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
        }
    finally:
        ray.shutdown()


def scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    ensure_bench_data()
    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "turns": r_hi["turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling()))
    else:
        print(json.dumps(single_run()))
