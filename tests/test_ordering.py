"""Output-ordering invariant: write_transcripts(sort=True) must produce
part files whose filename-ordered concatenation replays the global
(conv_id, turn_idx) order (SURVEY.md §4.2 / input_hint)."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from streammd_ray.sources.io import write_transcripts


def _scrambled_ds(n_convs=50, turns_per=20, seed=3):
    rng = np.random.default_rng(seed)
    conv = np.repeat([f"c{i:04d}" for i in range(n_convs)], turns_per)
    turn = np.tile(np.arange(turns_per), n_convs)
    order = rng.permutation(len(conv))
    t = pa.table(
        {
            "conv_id": conv[order],
            "turn_idx": turn[order].astype(np.int32),
            "role": ["user"] * len(conv),
            "text": [f"t{i}" for i in order],
            "ts": pa.array(np.zeros(len(conv), np.int64), pa.timestamp("us")),
            "tool": pa.nulls(len(conv), pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(8), conv, turn


def test_sorted_write_replays_global_order(ray_session, tmp_path):
    ds, conv, turn = _scrambled_ds()
    out = str(tmp_path / "sorted_out")
    write_transcripts(ds, out, sort=True)
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) >= 1
    got = pa.concat_tables([pq.read_table(f) for f in files])
    got_keys = list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
    want = sorted(zip(conv.tolist(), [int(x) for x in turn]))
    assert got_keys == want  # ORDER-sensitive comparison


def test_unsorted_write_keeps_rows(ray_session, tmp_path):
    ds, conv, turn = _scrambled_ds(seed=5)
    out = str(tmp_path / "unsorted_out")
    write_transcripts(ds, out, sort=False)
    got = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(out + "/*.parquet"))]
    )
    assert len(got) == len(conv)
