"""Stage-granular checkpoint/resume (state/stages.py) — the round-3
generalization of wave checkpoints to long similarity/derivation jobs.

The key guarantee: a killed-and-resumed minhash job produces BYTE-IDENTICAL
pairs to an uninterrupted run, and completed stages are not recomputed (we
prove it by handing the resumed run a *corrupted* input dataset — identical
output is only possible if the persisted signature stage was reused)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from streammd_ray.stages.similarity import minhash_lsh_pairs
from streammd_ray.state.stages import CheckpointConfigMismatch, StageCheckpoint

RNG = np.random.default_rng(77)
WORDS = np.array(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega red green blue".split()
)


def _doc(n=60):
    return " ".join(RNG.choice(WORDS, n))


@pytest.fixture(scope="module")
def corpus_df():
    docs = [_doc() for _ in range(120)]
    near = [d + " tail" for d in docs[:12]]  # planted near-dups
    texts = docs + near
    return pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})


def _ds(df):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)


def _pairs_df(ds):
    return (
        ds.to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
        .astype({"id_a": np.int64, "id_b": np.int64})
    )


KW = dict(num_perm=64, bands=16, shingle_k=3, threshold=0.5)


class CrashBefore(StageCheckpoint):
    """Simulates a process dying right before a given stage runs."""

    def __init__(self, ckpt_dir, *, crash_before: str, config=None):
        super().__init__(ckpt_dir, config=config)
        self.crash_before = crash_before

    def run(self, name, compute, **kwargs):
        if name == self.crash_before and not self.is_done(name):
            raise RuntimeError("simulated crash")
        return super().run(name, compute, **kwargs)


def test_kill_and_resume_byte_identical(ray_session, corpus_df, tmp_path):
    baseline = _pairs_df(minhash_lsh_pairs(_ds(corpus_df), **KW))
    assert len(baseline) >= 12

    ckpt_dir = str(tmp_path / "job")
    crash = CrashBefore(ckpt_dir, crash_before="candidates", config=KW)
    with pytest.raises(RuntimeError, match="simulated crash"):
        minhash_lsh_pairs(_ds(corpus_df), **KW, checkpoint=crash)
    assert crash.completed() == ["signatures"]

    # resume with a CORRUPTED input: different texts would change every
    # signature, so byte-identical output proves the persisted signature
    # stage was read back instead of recomputed
    poisoned = corpus_df.copy()
    poisoned["text"] = "poison"
    resumed = StageCheckpoint(ckpt_dir, config=KW)
    out = _pairs_df(minhash_lsh_pairs(_ds(poisoned), **KW, checkpoint=resumed))
    pd.testing.assert_frame_equal(out, baseline)
    assert set(resumed.completed()) == {"signatures", "candidates", "pairs"}

    # a third run re-reads only the final persisted stage
    again = _pairs_df(
        minhash_lsh_pairs(
            _ds(poisoned), **KW, checkpoint=StageCheckpoint(ckpt_dir, config=KW)
        )
    )
    pd.testing.assert_frame_equal(again, baseline)


def test_stale_tmp_dir_discarded(ray_session, corpus_df, tmp_path):
    """A crash DURING a stage write leaves <stage>.tmp; resume must discard
    it and rewrite the stage cleanly."""
    ckpt_dir = str(tmp_path / "job2")
    ckpt = StageCheckpoint(ckpt_dir, config=KW)
    stale = tmp_path / "job2" / "signatures.tmp"
    stale.mkdir(parents=True)
    (stale / "garbage.parquet").write_bytes(b"not parquet")
    out = _pairs_df(minhash_lsh_pairs(_ds(corpus_df), **KW, checkpoint=ckpt))
    baseline = _pairs_df(minhash_lsh_pairs(_ds(corpus_df), **KW))
    pd.testing.assert_frame_equal(out, baseline)
    assert not stale.exists()


def test_config_mismatch_raises(tmp_path):
    StageCheckpoint(str(tmp_path / "j"), config={"num_perm": 64})
    with pytest.raises(CheckpointConfigMismatch):
        StageCheckpoint(str(tmp_path / "j"), config={"num_perm": 128})


def test_run_value_cached(tmp_path):
    ckpt = StageCheckpoint(str(tmp_path / "v"), config={})
    calls = []

    def compute():
        calls.append(1)
        return {"k": [1, 2, 3]}

    assert ckpt.run_value("sample", compute) == {"k": [1, 2, 3]}
    # cached in the manifest — survives a fresh StageCheckpoint instance
    ckpt2 = StageCheckpoint(str(tmp_path / "v"), config={})
    assert ckpt2.run_value("sample", compute) == {"k": [1, 2, 3]}
    assert len(calls) == 1
