"""Checkpoint/resume: wave outputs, lineage manifest, resume-skips-done,
cross-wave duplicate detection survives resume."""

import glob
import json
import os

import pandas as pd
import pytest

from streammd_ray.sources import generate_transcripts
from streammd_ray.state import run_with_checkpoint


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckptdata"))
    paths, truth = generate_transcripts(
        out, n_turns=12_000, seed=23, dup_frac=0.3, n_files=8, return_truth=True
    )
    return paths, truth.to_pandas()


def test_full_run_and_metrics(ray_session, data, tmp_path):
    paths, truth = data
    manifest = run_with_checkpoint(
        paths,
        ckpt_dir=str(tmp_path / "ckpt"),
        out_dir=str(tmp_path / "out"),
        wave_size=3,
        p=1e-9,
        num_shards=4,
    )
    m = manifest["metrics"]
    assert m["TURNS"] == len(truth)
    assert m["TURNS_NULL_TEXT"] == int(truth["text"].isna().sum())
    # cross-wave dups must be caught: total dup count matches ground truth
    assert m["TURNS_MARKED_DUPLICATE"] == int(truth["is_duplicate"].sum())
    # HLL conversations within its error bound
    true_convs = truth["conv_id"].nunique()
    assert abs(m["CONVERSATIONS"] - true_convs) / true_convs < 0.05
    # wave outputs exist, one dir per wave (resumable layout)
    waves = sorted(glob.glob(str(tmp_path / "out" / "wave-*")))
    assert len(waves) == 3  # ceil(8/3)
    # lineage recorded
    assert manifest["config"]["hasher"]
    assert manifest["config"]["num_shards"] == 4
    for w in manifest["waves"].values():
        assert w["status"] == "done" and w["files"]


def test_resume_skips_done_waves(ray_session, data, tmp_path, monkeypatch):
    paths, truth = data
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    # run only the first wave, then "crash"
    import streammd_ray.state.checkpoint as cp

    orig = cp.mark_duplicates if hasattr(cp, "mark_duplicates") else None

    calls = {"n": 0}
    from streammd_ray.pipelines.mark_duplicates import mark_duplicates as real_mark

    def crashing_mark(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated crash")
        return real_mark(*a, **k)

    from importlib import import_module

    mdmod = import_module("streammd_ray.pipelines.mark_duplicates")
    monkeypatch.setattr(mdmod, "mark_duplicates", crashing_mark)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_with_checkpoint(
            paths, ckpt_dir=ckpt, out_dir=out, wave_size=2, p=1e-9, num_shards=4
        )
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    done_before = {k for k, v in manifest["waves"].items() if v["status"] == "done"}
    assert len(done_before) == 2
    monkeypatch.undo()

    # resume completes remaining waves without redoing finished ones
    calls2 = {"n": 0}

    def counting_mark(*a, **k):
        calls2["n"] += 1
        return real_mark(*a, **k)

    monkeypatch.setattr(mdmod, "mark_duplicates", counting_mark)
    manifest = run_with_checkpoint(
        paths, ckpt_dir=ckpt, out_dir=out, wave_size=2, p=1e-9, num_shards=4
    )
    assert calls2["n"] == 4 - len(done_before)  # only the unfinished waves ran
    # final metrics still exact: cross-wave dup state was restored
    assert manifest["metrics"]["TURNS_MARKED_DUPLICATE"] == int(
        truth["is_duplicate"].sum()
    )
    assert manifest["metrics"]["TURNS"] == len(truth)


def test_resume_rejects_config_change(ray_session, data, tmp_path):
    paths, _ = data
    ckpt, out = str(tmp_path / "c2"), str(tmp_path / "o2")
    run_with_checkpoint(
        paths[:2], ckpt_dir=ckpt, out_dir=out, wave_size=2, p=1e-9, num_shards=2
    )
    with pytest.raises(ValueError, match="mismatch"):
        run_with_checkpoint(
            paths[:2], ckpt_dir=ckpt, out_dir=out, wave_size=2, p=1e-6, num_shards=2
        )


def test_sketch_states_persisted_per_wave(ray_session, data, tmp_path):
    paths, truth = data
    manifest = run_with_checkpoint(
        paths[:4],
        ckpt_dir=str(tmp_path / "sk"),
        out_dir=str(tmp_path / "sko"),
        wave_size=2,
        p=1e-9,
        num_shards=2,
    )
    for w in manifest["waves"].values():
        assert set(w["sketches"]) == {"convs_hll", "tools_cms", "len_tdigest", "len_kll"}
    est = manifest["sketch_estimates"]
    assert est["len_tdigest"]["p50"] > 0
    assert isinstance(est["tools_cms"], list) and est["tools_cms"]
    assert est["convs_hll"] > 0
