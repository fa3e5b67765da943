"""Multimodal (image/audio/video) stages — real Ray plumbing, stubbed codecs.

Media travels as opaque ``binary`` columns with typed metadata (media_type,
byte length). The decode / feature-extract / resize / frame-sample operators
are actor-pool ``map_batches`` stages with real schemas, batch sizing and
output layout; the codec itself is stubbed because no image/audio library
ships in this container:

- ``decoder="stub"`` raises NotImplementedError at the exact call site a
  real decoder (PIL / torchaudio / pyav) would plug into;
- ``decoder="fake"`` produces *deterministic* pseudo-features from the raw
  bytes (dimensions from a seeded hash, a 16-bin byte histogram) so the
  plumbing — including downstream groupbys and writes — is fully testable.

Batch sizing note (SURVEY.md §7.3 "very wide values"): media rows are large,
so these stages default to small ``batch_size`` and callers should lower
``DataContext.target_max_block_size`` proportionally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash64_batch

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def make_fake_media_table(n: int = 64, *, seed: int = 5, kind: str = "image") -> pa.Table:
    """Deterministic synthetic media rows (random bytes) for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, rng.integers(64, 4096), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class MediaDecodeStage:
    """Actor-pool decode + feature extraction.

    Output appends: width, height, channels (image) / sample_rate, n_samples
    (audio), plus a 16-dim byte-histogram feature vector (list<float>).
    """

    def __init__(self, *, decoder: str = "stub"):
        if decoder not in ("stub", "fake"):
            raise ValueError(f"unknown decoder: {decoder}")
        self.decoder = decoder
        # a real implementation would load the codec/model here, once per actor

    def _decode_real(self, payloads):  # pragma: no cover - by design
        raise NotImplementedError(
            "no image/audio codec in this environment; plug PIL/pyav here "
            "or use decoder='fake' for deterministic plumbing tests"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.decoder == "stub":
            self._decode_real(payloads)
        # fake decode: deterministic dims from a hash of the payload bytes,
        # 16-bin byte histogram as the "feature"
        h = hash64_batch([p.hex() for p in payloads], seed=3)
        width = (h % np.uint64(1920)).astype(np.int32) + 1
        height = ((h >> np.uint64(16)) % np.uint64(1080)).astype(np.int32) + 1
        feats = []
        for p in payloads:
            arr = np.frombuffer(p, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
            feats.append(hist / max(1, len(arr)))
        return (
            batch.append_column("width", pa.array(width, pa.int32()))
            .append_column("height", pa.array(height, pa.int32()))
            .append_column("channels", pa.array(np.full(len(payloads), 3), pa.int32()))
            .append_column(
                "features", pa.array(feats, pa.list_(pa.float64(), 16))
            )
        )


class MediaResizeStage:
    """Resize stub: recomputes target dims (aspect-preserving), passes payload
    through. A real stage would transcode the payload."""

    def __init__(self, *, max_side: int = 256, decoder: str = "stub"):
        self.max_side = max_side
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "no codec in this environment; use decoder='fake'"
            )
        w = np.asarray(batch["width"].combine_chunks(), dtype=np.float64)
        h = np.asarray(batch["height"].combine_chunks(), dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        from .text import set_column

        batch = set_column(
            batch, "width", pa.array((w * scale).astype(np.int32), pa.int32())
        )
        return set_column(
            batch, "height", pa.array((h * scale).astype(np.int32), pa.int32())
        )


def frame_sample_plan(n_frames: int, every: int) -> np.ndarray:
    """Deterministic frame-sampling indices (video stub helper)."""
    return np.arange(0, n_frames, every, dtype=np.int64)


def decode_media(ds, *, decoder: str = "stub", batch_size: int = 16, concurrency=(1, 4)):
    """Run the decode stage as an actor pool with media-sized batches."""
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
