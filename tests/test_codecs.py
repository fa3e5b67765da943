"""PNG / GIF codec conformance (stages/codecs.py).

Validation strategy (same discipline as the Bloom/KLL pinned suites): the
decoders are driven by *spec-derived forward transforms built in this test
file* — a PNG scanline filterer implementing all five filters in the forward
direction plus an Adam7 forward interlacer, and hand-assembled GIF blocks
over the library's literal LZW stream — so decode paths are checked against
independent constructions, not against themselves. Real files from the
container (libpng's pngtest.png, the libxslt GIF logos) pin the decoders
against real-encoder output, and Ray actor-pool integration drives the
registry end to end (including the gif_frames video path).
"""

import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from streammd_ray.stages.codecs import (
    _lzw_encode_literal,
    decode_gif,
    decode_gif_frames,
    decode_png,
    encode_gif,
    encode_png,
)

PNGTEST = "/usr/share/doc/libpng-dev/examples/pngtest.png"
GIF_LOGO = "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-180x168.gif"
GIF_REDHAT = "/usr/share/doc/libxslt1-dev/html/redhat.gif"


# ---------------------------------------------------------------------------
# test-local PNG forward construction (RFC 2083 §6: filters in the forward
# direction; §2.6: Adam7 pass extraction)
# ---------------------------------------------------------------------------


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth_pred(a, b, c):
    p = a.astype(np.int32) + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def _forward_filter(rows: np.ndarray, ftypes, bpp: int) -> bytes:
    """Apply the spec's five filters in the FORWARD direction (encoder side)
    to (h, rowbytes) uint8 rows, choosing filter ``ftypes[y]`` per row."""
    h, rb = rows.shape
    out = bytearray()
    prev = np.zeros(rb, np.int32)
    for y in range(h):
        row = rows[y].astype(np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        f = ftypes[y % len(ftypes)]
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - a
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - ((a + prev) >> 1)
        else:
            filt = row - _paeth_pred(a, prev, c)
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def _build_png(img: np.ndarray, ftypes=(0,), interlace: int = 0) -> bytes:
    """8-bit gray/RGB/RGBA image → PNG via the forward filters above,
    optionally Adam7-interlaced (forward pass extraction per spec)."""
    if img.ndim == 2:
        ct, channels = 0, 1
    elif img.shape[2] == 3:
        ct, channels = 2, 3
    else:
        ct, channels = 6, 4
    h, w = img.shape[:2]
    bpp = channels
    if interlace == 0:
        raw = _forward_filter(img.reshape(h, -1), ftypes, bpp)
    else:
        adam7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        parts = []
        for x0, y0, dx, dy in adam7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(_forward_filter(sub.reshape(sub.shape[0], -1), ftypes, bpp))
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, interlace)
    return (
        bytes([137, 80, 78, 71, 13, 10, 26, 10])
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("ftypes", [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_png_all_five_filters_forward_roundtrip(channels, ftypes):
    rng = np.random.default_rng(channels * 10 + ftypes[0])
    shape = (13, 11) if channels == 1 else (13, 11, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_png(_build_png(img, ftypes)), img)


@pytest.mark.parametrize("hw", [(1, 1), (7, 9), (8, 8), (17, 23), (31, 2)])
def test_png_adam7_interlace_roundtrip(hw):
    rng = np.random.default_rng(sum(hw))
    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    # cycle all five filters inside every Adam7 pass
    assert np.array_equal(
        decode_png(_build_png(img, (0, 1, 2, 3, 4), interlace=1)), img
    )


def _build_png_raw(ihdr: bytes, raw: bytes, extra=()) -> bytes:
    out = bytes([137, 80, 78, 71, 13, 10, 26, 10]) + _png_chunk(b"IHDR", ihdr)
    for typ, data in extra:
        out += _png_chunk(typ, data)
    # split across two IDATs to cover multi-IDAT reassembly
    z = zlib.compress(raw)
    mid = len(z) // 2
    return out + _png_chunk(b"IDAT", z[:mid]) + _png_chunk(b"IDAT", z[mid:]) + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("bitdepth", [1, 2, 4])
def test_png_sub8bit_gray_packing_and_scaling(bitdepth):
    rng = np.random.default_rng(bitdepth)
    h, w = 5, 11  # w chosen so rows end mid-byte (padding bits exercised)
    vals = rng.integers(0, 1 << bitdepth, (h, w), dtype=np.uint8)
    rows = bytearray()
    for y in range(h):
        bits = np.unpackbits(vals[y][:, None] << (8 - bitdepth), axis=1)[:, :bitdepth]
        packed = np.packbits(bits.ravel())
        rows += b"\x00" + packed.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, 0, 0, 0, 0)
    out = decode_png(_build_png_raw(ihdr, bytes(rows)))
    assert np.array_equal(out, (vals * (255 // ((1 << bitdepth) - 1))).astype(np.uint8))


def test_png_16bit_reduces_to_high_byte():
    rng = np.random.default_rng(16)
    h, w = 6, 7
    hi = rng.integers(0, 256, (h, w), dtype=np.uint8)
    lo = rng.integers(0, 256, (h, w), dtype=np.uint8)
    be = np.stack([hi, lo], axis=-1)  # explicit big-endian byte pairs
    rows = b"".join(b"\x00" + be[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    assert np.array_equal(decode_png(_build_png_raw(ihdr, rows)), hi)


def test_png_palette_with_trns_alpha():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    # tRNS shorter than the palette: entries past it default opaque
    out = decode_png(
        _build_png_raw(ihdr, rows, extra=[(b"PLTE", plte.tobytes()), (b"tRNS", bytes([0, 128]))])
    )
    assert out.shape == (2, 4, 4)
    assert np.array_equal(out[:, :, :3], plte[idx])
    alpha = np.array([255, 255, 255, 255], np.uint8)
    alpha_lut = np.array([0, 128, 255, 255], np.uint8)
    assert np.array_equal(out[:, :, 3], alpha_lut[idx])
    # no tRNS → plain RGB
    out3 = decode_png(_build_png_raw(ihdr, rows, extra=[(b"PLTE", plte.tobytes())]))
    assert np.array_equal(out3, plte[idx])


def test_png_gray_alpha_expands_to_rgba():
    rng = np.random.default_rng(8)
    ga = rng.integers(0, 256, (4, 5, 2), dtype=np.uint8)
    rows = b"".join(b"\x00" + ga[y].tobytes() for y in range(4))
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 4, 0, 0, 0)
    out = decode_png(_build_png_raw(ihdr, rows))
    g, a = ga[:, :, 0], ga[:, :, 1]
    assert np.array_equal(out, np.dstack([g, g, g, a]))


def test_png_colorkey_trns():
    # RGB color-key: the exact key color becomes alpha 0
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 1] = [10, 20, 30]
    rows = b"".join(b"\x00" + img[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    key = struct.pack(">HHH", 10, 20, 30)
    out = decode_png(_build_png_raw(ihdr, rows, extra=[(b"tRNS", key)]))
    assert out.shape == (2, 3, 4)
    assert out[0, 1, 3] == 0 and out[0, 0, 3] == 255
    # gray color-key
    g = np.array([[7, 8], [9, 7]], np.uint8)
    rows = b"".join(b"\x00" + g[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    out = decode_png(_build_png_raw(ihdr, rows, extra=[(b"tRNS", struct.pack(">H", 7))]))
    assert np.array_equal(out[:, :, 3], np.where(g == 7, 0, 255))


def test_png_crc_and_truncation_rejected():
    img = np.zeros((3, 3), np.uint8)
    p = bytearray(encode_png(img))
    p[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(bytes(encode_png(img))[:-20])
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a" + bytes(16))


def test_png_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    for shape in [(9, 4), (5, 6, 3), (7, 3, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_real_file_pngtest():
    """libpng's canonical test image: dims/type pinned, plus an independent
    re-encode cycle — their filters on the way in, our filter-0 encoder on
    the way out — must preserve every pixel."""
    img = decode_png(open(PNGTEST, "rb").read())
    assert img.shape == (69, 91, 4) and img.dtype == np.uint8
    assert abs(float(img.mean()) - 56.06) < 0.1
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_real_file_git_logo():
    img = decode_png(open("/usr/share/gitweb/static/git-logo.png", "rb").read())
    assert img.shape == (27, 72, 3)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_lzw_width_growth_and_deferred_clear():
    """256-color literal stream long enough to walk code width 9→12 and
    force a mid-stream CLEAR (table cap) — the decoder must track both."""
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 256, (90, 80), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    frames, _ = decode_gif_frames(encode_gif(idx, pal))
    assert np.array_equal(frames[0, :, :, :3], pal[idx])
    assert (frames[0, :, :, 3] == 255).all()
    # stream is long enough that the encoder had to emit a deferred CLEAR
    assert idx.size > 4094


def test_gif_small_palette_min_code_size():
    # 2-entry palette → LZW minimum code size clamps to 2 per spec
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = (np.indices((9, 7)).sum(axis=0) % 2).astype(np.uint8)
    frames, _ = decode_gif_frames(encode_gif(idx, pal))
    assert np.array_equal(frames[0, :, :, :3], pal[idx])


def _gif_header(w, h, pal):
    size_bits = len(pal).bit_length() - 2
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0x80 | size_bits, 0, 0])
        + np.asarray(pal, np.uint8).tobytes()
    )


def _gif_image_block(idx, mcs, *, left=0, top=0, flags=0):
    fh, fw = idx.shape
    data = _lzw_encode_literal(idx, mcs)
    sub = b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    )
    return (
        b"\x2c"
        + struct.pack("<HHHH", left, top, fw, fh)
        + bytes([flags])
        + bytes([mcs])
        + sub
        + b"\x00"
    )


def _gce(*, disposal=0, transparent=None, delay_cs=0):
    gflags = (disposal << 2) | (1 if transparent is not None else 0)
    return b"\x21\xf9\x04" + struct.pack("<BHB", gflags, delay_cs, transparent or 0) + b"\x00"


def test_gif_interlaced_rows():
    """Hand-built interlaced image: rows stored in the spec's 4-pass order
    (flag 0x40) must come back in natural order."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, (13, 5), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [80, 0, 0], [0, 80, 0], [0, 0, 80]], np.uint8)
    order = np.concatenate(
        [np.arange(0, 13, 8), np.arange(4, 13, 8), np.arange(2, 13, 4), np.arange(1, 13, 2)]
    )
    stored = idx[order]  # forward interlace: write rows in pass order
    payload = _gif_header(5, 13, pal) + _gif_image_block(stored, 2, flags=0x40) + b"\x3b"
    frames, _ = decode_gif_frames(payload)
    assert np.array_equal(frames[0, :, :, :3], pal[idx])


def test_gif_local_palette_overrides_global():
    gpal = np.zeros((2, 3), np.uint8)
    lpal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    data = _lzw_encode_literal(idx, 2)
    block = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2)
        + bytes([0x80])  # local color table flag, size 2
        + lpal.tobytes()
        + bytes([2]) + bytes([len(data)]) + data + b"\x00"
    )
    payload = _gif_header(2, 2, gpal) + block + b"\x3b"
    frames, _ = decode_gif_frames(payload)
    assert np.array_equal(frames[0, :, :, :3], lpal[idx])


def test_gif_animation_disposal_methods():
    """Three-frame animation exercising disposal 1 (keep), 2 (restore
    background → transparent), 3 (restore previous), with a transparent
    index and sub-rectangle frames composited onto the canvas."""
    pal = np.array([[0, 0, 0], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    base = np.full((4, 4), 1, np.uint8)  # full red frame, disposal 1
    patch2 = np.full((2, 2), 2, np.uint8)  # green patch, disposal 3
    patch3 = np.array([[3, 0]], np.uint8)  # blue+transparent, disposal 2
    payload = (
        _gif_header(4, 4, pal)
        + _gce(disposal=1, delay_cs=5)
        + _gif_image_block(base, 2)
        + _gce(disposal=3, delay_cs=5)
        + _gif_image_block(patch2, 2, left=1, top=1)
        + _gce(disposal=2, transparent=0, delay_cs=5)
        + _gif_image_block(patch3, 2, left=2, top=3)
        + b"\x3b"
    )
    frames, delays = decode_gif_frames(payload)
    assert frames.shape == (3, 4, 4, 4) and delays == [50, 50, 50]
    f0 = np.dstack([pal[base], np.full((4, 4), 255, np.uint8)])
    assert np.array_equal(frames[0], f0)
    # frame 1: green patch over red base
    exp1 = f0.copy()
    exp1[1:3, 1:3, :3] = pal[2]
    assert np.array_equal(frames[1], exp1)
    # frame 2: disposal 3 on frame 1 restored the base, then blue pixel at
    # (3,2); the transparent idx at (3,3) leaves red
    exp2 = f0.copy()
    exp2[3, 2, :3] = pal[3]
    assert np.array_equal(frames[2], exp2)


def test_gif_real_files():
    img = decode_gif(open(GIF_LOGO, "rb").read())
    assert img.shape == (68, 180, 3)
    frames, _ = decode_gif_frames(open(GIF_REDHAT, "rb").read())
    assert frames.shape[1:] == (41, 44, 4)
    # libxslt's interlaced logo, if present, covers real interlaced output
    p = "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-90x34.gif"
    if os.path.exists(p):
        assert decode_gif(open(p, "rb").read()).shape[1] == 90


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG" + bytes(16))


# ---------------------------------------------------------------------------
# Ray actor-pool integration through the registry
# ---------------------------------------------------------------------------


def test_png_decode_media_actor_pool(ray_session):
    import ray.data as rd

    from streammd_ray.stages.multimodal import decode_media, make_png_media_table

    out = (
        decode_media(rd.from_arrow(make_png_media_table(24)), decoder="png", batch_size=8)
        .to_pandas()
        .sort_values("media_id")
    )
    for i, row in out.reset_index().iterrows():
        assert (row["width"], row["height"]) == (8 + (i * 61) % 56, 8 + (i * 37) % 56)
        assert row["channels"] == 3 + i % 2


def test_png_resize_media_real_transcode(ray_session):
    import ray.data as rd

    from streammd_ray.stages.multimodal import make_png_media_table, resize_media

    out = (
        resize_media(
            rd.from_arrow(make_png_media_table(8)), max_side=16, decoder="png", batch_size=4
        )
        .to_pandas()
        .sort_values("media_id")
    )
    for _, row in out.iterrows():
        img = decode_png(row["payload"])  # payload re-encoded as real PNG
        assert max(img.shape[:2]) <= 16
        assert row["n_bytes"] == len(row["payload"])


def test_gif_frames_video_decode_media(ray_session):
    import ray.data as rd

    from streammd_ray.stages.multimodal import decode_media, make_gif_media_table

    out = (
        decode_media(rd.from_arrow(make_gif_media_table(21)), decoder="gif_frames", batch_size=8)
        .to_pandas()
        .sort_values("media_id")
    )
    for i, row in out.reset_index().iterrows():
        # video dims triplet: (w, h, n_frames) in the three int32 columns
        assert row["width"] == 6 + (i * 17) % 27
        assert row["height"] == 6 + (i * 13) % 27
        assert row["channels"] == 1 + (i * 5) % 7
        assert len(row["features"]) == 16 and abs(sum(row["features"]) - 1.0) < 1e-9


def test_registry_lists_compressed_codecs():
    from streammd_ray.stages.multimodal import available_decoders

    assert {"png", "gif", "jpeg", "gif_frames"} <= set(available_decoders())
