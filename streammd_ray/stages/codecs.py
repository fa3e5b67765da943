"""Real compressed-image codecs in pure numpy + stdlib: PNG, GIF (incl.
animation → the real *video* path), and baseline/progressive JPEG (in
:mod:`.jpeg`).

Rounds 1–3 shipped PPM/PGM/WAV/BMP as the "real codec" tier and left
JPEG/video as registry stubs because no imaging library (pillow/pyav) is in
the container. This module closes that gap from the spec side instead: the
formats are decoded from their public specifications —

- **PNG** (RFC 2083 / W3C PNG spec): stdlib ``zlib`` inflate + the five
  scanline filters (None/Sub/Up/Average/Paeth), bit depths 1/2/4/8/16,
  color types gray / RGB / palette / gray+alpha / RGBA, ``tRNS``
  transparency, multi-``IDAT`` streams, Adam7 interlace, per-chunk CRC
  verification. ``encode_png`` (filter-0 + zlib) makes the PNG codec a full
  transcode citizen (resize stage re-encodes).
- **GIF** (GIF87a/GIF89a spec): the GIF flavor of LZW (variable 3..12-bit
  codes, deferred-clear tables), global/local color tables, 4-pass row
  interlace, GCE transparency/delay, and frame composition with disposal
  methods 1/2/3 — so an animated GIF decodes to a real ``(frames, h, w, 4)``
  stack and the frame-sampling video stage operates on actual frames.
- **JPEG** (ITU-T T.81): see :mod:`streammd_ray.stages.jpeg` — huffman
  entropy decode, baseline AND progressive (spectral selection + successive
  approximation), restart markers, chroma subsampling, vectorized
  dequant+IDCT.

Reference parity note: the reference engine (delocalizer/streammd) has no
media path at all — this family exists for the 100-TB training-data
pipeline mandate (multimodal columns as opaque binary + typed metadata).
The decoders favor clarity + numpy vectorization over micro-optimized bit
twiddling; media stages run them inside small-batch actor pools where the
per-payload cost is the budget, and a deployment with pillow/pyav can still
``register_codec`` a native decoder over these by name (``overwrite=True``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_png",
    "encode_png",
    "decode_gif",
    "decode_gif_frames",
    "encode_gif",
    "register_builtin_codecs",
]

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = bytes([137, 80, 78, 71, 13, 10, 26, 10])

# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) for every chunk, verifying each CRC."""
    if payload[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG payload: {payload[:8]!r}")
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            break  # chunk body/CRC past the end → truncated (error below)
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        yield typ, data
        pos += 12 + length
        if typ == b"IEND":
            return
    raise ValueError("PNG truncated before IEND")


def _paeth_row(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Paeth unfilter one scanline. The x-recurrence is inherently
    sequential (recon[x] needs recon[x-bpp]); loop per byte in Python —
    acceptable at media-stage batch sizes, and only rows that actually used
    filter 4 pay it."""
    out = row.tolist()  # plain-int arithmetic ≈ 10× numpy scalar indexing
    pr = prev.tolist()
    for x in range(len(out)):
        a = out[x - bpp] if x >= bpp else 0
        b = pr[x]
        c = pr[x - bpp] if x >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        out[x] = (out[x] + pred) & 0xFF
    return np.array(out, np.uint8)


def _average_row(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = row.tolist()
    pr = prev.tolist()
    for x in range(len(out)):
        a = out[x - bpp] if x >= bpp else 0
        out[x] = (out[x] + ((a + pr[x]) >> 1)) & 0xFF
    return np.array(out, np.uint8)


def _unfilter(raw: np.ndarray, h: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering. ``raw`` is (h, 1 + rowbytes) uint8.
    Filters None/Up are whole-row vectorized; Sub is a per-lane cumulative
    sum (vectorized modular prefix sum); Average/Paeth fall back to the
    sequential recurrence the spec defines."""
    recon = np.empty((h, rowbytes), np.uint8)
    prev = np.zeros(rowbytes, np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        row = raw[y, 1:]
        if ftype == 0:
            r = row.copy()
        elif ftype == 1:  # Sub: recon[x] = row[x] + recon[x-bpp] → prefix sum per lane
            lanes = row.reshape(-1, bpp).astype(np.int64)
            r = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(rowbytes)
        elif ftype == 2:  # Up
            r = (row.astype(np.int64) + prev) % 256
            r = r.astype(np.uint8)
        elif ftype == 3:
            r = _average_row(row, prev, bpp)
        elif ftype == 4:
            r = _paeth_row(row, prev, bpp)
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        recon[y] = r
        prev = r
    return recon


def _rows_to_samples(recon: np.ndarray, w: int, channels: int, bitdepth: int) -> np.ndarray:
    """(h, rowbytes) filtered-out bytes → (h, w, channels) sample array
    (uint8; 16-bit samples are reduced to their high byte)."""
    h = recon.shape[0]
    if bitdepth == 8:
        return recon[:, : w * channels].reshape(h, w, channels)
    if bitdepth == 16:
        u16 = recon.reshape(h, -1)[:, : w * channels * 2]
        hi = u16.reshape(h, w * channels, 2)[:, :, 0]  # big-endian high byte
        return hi.reshape(h, w, channels)
    # bitdepth < 8 → only gray (ct 0) / palette (ct 3), channels == 1
    bits = np.unpackbits(recon, axis=1)
    per = bits[:, : w * bitdepth].reshape(h, w, bitdepth)
    weights = (1 << np.arange(bitdepth - 1, -1, -1)).astype(np.uint16)
    vals = (per * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(h, w, 1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w), (h, w, 3) or (h, w, 4).

    Full static-PNG support: bit depths 1/2/4/8/16 (16-bit reduced to the
    high byte so every codec in the registry speaks uint8), color types
    0/2/3/4/6, tRNS (palette alpha AND gray/RGB color-key), multi-IDAT,
    Adam7 interlace, per-chunk CRC verification.
    """
    ihdr = None
    plte = None
    trns = None
    idat = []
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, bitdepth, ct, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG compression/filter method {comp}/{filt} unknown")
    if ct not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ct} invalid")
    channels = _PNG_CHANNELS[ct]
    bpp = max(1, channels * bitdepth // 8)
    data = zlib.decompress(b"".join(idat))

    def _pass(buf: np.ndarray, pw: int, ph: int) -> np.ndarray:
        rowbytes = (pw * channels * bitdepth + 7) // 8
        raw = buf[: ph * (1 + rowbytes)].reshape(ph, 1 + rowbytes)
        return _rows_to_samples(_unfilter(raw, ph, rowbytes, bpp), pw, channels, bitdepth), ph * (1 + rowbytes)

    full = np.frombuffer(data, np.uint8)
    if interlace == 0:
        samples, used = _pass(full, w, h)
    elif interlace == 1:
        samples = np.zeros((h, w, channels), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            sub, used = _pass(full[off:], pw, ph)
            off += used
            samples[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"PNG interlace method {interlace} unknown")

    # scale sub-8-bit gray to full range; palette indices stay raw
    if ct == 0 and bitdepth < 8:
        samples = (samples.astype(np.uint16) * (255 // ((1 << bitdepth) - 1))).astype(np.uint8)

    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = samples[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            a = np.frombuffer(trns, np.uint8)
            alpha[: len(a)] = a
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ct == 0:
        gray = samples[:, :, 0]
        if trns is not None and bitdepth in (8, 16):
            (key,) = struct.unpack(">H", trns)
            key8 = (key >> 8) if bitdepth == 16 else key
            alpha = np.where(gray == key8, 0, 255).astype(np.uint8)
            return np.dstack([gray, gray, gray, alpha])
        return gray
    if ct == 2:
        rgb = samples
        if trns is not None:
            kr, kg, kb = struct.unpack(">HHH", trns)
            shift = 8 if bitdepth == 16 else 0
            key = np.array([kr >> shift, kg >> shift, kb >> shift], np.uint8)
            alpha = np.where((rgb == key).all(axis=2), 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    if ct == 4:  # gray + alpha → expand to RGBA for a uniform contract
        g, a = samples[:, :, 0], samples[:, :, 1]
        return np.dstack([g, g, g, a])
    return samples  # ct == 6, RGBA


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes (8-bit, filter 0,
    single IDAT). Enough for the resize stage's real transcode and for
    deterministic test-payload synthesis."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ct = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        ct = 2
    elif img.ndim == 3 and img.shape[2] == 4:
        ct = 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    rows = img.reshape(h, -1)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), rows], axis=1)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first variable-width codes (min+1 .. 12 bits),
    clear/EOI codes, deferred clear (table caps at 4096 until the encoder
    emits CLEAR). Returns the palette-index stream as uint8."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    acc = 0
    accbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    out = bytearray()
    while True:
        while accbits < code_size and pos < n:
            acc |= data[pos] << accbits
            accbits += 8
            pos += 1
        if accbits < code_size:
            break  # ran out of bits (tolerate missing EOI like real decoders)
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        accbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW: code beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        out += entry
        if len(out) >= max_pixels:
            break
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return np.frombuffer(bytes(out[:max_pixels]), np.uint8)


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        parts.append(payload[pos : pos + size])
        pos += size


def decode_gif_frames(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → (frames, delays_ms): uint8 RGBA stack (n, h, w, 4) with
    full animation semantics — GCE transparency, per-frame local palettes,
    4-pass interlace, disposal methods 1 (keep) / 2 (restore background,
    composited as transparent per modern-renderer convention) / 3 (restore
    previous). Single-image GIFs yield a 1-frame stack."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload: {payload[:6]!r}")
    w, h = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 4), np.uint8)  # transparent canvas
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent_idx = -1
    disposal = 0
    delay = 0

    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, delay, tidx = struct.unpack_from("<BHB", payload, pos + 1)
                transparent_idx = tidx if gflags & 1 else -1
                disposal = (gflags >> 2) & 7
                pos += 1 + size
                pos += 1  # block terminator
            else:  # comment / plain text / application — skip sub-blocks
                _, pos = _gif_subblocks(payload, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        # image descriptor
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
        iflags = payload[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(payload, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _gif_subblocks(payload, pos)
        idx = _lzw_decode(mcs, data, fw * fh)
        if len(idx) < fw * fh:  # tolerate short streams by padding with bg
            idx = np.concatenate([idx, np.zeros(fw * fh - len(idx), np.uint8)])
        idx = idx.reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows stored in 4 passes
            order = np.concatenate(
                [np.arange(0, fh, 8), np.arange(4, fh, 8), np.arange(2, fh, 4), np.arange(1, fh, 2)]
            )
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        mask = np.ones((fh, fw), bool) if transparent_idx < 0 else idx != transparent_idx
        rgba = np.dstack([pal[np.minimum(idx, len(pal) - 1)], np.full((fh, fw), 255, np.uint8)])
        region[mask] = rgba[mask]
        frames.append(canvas.copy())
        delays.append(delay * 10)  # GIF delay unit = 10 ms

        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        disposal = 0
        transparent_idx = -1
        delay = 0

    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def _lzw_encode_literal(indices: np.ndarray, min_code_size: int) -> bytes:
    """Spec-conforming GIF LZW stream emitting only literal root codes.

    Tracks the decoder's table-growth / code-width schedule in lockstep (the
    decoder adds one table entry per code after the first since the last
    CLEAR, bumping the width when the table reaches ``1 << width``) and
    emits CLEAR before the table can reach 4096 — a valid stream every GIF
    decoder accepts, trading compression for simplicity. This is the
    encoder half the tests drive the real decoder with; real files exercise
    the compressing case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    width = min_code_size + 1
    emit(clear, width)
    table = clear + 2
    first = True
    for v in np.asarray(indices, np.uint8).ravel():
        emit(int(v), width)
        if first:
            first = False
        else:
            table += 1
            if table == (1 << width) and width < 12:
                width += 1
        if table >= 4094:
            emit(clear, width)
            width = min_code_size + 1
            table = clear + 2
            first = True
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_pack_subblocks(data: bytes) -> bytes:
    parts = []
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00")
    return b"".join(parts)


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    *,
    delays_ms: list[int] | None = None,
    transparent_idx: int | None = None,
) -> bytes:
    """Palette-indexed frames → GIF89a bytes (global color table, full-frame
    images, literal-code LZW). ``frames`` is (h, w) or (n, h, w) uint8
    indices into ``palette`` (k, 3) uint8 with k a power of two in 2..256.
    Multi-frame input with ``delays_ms`` produces a real animation (the
    'gif_frames' video codec decodes it back to an (n, h, w, 4) stack)."""
    frames = np.asarray(frames, np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    palette = np.ascontiguousarray(palette, np.uint8)
    k = len(palette)
    if k < 2 or k > 256 or k & (k - 1):
        raise ValueError(f"palette size {k} must be a power of two in 2..256")
    if int(frames.max(initial=0)) >= k:
        raise ValueError("frame index outside palette")
    size_bits = k.bit_length() - 2  # k = 2 ** (size_bits + 1)
    mcs = max(2, k.bit_length() - 1)  # LZW minimum code size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (7 << 4) | size_bits, 0, 0])  # GCT flag, bg, aspect
    out += palette.tobytes()
    for i in range(n):
        delay = (delays_ms[i] if delays_ms else 0) // 10
        if delays_ms or transparent_idx is not None:
            gflags = 1 if transparent_idx is not None else 0
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", gflags, delay, transparent_idx or 0
            ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([mcs])
        out += _gif_pack_subblocks(_lzw_encode_literal(frames[i], mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as uint8 RGB (h, w, 3), composited over black — the
    image-kind view of a GIF (features/dims want 1 or 3 channels)."""
    frames, _ = decode_gif_frames(payload)
    f = frames[0].astype(np.uint16)
    alpha = f[:, :, 3:4]
    return ((f[:, :, :3] * alpha) // 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# registry wiring
# ---------------------------------------------------------------------------


def register_builtin_codecs() -> None:
    """Register png/gif/jpeg into the multimodal codec registry (idempotent).

    Called at import time from :mod:`.multimodal` so ``decode_media(ds,
    decoder='png')`` works out of the box, same as 'ppm'/'bmp'/'wav'."""
    from .jpeg import decode_jpeg
    from .multimodal import (
        MediaCodec,
        _CODECS,
        _image_dims,
        image_features,
        nn_resize,
        register_codec,
    )

    def _reg(codec: MediaCodec) -> None:
        if codec.name not in _CODECS:
            register_codec(codec)

    _reg(MediaCodec("png", "image", decode_png, encode_png, _image_dims, image_features, nn_resize))
    _reg(MediaCodec("gif", "image", decode_gif, dims=_image_dims, features=image_features))
    _reg(MediaCodec("jpeg", "image", decode_jpeg, dims=_image_dims, features=image_features))

    def _video_dims(decoded: tuple[np.ndarray, list[int]]) -> tuple[int, int, int]:
        frames, _ = decoded
        # typed-metadata reuse of the three int32 columns: (w, h, n_frames)
        return (frames.shape[2], frames.shape[1], frames.shape[0])

    def _video_features(decoded: tuple[np.ndarray, list[int]]) -> np.ndarray:
        frames, _ = decoded
        # mean per-frame luminance histogram (alpha-weighted RGB over black)
        lum = (
            frames[:, :, :, :3].astype(np.float64)
            @ np.array([0.299, 0.587, 0.114])
            * (frames[:, :, :, 3:4].astype(np.float64) / 255.0)[:, :, :, 0]
        )
        hist = np.bincount(
            np.clip(lum / 256.0 * 16, 0, 15).astype(np.int64).ravel(), minlength=16
        ).astype(np.float64)
        return hist / max(1, lum.size)

    _reg(
        MediaCodec(
            "gif_frames", "video", decode_gif_frames, dims=_video_dims, features=_video_features
        )
    )
