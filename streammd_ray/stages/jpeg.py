"""Pure numpy + stdlib JPEG decoder (ITU-T T.81): baseline sequential
(SOF0/SOF1) AND progressive (SOF2) huffman JPEG.

Why it exists: the container ships no imaging library, and the two sample
JPEGs available for conformance are *progressive* — so the long-standing
"JPEG is an env-limited stub" row in SURVEY §2 closes only with a real
spec-level decoder. Supported:

- DQT (8- and 16-bit precision, multiple tables), DHT (canonical huffman,
  DC+AC classes), DRI restart intervals, multi-scan files.
- Baseline/extended sequential scans (interleaved + single-component).
- Progressive scans: DC first/refine (successive approximation), AC
  first/refine with EOB-run semantics per T.81 §G.1.2 — the same control
  flow libjpeg documents publicly.
- Chroma subsampling (any h/v factors 1..4; upsampled by sample
  replication), grayscale and YCbCr→RGB (BT.601 full-range); RGB-component
  files (component ids 'R','G','B') pass through without the color
  transform.
- Not supported (raise, never garble): arithmetic coding (SOF9+),
  hierarchical (SOF5..7 lossless modes), 12-bit precision, CMYK/YCCK.

Hot-path design: entropy decoding is a per-symbol Python loop (inherently
sequential bit-serial work), but everything after the coefficient arrays is
vectorized numpy — dequantization, de-zigzag via one fancy-index, IDCT as
two (8,8)@(n,8,8) matmuls against the orthonormal DCT-II matrix, block
assembly via reshape/transpose, and chroma upsampling via ``np.repeat``.
Media stages run decoders inside small-batch actor pools where per-payload
cost is the provisioned budget; a deployment with libjpeg bindings can
``register_codec(..., overwrite=True)`` a native decoder over this one.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg_const"]

# zigzag scan order: ZIGZAG[i] = natural (row-major) index of the i-th
# coefficient in scan order; natural.flat[ZIGZAG] = scan_order_coeffs.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)

# orthonormal 8-point DCT-II matrix M; inverse 2-D transform is M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
    _M[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical huffman table (T.81 Annex C): decode via per-length
    min/max code ranges."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, counts: bytes, vals: bytes):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1


class _Bits:
    """MSB-first bit reader over an unstuffed entropy segment. Reads past
    the end return 0 bits (T.81 allows the decoder to pad; real encoders
    pad the final byte with 1s which the EOB structure makes harmless)."""

    __slots__ = ("buf", "pos", "cur", "nbits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                return 0
            self.cur = self.buf[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, t: _Huff) -> int:
        code = self.bit()
        length = 1
        maxcode = t.maxcode
        while code > maxcode[length]:
            code = (code << 1) | self.bit()
            length += 1
            if length > 16:
                raise ValueError("JPEG: invalid huffman code")
        return t.vals[t.valptr[length] + code - t.mincode[length]]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


class _Component:
    __slots__ = (
        "cid", "h", "v", "tq", "dc", "ac", "pred",
        "px_w", "px_h", "bw", "bh", "bw_pad", "bh_pad", "coeffs",
    )


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos`` to the next real marker, unstuffed
    (FF 00 → FF) and split at restart markers (FF D0..D7) so each restart
    interval becomes its own clean bit stream."""
    segments: list[bytes] = []
    cur = bytearray()
    n = len(data)
    i = pos
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:
            break  # real marker ends the scan
    segments.append(bytes(cur))
    return segments, i


def _decode_scan(
    segments: list[bytes],
    comps: list[_Component],
    scan_comps: list[tuple[_Component, _Huff | None, _Huff | None]],
    *,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    mcux: int,
    mcuy: int,
) -> None:
    """Decode one scan (baseline or one progressive pass) into the
    components' coefficient arrays. Restart intervals map 1:1 onto the
    pre-split ``segments``; each segment resets DC predictors and EOB runs."""
    seg_iter = iter(segments)
    bits = _Bits(next(seg_iter))
    eobrun = 0
    for c, _, _ in scan_comps:
        c.pred = 0

    interleaved = len(scan_comps) > 1
    if interleaved:
        units_total = mcux * mcuy
    else:
        comp = scan_comps[0][0]
        units_total = comp.bw * comp.bh

    p1 = 1 << al
    m1 = -1 << al

    def dc_first(comp: _Component, dct: _Huff, out: np.ndarray) -> None:
        t = bits.huff(dct)
        diff = _extend(bits.read(t), t) if t else 0
        comp.pred += diff
        out[0] = comp.pred << al

    def dc_refine(out: np.ndarray) -> None:
        if bits.bit():
            out[0] |= p1

    def ac_first(act: _Huff, out: np.ndarray) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = bits.huff(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits.read(r)
                    return
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("JPEG: AC coefficient index out of band")
            out[k] = _extend(bits.read(s), s) << al
            k += 1

    def ac_refine(act: _Huff, out: np.ndarray) -> None:
        # T.81 §G.1.2.3 / libjpeg decode_mcu_AC_refine control flow
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = bits.huff(act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += bits.read(r)
                        break  # rest of block handled by the EOB tail below
                    # r == 15: skip 16 zero-history coefficients
                    coef = 0
                else:
                    if s != 1:
                        raise ValueError("JPEG: AC refine magnitude must be 1")
                    coef = p1 if bits.bit() else m1
                # advance over r zero-history coeffs, emitting correction
                # bits for every nonzero-history coeff passed on the way
                while k <= se:
                    cur = out[k]
                    if cur != 0:
                        if bits.bit() and (cur & p1) == 0:
                            out[k] = cur + (p1 if cur > 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    out[k] = coef
                k += 1
        if eobrun > 0:
            while k <= se:
                cur = out[k]
                if cur != 0:
                    if bits.bit() and (cur & p1) == 0:
                        out[k] = cur + (p1 if cur > 0 else m1)
                k += 1
            eobrun -= 1

    def full_block(comp: _Component, dct: _Huff, act: _Huff, out: np.ndarray) -> None:
        t = bits.huff(dct)
        comp.pred += _extend(bits.read(t), t) if t else 0
        out[0] = comp.pred
        k = 1
        while k <= 63:
            rs = bits.huff(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    return
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("JPEG: AC run past block end")
            out[k] = _extend(bits.read(s), s)
            k += 1

    sequential = ss == 0 and se == 63 and ah == 0 and al == 0

    for unit in range(units_total):
        if restart_interval and unit and unit % restart_interval == 0:
            bits = _Bits(next(seg_iter))
            eobrun = 0
            for c, _, _ in scan_comps:
                c.pred = 0
        if interleaved:
            my, mx = divmod(unit, mcux)
            for comp, dct, act in scan_comps:
                for vy in range(comp.v):
                    for hx in range(comp.h):
                        out = comp.coeffs[my * comp.v + vy, mx * comp.h + hx]
                        if sequential:
                            full_block(comp, dct, act, out)
                        elif ss == 0 and ah == 0:
                            dc_first(comp, dct, out)
                        elif ss == 0:
                            dc_refine(out)
                        else:  # AC scans are never interleaved (T.81 B.2.3)
                            raise ValueError("JPEG: interleaved AC progressive scan")
        else:
            comp, dct, act = scan_comps[0]
            by, bx = divmod(unit, comp.bw)
            out = comp.coeffs[by, bx]
            if sequential:
                full_block(comp, dct, act, out)
            elif ss == 0 and ah == 0:
                dc_first(comp, dct, out)
            elif ss == 0:
                dc_refine(out)
            elif ah == 0:
                ac_first(act, out)
            else:
                ac_refine(act, out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → uint8 (h, w) grayscale or (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG payload: {payload[:2]!r}")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[_Component] = []
    by_id: dict[int, _Component] = {}
    restart_interval = 0
    progressive = False
    frame = None  # (w, h, hmax, vmax, mcux, mcuy)
    adobe_transform = None

    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl  # stored in zigzag (scan) order, like the coeffs
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = seg[i + 1 : i + 17]
                nv = sum(counts)
                vals = seg[i + 17 : i + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg)
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"JPEG: only 8-bit precision supported, got {prec}")
            if nc not in (1, 3):
                raise ValueError(f"JPEG: {nc}-component images not supported")
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                c = _Component()
                c.cid, c.h, c.v, c.tq = cid, hv >> 4, hv & 15, tq
                comps.append(c)
                by_id[cid] = c
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c.px_w = -(-w * c.h // hmax)
                c.px_h = -(-h * c.v // vmax)
                c.bw = -(-c.px_w // 8)
                c.bh = -(-c.px_h // 8)
                c.bw_pad = mcux * c.h
                c.bh_pad = mcuy * c.v
                c.coeffs = np.zeros((c.bh_pad, c.bw_pad, 64), np.int32)
                c.pred = 0
            frame = (w, h, hmax, vmax, mcux, mcuy)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF{marker - 0xC0} (lossless/arithmetic/hierarchical) not supported"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                c = by_id[cid]
                dct = huff_dc.get(tt >> 4)
                act = huff_ac.get(tt & 15)
                scan_comps.append((c, dct, act))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            segments, pos = _split_entropy(payload, pos)
            _decode_scan(
                segments,
                comps,
                scan_comps,
                ss=ss,
                se=se,
                ah=ah,
                al=al,
                restart_interval=restart_interval,
                mcux=frame[4],
                mcuy=frame[5],
            )
        # all other markers (APPn/COM) skipped

    if frame is None:
        raise ValueError("JPEG: no frame header found")
    w, h, hmax, vmax, _, _ = frame

    planes = []
    for c in comps:
        q = qt[c.tq]
        flat = c.coeffs.reshape(-1, 64) * q  # dequant, both in zigzag order
        nat = np.zeros_like(flat)
        nat[:, ZIGZAG] = flat  # de-zigzag in one fancy index
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        spatial = _M.T @ blocks @ _M + 128.0  # vectorized IDCT, level shift
        np.rint(spatial, out=spatial)  # output samples are ROUNDED (F.2.1.5)
        np.clip(spatial, 0, 255, out=spatial)
        grid = spatial.reshape(c.bh_pad, c.bw_pad, 8, 8)
        plane = grid.transpose(0, 2, 1, 3).reshape(c.bh_pad * 8, c.bw_pad * 8)
        plane = plane[: c.px_h, : c.px_w]
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:  # upsample by sample replication
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    ids = tuple(c.cid for c in comps)
    rgb_passthrough = ids == (82, 71, 66) or adobe_transform == 0 and ids != (1, 2, 3)
    if rgb_passthrough:
        return np.dstack(planes).astype(np.uint8)
    y, cb, cr = planes
    return _ycc_to_rgb_libjpeg(y, cb, cr)


# libjpeg's jdcolor.c constants: FIX(x) = int(x * 2^16 + 0.5); the descale
# (v + 2^15) >> 16 is an arithmetic (floor) shift, so ties round half-UP in
# the scaled domain — NOT round-half-even. Using the same fixed-point math
# (including libjpeg's 5-decimal 0.34414/0.71414, not the exact BT.601
# 0.344136/0.714136) makes the decoded RGB bit-identical to libjpeg.
_FIX_1_40200 = int(1.40200 * 65536 + 0.5)
_FIX_1_77200 = int(1.77200 * 65536 + 0.5)
_FIX_0_34414 = int(0.34414 * 65536 + 0.5)
_FIX_0_71414 = int(0.71414 * 65536 + 0.5)
_ONE_HALF = 1 << 15


def _ycc_to_rgb_libjpeg(y, cb, cr) -> np.ndarray:
    """BT.601 YCbCr→RGB with libjpeg's exact fixed-point arithmetic."""
    yi = y.astype(np.int64)
    xb = cb.astype(np.int64) - 128
    xr = cr.astype(np.int64) - 128
    r = yi + ((_FIX_1_40200 * xr + _ONE_HALF) >> 16)
    b = yi + ((_FIX_1_77200 * xb + _ONE_HALF) >> 16)
    g = yi + ((-_FIX_0_34414 * xb - _FIX_0_71414 * xr + _ONE_HALF) >> 16)
    out = np.dstack([r, g, b])
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)


# --------------------------------------------------------------------------
# forward path: constant-tile baseline encoder (oracle payload generator)
# --------------------------------------------------------------------------

# Annex K.3.1 luminance DC table (counts per code length 1..16, then the 12
# category symbols) — the smallest published table covering categories 0..11.
_DC_COUNTS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))
# minimal valid AC table: the single 1-bit code '0' -> EOB (run=0, size=0)
_AC_COUNTS = (1,) + (0,) * 15
_AC_VALS = (0x00,)


def _canonical_codes(counts, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 Annex C canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def encode_jpeg_const(value: int, width: int, height: int) -> bytes:
    """Baseline grayscale JPEG of a CONSTANT image, bit-exact on decode.

    Every 8x8 block of a constant image has a single nonzero FDCT
    coefficient, DC = 8*(value-128) (T.81 A.3.3 with the orthonormal
    normalization); with DC quantizer 8 the quantized DC is exactly
    value-128, so dequantize + DC-only IDCT + level shift reconstructs
    ``value`` at every pixel with NO rounding anywhere — the decoded image
    is closed-form in (value, width, height), which is what makes the
    encode->ship->decode->featurize roundtrip oracle-checkable in SQL
    (dims AND content), unlike the seeded-noise PNG/GIF payloads where
    only dims are closed-form. Entropy layout: Annex K luminance DC table,
    a minimal 1-code AC table (EOB only), one non-interleaved scan."""
    if not (0 <= value <= 255):
        raise ValueError(f"pixel value out of range: {value}")
    s = value - 128  # quantized DC of every block; diff sequence: s, 0, 0...
    dc = _canonical_codes(_DC_COUNTS, _DC_VALS)
    ac = _canonical_codes(_AC_COUNTS, _AC_VALS)

    # --- entropy-coded scan: first block DC diff = s, rest 0; AC = EOB ---
    bits: list[tuple[int, int]] = []
    t = 0 if s == 0 else abs(s).bit_length()
    bits.append(dc[t])
    if t:
        v = s if s > 0 else s + (1 << t) - 1  # VLI (F.1.2.1)
        bits.append((v, t))
    bits.append(ac[0x00])
    nblocks = -(-width // 8) * -(-height // 8)
    zero_block = [dc[0], ac[0x00]]
    for _ in range(nblocks - 1):
        bits.extend(zero_block)

    scan = bytearray()
    acc, nacc = 0, 0
    for code, ln in bits:
        acc = (acc << ln) | (code & ((1 << ln) - 1))
        nacc += ln
        while nacc >= 8:
            b = (acc >> (nacc - 8)) & 0xFF
            nacc -= 8
            scan.append(b)
            if b == 0xFF:
                scan.append(0x00)  # byte stuffing (B.1.1.5)
        # drop already-flushed bits: an unmasked Python bigint grows with
        # the whole scan and makes each shift O(total bits) => O(n^2)
        acc &= (1 << nacc) - 1
    if nacc:
        b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        scan.append(b)
        if b == 0xFF:
            scan.append(0x00)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, 2 + len(payload)) + payload

    # DQT payload is in zigzag order; position 0 is the DC quantizer and the
    # 63 AC entries never multiply a nonzero coefficient here
    dqt = seg(0xDB, bytes([0x00, 8] + [255] * 63))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(scan) + b"\xff\xd9"
