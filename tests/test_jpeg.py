"""JPEG decoder conformance (stages/jpeg.py).

Validation strategy: a test-local JPEG ENCODER built forward from ITU-T T.81
— forward DCT + quantization, huffman entropy coding (Annex C canonical
tables; Annex F sequential, Annex G progressive with spectral selection AND
successive approximation including the AC-refinement correction-bit
protocol), restart intervals, 4:2:0 subsampling — so the decoder is checked
against an independent spec-derived construction, never against itself.
Structural layers (entropy/huffman/scan scripts) are asserted EXACTLY
against a numpy reference reconstruction from the known quantized
coefficients; the transform layer is asserted against the original image
within quantization tolerance. Real progressive files shipped in the
container (encoded by a real encoder) pin the decoder's behavior on
in-the-wild scan scripts.
"""

import struct

import numpy as np
import pytest

from streammd_ray.stages.jpeg import _M, ZIGZAG, decode_jpeg

THIN = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
FULL = "/usr/share/doc/nodejs/full-white-stripe.jpg"

# ---------------------------------------------------------------------------
# huffman tables: Annex K DC tables (multi-length canonical decode coverage)
# plus a 256-symbol flat table (lengths 8/9) for AC — progressive scans need
# the EOBn symbols (0x10..0xE0) that the Annex K *baseline* AC tables lack.
# ---------------------------------------------------------------------------

DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_FLAT = (
    [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)

Q_ONES = np.ones((8, 8), np.int32)
# Annex K luminance table (natural order)
Q_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.int32,
)


def _huff_codes(counts, vals):
    """Annex C canonical code assignment: symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _W:
    """MSB-first bit writer with FF 00 byte stuffing (F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self):  # fill to byte boundary with 1s (B.1.1.5)
        while self.n:
            self.bits(1, 1)

    def marker(self, m):  # restart marker, byte-aligned
        self.pad()
        self.out += bytes([0xFF, m])


def _cat(v):
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _vli(w, v):
    s = _cat(v)
    if s:
        w.bits(v + (1 << s) - 1 if v < 0 else v, s)
    return s


def _fdct_quant(plane, qnat, bh_pad, bw_pad):
    """uint8 plane → (bh_pad, bw_pad, 64) int32 quantized coeffs in SCAN
    (zigzag) order, plane edge-padded to the block grid."""
    h, w = plane.shape
    padded = np.empty((bh_pad * 8, bw_pad * 8), np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:h, w:] = plane[:, -1:]
    padded[h:, w:] = plane[-1, -1]
    grid = padded.reshape(bh_pad, 8, bw_pad, 8).transpose(0, 2, 1, 3) - 128.0
    F = _M @ grid @ _M.T  # forward orthonormal DCT-II
    qc = np.round(F / qnat).astype(np.int32).reshape(bh_pad, bw_pad, 64)
    return qc[:, :, ZIGZAG]  # natural → scan order


class _Comp:
    def __init__(self, cid, hv, tq, plane, qnat, mcux, mcuy, hmax, vmax, w, h):
        self.cid, (self.h, self.v), self.tq = cid, hv, tq
        self.px_w = -(-w * self.h // hmax)
        self.px_h = -(-h * self.v // vmax)
        self.bw = -(-self.px_w // 8)
        self.bh = -(-self.px_h // 8)
        self.bw_pad = mcux * self.h
        self.bh_pad = mcuy * self.v
        assert plane.shape == (self.px_h, self.px_w)
        self.coef = _fdct_quant(plane, qnat, self.bh_pad, self.bw_pad)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt(tables, *, precision16=False):
    body = b""
    for tq, qnat in tables:
        zz = qnat.reshape(64)[ZIGZAG]
        if precision16:
            body += bytes([0x10 | tq]) + zz.astype(">u2").tobytes()
        else:
            body += bytes([tq]) + zz.astype(np.uint8).tobytes()
    return _seg(0xDB, body)


def _dht(entries):
    body = b""
    for tc, th, (counts, vals) in entries:
        body += bytes([tc << 4 | th]) + bytes(counts) + bytes(vals)
    return _seg(0xC4, body)


def _sof(marker, w, h, comps):
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        body += bytes([c.cid, c.h << 4 | c.v, c.tq])
    return _seg(marker, body)


def _sos_header(scan_comps, ss, se, ah, al):
    body = bytes([len(scan_comps)])
    for c, td, ta in scan_comps:
        body += bytes([c.cid, td << 4 | ta])
    body += bytes([ss, se, ah << 4 | al])
    return _seg(0xDA, body)


def _mcu_blocks(comps, mcux, mcuy):
    """Yield (comp, coef_block) in interleaved MCU order (B.2.3)."""
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for vy in range(c.v):
                    for hx in range(c.h):
                        yield c, c.coef[my * c.v + vy, mx * c.h + hx]


def _encode_baseline_scan(w, comps, tables, mcux, mcuy, restart=0):
    """Sequential scan, interleaved when len(comps) > 1 (F.1.2)."""
    interleaved = len(comps) > 1
    pred = {c.cid: 0 for c in comps}
    units = (
        list(_mcu_blocks(comps, mcux, mcuy))
        if interleaved
        else [
            (comps[0], comps[0].coef[by, bx])
            for by in range(comps[0].bh)
            for bx in range(comps[0].bw)
        ]
    )
    # group into MCUs for restart accounting (one block per MCU when
    # non-interleaved)
    per_mcu = sum(c.h * c.v for c in comps) if interleaved else 1
    rst = 0
    for u, (c, blk) in enumerate(units):
        mcu_idx = u // per_mcu
        if restart and u % per_mcu == 0 and mcu_idx and mcu_idx % restart == 0:
            w.marker(0xD0 + rst % 8)
            rst += 1
            pred = {cc.cid: 0 for cc in comps}
        dc_codes, ac_codes = tables[c.cid]
        diff = int(blk[0]) - pred[c.cid]
        pred[c.cid] = int(blk[0])
        s = _cat(diff)
        w.bits(*dc_codes[s])
        _vli(w, diff)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                w.bits(*ac_codes[0xF0])
                run -= 16
            s = _cat(v)
            w.bits(*ac_codes[run << 4 | s])
            _vli(w, v)
            run = 0
        if run:
            w.bits(*ac_codes[0x00])
    w.pad()


def _encode_dc_first(w, comps, dc_tables, mcux, mcuy, al, restart=0):
    """DC first scan (G.1.2.1): categories of successive diffs of dc >> al."""
    pred = {c.cid: 0 for c in comps}
    interleaved = len(comps) > 1
    units = (
        list(_mcu_blocks(comps, mcux, mcuy))
        if interleaved
        else [
            (comps[0], comps[0].coef[by, bx])
            for by in range(comps[0].bh)
            for bx in range(comps[0].bw)
        ]
    )
    per_mcu = sum(c.h * c.v for c in comps) if interleaved else 1
    rst = 0
    for u, (c, blk) in enumerate(units):
        mcu_idx = u // per_mcu
        if restart and u % per_mcu == 0 and mcu_idx and mcu_idx % restart == 0:
            w.marker(0xD0 + rst % 8)
            rst += 1
            pred = {cc.cid: 0 for cc in comps}
        v = int(blk[0]) >> al
        diff = v - pred[c.cid]
        pred[c.cid] = v
        s = _cat(diff)
        w.bits(*dc_tables[c.cid][s])
        _vli(w, diff)
    w.pad()


def _encode_dc_refine(w, comps, mcux, mcuy, al):
    """DC refinement (G.1.2.1): one raw bit per block — bit ``al`` of DC."""
    interleaved = len(comps) > 1
    units = (
        _mcu_blocks(comps, mcux, mcuy)
        if interleaved
        else (
            (comps[0], comps[0].coef[by, bx])
            for by in range(comps[0].bh)
            for bx in range(comps[0].bw)
        )
    )
    for _, blk in units:
        w.bits((int(blk[0]) >> al) & 1, 1)
    w.pad()


class _ACState:
    def __init__(self, w, ac_codes):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.be = []  # correction bits pending with the next EOBRUN flush

    def flush(self):
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self.w.bits(*self.ac[nb << 4])
            if nb:
                self.w.bits(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
            for b in self.be:
                self.w.bits(b, 1)
            self.be = []


def _encode_ac_first(st, blocks, ss, se, al):
    """AC first scan for one component (G.1.2.2): shifted magnitudes with
    ZRL and EOB-run accumulation."""
    for blk in blocks:
        band = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            band.append(t if v >= 0 else -t)
        nz = [i for i, v in enumerate(band) if v]
        if not nz:
            st.eobrun += 1
            if st.eobrun == 0x7FFF:
                st.flush()
            continue
        st.flush()
        run = 0
        for i in range(nz[-1] + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                st.w.bits(*st.ac[0xF0])
                run -= 16
            s = _cat(v)
            st.w.bits(*st.ac[run << 4 | s])
            _vli(st.w, v)
            run = 0
        if nz[-1] < se - ss:
            st.eobrun += 1
            if st.eobrun == 0x7FFF:
                st.flush()


def _encode_ac_refine(st, blocks, ss, se, al):
    """AC refinement scan (G.1.2.3) — the correction-bit protocol: newly
    nonzero coeffs (|c| >> al == 1) emit run/1 + sign; history-nonzero
    coeffs emit one buffered correction bit each; trailing content folds
    into the EOB run. Mirrors the control flow libjpeg documents publicly
    (jcphuff.c encode_mcu_AC_refine)."""
    p_w = st.w
    for blk in blocks:
        t = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        newly = [i for i, v in enumerate(t) if v == 1]
        eobpos = newly[-1] if newly else -1
        r = 0
        br = []
        for i in range(len(t)):
            if t[i] == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                st.flush()
                p_w.bits(*st.ac[0xF0])
                r -= 16
                for b in br:
                    p_w.bits(b, 1)
                br = []
            if t[i] > 1:
                br.append(t[i] & 1)
                continue
            st.flush()
            p_w.bits(*st.ac[r << 4 | 1])
            p_w.bits(1 if int(blk[ss + i]) > 0 else 0, 1)
            for b in br:
                p_w.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            st.eobrun += 1
            st.be += br
            if st.eobrun == 0x7FFF:
                st.flush()


def _comp_blocks(c):
    return [c.coef[by, bx] for by in range(c.bh) for bx in range(c.bw)]


def encode_jpeg(
    img,
    *,
    qnat=Q_ONES,
    subsample=False,
    restart=0,
    progressive=None,
    separate_sequential_scans=False,
    dqt16=False,
):
    """Test-local T.81 encoder. ``progressive`` is a list of scan specs
    ``(comp_ids, ss, se, ah, al)`` (None → sequential). Grayscale (h, w) or
    RGB (h, w, 3) uint8 input; RGB converts BT.601 and optionally 4:2:0
    subsamples by 2×2 mean."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        specs = [(1, (1, 1), 0, img.astype(np.float64))]
        qtables = [(0, qnat)]
    else:
        f = img.astype(np.float64)
        y = f @ [0.299, 0.587, 0.114]
        cb = (f[:, :, 2] - y) / 1.772 + 128.0
        cr = (f[:, :, 0] - y) / 1.402 + 128.0
        if subsample:
            # pad to even dims by edge replication, then 2×2 mean
            def down(p):
                pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean((1, 3))

            specs = [
                (1, (2, 2), 0, y),
                (2, (1, 1), 1, down(cb)),
                (3, (1, 1), 1, down(cr)),
            ]
        else:
            specs = [(1, (1, 1), 0, y), (2, (1, 1), 1, cb), (3, (1, 1), 1, cr)]
        qtables = [(0, qnat), (1, qnat)]
    hmax = max(s[1][0] for s in specs)
    vmax = max(s[1][1] for s in specs)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = [
        _Comp(cid, hv, tq, np.clip(np.round(p), 0, 255).astype(np.uint8),
              dict(qtables)[tq], mcux, mcuy, hmax, vmax, w, h)
        for cid, hv, tq, p in specs
    ]
    by_id = {c.cid: c for c in comps}

    dc_codes = {1: _huff_codes(*DC_LUM)}
    dht_entries = [(0, 0, DC_LUM), (1, 0, AC_FLAT)]
    if len(comps) > 1:
        dc_codes[2] = dc_codes[3] = _huff_codes(*DC_CHR)
        dht_entries.append((0, 1, DC_CHR))
    ac_codes = _huff_codes(*AC_FLAT)
    td = {1: 0, 2: 1, 3: 1}

    out = bytearray(b"\xff\xd8")
    out += _dqt(qtables, precision16=dqt16)
    out += _dht(dht_entries)
    out += _sof(0xC2 if progressive else 0xC0, w, h, comps)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))

    if progressive:
        for comp_ids, ss, se, ah, al in progressive:
            sc = [by_id[cid] for cid in comp_ids]
            out += _sos_header([(c, td[c.cid], 0) for c in sc], ss, se, ah, al)
            wtr = _W()
            if ss == 0 and ah == 0:
                _encode_dc_first(wtr, sc, {c.cid: dc_codes[c.cid] for c in sc},
                                 mcux, mcuy, al, restart=restart)
            elif ss == 0:
                _encode_dc_refine(wtr, sc, mcux, mcuy, al)
            else:
                (c,) = sc  # AC scans are single-component (B.2.3)
                st = _ACState(wtr, ac_codes)
                blocks = _comp_blocks(c)
                if restart:
                    # restart every ``restart`` blocks: flush eobrun + RST
                    rst = 0
                    enc = _encode_ac_first if ah == 0 else _encode_ac_refine
                    for i in range(0, len(blocks), restart):
                        if i:
                            st.flush()
                            wtr.marker(0xD0 + rst % 8)
                            rst += 1
                            st = _ACState(wtr, ac_codes)
                        enc(st, blocks[i : i + restart], ss, se, al)
                    st.flush()
                else:
                    enc = _encode_ac_first if ah == 0 else _encode_ac_refine
                    enc(st, blocks, ss, se, al)
                    st.flush()
                wtr.pad()
            out += wtr.out
    elif separate_sequential_scans:
        for c in comps:
            out += _sos_header([(c, td[c.cid], 0)], 0, 63, 0, 0)
            wtr = _W()
            _encode_baseline_scan(wtr, [c], {c.cid: (dc_codes[c.cid], ac_codes)}, mcux, mcuy)
            out += wtr.out
    else:
        out += _sos_header([(c, td[c.cid], 0) for c in comps], 0, 63, 0, 0)
        wtr = _W()
        _encode_baseline_scan(
            wtr, comps, {c.cid: (dc_codes[c.cid], ac_codes) for c in comps},
            mcux, mcuy, restart=restart,
        )
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out), comps


def reference_recon(comps, qtables_by_tq, w, h, hmax, vmax):
    """Numpy reference of T.81's decoder back end (dequant → IDCT → level
    shift → upsample → BT.601), mirroring the published math on the KNOWN
    quantized coefficients — independent of the decoder's entropy layer."""
    planes = []
    for c in comps:
        q = qtables_by_tq[c.tq].reshape(64)[ZIGZAG]
        flat = c.coef.reshape(-1, 64).astype(np.int64) * q
        nat = np.zeros_like(flat)
        nat[:, ZIGZAG] = flat
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        spatial = _M.T @ blocks @ _M + 128.0
        np.rint(spatial, out=spatial)  # rounded output samples (F.2.1.5)
        np.clip(spatial, 0, 255, out=spatial)
        grid = spatial.reshape(c.bh_pad, c.bw_pad, 8, 8)
        plane = grid.transpose(0, 2, 1, 3).reshape(c.bh_pad * 8, c.bw_pad * 8)
        plane = plane[: c.px_h, : c.px_w]
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes
    # libjpeg jdcolor.c fixed-point math (FIX(x)=int(x*2^16+0.5), floor
    # descale) — same published formula the decoder implements, recomputed
    # here independently of the decoder's entropy layer
    yi = y.astype(np.int64)
    xb = cb.astype(np.int64) - 128
    xr = cr.astype(np.int64) - 128
    half = 1 << 15
    out = np.dstack(
        [
            yi + ((int(1.40200 * 65536 + 0.5) * xr + half) >> 16),
            yi
            + (
                (
                    -int(0.34414 * 65536 + 0.5) * xb
                    - int(0.71414 * 65536 + 0.5) * xr
                    + half
                )
                >> 16
            ),
            yi + ((int(1.77200 * 65536 + 0.5) * xb + half) >> 16),
        ]
    )
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)


def _ref(comps, qnat, w, h):
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    return reference_recon(comps, {0: qnat, 1: qnat}, w, h, hmax, vmax)


# ---------------------------------------------------------------------------
# sequential (baseline)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(8, 8), (17, 13), (24, 31), (1, 1)])
def test_baseline_gray_exact_vs_reference(hw):
    rng = np.random.default_rng(sum(hw))
    img = rng.integers(0, 256, hw, dtype=np.uint8)
    payload, comps = encode_jpeg(img)
    dec = decode_jpeg(payload)
    assert np.array_equal(dec, _ref(comps, Q_ONES, hw[1], hw[0]))
    # with an all-ones quant table the only loss is coefficient rounding
    assert np.abs(dec.astype(int) - img).max() <= 2


def test_baseline_gray_annexk_quant_tolerance():
    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    payload, comps = encode_jpeg(img, qnat=Q_LUM)
    dec = decode_jpeg(payload)
    assert np.array_equal(dec, _ref(comps, Q_LUM, 48, 48))
    assert np.abs(dec.astype(float) - img).mean() < 6.0


def test_baseline_color_444_exact_vs_reference():
    rng = np.random.default_rng(44)
    img = rng.integers(0, 256, (19, 22, 3), dtype=np.uint8)
    payload, comps = encode_jpeg(img)
    dec = decode_jpeg(payload)
    assert dec.shape == (19, 22, 3)
    assert np.array_equal(dec, _ref(comps, Q_ONES, 22, 19))
    # color transform round-trip: forward here, inverse in the decoder
    assert np.abs(dec.astype(int) - img).max() <= 4


def test_baseline_color_420_subsampled():
    rng = np.random.default_rng(420)
    img = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    payload, comps = encode_jpeg(img, subsample=True)
    dec = decode_jpeg(payload)
    assert np.array_equal(dec, _ref(comps, Q_ONES, 19, 21))
    # flat-chroma image: 2×2 subsample + replication upsample is lossless
    flat = np.empty((12, 14, 3), np.uint8)
    flat[:, :, 0] = np.linspace(30, 220, 14).astype(np.uint8)[None, :]
    flat[:, :, 1] = flat[:, :, 0]
    flat[:, :, 2] = flat[:, :, 0]  # gray content ⇒ chroma exactly 128
    payload, comps = encode_jpeg(flat, subsample=True)
    dec = decode_jpeg(payload)
    assert np.abs(dec.astype(int) - flat).max() <= 3


def test_baseline_restart_intervals_match_unrestarted():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img)[0])
    restarted = decode_jpeg(encode_jpeg(img, restart=2)[0])
    assert np.array_equal(plain, restarted)


def test_baseline_separate_sequential_scans():
    """Three single-component sequential scans (spec-legal layout) must
    equal the interleaved encoding — exercises the non-interleaved
    full-block path."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (18, 10, 3), dtype=np.uint8)
    inter = decode_jpeg(encode_jpeg(img)[0])
    sep = decode_jpeg(encode_jpeg(img, separate_sequential_scans=True)[0])
    assert np.array_equal(inter, sep)


def test_dqt_16bit_precision_parses():
    rng = np.random.default_rng(16)
    img = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(img)[0])
    b = decode_jpeg(encode_jpeg(img, dqt16=True)[0])
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# progressive
# ---------------------------------------------------------------------------

GRAY_SPECTRAL = [((1,), 0, 0, 0, 0), ((1,), 1, 5, 0, 0), ((1,), 6, 63, 0, 0)]


def test_progressive_spectral_selection_equals_baseline():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (26, 35), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img)[0])
    prog = decode_jpeg(encode_jpeg(img, progressive=GRAY_SPECTRAL)[0])
    assert np.array_equal(base, prog)


def test_progressive_dc_successive_approximation():
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (20, 17), dtype=np.uint8)
    scans = [
        ((1,), 0, 0, 0, 2),  # DC first at Al=2
        ((1,), 0, 0, 2, 1),  # refine bit 1
        ((1,), 0, 0, 1, 0),  # refine bit 0
        ((1,), 1, 63, 0, 0),  # full AC band
    ]
    base = decode_jpeg(encode_jpeg(img)[0])
    prog = decode_jpeg(encode_jpeg(img, progressive=scans)[0])
    assert np.array_equal(base, prog)


def test_progressive_ac_successive_approximation():
    """The AC refinement torture: noisy coefficients through first-pass
    Al=2 then two refinement passes back to Al=0 must reproduce the
    baseline decode bit-exactly (correction-bit protocol, EOB-run
    carryover, ZRL-with-corrections)."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    scans = [
        ((1,), 0, 0, 0, 0),
        ((1,), 1, 20, 0, 2),
        ((1,), 21, 63, 0, 2),
        ((1,), 1, 20, 2, 1),
        ((1,), 21, 63, 2, 1),
        ((1,), 1, 20, 1, 0),
        ((1,), 21, 63, 1, 0),
    ]
    base = decode_jpeg(encode_jpeg(img)[0])
    prog = decode_jpeg(encode_jpeg(img, progressive=scans)[0])
    assert np.array_equal(base, prog)


def test_progressive_ac_refine_sparse_blocks():
    """Mostly-flat image ⇒ long EOB runs spanning blocks in both first and
    refine passes; plus isolated coefficients exercising run>15 ZRLs."""
    img = np.full((48, 48), 200, np.uint8)
    img[5, 37] = 10
    img[30, 2] = 255
    scans = [
        ((1,), 0, 0, 0, 0),
        ((1,), 1, 63, 0, 1),
        ((1,), 1, 63, 1, 0),
    ]
    base = decode_jpeg(encode_jpeg(img)[0])
    prog = decode_jpeg(encode_jpeg(img, progressive=scans)[0])
    assert np.array_equal(base, prog)


def test_progressive_color_420_full_script():
    """Color 4:2:0 progressive with a libjpeg-style scan script:
    interleaved DC (with successive approximation) + per-component AC
    spectral bands + AC refinement."""
    rng = np.random.default_rng(24)
    img = rng.integers(0, 256, (37, 29, 3), dtype=np.uint8)
    scans = [
        ((1, 2, 3), 0, 0, 0, 1),
        ((1,), 1, 5, 0, 1),
        ((2,), 1, 63, 0, 1),
        ((3,), 1, 63, 0, 1),
        ((1,), 6, 63, 0, 1),
        ((1, 2, 3), 0, 0, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((2,), 1, 63, 1, 0),
        ((3,), 1, 63, 1, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, subsample=True)[0])
    prog = decode_jpeg(encode_jpeg(img, subsample=True, progressive=scans)[0])
    assert np.array_equal(base, prog)


def test_progressive_restart_in_scans():
    rng = np.random.default_rng(25)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    scans = [((1,), 0, 0, 0, 0), ((1,), 1, 63, 0, 1), ((1,), 1, 63, 1, 0)]
    plain = decode_jpeg(encode_jpeg(img, progressive=scans)[0])
    restarted = decode_jpeg(encode_jpeg(img, progressive=scans, restart=3)[0])
    assert np.array_equal(plain, restarted)


# ---------------------------------------------------------------------------
# error paths + real files
# ---------------------------------------------------------------------------


def test_rejects_unsupported_variants():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG" + bytes(8))
    payload, _ = encode_jpeg(np.zeros((8, 8), np.uint8))
    p = bytearray(payload)
    sof = p.find(b"\xff\xc0")
    p[sof + 1] = 0xC9  # SOF9: arithmetic coding
    with pytest.raises(ValueError, match="not supported"):
        decode_jpeg(bytes(p))
    p = bytearray(payload)
    p[sof + 4] = 12  # 12-bit precision
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(p))


def test_real_progressive_files():
    """The container's two nodejs JPEGs are real-encoder progressive
    (SOF2) color files — dims pinned, plausible stats, and cross-file
    consistency: both encode the same artwork (thin is the first band of
    full), so independent decodes must agree closely."""
    thin = decode_jpeg(open(THIN, "rb").read())
    full = decode_jpeg(open(FULL, "rb").read())
    assert thin.shape == (58, 493, 3)
    assert full.shape == (312, 493, 3)
    assert 225 < thin.mean() < 240 and 245 < full.mean() < 255
    diff = np.abs(thin.astype(float) - full[:58].astype(float)).mean()
    assert diff < 16, diff


def test_jpeg_decode_media_actor_pool(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from streammd_ray.stages.multimodal import decode_media

    rng = np.random.default_rng(31)
    payloads, dims = [], []
    for i in range(6):
        h, w = int(rng.integers(9, 40)), int(rng.integers(9, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payloads.append(encode_jpeg(img, qnat=Q_LUM, subsample=i % 2 == 0)[0])
        dims.append((w, h))
    t = pa.table(
        {
            "media_id": pa.array(range(6), pa.int64()),
            "media_type": pa.array(["image"] * 6),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )
    out = (
        decode_media(rd.from_arrow(t), decoder="jpeg", batch_size=3)
        .to_pandas()
        .sort_values("media_id")
    )
    assert [(w, h) for w, h in zip(out["width"], out["height"])] == dims
    assert (out["channels"] == 3).all()


# ---------------------------------------------------------------------------
# library forward path: constant-tile encoder (oracle payload generator)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("v", [0, 1, 7, 127, 128, 129, 200, 254, 255])
@pytest.mark.parametrize("hw", [(8, 8), (9, 13), (1, 1), (40, 64), (63, 57)])
def test_encode_jpeg_const_bit_exact(v, hw):
    """DC quantizer 8 + constant blocks ⇒ NO rounding anywhere in the
    dequant→IDCT→level-shift chain: every decoded pixel equals the fill
    exactly, including edge-cropped partial blocks (non-multiple-of-8 dims)."""
    from streammd_ray.stages.jpeg import encode_jpeg_const

    h, w = hw
    img = decode_jpeg(encode_jpeg_const(v, w, h))
    assert img.shape == (h, w) and img.dtype == np.uint8
    assert (img == v).all()


def test_encode_jpeg_const_matches_reference_encoder():
    """Cross-check the minimal writer against the full conformance encoder:
    both encode the same constant image; both decode to the same pixels."""
    from streammd_ray.stages.jpeg import encode_jpeg_const

    img = np.full((24, 17), 93, np.uint8)
    full, _ = encode_jpeg(img, qnat=np.ones((8, 8), np.int32) * 8)
    assert (decode_jpeg(full) == decode_jpeg(encode_jpeg_const(93, 17, 24))).all()


def test_make_jpeg_media_table_oracle_arithmetic():
    """The payload generator's decoded dims AND content follow the published
    arithmetic the SQL oracle recomputes (queries.sql_media_decode_compressed)."""
    from streammd_ray.stages.multimodal import make_jpeg_media_table

    t = make_jpeg_media_table(12)
    for i, payload in enumerate(t["payload"].to_pylist()):
        img = decode_jpeg(payload)
        assert img.shape == (8 + (i * 23) % 49, 8 + (i * 19) % 49)
        assert (img == (i * 73) % 256).all()


def test_ycc_to_rgb_fixed_vectors_match_libjpeg():
    """Fixed vectors through the decoder's color converter, expected values
    hand-computed with libjpeg's jdcolor.c fixed-point formula
    (FIX(x)=int(x*2^16+0.5), +ONE_HALF, arithmetic >>16). The last three
    vectors are cases where the previous float + round-half-even path gave a
    DIFFERENT answer, so this test pins the tie/rounding mode explicitly."""
    from streammd_ray.stages.jpeg import _ycc_to_rgb_libjpeg

    vecs = [
        # (y, cb, cr) -> (r, g, b) per libjpeg integer math
        ((0, 0, 0), (0, 135, 0)),
        ((255, 255, 255), (255, 121, 255)),
        ((128, 128, 128), (128, 128, 128)),
        ((76, 85, 255), (254, 0, 0)),
        ((150, 44, 21), (0, 255, 1)),
        ((29, 255, 107), (0, 0, 254)),
        ((100, 128, 130), (103, 99, 100)),
        # rint(float) would give G=8 / G=15 / G=22 here; libjpeg gives 9/16/23
        ((0, 95, 132), (6, 9, 0)),
        ((7, 95, 132), (13, 16, 0)),
        ((14, 95, 132), (20, 23, 0)),
    ]
    y = np.array([[v[0][0] for v in vecs]], np.float64)
    cb = np.array([[v[0][1] for v in vecs]], np.float64)
    cr = np.array([[v[0][2] for v in vecs]], np.float64)
    out = _ycc_to_rgb_libjpeg(y, cb, cr)
    expected = np.array([[v[1] for v in vecs]], np.uint8)
    assert np.array_equal(out, expected)


def test_encode_jpeg_const_accumulator_stays_bounded():
    """The scan writer masks its bit accumulator after each byte flush; a
    large constant image must encode in linear time and round-trip exactly."""
    from streammd_ray.stages.jpeg import encode_jpeg_const

    import time

    t0 = time.perf_counter()
    payload = encode_jpeg_const(200, 1024, 1024)  # 16384 blocks
    elapsed = time.perf_counter() - t0
    assert elapsed < 2.0  # O(n^2) bigint behavior took far longer here
    img = decode_jpeg(payload)
    assert img.shape == (1024, 1024)
    assert (img == 200).all()
