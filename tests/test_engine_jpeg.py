"""Unit tests for the pure-numpy baseline JPEG decoder (`engine.jpegx`).

A minimal TEST-ONLY baseline encoder lives here (flat 8-bit Huffman codes,
optional quant table, 4:4:4 / 4:2:0, restart intervals) so the decoder gets
true round-trip coverage without any external imaging library. With an
all-ones quant table the only loss is FDCT/IDCT rounding, so round-trips
must land within a few gray levels.
"""

import struct

import numpy as np
import pytest

from activestorage_ocr_spark.engine import jpegx, rasters
from activestorage_ocr_spark.engine.jpegx import ZIGZAG, decode_jpeg

_C = jpegx._C


# ---------------------------------------------------------------------------
# minimal encoder (test-only)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per T.81
        return bytes(self.out)


def _flat_huff(symbols):
    """All symbols get 8-bit canonical codes: counts[8]=len(symbols)."""
    counts = [0] * 16
    counts[7] = len(symbols)
    code_of = {s: i for i, s in enumerate(symbols)}
    return counts, list(symbols), code_of


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


def _category(v):
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def _enc_value(bw, v, t):
    if v < 0:
        v = v + (1 << t) - 1
    if t:
        bw.write(v, t)


def _encode_block(bw, coef, pred, dc_code, ac_code):
    diff = int(coef[0]) - pred
    t = _category(diff)
    bw.write(dc_code[t], 8)
    _enc_value(bw, diff, t)
    zz = coef[ZIGZAG][1:]
    run = 0
    for v in zz:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            bw.write(ac_code[0xF0], 8)
            run -= 16
        s = _category(v)
        bw.write(ac_code[(run << 4) | s], 8)
        _enc_value(bw, v, s)
        run = 0
    if run:
        bw.write(ac_code[0x00], 8)
    return int(coef[0])


def encode_jpeg(img, subsample=False, qval=1, restart=0):
    """img: (h,w) gray uint8 or (h,w,3) RGB uint8 -> baseline JFIF bytes."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
        if subsample == "422":
            cb = cb[:, ::2]
            cr = cr[:, ::2]
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsample:
            cb = cb[::2, ::2]
            cr = cr[::2, ::2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(
        int(x) for x in np.full(64, qval, dtype=np.uint8)
    )
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    dc_counts, dc_vals, dc_code = _flat_huff(_DC_SYMS)
    ac_counts, ac_vals, ac_code = _flat_huff(_AC_SYMS)
    for tc, th, counts, vals in ((0, 0, dc_counts, dc_vals), (1, 0, ac_counts, ac_vals)):
        seg = bytes([(tc << 4) | th]) + bytes(counts) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # pad planes to their block grid
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        pp = np.zeros((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(pp)

    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            tail = bw.flush()
            out += tail + bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * nc
        my, mx = divmod(m, mcux)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            for v in range(sv):
                for hh in range(sh):
                    by, bx = (my * sv + v) * 8, (mx * sh + hh) * 8
                    block = p[by : by + 8, bx : bx + 8] - 128.0
                    coef = _C @ block @ _C.T
                    coef = np.round(coef / qval)
                    preds[ci] = _encode_block(bw, coef.flatten(), preds[ci], dc_code, ac_code)
    out += bw.flush() + b"\xff\xd9"
    return bytes(out)


def _text_image(h=64, w=160):
    img = rasters.render_text("JPEG 42", scale=1)
    canvas = np.full((h, w), 255, dtype=np.uint8)
    canvas[8 : 8 + img.shape[0], 8 : 8 + img.shape[1]] = img
    return canvas


class TestRoundTrip:
    def test_gray_near_lossless_q1(self):
        img = _text_image()
        got = decode_jpeg(encode_jpeg(img, qval=1))
        assert got.shape == img.shape
        assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3

    def test_gray_non_multiple_of_8_dims(self):
        yy, xx = np.mgrid[0:37, 0:61]
        img = ((yy * 4 + xx * 2) % 256).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, qval=1))
        assert got.shape == (37, 61)
        assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3

    def test_color_444(self):
        h, w = 40, 72
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
        ).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, qval=1))
        assert got.shape == (h, w, 3)
        assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 6

    def test_color_420_subsampled(self):
        h, w = 48, 80
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, : w // 2] = (200, 30, 30)
        img[:, w // 2 :] = (30, 30, 200)
        got = decode_jpeg(encode_jpeg(img, subsample=True, qval=1))
        assert got.shape == (h, w, 3)
        # away from the chroma edge, colors must hold
        assert np.abs(got[10, 10].astype(int) - [200, 30, 30]).max() <= 8
        assert np.abs(got[10, -10].astype(int) - [30, 30, 200]).max() <= 8

    def test_color_422_subsampled(self):
        h, w = 48, 80
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[: h // 2] = (220, 40, 40)
        img[h // 2 :] = (40, 220, 40)
        got = decode_jpeg(encode_jpeg(img, subsample="422", qval=1))
        assert got.shape == (h, w, 3)
        assert np.abs(got[8, 8].astype(int) - [220, 40, 40]).max() <= 8
        assert np.abs(got[-8, -8].astype(int) - [40, 220, 40]).max() <= 8

    def test_restart_intervals(self):
        img = _text_image(h=48, w=128)
        data = encode_jpeg(img, qval=1, restart=2)
        assert b"\xff\xd0" in data or b"\xff\xd1" in data
        got = decode_jpeg(data)
        assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3

    def test_quantized_still_readable(self):
        img = _text_image()
        got = decode_jpeg(encode_jpeg(img, qval=8))
        # lossy, but dark glyphs stay dark and background stays light
        assert got[img < 64].mean() < 100
        assert got[img > 192].mean() > 180


def encode_jpeg_progressive(img, qval=1, approx=True, restart=0):
    """TEST-ONLY progressive (SOF2) encoder: interleaved DC first scan,
    optional DC refine, per-component AC first scans, optional AC refine
    scans (successive approximation Al=1 -> 0), flat 8-bit huffman codes.
    Gray or RGB 4:4:4 / 4:2:0 (subsample=True upstream not supported here;
    pass pre-shaped planes via the same conventions as encode_jpeg)."""
    assert not (restart and approx), "restart emission only wired for the spectral-only scans"
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
        planes = [y, cb, cr]
        samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s0[0] for s0 in samp)
    vmax = max(s0[1] for s0 in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # FDCT every block per component, padded grid, raster block order
    comp_coefs = []
    for pl, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        pp = np.zeros((ph, pw))
        pp[: pl.shape[0], : pl.shape[1]] = pl
        pp[pl.shape[0]:, : pl.shape[1]] = pl[-1:, :]
        pp[:, pl.shape[1]:] = pp[:, pl.shape[1] - 1 : pl.shape[1]]
        hb, wb = ph // 8, pw // 8
        blocks = np.zeros((hb * wb, 64))
        for by in range(hb):
            for bx in range(wb):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.round((_C @ block @ _C.T) / qval)
                blocks[by * wb + bx] = coef.flatten()
        comp_coefs.append((blocks.astype(int), sh, sv, hb, wb))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(
        int(x) for x in np.full(64, qval, dtype=np.uint8)
    )
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dc_counts, dc_vals, dc_code = _flat_huff(_DC_SYMS)
    ac_counts, ac_vals, ac_code = _flat_huff(_AC_SYMS)
    for tc, counts, vals in ((0, dc_counts, dc_vals), (1, ac_counts, ac_vals)):
        seg = bytes([(tc << 4) | 0]) + bytes(counts) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    def sos(comp_ids, ss, se, ah, al):
        seg = bytes([len(comp_ids)])
        for cid in comp_ids:
            seg += bytes([cid, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    al0 = 1 if approx else 0

    # scan 1: interleaved DC first (Al=al0)
    out += sos(list(range(1, nc + 1)), 0, 0, 0, al0)
    bw = _BitWriter()
    preds = [0] * nc
    rstn = [0]

    def maybe_restart(unit):
        nonlocal bw, preds
        if restart and unit and unit % restart == 0:
            nonlocal_out = bw.flush()
            preds = [0] * nc
            bw = _BitWriter()
            marker = bytes([0xFF, 0xD0 + (rstn[0] % 8)])
            rstn[0] += 1
            return nonlocal_out + marker
        return b""

    for m in range(mcux * mcuy):
        out += maybe_restart(m)
        my, mx = divmod(m, mcux)
        for ci, (blocks, sh, sv, hb, wb) in enumerate(comp_coefs):
            for v in range(sv):
                for hh in range(sh):
                    coef0 = int(blocks[(my * sv + v) * wb + (mx * sh + hh)][0]) >> al0
                    diff = coef0 - preds[ci]
                    preds[ci] = coef0
                    t = _category(diff)
                    bw.write(dc_code[t], 8)
                    _enc_value(bw, diff, t)
    out += bw.flush()

    if approx:  # scan 2: DC refine (Ah=1, Al=0): one raw bit per block
        out += sos(list(range(1, nc + 1)), 0, 0, 1, 0)
        bw = _BitWriter()
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for blocks, sh, sv, hb, wb in comp_coefs:
                for v in range(sv):
                    for hh in range(sh):
                        bw.write(int(blocks[(my * sv + v) * wb + (mx * sh + hh)][0]) & 1, 1)
        out += bw.flush()

    def used_dims(sh, sv):
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        return -(-ch // 8), -(-cw // 8)

    for ci, (blocks, sh, sv, hb, wb) in enumerate(comp_coefs):
        hb_used, wb_used = used_dims(sh, sv)
        # AC first scan 1..63 at Al=al0
        out += sos([ci + 1], 1, 63, 0, al0)
        bw = _BitWriter()
        rstn = [0]
        for by in range(hb_used):
            for bx in range(wb_used):
                unit = by * wb_used + bx
                if restart and unit and unit % restart == 0:
                    out += bw.flush() + bytes([0xFF, 0xD0 + (rstn[0] % 8)])
                    rstn[0] += 1
                    bw = _BitWriter()
                row = blocks[by * wb + bx]
                r = 0
                for k in range(1, 64):
                    t = int(row[ZIGZAG[k]])
                    tv = (abs(t) >> al0) * (1 if t >= 0 else -1)
                    if tv == 0:
                        r += 1
                        continue
                    while r > 15:
                        bw.write(ac_code[0xF0], 8)
                        r -= 16
                    sz = _category(tv)
                    bw.write(ac_code[(r << 4) | sz], 8)
                    _enc_value(bw, tv, sz)
                    r = 0
                if r:
                    bw.write(ac_code[0x00], 8)  # EOB (eobrun = 1)
        out += bw.flush()

    if approx:
        for ci, (blocks, sh, sv, hb, wb) in enumerate(comp_coefs):
            hb_used, wb_used = used_dims(sh, sv)
            out += sos([ci + 1], 1, 63, 1, 0)  # AC refine Ah=1 -> Al=0
            bw = _BitWriter()
            for by in range(hb_used):
                for bx in range(wb_used):
                    row = blocks[by * wb + bx]
                    absv = [abs(int(row[ZIGZAG[k]])) for k in range(64)]
                    eob = 0
                    for k in range(1, 64):
                        if absv[k] == 1:
                            eob = k
                    r = 0
                    pending = []
                    for k in range(1, 64):
                        t = absv[k]
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and k <= eob:
                            bw.write(ac_code[0xF0], 8)
                            for b in pending:
                                bw.write(b, 1)
                            pending = []
                            r -= 16
                        if t > 1:  # history nonzero: buffered correction bit
                            pending.append(t & 1)
                            continue
                        # newly nonzero (|t| == 1)
                        bw.write(ac_code[(r << 4) | 1], 8)
                        bw.write(1 if int(row[ZIGZAG[k]]) >= 0 else 0, 1)
                        for b in pending:
                            bw.write(b, 1)
                        pending = []
                        r = 0
                    if r or pending:
                        bw.write(ac_code[0x00], 8)
                        for b in pending:
                            bw.write(b, 1)
            out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


class TestProgressive:
    def test_spectral_selection_matches_baseline(self):
        img = _text_image()
        prog = decode_jpeg(encode_jpeg_progressive(img, qval=1, approx=False))
        base = decode_jpeg(encode_jpeg(img, qval=1))
        assert np.array_equal(prog, base)

    def test_successive_approximation_gray(self):
        img = _text_image()
        got = decode_jpeg(encode_jpeg_progressive(img, qval=1, approx=True))
        base = decode_jpeg(encode_jpeg(img, qval=1))
        assert np.array_equal(got, base)

    def test_successive_approximation_color(self):
        h, w = 40, 72  # 72 makes the used luma grid narrower than padded
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(yy * 5) % 256, (xx * 3) % 256, ((yy + 2 * xx)) % 256], axis=2
        ).astype(np.uint8)
        got = decode_jpeg(encode_jpeg_progressive(img, qval=1, approx=True))
        base = decode_jpeg(encode_jpeg(img, qval=1))
        assert np.array_equal(got, base)

    def test_progressive_with_restart_intervals(self):
        # exercises restarts in the interleaved DC scan (MCU-counted) AND
        # the non-interleaved AC scans (block-counted, eobrun reset)
        img = _text_image(h=48, w=128)
        data = encode_jpeg_progressive(img, qval=1, approx=False, restart=3)
        assert b"\xff\xd0" in data or b"\xff\xd1" in data
        base = decode_jpeg(encode_jpeg(img, qval=1))
        assert np.array_equal(decode_jpeg(data), base)

    def test_quantized_progressive_readable(self):
        img = _text_image()
        got = decode_jpeg(encode_jpeg_progressive(img, qval=8, approx=True))
        assert got[img < 64].mean() < 100
        assert got[img > 192].mean() > 180

    def test_truncated_after_first_scans_keeps_preview(self):
        img = _text_image()
        data = encode_jpeg_progressive(img, qval=1, approx=True)
        # cut inside the AC scans: DC-only preview must still render
        got = decode_jpeg(data[: int(len(data) * 0.5)])
        assert got.shape == img.shape

    def test_progressive_fixture_extracts_end_to_end(self):
        from activestorage_ocr_spark.engine.extract import extract_document
        from activestorage_ocr_spark.engine import rasters as r

        img = r.render_text("PROG 5", scale=2)
        res = extract_document(encode_jpeg_progressive(img, qval=1))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "PROG 5"


class TestArithmetic:
    """Arithmetic-coded JPEG (T.81 Annex F, SOF9/SOF10).

    Fixtures in tests/data/arithjpeg are TRUE-PRODUCER artifacts: encoded
    by the system libjpeg's arithmetic coder (the canonical public
    implementation of the spec), with goldens from the same library —
    its entropy-decoded DCT coefficients (integer-exact pin, isolating
    entropy decoding from IDCT rounding) and its decoded pixels
    (tolerance pin). Covers sequential + progressive, grayscale + 4:2:0
    YCbCr, restart intervals, and real DAC conditioning segments."""

    DIR = __file__.rsplit("/", 1)[0] + "/data/arithjpeg"
    NAMES = [
        "text_seq_gray_q97", "text_seq_gray_q75", "noise_seq_gray_odd",
        "text_seq_gray_rst2", "text_prog_gray", "noise_prog_gray_rst3",
        "color_seq_420", "color_prog_420",
    ]

    def _jpg(self, name):
        with open(f"{self.DIR}/{name}.jpg", "rb") as fh:
            return fh.read()

    def _golden(self):
        return np.load(f"{self.DIR}/libjpeg_golden.npz")

    @pytest.mark.parametrize("name", NAMES)
    def test_coefficients_exact_vs_libjpeg(self, name):
        g = self._golden()
        comps = jpegx.decode_jpeg_coefficients(self._jpg(name))
        for ci, (hb, wb, coef) in enumerate(comps):
            wbr, hbr = g[f"{name}__dim{ci}"]
            ref = g[f"{name}__c{ci}"].reshape(hbr, wbr, 64)
            mine = coef.reshape(hb, wb, 64)[:hbr, :wbr]
            assert np.array_equal(mine, ref), f"{name} comp{ci}"

    @pytest.mark.parametrize("name", NAMES)
    def test_pixels_close_to_libjpeg(self, name):
        g = self._golden()
        mine = decode_jpeg(self._jpg(name))
        ref = g[f"{name}__px"]
        assert mine.shape == ref.shape
        tol = 3 if mine.ndim == 3 else 1  # IDCT rounding; +upsample/CC for color
        assert np.abs(mine.astype(int) - ref.astype(int)).max() <= tol

    def test_frame_and_conditioning_markers(self):
        seq = self._jpg("text_seq_gray_q97")
        prog = self._jpg("text_prog_gray")
        rst = self._jpg("text_seq_gray_rst2")
        assert b"\xff\xc9" in seq and b"\xff\xcc" in seq  # SOF9 + DAC
        assert b"\xff\xca" in prog                        # SOF10
        assert b"\xff\xd0" in rst or b"\xff\xd1" in rst   # restarts

    def test_extracts_end_to_end(self):
        from activestorage_ocr_spark.engine.extract import extract_document

        for name in ("text_seq_gray_q97", "text_seq_gray_q75",
                     "text_prog_gray", "text_seq_gray_rst2"):
            res = extract_document(self._jpg(name))
            assert res["status"] == "ok", name
            assert res["extracted_text"] == "ARITH JPEG 99", name

    def test_arith_jpeg_inside_pdf_extracts(self):
        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        jpg = self._jpg("text_seq_gray_q97")
        img = decode_jpeg(jpg)
        h, w = img.shape
        pdf = pdfx.build_image_pdf([(jpg, "DCT", w, h)])
        res = extract_document(pdf)
        assert res["status"] == "ok"
        assert res["extracted_text"] == "ARITH JPEG 99"

    def test_dac_segment_parsing(self):
        # splice an explicit DEFAULT-valued DAC before SOS: semantically a
        # no-op, must decode identically; malformed DAC raises
        jpg = self._jpg("text_seq_gray_q97")
        base = decode_jpeg(jpg)
        sos = jpg.index(b"\xff\xda")
        dac = b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x11, 0x05])
        assert np.array_equal(decode_jpeg(jpg[:sos] + dac + jpg[sos:]), base)
        bad = b"\xff\xcc" + struct.pack(">H", 4) + bytes([0x20, 0x05])
        with pytest.raises(ValueError, match="DAC"):
            decode_jpeg(jpg[:sos] + bad + jpg[sos:])

    def test_lossless_arithmetic_still_rejected(self):
        jpg = bytearray(self._jpg("text_seq_gray_q97"))
        jpg[jpg.index(b"\xff\xc9") + 1] = 0xCB
        with pytest.raises(ValueError, match="lossless"):
            decode_jpeg(bytes(jpg))

    def test_truncated_arith_keeps_prefix(self):
        jpg = self._jpg("noise_seq_gray_odd")
        got = decode_jpeg(jpg[: int(len(jpg) * 0.7)])
        assert got.shape == (37, 61)  # partial decode, no crash

    def test_encoder_mirror_roundtrip(self):
        # fixture-encoder mirror (sequential SOF9 gray): with qval=1 the
        # only loss is FDCT/IDCT rounding, like the Huffman test encoder
        img = _text_image()
        for restart in (0, 3):
            jpg = jpegx.encode_jpeg_arith(img, qval=1, restart=restart)
            assert b"\xff\xc9" in jpg
            got = decode_jpeg(jpg)
            assert got.shape == img.shape
            assert np.abs(got.astype(int) - img.astype(int)).max() <= 2
        rng = np.random.default_rng(3)
        noise = rng.integers(0, 256, (41, 59), dtype=np.uint8)
        got = decode_jpeg(jpegx.encode_jpeg_arith(noise, qval=1, restart=2))
        assert np.abs(got.astype(int) - noise.astype(int)).max() <= 2

    def test_encoder_mirror_coefficient_exact(self):
        # entropy layer is lossless: the decoder must reproduce the exact
        # quantized coefficients the encoder committed to the stream
        img = _text_image()
        jpg = jpegx.encode_jpeg_arith(img, qval=2)
        (hb, wb, coef), = jpegx.decode_jpeg_coefficients(jpg)
        h, w = img.shape
        pad = np.full((hb * 8, wb * 8), 128, dtype=np.float64)
        pad[:h, :w] = img
        blocks = pad.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
        want = np.round(
            np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True) / 2.0
        ).astype(np.int32).reshape(-1, 64)
        assert np.array_equal(coef, want)

    def test_dcta_pdf_kind_extracts(self):
        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        img = rasters.render_text("DCTA 31", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, "DCTA")]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "DCTA 31"
        # corrupt stream quarantines per-image, never crashes
        res = extract_document(
            pdfx.build_image_pdf([(img, "DCTA")], corrupt_data=True))
        assert res["status"] != "PROCESSING_ERROR" or res["warnings"]

    def test_mutated_streams_never_crash(self):
        # deterministic byte-corruption storm: every outcome must be a
        # clean decode or ValueError — never an internal error
        jpg = self._jpg("text_seq_gray_rst2")
        rng = np.random.default_rng(11)
        for _ in range(120):
            buf = bytearray(jpg)
            for _ in range(int(rng.integers(1, 4))):
                buf[int(rng.integers(2, len(buf)))] = int(rng.integers(0, 256))
            try:
                decode_jpeg(bytes(buf))
            except ValueError:
                pass


class TestErrors:

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n")

    def test_truncated_tail_keeps_prefix(self):
        img = _text_image()
        data = encode_jpeg(img, qval=1)
        got = decode_jpeg(data[: int(len(data) * 0.7)])
        assert got.shape == img.shape  # partial decode, no crash

    def test_truncated_header_raises(self):
        img = _text_image()
        data = encode_jpeg(img)
        with pytest.raises(ValueError):
            decode_jpeg(data[:40])


class TestDispatch:
    def test_stub_payloads_still_decode(self):
        img = _text_image()
        stub = rasters.encode_jpeg_stub(img)
        got = rasters.decode_jpeg(stub)
        assert np.array_equal(got, img)

    def test_real_payloads_route_to_jpegx(self):
        img = _text_image()
        got = rasters.decode_jpeg(encode_jpeg(img, qval=1))
        assert got.shape == img.shape
