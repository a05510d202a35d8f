"""Unit tests for the pure-Python VP8L (lossless WebP) decoder
(`engine.webpx`).

A minimal TEST-ONLY VP8L encoder lives here — literal pixels with real
canonical prefix codes (simple 1-2-symbol form and the full
code-length-coded form), optional dist-1 LZ77 runs, optional color cache,
optional SUBTRACT_GREEN and COLOR_INDEXING (palette, incl. 1-bit packing)
transforms — so the decoder gets true lossless round-trip coverage without
any external imaging library.
"""

import heapq
import struct

import numpy as np
import pytest

from activestorage_ocr_spark.engine import rasters, webpx
from activestorage_ocr_spark.engine.webpx import _CL_ORDER, decode_webp


# ---------------------------------------------------------------------------
# minimal encoder (test-only)
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v, k):
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _huff_lengths(freqs):
    """symbol -> code length (canonical-compatible, <= 15 for our data)."""
    items = [(f, s) for s, f in freqs.items() if f > 0]
    if len(items) == 1:
        return {items[0][1]: 1}
    heap = [(f, [s]) for f, s in sorted(items)]
    heapq.heapify(heap)
    lengths = {s: 0 for _, s in items}
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    return lengths


def _canonical_codes(lengths):
    """Match the decoder's canonical assignment: sort by (len, symbol)."""
    syms = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    codes = {}
    code = 0
    prev = syms[0][0]
    for ln, s in syms:
        code <<= ln - prev
        prev = ln
        codes[s] = (ln, code)
        code += 1
    return codes


class _Code:
    """One prefix code: knows how to write its own header and symbols."""

    def __init__(self, freqs, alphabet):
        used = sorted(s for s, f in freqs.items() if f > 0)
        self.simple = len(used) <= 2
        self.alphabet = alphabet
        if self.simple:
            self.syms = used if used else [0]
            self.codes = None
        else:
            lengths = _huff_lengths(freqs)
            self.codes = _canonical_codes(lengths)
            self.lengths = [lengths.get(s, 0) for s in range(alphabet)]

    def write_header(self, bw):
        if self.simple:
            bw.write(1, 1)  # simple
            bw.write(len(self.syms) - 1, 1)
            first = self.syms[0]
            if first <= 1:
                bw.write(0, 1)
                bw.write(first, 1)
            else:
                bw.write(1, 1)
                bw.write(first, 8)
            if len(self.syms) == 2:
                bw.write(self.syms[1], 8)
            return
        bw.write(0, 1)  # normal
        bw.write(19 - 4, 4)
        cl_freqs = {}
        for ln in self.lengths:
            cl_freqs[ln] = cl_freqs.get(ln, 0) + 1
        cl_lengths = _huff_lengths(cl_freqs)
        for sym in _CL_ORDER:
            bw.write(cl_lengths.get(sym, 0), 3)
        bw.write(0, 1)  # no max_symbol
        self._cl_codes = _canonical_codes(cl_lengths) if len(cl_lengths) > 1 else None
        for ln in self.lengths:
            if self._cl_codes is not None:
                cln, code = self._cl_codes[ln]
                for i in range(cln - 1, -1, -1):
                    bw.write((code >> i) & 1, 1)
            # single-symbol code-length code: zero bits per symbol

    def write_symbol(self, bw, s):
        if self.simple:
            if len(self.syms) == 1:
                return  # zero bits
            bw.write(self.syms.index(s), 1)
            return
        ln, code = self.codes[s]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


def _prefix_encode(v):
    """inverse of webpx._prefix_value: value -> (prefix, extra_bits, nbits)."""
    for p in range(40):
        if p < 4:
            if v == p + 1:
                return p, 0, 0
            continue
        extra = (p - 2) >> 1
        lo = ((2 + (p & 1)) << extra) + 1
        hi = lo + (1 << extra) - 1
        if lo <= v <= hi:
            return p, v - lo, extra
    raise ValueError(v)


def _cache_key(px, bits):
    return (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - bits)


def encode_vp8l(img, cache_bits=0, rle=False, subtract_green=False, palette=False):
    """img: (h,w,3) RGB uint8 -> RIFF/WEBP VP8L bytes (lossless)."""
    h, w = img.shape[:2]
    px_rows = [
        [(255, int(r), int(g), int(b)) for r, g, b in row] for row in img.astype(int)
    ]
    bw = _BitW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    enc_w = w
    if palette:
        flat = [p for row in px_rows for p in row]
        pal = sorted(set(flat))
        assert len(pal) <= 2, "test encoder packs only <=2-color palettes"
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(pal) - 1, 8)
        # palette written as a 1-high image, delta-coded
        deltas = []
        prev = (0, 0, 0, 0)
        for p in pal:
            deltas.append(tuple((c - q) & 0xFF for c, q in zip(p, prev)))
            prev = p
        _write_plain_image(bw, [deltas])
        index = {p: i for i, p in enumerate(pal)}
        packed_rows = []
        enc_w = (w + 7) // 8
        for row in px_rows:
            packed = []
            for bx in range(enc_w):
                byte = 0
                for i in range(8):
                    x = bx * 8 + i
                    if x < w:
                        byte |= index[row[x]] << i
                packed.append((255, 0, byte, 0))
            packed_rows.append(packed)
        px_rows = packed_rows
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        px_rows = [
            [(a, (r - g) & 0xFF, g, (b - g) & 0xFF) for a, r, g, b in row]
            for row in px_rows
        ]
    bw.write(0, 1)  # end of transforms

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix image

    # tokenize
    flat = [p for row in px_rows for p in row]
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    n = len(flat)
    while i < n:
        p = flat[i]
        if rle and i > 0 and flat[i - 1] == p:
            run = 0
            while i + run < n and flat[i + run] == p:
                run += 1
            tokens.append(("copy", run, 1))
            if cache is not None:
                px32 = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
                cache[_cache_key(px32, cache_bits)] = px32
            i += run
            continue
        px32 = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
        if cache is not None and cache[_cache_key(px32, cache_bits)] == px32:
            tokens.append(("cache", _cache_key(px32, cache_bits)))
        else:
            tokens.append(("lit", p))
            if cache is not None:
                cache[_cache_key(px32, cache_bits)] = px32
        i += 1

    gf, rf, bf, af, df = {}, {}, {}, {}, {}
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif t[0] == "copy":
            lp, _, _ = _prefix_encode(t[1])
            gf[256 + lp] = gf.get(256 + lp, 0) + 1
            dp, _, _ = _prefix_encode(t[2] + 120)
            df[dp] = df.get(dp, 0) + 1
        else:
            gf[280 + t[1]] = gf.get(280 + t[1], 0) + 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    codes = [
        _Code(gf, green_alpha),
        _Code(rf, 256),
        _Code(bf, 256),
        _Code(af, 256),
        _Code(df, 40),
    ]
    for c in codes:
        c.write_header(bw)
    gc, rc, bc, ac, dc = codes
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1]
            gc.write_symbol(bw, g)
            rc.write_symbol(bw, r)
            bc.write_symbol(bw, b)
            ac.write_symbol(bw, a)
        elif t[0] == "copy":
            lp, extra, nbits = _prefix_encode(t[1])
            gc.write_symbol(bw, 256 + lp)
            if nbits:
                bw.write(extra, nbits)
            dp, dextra, dnbits = _prefix_encode(t[2] + 120)
            dc.write_symbol(bw, dp)
            if dnbits:
                bw.write(dextra, dnbits)
        else:
            gc.write_symbol(bw, 280 + t[1])

    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_plain_image(bw, px_rows):
    """Inner (transform) image: no transforms bit is NOT present (only
    level-0 images carry transforms); no cache, no meta; literal pixels."""
    gf, rf, bf, af, df = {}, {}, {}, {}, {}
    for row in px_rows:
        for a, r, g, b in row:
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
    bw.write(0, 1)  # no color cache
    codes = [
        _Code(gf, 256 + 24),
        _Code(rf, 256),
        _Code(bf, 256),
        _Code(af, 256),
        _Code(df, 40),
    ]
    for c in codes:
        c.write_header(bw)
    gc, rc, bc, ac, _ = codes
    for row in px_rows:
        for a, r, g, b in row:
            gc.write_symbol(bw, g)
            rc.write_symbol(bw, r)
            bc.write_symbol(bw, b)
            ac.write_symbol(bw, a)


def _gradient_rgb(h=23, w=37):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 7 + 3) % 256, (xx * 5 + 11) % 256, ((yy + xx) * 3) % 256], axis=2
    ).astype(np.uint8)


def _text_rgb():
    g = rasters.render_text("WEBP 7", scale=1)
    canvas = np.full((40, 120), 255, dtype=np.uint8)
    canvas[8 : 8 + g.shape[0], 4 : 4 + g.shape[1]] = g
    return np.repeat(canvas[:, :, None], 3, axis=2)


class TestRoundTrip:
    def test_literals_lossless(self):
        img = _gradient_rgb()
        got = decode_webp(encode_vp8l(img))
        assert np.array_equal(got, img)

    def test_simple_codes_two_color(self):
        img = _text_rgb()  # two gray levels -> simple 2-symbol codes
        got = decode_webp(encode_vp8l(img))
        assert np.array_equal(got, img)

    def test_lz77_runs(self):
        img = _text_rgb()
        data = encode_vp8l(img, rle=True)
        assert np.array_equal(decode_webp(data), img)
        # runs must actually compress vs pure literals
        assert len(data) < len(encode_vp8l(img))

    def test_color_cache(self):
        img = _gradient_rgb(16, 16)
        img[4:12, 4:12] = img[2, 2]  # repeated color -> cache hits
        data = encode_vp8l(img, cache_bits=4)
        assert np.array_equal(decode_webp(data), img)

    def test_subtract_green_transform(self):
        img = _gradient_rgb()
        got = decode_webp(encode_vp8l(img, subtract_green=True))
        assert np.array_equal(got, img)

    def test_palette_transform_packed_1bit(self):
        img = _text_rgb()
        data = encode_vp8l(img, palette=True)
        assert np.array_equal(decode_webp(data), img)
        assert len(data) < len(encode_vp8l(img))  # 1 bit/px beats literals

    def test_cache_plus_rle(self):
        img = _text_rgb()
        data = encode_vp8l(img, cache_bits=3, rle=True)
        assert np.array_equal(decode_webp(data), img)


class TestErrors:
    def test_vp8_lossy_routes_to_vp8x(self):
        # round 3: VP8 (lossy) chunks decode via engine/vp8x.py instead of
        # raising (full parity tests live in test_engine_vp8.py)
        import os
        fx = "/root/reference/rust/tests/fixtures/sample_text.webp"
        if not os.path.exists(fx):
            pytest.skip("reference fixtures not present")
        out = webpx.decode_webp(open(fx, "rb").read())
        assert out.shape == (100, 400, 3)

    def test_not_webp(self):
        with pytest.raises(ValueError):
            decode_webp(b"RIFF\x00\x00\x00\x00WAVE")

    def test_truncated_raises_cleanly(self):
        img = _gradient_rgb()
        data = encode_vp8l(img)
        with pytest.raises(ValueError):
            decode_webp(data[: len(data) // 2])

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            webpx.decode_vp8l(b"\x00\x01\x02")


class TestDispatch:
    def test_stub_payloads_still_decode(self):
        g = rasters.render_text("STUB 1", scale=1)
        stub = rasters.encode_webp_stub(g)
        assert np.array_equal(rasters.decode_webp(stub), g)

    def test_real_vp8l_routes_to_webpx(self):
        img = _gradient_rgb()
        got = rasters.decode_webp(encode_vp8l(img))
        assert np.array_equal(got, img)


class TestInversePredictor:
    def _forward(self, target, bs_bits, tiles):
        """Independent forward predictor: residual = pixel - pred, using the
        already-known target as the reconstructed neighborhood."""
        h, w = target.shape[:2]
        modes = tiles[:, :, 2]
        res = np.zeros_like(target, dtype=np.int64)
        t = target.astype(np.int64)
        for y in range(h):
            for x in range(w):
                if y == 0 and x == 0:
                    pred = np.array([255, 0, 0, 0])
                elif y == 0:
                    pred = t[0, x - 1]
                elif x == 0:
                    pred = t[y - 1, 0]
                else:
                    m = modes[y >> bs_bits, x >> bs_bits]
                    L, T, TL = t[y, x - 1], t[y - 1, x], t[y - 1, x - 1]
                    TR = t[y - 1, x + 1] if x + 1 < w else t[y, 0]
                    a2 = lambda a, b: (a + b) // 2
                    if m == 0:
                        pred = np.array([255, 0, 0, 0])
                    elif m == 1: pred = L
                    elif m == 2: pred = T
                    elif m == 3: pred = TR
                    elif m == 4: pred = TL
                    elif m == 5: pred = a2(a2(L, TR), T)
                    elif m == 6: pred = a2(L, TL)
                    elif m == 7: pred = a2(L, T)
                    elif m == 8: pred = a2(TL, T)
                    elif m == 9: pred = a2(T, TR)
                    elif m == 10: pred = a2(a2(L, TL), a2(T, TR))
                    elif m == 11:
                        pl = int(np.abs(T - TL).sum())
                        pt = int(np.abs(L - TL).sum())
                        pred = L if pl < pt else T
                    elif m == 12:
                        pred = np.clip(L + T - TL, 0, 255)
                    else:
                        avg = a2(L, T)
                        d = avg - TL
                        half = np.sign(d) * (np.abs(d) // 2)
                        pred = np.clip(avg + half, 0, 255)
                res[y, x] = (t[y, x] - pred) & 0xFF
        return res.astype(np.uint8)

    def test_every_mode_round_trips(self):
        rng = np.random.default_rng(11)
        h, w = 18, 23
        target = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        target[:, :, 0] = 255
        bs_bits = 2  # 4x4 tiles
        th, tw = (h + 3) // 4, (w + 3) // 4
        tiles = np.zeros((th, tw, 4), dtype=np.uint8)
        # cycle all 14 modes across tiles
        tiles[:, :, 2] = (np.arange(th * tw).reshape(th, tw) % 14).astype(np.uint8)
        res = self._forward(target, bs_bits, tiles)
        got = webpx._inverse_predictor(res, bs_bits, tiles)
        assert np.array_equal(got, target)

    def test_bad_mode_rejected(self):
        img = np.zeros((9, 9, 4), dtype=np.uint8)
        tiles = np.full((3, 3, 4), 99, dtype=np.uint8)
        with pytest.raises(ValueError, match="predictor mode"):
            webpx._inverse_predictor(img, 2, tiles)
