"""JPEG 2000 (ITU-T T.800 / ISO 15444-1) codec — the `/JPXDecode` PDF filter.

Pure-Python decoder *and* encoder for the Part-1 codestream, written from the
public spec (no external data): raw `SOC..EOC` codestreams and the JP2 box
container, tag-tree tier-2 packet headers (T.800 B.10), the full three-pass
EBCOT tier-1 block coder (Annex D) on top of the T.88 MQ arithmetic coder
already in `engine/jbig2x.py` (JPEG 2000 Annex C is the same coder with its
own context set), multi-level 5/3 reversible DWT with RCT (Annex F/G —
bit-exact lossless round-trip) and the 9/7 irreversible DWT with ICT and
scalar dequantization (Annex E) for the lossy path.

Reference parity note: the reference's raster decode supports none of this —
its `ocrs.rs:467-582` errors on anything but raw Gray/RGB/CMYK streams — so
JPX support is strictly beyond-reference crawl-reality coverage, like
CCITT (`ccittx.py`) and JBIG2 (`jbig2x.py`). The encoder exists so fixtures
need no external tool; lossless round-trips are pinned bit-exact in
`tests/test_engine_jp2.py` and lossy round-trips by PSNR.

Supported subset (rejections are honest ``Jp2Error``s, quarantined upstream):
single image origin 0 (``XOsiz=YOsiz=XTOsiz=YTOsiz=0``), no component
subsampling (``XRsiz=YRsiz=1``), code-block style 0 (no bypass/termall/
causal), sub-tile precinct partitions (per-resolution exponents, one
packet per precinct, per-precinct tag trees), all five progression
orders, multiple tiles and tile-parts, SOP/EPH markers, COC/QCC
per-component overrides (the layout real encoders emit for
visually-weighted chroma), 1..4 components, depths up to 16 bits (scaled
to 8 on output).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import budget
from .jbig2x import MQDecoder, MQEncoder


class Jp2Error(ValueError):
    """Raised for malformed or unsupported JPEG 2000 payloads."""


_MAX_SAMPLES = 16_000_000  # per-component decode cap, matching jbig2x

# ---------------------------------------------------------------------------
# packet-header bit IO (T.800 B.10.1): MSB-first, a zero bit is stuffed after
# every 0xFF byte
# ---------------------------------------------------------------------------


class _HdrWriter:
    __slots__ = ("out", "cur", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def put(self, bit: int) -> None:
        limit = 7 if self.out and self.out[-1] == 0xFF else 8
        self.cur = (self.cur << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == limit:
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def put_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((value >> i) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            limit = 7 if self.out and self.out[-1] == 0xFF else 8
            self.out.append(self.cur << (limit - self.nbits))
            self.cur = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)  # terminal stuffing byte
        return bytes(self.out)


class _HdrReader:
    __slots__ = ("data", "pos", "cur", "nbits", "prev_ff")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.prev_ff = False

    def get(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise Jp2Error("packet header truncated")
            b = self.data[self.pos]
            self.pos += 1
            self.cur = b
            self.nbits = 7 if self.prev_ff else 8
            if self.prev_ff:
                self.cur &= 0x7F
            self.prev_ff = b == 0xFF
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> int:
        """Finish the header: drop partial bits, consume the terminal
        stuffing byte if the last full byte was 0xFF; return the offset of
        the first body byte."""
        self.nbits = 0
        if self.prev_ff:
            if self.pos < len(self.data):
                self.pos += 1
            self.prev_ff = False
        return self.pos


# ---------------------------------------------------------------------------
# tag trees (T.800 B.10.2)
# ---------------------------------------------------------------------------


def _tt_levels(w: int, h: int) -> list[tuple[int, int]]:
    dims = [(w, h)]
    while dims[-1] != (1, 1):
        pw, ph = dims[-1]
        dims.append(((pw + 1) // 2, (ph + 1) // 2))
    return dims  # leaves first, root last


class TagTreeEncoder:
    """Quad-tree coder over a w×h grid of non-negative leaf values."""

    def __init__(self, w: int, h: int) -> None:
        self.dims = _tt_levels(w, h)
        self.values = [np.zeros((lh, lw), dtype=np.int64) for lw, lh in self.dims]
        self.low = [np.zeros((lh, lw), dtype=np.int64) for lw, lh in self.dims]
        self.known = [np.zeros((lh, lw), dtype=bool) for lw, lh in self.dims]

    def set_value(self, x: int, y: int, v: int) -> None:
        self.values[0][y, x] = v

    def finalize(self) -> None:
        """Fill internal nodes with the min of their children."""
        for lvl in range(1, len(self.dims)):
            child = self.values[lvl - 1]
            ch, cw = child.shape
            ph, pw = self.values[lvl].shape
            pad = np.full((ph * 2, pw * 2), np.iinfo(np.int64).max, dtype=np.int64)
            pad[:ch, :cw] = child
            self.values[lvl] = np.minimum.reduce(
                [pad[0::2, 0::2], pad[0::2, 1::2], pad[1::2, 0::2], pad[1::2, 1::2]]
            )

    def encode(self, x: int, y: int, threshold: int, w: _HdrWriter) -> None:
        """Emit the bits that tell a decoder whether value(x,y) < threshold."""
        path = []
        xi, yi = x, y
        for lvl in range(len(self.dims)):
            path.append((lvl, xi, yi))
            xi //= 2
            yi //= 2
        lo = 0
        for lvl, xi, yi in reversed(path):  # root -> leaf
            low, known, val = self.low[lvl], self.known[lvl], self.values[lvl]
            if low[yi, xi] < lo:
                low[yi, xi] = lo
            while not known[yi, xi] and low[yi, xi] < threshold:
                if low[yi, xi] == val[yi, xi]:
                    w.put(1)
                    known[yi, xi] = True
                else:
                    w.put(0)
                    low[yi, xi] += 1
            if not known[yi, xi]:
                return  # value >= threshold; nothing below decodable yet
            lo = low[yi, xi]


class TagTreeDecoder:
    def __init__(self, w: int, h: int) -> None:
        self.dims = _tt_levels(w, h)
        self.low = [np.zeros((lh, lw), dtype=np.int64) for lw, lh in self.dims]
        self.known = [np.zeros((lh, lw), dtype=bool) for lw, lh in self.dims]

    def decode(self, x: int, y: int, threshold: int, r: _HdrReader) -> bool:
        """True iff value(x,y) < threshold (leaf value is then known)."""
        path = []
        xi, yi = x, y
        for lvl in range(len(self.dims)):
            path.append((lvl, xi, yi))
            xi //= 2
            yi //= 2
        lo = 0
        for lvl, xi, yi in reversed(path):
            low, known = self.low[lvl], self.known[lvl]
            if low[yi, xi] < lo:
                low[yi, xi] = lo
            while not known[yi, xi] and low[yi, xi] < threshold:
                if r.get():
                    known[yi, xi] = True
                else:
                    low[yi, xi] += 1
            if not known[yi, xi]:
                return False
            lo = low[yi, xi]
        return True

    def value(self, x: int, y: int) -> int:
        return int(self.low[0][y, x])


# ---------------------------------------------------------------------------
# EBCOT tier-1 block coder (T.800 Annex D) over the T.88 MQ coder
# ---------------------------------------------------------------------------

# 19 contexts: 0-8 zero coding, 9-13 sign coding, 14-16 magnitude
# refinement, 17 run-length, 18 uniform.  Initial states per D.7:
# ZC context 0 -> state 4, RL -> 3, UNI -> 46, all others 0 / MPS 0.
_CX_RL = 17
_CX_UNI = 18
_N_CTX = 19


def _t1_init_ctx() -> tuple[bytearray, bytearray]:
    cx_i = bytearray(_N_CTX)
    cx_i[0] = 4
    cx_i[_CX_RL] = 3
    cx_i[_CX_UNI] = 46
    return cx_i, bytearray(_N_CTX)


# Zero-coding context per (sum_h, sum_v, sum_d), T.800 Table D.1, for the
# LL/LH orientation (sum_h primary).  HL swaps h/v; HH keys on (d, h+v).
def _zc_table_llh() -> dict:
    t = {}
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                elif v == 2:
                    c = 4
                elif v == 1:
                    c = 3
                else:
                    c = 2 if d >= 2 else (1 if d == 1 else 0)
                t[(h, v, d)] = c
    return t


def _zc_table_hh() -> dict:
    t = {}
    for h in range(3):
        for v in range(3):
            for d in range(5):
                hv = h + v
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else (1 if hv == 1 else 0)
                t[(h, v, d)] = c
    return t


_ZC_LLH = _zc_table_llh()
_ZC_HH = _zc_table_hh()

# Sign-coding (T.800 Table D.3): (h, v) -> (context, xor-bit) with h, v the
# clamped [-1, 1] sums of horizontal / vertical signed significance.
_SC = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}

#: band orientation codes
_OR_LL, _OR_HL, _OR_LH, _OR_HH = 0, 1, 2, 3


class _T1State:
    """Shared per-block coding state + context math for encode and decode."""

    __slots__ = ("w", "h", "sig", "neg", "visited", "refined", "orient")

    def __init__(self, w: int, h: int, orient: int):
        self.w = w
        self.h = h
        self.orient = orient
        self.sig = bytearray(w * h)
        self.neg = bytearray(w * h)
        self.visited = bytearray(w * h)
        self.refined = bytearray(w * h)

    def zc_ctx(self, x: int, y: int) -> int:
        w, h, sig = self.w, self.h, self.sig
        sh = sv = sd = 0
        if x > 0 and sig[y * w + x - 1]:
            sh += 1
        if x + 1 < w and sig[y * w + x + 1]:
            sh += 1
        if y > 0 and sig[(y - 1) * w + x]:
            sv += 1
        if y + 1 < h and sig[(y + 1) * w + x]:
            sv += 1
        if x > 0 and y > 0 and sig[(y - 1) * w + x - 1]:
            sd += 1
        if x + 1 < w and y > 0 and sig[(y - 1) * w + x + 1]:
            sd += 1
        if x > 0 and y + 1 < h and sig[(y + 1) * w + x - 1]:
            sd += 1
        if x + 1 < w and y + 1 < h and sig[(y + 1) * w + x + 1]:
            sd += 1
        if self.orient == _OR_HH:
            return _ZC_HH[(sh, sv, sd)]
        if self.orient == _OR_HL:
            sh, sv = sv, sh
        return _ZC_LLH[(sh, sv, sd)]

    def sc_ctx(self, x: int, y: int) -> tuple[int, int]:
        w, h, sig, neg = self.w, self.h, self.sig, self.neg
        sh = sv = 0
        if x > 0 and sig[y * w + x - 1]:
            sh += -1 if neg[y * w + x - 1] else 1
        if x + 1 < w and sig[y * w + x + 1]:
            sh += -1 if neg[y * w + x + 1] else 1
        if y > 0 and sig[(y - 1) * w + x]:
            sv += -1 if neg[(y - 1) * w + x] else 1
        if y + 1 < h and sig[(y + 1) * w + x]:
            sv += -1 if neg[(y + 1) * w + x] else 1
        sh = max(-1, min(1, sh))
        sv = max(-1, min(1, sv))
        return _SC[(sh, sv)]

    def mr_ctx(self, x: int, y: int) -> int:
        if self.refined[y * self.w + x]:
            return 16
        w, h, sig = self.w, self.h, self.sig
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nx, ny = x + dx, y + dy
                if 0 <= nx < w and 0 <= ny < h and sig[ny * w + nx]:
                    return 15
        return 14


def _t1_scan(w: int, h: int):
    """EBCOT scan order: stripes of 4 rows, column-major within a stripe."""
    for y0 in range(0, h, 4):
        for x in range(w):
            for y in range(y0, min(y0 + 4, h)):
                yield x, y


def t1_encode_block(mag: np.ndarray, neg: np.ndarray, orient: int) -> tuple[bytes, int, int]:
    """Encode one code-block; returns (codeword, nbps, npasses).

    ``mag`` is the coefficient magnitude (int, >= 0), ``neg`` the sign bit.
    All coding passes of all bitplanes are emitted as one MQ codeword
    segment (single layer, no bypass/termall).
    """
    h, w = mag.shape
    maxmag = int(mag.max()) if mag.size else 0
    if maxmag == 0:
        return b"", 0, 0
    nbps = maxmag.bit_length()
    st = _T1State(w, h, orient)
    cx_i, cx_mps = _t1_init_ctx()
    enc = MQEncoder()
    magf = mag.ravel()
    negf = neg.ravel()
    npasses = 0
    for p in range(nbps - 1, -1, -1):
        bit_p = 1 << p
        if p != nbps - 1:
            # significance propagation
            for x, y in _t1_scan(w, h):
                i = y * w + x
                if st.sig[i]:
                    continue
                ctx = st.zc_ctx(x, y)
                if ctx == 0:
                    continue
                b = 1 if (magf[i] & bit_p) else 0
                enc.encode(cx_i, cx_mps, ctx, b)
                st.visited[i] = 1
                if b:
                    st.sig[i] = 1
                    sctx, sxor = st.sc_ctx(x, y)
                    enc.encode(cx_i, cx_mps, sctx, int(negf[i]) ^ sxor)
            npasses += 1
            # magnitude refinement
            for x, y in _t1_scan(w, h):
                i = y * w + x
                if st.sig[i] and not st.visited[i]:
                    enc.encode(cx_i, cx_mps, st.mr_ctx(x, y), 1 if (magf[i] & bit_p) else 0)
                    st.refined[i] = 1
            npasses += 1
        # cleanup
        for y0 in range(0, h, 4):
            x = 0
            while x < w:
                run = y0 + 4 <= h
                if run:
                    for y in range(y0, y0 + 4):
                        i = y * w + x
                        if st.sig[i] or st.visited[i] or st.zc_ctx(x, y) != 0:
                            run = False
                            break
                start_y = y0
                if run:
                    first = -1
                    for k in range(4):
                        if magf[(y0 + k) * w + x] & bit_p:
                            first = k
                            break
                    if first < 0:
                        enc.encode(cx_i, cx_mps, _CX_RL, 0)
                        x += 1
                        continue
                    enc.encode(cx_i, cx_mps, _CX_RL, 1)
                    enc.encode(cx_i, cx_mps, _CX_UNI, (first >> 1) & 1)
                    enc.encode(cx_i, cx_mps, _CX_UNI, first & 1)
                    i = (y0 + first) * w + x
                    st.sig[i] = 1
                    sctx, sxor = st.sc_ctx(x, y0 + first)
                    enc.encode(cx_i, cx_mps, sctx, int(negf[i]) ^ sxor)
                    start_y = y0 + first + 1
                for y in range(start_y, min(y0 + 4, h)):
                    i = y * w + x
                    if st.sig[i] or st.visited[i]:
                        continue
                    b = 1 if (magf[i] & bit_p) else 0
                    enc.encode(cx_i, cx_mps, st.zc_ctx(x, y), b)
                    if b:
                        st.sig[i] = 1
                        sctx, sxor = st.sc_ctx(x, y)
                        enc.encode(cx_i, cx_mps, sctx, int(negf[i]) ^ sxor)
                x += 1
        npasses += 1
        st.visited = bytearray(w * h)
    return enc.flush(), nbps, npasses


def t1_decode_block(
    data: bytes, w: int, h: int, nbps: int, npasses: int, orient: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one code-block; returns (mag, neg) int64/uint8 arrays."""
    mag = np.zeros((h, w), dtype=np.int64)
    neg = np.zeros((h, w), dtype=np.uint8)
    if npasses <= 0 or nbps <= 0:
        return mag, neg
    st = _T1State(w, h, orient)
    cx_i, cx_mps = _t1_init_ctx()
    dec = MQDecoder(data)
    magf = mag.ravel()
    negf = neg.ravel()
    left = npasses
    p = nbps - 1
    first_plane = True
    while left > 0 and p >= 0:
        budget.check()  # per-coding-pass guard (engine wall budget)
        bit_p = 1 << p
        if not first_plane:
            # significance propagation
            for x, y in _t1_scan(w, h):
                i = y * w + x
                if st.sig[i]:
                    continue
                ctx = st.zc_ctx(x, y)
                if ctx == 0:
                    continue
                st.visited[i] = 1
                if dec.decode(cx_i, cx_mps, ctx):
                    st.sig[i] = 1
                    magf[i] |= bit_p
                    sctx, sxor = st.sc_ctx(x, y)
                    negf[i] = dec.decode(cx_i, cx_mps, sctx) ^ sxor
            left -= 1
            if left == 0:
                break
            # magnitude refinement
            for x, y in _t1_scan(w, h):
                i = y * w + x
                if st.sig[i] and not st.visited[i]:
                    if dec.decode(cx_i, cx_mps, st.mr_ctx(x, y)):
                        magf[i] |= bit_p
                    st.refined[i] = 1
            left -= 1
            if left == 0:
                break
        # cleanup
        for y0 in range(0, h, 4):
            x = 0
            while x < w:
                run = y0 + 4 <= h
                if run:
                    for y in range(y0, y0 + 4):
                        i = y * w + x
                        if st.sig[i] or st.visited[i] or st.zc_ctx(x, y) != 0:
                            run = False
                            break
                start_y = y0
                if run:
                    if not dec.decode(cx_i, cx_mps, _CX_RL):
                        x += 1
                        continue
                    first = (dec.decode(cx_i, cx_mps, _CX_UNI) << 1) | dec.decode(
                        cx_i, cx_mps, _CX_UNI
                    )
                    i = (y0 + first) * w + x
                    st.sig[i] = 1
                    magf[i] |= bit_p
                    sctx, sxor = st.sc_ctx(x, y0 + first)
                    negf[i] = dec.decode(cx_i, cx_mps, sctx) ^ sxor
                    start_y = y0 + first + 1
                for y in range(start_y, min(y0 + 4, h)):
                    i = y * w + x
                    if st.sig[i] or st.visited[i]:
                        continue
                    if dec.decode(cx_i, cx_mps, st.zc_ctx(x, y)):
                        st.sig[i] = 1
                        magf[i] |= bit_p
                        sctx, sxor = st.sc_ctx(x, y)
                        negf[i] = dec.decode(cx_i, cx_mps, sctx) ^ sxor
                x += 1
        left -= 1
        st.visited = bytearray(w * h)
        first_plane = False
        p -= 1
    return mag, neg


# ---------------------------------------------------------------------------
# discrete wavelet transforms (T.800 Annex F): reversible 5/3 and
# irreversible 9/7, parity-aware (tile rects need not start even), with
# whole-sample symmetric extension.  Forward filters columns then rows;
# inverse undoes rows then columns (the openjpeg-compatible reading of the
# spec's 2D_SD / 2D_SR procedures).
# ---------------------------------------------------------------------------

_K97 = 1.230174104914001
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971


def _mirror(j: int, n: int) -> int:
    """Whole-sample symmetric index reflection into [0, n)."""
    if n == 1:
        return 0
    period = 2 * (n - 1)
    j %= period
    if j < 0:
        j += period
    return j if j < n else period - j


def _extend(a: np.ndarray, margin: int) -> np.ndarray:
    """Symmetric extension along the last axis by ``margin`` samples."""
    n = a.shape[-1]
    idx = [_mirror(j, n) for j in range(-margin, n + margin)]
    return a[..., idx]


def _fwd53_1d(x: np.ndarray, a: int) -> np.ndarray:
    """Forward 5/3 on interleaved rows (last axis); absolute start ``a``.
    Returns the lifted interleaved signal (low at even abs positions)."""
    n = x.shape[-1]
    if n == 0:
        return x.astype(np.int64).copy()
    if n == 1:
        return x.copy() if a % 2 == 0 else x * 2
    e = _extend(x, 2).astype(np.int64)
    # ext col k <-> abs position a-2+k
    k_all = np.arange(1, n + 3)
    k_odd = k_all[((a - 2 + k_all) % 2) == 1]
    e2 = e.copy()
    e2[..., k_odd] = e[..., k_odd] - ((e[..., k_odd - 1] + e[..., k_odd + 1]) >> 1)
    # re-mirror the lifted odd samples so the even update sees consistent
    # neighbours at the boundaries
    idx = [_mirror(j, n) + 2 for j in range(-2, n + 2)]
    core = e2[..., 2 : n + 2]
    e2 = core[..., [i - 2 for i in idx]]
    k_even = k_all[((a - 2 + k_all) % 2) == 0]
    e3 = e2.copy()
    e3[..., k_even] = e2[..., k_even] + (
        (e2[..., k_even - 1] + e2[..., k_even + 1] + 2) >> 2
    )
    return e3[..., 2 : n + 2]


def _inv53_1d(y: np.ndarray, a: int) -> np.ndarray:
    """Inverse 5/3 on interleaved rows (last axis)."""
    n = y.shape[-1]
    if n == 0:
        return y.astype(np.int64).copy()
    if n == 1:
        return y.copy() if a % 2 == 0 else y >> 1
    e = _extend(y, 2).astype(np.int64)
    k_all = np.arange(1, n + 3)
    k_even = k_all[((a - 2 + k_all) % 2) == 0]
    e2 = e.copy()
    e2[..., k_even] = e[..., k_even] - (
        (e[..., k_even - 1] + e[..., k_even + 1] + 2) >> 2
    )
    idx = [_mirror(j, n) + 2 for j in range(-2, n + 2)]
    core = e2[..., 2 : n + 2]
    e2 = core[..., [i - 2 for i in idx]]
    k_odd = k_all[((a - 2 + k_all) % 2) == 1]
    k_odd = k_odd[(k_odd >= 2) & (k_odd <= n + 1)]
    e3 = e2.copy()
    e3[..., k_odd] = e2[..., k_odd] + ((e2[..., k_odd - 1] + e2[..., k_odd + 1]) >> 1)
    return e3[..., 2 : n + 2]


def _fwd97_1d(x: np.ndarray, a: int) -> np.ndarray:
    n = x.shape[-1]
    if n <= 1:
        return x.astype(np.float64).copy()
    cur = x.astype(np.float64)

    def lift(arr, coef, odd_phase):
        e = _extend(arr, 4)
        k_all = np.arange(4, n + 4)
        parity = 1 if odd_phase else 0
        k = k_all[((a - 4 + k_all) % 2) == parity]
        out = e.copy()
        out[..., k] = e[..., k] + coef * (e[..., k - 1] + e[..., k + 1])
        return out[..., 4 : n + 4]

    cur = lift(cur, _A97, True)
    cur = lift(cur, _B97, False)
    cur = lift(cur, _G97, True)
    cur = lift(cur, _D97, False)
    even_mask = (np.arange(n) + a) % 2 == 0
    cur[..., even_mask] *= 1.0 / _K97
    cur[..., ~even_mask] *= _K97 / 2.0
    return cur


def _inv97_1d(y: np.ndarray, a: int) -> np.ndarray:
    n = y.shape[-1]
    if n <= 1:
        return y.astype(np.float64).copy()
    cur = y.astype(np.float64).copy()
    even_mask = (np.arange(n) + a) % 2 == 0
    cur[..., even_mask] *= _K97
    cur[..., ~even_mask] *= 2.0 / _K97

    def lift(arr, coef, odd_phase):
        e = _extend(arr, 4)
        k_all = np.arange(4, n + 4)
        parity = 1 if odd_phase else 0
        k = k_all[((a - 4 + k_all) % 2) == parity]
        out = e.copy()
        out[..., k] = e[..., k] - coef * (e[..., k - 1] + e[..., k + 1])
        return out[..., 4 : n + 4]

    cur = lift(cur, _D97, False)
    cur = lift(cur, _G97, True)
    cur = lift(cur, _B97, False)
    cur = lift(cur, _A97, True)
    return cur


def _rect_level(x0: int, x1: int, y0: int, y1: int, lvl: int) -> tuple[int, int, int, int]:
    d = 1 << lvl
    return (-(-x0 // d), -(-x1 // d), -(-y0 // d), -(-y1 // d))


def _split_rect(x0: int, x1: int, y0: int, y1: int):
    """One-level subband rects: (LL, HL, LH, HH) in band coordinates."""
    lx0, lx1 = -(-x0 // 2), -(-x1 // 2)
    hx0, hx1 = x0 // 2, x1 // 2
    ly0, ly1 = -(-y0 // 2), -(-y1 // 2)
    hy0, hy1 = y0 // 2, y1 // 2
    return (
        (lx0, lx1, ly0, ly1),
        (hx0, hx1, ly0, ly1),
        (lx0, lx1, hy0, hy1),
        (hx0, hx1, hy0, hy1),
    )


def _fwd_dwt_2d(img: np.ndarray, rect: tuple[int, int, int, int], levels: int, reversible: bool):
    """Forward multi-level 2D DWT.  Returns {(lvl, orient): array} with lvl
    1..levels for HL/LH/HH and the final LL at (levels, 0)."""
    x0, x1, y0, y1 = rect
    fwd = _fwd53_1d if reversible else _fwd97_1d
    bands: dict[tuple[int, int], np.ndarray] = {}
    cur = img
    cx0, cx1, cy0, cy1 = x0, x1, y0, y1
    for lvl in range(1, levels + 1):
        # columns first, then rows
        cur = np.ascontiguousarray(fwd(np.ascontiguousarray(cur.T), cy0).T)
        cur = fwd(cur, cx0)
        (llr, hlr, lhr, hhr) = _split_rect(cx0, cx1, cy0, cy1)
        ex, ey = cx0 % 2, cy0 % 2  # parity offsets of even abs coords
        ll = cur[ey::2, ex::2] if reversible else cur[ey::2, ex::2].copy()
        hl = cur[ey::2, 1 - ex :: 2]
        lh = cur[1 - ey :: 2, ex::2]
        hh = cur[1 - ey :: 2, 1 - ex :: 2]
        bands[(lvl, _OR_HL)] = hl
        bands[(lvl, _OR_LH)] = lh
        bands[(lvl, _OR_HH)] = hh
        cur = ll
        cx0, cx1, cy0, cy1 = llr
    bands[(levels, _OR_LL)] = cur
    return bands


def _inv_dwt_2d(
    bands: dict, rect: tuple[int, int, int, int], levels: int, reversible: bool
) -> np.ndarray:
    x0, x1, y0, y1 = rect
    inv = _inv53_1d if reversible else _inv97_1d
    cur = bands[(levels, _OR_LL)]
    for lvl in range(levels, 0, -1):
        budget.check()
        cx0, cx1, cy0, cy1 = _rect_level(x0, x1, y0, y1, lvl - 1)
        w, h = cx1 - cx0, cy1 - cy0
        dtype = np.int64 if reversible else np.float64
        inter = np.zeros((h, w), dtype=dtype)
        ex, ey = cx0 % 2, cy0 % 2
        inter[ey::2, ex::2] = cur
        inter[ey::2, 1 - ex :: 2] = bands[(lvl, _OR_HL)]
        inter[1 - ey :: 2, ex::2] = bands[(lvl, _OR_LH)]
        inter[1 - ey :: 2, 1 - ex :: 2] = bands[(lvl, _OR_HH)]
        # rows first, then columns (inverse of the forward order)
        inter = inv(inter, cx0)
        inter = np.ascontiguousarray(inv(np.ascontiguousarray(inter.T), cy0).T)
        cur = inter
    return cur


# ---------------------------------------------------------------------------
# quantization (T.800 Annex E)
# ---------------------------------------------------------------------------

_GAIN = {_OR_LL: 0, _OR_HL: 1, _OR_LH: 1, _OR_HH: 2}


def _step_to_exp_mant(delta: float, rb: int) -> tuple[int, int]:
    """Invert Δb = 2^(Rb-εb) · (1 + μb/2^11) to (εb, μb)."""
    if delta <= 0:
        raise Jp2Error("non-positive quantization step")
    e2 = math.floor(math.log2(delta) - rb)
    m = delta / (2.0 ** (rb + e2))
    if m >= 2.0:  # numeric edge
        e2 += 1
        m /= 2.0
    eps = -e2
    mant = round((m - 1.0) * 2048.0)
    if mant == 2048:
        mant = 0
        eps -= 1
    if not (0 <= eps <= 31):
        raise Jp2Error(f"quantization exponent {eps} out of range")
    return eps, max(0, min(2047, mant))


def _exp_mant_to_step(eps: int, mant: int, rb: int) -> float:
    return (2.0 ** (rb - eps)) * (1.0 + mant / 2048.0)


# ---------------------------------------------------------------------------
# tile / band / code-block geometry (T.800 B.5-B.7, single precinct)
# ---------------------------------------------------------------------------


class _Block:
    __slots__ = (
        "gx", "gy", "rect", "included", "lblock", "npasses", "data", "nbps",
        "zbp", "layer_parts",
    )

    def __init__(self, gx: int, gy: int, rect: tuple[int, int, int, int]):
        self.gx = gx
        self.gy = gy
        self.rect = rect  # (x0, x1, y0, y1) in band coords
        self.included = False
        self.lblock = 3
        self.npasses = 0
        self.data = bytearray()
        self.nbps = 0
        self.zbp = 0
        self.layer_parts = None  # encoder: [(npasses, bytes)] per layer


class _PrecBand:
    """One precinct's slice of one band: its code-blocks + tag trees."""

    __slots__ = ("gw", "gh", "blocks", "incl_tt", "zbp_tt")

    def __init__(self, gw: int, gh: int, blocks):
        self.gw = gw
        self.gh = gh
        self.blocks = blocks
        self.incl_tt = None
        self.zbp_tt = None


class _Band:
    __slots__ = ("lvl", "orient", "rect", "blocks", "prec")

    def __init__(self, lvl: int, orient: int, rect, cbw: int, cbh: int, prects):
        """``prects``: precinct rects in BAND coordinates (one per precinct
        of the owning resolution; precinct edges are multiples of the
        code-block size, so blocks never straddle precincts)."""
        self.lvl = lvl
        self.orient = orient
        self.rect = rect
        self.blocks: list[_Block] = []
        self.prec: list[_PrecBand] = []
        bx0, bx1, by0, by1 = rect
        for px0, px1, py0, py1 in prects:
            ix0, ix1 = max(bx0, px0), min(bx1, px1)
            iy0, iy1 = max(by0, py0), min(by1, py1)
            if ix1 <= ix0 or iy1 <= iy0:
                self.prec.append(_PrecBand(0, 0, []))
                continue
            g0x, g1x = ix0 // cbw, -(-ix1 // cbw)
            g0y, g1y = iy0 // cbh, -(-iy1 // cbh)
            blocks = []
            for gy in range(g0y, g1y):
                for gx in range(g0x, g1x):
                    r = (
                        max(ix0, gx * cbw), min(ix1, (gx + 1) * cbw),
                        max(iy0, gy * cbh), min(iy1, (gy + 1) * cbh),
                    )
                    blocks.append(_Block(gx - g0x, gy - g0y, r))
            self.prec.append(_PrecBand(g1x - g0x, g1y - g0y, blocks))
            self.blocks.extend(blocks)


def _prec_grid(rx0, rx1, ry0, ry1, ppx: int, ppy: int):
    """Precinct rects over a resolution rect (grid anchored at 0)."""
    if rx1 <= rx0 or ry1 <= ry0:
        return []
    sx, sy = 1 << ppx, 1 << ppy
    npx = -(-rx1 // sx) - rx0 // sx
    npy = -(-ry1 // sy) - ry0 // sy
    if npx * npy > 65536:
        # decompression-bomb guard: a forged tiny-precinct COD would
        # otherwise materialize millions of per-precinct objects
        raise Jp2Error(f"too many precincts ({npx}x{npy})")
    rects = []
    for py in range(ry0 // sy, -(-ry1 // sy)):
        for px in range(rx0 // sx, -(-rx1 // sx)):
            rects.append((px * sx, (px + 1) * sx, py * sy, (py + 1) * sy))
    return rects


def _band_prects(prects, shift: int):
    """Map resolution-coordinate precinct rects to band coordinates
    (halved for detail bands; precinct sizes are powers of two >= 2 there,
    so the halving is exact)."""
    if shift == 0:
        return prects
    return [(x0 >> 1, x1 >> 1, y0 >> 1, y1 >> 1) for x0, x1, y0, y1 in prects]


def _tile_comp_bands(
    rect, nl: int, cbw: int, cbh: int, precs=None
) -> list[list[_Band]]:
    """Bands per resolution r=0..nl for one tile-component.  ``precs`` maps
    resolution -> (ppx, ppy) precinct exponents; default whole-tile."""
    x0, x1, y0, y1 = rect
    res: list[list[_Band]] = []
    for r in range(nl + 1):
        budget.check()
        ppx, ppy = precs[r] if precs is not None else (15, 15)
        shift = 0 if r == 0 else 1
        if r > 0 and (ppx < 1 or ppy < 1):
            raise Jp2Error("precinct exponent must be >= 1 above resolution 0")
        rx0, rx1, ry0, ry1 = _rect_level(x0, x1, y0, y1, nl - r)
        prects = _prec_grid(rx0, rx1, ry0, ry1, ppx, ppy)
        bprects = _band_prects(prects, shift)
        ecbw = min(cbw, 1 << (ppx - shift)) if ppx - shift < 15 else cbw
        ecbh = min(cbh, 1 << (ppy - shift)) if ppy - shift < 15 else cbh
        if r == 0:
            lvl = nl
            llr = _rect_level(x0, x1, y0, y1, nl)
            res.append([_Band(lvl, _OR_LL, llr, ecbw, ecbh, bprects)])
        else:
            lvl = nl - r + 1
            up = _rect_level(x0, x1, y0, y1, lvl - 1)
            _, hlr, lhr, hhr = _split_rect(*up)
            res.append([
                _Band(lvl, _OR_HL, hlr, ecbw, ecbh, bprects),
                _Band(lvl, _OR_LH, lhr, ecbw, ecbh, bprects),
                _Band(lvl, _OR_HH, hhr, ecbw, ecbh, bprects),
            ])
    return res


def _res_nprec(comp_res) -> list[int]:
    """Precinct count per resolution for one tile-component."""
    return [len(bands[0].prec) for bands in comp_res]


def _progression_order(prog: int, layers: int, nprec):
    """Packet order as (layer, res, comp, precinct) tuples.  ``nprec[c][r]``
    is the precinct count of component c at resolution r (0 when the
    resolution rect is empty or beyond that component's levels — no packet
    exists there).  Precinct "position" iterates by flat grid index; all
    components share one grid per resolution (no subsampling here)."""
    ncomp = len(nprec)
    nres = max(len(n) for n in nprec)

    def np_(c, r):
        return nprec[c][r] if r < len(nprec[c]) else 0

    seq = []
    if prog == 0:  # LRCP
        for la in range(layers):
            for r in range(nres):
                for c in range(ncomp):
                    for pi in range(np_(c, r)):
                        seq.append((la, r, c, pi))
    elif prog == 1:  # RLCP
        for r in range(nres):
            for la in range(layers):
                for c in range(ncomp):
                    for pi in range(np_(c, r)):
                        seq.append((la, r, c, pi))
    elif prog == 2:  # RPCL
        for r in range(nres):
            for pi in range(max((np_(c, r) for c in range(ncomp)), default=0)):
                for c in range(ncomp):
                    if pi < np_(c, r):
                        for la in range(layers):
                            seq.append((la, r, c, pi))
    elif prog == 3:  # PCRL
        maxp = max(
            (np_(c, r) for c in range(ncomp) for r in range(nres)), default=0
        )
        for pi in range(maxp):
            for c in range(ncomp):
                for r in range(nres):
                    if pi < np_(c, r):
                        for la in range(layers):
                            seq.append((la, r, c, pi))
    elif prog == 4:  # CPRL
        for c in range(ncomp):
            maxp = max((np_(c, r) for r in range(nres)), default=0)
            for pi in range(maxp):
                for r in range(nres):
                    if pi < np_(c, r):
                        for la in range(layers):
                            seq.append((la, r, c, pi))
    else:
        raise Jp2Error(f"unsupported progression order {prog}")
    return seq


# ---------------------------------------------------------------------------
# tier-2: packet encode / decode (T.800 B.9-B.10)
# ---------------------------------------------------------------------------


def _put_npasses(w: _HdrWriter, n: int) -> None:
    if n == 1:
        w.put(0)
    elif n == 2:
        w.put_bits(0b10, 2)
    elif n <= 5:
        w.put_bits(0b11, 2)
        w.put_bits(n - 3, 2)
    elif n <= 36:
        w.put_bits(0b1111, 4)
        w.put_bits(n - 6, 5)
    elif n <= 164:
        w.put_bits(0b111111111, 9)
        w.put_bits(n - 37, 7)
    else:
        raise Jp2Error(f"too many coding passes: {n}")


def _encode_packet(
    bands: list[_Band], pi: int, layer: int, w: _HdrWriter, bodies: list[bytes]
) -> None:
    """One packet for (comp, res, precinct, layer).  A block's first
    contributing layer signals inclusion via the tag tree (persistent per
    precinct across layers); later layers use the 1-bit form."""
    pbs = [band.prec[pi] for band in bands]

    def part(b):
        if b.layer_parts is None:
            return (b.npasses, bytes(b.data)) if (b.included and layer == 0) else None
        return b.layer_parts[layer] if layer < len(b.layer_parts) else None

    if not any(part(b) for pb in pbs for b in pb.blocks):
        w.put(0)
        return
    w.put(1)
    for pb in pbs:
        if not pb.blocks:
            continue
        if pb.incl_tt is None:
            pb.incl_tt = TagTreeEncoder(pb.gw, pb.gh)
            pb.zbp_tt = TagTreeEncoder(pb.gw, pb.gh)
            for b in pb.blocks:
                first = 0
                if b.layer_parts is not None:
                    first = next(
                        (li for li, pt in enumerate(b.layer_parts) if pt),
                        0xFFFF,  # all parts empty: never included
                    )
                elif not b.included:
                    first = 0xFFFF  # never included: beyond every layer
                pb.incl_tt.set_value(b.gx, b.gy, first)
                pb.zbp_tt.set_value(b.gx, b.gy, b.zbp)
            pb.incl_tt.finalize()
            pb.zbp_tt.finalize()
        for b in pb.blocks:
            pt = part(b)
            first_layer = int(pb.incl_tt.values[0][b.gy, b.gx])
            if first_layer >= layer:  # inclusion still undecided
                pb.incl_tt.encode(b.gx, b.gy, layer + 1, w)
                if first_layer != layer:
                    continue
                t = 1
                while not pb.zbp_tt.known[0][b.gy, b.gx]:
                    pb.zbp_tt.encode(b.gx, b.gy, t, w)
                    t += 1
            else:
                w.put(1 if pt else 0)
                if not pt:
                    continue
            n, data = pt
            _put_npasses(w, n)
            length = len(data)
            nbits = b.lblock + n.bit_length() - 1
            while length >= (1 << nbits):
                w.put(1)
                b.lblock += 1
                nbits += 1
            w.put(0)
            w.put_bits(length, nbits)
            bodies.append(data)


def _decode_packet(
    bands: list[_Band], pi: int, r: _HdrReader, layer: int, sop: bool, eph: bool
) -> None:
    """Decode one packet header + body into per-block state."""
    budget.check()  # per-packet guard
    data = r.data
    if sop and data[r.pos : r.pos + 2] == b"\xff\x91":
        r.pos += 6
    if r.get() == 0:
        r.align()
        if eph:
            if data[r.pos : r.pos + 2] != b"\xff\x92":
                raise Jp2Error("missing EPH marker")
            r.pos += 2
        return
    sched: list[tuple[_Block, int, int]] = []
    for band in bands:
        pb = band.prec[pi]
        if not pb.blocks:
            continue
        if pb.incl_tt is None:
            pb.incl_tt = TagTreeDecoder(pb.gw, pb.gh)
            pb.zbp_tt = TagTreeDecoder(pb.gw, pb.gh)
        for b in pb.blocks:
            if not b.included:
                inc = pb.incl_tt.decode(b.gx, b.gy, layer + 1, r)
            else:
                inc = r.get() == 1
            if not inc:
                continue
            if not b.included:
                t = 1
                while not pb.zbp_tt.decode(b.gx, b.gy, t, r):
                    t += 1
                b.zbp = pb.zbp_tt.value(b.gx, b.gy)
                b.included = True
            if r.get() == 0:
                n = 1
            elif r.get() == 0:
                n = 2
            else:
                n = r.get_bits(2)
                if n < 3:
                    n += 3
                else:
                    n = r.get_bits(5)
                    if n < 31:
                        n += 6
                    else:
                        n = r.get_bits(7) + 37
            while r.get():
                b.lblock += 1
            nbits = b.lblock + n.bit_length() - 1
            length = r.get_bits(nbits)
            sched.append((b, n, length))
    pos = r.align()
    if eph:
        if data[pos : pos + 2] != b"\xff\x92":
            raise Jp2Error("missing EPH marker")
        pos += 2
    for b, n, length in sched:
        if pos + length > len(data):
            raise Jp2Error("packet body truncated")
        b.data += data[pos : pos + length]
        b.npasses += n
        pos += length
    r.pos = pos
    r.nbits = 0
    r.prev_ff = False


# ---------------------------------------------------------------------------
# codestream assembly (encoder)
# ---------------------------------------------------------------------------


def encode_jp2(
    img: np.ndarray,
    *,
    levels: int = 3,
    reversible: bool = True,
    cblk: tuple[int, int] = (64, 64),
    mct: bool | None = None,
    progression: str = "LRCP",
    tile: tuple[int, int] | None = None,
    quality_step: float = 1.0 / 64.0,
    wrap: bool = False,
    sop: bool = False,
    eph: bool = False,
    comp_cblk: dict | None = None,
    chroma_step_mult: float | None = None,
    precinct: tuple[int, int] | None = None,
    layers: int = 1,
    derived_quant: bool = False,
) -> bytes:
    """Encode a uint8 grayscale (h,w) or RGB (h,w,3) image as a JPEG 2000
    Part-1 codestream (raw, or JP2 box container when ``wrap``).

    ``reversible`` selects 5/3+RCT (bit-exact) vs 9/7+ICT with scalar
    quantization of step ``quality_step`` (expounded).  ``tile=(tw,th)``
    splits the image into a tile grid; default is one tile.
    ``comp_cblk={c: (w,h)}`` overrides the code-block size per component
    via COC markers; ``chroma_step_mult`` coarsens the two chroma
    components' steps via QCC markers (9/7 + MCT only — the layout real
    encoders emit for visually-weighted chroma).
    """
    if img.dtype == np.uint8:
        depth = 8
    elif img.dtype == np.uint16:
        depth = 16  # exercises the decoder's depth>8 scale-down path
    else:
        raise Jp2Error("encoder expects uint8 or uint16 input")
    if img.ndim == 2:
        comps = [img.astype(np.int64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        comps = [img[:, :, c].astype(np.int64) for c in range(3)]
    else:
        raise Jp2Error("encoder expects (h,w) or (h,w,3)")
    h, w = comps[0].shape
    if not (0 < w and 0 < h):
        raise Jp2Error("empty image")
    ncomp = len(comps)
    if mct is None:
        mct = ncomp == 3
    mct = bool(mct) and ncomp == 3
    def _check_cblk(bw, bh):
        if bw * bh > 4096 or bw < 4 or bh < 4 or bw & (bw - 1) or bh & (bh - 1):
            raise Jp2Error("code-block dims must be powers of two, 4..64, area<=4096")

    cbw, cbh = cblk
    _check_cblk(cbw, cbh)
    cblks = [(cbw, cbh)] * ncomp
    for c, (bw, bh) in (comp_cblk or {}).items():
        if not (0 <= c < ncomp):
            raise Jp2Error(f"comp_cblk component {c} out of range")
        _check_cblk(bw, bh)
        cblks[c] = (bw, bh)
    if chroma_step_mult is not None and (reversible or ncomp != 3):
        raise Jp2Error("chroma_step_mult needs 9/7 with three components")
    if not (1 <= layers <= 16):
        raise Jp2Error("layers must be in 1..16")
    if derived_quant and (reversible or chroma_step_mult is not None):
        raise Jp2Error("derived_quant needs 9/7 without per-component QCC")
    if precinct is not None:
        ppx, ppy = precinct
        if not (1 <= ppx <= 14 and 1 <= ppy <= 14):
            raise Jp2Error("precinct exponents must be in 1..14")
        if comp_cblk:
            raise Jp2Error("precinct cannot combine with comp_cblk overrides")
        precs = [(ppx, ppy)] * (levels + 1)
    else:
        precs = [(15, 15)] * (levels + 1)
    prog_id = {"LRCP": 0, "RLCP": 1, "RPCL": 2, "PCRL": 3, "CPRL": 4}.get(progression)
    if prog_id is None:
        raise Jp2Error(f"unknown progression {progression!r}")
    guard = 3
    tw, th = tile if tile else (w, h)

    # DC level shift, then MCT
    planes = [c - (1 << (depth - 1)) for c in comps]
    if mct:
        if reversible:
            r_, g_, b_ = planes
            y_ = (r_ + 2 * g_ + b_) >> 2
            u_ = b_ - g_
            v_ = r_ - g_
            planes = [y_, u_, v_]
        else:
            r_, g_, b_ = [p.astype(np.float64) for p in planes]
            y_ = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
            cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
            cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
            planes = [y_, cb, cr]

    ntx, nty = -(-w // tw), -(-h // th)
    out = bytearray()
    out += b"\xff\x4f"  # SOC
    # SIZ
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, tw, th, 0, 0, ncomp
    ) + b"".join(struct.pack(">BBB", depth - 1, 1, 1) for _ in range(ncomp))
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    # COD
    xcb = cbw.bit_length() - 1 - 2
    ycb = cbh.bit_length() - 1 - 2
    scod = (2 if sop else 0) | (4 if eph else 0) | (1 if precinct else 0)
    cod = struct.pack(
        ">BBHBBBBBB", scod, prog_id, layers, 1 if mct else 0,
        levels, xcb, ycb, 0, 1 if reversible else 0,
    )
    if precinct is not None:
        cod += bytes((px | (py << 4)) for px, py in precs)
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    # COC overrides (per-component code-block size)
    for c, (bw, bh) in sorted((comp_cblk or {}).items()):
        coc = struct.pack(
            ">BBBBBBB", c, 0, levels,
            bw.bit_length() - 3, bh.bit_length() - 3, 0,
            1 if reversible else 0,
        )
        out += b"\xff\x53" + struct.pack(">H", len(coc) + 2) + coc

    def _quant_tables(step: float):
        nbands = 3 * levels + 1
        if reversible:
            sq = bytes([(guard << 5) | 0]) + bytes(
                ((depth + g) << 3) for g in _qcd_band_gains(levels)
            )
            mb = [guard + (depth + g) - 1 for g in _qcd_band_gains(levels)]
            return sq, mb, [1.0] * nbands
        exps, mb, delta = [], [], []
        for g in _qcd_band_gains(levels):
            rb = depth + g
            eps_b, mant_b = _step_to_exp_mant(step, rb)
            exps.append((eps_b, mant_b))
            mb.append(guard + eps_b - 1)
            delta.append(_exp_mant_to_step(eps_b, mant_b, rb))
        sq = bytes([(guard << 5) | 2]) + b"".join(
            struct.pack(">H", (e << 11) | m) for e, m in exps
        )
        return sq, mb, delta

    if derived_quant:
        # QCD style 1: one (eps, mant) pair; the decoder derives per-band
        # exponents as eps0 - (r - 1) — mirror that here so Mb/delta match
        eps0, mant0 = _step_to_exp_mant(quality_step, depth)
        sqcd = bytes([(guard << 5) | 1]) + struct.pack(">H", (eps0 << 11) | mant0)
        band_mb, band_delta = [], []
        for qi, g in enumerate(_qcd_band_gains(levels)):
            r = 0 if qi == 0 else (qi - 1) // 3 + 1
            eps = eps0 if qi == 0 else eps0 - (r - 1)
            if not (0 <= eps <= 31):
                raise Jp2Error("derived exponent out of range for this step")
            band_mb.append(guard + eps - 1)
            band_delta.append(_exp_mant_to_step(eps, mant0, depth + g))
    else:
        sqcd, band_mb, band_delta = _quant_tables(quality_step)
    out += b"\xff\x5c" + struct.pack(">H", len(sqcd) + 2) + sqcd
    comp_mb = [band_mb] * ncomp
    comp_delta = [band_delta] * ncomp
    if chroma_step_mult is not None:
        sqcc, mb_c, delta_c = _quant_tables(quality_step * chroma_step_mult)
        for c in (1, 2):
            out += b"\xff\x5d" + struct.pack(">H", len(sqcc) + 3) + bytes([c]) + sqcc
            comp_mb[c] = mb_c
            comp_delta[c] = delta_c

    # tiles
    tidx = 0
    for ty in range(nty):
        for tx in range(ntx):
            rect = (
                tx * tw, min((tx + 1) * tw, w), ty * th, min((ty + 1) * th, h)
            )
            body = _encode_tile(
                planes, rect, levels, reversible, cblks, prog_id,
                comp_mb, comp_delta, sop=sop, eph=eph, precs=precs,
                layers=layers,
            )
            psot = 12 + 2 + len(body)
            out += b"\xff\x90" + struct.pack(">HHIBB", 10, tidx, psot, 0, 1)
            out += b"\xff\x93" + body
            tidx += 1
    out += b"\xff\xd9"  # EOC
    cs = bytes(out)
    return _wrap_jp2_boxes(cs, w, h, ncomp, depth) if wrap else cs


def _qcd_band_gains(levels: int) -> list[int]:
    """Subband gains in QCD order: LL, then (HL, LH, HH) per resolution from
    coarse to fine."""
    gains = [0]
    for _ in range(levels):
        gains += [1, 1, 2]
    return gains


def _band_qcd_index(lvl: int, orient: int, levels: int) -> int:
    """Index of (lvl, orient) in QCD band order (resolution r = levels-lvl+1)."""
    if orient == _OR_LL:
        return 0
    r = levels - lvl + 1
    return 1 + (r - 1) * 3 + {_OR_HL: 0, _OR_LH: 1, _OR_HH: 2}[orient]


def _encode_tile(
    planes, rect, levels, reversible, cblks, prog_id, comp_mb, comp_delta,
    sop=False, eph=False, precs=None, layers=1,
) -> bytes:
    x0, x1, y0, y1 = rect
    ncomp = len(planes)
    comp_bands = []
    for ci, plane in enumerate(planes):
        cbw, cbh = cblks[ci]
        band_mb = comp_mb[ci]
        band_delta = comp_delta[ci]
        sub = plane[y0:y1, x0:x1]
        coeffs = _fwd_dwt_2d(sub, rect, levels, reversible)
        res = _tile_comp_bands(rect, levels, cbw, cbh, precs)
        for bands in res:
            for band in bands:
                arr = coeffs[(band.lvl, band.orient)]
                qi = _band_qcd_index(band.lvl, band.orient, levels)
                mb = band_mb[qi]
                if reversible:
                    mag = np.abs(arr)
                    neg = (arr < 0).astype(np.uint8)
                else:
                    q = np.floor(np.abs(arr) / band_delta[qi]).astype(np.int64)
                    mag = q
                    neg = (arr < 0).astype(np.uint8)
                bx0, bx1, by0, by1 = band.rect
                for blk in band.blocks:
                    kx0, kx1, ky0, ky1 = blk.rect
                    sub_m = mag[ky0 - by0 : ky1 - by0, kx0 - bx0 : kx1 - bx0]
                    sub_n = neg[ky0 - by0 : ky1 - by0, kx0 - bx0 : kx1 - bx0]
                    data, nbps, npasses = t1_encode_block(sub_m, sub_n, band.orient)
                    if nbps > mb:
                        raise Jp2Error(
                            f"coefficient overflow: {nbps} bitplanes > Mb={mb}"
                        )
                    if npasses:
                        blk.included = True
                        blk.data = bytearray(data)
                        blk.npasses = npasses
                        blk.zbp = mb - nbps
                        blk.nbps = nbps
                        if layers > 1:
                            # quality layers: split the single codeword at
                            # proportional byte boundaries (decoder
                            # concatenates before tier-1, so any split
                            # round-trips; real truncation points would
                            # terminate per pass)
                            parts = []
                            base = npasses // layers
                            extra = npasses % layers
                            off_p = 0
                            off_b = 0
                            for li in range(layers):
                                np_l = base + (1 if li < extra else 0)
                                if np_l == 0:
                                    parts.append(None)
                                    continue
                                end_p = off_p + np_l
                                end_b = (
                                    len(data)
                                    if end_p == npasses
                                    else max(off_b, len(data) * end_p // npasses)
                                )
                                parts.append((np_l, bytes(data[off_b:end_b])))
                                off_p, off_b = end_p, end_b
                            blk.layer_parts = parts
        comp_bands.append(res)
    body = bytearray()
    nsop = 0
    nprec = [_res_nprec(cr) for cr in comp_bands]
    for layer, r, c, pi in _progression_order(prog_id, layers, nprec):
        wtr = _HdrWriter()
        bodies: list[bytes] = []
        _encode_packet(comp_bands[c][r], pi, layer, wtr, bodies)
        if sop:
            body += b"\xff\x91" + struct.pack(">HH", 4, nsop & 0xFFFF)
            nsop += 1
        body += wtr.flush()
        if eph:
            body += b"\xff\x92"
        for b in bodies:
            body += b
    return bytes(body)


def _wrap_jp2_boxes(cs: bytes, w: int, h: int, ncomp: int, depth: int) -> bytes:
    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tag + payload

    sig = box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(
        b"ihdr", struct.pack(">IIHBBBB", h, w, ncomp, depth - 1, 7, 0, 0)
    )
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", 17 if ncomp == 1 else 16))
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", cs)


# ---------------------------------------------------------------------------
# codestream parsing (decoder)
# ---------------------------------------------------------------------------


def _unwrap_jp2(data: bytes) -> bytes:
    """Return the raw codestream from a JP2 box container (or pass through)."""
    if data[:2] == b"\xff\x4f":
        return data
    if data[:12] != b"\x00\x00\x00\x0cjP  \x0d\x0a\x87\x0a":
        raise Jp2Error("neither a JPEG 2000 codestream nor a JP2 container")
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        (blen,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        hdr = 8
        if blen == 1:
            if pos + 16 > n:
                raise Jp2Error("truncated box header")
            (blen,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        if blen == 0:
            blen = n - pos
        if blen < hdr or pos + blen > n:
            raise Jp2Error("bad box length")
        if tag == b"jp2c":
            return data[pos + hdr : pos + blen]
        pos += blen
    raise Jp2Error("no jp2c codestream box found")


class _CodMarker:
    __slots__ = (
        "prog", "layers", "mct", "levels", "cbw", "cbh", "cbstyle",
        "reversible", "sop", "eph", "precs",
    )


def _parse_cod(seg: bytes) -> _CodMarker:
    if len(seg) < 10:
        raise Jp2Error("COD too short")
    cod = _CodMarker()
    scod = seg[0]
    cod.sop = bool(scod & 2)
    cod.eph = bool(scod & 4)
    cod.prog = seg[1]
    cod.layers = struct.unpack(">H", seg[2:4])[0]
    if not (1 <= cod.layers <= 1024):
        raise Jp2Error(f"implausible layer count {cod.layers}")
    cod.mct = seg[4] & 1
    cod.levels = seg[5]
    cod.cbw = 1 << (min(seg[6] & 0xF, 8) + 2)
    cod.cbh = 1 << (min(seg[7] & 0xF, 8) + 2)
    cod.cbstyle = seg[8]
    cod.reversible = seg[9] == 1
    if cod.cbstyle != 0:
        raise Jp2Error(f"unsupported code-block style 0x{cod.cbstyle:02x}")
    if cod.levels > 32:
        raise Jp2Error(f"too many decomposition levels: {cod.levels}")
    if scod & 1:
        pb = seg[10 : 10 + cod.levels + 1]
        if len(pb) < cod.levels + 1:
            raise Jp2Error("COD precinct list too short")
        cod.precs = [(b & 0xF, b >> 4) for b in pb]
    else:
        cod.precs = [(15, 15)] * (cod.levels + 1)
    return cod


def _parse_qcd(seg: bytes, levels: int, depth: int) -> tuple[list[int], list[float], bool]:
    """Returns (Mb per QCD band index, Δb per band, reversible_quant)."""
    if not seg:
        raise Jp2Error("QCD too short")
    style = seg[0] & 0x1F
    guard = seg[0] >> 5
    gains = _qcd_band_gains(levels)
    nbands = len(gains)
    mbs: list[int] = []
    deltas: list[float] = []
    if style == 0:  # no quantization (reversible)
        exps = seg[1 : 1 + nbands]
        if len(exps) < nbands:
            raise Jp2Error("QCD style-0 exponent list too short")
        for b in exps:
            mbs.append(guard + (b >> 3) - 1)
            deltas.append(1.0)
        return mbs, deltas, True
    if style == 1:  # derived: one (eps, mant), bands derive per resolution
        if len(seg) < 3:
            raise Jp2Error("QCD style-1 too short")
        e0 = seg[1] >> 3
        m0 = ((seg[1] & 7) << 8) | seg[2]
        for qi, g in enumerate(gains):
            rb = depth + g
            r = 0 if qi == 0 else (qi - 1) // 3 + 1
            eps = e0 - (levels - (levels - r)) if qi else e0
            eps = e0 - (r and (r - 1) + 1) + (1 if qi else 0)
            # T.800 E-5 via the openjpeg reading: εb = ε0 − (r − 1) for the
            # resolution-r detail bands, ε0 for LL
            eps = e0 if qi == 0 else e0 - (r - 1)
            if not (0 <= eps <= 31):
                raise Jp2Error("derived quantization exponent out of range")
            mbs.append(guard + eps - 1)
            deltas.append(_exp_mant_to_step(eps, m0, rb))
        return mbs, deltas, False
    if style == 2:  # expounded
        need = 1 + 2 * nbands
        if len(seg) < need:
            raise Jp2Error("QCD style-2 too short")
        for qi, g in enumerate(gains):
            v = struct.unpack(">H", seg[1 + 2 * qi : 3 + 2 * qi])[0]
            eps, mant = v >> 11, v & 0x7FF
            mbs.append(guard + eps - 1)
            deltas.append(_exp_mant_to_step(eps, mant, depth + g))
        return mbs, deltas, False
    raise Jp2Error(f"unknown quantization style {style}")


_SKIP_MARKERS = {0xFF64, 0xFF63, 0xFF55, 0xFF57, 0xFF58, 0xFF60, 0xFF61, 0xFF65}
_REJECT_MARKERS = {
    0xFF5E: "RGN", 0xFF5F: "POC", 0xFF6C: "PPT", 0xFF6D: "PPM",
}


class _CompCoding:
    """Per-component coding parameters (COD defaults, COC overrides)."""

    __slots__ = ("levels", "cbw", "cbh", "reversible", "precs")

    def __init__(self, cod: _CodMarker):
        self.levels = cod.levels
        self.cbw = cod.cbw
        self.cbh = cod.cbh
        self.reversible = cod.reversible
        self.precs = list(cod.precs)


def _parse_coc(seg: bytes, ncomp: int) -> tuple[int, "_CodMarkerLike"]:
    """COC (T.800 A.6.2): per-component coding-style override."""
    if len(seg) < 7:
        raise Jp2Error("COC too short")
    c = seg[0]  # Csiz < 257 always holds here (ncomp <= 4)
    if c >= ncomp:
        raise Jp2Error(f"COC component {c} out of range")
    scoc = seg[1]
    levels = seg[2]
    cbw = 1 << (min(seg[3] & 0xF, 8) + 2)
    cbh = 1 << (min(seg[4] & 0xF, 8) + 2)
    cbstyle = seg[5]
    reversible = seg[6] == 1
    if cbstyle != 0:
        raise Jp2Error(f"unsupported code-block style 0x{cbstyle:02x}")
    if levels > 32:
        raise Jp2Error(f"too many decomposition levels: {levels}")
    if scoc & 1:
        for b in seg[7 : 7 + levels + 1]:
            if (b & 0xF) < 15 or (b >> 4) < 15:
                raise Jp2Error("sub-tile precincts are not supported")
    ov = type("_CodMarkerLike", (), {})()
    ov.levels, ov.cbw, ov.cbh, ov.reversible = levels, cbw, cbh, reversible
    return c, ov


def decode_jp2(data: bytes) -> np.ndarray:
    """Decode a JPEG 2000 payload to uint8 grayscale (h,w) or RGB (h,w,3)."""
    cs = _unwrap_jp2(data)
    if cs[:2] != b"\xff\x4f":
        raise Jp2Error("missing SOC marker")
    pos = 2
    n = len(cs)
    siz = None
    cod = None
    qcd_seg = None
    coc_segs: list[bytes] = []
    qcc_segs: list[bytes] = []
    tiles: dict[int, bytearray] = {}
    while pos + 2 <= n:
        marker = struct.unpack(">H", cs[pos : pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:  # EOC
            break
        if marker == 0xFF90:  # SOT
            if pos + 10 > n:
                raise Jp2Error("truncated SOT")
            lsot, isot, psot, tpsot, tnsot = struct.unpack(
                ">HHIBB", cs[pos : pos + 10]
            )
            sot_start = pos - 2
            seg_end = pos + lsot
            # tile-part header: COM markers skip; per-tile coding/quant
            # overrides are a named rejection; then SOD starts the data
            while cs[seg_end : seg_end + 2] != b"\xff\x93":
                if seg_end + 4 > n:
                    raise Jp2Error("tile-part header truncated before SOD")
                (tmark,) = struct.unpack(">H", cs[seg_end : seg_end + 2])
                if tmark in (0xFF52, 0xFF5C, 0xFF53, 0xFF5D, 0xFF5E, 0xFF5F):
                    raise Jp2Error(
                        "per-tile coding/quantization overrides are not supported"
                    )
                if tmark != 0xFF64 and tmark not in _SKIP_MARKERS:
                    raise Jp2Error(
                        f"unexpected marker 0x{tmark:04x} in tile-part header"
                    )
                (tlen,) = struct.unpack(">H", cs[seg_end + 2 : seg_end + 4])
                seg_end += 2 + tlen
            data_start = seg_end + 2
            if psot == 0:
                data_end = n - 2  # until EOC
            else:
                data_end = sot_start + psot
            if data_end > n or data_end < data_start:
                raise Jp2Error("bad Psot length")
            tiles.setdefault(isot, bytearray()).extend(cs[data_start:data_end])
            pos = data_end
            continue
        if pos + 2 > n:
            raise Jp2Error("truncated marker segment")
        (lmar,) = struct.unpack(">H", cs[pos : pos + 2])
        seg = cs[pos + 2 : pos + lmar]
        if marker == 0xFF51:
            if len(seg) < 36:
                raise Jp2Error("SIZ too short")
            (
                _rsiz, xs, ys, xo, yo, xt, yt, xto, yto, ncomp
            ) = struct.unpack(">HIIIIIIIIH", seg[:36])
            if xo or yo or xto or yto:
                raise Jp2Error("non-zero image/tile origin is not supported")
            if not (1 <= ncomp <= 4):
                raise Jp2Error(f"unsupported component count {ncomp}")
            comps_meta = []
            for c in range(ncomp):
                b = seg[36 + 3 * c : 39 + 3 * c]
                if len(b) < 3:
                    raise Jp2Error("SIZ component list too short")
                depth = (b[0] & 0x7F) + 1
                signed = bool(b[0] & 0x80)
                if b[1] != 1 or b[2] != 1:
                    raise Jp2Error("component subsampling is not supported")
                if depth > 16:
                    raise Jp2Error(f"unsupported bit depth {depth}")
                comps_meta.append((depth, signed))
            siz = (xs, ys, xt, yt, ncomp, comps_meta)
            if xs * ys > _MAX_SAMPLES:
                raise Jp2Error("image too large")
            if xs == 0 or ys == 0 or xt == 0 or yt == 0:
                raise Jp2Error("zero image or tile size")
        elif marker == 0xFF52:
            cod = _parse_cod(seg)
        elif marker == 0xFF5C:
            qcd_seg = seg
        elif marker == 0xFF53:
            coc_segs.append(seg)
        elif marker == 0xFF5D:
            qcc_segs.append(seg)
        elif marker in _REJECT_MARKERS:
            raise Jp2Error(f"unsupported marker {_REJECT_MARKERS[marker]}")
        elif marker in _SKIP_MARKERS or 0xFF30 <= marker <= 0xFF3F:
            pass
        elif marker == 0xFF92 or marker == 0xFF91:
            raise Jp2Error("unexpected packet marker in main header")
        pos += lmar
    if siz is None or cod is None or qcd_seg is None:
        raise Jp2Error("missing SIZ/COD/QCD")
    xs, ys, xt, yt, ncomp, comps_meta = siz
    depth0 = comps_meta[0][0]
    if any(d != depth0 for d, _ in comps_meta):
        raise Jp2Error("mixed component depths are not supported")
    # per-component coding parameters: COD defaults, COC overrides
    ccs = [_CompCoding(cod) for _ in range(ncomp)]
    for seg in coc_segs:
        c, ov = _parse_coc(seg, ncomp)
        ccs[c].levels, ccs[c].cbw = ov.levels, ov.cbw
        ccs[c].cbh, ccs[c].reversible = ov.cbh, ov.reversible
        # a COC without its own precinct list resets to maximal (T.800 A.6.2)
        ccs[c].precs = [(15, 15)] * (ov.levels + 1)
    # per-component quantization: QCD defaults, QCC overrides
    comp_mb: list[list[int]] = []
    comp_delta: list[list[float]] = []
    qcc_by_comp = {}
    for seg in qcc_segs:
        if not seg:
            raise Jp2Error("QCC too short")
        if seg[0] >= ncomp:
            raise Jp2Error(f"QCC component {seg[0]} out of range")
        qcc_by_comp[seg[0]] = seg[1:]
    for c in range(ncomp):
        qseg = qcc_by_comp.get(c, qcd_seg)
        mb, delta, q_rev = _parse_qcd(qseg, ccs[c].levels, depth0)
        if ccs[c].reversible and not q_rev:
            raise Jp2Error("5/3 transform with explicit quantization unsupported")
        comp_mb.append(mb)
        comp_delta.append(delta)
    if cod.mct and ncomp >= 3:
        if len({ccs[c].reversible for c in range(3)}) != 1:
            raise Jp2Error("MCT requires one transform across components")

    ntx, nty = -(-xs // xt), -(-ys // yt)
    planes = [
        np.zeros((ys, xs), dtype=np.int64 if ccs[c].reversible else np.float64)
        for c in range(ncomp)
    ]
    for tidx, tdata in sorted(tiles.items()):
        tx, ty = tidx % ntx, tidx // ntx
        if ty >= nty:
            raise Jp2Error(f"tile index {tidx} out of range")
        rect = (tx * xt, min((tx + 1) * xt, xs), ty * yt, min((ty + 1) * yt, ys))
        _decode_tile(
            bytes(tdata), rect, cod, ccs, comp_mb, comp_delta, planes
        )

    # inverse MCT + DC shift
    half = 1 << (depth0 - 1)
    maxv = (1 << depth0) - 1
    if cod.mct and ncomp >= 3:
        if ccs[0].reversible:
            y_, u_, v_ = planes[0], planes[1], planes[2]
            g_ = y_ - ((u_ + v_) >> 2)
            r_ = v_ + g_
            b_ = u_ + g_
            planes[0], planes[1], planes[2] = r_, g_, b_
        else:
            y_, cb, cr = planes[0], planes[1], planes[2]
            r_ = y_ + 1.402 * cr
            g_ = y_ - 0.344136 * cb - 0.714136 * cr
            b_ = y_ + 1.772 * cb
            planes[0], planes[1], planes[2] = r_, g_, b_
    out = []
    for c in range(ncomp):
        p = planes[c]
        if not ccs[c].reversible:
            p = np.round(p)
        p = np.clip(p + (0 if comps_meta[c][1] else half), 0, maxv)
        if depth0 > 8:
            p = p.astype(np.int64) >> (depth0 - 8)
        out.append(p.astype(np.uint8))
    if ncomp == 1:
        return out[0]
    if ncomp == 2:
        return out[0]  # gray + alpha: drop alpha
    return np.stack(out[:3], axis=-1)


def _decode_tile(tdata, rect, cod, ccs, comp_mb, comp_delta, planes) -> None:
    ncomp = len(ccs)
    comp_res = [
        _tile_comp_bands(rect, cc.levels, cc.cbw, cc.cbh, cc.precs)
        for cc in ccs
    ]
    nprec = [_res_nprec(cr) for cr in comp_res]
    rdr = _HdrReader(tdata, 0)
    for layer, r, c, pi in _progression_order(cod.prog, cod.layers, nprec):
        _decode_packet(comp_res[c][r], pi, rdr, layer, cod.sop, cod.eph)
    x0, x1, y0, y1 = rect
    for c in range(ncomp):
        cc = ccs[c]
        coeffs: dict[tuple[int, int], np.ndarray] = {}
        for bands in comp_res[c]:
            for band in bands:
                bx0, bx1, by0, by1 = band.rect
                dtype = np.int64 if cc.reversible else np.float64
                arr = np.zeros((by1 - by0, bx1 - bx0), dtype=dtype)
                qi = _band_qcd_index(band.lvl, band.orient, cc.levels)
                mb = comp_mb[c][qi]
                delta = comp_delta[c][qi]
                for blk in band.blocks:
                    if not blk.included or blk.npasses == 0:
                        continue
                    kx0, kx1, ky0, ky1 = blk.rect
                    bw, bh = kx1 - kx0, ky1 - ky0
                    nbps = mb - blk.zbp
                    if nbps < 0:
                        raise Jp2Error("zero-bitplane count exceeds Mb")
                    mag, neg = t1_decode_block(
                        bytes(blk.data), bw, bh, nbps, blk.npasses, band.orient
                    )
                    if cc.reversible:
                        vals = np.where(neg.astype(bool), -mag, mag)
                    else:
                        rec = (mag + 0.5) * delta
                        rec[mag == 0] = 0.0
                        vals = np.where(neg.astype(bool), -rec, rec)
                    arr[ky0 - by0 : ky1 - by0, kx0 - bx0 : kx1 - bx0] = vals
                coeffs[(band.lvl, band.orient)] = arr
        img = _inv_dwt_2d(coeffs, rect, cc.levels, cc.reversible)
        planes[c][y0:y1, x0:x1] = img
