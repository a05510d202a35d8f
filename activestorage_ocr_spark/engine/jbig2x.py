"""JBIG2 (ITU-T T.88) generic-region codec for the PDF ``/JBIG2Decode``
filter — the other dominant encoding of real-world scanned PDFs next to
CCITT G4 (``engine/ccittx.py``).

Strictly BEYOND the reference (its raster path errors on anything but raw
Gray/RGB/CMYK sample streams, `rust/src/engines/ocrs.rs:467-582`); added
because crawl-reality scanned PDFs produced by `jbig2enc`-style tools embed
JBIG2 streams (COVERAGE.md "Remaining labeled gaps").

Implemented from the public spec only:

* T.88 Annex E — the MQ arithmetic coder: the 47-state Qe probability table
  (Table E.1), ENCODER (CODEMPS/CODELPS, BYTEOUT with 0xFF bit-stuffing,
  FLUSH) and DECODER (DECODE, MPS/LPS exchange, BYTEIN) procedures;
* T.88 §6.2 — generic region decoding: per-pixel context templates 0-3
  (nominal and explicit AT pixels), TPGDON typical-prediction rows, and the
  MMR=1 variant which is exactly ITU-T T.6 (delegated to
  :func:`ccittx.decode_g4`);
* T.88 §7 — the embedded-stream segment organization used inside PDFs:
  segment headers, page information (type 48), immediate generic region
  (types 36/38/39), end-of-page/stripe/file (49/50/51), and the
  /JBIG2Globals out-of-band segment stream.

Scope is the *generic region* subset — symbol dictionaries / text regions /
refinement (the pattern-matching compressor layer) raise a narrow
:class:`Jbig2Error` and the image quarantines per E2. That subset is what
``jbig2enc -generic`` and scanner firmware emit for lossless scans.

Both directions are provided so tests can synthesize fixture PDFs without
any external tool (the sandbox ships no JBIG2 codec — same posture as the
CCITT tables, whose transcription is pinned structurally instead of against
a third-party binary). Encoder and decoder are independent walks of the
published flowcharts, so a round-trip failure localizes a transcription
error.

Scale posture: runs inside the per-document Arrow kernel (map-only); the
pixel loop is pure Python but bounded by a 16 MP guard (tighter than the
64 MP raster guard — JBIG2 decode is per-pixel arithmetic, not per-row
numpy), and the per-document wall budget checks each scanline.
"""

from __future__ import annotations

import struct

import numpy as np

from . import budget
from .ccittx import G4Error, decode_g4

__all__ = [
    "Jbig2Error",
    "MQDecoder",
    "MQEncoder",
    "decode_generic_region",
    "encode_generic_region",
    "decode_jbig2_embedded",
    "encode_jbig2_embedded",
]


class Jbig2Error(ValueError):
    """Malformed or unsupported JBIG2 stream."""


# ---------------------------------------------------------------------------
# T.88 Table E.1 — Qe values and probability-state transitions.
# (Qe, NMPS, NLPS, SWITCH); 47 states, state 46 is the non-adaptive state.
# ---------------------------------------------------------------------------

_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """T.88 Annex E.3 MQ decoder. Context state (index, MPS) lives in the
    caller-supplied bytearrays so one decoder serves any context set."""

    __slots__ = ("data", "n", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:  # E.19
        d, n, bp = self.data, self.n, self.bp
        cur = d[bp] if bp < n else 0xFF
        if cur == 0xFF:
            nxt = d[bp + 1] if bp + 1 < n else 0xFF
            if nxt > 0x8F:  # marker / end of data: feed 1 bits
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            nxt = d[self.bp] if self.bp < n else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def decode(self, cx_i: bytearray, cx_mps: bytearray, cx: int) -> int:  # E.16
        qe, nmps, nlps, switch = _QE[cx_i[cx]]
        self.a -= qe
        mps = cx_mps[cx]
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange (E.17) + renorm
            if self.a < qe:
                d = mps
                cx_i[cx] = nmps
            else:
                d = 1 - mps
                if switch:
                    cx_mps[cx] = 1 - mps
                cx_i[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            # MPS exchange (E.18) + renorm
            if self.a < qe:
                d = 1 - mps
                if switch:
                    cx_mps[cx] = 1 - mps
                cx_i[cx] = nlps
            else:
                d = mps
                cx_i[cx] = nmps
        while True:  # RENORMD (E.20)
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                return d


class MQEncoder:
    """T.88 Annex E.2 MQ encoder (CODEMPS/CODELPS, BYTEOUT, FLUSH)."""

    __slots__ = ("out", "bp", "c", "a", "ct")

    def __init__(self):
        # out[0] is the pre-stream spacer byte the flowcharts call B(BPST-1):
        # a carry out of the first code byte lands here (T.88 E.2.8); it is
        # stripped at flush when untouched
        self.out = bytearray([0x00])
        self.bp = 0
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def encode(self, cx_i: bytearray, cx_mps: bytearray, cx: int, d: int) -> None:
        qe, nmps, nlps, switch = _QE[cx_i[cx]]
        if d == cx_mps[cx]:
            # CODEMPS (E.7)
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx_i[cx] = nmps
        else:
            # CODELPS (E.6)
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx_mps[cx] = 1 - cx_mps[cx]
            cx_i[cx] = nlps
        while True:  # RENORME (E.8)
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                return

    def _byteout(self) -> None:  # E.9
        out = self.out
        if out[self.bp] == 0xFF:
            self.bp += 1
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c < 0x8000000:
            self.bp += 1
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
            return
        # propagate carry into B
        out[self.bp] += 1
        if out[self.bp] == 0xFF:
            self.c &= 0x7FFFFFF
            self.bp += 1
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            self.bp += 1
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8

    def flush(self) -> bytes:  # E.11 + SETBITS (E.10)
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c > tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.out[self.bp] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        # strip the untouched spacer; a carried-into spacer stays (it is a
        # real code byte then — never observed with a correct coder, guarded
        # by tests)
        return bytes(self.out[1:] if self.out[0] == 0 else self.out)


# ---------------------------------------------------------------------------
# generic region (T.88 §6.2)
# ---------------------------------------------------------------------------

#: fixed context pixels per GB template, as (dx, dy) — AT pixels appended,
#: then the whole set is ordered (dy, dx); context bits are MSB-first in
#: that order (the spec's figures read left-to-right, top-to-bottom)
_TEMPLATE_FIXED = {
    0: ((-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    1: ((-1, -2), (0, -2), (1, -2), (2, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-3, 0), (-2, 0), (-1, 0)),
    2: ((-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0)),
    3: ((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
}

#: nominal AT pixel positions (T.88 §6.2.5.3 figures)
_TEMPLATE_AT_NOMINAL = {
    0: ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}

#: TPGDON pseudo-pixel context per template (T.88 §6.2.5.7)
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}

_MAX_PIXELS = 16_000_000


def _context_coords(template: int, at: tuple | None) -> list:
    if template not in _TEMPLATE_FIXED:
        raise Jbig2Error(f"bad GB template: {template}")
    at = tuple(at) if at is not None else _TEMPLATE_AT_NOMINAL[template]
    if len(at) != len(_TEMPLATE_AT_NOMINAL[template]):
        raise Jbig2Error(f"template {template} needs "
                         f"{len(_TEMPLATE_AT_NOMINAL[template])} AT pixels")
    coords = list(_TEMPLATE_FIXED[template]) + list(at)
    # spec figure order: top row first, left to right (dy, then dx)
    coords.sort(key=lambda c: (c[1], c[0]))
    return coords


def decode_generic_region(
    data: bytes,
    width: int,
    height: int,
    template: int = 0,
    at: tuple | None = None,
    tpgdon: bool = False,
    mmr: bool = False,
) -> np.ndarray:
    """Decode one generic region to a bool array (True = black/1)."""
    if width <= 0 or height <= 0:
        raise Jbig2Error("bad region dimensions")
    if width * height > _MAX_PIXELS:
        raise Jbig2Error("JBIG2 region too large")
    if mmr:
        try:
            return decode_g4(data, columns=width, rows=height)
        except G4Error as e:
            raise Jbig2Error(f"bad MMR generic region: {e}") from e
    coords = _context_coords(template, at)
    nbits = len(coords)
    cx_i = bytearray(1 << nbits)
    cx_mps = bytearray(1 << nbits)
    dec = MQDecoder(data)
    rows: list[list[int]] = []
    ltp = 0
    w, h = width, height
    tp_cx = _TPGDON_CTX[template]
    for y in range(h):
        budget.check()
        if tpgdon:
            ltp ^= dec.decode(cx_i, cx_mps, tp_cx)
            if ltp:
                rows.append(list(rows[-1]) if rows else [0] * w)
                continue
        row = [0] * w
        rows.append(row)
        for x in range(w):
            cx = 0
            for dx, dy in coords:
                yy = y + dy
                xx = x + dx
                if yy < 0 or xx < 0 or xx >= w:
                    cx <<= 1
                else:
                    cx = (cx << 1) | rows[yy][xx]
            row[x] = dec.decode(cx_i, cx_mps, cx)
    return np.array(rows, dtype=bool)


def encode_generic_region(
    image: np.ndarray,
    template: int = 0,
    tpgdon: bool = False,
) -> bytes:
    """MQ-encode a bool array as a generic region body (nominal AT pixels)."""
    img = np.asarray(image, dtype=bool)
    if img.ndim != 2:
        raise Jbig2Error("encode_generic_region expects a 2-D bool array")
    coords = _context_coords(template, None)
    nbits = len(coords)
    cx_i = bytearray(1 << nbits)
    cx_mps = bytearray(1 << nbits)
    enc = MQEncoder()
    h, w = img.shape
    rows = img.astype(np.uint8).tolist()
    ltp = 0
    tp_cx = _TPGDON_CTX[template]
    for y in range(h):
        if tpgdon:
            typical = 1 if (y > 0 and rows[y] == rows[y - 1]) else 0
            enc.encode(cx_i, cx_mps, tp_cx, typical ^ ltp)
            ltp = typical
            if typical:
                continue
        row = rows[y]
        for x in range(w):
            cx = 0
            for dx, dy in coords:
                yy = y + dy
                xx = x + dx
                if yy < 0 or xx < 0 or xx >= w:
                    cx <<= 1
                else:
                    cx = (cx << 1) | rows[yy][xx]
            enc.encode(cx_i, cx_mps, cx, row[x])
    return enc.flush()


# ---------------------------------------------------------------------------
# embedded-stream segment layer (T.88 §7; PDF Annex)
# ---------------------------------------------------------------------------

_SEG_PAGE_INFO = 48
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
_SEG_GENERIC_INTERMEDIATE = 36
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51

#: segment types of the symbol/text/halftone/refinement compressor layer —
#: recognized so the error names what the stream actually contains
_UNSUPPORTED_SEGMENTS = {
    0: "symbol dictionary", 4: "intermediate text region",
    6: "immediate text region", 7: "immediate lossless text region",
    16: "pattern dictionary", 20: "intermediate halftone region",
    22: "immediate halftone region", 23: "immediate lossless halftone region",
    40: "intermediate refinement region", 42: "immediate refinement region",
    43: "immediate lossless refinement region",
}


def _parse_segment_headers(data: bytes):
    """Yield (seg_type, payload) for each segment in an embedded stream."""
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 11:
            raise Jbig2Error("truncated segment header")
        number, flags = struct.unpack_from(">IB", data, pos)
        pos += 5
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        rts = data[pos]
        count = rts >> 5
        if count == 7:  # long form
            count = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8  # 4-byte count + retain bits
        else:
            pos += 1
        ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
        pos += count * ref_size  # referred-to segment numbers (unused here)
        pos += 4 if page_assoc_4 else 1
        if n - pos < 4:
            raise Jbig2Error("truncated segment data length")
        (length,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise Jbig2Error("unknown-length segment not supported")
        if pos + length > n:
            raise Jbig2Error("segment data overruns stream")
        yield seg_type, data[pos : pos + length]
        pos += length


def _decode_region_segment(payload: bytes):
    """Region segment info + generic region flags -> (bitmap, x, y, comb_op)."""
    if len(payload) < 18:
        raise Jbig2Error("truncated region segment")
    w, h, x, y, comb = struct.unpack_from(">IIIIB", payload, 0)
    flags = payload[17]
    mmr = bool(flags & 1)
    template = (flags >> 1) & 3
    tpgdon = bool(flags & 8)
    pos = 18
    at = None
    if not mmr:
        n_at = len(_TEMPLATE_AT_NOMINAL[template])
        if len(payload) < pos + 2 * n_at:
            raise Jbig2Error("truncated AT pixel list")
        at = tuple(
            (struct.unpack_from("b", payload, pos + 2 * i)[0],
             struct.unpack_from("b", payload, pos + 2 * i + 1)[0])
            for i in range(n_at)
        )
        pos += 2 * n_at
    bitmap = decode_generic_region(
        payload[pos:], w, h, template=template, at=at, tpgdon=tpgdon, mmr=mmr
    )
    return bitmap, x, y, comb & 7


def decode_jbig2_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream (optionally with its
    /JBIG2Globals segment stream) to a bool page bitmap (True = black)."""
    page_w = page_h = None
    page: np.ndarray | None = None
    default_pixel = 0
    saw_region = False
    for blob in (globals_data, data):
        for seg_type, payload in _parse_segment_headers(blob):
            if seg_type == _SEG_PAGE_INFO:
                if len(payload) < 17:
                    raise Jbig2Error("truncated page info segment")
                page_w, page_h = struct.unpack_from(">II", payload, 0)
                default_pixel = (payload[16] >> 2) & 1
                if page_h == 0xFFFFFFFF:
                    page_h = None  # striped page: grow with regions
                continue
            if seg_type in (
                _SEG_GENERIC_IMMEDIATE,
                _SEG_GENERIC_IMMEDIATE_LOSSLESS,
                _SEG_GENERIC_INTERMEDIATE,
            ):
                bitmap, x, y, comb = _decode_region_segment(payload)
                rh, rw = bitmap.shape
                if page_w is None:
                    page_w, page_h = x + rw, y + rh
                if page_h is None or y + rh > (page.shape[0] if page is not None else 0):
                    need_h = max(y + rh, page_h or 0)
                else:
                    need_h = page.shape[0]
                if page is None:
                    page = np.full((need_h, page_w), bool(default_pixel), dtype=bool)
                elif need_h > page.shape[0]:
                    grown = np.full((need_h, page_w), bool(default_pixel), dtype=bool)
                    grown[: page.shape[0]] = page
                    page = grown
                if x + rw > page_w:
                    raise Jbig2Error("region overruns page width")
                target = page[y : y + rh, x : x + rw]
                if comb == 0:  # OR
                    target |= bitmap
                elif comb == 1:  # AND
                    target &= bitmap
                elif comb == 2:  # XOR
                    target ^= bitmap
                elif comb == 3:  # XNOR
                    target[...] = ~(target ^ bitmap)
                elif comb == 4:  # REPLACE
                    target[...] = bitmap
                else:
                    raise Jbig2Error(f"bad combination operator: {comb}")
                saw_region = True
                continue
            if seg_type in (_SEG_END_OF_PAGE, _SEG_END_OF_STRIPE, _SEG_END_OF_FILE):
                continue
            if seg_type in _UNSUPPORTED_SEGMENTS:
                raise Jbig2Error(
                    f"unsupported JBIG2 segment: {_UNSUPPORTED_SEGMENTS[seg_type]} "
                    f"(generic-region subset only)"
                )
            raise Jbig2Error(f"unknown JBIG2 segment type: {seg_type}")
    if not saw_region or page is None:
        raise Jbig2Error("no region segment in JBIG2 stream")
    return page


def _segment_header(number: int, seg_type: int, page: int, length: int) -> bytes:
    head = struct.pack(">IB", number, seg_type & 0x3F)
    head += b"\x00"  # no referred-to segments
    head += bytes([page])
    head += struct.pack(">I", length)
    return head


def encode_jbig2_embedded(
    image: np.ndarray, template: int = 0, tpgdon: bool = False, mmr: bool = False
) -> bytes:
    """Encode a bool array (True = black) as a PDF-embeddable JBIG2 stream:
    page info + one immediate lossless generic region covering the page."""
    img = np.asarray(image, dtype=bool)
    if img.ndim != 2:
        raise Jbig2Error("encode_jbig2_embedded expects a 2-D bool array")
    h, w = img.shape
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    if mmr:
        from .ccittx import encode_g4

        body = encode_g4(img)
        flags = 1
        at_bytes = b""
    else:
        body = encode_generic_region(img, template=template, tpgdon=tpgdon)
        flags = (template << 1) | (8 if tpgdon else 0)
        at_bytes = b"".join(
            struct.pack("bb", dx, dy) for dx, dy in _TEMPLATE_AT_NOMINAL[template]
        )
    region = struct.pack(">IIIIB", w, h, 0, 0, 0) + bytes([flags]) + at_bytes + body
    return (
        _segment_header(0, _SEG_PAGE_INFO, 1, len(page_info)) + page_info
        + _segment_header(1, _SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, len(region)) + region
        + _segment_header(2, _SEG_END_OF_PAGE, 1, 0)
    )
