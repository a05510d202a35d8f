"""JBIG2 (ITU-T T.88) codec for the PDF ``/JBIG2Decode`` filter — the
other dominant encoding of real-world scanned PDFs next to CCITT G4
(``engine/ccittx.py``). Every ARITHMETIC-mode coding path is implemented,
plus (round 5) the HUFFMAN-coded paths: Annex B standard tables
(all 15, structurally pinned — see the Huffman section note; B.10 landed
round 6), custom type-53 code-table segments, SDHUFF symbol
dictionaries with MMR/uncompressed collective bitmaps, SBHUFF text regions
with runcoded symbol ID codes, and MMR pattern/halftone payloads.

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
* T.88 Annex A — arithmetic integer decoding (the IAx value-class ladder
  and the IAID symbol-ID tree) and its encoding mirror;
* T.88 §6.5 / §6.4 — symbol dictionaries (height classes via IADH/IADW,
  OOB class terminators, IAEX export runs) and text regions (strip
  decoding via IADT/IAFS/IADS/IAIT, REFCORNER placement, DS offset) —
  the *symbol mode* that is jbig2enc's default output for scanned text;
* T.88 §6.3 — generic refinement regions (GR templates 0/1, TPGRON
  typical prediction, offset references) with SDREFAGG refinement symbols
  (cross-dictionary input symbols, REFAGGNINST>1 aggregate symbols as
  nested text bitmaps over shared contexts) and SBREFINE per-instance
  text-region refinement;
* T.88 §6.6/§6.7 — pattern dictionaries (collective bitmap) and halftone
  regions (gray-coded bitplane stack from one MQ stream, halftone grid
  vector rendering);
* T.88 §7 — the embedded-stream segment organization used inside PDFs:
  segment headers with referred-to segments, page information (type 48),
  symbol dictionary (0), immediate text region (4/6/7), immediate generic
  region (36/38/39), end-of-page/stripe/file (49/50/51), and the
  /JBIG2Globals out-of-band segment stream.

Scope covers generic regions, symbol mode (arithmetic AND Huffman),
refinement coding (arithmetic, AND the Huffman text-region form with
byte-bounded per-instance GR bitmaps), and halftone regions (arithmetic
AND MMR) — every coding path in T.88, arithmetic and Huffman, decodes,
including all 15 Annex B standard tables (B.10, the one spec table that
is a valid but Kraft-incomplete prefix code, landed round 6 with its own
structural pin). The symbol-mode
ENCODER does what jbig2enc does — connected-component extraction +
shape dedupe into a dictionary — so fixtures exercise real dictionary
reuse (repeated glyphs compress below the generic coder).

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
from .ccittx import G4Error, decode_g4, encode_g4

__all__ = [
    "Jbig2Error",
    "MQDecoder",
    "MQEncoder",
    "decode_generic_region",
    "encode_generic_region",
    "decode_jbig2_embedded",
    "encode_jbig2_embedded",
    "encode_jbig2_text_page",
    "HuffTable",
    "std_table",
    "parse_table_segment",
    "encode_table_segment",
    "encode_jbig2_huffman_page",
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


def _decode_generic_bitmap(
    dec: MQDecoder,
    cx_i: bytearray,
    cx_mps: bytearray,
    width: int,
    height: int,
    coords: list,
    template: int,
    tpgdon: bool,
) -> np.ndarray:
    """Core generic-region pixel loop over a CALLER-OWNED decoder and GB
    context (symbol dictionaries decode many bitmaps through one shared
    decoder/context — T.88 §6.5.5)."""
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
    return np.array(rows, dtype=bool).reshape(h, w)


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
    return _decode_generic_bitmap(
        dec, cx_i, cx_mps, width, height, coords, template, tpgdon
    )


def _encode_generic_bitmap(
    enc: MQEncoder,
    cx_i: bytearray,
    cx_mps: bytearray,
    img: np.ndarray,
    coords: list,
    template: int,
    tpgdon: bool,
) -> None:
    """Core generic-region pixel loop over a caller-owned encoder/context
    (mirror of :func:`_decode_generic_bitmap`)."""
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
    _encode_generic_bitmap(enc, cx_i, cx_mps, img, coords, template, tpgdon)
    return enc.flush()


# ---------------------------------------------------------------------------
# arithmetic integer decoding (T.88 Annex A) — the IAx / IAID procedures the
# symbol-dictionary and text-region segments are built from
# ---------------------------------------------------------------------------


class _IntCtx:
    """Adaptive state of one IAx procedure (512 PREV-tree contexts)."""

    __slots__ = ("i", "mps")

    def __init__(self, size: int = 512):
        self.i = bytearray(size)
        self.mps = bytearray(size)


#: value-class ladder (A.2): prefix-selected (n_bits, offset) rungs
_INT_CLASSES = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436))


def _decode_int(dec: MQDecoder, ctx: _IntCtx):
    """One IAx integer; None = OOB (the S=1, V=0 code point)."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(ctx.i, ctx.mps, prev)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    for rung, (n, offset) in enumerate(_INT_CLASSES):
        if rung == len(_INT_CLASSES) - 1 or not bit():
            v = 0
            for _ in range(n):
                v = (v << 1) | bit()
            v += offset
            break
    if s and v == 0:
        return None  # OOB
    return -v if s else v


def _encode_int(enc: MQEncoder, ctx: _IntCtx, value) -> None:
    """Mirror of :func:`_decode_int`; value None encodes OOB."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(ctx.i, ctx.mps, prev, b)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)

    if value is None:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
    bit(s)
    for rung, (n, offset) in enumerate(_INT_CLASSES):
        if v < offset + (1 << n):
            if rung < len(_INT_CLASSES) - 1:
                bit(0)  # the class-selector ladder ends here
            rel = v - offset
            for k in range(n - 1, -1, -1):
                bit((rel >> k) & 1)
            return
        bit(1)
    raise Jbig2Error(f"integer out of IAx range: {value}")


def _decode_iaid(dec: MQDecoder, ctx: _IntCtx, symcodelen: int) -> int:
    prev = 1
    for _ in range(symcodelen):
        prev = (prev << 1) | dec.decode(ctx.i, ctx.mps, prev)
    return prev - (1 << symcodelen)


def _encode_iaid(enc: MQEncoder, ctx: _IntCtx, symcodelen: int, value: int) -> None:
    prev = 1
    for k in range(symcodelen - 1, -1, -1):
        b = (value >> k) & 1
        enc.encode(ctx.i, ctx.mps, prev, b)
        prev = (prev << 1) | b


def _symcodelen(n_syms: int) -> int:
    return max(1, (n_syms - 1).bit_length())


# ---------------------------------------------------------------------------
# symbol dictionary (T.88 §6.5, segment type 0) and text region (§6.4,
# types 4/6/7) — the jbig2enc default ("symbol mode") for scanned text
# ---------------------------------------------------------------------------


def _decode_symbol_dict(
    payload: bytes,
    input_syms: list[np.ndarray] | None = None,
    custom_tables: list | None = None,
) -> list[np.ndarray]:
    """Symbol dictionary -> exported symbol bitmaps (arithmetic here;
    SDHUFF=1 dispatches to :func:`_decode_symbol_dict_huffman`).

    ``input_syms``: symbols imported from referred-to dictionaries (T.88
    §6.5.8.2.3) — the id space and export runs cover input + new."""
    input_syms = input_syms or []
    if len(payload) < 2:
        raise Jbig2Error("truncated symbol dictionary")
    flags = struct.unpack_from(">H", payload, 0)[0]
    if flags & 1:
        return _decode_symbol_dict_huffman(payload, input_syms, custom_tables or [])
    refagg = bool(flags & 2)
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    pos = 2
    n_at = len(_TEMPLATE_AT_NOMINAL[template])
    if len(payload) < pos + 2 * n_at + 8:
        raise Jbig2Error("truncated symbol dictionary header")
    at = tuple(
        (struct.unpack_from("b", payload, pos + 2 * i)[0],
         struct.unpack_from("b", payload, pos + 2 * i + 1)[0])
        for i in range(n_at)
    )
    pos += 2 * n_at
    rat = None
    if refagg and rtemplate == 0:
        if len(payload) < pos + 4 + 8:
            raise Jbig2Error("truncated SDRAT pixel list")
        rat = (
            (struct.unpack_from("b", payload, pos)[0],
             struct.unpack_from("b", payload, pos + 1)[0]),
            (struct.unpack_from("b", payload, pos + 2)[0],
             struct.unpack_from("b", payload, pos + 3)[0]),
        )
        pos += 4
    numex, numnew = struct.unpack_from(">II", payload, pos)
    pos += 8
    if numnew > 10_000 or numex > 10_000:
        raise Jbig2Error("symbol dictionary too large")
    coords = _context_coords(template, at)
    nbits = len(coords)
    gb_i, gb_mps = bytearray(1 << nbits), bytearray(1 << nbits)
    dec = MQDecoder(payload[pos:])
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    if refagg:
        iaai = _IntCtx()
        tcx = _TextCtxs(len(input_syms) + numnew, True, rtemplate, rat)
    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < numnew:
        budget.check()
        dh = _decode_int(dec, iadh)
        if dh is None:
            raise Jbig2Error("OOB delta-height in symbol dictionary")
        hcheight += dh
        symwidth = 0
        while True:
            dw = _decode_int(dec, iadw)
            if dw is None:
                break  # height class done
            symwidth += dw
            if symwidth <= 0 or hcheight <= 0:
                raise Jbig2Error("non-positive symbol dimensions")
            if symwidth * hcheight > _MAX_PIXELS:
                raise Jbig2Error("JBIG2 symbol too large")
            if len(new_syms) >= numnew:
                raise Jbig2Error("more symbols than declared")
            if refagg:
                ninst = _decode_int(dec, iaai)
                if ninst is None or ninst < 1 or ninst > 10_000:
                    raise Jbig2Error(f"bad REFAGGNINST {ninst}")
                combined_syms = list(input_syms) + new_syms
                if ninst == 1:
                    # single refinement instance (6.5.8.2.2 fast path)
                    rid = _decode_iaid(dec, tcx.iaid, tcx.symcodelen)
                    rdx = _decode_int(dec, tcx.iardx)
                    rdy = _decode_int(dec, tcx.iardy)
                    if rid is None or rdx is None or rdy is None:
                        raise Jbig2Error("OOB refinement parameters")
                    if not (0 <= rid < len(combined_syms)):
                        raise Jbig2Error(
                            f"refinement references unknown symbol {rid}"
                        )
                    new_syms.append(
                        _decode_refinement_bitmap(
                            dec, tcx.gr_i, tcx.gr_mps, symwidth, hcheight,
                            combined_syms[rid], tcx.gr_coding, tcx.gr_refc,
                            rtemplate, False, rdx, rdy,
                        )
                    )
                else:
                    # aggregate symbol: a mini text bitmap of ninst refined
                    # instances over the symbols decoded so far, SHARING
                    # the dictionary's contexts (6.5.8.2.1)
                    if not combined_syms:
                        raise Jbig2Error("aggregate symbol with no symbols")
                    new_syms.append(
                        _decode_text_bitmap(
                            dec, tcx, combined_syms, symwidth, hcheight,
                            ninst, 1, _REFCORNER_TL, 0, 0, 0, True,
                        )
                    )
                continue
            new_syms.append(
                _decode_generic_bitmap(
                    dec, gb_i, gb_mps, symwidth, hcheight, coords, template, False
                )
            )
    # export flags (6.5.10): alternating skip/export run lengths over the
    # (input + new) symbol sequence
    seq = list(input_syms) + new_syms
    exported: list[np.ndarray] = []
    idx = 0
    exflag = 0
    for _ in range(2 * len(seq) + 2):  # run-count bound: never spin
        if idx >= len(seq) or len(exported) >= numex:
            break
        run = _decode_int(dec, iaex)
        if run is None or run < 0:
            raise Jbig2Error("bad export run length")
        if exflag:
            exported.extend(seq[idx : idx + run])
        idx += run
        exflag ^= 1
    if len(exported) != numex:
        raise Jbig2Error(
            f"symbol dictionary exported {len(exported)} of {numex} symbols"
        )
    return exported


def _encode_symbol_dict(
    symbols: list[np.ndarray],
    template: int = 0,
    refine_from: dict[int, int] | None = None,
    rtemplate: int = 0,
    input_syms: list[np.ndarray] | None = None,
) -> bytes:
    """Mirror of :func:`_decode_symbol_dict`: all NEW symbols exported, one
    height class per distinct height (ascending, per spec).

    When ``refine_from`` is given the dictionary is SDREFAGG: EVERY new
    symbol refines ``refine_from[i]`` — an id in the combined
    (input + new-in-decode-order) space; ``input_syms`` must match the
    referred-to dictionaries' exports at decode time."""
    syms = [np.asarray(s, dtype=bool) for s in symbols]
    if not syms or any(s.ndim != 2 or 0 in s.shape for s in syms):
        raise Jbig2Error("symbol dictionary needs non-empty 2-D symbols")
    input_syms = [np.asarray(s, dtype=bool) for s in (input_syms or [])]
    refagg = refine_from is not None
    refine_from = refine_from or {}
    order = sorted(range(len(syms)), key=lambda i: (syms[i].shape[0], i))
    decode_pos = {orig: k for k, orig in enumerate(order)}
    if refagg:
        for k, orig in enumerate(order):
            spec = refine_from.get(orig)
            if spec is None:
                raise Jbig2Error("refagg dictionary needs refine_from for every symbol")
            pids = [spec] if isinstance(spec, int) else [pl[0] for pl in spec]
            if not pids or any(not (0 <= p < len(input_syms) + k) for p in pids):
                raise Jbig2Error(
                    "refine_from id must reference an input symbol or an "
                    "earlier new symbol"
                )
    coords = _context_coords(template, None)
    nbits = len(coords)
    gb_i, gb_mps = bytearray(1 << nbits), bytearray(1 << nbits)
    enc = MQEncoder()
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    if refagg:
        iaai = _IntCtx()
        tcx = _TextCtxs(len(input_syms) + len(syms), True, rtemplate)
    hcheight = 0
    i = 0
    while i < len(order):
        h = syms[order[i]].shape[0]
        _encode_int(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and syms[order[i]].shape[0] == h:
            orig = order[i]
            w = syms[orig].shape[1]
            _encode_int(enc, iadw, w - symwidth)
            symwidth = w
            if refagg:
                spec = refine_from[orig]
                get_ref = lambda pid: (  # noqa: E731
                    input_syms[pid]
                    if pid < len(input_syms)
                    else syms[order[pid - len(input_syms)]]
                )
                if isinstance(spec, int):
                    _encode_int(enc, iaai, 1)  # REFAGGNINST
                    _encode_iaid(enc, tcx.iaid, tcx.symcodelen, spec)
                    _encode_int(enc, tcx.iardx, 0)
                    _encode_int(enc, tcx.iardy, 0)
                    _encode_refinement_bitmap(
                        enc, tcx.gr_i, tcx.gr_mps, syms[orig], get_ref(spec),
                        tcx.gr_coding, tcx.gr_refc, rtemplate, False, 0, 0,
                    )
                else:
                    # aggregate symbol: placements [(pid, x, y[, bitmap])]
                    # decoded as a mini TL/1-strip text bitmap (6.5.8.2.2)
                    _encode_int(enc, iaai, len(spec))
                    _encode_text_bitmap_shared(
                        enc, tcx, get_ref, spec
                    )
                i += 1
                continue
            _encode_generic_bitmap(
                enc, gb_i, gb_mps, syms[orig], coords, template, False
            )
            i += 1
        _encode_int(enc, iadw, None)  # OOB: height class done
    _encode_int(enc, iaex, len(input_syms))  # skip the imported symbols
    _encode_int(enc, iaex, len(syms))        # export all new symbols
    body = enc.flush()
    n_at = len(_TEMPLATE_AT_NOMINAL[template])
    at_bytes = b"".join(
        struct.pack("bb", dx, dy) for dx, dy in _TEMPLATE_AT_NOMINAL[template][:n_at]
    )
    flags = (template << 10) | (2 if refagg else 0) | (rtemplate << 12)
    head = struct.pack(">H", flags) + at_bytes
    if refagg and rtemplate == 0:
        head += b"".join(struct.pack("bb", dx, dy) for dx, dy in _REFINE_AT_NOMINAL)
    head += struct.pack(">II", len(syms), len(syms))
    # NOTE: export order is height-ascending (the decode order), so the
    # caller must address symbols by that order; _sorted_symbol_order gives
    # the mapping
    return head + body


def _sorted_symbol_order(symbols: list) -> list[int]:
    """Dictionary export order (height-ascending, stable) — the symbol IDs a
    text region must use after :func:`_encode_symbol_dict`."""
    return sorted(range(len(symbols)), key=lambda i: (symbols[i].shape[0], i))


_REFCORNER_BL, _REFCORNER_TL, _REFCORNER_BR, _REFCORNER_TR = 0, 1, 2, 3


class _TextCtxs:
    """Integer/ID/refinement contexts for text-bitmap coding — one bundle
    per text region, or SHARED across a dictionary's aggregate symbols."""

    __slots__ = (
        "iadt", "iafs", "iads", "iait", "iaid", "iari",
        "iardw", "iardh", "iardx", "iardy", "gr_i", "gr_mps",
        "gr_coding", "gr_refc", "rtemplate", "symcodelen",
    )

    def __init__(self, n_syms: int, refine: bool, rtemplate: int, rat=None):
        self.iadt, self.iafs, self.iads, self.iait = (
            _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
        )
        self.symcodelen = _symcodelen(n_syms)
        self.iaid = _IntCtx(1 << (self.symcodelen + 1))
        self.rtemplate = rtemplate
        if refine:
            self.iari = _IntCtx()
            self.iardw, self.iardh = _IntCtx(), _IntCtx()
            self.iardx, self.iardy = _IntCtx(), _IntCtx()
            self.gr_coding, self.gr_refc = _refine_coords(rtemplate, rat)
            n = len(self.gr_coding) + len(self.gr_refc)
            self.gr_i, self.gr_mps = bytearray(1 << n), bytearray(1 << n)


def _decode_text_bitmap(
    dec: MQDecoder,
    cx: _TextCtxs,
    symbols: list[np.ndarray],
    w: int,
    h: int,
    n_instances: int,
    strips: int,
    refcorner: int,
    sbcombop: int,
    defpixel: int,
    dsoffset: int,
    refine: bool,
) -> np.ndarray:
    """Instance loop of T.88 §6.4 over a caller-owned decoder + contexts."""
    region = np.full((h, w), bool(defpixel), dtype=bool)
    dt = _decode_int(dec, cx.iadt)
    if dt is None:
        raise Jbig2Error("OOB strip T in text region")
    stript = -dt * strips
    firsts = 0
    n_done = 0
    while n_done < n_instances:
        budget.check()
        dt = _decode_int(dec, cx.iadt)
        if dt is None:
            raise Jbig2Error("OOB strip T in text region")
        stript += dt * strips
        first_in_strip = True
        curs = 0
        while True:
            if first_in_strip:
                dfs = _decode_int(dec, cx.iafs)
                if dfs is None:
                    raise Jbig2Error("OOB first-S in text region")
                firsts += dfs
                curs = firsts
                first_in_strip = False
            else:
                ids = _decode_int(dec, cx.iads)
                if ids is None:
                    break  # strip done
                curs += ids + dsoffset
            curt = 0 if strips == 1 else _decode_int(dec, cx.iait)
            if curt is None:
                raise Jbig2Error("OOB T offset in text region")
            t = stript + curt
            sid = _decode_iaid(dec, cx.iaid, cx.symcodelen)
            if sid >= len(symbols):
                raise Jbig2Error(f"symbol id {sid} out of range")
            sym = symbols[sid]
            if refine and _decode_int(dec, cx.iari):
                # SBREFINE (6.4.11): per-instance refinement of the symbol
                rdw = _decode_int(dec, cx.iardw)
                rdh = _decode_int(dec, cx.iardh)
                rdx = _decode_int(dec, cx.iardx)
                rdy = _decode_int(dec, cx.iardy)
                if None in (rdw, rdh, rdx, rdy):
                    raise Jbig2Error("OOB refinement deltas in text region")
                nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                if nw <= 0 or nh <= 0 or nw * nh > _MAX_PIXELS:
                    raise Jbig2Error("bad refined instance dimensions")
                gdx = (rdw >> 1) + rdx
                gdy = (rdh >> 1) + rdy
                sym = _decode_refinement_bitmap(
                    dec, cx.gr_i, cx.gr_mps, nw, nh, sym,
                    cx.gr_coding, cx.gr_refc, cx.rtemplate, False, gdx, gdy,
                )
            sh, sw = sym.shape
            if refcorner in (_REFCORNER_TR, _REFCORNER_BR):
                curs += sw - 1
            sx = curs - (sw - 1) if refcorner in (_REFCORNER_TR, _REFCORNER_BR) else curs
            sy = t if refcorner in (_REFCORNER_TL, _REFCORNER_TR) else t - sh + 1
            if sx < 0 or sy < 0 or sx + sw > w or sy + sh > h:
                raise Jbig2Error("text region symbol placed out of bounds")
            target = region[sy : sy + sh, sx : sx + sw]
            if sbcombop == 0:
                target |= sym
            elif sbcombop == 1:
                target &= sym
            elif sbcombop == 2:
                target ^= sym
            else:
                target[...] = ~(target ^ sym)
            if refcorner in (_REFCORNER_TL, _REFCORNER_BL):
                curs += sw - 1
            n_done += 1
            if n_done > n_instances:
                raise Jbig2Error("more instances than declared")
    return region


def _decode_text_region(
    payload: bytes,
    symbols: list[np.ndarray],
    custom_tables: list | None = None,
):
    """Text region -> (bitmap, x, y, comb_op) (arithmetic here; SBHUFF=1
    dispatches to :func:`_decode_text_region_huffman`)."""
    if len(payload) < 21:
        raise Jbig2Error("truncated text region")
    w, h, x, y, comb = struct.unpack_from(">IIIIB", payload, 0)
    flags = struct.unpack_from(">H", payload, 17)[0]
    pos = 19
    if flags & 1:
        return _decode_text_region_huffman(payload, symbols, custom_tables or [])
    refine = bool(flags & 2)
    log2strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    if (flags >> 6) & 1:
        raise Jbig2Error("unsupported JBIG2 text region: transposed placement")
    sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit
    rtemplate = (flags >> 15) & 1
    rat = None
    if refine and rtemplate == 0:
        if len(payload) < pos + 4:
            raise Jbig2Error("truncated SBRAT pixel list")
        rat = (
            (struct.unpack_from("b", payload, pos)[0],
             struct.unpack_from("b", payload, pos + 1)[0]),
            (struct.unpack_from("b", payload, pos + 2)[0],
             struct.unpack_from("b", payload, pos + 3)[0]),
        )
        pos += 4
    (n_instances,) = struct.unpack_from(">I", payload, pos)
    pos += 4
    if not symbols:
        raise Jbig2Error("text region with no symbol dictionary")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise Jbig2Error("bad text region dimensions")
    if n_instances > 1_000_000:
        raise Jbig2Error("text region instance count too large")
    strips = 1 << log2strips
    dec = MQDecoder(payload[pos:])
    cx = _TextCtxs(len(symbols), refine, rtemplate, rat)
    region = _decode_text_bitmap(
        dec, cx, symbols, w, h, n_instances, strips, refcorner,
        sbcombop, defpixel, dsoffset, refine,
    )
    return region, x, y, comb & 7


def _encode_text_bitmap_shared(
    enc: MQEncoder, cx: "_TextCtxs", get_ref, placements
) -> None:
    """Encode (decoder_id, x, y[, bitmap]) placements as a text bitmap over
    CALLER-OWNED contexts — the aggregate-symbol form (strips of 1, TL
    corner, OR, zero DS offset, SBREFINE on)."""
    by_t: dict[int, list] = {}
    for pl in placements:
        pid, sx, sy = pl[0], pl[1], pl[2]
        bmp = pl[3] if len(pl) == 4 else None
        by_t.setdefault(sy, []).append((sx, pid, bmp))
    _encode_int(enc, cx.iadt, 0)
    stript = 0
    firsts = 0
    for t in sorted(by_t):
        _encode_int(enc, cx.iadt, t - stript)
        stript = t
        row = sorted(by_t[t], key=lambda e: e[0])
        _encode_int(enc, cx.iafs, row[0][0] - firsts)
        firsts = row[0][0]
        curs = firsts
        for k, (sx, pid, bmp) in enumerate(row):
            if k > 0:
                _encode_int(enc, cx.iads, sx - curs)
                curs = sx
            _encode_iaid(enc, cx.iaid, cx.symcodelen, pid)
            ref = np.asarray(get_ref(pid), dtype=bool)
            if bmp is None:
                _encode_int(enc, cx.iari, 0)
                eff = ref
            else:
                _encode_int(enc, cx.iari, 1)
                new = np.asarray(bmp, dtype=bool)
                rdw = new.shape[1] - ref.shape[1]
                rdh = new.shape[0] - ref.shape[0]
                _encode_int(enc, cx.iardw, rdw)
                _encode_int(enc, cx.iardh, rdh)
                _encode_int(enc, cx.iardx, 0)
                _encode_int(enc, cx.iardy, 0)
                _encode_refinement_bitmap(
                    enc, cx.gr_i, cx.gr_mps, new, ref,
                    cx.gr_coding, cx.gr_refc, cx.rtemplate, False,
                    (rdw >> 1), (rdh >> 1),
                )
                eff = new
            curs += eff.shape[1] - 1
        _encode_int(enc, cx.iads, None)


def _encode_text_region(
    symbols: list[np.ndarray],
    instances: list[tuple],
    width: int,
    height: int,
    export_order: list[int] | None = None,
    log2strips: int = 0,
) -> bytes:
    """Mirror of :func:`_decode_text_region`: instances are (symbol_index,
    x, y) with x/y the TOP-LEFT corner, placed onto a width x height region
    with OR composition — or (symbol_index, x, y, bitmap) to place a
    SBREFINE per-instance refinement of the symbol (the bitmap's dims may
    differ; RDW/RDH signal the delta). Symbol indices refer to the ORIGINAL
    symbol list; the dictionary's height-ascending export order is applied
    here, unless ``export_order`` (original indices in decoder id order —
    the multi-dictionary case) overrides it."""
    if export_order is None:
        export_order = _sorted_symbol_order(
            [np.asarray(s, dtype=bool) for s in symbols]
        )
    id_of = {orig: new for new, orig in enumerate(export_order)}
    symcodelen = _symcodelen(len(export_order))
    refine = any(len(inst) == 4 for inst in instances)
    enc = MQEncoder()
    cx = _TextCtxs(len(export_order), refine, 0)
    # strips of height 2^log2strips (REFCORNER=TOPLEFT): group by strip,
    # each instance carrying its in-strip CURT via IAIT when strips > 1
    strips = 1 << log2strips
    by_t: dict[int, list] = {}
    for inst in instances:
        sid, sx, sy = inst[0], inst[1], inst[2]
        bmp = inst[3] if len(inst) == 4 else None
        by_t.setdefault(sy // strips, []).append((sx, sid, bmp, sy % strips))
    _encode_int(enc, cx.iadt, 0)  # STRIPT starts at 0
    strip_prev = 0
    firsts = 0
    for t in sorted(by_t):
        _encode_int(enc, cx.iadt, t - strip_prev)
        strip_prev = t
        row = sorted(by_t[t], key=lambda e: e[0])
        dfs = row[0][0] - firsts
        _encode_int(enc, cx.iafs, dfs)
        firsts = row[0][0]
        curs = firsts
        for k, (sx, sid, bmp, curt) in enumerate(row):
            if k > 0:
                _encode_int(enc, cx.iads, sx - curs)
                curs = sx
            if strips > 1:
                _encode_int(enc, cx.iait, curt)
            _encode_iaid(enc, cx.iaid, symcodelen, id_of[sid])
            eff = symbols[sid]
            if refine:
                if bmp is None:
                    _encode_int(enc, cx.iari, 0)
                else:
                    _encode_int(enc, cx.iari, 1)
                    ref = np.asarray(symbols[sid], dtype=bool)
                    new = np.asarray(bmp, dtype=bool)
                    rdw = new.shape[1] - ref.shape[1]
                    rdh = new.shape[0] - ref.shape[0]
                    _encode_int(enc, cx.iardw, rdw)
                    _encode_int(enc, cx.iardh, rdh)
                    _encode_int(enc, cx.iardx, 0)
                    _encode_int(enc, cx.iardy, 0)
                    _encode_refinement_bitmap(
                        enc, cx.gr_i, cx.gr_mps, new, ref,
                        cx.gr_coding, cx.gr_refc, 0, False,
                        (rdw >> 1), (rdh >> 1),
                    )
                    eff = new
            curs += eff.shape[1] - 1
        _encode_int(enc, cx.iads, None)  # OOB: strip done
    body = enc.flush()
    flags = (_REFCORNER_TL << 4) | (log2strips << 2) | (2 if refine else 0)
    head = struct.pack(">IIIIB", width, height, 0, 0, 0)
    head += struct.pack(">H", flags)
    if refine:
        head += b"".join(struct.pack("bb", dx, dy) for dx, dy in _REFINE_AT_NOMINAL)
    head += struct.pack(">I", len(instances))
    return head + body


_SEG_SYMBOL_DICT = 0
_SEG_TEXT_INTERMEDIATE = 4
_SEG_TEXT_IMMEDIATE = 6
_SEG_TEXT_IMMEDIATE_LOSSLESS = 7
_SEG_PAGE_INFO = 48
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39
_SEG_GENERIC_INTERMEDIATE = 36
_SEG_END_OF_PAGE = 49
_SEG_END_OF_STRIPE = 50
_SEG_END_OF_FILE = 51
_SEG_TABLE = 53

#: segment types of the halftone/refinement compressor layer — recognized so
#: the error names what the stream actually contains
_SEG_REFINE_INTERMEDIATE = 40
_SEG_REFINE_IMMEDIATE = 42
_SEG_REFINE_IMMEDIATE_LOSSLESS = 43

_UNSUPPORTED_SEGMENTS: dict[int, str] = {}


def _parse_segment_headers(data: bytes):
    """Yield (number, seg_type, referred, payload) per segment."""
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
        # a forged count (especially long-form) must fail NAMED, never
        # walk off the buffer (fuzz finding: IndexError escaped as a crash)
        if count > 1 << 16 or pos + count * ref_size > n:
            raise Jbig2Error("truncated referred-to segment list")
        referred = []
        for _ in range(count):
            if ref_size == 1:
                referred.append(data[pos])
            elif ref_size == 2:
                referred.append(struct.unpack_from(">H", data, pos)[0])
            else:
                referred.append(struct.unpack_from(">I", data, pos)[0])
            pos += ref_size
        pos += 4 if page_assoc_4 else 1
        if n - pos < 4:
            raise Jbig2Error("truncated segment data length")
        (length,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise Jbig2Error("unknown-length segment not supported")
        if pos + length > n:
            raise Jbig2Error("segment data overruns stream")
        yield number, seg_type, referred, data[pos : pos + length]
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


class _PageState:
    """Page bitmap accumulation across segments."""

    def __init__(self):
        self.w = self.h = None  # from page info; h None = striped/unknown
        self.page: np.ndarray | None = None
        self.default_pixel = 0
        self.saw_region = False

    def compose(self, bitmap: np.ndarray, x: int, y: int, comb: int) -> None:
        rh, rw = bitmap.shape
        if self.w is None:
            self.w, self.h = x + rw, y + rh
        cur_h = self.page.shape[0] if self.page is not None else 0
        need_h = max(y + rh, self.h or 0, cur_h)
        if need_h * self.w > 4 * _MAX_PIXELS:
            # forged region offsets must not force a giant page allocation
            raise Jbig2Error("implausible page growth")
        if self.page is None:
            self.page = np.full((need_h, self.w), bool(self.default_pixel), dtype=bool)
        elif need_h > cur_h:
            grown = np.full((need_h, self.w), bool(self.default_pixel), dtype=bool)
            grown[:cur_h] = self.page
            self.page = grown
        if x + rw > self.w:
            raise Jbig2Error("region overruns page width")
        target = self.page[y : y + rh, x : x + rw]
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
        self.saw_region = True


def decode_jbig2_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream (optionally with its
    /JBIG2Globals segment stream) to a bool page bitmap (True = black).
    Supports page info, generic regions, symbol dictionaries, and text
    regions — the jbig2enc output surface."""
    st = _PageState()
    sym_dicts: dict[int, list[np.ndarray]] = {}
    pat_dicts: dict[int, list[np.ndarray]] = {}
    tables: dict[int, "HuffTable"] = {}
    for blob in (globals_data, data):
        for number, seg_type, referred, payload in _parse_segment_headers(blob):
            if seg_type == _SEG_PAGE_INFO:
                if len(payload) < 17:
                    raise Jbig2Error("truncated page info segment")
                st.w, st.h = struct.unpack_from(">II", payload, 0)
                if st.w > 1 << 20 or (
                    st.h not in (0xFFFFFFFF,) and st.w * max(st.h, 1) > 4 * _MAX_PIXELS
                ):
                    raise Jbig2Error("implausible page dimensions")
                st.default_pixel = (payload[16] >> 2) & 1
                if st.h == 0xFFFFFFFF:
                    st.h = None  # striped page: grow with regions
            elif seg_type == _SEG_TABLE:
                tables[number] = parse_table_segment(payload)
            elif seg_type == _SEG_SYMBOL_DICT:
                inputs: list[np.ndarray] = []
                for r in referred:
                    inputs.extend(sym_dicts.get(r, []))
                reftabs = [tables[r] for r in referred if r in tables]
                sym_dicts[number] = _decode_symbol_dict(payload, inputs, reftabs)
            elif seg_type == _SEG_PATTERN_DICT:
                pat_dicts[number] = decode_pattern_dict(payload)
            elif seg_type in (
                _SEG_HALFTONE_IMMEDIATE,
                _SEG_HALFTONE_IMMEDIATE_LOSSLESS,
                _SEG_HALFTONE_INTERMEDIATE,
            ):
                pats: list[np.ndarray] = []
                psources = [r for r in referred if r in pat_dicts]
                if not psources and len(pat_dicts) == 1:
                    psources = list(pat_dicts)  # lenient: the only dictionary
                for r in psources:
                    pats.extend(pat_dicts[r])
                st.compose(*decode_halftone_region(payload, pats))
            elif seg_type in (
                _SEG_TEXT_IMMEDIATE,
                _SEG_TEXT_IMMEDIATE_LOSSLESS,
                _SEG_TEXT_INTERMEDIATE,
            ):
                symbols: list[np.ndarray] = []
                sources = [r for r in referred if r in sym_dicts]
                if not sources and len(sym_dicts) == 1:
                    sources = list(sym_dicts)  # lenient: the only dictionary
                for r in sources:
                    symbols.extend(sym_dicts[r])
                reftabs = [tables[r] for r in referred if r in tables]
                st.compose(*_decode_text_region(payload, symbols, reftabs))
            elif seg_type in (
                _SEG_GENERIC_IMMEDIATE,
                _SEG_GENERIC_IMMEDIATE_LOSSLESS,
                _SEG_GENERIC_INTERMEDIATE,
            ):
                st.compose(*_decode_region_segment(payload))
            elif seg_type in (
                _SEG_REFINE_IMMEDIATE,
                _SEG_REFINE_IMMEDIATE_LOSSLESS,
                _SEG_REFINE_INTERMEDIATE,
            ):
                st.compose(*_decode_refinement_segment(payload, st))
            elif seg_type in (_SEG_END_OF_PAGE, _SEG_END_OF_STRIPE, _SEG_END_OF_FILE):
                continue
            elif seg_type in _UNSUPPORTED_SEGMENTS:
                raise Jbig2Error(
                    f"unsupported JBIG2 segment: {_UNSUPPORTED_SEGMENTS[seg_type]}"
                )
            else:
                raise Jbig2Error(f"unknown JBIG2 segment type: {seg_type}")
    if not st.saw_region or st.page is None:
        raise Jbig2Error("no region segment in JBIG2 stream")
    return st.page


def _segment_header(
    number: int, seg_type: int, page: int, length: int, referred: tuple = ()
) -> bytes:
    head = struct.pack(">IB", number, seg_type & 0x3F)
    head += bytes([len(referred) << 5])  # short form, retain bits 0
    head += bytes(referred)  # 1-byte refs (segment numbers are tiny here)
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


def _connected_components(img: np.ndarray) -> list[tuple[int, int, np.ndarray]]:
    """8-connected ink components -> (x, y, bitmap) with tight bounding
    boxes; the union of all component pixels reproduces the image exactly."""
    h, w = img.shape
    visited = np.zeros((h, w), dtype=bool)
    comps = []
    for y0, x0 in zip(*np.nonzero(img)):
        if visited[y0, x0]:
            continue
        stack = [(int(y0), int(x0))]
        visited[y0, x0] = True
        pix = []
        while stack:
            y, x = stack.pop()
            pix.append((y, x))
            for yy in range(max(y - 1, 0), min(y + 2, h)):
                for xx in range(max(x - 1, 0), min(x + 2, w)):
                    if img[yy, xx] and not visited[yy, xx]:
                        visited[yy, xx] = True
                        stack.append((yy, xx))
        ys = [p[0] for p in pix]
        xs = [p[1] for p in pix]
        y1, x1 = min(ys), min(xs)
        bmp = np.zeros((max(ys) - y1 + 1, max(xs) - x1 + 1), dtype=bool)
        for y, x in pix:
            bmp[y - y1, x - x1] = True
        comps.append((x1, y1, bmp))
    return comps


def encode_jbig2_symbol_mode(image: np.ndarray) -> bytes:
    """Encode a bool array the way jbig2enc's default mode does: extract
    connected ink components, dedupe identical shapes into a symbol
    dictionary, and place instances via a text region. Falls back to a
    generic region for blank pages."""
    img = np.asarray(image, dtype=bool)
    if img.ndim != 2:
        raise Jbig2Error("encode_jbig2_symbol_mode expects a 2-D bool array")
    comps = _connected_components(img)
    if not comps:
        return encode_jbig2_embedded(img)
    symbols: list[np.ndarray] = []
    index: dict[tuple, int] = {}
    instances = []
    for x, y, bmp in comps:
        key = (bmp.shape, bmp.tobytes())
        sid = index.get(key)
        if sid is None:
            sid = len(symbols)
            index[key] = sid
            symbols.append(bmp)
        instances.append((sid, x, y))
    h, w = img.shape
    return encode_jbig2_text_page(symbols, instances, w, h)


def encode_jbig2_symbol_refagg_mode(image: np.ndarray) -> bytes:
    """Encode a bool page the way jbig2enc's refinement-assisted symbol
    mode does: same-shape near-duplicate ink components become SDREFAGG
    symbols refining a base symbol from a FIRST dictionary (cross-
    dictionary input symbols, T.88 §6.5.8.2.3); a text region referring to
    both dictionaries places every instance.  Falls back to plain symbol
    mode when no same-shape pairs exist."""
    img = np.asarray(image, dtype=bool)
    if img.ndim != 2:
        raise Jbig2Error("encode_jbig2_symbol_refagg_mode expects a 2-D bool array")
    comps = _connected_components(img)
    if not comps:
        return encode_jbig2_embedded(img)
    symbols: list[np.ndarray] = []
    index: dict[tuple, int] = {}
    instances = []
    for x, y, bmp in comps:
        key = (bmp.shape, bmp.tobytes())
        sid = index.get(key)
        if sid is None:
            sid = len(symbols)
            index[key] = sid
            symbols.append(bmp)
        instances.append((sid, x, y))
    h, w = img.shape
    by_shape: dict[tuple, list[int]] = {}
    for i, sym in enumerate(symbols):
        by_shape.setdefault(sym.shape, []).append(i)
    base_ids: list[int] = []
    derived: dict[int, int] = {}  # derived orig idx -> base orig idx
    for ids in by_shape.values():
        base_ids.append(ids[0])
        for j in ids[1:]:
            derived[j] = ids[0]
    if not derived:
        return encode_jbig2_text_page(symbols, instances, w, h)
    bases = [symbols[i] for i in base_ids]
    derived_ids = sorted(derived)
    derived_syms = [symbols[j] for j in derived_ids]
    base_export = _sorted_symbol_order(bases)
    input_id = {base_ids[k]: pos for pos, k in enumerate(base_export)}
    refine_from = {
        li: input_id[derived[j]] for li, j in enumerate(derived_ids)
    }
    input_syms = [bases[k] for k in base_export]
    sd1 = _encode_symbol_dict(bases)
    sd2 = _encode_symbol_dict(
        derived_syms, refine_from=refine_from, input_syms=input_syms
    )
    export_order = [base_ids[k] for k in base_export] + [
        derived_ids[k] for k in _sorted_symbol_order(derived_syms)
    ]
    tregion = _encode_text_region(
        symbols, instances, w, h, export_order=export_order
    )
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    return (
        _segment_header(0, _SEG_PAGE_INFO, 1, len(page_info)) + page_info
        + _segment_header(1, _SEG_SYMBOL_DICT, 1, len(sd1)) + sd1
        + _segment_header(2, _SEG_SYMBOL_DICT, 1, len(sd2), referred=(1,)) + sd2
        + _segment_header(3, _SEG_TEXT_IMMEDIATE, 1, len(tregion), referred=(1, 2))
        + tregion
        + _segment_header(4, _SEG_END_OF_PAGE, 1, 0)
    )


def encode_jbig2_text_page(
    symbols: list[np.ndarray],
    instances: list[tuple[int, int, int]],
    width: int,
    height: int,
) -> bytes:
    """Encode a symbol-mode JBIG2 page (the jbig2enc default organization):
    page info + symbol dictionary + one immediate text region referring to
    it. ``instances`` are (symbol_index, x, y) top-left placements."""
    page_info = struct.pack(">IIIIBH", width, height, 0, 0, 0, 0)
    sdict = _encode_symbol_dict(symbols)
    tregion = _encode_text_region(symbols, instances, width, height)
    return (
        _segment_header(0, _SEG_PAGE_INFO, 1, len(page_info)) + page_info
        + _segment_header(1, _SEG_SYMBOL_DICT, 1, len(sdict)) + sdict
        + _segment_header(2, _SEG_TEXT_IMMEDIATE, 1, len(tregion), referred=(1,))
        + tregion
        + _segment_header(3, _SEG_END_OF_PAGE, 1, 0)
    )


# ---------------------------------------------------------------------------
# generic refinement region (T.88 §6.3) — arithmetic mode, GR templates 0/1,
# TPGRON typical prediction.  jbig2enc emits refinement in its lossless
# mode: a rough generic region first, then a refinement pass that corrects
# it against the reference (here: the current page contents, T.88 §6.3.2).
# ---------------------------------------------------------------------------

#: refinement context layout per GRTEMPLATE: (coding coords, reference
#: coords); AT pixels (template 0 only: A1 -> coding, A2 -> reference)
#: append before the (dy, dx) sort.  Context bits MSB-first: coding set
#: then reference set, each in figure reading order.
_REFINE_CODING = {
    0: ((0, -1), (1, -1), (-1, 0)),
    1: ((-1, -1), (0, -1), (1, -1), (-1, 0)),
}
_REFINE_REFERENCE = {
    0: ((0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)),
    1: ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)),
}
_REFINE_AT_NOMINAL = ((-1, -1), (-1, -1))  # (A1 in coding, A2 in reference)
_TPGRON_CTX = {0: 0x0100, 1: 0x0080}


def _refine_coords(template: int, at: tuple | None):
    if template not in _REFINE_CODING:
        raise Jbig2Error(f"bad GR template: {template}")
    coding = list(_REFINE_CODING[template])
    reference = list(_REFINE_REFERENCE[template])
    if template == 0:
        a = tuple(at) if at is not None else _REFINE_AT_NOMINAL
        if len(a) != 2:
            raise Jbig2Error("GR template 0 needs 2 AT pixels")
        coding.append(tuple(a[0]))
        reference.append(tuple(a[1]))
    coding.sort(key=lambda c: (c[1], c[0]))
    reference.sort(key=lambda c: (c[1], c[0]))
    return coding, reference


def _ref_uniform(ref_rows, x: int, y: int, rw: int, rh: int):
    """3x3 reference neighborhood: 0 / 1 when uniform, None otherwise."""
    total = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy, xx = y + dy, x + dx
            if 0 <= yy < rh and 0 <= xx < rw:
                total += ref_rows[yy][xx]
    if total == 0:
        return 0
    if total == 9:  # all nine in-bounds AND set
        all_in = (0 < y < rh - 1) and (0 < x < rw - 1)
        return 1 if all_in else None
    return None


def decode_refinement_region(
    data: bytes,
    width: int,
    height: int,
    reference: np.ndarray,
    *,
    template: int = 0,
    at: tuple | None = None,
    tpgron: bool = False,
    dx: int = 0,
    dy: int = 0,
) -> np.ndarray:
    """Decode one generic refinement region against ``reference``."""
    if width <= 0 or height <= 0:
        raise Jbig2Error("bad region dimensions")
    if width * height > _MAX_PIXELS:
        raise Jbig2Error("JBIG2 region too large")
    coding, refc = _refine_coords(template, at)
    nbits = len(coding) + len(refc)
    cx_i = bytearray(1 << nbits)
    cx_mps = bytearray(1 << nbits)
    dec = MQDecoder(data)
    return _decode_refinement_bitmap(
        dec, cx_i, cx_mps, width, height, reference, coding, refc,
        template, tpgron, dx, dy,
    )


def _decode_refinement_bitmap(
    dec, cx_i, cx_mps, width, height, reference, coding, refc,
    template, tpgron, dx, dy,
) -> np.ndarray:
    """Core refinement pixel loop over a CALLER-OWNED decoder and GR
    context (REFAGG symbol dictionaries refine many symbols through one
    shared decoder/context — T.88 §6.5.8.2)."""
    ref = np.asarray(reference, dtype=bool)
    rh, rw = ref.shape
    ref_rows = ref.astype(np.uint8).tolist()
    rows: list[list[int]] = []
    ltp = 0
    tp_cx = _TPGRON_CTX[template]
    for y in range(height):
        budget.check()
        if tpgron:
            ltp ^= dec.decode(cx_i, cx_mps, tp_cx)
        row = [0] * width
        rows.append(row)
        for x in range(width):
            rx, ry = x - dx, y - dy
            if tpgron and ltp:
                u = _ref_uniform(ref_rows, rx, ry, rw, rh)
                if u is not None:
                    row[x] = u
                    continue
            cx = 0
            for cdx, cdy in coding:
                yy, xx = y + cdy, x + cdx
                if yy < 0 or xx < 0 or xx >= width:
                    cx <<= 1
                else:
                    cx = (cx << 1) | rows[yy][xx]
            for rdx, rdy in refc:
                yy, xx = ry + rdy, rx + rdx
                if 0 <= yy < rh and 0 <= xx < rw:
                    cx = (cx << 1) | ref_rows[yy][xx]
                else:
                    cx <<= 1
            row[x] = dec.decode(cx_i, cx_mps, cx)
    return np.array(rows, dtype=bool).reshape(height, width)


def encode_refinement_region(
    image: np.ndarray,
    reference: np.ndarray,
    *,
    template: int = 0,
    tpgron: bool = False,
    dx: int = 0,
    dy: int = 0,
) -> bytes:
    """MQ-encode ``image`` as a refinement of ``reference`` (nominal AT)."""
    img = np.asarray(image, dtype=bool)
    ref = np.asarray(reference, dtype=bool)
    if img.ndim != 2 or ref.ndim != 2:
        raise Jbig2Error("encode_refinement_region expects 2-D bool arrays")
    height, width = img.shape
    coding, refc = _refine_coords(template, None)
    nbits = len(coding) + len(refc)
    cx_i = bytearray(1 << nbits)
    cx_mps = bytearray(1 << nbits)
    enc = MQEncoder()
    _encode_refinement_bitmap(
        enc, cx_i, cx_mps, img, ref, coding, refc, template, tpgron, dx, dy
    )
    return enc.flush()


def _encode_refinement_bitmap(
    enc, cx_i, cx_mps, img, ref, coding, refc, template, tpgron, dx, dy
) -> None:
    """Mirror of :func:`_decode_refinement_bitmap`."""
    height, width = img.shape
    rows = img.astype(np.uint8).tolist()
    rh, rw = ref.shape
    ref_rows = ref.astype(np.uint8).tolist()
    ltp = 0
    tp_cx = _TPGRON_CTX[template]
    for y in range(height):
        if tpgron:
            # a row may use typical prediction iff every pixel with a
            # uniform reference neighborhood equals the forced value
            typical = 1
            for x in range(width):
                u = _ref_uniform(ref_rows, x - dx, y - dy, rw, rh)
                if u is not None and rows[y][x] != u:
                    typical = 0
                    break
            enc.encode(cx_i, cx_mps, tp_cx, typical ^ ltp)
            ltp = typical
        for x in range(width):
            rx, ry = x - dx, y - dy
            if tpgron and ltp:
                if _ref_uniform(ref_rows, rx, ry, rw, rh) is not None:
                    continue  # forced pixel, not coded
            cx = 0
            for cdx, cdy in coding:
                yy, xx = y + cdy, x + cdx
                if yy < 0 or xx < 0 or xx >= width:
                    cx <<= 1
                else:
                    cx = (cx << 1) | rows[yy][xx]
            for rdx, rdy in refc:
                yy, xx = ry + rdy, rx + rdx
                if 0 <= yy < rh and 0 <= xx < rw:
                    cx = (cx << 1) | ref_rows[yy][xx]
                else:
                    cx <<= 1
            enc.encode(cx_i, cx_mps, cx, rows[y][x])


def _decode_refinement_segment(payload: bytes, st: "_PageState"):
    """Refinement region segment (T.88 §7.4.7): the reference is the current
    page contents at the region location (§6.3.2, no intermediate buffers);
    the refined bitmap REPLACES them."""
    if len(payload) < 18:
        raise Jbig2Error("truncated refinement region segment")
    w, h, x, y, _comb = struct.unpack_from(">IIIIB", payload, 0)
    flags = payload[17]
    template = flags & 1
    tpgron = bool(flags & 2)
    pos = 18
    at = None
    if template == 0:
        if len(payload) < pos + 4:
            raise Jbig2Error("truncated GR AT pixel list")
        at = (
            (struct.unpack_from("b", payload, pos)[0],
             struct.unpack_from("b", payload, pos + 1)[0]),
            (struct.unpack_from("b", payload, pos + 2)[0],
             struct.unpack_from("b", payload, pos + 3)[0]),
        )
        pos += 4
    if st.page is not None and st.page.shape[0] >= y + h and st.w >= x + w:
        reference = st.page[y : y + h, x : x + w].copy()
    else:
        reference = np.zeros((h, w), dtype=bool)
    bitmap = decode_refinement_region(
        payload[pos:], w, h, reference, template=template, at=at, tpgron=tpgron
    )
    return bitmap, x, y, 4  # REPLACE


def encode_jbig2_refinement_mode(
    image: np.ndarray, template: int = 0, tpgron: bool = True
) -> bytes:
    """Encode a bool array as page info + a ROUGH generic region (3x3
    majority vote of the image — the cheap first pass) + a refinement
    region that corrects it to the exact bitmap (the jbig2enc lossless-mode
    shape).  Decoding reproduces ``image`` bit-exactly."""
    img = np.asarray(image, dtype=bool)
    if img.ndim != 2:
        raise Jbig2Error("encode_jbig2_refinement_mode expects a 2-D bool array")
    h, w = img.shape
    # rough pass: 3x3 majority vote (deterministic, loses fine detail)
    pad = np.zeros((h + 2, w + 2), dtype=np.uint8)
    pad[1 : h + 1, 1 : w + 1] = img
    votes = sum(
        pad[1 + dy : h + 1 + dy, 1 + dx : w + 1 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    rough = votes >= 5
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    gbody = encode_generic_region(rough)
    gat = b"".join(struct.pack("bb", dx, dy) for dx, dy in _TEMPLATE_AT_NOMINAL[0])
    gregion = struct.pack(">IIIIB", w, h, 0, 0, 0) + bytes([0]) + gat + gbody
    rbody = encode_refinement_region(img, rough, template=template, tpgron=tpgron)
    rflags = (template & 1) | (2 if tpgron else 0)
    rat = b""
    if template == 0:
        rat = b"".join(struct.pack("bb", dx, dy) for dx, dy in _REFINE_AT_NOMINAL)
    rregion = struct.pack(">IIIIB", w, h, 0, 0, 4) + bytes([rflags]) + rat + rbody
    return (
        _segment_header(0, _SEG_PAGE_INFO, 1, len(page_info)) + page_info
        + _segment_header(1, _SEG_GENERIC_IMMEDIATE, 1, len(gregion)) + gregion
        + _segment_header(2, _SEG_REFINE_IMMEDIATE_LOSSLESS, 1, len(rregion), (1,))
        + rregion
        + _segment_header(3, _SEG_END_OF_PAGE, 1, 0)
    )


# ---------------------------------------------------------------------------
# pattern dictionary (T.88 §6.7) + halftone region (§6.6) — arithmetic mode.
# A pattern dictionary is ONE collective generic region holding GRAYMAX+1
# patterns side by side; a halftone region decodes a gray-coded bitplane
# stack (one MQ stream, shared context) into a grid of pattern indices and
# stamps the patterns along the halftone grid vector.
# ---------------------------------------------------------------------------

_SEG_PATTERN_DICT = 16
_SEG_HALFTONE_INTERMEDIATE = 20
_SEG_HALFTONE_IMMEDIATE = 22
_SEG_HALFTONE_IMMEDIATE_LOSSLESS = 23


def decode_pattern_dict(payload: bytes) -> list[np.ndarray]:
    """Pattern dictionary segment -> list of HDPW x HDPH bool patterns."""
    if len(payload) < 7:
        raise Jbig2Error("truncated pattern dictionary")
    flags, hdpw, hdph = payload[0], payload[1], payload[2]
    graymax = struct.unpack_from(">I", payload, 3)[0]
    mmr = bool(flags & 1)
    template = (flags >> 1) & 3
    if hdpw == 0 or hdph == 0 or graymax > 255:
        raise Jbig2Error("bad pattern dictionary geometry")
    if mmr:
        # HDMMR=1: the collective bitmap is one T.6 stream (§6.7.5)
        try:
            coll = decode_g4(payload[7:], columns=(graymax + 1) * hdpw, rows=hdph)
        except G4Error as e:
            raise Jbig2Error(f"bad MMR pattern dictionary: {e}") from e
        return [
            coll[:, i * hdpw : (i + 1) * hdpw].copy() for i in range(graymax + 1)
        ]
    # collective bitmap: patterns 0..GRAYMAX side by side; A1 = (-HDPW, 0)
    at = [(-hdpw, 0)] + list(_TEMPLATE_AT_NOMINAL[template])[1:]
    if template in (1, 2, 3):
        at = [(-hdpw, 0)]
    coll = decode_generic_region(
        payload[7:], (graymax + 1) * hdpw, hdph, template=template, at=tuple(at)
    )
    return [
        coll[:, i * hdpw : (i + 1) * hdpw].copy() for i in range(graymax + 1)
    ]


def encode_pattern_dict(
    patterns: list[np.ndarray], template: int = 0, mmr: bool = False
) -> bytes:
    """Encode equal-sized bool patterns as a pattern dictionary segment."""
    if not patterns:
        raise Jbig2Error("empty pattern list")
    hdph, hdpw = patterns[0].shape
    if any(p.shape != (hdph, hdpw) for p in patterns):
        raise Jbig2Error("patterns must share one size")
    if hdpw > 255 or hdph > 255 or len(patterns) > 256:
        raise Jbig2Error("pattern dictionary too large")
    coll = np.concatenate([np.asarray(p, dtype=bool) for p in patterns], axis=1)
    if mmr:
        head = bytes([1, hdpw, hdph]) + struct.pack(">I", len(patterns) - 1)
        return head + encode_g4(coll)
    at = [(-hdpw, 0)] + list(_TEMPLATE_AT_NOMINAL[template])[1:]
    if template in (1, 2, 3):
        at = [(-hdpw, 0)]
    coords = _context_coords(template, tuple(at))
    nbits = len(coords)
    cx_i = bytearray(1 << nbits)
    cx_mps = bytearray(1 << nbits)
    enc = MQEncoder()
    _encode_generic_bitmap(enc, cx_i, cx_mps, coll, coords, template, False)
    head = bytes([template << 1, hdpw, hdph]) + struct.pack(
        ">I", len(patterns) - 1
    )
    return head + enc.flush()


def decode_halftone_region(
    payload: bytes, patterns: list[np.ndarray]
) -> tuple[np.ndarray, int, int, int]:
    """Halftone region segment -> (bitmap, x, y, comb_op)."""
    if len(payload) < 38:
        raise Jbig2Error("truncated halftone region segment")
    w, h, x, y, comb = struct.unpack_from(">IIIIB", payload, 0)
    flags = payload[17]
    mmr = bool(flags & 1)
    template = (flags >> 1) & 3
    enableskip = bool(flags & 8)
    hcombop = (flags >> 4) & 7
    defpixel = (flags >> 7) & 1
    if enableskip:
        raise Jbig2Error("unsupported JBIG2 segment: halftone HENABLESKIP")
    hgw, hgh = struct.unpack_from(">II", payload, 18)
    hgx, hgy = struct.unpack_from(">ii", payload, 26)
    hrx, hry = struct.unpack_from(">HH", payload, 34)
    if not patterns:
        raise Jbig2Error("halftone region without a pattern dictionary")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS or hgw * hgh > _MAX_PIXELS:
        raise Jbig2Error("bad halftone region geometry")
    graymax = len(patterns) - 1
    nplanes = max(1, graymax.bit_length())
    if mmr:
        # HMMR=1 (Annex C, GSMMR): all bitplanes come from ONE continuous
        # T.6 stream — the coder state carries over between planes, which
        # is exactly decoding one (nplanes*HGH)-row image and splitting it
        try:
            stack = decode_g4(payload[38:], columns=hgw, rows=nplanes * hgh)
        except G4Error as e:
            raise Jbig2Error(f"bad MMR halftone bitplanes: {e}") from e
        planes = [
            stack[j * hgh : (j + 1) * hgh].astype(np.int64) for j in range(nplanes)
        ]
    else:
        # bitplanes MSB->LSB from ONE MQ stream, shared context (§6.6.5.2)
        coords = _context_coords(template, None)
        nbits = len(coords)
        cx_i = bytearray(1 << nbits)
        cx_mps = bytearray(1 << nbits)
        dec = MQDecoder(payload[38:])
        planes = [
            _decode_generic_bitmap(
                dec, cx_i, cx_mps, hgw, hgh, coords, template, False
            ).astype(np.int64)
            for _ in range(nplanes)
        ]
    gray = np.zeros((hgh, hgw), dtype=np.int64)
    prev = np.zeros((hgh, hgw), dtype=np.int64)
    for j, plane in enumerate(planes):
        bit = plane ^ prev if j > 0 else plane  # gray decoding
        gray = (gray << 1) | bit
        prev = bit
    gray = np.minimum(gray, graymax)
    ph, pw = patterns[0].shape
    page = np.full((h, w), bool(defpixel), dtype=bool)
    pats = [np.asarray(p, dtype=bool) for p in patterns]
    for mg in range(hgh):
        budget.check()
        for ng in range(hgw):
            px = (hgx + mg * hry + ng * hrx) >> 8
            py = (hgy + mg * hrx - ng * hry) >> 8
            if px < 0 or py < 0 or px + pw > w or py + ph > h:
                continue  # pattern falls outside the region: dropped
            target = page[py : py + ph, px : px + pw]
            pat = pats[int(gray[mg, ng])]
            if hcombop == 0:
                target |= pat
            elif hcombop == 1:
                target &= pat
            elif hcombop == 2:
                target ^= pat
            elif hcombop == 4:
                target[...] = pat
            else:
                raise Jbig2Error(f"bad halftone combination operator: {hcombop}")
    return page, x, y, comb & 7


def encode_halftone_region(
    gray: np.ndarray, patterns: list[np.ndarray], template: int = 0,
    mmr: bool = False,
) -> bytes:
    """Encode a grid of pattern indices as a halftone region body covering
    an axis-aligned grid (square patterns; HRX = cell<<8, HRY = 0)."""
    hgh, hgw = gray.shape
    ph, pw = patterns[0].shape
    if ph != pw:
        raise Jbig2Error("axis-aligned halftone encoder needs square patterns")
    graymax = len(patterns) - 1
    if int(gray.max(initial=0)) > graymax:
        raise Jbig2Error("gray index exceeds pattern dictionary")
    w, h = hgw * pw, hgh * ph
    nplanes = max(1, graymax.bit_length())
    g = np.asarray(gray, dtype=np.int64)
    # gray-coded bitplanes, MSB first
    plane_list = []
    prev = np.zeros_like(g)
    for j in range(nplanes - 1, -1, -1):
        bit = (g >> j) & 1
        plane = bit ^ prev if j < nplanes - 1 else bit  # gray coding
        plane_list.append(plane.astype(bool))
        prev = bit
    if mmr:
        body = encode_g4(np.concatenate(plane_list, axis=0))
    else:
        coords = _context_coords(template, None)
        nbits = len(coords)
        cx_i = bytearray(1 << nbits)
        cx_mps = bytearray(1 << nbits)
        enc = MQEncoder()
        for plane in plane_list:
            _encode_generic_bitmap(enc, cx_i, cx_mps, plane, coords, template, False)
        body = enc.flush()
    head = struct.pack(">IIIIB", w, h, 0, 0, 0)
    head += bytes([(1 if mmr else 0) | (template << 1)])  # OR, defpixel 0
    head += struct.pack(">II", hgw, hgh)
    head += struct.pack(">ii", 0, 0)
    head += struct.pack(">HH", pw << 8, 0)
    return head + body


def encode_jbig2_halftone_mode(
    image: np.ndarray, cell: int = 4, template: int = 0, mmr: bool = False
) -> bytes:
    """Encode a GRAYSCALE uint8 image as a JBIG2 halftone page: clustered-dot
    pattern dictionary (cell x cell, cell^2+1 ink levels) + one halftone
    region. Decoding reproduces the dithered bitmap exactly (the halftone
    representation — not the continuous-tone input)."""
    img = np.asarray(image)
    if img.ndim != 2:
        raise Jbig2Error("encode_jbig2_halftone_mode expects a 2-D gray array")
    h, w = img.shape
    # clustered-dot patterns: level k fills the k darkest cells of a fixed
    # deterministic spiral-ish order
    order = sorted(
        ((r, c) for r in range(cell) for c in range(cell)),
        key=lambda rc: ((rc[0] - (cell - 1) / 2) ** 2 + (rc[1] - (cell - 1) / 2) ** 2,
                        rc),
    )
    nlev = cell * cell + 1
    patterns = []
    for k in range(nlev):
        p = np.zeros((cell, cell), dtype=bool)
        for r, c in order[:k]:
            p[r, c] = True
        patterns.append(p)
    # grid of ink levels from downsampled mean darkness
    hgh, hgw = -(-h // cell), -(-w // cell)
    pad = np.full((hgh * cell, hgw * cell), 255, dtype=np.uint8)
    pad[:h, :w] = img
    blocks = pad.reshape(hgh, cell, hgw, cell).swapaxes(1, 2)
    dark = 255.0 - blocks.reshape(hgh, hgw, -1).mean(axis=2)
    gray = np.round(dark / 255.0 * (nlev - 1)).astype(np.int64)
    page_info = struct.pack(">IIIIBH", hgw * cell, hgh * cell, 0, 0, 0, 0)
    pd = encode_pattern_dict(patterns, template=template, mmr=mmr)
    ht = encode_halftone_region(gray, patterns, template=template, mmr=mmr)
    return (
        _segment_header(0, _SEG_PAGE_INFO, 1, len(page_info)) + page_info
        + _segment_header(1, _SEG_PATTERN_DICT, 1, len(pd)) + pd
        + _segment_header(2, _SEG_HALFTONE_IMMEDIATE_LOSSLESS, 1, len(ht), (1,))
        + ht
        + _segment_header(3, _SEG_END_OF_PAGE, 1, 0)
    )


# ---------------------------------------------------------------------------
# Huffman-coded segments (T.88 Annex B tables + §6.5.9 / §6.4.5 Huffman
# decoding paths + §7.4.13 custom code-table segments).  Everything below is
# MSB-first bit-packed — no arithmetic coder involved.
#
# Standard-table provenance: the Annex B tables are transcribed from the
# public spec and pinned STRUCTURALLY (tests): every table's value ranges
# tile contiguously between the lower and upper 32-bit range lines, the
# canonical B.3 code assignment fits the prefix space, and the code is
# Kraft-complete — except B.10, which the spec itself publishes as a valid
# but INCOMPLETE prefix code (three length-2 codes + a canonical tail to
# length 13; Kraft sum exactly 7553/8192, pinned).  An earlier
# transcription attempt that failed contiguity was rejected by these same
# checks; the current B.10 tiles -22-and-lower / -21..8261 / 8262-and-up
# exactly.  Custom-table segments (type 53) are also fully supported.
# ---------------------------------------------------------------------------


class _HBitReader:
    """MSB-first bit reader with byte alignment (Huffman segment payloads)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit index

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise Jbig2Error("truncated Huffman-coded data")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_offset(self) -> int:
        return self.pos >> 3

    def skip_bytes(self, n: int) -> None:
        self.align()
        self.pos += 8 * n


class _HBitWriter:
    """MSB-first bit writer (fixture encoders)."""

    __slots__ = ("_bits",)

    def __init__(self):
        self._bits: list[int] = []

    def bit(self, b: int) -> None:
        self._bits.append(b & 1)

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)

    def align(self) -> None:
        while len(self._bits) % 8:
            self._bits.append(0)

    def extend_bytes(self, data: bytes) -> None:
        self.align()
        for byte in data:
            self.bits(byte, 8)

    def flush(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            byte = 0
            for b in self._bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


#: out-of-band sentinel returned by HuffTable.decode
HUFF_OOB = object()


class HuffTable:
    """One T.88 code table: lines of (PREFLEN, RANGELEN, RANGELOW, kind)
    with kind "n" (normal), "l" (lower range: value = RANGELOW - offset)
    or "u" (upper range), plus an optional OOB prefix.  Codes are assigned
    by the Annex B.3 procedure: canonical by prefix length, table order
    within a length; PREFLEN 0 lines carry no code."""

    __slots__ = ("lines", "oob_preflen", "_decode_map")

    def __init__(self, lines, oob_preflen: int = 0):
        self.lines = [tuple(ln) for ln in lines]
        self.oob_preflen = oob_preflen
        entries = [
            (pl, ("v", rl, low, kind))
            for (pl, rl, low, kind) in self.lines
            if pl > 0
        ]
        if oob_preflen:
            entries.append((oob_preflen, ("oob",)))
        maxlen = max((pl for pl, _ in entries), default=0)
        if maxlen > 32:
            raise Jbig2Error("Huffman prefix length exceeds 32")
        count = [0] * (maxlen + 1)
        for pl, _ in entries:
            count[pl] += 1
        firstcode = [0] * (maxlen + 1)
        for ln in range(1, maxlen + 1):
            firstcode[ln] = (firstcode[ln - 1] + count[ln - 1]) << 1
        nextcode = list(firstcode)
        self._decode_map: dict[tuple[int, int], tuple] = {}
        for pl, payload in entries:
            code = nextcode[pl]
            nextcode[pl] += 1
            if code >> pl:
                raise Jbig2Error("Huffman prefix lengths overfull (Kraft > 1)")
            self._decode_map[(pl, code)] = payload

    def decode(self, r: _HBitReader):
        code = 0
        for ln in range(1, 33):
            code = (code << 1) | r.bit()
            hit = self._decode_map.get((ln, code))
            if hit is None:
                continue
            if hit[0] == "oob":
                return HUFF_OOB
            _, rl, low, kind = hit
            off = r.bits(rl)
            return low - off if kind == "l" else low + off
        raise Jbig2Error("invalid Huffman prefix")

    # fixture-encoder mirror -------------------------------------------------
    def _code_of(self, payload) -> tuple[int, int]:
        for (pl, code), p in self._decode_map.items():
            if p == payload:
                return pl, code
        raise Jbig2Error("value has no code in this Huffman table")

    def encode(self, w: _HBitWriter, value) -> None:
        if value is HUFF_OOB or value is None:
            if not self.oob_preflen:
                raise Jbig2Error("table has no OOB code")
            pl, code = self._code_of(("oob",))
            w.bits(code, pl)
            return
        for (pl, rl, low, kind) in self.lines:
            if pl <= 0:
                continue
            if kind == "n" and low <= value < low + (1 << rl):
                cl, code = self._code_of(("v", rl, low, kind))
                w.bits(code, cl)
                w.bits(value - low, rl)
                return
            if kind == "u" and value >= low:
                cl, code = self._code_of(("v", rl, low, kind))
                w.bits(code, cl)
                w.bits(value - low, rl)
                return
            if kind == "l" and value <= low:
                cl, code = self._code_of(("v", rl, low, kind))
                w.bits(code, cl)
                w.bits(low - value, rl)
                return
        raise Jbig2Error(f"value {value} not representable in Huffman table")


#: Annex B standard tables as (PREFLEN, RANGELEN, RANGELOW, kind) + OOB
#: preflen.  Every table is pinned structurally (tests): the value ranges
#: tile contiguously between the lower/upper 32-bit lines, the canonical
#: B.3 code assignment fits, and the prefix code is Kraft-COMPLETE — with
#: one spec-faithful exception: B.10 as published is a valid but
#: INCOMPLETE prefix code (Kraft sum 7553/8192 — its three length-2 codes
#: plus the long canonical tail leave the 13-bit suffix space 7553..8191
#: unused), so its pin asserts that exact fraction instead of 1.
_STD_TABLE_LINES: dict[int, tuple[list, int]] = {
    1: ([(1, 4, 0, "n"), (2, 8, 16, "n"), (3, 16, 272, "n"),
         (3, 32, 65808, "u")], 0),
    2: ([(1, 0, 0, "n"), (2, 0, 1, "n"), (3, 0, 2, "n"), (4, 3, 3, "n"),
         (5, 6, 11, "n"), (6, 32, 75, "u")], 6),
    3: ([(8, 8, -256, "n"), (1, 0, 0, "n"), (2, 0, 1, "n"), (3, 0, 2, "n"),
         (4, 3, 3, "n"), (5, 6, 11, "n"), (8, 32, -257, "l"),
         (7, 32, 75, "u")], 6),
    4: ([(1, 0, 1, "n"), (2, 0, 2, "n"), (3, 0, 3, "n"), (4, 3, 4, "n"),
         (5, 6, 12, "n"), (5, 32, 76, "u")], 0),
    5: ([(7, 8, -255, "n"), (1, 0, 1, "n"), (2, 0, 2, "n"), (3, 0, 3, "n"),
         (4, 3, 4, "n"), (5, 6, 12, "n"), (7, 32, -256, "l"),
         (6, 32, 76, "u")], 0),
    6: ([(5, 10, -2048, "n"), (4, 9, -1024, "n"), (4, 8, -512, "n"),
         (4, 7, -256, "n"), (5, 6, -128, "n"), (5, 5, -64, "n"),
         (4, 5, -32, "n"), (2, 7, 0, "n"), (3, 7, 128, "n"),
         (3, 8, 256, "n"), (4, 9, 512, "n"), (4, 10, 1024, "n"),
         (6, 32, -2049, "l"), (6, 32, 2048, "u")], 0),
    7: ([(4, 9, -1024, "n"), (3, 8, -512, "n"), (4, 7, -256, "n"),
         (5, 6, -128, "n"), (5, 5, -64, "n"), (4, 5, -32, "n"),
         (4, 5, 0, "n"), (5, 5, 32, "n"), (5, 6, 64, "n"), (4, 7, 128, "n"),
         (3, 8, 256, "n"), (3, 9, 512, "n"), (3, 10, 1024, "n"),
         (5, 32, -1025, "l"), (5, 32, 2048, "u")], 0),
    8: ([(8, 3, -15, "n"), (9, 1, -7, "n"), (8, 1, -5, "n"), (9, 0, -3, "n"),
         (7, 0, -2, "n"), (4, 0, -1, "n"), (2, 1, 0, "n"), (5, 0, 2, "n"),
         (6, 0, 3, "n"), (3, 4, 4, "n"), (6, 1, 20, "n"), (4, 4, 22, "n"),
         (4, 5, 38, "n"), (5, 6, 70, "n"), (5, 7, 134, "n"),
         (6, 7, 262, "n"), (7, 8, 390, "n"), (6, 10, 646, "n"),
         (9, 32, -16, "l"), (9, 32, 1670, "u")], 2),
    9: ([(8, 4, -31, "n"), (9, 2, -15, "n"), (8, 2, -11, "n"),
         (9, 1, -7, "n"), (7, 1, -5, "n"), (4, 1, -3, "n"), (3, 1, -1, "n"),
         (3, 1, 1, "n"), (5, 1, 3, "n"), (6, 1, 5, "n"), (3, 5, 7, "n"),
         (6, 2, 39, "n"), (4, 5, 43, "n"), (4, 6, 75, "n"),
         (5, 7, 139, "n"), (5, 8, 267, "n"), (6, 8, 523, "n"),
         (7, 9, 779, "n"), (6, 11, 1291, "n"), (9, 32, -32, "l"),
         (9, 32, 3339, "u")], 2),
    10: ([(7, 4, -21, "n"), (8, 0, -5, "n"), (7, 0, -4, "n"),
          (5, 0, -3, "n"), (2, 2, -2, "n"), (5, 0, 2, "n"), (6, 0, 3, "n"),
          (7, 0, 4, "n"), (8, 0, 5, "n"), (2, 6, 6, "n"), (5, 5, 70, "n"),
          (6, 5, 102, "n"), (7, 6, 134, "n"), (8, 7, 198, "n"),
          (9, 8, 326, "n"), (10, 9, 582, "n"), (11, 10, 1094, "n"),
          (12, 11, 2118, "n"), (13, 12, 4166, "n"), (13, 32, -22, "l"),
          (13, 32, 8262, "u")], 2),
    11: ([(1, 0, 1, "n"), (2, 1, 2, "n"), (4, 0, 4, "n"), (4, 1, 5, "n"),
          (5, 1, 7, "n"), (5, 2, 9, "n"), (6, 2, 13, "n"), (7, 2, 17, "n"),
          (7, 3, 21, "n"), (7, 4, 29, "n"), (7, 5, 45, "n"), (7, 6, 77, "n"),
          (7, 32, 141, "u")], 0),
    12: ([(1, 0, 1, "n"), (2, 0, 2, "n"), (3, 1, 3, "n"), (5, 0, 5, "n"),
          (5, 1, 6, "n"), (6, 1, 8, "n"), (7, 0, 10, "n"), (7, 1, 11, "n"),
          (7, 2, 13, "n"), (7, 3, 17, "n"), (7, 4, 25, "n"), (8, 5, 41, "n"),
          (8, 32, 73, "u")], 0),
    13: ([(1, 0, 1, "n"), (3, 0, 2, "n"), (4, 0, 3, "n"), (5, 0, 4, "n"),
          (4, 1, 5, "n"), (3, 3, 7, "n"), (6, 1, 15, "n"), (6, 2, 17, "n"),
          (6, 3, 21, "n"), (6, 4, 29, "n"), (6, 5, 45, "n"), (7, 6, 77, "n"),
          (7, 32, 141, "u")], 0),
    14: ([(3, 0, -2, "n"), (3, 0, -1, "n"), (1, 0, 0, "n"), (3, 0, 1, "n"),
          (3, 0, 2, "n")], 0),
    15: ([(7, 4, -24, "n"), (6, 2, -8, "n"), (5, 1, -4, "n"), (4, 0, -2, "n"),
          (3, 0, -1, "n"), (1, 0, 0, "n"), (3, 0, 1, "n"), (4, 0, 2, "n"),
          (5, 1, 3, "n"), (6, 2, 5, "n"), (7, 4, 9, "n"), (7, 32, -25, "l"),
          (7, 32, 25, "u")], 0),
}

_STD_TABLE_CACHE: dict[int, HuffTable] = {}


def std_table(n: int) -> HuffTable:
    t = _STD_TABLE_CACHE.get(n)
    if t is None:
        spec = _STD_TABLE_LINES.get(n)
        if spec is None:
            raise Jbig2Error(f"unsupported JBIG2 standard Huffman table B.{n}")
        t = HuffTable(spec[0], spec[1])
        _STD_TABLE_CACHE[n] = t
    return t


def parse_table_segment(payload: bytes) -> HuffTable:
    """Custom code-table segment (type 53, §7.4.13 / B.2.1): self-describing
    prefix/range lengths — no transcription risk."""
    if len(payload) < 9:
        raise Jbig2Error("truncated Huffman table segment")
    flags = payload[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    htlow, hthigh = struct.unpack_from(">ii", payload, 1)
    if hthigh <= htlow:
        raise Jbig2Error("bad Huffman table range")
    r = _HBitReader(payload[9:])
    lines = []
    cur = htlow
    while cur < hthigh:
        if len(lines) > 4096:
            raise Jbig2Error("Huffman table has too many lines")
        pl = r.bits(htps)
        rl = r.bits(htrs)
        if rl > 32:
            raise Jbig2Error("Huffman range length exceeds 32")
        lines.append((pl, rl, cur, "n"))
        cur += 1 << rl
    lines.append((r.bits(htps), 32, htlow - 1, "l"))
    lines.append((r.bits(htps), 32, hthigh, "u"))
    oob = r.bits(htps) if htoob else 0
    return HuffTable(lines, oob)


def encode_table_segment(
    normal_lines: list[tuple[int, int, int]],
    low_preflen: int,
    high_preflen: int,
    oob_preflen: int | None = None,
) -> bytes:
    """Fixture mirror of :func:`parse_table_segment`. ``normal_lines`` are
    contiguous (preflen, rangelen, rangelow) triples."""
    lows = [ln[2] for ln in normal_lines]
    htlow = lows[0]
    hthigh = normal_lines[-1][2] + (1 << normal_lines[-1][1])
    for (pl, rl, low), nxt in zip(normal_lines, normal_lines[1:]):
        if nxt[2] != low + (1 << rl):
            raise Jbig2Error("custom table lines must tile contiguously")
    htps = max(
        [ln[0] for ln in normal_lines] + [low_preflen, high_preflen, oob_preflen or 0]
    ).bit_length()
    htps = max(htps, 1)
    htrs = max(max(ln[1] for ln in normal_lines), 1).bit_length()
    htrs = max(htrs, 1)
    if htps > 8 or htrs > 8:
        raise Jbig2Error("custom table field widths exceed 8 bits")
    flags = (1 if oob_preflen else 0) | ((htps - 1) << 1) | ((htrs - 1) << 4)
    w = _HBitWriter()
    for pl, rl, _low in normal_lines:
        w.bits(pl, htps)
        w.bits(rl, htrs)
    w.bits(low_preflen, htps)
    w.bits(high_preflen, htps)
    if oob_preflen:
        w.bits(oob_preflen, htps)
    return bytes([flags]) + struct.pack(">ii", htlow, hthigh) + w.flush()


def _huff_selected(
    sel: int, std_by_sel: dict[int, int], custom_iter, what: str,
    custom_sel: int = 3,
) -> HuffTable:
    """Resolve a 2-bit (or 1-bit) table selector: a standard table number
    from ``std_by_sel``, or — ONLY for the spec's explicit custom sentinel
    (3 for 2-bit selectors, 1 for 1-bit ones) — the NEXT custom table from
    the referred list.  Reserved selector values raise instead of silently
    consuming a custom table, which would misalign every later selector's
    custom-table assignment on a corrupt stream."""
    if sel in std_by_sel:
        return std_table(std_by_sel[sel])
    if sel != custom_sel:
        raise Jbig2Error(f"reserved {what} table selector {sel}")
    try:
        return next(custom_iter)
    except StopIteration:
        raise Jbig2Error(f"missing custom Huffman table for {what}") from None


def _decode_symbol_dict_huffman(
    payload: bytes,
    input_syms: list[np.ndarray],
    custom_tables: list[HuffTable],
) -> list[np.ndarray]:
    """SDHUFF=1 symbol dictionary (§6.5.9): height classes with widths via
    code tables, bitmaps as per-class COLLECTIVE bitmaps (MMR-coded or
    stored uncompressed), exports via Table B.1 runs."""
    flags = struct.unpack_from(">H", payload, 0)[0]
    refagg = bool(flags & 2)
    sel_dh = (flags >> 2) & 3
    sel_dw = (flags >> 4) & 3
    sel_bm = (flags >> 6) & 1
    sel_ag = (flags >> 7) & 1
    rtemplate = (flags >> 12) & 1
    pos = 2  # SDHUFF: no generic AT pixels
    rat = None
    if refagg and rtemplate == 0:
        if len(payload) < pos + 4:
            raise Jbig2Error("truncated SDRAT pixel list")
        rat = (
            (struct.unpack_from("b", payload, pos)[0],
             struct.unpack_from("b", payload, pos + 1)[0]),
            (struct.unpack_from("b", payload, pos + 2)[0],
             struct.unpack_from("b", payload, pos + 3)[0]),
        )
        pos += 4
    if len(payload) < pos + 8:
        raise Jbig2Error("truncated symbol dictionary header")
    numex, numnew = struct.unpack_from(">II", payload, pos)
    pos += 8
    if numnew > 10_000 or numex > 10_000:
        raise Jbig2Error("symbol dictionary too large")
    cit = iter(custom_tables)
    t_dh = _huff_selected(sel_dh, {0: 4, 1: 5}, cit, "SDHUFFDH")
    t_dw = _huff_selected(sel_dw, {0: 2, 1: 3}, cit, "SDHUFFDW")
    t_bm = _huff_selected(sel_bm, {0: 1}, cit, "SDHUFFBMSIZE", custom_sel=1)
    t_ag = _huff_selected(sel_ag, {0: 1}, cit, "SDHUFFAGG", custom_sel=1)
    t_rd = std_table(15)  # RDX/RDY in the REFAGG fast path
    symcodelen = _symcodelen(len(input_syms) + numnew)
    t_ex = std_table(1)
    r = _HBitReader(payload[pos:])
    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < numnew:
        budget.check()
        dh = t_dh.decode(r)
        if dh is HUFF_OOB:
            raise Jbig2Error("OOB delta-height in symbol dictionary")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 20:
            raise Jbig2Error("bad height class height")
        symwidth = 0
        widths: list[int] = []
        while True:
            dw = t_dw.decode(r)
            if dw is HUFF_OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 20:
                raise Jbig2Error("non-positive symbol dimensions")
            if len(new_syms) + len(widths) >= numnew + 1:
                raise Jbig2Error("more symbols than declared")
            if refagg:
                # §6.5.8 with SDHUFF: each symbol decodes individually as a
                # refinement of an earlier symbol (REFAGGNINST == 1 — the
                # jbig2enc-style shape; aggregates of several instances
                # would need a nested Huffman text region and quarantine)
                if symwidth * hcheight > _MAX_PIXELS:
                    raise Jbig2Error("JBIG2 symbol too large")
                ninst = t_ag.decode(r)
                if ninst is HUFF_OOB or ninst < 1 or ninst > 10_000:
                    raise Jbig2Error("bad REFAGGNINST")
                if ninst != 1:
                    # aggregate symbol: nested inline Huffman text region
                    combined = list(input_syms) + new_syms
                    if not combined:
                        raise Jbig2Error("aggregate symbol with no symbols")
                    new_syms.append(
                        _decode_huffman_aggregate(
                            r, payload, pos, combined, symcodelen,
                            symwidth, hcheight, ninst, rtemplate, rat,
                        )
                    )
                    continue
                rid = r.bits(symcodelen)
                rdx = t_rd.decode(r)
                rdy = t_rd.decode(r)
                bmsize = t_bm.decode(r)
                if HUFF_OOB in (rdx, rdy, bmsize) or bmsize < 0:
                    raise Jbig2Error("bad Huffman refinement parameters")
                combined = list(input_syms) + new_syms
                if not (0 <= rid < len(combined)):
                    raise Jbig2Error(f"refinement references unknown symbol {rid}")
                r.align()
                off = pos + r.byte_offset()
                chunk = payload[off : off + bmsize] if bmsize else payload[off:]
                if bmsize and len(chunk) < bmsize:
                    raise Jbig2Error("truncated refinement bitmap data")
                coding, refc = _refine_coords(rtemplate, rat)
                nbits = len(coding) + len(refc)
                gr_i, gr_mps = bytearray(1 << nbits), bytearray(1 << nbits)
                dec = MQDecoder(chunk)
                new_syms.append(
                    _decode_refinement_bitmap(
                        dec, gr_i, gr_mps, symwidth, hcheight, combined[rid],
                        coding, refc, rtemplate, False, rdx, rdy,
                    )
                )
                r.skip_bytes(bmsize)
                continue
            widths.append(symwidth)
        if refagg:
            continue  # symbols already decoded individually
        if not widths:
            continue
        totw = sum(widths)
        if totw * hcheight > _MAX_PIXELS:
            raise Jbig2Error("JBIG2 height class too large")
        bmsize = t_bm.decode(r)
        if bmsize is HUFF_OOB or bmsize < 0:
            raise Jbig2Error("bad collective bitmap size")
        r.align()
        off = pos + r.byte_offset()
        if bmsize == 0:
            # stored uncompressed, each row padded to a byte (§6.5.9)
            rowbytes = (totw + 7) // 8
            need = rowbytes * hcheight
            chunk = payload[off : off + need]
            if len(chunk) < need:
                raise Jbig2Error("truncated uncompressed collective bitmap")
            coll = (
                np.unpackbits(
                    np.frombuffer(chunk, dtype=np.uint8).reshape(hcheight, rowbytes),
                    axis=1,
                )[:, :totw]
                .astype(bool)
            )
            r.skip_bytes(need)
        else:
            chunk = payload[off : off + bmsize]
            if len(chunk) < bmsize:
                raise Jbig2Error("truncated MMR collective bitmap")
            try:
                coll = decode_g4(chunk, columns=totw, rows=hcheight)
            except G4Error as e:
                raise Jbig2Error(f"bad MMR collective bitmap: {e}") from e
            r.skip_bytes(bmsize)
        x = 0
        for wdt in widths:
            new_syms.append(coll[:, x : x + wdt].copy())
            x += wdt
    # export flags (§6.5.10, Huffman: Table B.1 run lengths)
    seq = list(input_syms) + new_syms
    exported: list[np.ndarray] = []
    idx = 0
    exflag = 0
    for _ in range(2 * len(seq) + 2):
        if idx >= len(seq) or len(exported) >= numex:
            break
        run = t_ex.decode(r)
        if run is HUFF_OOB or run < 0:
            raise Jbig2Error("bad export run length")
        if exflag:
            exported.extend(seq[idx : idx + run])
        idx += run
        exflag ^= 1
    if len(exported) != numex:
        raise Jbig2Error(
            f"symbol dictionary exported {len(exported)} of {numex} symbols"
        )
    return exported


def _decode_text_region_huffman(
    payload: bytes,
    symbols: list[np.ndarray],
    custom_tables: list[HuffTable],
):
    """SBHUFF=1 text region (§6.4.5 Huffman path + §7.4.3.1.7 runcoded
    symbol ID code lengths) -> (bitmap, x, y, comb_op)."""
    w, h, x, y, comb = struct.unpack_from(">IIIIB", payload, 0)
    flags = struct.unpack_from(">H", payload, 17)[0]
    pos = 19
    refine = bool(flags & 2)
    rtemplate = (flags >> 15) & 1
    log2strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    if (flags >> 6) & 1:
        raise Jbig2Error("unsupported JBIG2 text region: transposed placement")
    sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    if len(payload) < pos + 6:
        raise Jbig2Error("truncated Huffman text region header")
    hflags = struct.unpack_from(">H", payload, pos)[0]
    pos += 2
    sel_fs = hflags & 3
    sel_ds = (hflags >> 2) & 3
    sel_dt = (hflags >> 4) & 3
    sel_rdw = (hflags >> 6) & 3
    sel_rdh = (hflags >> 8) & 3
    sel_rdx = (hflags >> 10) & 3
    sel_rdy = (hflags >> 12) & 3
    sel_rsize = (hflags >> 14) & 1
    rat = None
    if refine and rtemplate == 0:
        if len(payload) < pos + 4:
            raise Jbig2Error("truncated SBRAT pixel list")
        rat = (
            (struct.unpack_from("b", payload, pos)[0],
             struct.unpack_from("b", payload, pos + 1)[0]),
            (struct.unpack_from("b", payload, pos + 2)[0],
             struct.unpack_from("b", payload, pos + 3)[0]),
        )
        pos += 4
    if len(payload) < pos + 4:
        raise Jbig2Error("truncated Huffman text region header")
    (n_instances,) = struct.unpack_from(">I", payload, pos)
    pos += 4
    if not symbols:
        raise Jbig2Error("text region with no symbol dictionary")
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise Jbig2Error("bad text region dimensions")
    if n_instances > 1_000_000:
        raise Jbig2Error("text region instance count too large")
    cit = iter(custom_tables)
    t_fs = _huff_selected(sel_fs, {0: 6, 1: 7}, cit, "SBHUFFFS")
    t_ds = _huff_selected(sel_ds, {0: 8, 1: 9, 2: 10}, cit, "SBHUFFDS")
    t_dt = _huff_selected(sel_dt, {0: 11, 1: 12, 2: 13}, cit, "SBHUFFDT")
    # refinement delta tables (consumed in selector order even when unused
    # so the referred custom-table alignment stays correct)
    t_rdw = _huff_selected(sel_rdw, {0: 14, 1: 15}, cit, "SBHUFFRDW")
    t_rdh = _huff_selected(sel_rdh, {0: 14, 1: 15}, cit, "SBHUFFRDH")
    t_rdx = _huff_selected(sel_rdx, {0: 14, 1: 15}, cit, "SBHUFFRDX")
    t_rdy = _huff_selected(sel_rdy, {0: 14, 1: 15}, cit, "SBHUFFRDY")
    t_rsize = _huff_selected(sel_rsize, {0: 1}, cit, "SBHUFFRSIZE", custom_sel=1)
    r = _HBitReader(payload[pos:])
    # symbol ID code lengths via the 35 runcodes (§7.4.3.1.7)
    runlens = [r.bits(4) for _ in range(35)]
    runtab = HuffTable([(pl, 0, i, "n") for i, pl in enumerate(runlens)], 0)
    codelens: list[int] = []
    prev = 0
    while len(codelens) < len(symbols):
        c = runtab.decode(r)
        if c is HUFF_OOB:
            raise Jbig2Error("OOB in symbol ID code lengths")
        if c < 32:
            codelens.append(c)
            prev = c
        elif c == 32:
            codelens.extend([prev] * (r.bits(2) + 3))
        elif c == 33:
            codelens.extend([0] * (r.bits(3) + 3))
        else:
            codelens.extend([0] * (r.bits(7) + 11))
    if len(codelens) != len(symbols):
        raise Jbig2Error("symbol ID code lengths overrun the symbol count")
    symtab = HuffTable([(pl, 0, i, "n") for i, pl in enumerate(codelens)], 0)
    r.align()
    strips = 1 << log2strips
    region = np.full((h, w), bool(defpixel), dtype=bool)
    dt = t_dt.decode(r)
    if dt is HUFF_OOB:
        raise Jbig2Error("OOB strip T in text region")
    stript = -dt * strips
    firsts = 0
    n_done = 0
    while n_done < n_instances:
        budget.check()
        dt = t_dt.decode(r)
        if dt is HUFF_OOB:
            raise Jbig2Error("OOB strip T in text region")
        stript += dt * strips
        first_in_strip = True
        curs = 0
        while True:
            if first_in_strip:
                dfs = t_fs.decode(r)
                if dfs is HUFF_OOB:
                    raise Jbig2Error("OOB first-S in text region")
                firsts += dfs
                curs = firsts
                first_in_strip = False
            else:
                ids = t_ds.decode(r)
                if ids is HUFF_OOB:
                    break  # strip done
                curs += ids + dsoffset
            curt = 0 if strips == 1 else r.bits(log2strips)
            t = stript + curt
            sid = symtab.decode(r)
            if sid is HUFF_OOB or sid >= len(symbols):
                raise Jbig2Error(f"symbol id {sid} out of range")
            sym = symbols[sid]
            if refine and r.bit():
                # SBHUFF refinement instance (§6.4.11 Huffman form): deltas
                # via code tables, then a BYTE-BOUNDED arithmetic GR bitmap
                # with fresh contexts per instance
                rdw = t_rdw.decode(r)
                rdh = t_rdh.decode(r)
                rdx = t_rdx.decode(r)
                rdy = t_rdy.decode(r)
                bmsize = t_rsize.decode(r)
                if HUFF_OOB in (rdw, rdh, rdx, rdy, bmsize) or bmsize < 0:
                    raise Jbig2Error("bad Huffman refinement parameters")
                nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                if nw <= 0 or nh <= 0 or nw * nh > _MAX_PIXELS:
                    raise Jbig2Error("bad refined instance dimensions")
                r.align()
                off = pos + r.byte_offset()
                chunk = payload[off : off + bmsize] if bmsize else payload[off:]
                if bmsize and len(chunk) < bmsize:
                    raise Jbig2Error("truncated refinement bitmap data")
                gdx = (rdw >> 1) + rdx
                gdy = (rdh >> 1) + rdy
                coding, refc = _refine_coords(rtemplate, rat)
                nbits = len(coding) + len(refc)
                gr_i, gr_mps = bytearray(1 << nbits), bytearray(1 << nbits)
                dec = MQDecoder(chunk)
                sym = _decode_refinement_bitmap(
                    dec, gr_i, gr_mps, nw, nh, sym,
                    coding, refc, rtemplate, False, gdx, gdy,
                )
                r.skip_bytes(bmsize)
            sh, sw = sym.shape
            if refcorner in (_REFCORNER_TR, _REFCORNER_BR):
                curs += sw - 1
            sx = curs - (sw - 1) if refcorner in (_REFCORNER_TR, _REFCORNER_BR) else curs
            sy = t if refcorner in (_REFCORNER_TL, _REFCORNER_TR) else t - sh + 1
            if sx < 0 or sy < 0 or sx + sw > w or sy + sh > h:
                raise Jbig2Error("text region symbol placed out of bounds")
            target = region[sy : sy + sh, sx : sx + sw]
            if sbcombop == 0:
                target |= sym
            elif sbcombop == 1:
                target &= sym
            elif sbcombop == 2:
                target ^= sym
            else:
                target[...] = ~(target ^ sym)
            if refcorner in (_REFCORNER_TL, _REFCORNER_BL):
                curs += sw - 1
            n_done += 1
            if n_done > n_instances:
                raise Jbig2Error("more instances than declared")
    return region, x, y, comb & 7


def _decode_huffman_aggregate(
    r: _HBitReader,
    payload: bytes,
    pos: int,
    symbols: list[np.ndarray],
    symcodelen: int,
    w: int,
    h: int,
    ninst: int,
    rtemplate: int,
    rat,
) -> np.ndarray:
    """Aggregate symbol bitmap in a Huffman dictionary (§6.5.8.2.1): a
    nested 1-strip TL text region decoded INLINE from the dictionary's bit
    reader with the spec-fixed tables (FS=B.6, DS=B.8, DT=B.11, deltas
    B.15, RSIZE=B.1) and symbol IDs as raw SBSYMCODELEN bits; per-instance
    refinement bitmaps are byte-bounded arithmetic GR."""
    t_fs, t_ds, t_dt = std_table(6), std_table(8), std_table(11)
    t_rd, t_rsize = std_table(15), std_table(1)
    region = np.zeros((h, w), dtype=bool)
    dt = t_dt.decode(r)
    if dt is HUFF_OOB:
        raise Jbig2Error("OOB strip T in aggregate symbol")
    stript = -dt
    firsts = 0
    n_done = 0
    while n_done < ninst:
        budget.check()
        dt = t_dt.decode(r)
        if dt is HUFF_OOB:
            raise Jbig2Error("OOB strip T in aggregate symbol")
        stript += dt
        first_in_strip = True
        curs = 0
        while True:
            if first_in_strip:
                dfs = t_fs.decode(r)
                if dfs is HUFF_OOB:
                    raise Jbig2Error("OOB first-S in aggregate symbol")
                firsts += dfs
                curs = firsts
                first_in_strip = False
            else:
                ids = t_ds.decode(r)
                if ids is HUFF_OOB:
                    break  # strip done
                curs += ids
            t = stript
            sid = r.bits(symcodelen)
            if sid >= len(symbols):
                raise Jbig2Error(f"aggregate symbol id {sid} out of range")
            sym = symbols[sid]
            if r.bit():  # RI
                rdw = t_rd.decode(r)
                rdh = t_rd.decode(r)
                rdx = t_rd.decode(r)
                rdy = t_rd.decode(r)
                bmsize = t_rsize.decode(r)
                if HUFF_OOB in (rdw, rdh, rdx, rdy, bmsize) or bmsize < 0:
                    raise Jbig2Error("bad aggregate refinement parameters")
                nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                if nw <= 0 or nh <= 0 or nw * nh > _MAX_PIXELS:
                    raise Jbig2Error("bad refined aggregate dimensions")
                r.align()
                off = pos + r.byte_offset()
                chunk = payload[off : off + bmsize] if bmsize else payload[off:]
                if bmsize and len(chunk) < bmsize:
                    raise Jbig2Error("truncated aggregate refinement data")
                coding, refc = _refine_coords(rtemplate, rat)
                nbits = len(coding) + len(refc)
                gr_i, gr_mps = bytearray(1 << nbits), bytearray(1 << nbits)
                sym = _decode_refinement_bitmap(
                    MQDecoder(chunk), gr_i, gr_mps, nw, nh, sym,
                    coding, refc, rtemplate, False,
                    (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                )
                r.skip_bytes(bmsize)
            sh, sw = sym.shape
            if curs < 0 or t < 0 or curs + sw > w or t + sh > h:
                raise Jbig2Error("aggregate instance placed out of bounds")
            region[t : t + sh, curs : curs + sw] |= sym
            curs += sw - 1
            n_done += 1
            if n_done > ninst:
                raise Jbig2Error("more aggregate instances than declared")
    return region


def _encode_symbol_dict_huffman(
    symbols: list[np.ndarray],
    refine_from: dict[int, int] | None = None,
    input_syms: list[np.ndarray] | None = None,
) -> bytes:
    """Fixture mirror of :func:`_decode_symbol_dict_huffman`: standard
    tables (DH=B.4, DW=B.3 — widths within a height class are in symbol
    order, not ascending, so DW deltas go negative and need B.3's lower
    range; BMSIZE=B.1, AGG=B.1), all new symbols exported;
    height classes alternate MMR-coded and stored-uncompressed collective
    bitmaps so both §6.5.9 storage forms are exercised."""
    syms = [np.asarray(s, dtype=bool) for s in symbols]
    if not syms or any(s.ndim != 2 or 0 in s.shape for s in syms):
        raise Jbig2Error("symbol dictionary needs non-empty 2-D symbols")
    input_syms = [np.asarray(s, dtype=bool) for s in (input_syms or [])]
    refagg = refine_from is not None
    refine_from = refine_from or {}
    order = sorted(range(len(syms)), key=lambda i: (syms[i].shape[0], i))
    decode_pos = {orig: k for k, orig in enumerate(order)}
    t_dh, t_dw, t_bm, t_ex = std_table(4), std_table(3), std_table(1), std_table(1)
    t_ag, t_rd = std_table(1), std_table(15)
    symcodelen = _symcodelen(len(input_syms) + len(syms))
    w = _HBitWriter()
    hcheight = 0
    i = 0
    n_class = 0
    while i < len(order):
        h = syms[order[i]].shape[0]
        t_dh.encode(w, h - hcheight)
        hcheight = h
        symwidth = 0
        members = []
        while i < len(order) and syms[order[i]].shape[0] == h:
            orig = order[i]
            sw = syms[orig].shape[1]
            t_dw.encode(w, sw - symwidth)
            symwidth = sw
            if refagg:
                spec = refine_from[orig]
                get_ref = lambda pid: (  # noqa: E731
                    input_syms[pid] if pid < len(input_syms)
                    else syms[order[pid - len(input_syms)]]
                )
                if isinstance(spec, int):
                    t_ag.encode(w, 1)  # REFAGGNINST
                    w.bits(spec, symcodelen)
                    t_rd.encode(w, 0)
                    t_rd.encode(w, 0)
                    coding, refc = _refine_coords(0, _REFINE_AT_NOMINAL)
                    nbits = len(coding) + len(refc)
                    gr_i, gr_mps = bytearray(1 << nbits), bytearray(1 << nbits)
                    enc = MQEncoder()
                    _encode_refinement_bitmap(
                        enc, gr_i, gr_mps, syms[orig], get_ref(spec),
                        coding, refc, 0, False, 0, 0,
                    )
                    data = enc.flush()
                    t_bm.encode(w, len(data))
                    w.extend_bytes(data)
                else:
                    # aggregate: placements [(pid, x, y)] as the nested
                    # inline text region (§6.5.8.2.1 fixed tables, 1-row
                    # strips, TL corner, unrefined instances)
                    t_ag.encode(w, len(spec))
                    t_fs_a, t_ds_a, t_dt_a = std_table(6), std_table(8), std_table(11)
                    by_t: dict[int, list] = {}
                    for pid, px, py in spec:
                        by_t.setdefault(py, []).append((px, pid))
                    t_dt_a.encode(w, 1)  # STRIPT starts at -1 (B.11 has no 0)
                    stript = -1
                    firsts = 0
                    for t in sorted(by_t):
                        t_dt_a.encode(w, t - stript)
                        stript = t
                        row = sorted(by_t[t])
                        t_fs_a.encode(w, row[0][0] - firsts)
                        firsts = row[0][0]
                        curs = firsts
                        for kk, (px, pid) in enumerate(row):
                            if kk > 0:
                                t_ds_a.encode(w, px - curs)
                                curs = px
                            w.bits(pid, symcodelen)
                            w.bit(0)  # RI: unrefined instance
                            curs += get_ref(pid).shape[1] - 1
                        t_ds_a.encode(w, None)  # OOB: strip done
            else:
                members.append(syms[orig])
            i += 1
        t_dw.encode(w, None)  # OOB: height class done
        if not refagg:
            coll = np.concatenate(members, axis=1)
            if n_class % 2 == 0:
                data = encode_g4(coll)
                t_bm.encode(w, len(data))
                w.extend_bytes(data)
            else:
                t_bm.encode(w, 0)  # stored uncompressed, rows byte-padded
                packed = np.packbits(coll.astype(np.uint8), axis=1)
                w.extend_bytes(packed.tobytes())
        n_class += 1
    # export: skip the imported symbols, export all new symbols
    t_ex.encode(w, len(input_syms))
    t_ex.encode(w, len(syms))
    # SDHUFF=1, DW selector 1 (B.3), REFAGG bit when refining
    flags = 1 | (1 << 4) | (2 if refagg else 0)
    head = struct.pack(">H", flags)
    if refagg:
        head += b"".join(struct.pack("bb", dx, dy) for dx, dy in _REFINE_AT_NOMINAL)
    head += struct.pack(">II", len(syms), len(syms))
    return head + w.flush()


#: custom SBHUFFDT table for the Huffman fixture encoder: the standard DT
#: tables (B.11-B.13) start at value 1, but the encoder's first strip-T
#: delta is 0 — a custom type-53 table covering 0.. is what a real encoder
#: emits here.  Lines tile 0 | 1-2 | 3-10 with 32-bit lower/upper ranges;
#: prefix lengths 1/2/3 + 4/4 are Kraft-complete.
_FIXTURE_DT_LINES = [(1, 0, 0), (2, 1, 1), (3, 3, 3)]
_FIXTURE_DT_LOW_PREF = 4
_FIXTURE_DT_HIGH_PREF = 4


def _fixture_dt_table() -> HuffTable:
    return parse_table_segment(
        encode_table_segment(
            _FIXTURE_DT_LINES, _FIXTURE_DT_LOW_PREF, _FIXTURE_DT_HIGH_PREF
        )
    )


def _encode_text_region_huffman(
    symbols: list[np.ndarray],
    instances: list[tuple],
    width: int,
    height: int,
    log2strips: int = 0,
    export_order: list[int] | None = None,
    ds_sel: int = 0,
) -> bytes:
    """Fixture mirror of :func:`_decode_text_region_huffman`: FS=B.6,
    DS=B.8/B.9/B.10 by ``ds_sel`` (0/1/2), DT=custom (selector 3 -> the
    referred type-53 segment), REFCORNER=TL, runcoded balanced symbol ID
    code. ``log2strips`` > 0 emits multi-row strips: DT deltas move in
    strip units and each instance carries its CURT as ``log2strips`` raw
    bits (§6.4.5)."""
    if export_order is None:
        export_order = _sorted_symbol_order(
            [np.asarray(s, dtype=bool) for s in symbols]
        )
    id_of = {orig: new for new, orig in enumerate(export_order)}
    n_syms = len(export_order)
    if ds_sel not in (0, 1, 2):
        raise Jbig2Error("ds_sel must be 0 (B.8), 1 (B.9) or 2 (B.10)")
    t_fs, t_ds, t_dt = std_table(6), std_table(8 + ds_sel), _fixture_dt_table()
    # balanced canonical symbol ID code: n_short codes one bit shorter
    k = max(1, (n_syms - 1).bit_length()) if n_syms > 1 else 1
    n_short = (1 << k) - n_syms
    codelens = [k - 1 if j < n_short and k > 1 else k for j in range(n_syms)]
    symtab = HuffTable([(pl, 0, j, "n") for j, pl in enumerate(codelens)], 0)
    # runcode table over the lengths in use (4-bit runcode prefix lengths)
    used = sorted(set(codelens))
    runlens = [0] * 35
    for rank, ln in enumerate(used):
        runlens[ln] = rank + 1 if len(used) > 1 else 1
    runtab = HuffTable([(pl, 0, j, "n") for j, pl in enumerate(runlens)], 0)
    w = _HBitWriter()
    for pl in runlens:
        w.bits(pl, 4)
    for ln in codelens:
        runtab.encode(w, ln)
    w.align()
    refine = any(len(inst) == 4 for inst in instances)
    t_rd = std_table(15)  # RDW/RDH/RDX/RDY (sel 1): covers all ints
    t_rsize = std_table(1)
    strips = 1 << log2strips
    by_strip: dict[int, list] = {}
    for inst in instances:
        sid, sx, sy = inst[0], inst[1], inst[2]
        bmp = inst[3] if len(inst) == 4 else None
        by_strip.setdefault(sy // strips, []).append((sx, sid, sy % strips, bmp))
    t_dt.encode(w, 0)  # STRIPT starts at 0
    strip_prev = 0
    firsts = 0
    for stripi in sorted(by_strip):
        t_dt.encode(w, stripi - strip_prev)
        strip_prev = stripi
        row = sorted(by_strip[stripi])
        t_fs.encode(w, row[0][0] - firsts)
        firsts = row[0][0]
        curs = firsts
        for kk, (sx, sid, curt, bmp) in enumerate(row):
            if kk > 0:
                t_ds.encode(w, sx - curs)
                curs = sx
            if strips > 1:
                w.bits(curt, log2strips)
            symtab.encode(w, id_of[sid])
            eff = symbols[sid]
            if refine:
                if bmp is None:
                    w.bit(0)
                else:
                    w.bit(1)
                    ref = np.asarray(symbols[sid], dtype=bool)
                    new_b = np.asarray(bmp, dtype=bool)
                    rdw = new_b.shape[1] - ref.shape[1]
                    rdh = new_b.shape[0] - ref.shape[0]
                    for v in (rdw, rdh, 0, 0):
                        t_rd.encode(w, v)
                    coding, refc = _refine_coords(0, _REFINE_AT_NOMINAL)
                    nbits = len(coding) + len(refc)
                    gr_i, gr_mps = bytearray(1 << nbits), bytearray(1 << nbits)
                    enc = MQEncoder()
                    _encode_refinement_bitmap(
                        enc, gr_i, gr_mps, new_b, ref,
                        coding, refc, 0, False, (rdw >> 1), (rdh >> 1),
                    )
                    data = enc.flush()
                    t_rsize.encode(w, len(data))
                    w.extend_bytes(data)
                    eff = new_b
            curs += eff.shape[1] - 1
        t_ds.encode(w, None)  # OOB: strip done
    body = w.flush()
    flags = (_REFCORNER_TL << 4) | (log2strips << 2) | (2 if refine else 0) | 1
    # huffman flags: FS sel 0 (B.6), DS sel per ds_sel (B.8/B.9/B.10),
    # DT sel 3 (custom); refinement deltas sel 1 (B.15), RSIZE sel 0 (B.1)
    hflags = (ds_sel << 2) | (3 << 4)
    hflags |= (1 << 6) | (1 << 8) | (1 << 10) | (1 << 12) if refine else 0
    head = struct.pack(">IIIIB", width, height, 0, 0, 0)
    head += struct.pack(">H", flags) + struct.pack(">H", hflags)
    if refine:
        head += b"".join(struct.pack("bb", dx, dy) for dx, dy in _REFINE_AT_NOMINAL)
    head += struct.pack(">I", len(instances))
    return head + body


def encode_jbig2_huffman_page(image: np.ndarray, ds_sel: int = 0) -> bytes:
    """Encode a bool page the way jbig2enc's Huffman (-s with arithmetic
    disabled) mode does: connected components deduped into an SDHUFF
    symbol dictionary + an SBHUFF text region with a custom type-53 DT
    table. Falls back to an MMR generic region for blank pages.
    ``ds_sel`` picks the standard SBHUFFDS table (0/1/2 -> B.8/B.9/B.10)
    so fixtures can exercise every legal selector, including B.10."""
    img = np.asarray(image, dtype=bool)
    if img.ndim != 2:
        raise Jbig2Error("encode_jbig2_huffman_page expects a 2-D bool array")
    comps = _connected_components(img)
    if not comps:
        return encode_jbig2_embedded(img, mmr=True)
    symbols: list[np.ndarray] = []
    index: dict[tuple, int] = {}
    instances = []
    for x, y, bmp in comps:
        key = (bmp.shape, bmp.tobytes())
        sid = index.get(key)
        if sid is None:
            sid = len(symbols)
            index[key] = sid
            symbols.append(bmp)
        instances.append((sid, x, y))
    h, w = img.shape
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    table_seg = encode_table_segment(
        _FIXTURE_DT_LINES, _FIXTURE_DT_LOW_PREF, _FIXTURE_DT_HIGH_PREF
    )
    sdict = _encode_symbol_dict_huffman(symbols)
    tregion = _encode_text_region_huffman(symbols, instances, w, h,
                                          ds_sel=ds_sel)
    return (
        _segment_header(0, _SEG_PAGE_INFO, 1, len(page_info)) + page_info
        + _segment_header(1, _SEG_TABLE, 1, len(table_seg)) + table_seg
        + _segment_header(2, _SEG_SYMBOL_DICT, 1, len(sdict)) + sdict
        + _segment_header(3, _SEG_TEXT_IMMEDIATE, 1, len(tregion), referred=(2, 1))
        + tregion
        + _segment_header(4, _SEG_END_OF_PAGE, 1, 0)
    )
