"""Pure-numpy baseline JPEG (JFIF) decoder — Huffman + dequant + IDCT.

Built from the public JPEG spec (ITU-T T.81) only. Covers what a crawl
actually contains at the fidelity the OCR path needs:

* baseline sequential DCT (SOF0/SOF1), 8-bit precision;
* grayscale (1 component) and YCbCr (3 components) with luma sampling
  factors up to 2x2 — 4:4:4, 4:2:2, 4:4:0, 4:2:0;
* restart intervals (DRI / RSTn), byte stuffing, 8- and 16-bit quant tables.

Rejected with ValueError (clear reason, quarantine-friendly): progressive
(SOF2), hierarchical/lossless/arithmetic frames, 12-bit precision, scans
with other component counts.

Reference parity target: the reference decodes JPEG via the Rust `image`
crate on its OCR path (`rust/src/server.rs:237-238`, fixture
`rust/tests/fixtures/sample_text.jpg`); this module replaces the round-1
stub so that fixture extracts instead of quarantining.

Per-symbol entropy decoding is a Python loop (inherent to Huffman);
everything after it — dequant, IDCT, plane assembly, upsampling, color
convert — is vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order: index = scan position, value = natural (row*8+col) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_SOF_UNSUPPORTED = {
    0xC2: "progressive JPEG not supported (baseline only)",
    0xC3: "lossless JPEG not supported",
    0xC5: "differential sequential JPEG not supported",
    0xC6: "progressive JPEG not supported (baseline only)",
    0xC7: "differential lossless JPEG not supported",
    0xC9: "arithmetic-coded JPEG not supported",
    0xCA: "arithmetic-coded progressive JPEG not supported",
    0xCB: "arithmetic-coded lossless JPEG not supported",
    0xCD: "differential sequential JPEG not supported",
    0xCE: "differential progressive JPEG not supported",
    0xCF: "differential lossless JPEG not supported",
}

# 8x8 IDCT basis: spatial = C.T @ coeffs @ C
_C = np.array([
    [(np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
     * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
    for u in range(8)
])


class _Bits:
    """MSB-first bit reader over unstuffed entropy bytes; pads with zeros
    past the end (truncated streams fail later on an invalid Huffman code
    or simply produce a short block count, both handled by the caller)."""

    __slots__ = ("d", "i", "buf", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.buf = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            b = self.d[self.i] if self.i < len(self.d) else 0
            self.i += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFFFFFF
            self.n += 8
        self.n -= k
        return (self.buf >> self.n) & ((1 << k) - 1)


def _build_huff(bits_counts: bytes, values: bytes) -> dict:
    """Canonical Huffman table -> {(code_len, code): symbol}."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits_counts[ln - 1]):
            lut[(ln, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _decode_symbol(bits: _Bits, lut: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.read(1)
        sym = lut.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_scan(data: bytes, start: int) -> list[bytes]:
    """Unstuff the entropy-coded bytes and split at RSTn markers. Returns
    the list of restart segments (one when no DRI)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any true marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF payload. Returns (h, w) uint8 for grayscale,
    (h, w, 3) uint8 RGB for YCbCr. Malformed input always surfaces as
    ValueError (the quarantine contract), never an internal IndexError."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError) as e:
        raise ValueError(f"truncated or corrupt JPEG header: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = data[pos + 1]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT — may hold several tables
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[o : o + 64], dtype=np.uint8).astype(np.float64)
                    o += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[o : o + 128], dtype=">u2").astype(np.float64)
                    o += 128
                else:
                    raise ValueError("bad DQT precision")
                nat = np.empty(64)
                nat[ZIGZAG] = tbl  # store in natural order
                qt[tq] = nat
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG not supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                raise ValueError("JPEG sampling factors beyond 2x2 not supported")
            if h == 0 or w == 0:
                raise ValueError("zero-dimension JPEG")
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in _SOF_UNSUPPORTED:
            raise ValueError(_SOF_UNSUPPORTED[marker])
        elif marker == 0xC4:  # DHT — may hold several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                counts = seg[o + 1 : o + 17]
                nv = sum(counts)
                vals = seg[o + 17 : o + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(counts, vals)
                o += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS — baseline has a single scan
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for s in range(ns):
                cs, tables = seg[1 + 2 * s], seg[2 + 2 * s]
                scan_sel[cs] = (tables >> 4, tables & 0x0F)
            if set(scan_sel) != {c["id"] for c in frame["comps"]}:
                raise ValueError("JPEG multi-scan / partial scan not supported")
            return _decode_entropy(
                data, pos + 2 + ln, frame, scan_sel, qt, huff_dc, huff_ac, restart_interval
            )
        pos += 2 + ln
    raise ValueError("no SOS marker in JPEG")


def _decode_entropy(data, start, frame, scan_sel, qt, huff_dc, huff_ac, ri):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcus = mcux * mcuy
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG missing quant table")
        dc_t, ac_t = scan_sel[c["id"]]
        if dc_t not in huff_dc or ac_t not in huff_ac:
            raise ValueError("JPEG missing huffman table")
        c["dc"] = huff_dc[dc_t]
        c["ac"] = huff_ac[ac_t]
        c["nblocks"] = n_mcus * c["h"] * c["v"]
        c["coef"] = np.zeros((c["nblocks"], 64))
    segs = _split_scan(data, start)

    zig = ZIGZAG
    mcu = 0
    seg_i = 0
    bits = _Bits(segs[0])
    preds = [0] * len(comps)
    per_seg = ri if ri else n_mcus
    while mcu < n_mcus:
        if ri and mcu and mcu % per_seg == 0:
            seg_i += 1
            if seg_i >= len(segs):
                break  # truncated: decode what we have
            bits = _Bits(segs[seg_i])
            preds = [0] * len(comps)
        try:
            bi_base = mcu  # MCU-major block layout per component
            for ci, c in enumerate(comps):
                coef = c["coef"]
                for b in range(c["h"] * c["v"]):
                    row = coef[bi_base * c["h"] * c["v"] + b]
                    t = _decode_symbol(bits, c["dc"])
                    preds[ci] += _extend(bits.read(t), t)
                    row[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(bits, c["ac"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        row[zig[k]] = _extend(bits.read(s), s)
                        k += 1
        except ValueError:
            if mcu == 0:
                raise  # nothing decodable at all
            break  # truncated tail: keep the decoded prefix
        mcu += 1

    planes = []
    for c in comps:
        coef = c["coef"] * qt[c["tq"]][None, :]
        blocks = coef.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C, optimize=True) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255)
        wb = mcux * c["h"]  # plane width in blocks
        hb = mcuy * c["v"]
        # MCU-major -> raster block order
        order = np.empty(hb * wb, dtype=np.int64)
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        order[i] = (my * c["v"] + v) * wb + (mx * c["h"] + hh)
                        i += 1
        arranged = np.zeros((hb * wb, 8, 8))
        arranged[order] = spatial
        plane = arranged.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
        # chroma upsampling (nearest / pixel replication) + crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
