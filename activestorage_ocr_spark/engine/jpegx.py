"""Pure-numpy JPEG (JFIF) decoder — Huffman + dequant + IDCT.

Built from the public JPEG spec (ITU-T T.81) only. Covers what a crawl
actually contains at the fidelity the OCR path needs:

* baseline sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2) —
  spectral selection, successive approximation (DC/AC first + refine
  scans, EOBRUN), interleaved and single-component scans;
* grayscale (1 component) and YCbCr (3 components) with luma sampling
  factors up to 2x2 — 4:4:4, 4:2:2, 4:4:0, 4:2:0;
* restart intervals (DRI / RSTn), byte stuffing, 8- and 16-bit quant tables.

Rejected with ValueError (clear reason, quarantine-friendly):
hierarchical/lossless/arithmetic frames, 12-bit precision, 2- or
4-component frames.

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
    0xC3: "lossless JPEG not supported",
    0xC5: "differential sequential JPEG not supported",
    0xC6: "differential progressive JPEG not supported",
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


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded bytes and split at RSTn markers. Returns
    (restart segments, position of the terminating marker) — progressive
    files have several scans, so the caller resumes marker parsing there."""
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
    return segs, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JFIF payload. Returns (h, w) uint8
    for grayscale, (h, w, 3) uint8 RGB for YCbCr. Malformed input always
    surfaces as ValueError (the quarantine contract), never an internal
    IndexError; a truncated progressive stream renders the scans that
    arrived (the coarse-preview property of the format)."""
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
    got_any_scan = False
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
            _init_frame_state(frame)
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
        elif marker == 0xDA:  # SOS — one of possibly many scans
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tables = seg[1 + 2 * si], seg[2 + 2 * si]
                scan_comps.append((cs, tables >> 4, tables & 0x0F))
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            scan = {"comps": scan_comps, "ss": ss, "se": se,
                    "ah": ahl >> 4, "al": ahl & 0x0F}
            segs, end = _split_scan(data, pos + 2 + ln)
            got_any_scan = True
            try:
                _decode_one_scan(frame, scan, segs, huff_dc, huff_ac, restart_interval)
            except ValueError:
                if not frame.get("any_block_decoded"):
                    raise
                # truncated/corrupt later scan: render what accumulated
                break
            pos = end
            continue
        pos += 2 + ln
    if frame is None or not got_any_scan:
        raise ValueError("no SOS marker in JPEG")
    return _render_frame(frame, qt)


def _init_frame_state(frame: dict) -> None:
    """Allocate per-component coefficient grids in RASTER block order
    (padded to the MCU grid); scans — one for baseline, many for
    progressive — accumulate into them before one final dequant+IDCT."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    frame.update(hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy)
    for c in comps:
        c["wb"] = mcux * c["h"]  # padded grid width in blocks
        c["hb"] = mcuy * c["v"]
        # actual (unpadded) block dims for non-interleaved scans
        c["wb_used"] = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
        c["hb_used"] = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
        c["coef"] = np.zeros((c["hb"] * c["wb"], 64), dtype=np.int32)


def _decode_one_scan(frame, scan, segs, huff_dc, huff_ac, ri):
    """Decode one entropy-coded scan into the frame's coefficient state.
    Handles baseline (Ss=0..Se=63, Ah=Al=0, interleaved) and every
    progressive scan kind: DC first/refine (interleaved or not), AC
    first/refine (single-component, EOBRUN)."""
    comps_by_id = {c["id"]: c for c in frame["comps"]}
    members = []
    for cid, dc_t, ac_t in scan["comps"]:
        if cid not in comps_by_id:
            raise ValueError("JPEG scan references unknown component")
        c = comps_by_id[cid]
        members.append(c)
        c["dc"] = huff_dc.get(dc_t)
        c["ac"] = huff_ac.get(ac_t)
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if not (0 <= ss <= se <= 63) or al > 13:
        raise ValueError("bad JPEG spectral/approximation parameters")
    baseline_scan = ss == 0 and se == 63  # sequential full-block scan
    dc_scan = ss == 0 and se == 0
    ac_scan = ss > 0
    if baseline_scan and (ah or al):
        raise ValueError("JPEG sequential scan with approximation bits")
    if ss == 0 and 0 < se < 63:
        raise ValueError("bad JPEG spectral selection (DC mixed with partial AC)")
    if ac_scan and len(members) != 1:
        raise ValueError("JPEG AC progressive scan must be single-component")
    for c in members:
        if (baseline_scan or dc_scan) and ah == 0 and c["dc"] is None:
            raise ValueError("JPEG missing DC huffman table")
        if (baseline_scan or ac_scan) and c["ac"] is None:
            # AC refine scans (ah > 0) also decode run/size symbols
            raise ValueError("JPEG missing AC huffman table")

    interleaved = len(members) > 1
    if interleaved:
        units = frame["mcux"] * frame["mcuy"]
    else:
        c = members[0]
        # single-component scan traverses the component's OWN grid
        units = c["hb_used"] * c["wb_used"]

    per_seg = ri if ri else units
    seg_i = 0
    bits = _Bits(segs[0] if segs else b"")
    preds = {c["id"]: 0 for c in members}
    eobrun = 0
    unit = 0
    zig = ZIGZAG
    while unit < units:
        if ri and unit and unit % per_seg == 0:
            seg_i += 1
            if seg_i >= len(segs):
                break  # truncated: keep the decoded prefix
            bits = _Bits(segs[seg_i])
            preds = {c["id"]: 0 for c in members}
            eobrun = 0
        try:
            if interleaved:
                my, mx = divmod(unit, frame["mcux"])
                for c in members:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            bi = (my * c["v"] + v) * c["wb"] + (mx * c["h"] + hh)
                            row = c["coef"][bi]
                            if baseline_scan:
                                preds[c["id"]] = _dc_unit(bits, c, row, 0, 0, preds[c["id"]])
                                _ac_baseline_unit(bits, c, row, zig)
                            else:  # interleaved DC scan (first or refine)
                                preds[c["id"]] = _dc_unit(bits, c, row, ah, al, preds[c["id"]])
            else:
                c = members[0]
                by, bx = divmod(unit, c["wb_used"])
                row = c["coef"][by * c["wb"] + bx]
                if baseline_scan:  # single-component sequential (gray SOF0)
                    preds[c["id"]] = _dc_unit(bits, c, row, 0, 0, preds[c["id"]])
                    _ac_baseline_unit(bits, c, row, zig)
                elif dc_scan:
                    preds[c["id"]] = _dc_unit(bits, c, row, ah, al, preds[c["id"]])
                elif ah == 0:
                    eobrun = _ac_first_unit(bits, c, row, ss, se, al, eobrun, zig)
                else:
                    eobrun = _ac_refine_unit(bits, c, row, ss, se, al, eobrun, zig)
            frame["any_block_decoded"] = True
        except ValueError:
            if not frame.get("any_block_decoded"):
                raise
            break  # truncated tail: keep the decoded prefix
        unit += 1


def _dc_unit(bits, c, row, ah, al, pred):
    if ah == 0:  # first scan
        t = _decode_symbol(bits, c["dc"])
        pred += _extend(bits.read(t), t)
        row[0] = pred << al
        return pred
    if bits.read(1):  # refinement: append one magnitude bit
        row[0] |= 1 << al
    return pred


def _ac_baseline_unit(bits, c, row, zig):
    k = 1
    while k < 64:
        rs = _decode_symbol(bits, c["ac"])
        r, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        row[zig[k]] = _extend(bits.read(sz), sz)
        k += 1


def _ac_first_unit(bits, c, row, ss, se, al, eobrun, zig):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(bits, c["ac"])
        r, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if r < 15:  # EOBn: run of end-of-bands
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.read(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        row[zig[k]] = _extend(bits.read(sz), sz) << al
        k += 1
    return eobrun


def _ac_refine_unit(bits, c, row, ss, se, al, eobrun, zig):
    """Successive-approximation AC refinement (T.81 G.1.2.3): correction
    bits for already-nonzero coefficients interleave with newly-nonzero
    insertions; EOBRUN covers whole bands of correction-only blocks."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(bits, c["ac"])
            r, sz = rs >> 4, rs & 0x0F
            new_val = 0
            if sz == 0:
                if r < 15:
                    # EOBRUN includes the CURRENT band: the tail sweep below
                    # must still read this block's remaining correction bits
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.read(r)
                    break
                # r == 15: skip over 16 zero-history positions
            else:
                if sz != 1:
                    raise ValueError("JPEG AC refinement size must be 1")
                new_val = p1 if bits.read(1) else m1
            while k <= se:
                cur = int(row[zig[k]])
                if cur != 0:
                    if bits.read(1) and (cur & p1) == 0:
                        row[zig[k]] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if new_val:
                if k > se:
                    raise ValueError("JPEG AC refinement run past band end")
                row[zig[k]] = new_val
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = int(row[zig[k]])
            if cur != 0:
                if bits.read(1) and (cur & p1) == 0:
                    row[zig[k]] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _render_frame(frame, qt):
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise ValueError("JPEG missing quant table")
        coef = c["coef"].astype(np.float64) * qt[c["tq"]][None, :]
        blocks = coef.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C, optimize=True) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255)
        hb, wb = c["hb"], c["wb"]
        plane = spatial.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)
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
