"""JPEG 2000 codec (`engine/jp2x.py`, ITU-T T.800) and its ``/JPXDecode``
integration in the PDF image path."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from activestorage_ocr_spark.engine import jp2x, pdfx, rasters
from activestorage_ocr_spark.engine.extract import extract_document
from activestorage_ocr_spark.engine.jp2x import (
    Jp2Error,
    TagTreeDecoder,
    TagTreeEncoder,
    _HdrReader,
    _HdrWriter,
    decode_jp2,
    encode_jp2,
    t1_decode_block,
    t1_encode_block,
)


def _structured(h, w, seed=0):
    """Natural-ish test image: gradient + flat text-like regions."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((xx * 1.7 + yy * 0.9) % 256).astype(np.uint8)
    img[h // 5 : h // 2, w // 4 : 3 * w // 4] = 12
    img[(3 * h) // 4 : (3 * h) // 4 + 3, :] = 240
    noise = rng.integers(-8, 9, size=(h, w))
    return np.clip(img.astype(np.int64) + noise, 0, 255).astype(np.uint8)


class TestHdrBitIO:
    def test_ff_stuffing_round_trip(self):
        # 0xFF-heavy bit patterns exercise the stuffed-bit path
        bits = ([1] * 30 + [0, 1, 1, 0] + [1] * 17 + [0] * 5) * 3
        w = _HdrWriter()
        for b in bits:
            w.put(b)
        data = w.flush()
        r = _HdrReader(data)
        assert [r.get() for _ in range(len(bits))] == bits

    @given(st.lists(st.integers(0, 1), min_size=1, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_round_trip_property(self, bits):
        w = _HdrWriter()
        for b in bits:
            w.put(b)
        data = w.flush()
        r = _HdrReader(data)
        assert [r.get() for _ in range(len(bits))] == bits
        # after align() the reader sits on the first post-header byte
        assert r.align() <= len(data)


class TestTagTree:
    @pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (7, 5)])
    def test_round_trip(self, w, h):
        rng = np.random.default_rng(w * 10 + h)
        vals = rng.integers(0, 6, size=(h, w))
        enc = TagTreeEncoder(w, h)
        for y in range(h):
            for x in range(w):
                enc.set_value(x, y, int(vals[y, x]))
        enc.finalize()
        wr = _HdrWriter()
        # encode every leaf to full knowledge, mirroring the zbp protocol
        for y in range(h):
            for x in range(w):
                t = 1
                while not enc.known[0][y, x]:
                    enc.encode(x, y, t, wr)
                    t += 1
        data = wr.flush()
        rd = _HdrReader(data)
        dec = TagTreeDecoder(w, h)
        for y in range(h):
            for x in range(w):
                t = 1
                while not dec.decode(x, y, t, rd):
                    t += 1
                assert dec.value(x, y) == vals[y, x], (x, y)


class TestTier1:
    @pytest.mark.parametrize(
        "w,h,orient",
        [(8, 8, 0), (16, 13, 1), (5, 9, 2), (64, 64, 3), (7, 4, 0), (1, 1, 0)],
    )
    def test_round_trip(self, w, h, orient):
        rng = np.random.default_rng(w * 100 + h + orient)
        mag = rng.integers(0, 300, size=(h, w)).astype(np.int64)
        mag[rng.random((h, w)) < 0.6] = 0  # wavelet-like sparsity
        neg = (rng.random((h, w)) < 0.5).astype(np.uint8)
        neg[mag == 0] = 0
        data, nbps, npasses = t1_encode_block(mag, neg, orient)
        m2, n2 = t1_decode_block(data, w, h, nbps, npasses, orient)
        assert np.array_equal(m2, mag)
        assert np.array_equal(n2[mag > 0], neg[mag > 0])

    def test_all_zero_block(self):
        data, nbps, npasses = t1_encode_block(
            np.zeros((6, 6), dtype=np.int64), np.zeros((6, 6), dtype=np.uint8), 0
        )
        assert (data, nbps, npasses) == (b"", 0, 0)

    def test_pass_count(self):
        # 3*nbps - 2 passes: first plane is cleanup-only
        mag = np.array([[5, 0], [0, 1]], dtype=np.int64)
        _, nbps, npasses = t1_encode_block(mag, np.zeros((2, 2), np.uint8), 0)
        assert nbps == 3 and npasses == 3 * 3 - 2


class TestDwt:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 64])
    @pytest.mark.parametrize("a", [0, 1, 7])
    def test_53_1d(self, n, a):
        rng = np.random.default_rng(n * 10 + a)
        x = rng.integers(-500, 500, size=(3, n)).astype(np.int64)
        assert np.array_equal(jp2x._inv53_1d(jp2x._fwd53_1d(x, a), a), x)

    @pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 64])
    @pytest.mark.parametrize("a", [0, 1])
    def test_97_1d(self, n, a):
        rng = np.random.default_rng(n * 10 + a)
        x = rng.normal(0, 100, size=(2, n))
        assert np.allclose(jp2x._inv97_1d(jp2x._fwd97_1d(x, a), a), x, atol=1e-9)

    @pytest.mark.parametrize(
        "rect,lv",
        [
            ((0, 37, 0, 23), 3),
            ((0, 64, 0, 64), 5),
            ((5, 40, 3, 29), 2),  # odd tile offsets (multi-tile parity)
            ((7, 8, 0, 64), 3),   # 1-wide at odd x: empty deep subbands
            ((0, 100, 0, 1), 4),
        ],
    )
    def test_2d_multilevel(self, rect, lv):
        x0, x1, y0, y1 = rect
        rng = np.random.default_rng(x1 * 7 + y1)
        img = rng.integers(-255, 256, size=(y1 - y0, x1 - x0)).astype(np.int64)
        b = jp2x._fwd_dwt_2d(img, rect, lv, True)
        assert np.array_equal(jp2x._inv_dwt_2d(b, rect, lv, True), img)
        bf = jp2x._fwd_dwt_2d(img.astype(float), rect, lv, False)
        assert np.allclose(
            jp2x._inv_dwt_2d(bf, rect, lv, False), img.astype(float), atol=1e-6
        )


class TestCodestreamLossless:
    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"levels": 1},
            {"levels": 5},
            {"cblk": (16, 16)},
            {"cblk": (32, 8)},
            {"progression": "RLCP"},
            {"progression": "RPCL"},
            {"progression": "PCRL"},
            {"progression": "CPRL"},
            {"tile": (64, 64)},
            {"tile": (50, 37), "levels": 2},  # partial edge tiles, odd offsets
            {"wrap": True},
        ],
    )
    def test_gray_bit_exact(self, kw):
        img = _structured(97, 130)
        assert np.array_equal(decode_jp2(encode_jp2(img, **kw)), img)

    @pytest.mark.parametrize(
        "kw", [{}, {"tile": (32, 32)}, {"mct": False}, {"levels": 4}, {"wrap": True}]
    )
    def test_rgb_bit_exact(self, kw):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(70, 55, 3)).astype(np.uint8)
        assert np.array_equal(decode_jp2(encode_jp2(img, **kw)), img)

    def test_tiny_images(self):
        for shape in [(1, 1), (1, 9), (9, 1), (3, 3), (4, 4, 3)]:
            img = (np.arange(np.prod(shape)) % 256).astype(np.uint8).reshape(shape)
            assert np.array_equal(decode_jp2(encode_jp2(img, levels=2)), img)

    def test_compresses_structured_content(self):
        # noise-free gradient: lossless coding should beat raw by >2x
        yy, xx = np.mgrid[0:97, 0:130]
        img = ((xx * 1.7 + yy * 0.9) % 256).astype(np.uint8)
        img[20:48, 32:97] = 12
        assert len(encode_jp2(img)) < img.size // 2

    def test_determinism(self):
        img = _structured(64, 64, seed=3)
        assert encode_jp2(img) == encode_jp2(img)


class TestCodestreamLossy:
    def test_psnr_and_step_monotonicity(self):
        img = _structured(97, 130)
        sizes, errs = [], []
        for step in (0.5, 2.0, 8.0):
            cs = encode_jp2(img, reversible=False, quality_step=step)
            out = decode_jp2(cs)
            err = np.abs(img.astype(float) - out.astype(float))
            psnr = 10 * np.log10(255**2 / max((err**2).mean(), 1e-12))
            sizes.append(len(cs))
            errs.append(err.max())
            assert psnr > 30.0, step
        assert sizes[0] > sizes[1] > sizes[2]  # coarser step -> smaller file
        assert errs[0] <= errs[2]

    def test_rgb_ict_tiled(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, size=(70, 55, 3)).astype(np.uint8)
        out = decode_jp2(
            encode_jp2(img, reversible=False, quality_step=0.5, tile=(32, 32))
        )
        assert np.abs(img.astype(float) - out.astype(float)).max() < 24


class TestErrors:
    def test_not_jp2(self):
        with pytest.raises(Jp2Error):
            decode_jp2(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)

    def test_truncated_codestream(self):
        cs = encode_jp2(_structured(32, 32))
        for cut in (1, 3, 40, len(cs) // 2):
            with pytest.raises(Jp2Error):
                decode_jp2(cs[:cut])

    def test_truncated_container(self):
        cs = encode_jp2(_structured(16, 16), wrap=True)
        with pytest.raises(Jp2Error):
            decode_jp2(cs[:30])

    def test_unsupported_marker_rejected(self):
        cs = bytearray(encode_jp2(_structured(16, 16)))
        siz_len = int.from_bytes(cs[4:6], "big")
        pos = 4 + siz_len
        # PPM (packed packet headers) stays unsupported
        ppm = b"\xff\x6d" + (12).to_bytes(2, "big") + b"\x00" * 10
        with pytest.raises(Jp2Error, match="PPM"):
            decode_jp2(bytes(cs[:pos]) + ppm + bytes(cs[pos:]))
        # a COC naming an out-of-range component is a hard error, not UB
        coc = b"\xff\x53" + (12).to_bytes(2, "big") + b"\x09" + b"\x00" * 9
        with pytest.raises(Jp2Error, match="component"):
            decode_jp2(bytes(cs[:pos]) + coc + bytes(cs[pos:]))

    def test_encoder_input_validation(self):
        with pytest.raises(Jp2Error):
            encode_jp2(np.zeros((4, 4), dtype=np.int32))
        with pytest.raises(Jp2Error):
            encode_jp2(np.zeros((4, 4, 4), dtype=np.uint8))
        with pytest.raises(Jp2Error):
            encode_jp2(np.zeros((4, 4), dtype=np.uint8), cblk=(3, 3))
        with pytest.raises(Jp2Error):
            encode_jp2(np.zeros((4, 4), dtype=np.uint8), progression="XXXX")

    def test_junk_tolerance_never_hangs(self):
        rng = np.random.default_rng(0)
        cs = encode_jp2(_structured(24, 24))
        for _ in range(30):
            buf = bytearray(cs)
            for _ in range(6):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            try:
                decode_jp2(bytes(buf))
            except Jp2Error:
                pass  # reject is fine; crash/hang is not


class TestPdfIntegration:
    @pytest.mark.parametrize("kind", ["JPX", "JPXJ", "JPXL"])
    def test_jpx_pdf_extracts_end_to_end(self, kind):
        img = rasters.render_text("JPX HELLO 123", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, kind)]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "JPX HELLO 123"
        assert any("scanned" in w for w in res["warnings"])

    def test_rgb_jpx_image(self):
        gray = rasters.render_text("RGB JPX", scale=2)
        rgb = np.stack([gray, gray, gray], axis=-1)
        res = extract_document(pdfx.build_image_pdf([(rgb, "JPX")]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "RGB JPX"

    def test_corrupt_jpx_skipped(self):
        img = rasters.render_text("GONE", scale=2)
        res = extract_document(
            pdfx.build_image_pdf([(img, "JPX")], corrupt_data=True)
        )
        # E2: per-image decode failures are skipped, empty page warned
        assert any("No text or images" in w for w in res["warnings"])


class TestSopEphAndBudget:
    @pytest.mark.parametrize(
        "kw",
        [{"sop": True}, {"eph": True}, {"sop": True, "eph": True},
         {"sop": True, "eph": True, "tile": (50, 37)}],
    )
    def test_sop_eph_round_trip(self, kw):
        img = _structured(97, 130)
        cs = encode_jp2(img, **kw)
        if kw.get("sop"):
            assert b"\xff\x91" in cs
        if kw.get("eph"):
            assert b"\xff\x92" in cs
        assert np.array_equal(decode_jp2(cs), img)

    def test_decode_respects_doc_budget(self):
        # the wall budget must be able to interrupt tier-1 decoding — JPX is
        # the most compute-heavy codec, exactly what the TIMEOUT path is for
        import time

        from activestorage_ocr_spark.engine import budget

        cs = encode_jp2(_structured(97, 130))
        with pytest.raises(budget.DocTimeout):
            with budget.deadline(1):
                time.sleep(0.005)
                decode_jp2(cs)


class TestCocQcc:
    def test_coc_per_component_cblk_lossless(self):
        rng = np.random.default_rng(21)
        img = rng.integers(0, 256, size=(70, 55, 3)).astype(np.uint8)
        cs = encode_jp2(img, comp_cblk={1: (16, 16), 2: (32, 8)})
        assert b"\xff\x53" in cs  # COC markers present
        assert np.array_equal(decode_jp2(cs), img)

    def test_qcc_coarse_chroma(self):
        rng = np.random.default_rng(22)
        img = rng.integers(0, 256, size=(70, 55, 3)).astype(np.uint8)
        cs = encode_jp2(
            img, reversible=False, quality_step=0.5, chroma_step_mult=4.0
        )
        assert b"\xff\x5d" in cs  # QCC markers present
        out = decode_jp2(cs)
        assert np.abs(img.astype(float) - out.astype(float)).max() < 48
        # coarser chroma must shrink the stream vs uniform steps
        assert len(cs) < len(encode_jp2(img, reversible=False, quality_step=0.5))

    def test_combined_with_tiles_and_markers(self):
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, size=(70, 55, 3)).astype(np.uint8)
        cs = encode_jp2(
            img, reversible=False, quality_step=0.5, chroma_step_mult=2.0,
            comp_cblk={0: (32, 32)}, tile=(32, 32), sop=True, eph=True,
        )
        out = decode_jp2(cs)
        assert np.abs(img.astype(float) - out.astype(float)).max() < 32

    def test_validation(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        with pytest.raises(Jp2Error):
            encode_jp2(img, comp_cblk={5: (16, 16)})
        with pytest.raises(Jp2Error):
            encode_jp2(img, chroma_step_mult=2.0)  # reversible
        with pytest.raises(Jp2Error):
            encode_jp2(img[:, :, 0], reversible=False, chroma_step_mult=2.0)


class TestHighBitDepth:
    def test_uint16_lossless_scales_to_8(self):
        rng = np.random.default_rng(31)
        img16 = rng.integers(0, 65536, size=(40, 33)).astype(np.uint16)
        out = decode_jp2(encode_jp2(img16, levels=3))
        # decoder emits 8-bit output: MSB of the 16-bit samples, exact
        assert out.dtype == np.uint8
        assert np.array_equal(out, (img16 >> 8).astype(np.uint8))

    def test_uint16_rgb(self):
        rng = np.random.default_rng(32)
        img16 = rng.integers(0, 65536, size=(30, 22, 3)).astype(np.uint16)
        out = decode_jp2(encode_jp2(img16, levels=2))
        assert np.array_equal(out, (img16 >> 8).astype(np.uint8))

    def test_unsupported_dtype(self):
        with pytest.raises(Jp2Error):
            encode_jp2(np.zeros((8, 8), dtype=np.float32))


class TestPrecincts:
    @pytest.mark.parametrize(
        "kw",
        [
            {"precinct": (6, 6)},
            {"precinct": (5, 6), "levels": 4},
            {"precinct": (6, 6), "progression": "RPCL"},
            {"precinct": (6, 6), "progression": "PCRL"},
            {"precinct": (6, 6), "progression": "CPRL"},
            {"precinct": (6, 6), "tile": (100, 80)},
            {"precinct": (6, 6), "sop": True, "eph": True},
            {"precinct": (4, 4), "cblk": (32, 32)},  # cblk capped to 2^3
        ],
    )
    def test_gray_bit_exact(self, kw):
        yy, xx = np.mgrid[0:130, 0:190]
        img = ((xx * 1.3 + yy * 0.7) % 256).astype(np.uint8)
        img[30:70, 40:150] = 20
        cs = encode_jp2(img, **kw)
        assert np.array_equal(decode_jp2(cs), img)

    def test_rgb_lossy(self):
        rng = np.random.default_rng(18)
        img = rng.integers(0, 256, size=(100, 90, 3)).astype(np.uint8)
        assert np.array_equal(decode_jp2(encode_jp2(img, precinct=(6, 6))), img)
        # multi-precinct positions iterated across comps (CPRL/PCRL)
        for prog in ("CPRL", "PCRL"):
            cs = encode_jp2(img, precinct=(6, 6), progression=prog)
            assert np.array_equal(decode_jp2(cs), img), prog
        out = decode_jp2(
            encode_jp2(img, precinct=(6, 6), reversible=False, quality_step=0.5)
        )
        assert np.abs(img.astype(float) - out.astype(float)).max() < 24

    def test_validation(self):
        img = np.zeros((16, 16), dtype=np.uint8)
        with pytest.raises(Jp2Error):
            encode_jp2(img, precinct=(0, 6))
        with pytest.raises(Jp2Error):
            encode_jp2(img, precinct=(15, 15))
        with pytest.raises(Jp2Error):
            encode_jp2(img, precinct=(6, 6), comp_cblk={0: (16, 16)})

    def test_multiple_packets_emitted(self):
        # 190x130 at 64x64 precincts -> resolution NL has >1 precinct, so
        # SOP counts must exceed the no-precinct packet count
        yy, xx = np.mgrid[0:130, 0:190]
        img = ((xx + yy) % 256).astype(np.uint8)
        n_default = encode_jp2(img, sop=True).count(b"\xff\x91")
        n_prec = encode_jp2(img, sop=True, precinct=(6, 6)).count(b"\xff\x91")
        assert n_prec > n_default


class TestFilterChain:
    def test_jpx_behind_ascii_filters(self):
        # /Filter [/ASCIIHexDecode /JPXDecode]: earlier filters unwrap first
        import binascii

        from activestorage_ocr_spark.engine.pdfx import _assemble

        img = rasters.render_text("CHAIN JPX", scale=2)
        cs = jp2x.encode_jp2(img)
        hexed = binascii.hexlify(cs) + b">"
        h, w = img.shape
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /XObject << /Im0 4 0 R >> >> >>", None),
            (4, b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
                + b" /Height " + str(h).encode()
                + b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
                + str(len(hexed)).encode()
                + b" /Filter [/ASCIIHexDecode /JPXDecode] >>", hexed),
        ]
        res = extract_document(_assemble(objs))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "CHAIN JPX"


class TestTilePartHeaders:
    def _spliced(self, marker_seg):
        import struct

        img = (np.arange(32 * 40) % 256).astype(np.uint8).reshape(32, 40)
        cs = bytearray(encode_jp2(img))
        sot = cs.index(b"\xff\x90")
        at = sot + 12  # after the 10-byte SOT segment body
        psot = struct.unpack(">I", cs[sot + 6 : sot + 10])[0]
        cs[sot + 6 : sot + 10] = struct.pack(">I", psot + len(marker_seg))
        return img, bytes(cs[:at]) + marker_seg + bytes(cs[at:])

    def test_com_in_tile_part_header_skipped(self):
        import struct

        img, cs = self._spliced(b"\xff\x64" + struct.pack(">H", 6) + b"\x00\x01ok")
        assert np.array_equal(decode_jp2(cs), img)

    def test_per_tile_cod_named_rejection(self):
        import struct

        _, cs = self._spliced(b"\xff\x52" + struct.pack(">H", 12) + b"\x00" * 10)
        with pytest.raises(Jp2Error, match="per-tile"):
            decode_jp2(cs)


class TestQualityLayers:
    @pytest.mark.parametrize(
        "kw",
        [
            {"layers": 2},
            {"layers": 3},
            {"layers": 5, "levels": 2},
            {"layers": 2, "progression": "RLCP"},
            {"layers": 2, "progression": "RPCL"},
            {"layers": 2, "precinct": (6, 6)},
            {"layers": 2, "tile": (50, 37)},
            {"layers": 4, "cblk": (16, 16)},
            {"layers": 2, "sop": True, "eph": True},
        ],
    )
    def test_lossless_bit_exact(self, kw):
        # multi-layer tier-2: tag-tree inclusion across layers, the 1-bit
        # re-inclusion form, Lblock growth and codeword concatenation
        img = _structured(97, 130)
        assert np.array_equal(decode_jp2(encode_jp2(img, **kw)), img)

    def test_rgb_and_lossy(self):
        rng = np.random.default_rng(3)
        img3 = rng.integers(0, 256, (40, 50, 3)).astype(np.uint8)
        assert np.array_equal(decode_jp2(encode_jp2(img3, layers=3)), img3)
        img = _structured(60, 80)
        out = decode_jp2(
            encode_jp2(img, layers=3, reversible=False, quality_step=1.0)
        )
        assert np.abs(img.astype(float) - out.astype(float)).max() < 16

    def test_layer_count_validation(self):
        with pytest.raises(Jp2Error):
            encode_jp2(np.zeros((8, 8), dtype=np.uint8), layers=0)
        with pytest.raises(Jp2Error):
            encode_jp2(np.zeros((8, 8), dtype=np.uint8), layers=99)


class TestDerivedQuant:
    def test_style1_round_trip(self):
        # QCD style 1 (derived): single (eps, mant); per-band exponents
        # derive as eps0 - (r-1) — decoder path otherwise fixture-dead
        yy, xx = np.mgrid[0:70, 0:90]
        img = ((xx * 2 + yy) % 256).astype(np.uint8)
        cs = encode_jp2(img, reversible=False, quality_step=0.5, derived_quant=True)
        qcd_at = cs.index(b"\xff\x5c")
        assert cs[qcd_at + 4] & 0x1F == 1
        out = decode_jp2(cs)
        assert np.abs(img.astype(float) - out.astype(float)).max() <= 12

    def test_validation(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        with pytest.raises(Jp2Error):
            encode_jp2(img, derived_quant=True)  # reversible
        with pytest.raises(Jp2Error):
            encode_jp2(
                img, reversible=False, derived_quant=True, chroma_step_mult=2.0
            )


class TestDecompressionBombGuards:
    # found by adversarial fuzzing: forged headers must fail FAST with a
    # named error, never materialize millions of objects (one mutant
    # reached 43 GB RSS before these caps existed)
    def test_precinct_bomb(self):
        with pytest.raises(Jp2Error, match="too many precincts"):
            jp2x._prec_grid(0, 3000, 0, 3000, 1, 1)

    def test_layer_bomb(self):
        import struct

        cs = bytearray(encode_jp2(_structured(32, 32)))
        cod_at = cs.index(b"\xff\x52")
        cs[cod_at + 6 : cod_at + 8] = struct.pack(">H", 65535)
        with pytest.raises(Jp2Error, match="layer count"):
            decode_jp2(bytes(cs))
