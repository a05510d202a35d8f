"""CCITT Group 4 codec (`engine/ccittx.py`, ITU-T T.4/T.6) and its
``/CCITTFaxDecode`` integration in the PDF image path (VERDICT r3 item 6).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from activestorage_ocr_spark.engine import ccittx, pdfx, rasters
from activestorage_ocr_spark.engine.ccittx import G4Error, decode_g4, encode_g4
from activestorage_ocr_spark.engine.extract import extract_document


class TestCodeTables:
    def test_tables_are_prefix_free(self):
        # a transcription slip in the published T.4 tables would almost
        # always break prefix-freeness — this catches it structurally
        for table in (ccittx._WHITE_DECODE, ccittx._BLACK_DECODE):
            codes = sorted(table, key=len)
            for i, c in enumerate(codes):
                for d in codes[i + 1 :]:
                    assert not d.startswith(c) or d == c, (c, d)

    def test_table_sizes(self):
        assert len(ccittx._WHITE_TERM) == 64
        assert len(ccittx._BLACK_TERM) == 64
        assert len(ccittx._WHITE_MAKEUP) == 27
        assert len(ccittx._BLACK_MAKEUP) == 27
        assert len(ccittx._EXT_MAKEUP) == 13

    def test_known_codewords(self):
        # spot-pins against the published T.4 tables
        assert ccittx._WHITE_TERM[0] == "00110101"
        assert ccittx._WHITE_TERM[63] == "00110100"
        assert ccittx._BLACK_TERM[1] == "010"
        assert ccittx._BLACK_TERM[2] == "11"
        assert ccittx._WHITE_MAKEUP[1728] == "010011011"
        assert ccittx._BLACK_MAKEUP[64] == "0000001111"
        assert ccittx._EXT_MAKEUP[2560] == "000000011111"


class TestRoundTrip:
    @pytest.mark.parametrize("shape,density", [
        ((1, 1), 0.5), ((5, 8), 0.0), ((5, 8), 1.0),
        ((16, 37), 0.5), ((64, 211), 0.1), ((40, 1728), 0.03),
        ((3, 2600), 0.02),  # runs beyond the 2560 extended make-up
    ])
    def test_random_images(self, shape, density):
        rng = np.random.default_rng(shape[0] * 1000 + shape[1])
        img = rng.random(shape) < density
        dec = decode_g4(encode_g4(img), columns=shape[1], rows=shape[0])
        assert (dec == img).all()

    def test_text_raster(self):
        img = rasters.render_text("HELLO G4 OCR 12345", scale=3) < 128
        dec = decode_g4(encode_g4(img), columns=img.shape[1], rows=img.shape[0])
        assert (dec == img).all()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 90), st.integers(0, 2**32 - 1))
    def test_property_roundtrip(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.random((h, w)) < rng.random()
        dec = decode_g4(encode_g4(img), columns=w, rows=h)
        assert (dec == img).all()

    def test_truncated_stream_raises_g4error(self):
        img = np.tri(20, 40, dtype=bool)
        enc = encode_g4(img)
        with pytest.raises(G4Error):
            decode_g4(enc[: len(enc) // 3], columns=40, rows=20)

    def test_junk_raises_not_crashes(self):
        with pytest.raises(G4Error):
            decode_g4(b"\xde\xad\xbe\xef" * 10, columns=64, rows=8)

    def test_decode_bomb_guard(self):
        with pytest.raises(G4Error, match="too large"):
            decode_g4(b"\x00", columns=100_000, rows=100_000)


class TestPdfIntegration:
    def test_g4_scanned_pdf_extracts_end_to_end(self):
        pages = [rasters.render_text("SCANNED G4 PAGE ONE", scale=3),
                 rasters.render_text("SECOND PAGE 4567", scale=3)]
        pdf = pdfx.build_image_pdf([(p, "G4") for p in pages])
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "SCANNED G4 PAGE ONE" in r["extracted_text"]
        assert "SECOND PAGE 4567" in r["extracted_text"]  # E7 doc-order concat
        assert r["warnings"][0] == pdfx.SCANNED_PDF_WARNING  # E11 exact string

    def test_corrupt_g4_skipped_per_image(self):
        # E2: a broken image is skipped, never a raised error
        img = rasters.render_text("BROKEN", scale=3)
        r = extract_document(pdfx.build_image_pdf([(img, "G4")], corrupt_data=True))
        assert r["status"] in ("empty", "ok")

    def test_g4_mixed_with_flate_page(self):
        g4 = rasters.render_text("G4 HALF", scale=3)
        gray = rasters.render_text("FLATE HALF", scale=3)
        pdf = pdfx.build_image_pdf([(g4, "G4"), (gray, "DeviceGray")])
        r = extract_document(pdf)
        assert "G4 HALF" in r["extracted_text"]
        assert "FLATE HALF" in r["extracted_text"]

    def test_blackis1_inverts_bit_convention(self):
        img = rasters.render_text("INK 42", scale=3) < 128
        objs = pdfx.parse_objects(pdfx.build_image_pdf([(img, "G4")]))
        img_obj = next(o for o in objs.values() if o.dict.get("/Subtype") == "/Image")
        default_gray = pdfx.decode_image_xobject(img_obj, objs)
        assert default_gray.shape == img.shape
        # default BlackIs1=false: ink -> 0 (black samples)
        assert (default_gray[img] == 0).all()
        assert (default_gray[~img] == 255).all()
        # force BlackIs1 true in the dict: samples invert (spec behavior;
        # producers pair it with /Decode [1 0])
        img_obj.dict["/DecodeParms"]["/BlackIs1"] = True
        inverted = pdfx.decode_image_xobject(img_obj, objs)
        assert (inverted[img] == 255).all()
        img_obj.dict["/Decode"] = [1, 0]
        back = pdfx.decode_image_xobject(img_obj, objs)
        assert (back[img] == 0).all()

    def test_g3_2d_pdf_extracts_end_to_end(self):
        pdf = pdfx.build_image_pdf(
            [(rasters.render_text("G3 2D MIXED 77", scale=3), "G32D")]
        )
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "G3 2D MIXED 77" in r["extracted_text"]

    def test_g3_2d_byte_aligned_pdf_extracts_end_to_end(self):
        pdf = pdfx.build_image_pdf(
            [(rasters.render_text("ALIGNED 2D 88", scale=3), "G32DA")]
        )
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "ALIGNED 2D 88" in r["extracted_text"]

    def test_g3_1d_pdf_extracts_end_to_end(self):
        pdf = pdfx.build_image_pdf([(rasters.render_text("G3 FAX 1988", scale=3), "G3")])
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "G3 FAX 1988" in r["extracted_text"]

    def test_byte_aligned_g4_pdf_extracts_end_to_end(self):
        pdf = pdfx.build_image_pdf(
            [(rasters.render_text("ALIGNED 55", scale=3), "G4A")]
        )
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "ALIGNED 55" in r["extracted_text"]


class TestG3RoundTrip:
    @pytest.mark.parametrize("byte_align", [False, True])
    def test_random_images(self, byte_align):
        rng = np.random.default_rng(42)
        for shape, density in [((1, 1), 0.5), ((5, 8), 0.0), ((5, 8), 1.0),
                               ((30, 211), 0.15), ((3, 2600), 0.02)]:
            img = rng.random(shape) < density
            dec = ccittx.decode_g3_1d(
                ccittx.encode_g3_1d(img, byte_align=byte_align),
                columns=shape[1], rows=shape[0], byte_align=byte_align,
            )
            assert (dec == img).all(), shape

    def test_rows_none_stops_at_padding(self):
        img = np.tri(7, 19, dtype=bool)
        dec = ccittx.decode_g3_1d(ccittx.encode_g3_1d(img), columns=19)
        assert (dec == img).all()

    def test_g4_byte_align_roundtrip(self):
        img = rasters.render_text("ALIGN", scale=2) < 128
        enc = ccittx.encode_g4(img, byte_align=True)
        dec = ccittx.decode_g4(enc, columns=img.shape[1], rows=img.shape[0],
                               byte_align=True)
        assert (dec == img).all()

    def test_zero_run_corruption_raises(self):
        # a mid-line zero-length run can never advance -> must raise, not hang
        from activestorage_ocr_spark.engine.ccittx import _BitList, _emit_run

        bits = _BitList()
        _emit_run(bits, 3, True)
        _emit_run(bits, 0, False)   # invalid: zero black run mid-line
        _emit_run(bits, 0, True)    # invalid: zero white run mid-line
        with pytest.raises(G4Error):
            ccittx.decode_g3_1d(bits.to_bytes(), columns=10, rows=1)


class TestG32DRoundTrip:
    @pytest.mark.parametrize("k,byte_align", [(1, False), (2, False), (4, False),
                                              (4, True), (99, False)])
    def test_random_images(self, k, byte_align):
        rng = np.random.default_rng(7 * k + byte_align)
        for shape, density in [((1, 1), 0.5), ((5, 8), 0.0), ((5, 8), 1.0),
                               ((30, 211), 0.15), ((3, 2600), 0.02),
                               ((17, 64), 0.5)]:
            img = rng.random(shape) < density
            dec = ccittx.decode_g3_2d(
                ccittx.encode_g3_2d(img, k=k, byte_align=byte_align),
                columns=shape[1], rows=shape[0], byte_align=byte_align,
            )
            assert (dec == img).all(), (shape, k, byte_align)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 30), st.integers(1, 80), st.integers(0, 2**32 - 1),
           st.integers(1, 8))
    def test_property_roundtrip(self, h, w, seed, k):
        rng = np.random.default_rng(seed)
        img = rng.random((h, w)) < rng.random()
        dec = ccittx.decode_g3_2d(ccittx.encode_g3_2d(img, k=k), columns=w, rows=h)
        assert (dec == img).all()

    def test_rows_none_stops_at_rtc(self):
        img = np.tri(7, 19, dtype=bool)
        dec = ccittx.decode_g3_2d(ccittx.encode_g3_2d(img, k=2), columns=19)
        assert (dec == img).all()

    def test_text_raster(self):
        img = rasters.render_text("G3 TWO DIM 2024", scale=3) < 128
        dec = ccittx.decode_g3_2d(
            ccittx.encode_g3_2d(img, k=4), columns=img.shape[1], rows=img.shape[0]
        )
        assert (dec == img).all()

    def test_truncated_stream_raises(self):
        img = np.tri(20, 40, dtype=bool)
        enc = ccittx.encode_g3_2d(img, k=4)
        with pytest.raises(G4Error):
            ccittx.decode_g3_2d(enc[: len(enc) // 3], columns=40, rows=20)

    def test_junk_raises_not_crashes(self):
        with pytest.raises(G4Error):
            ccittx.decode_g3_2d(b"\xde\xad\xbe\xef" * 10, columns=64, rows=8)

    def test_missing_eol_raises(self):
        # a K>0 stream must be EOL-framed; a bare MH body (K=0 shape) is
        # corrupt, not silently misparsed
        img = np.tri(5, 12, dtype=bool)
        with pytest.raises(G4Error):
            ccittx.decode_g3_2d(ccittx.encode_g3_1d(img), columns=12, rows=5)

    def test_decode_bomb_guard(self):
        with pytest.raises(G4Error, match="too large"):
            ccittx.decode_g3_2d(b"\x00", columns=100_000, rows=100_000)
