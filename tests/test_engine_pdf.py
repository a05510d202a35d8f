"""Unit tests: PDF build/parse — E1-E11 semantics (SURVEY.md §2.4)."""

import numpy as np
import pytest

from activestorage_ocr_spark.engine import pdfx, rasters
from activestorage_ocr_spark.engine.confidence import calculate_confidence


def _gray(text="HELLO WORLD\nOCR 12345", scale=2):
    return rasters.render_text(text, scale=scale)


class TestTextLayer:
    def test_single_page_lines(self):
        pdf = pdfx.build_text_pdf([["Hello World", "Second line 12345"]])
        r = pdfx.extract_pdf(pdf)
        assert r["path"] == "text_layer"
        assert r["text"] == "Hello World\nSecond line 12345"
        assert r["confidence"] == 0.95  # ocrs.rs:142
        assert r["warnings"] == []

    def test_multi_page_double_newline(self):
        pdf = pdfx.build_text_pdf([["Page one text"], ["Page two text"]])
        r = pdfx.extract_pdf(pdf)
        assert r["text"] == "Page one text\n\nPage two text"

    def test_gate_short_text_falls_through(self):
        # trim(text) <= 10 chars -> text layer rejected (ocrs.rs:134-145);
        # no images either -> empty terminal (E10)
        pdf = pdfx.build_text_pdf([["tiny"]])
        r = pdfx.extract_pdf(pdf)
        assert r["path"] == "empty"
        assert r["text"] == ""
        assert r["confidence"] == 0.0
        assert r["warnings"] == [pdfx.EMPTY_PDF_WARNING]

    def test_gate_exactly_10_chars_rejected(self):
        pdf = pdfx.build_text_pdf([["0123456789"]])  # len == 10, not > 10
        assert pdfx.extract_pdf(pdf)["path"] == "empty"
        pdf = pdfx.build_text_pdf([["0123456789a"]])  # len == 11
        assert pdfx.extract_pdf(pdf)["path"] == "text_layer"

    def test_text_is_trimmed(self):
        # C6: trim before the gate and before return
        pdf = pdfx.build_text_pdf([["   padded line here   "]])
        r = pdfx.extract_pdf(pdf)
        assert r["text"] == "padded line here"

    def test_escaped_parens(self):
        pdf = pdfx.build_text_pdf([["with (parens) and \\ backslash"]])
        r = pdfx.extract_pdf(pdf)
        assert r["text"] == "with (parens) and \\ backslash"


class TestImageFallback:
    def test_scanned_gray_pdf(self):
        img = _gray()
        pdf = pdfx.build_image_pdf([(img, "DeviceGray")])
        r = pdfx.extract_pdf(pdf)
        assert r["path"] == "ocr_fallback"
        assert r["text"] == "HELLO WORLD\nOCR 12345"
        assert r["warnings"][0] == pdfx.SCANNED_PDF_WARNING  # E11 exact string
        assert r["confidence"] == pytest.approx(calculate_confidence(r["text"]))

    def test_rgb_and_cmyk_color_spaces(self):
        gray = _gray("RGB TEST")
        rgb = rasters.to_rgb(gray)
        # CMYK with K = 255-gray, C=M=Y=0 reproduces the gray under
        # r=(1-c)(1-k)*255 (ocrs.rs:467-582 math)
        k = (255 - gray).astype(np.uint8)
        cmyk = np.zeros((*gray.shape, 4), dtype=np.uint8)
        cmyk[..., 3] = k
        pdf = pdfx.build_image_pdf([(rgb, "DeviceRGB"), (cmyk, "DeviceCMYK")])
        r = pdfx.extract_pdf(pdf)
        # E7: per-image results joined with "\n\n" in document order
        assert r["text"] == "RGB TEST\n\nRGB TEST"

    def test_iccbased_treated_as_rgb(self):
        rgb = rasters.to_rgb(_gray("ICC 42"))
        pdf = pdfx.build_image_pdf([(rgb, "ICCBased")], icc_indirect=True)
        r = pdfx.extract_pdf(pdf)
        assert r["text"] == "ICC 42"

    def test_unsupported_colorspace_skipped_with_warning(self):
        ok = _gray("KEPT IMAGE")
        bad = rasters.to_rgb(_gray("DROPPED"))
        pdf = pdfx.build_image_pdf([(bad, "BogusSpace"), (ok, "DeviceGray")])
        r = pdfx.extract_pdf(pdf)
        # E2: per-image failures logged and skipped
        assert r["text"] == "KEPT IMAGE"
        assert any("unsupported color space" in w for w in r["warnings"])

    def test_all_images_fail_yields_empty_result(self):
        # Reference parity (`ocrs.rs:448-460` + `ocrs.rs:154-160`): failed
        # image decodes are dropped silently; zero survivors -> the empty
        # result with ONLY the empty-PDF warning, not a processing error.
        bad = rasters.to_rgb(_gray("X"))
        pdf = pdfx.build_image_pdf([(bad, "BogusSpace")])
        r = pdfx.extract_pdf(pdf)
        assert r["text"] == ""
        assert r["confidence"] == 0.0
        assert r["warnings"] == [pdfx.EMPTY_PDF_WARNING]

    def test_truncated_image_data_yields_empty_result(self):
        ok = _gray("SURVIVOR 7")
        pdf = pdfx.build_image_pdf([(ok, "DeviceGray")], corrupt_data=True)
        r = pdfx.extract_pdf(pdf)
        assert r["text"] == ""
        assert r["warnings"] == [pdfx.EMPTY_PDF_WARNING]

    def test_alt_engine_mean_confidence(self):
        # E9: leptess-analog averages per-image confidences
        a, b = _gray("FIRST IMAGE WORDS"), _gray("SECOND ONE")
        pdf = pdfx.build_image_pdf([(a, "DeviceGray"), (b, "DeviceGray")])
        r = pdfx.extract_pdf(pdf, engine="pixelocr-alt")
        expect = (calculate_confidence("FIRST IMAGE WORDS") + calculate_confidence("SECOND ONE")) / 2
        assert r["confidence"] == pytest.approx(expect)

    def test_default_engine_joined_confidence(self):
        a, b = _gray("FIRST IMAGE WORDS"), _gray("SECOND ONE")
        pdf = pdfx.build_image_pdf([(a, "DeviceGray"), (b, "DeviceGray")])
        r = pdfx.extract_pdf(pdf, engine="pixelocr")
        assert r["confidence"] == pytest.approx(
            calculate_confidence("FIRST IMAGE WORDS\n\nSECOND ONE")
        )


class TestErrors:
    def test_not_a_pdf(self):
        with pytest.raises(pdfx.PdfError, match="header"):
            pdfx.extract_pdf(b"not a pdf at all")

    def test_truncated_pdf(self):
        pdf = pdfx.build_text_pdf([["Hello World extended line"]])
        with pytest.raises(pdfx.PdfError):
            pdfx.extract_pdf(pdf[:40])

    def test_empty_pdf_terminal(self):
        r = pdfx.extract_pdf(pdfx.build_empty_pdf())
        assert r["path"] == "empty"
        assert r["warnings"] == [pdfx.EMPTY_PDF_WARNING]  # E10 exact string


class TestStreamFilters:
    """Round 3: the PDF filter chain beyond FlateDecode (32000-1 §7.4)."""

    def test_run_length_roundtrip(self):
        from activestorage_ocr_spark.engine.pdfx import _apply_filter

        # literal run + repeat run + EOD
        enc = b"\x02abc" + b"\xfeZ" + b"\x80trailing-ignored"
        assert _apply_filter("/RunLengthDecode", enc) == b"abc" + b"Z" * 3

    def test_ascii_hex(self):
        from activestorage_ocr_spark.engine.pdfx import _apply_filter

        assert _apply_filter("/ASCIIHexDecode", b"48 65 6C6C 6F3>") == b"Hello0"
        assert _apply_filter("/ASCIIHexDecode", b"4865>") == b"He"

    def test_ascii85(self):
        import base64

        from activestorage_ocr_spark.engine.pdfx import _apply_filter

        payload = b"The quick brown fox."
        enc = base64.a85encode(payload) + b"~>"
        assert _apply_filter("/ASCII85Decode", enc) == payload

    def test_filter_chain(self):
        import base64
        import zlib

        from activestorage_ocr_spark.engine.pdfx import PdfObject, _decode_stream

        payload = b"chained stream body"
        enc = base64.a85encode(zlib.compress(payload)) + b"~>"
        obj = PdfObject(9, {"/Filter": ["/ASCII85Decode", "/FlateDecode"]}, enc)
        assert _decode_stream(obj) == payload

    def test_unknown_filter_still_raises(self):
        from activestorage_ocr_spark.engine.pdfx import PdfError, PdfObject, _decode_stream

        with pytest.raises(PdfError, match="unsupported stream filter"):
            _decode_stream(PdfObject(9, {"/Filter": "/JBIG2Decode"}, b""))


class TestDctImages:
    def test_dct_image_pdf_ocrs_end_to_end(self):
        # scanned-PDF mainline: a /DCTDecode (JPEG) image XObject decodes via
        # engine.jpegx and OCRs exactly like a Flate DeviceGray image
        from tests.test_engine_jpeg import encode_jpeg

        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.engine.extract import extract_document
        from activestorage_ocr_spark.engine.pdfx import build_image_pdf

        img = rasters.render_text("DCT IN PDF 42", scale=2)
        jpeg = encode_jpeg(img)
        h, w = img.shape
        pdf = build_image_pdf([(jpeg, "DCT", w, h)])
        r = extract_document(pdf)
        assert r["mime"] == "application/pdf"
        assert r["status"] == "ok"
        assert "DCT IN PDF 42" in r["extracted_text"]
        assert any("scanned" in warn for warn in r["warnings"])

    def test_corrupt_dct_stream_is_per_image_warning(self):
        from activestorage_ocr_spark.engine.extract import extract_document
        from activestorage_ocr_spark.engine.pdfx import build_image_pdf

        pdf = build_image_pdf([(b"\xff\xd8\xff\xe0garbage", "DCT", 8, 8)])
        r = extract_document(pdf)
        # decode failure is recorded and skipped (E2), never a crash
        assert r["status"] in ("ok", "empty", "PROCESSING_ERROR")


class TestObjectStreams:
    def test_text_pdf_via_objstm(self):
        # PDF 1.5 layout: page tree + font dicts inside a compressed
        # /ObjStm — the modern-producer organization
        from activestorage_ocr_spark.engine.extract import extract_document

        pdf = pdfx.build_text_pdf(
            [["Hello ObjStm world with enough characters"]], objstm=True
        )
        assert b"/ObjStm" in pdf and b"/XRef" in pdf
        res = extract_document(pdf)
        assert res["status"] == "ok"
        assert res["extracted_text"] == "Hello ObjStm world with enough characters"
        # identical text to the classic layout
        classic = extract_document(
            pdfx.build_text_pdf([["Hello ObjStm world with enough characters"]])
        )
        assert res["extracted_text"] == classic["extracted_text"]

    def test_image_pdf_via_objstm(self):
        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.engine.extract import extract_document

        img = rasters.render_text("OBJSTM IMG", scale=2)
        pdf = pdfx.build_image_pdf([(img, "DeviceGray")], objstm=True)
        res = extract_document(pdf)
        assert res["status"] == "ok"
        assert res["extracted_text"] == "OBJSTM IMG"

    def test_codec_image_via_objstm(self):
        # round-4 codec + ObjStm layout combined
        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.engine.extract import extract_document

        img = rasters.render_text("MODERN G4", scale=2)
        res = extract_document(
            pdfx.build_image_pdf([(img, "G4")], objstm=True)
        )
        assert res["extracted_text"] == "MODERN G4"

    def test_corrupt_objstm_degrades_gracefully(self):
        from activestorage_ocr_spark.engine.extract import extract_document

        pdf = bytearray(
            pdfx.build_text_pdf([["Graceful degradation body text here"]], objstm=True)
        )
        at = pdf.index(b"/ObjStm")
        z_at = pdf.index(b"stream\n", at) + 7
        pdf[z_at : z_at + 8] = b"\x00" * 8
        res = extract_document(bytes(pdf))  # must not raise
        assert res["status"] in ("ok", "empty")

    def test_objstm_never_overrides_direct_objects(self):
        # an ObjStm claiming an oid that exists top-level loses
        import zlib as _z

        body = b"<< /Type /Catalog /Pages 99 0 R >>"
        head = b"1 0\n"
        packed = _z.compress(head + body + b"\n", 6)
        objstm = (
            b"<< /Type /ObjStm /N 1 /First " + str(len(head)).encode()
            + b" /Length " + str(len(packed)).encode()
            + b" /Filter /FlateDecode >>"
        )
        pdf = pdfx._assemble(
            [(1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
             (2, b"<< /Type /Pages /Kids [] /Count 0 >>", None),
             (3, objstm, packed)]
        )
        objs = pdfx.parse_objects(pdf)
        assert objs[1].dict["/Pages"].oid == 2  # direct object won


class TestHexStrings:
    # real-producer form: hex string operands (32000-1 §7.3.4.3) — round 5

    def test_hex_tj(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        c = b"BT /F1 12 Tf 72 720 Td <48656C6C6F2068657820776F726C64> Tj ET"
        assert extract_stream_text(c) == "Hello hex world"

    def test_hex_in_tj_array_and_dict_skip(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        c = b"BT <</MCID 3>> BDC (lit ) Tj 0 -14 TD [<414 2> (x)] TJ ET"
        assert extract_stream_text(c) == "lit \nABx"

    def test_odd_nibble_padded_and_whitespace_ignored(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        # whitespace inside hex strings is ignored; an odd nibble count is
        # padded with 0 per the spec
        assert extract_stream_text(b"BT <4 86 9> Tj ET") == "Hi"

    def test_e2e_hex_string_text_layer(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        # build a text PDF, then rewrite its content stream to hex form
        text = "Hex layer body with enough characters"
        pdf = pdfx.build_text_pdf([[text]])
        objs = pdfx.parse_objects(pdf)
        # find the content stream and re-encode its Tj operand as hex
        import re as _re

        for o in objs.values():
            if o.stream is not None and b"/FlateDecode" in o.dict:
                raw = zlib.decompress(o.stream)
                m = _re.search(rb"\((.*)\) Tj", raw, _re.S)
                assert m
                hexed = raw.replace(
                    b"(" + m.group(1) + b") Tj",
                    b"<" + m.group(1).hex().encode() + b"> Tj",
                )
                stream = zlib.compress(hexed, 6)
                body = _re.sub(
                    rb"/Length \d+", b"/Length %d" % len(stream), o.dict
                )
                old = (
                    str(o.oid).encode() + b" 0 obj\n" + o.dict
                    + b"\nstream\n" + o.stream + b"\nendstream"
                )
                new = (
                    str(o.oid).encode() + b" 0 obj\n" + body
                    + b"\nstream\n" + stream + b"\nendstream"
                )
                assert old in pdf
                pdf = pdf.replace(old, new)
                break
        # xref offsets are now stale — the lenient scanner must still parse
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert r["extracted_text"] == text

    def test_utf16be_bom_show_strings(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        # Unicode-aware producers emit text strings as UTF-16BE with BOM
        assert extract_stream_text(b"BT <FEFF00480069> Tj ET") == "Hi"
        assert extract_stream_text(b"BT <FEFF0421042A0415> Tj ET") == "СЪЕ"
        # no BOM -> the documented latin-1 convention, unchanged
        assert extract_stream_text(b"BT (plain) Tj ET") == "plain"

    def test_inline_image_bytes_do_not_leak_into_text(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        c = (b"BT (before) Tj ET "
             b"BI /W 4 /H 2 /BPC 8 ID \x28\x3c\xfe\xff\x00garbage EI "
             b"BT 0 -14 Td (after) Tj ET")
        assert extract_stream_text(c) == "before\nafter"

    def test_quote_show_operators(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        assert extract_stream_text(b'BT (first) Tj 2 1 (quoted) " ET') == "first\nquoted"
        assert extract_stream_text(b"BT (a) Tj (b) ' ET") == "a\nb"


class TestCidToUnicode:
    # round 5: Type0/CID fonts with /ToUnicode CMaps — the modern producer
    # layout (LibreOffice/Word/Chrome print output). Without the CMap path
    # these PDFs extract as mojibake.

    def test_cid_pdf_extracts_real_unicode(self):
        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        text = "Héllo Unicode — 日本語テキスト and Русский!"
        r = extract_document(pdfx.build_cid_text_pdf([[text, "Second line"]]))
        assert r["status"] == "ok"
        assert r["extracted_text"] == text + "\nSecond line"

    def test_cid_multi_page_join(self):
        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        r = extract_document(
            pdfx.build_cid_text_pdf([["Page one body text"], ["Page two body text"]])
        )
        assert r["extracted_text"] == "Page one body text\n\nPage two body text"

    def test_bfrange_contiguous_and_array_forms(self):
        from activestorage_ocr_spark.engine.pdfx import parse_tounicode_cmap

        cmap = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
                b"1 beginbfrange <0001> <0003> <0041> endbfrange\n"
                b"1 beginbfrange <0010> <0011> [<00480069> <0042>] endbfrange\n"
                b"1 beginbfchar <0020> <1F600> endbfchar")
        # (surrogate-paired dst also works: U+1F600 as its UTF-16 pair)
        cmap = cmap.replace(b"<1F600>", "😀".encode("utf-16-be").hex().upper().encode().join((b"<", b">")))
        fi = parse_tounicode_cmap(cmap)
        assert fi.code_bytes == 2
        assert fi.cmap[1] == "A" and fi.cmap[2] == "B" and fi.cmap[3] == "C"
        assert fi.cmap[0x10] == "Hi" and fi.cmap[0x11] == "B"
        assert fi.cmap[0x20] == "😀"

    def test_forged_giant_bfrange_skipped(self):
        from activestorage_ocr_spark.engine.pdfx import parse_tounicode_cmap

        cmap = b"1 beginbfrange <0000> <FFFFFFFF> <0041> endbfrange"
        fi = parse_tounicode_cmap(cmap)
        assert fi.cmap is None  # skipped, never a giant allocation

    def test_font_without_cmap_falls_back(self):
        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        # plain Type1 font, no /ToUnicode: latin-1 path unchanged
        r = extract_document(pdfx.build_text_pdf([["Plain latin-1 body text"]]))
        assert r["extracted_text"] == "Plain latin-1 body text"

    def test_damaged_cmap_stream_quarantines_gracefully(self):
        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        pdf = bytearray(pdfx.build_cid_text_pdf([["Damaged cmap body text"]]))
        # corrupt the flate bytes of the cmap stream (the LAST stream)
        at = pdf.rfind(b"stream\n")
        pdf[at + 10 : at + 16] = b"\x00" * 6
        r = extract_document(bytes(pdf))
        assert isinstance(r, dict) and "status" in r  # never raises


class TestDifferencesEncoding:
    # round 5: simple fonts with /Encoding /Differences — the TeX-family
    # producer layout; glyph names resolve algorithmically (uniXXXX,
    # NFC base+accent composition) plus a small literal punctuation set

    @pytest.mark.parametrize("name,want", [
        ("eacute", "é"), ("Adieresis", "Ä"), ("ccedilla", "ç"),
        ("ncaron", "ň"), ("aring", "å"), ("otilde", "õ"),
        ("uni0416", "Ж"), ("uni00480069", "Hi"), ("u1F600", "😀"),
        ("emdash", "—"), ("quotedblleft", "“"), ("fi", "ﬁ"),
        ("germandbls", "ß"), ("a", "a"), ("seven", "7"),
        ("bogusname", None), ("uniZZZZ", None),
    ])
    def test_glyph_name_resolution(self, name, want):
        from activestorage_ocr_spark.engine.pdfx import glyph_name_to_unicode

        assert glyph_name_to_unicode(name) == want

    def test_tex_style_pdf_extracts(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        content = zlib.compress(
            b"BT /F1 10 Tf 72 720 Td (Caf\x80 na\x81ve r\x82sum\x82 \x83 TeX) Tj ET", 6
        )
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >>"
                b" >> /Contents 4 0 R >>", None),
            (4, b"<< /Length " + str(len(content)).encode()
                + b" /Filter /FlateDecode >>", content),
            (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /CMR10 /Encoding "
                b"<< /Type /Encoding /Differences [ 128 /eacute /idieresis"
                b" /eacute /emdash ] >> >>", None),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["status"] == "ok"
        assert r["extracted_text"] == "Café naïve résumé — TeX"

    def test_winansi_encoding_smart_quotes(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        # cp1252 0x91-0x97: curly quotes and dashes that latin-1 reads as
        # C1 control bytes
        content = zlib.compress(
            b"BT /F1 10 Tf 72 720 Td (\x93Smart\x94 \x91quotes\x92 \x96 and \x97 dashes \x80) Tj ET",
            6,
        )
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >>"
                b" >> /Contents 4 0 R >>", None),
            (4, b"<< /Length " + str(len(content)).encode()
                + b" /Filter /FlateDecode >>", content),
            (5, b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial"
                b" /Encoding /WinAnsiEncoding >>", None),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["status"] == "ok"
        assert r["extracted_text"] == "“Smart” ‘quotes’ – and — dashes €"

    def test_winansi_base_plus_differences(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        content = zlib.compress(
            b"BT /F1 10 Tf 72 720 Td (\x93Caf\xe9\x94 and \x80 plus \x85) Tj ET", 6
        )
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >>"
                b" >> /Contents 4 0 R >>", None),
            (4, b"<< /Length " + str(len(content)).encode()
                + b" /Filter /FlateDecode >>", content),
            # Differences overrides 0x85 on top of the WinAnsi base
            (5, b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial /Encoding"
                b" << /BaseEncoding /WinAnsiEncoding /Differences [ 133 /bullet ] >> >>",
                None),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["extracted_text"] == "“Café” and € plus •"

    def test_malformed_text_stream_skips_not_quarantines(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        # page 1 ends with an unterminated string; page 2 is fine — the
        # bad stream skips (E2-style per-stream rule), the good one shows
        bad = zlib.compress(b"BT (never terminated", 6)
        good = zlib.compress(b"BT (good page body text here) Tj ET", 6)
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
            (4, b"<< /Length " + str(len(bad)).encode()
                + b" /Filter /FlateDecode >>", bad),
            (5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>", None),
            (6, b"<< /Length " + str(len(good)).encode()
                + b" /Filter /FlateDecode >>", good),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["status"] == "ok"
        assert r["extracted_text"] == "good page body text here"

    def test_macroman_encoding(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        # mac_roman: 0x8E = é, 0xD0 = –, 0xA5 = •
        content = zlib.compress(
            b"BT /F1 10 Tf 72 720 Td (Caf\x8e \xd0 list \xa5 item) Tj ET", 6
        )
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >>"
                b" >> /Contents 4 0 R >>", None),
            (4, b"<< /Length " + str(len(content)).encode()
                + b" /Filter /FlateDecode >>", content),
            (5, b"<< /Type /Font /Subtype /TrueType /BaseFont /Times"
                b" /Encoding /MacRomanEncoding >>", None),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["extracted_text"] == "Café – list • item"


class TestTjKerning:
    def test_kerned_word_spaces(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        assert extract_stream_text(b"BT [(Hello) -300 (World)] TJ ET") == "Hello World"
        assert extract_stream_text(b"BT [(A) -300 (B) -250 (C)] TJ ET") == "A B C"
        assert extract_stream_text(b"BT [<41> -400 <42>] TJ ET") == "A B"

    def test_small_kerns_do_not_split_words(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        assert extract_stream_text(b"BT [(kern) -50 (ed)] TJ ET") == "kerned"
        assert extract_stream_text(b"BT [(po) -179 (st)] TJ ET") == "post"

    def test_split_adjustments_sum_to_word_space(self):
        # ADVICE r5: producers may split one logical gap into several
        # numeric tokens — the CUMULATIVE advance decides, not the first
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        assert extract_stream_text(b"BT [(A) -100 -100 (B)] TJ ET") == "A B"
        assert extract_stream_text(b"BT [(A) -100 -50 (B)] TJ ET") == "AB"
        # net advance decides for mixed signs too
        assert extract_stream_text(b"BT [(A) 200 -400 (B)] TJ ET") == "A B"
        assert extract_stream_text(b"BT [(A) -300 250 (B)] TJ ET") == "AB"
        assert extract_stream_text(b"BT [<41> -90 -95 <42>] TJ ET") == "A B"

    def test_positive_and_non_array_numbers_ignored(self):
        from activestorage_ocr_spark.engine.pdfx import extract_stream_text

        assert extract_stream_text(b"BT [(a) 300 (b)] TJ ET") == "ab"
        # numbers outside arrays (Td coords) never inject spaces
        assert extract_stream_text(b"BT (x) Tj 0 -400 Td (y) Tj ET") == "x\ny"
        assert extract_stream_text(b"BT 0 -400 Td (x) Tj (y) Tj ET") == "xy"

    def test_e2e_kerned_pdf(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        content = zlib.compress(
            b"BT /F1 10 Tf 72 720 Td [(Kerned) -320 (spaces) -280 (work here)] TJ ET", 6
        )
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
            (4, b"<< /Length " + str(len(content)).encode()
                + b" /Filter /FlateDecode >>", content),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["extracted_text"] == "Kerned spaces work here"


class TestLzwFilter:
    def test_lzw_content_stream_extracts(self):
        from tests.test_engine_rasters import _tiff_lzw_encode

        from activestorage_ocr_spark.engine import pdfx
        from activestorage_ocr_spark.engine.extract import extract_document

        content = _tiff_lzw_encode(b"BT /F1 10 Tf (LZW body text extracts fine) Tj ET")
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", None),
            (4, b"<< /Length " + str(len(content)).encode()
                + b" /Filter /LZWDecode >>", content),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["status"] == "ok"
        assert r["extracted_text"] == "LZW body text extracts fine"


class TestPredictors:
    # /Predictor on Flate image streams (scanner-producer staple): skipping
    # it yields silently-garbage pixels, not an error

    def _image_pdf(self, stream, d_extra, w, h):
        from activestorage_ocr_spark.engine import pdfx

        d = (b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
             + b" /Height " + str(h).encode()
             + b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
             + str(len(stream)).encode() + b" /Filter /FlateDecode " + d_extra + b" >>")
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources"
                b" << /XObject << /Im0 5 0 R >> >> >>", None),
            (4, b"<< /Length 0 >>", b""),
            (5, d, stream),
        ]
        return pdfx._assemble(objs)

    def test_png_up_predictor_image(self):
        import zlib

        import numpy as np

        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.engine.extract import extract_document

        img = rasters.render_text("PRED PNG 12", scale=2)
        h, w = img.shape
        filtered = bytearray()
        prev = np.zeros(w, dtype=np.uint8)
        for r in range(h):
            filtered.append(2)  # Up filter
            filtered += ((img[r].astype(np.int32) - prev) % 256).astype(np.uint8).tobytes()
            prev = img[r]
        pdf = self._image_pdf(
            zlib.compress(bytes(filtered), 6),
            b"/DecodeParms << /Predictor 12 /Colors 1 /BitsPerComponent 8"
            b" /Columns " + str(w).encode() + b" >>", w, h)
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert r["extracted_text"] == "PRED PNG 12"

    def test_tiff_predictor_image(self):
        import zlib

        import numpy as np

        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.engine.extract import extract_document

        img = rasters.render_text("PRED TIFF 2", scale=2)
        h, w = img.shape
        diff = np.empty_like(img)
        diff[:, 0] = img[:, 0]
        diff[:, 1:] = (img[:, 1:].astype(np.int32) - img[:, :-1]) % 256
        pdf = self._image_pdf(
            zlib.compress(diff.astype(np.uint8).tobytes(), 6),
            b"/DecodeParms << /Predictor 2 /Colors 1 /BitsPerComponent 8"
            b" /Columns " + str(w).encode() + b" >>", w, h)
        r = extract_document(pdf)
        assert r["extracted_text"] == "PRED TIFF 2"

    def test_predictor_trailing_bytes_raise_not_truncate(self):
        # ADVICE r5: data that is not a whole number of (tag + row) units
        # previously dropped the remainder silently; it must raise instead
        import pytest

        from activestorage_ocr_spark.engine.pdfx import PdfError, _apply_predictor

        parms = {"/Predictor": 12, "/Colors": 1, "/BitsPerComponent": 8,
                 "/Columns": 4}
        good = bytes([0, 1, 2, 3, 4] * 3)  # 3 rows of (filter tag + 4 px)
        assert len(_apply_predictor(good, parms, height=3)) == 12
        with pytest.raises(PdfError, match="whole number of rows"):
            _apply_predictor(good + b"\x00\x01", parms)
        with pytest.raises(PdfError, match="shorter than declared"):
            _apply_predictor(good, parms, height=5)
        # extra whole rows beyond the declared height decode to height rows
        assert len(_apply_predictor(good + bytes([0, 9, 9, 9, 9]), parms,
                                    height=3)) == 12
        tparms = {"/Predictor": 2, "/Colors": 1, "/BitsPerComponent": 8,
                  "/Columns": 4}
        with pytest.raises(PdfError, match="whole number of rows"):
            _apply_predictor(b"\x01" * 10, tparms)
        with pytest.raises(PdfError, match="shorter than declared"):
            _apply_predictor(b"\x01" * 8, tparms, height=4)

    def test_predictor_image_with_trailing_garbage_skips_per_image(self):
        import zlib

        from activestorage_ocr_spark.engine import pdfx, rasters
        from activestorage_ocr_spark.engine.extract import extract_document

        # two-image scan: a clean raster plus a PNG-predictor stream with 3
        # trailing garbage bytes — the torn image must be SKIPPED with a
        # warning (E2 rule) instead of decoding a truncated last row, while
        # the good image still extracts
        img = rasters.render_text("GOOD ROW", scale=2)
        h, w = img.shape
        good = zlib.compress(img.tobytes(), 6)
        torn = zlib.compress(bytes([0] + [128] * 8) * 8 + b"\xde\xad\xbe", 6)
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources"
                b" << /XObject << /Im0 5 0 R /Im1 6 0 R >> >> >>", None),
            (4, b"<< /Length 0 >>", b""),
            (5, b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
                + b" /Height " + str(h).encode()
                + b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
                + str(len(good)).encode() + b" /Filter /FlateDecode >>", good),
            (6, b"<< /Type /XObject /Subtype /Image /Width 8 /Height 8"
                b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
                + str(len(torn)).encode() + b" /Filter /FlateDecode"
                b" /DecodeParms << /Predictor 12 /Colors 1"
                b" /BitsPerComponent 8 /Columns 8 >> >>", torn),
        ]
        r = extract_document(pdfx._assemble(objs))
        assert r["status"] == "ok"
        assert r["extracted_text"] == "GOOD ROW"
        assert any("whole number of rows" in warn for warn in r["warnings"])

    def test_forged_predictor_params_quarantine(self):
        import zlib

        from activestorage_ocr_spark.engine.extract import extract_document

        pdf = self._image_pdf(
            zlib.compress(b"\x00" * 64, 6),
            b"/DecodeParms << /Predictor 12 /Columns 99999999 >>", 8, 8)
        res = extract_document(pdf)
        assert isinstance(res, dict) and "status" in res  # no crash


class TestSubByteGray:
    # BitsPerComponent 1/2/4 DeviceGray images (bitonal scans that used
    # Flate instead of CCITT) — rows bit-packed and byte-padded

    def _image_pdf(self, stream, d_extra, w, h, bpc):
        from activestorage_ocr_spark.engine import pdfx

        d = (b"<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
             + b" /Height " + str(h).encode()
             + b" /ColorSpace /DeviceGray /BitsPerComponent " + str(bpc).encode()
             + b" /Length " + str(len(stream)).encode()
             + b" /Filter /FlateDecode" + d_extra + b" >>")
        objs = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>", None),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>", None),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources"
                b" << /XObject << /Im0 5 0 R >> >> >>", None),
            (4, b"<< /Length 0 >>", b""),
            (5, d, stream),
        ]
        return pdfx._assemble(objs)

    def test_one_bit_image_and_decode_invert(self):
        import zlib

        import numpy as np

        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.engine.extract import extract_document

        img = rasters.render_text("ONE BIT SCAN", scale=2)
        h, w = img.shape
        bits = (img >= 128).astype(np.uint8)
        pdf = self._image_pdf(
            zlib.compress(np.packbits(bits, axis=1).tobytes(), 6), b"", w, h, 1)
        assert extract_document(pdf)["extracted_text"] == "ONE BIT SCAN"
        inv = self._image_pdf(
            zlib.compress(np.packbits(1 - bits, axis=1).tobytes(), 6),
            b" /Decode [1 0]", w, h, 1)
        assert extract_document(inv)["extracted_text"] == "ONE BIT SCAN"

    def test_four_bit_image(self):
        import zlib

        import numpy as np

        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.engine.extract import extract_document

        img = rasters.render_text("NIBBLE 4", scale=2)
        h, w = img.shape
        q = (img.astype(np.int32) * 15 // 255).astype(np.uint8)
        hi, lo = q[:, 0::2], q[:, 1::2]
        if lo.shape[1] < hi.shape[1]:
            lo = np.concatenate([lo, np.zeros((h, 1), np.uint8)], axis=1)
        pdf = self._image_pdf(
            zlib.compress(((hi << 4) | lo).astype(np.uint8).tobytes(), 6),
            b"", w, h, 4)
        assert extract_document(pdf)["extracted_text"] == "NIBBLE 4"

    def test_truncated_sub_byte_data_quarantines(self):
        import zlib

        from activestorage_ocr_spark.engine.extract import extract_document

        pdf = self._image_pdf(zlib.compress(b"\x01", 6), b"", 64, 64, 1)
        res = extract_document(pdf)
        assert isinstance(res, dict) and "status" in res
