"""Unit tests: top-level dispatch (P1-P4), error taxonomy (O6), graceful
failure (O7)."""

import pytest

from activestorage_ocr_spark.engine import extract as ex
from activestorage_ocr_spark.engine import pdfx, rasters


class TestRouting:
    def test_html_route(self):
        page = b"<html><body><p>A perfectly good paragraph with enough words to keep.</p></body></html>"
        r = ex.extract_document(page)
        assert r["mime"] == "text/html"
        assert r["status"] == "ok"
        assert r["extracted_text"] == "A perfectly good paragraph with enough words to keep."
        assert r["spans"] == [(0, len(r["extracted_text"]), "block")]
        assert 0 < r["confidence"] <= 1

    def test_pdf_route(self):
        pdf = pdfx.build_text_pdf([["Hello World 12345"]])
        r = ex.extract_document(pdf)
        assert r["mime"] == "application/pdf"
        assert r["extracted_text"] == "Hello World 12345"
        assert r["confidence"] == 0.95

    def test_image_route(self):
        png = rasters.encode_png(rasters.render_text("IMG ROUTE 3", scale=2))
        r = ex.extract_document(png)
        assert r["mime"] == "image/png"
        assert r["extracted_text"] == "IMG ROUTE 3"
        assert r["status"] == "ok"
        assert [n for n, _ in r["step_timings"]] == ["grayscale"]  # minimal preset

    def test_unsupported_quarantined(self):
        r = ex.extract_document(b"\x00\x01binary junk here")
        assert r["status"] == "UNSUPPORTED_FORMAT"
        assert r["error_code"] == "UNSUPPORTED_FORMAT"
        assert r["extracted_text"] == ""

    def test_size_gate_before_decode(self):
        r = ex.extract_document(b"%PDF-" + b"x" * 100, max_bytes=50)
        assert r["status"] == "IMAGE_TOO_LARGE"
        assert "exceeds maximum 50" in r["warnings"][0]

    def test_empty_payload_invalid(self):
        assert ex.extract_document(b"")["status"] == "INVALID_REQUEST"
        assert ex.extract_document(None)["status"] == "INVALID_REQUEST"

    def test_corrupt_pdf_quarantined_not_raised(self):
        r = ex.extract_document(b"%PDF-1.4 garbage no objects")
        assert r["status"] == "PROCESSING_ERROR"
        assert r["error_code"] == "PROCESSING_ERROR"
        assert r["warnings"]  # reason preserved

    def test_corrupt_png_quarantined(self):
        r = ex.extract_document(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
        assert r["status"] == "PROCESSING_ERROR"

    def test_unknown_engine_invalid_request(self):
        r = ex.extract_document(b"<html><body></body></html>", engine="tesseract9000")
        assert r["status"] == "INVALID_REQUEST"
        assert "available: pixelocr, pixelocr-alt" in r["warnings"][0]

    def test_invalid_preset_invalid_request(self):
        r = ex.extract_document(b"<html><body></body></html>", preset="turbo")
        assert r["status"] == "INVALID_REQUEST"

    def test_empty_html_page_status_empty(self):
        r = ex.extract_document(b"<html><body><p>x</p></body></html>")
        assert r["status"] == "empty"
        assert r["confidence"] == 0.0

    def test_scanned_pdf_warning_surfaces(self):
        img = rasters.render_text("SCANNED 55", scale=2)
        pdf = pdfx.build_image_pdf([(img, "DeviceGray")])
        r = ex.extract_document(pdf)
        assert pdfx.SCANNED_PDF_WARNING in r["warnings"]
        assert r["extracted_text"] == "SCANNED 55"

    def test_determinism_excluding_timings(self):
        pdf = pdfx.build_text_pdf([["Deterministic output 999"]])
        a = ex.extract_document(pdf)
        b = ex.extract_document(pdf)
        for k in ("mime", "extracted_text", "confidence", "engine", "status", "warnings", "spans"):
            assert a[k] == b[k]

    def test_pipeline_info_shape(self):
        info = ex.pipeline_info()
        assert info["default_engine"] == "pixelocr"
        assert len(info["supported_formats"]) == 8
        assert info["max_file_size"] == 52_428_800
