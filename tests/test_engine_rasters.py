"""Unit tests: pixel-font render/OCR round trip (E5/E6 stand-in) and the six
image containers (four real codecs, two documented stubs)."""

import numpy as np
import pytest

from activestorage_ocr_spark.engine import rasters
from activestorage_ocr_spark.engine.mime import sniff_mime


FULL_CHARSET_LINES = [
    "ABCDEFGHIJKLM",
    "NOPQRSTUVWXYZ",
    "0123456789",
    "A.B,C-D!E?F:G'H",
]


class TestFontRoundTrip:
    @pytest.mark.parametrize("scale", [1, 2, 3])
    def test_full_charset_roundtrip(self, scale):
        text = "\n".join(FULL_CHARSET_LINES)
        img = rasters.render_text(text, scale=scale)
        decoded, warnings = rasters.ocr_decode_image(img)
        assert warnings == []
        assert decoded == text

    def test_word_separators_exact(self):
        # E6 byte-identity separators: words " ", lines "\n" (ocrs.rs:103-113)
        img = rasters.render_text("HELLO WORLD\nOCR 12345", scale=2)
        decoded, _ = rasters.ocr_decode_image(img)
        assert decoded == "HELLO WORLD\nOCR 12345"

    def test_reference_fixture_tokens(self):
        # the reference integration tests assert these tokens
        # (rust/tests/integration_test.rs:145-241)
        img = rasters.render_text("HELLO WORLD OCR 12345", scale=2)
        decoded, _ = rasters.ocr_decode_image(img)
        for tok in ("HELLO", "WORLD", "OCR", "12345"):
            assert tok in decoded

    def test_blank_image_empty(self):
        blank = np.full((40, 60), 255, dtype=np.uint8)
        decoded, warnings = rasters.ocr_decode_image(blank)
        assert decoded == ""
        assert warnings == []

    def test_normalize_renderable(self):
        assert rasters.normalize_renderable("Hello_world") == "HELLO?WORLD"


class TestCodecs:
    @pytest.mark.parametrize(
        "mime", ["image/png", "image/bmp", "image/tiff", "image/gif", "image/jpeg", "image/webp"]
    )
    def test_roundtrip_and_sniff(self, mime):
        img = rasters.render_text("CODEC TEST 99", scale=2)
        blob = rasters.encode_image(img, mime)
        assert sniff_mime(blob) == mime
        back = rasters.decode_image(blob, mime)
        assert back.shape == img.shape
        # BMP/GIF pass through a palette/RGB trip; gray values survive exactly
        np.testing.assert_array_equal(back, img)
        decoded, _ = rasters.ocr_decode_image(back)
        assert decoded == "CODEC TEST 99"

    def test_corrupt_png_raises(self):
        with pytest.raises(ValueError):
            rasters.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)

    def test_real_jpeg_rejected_with_clear_stub_error(self):
        # a "real" JPEG (no ASOS APP15 payload) must fail loudly, not silently
        fake = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00\xff\xd9"
        with pytest.raises(ValueError, match="stub"):
            rasters.decode_jpeg_stub(fake)

    def test_gray_luma_coefficients(self):
        # ITU-R 601 (grayscale.rs:6-8)
        rgb = np.zeros((1, 1, 3), dtype=np.uint8)
        rgb[0, 0] = (255, 0, 0)
        assert rasters.rgb_to_gray(rgb)[0, 0] == round(255 * 0.299)
        rgb[0, 0] = (0, 255, 0)
        assert rasters.rgb_to_gray(rgb)[0, 0] == round(255 * 0.587)
