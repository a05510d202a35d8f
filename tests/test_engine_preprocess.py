"""Unit tests: preprocessing chain (T1-T8) — mirrors the reference's inline
step tests (`grayscale.rs:16-37`, `resize.rs:55-72`, `normalize.rs:42-70`,
`sharpen.rs:23-45`, `denoise.rs:19-36`, `deskew.rs:99-123`,
`threshold.rs:92-125`) behavior-for-behavior per SURVEY.md §2.3."""

import numpy as np
import pytest

from activestorage_ocr_spark.engine import preprocess as pp
from activestorage_ocr_spark.engine.rasters import render_text, to_rgb


class TestSteps:
    def test_grayscale_identity_on_2d(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        assert pp.grayscale(img) is img

    def test_grayscale_luma_on_rgb(self):
        rgb = np.zeros((2, 2, 3), dtype=np.uint8)
        rgb[..., 2] = 255  # pure blue
        assert pp.grayscale(rgb)[0, 0] == round(255 * 0.114)

    def test_resize_scales_by_300_over_72(self):
        img = np.full((100, 120), 128, dtype=np.uint8)
        out = pp.resize(img)
        # reference truncates (`as u32`) f32 products: 100 -> 416, 120 -> 499
        assert out.shape == (416, 499)

    def test_resize_proportional_clamps_match_reference(self):
        # 1000x2000 -> scaled (4166, 8333) -> one proportional scale-down
        # to max 4000 on the long axis: ~ (2000, 4000), aspect preserved
        out = pp.resize(np.full((1000, 2000), 128, dtype=np.uint8))
        assert out.shape[1] == pp.RESIZE_MAX_DIM
        assert abs(out.shape[0] - 2000) <= 1
        # 20x200 -> (83, 833): min clamp does NOT fire (only one dim < 300)
        out2 = pp.resize(np.full((20, 200), 128, dtype=np.uint8))
        assert out2.shape == (83, 833)
        # 40x50 -> (166, 208): both < 300 -> one proportional scale-up
        out3 = pp.resize(np.full((40, 50), 128, dtype=np.uint8))
        assert out3.shape[0] == pp.RESIZE_MIN_DIM
        assert abs(out3.shape[1] - 375) <= 1

    def test_resize_clamps_max_dim(self):
        img = np.full((60, 1200), 128, dtype=np.uint8)
        out = pp.resize(img)
        assert out.shape[1] == pp.RESIZE_MAX_DIM  # 1200*4.167 = 5000 -> 4000

    def test_resize_skip_window(self):
        # both ratios within [0.95, 1.05]: a 4000x4000 image targets 4000 (clamp)
        img = np.full((4000, 4000), 7, dtype=np.uint8)
        assert pp.resize(img) is img

    def test_resize_preserves_flat_value(self):
        img = np.full((80, 80), 200, dtype=np.uint8)
        out = pp.resize(img)
        assert int(out.min()) == 200 and int(out.max()) == 200

    def test_denoise_removes_salt(self):
        img = np.full((20, 20), 255, dtype=np.uint8)
        img[10, 10] = 0  # single speck
        out = pp.denoise(img)
        assert out[10, 10] == 255

    def test_normalize_stretches(self):
        img = np.array([[100, 150], [125, 150]], dtype=np.uint8)
        out = pp.normalize(img)
        assert out.min() == 0 and out.max() == 255

    def test_normalize_identity_when_uniform(self):
        img = np.full((5, 5), 42, dtype=np.uint8)
        assert pp.normalize(img) is img

    def test_sharpen_kernel_on_flat_is_identity(self):
        img = np.full((10, 10), 90, dtype=np.uint8)
        np.testing.assert_array_equal(pp.sharpen(img), img)

    def test_sharpen_boosts_edges(self):
        img = np.full((10, 10), 200, dtype=np.uint8)
        img[:, 5:] = 50
        out = pp.sharpen(img)
        assert out[0, 4] == 255  # 5*200 - 200*3 - 50 = 350 -> saturates
        assert out[0, 5] == 0  # 5*50 - 50*3 - 200 = -100 -> clamps

    def test_deskew_skip_below_point1_degree(self):
        img = render_text("STRAIGHT LINES OF TEXT\nSECOND LINE HERE", scale=2)
        assert pp.deskew(img) is img  # 0-degree estimate -> skip

    def test_deskew_detects_synthetic_rotation(self):
        img = render_text("HELLO WORLD HELLO WORLD\nSECOND LINE OF WORDS", scale=3)
        rotated = pp._rotate_bilinear(img, 2.0)
        est = pp.estimate_skew_angle(rotated)
        assert est == pytest.approx(-2.0, abs=0.3)

    def test_threshold_sauvola_binary_output(self):
        img = render_text("SAUVOLA", scale=2)
        out = pp.threshold(img)
        assert set(np.unique(out)).issubset({0, 255})
        # ink stays ink on a clean render
        assert (out == 0).sum() > 0

    def test_threshold_formula_window_constants(self):
        assert pp.SAUVOLA_WINDOW == 15
        assert pp.SAUVOLA_K == 0.2
        assert pp.SAUVOLA_R == 128.0


class TestPipeline:
    def test_preset_none_is_identity_zero_steps(self):
        img = np.full((10, 10), 5, dtype=np.uint8)
        out, timings = pp.run_pipeline(img, "none")
        assert out is img
        assert timings == []

    def test_preset_minimal_grayscale_only(self):
        rgb = to_rgb(np.full((8, 8), 100, dtype=np.uint8))
        out, timings = pp.run_pipeline(rgb, "minimal")
        assert out.ndim == 2
        assert [n for n, _ in timings] == ["grayscale"]

    def test_preset_default_order(self):
        img = np.full((80, 80), 128, dtype=np.uint8)
        _, timings = pp.run_pipeline(img, "default")
        assert [n for n, _ in timings] == ["grayscale", "resize", "normalize", "sharpen"]

    def test_preset_aggressive_order(self):
        img = render_text("AGG", scale=1)
        _, timings = pp.run_pipeline(img, "aggressive")
        assert [n for n, _ in timings] == [
            "grayscale", "resize", "denoise", "normalize", "sharpen", "deskew", "threshold",
        ]

    def test_invalid_preset_rejected(self):
        with pytest.raises(ValueError, match="invalid preprocessing preset"):
            pp.parse_preset("extreme")
