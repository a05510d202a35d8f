"""Env-var config + validation tests (the configuration.rb /
configuration_test.rb analog plus main.rs clap-env args)."""

import pytest

from activestorage_ocr_spark.engine import config as cfg


class TestDefaults:
    def test_defaults(self):
        c = cfg.EngineConfig.from_env(env={})
        assert c.engine == "pixelocr"
        assert c.preset == "minimal"
        assert c.max_bytes == 52_428_800
        assert c.default_language == "eng"

    def test_env_overrides(self):
        c = cfg.EngineConfig.from_env(env={
            cfg.ENV_ENGINE: "pixelocr-alt",
            cfg.ENV_PRESET: "aggressive",
            cfg.ENV_MAX_BYTES: "1048576",
            cfg.ENV_LANGUAGE: "deu",
        })
        assert c.engine == "pixelocr-alt"
        assert c.preset == "aggressive"
        assert c.max_bytes == 1_048_576
        assert c.default_language == "deu"


class TestValidation:
    def test_unknown_engine_raises(self):
        with pytest.raises(ValueError, match="unknown engine"):
            cfg.EngineConfig.from_env(env={cfg.ENV_ENGINE: "tesseract"})

    def test_unknown_preset_raises(self):
        with pytest.raises(ValueError, match="preset"):
            cfg.EngineConfig.from_env(env={cfg.ENV_PRESET: "turbo"})

    def test_non_integer_size_raises(self):
        with pytest.raises(ValueError, match="integer"):
            cfg.EngineConfig.from_env(env={cfg.ENV_MAX_BYTES: "50MB"})

    def test_negative_size_raises(self):
        with pytest.raises(ValueError, match="positive"):
            cfg.EngineConfig.from_env(env={cfg.ENV_MAX_BYTES: "-1"})

    def test_unknown_language_raises(self):
        with pytest.raises(ValueError, match="language"):
            cfg.EngineConfig.from_env(env={cfg.ENV_LANGUAGE: "klingon"})

    def test_direct_construction_validates(self):
        with pytest.raises(ValueError):
            cfg.EngineConfig(engine="nope").validate()


class TestPipelineResolution:
    def test_extract_pages_env_engine(self, spark, corpus_dir_200, monkeypatch):
        from activestorage_ocr_spark.operators.extraction import extract_pages

        monkeypatch.setenv(cfg.ENV_ENGINE, "pixelocr-alt")
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet").limit(4)
        out = extract_pages(pages, max_bytes=262_144)
        assert {r.engine for r in out.select("engine").collect()} == {"pixelocr-alt"}

    def test_explicit_args_beat_env(self, spark, corpus_dir_200, monkeypatch):
        from activestorage_ocr_spark.operators.extraction import extract_pages

        monkeypatch.setenv(cfg.ENV_ENGINE, "pixelocr-alt")
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet").limit(4)
        out = extract_pages(pages, engine="pixelocr", max_bytes=262_144)
        assert {r.engine for r in out.select("engine").collect()} == {"pixelocr"}


class TestForcedLanguages:
    def test_job_level_languages_override(self, spark):
        from activestorage_ocr_spark.engine import rasters
        from activestorage_ocr_spark.operators.extraction import extract_pages

        png = rasters.encode_png(rasters.render_text("ÜBER 9", scale=2))
        # row annotation says eng; the forced request turns on the deu pack
        df = spark.createDataFrame(
            [("u1", None, png, "eng")],
            "url string, warc_ts timestamp, html binary, lang string",
        )
        forced = extract_pages(df, engine="pixelocr-alt", max_bytes=262_144,
                               languages="eng+deu").collect()[0]
        assert forced.extracted_text == "ÜBER 9"
        plain = extract_pages(df, engine="pixelocr-alt", max_bytes=262_144).collect()[0]
        assert plain.extracted_text == "UBER 9"

    def test_bad_forced_languages_fails_fast_on_driver(self, spark):
        import pytest as _pytest
        from activestorage_ocr_spark.operators.extraction import extract_pages

        df = spark.createDataFrame(
            [("u1", None, b"<p>x</p>", "eng")],
            "url string, warc_ts timestamp, html binary, lang string",
        )
        with _pytest.raises(ValueError, match="unsupported language"):
            extract_pages(df, engine="pixelocr-alt", languages="klingon")
