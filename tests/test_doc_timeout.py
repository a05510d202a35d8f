"""Per-document time budget (VERDICT r3 item 1) — the batch analog of the
reference's 30 s request timeout (`lib/activestorage/ocr/configuration.rb:58-59`).

A pathological payload must become a quarantine row with the stable TIMEOUT
code (O6), never a raised error (O7) and never a task straggler: the batch
around it completes and every input row is accounted for.
"""

import numpy as np
import pytest

from activestorage_ocr_spark.engine import budget, rasters
from activestorage_ocr_spark.engine.config import (
    DEFAULT_DOC_TIMEOUT_MS,
    ENV_DOC_TIMEOUT,
    EngineConfig,
)
from activestorage_ocr_spark.engine.extract import (
    E_TIMEOUT,
    extract_document,
    pipeline_info,
)


def _slow_image_payload() -> bytes:
    # a ~1 MP raster: decode + any aggressive-preset stage each take well
    # over 1 ms, so a 1 ms budget deterministically trips a cooperative
    # check (step boundary / deskew angle / OCR line band)
    text = "\n".join(" ".join(f"W{i}{j}" for j in range(12)) for i in range(12))
    return rasters.encode_png(rasters.render_text(text, scale=6))


class TestEngineBudget:
    def test_pathological_payload_quarantines_with_timeout_code(self):
        r = extract_document(_slow_image_payload(), preset="aggressive", timeout_ms=1)
        assert r["status"] == E_TIMEOUT
        assert r["error_code"] == E_TIMEOUT
        assert "budget" in r["warnings"][0]
        assert r["extracted_text"] == ""

    def test_no_timeout_when_disabled_or_generous(self):
        payload = rasters.encode_png(rasters.render_text("OK 123", scale=2))
        for to in (None, 0, 60_000):
            r = extract_document(payload, timeout_ms=to)
            assert r["status"] == "ok", (to, r)

    def test_deadline_never_leaks_to_the_next_document(self):
        # a timed-out document must not poison the worker thread for the
        # documents that follow it in the same Arrow batch
        timed_out = extract_document(
            _slow_image_payload(), preset="aggressive", timeout_ms=1
        )
        assert timed_out["status"] == E_TIMEOUT
        ok = extract_document(rasters.encode_png(rasters.render_text("NEXT 9", scale=2)))
        assert ok["status"] == "ok"
        assert budget.active_timeout_ms() is None

    def test_check_is_noop_without_deadline(self):
        budget.check()  # must not raise outside a deadline context

    def test_timeout_rows_never_raise(self):
        # O7: the budget is a quarantine path, not an exception path
        out = extract_document(_slow_image_payload(), preset="aggressive", timeout_ms=1)
        assert isinstance(out, dict)

    def test_pdf_fallback_path_is_guarded(self):
        from activestorage_ocr_spark.engine import pdfx

        pages = [
            (rasters.render_text(f"PAGE {i} OCR TEXT", scale=4), "DeviceGray")
            for i in range(4)
        ]
        pdf = pdfx.build_image_pdf(pages)
        r = extract_document(pdf, preset="aggressive", timeout_ms=1)
        assert r["status"] == E_TIMEOUT


class TestBudgetConfig:
    def test_env_parse_and_default(self):
        assert EngineConfig.from_env({}).doc_timeout_ms == DEFAULT_DOC_TIMEOUT_MS
        assert EngineConfig.from_env({ENV_DOC_TIMEOUT: "5000"}).doc_timeout_ms == 5000
        with pytest.raises(ValueError, match="integer"):
            EngineConfig.from_env({ENV_DOC_TIMEOUT: "fast"})
        with pytest.raises(ValueError, match="non-negative"):
            EngineConfig.from_env({ENV_DOC_TIMEOUT: "-1"})

    def test_pipeline_info_reports_budget(self):
        assert pipeline_info()["doc_timeout_ms"] == DEFAULT_DOC_TIMEOUT_MS


class TestStreamingBudget:
    def test_streaming_straggler_quarantines_and_stream_completes(
        self, spark, tmp_path
    ):
        # a straggling document stalls a whole micro-batch — the budget must
        # quarantine it and let the trigger finish
        from activestorage_ocr_spark.streaming.ingest import (
            read_pages_stream,
            extract_pages_stream,
        )

        landing = str(tmp_path / "landing")
        html = b"<html><body><p>" + b"words here " * 30 + b"</p></body></html>"
        rows = [(f"https://s.example/{i}", None, html, "en") for i in range(4)]
        rows.append(("https://s.example/slow", None, _slow_image_payload(), "en"))
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, lang string"
        ).write.parquet(landing)
        out = extract_pages_stream(
            read_pages_stream(spark, landing),
            preset="aggressive", doc_timeout_ms=1,
        )
        sink = str(tmp_path / "out")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.url: r.status for r in spark.read.parquet(sink).collect()}
        assert got["https://s.example/slow"] == E_TIMEOUT
        assert sum(1 for s in got.values() if s == "ok") == 4


class TestBatchCompletes:
    def test_batch_with_straggler_completes_and_accounts_every_row(self, spark):
        # one pathological image doc among fast HTML docs, kernel armed with
        # a 1 ms budget: the job must finish, the straggler must land in
        # quarantine with TIMEOUT, and fast docs must extract normally (the
        # HTML path completes before any check can fire)
        from activestorage_ocr_spark.operators.extraction import (
            extract_pages,
            split_quarantine,
        )

        html = b"<html><body><p>" + b"real words here " * 40 + b"</p></body></html>"
        rows = [(f"https://ex.com/{i}", None, html, "en") for i in range(8)]
        rows.append(("https://ex.com/slow", None, _slow_image_payload(), "en"))
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, lang string"
        )
        out = extract_pages(
            df, preset="aggressive", doc_timeout_ms=1, skew_handling="off"
        ).cache()
        ok, quarantined = split_quarantine(out)
        q = {r.url: r for r in quarantined.collect()}
        assert ok.count() + quarantined.count() == 9
        assert q["https://ex.com/slow"].status == E_TIMEOUT
        assert q["https://ex.com/slow"].error_code == E_TIMEOUT
        assert ok.count() == 8
        out.unpersist()
