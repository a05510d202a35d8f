"""Unicode byte-identity through the full Spark path: multibyte content
(CJK, emoji, combining marks, NUL-adjacent bytes) must survive Arrow
transfer, extraction, and span offsets exactly (SURVEY.md §7.3 byte-identity
across Arrow boundaries)."""

import pyspark.sql.functions as F
import pytest

from activestorage_ocr_spark.engine.extract import extract_document
from activestorage_ocr_spark.operators.extraction import extract_pages

PAGES = [
    (
        "u1",
        "<html><head><meta charset=\"utf-8\"></head><body>"
        "<p>日本語の本文がここにあります。これは充分に長い段落です、確実に。</p>"
        "<p>Mixed ascii with 中文 and emoji 🎉🚀 plus çombining mârks here.</p>"
        "</body></html>",
    ),
    (
        "u2",
        "<html><body><p>Ω≈ç√∫˜µ≤ ≥÷ plus enough plain words to pass the keep rule.</p></body></html>",
    ),
    (
        "u3",
        "<html><body><p>Права и свободы человека принадлежат каждому от рождения всегда.</p></body></html>",
    ),
]


@pytest.fixture(scope="module")
def unicode_df(spark):
    import datetime as dt

    rows = [
        (u, dt.datetime(2025, 1, 1), body.encode("utf-8"), None, "und")
        for u, body in PAGES
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


class TestUnicode:
    def test_spark_matches_oracle_bytewise(self, spark, unicode_df):
        out = {r.url: r for r in extract_pages(unicode_df).collect()}
        for url, body in PAGES:
            want = extract_document(body.encode("utf-8"))
            got = out[url]
            assert got.extracted_text == want["extracted_text"]
            assert got.confidence == want["confidence"]
            assert [(s.start, s.end, s.kind) for s in got.spans] == want["spans"]

    def test_spans_are_codepoint_offsets(self, spark, unicode_df):
        out = {r.url: r for r in extract_pages(unicode_df).collect()}
        r = out["u1"]
        for s in r.spans:
            seg = r.extracted_text[s.start : s.end]
            assert seg == seg.strip() and len(seg) > 0
        assert "日本語の本文" in r.extracted_text
        assert "🎉🚀" in r.extracted_text

    def test_invalid_utf8_replaced_not_crashed(self):
        body = b"<html><body><p>broken \xff\xfe bytes inside a long enough paragraph here.</p></body></html>"
        r = extract_document(body)
        assert r["status"] == "ok"
        assert "�" in r["extracted_text"]
