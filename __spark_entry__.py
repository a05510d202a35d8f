"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline over the deterministic
synthetic page corpus at sf0.001 scale. ``queries()`` / ``oracle_sql()`` pairs
live in ``activestorage_ocr_spark.plans.queries`` — one entry per implemented
operator from SURVEY.md §2, each oracle runnable by DuckDB on the
/root/testdata parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: docs at sf0.001 (documents table has 500 rows there; FIXTURES.md §4)
ENTRY_CORPUS_DOCS = 500


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: MIME-routed main-content extraction over the synthetic
    Common-Crawl-style pages table (north rule), sf0.001 scale."""
    from activestorage_ocr_spark.fixtures.gen_corpus import TEST_MAX_BYTES, ensure_corpus
    from activestorage_ocr_spark.operators.extraction import extract_pages

    corpus = ensure_corpus(ENTRY_CORPUS_DOCS)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    return extract_pages(pages, max_bytes=TEST_MAX_BYTES).select(
        "url", "mime", "extracted_text", "confidence", "engine", "status", "warnings"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from activestorage_ocr_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from activestorage_ocr_spark.fixtures.gen_media import media_oracles
    from activestorage_ocr_spark.fixtures.gen_multilingual import multilingual_oracles
    from activestorage_ocr_spark.fixtures.gen_scanned import scanned_oracles
    from activestorage_ocr_spark.fixtures.gen_textlayer import textlayer_oracles
    from activestorage_ocr_spark.fixtures.gen_warc import warc_oracles
    from activestorage_ocr_spark.plans.queries import ORACLES, extraction_oracles

    out = dict(ORACLES)
    # extraction-domain oracles read the single-node golden parquet (built
    # on demand, cached) — DuckDB re-aggregates it independently. They are
    # sized to the driver's correctness scale (sf0.01 -> 2000 docs, the
    # documented comparison contract); a run at another sf must rebuild
    # them via extraction_oracles(n_docs=...) as tests/test_oracle_parity.py
    # does for sf0.001.
    out.update(extraction_oracles())
    # multimodal golden-parquet oracles (same pattern, same n_docs contract)
    out.update(media_oracles())
    # WARC-ingestion golden-parquet oracle (same pattern)
    out.update(warc_oracles())
    out.update(scanned_oracles())
    out.update(textlayer_oracles())
    out.update(multilingual_oracles())
    return out
