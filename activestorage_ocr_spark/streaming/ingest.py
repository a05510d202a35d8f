"""Continuous extraction over a landing directory of page parquet files.

The reference is strictly request/response batch-of-one and the north rule is
batch (SURVEY.md §2.6 streaming row), so the batch pipeline is primary. This
module is the incremental-ingest surface a production crawl feed needs: new
parquet files dropped into a landing dir are picked up by the file source,
run through the SAME extraction kernel, and appended to the output sink with
exactly-once file-source checkpointing — Structured Streaming's checkpoint
dir replaces the batch pipeline's part-key manifest.

Watermarking: the hourly metrics stream tolerates late page arrivals up to
``late_threshold`` on ``warc_ts`` (tumbling windows, append mode).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.extraction import EXTRACTED_SCHEMA, make_extract_kernel

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def extract_pages_stream(
    pages: DataFrame,
    *,
    engine: str = "pixelocr",
    preset: str = "minimal",
    max_bytes: int = 52_428_800,
) -> DataFrame:
    """Streaming variant of the extraction pipeline: same kernel, map-only
    (no repartition — a streaming micro-batch is one file group; the
    in-kernel byte-budget slicing still guards memory)."""
    from ..operators.extraction import ensure_workers_can_import

    ensure_workers_can_import(pages.sparkSession)
    proj = pages.select("url", "warc_ts", "html", "lang")
    kernel = make_extract_kernel(engine, preset, max_bytes)
    return proj.mapInArrow(kernel, EXTRACTED_SCHEMA)


def start_extraction_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> StreamingQuery:
    """File-source -> extraction -> parquet sink with checkpointing.
    Exactly-once per input file via the streaming commit log."""
    out = extract_pages_stream(read_pages_stream(spark, landing_dir), **kwargs)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def dedup_pages_stream(pages: DataFrame, late_threshold: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup on url: recrawls of a url arriving within the
    watermark horizon are dropped; state is *evicted* once the watermark
    passes, so memory stays bounded on an unbounded crawl feed (plain
    ``dropDuplicates(["url"])`` under a watermark never evicts when the
    event-time column isn't a key — the streaming twin of the batch
    ``dropDuplicates`` in SURVEY.md §2.6)."""
    return pages.withWatermark("warc_ts", late_threshold).dropDuplicatesWithinWatermark(["url"])


def hourly_metrics_stream(
    extracted: DataFrame, late_threshold: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window rollup over the extraction stream:
    per (hour, mime, status) doc counts and byte/char sums; rows finalize
    once the watermark passes (late pages within ``late_threshold`` are
    still counted)."""
    return (
        extracted.withWatermark("warc_ts", late_threshold)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "mime", "status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("bytes_in"),
            F.sum("chars_out").alias("chars_out"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "mime",
            "status",
            "n_docs",
            "bytes_in",
            "chars_out",
        )
    )


def start_hourly_metrics_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    late_threshold: str = "1 hour",
    **kwargs,
) -> StreamingQuery:
    extracted = extract_pages_stream(read_pages_stream(spark, landing_dir), **kwargs)
    metrics = hourly_metrics_stream(extracted, late_threshold)
    return (
        metrics.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
