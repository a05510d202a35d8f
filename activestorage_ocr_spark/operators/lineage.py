"""Per-partition lineage manifests + resumable checkpoint commits (north rule:
"resumable from checkpoint with per-partition lineage + metrics";
SURVEY.md §4.2 "Resumability" and §2.6 semi/anti row).

Design (parquet + manifest; the same commit semantics an Iceberg catalog
would give via snapshots — the sandbox ships no Iceberg jars, SURVEY.md §7.1
M4):

* every url is deterministically assigned a ``part_key`` =
  pmod(xxhash64(url), n_parts) — stable across runs and cluster sizes;
* a run processes only part_keys absent from the manifest (left-anti join —
  the resume primitive), writes output/quarantine parquet partitioned by
  part_key with **dynamic partition overwrite** (idempotent per part: a crash
  between data and manifest commits reprocesses and overwrites, never
  duplicates);
* after the data commit, one manifest row per completed part_key records the
  lineage metrics (rows in/ok/quarantined, bytes in, chars out, wall ms) —
  the structured-log analog of the reference's per-request line
  (`rust/src/server.rs:270-277`).

Exactly-once contract: after any crash/resume sequence, output contains every
input url exactly once (tests/test_resume.py kills between commits to prove
it).
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .extraction import extract_pages, split_quarantine

MANIFEST_SCHEMA = (
    "run_id string, part_key int, n_rows long, n_ok long, n_quarantined long, "
    "bytes_in long, chars_out long, wall_ms long, committed_at timestamp"
)


def with_part_key(df: DataFrame, n_parts: int) -> DataFrame:
    """Stable url-hash partition assignment (north rule: url-hash-bucketed)."""
    return df.withColumn("part_key", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int"))


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    p = manifest_path(out_dir)
    if os.path.exists(p):
        return spark.read.parquet(p)
    return spark.createDataFrame([], MANIFEST_SCHEMA)


def completed_parts(spark: SparkSession, out_dir: str) -> DataFrame:
    return read_manifest(spark, out_dir).select("part_key").distinct()


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    run_id: str,
    n_parts: int = 64,
    engine: str | None = None,
    preset: str | None = None,
    max_bytes: int | None = None,
    only_parts: list[int] | None = None,
    repartition: int | None = None,
) -> dict:
    """One (possibly partial) extraction run with checkpoint/resume semantics.

    ``only_parts`` restricts this run to a subset of pending part_keys —
    used by tests to simulate a crash after a partial commit, and by
    operators to drain a backlog incrementally.

    Returns a summary dict {run_id, parts_done, parts_skipped, n_rows}.
    """
    t0 = time.perf_counter()
    keyed = with_part_key(pages, n_parts)
    done = completed_parts(spark, out_dir)
    pending = keyed.join(F.broadcast(done), "part_key", "left_anti")
    if only_parts is not None:
        pending = pending.filter(F.col("part_key").isin([int(p) for p in only_parts]))

    n_done_before = done.count()
    extracted = extract_pages(
        pending,
        engine=engine,
        preset=preset,
        max_bytes=max_bytes,
        repartition=repartition,
    )
    out = with_part_key(extracted, n_parts).cache()
    try:
        n_rows = out.count()
        if n_rows == 0:
            return {
                "run_id": run_id,
                "parts_done": 0,
                "parts_skipped": n_done_before,
                "n_rows": 0,
            }

        # C7 (`lib/activestorage/ocr/result.rb:103`): stamp the persisted rows
        # once per run (excluded from byte-identity like all timing fields)
        stamped = out.withColumn("processed_at", F.current_timestamp()).withColumn(
            "run_id", F.lit(run_id)
        )
        ok, quarantined = split_quarantine(stamped)
        writer_conf = {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
        # conf.get(k, None) is None when the conf was never explicitly set;
        # restoring must then UNSET it, not leave 'dynamic' leaking into the
        # caller's session (it changes overwrite semantics globally)
        old = {k: spark.conf.get(k, None) for k in writer_conf}
        for k, v in writer_conf.items():
            spark.conf.set(k, v)
        try:
            # idempotent per-part data commits (overwrite only touched parts)
            ok.write.mode("overwrite").partitionBy("part_key").parquet(
                os.path.join(out_dir, "extracted")
            )
            quarantined.write.mode("overwrite").partitionBy("part_key").parquet(
                os.path.join(out_dir, "quarantine")
            )
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)

        # manifest commit happens only after the data commit succeeded
        is_ok = F.col("status").isin("ok", "empty")
        wall_ms = int((time.perf_counter() - t0) * 1000)
        manifest = (
            out.groupBy("part_key")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(is_ok.cast("long")).alias("n_ok"),
                F.sum((~is_ok).cast("long")).alias("n_quarantined"),
                F.sum("n_bytes").alias("bytes_in"),
                F.sum("chars_out").alias("chars_out"),
            )
            .select(
                F.lit(run_id).alias("run_id"),
                "part_key",
                "n_rows",
                "n_ok",
                "n_quarantined",
                "bytes_in",
                "chars_out",
                F.lit(wall_ms).alias("wall_ms").cast("long"),
                F.current_timestamp().alias("committed_at"),
            )
        )
        parts_done = manifest.count()
        manifest.write.mode("append").parquet(manifest_path(out_dir))
        return {
            "run_id": run_id,
            "parts_done": int(parts_done),
            "parts_skipped": int(n_done_before),
            "n_rows": int(n_rows),
        }
    finally:
        out.unpersist()


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "extracted"))


def read_quarantine(spark: SparkSession, out_dir: str) -> DataFrame:
    p = os.path.join(out_dir, "quarantine")
    if os.path.exists(p):
        try:
            return spark.read.parquet(p)
        except Exception:
            # A run with zero quarantined rows leaves a partitionBy dir with
            # no parquet footers; schema inference fails. Treat as empty.
            pass
    from .extraction import EXTRACTED_SCHEMA

    return spark.createDataFrame(
        [], EXTRACTED_SCHEMA + ", processed_at timestamp, run_id string, part_key int"
    )
