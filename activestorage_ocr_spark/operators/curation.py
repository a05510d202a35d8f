"""Durable, resumable curation job — the training-data stage downstream of
extraction, composed from the operator library and committed with the same
per-partition lineage + checkpoint semantics as `operators/lineage.py`
(north rule: "resumable from checkpoint with per-partition lineage +
metrics" — applied to the curation pass a real 100 TB pipeline runs after
extraction).

Pipeline (one job):

1. **Gates** — map-side column expressions, no shuffle: token count
   (`textstats.token_count`), quality score (`textstats.quality_score`),
   language id (`textstats.langid_label`).
2. **Exact dedup** — global keeper = ``min(id) over (partition by fp)``
   with fp = md5 of normalized text: ONE shuffle on the fingerprint key,
   single scan (the single-scan window form the round-3 verdict asked for).
3. **Durable commit** — rows land in ``data/outcome={curated,rejected}/
   part_key=K/`` via dynamic partition overwrite, one writer task per
   partition dir; a manifest row per part records kept/rejected counts.
   Reruns skip manifested parts (left-anti on the manifest — the resume
   primitive); a crash between data and manifest commits reprocesses and
   overwrites, never duplicates.

Resume-correctness of the GLOBAL dedup: the keeper decision is a function
of the whole (static) input — ``min(id)`` per fingerprint — so it is
deterministic across any crash/resume split of parts. Each resume
recomputes the keeper pass over the full input (one scan + one shuffle)
and writes only pending parts; a duplicate pair spanning a committed part
and a pending part therefore resolves identically in both runs. The
alternative (a persistent fingerprint index, e.g. an Iceberg table keyed
by fp) trades that rescan for index maintenance — noted, not needed at
this stage's cost profile (the keeper pass carries (id, fp) pairs only).

Manifest columns reuse `lineage.MANIFEST_SCHEMA`: ``n_ok`` = curated rows,
``n_quarantined`` = rejected rows, ``chars_out`` = curated text chars.
"""

from __future__ import annotations

import datetime
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from . import textstats as ts
from .lineage import MANIFEST_SCHEMA, completed_parts, manifest_path

#: gate thresholds (doc-frequency calibrated on the synthetic corpus; a
#: production run tunes these per source)
MIN_TOKENS = 5
MIN_QUALITY = 0.3
KEEP_LANGS: tuple[str, ...] = ()  # empty = keep all languages

REJECT_SHORT = "too_short"
REJECT_QUALITY = "low_quality"
REJECT_LANG = "lang_filtered"
REJECT_DUP = "duplicate"


def curation_flags(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
    keep_langs: tuple[str, ...] = KEEP_LANGS,
) -> DataFrame:
    """Annotate rows with gate metrics, the dedup keeper flag, and the
    first-failing ``reject_reason`` (null = curated).  Single scan, one
    shuffle (the fingerprint window)."""
    text = F.col(text_col)
    out = df.withColumn("n_tokens", ts.token_count(text))
    out = out.withColumn("quality", ts.quality_score(text))
    out = out.withColumn("lang_id", ts.langid_label(text))
    out = out.withColumn("fp", F.md5(F.trim(F.lower(text)).cast("binary")))
    keeper = F.min(id_col).over(Window.partitionBy("fp"))
    out = out.withColumn("is_keeper", F.col(id_col) == keeper)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit(REJECT_SHORT))
        .when(F.col("quality") < min_quality, F.lit(REJECT_QUALITY))
    )
    if keep_langs:
        reason = reason.when(
            ~F.col("lang_id").isin(*keep_langs), F.lit(REJECT_LANG)
        )
    reason = reason.when(~F.col("is_keeper"), F.lit(REJECT_DUP))
    return out.withColumn("reject_reason", reason)


def run_curation_job(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    run_id: str,
    n_parts: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
    keep_langs: tuple[str, ...] = KEEP_LANGS,
    only_parts: list[int] | None = None,
) -> dict:
    """One (possibly partial) curation run with checkpoint/resume semantics.

    Returns {run_id, parts_done, parts_skipped, n_rows, n_curated}.
    """
    t0 = time.perf_counter()
    keyed = docs.withColumn(
        "part_key", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts)).cast("int")
    )
    done = completed_parts(spark, out_dir)
    done_set = {r.part_key for r in done.collect()}  # bounded by n_parts
    n_done_before = len(done_set)
    pending_parts = sorted(set(range(n_parts)) - done_set)
    if only_parts is not None:
        pending_parts = sorted(set(pending_parts) & {int(p) for p in only_parts})
    if not pending_parts:
        return {
            "run_id": run_id, "parts_done": 0,
            "parts_skipped": n_done_before, "n_rows": 0, "n_curated": 0,
        }

    # Gates + GLOBAL dedup over the full input (resume-deterministic — see
    # module docstring), then restrict the WRITE to pending parts.
    flagged = curation_flags(
        keyed, id_col=id_col, text_col=text_col,
        min_tokens=min_tokens, min_quality=min_quality, keep_langs=keep_langs,
    )
    pending = flagged.filter(F.col("part_key").isin(pending_parts))
    if not pending.select("part_key").limit(1).take(1):
        return {
            "run_id": run_id, "parts_done": 0,
            "parts_skipped": n_done_before, "n_rows": 0, "n_curated": 0,
        }
    stamped = (
        pending.withColumn("processed_at", F.current_timestamp())
        .withColumn("run_id", F.lit(run_id))
        .withColumn(
            "outcome",
            F.when(F.col("reject_reason").isNull(), F.lit("curated")).otherwise(
                F.lit("rejected")
            ),
        )
    )
    writer_conf = {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    old = {k: spark.conf.get(k, None) for k in writer_conf}
    for k, v in writer_conf.items():
        spark.conf.set(k, v)
    try:
        clustered = stamped.repartition(n_parts, F.col("part_key"))
        clustered.write.mode("overwrite").partitionBy("outcome", "part_key").parquet(
            os.path.join(out_dir, "data")
        )
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    committed = (
        spark.read.parquet(os.path.join(out_dir, "data"))
        .filter(F.col("part_key").isin(pending_parts))
        .filter(F.col("run_id") == run_id)
    )
    kept = F.col("reject_reason").isNull()
    rows = (
        committed.groupBy("part_key")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(kept.cast("long")).alias("n_ok"),
            F.sum((~kept).cast("long")).alias("n_quarantined"),
            # octet_length, not length: MANIFEST_SCHEMA's bytes_in means
            # BYTES (the extraction manifest counts payload bytes) — length
            # on a string counts characters and diverges on non-ASCII text
            F.sum(F.octet_length(text_col)).alias("bytes_in"),
            F.sum(F.when(kept, F.length(text_col)).otherwise(0)).alias("chars_out"),
        )
        .collect()
    )
    wall_ms = int((time.perf_counter() - t0) * 1000)
    committed_at = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    manifest = spark.createDataFrame(
        [
            (
                run_id, r.part_key, r.n_rows, r.n_ok, r.n_quarantined,
                r.bytes_in, r.chars_out, wall_ms, committed_at,
            )
            for r in rows
        ],
        MANIFEST_SCHEMA,
    )
    manifest.write.mode("append").parquet(manifest_path(out_dir))
    return {
        "run_id": run_id,
        "parts_done": len(rows),
        "parts_skipped": int(n_done_before),
        "n_rows": int(sum(r.n_rows for r in rows)),
        "n_curated": int(sum(r.n_ok for r in rows)),
    }


def read_curated(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data", "outcome=curated"))


def read_rejected(spark: SparkSession, out_dir: str) -> DataFrame:
    p = os.path.join(out_dir, "data", "outcome=rejected")
    if os.path.exists(p):
        try:
            return spark.read.parquet(p)
        except Exception:
            pass
    return read_curated(spark, out_dir).limit(0)
