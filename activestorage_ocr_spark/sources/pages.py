"""Pages-table reader/writer facade (SURVEY.md §2.1 S1/S4).

At production scale the input is a salted, url-hash-bucketed **Iceberg** table
(north rule); this sandbox ships no Iceberg jars, so the facade tries the
Iceberg source first and falls back to parquet with identical semantics
(SURVEY.md §7.1 M4: "parquet + manifest fallback — same commit semantics").
Readers push column pruning and partition predicates down either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def _looks_like_table_ident(source: str) -> bool:
    import os

    if "/" in source or "\\" in source or source.startswith("file:"):
        return False
    # a bare relative file/dir name is a path, not a catalog identifier
    if source.endswith((".parquet", ".orc")) or os.path.exists(source):
        return False
    return True


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read a pages table from an Iceberg table identifier or a parquet path."""
    if _looks_like_table_ident(source):
        try:
            return spark.read.format("iceberg").load(source)
        except Exception:
            return spark.table(source)
    try:
        return spark.read.format("iceberg").load(source)
    except Exception:
        return spark.read.parquet(source)


def read_pages_tuned(spark: SparkSession, source: str, *, tasks_per_core: int = 3) -> DataFrame:
    """Scan tuned for the CPU-bound extraction stage.

    Parquet-optimal split sizing (128 MB) assumes scan-bound work; the
    extraction kernel spends ~ms of CPU per KB of payload, so a 128 MB task
    is minutes of single-core decode — stragglers and idle cores at any
    cluster size whose core count exceeds input_bytes/128MB. Here we raise
    ``spark.sql.files.minPartitionNum`` to ~``tasks_per_core`` tasks per
    core so the map stage fills the cluster regardless of how few files the
    upstream writer produced.

    Session-conf scope note: split planning reads the conf at ACTION time
    (the scan is lazy), so the setting cannot be save/restored around this
    call. minPartitionNum is chosen precisely because leaking it is benign:
    it is proportional (split counts scale with each input's size, floored
    at row-group granularity), unlike an absolute maxPartitionBytes floor
    which would shred every later scan in the session into fixed tiny
    splits."""
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.files.minPartitionNum", str(cores * tasks_per_core))
    return read_pages(spark, source)


def read_pages_pruned(
    spark: SparkSession,
    source: str,
    *,
    since=None,
    until=None,
    langs: list[str] | None = None,
) -> DataFrame:
    """Scan with pushable predicates: `warc_ts` range and `lang` membership
    push into the parquet/Iceberg scan (P3's size predicate cannot — payload
    length is not a column statistic — so the size gate stays in the kernel
    per the reference's order of checks)."""
    df = read_pages(spark, source)
    if since is not None:
        df = df.filter(F.col("warc_ts") >= F.lit(since))
    if until is not None:
        df = df.filter(F.col("warc_ts") < F.lit(until))
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    return df


def write_extracted(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write the typed extraction output. Iceberg `writeTo(...).append()` when
    the catalog resolves the identifier; parquet path otherwise."""
    if _looks_like_table_ident(target):
        try:
            df.writeTo(target).append()
            return
        except Exception:
            pass
    df.write.mode(mode).parquet(target)
