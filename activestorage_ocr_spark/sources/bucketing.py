"""Bucketed table layout — the co-located-join half of the north rule's
"salted, url-hash-bucketed" table design (SURVEY.md §2.6 relational row;
the salting half is giant-payload routing in operators/extraction.py and
AQE skew-join, enabled in sources/session.py).

At 100 TB the pages table is joined/aggregated on ``url`` again and again
(resume anti-joins, output reconciliation, recrawl diffs). Writing it
``bucketBy(N, url)`` once means every later equi-join or aggregation on
url reads pre-distributed buckets and skips its Exchange entirely — the
same contract an Iceberg bucket partition transform gives
(`bucket(N, url)`); parquet + the session catalog carry it here since the
sandbox ships no Iceberg jars (SURVEY.md §7.1 M4).

tests/test_sources_pages.py::TestBucketedLayout pins the plan: a
bucketed-to-bucketed join runs with **zero Exchange** operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    n_buckets: int = 64,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by
    ``bucket_col`` — one-time shuffle now, none on every later join."""
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
