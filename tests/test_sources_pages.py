"""Reader/writer facade tests (S1/S4): parquet fallback path + pushdown."""

import datetime as dt

import pyspark.sql.functions as F

from activestorage_ocr_spark.sources import pages as src


class TestPagesFacade:
    def test_read_pages_parquet_fallback(self, spark, corpus_dir_200):
        df = src.read_pages(spark, f"{corpus_dir_200}/pages.parquet")
        assert df.count() == 200
        assert set(src.PAGES_COLUMNS) <= set(df.columns)

    def test_pruned_reader_pushes_filters(self, spark, corpus_dir_200):
        df = src.read_pages_pruned(
            spark,
            f"{corpus_dir_200}/pages.parquet",
            since=dt.datetime(2025, 1, 1),
            langs=["eng"],
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(warc_ts), IsNotNull(lang)" in plan
        assert df.count() > 0
        assert df.filter(F.col("lang") != "eng").count() == 0

    def test_write_extracted_parquet(self, spark, corpus_dir_200, tmp_path):
        df = src.read_pages(spark, f"{corpus_dir_200}/pages.parquet").select("url", "lang")
        target = str(tmp_path / "sink")
        src.write_extracted(df, target)
        assert spark.read.parquet(target).count() == 200
