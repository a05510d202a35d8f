"""End-to-end byte-identity test: Spark pipeline output == single-node oracle
goldens, per url, bytewise (the north-rule invariant; BASELINE.json:6)."""

import pyspark.sql.functions as F
import pytest

from activestorage_ocr_spark.operators.extraction import (
    extract_pages,
    split_quarantine,
)


@pytest.fixture(scope="module")
def extracted(spark, corpus_dir_200):
    pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
    out = extract_pages(pages, max_bytes=262_144, repartition=8).cache()
    yield out
    out.unpersist()


class TestByteIdentity:
    def test_every_url_exactly_once(self, extracted, spark, corpus_dir_200):
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        assert extracted.count() == pages.count() == 200
        assert extracted.select("url").distinct().count() == 200

    def test_byte_identical_text_per_url(self, extracted, spark, corpus_dir_200):
        golden = spark.read.parquet(f"{corpus_dir_200}/goldens.parquet")
        joined = (
            extracted.alias("e")
            .join(F.broadcast(golden.alias("g")), "url", "inner")
            .select(
                "url",
                F.col("e.extracted_text").alias("got"),
                F.col("g.extracted_text").alias("want"),
            )
        )
        assert joined.count() == 200
        mismatches = joined.filter(
            ~(F.col("got").eqNullSafe(F.col("want")))
        ).collect()
        assert mismatches == [], f"text mismatch for urls: {[r.url for r in mismatches][:5]}"

    def test_full_row_identity_excluding_timings(self, extracted, spark, corpus_dir_200):
        golden = spark.read.parquet(f"{corpus_dir_200}/goldens.parquet")
        cols = ["mime", "extracted_text", "confidence", "engine", "status", "error_code", "warnings", "spans"]
        e = extracted.select("url", *cols)
        g = golden.select("url", *cols)
        # exceptAll both ways == empty -> exact multiset identity
        assert e.exceptAll(g).count() == 0
        assert g.exceptAll(e).count() == 0

    def test_quarantine_split_accounts_for_all_rows(self, extracted):
        ok, quarantined = split_quarantine(extracted)
        assert ok.count() + quarantined.count() == 200
        bad = {r.status for r in quarantined.select("status").distinct().collect()}
        assert bad <= {"PROCESSING_ERROR", "IMAGE_TOO_LARGE", "UNSUPPORTED_FORMAT", "INVALID_REQUEST"}
        assert quarantined.filter(F.col("error_code").isNull()).count() == 0

    def test_statuses_cover_error_corpus(self, extracted):
        statuses = {r.status for r in extracted.select("status").distinct().collect()}
        assert {"ok", "empty", "PROCESSING_ERROR", "IMAGE_TOO_LARGE", "UNSUPPORTED_FORMAT", "INVALID_REQUEST"} <= statuses

    def test_all_mimes_routed(self, extracted):
        mimes = {r.mime for r in extracted.select("mime").distinct().collect()}
        assert {"text/html", "application/pdf", "image/png", "image/jpeg", "image/gif",
                "image/bmp", "image/webp", "image/tiff"} <= mimes

    def test_lineage_columns_present(self, extracted):
        row = extracted.filter(F.col("status") == "ok").select("partition_id", "n_bytes", "chars_out").first()
        assert row.partition_id >= 0
        assert row.n_bytes > 0
        assert row.chars_out > 0

    def test_determinism_two_runs(self, spark, corpus_dir_200):
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        a = extract_pages(pages, max_bytes=262_144, repartition=4)
        b = extract_pages(pages, max_bytes=262_144, repartition=8)  # different layout
        cols = ["url", "extracted_text", "confidence", "status"]
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0


class TestPresetColumn:
    def test_per_row_preset_override(self, spark, corpus_dir_200):
        """P5: an input `preset` column overrides the job default per row
        (the reference's per-request ?preprocess= parameter)."""
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        imgs = pages.filter(F.length("html") > 0).limit(50)
        with_preset = imgs.withColumn(
            "preset", F.when(F.xxhash64("url") % 2 == 0, F.lit("none")).otherwise(F.lit("minimal"))
        )
        out = extract_pages(with_preset, max_bytes=262_144)
        got = {r.url: r.preset for r in out.select("url", "preset").collect()}
        want = {r.url: r.preset for r in with_preset.select("url", "preset").collect()}
        # routes that run the preprocessing pipeline echo the row's preset
        assert got == {u: want[u] for u in got}

    def test_invalid_per_row_preset_quarantined(self, spark, corpus_dir_200):
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet").limit(5)
        bad = pages.withColumn("preset", F.lit("turbo"))
        out = extract_pages(bad, max_bytes=262_144)
        assert {r.status for r in out.select("status").collect()} == {"INVALID_REQUEST"}


class TestPlanShape:
    def test_scan_prunes_to_needed_columns(self, spark, corpus_dir_200):
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
        # the parquet scan must not read the unused `text` column
        assert "ReadSchema" in plan
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan
        read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert read_cols == {"url", "warc_ts", "html", "lang"}

    def test_exactly_one_shuffle(self, spark, corpus_dir_200):
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1

    def test_no_shuffle_when_skew_handling_off(self, spark, corpus_dir_200):
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        plan = extract_pages(pages, skew_handling=False)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_giants_mode_scans_input_once(self, spark, corpus_dir_200):
        # VERDICT r1 "what's wrong #3": the old fork-by-filter giants mode
        # read the pages relation twice. The pass-through chain must show
        # exactly ONE scan and ONE exchange.
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1, plan
        assert plan.count("Exchange") == 1, plan

    def test_giants_mode_matches_off_mode_byte_identical(self, spark, corpus_dir_200):
        # force deferral with a tiny giant threshold: every giant must be
        # finished by pass 2 with output identical to the map-only plan
        pages = spark.read.parquet(f"{corpus_dir_200}/pages.parquet")
        cols = ["url", "extracted_text", "status", "error_code", "confidence",
                "mime", "warnings", "spans"]
        off = extract_pages(pages, max_bytes=262_144, skew_handling="off")
        gi = extract_pages(pages, max_bytes=262_144, skew_handling="giants",
                           giant_bytes=2048)
        a = [tuple(r) for r in off.select(*cols).orderBy("url").collect()]
        b = [tuple(r) for r in gi.select(*cols).orderBy("url").collect()]
        assert a == b
        assert not any(r.status == "deferred" for r in gi.select("status").collect())


class TestSkewRouting:
    def test_giants_clumped_in_one_input_partition_get_spread(self, spark):
        """The point of giants mode: a pathological layout that lands every
        giant payload in ONE scan partition must still process giants across
        MANY tasks after the redistribution exchange (partition_id records
        where the extraction actually ran)."""
        big = (b"<html><body><main><p>"
               + b"A giant page body word " * 400
               + b"</p></main></body></html>")
        small = b"<html><body><main><p>Small page body of honest words.</p></main></body></html>"
        rows = [(f"https://g{i}.example/x", None, big, "eng") for i in range(64)]
        rows += [(f"https://s{i}.example/x", None, small, "eng") for i in range(64)]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, lang string"
        ).coalesce(1)  # adversarial: everything in one input partition

        gi = extract_pages(df, max_bytes=262_144, skew_handling="giants",
                           giant_bytes=len(small) + 1, repartition=16)
        got = gi.select("url", "partition_id", "status").collect()
        assert all(r.status == "ok" for r in got)
        giant_pids = {r.partition_id for r in got if r.url.startswith("https://g")}
        small_pids = {r.partition_id for r in got if r.url.startswith("https://s")}
        # giants were deferred through the exchange and ran on many tasks
        assert len(giant_pids) > 4
        # in off mode the same layout runs everything on the one scan task
        off = extract_pages(df, max_bytes=262_144, skew_handling="off")
        off_pids = {r.partition_id for r in off.select("partition_id").collect()}
        assert len(off_pids) == 1
        assert len(small_pids) >= 1
