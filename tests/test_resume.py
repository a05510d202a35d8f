"""Checkpoint/resume tests: kill-after-partial-commit -> resume -> output
equals a single-run golden, exactly once per url (SURVEY.md §5.2)."""

import pyspark.sql.functions as F
import pytest

from activestorage_ocr_spark.operators import lineage as ln

N_PARTS = 8
MAX_BYTES = 262_144


@pytest.fixture()
def pages(spark, corpus_dir_200):
    return spark.read.parquet(f"{corpus_dir_200}/pages.parquet")


class TestResume:
    def test_partial_then_resume_exactly_once(self, spark, pages, corpus_dir_200, tmp_path):
        out = str(tmp_path / "out")
        # "crash" after committing only parts {0, 1, 2}
        r1 = ln.run_extraction_job(
            spark, pages, out, run_id="run-1", n_parts=N_PARTS,
            max_bytes=MAX_BYTES, only_parts=[0, 1, 2],
        )
        assert r1["parts_done"] == 3
        m1 = ln.read_manifest(spark, out)
        assert {r.part_key for r in m1.collect()} == {0, 1, 2}

        # resume: full run picks up only the pending parts
        r2 = ln.run_extraction_job(
            spark, pages, out, run_id="run-2", n_parts=N_PARTS, max_bytes=MAX_BYTES,
        )
        assert r2["parts_skipped"] == 3
        assert r2["parts_done"] == N_PARTS - 3

        # exactly-once: every url exactly once across extracted+quarantine
        got = ln.read_output(spark, out).select("url").union(
            ln.read_quarantine(spark, out).select("url")
        )
        assert got.count() == 200
        assert got.distinct().count() == 200

        # byte-identity against the single-node goldens still holds
        golden = spark.read.parquet(f"{corpus_dir_200}/goldens.parquet")
        joined = (
            ln.read_output(spark, out)
            .join(golden.select("url", F.col("extracted_text").alias("want")), "url")
        )
        assert joined.filter(~F.col("extracted_text").eqNullSafe(F.col("want"))).count() == 0

        # manifest attributes parts to the run that processed them
        m2 = ln.read_manifest(spark, out)
        by_run = {r.run_id: r.cnt for r in m2.groupBy("run_id").agg(F.count("*").alias("cnt")).collect()}
        assert by_run == {"run-1": 3, "run-2": N_PARTS - 3}

    def test_rerun_after_complete_is_noop(self, spark, pages, tmp_path):
        out = str(tmp_path / "out")
        ln.run_extraction_job(spark, pages, out, run_id="a", n_parts=N_PARTS, max_bytes=MAX_BYTES)
        r = ln.run_extraction_job(spark, pages, out, run_id="b", n_parts=N_PARTS, max_bytes=MAX_BYTES)
        assert r["n_rows"] == 0
        assert r["parts_skipped"] == N_PARTS
        # no duplicate manifest rows for a part
        m = ln.read_manifest(spark, out)
        assert m.groupBy("part_key").count().filter("count > 1").count() == 0

    def test_crash_between_data_and_manifest_is_idempotent(self, spark, pages, tmp_path):
        """Simulate the torn state: data for a part committed but manifest
        lost -> the part is reprocessed and dynamically overwritten, not
        duplicated."""
        import shutil

        out = str(tmp_path / "out")
        ln.run_extraction_job(
            spark, pages, out, run_id="x", n_parts=N_PARTS, max_bytes=MAX_BYTES, only_parts=[0],
        )
        # lose the manifest (the crash window is data-commit -> manifest-commit)
        shutil.rmtree(ln.manifest_path(out))
        ln.run_extraction_job(spark, pages, out, run_id="y", n_parts=N_PARTS, max_bytes=MAX_BYTES)
        got = ln.read_output(spark, out).select("url").union(
            ln.read_quarantine(spark, out).select("url")
        )
        assert got.count() == got.distinct().count() == 200

    def test_output_carries_processed_at_and_run_id(self, spark, pages, tmp_path):
        out = str(tmp_path / "out")
        ln.run_extraction_job(spark, pages, out, run_id="stamp", n_parts=N_PARTS, max_bytes=MAX_BYTES)
        got = ln.read_output(spark, out)
        assert "processed_at" in got.columns  # C7 ISO stamp analog
        assert got.filter(F.col("processed_at").isNull()).count() == 0
        assert {r.run_id for r in got.select("run_id").distinct().collect()} == {"stamp"}

    def test_manifest_lineage_metrics(self, spark, pages, tmp_path):
        out = str(tmp_path / "out")
        ln.run_extraction_job(spark, pages, out, run_id="m", n_parts=N_PARTS, max_bytes=MAX_BYTES)
        m = ln.read_manifest(spark, out)
        tot = m.agg(
            F.sum("n_rows").alias("rows"), F.sum("n_ok").alias("ok"),
            F.sum("n_quarantined").alias("q"), F.sum("bytes_in").alias("b"),
        ).first()
        assert tot.rows == 200
        assert tot.ok + tot.q == 200
        assert tot.b > 0
        assert m.filter(F.col("wall_ms") < 0).count() == 0


class TestQuarantineReads:
    def test_zero_quarantine_run_reads_as_empty(self, spark, tmp_path):
        # ADVICE r1: a run with zero quarantined rows leaves a quarantine
        # dir with no parquet footers; read_quarantine must not blow up on
        # schema inference — it returns an empty, correctly-typed frame.
        out = str(tmp_path / "out")
        clean = spark.createDataFrame(
            [
                (
                    f"https://ok.example/{i}",
                    None,
                    b"<html><body><main><p>"
                    b"A clean page with a long paragraph of honest content text."
                    b"</p></main></body></html>",
                    "en",
                )
                for i in range(6)
            ],
            "url string, warc_ts timestamp, html binary, lang string",
        )
        r = ln.run_extraction_job(
            spark, clean, out, run_id="clean-run", n_parts=2, max_bytes=MAX_BYTES
        )
        assert r["n_rows"] == 6
        q = ln.read_quarantine(spark, out)
        assert q.count() == 0
        assert "error_code" in q.columns and "part_key" in q.columns

    def test_missing_quarantine_dir_reads_as_empty(self, spark, tmp_path):
        q = ln.read_quarantine(spark, str(tmp_path / "never-written"))
        assert q.count() == 0

    def test_job_never_materializes(self, spark, pages, tmp_path, monkeypatch):
        # Verdict r2 "what's wrong #1": the job must stream kernel->parquet —
        # never cache()/persist() the full extraction before the first write.
        # Patch both entry points to raise; the job must still complete.
        from pyspark.sql import DataFrame

        def _boom(self, *a, **k):  # pragma: no cover - should never run
            raise AssertionError("run_extraction_job must not materialize output")

        monkeypatch.setattr(DataFrame, "cache", _boom)
        monkeypatch.setattr(DataFrame, "persist", _boom)
        out = str(tmp_path / "out")
        r = ln.run_extraction_job(
            spark, pages, out, run_id="nocache", n_parts=N_PARTS, max_bytes=MAX_BYTES
        )
        assert r["n_rows"] == pages.count()
        assert ln.read_output(spark, out).count() + ln.read_quarantine(spark, out).count() == r["n_rows"]

    def test_crash_between_data_and_manifest_commits(self, spark, pages, tmp_path, monkeypatch):
        # the documented idempotence window: data parquet committed, crash
        # before the manifest append -> the next run reprocesses those parts
        # and dynamic overwrite replaces (never duplicates) their output
        out = str(tmp_path / "out")
        import pyspark.sql.readwriter as rw

        real_save = rw.DataFrameWriter.parquet
        def boom_on_manifest(self, path, *a, **k):
            if path.endswith("_manifest"):
                raise RuntimeError("simulated crash before manifest commit")
            return real_save(self, path, *a, **k)

        monkeypatch.setattr(rw.DataFrameWriter, "parquet", boom_on_manifest)
        with pytest.raises(RuntimeError, match="simulated crash"):
            ln.run_extraction_job(
                spark, pages, out, run_id="crash", n_parts=N_PARTS, max_bytes=MAX_BYTES
            )
        monkeypatch.setattr(rw.DataFrameWriter, "parquet", real_save)
        # data landed, manifest did not -> everything still pending
        assert ln.read_manifest(spark, out).count() == 0
        r = ln.run_extraction_job(
            spark, pages, out, run_id="retry", n_parts=N_PARTS, max_bytes=MAX_BYTES
        )
        assert r["parts_done"] == N_PARTS and r["parts_skipped"] == 0
        got = ln.read_output(spark, out).select("url").union(
            ln.read_quarantine(spark, out).select("url")
        )
        assert got.count() == pages.count()                 # exactly once
        assert got.distinct().count() == pages.count()
        # and every persisted row carries the retry run_id (overwritten)
        runs = {r.run_id for r in ln.read_output(spark, out).select("run_id").distinct().collect()}
        assert runs == {"retry"}
