"""quality_lm_score — the KenLM-style perplexity-filter analog: integer-
exact trigram familiarity, self-trained on the documents table, relative
keep cut (>= half the corpus-wide average familiarity)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from activestorage_ocr_spark.plans.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


class TestQualityLmScore:
    def test_plan_shape(self, spark):
        df = QUERIES["quality_lm_score"](spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
        # model + corpus threshold reach the scoring side as broadcasts;
        # nothing sort-merges and nothing falls out of the JVM. Exact
        # counts (the PLANS.md evidence row): ONE broadcast-hash join (the
        # tri-score join) and TWO broadcast-nested-loop joins (the 1-row
        # n_total and corpus-threshold cross joins)
        assert "SortMergeJoin" not in plan
        assert "Python" not in plan
        assert plan.count("BroadcastHashJoin") == 1, plan
        assert plan.count("BroadcastNestedLoopJoin") == 2, plan

    def test_gibberish_outlier_dropped(self, spark, tmp_path):
        # append one high-entropy doc to a copied corpus: the relative cut
        # must drop it while keeping every natural doc
        src = duckdb.connect()
        rows = src.execute(
            f"SELECT doc_id, text, lang FROM read_parquet('{SF}/documents.parquet') LIMIT 60"
        ).fetchall()
        gib = "zq xv jk wq vx qz kj xw " * 40  # trigrams the corpus never uses
        rows.append((999_999, gib, "en"))
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "lang": [r[2] for r in rows],
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = {r.doc_id: r for r in QUERIES["quality_lm_score"](spark, str(tmp_path)).collect()}
        assert out[999_999].keep is False, out[999_999]
        kept = sum(1 for r in out.values() if r.keep)
        assert kept >= len(rows) - 5  # natural docs overwhelmingly keep

    def test_scores_are_integers_and_bounded(self, spark):
        rows = QUERIES["quality_lm_score"](spark, SF).collect()
        assert rows
        for r in rows[:50]:
            assert isinstance(r.familiarity_e9, int)
            # avg per-trigram probability can't exceed 1.0 (1e9 scaled)
            assert 0 <= r.avg_familiarity_e9 <= 1_000_000_000
