"""Deterministic BPE tokenizer operator (`operators/bpe.py`).

The Spark-vs-DuckDB value parity runs in tests/test_oracle_parity.py like
every other oracled query; here we pin the merge-table provenance, the
application semantics, and the map-only plan shape."""

import duckdb
import pytest

from activestorage_ocr_spark.operators import bpe


class TestMergeTable:
    def test_committed_merges_rederive_from_corpus(self):
        # MERGES is a trained artifact: re-run the documented training
        # procedure (first _TRAIN_DOCS docs of sf0.01, 64 greedy merges,
        # lexicographic tiebreak) and require the exact committed list
        texts = [r[0] for r in duckdb.connect().execute(
            "SELECT text FROM '/root/testdata/sf0.01/documents.parquet' "
            f"ORDER BY doc_id LIMIT {bpe._TRAIN_DOCS}").fetchall()]
        assert tuple(bpe.train_merges(texts, bpe._N_MERGES)) == bpe.MERGES

    def test_merges_are_single_space_pairs(self):
        # the word-gap guard (3+ spaces) relies on every merge pattern
        # containing exactly one space
        for m in bpe.MERGES:
            assert m.count(" ") == 1 and " " not in m.replace(" ", "", 1)

    def test_training_is_deterministic(self):
        texts = ["low lower lowest", "low lowest", "newer new"] * 3
        assert bpe.train_merges(texts, 8) == bpe.train_merges(texts, 8)


class TestApplicationSemantics:
    def test_known_example_by_hand(self):
        # "er" then "st" merges on 'faster': f a st er -> 4 tokens
        sym = bpe._symbolize("faster")
        assert sym == "f a s t e r"
        sym = bpe._apply_merge(sym, "e r")
        sym = bpe._apply_merge(sym, "s t")
        assert sym == "f a st er"

    def test_merges_never_cross_word_gaps(self):
        sym = bpe._symbolize("ab ba")
        assert sym == "a b   b a"
        assert bpe._apply_merge(sym, "b b") == sym  # gap is 3 spaces

    def test_left_to_right_non_overlapping(self):
        assert bpe._apply_merge("a a a", "a a") == "aa a"


class TestSparkOperator:
    def test_map_only_plan_and_counts(self, spark):
        import __spark_entry__ as e

        df = e.queries()["text_bpe_tokens"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        rows = df.collect()
        assert len(rows) == 500
        for r in rows:
            # merges only shrink the symbol count, never below word count
            assert r.n_words <= r.n_tokens_bpe <= r.n_chars

    def test_columns_pruned_to_two(self, spark):
        import __spark_entry__ as e

        df = e.queries()["text_bpe_tokens"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
