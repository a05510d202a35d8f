"""Round-7 optimization pins: each rewrite that changed an operator's
internals gets a value-equality test against the pre-r7 formulation and,
where the claim is structural, a plan pin."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from activestorage_ocr_spark.operators import dedup as dd
from activestorage_ocr_spark.operators import similarity as sim
from activestorage_ocr_spark.operators import textstats as ts

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


class TestMinhashMapOnly:
    def test_signature_has_no_exchange(self, spark):
        # r7: per-doc min over the shingle ARRAY — map-only, no explode,
        # no aggregation exchange
        df = dd.minhash_signature(_docs(spark), "doc_id", "text", k=3, n_hashes=4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_signature_matches_exploded_groupby_form(self, spark):
        docs = _docs(spark)
        new = dd.minhash_signature(docs, "doc_id", "text", k=3, n_hashes=4)
        sh = dd.exploded_shingles(docs, "doc_id", "text", 3)
        aggs = [
            F.min(
                F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")).cast("binary"))
            ).alias(f"mh_{s}")
            for s in range(4)
        ]
        old = sh.groupBy("doc_id").agg(*aggs)
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0


class TestGifLzwFastPath:
    def _slow(self, data, min_code_size=8):
        """The general decoder, bypassing the fast path."""
        from activestorage_ocr_spark.engine import rasters

        orig = rasters._gif_lzw_decode_fast9
        rasters._gif_lzw_decode_fast9 = lambda data: None
        try:
            return rasters._gif_lzw_decode(data, min_code_size)
        finally:
            rasters._gif_lzw_decode_fast9 = orig

    def _pack9(self, codes):
        buf = nbits = 0
        out = bytearray()
        for c in codes:
            buf |= c << nbits
            nbits += 9
            while nbits >= 8:
                out.append(buf & 0xFF)
                buf >>= 8
                nbits -= 8
        if nbits:
            out.append(buf & 0xFF)
        return bytes(out)

    def test_fast_path_matches_on_encoder_output(self):
        from activestorage_ocr_spark.engine import rasters

        gray = rasters.render_text("FAST PATH 123", scale=2)
        gif = rasters.encode_gif(gray)
        # extract the LZW stream back out of the encoded GIF
        decoded = rasters.decode_gif(gif)
        assert np.array_equal(decoded, gray)

    def test_fast_path_matches_general_decoder(self):
        from activestorage_ocr_spark.engine.rasters import _gif_lzw_decode

        rng = np.random.RandomState(7)
        # root-code streams with clears at varying cadence (fast-path hits)
        for run in (1, 100, 254):
            codes = []
            px = rng.randint(0, 256, size=1000).tolist()
            for i, p in enumerate(px):
                if i % run == 0:
                    codes.append(256)
                codes.append(p)
            codes.append(257)
            data = self._pack9(codes)
            assert _gif_lzw_decode(data, 8) == self._slow(data)

    def test_fast_path_bails_to_general_on_table_codes(self):
        from activestorage_ocr_spark.engine.rasters import (
            _gif_lzw_decode,
            _gif_lzw_decode_fast9,
        )

        # a stream that actually builds and uses table entries (code >= 258)
        codes = [256, 65, 66, 258, 257]  # AB, then table[258] = "AB"... etc
        data = self._pack9(codes)
        assert _gif_lzw_decode_fast9(data) is None  # must bail
        assert _gif_lzw_decode(data, 8) == self._slow(data)

    def test_fast_path_bails_on_long_runs(self):
        from activestorage_ocr_spark.engine.rasters import _gif_lzw_decode_fast9

        codes = [256] + [1] * 255 + [257]  # 255 data codes between clears
        assert _gif_lzw_decode_fast9(self._pack9(codes)) is None

    def test_no_end_code_and_empty(self):
        from activestorage_ocr_spark.engine.rasters import _gif_lzw_decode

        codes = [256, 9, 8, 7]  # trailing bits, no END
        data = self._pack9(codes)
        assert _gif_lzw_decode(data, 8) == self._slow(data)
        assert _gif_lzw_decode(b"", 8) == self._slow(b"")


class TestTranslateCountsMatchRegex:
    CASES = [
        "", " ", "abc", "ABC xyz 012", "a\tb\nc\x0b\x0c\rd",
        "héllo wörld \xa0nbsp", "!@#$%^&*()_+ {}[]|\\:;\"'<>,.?/~`",
        "mixed 123 ABC é中文 tail   runs",
        "\x01\x02 control bytes \x7f",
    ]

    def test_letter_ws_special_counts(self, spark):
        # authoritative comparison: Spark's OWN regexp (Java \s semantics,
        # the classes the DuckDB oracle mirrors) vs the translate forms
        for s in self.CASES:
            df = spark.range(1).select(F.lit(s).alias("t"))
            row = df.select(
                ts._n_letters(F.col("t")).alias("nl"),
                ts._n_whitespace(F.col("t")).alias("nw"),
                F.length(F.translate(F.col("t"), ts._NON_SPECIAL_CHARS, "")).alias("ns"),
                F.length(F.regexp_replace("t", ts.LETTERS_RE, "")).alias("rl"),
                (F.length("t") - F.length(F.regexp_replace("t", ts.WS_RE, ""))).alias("rw"),
                F.length(F.regexp_replace("t", ts.NON_SPECIAL_RE, "")).alias("rs"),
            ).first()
            assert row.nl == row.rl, s
            assert row.nw == row.rw, s
            assert row.ns == row.rs, s


class TestCosineNormHoist:
    def test_cosine_with_norms_bit_identical(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
        v = F.transform("embedding", lambda x: x.cast("double"))
        base = emb.select(
            "vec_id", v.alias("v")
        ).withColumn("n", sim.l2_norm(F.col("v")))
        a = base.select(
            "vec_id", sim.cosine(F.col("v"), F.col("v")).alias("c")
        )
        b = base.select(
            "vec_id",
            sim.cosine_with_norms(
                F.col("v"), F.col("v"), F.col("n"), F.col("n")
            ).alias("c"),
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestWindowTopArgmax:
    def test_argmax_matches_window_form(self, spark):
        from activestorage_ocr_spark.plans.queries import QUERIES, _cents, _t
        from pyspark.sql.window import Window

        new = QUERIES["window_top_order_per_customer"](spark, SF)
        orders = _t(spark, SF, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        old = (
            orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "o_custkey",
                F.col("o_orderkey").alias("top_orderkey"),
                _cents(F.col("o_totalprice")).alias("top_price_cents"),
            )
        )
        assert new.exceptAll(old).count() == 0 and old.exceptAll(new).count() == 0
