"""Driver-style parity check: every oracled query must match its DuckDB
oracle on row count, column names, and order-insensitive values — the same
comparison CORRECTNESS_r{N}.json records (run here at sf0.001 for speed; the
driver runs sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value normalization: stable text form for doubles
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    return str(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


from activestorage_ocr_spark.plans.queries import ORACLES, extraction_oracles

# extraction oracles embed corpus paths sized to the sf dir; rebuild them at
# this test's scale (sf0.001 -> 500 docs) instead of the driver's 2000
from activestorage_ocr_spark.fixtures.gen_media import media_oracles
from activestorage_ocr_spark.fixtures.gen_multilingual import multilingual_oracles
from activestorage_ocr_spark.fixtures.gen_scanned import scanned_oracles
from activestorage_ocr_spark.fixtures.gen_textlayer import textlayer_oracles
from activestorage_ocr_spark.fixtures.gen_warc import warc_oracles

_TEST_ORACLES = dict(ORACLES)
_TEST_ORACLES.update(extraction_oracles(n_docs=500))
_TEST_ORACLES.update(media_oracles(n_docs=500))
_TEST_ORACLES.update(warc_oracles(n_docs=500))
_TEST_ORACLES.update(scanned_oracles(n_docs=500))
_TEST_ORACLES.update(multilingual_oracles(n_docs=500))
_TEST_ORACLES.update(textlayer_oracles(n_docs=500))

ORACLED = sorted(_TEST_ORACLES.keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, duck):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(_TEST_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ (spark={len(spark_rows)}, duck={len(duck_rows)})"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("sf_dir,n_docs", [
    ("/root/testdata/sf0.001", 500),
    ("/root/testdata/sf0.01", 2000),
])
def test_extract_scanned_parity_both_scales(sf_dir, n_docs, spark):
    """VERDICT r5 item 5: the scanned-codec oracle is rebuilt per scale
    (`scanned_oracles(n_docs=...)`); pin the Spark run against it at BOTH
    the in-repo scale and the driver's sf0.01 so oracle-rebuild sizing
    can't drift between them."""
    sdf = entry_mod.queries()["extract_scanned"](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        res = con.execute(scanned_oracles(n_docs=n_docs)["extract_scanned"])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows) > 0
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, duck_cols)


@pytest.mark.parametrize("sf_dir,n_docs", [
    ("/root/testdata/sf0.001", 500),
    ("/root/testdata/sf0.01", 2000),
])
def test_extract_textlayer_parity_both_scales(sf_dir, n_docs, spark):
    """VERDICT r5 item 2: same two-scale treatment for the text-layer
    fidelity query — `textlayer_oracles(n_docs=...)` is rebuilt at the
    in-repo scale AND the driver's sf0.01 so oracle-rebuild sizing can't
    drift between them."""
    sdf = entry_mod.queries()["extract_textlayer"](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        res = con.execute(textlayer_oracles(n_docs=n_docs)["extract_textlayer"])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows) > 0
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, duck_cols)


@pytest.mark.parametrize("sf_dir,n_docs", [
    ("/root/testdata/sf0.001", 500),
    ("/root/testdata/sf0.01", 2000),
])
def test_extract_multilingual_parity_both_scales(sf_dir, n_docs, spark):
    """Round 6: same two-scale treatment for the 13-language query —
    `multilingual_oracles(n_docs=...)` rebuilds at the in-repo scale AND
    the driver's sf0.01 so oracle-rebuild sizing can't drift."""
    sdf = entry_mod.queries()["extract_multilingual"](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        res = con.execute(multilingual_oracles(n_docs=n_docs)["extract_multilingual"])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows) > 0
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, duck_cols)
    # every language must appear, and every row must extract ok with the
    # full native text (the pack integration is the point of the table)
    langs = {r[1] for r in spark_rows}
    assert len(langs) == 13, langs
    statuses = {r[3] for r in spark_rows}
    assert statuses == {"ok"}, statuses


def test_every_query_listed(spark):
    qs = entry_mod.queries()
    assert len(qs) >= 25
    # every oracle key has a query
    assert set(entry_mod.oracle_sql().keys()) <= set(qs.keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "extracted_text" in df.columns
