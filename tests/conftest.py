"""Shared fixtures: one SparkSession per test session (local[4] for speed) and
a cached 200-doc synthetic corpus."""

import pytest


@pytest.fixture(scope="session")
def spark():
    from activestorage_ocr_spark.sources.session import build_session

    s = build_session(master="local[4]", app_name="asos-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir_200():
    from activestorage_ocr_spark.fixtures.gen_corpus import ensure_corpus

    return ensure_corpus(200)
