"""Public column-function library — the engine's reusable `pyspark.sql`
expression builders, collected in one import surface:

    from activestorage_ocr_spark import functions as AF
    docs.select(AF.fingerprint(F.col("text")), AF.token_count(F.col("text")))

Everything here is a pure Catalyst expression (whole-stage codegen; no
Python): the SQL-facing twins of the in-kernel implementations in
``engine/`` (SURVEY.md §2.5).
"""

from ..operators.dedup import word_shingles  # noqa: F401
from ..operators.similarity import cosine, dot, l2_norm, lsh_band_keys  # noqa: F401
from ..operators.textstats import (  # noqa: F401
    bpe_ish_piece_count,
    char_frequency_score,
    combined_confidence,
    fingerprint,
    langid_label,
    langid_scores,
    occurrence_count,
    quality_score,
    repetition_score_from_run,
    token_count,
    whitespace_score,
    word_lengths_score,
)

__all__ = [
    "word_shingles",
    "cosine",
    "dot",
    "l2_norm",
    "lsh_band_keys",
    "bpe_ish_piece_count",
    "char_frequency_score",
    "combined_confidence",
    "fingerprint",
    "langid_label",
    "langid_scores",
    "occurrence_count",
    "quality_score",
    "repetition_score_from_run",
    "token_count",
    "whitespace_score",
    "word_lengths_score",
]
