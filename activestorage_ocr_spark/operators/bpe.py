"""Deterministic BPE tokenizer operator (byte-pair encoding, the public
Sennrich et al. 2016 subword algorithm) — merge application is a chain of
plain ``replace`` column expressions, so the whole tokenizer runs JVM-side
under whole-stage codegen AND re-expresses verbatim in DuckDB SQL for the
oracle.  No UDF anywhere.

Tokenizer semantics (deliberately chosen so Spark and the oracle agree
character-for-character):

1. normalize: non-alphanumeric runs collapse to a single space, trim;
2. symbolize: every character is suffixed with one space ("ab cd" ->
   "a b   c d " — word gaps widen to 3+ spaces, which no merge pattern can
   cross since merge patterns contain exactly one space);
3. apply each merge rule in rank order as ONE left-to-right
   non-overlapping global replace ("a b" -> "ab").  Both engines'
   ``replace`` implement exactly that scan, so results match bit-for-bit;
4. token count = number of space-separated units left.

The merge table is a TRAINED ARTIFACT, like any production tokenizer's
vocab file: built once by `train_merges` (greedy highest-pair-count,
lexicographic tiebreak — deterministic) over the first `_TRAIN_DOCS`
documents of the sf0.01 corpus, committed as `MERGES`, and re-derivation
is pinned by tests/test_bpe.py so the constant can never drift from the
documented procedure.

100 TB posture: map-only column expressions — no shuffle, no Python
workers, scales with the scan.  The merge chain depth (64) is a fixed
plan cost, independent of data size.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

#: training-sample definition (documented provenance of MERGES)
_TRAIN_DOCS = 200
_N_MERGES = 64


def _symbolize(text: str) -> str:
    words = re.sub(r"[^A-Za-z0-9]+", " ", text).strip()
    return re.sub(r"(.)", r"\1 ", words).strip()


def _apply_merge(sym: str, pair: str) -> str:
    return sym.replace(pair, pair.replace(" ", ""))


def train_merges(texts: list[str], n_merges: int = _N_MERGES) -> list[str]:
    """Greedy BPE training with the SAME application semantics the operator
    uses (left-to-right non-overlapping replace per rank).  Tiebreak:
    lexicographically smallest pair — fully deterministic."""
    corpus = [_symbolize(t or "") for t in texts]
    merges: list[str] = []
    for _ in range(n_merges):
        counts: Counter[str] = Counter()
        for sym in corpus:
            for word in sym.split("   "):
                units = word.split(" ")
                for a, b in zip(units, units[1:]):
                    counts[f"{a} {b}"] += 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        merges.append(best)
        corpus = [_apply_merge(s, best) for s in corpus]
    return merges


#: trained on sorted-by-doc_id docs 0..199 of /root/testdata/sf0.01/documents
#: via train_merges(n_merges=64); tests/test_bpe.py re-derives this exact
#: list from the corpus, so the constant cannot drift from the procedure
MERGES: tuple[str, ...] = (
    "e r", "s t", "o r", "o w", "i n", "m er", "a t", "l u", "a r", "p ar",
    "f i", "fi l", "fil t", "filt er", "at c", "atc h", "b atch", "a n",
    "c an", "s can", "a s", "as h", "h ash", "c u", "cu st", "cust o",
    "custo mer", "g e", "mer ge", "a m", "e am", "r eam", "st ream",
    "l ow", "s low", "u p", "c o", "co lu", "colu m", "colum n", "a lu",
    "alu e", "j o", "jo in", "v alue", "a l", "al l", "c t", "ct or",
    "e ctor", "e y", "k ey", "m all", "s mall", "v ector", "a b", "ab l",
    "abl e", "t able", "d er", "or der", "er y", "q u", "qu ery",
)


def _chain_replaces(col: Column, merges: tuple[str, ...]) -> Column:
    for pair in merges:
        col = F.replace(col, F.lit(pair), F.lit(pair.replace(" ", "")))
    return col


def bpe_token_count(text: Column, merges: tuple[str, ...] = MERGES) -> Column:
    """Catalyst expression: number of BPE tokens in ``text``."""
    words = F.trim(F.regexp_replace(text, "[^A-Za-z0-9]+", " "))
    sym = F.trim(F.regexp_replace(words, "(.)", "$1 "))
    merged = _chain_replaces(sym, merges)
    return F.when(F.length(words) == 0, F.lit(0)).otherwise(
        F.size(F.split(merged, " +"))
    ).cast("long")


def bpe_word_count(text: Column) -> Column:
    words = F.trim(F.regexp_replace(text, "[^A-Za-z0-9]+", " "))
    return F.when(F.length(words) == 0, F.lit(0)).otherwise(
        F.size(F.split(words, " "))
    ).cast("long")


def bpe_tokens_table(spark: SparkSession, sf_dir: str,
                     merges: tuple[str, ...] = MERGES) -> DataFrame:
    """Per-document BPE accounting over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        bpe_word_count(text).alias("n_words"),
        bpe_token_count(text, merges).alias("n_tokens_bpe"),
        F.length(text).cast("long").alias("n_chars"),
    )


def bpe_token_count_sql(merges: tuple[str, ...] = MERGES) -> str:
    """The token-count column as one DuckDB SQL scalar expression — the
    building block `bpe_oracle_sql` and the pack_sequences_bpe oracle
    share, so the SQL mirror of the tokenizer exists in exactly one
    place."""
    chain = "trim(regexp_replace(trim(regexp_replace(coalesce(text,''), '[^A-Za-z0-9]+', ' ', 'g')), '(.)', '\\1 ', 'g'))"
    for pair in merges:
        chain = f"replace({chain}, '{pair}', '{pair.replace(' ', '')}')"
    words = "trim(regexp_replace(coalesce(text,''), '[^A-Za-z0-9]+', ' ', 'g'))"
    return (
        f"(CASE WHEN length({words}) = 0 THEN 0 "
        f"ELSE len(string_split_regex({chain}, ' +')) END)::BIGINT"
    )


def bpe_oracle_sql(merges: tuple[str, ...] = MERGES) -> str:
    """The identical tokenizer as one DuckDB SQL statement (over the
    pre-registered ``documents`` view, like the other ORACLES); the
    n_tokens_bpe column comes from `bpe_token_count_sql` so the SQL
    mirror of the chain exists in exactly one place."""
    words = "trim(regexp_replace(coalesce(text,''), '[^A-Za-z0-9]+', ' ', 'g'))"
    return f"""
        SELECT doc_id,
               CASE WHEN length({words}) = 0 THEN 0
                    ELSE len(string_split({words}, ' ')) END::BIGINT AS n_words,
               {bpe_token_count_sql(merges)} AS n_tokens_bpe,
               length(coalesce(text,''))::BIGINT AS n_chars
        FROM documents
    """
