"""Text-analysis operators over document tables — pure ``pyspark.sql.functions``
column expressions (JVM-side, whole-stage-codegen; no Python in the hot path).

These re-express the reference's scalar scoring stack (SURVEY.md §2.5 C1-C5)
as Catalyst expressions so the DuckDB oracle can verify them, plus the
training-data-pipeline text ops (token counting, quality scoring, language ID,
fingerprinting). The in-kernel (per-document) versions live in
``engine.confidence`` — both implement the same formulas; these SQL variants
are documented as ASCII-class approximations of the kernel's Unicode classes
(fine for the ASCII documents corpus; SURVEY.md §7.3 flags the divergence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# ASCII character-class regexes shared with the DuckDB oracle SQL (RE2- and
# Java-regex-compatible spellings).
LETTERS_RE = "[^A-Za-z]"
# remove alnum + whitespace + ASCII punctuation; what's left is "special" (C2)
NON_SPECIAL_RE = r"[A-Za-z0-9\s!-/:-@\[-`{-~]"
WS_RE = r"\s"

# r7 (optimization guide §1.2 "per-task work"): the hot char-class COUNTS are
# computed with `translate` (a per-char dictionary pass) instead of
# `regexp_replace` + length (a Java-regex matcher building a new string) —
# measured 4x on the documents corpus. The regex classes above are all
# finite ASCII sets, so deleting the enumerated characters removes exactly
# the same characters the class matches and every count is integer-identical
# for ANY input (non-ASCII characters are in neither set). The *_RE
# constants remain the documented contract shared with the DuckDB oracle
# SQL, which keeps its regex spelling.
_ASCII_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
#: the characters Java-regex `\s` matches: space, tab, LF, VT, FF, CR
_WS_CHARS = " \t\n\x0b\x0c\r"
#: every character NON_SPECIAL_RE matches: printable ASCII 0x21-0x7e + \s
_NON_SPECIAL_CHARS = "".join(chr(c) for c in range(0x21, 0x7F)) + _WS_CHARS


def _total(col: Column) -> Column:
    return F.length(col).cast("double")


def _n_letters(text: Column) -> Column:
    """Count of [A-Za-z] chars == length(regexp_replace(text, LETTERS_RE, ''))."""
    return F.length(text) - F.length(F.translate(text, _ASCII_LETTERS, ""))


def _n_whitespace(text: Column) -> Column:
    """Count of `\\s` chars == length(text) - length(regexp_replace(text, WS_RE, ''))."""
    return F.length(text) - F.length(F.translate(text, _WS_CHARS, ""))


def char_frequency_score(text: Column) -> Column:
    """C2 (`ocrs.rs:306-327`) as a Catalyst expression."""
    total = _total(text)
    letters = _n_letters(text).cast("double")
    # chars surviving removal of the NON_SPECIAL class == the "special" count
    specials = F.length(F.translate(text, _NON_SPECIAL_CHARS, "")).cast("double")
    special_penalty = F.lit(1.0) - F.least(specials / total * 10.0, F.lit(1.0))
    letter_score = F.least(letters / total * 1.5, F.lit(1.0))
    return F.when(F.length(text) == 0, 0.0).otherwise(
        special_penalty * 0.6 + letter_score * 0.4
    )


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def word_lengths_score(text: Column) -> Column:
    """C3 (`ocrs.rs:332-356`) as a Catalyst expression."""
    words = _words(text)
    n = F.size(words).cast("double")
    # sum of split-element lengths == count of non-\s chars in the trimmed
    # text (split elements are exactly the non-\s runs; empty edge elements
    # contribute 0 either way) — one translate pass instead of two
    # interpreted higher-order passes (r7, guide §1.2)
    total_len = F.length(F.translate(F.trim(text), _WS_CHARS, "")).cast("double")
    avg_bucket = F.floor(total_len / n)
    base = (
        F.when(avg_bucket <= 1, 0.3)
        .when(avg_bucket <= 3, 0.7)
        .when(avg_bucket <= 8, 1.0)
        .when(avg_bucket <= 12, 0.8)
        .otherwise(0.4)
    )
    singles = F.size(F.filter(words, lambda w: F.length(w) == 1)).cast("double")
    penalty = F.lit(1.0) - F.least(singles / n * 1.5, F.lit(0.5))
    return F.when(F.length(F.trim(text)) == 0, 0.5).otherwise(base * penalty)


def whitespace_score(text: Column) -> Column:
    """C4 (`ocrs.rs:361-377`) as a Catalyst expression."""
    total = _total(text)
    ws = _n_whitespace(text).cast("double")
    pct = F.floor(ws / total * 100.0)
    return (
        F.when(F.length(text) == 0, 0.0)
        .when(pct <= 5, 0.5)
        .when(pct <= 10, 0.8)
        .when(pct <= 25, 1.0)
        .when(pct <= 40, 0.7)
        .otherwise(0.3)
    )


def repetition_run_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C5 (`ocrs.rs:382-403`): longest run of identical consecutive
    non-whitespace characters, per document — the gaps-and-islands pattern
    (posexplode -> window row_number -> group). Returns (id, longest_run).

    Whitespace "resets" runs for free: islands use the *original* character
    position, so removing whitespace rows breaks positional consecutiveness
    exactly where a whitespace character sat.
    """
    chars = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "")).alias("i", "ch")
    ).filter((F.col("ch") != "") & ~F.col("ch").rlike(r"^\s$"))
    w = Window.partitionBy(id_col, "ch").orderBy("i")
    runs = (
        chars.withColumn("grp", F.col("i") - F.row_number().over(w))
        .groupBy(id_col, "ch", "grp")
        .agg(F.count("*").alias("run_len"))
        .groupBy(id_col)
        .agg(F.max("run_len").cast("long").alias("longest_run"))
    )
    return df.select(id_col).join(runs, id_col, "left").select(
        F.col(id_col), F.coalesce("longest_run", F.lit(0)).cast("long").alias("longest_run")
    )


def longest_run_expr(text: Column) -> Column:
    """C5 longest-run as ONE map-only JVM projection — the production plan
    (VERDICT r1 "what's wrong #2"): ``regexp_extract_all(text, '((\\S)\\2*)')``
    yields every maximal run of one repeated non-whitespace character in a
    single left-to-right regex pass (greedy + backreference), then
    ``array_max(length)`` picks the longest. No explode, no shuffle, no
    per-char state; whitespace breaks runs because ``\\S`` won't cross it.
    Semantics identical to `repetition_run_lengths` (verified value-equal
    on the documents corpus), which remains as the gaps-and-islands demo.
    ~3x faster than a per-char higher-order ``aggregate`` (interpreted), and
    ~10x faster than the old posexplode islands plan at sf0.1."""
    runs = F.regexp_extract_all(text, F.lit(r"((\S)\2*)"), 1)
    return F.coalesce(
        F.array_max(F.transform(runs, lambda x: F.length(x).cast("long"))),
        F.lit(0).cast("long"),
    )


def repetition_score_from_run(run: Column) -> Column:
    return (
        F.when(run <= 3, 1.0).when(run <= 5, 0.8).when(run <= 10, 0.5).otherwise(0.2)
    )


def combined_confidence(char_s: Column, word_s: Column, ws_s: Column, rep_s: Column, text: Column) -> Column:
    """C1 (`ocrs.rs:284-301`): guards + weighted sum + clamp."""
    conf = char_s * 0.4 + word_s * 0.3 + ws_s * 0.15 + rep_s * 0.15
    clamped = F.least(F.greatest(conf, F.lit(0.0)), F.lit(1.0))
    return (
        F.when(F.length(text) == 0, 0.0)
        .when(F.length(text) < 5, 0.5)
        .otherwise(clamped)
    )


# --------------------------------------------------------------------------
# training-data text ops
# --------------------------------------------------------------------------

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (deterministic; padded-with-spaces occurrence counting).
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "que", "es"),
}


def padded_for_counts(text: Column) -> Column:
    """The doubled-and-padded form every `occurrence_count` probes: internal
    spaces doubled so adjacent occurrences ("the the the") don't share a
    delimiter and get undercounted by non-overlapping replace, then one
    space of padding each side. Hoist this into its own projected column
    when counting MANY tokens over the same text (langid + quality run 25
    counts): inline, each count rebuilds the doubled string — 2 extra
    string passes per token per row (r7, guide §1.2)."""
    doubled = F.replace(text, F.lit(" "), F.lit("  "))
    return F.concat(F.lit(" "), doubled, F.lit(" "))


def occurrence_count_padded(padded: Column, token: str) -> Column:
    """Count of ``token`` inside an already `padded_for_counts` column via
    the length-difference trick (identical semantics in Spark and DuckDB —
    regexp-free so both engines agree bytewise)."""
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def occurrence_count(text: Column, token: str) -> Column:
    """Count of ``token`` as a space-delimited word (see
    `padded_for_counts` / `occurrence_count_padded`)."""
    return occurrence_count_padded(padded_for_counts(text), token)


def token_count(text: Column) -> Column:
    """Whitespace token count (training-data token accounting)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(_words(text))
    ).cast("long")


def bpe_ish_piece_count(text: Column) -> Column:
    """A BPE-ish sub-token estimate: alnum runs + punctuation marks each count
    as one piece, long alnum runs count ceil(len/4) pieces (a deterministic
    stand-in for a real tokenizer, which cannot ship here)."""
    pieces = F.split(F.trim(text), r"[^A-Za-z0-9]+")
    alnum = F.aggregate(
        F.transform(pieces, lambda p: F.ceil(F.length(p) / F.lit(4.0)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # chars surviving removal of [A-Za-z0-9\s] == length after deleting the
    # enumerated alnum+\s set via translate (r7: 4x cheaper than the regex)
    punct = F.length(
        F.translate(text, _ASCII_LETTERS + "0123456789" + _WS_CHARS, "")
    ).cast("long")
    return (alnum + punct).cast("long")


def quality_score(text: Column, padded_lower: Column | None = None) -> Column:
    """Document quality heuristic: mean of three [0,1] components —
    length score (min(len/500, 1)), alpha ratio, stopword hit score
    (min(stopword_hits/10, 1)). Deterministic and SQL-expressible.
    ``padded_lower`` — an already-projected `padded_for_counts(lower(text))`
    column — lets callers that also run langid share the padded pass."""
    if padded_lower is None:
        padded_lower = padded_for_counts(F.lower(text))
    length_score = F.least(F.length(text) / 500.0, F.lit(1.0))
    alpha_ratio = _n_letters(text) / _total(text)
    stop_hits = sum(
        occurrence_count_padded(padded_lower, t) for t in LANG_MARKERS["en"]
    )
    stop_score = F.least(stop_hits / 10.0, F.lit(1.0))
    return F.when(F.length(text) == 0, 0.0).otherwise(
        (length_score + alpha_ratio + stop_score) / 3.0
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-normalized text
    (exact-dedup key)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary"))


def langid_scores(
    text: Column, padded_lower: Column | None = None
) -> dict[str, Column]:
    if padded_lower is None:
        padded_lower = padded_for_counts(F.lower(text))
    return {
        lang: sum(occurrence_count_padded(padded_lower, t) for t in toks).cast("long")
        for lang, toks in LANG_MARKERS.items()
    }


def langid_label(text: Column, padded_lower: Column | None = None) -> Column:
    """argmax language by stopword hits; ties -> lexicographic language order;
    zero hits -> 'und'.

    Implementation note (round-3 perf): the 20 stopword counts are
    expensive, and the earlier max/filter form referenced the score array
    several times — Catalyst inlines each reference (and a pushed-down
    filter predicate re-inlines the lot), multiplying the per-row string
    work ~6-12x. This form references every score exactly ONCE: sort a
    struct array by (score desc, tie-preference desc) and take the head,
    with an ('und', score 0, top preference) sentinel standing in for the
    "no hits" branch — scores are counts, so the sentinel wins iff every
    real score is 0, and ties between real languages still resolve to the
    lexicographically-first one."""
    scores = langid_scores(text, padded_lower)
    langs = sorted(scores)
    n = len(langs)
    entries = [
        F.struct(
            scores[lang].alias("score"),
            F.lit(n - i).alias("pref"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    entries.append(
        F.struct(
            F.lit(0).cast("long").alias("score"),
            F.lit(n + 1).alias("pref"),
            F.lit("und").alias("lang"),
        )
    )
    return F.sort_array(F.array(*entries), asc=False)[0]["lang"]


def documents_with_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full C1 confidence over the documents table: all four components as
    native Catalyst expressions, repetition via the map-only JVM
    `longest_run_expr` — the whole query is one projection.

    The projection is compute-bound (4 regex passes per document), so when
    the scan yields fewer partitions than the cluster has cores (a single
    small parquet footer at test scale), we spread rows first: a tiny
    exchange buys full-width codegen execution. At production scale the
    scan is already wide and the branch is a no-op."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    width = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < width:
        docs = docs.repartition(width)
    t = F.col("text")
    # r7: materialize each RAW component into a column first, then round and
    # combine from the COLUMNS — passing the expression trees into
    # combined_confidence evaluated every component twice (codegen
    # subexpression elimination does not cover the higher-order/translate
    # mix; measured ~0.9s of the 2.3s wall at sf1.0). CollapseProject keeps
    # the boundary because each alias is referenced more than once.
    raw = docs.select(
        "doc_id",
        t.alias("text"),
        char_frequency_score(t).alias("_char"),
        word_lengths_score(t).alias("_word"),
        whitespace_score(t).alias("_ws"),
        longest_run_expr(t).alias("longest_run"),
    )
    rep_s = repetition_score_from_run(F.col("longest_run"))
    return raw.select(
        "doc_id",
        F.round(F.col("_char"), 9).alias("char_score"),
        F.round(F.col("_word"), 9).alias("word_score"),
        F.round(F.col("_ws"), 9).alias("ws_score"),
        F.col("longest_run"),
        F.round(rep_s, 9).alias("rep_score"),
        F.round(
            combined_confidence(
                F.col("_char"), F.col("_word"), F.col("_ws"), rep_s, t
            ),
            9,
        ).alias("confidence"),
    )
