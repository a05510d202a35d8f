"""Confidence heuristics — faithful reimplementation of the reference's
``calculate_confidence`` stack (`rust/src/engines/ocrs.rs:284-403`, semantics
inventoried in SURVEY.md §2.5 C1-C5).

All functions are pure and operate on one text; vectorized callers map them
over Arrow batches. Character classes follow the Rust originals:

* "alphabetic"  -> Unicode Alphabetic (Python ``str.isalpha`` is the same set
  for all practical codepoints),
* "alphanumeric" -> Unicode alphanumeric (``str.isalnum``),
* "whitespace"  -> Unicode whitespace (``str.isspace``),
* "ASCII punctuation" -> the fixed 32-char ASCII punctuation set
  (Rust ``char::is_ascii_punctuation``).

Length guards use the count of *Unicode scalar values* (Python ``len(str)``).
The Rust original's ``text.len()`` counts UTF-8 bytes; our corpus is
ASCII-dominant where the two agree, and the oracle and kernel share this exact
module so byte-identity is structural (SURVEY.md §7.3).
"""

from __future__ import annotations

import re

_ASCII_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


class _ClassTable(dict):
    """Lazy codepoint -> character-class map for ``str.translate``.

    Classifying via one C-speed translate + ``str.count`` replaced the
    per-character Python loops that profiled at ~50% of extraction wall
    time (round 3). Class priority mirrors the original branch order:
    alpha > alnum > space > ASCII-punct > special — the COUNTS (and so
    every downstream score) are bit-identical to the loop form.
    """

    def __missing__(self, cp: int) -> int:
        ch = chr(cp)
        if ch.isalpha():
            v = 97  # 'a'
        elif ch.isalnum():
            v = 110  # 'n'
        elif ch.isspace():
            v = 115  # 's'
        elif ch in _ASCII_PUNCT:
            v = 112  # 'p'
        else:
            v = 120  # 'x'
        self[cp] = v
        return v


_CLASS = _ClassTable()

#: maximal runs (>= 4) of one identical non-whitespace char. re's \S is the
#: same predicate as str.isspace() (both Py_UNICODE_ISSPACE); runs <= 3 all
#: land in the same bucket, so only the rare long runs need materializing.
_RUN4 = re.compile(r"(\S)\1{3,}")


def analyze_char_frequency(text: str, _cls: str | None = None) -> float:
    """C2 (`ocrs.rs:306-327`): penalize "special" chars, reward letters.

    special = not alphanumeric, not whitespace, not ASCII punctuation.
    special_penalty = 1 - min(special_ratio * 10, 1)
    letter_score   = min(letters/total * 1.5, 1)
    result = 0.6 * special_penalty + 0.4 * letter_score
    """
    total = len(text)
    if total == 0:
        return 0.0
    cls = text.translate(_CLASS) if _cls is None else _cls
    letters = cls.count("a")
    specials = cls.count("x")
    special_ratio = specials / total
    special_penalty = 1.0 - min(special_ratio * 10.0, 1.0)
    letter_score = min(letters / total * 1.5, 1.0)
    return 0.6 * special_penalty + 0.4 * letter_score


def analyze_word_lengths(text: str) -> float:
    """C3 (`ocrs.rs:332-356`): bucket avg word length, penalize 1-char words.

    Bucket (avg length truncated to int): 0-1 -> 0.3, 2-3 -> 0.7, 4-8 -> 1.0,
    9-12 -> 0.8, else 0.4. penalty = 1 - min(single_char_ratio * 1.5, 0.5).
    Result = bucket * penalty; empty split -> 0.5.
    """
    words = text.split()
    if not words:
        return 0.5
    lens = list(map(len, words))
    avg = sum(lens) / len(words)
    a = int(avg)
    if a <= 1:
        base = 0.3
    elif a <= 3:
        base = 0.7
    elif a <= 8:
        base = 1.0
    elif a <= 12:
        base = 0.8
    else:
        base = 0.4
    single_ratio = lens.count(1) / len(words)
    penalty = 1.0 - min(single_ratio * 1.5, 0.5)
    return base * penalty


def analyze_whitespace(text: str, _cls: str | None = None) -> float:
    """C4 (`ocrs.rs:361-377`): bucket the whitespace percentage.

    pct (truncated to int): 0-5 -> 0.5, 6-10 -> 0.8, 11-25 -> 1.0,
    26-40 -> 0.7, else 0.3.
    """
    total = len(text)
    if total == 0:
        return 0.0
    cls = text.translate(_CLASS) if _cls is None else _cls
    ws = cls.count("s")
    pct = int(ws / total * 100.0)
    if pct <= 5:
        return 0.5
    if pct <= 10:
        return 0.8
    if pct <= 25:
        return 1.0
    if pct <= 40:
        return 0.7
    return 0.3


def detect_repetition(text: str) -> float:
    """C5 (`ocrs.rs:382-403`): longest run of identical non-whitespace chars.

    Run length bucket: <=3 -> 1.0, 4-5 -> 0.8, 6-10 -> 0.5, else 0.2.
    """
    longest = 0
    for m in _RUN4.finditer(text):
        n = m.end() - m.start()
        if n > longest:
            longest = n
    if longest <= 3:  # no run of 4+: every run is in the top bucket
        return 1.0
    if longest <= 5:
        return 0.8
    if longest <= 10:
        return 0.5
    return 0.2


def calculate_confidence(text: str) -> float:
    """C1 (`ocrs.rs:284-301`): the combined heuristic.

    "" -> 0.0; len < 5 -> 0.5;
    else clamp(0.40*char + 0.30*word + 0.15*ws + 0.15*rep, 0, 1).
    """
    if not text:
        return 0.0
    if len(text) < 5:
        return 0.5
    cls = text.translate(_CLASS)  # classify once, share across C2/C4
    conf = (
        0.40 * analyze_char_frequency(text, _cls=cls)
        + 0.30 * analyze_word_lengths(text)
        + 0.15 * analyze_whitespace(text, _cls=cls)
        + 0.15 * detect_repetition(text)
    )
    return min(max(conf, 0.0), 1.0)


#: Confidence assigned when a PDF's embedded text layer passes the >10-char
#: gate and OCR is skipped entirely (`ocrs.rs:142`).
PDF_TEXT_LAYER_CONFIDENCE = 0.95
