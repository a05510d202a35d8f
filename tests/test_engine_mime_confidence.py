"""Unit tests: MIME sniff (P2) and confidence heuristics (C1-C5).

Mirrors the reference's inline confidence tests
(`rust/src/engines/ocrs.rs:672-760`) case-for-case where semantics are pinned
in SURVEY.md §2.5.
"""

import pytest

from activestorage_ocr_spark.engine import mime as mimex
from activestorage_ocr_spark.engine.confidence import (
    analyze_char_frequency,
    analyze_whitespace,
    analyze_word_lengths,
    calculate_confidence,
    detect_repetition,
)


class TestSniff:
    @pytest.mark.parametrize(
        "payload,expected",
        [
            (b"%PDF-1.4 junk", "application/pdf"),
            (b"\x89PNG\r\n\x1a\n rest", "image/png"),
            (b"\xff\xd8\xff\xe0 rest", "image/jpeg"),
            (b"GIF87a rest", "image/gif"),
            (b"GIF89a rest", "image/gif"),
            (b"BM rest", "image/bmp"),
            (b"RIFF\x00\x00\x00\x00WEBP", "image/webp"),
            (b"II*\x00 rest", "image/tiff"),
            (b"MM\x00* rest", "image/tiff"),
            (b"<!DOCTYPE html><html></html>", "text/html"),
            (b"  \n <HTML><body>x</body>", "text/html"),
            (b"<div>hello</div>", "text/html"),
            (b"\x00\x01\x02\x03 garbage", "application/octet-stream"),
            (b"", "application/octet-stream"),
            (b"plain text no markup at all", "application/octet-stream"),
        ],
    )
    def test_sniff(self, payload, expected):
        assert mimex.sniff_mime(payload) == expected

    def test_supported_vocabulary(self):
        # the reference's 7 types (configuration.rb:105-115) + text/html
        assert len(mimex.SUPPORTED_MIMES) == 8
        assert "application/pdf" in mimex.SUPPORTED_MIMES
        assert "text/html" in mimex.SUPPORTED_MIMES


class TestConfidence:
    def test_empty_returns_zero(self):
        assert calculate_confidence("") == 0.0

    def test_short_returns_half(self):
        assert calculate_confidence("ab") == 0.5
        assert calculate_confidence("abcd") == 0.5

    def test_normal_text_high(self):
        c = calculate_confidence("The quick brown fox jumps over the lazy dog")
        assert 0.8 <= c <= 1.0

    def test_garbage_text_low(self):
        garbage = "§¶ †‡ ¥© ®™ §¶ †‡"
        clean = "The quick brown fox jumps"
        assert calculate_confidence(garbage) < 0.5
        assert calculate_confidence(garbage) < calculate_confidence(clean)
        # char-frequency component alone collapses on specials
        assert analyze_char_frequency("§¶†‡¥©®™") == pytest.approx(0.0)

    def test_clamped_to_unit_interval(self):
        for t in ["aaaa bbbb cccc dddd", "x" * 500, "!!! ??? ;;;"]:
            assert 0.0 <= calculate_confidence(t) <= 1.0

    def test_char_frequency_pure_letters(self):
        # all letters, no specials: 0.6*1 + 0.4*min(1.5,1) = 1.0
        assert analyze_char_frequency("abcdef") == pytest.approx(1.0)

    def test_char_frequency_specials_penalized(self):
        # 50% specials -> penalty 0; letters 50% -> 0.4*min(0.75,1)=0.3
        assert analyze_char_frequency("ab§¶") == pytest.approx(0.3)

    def test_char_frequency_ascii_punct_not_special(self):
        assert analyze_char_frequency("ab.,!?") > analyze_char_frequency("ab§¶†‡")

    def test_word_lengths_buckets(self):
        assert analyze_word_lengths("hello world spark") == pytest.approx(1.0)  # avg 5.33 -> 1.0
        assert analyze_word_lengths("ab cd ef") == pytest.approx(0.7)  # avg 2 -> 0.7
        assert analyze_word_lengths("") == pytest.approx(0.5)  # empty split
        # single-char words penalized: avg 1 -> base 0.3, ratio 1 -> penalty 0.5
        assert analyze_word_lengths("a b c") == pytest.approx(0.15)

    def test_whitespace_buckets(self):
        # "abcdefghi j" -> 1 ws / 11 chars = 9% -> 0.8
        assert analyze_whitespace("abcdefghi j") == pytest.approx(0.8)
        # 20% ws -> 1.0
        assert analyze_whitespace("abcd abcd ") == pytest.approx(1.0)
        # no ws -> 0.5
        assert analyze_whitespace("abcdefgh") == pytest.approx(0.5)
        # half ws (50%) -> 0.3
        assert analyze_whitespace("a a a a ") == pytest.approx(0.3)

    def test_repetition_buckets(self):
        assert detect_repetition("abcabc") == pytest.approx(1.0)
        assert detect_repetition("aaaa bc") == pytest.approx(0.8)  # run 4
        assert detect_repetition("aaaaaaa x") == pytest.approx(0.5)  # run 7
        assert detect_repetition("a" * 20) == pytest.approx(0.2)
        # whitespace resets runs
        assert detect_repetition("aa aa aa aa") == pytest.approx(1.0)

    def test_formula_weights(self):
        t = "The quick brown fox jumps over the lazy dog"
        expected = (
            0.40 * analyze_char_frequency(t)
            + 0.30 * analyze_word_lengths(t)
            + 0.15 * analyze_whitespace(t)
            + 0.15 * detect_repetition(t)
        )
        assert calculate_confidence(t) == pytest.approx(min(max(expected, 0.0), 1.0))


class TestConfidenceFastPathEquivalence:
    """Round-3 perf rewrite (translate/regex instead of per-char loops):
    bit-identical scores vs the original loop forms on adversarial inputs."""

    @staticmethod
    def _ref_char_frequency(text):
        from activestorage_ocr_spark.engine.confidence import _ASCII_PUNCT
        total = len(text)
        if total == 0:
            return 0.0
        specials = letters = 0
        for ch in text:
            if ch.isalpha():
                letters += 1
            elif not ch.isalnum() and not ch.isspace() and ch not in _ASCII_PUNCT:
                specials += 1
        return 0.6 * (1.0 - min(specials / total * 10.0, 1.0)) + 0.4 * min(
            letters / total * 1.5, 1.0
        )

    @staticmethod
    def _ref_whitespace(text):
        total = len(text)
        if total == 0:
            return 0.0
        pct = int(sum(1 for ch in text if ch.isspace()) / total * 100.0)
        return 0.5 if pct <= 5 else 0.8 if pct <= 10 else 1.0 if pct <= 25 \
            else 0.7 if pct <= 40 else 0.3

    @staticmethod
    def _ref_repetition(text):
        longest = run = 0
        prev = None
        for ch in text:
            if ch.isspace():
                prev = None
                run = 0
                continue
            run = run + 1 if ch == prev else 1
            prev = ch
            longest = max(longest, run)
        return 1.0 if longest <= 3 else 0.8 if longest <= 5 else 0.5 \
            if longest <= 10 else 0.2

    def _cases(self):
        import random

        rng = random.Random(42)
        pools = [
            "abcdefgh ABZ 0123",
            " \t\n  \x1c\x85",  # exotic unicode whitespace
            "!@#$%^&*()_+{}|\\\"'",
            "é世界Ж\U0001f600\U00010400",  # unicode alpha + emoji
            "aaaa bbbbbb cccccccccccc",
        ]
        cases = ["", "a", "    ", "aaaa", "ab" * 500]
        for _ in range(300):
            pool = rng.choice(pools) + rng.choice(pools)
            cases.append("".join(rng.choice(pool) for _ in range(rng.randint(1, 200))))
        return cases

    def test_bit_identical_scores(self):
        from activestorage_ocr_spark.engine import confidence as c

        for t in self._cases():
            assert c.analyze_char_frequency(t) == self._ref_char_frequency(t), repr(t)
            assert c.analyze_whitespace(t) == self._ref_whitespace(t), repr(t)
            assert c.detect_repetition(t) == self._ref_repetition(t), repr(t)
