"""Unit tests: HTML main-content extraction (the graft branch — text-density +
link-density boilerplate strip per BASELINE.json north_star)."""

import pytest

from activestorage_ocr_spark.engine import htmlx


PAGE = b"""<!DOCTYPE html>
<html><head><title>T</title><meta charset="utf-8">
<style>body { color: red }</style>
<script>var x = "<p>not content</p>";</script>
</head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></nav>
<div class="sidebar"><p>This sidebar paragraph is long enough to pass length rules.</p></div>
<main>
  <h1>Article Title</h1>
  <p>This is the first real paragraph of the article body with plenty of text.</p>
  <p>Second paragraph here, also containing a healthy amount of content text.</p>
  <ul><li>A list item with enough characters to be kept as content.</li>
  <li>short</li></ul>
</main>
<div class="ad-banner"><p>Buy things now with this very long advertisement text!</p></div>
<footer><p>Copyright 2025 Example Corp. All rights reserved worldwide today.</p></footer>
</body></html>"""


class TestExtraction:
    def test_main_content_kept_boilerplate_dropped(self):
        text, spans = htmlx.extract_main_content(PAGE)
        assert "first real paragraph" in text
        assert "Second paragraph" in text
        assert "Article Title" in text
        assert "A list item with enough characters" in text
        # dropped: nav links, sidebar, ad, footer, script/style payloads
        assert "Home" not in text
        assert "sidebar paragraph" not in text
        assert "advertisement" not in text
        assert "Copyright" not in text
        assert "color: red" not in text
        assert "not content" not in text
        # short li dropped by length rule
        assert "short" not in text

    def test_blocks_joined_with_newline(self):
        text, _ = htmlx.extract_main_content(PAGE)
        lines = text.split("\n")
        assert lines[0] == "Article Title"
        assert lines[1].startswith("This is the first real paragraph")

    def test_spans_cover_text_exactly(self):
        text, spans = htmlx.extract_main_content(PAGE)
        assert spans, "expected spans"
        for start, end, kind in spans:
            assert 0 <= start <= end <= len(text)
            assert kind in ("heading", "block")
            assert text[start:end] == text[start:end].strip()
        # spans tile the text: gaps are exactly the "\n" separators
        assert spans[0][0] == 0
        for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
            assert s2 == e1 + 1
        assert spans[-1][1] == len(text)
        # the first span is the heading
        assert spans[0][2] == "heading"
        assert text[spans[0][0] : spans[0][1]] == "Article Title"

    def test_link_density_drops_linky_blocks(self):
        page = (
            b"<html><body><p><a href='/x'>Click here for more links and stuff"
            b" and even more link text</a> y</p>"
            b"<p>A normal paragraph with no links at all, plenty of words here.</p>"
            b"</body></html>"
        )
        text, _ = htmlx.extract_main_content(page)
        assert "Click here" not in text
        assert "normal paragraph" in text

    def test_entities_decoded(self):
        page = b"<html><body><p>Fish &amp; chips &lt;cost&gt; &#163;5 &#x41;lways tasty here.</p></body></html>"
        text, _ = htmlx.extract_main_content(page)
        assert "Fish & chips <cost> \xa35 Always tasty here." == text

    def test_whitespace_collapsed_and_trimmed(self):
        page = b"<html><body><p>  spaced   out\n\n  text   that is long enough to keep  </p></body></html>"
        text, _ = htmlx.extract_main_content(page)
        assert text == "spaced out text that is long enough to keep"

    def test_charset_sniff_latin1(self):
        body = "<html><head><meta charset=\"latin-1\"></head><body><p>Caf\xe9 au lait menu costs very little money.</p></body></html>"
        text, _ = htmlx.extract_main_content(body.encode("latin-1"))
        assert "Café au lait" in text

    def test_empty_and_textless_pages(self):
        assert htmlx.extract_main_content(b"<html><body></body></html>") == ("", [])
        text, spans = htmlx.extract_main_content(b"<html><body><p>tiny</p></body></html>")
        assert text == "" and spans == []

    def test_deterministic(self):
        a = htmlx.extract_main_content(PAGE)
        b = htmlx.extract_main_content(PAGE)
        assert a == b

    def test_nested_boilerplate_subtree_fully_dropped(self):
        page = (
            b"<html><body><div class='footer'><div><p>Deep footer text that is"
            b" definitely long enough to pass.</p></div></div>"
            b"<p>Real content paragraph that should certainly be preserved here.</p></body></html>"
        )
        text, _ = htmlx.extract_main_content(page)
        assert "Deep footer" not in text
        assert "Real content" in text


class TestSelfClosingRawText:
    def test_self_closing_svg_does_not_swallow_rest(self):
        # ADVICE r1: `<svg/>` used to trigger a scan for a nonexistent
        # `</svg>` and silently drop everything after it.
        page = (
            b"<html><body><main>"
            b"<p>Before the vector graphic, a long paragraph of real text.</p>"
            b"<svg/>"
            b"<p>After the vector graphic, another long paragraph survives.</p>"
            b"</main></body></html>"
        )
        text, _ = htmlx.extract_main_content(page)
        assert "Before the vector graphic" in text
        assert "After the vector graphic, another long paragraph survives" in text

    def test_paired_raw_text_still_skipped(self):
        page = (
            b"<html><body><main>"
            b"<p>Real content paragraph long enough to be kept in output.</p>"
            b"<svg><text>vector payload must not leak</text></svg>"
            b"<p>Trailing content paragraph long enough to be kept as well.</p>"
            b"</main></body></html>"
        )
        text, _ = htmlx.extract_main_content(page)
        assert "vector payload" not in text
        assert "Trailing content paragraph" in text


class TestBomDecoding:
    def test_utf16_le_bom(self):
        from activestorage_ocr_spark.engine.htmlx import decode_payload

        html = "<html><body><p>héllo wörld UTF sixteen</p></body></html>"
        assert decode_payload(b"\xff\xfe" + html.encode("utf-16-le")) == html
        assert decode_payload(b"\xfe\xff" + html.encode("utf-16-be")) == html

    def test_utf8_bom_stripped(self):
        from activestorage_ocr_spark.engine.htmlx import decode_payload

        html = "<p>plain</p>"
        assert decode_payload(b"\xef\xbb\xbf" + html.encode()) == html

    def test_bom_beats_declared_charset(self):
        from activestorage_ocr_spark.engine.htmlx import decode_payload

        html = '<meta charset="latin-1"><p>ünïcode</p>'
        assert decode_payload(b"\xff\xfe" + html.encode("utf-16-le")) == html

    def test_utf16_page_extracts(self):
        from activestorage_ocr_spark.engine.extract import extract_document

        html = ("<html><body><main><p>A perfectly long paragraph of sixteen "
                "bit encoded honest content words.</p></main></body></html>")
        r = extract_document(b"\xff\xfe" + html.encode("utf-16-le"))
        assert r["status"] == "ok"
        assert "sixteen" in r["extracted_text"]


class TestTokenizerInvariants:
    """Property-style invariants over adversarial fragment soup: the
    tokenizer never crashes, spans always index the returned text exactly,
    and kept block text never contains markup."""

    def test_fragment_soup_invariants(self):
        import random

        from activestorage_ocr_spark.engine.htmlx import extract_main_content

        rng = random.Random(1234)
        frags = ["<p>", "</p>", "<div class=x>", "</div>", "a<b", "1 < 2",
                 "&amp;", "&am", "p;", "<script>var x='<p>hi</p>';</script>",
                 "<a href='x'>link text</a>", "< notatag", "<", "<br/>",
                 "<h1>", "</h1>", "honest words here ", "&#65;",
                 "<nav id=menu>", "</nav>", "<SPAN>", "</span>", "<p", ">",
                 "<style>p{}</style>", "é世", "<!-- c -->", "<!doctype html>",
                 "<img src=x>", "<template><p>t</p></template>"]
        for _ in range(500):
            s = "".join(rng.choice(frags) for _ in range(rng.randint(1, 50)))
            text, spans = extract_main_content(s.encode())
            for start, end, kind in spans:
                assert 0 <= start < end <= len(text)
                assert kind in ("heading", "block")
                piece = text[start:end]
                assert "<script" not in piece and "<style" not in piece
            # spans tile the text in order, separated by single newlines
            last = 0
            for start, end, _ in spans:
                assert start in (0, last + 1)
                last = end
            if spans:
                assert last == len(text)


class TestLegacyCharsets:
    # the legacy encodings a real crawl is full of: any text codec the
    # stdlib resolves is honored (BOM still wins; junk labels fall back)
    @pytest.mark.parametrize(
        "enc,body",
        [
            ("gbk", "中文网页的正文内容在这里继续很长一段"),
            ("shift_jis", "日本語のページ本文がここにあります"),
            ("windows-1251", "Русский текст страницы находится здесь"),
            ("euc-kr", "한국어 페이지 본문이 여기에 있습니다"),
            ("iso-8859-2", "Zażółć gęślą jaźń każdego dnia"),
            ("big5", "繁體中文頁面的內容在此處繼續"),
        ],
    )
    def test_declared_charset_decodes(self, enc, body):
        from activestorage_ocr_spark.engine.extract import extract_document

        html = (
            f'<html><head><meta charset="{enc}"></head><body><p>'.encode()
            + body.encode(enc)
            + b" extra latin words to pass gates</p></body></html>"
        )
        r = extract_document(html)
        assert body in r["extracted_text"]

    def test_pseudo_codec_label_falls_back(self):
        from activestorage_ocr_spark.engine.extract import extract_document

        bad = (
            b'<html><head><meta charset="hex"></head><body><p>'
            b"Fallback body with many plain words here.</p></body></html>"
        )
        r = extract_document(bad)
        assert "Fallback body" in r["extracted_text"]


class TestNamedEntities:
    def test_whatwg_table(self):
        from activestorage_ocr_spark.engine.extract import extract_document

        html = (
            b"<html><body><p>Caf&eacute; costs 5&nbsp;&euro; &mdash; "
            b"&ldquo;cheap&rdquo; &Ouml;sterreich &hellip; &copy; 2024 "
            b"with plenty of words</p></body></html>"
        )
        r = extract_document(html)
        t = r["extracted_text"]
        assert "Café costs 5 €" in t
        assert "—" in t and "“cheap”" in t
        assert "Österreich" in t and "©" in t and "…" in t
        assert "\xa0" not in t  # nbsp normalizes to a plain space

    def test_case_sensitivity_and_unknown(self):
        from activestorage_ocr_spark.engine.htmlx import extract_main_content

        t, _spans = extract_main_content(
            b"<html><body><p>&Delta; and &delta; differ; &bogusname; "
            b"stays literal in this long enough sentence.</p></body></html>"
        )
        assert "Δ" in t and "δ" in t
        assert "&bogusname;" in t
