"""Language dimension tests (E8 / the reference's per-request `languages`
multipart field, `rust/src/server.rs:157-181` + `leptess.rs:227-245`)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from activestorage_ocr_spark.engine import extract as ex, pdfx, rasters


def _png(text):
    return rasters.encode_png(rasters.render_text(text, scale=2))


class TestOcrLanguagePacks:
    def test_two_languages_produce_different_pinned_outputs(self):
        img = rasters.render_text("GRÜßE ÉCOLE", scale=2)
        eng, _ = rasters.ocr_decode_image(img)
        deu, _ = rasters.ocr_decode_image(img, ("eng", "deu"))
        fra, _ = rasters.ocr_decode_image(img, ("eng", "fra"))
        # unloaded packs degrade accents to the nearest base shape or '?'
        assert eng == "GRUBE ECOLE"
        assert deu == "GRÜßE ECOLE"
        assert fra == "GRUBE ÉCOLE"
        both, _ = rasters.ocr_decode_image(img, ("deu", "fra"))
        assert both == "GRÜßE ÉCOLE"

    def test_spanish_pack(self):
        img = rasters.render_text("AÑO ÁGIL", scale=2)
        spa, _ = rasters.ocr_decode_image(img, ("spa",))
        assert spa == "AÑO ÁGIL"

    def test_dutch_pack(self):
        # round 4: nld — the sixth (and last latin-script) language pack
        img = rasters.render_text("RĲST ÉÉN IDEEËN", scale=2)
        nld, _ = rasters.ocr_decode_image(img, ("nld",))
        assert nld == "RĲST ÉÉN IDEEËN"
        eng, _ = rasters.ocr_decode_image(img)
        assert "Ë" not in eng and "Ĳ" not in eng  # pack not loaded -> degrades

    def test_all_glyphs_unique_across_packs(self):
        # the import-time collision check covers this; pin it explicitly.
        # The Cyrillic homoglyph aliases are render-only and DELIBERATELY
        # share latin bitmaps (added after the check), so exclude them.
        real = {
            ch: g
            for ch, g in rasters._ALL_GLYPHS.items()
            if ch not in rasters.CYRILLIC_HOMOGLYPHS
        }
        rasters._build_tables(real)
        with pytest.raises(AssertionError, match="font collision"):
            rasters._build_tables(rasters._ALL_GLYPHS)


class TestExtractLanguages:
    def test_languages_field_threads_to_ocr(self):
        png = _png("ÜBER 9")
        # pixelocr-alt = leptess analog: packs honored
        r = ex.extract_document(png, engine="pixelocr-alt", languages="eng+deu")
        assert r["extracted_text"] == "ÜBER 9"
        r2 = ex.extract_document(png, engine="pixelocr-alt", languages="eng")
        assert r2["extracted_text"] == "UBER 9"

    def test_pixelocr_ignores_languages_like_ocrs(self):
        # the reference's ocrs engine is English-only and ignores the field
        png = _png("ÜBER 9")
        r = ex.extract_document(png, engine="pixelocr", languages="deu")
        assert r["extracted_text"] == "UBER 9"

    def test_unknown_language_is_invalid_request(self):
        r = ex.extract_document(_png("HI"), engine="pixelocr-alt", languages="xyz")
        assert r["status"] == ex.E_INVALID
        assert any("unsupported language" in w for w in r["warnings"])

    def test_none_defaults_to_eng(self):
        r = ex.extract_document(_png("HELLO"), languages=None)
        assert r["extracted_text"] == "HELLO"

    def test_pdf_ocr_fallback_honors_languages(self):
        gray = rasters.render_text("ÖL 5", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "DeviceGray")])
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="deu")
        assert r["extracted_text"] == "ÖL 5"
        # without the pack, the resampled Ö fuzzy-matches U (pinned)
        r2 = ex.extract_document(pdf, engine="pixelocr-alt", languages="eng")
        assert r2["extracted_text"] == "UL 5"


class TestPerEngineInfo:
    def test_info_lists_engine_detail(self):
        info = ex.pipeline_info()
        engines = {e["name"]: e for e in info["available_engines"]}
        assert set(engines) == {"pixelocr", "pixelocr-alt"}
        # ocrs analog: English only (`ocrs.rs:270-273`)
        assert engines["pixelocr"]["supported_languages"] == ["eng"]
        # leptess analog: the 13 reported languages (`leptess.rs:227-245`)
        assert len(engines["pixelocr-alt"]["supported_languages"]) == 13
        for e in engines.values():
            assert e["description"]
            assert len(e["supported_formats"]) == 8
        assert info["default_language"] == "eng"

    def test_supported_languages_match_reference_list(self):
        assert rasters.SUPPORTED_LANGUAGES == (
            "eng", "deu", "fra", "spa", "ita", "por", "nld",
            "jpn", "chi_sim", "chi_tra", "kor", "ara", "rus",
        )


def test_health_probe():
    h = ex.health()
    assert h == {"status": "ok", "version": "0.1.0"}


class TestRound3Packs:
    def test_italian_pack(self):
        img = rasters.render_text("PERÒ GIÙ LÌ È", scale=2)
        ita, _ = rasters.ocr_decode_image(img, ("ita",))
        assert ita == "PERÒ GIÙ LÌ È"
        eng, _ = rasters.ocr_decode_image(img)
        assert "Ò" not in eng and "Ù" not in eng  # pack not loaded -> degraded

    def test_portuguese_pack(self):
        img = rasters.render_text("AÇÃO VÕES VÊ", scale=2)
        por, _ = rasters.ocr_decode_image(img, ("por",))
        assert por == "AÇÃO VÕES VÊ"

    def test_shared_chars_agree_across_packs(self):
        # Ç is in fra AND por, È in fra AND ita: identical bitmaps, so both
        # requests recognize them identically
        img = rasters.render_text("ÇÈ", scale=2)
        fra, _ = rasters.ocr_decode_image(img, ("fra",))
        ita_por, _ = rasters.ocr_decode_image(img, ("ita", "por"))
        assert fra == "ÇÈ" == ita_por


class TestRussianPack:
    # round 5: the first non-latin pack — real non-ASCII codepoints through
    # rasterize -> OCR -> byte-identity, including the homoglyph resolution
    # rule (script-ambiguous shapes decode as Cyrillic when rus is requested
    # without eng)

    PANGRAM = "СЪЕШЬ ЕЩЕ ЭТИХ МЯГКИХ ФРАНЦУЗСКИХ БУЛОК"

    def test_pangram_round_trip_three_scales(self):
        for scale in (1, 2, 3):
            img = rasters.render_text(self.PANGRAM, scale=scale)
            rus, warn = rasters.ocr_decode_image(img, ("rus",))
            assert rus == self.PANGRAM, f"scale {scale}: {rus!r}"
            assert warn == []

    def test_distinct_letters_round_trip(self):
        # every non-homoglyph glyph in the pack, one word each
        img = rasters.render_text("БГД ЖЗИ ЙЛП ФЦЧ ШЩЪ ЫЬЭ ЮЯ", scale=2)
        rus, _ = rasters.ocr_decode_image(img, ("rus",))
        assert rus == "БГД ЖЗИ ЙЛП ФЦЧ ШЩЪ ЫЬЭ ЮЯ"

    def test_homoglyphs_decode_latin_in_eng_context(self):
        # А В Е К М Н О Р С Т У Х share bitmaps with latin: an eng-context
        # decode yields the latin codepoints (exact-table hit, no warning)
        img = rasters.render_text("СТО", scale=2)
        eng, warn = rasters.ocr_decode_image(img)
        assert eng == "CTO"
        assert warn == []
        # with both scripts requested, latin wins (first-script preference)
        both, _ = rasters.ocr_decode_image(img, ("eng", "rus"))
        assert both == "CTO"

    def test_mixed_script_document(self):
        # rus-only context: latin-shaped input reads as Cyrillic — the
        # documented deterministic analog of tesseract -l rus on ASCII
        img = rasters.render_text("MOCKBA", scale=2)
        rus, _ = rasters.ocr_decode_image(img, ("rus",))
        assert rus == "МОСКВА"

    def test_e2e_pdf_ocr_byte_identity(self):
        gray = rasters.render_text("РУССКИЙ ЯЗЫК ЖИВ", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "DeviceGray")])
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="rus")
        assert r["status"] == "ok"
        assert r["extracted_text"] == "РУССКИЙ ЯЗЫК ЖИВ"

    def test_e2e_png_with_scanned_codec(self):
        # non-ASCII through a round-4 codec path too: G4-encoded image PDF
        gray = rasters.render_text("ЖЕЛЕЗНЫЙ ПУТЬ", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "G4")], encrypt="aes256")
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="rus")
        assert r["status"] == "ok"
        assert r["extracted_text"] == "ЖЕЛЕЗНЫЙ ПУТЬ"

    def test_pipeline_info_reports_rus(self):
        info = ex.pipeline_info()
        alt = {e["name"]: e for e in info["available_engines"]}["pixelocr-alt"]
        assert "rus" in alt["supported_languages"]

    def test_normalize_renderable_uppercases_cyrillic(self):
        assert rasters.normalize_renderable("съешь же") == "СЪЕШЬ ЖЕ"


class TestJapanesePack:
    # round 5: second non-latin pack — the base 46 katakana + long-vowel
    # mark. Dakuten/handakuten voiced forms and small kana are outside the
    # pixel font and degrade to '?' (documented, same as unloaded accents).

    GOJUON = (
        "アイウエオ カキクケコ サシスセソ タチツテト ナニヌネノ\n"
        "ハヒフヘホ マミムメモ ヤユヨ ラリルレロ ワヲン ー"
    )

    def test_full_gojuon_round_trip_three_scales(self):
        for scale in (1, 2, 3):
            img = rasters.render_text(self.GOJUON, scale=scale)
            jpn, warn = rasters.ocr_decode_image(img, ("jpn",))
            assert jpn == self.GOJUON, f"scale {scale}"
            assert warn == []

    def test_confusable_pairs_stay_distinct(self):
        # the classic near-identical pairs must decode exactly
        img = rasters.render_text("シツ ソン クタ ワウ", scale=2)
        jpn, _ = rasters.ocr_decode_image(img, ("jpn",))
        assert jpn == "シツ ソン クタ ワウ"

    def test_e2e_pdf_ocr_byte_identity(self):
        gray = rasters.render_text("トーキヨー テキスト", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "JBIG2S")])
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="jpn")
        assert r["status"] == "ok"
        assert r["extracted_text"] == "トーキヨー テキスト"

    def test_unloaded_pack_degrades(self):
        img = rasters.render_text("カナ", scale=2)
        eng, _ = rasters.ocr_decode_image(img)
        assert "カ" not in eng and "ナ" not in eng

    def test_rus_and_jpn_coexist(self):
        img = rasters.render_text("ЖИВ カナ", scale=2)
        both, _ = rasters.ocr_decode_image(img, ("rus", "jpn"))
        assert both == "ЖИВ カナ"

    # r6 upgrade: voiced kana no longer degrade — they decompose to
    # base + spacing voicing mark for rendering and re-compose on
    # recognition (the katakana analog of the hangul jamo treatment)

    def test_voiced_forms_round_trip_three_scales(self):
        t = "ガギグゲゴ ザジズゼゾ ダヂヅデド バビブベボ パピプペポ ヴ"
        for scale in (1, 2, 3):
            img = rasters.render_text(t, scale=scale)
            jpn, warn = rasters.ocr_decode_image(img, ("jpn",))
            assert jpn == t, f"scale {scale}: {jpn!r}"
            assert warn == []

    def test_voiced_and_unvoiced_mix(self):
        t = "トーキヨー デンキ 100 パーセント"
        got, _ = rasters.ocr_decode_image(
            rasters.render_text(t, scale=2), ("eng", "jpn")
        )
        assert got == t

    def test_orphan_voicing_mark_passes_through(self):
        # a mark with no voiceable base stays a mark (safe on arbitrary
        # OCR output, same posture as compose_hangul)
        assert rasters.compose_kana("゛A") == "゛A"
        assert rasters.compose_kana("ン゜") == "ン゜"  # n has no voiced form

    def test_voiced_forms_still_degrade_without_pack(self):
        eng, _ = rasters.ocr_decode_image(rasters.render_text("ガ", scale=2))
        assert "ガ" not in eng and "カ" not in eng


class TestKoreanPack:
    # round 6: third non-latin pack and the first with ALGORITHMIC
    # composition — hangul syllables decompose to a linear jamo sequence
    # for rendering (a 5x7 cell cannot stack a syllable block) and
    # recognition recomposes jamo into syllables when kor is requested,
    # restoring byte identity. Doubled jamo (ㄲㄸㅃㅆㅉ) are atomic glyphs:
    # expanding them would make 악까 / 앆가 decompose identically.

    SENTENCE = "한국어 텍스트 추출 검사 2024"

    def test_sentence_round_trip_three_scales(self):
        for scale in (1, 2, 3):
            img = rasters.render_text(self.SENTENCE, scale=scale)
            kor, warn = rasters.ocr_decode_image(img, ("kor",))
            assert kor == self.SENTENCE, f"scale {scale}: {kor!r}"
            assert warn == []

    def test_all_syllables_decompose_compose_identity(self):
        # the full precomposed block, algorithmically: U+AC00..U+D7A3
        text = "".join(chr(c) for c in range(0xAC00, 0xD7A4))
        assert rasters.compose_hangul(rasters.decompose_hangul(text)) == text

    def test_lead_tail_ambiguity_resolved(self):
        # the cases that forced atomic doubled-jamo glyphs: tail+lead vs
        # doubled lead, complex tails vs next-syllable leads
        for t in ("악까", "앆가", "갉", "갈기", "값이", "갔다", "안아", "아나"):
            img = rasters.render_text(t, scale=2)
            kor, _ = rasters.ocr_decode_image(img, ("kor",))
            assert kor == t, t

    def test_compound_vowels_and_complex_tails(self):
        t = "왜 의자 궤도 쥐 와 몫 앓는 밟다 읊다"
        img = rasters.render_text(t, scale=2)
        kor, _ = rasters.ocr_decode_image(img, ("kor",))
        assert kor == t

    def test_compose_safe_on_arbitrary_jamo(self):
        # bare vowels / orphan consonants pass through unchanged
        assert rasters.compose_hangul("ㅏㅏ") == "ㅏㅏ"
        assert rasters.compose_hangul("ㄱ") == "ㄱ"
        assert rasters.compose_hangul("ABㄱㅏC") == "AB가C"

    def test_e2e_pdf_ocr_byte_identity(self):
        gray = rasters.render_text("서울 특별시 지도", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "DCTA")])  # through the r6 codec
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="kor")
        assert r["status"] == "ok"
        assert r["extracted_text"] == "서울 특별시 지도"

    def test_unloaded_pack_degrades(self):
        img = rasters.render_text("한글", scale=2)
        eng, _ = rasters.ocr_decode_image(img)
        assert "한" not in eng and "글" not in eng and "ㅎ" not in eng

    def test_mixed_with_latin_and_other_packs(self):
        img = rasters.render_text("SCAN 서울 カナ 7", scale=2)
        got, _ = rasters.ocr_decode_image(img, ("eng", "kor", "jpn"))
        assert got == "SCAN 서울 カナ 7"

    def test_pipeline_info_reports_kor(self):
        info = ex.pipeline_info()
        alt = {e["name"]: e for e in info["available_engines"]}["pixelocr-alt"]
        assert "kor" in alt["supported_languages"]


class TestArabicPack:
    # round 6: fourth non-latin pack and the first RIGHT-TO-LEFT script.
    # Logical-order text renders with maximal Arabic runs mirrored into
    # visual order; recognition (always a left-to-right column scan)
    # re-mirrors them back when ara is requested — the mirror is an
    # involution, so one function serves both directions and byte
    # identity survives the full rasterize -> OCR round trip. Cursive
    # contextual forms are out of 5x7 scope (isolated forms only,
    # documented), same posture as jamo-in-a-row for kor.

    ALPHABET = "ابتثجحخ دذرزسشص ضطظعغفق كلمنهوي ء"

    def test_alphabet_round_trip_three_scales(self):
        for scale in (1, 2, 3):
            img = rasters.render_text(self.ALPHABET, scale=scale)
            ara, warn = rasters.ocr_decode_image(img, ("ara",))
            assert ara == self.ALPHABET, f"scale {scale}: {ara!r}"
            assert warn == []

    def test_rendered_raster_is_visual_order(self):
        # the raster itself must hold the REVERSED (visual) sequence: the
        # same pixels decoded WITHOUT the bidi re-mirror (via a latin-only
        # table the glyphs can't match) differ from a logical-order layout
        a = rasters.render_text("اب", scale=2)
        b = rasters.render_text("با", scale=2)
        assert a.shape == b.shape and not np.array_equal(a, b)
        got_a, _ = rasters.ocr_decode_image(a, ("ara",))
        got_b, _ = rasters.ocr_decode_image(b, ("ara",))
        assert got_a == "اب" and got_b == "با"

    def test_mirror_is_involution(self):
        for s in ("ابت", "اب X", "X اب", "ا X ب", "اب 12 تث", "HELLO",
                  "اب  تث", "ابت جحخ دذر"):
            assert rasters.mirror_rtl_runs(rasters.mirror_rtl_runs(s)) == s

    def test_digits_and_latin_keep_logical_positions(self):
        # simplified bidi: digits/latin terminate runs and stay in place
        t = "اب 12 تث AB"
        img = rasters.render_text(t, scale=2)
        got, _ = rasters.ocr_decode_image(img, ("eng", "ara"))
        assert got == t

    def test_ijam_dot_siblings_stay_distinct(self):
        # the dotted/undotted sibling sets must decode exactly
        t = "ج ح خ د ذ ر ز س ش ص ض ط ظ ع غ ت ث"
        img = rasters.render_text(t, scale=2)
        got, _ = rasters.ocr_decode_image(img, ("ara",))
        assert got == t

    def test_e2e_pdf_ocr_byte_identity(self):
        # through the round-6 JBIG2 B.10 Huffman path for good measure
        gray = rasters.render_text("اختبار النص العربي", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "JBIG2HF10")])
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="ara")
        assert r["status"] == "ok"
        assert r["extracted_text"] == "اختبار النص العربي"

    def test_unloaded_pack_degrades(self):
        img = rasters.render_text("ابت", scale=2)
        eng, _ = rasters.ocr_decode_image(img)
        assert not set(eng) & set("ابت")

    def test_coexists_with_other_packs(self):
        img = rasters.render_text("SCAN اب 서울 カナ 7", scale=2)
        got, _ = rasters.ocr_decode_image(img, ("eng", "ara", "kor", "jpn"))
        assert got == "SCAN اب 서울 カナ 7"

    def test_pipeline_info_reports_ara(self):
        info = ex.pipeline_info()
        alt = {e["name"]: e for e in info["available_engines"]}["pixelocr-alt"]
        assert "ara" in alt["supported_languages"]


class TestChinesePacks:
    # round 6: the last two pack-less languages get real packs — 13/13.
    # Hanzi are open-class, so like a partial tessdata these carry a CORE
    # set (numerals + highest-frequency characters); everything outside it
    # degrades to '?' exactly like jpn's missing kanji. chi_sim and
    # chi_tra share every script-identical character; the four
    # simplified-specific forms (国们门学) and their traditional
    # counterparts (國們門學, plus tra-only 愛馬鳥車見長) are per-pack.

    SIM = "一二三四五六七八九十 人大中国我你他们是不 了的在有上下日月山水 火木土口门天年王生学"
    TRA = "一二三四五六七八九十 人大中國我你他們是不 了的在有上下日月山水 火木土口門天年王生學 愛馬鳥車見長"

    def test_simplified_round_trip_three_scales(self):
        for scale in (1, 2, 3):
            img = rasters.render_text(self.SIM, scale=scale)
            got, warn = rasters.ocr_decode_image(img, ("chi_sim",))
            assert got == self.SIM, f"scale {scale}: {got!r}"
            assert warn == []

    def test_traditional_round_trip_three_scales(self):
        for scale in (1, 2, 3):
            img = rasters.render_text(self.TRA, scale=scale)
            got, warn = rasters.ocr_decode_image(img, ("chi_tra",))
            assert got == self.TRA, f"scale {scale}: {got!r}"
            assert warn == []

    def test_script_specific_forms_resolve_to_loaded_script(self):
        # 国 is simplified-only, 國 traditional-only.  Under a single
        # script's pack the foreign variant fuzzy-resolves to the nearest
        # in-pack box glyph — the same degrade rule as unloaded accents
        # (Ö -> U), i.e. the deterministic analog of OCR "reading" a
        # traditional document as simplified.  With BOTH packs loaded the
        # exact bitmaps win and each variant decodes as itself.
        img = rasters.render_text("国 國", scale=2)
        sim, _ = rasters.ocr_decode_image(img, ("chi_sim",))
        tra, _ = rasters.ocr_decode_image(img, ("chi_tra",))
        both, _ = rasters.ocr_decode_image(img, ("chi_sim", "chi_tra"))
        assert sim == "国 国" and tra == "國 國" and both == "国 國"

    def test_shared_characters_agree_across_scripts(self):
        # script-identical characters decode under EITHER pack
        t = "中 人 大 十"
        img = rasters.render_text(t, scale=2)
        for langs in (("chi_sim",), ("chi_tra",), ("chi_sim", "chi_tra")):
            got, _ = rasters.ocr_decode_image(img, langs)
            assert got == t, langs

    def test_out_of_core_hanzi_degrade(self):
        # 文 is outside the core set: renders and reads as '?'
        assert rasters.normalize_renderable("文") == "?"

    def test_e2e_pdf_ocr_byte_identity(self):
        gray = rasters.render_text("中国 人口 十三 大国", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "JBIG2S")])
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="chi_sim")
        assert r["status"] == "ok"
        assert r["extracted_text"] == "中国 人口 十三 大国"

    def test_unloaded_pack_degrades(self):
        img = rasters.render_text("中国", scale=2)
        eng, _ = rasters.ocr_decode_image(img)
        assert not set(eng) & set("中国")

    def test_all_five_nonlatin_packs_coexist(self):
        t = "SCAN اب 서울 カナ 中文 7"
        img = rasters.render_text(t, scale=2)
        got, _ = rasters.ocr_decode_image(
            img, ("eng", "ara", "kor", "jpn", "chi_sim")
        )
        assert got == "SCAN اب 서울 カナ 中? 7"  # 文 outside the core set

    def test_pipeline_info_reports_chi(self):
        info = ex.pipeline_info()
        alt = {e["name"]: e for e in info["available_engines"]}["pixelocr-alt"]
        assert "chi_sim" in alt["supported_languages"]
        assert "chi_tra" in alt["supported_languages"]


class TestPackFuzz:
    # round-6 property pins over the full multi-pack surface

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=sorted(set("ابتثجحخدذرزسشصضطظعغفقكلمنهويء") | set("ABC 12")), max_size=40))
    def test_mirror_rtl_runs_is_involution_on_arbitrary_text(self, s):
        assert rasters.mirror_rtl_runs(rasters.mirror_rtl_runs(s)) == s

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.text(
            alphabet=sorted(
                set("AB9") | set("ابجد") | set("中国人") | set("學馬")
                | set("카ナ") | set("ЖИ")
            ),
            min_size=1, max_size=8,
        ).map(lambda w: w.strip()).filter(lambda w: w),
        min_size=1, max_size=4,
    ))
    def test_all_pack_round_trip_on_random_words(self, words):
        # random words drawn across every script family must round-trip
        # byte-exact under the full language set (render normalizes first,
        # so compare against the normalized + recomposed expectation)
        langs = ("eng", "deu", "fra", "spa", "ita", "por", "nld", "rus",
                 "jpn", "kor", "ara", "chi_sim", "chi_tra")
        text = " ".join(words)
        expect = rasters.normalize_renderable(text)
        expect = rasters.compose_hangul(expect)
        img = rasters.render_text(text, scale=2)
        got, _ = rasters.ocr_decode_image(img, langs)
        assert got == expect, (text, expect, got)


class TestShortGlyphLines:
    # r6 review finding: a text line containing ONLY glyphs that don't
    # span the full 7-row cell (Chinese numerals, hamza, 口) used to
    # mis-infer the band scale (round(h/7) assumes full-height glyphs)
    # and silently garble with zero warnings. _band_geometry now
    # enumerates the integral (scale, offset) interpretations and scores
    # them by exact-table hits.

    @pytest.mark.parametrize("text,langs", [
        ("一二三", ("chi_sim",)),
        ("十三", ("chi_sim",)),
        ("一二三四五六七八九十", ("chi_sim",)),
        ("口", ("chi_sim",)),
        ("ء", ("ara",)),
    ])
    def test_short_glyph_only_lines_round_trip(self, text, langs):
        for scale in (1, 2, 3):
            img = rasters.render_text(text, scale=scale)
            got, _ = rasters.ocr_decode_image(img, langs)
            assert got == text, (scale, got)

    def test_mixed_height_lines_unchanged(self):
        # full-height neighbors anchor the band; the pre-fix behavior for
        # these is preserved (short-circuit path)
        img = rasters.render_text("中国 一 人口", scale=2)
        got, _ = rasters.ocr_decode_image(img, ("chi_sim",))
        assert got == "中国 一 人口"

    def test_full_height_line_with_unknown_glyph_not_aliased(self):
        # the enumeration must NOT outscore a confirmed full-height
        # reading: one known + one foreign-script glyph keeps the
        # full-height interpretation (foreign glyph goes to fuzzy),
        # instead of both aliasing to some heavily-downsampled glyph
        img = rasters.render_text("国 國", scale=2)
        sim, _ = rasters.ocr_decode_image(img, ("chi_sim",))
        assert sim == "国 国"


class TestSmallKana:
    # round 6: the nine small kana as bottom-aligned sub-cell glyphs —
    # the short-glyph band geometry makes them first-class, so real
    # words with yoon/sokuon round-trip

    @pytest.mark.parametrize("t", [
        "トーキョー", "ラッパ", "ジュース", "チョコ", "キャベツ",
        "フィルム", "ウィスキー", "ファン",
    ])
    def test_yoon_sokuon_words_round_trip(self, t):
        for scale in (1, 2, 3):
            img = rasters.render_text(t, scale=scale)
            got, warn = rasters.ocr_decode_image(img, ("jpn",))
            assert got == t, f"scale {scale}: {got!r}"
            assert warn == []

    def test_small_kana_only_line(self):
        # a line of only sub-cell glyphs exercises the band-geometry path
        got, _ = rasters.ocr_decode_image(
            rasters.render_text("ョッャ", scale=2), ("jpn",)
        )
        assert got == "ョッャ"

    def test_small_vs_big_distinct(self):
        got, _ = rasters.ocr_decode_image(
            rasters.render_text("ヨョ ツッ ヤャ ユュ", scale=2), ("jpn",)
        )
        assert got == "ヨョ ツッ ヤャ ユュ"

    def test_e2e_pdf(self):
        gray = rasters.render_text("トーキョー ジュース", scale=2)
        pdf = pdfx.build_image_pdf([(gray, "JBIG2S")])
        r = ex.extract_document(pdf, engine="pixelocr-alt", languages="jpn")
        assert r["status"] == "ok"
        assert r["extracted_text"] == "トーキョー ジュース"


class TestHiragana:
    # round 6 (second jpn batch): the base 46 hiragana + voiced forms via
    # the shared ゛/゜ mark composition + the four common small hiragana
    # (ゃゅょっ). Real Japanese text is hiragana-heavy — the katakana-only
    # pack read most of a sentence as '?'.

    GOJUON = ("あいうえお かきくけこ さしすせそ たちつてと なにぬねの\n"
              "はひふへほ まみむめも やゆよ らりるれろ わをん")

    def test_full_gojuon_round_trip_three_scales(self):
        for scale in (1, 2, 3):
            img = rasters.render_text(self.GOJUON, scale=scale)
            got, warn = rasters.ocr_decode_image(img, ("jpn",))
            assert got == self.GOJUON, f"scale {scale}: {got!r}"
            assert warn == []

    def test_voiced_rows_round_trip(self):
        t = "がぎぐげご ざじずぜぞ だぢづでど ばびぶべぼ ぱぴぷぺぽ"
        got, _ = rasters.ocr_decode_image(rasters.render_text(t, scale=2), ("jpn",))
        assert got == t

    @pytest.mark.parametrize("t", [
        "ちょっと まって", "きょう は いい てんき", "じゅぎょう",
        "コンピュータ と こんぴゅーた",  # both scripts, voiced + small
    ])
    def test_real_words(self, t):
        got, _ = rasters.ocr_decode_image(rasters.render_text(t, scale=2), ("jpn",))
        assert got == t

    def test_homoglyph_he_pair_stays_distinct(self):
        # へ/ヘ are true typographic homoglyphs; the one-row offset keeps
        # both byte-exact
        got, _ = rasters.ocr_decode_image(
            rasters.render_text("へ ヘ", scale=2), ("jpn",)
        )
        assert got == "へ ヘ"

    def test_unloaded_pack_degrades(self):
        eng, _ = rasters.ocr_decode_image(rasters.render_text("にほん", scale=2))
        assert not set(eng) & set("にほん")


class TestKanaNfcCarveOut:
    def test_spacing_mark_spelling_resolves_to_precomposed(self):
        # documented NFC carve-out: カ + spacing ゛ renders pixel-identical
        # to ガ (the renderer decomposes ガ to exactly those cells), so a
        # jpn-context decode resolves the shared shape to the PRECOMPOSED
        # codepoint — the same one-winner rule as Cyrillic homoglyphs
        a = rasters.render_text("カ゛", scale=2)
        b = rasters.render_text("ガ", scale=2)
        assert np.array_equal(a, b)
        got, _ = rasters.ocr_decode_image(a, ("jpn",))
        assert got == "ガ"


class TestSmallHiragana:
    def test_small_vowels_round_trip(self):
        for t in ("ぁぃぅぇぉ", "ふぁん", "うぃすきー"):
            for scale in (1, 2, 3):
                img = rasters.render_text(t, scale=scale)
                got, _ = rasters.ocr_decode_image(img, ("jpn",))
                assert got == t, (t, scale, got)

    def test_noise_rasters_never_raise_and_stay_deterministic(self):
        # adversarial input through the band-geometry path: random noise
        # must decode without exception, identically across calls
        rng = np.random.RandomState(7)
        langs = ("eng", "jpn", "ara", "kor", "chi_sim")
        for _ in range(15):
            img = (rng.rand(rng.randint(3, 90), rng.randint(3, 90)) * 255
                   ).astype(np.uint8)
            a, _ = rasters.ocr_decode_image(img, langs)
            b, _ = rasters.ocr_decode_image(img, langs)
            assert a == b


class TestArabicIndicDigits:
    # round 6 (second ara batch): ٠-٩ — bidi class AN: digits travel
    # inside mirrored Arabic runs but read left-to-right internally; the
    # digit-sub-run fix-up commutes with reversal so the mirror stays an
    # involution

    def test_digits_round_trip_three_scales(self):
        for t in ("٠١٢٣٤٥٦٧٨٩", "سنه ٢٠٢٤ اختبار", "عدد ٤٥٦ نص",
                  "اب١٢تث"):
            for scale in (1, 2, 3):
                img = rasters.render_text(t, scale=scale)
                got, warn = rasters.ocr_decode_image(img, ("ara",))
                assert got == t, (t, scale, got)
                assert warn == []

    def test_digit_blocks_keep_internal_order_in_visual_layout(self):
        # "سنه ٢٠٢٤" mirrors to "٢٠٢٤ هنس": the number block moves to the
        # run's left edge but its digits do NOT reverse
        assert rasters.mirror_rtl_runs("سنه ٢٠٢٤") == "٢٠٢٤ هنس"

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=sorted(set("ابتث ٠١٢٣٤٥") | set("AB9")),
                   max_size=30))
    def test_mirror_still_involution_with_digits(self, s):
        assert rasters.mirror_rtl_runs(rasters.mirror_rtl_runs(s)) == s

    def test_latin_digits_still_terminate_runs(self):
        # western digits keep bidi class EN-as-neutral in the simplified
        # model: they break runs and keep logical positions (pinned r6a)
        t = "اب 12 تث"
        got, _ = rasters.ocr_decode_image(
            rasters.render_text(t, scale=2), ("eng", "ara")
        )
        assert got == t


class TestArabicFinalForms:
    def test_ta_marbuta_and_alef_maksura_round_trip(self):
        # the two common word-final forms beyond the base 28
        for t in ("سنة ٢٠٢٤ اختبار", "مدينة كبيرة", "المستشفى", "ة ى ه ي"):
            for scale in (1, 2, 3):
                img = rasters.render_text(t, scale=scale)
                got, warn = rasters.ocr_decode_image(img, ("ara",))
                assert got == t, (t, scale, got)
                assert warn == []
