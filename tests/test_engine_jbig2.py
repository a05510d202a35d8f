"""JBIG2 generic-region codec (`engine/jbig2x.py`, ITU-T T.88) and its
``/JBIG2Decode`` integration in the PDF image path."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from activestorage_ocr_spark.engine import jbig2x, pdfx, rasters
from activestorage_ocr_spark.engine.extract import extract_document
from activestorage_ocr_spark.engine.jbig2x import (
    Jbig2Error,
    MQDecoder,
    MQEncoder,
    decode_generic_region,
    decode_jbig2_embedded,
    encode_generic_region,
    encode_jbig2_embedded,
)


class TestQeTable:
    def test_structure(self):
        # a transcription slip in Table E.1 would break these invariants
        assert len(jbig2x._QE) == 47
        for i, (qe, nmps, nlps, switch) in enumerate(jbig2x._QE):
            assert 0 < qe < 0x8000, i          # probabilities are sub-half
            assert 0 <= nmps < 47 and 0 <= nlps < 47, i
            assert switch in (0, 1)
            if switch:
                assert qe == 0x5601, i          # only the start-states switch

    def test_known_entries(self):
        # spot-pins against the published table
        assert jbig2x._QE[0] == (0x5601, 1, 1, 1)
        assert jbig2x._QE[1][0] == 0x3401
        assert jbig2x._QE[45] == (0x0001, 45, 43, 0)
        assert jbig2x._QE[46] == (0x5601, 46, 46, 0)  # non-adaptive state
        assert jbig2x._QE[14] == (0x5601, 15, 14, 1)

    def test_mps_chain_reaches_minimum_qe(self):
        # repeated MPS renorms must walk to the most-skewed state (45)
        i = 0
        for _ in range(60):
            i = jbig2x._QE[i][1]
        assert i in (45,)


class TestMQRoundTrip:
    def _roundtrip(self, bits, cxs, ncx):
        enc = MQEncoder()
        ei, em = bytearray(ncx), bytearray(ncx)
        for b, c in zip(bits, cxs):
            enc.encode(ei, em, c, b)
        assert enc.out[0] == 0  # carry never reaches the pre-stream spacer
        data = enc.flush()
        dec = MQDecoder(data)
        di, dm = bytearray(ncx), bytearray(ncx)
        return [dec.decode(di, dm, c) for c in cxs]

    @pytest.mark.parametrize("pattern", [
        [1] * 500, [0] * 500, [1, 0] * 250, [1] * 12, [1, 1, 0] * 100,
    ])
    def test_adversarial_patterns(self, pattern):
        assert self._roundtrip(pattern, [0] * len(pattern), 1) == pattern

    @settings(max_examples=80, deadline=None)
    @given(st.lists(st.integers(0, 1), min_size=1, max_size=400),
           st.integers(0, 2**32 - 1), st.sampled_from([1, 2, 8, 16]))
    def test_property_roundtrip(self, bits, seed, ncx):
        rng = np.random.default_rng(seed)
        cxs = rng.integers(0, ncx, len(bits)).tolist()
        assert self._roundtrip(bits, cxs, ncx) == bits

    def test_decoder_survives_truncation(self):
        # a truncated stream must keep returning bits (feeding 1s), never
        # raise or loop — the region layer bounds the pixel count
        enc = MQEncoder()
        ei, em = bytearray(1), bytearray(1)
        for b in [1, 0] * 100:
            enc.encode(ei, em, 0, b)
        data = enc.flush()[:3]
        dec = MQDecoder(data)
        di, dm = bytearray(1), bytearray(1)
        out = [dec.decode(di, dm, 0) for _ in range(200)]
        assert len(out) == 200


class TestGenericRegion:
    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    @pytest.mark.parametrize("tpgdon", [False, True])
    def test_roundtrip_all_templates(self, template, tpgdon):
        rng = np.random.default_rng(template * 10 + tpgdon)
        for shape, density in [((1, 1), 0.5), ((5, 8), 0.0), ((5, 8), 1.0),
                               ((23, 57), 0.3), ((40, 40), 0.5)]:
            img = rng.random(shape) < density
            body = encode_generic_region(img, template=template, tpgdon=tpgdon)
            dec = decode_generic_region(
                body, shape[1], shape[0], template=template, tpgdon=tpgdon
            )
            assert (dec == img).all(), (template, tpgdon, shape)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 30), st.integers(1, 60), st.integers(0, 2**32 - 1))
    def test_property_roundtrip_template0(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.random((h, w)) < rng.random()
        body = encode_generic_region(img)
        assert (decode_generic_region(body, w, h) == img).all()

    def test_text_raster_compresses(self):
        img = rasters.render_text("JBIG2 TEXT 2024", scale=3) < 128
        body = encode_generic_region(img, tpgdon=True)
        assert (decode_generic_region(
            body, img.shape[1], img.shape[0], tpgdon=True) == img).all()
        assert len(body) < img.size // 8  # beats the raw bitmap

    def test_mmr_variant_is_g4(self):
        from activestorage_ocr_spark.engine.ccittx import encode_g4

        img = np.tri(20, 40, dtype=bool)
        dec = decode_generic_region(encode_g4(img), 40, 20, mmr=True)
        assert (dec == img).all()

    def test_decode_bomb_guard(self):
        with pytest.raises(Jbig2Error, match="too large"):
            decode_generic_region(b"\x00", 100_000, 100_000)

    def test_bad_template_raises(self):
        with pytest.raises(Jbig2Error, match="template"):
            decode_generic_region(b"\x00", 4, 4, template=7)


class TestEmbedded:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        img = rng.random((31, 79)) < 0.25
        out = decode_jbig2_embedded(encode_jbig2_embedded(img))
        assert out.shape == img.shape and (out == img).all()

    def test_roundtrip_mmr(self):
        img = np.tri(17, 33, dtype=bool)
        out = decode_jbig2_embedded(encode_jbig2_embedded(img, mmr=True))
        assert (out == img).all()

    def test_globals_split(self):
        # page info delivered out-of-band (the /JBIG2Globals organization)
        img = rasters.render_text("GLOBALS", scale=2) < 128
        blob = encode_jbig2_embedded(img)
        assert blob[4] & 0x3F == jbig2x._SEG_PAGE_INFO
        out = decode_jbig2_embedded(blob[30:], globals_data=blob[:30])
        assert (out == img).all()

    def test_unsupported_symbol_segment_named(self):
        # a symbol-dictionary segment must fail with a narrow, named error
        payload = b"\x00\x00"
        head = struct.pack(">IB", 0, 0) + b"\x00" + b"\x01" + struct.pack(
            ">I", len(payload))
        with pytest.raises(Jbig2Error, match="symbol dictionary"):
            decode_jbig2_embedded(head + payload)

    def test_junk_raises_not_crashes(self):
        with pytest.raises(Jbig2Error):
            decode_jbig2_embedded(b"\xde\xad\xbe\xef" * 10)

    def test_no_region_raises(self):
        img = np.zeros((4, 4), dtype=bool)
        blob = encode_jbig2_embedded(img)[:30]  # page info only
        with pytest.raises(Jbig2Error, match="no region"):
            decode_jbig2_embedded(blob)

    def test_truncated_segment_raises(self):
        img = np.tri(9, 9, dtype=bool)
        blob = encode_jbig2_embedded(img)
        with pytest.raises(Jbig2Error):
            decode_jbig2_embedded(blob[: len(blob) - 8])


class TestIntegerCoder:
    def test_class_boundaries_and_oob(self):
        from activestorage_ocr_spark.engine.jbig2x import (
            MQDecoder, MQEncoder, _IntCtx, _decode_int, _encode_int,
        )

        vals = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 100000,
                -1, -4, -20, -84, -340, -4436, -99999, None, 7, None]
        enc = MQEncoder()
        c = _IntCtx()
        for v in vals:
            _encode_int(enc, c, v)
        dec = MQDecoder(enc.flush())
        c2 = _IntCtx()
        assert [_decode_int(dec, c2) for _ in vals] == vals

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.integers(-200000, 200000)),
                    min_size=1, max_size=200))
    def test_property_roundtrip(self, vals):
        from activestorage_ocr_spark.engine.jbig2x import (
            MQDecoder, MQEncoder, _IntCtx, _decode_int, _encode_int,
        )

        enc = MQEncoder()
        c = _IntCtx()
        for v in vals:
            _encode_int(enc, c, v)
        dec = MQDecoder(enc.flush())
        c2 = _IntCtx()
        assert [_decode_int(dec, c2) for _ in vals] == vals

    def test_iaid_roundtrip(self):
        from activestorage_ocr_spark.engine.jbig2x import (
            MQDecoder, MQEncoder, _IntCtx, _decode_iaid, _encode_iaid,
            _symcodelen,
        )

        for n_syms in (1, 2, 3, 7, 8, 9, 300):
            L = _symcodelen(n_syms)
            ids = [(i * 7) % n_syms for i in range(40)]
            enc = MQEncoder()
            c = _IntCtx(1 << (L + 1))
            for i in ids:
                _encode_iaid(enc, c, L, i)
            dec = MQDecoder(enc.flush())
            c2 = _IntCtx(1 << (L + 1))
            assert [_decode_iaid(dec, c2, L) for _ in ids] == ids


class TestSymbolMode:
    def test_symbol_dict_roundtrip_height_order(self):
        rng = np.random.default_rng(5)
        syms = [rng.random((h, w)) < 0.4
                for h, w in [(7, 5), (7, 9), (3, 4), (12, 2), (7, 5)]]
        out = jbig2x._decode_symbol_dict(jbig2x._encode_symbol_dict(syms))
        order = jbig2x._sorted_symbol_order(syms)
        assert len(out) == len(syms)
        for k, oi in enumerate(order):
            assert (out[k] == syms[oi]).all()

    def test_text_page_matches_manual_composition(self):
        rng = np.random.default_rng(9)
        symbols = [rng.random((6, 4)) < 0.5 for _ in range(3)]
        instances = [(0, 1, 2), (1, 6, 2), (2, 11, 2),
                     (1, 1, 10), (0, 7, 10), (0, 13, 10)]
        ref = np.zeros((18, 20), bool)
        for sid, x, y in instances:
            ref[y : y + 6, x : x + 4] |= symbols[sid]
        page = decode_jbig2_embedded(
            jbig2x.encode_jbig2_text_page(symbols, instances, 20, 18)
        )
        assert (page == ref).all()

    def test_symbol_mode_roundtrips_text_raster(self):
        img = rasters.render_text("SYMBOL MODE 42", scale=3) < 128
        page = decode_jbig2_embedded(jbig2x.encode_jbig2_symbol_mode(img))
        assert page.shape == img.shape and (page == img).all()

    def test_dictionary_reuse_beats_generic_on_repeated_text(self):
        img = rasters.render_text("AAAA BBBB AAAA BBBB AAAA BBBB", scale=3) < 128
        sym = jbig2x.encode_jbig2_symbol_mode(img)
        gen = jbig2x.encode_jbig2_embedded(img)
        assert (decode_jbig2_embedded(sym) == img).all()
        assert len(sym) < len(gen)  # the whole point of symbol mode

    def test_blank_page_falls_back_to_generic(self):
        blank = np.zeros((10, 20), bool)
        page = decode_jbig2_embedded(jbig2x.encode_jbig2_symbol_mode(blank))
        assert page.shape == blank.shape and not page.any()

    def test_truncated_huffman_refagg_dictionary_named(self):
        import struct as _s

        # SDHUFF=1 + SDREFAGG=1 decodes (r5); a declared symbol with a
        # truncated body must still fail with a named error, never a crash
        payload = _s.pack(">H", 3) + b"\x00" * 4 + _s.pack(">II", 1, 1)
        with pytest.raises(Jbig2Error, match="truncated"):
            jbig2x._decode_symbol_dict(payload)

    def test_text_region_without_dictionary_raises(self):
        img = rasters.render_text("X", scale=2) < 128
        blob = jbig2x.encode_jbig2_symbol_mode(img)
        # strip the symbol dict segment (header 12 bytes incl 1 ref + data)
        segs = list(jbig2x._parse_segment_headers(blob))
        assert [t for _, t, _, _ in segs][:3] == [48, 0, 6]
        with pytest.raises(Jbig2Error, match="no symbol dictionary"):
            # rebuild without the dict
            page_info = segs[0][3]
            tregion = segs[2][3]
            data = (
                jbig2x._segment_header(0, 48, 1, len(page_info)) + page_info
                + jbig2x._segment_header(2, 6, 1, len(tregion)) + tregion
            )
            decode_jbig2_embedded(data)

    def test_truncated_symbol_stream_raises(self):
        img = rasters.render_text("TRUNC", scale=2) < 128
        blob = jbig2x.encode_jbig2_symbol_mode(img)
        with pytest.raises(Jbig2Error):
            decode_jbig2_embedded(blob[: len(blob) // 2])


class TestPdfIntegration:
    def test_jbig2_scanned_pdf_extracts_end_to_end(self):
        pages = [rasters.render_text("JBIG2 PAGE ONE", scale=3),
                 rasters.render_text("SECOND PAGE 321", scale=3)]
        pdf = pdfx.build_image_pdf([(p, "JBIG2") for p in pages])
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "JBIG2 PAGE ONE" in r["extracted_text"]
        assert "SECOND PAGE 321" in r["extracted_text"]
        assert r["warnings"][0] == pdfx.SCANNED_PDF_WARNING

    def test_jbig2_globals_pdf_extracts_end_to_end(self):
        pdf = pdfx.build_image_pdf(
            [(rasters.render_text("VIA GLOBALS 7", scale=3), "JBIG2G")]
        )
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "VIA GLOBALS 7" in r["extracted_text"]

    def test_corrupt_jbig2_skipped_per_image(self):
        img = rasters.render_text("BROKEN", scale=3)
        r = extract_document(
            pdfx.build_image_pdf([(img, "JBIG2")], corrupt_data=True)
        )
        assert r["status"] in ("empty", "ok")

    def test_decode_array_inverts(self):
        img = rasters.render_text("INK 7", scale=3) < 128
        objs = pdfx.parse_objects(pdfx.build_image_pdf([(img, "JBIG2")]))
        img_obj = next(
            o for o in objs.values() if o.dict.get("/Subtype") == "/Image"
        )
        gray = pdfx.decode_image_xobject(img_obj, objs)
        assert (gray[img] == 0).all() and (gray[~img] == 255).all()
        img_obj.dict["/Decode"] = [1, 0]
        inv = pdfx.decode_image_xobject(img_obj, objs)
        assert (inv[img] == 255).all() and (inv[~img] == 0).all()

    def test_jbig2_symbol_mode_pdf_extracts_end_to_end(self):
        pdf = pdfx.build_image_pdf(
            [(rasters.render_text("SYMBOL PDF 55", scale=3), "JBIG2S")]
        )
        r = extract_document(pdf)
        assert r["status"] == "ok"
        assert "SYMBOL PDF 55" in r["extracted_text"]

    def test_jbig2_mixed_with_g4_page(self):
        j = rasters.render_text("JB HALF", scale=3)
        g = rasters.render_text("G4 HALF", scale=3)
        pdf = pdfx.build_image_pdf([(j, "JBIG2"), (g, "G4")])
        r = extract_document(pdf)
        assert "JB HALF" in r["extracted_text"]
        assert "G4 HALF" in r["extracted_text"]


class TestRefinement:
    @pytest.mark.parametrize("template", [0, 1])
    @pytest.mark.parametrize("tpgron", [False, True])
    def test_round_trip(self, template, tpgron):
        rng = np.random.default_rng(template * 2 + tpgron)
        img = rng.random((40, 55)) < 0.3
        ref = img ^ (rng.random((40, 55)) < 0.08)  # noisy first pass
        data = jbig2x.encode_refinement_region(
            img, ref, template=template, tpgron=tpgron
        )
        out = jbig2x.decode_refinement_region(
            data, 55, 40, ref, template=template, tpgron=tpgron
        )
        assert np.array_equal(out, img)

    def test_offset_reference(self):
        rng = np.random.default_rng(7)
        img = rng.random((20, 30)) < 0.4
        ref = np.roll(img, (1, 2), axis=(0, 1))
        data = jbig2x.encode_refinement_region(img, ref, dx=2, dy=1, tpgron=True)
        out = jbig2x.decode_refinement_region(
            data, 30, 20, ref, dx=2, dy=1, tpgron=True
        )
        assert np.array_equal(out, img)

    def test_refining_close_reference_beats_generic(self):
        img = np.zeros((60, 80), dtype=bool)
        img[10:50, 20:60] = True
        ref = img.copy()
        ref[30, 40] ^= True
        r = jbig2x.encode_refinement_region(img, ref, tpgron=True)
        g = jbig2x.encode_generic_region(img)
        assert len(r) < len(g)

    def test_embedded_refinement_mode(self):
        g = rasters.render_text("REFINE 42", scale=2)
        black = g < 128
        for kw in ({}, {"template": 1}, {"tpgron": False}):
            stream = jbig2x.encode_jbig2_refinement_mode(black, **kw)
            assert np.array_equal(jbig2x.decode_jbig2_embedded(stream), black)

    def test_pdf_end_to_end(self):
        img = rasters.render_text("JBIG2 REFINED", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, "JBIG2R")]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "JBIG2 REFINED"


class TestHalftone:
    def test_pattern_dict_round_trip(self):
        rng = np.random.default_rng(3)
        pats = [rng.random((5, 5)) < (k / 10) for k in range(9)]
        out = jbig2x.decode_pattern_dict(jbig2x.encode_pattern_dict(pats))
        assert len(out) == 9
        assert all(np.array_equal(a, b) for a, b in zip(pats, out))

    def test_halftone_page_matches_direct_dither(self):
        # decoding must reproduce the clustered-dot dither EXACTLY
        yy, xx = np.mgrid[0:37, 0:53]
        gray_img = ((xx * 4 + yy * 3) % 256).astype(np.uint8)
        cell = 4
        page = jbig2x.decode_jbig2_embedded(
            jbig2x.encode_jbig2_halftone_mode(gray_img, cell=cell)
        )
        h, w = gray_img.shape
        hgh, hgw = -(-h // cell), -(-w // cell)
        pad = np.full((hgh * cell, hgw * cell), 255, np.uint8)
        pad[:h, :w] = gray_img
        blocks = pad.reshape(hgh, cell, hgw, cell).swapaxes(1, 2)
        dark = 255.0 - blocks.reshape(hgh, hgw, -1).mean(axis=2)
        nlev = cell * cell + 1
        g = np.round(dark / 255.0 * (nlev - 1)).astype(int)
        order = sorted(
            ((r, c) for r in range(cell) for c in range(cell)),
            key=lambda rc: (
                (rc[0] - (cell - 1) / 2) ** 2 + (rc[1] - (cell - 1) / 2) ** 2,
                rc,
            ),
        )
        exp = np.zeros((hgh * cell, hgw * cell), bool)
        for m in range(hgh):
            for n in range(hgw):
                p = np.zeros((cell, cell), bool)
                for r, c in order[: g[m, n]]:
                    p[r, c] = True
                exp[m * cell : (m + 1) * cell, n * cell : (n + 1) * cell] = p
        assert np.array_equal(page, exp)

    def test_gray_bitplane_coding_multi_level(self):
        # 17 levels (cell=4) exercises 5 gray-coded bitplanes
        rng = np.random.default_rng(11)
        gray = rng.integers(0, 17, size=(9, 13))
        pats = [np.full((4, 4), False) for _ in range(17)]
        for k, p in enumerate(pats):
            p.flat[:k] = True
        body = jbig2x.encode_halftone_region(gray, pats)
        bitmap, x, y, comb = jbig2x.decode_halftone_region(body, pats)
        assert bitmap.shape == (9 * 4, 13 * 4)
        for m in range(9):
            for n in range(13):
                got = bitmap[m * 4 : (m + 1) * 4, n * 4 : (n + 1) * 4]
                assert got.sum() == gray[m, n], (m, n)

    def test_pdf_end_to_end(self):
        img = rasters.render_text("HALFTONE 7", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, "JBIG2H")]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "HALFTONE 7"

    def test_mmr_variants_still_rejected(self):
        pats = [np.zeros((3, 3), dtype=bool)]
        pd = bytearray(jbig2x.encode_pattern_dict(pats))
        pd[0] |= 1  # set HDMMR
        with pytest.raises(Jbig2Error, match="MMR pattern"):
            jbig2x.decode_pattern_dict(bytes(pd))


class TestRefAggSymbols:
    def test_cross_dictionary_refinement_round_trip(self):
        # same-shape near-dup components: bases in dict 1, SDREFAGG
        # derivatives in dict 2 with dict-1 input symbols
        rng = np.random.default_rng(8)
        img = np.zeros((30, 60), dtype=bool)
        img[2:10, 2:10] = rng.random((8, 8)) < 0.5
        img[2:10, 20:28] = img[2:10, 2:10] ^ (rng.random((8, 8)) < 0.1)
        img[2:10, 40:48] = img[2:10, 2:10]
        img[15:20, 5:30] = rng.random((5, 25)) < 0.4
        stream = jbig2x.encode_jbig2_symbol_refagg_mode(img)
        assert np.array_equal(jbig2x.decode_jbig2_embedded(stream), img)

    def test_text_raster_round_trip(self):
        g = rasters.render_text("AABB AABA", scale=2)
        black = g < 128
        stream = jbig2x.encode_jbig2_symbol_refagg_mode(black)
        assert np.array_equal(jbig2x.decode_jbig2_embedded(stream), black)

    def test_falls_back_without_pairs(self):
        # all-distinct shapes: plain symbol mode, still exact
        img = np.zeros((20, 40), dtype=bool)
        img[2:6, 2:8] = True
        img[10:17, 12:15] = True
        stream = jbig2x.encode_jbig2_symbol_refagg_mode(img)
        assert np.array_equal(jbig2x.decode_jbig2_embedded(stream), img)

    def test_bad_refaggninst_rejected(self):
        # REFAGGNINST of 0 is malformed: hand-build a dict coding it
        from activestorage_ocr_spark.engine.jbig2x import (
            MQEncoder, _encode_int, _IntCtx,
        )
        import struct as st

        enc = MQEncoder()
        iadh, iadw = _IntCtx(), _IntCtx()
        iaai = _IntCtx()
        _encode_int(enc, iadh, 4)
        _encode_int(enc, iadw, 4)
        _encode_int(enc, iaai, 0)  # REFAGGNINST = 0
        body = enc.flush()
        head = st.pack(">H", 2 | (0 << 12))
        head += b"\x03\xff\xfd\xff\x02\xfe\xfe\xfe"  # SDAT (template 0: 4 pairs)
        head += b"\xff\xff\xff\xff"  # SDRAT (2 pairs)
        head += st.pack(">II", 1, 1)
        with pytest.raises(Jbig2Error, match="REFAGGNINST"):
            jbig2x._decode_symbol_dict(head + body, [np.ones((4, 4), bool)])

    def test_sbrefine_text_region_instances(self):
        # per-instance refinement (SBREFINE): same-size and size-changing
        rng = np.random.default_rng(5)
        a = rng.random((8, 6)) < 0.5
        b = rng.random((5, 9)) < 0.4
        syms = [a, b]
        a2 = a ^ (rng.random((8, 6)) < 0.1)
        b2 = np.pad(b, ((1, 0), (0, 2)))
        b2 ^= rng.random(b2.shape) < 0.05
        inst = [(0, 2, 2), (0, 12, 2, a2), (1, 24, 2, b2), (1, 40, 3)]
        tr = jbig2x._encode_text_region(syms, inst, 60, 14)
        order = jbig2x._sorted_symbol_order(syms)
        region, _, _, _ = jbig2x._decode_text_region(tr, [syms[i] for i in order])
        exp = np.zeros((14, 60), dtype=bool)
        exp[2:10, 2:8] |= a
        exp[2:10, 12:18] |= a2
        exp[2:8, 24:35] |= b2
        exp[3:8, 40:49] |= b
        assert np.array_equal(region, exp)

    def test_aggregate_symbol_ninst_2(self):
        # a ligature symbol built from TWO refined placements of input
        # symbols (REFAGGNINST=2 -> nested text bitmap, shared contexts)
        rng = np.random.default_rng(12)
        a = rng.random((8, 6)) < 0.5
        b = rng.random((8, 7)) < 0.4
        pa = a ^ (rng.random(a.shape) < 0.08)
        pb = b ^ (rng.random(b.shape) < 0.08)
        lig = np.zeros((8, 15), dtype=bool)
        lig[:, 0:6] = pa
        lig[:, 8:15] = pb
        sd = jbig2x._encode_symbol_dict(
            [lig],
            refine_from={0: [(0, 0, 0, pa), (1, 8, 0, pb)]},
            input_syms=[a, b],
        )
        out = jbig2x._decode_symbol_dict(sd, [a, b])
        assert len(out) == 1 and np.array_equal(out[0], lig)

    def test_pdf_end_to_end(self):
        img = rasters.render_text("REFAGG SYMBOLS", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, "JBIG2RA")]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "REFAGG SYMBOLS"


class TestAllocationBombGuards:
    # forged page dimensions / region offsets must not force giant
    # allocations (adversarial-fuzz finding)
    def test_page_info_bomb(self):
        payload = struct.pack(">IIIIBH", 0xFFFFFF, 0xFFFFFF, 0, 0, 0, 0)
        head = struct.pack(">IB", 0, jbig2x._SEG_PAGE_INFO) + b"\x00" + b"\x01"
        head += struct.pack(">I", len(payload))
        with pytest.raises(Jbig2Error, match="implausible page"):
            jbig2x.decode_jbig2_embedded(head + payload)

    def test_compose_growth_bomb(self):
        st = jbig2x._PageState()
        st.w, st.h = 1 << 19, None
        with pytest.raises(Jbig2Error, match="implausible page growth"):
            st.compose(np.ones((4, 4), dtype=bool), 0, 1 << 18, 0)


class TestHuffmanTables:
    # Annex B standard-table transcription is pinned STRUCTURALLY: every
    # table's value ranges must tile contiguously between the lower and
    # upper range lines and its prefix code must be Kraft-COMPLETE — with
    # the one spec-faithful exception of B.10, which T.88 publishes as a
    # valid but INCOMPLETE prefix code (three length-2 codes + a canonical
    # tail to length 13).  Its pin asserts the exact Kraft fraction
    # 7553/8192 instead of 1, so a transcription drift still fails loudly.
    # (An earlier B.10 attempt failed the contiguity check and was
    # rejected; the current lines tile -22-lower / -21..8261 / 8262-up.)

    @pytest.mark.parametrize("n", sorted(jbig2x._STD_TABLE_LINES))
    def test_standard_table_structure(self, n):
        from fractions import Fraction

        lines, oob = jbig2x._STD_TABLE_LINES[n]
        pls = [ln[0] for ln in lines if ln[0] > 0] + ([oob] if oob else [])
        kraft = sum(Fraction(1, 2 ** p) for p in pls)
        if n == 10:
            assert kraft == Fraction(7553, 8192), "B.10 Kraft pin drifted"
        else:
            assert kraft == 1, f"B.{n} incomplete"
        norm = sorted([ln for ln in lines if ln[3] == "n"], key=lambda x: x[2])
        for a, b in zip(norm, norm[1:]):
            assert b[2] == a[2] + (1 << a[1]), f"B.{n} ranges not contiguous"
        for ln in lines:
            if ln[3] == "u":
                assert ln[2] == norm[-1][2] + (1 << norm[-1][1])
            if ln[3] == "l":
                assert ln[2] == norm[0][2] - 1
        # the canonical B.3 assignment must fit the prefix space (the
        # HuffTable constructor raises on overflow)
        jbig2x.HuffTable(lines, oob)

    def test_b10_known_codes_and_roundtrip(self):
        # canonical assignment gives the three length-2 lines, in table
        # order, codes 00 (-2..1), 01 (6..69), 10 (OOB); 11 prefixes the
        # longer codes.  Round-trip one value from EVERY line incl. the
        # 32-bit lower/upper escapes and OOB.
        t = jbig2x.std_table(10)
        assert t._code_of(("v", 2, -2, "n")) == (2, 0b00)
        assert t._code_of(("v", 6, 6, "n")) == (2, 0b01)
        assert t._code_of(("oob",)) == (2, 0b10)
        vals = [-21, -6, -5, -4, -3, -2, 1, 2, 3, 4, 5, 6, 69, 70, 101,
                102, 133, 134, 197, 198, 325, 326, 581, 582, 1093, 1094,
                2117, 2118, 4165, 4166, 8261, 8262, 10 ** 6, -22, -10 ** 6,
                None]
        w = jbig2x._HBitWriter()
        for v in vals:
            t.encode(w, v)
        r = jbig2x._HBitReader(w.flush())
        got = [t.decode(r) for _ in vals]
        assert got == [v if v is not None else jbig2x.HUFF_OOB for v in vals]

    def test_b10_unused_prefix_space_invalid(self):
        # B.10's incompleteness means all-ones bit patterns hit the unused
        # 13-bit suffix space and must fail by name, not mis-decode
        t = jbig2x.std_table(10)
        with pytest.raises(Jbig2Error, match="invalid Huffman prefix"):
            t.decode(jbig2x._HBitReader(b"\xff" * 5))

    def test_table_b1_known_codes(self):
        # B.1's four lines get canonical codes 0, 10, 110, 111 — decode a
        # hand-assembled bit stream hitting every line
        t = jbig2x.std_table(1)
        w = jbig2x._HBitWriter()
        for v in (5, 20, 300, 70000):
            t.encode(w, v)
        r = jbig2x._HBitReader(w.flush())
        assert [t.decode(r) for _ in range(4)] == [5, 20, 300, 70000]

    def test_oob_and_negative_ranges(self):
        t = jbig2x.std_table(8)  # has OOB + lower/upper 32-bit ranges
        w = jbig2x._HBitWriter()
        for v in (-10, 0, 500, 2000, -100, None):
            t.encode(w, v)
        r = jbig2x._HBitReader(w.flush())
        got = [t.decode(r) for _ in range(6)]
        assert got[:5] == [-10, 0, 500, 2000, -100]
        assert got[5] is jbig2x.HUFF_OOB

    def test_custom_table_segment_roundtrip(self):
        seg = jbig2x.encode_table_segment(
            [(1, 0, 0), (2, 1, 1), (3, 3, 3)], 4, 4
        )
        t = jbig2x.parse_table_segment(seg)
        w = jbig2x._HBitWriter()
        for v in (0, 2, 7, 10, 11, 99, -5):
            t.encode(w, v)
        r = jbig2x._HBitReader(w.flush())
        assert [t.decode(r) for _ in range(7)] == [0, 2, 7, 10, 11, 99, -5]

    def test_overfull_prefix_lengths_rejected(self):
        with pytest.raises(Jbig2Error, match="Kraft"):
            jbig2x.HuffTable([(1, 0, 0, "n"), (1, 0, 1, "n"), (1, 0, 2, "n")])

    def test_reserved_selector_values_raise(self):
        # ADVICE r5: reserved selector value 2 (valid: 0/1/3 for the 2-bit
        # selectors, 0/1 for the 1-bit ones) must FAIL by name instead of
        # silently consuming a custom table and misaligning every later
        # selector's custom-table assignment.
        cit = iter([jbig2x.std_table(1)])
        with pytest.raises(Jbig2Error, match="reserved SDHUFFDH"):
            jbig2x._huff_selected(2, {0: 4, 1: 5}, cit, "SDHUFFDH")
        # the custom table was NOT consumed
        assert next(cit) is jbig2x.std_table(1)
        with pytest.raises(Jbig2Error, match="reserved SBHUFFRSIZE"):
            jbig2x._huff_selected(2, {0: 1}, iter([]), "SBHUFFRSIZE",
                                  custom_sel=1)
        # the explicit custom sentinel still resolves
        t = jbig2x.std_table(2)
        assert jbig2x._huff_selected(3, {0: 4, 1: 5}, iter([t]), "SDHUFFDH") is t

    def test_symbol_dict_reserved_dh_selector_named(self):
        import struct

        # SDHUFF symbol dictionary whose flags select SDHUFFDH=2 (reserved):
        # flags bits 2-3 carry the selector
        payload = struct.pack(">H", 2 << 2) + struct.pack(">II", 0, 0)
        with pytest.raises(Jbig2Error, match="reserved SDHUFFDH"):
            jbig2x._decode_symbol_dict_huffman(payload, [], [])


class TestHuffmanMode:
    def test_page_roundtrip_exact(self):
        img = rasters.render_text("HUFFMAN PAGE 123", scale=2) < 128
        data = jbig2x.encode_jbig2_huffman_page(img)
        assert np.array_equal(decode_jbig2_embedded(data), img)

    def test_multiline_dictionary_reuse(self):
        img = rasters.render_text("AAA BBB AAA\nCCC AAA BBB", scale=2) < 128
        data = jbig2x.encode_jbig2_huffman_page(img)
        assert np.array_equal(decode_jbig2_embedded(data), img)
        # repeated glyphs dedupe into the dictionary: smaller than generic
        assert len(data) < len(encode_jbig2_embedded(img))

    def test_both_collective_storage_forms_exercised(self):
        # >=2 height classes so the encoder alternates MMR-coded and
        # stored-uncompressed collective bitmaps (both §6.5.9 forms)
        img = rasters.render_text("oT.", scale=2) < 128  # 3 glyph heights
        data = jbig2x.encode_jbig2_huffman_page(img)
        assert np.array_equal(decode_jbig2_embedded(data), img)

    def test_blank_page_falls_back_to_mmr_generic(self):
        img = np.zeros((12, 40), dtype=bool)
        data = jbig2x.encode_jbig2_huffman_page(img)
        assert np.array_equal(decode_jbig2_embedded(data), img)

    def test_truncated_huffman_refinement_header_named(self):
        # SBHUFF + SBREFINE is supported (r5); a truncated header must
        # still fail with the named error, never a crash
        head = struct.pack(">IIIIB", 10, 10, 0, 0, 0)
        head += struct.pack(">H", 3)  # SBHUFF=1 + SBREFINE=1
        head += struct.pack(">H", 0)
        with pytest.raises(Jbig2Error, match="truncated"):
            jbig2x._decode_text_region(head, [np.ones((2, 2), dtype=bool)])

    def test_truncated_huffman_stream_raises(self):
        img = rasters.render_text("TRUNC", scale=2) < 128
        data = jbig2x.encode_jbig2_huffman_page(img)
        with pytest.raises(Jbig2Error):
            decode_jbig2_embedded(data[: len(data) - 12])

    def test_mutated_huffman_streams_never_crash(self):
        rng = np.random.RandomState(7)
        img = rasters.render_text("FUZZ HUF", scale=2) < 128
        base = jbig2x.encode_jbig2_huffman_page(img)
        for _ in range(40):
            buf = bytearray(base)
            for _ in range(4):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            try:
                jbig2x.decode_jbig2_embedded(bytes(buf))
            except (Jbig2Error, ValueError):
                pass  # named quarantine, never a crash


class TestMmrHalftonePattern:
    def test_mmr_pattern_dict_roundtrip(self):
        pats = [np.zeros((3, 3), dtype=bool) for _ in range(4)]
        for k, p in enumerate(pats):
            p.flat[: k * 2] = True
        seg = jbig2x.encode_pattern_dict(pats, mmr=True)
        got = jbig2x.decode_pattern_dict(seg)
        assert all(np.array_equal(a, b) for a, b in zip(got, pats))

    def test_mmr_halftone_matches_arithmetic(self):
        img = rasters.render_text("HALF MMR", scale=3)
        a = decode_jbig2_embedded(jbig2x.encode_jbig2_halftone_mode(img, cell=2))
        m = decode_jbig2_embedded(
            jbig2x.encode_jbig2_halftone_mode(img, cell=2, mmr=True)
        )
        assert np.array_equal(a, m)


class TestHuffmanPdfIntegration:
    def test_huffman_jbig2_pdf_extracts_end_to_end(self):
        img = rasters.render_text("HUF E2E 99", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, "JBIG2HF")]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "HUF E2E 99"

    @pytest.mark.parametrize("kind", ["JBIG2HF9", "JBIG2HF10"])
    def test_standard_ds_table_selectors_end_to_end(self, kind):
        # SBHUFFDS=1 (B.9) and SBHUFFDS=2 (B.10) are legal selectors; B.10
        # quarantined until round 6.  Multi-word text forces DS deltas
        # through the selected table (word gaps are large positive IDS).
        img = rasters.render_text("DS TBL E2E 42", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, kind)]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "DS TBL E2E 42"

    def test_b10_page_roundtrip_exact(self):
        img = rasters.render_text("B TEN ROUNDTRIP", scale=2) < 128
        data = jbig2x.encode_jbig2_huffman_page(img, ds_sel=2)
        assert np.array_equal(decode_jbig2_embedded(data), img)

    def test_mmr_halftone_pdf_extracts_end_to_end(self):
        img = rasters.render_text("HM E2E 55", scale=2)
        res = extract_document(pdfx.build_image_pdf([(img, "JBIG2HM")]))
        assert res["status"] == "ok"
        assert res["extracted_text"] == "HM E2E 55"

    def test_huffman_with_encryption_and_objstm(self):
        img = rasters.render_text("HUF AES", scale=2)
        pdf = pdfx.build_image_pdf([(img, "JBIG2HF")], objstm=True, encrypt="aes256")
        res = extract_document(pdf)
        assert res["status"] == "ok"
        assert res["extracted_text"] == "HUF AES"


class TestMultiRowStrips:
    # SBSTRIPS > 1 (§6.4.5): DT deltas move in strip units and every
    # instance carries an in-strip CURT (IAIT arithmetic / raw bits
    # Huffman) — previously an untested decoder branch.

    def _page(self):
        img = rasters.render_text("STRIP A1\nSTRIP B2", scale=2) < 128
        comps = jbig2x._connected_components(img)
        symbols, index, instances = [], {}, []
        for x, y, bmp in comps:
            key = (bmp.shape, bmp.tobytes())
            sid = index.setdefault(key, len(symbols))
            if sid == len(symbols):
                symbols.append(bmp)
            instances.append((sid, x, y))
        return img, symbols, instances

    @pytest.mark.parametrize("l2", [1, 2])
    def test_arithmetic_strips_roundtrip(self, l2):
        img, symbols, instances = self._page()
        h, w = img.shape
        pi = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
        sd = jbig2x._encode_symbol_dict(symbols)
        tr = jbig2x._encode_text_region(symbols, instances, w, h, log2strips=l2)
        blob = (
            jbig2x._segment_header(0, jbig2x._SEG_PAGE_INFO, 1, len(pi)) + pi
            + jbig2x._segment_header(1, jbig2x._SEG_SYMBOL_DICT, 1, len(sd)) + sd
            + jbig2x._segment_header(
                2, jbig2x._SEG_TEXT_IMMEDIATE, 1, len(tr), referred=(1,)) + tr
        )
        assert np.array_equal(decode_jbig2_embedded(blob), img)

    @pytest.mark.parametrize("l2", [1, 2])
    def test_huffman_strips_roundtrip(self, l2):
        img, symbols, instances = self._page()
        h, w = img.shape
        pi = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
        ts = jbig2x.encode_table_segment(jbig2x._FIXTURE_DT_LINES, 4, 4)
        sd = jbig2x._encode_symbol_dict_huffman(symbols)
        tr = jbig2x._encode_text_region_huffman(
            symbols, instances, w, h, log2strips=l2)
        blob = (
            jbig2x._segment_header(0, jbig2x._SEG_PAGE_INFO, 1, len(pi)) + pi
            + jbig2x._segment_header(1, jbig2x._SEG_TABLE, 1, len(ts)) + ts
            + jbig2x._segment_header(2, jbig2x._SEG_SYMBOL_DICT, 1, len(sd)) + sd
            + jbig2x._segment_header(
                3, jbig2x._SEG_TEXT_IMMEDIATE, 1, len(tr), referred=(2, 1)) + tr
        )
        assert np.array_equal(decode_jbig2_embedded(blob), img)


class TestSegmentHeaderBounds:
    def test_forged_referred_count_raises_named(self):
        # fuzz finding (r5): a forged long-form referred-to count walked
        # off the buffer as IndexError instead of a named Jbig2Error
        head = struct.pack(">IB", 0, jbig2x._SEG_PAGE_INFO)
        head += b"\xe0" + struct.pack(">I", 0x1FFFFFFF)[1:]  # long form, huge
        with pytest.raises(Jbig2Error, match="referred"):
            list(jbig2x._parse_segment_headers(head + b"\x00" * 40))

    def test_short_form_referred_overrun_raises_named(self):
        head = struct.pack(">IB", 0, jbig2x._SEG_PAGE_INFO)
        head += bytes([7 << 5])[:1]  # long form marker with tiny buffer
        head += struct.pack(">I", 0xE0000000 | 9)[0:4]
        with pytest.raises(Jbig2Error):  # named, never IndexError
            list(jbig2x._parse_segment_headers(head + b"\x00" * 2))


class TestHuffmanRefinement:
    # SBHUFF + SBREFINE (§6.4.11 Huffman form): per-instance deltas via
    # B.15/B.1 tables, then a BYTE-BOUNDED arithmetic GR bitmap with fresh
    # contexts — closes the r5 "Huffman refinement" named gap for text
    # regions (the SDHUFF+REFAGG dictionary combo remains quarantined)

    def test_refined_instances_round_trip(self):
        img = rasters.render_text("REFINE HUF", scale=2) < 128
        comps = jbig2x._connected_components(img)
        symbols, index, instances = [], {}, []
        for x, y, bmp in comps:
            key = (bmp.shape, bmp.tobytes())
            sid = index.setdefault(key, len(symbols))
            if sid == len(symbols):
                symbols.append(bmp)
            instances.append((sid, x, y))
        insts = []
        for k, (sid, x, y) in enumerate(instances):
            bmp = symbols[sid]
            blanks = np.argwhere(~bmp)
            if k % 3 == 0 and len(blanks):
                by, bx = map(int, blanks[0])
                nb = bmp.copy()
                nb[by, bx] = True
                insts.append((sid, x, y, nb))
            else:
                insts.append((sid, x, y))
        # one size-changing refinement (RDW=+2, RDH=+1)
        sid0, x0, y0 = instances[1][0], instances[1][1], instances[1][2]
        grown = np.zeros(
            (symbols[sid0].shape[0] + 1, symbols[sid0].shape[1] + 2), dtype=bool
        )
        grown[: symbols[sid0].shape[0], : symbols[sid0].shape[1]] = symbols[sid0]
        grown[-1, -1] = True
        insts[1] = (sid0, x0, y0, grown)
        h, w = img.shape
        pi = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
        ts = jbig2x.encode_table_segment(jbig2x._FIXTURE_DT_LINES, 4, 4)
        sd = jbig2x._encode_symbol_dict_huffman(symbols)
        tr = jbig2x._encode_text_region_huffman(symbols, insts, w, h)
        blob = (
            jbig2x._segment_header(0, jbig2x._SEG_PAGE_INFO, 1, len(pi)) + pi
            + jbig2x._segment_header(1, jbig2x._SEG_TABLE, 1, len(ts)) + ts
            + jbig2x._segment_header(2, jbig2x._SEG_SYMBOL_DICT, 1, len(sd)) + sd
            + jbig2x._segment_header(
                3, jbig2x._SEG_TEXT_IMMEDIATE, 1, len(tr), referred=(2, 1)) + tr
        )
        out = decode_jbig2_embedded(blob)
        want = np.zeros_like(img)
        for inst in insts:
            sid, x, y = inst[0], inst[1], inst[2]
            bmp = inst[3] if len(inst) == 4 else symbols[sid]
            want[y : y + bmp.shape[0], x : x + bmp.shape[1]] |= bmp
        assert np.array_equal(out, want)


class TestHuffmanRefAggDictionary:
    # SDHUFF + REFAGG (REFAGGNINST == 1 — the jbig2enc shape): each new
    # symbol refines an imported one via a byte-bounded arithmetic GR
    # bitmap; aggregates (ninst > 1) stay a named quarantine

    def test_two_dictionary_refagg_roundtrip_mixed_heights(self):
        img = rasters.render_text("oT. AAA oT.", scale=2) < 128
        comps = jbig2x._connected_components(img)
        symbols, index, instances = [], {}, []
        for x, y, bmp in comps:
            key = (bmp.shape, bmp.tobytes())
            sid = index.setdefault(key, len(symbols))
            if sid == len(symbols):
                symbols.append(bmp)
            instances.append((sid, x, y))
        derived = []
        for sym in symbols:
            d = sym.copy()
            blanks = np.argwhere(~d)
            if len(blanks):
                d[tuple(blanks[0])] = True
            derived.append(d)
        base_export = jbig2x._sorted_symbol_order(symbols)
        input_syms = [symbols[k] for k in base_export]
        input_id = {base_export[k]: k for k in range(len(base_export))}
        refine_from = {i: input_id[i] for i in range(len(derived))}
        sd1 = jbig2x._encode_symbol_dict_huffman(symbols)
        sd2 = jbig2x._encode_symbol_dict_huffman(
            derived, refine_from=refine_from, input_syms=input_syms)
        all_syms = symbols + derived
        export_order = base_export + [
            len(symbols) + k for k in jbig2x._sorted_symbol_order(derived)]
        insts = [(len(symbols) + sid, x, y) for sid, x, y in instances]
        h, w = img.shape
        pi = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
        ts = jbig2x.encode_table_segment(jbig2x._FIXTURE_DT_LINES, 4, 4)
        tr = jbig2x._encode_text_region_huffman(
            all_syms, insts, w, h, export_order=export_order)
        blob = (
            jbig2x._segment_header(0, jbig2x._SEG_PAGE_INFO, 1, len(pi)) + pi
            + jbig2x._segment_header(1, jbig2x._SEG_TABLE, 1, len(ts)) + ts
            + jbig2x._segment_header(2, jbig2x._SEG_SYMBOL_DICT, 1, len(sd1)) + sd1
            + jbig2x._segment_header(
                3, jbig2x._SEG_SYMBOL_DICT, 1, len(sd2), referred=(2,)) + sd2
            + jbig2x._segment_header(
                4, jbig2x._SEG_TEXT_IMMEDIATE, 1, len(tr), referred=(2, 3, 1)) + tr
        )
        out = decode_jbig2_embedded(blob)
        want = np.zeros_like(img)
        for sid, x, y in instances:
            d = derived[sid]
            want[y : y + d.shape[0], x : x + d.shape[1]] |= d
        assert np.array_equal(out, want)

    def test_huffman_aggregate_symbol_roundtrip(self):
        # REFAGGNINST > 1: the aggregate decodes as a nested inline
        # Huffman text region with the spec-fixed tables (§6.5.8.2.1)
        a = np.zeros((4, 4), bool)
        a[0] = True
        a[:, 0] = True
        b = np.zeros((4, 4), bool)
        b[-1] = True
        b[:, -1] = True
        symbols = [a, b]
        base_export = jbig2x._sorted_symbol_order(symbols)
        input_syms = [symbols[k] for k in base_export]
        agg_places = [(0, 0, 0), (1, 4, 1), (0, 8, 2)]
        agg = np.zeros((6, 12), bool)
        for pid, x, y in agg_places:
            agg[y : y + 4, x : x + 4] |= input_syms[pid]
        sd1 = jbig2x._encode_symbol_dict_huffman(symbols)
        sd2 = jbig2x._encode_symbol_dict_huffman(
            [agg], refine_from={0: agg_places}, input_syms=input_syms)
        all_syms = input_syms + [agg]
        h, w = 10, 16
        pi = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
        ts = jbig2x.encode_table_segment(jbig2x._FIXTURE_DT_LINES, 4, 4)
        tr = jbig2x._encode_text_region_huffman(
            all_syms, [(2, 2, 2)], w, h, export_order=[0, 1, 2])
        blob = (
            jbig2x._segment_header(0, jbig2x._SEG_PAGE_INFO, 1, len(pi)) + pi
            + jbig2x._segment_header(1, jbig2x._SEG_TABLE, 1, len(ts)) + ts
            + jbig2x._segment_header(2, jbig2x._SEG_SYMBOL_DICT, 1, len(sd1)) + sd1
            + jbig2x._segment_header(
                3, jbig2x._SEG_SYMBOL_DICT, 1, len(sd2), referred=(2,)) + sd2
            + jbig2x._segment_header(
                4, jbig2x._SEG_TEXT_IMMEDIATE, 1, len(tr), referred=(2, 3, 1)) + tr
        )
        out = decode_jbig2_embedded(blob)
        want = np.zeros((h, w), bool)
        want[2:8, 2:14] = agg
        assert np.array_equal(out, want)
