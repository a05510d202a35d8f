"""Deterministic multilingual corpus + golden-parquet oracle for the
language-pack stack — wiring ALL 13 reference languages (r6: every one now
carries a real glyph pack, incl. RTL Arabic and the two hanzi scripts)
through the DISTRIBUTED pipeline as a first-class oracled driver query
rather than pytest-only coverage.

Pattern mirrors `gen_scanned.py`: every golden row is the SINGLE-NODE
execution of the identical kernel (`engine.extract.extract_document` with
``engine='pixelocr-alt'`` and the row's ``languages``); DuckDB reads the
goldens, the driver compares the Spark run against them. Payload containers
rotate through the round-6 codec surface (PNG, CCITT G4, JBIG2 symbol,
JBIG2 Huffman with standard table B.10, arithmetic-coded JPEG) so the
language dimension and the codec dimension are exercised TOGETHER. The
bench page corpus deliberately excludes these payloads (bench comparability
across rounds); this separate table is where they live.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

#: (lang, native-script sample) — one per reference language
#: (`rust/src/engines/leptess.rs:227-245`); ara exercises the RTL mirror,
#: kor the hangul recomposition, chi_* the per-script hanzi packs
MULTI_LANGS: tuple[tuple[str, str], ...] = (
    ("eng", "QUICK BROWN FOX"),
    ("deu", "GRÜßE AUS KÖLN"),
    ("fra", "ÉCOLE ÇA VA À"),
    ("spa", "AÑO ÁGIL"),
    ("ita", "PERÒ GIÙ LÌ È"),
    ("por", "AÇÃO VÕES VÊ"),
    ("nld", "RĲST ÉÉN IDEEËN"),
    ("rus", "СЪЕШЬ ЕЩЕ ЭТИХ БУЛОК"),
    ("jpn", "でんき パワー ちょっと"),
    ("kor", "한국어 텍스트 추출"),
    ("ara", "اختبار النص ٢٠٢٤"),
    ("chi_sim", "中国 人口 十三 大国"),
    ("chi_tra", "學生 愛 馬車 見長"),
)

#: payload containers in rotation — the round-6 codec surface
MULTI_KINDS = ("PNG", "G4", "JBIG2S", "JBIG2HF10", "DCTA")


def multilingual_counts(n_docs: int) -> int:
    """Payload-table size for a corpus size (shared by the registered query
    and the golden builder); always covers every language at least once."""
    return max(len(MULTI_LANGS), n_docs // 50)


def make_multilingual_payload(i: int) -> tuple[str, str, bytes]:
    """(lang, kind, payload) — a pure function of ``i``: the language's
    native sample plus a varying numeric suffix, rendered and wrapped in
    the rotating container."""
    from ..engine import pdfx, rasters

    lang, base = MULTI_LANGS[i % len(MULTI_LANGS)]
    kind = MULTI_KINDS[i % len(MULTI_KINDS)]
    img = rasters.render_text(f"{base} {(i * 3) % 89}", scale=2)
    if kind == "PNG":
        return lang, kind, rasters.encode_png(img)
    return lang, kind, pdfx.build_image_pdf([(img, kind)])


def synthetic_multilingual_rows(n: int) -> list[tuple[str, str, str, bytes]]:
    return [
        (f"https://ml{i}.example/doc/{i}", *make_multilingual_payload(i))
        for i in range(n)
    ]


MULTI_GOLDEN_ARROW = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("status", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("n_warnings", pa.int32()),
    ]
)


def ensure_multilingual_goldens(
    n_docs: int, base: str = "/tmp/asos_spark_corpus"
) -> str:
    """Write (once, cached) golden parquet for a corpus of ``n_docs``
    pages; returns the dir. Pure single-node execution of the extraction
    kernel with the row's language — no Spark session involved."""
    from ..engine.extract import extract_document

    n = multilingual_counts(n_docs)
    # _v2: jpn sample carries voiced kana (dakuten/handakuten composition
    # landed r6); _v3: hiragana + small kana; _v4: Arabic-Indic digits —
    # payload bytes changed, so the cache key must change too
    d = os.path.join(base, f"multilingual_goldens_n{n}_v4")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    rows = []
    for url, lang, kind, payload in synthetic_multilingual_rows(n):
        r = extract_document(payload, engine="pixelocr-alt", languages=lang)
        rows.append(
            {
                "url": url,
                "lang": lang,
                "kind": kind,
                "status": r["status"],
                "extracted_text": r["extracted_text"],
                "n_warnings": len(r["warnings"]),
            }
        )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=MULTI_GOLDEN_ARROW),
        os.path.join(d, "goldens.parquet"),
        compression="zstd",
    )
    with open(done, "w") as f:
        f.write("ok")
    return d


def multilingual_oracles(n_docs: int = 2_000) -> dict[str, str]:
    d = ensure_multilingual_goldens(n_docs)
    return {
        "extract_multilingual": f"""
            SELECT url, lang, kind, status, extracted_text, n_warnings
            FROM read_parquet('{d}/goldens.parquet')
        """,
    }
