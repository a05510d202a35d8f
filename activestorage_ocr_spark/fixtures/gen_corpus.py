"""Deterministic page-corpus + golden generator (FIXTURES.md §1-2).

Generates the north-rule input table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with the payload mix of FIXTURES.md §1 (exercising every reference code path),
and the golden extraction table produced by the **same pure-Python oracle**
(`engine.extract.extract_document`) the Spark kernel maps — so the
byte-identity contract is structural (SURVEY.md §7.3).

Everything is a pure function of (seed, i): regenerating any row in isolation
yields identical bytes. Golden text embeds the reference fixture tokens
``Hello World OCR 12345`` (the reference integration tests assert them,
`rust/tests/integration_test.rs:145-241`) plus per-doc unique sentences.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..engine import pdfx, rasters
from ..engine.extract import extract_document

#: size cap used for synthetic corpora (the reference's 50 MB default scaled
#: to sandbox test scale; the pipeline takes it as a parameter).
TEST_MAX_BYTES = 262_144

_WORDS = (
    "data spark table query batch stream filter join window scan shuffle "
    "partition column row value index merge sort hash agg count group order "
    "page text word line block node tree link score clean strip token parse "
    "crawl fetch store write read cache light fast slow small large deep "
    "wide plain clear sharp round solid quick brown lazy jumps fox dog"
).split()

_UPPER_WORDS = [w.upper() for w in _WORDS[:40]]

EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

RASTER_MIMES = ("image/png", "image/jpeg", "image/gif", "image/bmp", "image/webp", "image/tiff")
PDF_IMAGE_SPACES = ("DeviceGray", "DeviceRGB", "DeviceCMYK")
ERROR_KINDS = ("oversize", "truncated_pdf", "bad_colorspace_pdf", "empty_pdf", "zero_byte", "junk")


def _rng(seed: int, i: int) -> random.Random:
    digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def doc_url(seed: int, i: int) -> str:
    h = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:12]
    return f"https://site{i % 1000}.example/p/{h}"


def payload_kind(i: int) -> str:
    """FIXTURES.md §1 payload mix by i%100: 70% html, 12% pdf text, 8% pdf
    image, 5% raster, 3% error corpus, 2% giant."""
    b = i % 100
    if b < 70:
        return "html"
    if b < 82:
        return "pdf_text"
    if b < 90:
        return "pdf_image"
    if b < 95:
        return "raster"
    if b < 98:
        return "error"
    return "giant"


def _sentence(rng: random.Random, lo=6, hi=12) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(words).capitalize() + "."


def _upper_line(rng: random.Random, marker: str, lo=2, hi=4) -> str:
    n = rng.randint(lo, hi)
    return " ".join([rng.choice(_UPPER_WORDS) for _ in range(n)] + [marker])


def _html_payload(rng: random.Random, i: int, giant: bool = False) -> bytes:
    marker = hashlib.sha1(f"m:{i}".encode()).hexdigest()[:8]
    n_paras = rng.randint(3, 8) if not giant else rng.randint(400, 600)
    paras = [
        f"<p>Hello World OCR 12345 doc {marker} opening paragraph with enough words. {_sentence(rng)}</p>"
    ]
    for _ in range(n_paras):
        paras.append(f"<p>{_sentence(rng)} {_sentence(rng)}</p>")
    items = "".join(
        f"<li>{_sentence(rng, 5, 9)}</li>" for _ in range(rng.randint(0, 4))
    )
    lst = f"<ul>{items}</ul>" if items else ""
    nav = "".join(f'<a href="/s{k}">Sec {k}</a> ' for k in range(rng.randint(3, 7)))
    side = f'<div class="sidebar"><p>{_sentence(rng)} {_sentence(rng)}</p></div>'
    ad = f'<div class="ad-box"><p>{_sentence(rng)}</p></div>'
    foot = f"<footer><p>{_sentence(rng)}</p></footer>"
    page = (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        f"<title>Doc {marker}</title><style>p{{margin:0}}</style>"
        "<script>var t='<p>boiler</p>';</script></head><body>"
        f"<nav>{nav}</nav>{side}<main><h1>Article {marker} Hello World</h1>"
        f"{''.join(paras)}{lst}</main>{ad}{foot}</body></html>"
    )
    return page.encode("utf-8")


def _pdf_text_payload(rng: random.Random, i: int) -> bytes:
    marker = hashlib.sha1(f"m:{i}".encode()).hexdigest()[:8].upper()
    n_pages = rng.randint(1, 3)
    pages = []
    for p in range(n_pages):
        lines = [f"Hello World OCR 12345 doc {marker} page {p + 1}"]
        for _ in range(rng.randint(2, 6)):
            lines.append(_sentence(rng))
        pages.append(lines)
    return pdfx.build_text_pdf(pages)


def _pdf_image_payload(rng: random.Random, i: int) -> bytes:
    marker = hashlib.sha1(f"m:{i}".encode()).hexdigest()[:8].upper()
    n_imgs = rng.randint(1, 2)
    images = []
    for k in range(n_imgs):
        lines = [f"HELLO WORLD OCR 12345 {marker}", _upper_line(rng, f"IMG{k}")]
        gray = rasters.render_text("\n".join(lines), scale=2)
        cs = PDF_IMAGE_SPACES[(i + k) % len(PDF_IMAGE_SPACES)]
        if cs == "DeviceGray":
            images.append((gray, cs))
        elif cs == "DeviceRGB":
            images.append((rasters.to_rgb(gray), cs))
        else:  # DeviceCMYK: K = 255-gray reproduces gray exactly under E3 math
            cmyk = np.zeros((*gray.shape, 4), dtype=np.uint8)
            cmyk[..., 3] = 255 - gray
            images.append((cmyk, cs))
    return pdfx.build_image_pdf(images)


def _raster_payload(rng: random.Random, i: int) -> bytes:
    marker = hashlib.sha1(f"m:{i}".encode()).hexdigest()[:8].upper()
    mime = RASTER_MIMES[i % len(RASTER_MIMES)]
    lines = [f"HELLO WORLD OCR 12345", _upper_line(rng, marker)]
    gray = rasters.render_text("\n".join(lines), scale=2)
    return rasters.encode_image(gray, mime)


def _error_payload(rng: random.Random, i: int, max_bytes: int) -> bytes:
    kind = ERROR_KINDS[i % len(ERROR_KINDS)]
    if kind == "oversize":
        body = bytes(rng.getrandbits(8) for _ in range(64))
        return b"%PDF-1.4 " + body * ((max_bytes // 64) + 2)
    if kind == "truncated_pdf":
        full = pdfx.build_text_pdf([[_sentence(rng)]])
        # cut inside the header/first object so the parse reliably fails
        return full[: rng.randint(10, 24)]
    if kind == "bad_colorspace_pdf":
        gray = rasters.render_text("LOST TEXT", scale=1)
        return pdfx.build_image_pdf([(rasters.to_rgb(gray), "BogusSpace")])
    if kind == "empty_pdf":
        return pdfx.build_empty_pdf()
    if kind == "zero_byte":
        return b""
    return bytes([0, 7, 13]) + bytes(rng.getrandbits(8) for _ in range(61))


def make_payload(seed: int, i: int, max_bytes: int = TEST_MAX_BYTES) -> bytes:
    rng = _rng(seed, i)
    kind = payload_kind(i)
    if kind == "html":
        return _html_payload(rng, i)
    if kind == "pdf_text":
        return _pdf_text_payload(rng, i)
    if kind == "pdf_image":
        return _pdf_image_payload(rng, i)
    if kind == "raster":
        return _raster_payload(rng, i)
    if kind == "error":
        return _error_payload(rng, i, max_bytes)
    return _html_payload(rng, i, giant=True)


def row_lang(seed: int, i: int) -> str:
    """The row's lang column — a pure function of (seed, i) so the golden
    generator can thread the SAME language request as the Spark kernel
    (byte-identity stays structural)."""
    rng = _rng(seed, i + 10_000_019)
    langs = ["eng"] * 17 + ["deu", "fra", "spa"]
    return langs[rng.randrange(len(langs))]


def make_row(seed: int, i: int, max_bytes: int = TEST_MAX_BYTES) -> dict:
    """One pages-table row (FIXTURES.md §1)."""
    rng = _rng(seed, i + 10_000_019)  # independent stream from the payload's
    payload = make_payload(seed, i, max_bytes)
    lang = row_lang(seed, i)
    rng.randrange(20)  # keep the stream aligned with row_lang's draw
    # `text`: stale upstream text — null 80%, else a truncated golden prefix
    text = None
    if rng.random() >= 0.8:
        golden = extract_document(payload, max_bytes=max_bytes, languages=lang)
        text = golden["extracted_text"][:50] or None
    return {
        "url": doc_url(seed, i),
        "warc_ts": EPOCH + dt.timedelta(seconds=i * 37),
        "html": payload,
        "text": text,
        "lang": lang,
    }


PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

GOLDEN_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("mime", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("confidence", pa.float64()),
        pa.field("engine", pa.string()),
        pa.field("status", pa.string()),
        pa.field("error_code", pa.string()),
        pa.field("warnings", pa.list_(pa.string())),
        pa.field(
            "spans",
            pa.list_(
                pa.struct(
                    [
                        pa.field("start", pa.int64()),
                        pa.field("end", pa.int64()),
                        pa.field("kind", pa.string()),
                    ]
                )
            ),
        ),
    ]
)


def generate_pages(n: int, seed: int = 42, max_bytes: int = TEST_MAX_BYTES) -> pa.Table:
    rows = [make_row(seed, i, max_bytes) for i in range(n)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def generate_goldens(
    n: int,
    seed: int = 42,
    max_bytes: int = TEST_MAX_BYTES,
    engine: str = "pixelocr",
    preset: str = "minimal",
) -> pa.Table:
    """Run the single-node oracle over every payload — never Spark."""
    rows = []
    for i in range(n):
        payload = make_payload(seed, i, max_bytes)
        r = extract_document(
            payload, engine=engine, preset=preset, max_bytes=max_bytes,
            languages=row_lang(seed, i),
        )
        rows.append(
            {
                "url": doc_url(seed, i),
                "mime": r["mime"],
                "extracted_text": r["extracted_text"],
                "confidence": r["confidence"],
                "engine": r["engine"],
                "status": r["status"],
                "error_code": r["error_code"],
                "warnings": r["warnings"],
                "spans": [{"start": s, "end": e, "kind": k} for s, e, k in r["spans"]],
            }
        )
    return pa.Table.from_pylist(rows, schema=GOLDEN_SCHEMA)


def _chunk_rows(args: tuple) -> tuple[list[dict], list[dict]]:
    """Worker: pages rows + golden rows for i in [lo, hi) (process-pool unit)."""
    lo, hi, seed, max_bytes, engine, preset = args
    pages = []
    goldens = []
    for i in range(lo, hi):
        pages.append(make_row(seed, i, max_bytes))
        payload = make_payload(seed, i, max_bytes)
        r = extract_document(
            payload, engine=engine, preset=preset, max_bytes=max_bytes,
            languages=row_lang(seed, i),
        )
        goldens.append(
            {
                "url": doc_url(seed, i),
                "mime": r["mime"],
                "extracted_text": r["extracted_text"],
                "confidence": r["confidence"],
                "engine": r["engine"],
                "status": r["status"],
                "error_code": r["error_code"],
                "warnings": r["warnings"],
                "spans": [{"start": s, "end": e, "kind": k} for s, e, k in r["spans"]],
            }
        )
    return pages, goldens


def generate_corpus_parallel(
    n: int,
    seed: int = 42,
    max_bytes: int = TEST_MAX_BYTES,
    engine: str = "pixelocr",
    preset: str = "minimal",
    workers: int = 16,
) -> tuple[pa.Table, pa.Table]:
    """Deterministic corpus generation fanned out over a process pool (every
    row is a pure function of (seed, i), so chunking changes nothing)."""
    from concurrent.futures import ProcessPoolExecutor

    step = max(64, (n + workers - 1) // workers)
    chunks = [(lo, min(lo + step, n), seed, max_bytes, engine, preset) for lo in range(0, n, step)]
    pages_rows: list[dict] = []
    golden_rows: list[dict] = []
    with ProcessPoolExecutor(max_workers=workers) as pool:
        for pages, goldens in pool.map(_chunk_rows, chunks):
            pages_rows.extend(pages)
            golden_rows.extend(goldens)
    return (
        pa.Table.from_pylist(pages_rows, schema=PAGES_SCHEMA),
        pa.Table.from_pylist(golden_rows, schema=GOLDEN_SCHEMA),
    )


def corpus_dir(
    n: int,
    seed: int = 42,
    max_bytes: int = TEST_MAX_BYTES,
    engine: str = "pixelocr",
    preset: str = "minimal",
    base: str = "/tmp/asos_spark_corpus",
) -> str:
    return os.path.join(base, f"n{n}_seed{seed}_max{max_bytes}_{engine}_{preset}_v2")


def ensure_corpus(
    n: int,
    seed: int = 42,
    max_bytes: int = TEST_MAX_BYTES,
    engine: str = "pixelocr",
    preset: str = "minimal",
    base: str = "/tmp/asos_spark_corpus",
    workers: int | None = None,
) -> str:
    """Write (once, cached) pages.parquet + goldens.parquet; returns the dir.
    ``workers`` fans generation out over a process pool (identical output —
    every row is a pure function of (seed, i))."""
    d = corpus_dir(n, seed, max_bytes, engine, preset, base)
    pages_path = os.path.join(d, "pages.parquet")
    goldens_path = os.path.join(d, "goldens.parquet")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    if workers is None and n >= 2000:
        workers = min(16, os.cpu_count() or 1)
    if workers:
        pages_tbl, goldens_tbl = generate_corpus_parallel(n, seed, max_bytes, engine, preset, workers)
    else:
        pages_tbl = generate_pages(n, seed, max_bytes)
        goldens_tbl = generate_goldens(n, seed, max_bytes, engine, preset)
    # pages is written as a DIRECTORY of part files with small row groups —
    # the realistic Common-Crawl layout. A single-file single-row-group table
    # scans as ONE Spark task and serializes the pipeline's first stage
    # (measured: scaling efficiency 0.33 until fixed).
    n_files = max(1, min(64, n // 1000))
    os.makedirs(pages_path, exist_ok=True)
    step = (pages_tbl.num_rows + n_files - 1) // n_files
    for k in range(n_files):
        part = pages_tbl.slice(k * step, step)
        if part.num_rows:
            pq.write_table(
                part,
                os.path.join(pages_path, f"part-{k:05d}.parquet"),
                compression="zstd",
                row_group_size=256,
            )
    pq.write_table(goldens_tbl, goldens_path, compression="zstd", row_group_size=2048)
    with open(done, "w") as f:
        f.write("ok")
    return d
