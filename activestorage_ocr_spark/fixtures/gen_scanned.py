"""Deterministic scanned-PDF corpus + golden-parquet oracle for the round-4
codec stack (CCITT G3/G4, JBIG2 generic/symbol/refinement/halftone/refagg,
JPEG 2000) — wiring the codecs through the DISTRIBUTED pipeline as a
first-class oracled driver query rather than pytest-only coverage.

Pattern mirrors `gen_media.py`: every golden row is the SINGLE-NODE
execution of the identical kernel function (`engine.extract.extract_document`)
over the exact same payload; DuckDB reads the goldens, the driver compares
the Spark run against them. The bench page corpus deliberately excludes
these payloads (bench comparability across rounds); this separate table is
where they live.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

#: fixture kinds in rotation — every codec path (CCITT, JBIG2, JPX,
#: arithmetic JPEG) plus the DCT baseline for contrast; names are
#: `pdfx.build_image_pdf` colorspace codes
SCANNED_KINDS = (
    "G4", "G4A", "G3", "G32D", "G32DA",
    "JBIG2", "JBIG2G", "JBIG2S", "JBIG2R", "JBIG2H", "JBIG2RA",
    "JBIG2HF", "JBIG2HM",
    "JPX", "JPXJ", "JPXL",
    "DCTA",
)


def scanned_counts(n_docs: int) -> int:
    """Payload-table size for a given corpus size (shared by the registered
    query and the golden builder). Small by design: each payload exercises
    a pure-Python codec end-to-end (encode + decode + OCR)."""
    return max(14, n_docs // 50)


def make_scanned_payload(i: int) -> bytes:
    """One scanned-PDF payload — a pure function of ``i``: rendered text
    encoded through the rotating codec kind; every 11th payload truncates
    the image stream (per-image skip + empty-PDF path); every 5th uses the
    PDF 1.5 ObjStm layout; encryption rotates in (RC4-128 at i%13==6,
    AES-128 at i%13==12, AES-256/R6 at i%17==16) — so the driver-level
    oracle also covers the modern-producer layouts end to end."""
    from ..engine import pdfx, rasters

    kind = SCANNED_KINDS[i % len(SCANNED_KINDS)]
    text = f"SCAN {i} CODE {(i * 7) % 97}"
    img = rasters.render_text(text, scale=2)
    encrypt = None
    if i % 17 == 16:
        encrypt = "aes256"
    elif i % 13 == 12:
        encrypt = "aes"
    elif i % 13 == 6:
        encrypt = "rc4"
    return pdfx.build_image_pdf(
        [(img, kind)],
        corrupt_data=(i % 11 == 10),
        objstm=(i % 5 == 3),
        encrypt=encrypt,
    )


def synthetic_scanned_rows(n: int) -> list[tuple[str, bytes]]:
    return [
        (f"https://scan{i}.example/doc/{i}", make_scanned_payload(i))
        for i in range(n)
    ]


SCANNED_GOLDEN_ARROW = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("status", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("n_warnings", pa.int32()),
    ]
)


def ensure_scanned_goldens(n_docs: int, base: str = "/tmp/asos_spark_corpus") -> str:
    """Write (once, cached) pages + golden parquet for a corpus of
    ``n_docs`` pages; returns the dir. Pure single-node execution of the
    extraction kernel — no Spark session involved."""
    from ..engine.extract import extract_document

    n = scanned_counts(n_docs)
    # _v3: AESV3 raw-file-key fix; _v4: JBIG2HF/JBIG2HM kinds join the
    # rotation; _v5: DCTA (arithmetic-coded JPEG) joins — payload bytes
    # changed, so the cache key must change too
    d = os.path.join(base, f"scanned_goldens_n{n}_v5")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    rows = []
    for i, (url, payload) in enumerate(synthetic_scanned_rows(n)):
        r = extract_document(payload)
        rows.append(
            {
                "url": url,
                "kind": SCANNED_KINDS[i % len(SCANNED_KINDS)],
                "status": r["status"],
                "extracted_text": r["extracted_text"],
                "n_warnings": len(r["warnings"]),
            }
        )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=SCANNED_GOLDEN_ARROW),
        os.path.join(d, "goldens.parquet"),
        compression="zstd",
    )
    with open(done, "w") as f:
        f.write("ok")
    return d


def scanned_oracles(n_docs: int = 2_000) -> dict[str, str]:
    d = ensure_scanned_goldens(n_docs)
    return {
        "extract_scanned": f"""
            SELECT url, kind, status, extracted_text, n_warnings
            FROM read_parquet('{d}/goldens.parquet')
        """,
    }
