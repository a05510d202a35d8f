"""activestorage_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the *capabilities* of
``Cause-of-a-Kind/activestorage-ocr`` (a Ruby-gem + Rust-HTTP-server OCR system,
studied read-only at /root/reference) as a batch extraction pipeline over
Common-Crawl-style web-page tables:

    (url string, warc_ts timestamp, html binary, text string, lang string)

Each row's binary payload is MIME-sniffed and routed to one of:

* an HTML boilerplate stripper (text-density + link-density block scoring,
  Arc90/Readability-style),
* a PDF parser (embedded text layer first — with the reference's trim + >10-char
  gate, ``rust/src/engines/ocrs.rs:126-145`` — falling back to image-XObject
  extraction + OCR, ``ocrs.rs:431-582``),
* a deterministic raster OCR stand-in (pixel-font decode; the reference's neural
  ``ocrs`` engine cannot ship in this sandbox),

all inside Arrow-vectorized ``mapInArrow`` kernels — never per-row Python UDFs.

Layout:
    engine/     pure-Python/numpy per-document kernels (no Spark imports) —
                shared verbatim by the Spark pipeline and the golden oracle,
                so byte-identity of extracted text is structural.
    fixtures/   deterministic synthetic page-corpus + golden generator.
    sources/    table readers/writers (parquet now; Iceberg-shaped API).
    operators/  Spark operators: extraction pipeline, skew binning, lineage,
                checkpoint/resume, dedup, similarity search, text stats.
    functions/  reusable pyspark.sql column-expression builders.
    plans/      the driver-contract query registry (queries + DuckDB oracles).
"""

__version__ = "0.1.0"
