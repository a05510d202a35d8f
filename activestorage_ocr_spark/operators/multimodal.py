"""Multimodal column plumbing: treat image payloads as opaque binary with
typed metadata, decoded inside Arrow-batched kernels (the task-brief pattern
for image/audio/video at 100 TB: schema + partitioning + batch shape are
real, and as of round 2 so are all six codecs).

Decoders: PNG/BMP/TIFF/GIF are real pure-Python codecs; JPEG decodes real
baseline DCT (engine/jpegx.py) and WEBP real VP8L lossless
(engine/webpx.py), each still accepting the round-1 deterministic stub
container for corpus payloads (the ``decoder`` column reports which form a
payload used). Undecodable payloads (progressive JPEG, VP8 lossy) land in
the ``decode_error`` column rather than killing the job — same quarantine
posture as the extraction pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = (
    "url string, mime string, width int, height int, n_pixels bigint, "
    "ink_ratio double, decoder string, decode_error string"
)


def _container_kind(payload: bytes, mime: str) -> str:
    """'stub' when the payload is the round-1 deterministic container,
    'real' for a true JPEG/VP8L stream (and all other codecs)."""
    from ..engine.rasters import _STUB_TAG

    if mime == "image/jpeg" and _STUB_TAG in payload[:64]:
        return "stub"
    if mime == "image/webp" and b"GRAY" in payload[:32]:
        return "stub"
    return "real"


def _meta_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    from ..engine import mime as mimex, rasters

    out_schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("mime", pa.string()),
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("n_pixels", pa.int64()),
            pa.field("ink_ratio", pa.float64()),
            pa.field("decoder", pa.string()),
            pa.field("decode_error", pa.string()),
        ]
    )
    for batch in batches:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        rows = {f.name: [] for f in out_schema}
        for u, payload in zip(urls, payloads):
            m = mimex.sniff_mime(payload or b"")
            if m not in mimex.IMAGE_MIMES:
                continue
            rows["url"].append(u)
            rows["mime"].append(m)
            rows["decoder"].append(_container_kind(payload, m))
            try:
                gray = rasters.decode_image(payload, m)
                if gray.ndim == 3:
                    gray = rasters.rgb_to_gray(gray)
                h, w = gray.shape
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["ink_ratio"].append(round(float((gray < 128).mean()), 6))
                rows["decode_error"].append(None)
            except Exception as e:  # noqa: BLE001 quarantine posture
                rows["width"].append(None)
                rows["height"].append(None)
                rows["n_pixels"].append(None)
                rows["ink_ratio"].append(None)
                rows["decode_error"].append(f"{type(e).__name__}: {e}")
        yield pa.RecordBatch.from_arrays(
            [pa.array(rows[f.name], type=f.type) for f in out_schema], schema=out_schema
        )


def image_metadata(pages: DataFrame) -> DataFrame:
    """(url, html) -> typed image metadata for image-sniffed payloads."""
    from .extraction import ensure_workers_can_import

    ensure_workers_can_import(pages.sparkSession)
    proj = pages.select("url", "html")
    return proj.mapInArrow(_meta_kernel, IMAGE_META_SCHEMA)
