"""Magic-byte MIME sniffing.

The reference trusts a declared content type for routing but also sniffs PDFs
from magic bytes (`rust/src/engines/ocrs.rs:410-428`, `rust/src/server.rs:218`:
``mime == "application/pdf" || data.starts_with(b"%PDF-")``). Our pipeline never
trusts declared types (SURVEY.md §2.2 P2): every payload is sniffed from its
leading bytes. The accepted-format vocabulary is the reference's 7 MIME types
(`lib/activestorage/ocr/configuration.rb:105-115`) plus ``text/html`` (the graft
payload) — everything else is ``application/octet-stream`` and is quarantined
as UNSUPPORTED_FORMAT downstream.
"""

from __future__ import annotations

MIME_PDF = "application/pdf"
MIME_PNG = "image/png"
MIME_JPEG = "image/jpeg"
MIME_GIF = "image/gif"
MIME_BMP = "image/bmp"
MIME_WEBP = "image/webp"
MIME_TIFF = "image/tiff"
MIME_HTML = "text/html"
MIME_OCTET = "application/octet-stream"

#: The reference's supported content types (configuration.rb:105-115) + HTML.
SUPPORTED_MIMES = frozenset(
    {MIME_PDF, MIME_PNG, MIME_JPEG, MIME_GIF, MIME_BMP, MIME_WEBP, MIME_TIFF, MIME_HTML}
)

IMAGE_MIMES = frozenset({MIME_PNG, MIME_JPEG, MIME_GIF, MIME_BMP, MIME_WEBP, MIME_TIFF})

# Markers that make a payload "look like HTML" once lowercased. Strong
# markers count anywhere in the head; weak (generic tag) markers only count
# when the payload itself *starts* with a tag — otherwise a JS bundle or JSON
# document containing '<p>' in a string literal would route to the HTML
# branch instead of UNSUPPORTED_FORMAT quarantine.
_HTML_STRONG_MARKERS = (b"<!doctype html", b"<html")
_HTML_WEAK_MARKERS = (b"<head", b"<body", b"<main", b"<div", b"<p>", b"<article")


def sniff_mime(payload: bytes) -> str:
    """Sniff a MIME type from leading magic bytes.

    Branch order mirrors the reference's PDF-first sniff then falls through the
    image magics it supports; the HTML heuristic is the graft addition.
    """
    if not payload:
        return MIME_OCTET
    if payload[:5] == b"%PDF-":
        return MIME_PDF
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return MIME_PNG
    if payload[:3] == b"\xff\xd8\xff":
        return MIME_JPEG
    if payload[:4] in (b"GIF8",):
        return MIME_GIF
    if payload[:2] == b"BM":
        return MIME_BMP
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return MIME_WEBP
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return MIME_TIFF
    head = payload[:1024].lstrip(b"\xef\xbb\xbf \t\r\n").lower()
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # UTF-16 BOM: transcode the head so the HTML markers are visible
        enc = "utf-16-le" if payload[:2] == b"\xff\xfe" else "utf-16-be"
        head = (
            payload[2:2050].decode(enc, errors="replace")
            .encode("utf-8", errors="replace").lstrip().lower()
        )
    if any(m in head for m in _HTML_STRONG_MARKERS):
        return MIME_HTML
    if head.startswith(b"<") and any(m in head for m in _HTML_WEAK_MARKERS):
        return MIME_HTML
    return MIME_OCTET
