"""Content-kind sniffing + size bucketing.

Analog of the reference's implicit per-file dispatch (everything there is
a PDF opened by path, ``pdf_extractor/services/pdf_service.py:16``); here
each row's raw ``html:binary`` payload is classified by magic bytes so a
single pipeline handles mixed Common-Crawl-style content.
"""

from __future__ import annotations

# Size-bucket upper bounds in bytes; the last bucket is open-ended.
# Buckets drive batch sizing / skew isolation (SURVEY.md §4.3): mega-docs
# must not share a batch with thousands of small docs.
SIZE_BUCKET_BOUNDS = (16 * 1024, 256 * 1024, 4 * 1024 * 1024)

KIND_PDF = "pdf"
KIND_HTML = "html"
KIND_TEXT = "text"
KIND_EMPTY = "empty"
KIND_BINARY = "binary"

_HTML_MARKERS = (b"<html", b"<!doctype", b"<head", b"<body", b"<div", b"<p>", b"<HTML", b"<!DOCTYPE")


def sniff(raw: bytes | None) -> str:
    """Classify a raw payload: pdf | html | text | empty | binary."""
    if raw is None or len(raw) == 0:
        return KIND_EMPTY
    if raw[:5] == b"%PDF-":
        return KIND_PDF
    head = raw[:512]
    low = head.lower()
    if any(m.lower() in low for m in _HTML_MARKERS):
        return KIND_HTML
    # printable-utf8 heuristic; a multi-byte char straddling the 512-byte
    # probe boundary is NOT binary (error within the last 3 bytes)
    try:
        head.decode("utf-8")
    except UnicodeDecodeError as e:
        if e.start < len(head) - 3:
            return KIND_BINARY
    if b"\x00" in head:
        return KIND_BINARY
    return KIND_TEXT


def size_bucket(n_bytes: int) -> int:
    """0 = tiny(<16K), 1 = small(<256K), 2 = big(<4M), 3 = mega."""
    for i, bound in enumerate(SIZE_BUCKET_BOUNDS):
        if n_bytes < bound:
            return i
    return len(SIZE_BUCKET_BOUNDS)
