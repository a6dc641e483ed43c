"""WARC (Web ARChive, ISO 28500) record reader — the container format
Common-Crawl-style corpora arrive in, closing the source-format family
(parquet, JSON, pages, WARC). Pure-bytes parser: no external libs, no
network; the Ray-side surface is a ``map_batches`` over a binary
``warc`` column (one WARC file slice per row), emitting one row per
``response`` record with the HTTP payload body split from its headers.

Scale shape: WARC files are independent units — the natural 100-TB
layout is one Dataset row per (file, byte-range) slice produced by the
crawl fetcher, so parsing is a zero-shuffle batch map and partition
boundaries never split a record (the fetcher writes whole records per
slice; a generic splitter would resync on the ``WARC/`` magic).
"""

from __future__ import annotations

import pandas as pd
import ray.data

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC spec's .warc.gz
    layout compresses each record as its own member so readers can
    seek); stops at the first corrupt member — same truncation
    contract as the record scan."""
    import zlib

    out: list[bytes] = []
    pos = 0
    n = len(raw)
    while pos < n and raw[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(raw[pos:]))
        except zlib.error:
            break
        if not d.eof:  # truncated member
            break
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def _iter_records(raw: bytes):
    """Shared WARC record framing: yield ``(headers, payload)`` per
    record — Content-Length framing, magic resync between records,
    case-insensitive header fold, stop-on-malformed/truncated (the
    quarantine contract every consumer inherits). ``.warc.gz`` input
    (gzip magic) is auto-detected and decompressed member by member."""
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    pos = 0
    n = len(raw)
    while pos < n:
        # resync on the record magic (tolerates inter-record padding)
        start = raw.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = raw.find(_SEP, start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[start:head_end].split(_CRLF)[1:]:
            name, sep, value = line.partition(b":")
            if sep:
                headers[name.strip().lower().decode("latin-1")] = value.strip().decode(
                    "latin-1", "replace"
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # malformed record: stop (caller quarantines the slice)
        body_start = head_end + len(_SEP)
        if body_start + length > n:
            break  # truncated payload
        yield headers, raw[body_start : body_start + length]
        pos = body_start + length


def parse_warc(raw: bytes) -> list[dict]:
    """Parse WARC records from ``raw``: one dict per ``response``
    record with keys ``url`` (WARC-Target-URI), ``ts`` (WARC-Date),
    ``http_status`` (int, from the HTTP status line; 0 when the
    payload is not HTTP) and ``body`` (bytes after the HTTP header
    block; the whole payload when not HTTP). Non-response records
    (warcinfo, request, metadata) are skipped; records with a
    malformed or missing Content-Length stop the scan (a truncation
    quarantine upstream, the flagship's contract). Header names are
    case-insensitive per the spec. ``.warc.gz`` input (gzip magic) is
    auto-detected and decompressed member by member."""
    out: list[dict] = []
    for headers, payload in _iter_records(raw):
        if headers.get("warc-type", "").lower() == "response":
            status = 0
            mime = ""
            body = payload
            if payload.startswith(b"HTTP/"):
                hdr_end = payload.find(_SEP)
                if hdr_end >= 0:
                    status_line = payload[: payload.find(_CRLF)]
                    parts = status_line.split(b" ")
                    if len(parts) >= 2 and parts[1].isdigit():
                        status = int(parts[1])
                    # media type from the HTTP Content-Type header:
                    # case-insensitive name, parameters (charset=…)
                    # stripped at ';', value lowercased — the MIME key
                    # a fetch-stats dashboard groups on
                    for line in payload[:hdr_end].split(_CRLF)[1:]:
                        name, sep, val = line.partition(b":")
                        if sep and name.strip().lower() == b"content-type":
                            mime = val.split(b";")[0].strip().lower().decode("latin-1")
                            break
                    body = payload[hdr_end + len(_SEP) :]
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "ts": headers.get("warc-date", ""),
                    "http_status": status,
                    "mime": mime,
                    "body": body,
                }
            )
    return out


def build_warc(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Serialize ``(url, ts, body, http_status)`` dicts into WARC
    bytes (response records behind a warcinfo header) — the writer
    side of the round-trip contract, and the synthesizer the tests and
    the driver carrier share."""
    chunks: list[bytes] = []
    info = b"software: pdf_extractor_ray\r\n"
    chunks.append(
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(info)).encode()
        + _SEP
        + info
    )
    for r in records:
        if r.get("revisit_of"):
            # WARC revisit record (identical-payload-digest profile):
            # no HTTP payload is re-stored — the record POINTS at the
            # prior capture via WARC-Refers-To-Target-URI. Readers that
            # only consume `response` records (parse_warc) skip these
            # by design; parse_warc_revisits resolves them.
            head = (
                b"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: "
                + r["url"].encode()
                + b"\r\nWARC-Refers-To-Target-URI: "
                + r["revisit_of"].encode()
                + b"\r\nWARC-Date: "
                + r["ts"].encode()
                + b"\r\nContent-Length: 0"
            )
            chunks.append(head + _SEP)
            continue
        status = int(r.get("http_status", 200))
        ctype = r.get("content_type", "text/html")
        payload = (
            b"HTTP/1.1 " + str(status).encode() + b" OK\r\nContent-Type: " + ctype.encode() + _SEP
            + r["body"]
        )
        head = (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + r["url"].encode()
            + b"\r\nWARC-Date: "
            + r["ts"].encode()
            + b"\r\nContent-Length: "
            + str(len(payload)).encode()
        )
        chunks.append(head + _SEP + payload)
    if gzip_members:
        import gzip as _gzip

        # one gzip member per record, per the .warc.gz convention
        return b"".join(_gzip.compress(c + _CRLF, mtime=0) for c in chunks)
    return _CRLF.join(chunks) + _CRLF


def parse_wet(raw: bytes) -> list[dict]:
    """Parse WET (WARC Extracted Text) ``conversion`` records — the
    Common Crawl distribution most text pipelines actually consume
    (pre-extracted plain text, one conversion record per page). Same
    framing/truncation contract as :func:`parse_warc` via the shared
    record iterator; yields ``{url, ts, text}`` with the payload
    decoded as UTF-8 (replace) per the WET convention. Non-conversion
    records (warcinfo) are skipped; ``.wet.gz`` auto-detected."""
    out: list[dict] = []
    for headers, payload in _iter_records(raw):
        if headers.get("warc-type", "").lower() == "conversion":
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "ts": headers.get("warc-date", ""),
                    "text": payload.decode("utf-8", "replace"),
                }
            )
    return out


def build_wet(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Serialize ``(url, ts, text)`` dicts into WET bytes (conversion
    records behind a warcinfo header) — writer side of the WET
    round-trip; the tests and the driver carrier share it."""
    chunks: list[bytes] = []
    info = b"software: pdf_extractor_ray\r\n"
    chunks.append(
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(info)).encode()
        + _SEP
        + info
    )
    for r in records:
        payload = r["text"].encode("utf-8")
        head = (
            b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "
            + r["url"].encode()
            + b"\r\nWARC-Date: "
            + r["ts"].encode()
            + b"\r\nContent-Type: text/plain\r\nContent-Length: "
            + str(len(payload)).encode()
        )
        chunks.append(head + _SEP + payload)
    if gzip_members:
        import gzip as _gzip

        return b"".join(_gzip.compress(c + _CRLF, mtime=0) for c in chunks)
    return _CRLF.join(chunks) + _CRLF


def parse_wat(raw: bytes) -> list[dict]:
    """Parse WAT (Web Archive Transformation) ``metadata`` records —
    the Common Crawl metadata distribution (one JSON envelope per
    page: head metadata + outlinks, no body). Frame contract shared
    with :func:`parse_warc`; the JSON payload parses through
    ``functions.jsonparse.parse_robust_json`` (unparseable payloads
    are skipped, not fatal). Yields ``{url, ts, title, n_links}``
    with url/ts from the WARC headers and title/link-count dug out of
    the envelope's ``HTML-Metadata`` (missing paths degrade to
    None/0 — real WAT is sparse)."""
    from pdf_extractor_ray.functions.jsonparse import parse_robust_json

    out: list[dict] = []
    for headers, payload in _iter_records(raw):
        if headers.get("warc-type", "").lower() != "metadata":
            continue
        obj, _err = parse_robust_json(payload.decode("utf-8", "replace"))
        if not isinstance(obj, dict):
            continue
        html_meta = (
            obj.get("Envelope", {})
            .get("Payload-Metadata", {})
            .get("HTTP-Response-Metadata", {})
            .get("HTML-Metadata", {})
        )
        title = html_meta.get("Head", {}).get("Title") if isinstance(html_meta, dict) else None
        links = html_meta.get("Links") if isinstance(html_meta, dict) else None
        out.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "ts": headers.get("warc-date", ""),
                "title": title if isinstance(title, str) else None,
                "n_links": len(links) if isinstance(links, list) else 0,
            }
        )
    return out


def build_wat(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Serialize ``(url, ts, title, links)`` dicts into WAT bytes
    (metadata records carrying the JSON envelope) — writer side of the
    WAT round-trip; tests and the driver carrier share it."""
    import json as _json

    chunks: list[bytes] = []
    info = b"software: pdf_extractor_ray\r\n"
    chunks.append(
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: "
        + str(len(info)).encode()
        + _SEP
        + info
    )
    for r in records:
        envelope = {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": r.get("title")},
                            "Links": [{"url": u} for u in r.get("links", [])],
                        }
                    }
                }
            }
        }
        payload = _json.dumps(envelope, sort_keys=True).encode("utf-8")
        head = (
            b"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "
            + r["url"].encode()
            + b"\r\nWARC-Date: "
            + r["ts"].encode()
            + b"\r\nContent-Type: application/json\r\nContent-Length: "
            + str(len(payload)).encode()
        )
        chunks.append(head + _SEP + payload)
    if gzip_members:
        import gzip as _gzip

        return b"".join(_gzip.compress(c + _CRLF, mtime=0) for c in chunks)
    return _CRLF.join(chunks) + _CRLF


def read_warc_batches(ds: ray.data.Dataset, warc_col: str = "warc") -> ray.data.Dataset:
    """Zero-shuffle WARC decode stage: each input row carries one WARC
    slice (binary); output rows are the parsed response records
    ``(url, warc_ts, http_status, n_body_bytes, body_prefix)`` — the
    shape the extraction pipeline's content sniff consumes."""

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        urls, tss, stats, sizes, prefixes = [], [], [], [], []
        for raw in b[warc_col]:
            for rec in parse_warc(bytes(raw)):
                urls.append(rec["url"])
                tss.append(rec["ts"])
                stats.append(rec["http_status"])
                sizes.append(len(rec["body"]))
                prefixes.append(rec["body"][:64].decode("utf-8", "replace"))
        import numpy as np

        return pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(tss, dtype="object"),
                "http_status": pd.Series(stats, dtype="int64") if stats else pd.Series([], dtype="int64"),
                "n_body_bytes": pd.Series(sizes, dtype="int64") if sizes else pd.Series([], dtype="int64"),
                "body_prefix": pd.Series(prefixes, dtype="object"),
            }
        )

    return ds.map_batches(parse, batch_format="pandas", batch_size=256)


def parse_cdxj(text: str) -> list[dict]:
    """Parse CDXJ index lines (the Common-Crawl/pywb URL-index format:
    ``<surt-key> <14-digit-timestamp> <json-blob>`` per line) into
    dicts carrying ``surt``, ``ts`` and the JSON fields (``url``,
    ``status``, ``digest``, …). Malformed lines — missing fields,
    non-digit timestamp, unparseable JSON — are SKIPPED, not fatal
    (index shards tail-truncate in practice; the quarantine-not-crash
    contract). Field values stay strings, as the format ships them."""
    import json

    out: list[dict] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split(" ", 2)
        if len(parts) != 3:
            continue
        surt, ts, blob = parts
        if not (ts.isdigit() and len(ts) == 14):
            continue
        try:
            fields = json.loads(blob)
        except ValueError:
            continue
        if not isinstance(fields, dict):
            continue
        rec = {"surt": surt, "ts": ts}
        rec.update({str(k): str(v) for k, v in fields.items()})
        out.append(rec)
    return out


def parse_warc_revisits(raw: bytes) -> list[dict]:
    """Parse WARC ``revisit`` records — the dedup channel a crawler
    writes when a refetched page's payload digest matches a prior
    capture (storing a pointer instead of the body; the reason a
    year's crawls don't store a static site 12 times). Yields
    ``{url, ts, refers_to}``; same framing/truncation contract as
    :func:`parse_warc` via the shared record iterator. Records with a
    missing Refers-To header are skipped (unresolvable pointer), not
    crashed on."""
    out: list[dict] = []
    for headers, payload in _iter_records(raw):
        if headers.get("warc-type", "").lower() == "revisit":
            refers = headers.get("warc-refers-to-target-uri", "")
            if not refers:
                continue
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "ts": headers.get("warc-date", ""),
                    "refers_to": refers,
                }
            )
    return out


def parse_warc_index(raw: bytes) -> list[dict]:
    """Generate a CDX-style random-access index from WARC bytes: one
    ``{url, ts, warc_type, offset, length}`` per response/revisit
    record, where ``raw[offset : offset + length]`` is the COMPLETE
    record (header block + payload) and re-parses standalone — the
    write-side companion of :func:`~pdf_extractor_ray.pipelines.urlops.
    parse_cdxj` (archives serve range requests off exactly this
    index). Offsets are positions in the UNCOMPRESSED stream; for
    ``.warc.gz`` input the stream is decompressed first (a production
    CDX records compressed member offsets — documented simplification,
    same index semantics). Same framing/truncation contract as
    :func:`parse_warc`."""
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
    out: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        start = raw.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = raw.find(_SEP, start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[start:head_end].split(_CRLF)[1:]:
            name, sep, value = line.partition(b":")
            if sep:
                headers[name.strip().lower().decode("latin-1")] = value.strip().decode(
                    "latin-1", "replace"
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + len(_SEP)
        if body_start + length > n:
            break
        wtype = headers.get("warc-type", "").lower()
        if wtype in ("response", "revisit"):
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "ts": headers.get("warc-date", ""),
                    "warc_type": wtype,
                    "offset": start,
                    "length": body_start + length - start,
                }
            )
        pos = body_start + length
    return out
