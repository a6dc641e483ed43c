"""Per-record extraction: sniff → dispatch → (text, char_spans, status).

This is the single definition of "extract one page" used by BOTH the
sequential oracle and the Ray actor stage — byte-identity per url is by
construction; the tests then guard ordering/parallelism drift.

Error semantics follow the reference's per-record isolation
(``try/except: continue`` per file, e.g. ``sync_to_onedrive.py:376-378``)
upgraded per the north rule: kernels never raise — failed rows become
quarantine rows with a reason, never lost and never fatal.
"""

from __future__ import annotations

import time

from pdf_extractor_ray.kernels.normalize import collapse_ws, normalize_ligatures
from pdf_extractor_ray.kernels.registry import get_kernel
from pdf_extractor_ray.kernels.sniff import (
    KIND_BINARY,
    KIND_EMPTY,
    KIND_HTML,
    KIND_PDF,
    KIND_TEXT,
    sniff,
    size_bucket,
)

STATUS_OK = "ok"
STATUS_EMPTY = "empty"

# A payload larger than this is quarantined unparsed: at 100 TB scale a
# handful of GB-sized rows must not be able to blow a worker heap.
MAX_DOC_BYTES = 64 * 1024 * 1024
# Soft per-document wall-clock budget (checked after the fact — CPython
# can't preempt a kernel; the size cap above bounds the real risk).
DOC_TIME_BUDGET_S = 30.0


def extract_record(url: str, raw: bytes | None) -> dict:
    """Extract one page. Always returns a full record, never raises."""
    kind = sniff(raw)
    n_bytes = 0 if raw is None else len(raw)
    rec = {
        "url": url,
        "kind": kind,
        "size_bucket": size_bucket(n_bytes),
        "n_bytes": n_bytes,
        "extracted_text": "",
        "char_spans": [],
        "status": STATUS_OK,
        "error": "",
    }
    if kind == KIND_EMPTY:
        rec["status"] = STATUS_EMPTY
        return rec
    if n_bytes > MAX_DOC_BYTES:
        rec["status"] = "quarantined:oversize"
        rec["error"] = f"payload {n_bytes} bytes > {MAX_DOC_BYTES}"
        return rec
    t0 = time.monotonic()
    try:
        kernel = get_kernel(kind)
        if kernel is not None:  # registry: pdf, html, user-registered kinds
            text, spans = kernel(raw)
        elif kind == KIND_TEXT:
            text = collapse_ws(normalize_ligatures(raw.decode("utf-8", errors="replace")))
            spans = [{"start": 0, "end": len(text), "page": 0, "bbox": None}] if text else []
        else:  # binary, not PDF: nothing to extract
            rec["status"] = f"quarantined:unsupported-{KIND_BINARY}"
            return rec
    except Exception as e:  # parse failure → quarantine, never fatal
        rec["status"] = "quarantined:parse-error"
        rec["error"] = f"{type(e).__name__}: {e}"[:500]
        return rec
    elapsed = time.monotonic() - t0
    if elapsed > DOC_TIME_BUDGET_S:
        rec["status"] = "quarantined:timeout"
        rec["error"] = f"extraction took {elapsed:.1f}s > {DOC_TIME_BUDGET_S}s budget"
        return rec
    if not text.strip():
        rec["status"] = STATUS_EMPTY
        rec["extracted_text"] = ""
        rec["char_spans"] = []
        return rec
    rec["extracted_text"] = text
    rec["char_spans"] = spans
    return rec
