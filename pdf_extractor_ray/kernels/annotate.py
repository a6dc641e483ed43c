"""Annotated-PDF writer (K2 — ``pdf_service.py:75-192``).

Produces a debug copy of a PDF with each extracted field highlighted:
a yellow rectangle over the field's bbox and a blue key label drawn
below it at a quarter of the field's font size (the reference's layout
constants). Fields are deduplicated by ``key:value`` within one
document (T6/O9, ``pdf_service.py:101-110``).

Unlike the reference (which re-extracts positions from the PDF,
parsing it twice — SURVEY.md §4.4.3), this writer takes the already
computed field positions and only rewrites the content streams: the
original stream is decompressed if needed, the overlay ops are
appended, and the object is re-emitted uncompressed with a corrected
``/Length``.

Not on the hot path: used by the optional debug sink stage.
"""

from __future__ import annotations

import re
import zlib

from pdf_extractor_ray.kernels.pdf_extract import (
    _LENGTH_RE,
    _page_order,
    _parse_objects,
)

# indirect length ('/Length 60 0 R') in a head we are rewriting: the
# re-emitted stream is uncompressed with a known byte count, so the
# reference is replaced by the literal value
_LENGTH_REF_RE = re.compile(rb"/Length\s+\d+\s+0\s+R")
_CATALOG_RE = re.compile(rb"/Type\s*/Catalog")

HIGHLIGHT_RGB = (1.0, 1.0, 0.0)  # yellow
LABEL_RGB = (0.0, 0.0, 1.0)  # blue
LABEL_FONT_FRACTION = 0.25  # label font = value font / 4


def _overlay_ops(fields: list[dict], page_height: float) -> bytes:
    """Drawing ops for one page's fields (bboxes are top-down y)."""
    ops = bytearray()
    for f in fields:
        x0, y0_top, x1, y1_top = f["bbox"]
        h = y1_top - y0_top
        y_pdf = page_height - y1_top  # bottom edge in PDF coords
        r, g, b = HIGHLIGHT_RGB
        ops.extend(
            f"q {r:g} {g:g} {b:g} rg {x0:.1f} {y_pdf:.1f} {x1 - x0:.1f} {h:.1f} re f Q\n".encode()
        )
        label = f["key"].replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        font = max(1.0, h * LABEL_FONT_FRACTION)
        lr, lg, lb = LABEL_RGB
        ops.extend(
            f"BT /F1 {font:.1f} Tf {lr:g} {lg:g} {lb:g} rg 1 0 0 1 {x0:.1f} {y_pdf - font - 1:.1f} Tm (".encode()
            + label.encode("utf-8")
            + b") Tj ET\n"
        )
    return bytes(ops)


def annotate_pdf(raw: bytes, fields: list[dict]) -> bytes:
    """Original PDF bytes + fields ``{key, value, page, bbox}`` →
    annotated copy. Fields without page/bbox are skipped; duplicates by
    ``key:value`` are drawn once."""
    objects = _parse_objects(raw)
    # page index ↔ content-object mapping MUST match pdf_extract's
    # /Kids-tree page order, or highlights land on the wrong page
    pages = _page_order(objects)

    seen: set[str] = set()
    per_page: dict[int, list[dict]] = {}
    for f in fields:
        if f.get("page") is None or f.get("bbox") is None:
            continue
        dedup_key = f"{f['key']}:{f.get('value', '')}"
        if dedup_key in seen:
            continue
        seen.add(dedup_key)
        per_page.setdefault(int(f["page"]), []).append(f)

    out = bytearray(b"%PDF-1.4\n")
    for num in sorted(objects):
        head, stream = objects[num]
        page_idx = next((i for i, (cn, _h) in enumerate(pages) if cn == num), None)
        if page_idx is not None and stream is not None and per_page.get(page_idx):
            data = stream
            if b"/FlateDecode" in head:
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    data = zlib.decompress(data.rstrip(b"\r\n"))
            data = data + b"\n" + _overlay_ops(per_page[page_idx], pages[page_idx][1])
            new_len = f"/Length {len(data)}".encode()
            new_head, n_sub = _LENGTH_REF_RE.subn(new_len, head)
            if not n_sub:
                new_head, n_sub = _LENGTH_RE.subn(new_len, new_head)
            if not n_sub:
                # insert before the LAST '>>' — the first one may close
                # a nested sub-dictionary (e.g. /DecodeParms << ... >>),
                # which would make /Length a sub-dict entry
                cut = new_head.rfind(b">>")
                if cut != -1:
                    new_head = new_head[:cut] + b" " + new_len + b" " + new_head[cut:]
            new_head = new_head.replace(b"/Filter /FlateDecode", b"").replace(b"/Filter/FlateDecode", b"")
            out.extend(f"{num} 0 obj".encode() + new_head + b"stream\n" + data + b"\nendstream\nendobj\n")
        elif stream is not None:
            out.extend(f"{num} 0 obj".encode() + head + b"stream\n" + stream + b"\nendstream\nendobj\n")
        else:
            out.extend(f"{num} 0 obj".encode() + head + b"endobj\n")
    # point the trailer at the actual catalog object (it is not always
    # object 1 — strict viewers reject a wrong /Root)
    root = next((n for n in sorted(objects) if _CATALOG_RE.search(objects[n][0])), 1)
    out.extend(f"trailer\n<< /Root {root} 0 R >>\n%%EOF\n".encode())
    return bytes(out)
