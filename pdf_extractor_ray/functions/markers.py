"""Coordinate-marker DSL compatibility (M3/M4/M5/M18).

The reference serializes (text, span) pairs into an inline string DSL
``[text]<@page:x1,y1,x2,y2>`` (``core/extractor.py:136``,
``excel2training.py:296``) and later regex-parses / strips it
(``extractor.py:158-199``; quality counting ``train.py:17-35``).

The new engine's native representation is structured ``char_spans``
offsets; these functions are the lossless bridge for interchange with
reference-produced artifacts (training JSONs, validation goldens). The
``:.1f`` float formatting matches the reference exactly — it is part of
the byte format.
"""

from __future__ import annotations

import re

_MARKER_RE = re.compile(r"<@(\d+):([\d.+-]+),([\d.+-]+),([\d.+-]+),([\d.+-]+)>")
_BRACKETED_MARKER_RE = re.compile(
    r"\[([^\[\]]*)\]<@(\d+):([\d.+-]+),([\d.+-]+),([\d.+-]+),([\d.+-]+)>"
)


def to_marker_text(text: str, char_spans: list[dict]) -> str:
    """(extracted_text, char_spans) → ``[text]<@page:x1,y1,x2,y2>…``
    concatenation (spans without bbox are emitted as plain text)."""
    parts = []
    for s in char_spans:
        seg = text[s["start"] : s["end"]]
        bbox = s.get("bbox")
        if bbox is None:
            parts.append(seg)
        else:
            parts.append(
                f"[{seg}]<@{s['page']}:{bbox[0]:.1f},{bbox[1]:.1f},{bbox[2]:.1f},{bbox[3]:.1f}>"
            )
    return " ".join(parts)


def parse_markers(marker_text: str) -> list[dict]:
    """Marker string → list of {text, page, bbox} (M4 parser)."""
    out = []
    for m in _BRACKETED_MARKER_RE.finditer(marker_text):
        out.append(
            {
                "text": m.group(1),
                "page": int(m.group(2)),
                "bbox": [float(m.group(i)) for i in range(3, 7)],
            }
        )
    return out


def parse_first_coordinates(value: str) -> tuple[int, list[float]] | None:
    """First ``<@…>`` marker in a value → (page, bbox), else None."""
    m = _MARKER_RE.search(value)
    if not m:
        return None
    return int(m.group(1)), [float(m.group(i)) for i in range(2, 6)]


def strip_markers(value: str) -> str:
    """Remove ``<@…>`` markers and unwrap ``[...]`` (M5 cleaner)."""
    v = _MARKER_RE.sub("", value)
    v = re.sub(r"\[([^\[\]]*)\]", r"\1", v)
    return v.strip()


def marker_stats(content: str) -> dict:
    """M18 coordinate-format validator: marker count + distinct pages."""
    markers = _MARKER_RE.findall(content)
    return {
        "n_markers": len(markers),
        "n_pages": len({m[0] for m in markers}),
        "has_coordinates": bool(markers),
    }
