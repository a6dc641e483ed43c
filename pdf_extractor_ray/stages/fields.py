"""Schema-driven field extraction over extracted text + char spans.

Rebuilds the reference's field pipeline deterministically (the LLM call
is replaced by rule/regex matching — the surrounding machinery is the
capability):

- dynamic field schema with per-field alternative names and rules
  (``sharepoint_schema_builder.py:174-228`` → a broadcast table),
- filename-field bypass: keys matching the filename predicate are
  filled from the url basename without any document search
  (``core/extractor.py:44-68``),
- numbered-field pattern expansion ``KEY_1`` → ``KEY_\\d+``
  (``core/models.py:15-35``),
- first-match-wins search over the document text (the J4 containment
  join, ``extractor.py:279-293``),
- value position resolution: the char_span containing the match, with
  proportional-char-width sub-bbox interpolation
  (``pdf_service.py:43-73`` → M15),
- value normalization ``$``/``,`` strip, ``(n)`` → ``-n``
  (``sync_to_onedrive.py:40-55`` → M6).

The schema is loaded ONCE per actor in ``__init__`` from a broadcast
ref — the fix for the reference re-fetching its schema per document
(``extractor.py:222-223``, SURVEY.md §4.4.1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import ray

from pdf_extractor_ray.kernels.normalize import format_value

_FILENAME_KEYS = ("filename", "file_name", "file name", "document_name", "document name")
_NUMBERED = re.compile(r"_(\d+)$")


@dataclass
class FieldSpec:
    key: str
    alt_names: list[str] = field(default_factory=list)
    rule: str = ""  # free-text hint; "regex:<pattern>" is honored

    def patterns(self) -> list[re.Pattern]:
        # memoized per instance: extract_fields_record runs once per
        # document — rebuilding pattern lists per doc is exactly the
        # per-document re-init this module exists to hoist away
        cached = getattr(self, "_patterns", None)
        if cached is not None:
            return cached
        self._patterns = self._build_patterns()
        return self._patterns

    def _build_patterns(self) -> list[re.Pattern]:
        if self.rule.startswith("regex:"):
            return [re.compile(self.rule[len("regex:") :], re.I | re.M)]
        names = [self.key] + self.alt_names
        pats = []
        for n in names:
            n = n.strip()
            if not n:
                continue
            if _NUMBERED.search(n):
                n = _NUMBERED.sub(r"_\\d+", re.escape(n))  # KEY_1 → KEY_\d+
            else:
                n = re.escape(n)
            pats.append(re.compile(rf"^{n}\s*[:=]\s*(.+?)\s*$", re.I | re.M))
        return pats


def is_filename_field(key: str) -> bool:
    k = key.lower()
    return any(f in k for f in _FILENAME_KEYS)


def url_basename(url: str) -> str:
    return url.rstrip("/").rsplit("/", 1)[-1]


def resolve_position(char_spans: list[dict], start: int, end: int):
    """First char_span containing ``start``; sub-bbox interpolated by
    proportional char width. Returns (page, bbox|None)."""
    for s in char_spans or []:
        if s["start"] <= start < s["end"]:
            bbox = s.get("bbox")
            if bbox is None:
                return s["page"], None
            span_len = s["end"] - s["start"]
            if span_len <= 0:
                return s["page"], list(bbox)
            char_w = (bbox[2] - bbox[0]) / span_len
            x0 = bbox[0] + (start - s["start"]) * char_w
            x1 = bbox[0] + (min(end, s["end"]) - s["start"]) * char_w
            return s["page"], [x0, bbox[1], x1, bbox[3]]
    return None, None


FIELDS_TYPE = pa.list_(
    pa.struct(
        [
            ("key", pa.string()),
            ("value", pa.string()),
            ("page", pa.int32()),
            ("bbox", pa.list_(pa.float64())),
        ]
    )
)


def extract_fields_record(
    url: str, text: str, char_spans: list[dict], specs: list[FieldSpec]
) -> list[dict]:
    out = []
    for spec in specs:
        if is_filename_field(spec.key):
            out.append({"key": spec.key, "value": url_basename(url), "page": None, "bbox": None})
            continue
        hit = None
        for pat in spec.patterns():
            m = pat.search(text)
            if m:
                hit = m
                break  # first-match-wins
        if hit is None:
            continue
        value = format_value(hit.group(1))
        page, bbox = resolve_position(char_spans, hit.start(1), hit.end(1))
        out.append({"key": spec.key, "value": value, "page": page, "bbox": bbox})
    return out


class FieldExtractActor:
    """Actor-pool stage over extraction output batches. The field
    schema is fetched from the broadcast ref once per actor."""

    def __init__(self, schema_ref) -> None:
        specs = ray.get(schema_ref)
        self.specs = [
            s
            if isinstance(s, FieldSpec)
            else FieldSpec(**{k: v for k, v in s.items() if not k.startswith("_")})
            for s in specs
        ]
        for s in self.specs:  # compile once per actor, not per document
            s.patterns()
        self.docs = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("extracted_text").to_pylist()
        spans = batch.column("char_spans").to_pylist() if "char_spans" in batch.column_names else [None] * len(urls)
        fields_col = [
            extract_fields_record(u, t or "", cs, self.specs)
            for u, t, cs in zip(urls, texts, spans)
        ]
        self.docs += len(urls)
        return batch.append_column("fields", pa.array(fields_col, FIELDS_TYPE))


def with_fields(
    extraction: "ray.data.Dataset",
    specs: list[FieldSpec],
    *,
    concurrency=(1, 8),
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Attach a ``fields`` column to an extraction Dataset."""
    ref = ray.put([s.__dict__ for s in specs])
    return extraction.map_batches(
        FieldExtractActor,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        # the constructor arg is an ObjectRef, which Ray 2.49 cannot
        # replay on an actor restart — with restarts enabled it logs a
        # spurious core_worker error per actor (upstream ray#53727).
        # Stage retries are task-level anyway, so disable actor restart.
        max_restarts=0,
    )
