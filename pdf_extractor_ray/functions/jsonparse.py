"""Robust JSON parsing (M12) — the reference's LLM-response parser
(``gpt_service.py:159-181``): strict ``json.loads``, then a DOTALL
regex fallback pulling the outermost ``{...}``, then failure.

Unlike the reference (which silently returns empty fields), failures
here return ``(None, error)`` so pipeline callers can quarantine the
row instead of losing it (north-rule error semantics)."""

from __future__ import annotations

import json
import re

_JSON_BLOB_RE = re.compile(r"(\{.*\})", re.S)


def parse_robust_json(raw: str) -> tuple[dict | None, str]:
    """→ (parsed dict | None, error string)."""
    if not raw or not raw.strip():
        return None, "empty input"
    try:
        obj = json.loads(raw)
        if isinstance(obj, dict):
            return obj, ""
        return None, f"top-level {type(obj).__name__}, expected object"
    except json.JSONDecodeError:
        pass
    m = _JSON_BLOB_RE.search(raw)
    if m:
        try:
            obj = json.loads(m.group(1))
            if isinstance(obj, dict):
                return obj, ""
        except json.JSONDecodeError as e:
            return None, f"fallback parse failed: {e}"
    return None, "no JSON object found"


def response_to_fields(obj: dict) -> tuple[list[dict], list[str]]:
    """Response dict → field dicts, skipping malformed entries (M13);
    returns (fields, errors-for-quarantine)."""
    fields, errors = [], []
    for i, f in enumerate(obj.get("fields", []) or []):
        if not isinstance(f, dict) or "key" not in f:
            errors.append(f"fields[{i}]: malformed")
            continue
        fields.append({"key": str(f["key"]), "value": str(f.get("value", ""))})
    return fields, errors
