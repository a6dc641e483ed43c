"""Pluggable LLM-scorer actor stage.

Rebuilds the reference's swappable completion backend
(``pdf_extractor/services/gpt_implementations.py:9-37``: ``BaseGPT``
ABC + concrete client + factory) and its scoring loop
(``gpt_service.py:21-201``: prompt build → completion → robust JSON
parse → field mapping) as a Ray Data actor-pool stage:

- the backend is constructed ONCE per actor in ``__init__`` from a
  user-supplied zero-arg factory (the client-handle / model-load slot —
  at real scale this is where an SDK client or a GPU model lives);
- ``__call__`` scores one batch: prompt builder (M11) → backend
  completion → robust JSON parse (M12) → response→field mapping (M13),
  with per-row error isolation (parse failures become quarantine
  columns, never exceptions — north-rule error semantics).

No network clients exist in this environment, so the shipped backend is
``DeterministicFakeBackend`` — it extracts ``KEY: value`` lines from
the prompt and answers with the reference's JSON contract, which makes
the full chain testable end to end and gives a real template for
wiring an actual client (implement ``CompletionBackend.complete``).
"""

from __future__ import annotations

import json
import re
from abc import ABC, abstractmethod
from typing import Callable

import pandas as pd
import ray.data

from pdf_extractor_ray.functions.jsonparse import parse_robust_json, response_to_fields
from pdf_extractor_ray.pipelines.training import PROMPT_TEMPLATE


class CompletionBackend(ABC):
    """One chat completion: ``messages`` (role/content dicts) → text."""

    @abstractmethod
    def complete(self, messages: list[dict]) -> str: ...


class DeterministicFakeBackend(CompletionBackend):
    """Offline stand-in: answers with the labeled ``KEY: value`` lines
    found in the user turn, in the reference's JSON response shape."""

    _LABELED = re.compile(r"^([A-Z][A-Z ]{1,40}):\s*(.*)$", re.M)

    def complete(self, messages: list[dict]) -> str:
        user = next((m["content"] for m in messages if m.get("role") == "user"), "")
        fields = [
            {"key": k.strip(), "value": v.strip()}
            for k, v in self._LABELED.findall(user)
        ]
        return json.dumps({"fields": fields})


def default_backend_factory() -> CompletionBackend:
    """Factory analog of ``get_gpt_implementations`` — swap this for a
    real-client factory in a networked deployment."""
    return DeterministicFakeBackend()


class ScorerStage:
    """Actor-pool callable: score a batch of documents with the backend
    held by this actor. Output: (doc_id, response, fields_json,
    n_fields, parse_ok, error)."""

    def __init__(self, backend_factory: Callable[[], CompletionBackend] = default_backend_factory):
        self.backend = backend_factory()  # once per actor

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "response": [], "fields_json": [], "n_fields": [], "parse_ok": [], "error": []}
        for doc_id, text in zip(b["doc_id"], b["text"]):
            prompt = PROMPT_TEMPLATE.format(content=text)
            messages = [{"role": "user", "content": prompt}]
            try:
                raw = self.backend.complete(messages)
            except Exception as e:  # backend failure → quarantined row
                out["doc_id"].append(doc_id)
                out["response"].append("")
                out["fields_json"].append("[]")
                out["n_fields"].append(0)
                out["parse_ok"].append(False)
                out["error"].append(f"backend: {type(e).__name__}: {e}"[:200])
                continue
            obj, err = parse_robust_json(raw)
            fields, field_errs = response_to_fields(obj) if obj is not None else ([], [])
            out["doc_id"].append(doc_id)
            out["response"].append(raw)
            out["fields_json"].append(json.dumps(fields))
            out["n_fields"].append(len(fields))
            out["parse_ok"].append(obj is not None)
            out["error"].append(err or "; ".join(field_errs))
        df = pd.DataFrame(out)
        return df.astype({"doc_id": "int64", "n_fields": "int64", "parse_ok": "bool"})


def score_documents(
    docs: ray.data.Dataset,
    backend_factory: Callable[[], CompletionBackend] = default_backend_factory,
    *,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """documents (doc_id, text) → scored fields via the actor pool.
    ``batch_size`` doubles as the request-batching knob for a real
    backend; ``concurrency`` bounds simultaneous clients."""
    return docs.map_batches(
        ScorerStage,
        fn_constructor_kwargs={"backend_factory": backend_factory},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        max_restarts=0,  # spurious ctor-arg restart error otherwise (ray#53727)
        num_cpus=1,
    )
