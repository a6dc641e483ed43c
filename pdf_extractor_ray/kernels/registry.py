"""Extractor-kernel registry — the user-extension surface (SURVEY.md
§2.10, replacing the reference's ``BaseGPT`` ABC + factory,
``gpt_implementations.py:9-37``).

A kernel is ``(bytes) -> (text, char_spans)`` registered under a
content kind; ``sniff`` routes rows to kinds. Users plug new document
types (e.g. 'epub', 'rtf') without touching pipeline code — the
``extract_record`` dispatcher consults this registry.
"""

from __future__ import annotations

from typing import Callable

ExtractKernel = Callable[[bytes], tuple[str, list[dict]]]

_REGISTRY: dict[str, ExtractKernel] = {}


def register_kernel(kind: str, fn: ExtractKernel) -> None:
    _REGISTRY[kind] = fn


def get_kernel(kind: str) -> ExtractKernel | None:
    return _REGISTRY.get(kind)


def registered_kinds() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from pdf_extractor_ray.kernels.html_extract import html_extract
    from pdf_extractor_ray.kernels.pdf_extract import pdf_extract

    register_kernel("pdf", pdf_extract)
    register_kernel("html", html_extract)


_register_builtins()
