"""Pure, deterministic extraction kernels — no Ray imports.

Shared verbatim between the sequential oracle (``pdf_extractor_ray.oracle``)
and the Ray pipeline stages, so byte-identity of output per url holds by
construction; pytest guards against ordering / parallelism drift.
"""

from pdf_extractor_ray.kernels.sniff import sniff, size_bucket
from pdf_extractor_ray.kernels.html_extract import html_extract
from pdf_extractor_ray.kernels.pdf_extract import pdf_extract
from pdf_extractor_ray.kernels.normalize import (
    format_value,
    normalize_key,
    normalize_compare,
    collapse_ws,
    normalize_ligatures,
)

__all__ = [
    "sniff",
    "size_bucket",
    "html_extract",
    "pdf_extract",
    "format_value",
    "normalize_key",
    "normalize_compare",
    "collapse_ws",
    "normalize_ligatures",
]
