"""Round-5 wave-29 plan-shape pins for the fourth-session carriers.

The zero-shuffle property is the core 100-TB claim for every
extraction/audit carrier added in waves 12-28 — these pins fail the
moment one of them gains an accidental all-to-all stage. Ray session
comes from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

_ZERO_SHUFFLE = [
    ("mime_mismatch_documents", "pdf_extractor_ray.pipelines.webdocs"),
    ("dom_stats_documents", "pdf_extractor_ray.pipelines.webdocs"),
    ("warc_revisit_documents", "pdf_extractor_ray.pipelines.webdocs"),
    ("warc_cdx_documents", "pdf_extractor_ray.pipelines.webdocs"),
    ("extract_passages_documents", "pdf_extractor_ray.pipelines.webdocs"),
    ("meta_refresh_documents", "pdf_extractor_ray.pipelines.webdocs"),
    ("doc_age_documents", "pdf_extractor_ray.pipelines.webdocs"),
    ("entity_counts_documents", "pdf_extractor_ray.pipelines.textops"),
    ("char_entropy_documents", "pdf_extractor_ray.pipelines.textops"),
    ("oov_rate_documents", "pdf_extractor_ray.pipelines.textops"),
    ("resolved_links_documents", "pdf_extractor_ray.pipelines.urlops"),
    ("percent_norm_documents", "pdf_extractor_ray.pipelines.urlops"),
    ("robots_allow_filter_documents", "pdf_extractor_ray.pipelines.urlops"),
    ("robots_wildcard_filter_documents", "pdf_extractor_ray.pipelines.urlops"),
    ("nofollow_stats_documents", "pdf_extractor_ray.pipelines.urlops"),
    ("image_dims_documents", "pdf_extractor_ray.pipelines.multimodal"),
    ("wav_duration_documents", "pdf_extractor_ray.pipelines.multimodal"),
    ("media_format_matrix_documents", "pdf_extractor_ray.pipelines.multimodal"),
    ("thumbnail_documents", "pdf_extractor_ray.pipelines.multimodal"),
    ("kwic_documents", "pdf_extractor_ray.pipelines.search"),
]


@pytest.mark.parametrize("name,module", _ZERO_SHUFFLE)
def test_carrier_plan_is_shuffle_free(name, module):
    import importlib

    fn = getattr(importlib.import_module(module), name)
    ds = fn(SF_DIR)
    ds.take(5)  # execute enough to materialize the plan
    stats = ds.stats()
    for marker in ("AllToAll", "Sort", "Aggregate", "Join", "shuffle"):
        assert marker not in stats, f"{name} plan gained a {marker} stage:\n{stats[:500]}"
