"""Cross-round drift protection.

The byte-identity tests compare the pipeline against the sequential
oracle — but both share the kernels, so a semantic change to a kernel
would slip through them silently. This test pins extraction output
against hashes COMMITTED to the repo (tests/golden_hashes.json,
generated once from seed-777 pages): any later change to sniffing,
HTML block rules, PDF parsing, reading order, ligatures, or whitespace
handling fails here and must be a conscious decision.

To intentionally change extraction semantics, regenerate the fixture
(see the generation snippet in git history for commit introducing it)
and explain the change in the commit message.
"""

import hashlib
import json
import os

from pdf_extractor_ray.kernels.record import extract_record
from pdf_extractor_ray.sources.pages import generate_pages_table

_FIXTURE = os.path.join(os.path.dirname(__file__), "golden_hashes.json")


def test_extraction_matches_pinned_goldens():
    with open(_FIXTURE) as f:
        goldens = json.load(f)
    tab = generate_pages_table(120, seed=777)
    mismatches = []
    for u, h in zip(tab["url"].to_pylist(), tab["html"].to_pylist()):
        r = extract_record(u, h)
        g = goldens[u]
        got = {
            "status": r["status"],
            "text_sha": hashlib.sha256(r["extracted_text"].encode()).hexdigest()[:16],
            "n_spans": len(r["char_spans"]),
            "n_chars": len(r["extracted_text"]),
        }
        if got != g:
            mismatches.append((u, g, got))
    assert not mismatches, f"{len(mismatches)} drifted, first: {mismatches[0]}"
