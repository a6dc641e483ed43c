"""pdf_extractor_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine (NOT a port) with the capabilities of the reference
``nestoru/pdf-extractor``: streaming ``ray.data.Dataset`` pipelines over
Parquet tables of Common-Crawl-style web pages ``(url, warc_ts,
html:binary, text, lang)``, with

- content-sniff dispatch (``%PDF-`` magic vs HTML markup) per row,
- a miniature PDF layout parse (object walk, content-stream text runs,
  y/x reading-order sort, ligature normalization) in a stateful actor
  pool (state pinned per worker in ``__init__``),
- HTML boilerplate stripping via text-density + link-density scoring
  over a lightweight DOM, in vectorized batch UDFs,
- byte-identical extracted text per url vs a sequential oracle that
  shares the same kernels,
- skew handling (size buckets, per-document time budget, quarantine
  rows), checkpoint-manifest resume, and per-partition metrics.

Layout:

- ``kernels/``  — pure deterministic functions, no Ray imports.
- ``sources/``  — synthetic pages generation + parquet read helpers.
- ``stages/``   — Ray Data batch UDFs / actor classes.
- ``pipelines/``— named end-to-end pipelines (extraction, dedup,
  similarity, analytics, sync-merge, training).
- ``state/``    — checkpoint manifest / resume.
- ``oracle.py`` — the sequential (single-process) oracle.

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (tests' conftest fixture, ``bench.py``, or the driver).
"""

__version__ = "0.1.0"
