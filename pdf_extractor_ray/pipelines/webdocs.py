"""Flagship extraction expressed over the driver's documents table.

The graft testdata has no raw-HTML column, so pages are *derived
deterministically* from ``documents.parquet``: each doc's text becomes
the main content of a boilerplate-wrapped HTML page (every ~7th doc a
mini-PDF instead), keyed only on (doc_id, text) — same page bytes at
any scale factor or partitioning. The extraction then runs the real
pipeline stages and, by construction, must recover exactly the
documents' text for HTML rows (boilerplate stripped), which the test
suite asserts.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pyarrow as pa
import ray.data

from pdf_extractor_ray.stages.extract import ExtractPages, sniff_batch
from pdf_extractor_ray.sources.pages import make_html_page, make_pdf


def _doc_to_page(doc_id: int, text: str) -> bytes:
    rng = random.Random(doc_id * 2654435761 % (1 << 31))
    if doc_id % 7 == 3:  # PDF row: text lines as runs, shuffled emission
        words = text.split()
        lines = [" ".join(words[i : i + 8]) for i in range(0, len(words), 8)]
        runs = [(72.0, 720.0 - 24.0 * i, 12.0, ln) for i, ln in enumerate(lines[:28]) if ln]
        rng.shuffle(runs)
        return make_pdf([runs], compress=doc_id % 2 == 0)
    # HTML row: doc text as single main paragraph inside boilerplate
    nav = "".join(f'<li><a href="/c/{i}">BOILER nav {i}</a></li>' for i in range(8))
    side = "".join(f'<a href="/r/{i}">BOILER rel {i}</a> ' for i in range(12))
    html = (
        "<!DOCTYPE html><html><head><title>BOILER t</title></head><body>"
        f"<nav><ul>{nav}</ul></nav>"
        f'<article><p>{text}</p></article>'
        f"<aside>{side}</aside>"
        "<footer><p><a href='/x'>BOILER x</a> <a href='/y'>BOILER y</a></p></footer>"
        "</body></html>"
    )
    return html.encode("utf-8")


def pages_from_documents(sf_dir: str) -> ray.data.Dataset:
    """documents.parquet → pages Dataset (url, html) — vectorized derive."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": [f"https://docs.example.com/{d}" for d in b["doc_id"]],
                "html": [_doc_to_page(int(d), t) for d, t in zip(b["doc_id"], b["text"])],
            }
        )

    return ds.map_batches(derive, batch_format="pandas", batch_size=1024)


def extract_documents(sf_dir: str, concurrency=(1, 8), batch_size: int = 128) -> ray.data.Dataset:
    """The flagship pipeline over derived pages; returns the full
    extraction table (url, kind, status, extracted_text, ...)."""
    pages = pages_from_documents(sf_dir)
    pages = pages.map_batches(sniff_batch, batch_format="pyarrow")
    return pages.map_batches(
        ExtractPages,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_documents_summary(sf_dir: str) -> ray.data.Dataset:
    """Compact result for the driver check: per-url status + text length."""
    ds = extract_documents(sf_dir)

    def compact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": t.column("url"),
                "kind": t.column("kind"),
                "status": t.column("status"),
                "n_chars_extracted": pc.utf8_length(t.column("extracted_text")).cast(pa.int64()),
            }
        )

    return ds.map_batches(compact, batch_format="pyarrow")
