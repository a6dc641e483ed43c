"""Sequential oracle: the single-process reference loop.

Analog of the reference CLI's ``for pdf in pdf_files: process`` loop
(``pdf_extractor/cli.py:112-119``) — processes the pages table row by
row with the *same kernels* as the Ray pipeline and emits the golden
table (FIXTURES.md F3). pytest asserts the distributed pipeline output
is byte-identical per url to this.

No Ray imports here, on purpose.
"""

from __future__ import annotations

import pyarrow as pa

from pdf_extractor_ray.kernels.record import extract_record
from pdf_extractor_ray.stages.schema import records_to_arrow


def oracle_extract_table(pages: pa.Table) -> pa.Table:
    """Sequential golden extraction over a pages table."""
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    records = [extract_record(u, h) for u, h in zip(urls, htmls)]
    return records_to_arrow(records)
