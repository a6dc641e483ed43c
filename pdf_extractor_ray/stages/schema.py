"""Fixed Arrow schema for extraction output (FIXTURES.md F3 analog).

One explicit schema shared by the oracle and every pipeline stage so
empty batches, all-null columns and union of branches never drift types.
"""

from __future__ import annotations

import pyarrow as pa

# bbox is a nullable variable-length list (always 4 floats when present):
# parquet cannot write null slots of a fixed_size_list ("Lists with
# non-zero length null components are not supported"), and HTML spans
# have no bbox.
CHAR_SPAN_TYPE = pa.struct(
    [
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("page", pa.int32()),
        ("bbox", pa.list_(pa.float64())),
    ]
)

EXTRACTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("kind", pa.string()),
        ("size_bucket", pa.int8()),
        ("n_bytes", pa.int64()),
        ("extracted_text", pa.string()),
        ("char_spans", pa.list_(CHAR_SPAN_TYPE)),
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)


def records_to_arrow(records: list[dict]) -> pa.Table:
    """List of ``extract_record`` dicts → Arrow table with the fixed schema."""
    cols = {
        "url": [r["url"] for r in records],
        "kind": [r["kind"] for r in records],
        "size_bucket": [r["size_bucket"] for r in records],
        "n_bytes": [r["n_bytes"] for r in records],
        "extracted_text": [r["extracted_text"] for r in records],
        "char_spans": [r["char_spans"] for r in records],
        "status": [r["status"] for r in records],
        "error": [r["error"] for r in records],
    }
    arrays = [pa.array(cols[f.name], type=f.type) for f in EXTRACTION_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=EXTRACTION_SCHEMA)
