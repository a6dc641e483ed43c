"""Dedup-merge into a sink table — the ``sync-extracted-fields`` analog.

Rebuilds the reference's two-level anti-join append
(``sync_to_onedrive.py:267-374``: exact FILE-NAME set, then
normalized-name map, first-writer-wins, sequential index mutation) as a
shuffle:

    union(tag=sink, tag=new) → groupby(normalized key)
      → per group: if any sink row exists → keep sink rows (existing
        wins); else keep the single deterministic winner among new rows
        (min sort key — the reference's implicit iteration-order
        tie-break made explicit).

One exchange, no shared mutable state, idempotent (re-running with the
same new rows changes nothing) — which is what replaces the workbook
session transaction (T5) in a distributed setting.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from pdf_extractor_ray.kernels.normalize import normalize_key


def merge_into_sink(
    sink: ray.data.Dataset,
    new_rows: ray.data.Dataset,
    key_col: str,
    *,
    tie_break_col: str | None = None,
) -> ray.data.Dataset:
    """Both inputs must share a schema. Returns the merged table."""
    tie = tie_break_col or key_col

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__side"] = side
            b["__norm"] = b[key_col].map(normalize_key)
            return b

        return fn

    both = sink.map_batches(tag(0), batch_format="pandas").union(
        new_rows.map_batches(tag(1), batch_format="pandas")
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        sink_rows = g[g["__side"] == 0]
        if len(sink_rows):
            out = sink_rows  # existing rows win (exact-level skip)
        else:
            out = g.sort_values([tie, key_col]).head(1)  # first-writer-wins, deterministic
        return out.drop(columns=["__side", "__norm"])

    return both.groupby("__norm").map_groups(resolve, batch_format="pandas")
