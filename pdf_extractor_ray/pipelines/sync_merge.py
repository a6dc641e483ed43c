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
        # vectorized per-key resolution over a whole hash bucket:
        # keys with any sink row keep ALL their sink rows; keys with
        # only new rows keep the single deterministic winner.
        has_sink = g.groupby("__norm", sort=False)["__side"].transform("min") == 0
        keep_sink = (g["__side"] == 0) & has_sink
        new_only = g[~has_sink]
        winners_idx = (
            new_only.sort_values([tie, key_col]).groupby("__norm", sort=False).head(1).index
            if len(new_only)
            else []
        )
        out = g[keep_sink | g.index.isin(winners_idx)]
        return out.drop(columns=["__side", "__norm"])

    from pdf_extractor_ray.ops import grouped_apply

    return grouped_apply(both, ["__norm"], resolve, num_buckets=16)
