"""Bucketed wide operators.

Ray 2.49's sort-based ``groupby().aggregate()`` / ``map_groups`` cost
~5 ms of Python per *group* (measured: 3.6k groups over 60k rows = 21 s
at 8 CPUs, with either sort- or hash-shuffle strategy) — unusable for
medium/high-cardinality keys. These helpers keep the all-to-all
exchange but cap the group count at ``num_buckets``: rows are routed by
a *stable* hash of the key columns, and the real per-key aggregation
runs vectorized (pandas groupby) inside each bucket. Per-group Python
overhead is paid ``num_buckets`` times, not once per key.

This is also exactly the shape that scales on a real cluster: the
bucket column is the partitioning key, skewed keys can be salted by
raising ``num_buckets``, and each bucket task is a pure pandas kernel.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data

_HASH_KEY = "0123456789abcdef"


def stable_key_hash(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of key columns (process-independent)."""
    h = pd.util.hash_array(df[keys[0]].to_numpy(), hash_key=_HASH_KEY)
    for k in keys[1:]:
        h = h * np.uint64(1099511628211) + pd.util.hash_array(df[k].to_numpy(), hash_key=_HASH_KEY)
    return h


def grouped_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    *,
    num_buckets: int = 16,
    batch_size: int = 32768,
) -> ray.data.Dataset:
    """groupby(keys).sum(sum_cols) with per-batch partials and a
    bucketed final combine. Output columns: keys + sum_cols."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(keys, as_index=False, sort=False)[sum_cols].sum()
        g["__bucket"] = (stable_key_hash(g, keys) % np.uint64(num_buckets)).astype("int64")
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__bucket").groupby(keys, as_index=False, sort=False)[sum_cols].sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return partials.groupby("__bucket").map_groups(final, batch_format="pandas")


def grouped_apply(
    ds: ray.data.Dataset,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Bucketed groupby(keys).apply(fn): ``fn`` receives ALL rows of one
    bucket (possibly many keys) and must itself group by ``keys`` —
    use for vectorizable per-key logic like keep-first / dedup."""

    def route(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = (stable_key_hash(b, keys) % np.uint64(num_buckets)).astype("int64")
        return b

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__bucket"))

    return ds.map_batches(route, batch_format="pandas").groupby("__bucket").map_groups(
        apply, batch_format="pandas"
    )


def keep_first(
    ds: ray.data.Dataset,
    keys: list[str],
    tie_break: str,
    *,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Deterministic first-writer-wins dedup: per key group keep the row
    with the smallest ``tie_break`` value (vectorized idxmin per bucket)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(keys, sort=False)[tie_break].idxmin()
        return g.loc[idx]

    return grouped_apply(ds, keys, first, num_buckets=num_buckets)


def distinct(ds: ray.data.Dataset, keys: list[str], *, num_buckets: int = 16) -> ray.data.Dataset:
    """Distinct rows over ``keys`` (bucketed drop_duplicates)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b[keys].drop_duplicates()
        g = g.copy()
        g["__bucket"] = (stable_key_hash(g, keys) % np.uint64(num_buckets)).astype("int64")
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__bucket").drop_duplicates()

    return ds.map_batches(partial, batch_format="pandas").groupby("__bucket").map_groups(
        final, batch_format="pandas"
    )


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    agg_spec: dict[str, tuple[str, str]],
    *,
    num_buckets: int = 16,
    batch_size: int = 32768,
) -> ray.data.Dataset:
    """General bucketed groupby: ``agg_spec = {out_col: (in_col, fn)}``
    with fn ∈ {sum, min, max, count} — all decomposable, so the same
    fn applies at the per-batch partial and the per-bucket final
    (count partials re-aggregate with sum). Non-decomposable fns
    (mean, median, ...) are rejected: partial-then-final would
    silently compute a wrong unweighted re-aggregate."""
    allowed = {"sum", "min", "max", "count"}
    bad = {fn for _c, fn in agg_spec.values() if fn not in allowed}
    if bad:
        raise ValueError(f"non-decomposable agg fns {bad}; allowed: {allowed}")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(keys, as_index=False, sort=False).agg(
            **{out: (col, fn) for out, (col, fn) in agg_spec.items()}
        )
        g["__bucket"] = (stable_key_hash(g, keys) % np.uint64(num_buckets)).astype("int64")
        return g

    final_spec = {out: (out, "sum" if fn == "count" else fn) for out, (_c, fn) in agg_spec.items()}

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__bucket").groupby(keys, as_index=False, sort=False).agg(
            **{out: spec for out, spec in final_spec.items()}
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return partials.groupby("__bucket").map_groups(final, batch_format="pandas")
