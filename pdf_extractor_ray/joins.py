"""Join strategies (SURVEY.md §2.5 → Ray Data).

Three tiers, chosen by side sizes — the partitioning decisions that
matter at 100 TB:

- ``broadcast_map``: small side → plain dict shipped once via
  ``ray.put`` and resolved inside ``map_batches`` (no shuffle). This is
  the J2-style lookup and the dimension-table join (nation, region,
  field schema). The broadcast ref is fetched once per actor/task from
  the local object store, NOT re-shipped per batch.
- ``broadcast_semi`` / ``broadcast_anti``: key-set broadcast + filter
  inside ``map_batches`` (J3/J5 anti-joins). At 10^12-row scale the key
  set would become a Bloom filter; the API shape is the same.
- ``bucket_join``: both sides large → explicit partitioned hash join:
  tag each side, add ``bucket = hash(key) % B``, union, ``groupby
  (bucket)`` (ONE all-to-all exchange), and pandas-merge the two sides
  inside each group. Skewed hot keys can be salted into sub-buckets by
  raising B. This is the portable pattern; ``Dataset.join`` in recent
  Ray is the built-in equivalent and ``bucket_join`` intentionally
  shares its hash-partition shape.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _hash_bucket(values: pd.Series, num_buckets: int) -> np.ndarray:
    """Stable bucket assignment (never Python hash())."""
    h = pd.util.hash_array(values.to_numpy(), hash_key="0123456789abcdef")
    return (h % np.uint64(num_buckets)).astype(np.int64)


def broadcast_map(ds: ray.data.Dataset, mapping: dict, key: str, out_col: str, default=None) -> ray.data.Dataset:
    """Left join against a broadcast dict: ``out_col = mapping[key]``."""
    ref = ray.put(mapping)

    class Lookup:
        def __init__(self):
            self.m = ray.get(ref)  # once per actor, from local object store

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch[out_col] = batch[key].map(self.m).fillna(default) if default is not None else batch[key].map(self.m)
            return batch

    return ds.map_batches(Lookup, batch_format="pandas", concurrency=(1, 4))


def broadcast_semi(ds: ray.data.Dataset, keys: Iterable, key: str, keep: bool = True) -> ray.data.Dataset:
    """Semi (keep=True) or anti (keep=False) join vs a broadcast key set."""
    ref = ray.put(frozenset(keys))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        mask = batch[key].isin(ks)
        return batch[mask] if keep else batch[~mask]

    return ds.map_batches(filt, batch_format="pandas")


def join_datasets(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    *,
    how: str = "inner",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Large-large join: Ray's built-in hash-partitioned ``Dataset.join``
    when available (Ray ≥ 2.46), else the portable ``bucket_join``
    below — both are the same hash-exchange shape."""
    if hasattr(left, "join"):
        return left.join(
            right, join_type=how, num_partitions=num_partitions, on=(on,)
        )
    return bucket_join(left, right, on=on, how=how, num_buckets=num_partitions)


def bucket_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    *,
    num_buckets: int = 32,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> ray.data.Dataset:
    """Partitioned hash join of two Datasets on one key column.

    One shuffle (the groupby); each group holds both sides of one hash
    bucket and merges locally with pandas. ``num_buckets`` bounds the
    per-group memory: size it so (|left|+|right|)/B fits a worker heap;
    raise it to dilute skewed keys.
    """
    # union() needs one schema: pad each side with the other's columns
    # (None) and restore per-side dtypes inside the merge, so int keys
    # don't decay to float via NaN padding. Dtypes come from a 1-row
    # sample (Ray's Schema.types may hold non-Arrow python types).
    l_sample = left.limit(1).to_pandas()
    r_sample = right.limit(1).to_pandas()
    l_cols, r_cols = list(l_sample.columns), list(r_sample.columns)
    l_dtypes, r_dtypes = l_sample.dtypes.to_dict(), r_sample.dtypes.to_dict()
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__side"] = side
            b["__bucket"] = _hash_bucket(b[on], num_buckets)
            for c in all_cols:
                if c not in b.columns:
                    b[c] = None
            return b[all_cols + ["__side", "__bucket"]]

        return fn

    both = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        # no empty-side shortcut: pandas merge handles empty frames and
        # produces the full output schema, which keeps how='outer'/
        # 'right' correct (an early return dropped right-only buckets)
        # and keeps block schemas consistent across groups.
        lg = g.loc[g["__side"] == 0, l_cols].astype(l_dtypes)
        rg = g.loc[g["__side"] == 1, r_cols].astype(r_dtypes)
        return lg.merge(rg, on=on, how=how, suffixes=suffixes)

    return both.groupby("__bucket").map_groups(merge_group, batch_format="pandas")
