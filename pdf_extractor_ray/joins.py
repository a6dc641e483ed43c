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


def auto_num_partitions() -> int:
    """Join partition count sized to the cluster: ``max(2, CPUs // 4)``.

    Ray 2.49's hash-shuffle join reserves aggregator-actor resources
    per operator scaled by ``num_partitions``; when the partitions of
    the shuffle operators CHAINED in one pipeline exceed roughly half
    the cluster CPUs, the reservations starve each other and the
    pipeline deadlocks (reproduced: two chained 16-partition joins hang
    at 4 CPUs, run at 8; 2-partition chains run at 4). CPUs//4 lets two
    chained joins plus their map stages coexist at any cluster size;
    on a multi-node cluster this still scales linearly with total CPUs.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus // 4)


# Per-worker cache of deserialized broadcast objects: ray.get of a
# dict/DataFrame UNPICKLES it (zero-copy applies only to numpy
# buffers), so a per-batch ray.get would pay O(batches × object size).
# Ray reuses worker processes across tasks, so caching by object-ref id
# deserializes once per worker — the actor-pool benefit without the
# actor-pool dispatch overhead.
_BCAST_CACHE: dict[str, object] = {}
_BCAST_CACHE_MAX_BYTES = 256 * 1024 * 1024  # per-worker heap budget


def _approx_bytes(obj) -> int:
    if isinstance(obj, pd.DataFrame):
        return int(obj.memory_usage(deep=True).sum())
    if isinstance(obj, np.ndarray):
        return obj.nbytes
    if isinstance(obj, (tuple, list)):
        # recurse, but SAMPLE long sequences like the dict/set path —
        # a broadcast (dict, dict) tuple must not be accounted as a
        # 56-byte shell, and a 10M-element list must not cost an O(n)
        # walk on every cache-budget check
        import sys

        shell = sys.getsizeof(obj)
        if len(obj) <= 64:
            return shell + sum(_approx_bytes(v) for v in obj)
        per = sum(_approx_bytes(v) for v in obj[:32]) / 32
        return int(shell + per * len(obj))
    if isinstance(obj, (dict, set, frozenset)):
        # sample-based per-entry estimate: a flat constant undercounts
        # large-string values by orders of magnitude, letting the cache
        # pin far more than its byte budget before eviction triggers.
        # Values RECURSE through _approx_bytes — shallow sys.getsizeof
        # on a container value (str -> list-of-postings) reports the
        # 56-byte shell and reopens the same undercount the sampling
        # was added to close.
        import itertools
        import sys

        n = len(obj)
        if n == 0:
            return sys.getsizeof(obj)
        sample = list(itertools.islice(obj.items() if isinstance(obj, dict) else obj, 32))
        if isinstance(obj, dict):
            per = sum(sys.getsizeof(k) + _approx_bytes(v) for k, v in sample) / len(sample)
        else:
            per = sum(_approx_bytes(v) for v in sample) / len(sample)
        return int((per + 50) * n)  # +50/entry hash-table overhead
    import sys

    return sys.getsizeof(obj)


def _cached_get(ref):
    key = ref.hex()
    if key not in _BCAST_CACHE:
        # evict everything when the BYTE budget (not just entry count)
        # would be exceeded — long-lived workers must not pin GBs of
        # dead broadcast objects across pipelines
        total = sum(_approx_bytes(v) for v in _BCAST_CACHE.values())
        val = ray.get(ref)
        if len(_BCAST_CACHE) >= 8 or total + _approx_bytes(val) > _BCAST_CACHE_MAX_BYTES:
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = val
    return _BCAST_CACHE[key]


def broadcast_map(ds: ray.data.Dataset, mapping: dict, key: str, out_col: str, default=None) -> ray.data.Dataset:
    """Left join against a broadcast dict: ``out_col = mapping[key]``.
    Task-based, with the per-worker deserialization cache above."""
    ref = ray.put(mapping)

    def lookup(batch: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(ref)
        batch[out_col] = batch[key].map(m).fillna(default) if default is not None else batch[key].map(m)
        return batch

    return ds.map_batches(lookup, batch_format="pandas")


def broadcast_semi(ds: ray.data.Dataset, keys: Iterable, key: str, keep: bool = True) -> ray.data.Dataset:
    """Semi (keep=True) or anti (keep=False) join vs a broadcast key set."""
    ref = ray.put(frozenset(keys))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = _cached_get(ref)
        mask = batch[key].isin(ks)
        return batch[mask] if keep else batch[~mask]

    return ds.map_batches(filt, batch_format="pandas")


def join_datasets(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    *,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Large-large join: Ray's built-in hash-partitioned ``Dataset.join``
    when available (Ray ≥ 2.46), else the portable ``bucket_join``
    below — both are the same hash-exchange shape. ``right_on`` joins
    differently-named key columns without a rename pass.
    ``num_partitions=None`` auto-sizes to the cluster (see
    ``auto_num_partitions`` — required to chain joins safely)."""
    if num_partitions is None:
        num_partitions = auto_num_partitions()
    # accept BOTH vocabularies at the planner layer so a call site
    # works identically on the native branch (Ray join_type names) and
    # the portable fallback (pandas names)
    how = {"outer": "full_outer", "left": "left_outer", "right": "right_outer"}.get(how, how)
    if hasattr(left, "join"):
        return left.join(
            right,
            join_type=how,
            num_partitions=num_partitions,
            on=(on,),
            right_on=(right_on,) if right_on else None,
        )
    if right_on and right_on != on:
        right = right.map_batches(
            lambda b: b.rename(columns={right_on: on}), batch_format="pandas"
        )
    return bucket_join(left, right, on=on, how=how, num_buckets=num_partitions)


# Spark-style auto-broadcast plan threshold: a join/filter side at or
# below this many rows is collected and broadcast (bounded driver +
# object-store cost: ~10-100 MB); above it, the hash-partitioned
# exchange runs. At sf0.1 every dimension-ish side is far below the
# limit (the exchange's ~seconds of fixed aggregator cost would
# dominate); at 100 TB the same call sites flip to the exchange
# automatically. Pass broadcast_limit=0 to force the exchange.
# The ROW limit alone is unsafe for wide build sides (1M rows of full
# document texts can OOM the driver), so the broadcast plan ALSO
# requires the materialized side to fit BROADCAST_BYTE_LIMIT — a
# schema-aware measured size (Dataset.size_bytes on the materialized
# side), sized to the per-worker deserialization-cache budget.
BROADCAST_KEY_LIMIT = 1_000_000
BROADCAST_BYTE_LIMIT = 64 * 1024 * 1024


def _fits_broadcast(materialized: ray.data.Dataset, row_limit: int) -> bool:
    """Both-dimension broadcast gate: rows AND bytes (the byte estimate
    comes from the materialized blocks' metadata — no extra pass)."""
    if materialized.count() > row_limit:
        return False
    size = materialized.size_bytes()
    return size is None or size <= BROADCAST_BYTE_LIMIT


def semi_join(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    on: str,
    *,
    right_on: str | None = None,
    keep: bool = True,
    num_partitions: int | None = None,
    bloom_bits: int | None = None,
    broadcast_limit: int | None = None,
) -> ray.data.Dataset:
    """Distributed semi (keep=True) / anti (keep=False) join: keep left
    rows whose key does / does not appear in ``right_keys`` — with an
    ADAPTIVE plan: the key side is materialized and counted; at or
    below ``broadcast_limit`` rows it broadcasts (one object-store
    copy, zero shuffle — the measured-size broadcast every SQL planner
    does), above it the key set never leaves the cluster and the
    hash-partitioned exchange runs.

    With ``bloom_bits`` set, a Bloom filter is built from the key side
    first (fixed ``bloom_bits/8`` bytes regardless of key count) and
    used to split the left stream: rows the filter proves absent bypass
    the exchange entirely (dropped for semi, kept for anti — both
    EXACT, since Bloom has no false negatives); only the maybe-present
    rows go through the hash-partitioned join. At high selectivity this
    turns an all-to-all exchange into a broadcast filter + small join.
    (The split creates two consumers of ``left``, so its lineage runs
    twice — use it when ``left`` is a direct parquet read, where the
    second scan is cheaper than shuffling the unfiltered stream.)
    """
    if num_partitions is None:
        num_partitions = auto_num_partitions()
    if broadcast_limit is None:  # resolved at CALL time (patchable)
        broadcast_limit = BROADCAST_KEY_LIMIT
    rk = right_on or on
    if broadcast_limit:
        # project to the key column FIRST so the count/bytes measured —
        # and the driver collect on the broadcast plan — cover keys
        # only, never payload columns the caller left attached
        right_keys = right_keys.select_columns([rk]).materialize()
        if _fits_broadcast(right_keys, broadcast_limit):
            keys = [r[rk] for r in right_keys.take_all()]
            return broadcast_semi(left, keys, on, keep=keep)
    if bloom_bits:
        bloom = build_bloom(right_keys, rk, num_bits=bloom_bits)
        bref = ray.put(bloom)

        def split(maybe: bool):
            def fn(b: pd.DataFrame) -> pd.DataFrame:
                mask = bloom_contains(b[on], _cached_get(bref), num_bits=bloom_bits)
                return b[mask] if maybe else b[~mask]

            return fn

        definite_absent = left.map_batches(split(False), batch_format="pandas")
        maybe_present = left.map_batches(split(True), batch_format="pandas")
        joined = semi_join(
            maybe_present, right_keys, on, right_on=right_on, keep=keep,
            num_partitions=num_partitions, broadcast_limit=0,
        )
        return joined if keep else joined.union(definite_absent)

    how = "left_semi" if keep else "left_anti"
    if hasattr(left, "join"):
        return left.join(
            right_keys,
            join_type=how,
            num_partitions=num_partitions,
            on=(on,),
            right_on=(rk,) if rk != on else None,
        )
    # portable fallback: tag + one bucketed exchange + per-group isin
    l_cols = list(left.limit(1).to_pandas().columns)

    def tag(side: int, key: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"__key": b[key]})
            out["__side"] = side
            out["__bucket"] = _hash_bucket(b[key], num_partitions)
            for c in l_cols:
                out[c] = b[c] if side == 0 else None
            return out

        return fn

    both = left.map_batches(tag(0, on), batch_format="pandas").union(
        right_keys.map_batches(tag(1, rk), batch_format="pandas")
    )

    def filter_group(g: pd.DataFrame) -> pd.DataFrame:
        keys = set(g.loc[g["__side"] == 1, "__key"])
        lg = g[g["__side"] == 0]
        mask = lg["__key"].isin(keys)
        return lg.loc[mask if keep else ~mask, l_cols]

    return both.groupby("__bucket").map_groups(filter_group, batch_format="pandas")


def adaptive_inner_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    *,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    broadcast_limit: int | None = None,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """Inner (or left-outer) join with the measured-size broadcast
    plan: the right side is materialized and counted; at or below
    ``broadcast_limit`` rows it ships once via ``ray.put`` and each
    batch merges against it locally (zero shuffle — the broadcast hash
    join); above it the hash-partitioned exchange runs. Semantics
    identical either way (including duplicate right keys).
    ``how`` ∈ {"inner", "left_outer"} — only plans where broadcasting
    the RIGHT side is sound.

    ``batch_format="pyarrow"`` keeps the whole stage Arrow: the
    broadcast plan ships the right side as a ``pa.Table`` and each
    batch joins with Acero's hash join (``Table.join`` — zero-copy in,
    no pandas hop), so an Arrow-emitting upstream feeds an
    ``arrow_partials`` aggregation downstream conversion-free; the
    exchange plan (Ray's native hash join) already emits Arrow blocks.
    Output schema is identical on every (plan × format) combination:
    left columns then right non-key columns, right key dropped."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"adaptive join supports inner/left_outer, got {how!r}")
    if batch_format not in ("pandas", "pyarrow"):
        raise ValueError(f"batch_format must be pandas|pyarrow, got {batch_format!r}")
    if broadcast_limit is None:  # resolved at CALL time (patchable)
        broadcast_limit = BROADCAST_KEY_LIMIT
    rk = right_on or on
    if broadcast_limit:
        right = right.materialize()
        if _fits_broadcast(right, broadcast_limit):
            rdf = right.to_pandas()
            if batch_format == "pyarrow":
                rtbl = pa.Table.from_pandas(rdf, preserve_index=False)
                ref = ray.put(rtbl)
                pa_how = "left outer" if how == "left_outer" else "inner"

                def merge_arrow(t: pa.Table) -> pa.Table:
                    r = _cached_get(ref)  # deserialized once per worker
                    return t.join(r, keys=[on], right_keys=[rk], join_type=pa_how)

                return left.map_batches(merge_arrow, batch_format="pyarrow")
            ref = ray.put(rdf)
            pd_how = "left" if how == "left_outer" else "inner"

            def merge(b: pd.DataFrame) -> pd.DataFrame:
                r = _cached_get(ref)  # deserialized once per worker
                out = b.merge(r, left_on=on, right_on=rk, how=pd_how)
                if rk != on and rk in out.columns:
                    out = out.drop(columns=[rk])
                return out

            return left.map_batches(merge, batch_format="pandas")
    joined = join_datasets(
        left, right, on, right_on=right_on, how=how, num_partitions=num_partitions
    )
    if rk != on:
        # Ray's native hash join keeps the right key column; the
        # broadcast plan drops it — normalize so BOTH plans emit the
        # same schema and a call site can't change columns when data
        # crosses the threshold (Arrow drop on the pyarrow format so
        # the exchange plan's Arrow blocks stay Arrow)
        if batch_format == "pyarrow":
            joined = joined.map_batches(
                lambda t: t.drop_columns([rk]) if rk in t.column_names else t,
                batch_format="pyarrow",
            )
        else:
            joined = joined.map_batches(
                lambda b: b.drop(columns=[rk], errors="ignore"), batch_format="pandas"
            )
    return joined


_BLOOM_K = 4


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(values: pd.Series, num_bits: int) -> list[np.ndarray]:
    """k bit positions per value via Kirsch-Mitzenmacher double
    hashing: pos_i = (h1 + i*h2) mod m with h2 odd. NOTE:
    ``pd.util.hash_array`` IGNORES hash_key for numeric dtypes, so
    "k different hash keys" silently collapse to one identical hash
    for int columns — h2 must be derived (splitmix64), not re-keyed."""
    h1 = pd.util.hash_array(values.to_numpy(), hash_key="0123456789abcdef")
    h2 = _splitmix64(h1) | np.uint64(1)
    m = np.uint64(num_bits)
    return [((h1 + np.uint64(i) * h2) % m).astype(np.int64) for i in range(_BLOOM_K)]


def build_bloom(keys_ds: ray.data.Dataset, col: str, num_bits: int = 1 << 23) -> np.ndarray:
    """Distributed Bloom build: each batch sets its bits into a local
    bitset; the driver ORs the per-batch bitsets (fixed ``num_bits/8``
    bytes each — 1 MiB at the default — independent of key count)."""
    nbytes = num_bits // 8

    def to_bits(b: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(num_bits, dtype=bool)
        for pos in _bloom_positions(b[col], num_bits):
            bits[pos] = True
        return pd.DataFrame({"packed": [np.packbits(bits).tobytes()]})

    bloom = np.zeros(nbytes, dtype=np.uint8)
    for batch in keys_ds.map_batches(to_bits, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for packed in batch["packed"]:
            bloom |= np.frombuffer(packed, dtype=np.uint8)
    return bloom


def bloom_contains(values: pd.Series, bloom: np.ndarray, num_bits: int) -> np.ndarray:
    """Membership mask: True = maybe present, False = definitely absent."""
    bits = np.unpackbits(bloom)[:num_bits].astype(bool)
    mask = np.ones(len(values), dtype=bool)
    for pos in _bloom_positions(values, num_bits):
        mask &= bits[pos]
    return mask


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
    # Ray's join_type names → pandas merge names (the fallback must
    # accept the same vocabulary as the native Dataset.join branch)
    how = {"full_outer": "outer", "left_outer": "left", "right_outer": "right"}.get(how, how)
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


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str,
    on: str,
    direction: str = "backward",
    num_buckets: int | None = None,
    left_sample: pd.DataFrame | None = None,
    right_sample: pd.DataFrame | None = None,
) -> ray.data.Dataset:
    """AS-OF join (the time-series join Ray Data lacks): for each left
    row, attach the right row with the greatest ``on`` ≤ left's
    (direction="backward"; "forward" = smallest ≥), matching within the
    same ``by`` key.

    ``left_sample``/``right_sample``: optional (possibly empty) typed
    DataFrames declaring each side's columns+dtypes. Pass them whenever
    the schemas are statically known — the fallback samples via
    ``limit(1).to_pandas()``, which EXECUTES each side's lineage once
    just for dtypes (through any upstream exchange), and then the join
    runs it again.

    PARTITIONING ASSUMPTION (the contract custom operators must state):
    correctness relies on co-locating each ``by`` key's rows from BOTH
    sides in one bucket — ONE hash exchange on ``by`` — and on sorting
    by ``on`` inside the bucket. Skewed ``by`` keys concentrate in one
    bucket (raise ``num_buckets`` to dilute many keys; a single viral
    key is bounded by that key's own row count, which an as-of join
    inherently needs co-located). The in-bucket kernel is pandas
    ``merge_asof`` (vectorized two-pointer merge over the sorted
    frames). Right-side (by, on) duplicates should be deduplicated by
    the caller — which match wins is otherwise engine-defined."""
    if num_buckets is None:
        num_buckets = auto_num_partitions()
    l_sample = left_sample if left_sample is not None else left.limit(1).to_pandas()
    r_sample = right_sample if right_sample is not None else right.limit(1).to_pandas()
    l_cols, r_cols = list(l_sample.columns), list(r_sample.columns)
    l_dtypes, r_dtypes = l_sample.dtypes.to_dict(), r_sample.dtypes.to_dict()
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def tag(side: int, side_cols: list[str]):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            # a drifted static sample declaration must ERROR, not
            # silently None-pad the declared column and null the join
            missing = set(side_cols) - set(b.columns)
            if missing:
                raise ValueError(
                    f"asof_join: declared sample columns {sorted(missing)} absent "
                    f"from the actual {'left' if side == 0 else 'right'} batches"
                )
            b = b.copy()
            b["__side"] = side
            b["__bucket"] = _hash_bucket(b[by], num_buckets)
            for c in all_cols:
                if c not in b.columns:
                    b[c] = None
            return b[all_cols + ["__side", "__bucket"]]

        return fn

    both = left.map_batches(tag(0, l_cols), batch_format="pandas").union(
        right.map_batches(tag(1, r_cols), batch_format="pandas")
    )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == 0, l_cols].astype(l_dtypes).sort_values(on, kind="mergesort")
        rg = g.loc[g["__side"] == 1, r_cols].astype(r_dtypes).sort_values(on, kind="mergesort")
        return pd.merge_asof(
            lg, rg, on=on, by=by, direction=direction, suffixes=("", "_r")
        )

    return both.groupby("__bucket").map_groups(merge_group, batch_format="pandas")


def range_join(
    ds: ray.data.Dataset,
    ranges: pd.DataFrame,
    *,
    on: str,
    start: str,
    end: str,
) -> ray.data.Dataset:
    """RANGE (interval) join: attach every ``ranges`` row whose
    ``[start, end)`` interval contains the row's ``on`` value.

    PARTITIONING ASSUMPTION: the range side is SMALL (a calendar, a
    banding table — broadcast once via ``ray.put``); the probe side
    streams with zero shuffle, each batch testing its values against
    every interval vectorized (overlapping intervals produce one
    output row per match, inner-join semantics). For a large range
    side the right shape is an interval-partitioned co-location
    exchange instead — out of scope until a workload needs it."""
    ref = ray.put(ranges)
    extra = [c for c in ranges.columns]

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        r = _cached_get(ref)
        clash = set(extra) & set(b.columns)
        if clash:
            # silent overwrite would replace probe values with the
            # interval row's scalars — refuse instead (rename the
            # ranges columns or project the probe side first)
            raise ValueError(f"range_join: ranges columns collide with probe columns: {sorted(clash)}")
        vals = b[on]
        outs = []
        for _, row in r.iterrows():
            mask = (vals >= row[start]) & (vals < row[end])
            if mask.any():
                m = b[mask].copy()
                for c in extra:
                    m[c] = row[c]
                outs.append(m)
        if outs:
            return pd.concat(outs, ignore_index=True)
        empty = b.iloc[:0].copy()
        for c in extra:
            empty[c] = pd.Series([], dtype=r[c].dtype)
        return empty

    return ds.map_batches(fn, batch_format="pandas")
