"""Relational analytics pipelines over the testdata tables.

These rebuild the reference's aggregate/join/sort/top-k capabilities
(SURVEY.md §2.5-§2.7: A1-A3 aggregates, J1-J6 joins, O3-O7 sorts/limits)
as Ray Data pipelines, each with an exact DuckDB oracle in
``__ray_entry__.oracle_sql``.

Scale notes baked into every query:
- column pruning + row-group predicate pushdown at ``read_parquet``;
- partial aggregation inside ``map_batches`` before any exchange — the
  shuffle moves per-key partials, not raw rows;
- grouped aggregation via ``ops.grouped_sum`` (bucketed hash exchange;
  Ray's built-in aggregate costs ~5 ms/group — see ops.py);
- money doubles summed as integer cents (``functions.exact``) so
  results are order-independent and bit-identical to the SQL oracle;
- dimension tables broadcast, large-large joins via
  ``joins.join_datasets`` (native hash join, ``bucket_join`` fallback —
  one hash-partition shuffle either way).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pdf_extractor_ray.functions.exact import CENTS_SQL, cents_np
from pdf_extractor_ray.joins import adaptive_inner_join, broadcast_map, semi_join
from pdf_extractor_ray.ops import distinct, grouped_sum


def _pq(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _li_rev_preagg(t: "pa.Table") -> "pa.Table":
    """Arrow-native per-batch (l_orderkey → rev_cents) partial: same
    IEEE float64 sequence as cents_np (price*(1-disc) → *100 → +0.5 →
    floor → int64), aggregated with pyarrow's hash group_by. Shared by
    q3/q5/q10 so their whole join→aggregate tails stay Arrow."""
    import pyarrow.compute as pc

    rev = pc.multiply(
        t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
    )
    cents = pc.floor(pc.add(pc.multiply(rev, pa.scalar(100.0)), pa.scalar(0.5))).cast(
        pa.int64()
    )
    tmp = pa.table({"o_orderkey": t.column("l_orderkey"), "rev_cents": cents})
    g = tmp.group_by(["o_orderkey"], use_threads=False).aggregate([("rev_cents", "sum")])
    return pa.table(
        {"o_orderkey": g.column("o_orderkey"), "rev_cents": g.column("rev_cents_sum")}
    )


# ----------------------------------------------------------------- Q1
def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style grouped pricing summary with exact-cents sums."""
    cutoff = np.datetime64("1998-09-01")

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def derive(t: pa.Table) -> pa.Table:
        # Arrow-native end to end (survey §7.5.4): zero-copy from the
        # parquet read, pyarrow.compute kernels, and the grouped_sum
        # below aggregates with arrow_partials — the chain never
        # converts to pandas until the groups-sized exchange. The cents
        # math is floor(x*100+0.5) in float64, IEEE-identical to
        # functions.exact.cents_np (and to the DuckDB oracle).
        import pyarrow.compute as pc

        t = t.filter(
            pc.less(t.column("l_shipdate"), pa.scalar(np.datetime64(cutoff, "us")))
        )
        price = t.column("l_extendedprice")
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), t.column("l_discount")))

        def cents(x):
            return pc.floor(pc.add(pc.multiply(x, pa.scalar(100.0)), pa.scalar(0.5))).cast(
                pa.int64()
            )

        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": t.column("l_quantity").cast(pa.int64()),
                "sum_base_cents": cents(price),
                "sum_disc_cents": cents(disc_price),
                "count_order": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    derived = ds.map_batches(derive, batch_format="pyarrow", batch_size=65536)
    return grouped_sum(
        derived,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_cents", "sum_disc_cents", "count_order"],
        num_buckets=4,
        arrow_partials=True,
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)                                  AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)          AS sum_base_cents,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------------------- Q3
def q3_top_building_orders(sf_dir: str) -> pd.DataFrame:
    """Top-10 revenue orders for BUILDING-segment customers.

    customer is fact-sized (~20% of it is BUILDING), so the key set is
    NEVER collected on the driver: orders are filtered through a
    distributed semi-join against the filtered customer keys (one
    hash-partitioned exchange). orders ⋈ lineitem through the
    hash-partitioned join; per-order revenue via bucketed grouped_sum;
    final global sort + deterministic tie-break.
    """
    import pyarrow.compute as pc

    cust_keys = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow",
    )

    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    orders = semi_join(orders, cust_keys, on="o_custkey", right_on="c_custkey")
    lineitem = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(_li_rev_preagg, batch_format="pyarrow", batch_size=65536)
    # lineitem (the big stream) stays left; the semi-filtered orders side
    # is the one the adaptive plan can broadcast. The Arrow batch format
    # keeps pre-agg → join → grouped partials conversion-free.
    joined = adaptive_inner_join(lineitem, orders, on="o_orderkey", batch_format="pyarrow")
    per_order = grouped_sum(
        joined.select_columns(["o_orderkey", "rev_cents"]),
        ["o_orderkey"],
        ["rev_cents"],
        arrow_partials=True,
    )
    per_order = per_order.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "revenue_cents"]), batch_format="pyarrow"
    )
    top = per_order.sort(["revenue_cents", "o_orderkey"], descending=[True, False]).limit(10)
    return top.to_pandas()


Q3_SQL = """
SELECT o_orderkey,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue_cents DESC, o_orderkey
LIMIT 10
"""


# ----------------------------------------------------------------- Q5-ish
def q5_region_nation_revenue(sf_dir: str, region: str = "ASIA") -> ray.data.Dataset:
    """Revenue by nation for one region. nation/region are TRUE
    dimension tables (≤ 25 rows) and stay dict-broadcast; customer is
    fact-sized, so the custkey→nation hop is a hash-partitioned join on
    the exchange (never a driver dict). orders ⋈ lineitem is the second
    hash join; aggregation is partial-then-bucketed."""
    import pyarrow.parquet as pq

    nation = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    region_t = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    rkeys = set(region_t.loc[region_t["r_name"] == region, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    natmap = dict(zip(nat["n_nationkey"], nat["n_name"]))

    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    cust = broadcast_map(cust, natmap, "c_nationkey", "n_name")
    cust = cust.map_batches(
        lambda b: b.dropna(subset=["n_name"])[["c_custkey", "n_name"]], batch_format="pandas"
    )

    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    orders = adaptive_inner_join(orders, cust, on="o_custkey", right_on="c_custkey")
    orders = orders.select_columns(["o_orderkey", "n_name"])

    lineitem = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(_li_rev_preagg, batch_format="pyarrow", batch_size=65536)
    # Arrow broadcast/hash join either way — with the Arrow pre-agg
    # above and the arrow_partials below, the whole join→aggregate
    # tail runs conversion-free (measured 4.2× kernel win on q1-shaped
    # batches, BENCH/BASELINE.md round 3).
    joined = adaptive_inner_join(lineitem, orders, on="o_orderkey", batch_format="pyarrow")
    out = grouped_sum(
        joined.select_columns(["n_name", "rev_cents"]),
        ["n_name"],
        ["rev_cents"],
        num_buckets=4,
        arrow_partials=True,
    )
    return out.map_batches(lambda b: b.rename(columns={"rev_cents": "revenue_cents"}), batch_format="pandas")


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# ------------------------------------------------------- top-k / sorts
def top_orders_by_price(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """O4-style top-k: global sort desc with deterministic tie-break."""
    ds = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda b: pd.DataFrame({"o_orderkey": b["o_orderkey"], "totalprice_cents": cents_np(b["o_totalprice"])}),
        batch_format="pandas",
    )
    return ds.sort(["totalprice_cents", "o_orderkey"], descending=[True, False]).limit(k)


TOP_ORDERS_SQL = """
SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents
FROM orders ORDER BY totalprice_cents DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------- anti-join
def customers_without_big_orders(sf_dir: str, min_price: float = 400_000.0) -> ray.data.Dataset:
    """J5-style anti-join: customers with no order above ``min_price``.
    The qualifying order-custkey set is filtered at the read (row-group
    predicate pushdown) and distinct-projected (bucketed); the anti-join
    itself is a distributed hash-partitioned exchange with a Bloom
    prefilter — proven-absent customers (the vast majority here) bypass
    the exchange entirely, and the key set never lands on the driver."""
    import pyarrow.compute as pc

    okeys_ds = distinct(
        ray.data.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_custkey"],
            filter=pc.field("o_totalprice") > min_price,
        ),
        ["o_custkey"],
    )
    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    return semi_join(
        cust, okeys_ds, on="c_custkey", right_on="o_custkey",
        keep=False, bloom_bits=1 << 20,
    )


CUSTOMERS_WITHOUT_BIG_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


# -------------------------------------------------------------- events
def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-hour aggregate per event type (the engine's windowed
    aggregate; Ray Data has no event-time windows, so the window is a
    derived grouping column — SURVEY.md §2.9). Shuffle key is int64
    epoch-hours; the timestamp is restored on the small result."""
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        # Arrow-native like q1: zero-copy from the read into arrow
        # hash-aggregation partials; cents math IEEE-identical to
        # cents_np (float64 floor(x*100+0.5)).
        import pyarrow.compute as pc

        epoch_us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        cents = pc.floor(
            pc.add(pc.multiply(t.column("value"), pa.scalar(100.0)), pa.scalar(0.5))
        ).cast(pa.int64())
        # FLOOR division in pure pyarrow: integer pc.divide truncates
        # toward zero (a pre-1970 timestamp would land in the wrong —
        # next — hour bucket and diverge from the date_trunc oracle),
        # so subtract 1 when the division had a remainder on a negative
        # value. Null timestamps propagate as null hour_epoch, matching
        # the oracle (a numpy round-trip would crash on nulls instead).
        per_hour = pa.scalar(3_600_000_000)
        d = pc.divide(epoch_us, per_hour)
        has_rem = pc.not_equal(pc.multiply(d, per_hour), epoch_us)
        adjust = pc.and_(pc.less(epoch_us, pa.scalar(0)), has_rem)
        hour = pc.subtract(d, adjust.cast(pa.int64()))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour_epoch": hour,
                "value_cents": cents,
                "n_events": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    derived = ds.map_batches(derive, batch_format="pyarrow", batch_size=65536)
    agg = grouped_sum(
        derived, ["event_type", "hour_epoch"], ["value_cents", "n_events"], arrow_partials=True
    )

    def restore_hour(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # ISO string, not a timestamp dtype: immune to the driver's
        # ns-vs-us canonicalization when hashing vs the SQL oracle
        hour = (
            (b["hour_epoch"] * 3_600_000_000)
            .astype("datetime64[us]")
            .dt.strftime("%Y-%m-%d %H:%M:%S")
        )
        # the null-ts group (retained by grouped_agg's dropna=False,
        # like SQL GROUP BY) must emit None — a float NaN would
        # stringify 'nan' vs the oracle's NULL
        b["hour"] = hour.where(hour.notna(), None)
        return b.drop(columns=["hour_epoch"])

    return agg.map_batches(restore_hour, batch_format="pandas")


EVENTS_HOURLY_SQL = """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """A1-style global distinct (bucketed partial-distinct shuffle)."""
    return distinct(
        ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type"]),
        ["event_type"],
        num_buckets=4,
    )


DISTINCT_EVENT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"


# ----------------------------------------------------------------- Q6
def q6_forecast_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q6-style global filter + sum: one row out, zero shuffle
    (per-batch partials + a single global combine)."""
    import pyarrow.compute as pc

    from datetime import datetime

    lo = pa.scalar(datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b["l_discount"].to_numpy() >= 0.05)
            & (b["l_discount"].to_numpy() <= 0.07)
            & (b["l_quantity"].to_numpy() < 24)
        )
        sel = b[m]
        rev = cents_np(sel["l_extendedprice"].to_numpy() * sel["l_discount"].to_numpy())
        return pd.DataFrame({"one": [1], "revenue_cents": [int(rev.sum())], "n_items": [int(m.sum())]})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return grouped_sum(partials, ["one"], ["revenue_cents", "n_items"], num_buckets=1).map_batches(
        lambda b: b.drop(columns=["one"]), batch_format="pandas"
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ------------------------------------------------------- JSON props
def events_props_k_sum(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured column: parse the JSON ``props`` payload and
    aggregate the extracted integer per event type. Parsing is a
    vectorized regex extract (the props schema is {"k": int}); a real
    pipeline would use a JSON kernel per batch — either way the parse
    happens inside map_batches, never on the driver."""
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "props"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        # missing "k" → 0 (SQL SUM skips NULLs; identical unless a whole
        # group is all-missing, which the fixture schema precludes) —
        # and never a crash on astype of NaN
        k = (
            b["props"]
            .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
            .fillna(0)
            .astype("int64")
        )
        return pd.DataFrame(
            {"event_type": b["event_type"], "k_sum": k, "n_events": np.ones(len(b), dtype=np.int64)}
        )

    return grouped_sum(
        ds.map_batches(derive, batch_format="pandas", batch_size=65536),
        ["event_type"],
        ["k_sum", "n_events"],
        num_buckets=4,
    )


EVENTS_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


# ------------------------------------------------- dimension broadcast
def supplier_balance_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Broadcast dimension join (nation) + grouped exact-cents aggregate."""
    import pyarrow.parquet as pq

    nation = pq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"]).to_pandas()
    natmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    sup = ray.data.read_parquet(_pq(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"])
    sup = broadcast_map(sup, natmap, "s_nationkey", "n_name")

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": b["n_name"],
                "acctbal_cents": cents_np(b["s_acctbal"]),
                "n_suppliers": np.ones(len(b), dtype=np.int64),
            }
        )

    derived = sup.map_batches(derive, batch_format="pandas")
    return grouped_sum(derived, ["n_name"], ["acctbal_cents", "n_suppliers"], num_buckets=4)


SUPPLIER_BALANCE_SQL = """
SELECT n_name, CAST(SUM(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents,
       COUNT(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ----------------------------------------------------- explode / flat_map
def top_tokens(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Token explode (flat_map shape) + global count + top-k: each batch
    explodes documents into (token, 1) partial counts — pre-aggregated
    per batch so the exchange moves per-token partials, not one row per
    token occurrence. Tie-break on the token for determinism."""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        tokens = b["text"].str.split(" ").explode()
        tokens = tokens[tokens != ""]
        g = tokens.value_counts().reset_index()
        g.columns = ["token", "n"]
        g["n"] = g["n"].astype("int64")
        return g

    counts = grouped_sum(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["token"],
        ["n"],
        num_buckets=8,
        # a VIRAL token (boilerplate word in every doc) yields one
        # partial row per batch for that key; the salted intermediate
        # combine re-spreads those so the final exchange sees at most
        # num_buckets rows per key (VERDICT r3 — skew-prone site)
        two_level=True,
    )
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)


TOP_TOKENS_SQL = """
SELECT word AS token, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(text, ' ')) AS word FROM documents)
WHERE word != ''
GROUP BY word ORDER BY n DESC, token LIMIT 20
"""


def events_user_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-user aggregate — a genuinely high-cardinality groupby (one
    output row per user) through the bucketed exchange."""
    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "value"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"],
                "value_cents": cents_np(b["value"]),
                "n_events": np.ones(len(b), dtype=np.int64),
            }
        )

    return grouped_sum(
        ds.map_batches(derive, batch_format="pandas", batch_size=65536),
        ["user_id"],
        ["value_cents", "n_events"],
        num_buckets=16,
        # a bot/crawler user_id can dominate the event stream; salted
        # two-level bounds its final-exchange rows (VERDICT r3)
        two_level=True,
    )


EVENTS_USER_STATS_SQL = """
SELECT user_id, CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def order_priority_counts(sf_dir: str) -> ray.data.Dataset:
    """Q4-flavoured: order counts per priority within a date window."""
    from datetime import datetime

    import pyarrow.compute as pc

    lo = pa.scalar(datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    ds = ray.data.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_orderpriority": b["o_orderpriority"], "n_orders": np.ones(len(b), dtype=np.int64)})

    return grouped_sum(ds.map_batches(derive, batch_format="pandas"), ["o_orderpriority"], ["n_orders"], num_buckets=4)


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""


# ----------------------------------------------------------------- Q10-ish
def q10_returned_revenue(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top customers by revenue on returned items (l_returnflag='R'):
    filter at the lineitem scan, hash-join to orders (broadcast
    order→cust map would be huge — the join IS large-large), bucketed
    per-customer sum, global top-k with tie-break."""
    import pyarrow.compute as pc

    lineitem = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pc.field("l_returnflag") == "R",
    ).map_batches(_li_rev_preagg, batch_format="pyarrow", batch_size=65536)
    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    joined = adaptive_inner_join(lineitem, orders, on="o_orderkey", batch_format="pyarrow")
    per_cust = grouped_sum(
        joined.select_columns(["o_custkey", "rev_cents"]),
        ["o_custkey"],
        ["rev_cents"],
        arrow_partials=True,
    )
    per_cust = per_cust.map_batches(
        lambda b: b.rename(columns={"o_custkey": "c_custkey", "rev_cents": "revenue_cents"}),
        batch_format="pandas",
    )
    return per_cust.sort(["revenue_cents", "c_custkey"], descending=[True, False]).limit(k).to_pandas()


Q10_SQL = """
SELECT o_custkey AS c_custkey,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY o_custkey
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


# ------------------------------------------------------- min/max aggregate
def part_price_range_by_brand(sf_dir: str) -> ray.data.Dataset:
    """Per-brand price range: decomposable min/max/count through the
    bucketed grouped_agg (partial per batch, final per bucket)."""
    from pdf_extractor_ray.ops import grouped_agg

    ds = ray.data.read_parquet(_pq(sf_dir, "part"), columns=["p_brand", "p_retailprice"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p_brand": b["p_brand"], "price_cents": cents_np(b["p_retailprice"])})

    return grouped_agg(
        ds.map_batches(derive, batch_format="pandas"),
        ["p_brand"],
        {
            "min_price_cents": ("price_cents", "min"),
            "max_price_cents": ("price_cents", "max"),
            "n_parts": ("price_cents", "count"),
        },
        num_buckets=4,
    )


PART_PRICE_RANGE_SQL = """
SELECT p_brand,
       MIN(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS min_price_cents,
       MAX(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS max_price_cents,
       COUNT(*) AS n_parts
FROM part GROUP BY p_brand
"""


# ------------------------------------------------- non-decomposable agg
def order_median_by_priority(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group MEDIAN — the canonical non-decomposable
    aggregate: it cannot be split into per-batch partials, so each
    key's rows are co-located by ONE bucketed exchange
    (``grouped_apply``) and the median is computed vectorized inside
    the bucket. Group count (5 priorities) is tiny; group SIZE is what
    scales, bounded per bucket — the same shape serves percentiles,
    mode, or any order statistic."""
    from pdf_extractor_ray.ops import grouped_apply

    ds = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderpriority": b["o_orderpriority"], "price_cents": cents_np(b["o_totalprice"])}
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_orderpriority", as_index=False)["price_cents"].median()
        return out.rename(columns={"price_cents": "median_price_cents"})

    return grouped_apply(
        ds.map_batches(derive, batch_format="pandas", batch_size=65536),
        ["o_orderpriority"],
        per_bucket,
        num_buckets=4,
    )


ORDER_MEDIAN_SQL = """
SELECT o_orderpriority,
       median(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS median_price_cents
FROM orders GROUP BY o_orderpriority
"""


# ------------------------------------------------------------- rollup
def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING-SETS/ROLLUP aggregate over (l_returnflag,
    l_linestatus): ONE distributed exchange computes the finest level;
    the coarser levels re-aggregate from that tiny result (6 rows) —
    the standard rollup plan, no extra scans. NULL grouping markers are
    emitted as the sentinel 'ALL' on both engines so the driver's hash
    canonicalization never sees engine-specific null encodings."""
    finest = (
        q1_pricing_summary(sf_dir)
        .to_pandas()[["l_returnflag", "l_linestatus", "sum_qty", "sum_disc_cents"]]
    )
    mid = (
        finest.groupby("l_returnflag", as_index=False)[["sum_qty", "sum_disc_cents"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "sum_qty": [finest["sum_qty"].sum()],
            "sum_disc_cents": [finest["sum_disc_cents"].sum()],
        }
    )
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_disc_cents"]
    out = pd.concat([finest[cols], mid[cols], total[cols]], ignore_index=True)
    return out.astype({"sum_qty": "int64", "sum_disc_cents": "int64"})


REVENUE_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def events_value_p95(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group P95 (nearest-rank) — the order-statistic family
    beyond the median: same co-location shape (one bucketed exchange,
    rank selection vectorized inside the bucket). The nearest-rank
    definition (sorted ascending, element at ``ceil(0.95 n) - 1``) is
    replicated literally in the oracle's window expression — no
    reliance on any engine's quantile interpolation mode."""
    from pdf_extractor_ray.ops import grouped_apply

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": b["event_type"], "value_cents": cents_np(b["value"])}
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        def p95(s: pd.Series) -> np.int64:
            v = np.sort(s.to_numpy())
            idx = max(0, int(np.ceil(0.95 * len(v))) - 1)
            return np.int64(v[idx])

        out = g.groupby("event_type", as_index=False)["value_cents"].agg(p95)
        return out.rename(columns={"value_cents": "p95_value_cents"})

    return grouped_apply(
        ds.map_batches(derive, batch_format="pandas", batch_size=65536),
        ["event_type"],
        per_bucket,
        num_buckets=4,
    )


EVENTS_P95_SQL = """
WITH s AS (
    SELECT event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
           row_number() OVER (PARTITION BY event_type ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT)) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type, v AS p95_value_cents
FROM s
WHERE rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
"""


def customer_order_counts_full(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join coverage: every customer with their order count
    (0 for order-less customers), plus any order rows whose custkey has
    no customer row (none in well-formed TPC-H data — but the plan must
    keep them). The per-custkey counts are pre-aggregated before the
    join, so the exchange carries one row per customer per side."""
    from pdf_extractor_ray.joins import join_datasets
    from pdf_extractor_ray.ops import grouped_sum

    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"])
    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey"]).map_batches(
        lambda b: pd.DataFrame(
            {"o_custkey": b["o_custkey"], "n_orders": np.ones(len(b), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    counts = grouped_sum(orders, ["o_custkey"], ["n_orders"], num_buckets=4)
    j = join_datasets(cust, counts, on="c_custkey", right_on="o_custkey", how="full_outer")

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        key = b["c_custkey"]
        if "o_custkey" in b.columns:
            key = key.fillna(b["o_custkey"])
        return pd.DataFrame(
            {
                "custkey": key.astype("int64"),
                "n_orders": b["n_orders"].fillna(0).astype("int64"),
            }
        )

    return j.map_batches(finalize, batch_format="pandas")


CUSTOMER_ORDER_COUNTS_FULL_SQL = """
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders
FROM customer
FULL OUTER JOIN (
    SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""


# deterministic date bands shared by the Ray query and its SQL literal
ORDER_ERAS = [
    ("1995-01-01", "1997-01-01", "era_95_96"),
    ("1997-01-01", "1999-01-01", "era_97_98"),
    ("1999-01-01", "2002-01-01", "era_99_01"),
]


def orders_by_era_range_join(sf_dir: str) -> ray.data.Dataset:
    """RANGE-join driver query: orders banded into date eras via
    ``joins.range_join`` (the interval table broadcasts; the orders
    stream never shuffles for the join), then per-era counts + exact
    price sums through one tiny bucketed exchange."""
    from pdf_extractor_ray.joins import range_join

    ranges = pd.DataFrame(
        [(np.datetime64(s), np.datetime64(e), n) for s, e, n in ORDER_ERAS],
        columns=["era_start", "era_end", "era"],
    )
    ds = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])
    j = range_join(ds, ranges, on="o_orderdate", start="era_start", end="era_end")

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "era": b["era"],
                "n_orders": np.ones(len(b), dtype=np.int64),
                "total_price_cents": cents_np(b["o_totalprice"]),
            }
        )

    return grouped_sum(
        j.map_batches(derive, batch_format="pandas"),
        ["era"],
        ["n_orders", "total_price_cents"],
        num_buckets=2,
    )


_ERA_VALUES = ", ".join(f"(DATE '{s}', DATE '{e}', '{n}')" for s, e, n in ORDER_ERAS)

ORDERS_BY_ERA_SQL = f"""
SELECT era,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_price_cents
FROM orders
JOIN (VALUES {_ERA_VALUES}) AS eras(era_start, era_end, era)
  ON o_orderdate >= era_start AND o_orderdate < era_end
GROUP BY era
"""


def events_value_p95_hist(sf_dir: str) -> ray.data.Dataset:
    """Same result as ``events_value_p95`` through the DECOMPOSED
    shape: distinct-value counts per group on the first exchange
    (bounded by the cents domain, not the event count), quantile from
    cumulative counts on the second — no key's raw rows are ever
    co-located. Shares the P95 oracle; a test pins equality with the
    co-located plan."""
    from pdf_extractor_ray.ops import grouped_quantile_counts

    ds = ray.data.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": b["event_type"], "value_cents": cents_np(b["value"])}
        )

    return grouped_quantile_counts(
        ds.map_batches(derive, batch_format="pandas", batch_size=65536),
        ["event_type"],
        "value_cents",
        0.95,
        out_col="p95_value_cents",
        num_buckets=4,
    )


# ---------------------------------------------------------------------------
# TPC-H Q4-shape: orders with any LATE lineitem, counted by priority
# ---------------------------------------------------------------------------

Q4_LATE_DAYS = 90


def q4_late_orders(sf_dir: str) -> ray.data.Dataset:
    """Orders with AT LEAST ONE late lineitem (shipped more than
    :data:`Q4_LATE_DAYS` days after the order date), counted by order
    priority — TPC-H Q4's EXISTS shape re-keyed to the columns this
    corpus carries (no commit/receipt dates; ship-vs-order lateness is
    the same existential semi-join pattern).

    Scale shape: one adaptive join attaches (o_orderdate, priority) to
    lineitems, a vectorized lateness filter, per-batch (orderkey,
    priority) dedup partials → ONE distinct exchange (EXISTS = distinct
    per order, so a 1000-line order contributes one row), then a tiny
    priority count fold."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import distinct, grouped_sum

    li = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])
    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    joined = adaptive_inner_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def late(b: pd.DataFrame) -> pd.DataFrame:
        ship = pd.to_datetime(b["l_shipdate"]).to_numpy("datetime64[us]").astype(np.int64)
        odate = pd.to_datetime(b["o_orderdate"]).to_numpy("datetime64[us]").astype(np.int64)
        m = ship - odate > Q4_LATE_DAYS * 86_400_000_000
        sel = b[m]
        return pd.DataFrame(
            {
                "l_orderkey": sel["l_orderkey"].to_numpy(np.int64),
                "o_orderpriority": sel["o_orderpriority"].astype(object),
            }
        ).drop_duplicates()

    pairs = distinct(
        joined.map_batches(late, batch_format="pandas", batch_size=65536),
        ["l_orderkey", "o_orderpriority"],
    )

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": b["o_orderpriority"].astype(object),
                "n_orders": np.ones(len(b), np.int64),
            }
        )

    return grouped_sum(pairs.map_batches(ones, batch_format="pandas"), ["o_orderpriority"], ["n_orders"])


Q4_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q14-shape: promo revenue share (exact integer milli)
# ---------------------------------------------------------------------------


def q14_promo_share(sf_dir: str) -> ray.data.Dataset:
    """Promotion revenue share: revenue from PROMO-type parts vs total,
    as an exact integer ``promo_milli = 1000·promo_cents //
    total_cents`` — TPC-H Q14 with the percentage kept integral. One
    adaptive join attaches p_type (the part side is small and
    broadcasts under the byte gate), revenue in cents partials, a
    single global fold."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_sum

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice", "l_discount"]
    )
    part = ray.data.read_parquet(_pq(sf_dir, "part"), columns=["p_partkey", "p_type"])
    joined = adaptive_inner_join(li, part, on="l_partkey", right_on="p_partkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = cents_np(b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()))
        promo = (b["p_type"] == "PROMO").to_numpy()
        return pd.DataFrame(
            {
                "one": [1],
                "promo_revenue_cents": [int(rev[promo].sum())],
                "total_revenue_cents": [int(rev.sum())],
            }
        )

    out = grouped_sum(
        joined.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["one"],
        ["promo_revenue_cents", "total_revenue_cents"],
        num_buckets=1,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop(columns=["one"]).copy()
        b["promo_milli"] = (
            1000 * b["promo_revenue_cents"].to_numpy(np.int64)
        ) // b["total_revenue_cents"].to_numpy(np.int64)
        return b

    return out.map_batches(finish, batch_format="pandas")


Q14_SQL = f"""
WITH r AS (
  SELECT {CENTS_SQL.format(expr='l_extendedprice * (1 - l_discount)')} AS cents,
         p_type = 'PROMO' AS promo
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT CAST(SUM(CASE WHEN promo THEN cents ELSE 0 END) AS BIGINT) AS promo_revenue_cents,
       CAST(SUM(cents) AS BIGINT) AS total_revenue_cents,
       CAST((1000 * SUM(CASE WHEN promo THEN cents ELSE 0 END)) // SUM(cents) AS BIGINT)
           AS promo_milli
FROM r
"""


# ---------------------------------------------------------------------------
# TPC-H Q17-shape: small-quantity revenue for one brand (correlated avg)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#13"


def q17_small_quantity(sf_dir: str) -> ray.data.Dataset:
    """Revenue locked in SMALL orders of one brand's parts: lineitems
    whose quantity is below 20% of that part's average quantity —
    TPC-H Q17's correlated-average shape with the fraction kept exact
    by cross-multiplication: ``qty < 0.2·(sum/cnt)`` ⇔
    ``5·qty_c·cnt < sum_c`` in cents integers (no division, no
    floats). Output one row: ``(n_items, price_cents)``.

    Scale shape: per-part (sum, cnt) partials → ONE partkey exchange →
    adaptive join back onto the brand-filtered lineitems → global
    fold."""
    from pdf_extractor_ray.joins import adaptive_inner_join, semi_join
    from pdf_extractor_ray.ops import grouped_sum

    part = ray.data.read_parquet(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])

    def brand_keys(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["p_brand"] == Q17_BRAND, ["p_partkey"]]

    keys = part.map_batches(brand_keys, batch_format="pandas")
    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li_brand = semi_join(li, keys, "l_partkey", right_on="p_partkey")

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_partkey": b["l_partkey"].to_numpy(np.int64),
                "sum_qc": cents_np(b["l_quantity"].to_numpy()),
                "cnt": np.ones(len(b), np.int64),
            }
        )

    per_part = grouped_sum(
        li_brand.map_batches(stats, batch_format="pandas", batch_size=65536),
        ["l_partkey"],
        ["sum_qc", "cnt"],
    )
    joined = adaptive_inner_join(li_brand, per_part, on="l_partkey")

    def small(b: pd.DataFrame) -> pd.DataFrame:
        qc = cents_np(b["l_quantity"].to_numpy())
        m = 5 * qc * b["cnt"].to_numpy(np.int64) < b["sum_qc"].to_numpy(np.int64)
        sel = b[m]
        return pd.DataFrame(
            {
                "one": [1],
                "n_items": [int(m.sum())],
                "price_cents": [int(cents_np(sel["l_extendedprice"].to_numpy()).sum())],
            }
        )

    return grouped_sum(
        joined.map_batches(small, batch_format="pandas", batch_size=65536),
        ["one"],
        ["n_items", "price_cents"],
        num_buckets=1,
    ).map_batches(lambda b: b.drop(columns=["one"]), batch_format="pandas")


Q17_SQL = f"""
WITH b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
a AS (
  SELECT l_partkey,
         SUM({CENTS_SQL.format(expr='l_quantity')}) AS sum_qc,
         COUNT(*) AS cnt
  FROM b GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COALESCE(SUM({CENTS_SQL.format(expr='b.l_extendedprice')}), 0) AS BIGINT) AS price_cents
FROM b JOIN a USING (l_partkey)
WHERE 5 * {CENTS_SQL.format(expr='b.l_quantity')} * a.cnt < a.sum_qc
"""


# ---------------------------------------------------------------------------
# TPC-H Q18-shape: large-volume orders, top-k
# ---------------------------------------------------------------------------

Q18_MIN_QTY = 100  # total units per order
Q18_TOP_K = 100


def q18_large_orders(sf_dir: str) -> ray.data.Dataset:
    """Large-volume orders: orders whose total lineitem quantity
    reaches :data:`Q18_MIN_QTY` units, joined to their customer, top
    :data:`Q18_TOP_K` by (o_totalprice DESC, o_orderkey ASC) — TPC-H
    Q18's having-sum + top-k shape. Quantities fold in cents integers.

    Scale shape: per-order quantity partials → ONE orderkey exchange →
    threshold filter (order-bounded rows) → two adaptive joins
    (orders, customer — both shrink after the filter) → k-bounded
    sort+limit."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_sum

    li = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                "sum_qty_c": cents_np(b["l_quantity"].to_numpy()),
            }
        )

    per_order = grouped_sum(
        li.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["l_orderkey"],
        ["sum_qty_c"],
    )

    def big(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["sum_qty_c"] >= Q18_MIN_QTY * 100]

    big_orders = per_order.map_batches(big, batch_format="pandas")
    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    j1 = adaptive_inner_join(big_orders, orders, on="l_orderkey", right_on="o_orderkey")
    j2 = adaptive_inner_join(j1, cust, on="o_custkey", right_on="c_custkey")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].to_numpy(np.int64),
                "c_custkey": b["o_custkey"].to_numpy(np.int64),
                "c_name": b["c_name"].astype(object),
                "sum_qty_c": b["sum_qty_c"].to_numpy(np.int64),
                "price_cents": cents_np(b["o_totalprice"].to_numpy()),
            }
        )

    return (
        j2.map_batches(project, batch_format="pandas")
        .sort(["price_cents", "o_orderkey"], descending=[True, False])
        .limit(Q18_TOP_K)
    )


Q18_SQL = f"""
WITH q AS (
  SELECT l_orderkey, SUM({CENTS_SQL.format(expr='l_quantity')}) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM({CENTS_SQL.format(expr='l_quantity')}) >= {Q18_MIN_QTY} * 100
)
SELECT o_orderkey, c_custkey, c_name,
       CAST(sum_qty_c AS BIGINT) AS sum_qty_c,
       {CENTS_SQL.format(expr='o_totalprice')} AS price_cents
FROM q
JOIN orders ON o_orderkey = q.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY price_cents DESC, o_orderkey ASC
LIMIT {Q18_TOP_K}
"""


# ---------------------------------------------------------------------------
# TPC-H Q7-shape: cross-nation shipping volume by year
# ---------------------------------------------------------------------------


def q7_nation_volume(sf_dir: str) -> ray.data.Dataset:
    """Shipping volume between (supplier nation → customer nation)
    pairs per ship year — TPC-H Q7's two-sided nation join without the
    nation-pair restriction (all pairs kept; the corpus is small-
    dimensional). Revenue in exact cents.

    Scale shape: lineitem joins suppliers (small side broadcasts under
    the byte gate) and orders→customers (order keys exchange when big);
    nation names attach from the 25-row dimension; the final fold is
    (nation, nation, year)-bounded."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_sum

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    supp = ray.data.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    import pyarrow.parquet as _pqt

    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = _pqt.read_table(_pq(sf_dir, "nation")).to_pandas()
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))

    j = adaptive_inner_join(li, supp, on="l_suppkey", right_on="s_suppkey")
    j = adaptive_inner_join(j, orders, on="l_orderkey", right_on="o_orderkey")
    j = adaptive_inner_join(j, cust, on="o_custkey", right_on="c_custkey")

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        year = pd.to_datetime(b["l_shipdate"]).dt.year.to_numpy(np.int64)
        rev = cents_np(b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()))
        return pd.DataFrame(
            {
                "supp_nation": b["s_nationkey"].map(names).astype(object),
                "cust_nation": b["c_nationkey"].map(names).astype(object),
                "l_year": year,
                "revenue_cents": rev,
            }
        )

    return grouped_sum(
        j.map_batches(fold, batch_format="pandas", batch_size=65536),
        ["supp_nation", "cust_nation", "l_year"],
        ["revenue_cents"],
    )


Q7_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({CENTS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT)
           AS revenue_cents
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ns ON ns.n_nationkey = s_nationkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q15-shape: top supplier(s) by revenue (argmax with ties)
# ---------------------------------------------------------------------------


def q15_top_supplier(sf_dir: str) -> ray.data.Dataset:
    """The supplier(s) with the MAXIMUM total revenue — TPC-H Q15's
    revenue-view + max shape, ties all kept (the reason Q15 is a view
    + equality, not a LIMIT 1). Exact cents.

    Scale shape: per-supplier revenue partials → one suppkey exchange;
    the max is read off the supplier-bounded result and the equality
    filter runs over the same table — no second corpus pass."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_sum

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
                "revenue_cents": cents_np(
                    b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
                ),
            }
        )

    per_supp = grouped_sum(
        li.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["l_suppkey"],
        ["revenue_cents"],
    ).materialize()
    best = max(r["revenue_cents"] for r in per_supp.take_all())  # supplier-bounded

    def winners(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["revenue_cents"] == best]

    supp = ray.data.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    out = adaptive_inner_join(
        per_supp.map_batches(winners, batch_format="pandas"), supp,
        on="l_suppkey", right_on="s_suppkey",
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s_suppkey": b["l_suppkey"].to_numpy(np.int64),
                "s_name": b["s_name"].astype(object),
                "revenue_cents": b["revenue_cents"].to_numpy(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


Q15_SQL = f"""
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM({CENTS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) AS BIGINT)
             AS revenue_cents
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, revenue_cents
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE revenue_cents = (SELECT MAX(revenue_cents) FROM r)
"""


# ---------------------------------------------------------------------------
# TPC-H Q19-shape: disjunctive predicate revenue
# ---------------------------------------------------------------------------


def q19_disjunctive(sf_dir: str) -> ray.data.Dataset:
    """Revenue under DISJUNCTIVE brand × quantity-band predicates —
    TPC-H Q19's OR-of-ANDs shape: (Brand#13, 1 ≤ qty ≤ 11) OR
    (Brand#22, 10 ≤ qty ≤ 20) OR (Brand#25, 20 ≤ qty ≤ 30). One
    adaptive join attaches p_brand, the predicate evaluates vectorized
    per batch (a planner cannot push a disjunction to one side — the
    point of Q19), one global cents fold."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_sum

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = ray.data.read_parquet(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    j = adaptive_inner_join(li, part, on="l_partkey", right_on="p_partkey")

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        q = b["l_quantity"].to_numpy()
        br = b["p_brand"].to_numpy()
        m = (
            ((br == "Brand#13") & (q >= 1) & (q <= 11))
            | ((br == "Brand#22") & (q >= 10) & (q <= 20))
            | ((br == "Brand#25") & (q >= 20) & (q <= 30))
        )
        sel = b[m]
        rev = cents_np(sel["l_extendedprice"].to_numpy() * (1.0 - sel["l_discount"].to_numpy()))
        return pd.DataFrame(
            {"one": [1], "n_items": [int(m.sum())], "revenue_cents": [int(rev.sum())]}
        )

    return grouped_sum(
        j.map_batches(fold, batch_format="pandas", batch_size=65536),
        ["one"],
        ["n_items", "revenue_cents"],
        num_buckets=1,
    ).map_batches(lambda b: b.drop(columns=["one"]), batch_format="pandas")


Q19_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COALESCE(SUM({CENTS_SQL.format(expr='l_extendedprice * (1 - l_discount)')}), 0) AS BIGINT)
           AS revenue_cents
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#25' AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# TPC-H Q22-shape: prospects (above-average balance, never ordered)
# ---------------------------------------------------------------------------


Q22_BIG_ORDER = 400_000  # shared with customers_without_big_orders


def q22_prospects(sf_dir: str) -> ray.data.Dataset:
    """Prospect customers: account balance above the positive-balance
    AVERAGE and no BIG order (> :data:`Q22_BIG_ORDER` — every customer
    on this corpus has SOME order, so TPC-H Q22's literal never-ordered
    form is degenerate; the big-order variant keeps the exact shape:
    global exact average + anti-join). The average is kept exact by
    cross-multiplication (``acct_c · n > sum_c``; no float division).
    Output per nation: ``(c_nationkey, n_prospects, acctbal_cents)``.

    Scale shape: the (sum, n) of positive balances folds in one
    1-row exchange; the no-big-order test is ONE adaptive anti-join
    against the filtered order custkeys; the nation fold is
    dimension-bounded."""
    from pdf_extractor_ray.joins import semi_join
    from pdf_extractor_ray.ops import grouped_sum

    cust = ray.data.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def pos_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = cents_np(b["c_acctbal"].to_numpy())
        pos = c > 0
        return pd.DataFrame({"one": [1], "sum_c": [int(c[pos].sum())], "n": [int(pos.sum())]})

    stats = grouped_sum(
        cust.map_batches(pos_partial, batch_format="pandas", batch_size=65536),
        ["one"],
        ["sum_c", "n"],
        num_buckets=1,
    ).to_pandas()
    sum_c, n = int(stats["sum_c"][0]), int(stats["n"][0])

    def rich(b: pd.DataFrame) -> pd.DataFrame:
        c = cents_np(b["c_acctbal"].to_numpy())
        sel = b[c * n > sum_c]
        out = sel[["c_custkey", "c_nationkey"]].copy()
        out["acct_c"] = cents_np(sel["c_acctbal"].to_numpy())
        return out

    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def big_keys(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["o_totalprice"].to_numpy() > Q22_BIG_ORDER, ["o_custkey"]]

    prospects = semi_join(
        cust.map_batches(rich, batch_format="pandas"),
        orders.map_batches(big_keys, batch_format="pandas"),
        "c_custkey", right_on="o_custkey", keep=False,
    )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": b["c_nationkey"].to_numpy(np.int64),
                "n_prospects": np.ones(len(b), np.int64),
                "acctbal_cents": b["acct_c"].to_numpy(np.int64),
            }
        )

    return grouped_sum(
        prospects.map_batches(fold, batch_format="pandas"),
        ["c_nationkey"],
        ["n_prospects", "acctbal_cents"],
    )


Q22_SQL = f"""
WITH pos AS (
  SELECT SUM({CENTS_SQL.format(expr='c_acctbal')}) AS sum_c, COUNT(*) AS n
  FROM customer WHERE {CENTS_SQL.format(expr='c_acctbal')} > 0
),
rich AS (
  SELECT c_custkey, c_nationkey, {CENTS_SQL.format(expr='c_acctbal')} AS acct_c
  FROM customer, pos
  WHERE {CENTS_SQL.format(expr='c_acctbal')} * pos.n > pos.sum_c
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_prospects,
       CAST(SUM(acct_c) AS BIGINT) AS acctbal_cents
FROM rich
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > {Q22_BIG_ORDER}
)
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q8-shape: national market share within a region, per year
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_SUPP_NATION = "NATION_2"


def q8_market_share(sf_dir: str) -> ray.data.Dataset:
    """Market share of one supplier nation within one customer REGION
    per order year — TPC-H Q8's six-table shape (lineitem × supplier ×
    nation × orders × customer × nation × region) with the share kept
    exact: ``share_milli = 1000·nation_cents // total_cents``.

    Scale shape: the two dimension chains (supplier→nation, customer→
    nation→region) resolve to small key sets that broadcast under the
    byte gate; the fact table joins orders on the one real exchange;
    the year fold is bounded."""
    import pyarrow.parquet as _pqt

    from pdf_extractor_ray.joins import adaptive_inner_join, semi_join
    from pdf_extractor_ray.ops import grouped_sum

    nation = _pqt.read_table(_pq(sf_dir, "nation")).to_pandas()
    region = _pqt.read_table(_pq(sf_dir, "region")).to_pandas()
    asia_keys = set(
        nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
        .loc[lambda m: m["r_name"] == Q8_REGION, "n_nationkey"]
    )
    supp_nation_key = int(nation.loc[nation["n_name"] == Q8_SUPP_NATION, "n_nationkey"].iloc[0])

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp = ray.data.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])

    def asia_cust(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["c_nationkey"].isin(asia_keys), ["c_custkey"]]

    j = adaptive_inner_join(li, supp, on="l_suppkey", right_on="s_suppkey")
    j = adaptive_inner_join(j, orders, on="l_orderkey", right_on="o_orderkey")
    j = semi_join(j, cust.map_batches(asia_cust, batch_format="pandas"), "o_custkey", right_on="c_custkey")

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        year = pd.to_datetime(b["o_orderdate"]).dt.year.to_numpy(np.int64)
        rev = cents_np(b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()))
        mine = (b["s_nationkey"].to_numpy(np.int64) == supp_nation_key).astype(np.int64)
        return pd.DataFrame(
            {
                "o_year": year,
                "nation_cents": rev * mine,
                "total_cents": rev,
            }
        )

    out = grouped_sum(
        j.map_batches(fold, batch_format="pandas", batch_size=65536),
        ["o_year"],
        ["nation_cents", "total_cents"],
    )

    def share(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["share_milli"] = (
            1000 * b["nation_cents"].to_numpy(np.int64)
        ) // b["total_cents"].to_numpy(np.int64)
        return b

    return out.map_batches(share, batch_format="pandas")


Q8_SQL = f"""
WITH v AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {CENTS_SQL.format(expr='l_extendedprice * (1 - l_discount)')} AS cents,
         sn.n_name = '{Q8_SUPP_NATION}' AS mine
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  WHERE r_name = '{Q8_REGION}'
)
SELECT o_year,
       CAST(SUM(CASE WHEN mine THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST((1000 * SUM(CASE WHEN mine THEN cents ELSE 0 END)) // SUM(cents) AS BIGINT)
           AS share_milli
FROM v GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q13-shape: customer distribution by order count (zero included)
# ---------------------------------------------------------------------------


def q13_custdist(sf_dir: str) -> ray.data.Dataset:
    """Customer distribution by order count INCLUDING the zero bucket —
    TPC-H Q13's left-join histogram: ``(c_count, custdist)``. The
    zero-orders class is the point of the left join (an inner count
    silently drops it).

    Scale shape: per-customer order counts via one custkey exchange;
    the zero bucket comes from ONE adaptive anti-join of customers
    against ordering custkeys (never a driver set); the final
    histogram is count-of-counts bounded."""
    from pdf_extractor_ray.joins import semi_join
    from pdf_extractor_ray.ops import grouped_sum

    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey"])
    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"])

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["o_custkey"].to_numpy(np.int64),
                "c_count": np.ones(len(b), np.int64),
            }
        )

    per_cust = grouped_sum(orders.map_batches(ones, batch_format="pandas"), ["c_custkey"], ["c_count"])
    never = semi_join(cust, orders, "c_custkey", right_on="o_custkey", keep=False)

    def zero(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].to_numpy(np.int64),
                "c_count": np.zeros(len(b), np.int64),
            }
        )

    all_counts = per_cust.union(never.map_batches(zero, batch_format="pandas"))

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_count": b["c_count"].to_numpy(np.int64),
                "custdist": np.ones(len(b), np.int64),
            }
        )

    return grouped_sum(all_counts.map_batches(hist, batch_format="pandas"), ["c_count"], ["custdist"])


Q13_SQL = """
WITH c AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q21-shape: suppliers who kept multi-supplier orders waiting
# ---------------------------------------------------------------------------


def q21_waiting_suppliers(sf_dir: str) -> ray.data.Dataset:
    """Suppliers who were the SOLE late shipper on a multi-supplier
    order — TPC-H Q21's double-EXISTS shape on the columns this corpus
    carries (lateness = ship > order + 90 days): count per supplier of
    orders where THIS supplier shipped late, ANOTHER supplier is on
    the order, and NO other supplier shipped late.

    Scale shape: one adaptive join attaches order dates, then ONE
    orderkey-bucketed exchange co-locates each order's lineitems
    (per-group cost bounded by order width); the per-order fold
    evaluates both EXISTS conditions vectorized; the supplier count is
    a tiny second fold."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    li = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    j = adaptive_inner_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def mark(b: pd.DataFrame) -> pd.DataFrame:
        ship = pd.to_datetime(b["l_shipdate"]).to_numpy("datetime64[us]").astype(np.int64)
        odate = pd.to_datetime(b["o_orderdate"]).to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
                "late": (ship - odate > Q4_LATE_DAYS * 86_400_000_000).astype(np.int64),
            }
        )

    marked = j.map_batches(mark, batch_format="pandas", batch_size=65536)

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        out_supp = []
        for _, sub in g.groupby("l_orderkey", sort=False):
            supps = sub["l_suppkey"].to_numpy(np.int64)
            late = sub["late"].to_numpy(np.int64)
            late_supps = np.unique(supps[late == 1])
            if len(late_supps) != 1:
                continue  # nobody late, or blame shared
            s = int(late_supps[0])
            if len(np.unique(supps)) < 2:
                continue  # single-supplier order: no one else to wait on
            out_supp.append(s)
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series(out_supp, dtype="int64"),
                "numwait": np.ones(len(out_supp), np.int64),
            }
        )

    blamed = grouped_apply(marked, ["l_orderkey"], per_order)
    return grouped_sum(blamed, ["s_suppkey"], ["numwait"])


Q21_SQL = f"""
WITH m AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM m GROUP BY l_orderkey
)
SELECT late_supp AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order
WHERE n_late = 1 AND n_supps >= 2
GROUP BY late_supp
"""


def revenue_decile_bounds(sf_dir: str) -> ray.data.Dataset:
    """Exact decile boundaries of order value → ``(decile, 
    boundary_cents)`` for deciles 1..9, where boundary d is the
    ``(d·n)//10``-th smallest cents value (1-based) — the cut table a
    curation pass uses to stratify orders/documents into equal-count
    value bands without an approximate sketch.

    Scale shape: NO global sort of the fact table. One exchange folds
    rows to COUNT-PER-DISTINCT-VALUE (bounded by the value domain, not
    the row count), :func:`~pdf_extractor_ray.ops.prefix_sum` turns
    those into global ranks with a num_buckets-sized driver collect,
    and a final filter emits the ≤ 9 rows whose rank span covers a
    target. Ties are free: equal values share one row, so the selected
    boundary is tie-order independent (unlike a row-sort plan)."""
    from pdf_extractor_ray.ops import prefix_sum

    ds = ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_totalprice"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": cents_np(b["o_totalprice"]), "m": np.ones(len(b), np.int64)}
        )

    counts = grouped_sum(
        ds.map_batches(derive, batch_format="pandas", batch_size=65536),
        ["v"],
        ["m"],
    )
    n = int(counts.sum("m"))
    ranked = prefix_sum(counts, "v", "m", "cum")  # exclusive prefix

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        cum = b["cum"].to_numpy(np.int64)
        m = b["m"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        decs, bounds = [], []
        for d in range(1, 10):
            t = (d * n) // 10
            hit = (cum < t) & (t <= cum + m)
            for val in v[hit]:
                decs.append(d)
                bounds.append(int(val))
        return pd.DataFrame(
            {
                "decile": pd.Series(decs, dtype="int64"),
                "boundary_cents": pd.Series(bounds, dtype="int64"),
            }
        )

    return ranked.map_batches(pick, batch_format="pandas")


REVENUE_DECILES_SQL = f"""
WITH c AS (SELECT {CENTS_SQL.format(expr="o_totalprice")} AS v FROM orders),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM c),
n AS (SELECT COUNT(*) AS n FROM c)
SELECT CAST(t.d AS BIGINT) AS decile, r.v AS boundary_cents
FROM r, n, unnest(generate_series(1, 9)) AS t(d)
WHERE r.rn = (t.d * n.n) // 10
"""


def basket_pairs_lineitem(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Market-basket association mining over lineitem → the top-``k``
    co-ordered part pairs ``(part_a, part_b, n_both, lift_milli)`` by
    support, with exact integer lift ``1000·n_both·N // (nₐ·n_b)``
    (lift > 1000 means the parts co-occur more than independence
    predicts — the association-rule signal; a web-corpus analog ranks
    co-linked or co-cited pages the same way).

    Scale shape: baskets group on ``l_orderkey`` (an order holds ≤ 7
    lineitems, so per-basket pair fan-out is constant-bounded — the
    association-mining equivalent of the LSH band-width bound); pair
    support and per-part order counts are two independent exchanges;
    the two lift joins run on the TOP-K-pruned pair table only, so the
    part-counts side, not the pair fan-out, bounds them."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = ray.data.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )
    n_orders = int(
        ray.data.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"]).count()
    )

    def pairs_per_order(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("l_orderkey", sort=False):
            parts = np.unique(grp["l_partkey"].to_numpy(np.int64))
            if len(parts) < 2:
                continue
            ia, ib = np.triu_indices(len(parts), k=1)
            outs.append(pd.DataFrame({"part_a": parts[ia], "part_b": parts[ib]}))
        if not outs:
            return pd.DataFrame(
                {"part_a": pd.Series(dtype="int64"), "part_b": pd.Series(dtype="int64")}
            )
        out = pd.concat(outs, ignore_index=True)
        out["n_both"] = np.int64(1)
        return out

    pair_support = grouped_sum(
        grouped_apply(ds, ["l_orderkey"], pairs_per_order),
        ["part_a", "part_b"],
        ["n_both"],
    )
    topk = pair_support.sort(
        ["n_both", "part_a", "part_b"], descending=[True, False, False]
    ).limit(k)

    def part_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b[["l_orderkey", "l_partkey"]].drop_duplicates()
        out = g.groupby("l_partkey", as_index=False).agg(n_orders=("l_orderkey", "size"))
        return out.astype({"n_orders": "int64"})

    part_counts = grouped_sum(
        ds.map_batches(part_partial, batch_format="pandas", batch_size=65536),
        ["l_partkey"],
        ["n_orders"],
    )
    # k-row left side; the join planner broadcasts whichever side fits
    j1 = adaptive_inner_join(topk, part_counts, on="part_a", right_on="l_partkey")
    j1 = j1.map_batches(
        lambda b: b.rename(columns={"n_orders": "n_a"}), batch_format="pandas"
    )
    j2 = adaptive_inner_join(j1, part_counts, on="part_b", right_on="l_partkey")

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        n_both = b["n_both"].to_numpy(np.int64)
        na = b["n_a"].to_numpy(np.int64)
        nb = b["n_orders"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part_a": b["part_a"].astype("int64"),
                "part_b": b["part_b"].astype("int64"),
                "n_both": n_both,
                "lift_milli": (1000 * n_both * n_orders) // (na * nb),
            }
        ).astype({"lift_milli": "int64"})

    return j2.map_batches(finalize, batch_format="pandas")


BASKET_PAIRS_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT b1.l_partkey AS part_a, b2.l_partkey AS part_b, COUNT(*) AS n_both
  FROM b b1 JOIN b b2 ON b1.l_orderkey = b2.l_orderkey
                      AND b1.l_partkey < b2.l_partkey
  GROUP BY 1, 2
),
topk AS (SELECT * FROM p ORDER BY n_both DESC, part_a, part_b LIMIT 20),
pc AS (SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS n_ord FROM lineitem GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM orders)
SELECT t.part_a, t.part_b, CAST(t.n_both AS BIGINT) AS n_both,
       CAST((1000 * t.n_both * n.n) // (pa.n_ord * pb.n_ord) AS BIGINT) AS lift_milli
FROM topk t
JOIN pc pa ON pa.l_partkey = t.part_a
JOIN pc pb ON pb.l_partkey = t.part_b, n
"""


def integrity_audit(sf_dir: str) -> ray.data.Dataset:
    """Referential-integrity audit across the fact tables →
    ``(check, n_violations)`` for the three joins a warehouse load
    verifies before anything downstream runs: lineitems whose order is
    missing, orders whose customer is missing, and orders with no
    lineitems at all (childless heads — legal in TPC-H, counted here as
    an inventory stat). The data-quality gate every ingest pipeline
    needs; always emits all three rows so a clean corpus hashes
    identically to `0` counts rather than an empty frame.

    Scale shape: each check is one distributed ANTI join
    (:func:`~pdf_extractor_ray.joins.semi_join` with ``keep=False``) —
    the key side broadcasts while it fits, exchanges beyond — followed
    by a scalar count; nothing row-sized reaches the driver."""
    from pdf_extractor_ray.joins import semi_join

    li = ray.data.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey"])
    orders = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )
    cust = ray.data.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"])

    orphan_li = semi_join(li, orders, on="l_orderkey", right_on="o_orderkey", keep=False).count()
    orphan_ord = semi_join(orders, cust, on="o_custkey", right_on="c_custkey", keep=False).count()
    childless = semi_join(orders, li, on="o_orderkey", right_on="l_orderkey", keep=False).count()
    return ray.data.from_items(
        [
            {"check": "lineitem_orphans", "n_violations": orphan_li},
            {"check": "order_missing_customer", "n_violations": orphan_ord},
            {"check": "childless_orders", "n_violations": childless},
        ]
    )


INTEGRITY_AUDIT_SQL = """
SELECT 'lineitem_orphans' AS check,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'order_missing_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'childless_orders',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
            AS BIGINT)
"""


def order_cohort_repeat(sf_dir: str) -> ray.data.Dataset:
    """Repeat-purchase rate by acquisition cohort → ``(cohort_month,
    n_customers, n_repeat, repeat_permille)`` where a customer's cohort
    is the calendar month of their FIRST order and ``n_repeat`` counts
    those who ordered again in ANY later month — the orders-side
    companion to the events retention matrix (did the acquisition
    batch come back at all?). Integer permille.

    One custkey-bucketed exchange computes first-month + any-later per
    customer; the cohort fold moves ≤ months rows per bucket."""
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = ray.data.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"]
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        us = g["o_orderdate"].to_numpy("datetime64[M]")
        g = g.assign(month=us)
        agg = g.groupby("o_custkey", sort=False)["month"].agg(["min", "max"])
        out = pd.DataFrame(
            {
                "cohort_month": pd.Series(agg["min"]).dt.strftime("%Y-%m"),
                "n_customers": np.ones(len(agg), np.int64),
                "n_repeat": (agg["max"] > agg["min"]).astype(np.int64),
            }
        )
        return out.groupby("cohort_month", as_index=False).sum()

    folded = grouped_sum(
        grouped_apply(ds, ["o_custkey"], per_bucket, num_buckets=16),
        ["cohort_month"],
        ["n_customers", "n_repeat"],
        num_buckets=2,
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["repeat_permille"] = (
            1000 * b["n_repeat"].to_numpy(np.int64) // b["n_customers"].to_numpy(np.int64)
        )
        return b.astype(
            {"n_customers": "int64", "n_repeat": "int64", "repeat_permille": "int64"}
        )

    return folded.map_batches(finalize, batch_format="pandas")


ORDER_COHORT_SQL = """
WITH pc AS (
  SELECT o_custkey,
         MIN(date_trunc('month', o_orderdate)) AS first_m,
         MAX(date_trunc('month', o_orderdate)) AS last_m
  FROM orders GROUP BY o_custkey
)
SELECT strftime(first_m, '%Y-%m') AS cohort_month,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN last_m > first_m THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
       CAST(1000 * SUM(CASE WHEN last_m > first_m THEN 1 ELSE 0 END) // COUNT(*)
            AS BIGINT) AS repeat_permille
FROM pc GROUP BY first_m
"""
