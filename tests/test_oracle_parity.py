"""Driver-gate replica in CI: every SQL-backed queries() entry must
match its DuckDB oracle (row count, columns, order-insensitive value
hash) at sf0.001. This is exactly what the driver records in
CORRECTNESS_r{N}.json at sf0.01."""

import duckdb
import pytest

from tests.conftest import SF_DIR

import sys

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod
from tools.check_oracle import TABLES, to_pandas, value_hash

_QUERIES = entrymod.queries()
_SQLS = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", sorted(_SQLS))
def test_sql_backed_query_matches_oracle(name, con):
    ray_df = to_pandas(_QUERIES[name](SF_DIR))
    ora_df = con.sql(_SQLS[name]).df()
    assert len(ray_df) == len(ora_df), f"{name}: rows {len(ray_df)} != {len(ora_df)}"
    assert sorted(ray_df.columns) == sorted(ora_df.columns)
    assert value_hash(ray_df) == value_hash(ora_df), f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_SQLS)))
def test_rows_only_query_runs(name):
    result = to_pandas(_QUERIES[name](SF_DIR))
    assert result is not None


def test_exchange_plan_matches_broadcast_plan_end_to_end(monkeypatch):
    """Force every adaptive join onto the hash-partitioned exchange
    (BROADCAST_KEY_LIMIT=0, resolved at call time) and assert two
    join-heavy SQL-checked queries return row-identical results to
    their normal (broadcast) plans — the end-to-end guarantee that the
    100 TB path computes the same answers as the tested-at-sf path."""
    import pandas as pd

    from pdf_extractor_ray import joins
    from pdf_extractor_ray.pipelines import analytics

    normal_q3 = analytics.q3_top_building_orders(SF_DIR)
    normal_anti = (
        analytics.customers_without_big_orders(SF_DIR).to_pandas()
        .sort_values("c_custkey").reset_index(drop=True)
    )

    monkeypatch.setattr(joins, "BROADCAST_KEY_LIMIT", 0)
    exch_q3 = analytics.q3_top_building_orders(SF_DIR)
    exch_anti = (
        analytics.customers_without_big_orders(SF_DIR).to_pandas()
        .sort_values("c_custkey").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(normal_q3, exch_q3)
    pd.testing.assert_frame_equal(normal_anti, exch_anti)
