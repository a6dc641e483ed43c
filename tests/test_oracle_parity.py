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
