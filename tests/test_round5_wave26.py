"""Round-5 wave-26 operator tests: TPC-H q8/q13/q21 shapes.

Ray session comes from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestQ8MarketShare:
    def test_share_bounds_and_region_restriction(self):
        from pdf_extractor_ray.pipelines.analytics import q8_market_share

        got = q8_market_share(SF_DIR).to_pandas()
        assert (got["nation_cents"] <= got["total_cents"]).all()
        assert (
            got["share_milli"]
            == (1000 * got["nation_cents"]) // got["total_cents"]
        ).all()
        # totals only cover ASIA-region customers, so they are a strict
        # subset of all revenue
        li = pq.read_table(
            SF_DIR + "/lineitem.parquet", columns=["l_extendedprice", "l_discount"]
        ).to_pandas()
        total_all = int(
            np.floor(
                li["l_extendedprice"].to_numpy()
                * (1 - li["l_discount"].to_numpy())
                * 100.0
                + 0.5
            ).sum()
        )
        assert got["total_cents"].sum() < total_all


class TestQ13Custdist:
    def test_zero_bucket_and_totals(self):
        from pdf_extractor_ray.pipelines.analytics import q13_custdist

        got = q13_custdist(SF_DIR).to_pandas().set_index("c_count")["custdist"]
        cust = pq.read_table(SF_DIR + "/customer.parquet", columns=["c_custkey"]).to_pandas()
        orders = pq.read_table(SF_DIR + "/orders.parquet", columns=["o_custkey"]).to_pandas()
        counts = orders["o_custkey"].value_counts()
        zero = len(cust) - counts.index.nunique()
        if zero:
            assert got.get(0, 0) == zero  # the left join's whole point
        assert got.sum() == len(cust)  # every customer in exactly one bucket
        want = counts.value_counts().to_dict()
        for k, v in want.items():
            assert got[k] == v


class TestQ21WaitingSuppliers:
    def test_sole_late_on_multi_supplier_orders(self):
        from pdf_extractor_ray.pipelines.analytics import (
            Q4_LATE_DAYS,
            q21_waiting_suppliers,
        )

        got = (
            q21_waiting_suppliers(SF_DIR)
            .to_pandas()
            .set_index("s_suppkey")["numwait"]
            .to_dict()
        )
        li = pq.read_table(
            SF_DIR + "/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        ).to_pandas()
        orders = pq.read_table(
            SF_DIR + "/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        ).to_pandas()
        m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        m["late"] = pd.to_datetime(m["l_shipdate"]) > pd.to_datetime(
            m["o_orderdate"]
        ) + pd.Timedelta(days=Q4_LATE_DAYS)
        want: dict[int, int] = {}
        for _, sub in m.groupby("l_orderkey"):
            late_supps = sub.loc[sub["late"], "l_suppkey"].unique()
            if len(late_supps) == 1 and sub["l_suppkey"].nunique() >= 2:
                s = int(late_supps[0])
                want[s] = want.get(s, 0) + 1
        assert got == want
