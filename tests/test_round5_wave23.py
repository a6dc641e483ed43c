"""Round-5 wave-23 operator tests: TPC-H q4/q14/q17/q18 shapes.

Ray session comes from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _li(cols):
    return pq.read_table(SF_DIR + "/lineitem.parquet", columns=cols).to_pandas()


class TestQ4LateOrders:
    def test_exists_semantics(self):
        from pdf_extractor_ray.pipelines.analytics import Q4_LATE_DAYS, q4_late_orders

        got = q4_late_orders(SF_DIR).to_pandas().set_index("o_orderpriority")["n_orders"]
        li = _li(["l_orderkey", "l_shipdate"])
        orders = pq.read_table(
            SF_DIR + "/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ).to_pandas()
        m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        late = m[
            pd.to_datetime(m["l_shipdate"])
            > pd.to_datetime(m["o_orderdate"]) + pd.Timedelta(days=Q4_LATE_DAYS)
        ]
        want = late.drop_duplicates("l_orderkey").groupby("o_orderpriority").size()
        assert got.to_dict() == want.to_dict()
        # a multi-late-line order counts ONCE
        assert got.sum() == late["l_orderkey"].nunique()


class TestQ14PromoShare:
    def test_share_bounds_and_exactness(self):
        from pdf_extractor_ray.pipelines.analytics import q14_promo_share

        got = q14_promo_share(SF_DIR).to_pandas().iloc[0]
        assert 0 < got["promo_revenue_cents"] < got["total_revenue_cents"]
        assert (
            got["promo_milli"]
            == (1000 * got["promo_revenue_cents"]) // got["total_revenue_cents"]
        )


class TestQ17SmallQuantity:
    def test_cross_multiplied_threshold(self):
        from pdf_extractor_ray.pipelines.analytics import Q17_BRAND, q17_small_quantity

        got = q17_small_quantity(SF_DIR).to_pandas().iloc[0]
        part = pq.read_table(
            SF_DIR + "/part.parquet", columns=["p_partkey", "p_brand"]
        ).to_pandas()
        keys = set(part.loc[part["p_brand"] == Q17_BRAND, "p_partkey"])
        li = _li(["l_partkey", "l_quantity", "l_extendedprice"])
        li = li[li["l_partkey"].isin(keys)]
        qc = np.floor(li["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        li = li.assign(qc=qc)
        agg = li.groupby("l_partkey")["qc"].agg(["sum", "count"])
        m = li.merge(agg, left_on="l_partkey", right_index=True)
        small = m[5 * m["qc"] * m["count"] < m["sum"]]
        assert got["n_items"] == len(small)
        want_cents = int(
            np.floor(small["l_extendedprice"].to_numpy() * 100.0 + 0.5).sum()
        )
        assert got["price_cents"] == want_cents


class TestQ18LargeOrders:
    def test_threshold_and_order(self):
        from pdf_extractor_ray.pipelines.analytics import (
            Q18_MIN_QTY,
            Q18_TOP_K,
            q18_large_orders,
        )

        got = q18_large_orders(SF_DIR).to_pandas()
        assert len(got) <= Q18_TOP_K
        assert (got["sum_qty_c"] >= Q18_MIN_QTY * 100).all()
        pc = got["price_cents"].to_numpy()
        assert (np.diff(pc) <= 0).all()  # descending by price
