"""Round-5 wave-24 operator tests: TPC-H q7/q15/q19/q22 shapes.

Ray session comes from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _cents(x):
    return np.floor(np.asarray(x, np.float64) * 100.0 + 0.5).astype(np.int64)


class TestQ7NationVolume:
    def test_total_mass_conserved(self):
        from pdf_extractor_ray.pipelines.analytics import q7_nation_volume

        got = q7_nation_volume(SF_DIR).to_pandas()
        li = pq.read_table(
            SF_DIR + "/lineitem.parquet",
            columns=["l_extendedprice", "l_discount"],
        ).to_pandas()
        total = int(_cents(li["l_extendedprice"] * (1 - li["l_discount"])).sum())
        assert got["revenue_cents"].sum() == total  # every lineitem lands once
        assert got["l_year"].between(1990, 2005).all()


class TestQ15TopSupplier:
    def test_argmax_with_ties(self):
        from pdf_extractor_ray.pipelines.analytics import q15_top_supplier

        got = q15_top_supplier(SF_DIR).to_pandas()
        li = pq.read_table(
            SF_DIR + "/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        ).to_pandas()
        li["rev"] = _cents(li["l_extendedprice"] * (1 - li["l_discount"]))
        per = li.groupby("l_suppkey")["rev"].sum()
        best = per.max()
        assert set(got["s_suppkey"]) == set(per[per == best].index)
        assert (got["revenue_cents"] == best).all()


class TestQ19Disjunctive:
    def test_or_of_ands(self):
        from pdf_extractor_ray.pipelines.analytics import q19_disjunctive

        got = q19_disjunctive(SF_DIR).to_pandas().iloc[0]
        li = pq.read_table(
            SF_DIR + "/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ).to_pandas()
        part = pq.read_table(
            SF_DIR + "/part.parquet", columns=["p_partkey", "p_brand"]
        ).to_pandas()
        m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
        q, br = m["l_quantity"], m["p_brand"]
        mask = (
            ((br == "Brand#13") & q.between(1, 11))
            | ((br == "Brand#22") & q.between(10, 20))
            | ((br == "Brand#25") & q.between(20, 30))
        )
        sel = m[mask]
        assert got["n_items"] == int(mask.sum())
        assert got["revenue_cents"] == int(
            _cents(sel["l_extendedprice"] * (1 - sel["l_discount"])).sum()
        )


class TestQ22Prospects:
    def test_cross_multiplied_average_and_antijoin(self):
        from pdf_extractor_ray.pipelines.analytics import Q22_BIG_ORDER, q22_prospects

        got = q22_prospects(SF_DIR).to_pandas()
        assert got["n_prospects"].sum() > 0  # non-degenerate by construction
        cust = pq.read_table(SF_DIR + "/customer.parquet").to_pandas()
        orders = pq.read_table(
            SF_DIR + "/orders.parquet", columns=["o_custkey", "o_totalprice"]
        ).to_pandas()
        c = _cents(cust["c_acctbal"])
        pos = c[c > 0]
        rich = cust[c * len(pos) > pos.sum()]
        big = set(orders.loc[orders["o_totalprice"] > Q22_BIG_ORDER, "o_custkey"])
        pros = rich[~rich["c_custkey"].isin(big)]
        want = (
            pros.assign(acct=_cents(pros["c_acctbal"]))
            .groupby("c_nationkey")
            .agg(n_prospects=("c_custkey", "size"), acctbal_cents=("acct", "sum"))
        )
        got = got.set_index("c_nationkey").sort_index()
        want = want.sort_index()
        want.index = want.index.astype(np.int64)
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_names=False)
