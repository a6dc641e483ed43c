"""Round-5 wave-45: bilinear 2× upscale round-trip, order-cohort
repeat rate, weekday traffic uniformity, Benford first-digit screen.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — the four parity cases of
the co-located bilinear grid, cohort boundary semantics, the missing-
weekday L1 contribution, and the string-based first-digit rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestUpscale:
    def test_four_parity_cases(self):
        from pdf_extractor_ray.pipelines.multimodal import upscale2x

        a = np.array([[0, 10], [20, 50]], np.int64)
        up = upscale2x(a)
        want = np.array(
            [
                [0, 5, 10],
                [10, 20, 30],
                [20, 35, 50],
            ],
            np.int64,
        )
        np.testing.assert_array_equal(up, want)

    def test_floor_division_not_round(self):
        from pdf_extractor_ray.pipelines.multimodal import upscale2x

        a = np.array([[1, 2]], np.int64)
        assert upscale2x(a)[0, 1] == 1  # (1+2)//2, not round(1.5)

    def test_roundtrip_matches_formula(self, ray_session):
        from pdf_extractor_ray.pipelines.multimodal import (
            upscale2x,
            upscale_documents,
        )

        got = upscale_documents(SF_DIR).to_pandas().set_index("doc_id")
        for d in (0, 7, 499):
            w, h = 8 + d % 9, 6 + d % 5
            px = (np.add.outer(np.arange(h), np.arange(w)) + d) % 256
            up = upscale2x(px)
            assert got.loc[d].tolist() == [2 * w - 1, 2 * h - 1, int(up.sum())]


class TestOrderCohort:
    def test_single_vs_repeat(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.analytics import order_cohort_repeat

        rows = [
            # cust 1: jan + mar -> repeat; cust 2: jan only; cust 3: feb x2
            (1, "2024-01-05"), (1, "2024-03-01"),
            (2, "2024-01-20"),
            (3, "2024-02-02"), (3, "2024-02-25"),
        ]
        df = pd.DataFrame(
            {
                "o_orderkey": range(len(rows)),
                "o_custkey": [r[0] for r in rows],
                "o_orderstatus": "F",
                "o_totalprice": 1.0,
                "o_orderdate": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
                "o_orderpriority": "1-URGENT",
            }
        )
        df.to_parquet(tmp_path / "orders.parquet")
        got = (
            order_cohort_repeat(str(tmp_path))
            .to_pandas()
            .set_index("cohort_month")
            .sort_index()
        )
        assert got.loc["2024-01"].tolist() == [2, 1, 500]
        # same-month second order is NOT a repeat (month granularity)
        assert got.loc["2024-02"].tolist() == [1, 0, 0]

    def test_partition_covers_customers(self, ray_session):
        from pdf_extractor_ray.pipelines.analytics import order_cohort_repeat

        got = order_cohort_repeat(SF_DIR).to_pandas()
        orders = pd.read_parquet(SF_DIR + "/orders.parquet")
        assert int(got["n_customers"].sum()) == orders["o_custkey"].nunique()
        assert (got["repeat_permille"] == 1000 * got["n_repeat"] // got["n_customers"]).all()


class TestTrafficUniformity:
    def test_missing_weekday_contributes_n(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import traffic_uniformity

        # 6 events all on ONE weekday (2024-01-01 is a Monday)
        df = pd.DataFrame(
            {
                "event_id": range(6),
                "ts": pd.Series([pd.Timestamp("2024-01-01 10:00")] * 6).astype("datetime64[us]"),
                "user_id": 1,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
        )
        df.to_parquet(tmp_path / "events.parquet")
        got = traffic_uniformity(str(tmp_path))
        # l1_x7 = |7*6-6| + 6*6 (six missing weekdays) = 36 + 36 = 72
        assert got["weekday"].tolist() == [0]
        assert got["l1_x7"].tolist() == [72]

    def test_uniform_is_zero(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import traffic_uniformity

        rows = []
        for d in range(7):  # one event on each weekday
            rows.append(
                {
                    "event_id": d,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(days=d),
                    "user_id": 1,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
            )
        df = pd.DataFrame(rows)
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(tmp_path / "events.parquet")
        got = traffic_uniformity(str(tmp_path))
        assert len(got) == 7 and (got["l1_x7"] == 0).all()


class TestBenford:
    def test_first_digit_rule(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import benford_values

        # cents: 100, 2500, 999, 1 -> digits 1, 2, 9, 1; zero excluded
        df = pd.DataFrame(
            {
                "event_id": range(5),
                "ts": pd.Series([pd.Timestamp("2024-01-01")] * 5).astype("datetime64[us]"),
                "user_id": 1,
                "event_type": "view",
                "value": [1.0, 25.0, 9.99, 0.01, 0.0],
                "props": "{}",
            }
        )
        df.to_parquet(tmp_path / "events.parquet")
        got = benford_values(str(tmp_path)).set_index("digit")
        assert got.loc[1, "n_events"] == 2
        assert got.loc[2, "n_events"] == 1
        assert got.loc[9, "n_events"] == 1
        assert int(got["n_events"].sum()) == 4  # the zero row excluded

    def test_shares_sum_near_1000(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import benford_values

        got = benford_values(SF_DIR)
        assert got["digit"].between(1, 9).all()
        s = int(got["share_milli"].sum())
        assert 990 <= s <= 1000  # floor-division slack
