"""Round-5 wave-38: ORC source, market-basket lift, event-type
affinity projection, exact median time-to-convert.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — ORC round-trip fidelity
including column pruning, hand-computed lift values, the power-user
bound of the bipartite projection, and the converter definition (first
purchase before first view excluded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestOrcSource:
    def test_roundtrip_identity(self, ray_session):
        from pdf_extractor_ray.pipelines.webdocs import read_orc_documents

        got = (
            read_orc_documents(SF_DIR)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = pd.read_parquet(
            SF_DIR + "/documents.parquet", columns=["doc_id", "lang", "text"]
        ).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_column_prune_is_real(self, tmp_path):
        import pyarrow as pa
        import pyarrow.orc as paorc

        t = pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 1.5]})
        paorc.write_table(t, str(tmp_path / "f.orc"))
        r = paorc.ORCFile(str(tmp_path / "f.orc")).read(columns=["a", "b"])
        assert r.schema.names == ["a", "b"]


class TestBasketPairs:
    def test_hand_lift(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.analytics import basket_pairs_lineitem

        # orders: 1:{10,20}, 2:{10,20}, 3:{10,30}, 4:{40}
        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 2, 3, 3, 4],
                "l_partkey": [10, 20, 10, 20, 10, 30, 40],
                "l_suppkey": 1,
                "l_linenumber": pd.Series(range(7), dtype="int32"),
                "l_quantity": 1.0,
                "l_extendedprice": 1.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": pd.Series([pd.Timestamp("2024-01-01")] * 7).astype(
                    "datetime64[us]"
                ),
            }
        )
        li.to_parquet(tmp_path / "lineitem.parquet")
        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_custkey": 0,
                "o_orderstatus": "F",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Series([pd.Timestamp("2024-01-01")] * 4).astype(
                    "datetime64[us]"
                ),
                "o_orderpriority": "1-URGENT",
            }
        )
        orders.to_parquet(tmp_path / "orders.parquet")
        got = (
            basket_pairs_lineitem(str(tmp_path))
            .to_pandas()
            .sort_values(["part_a", "part_b"])
            .reset_index(drop=True)
        )
        # (10,20): both 2, n10=3, n20=2, N=4 -> lift 1000*2*4//6 = 1333
        # (10,30): both 1, n30=1 -> 1000*1*4//3 = 1333
        want = pd.DataFrame(
            {
                "part_a": [10, 10],
                "part_b": [20, 30],
                "n_both": [2, 1],
                "lift_milli": [1333, 1333],
            }
        ).astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_corpus_pairs_have_positive_lift(self, ray_session):
        from pdf_extractor_ray.pipelines.analytics import basket_pairs_lineitem

        got = basket_pairs_lineitem(SF_DIR).to_pandas()
        assert len(got) == 20
        assert (got["n_both"] >= 1).all() and (got["lift_milli"] > 0).all()
        assert (got["part_a"] < got["part_b"]).all()


class TestEventTypeAffinity:
    def test_power_user_bounded(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import event_type_affinity

        # one user with 1000 events over 2 types -> exactly ONE pair row
        rows = []
        for i in range(1000):
            rows.append(
                {
                    "event_id": i,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                    "user_id": 7,
                    "event_type": "view" if i % 2 else "click",
                    "value": 1.0,
                    "props": "{}",
                }
            )
        df = pd.DataFrame(rows)
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(tmp_path / "events.parquet")
        got = event_type_affinity(str(tmp_path)).to_pandas()
        assert got.values.tolist() == [["click", "view", 1]]

    def test_matches_replica_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import event_type_affinity

        got = (
            event_type_affinity(SF_DIR)
            .to_pandas()
            .sort_values(["type_a", "type_b"])
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(SF_DIR + "/events.parquet")[
            ["user_id", "event_type"]
        ].drop_duplicates()
        m = ev.merge(ev, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        want = (
            m.groupby(["event_type_x", "event_type_y"])
            .size()
            .reset_index(name="n_users_both")
            .rename(columns={"event_type_x": "type_a", "event_type_y": "type_b"})
        )
        want["n_users_both"] = want["n_users_both"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestConversionTime:
    def test_excludes_purchase_before_view(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import conversion_time_median

        rows = [
            # user 1: view t0, purchase t100 -> delta 100
            {"event_id": 0, "user_id": 1, "event_type": "view", "sec": 0},
            {"event_id": 1, "user_id": 1, "event_type": "purchase", "sec": 100},
            # user 2: purchase BEFORE first view -> excluded
            {"event_id": 2, "user_id": 2, "event_type": "purchase", "sec": 10},
            {"event_id": 3, "user_id": 2, "event_type": "view", "sec": 50},
            # user 3: view only -> excluded
            {"event_id": 4, "user_id": 3, "event_type": "view", "sec": 5},
            # user 4: delta 40
            {"event_id": 5, "user_id": 4, "event_type": "view", "sec": 0},
            {"event_id": 6, "user_id": 4, "event_type": "purchase", "sec": 40},
            # user 5: delta 300
            {"event_id": 7, "user_id": 5, "event_type": "view", "sec": 0},
            {"event_id": 8, "user_id": 5, "event_type": "purchase", "sec": 300},
        ]
        df = pd.DataFrame(rows)
        df["ts"] = (pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], unit="s")).astype(
            "datetime64[us]"
        )
        df["value"] = 1.0
        df["props"] = "{}"
        df = df.drop(columns="sec")
        df.to_parquet(tmp_path / "events.parquet")
        got = conversion_time_median(str(tmp_path))
        # converters: deltas [100, 40, 300] -> lower median 100
        assert got.iloc[0].tolist() == [3, 100]

    def test_matches_replica_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import conversion_time_median

        got = conversion_time_median(SF_DIR)
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        pu = ev.pivot_table(
            index="user_id", columns="event_type", values="ts", aggfunc="min"
        )
        if "view" in pu and "purchase" in pu:
            both = pu.dropna(subset=["view", "purchase"])
            both = both[both["purchase"] >= both["view"]]
            deltas = (
                (
                    both["purchase"].to_numpy("datetime64[us]").astype(np.int64)
                    - both["view"].to_numpy("datetime64[us]").astype(np.int64)
                )
                // 1_000_000
            )
            deltas = np.sort(deltas)
            want_med = int(deltas[(len(deltas) + 1) // 2 - 1])
            assert got.iloc[0].tolist() == [len(deltas), want_med]
