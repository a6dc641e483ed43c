"""Round-5 wave-41: referential-integrity audit, LOCF imputation,
cross-source quantile normalization, top user paths.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — planted violations for all
three integrity checks, the leading-null LOCF contract, the
distribution-matching property of quantile normalization, and
short-user path truncation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestIntegrityAudit:
    def test_clean_corpus_all_zero_or_counted(self, ray_session):
        from pdf_extractor_ray.pipelines.analytics import integrity_audit

        got = integrity_audit(SF_DIR).to_pandas().set_index("check")
        assert len(got) == 3
        assert got.loc["lineitem_orphans", "n_violations"] >= 0
        assert got.loc["order_missing_customer", "n_violations"] >= 0

    def test_planted_violations(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.analytics import integrity_audit

        ts = pd.Series([pd.Timestamp("2024-01-01")] * 4).astype("datetime64[us]")
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 99],  # 99 -> orphan
                "l_partkey": 1,
                "l_suppkey": 1,
                "l_linenumber": pd.Series(range(4), dtype="int32"),
                "l_quantity": 1.0,
                "l_extendedprice": 1.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": ts,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],  # 3 -> childless
                "o_custkey": [10, 10, 77],  # 77 -> missing customer
                "o_orderstatus": "F",
                "o_totalprice": 1.0,
                "o_orderdate": ts[:3],
                "o_orderpriority": "1-URGENT",
            }
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {
                "c_custkey": [10],
                "c_name": "a",
                "c_nationkey": pd.Series([0], dtype="int32"),
                "c_acctbal": 0.0,
                "c_mktsegment": "BUILDING",
            }
        ).to_parquet(tmp_path / "customer.parquet")
        got = integrity_audit(str(tmp_path)).to_pandas().set_index("check")
        assert got.loc["lineitem_orphans", "n_violations"] == 1
        assert got.loc["order_missing_customer", "n_violations"] == 1
        assert got.loc["childless_orders", "n_violations"] == 1


class TestLOCF:
    def test_leading_null_stays_null(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import locf_impute_events

        # event_id % 5 == 0 nulls: user 1 starts with a null (eid 0)
        rows = [
            {"event_id": 0, "user_id": 1, "sec": 0, "value": 9.0},   # null, leading
            {"event_id": 1, "user_id": 1, "sec": 1, "value": 2.0},   # 200
            {"event_id": 5, "user_id": 1, "sec": 2, "value": 9.0},   # null -> 200
            {"event_id": 2, "user_id": 1, "sec": 3, "value": 3.0},   # 300
        ]
        df = pd.DataFrame(rows)
        df["ts"] = (pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], unit="s")).astype("datetime64[us]")
        df["event_type"] = "view"; df["props"] = "{}"
        df = df.drop(columns="sec")
        df.to_parquet(tmp_path / "events.parquet")
        got = locf_impute_events(str(tmp_path)).to_pandas()
        # filled: [null, 200, 200, 300] -> imputed 1, sum 700
        assert got.values.tolist() == [[1, 1, 700]]

    def test_matches_pandas_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import LOCF_NULL_MOD, locf_impute_events

        got = (
            locf_impute_events(SF_DIR)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(SF_DIR + "/events.parquet").sort_values(
            ["user_id", "ts", "event_id"]
        )
        cents = np.floor(ev["value"].to_numpy() * 100 + 0.5)
        cents[(ev["event_id"].to_numpy() % LOCF_NULL_MOD) == 0] = np.nan
        ev = ev.assign(cents=cents)
        filled = ev.groupby("user_id", sort=False)["cents"].ffill()
        rep = ev.assign(filled=filled)
        want = (
            rep.groupby("user_id")
            .apply(
                lambda g: pd.Series(
                    {
                        "n_imputed": int((g["cents"].isna() & g["filled"].notna()).sum()),
                        "sum_cents_after": int(g["filled"].dropna().astype("int64").sum()),
                    }
                ),
                include_groups=False,
            )
            .reset_index()
            .astype("int64")
        )
        pd.testing.assert_frame_equal(got, want)


class TestQuantileNormalize:
    def test_distribution_matching_property(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import quantile_normalize_documents

        got = quantile_normalize_documents(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        g = got.merge(docs[["doc_id", "source"]], on="doc_id")
        # within each source, normalization preserves order
        for _, grp in g.groupby("source"):
            grp = grp.sort_values(["n_chars", "doc_id"])
            assert (np.diff(grp["normalized_chars"].to_numpy()) >= 0).all()
        # normalized values are drawn from the global value set
        assert set(g["normalized_chars"]) <= set(docs["n_chars"])
        # each source's min maps to (near) the global min
        gmin = docs["n_chars"].min()
        mins = g.loc[g.groupby("source")["n_chars"].idxmin(), "normalized_chars"]
        assert (mins == gmin).all()

    def test_single_doc_source_maps_to_min(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import quantile_normalize_documents

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": "t",
                "lang": "en",
                "source": ["a", "a", "a", "lone"],
                "n_chars": [10, 20, 30, 25],
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = quantile_normalize_documents(str(tmp_path)).to_pandas().set_index("doc_id")
        # lone source (n=1): gi=0 -> global minimum
        assert got.loc[3, "normalized_chars"] == 10


class TestUserPaths:
    def test_short_users_full_path(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import user_paths_events

        rows = [
            {"event_id": 0, "user_id": 1, "event_type": "view", "sec": 0},
            {"event_id": 1, "user_id": 1, "event_type": "click", "sec": 1},
            {"event_id": 2, "user_id": 1, "event_type": "purchase", "sec": 2},
            {"event_id": 3, "user_id": 1, "event_type": "view", "sec": 3},  # 4th ignored
            {"event_id": 4, "user_id": 2, "event_type": "view", "sec": 0},  # short user
        ]
        df = pd.DataFrame(rows)
        df["ts"] = (pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], unit="s")).astype("datetime64[us]")
        df["value"] = 1.0; df["props"] = "{}"
        df = df.drop(columns="sec")
        df.to_parquet(tmp_path / "events.parquet")
        got = user_paths_events(str(tmp_path)).to_pandas()
        paths = dict(zip(got["path"], got["n_users"]))
        assert paths == {"view>click>purchase": 1, "view": 1}

    def test_counts_cover_all_users(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import user_paths_events

        got = user_paths_events(SF_DIR, k=1000).to_pandas()
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        assert int(got["n_users"].sum()) == ev["user_id"].nunique()
