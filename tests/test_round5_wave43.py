"""Round-5 wave-43: held-out Naive Bayes (live OOV + smoothed-zero
paths), Hamming-radius phash retrieval, weighted SSSP, conversion by
activity decile.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — the OOV
contribute-nothing rule, the engineered Hamming-2 twins and pigeonhole
completeness of the banding, Bellman-Ford relaxation on a hand graph,
and decile boundary arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestNBHoldout:
    def test_oov_and_split_shape(self, ray_session):
        from pdf_extractor_ray.pipelines.nbayes import naive_bayes_holdout

        got = naive_bayes_holdout(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        test_ids = set(docs.loc[docs["doc_id"] % 5 == 0, "doc_id"])
        assert set(got["doc_id"]) == test_ids
        # every test doc has >= 1 OOV (the planted oov<doc_id> token)
        assert (got["n_oov"] >= 1).all()

    def test_oov_contributes_nothing(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.nbayes import naive_bayes_holdout

        # doc 0 (test) and doc 5 (test): identical in-vocab content;
        # their scores must be equal despite different planted oov tokens
        df = pd.DataFrame(
            {
                "doc_id": [0, 5, 1, 2, 3, 4],
                "text": ["cat purr", "cat purr", "cat purr", "cat cat", "dog bark", "dog dog"],
                "lang": "en",
                "source": ["x", "x", "pets_a", "pets_a", "pets_b", "pets_b"],
                "n_chars": 8,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = naive_bayes_holdout(str(tmp_path)).to_pandas().set_index("doc_id")
        assert got.loc[0, "score_micro"] == got.loc[5, "score_micro"]
        assert got.loc[0, "predicted"] == got.loc[5, "predicted"] == "pets_a"


class TestPhashNear:
    def test_planted_twins_within_radius(self, ray_session):
        from pdf_extractor_ray.pipelines.multimodal import phash_near_pairs

        got = phash_near_pairs(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        n_twins = len(docs) // 2
        twins = got[(got["doc_b"] - got["doc_a"] == 1) & (got["doc_a"] % 2 == 0)]
        assert len(twins) == n_twins  # every even/odd twin recovered
        assert set(twins["hamming"]) <= {0, 2}
        assert (got["hamming"] <= 2).all()

    def test_banding_is_complete_vs_bruteforce(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.multimodal import (
            _png_decode_pixels,
            average_hash,
            make_block_png,
            phash_near_pairs,
        )

        n = 60
        pd.DataFrame(
            {
                "doc_id": range(n),
                "text": "t",
                "lang": "en",
                "source": "s",
                "n_chars": 1,
            }
        ).to_parquet(tmp_path / "documents.parquet")
        got = phash_near_pairs(str(tmp_path)).to_pandas()
        hashes = {
            d: average_hash(_png_decode_pixels(make_block_png(d))[0].reshape(16, 16))
            for d in range(n)
        }
        brute = set()
        for a in range(n):
            for b in range(a + 1, n):
                ham = sum(x != y for x, y in zip(hashes[a], hashes[b]))
                if ham <= 2:
                    brute.add((a, b, ham))
        assert set(map(tuple, got.values.tolist())) == brute

    def test_swap_changes_exactly_two_blocks(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            _png_decode_pixels,
            make_block_png,
        )

        even = _png_decode_pixels(make_block_png(10))[0].reshape(16, 16)
        odd = _png_decode_pixels(make_block_png(11))[0].reshape(16, 16)
        diff = (even != odd)
        # differences confined to the two swapped 2x2 blocks
        changed = set(zip(*np.where(diff)))
        assert changed <= {(y, x) for y in (0, 1, 14, 15) for x in (0, 1, 14, 15)}


class TestSSSP:
    def test_hand_graph_relaxation(self, ray_session):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import weighted_sssp

        # path 0-1-2-3 with weights w = 1+(a+b)%3: (0,1)->2, (1,2)->1,
        # (2,3)->3; plus shortcut 0-3 with w = 1+(3)%3 = 1
        edges = ray.data.from_items(
            [
                {"src": 0, "dst": 1},
                {"src": 1, "dst": 2},
                {"src": 2, "dst": 3},
                {"src": 0, "dst": 3},
            ]
        )
        got = (
            weighted_sssp(edges, seeds_mod=100, rounds=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = pd.DataFrame(
            {"node": [0, 1, 2, 3], "dist": [0, 2, 3, 1]}
        ).astype("int64")
        # node 2 reached faster via 0-3-2 (1+3=4) vs 0-1-2 (2+1=3) -> 3
        pd.testing.assert_frame_equal(got, want)

    def test_rounds_bound_reach(self, ray_session):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import weighted_sssp

        # chain 0-1-2-3-4-5: rounds=2 reaches only 2 hops
        edges = ray.data.from_items(
            [{"src": i, "dst": i + 1} for i in range(5)]
        )
        got = weighted_sssp(edges, seeds_mod=100, rounds=2).to_pandas()
        assert set(got["node"]) == {0, 1, 2}

    def test_carrier_dists_nonneg_and_seeded(self, ray_session):
        from pdf_extractor_ray.pipelines.graph import sssp_documents

        got = sssp_documents(SF_DIR).to_pandas()
        seeds = got[got["node"] % 100 == 0]
        assert (seeds["dist"] == 0).all()
        assert (got["dist"] >= 0).all() and (got["dist"] <= 4 * 3).all()


class TestConversionDecile:
    def test_decile_partition(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import conversion_by_activity_decile

        got = conversion_by_activity_decile(SF_DIR).to_pandas()
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        assert int(got["n_users"].sum()) == ev["user_id"].nunique()
        assert got["decile"].between(1, 10).all()
        assert (
            got["conversion_permille"]
            == 1000 * got["n_purchasers"] // got["n_users"]
        ).all()

    def test_tie_users_share_decile(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import conversion_by_activity_decile

        rows, eid = [], 0
        for uid in range(10):
            for _ in range(5):  # all users identical activity
                rows.append(
                    {"event_id": eid, "user_id": uid, "event_type": "view",
                     "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=eid)}
                )
                eid += 1
        df = pd.DataFrame(rows)
        df["ts"] = df["ts"].astype("datetime64[us]")
        df["value"] = 1.0
        df["props"] = "{}"
        df.to_parquet(tmp_path / "events.parquet")
        got = conversion_by_activity_decile(str(tmp_path)).to_pandas()
        # all tied at n_less=0 -> everyone in decile 1
        assert got["decile"].tolist() == [1] and got["n_users"].tolist() == [10]
