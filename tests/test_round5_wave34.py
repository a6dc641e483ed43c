"""Round-5 wave-34: perceptual-hash image dedup, audio silence runs,
common-neighbor link prediction, exact revenue deciles.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — aHash brightness
invariance and sensitivity, run-length encoding corners, a hand graph
for the wedge/anti-edge fold, and tie handling in the decile pick.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestAverageHash:
    def test_brightness_shift_invariant(self):
        from pdf_extractor_ray.pipelines.multimodal import average_hash

        rng = np.random.RandomState(3)
        px = rng.randint(0, 200, size=(16, 16)).astype(np.int64)
        h0 = average_hash(px)
        assert len(h0) == 64 and set(h0) <= {"0", "1"}
        for c in (1, 3, 17):
            assert average_hash(px + c) == h0

    def test_content_change_flips_bits(self):
        from pdf_extractor_ray.pipelines.multimodal import average_hash

        px = np.zeros((16, 16), np.int64)
        px[:8, :] = 100  # top half bright
        h_top = average_hash(px)
        assert average_hash(px.T.copy()) != h_top  # left-half-bright differs
        assert h_top[:32].count("1") == 32 and h_top[32:].count("1") == 0

    def test_shape_guard(self):
        from pdf_extractor_ray.pipelines.multimodal import average_hash

        with pytest.raises(ValueError):
            average_hash(np.zeros((8, 8), np.int64))

    def test_planted_quads_collapse(self, ray_session):
        from pdf_extractor_ray.pipelines.multimodal import phash_dup_documents

        got = phash_dup_documents(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        # every doc's quad (d//4) shares a hash -> group counts are
        # multiples of 4 (or the partial last quad), covering all docs
        assert int(got["n_docs"].sum()) == len(docs)
        assert (got["n_docs"] >= 2).all()
        # min_doc of each group is a quad leader unless quads collide
        assert (got["min_doc"] % 4 == 0).all()


class TestSilenceRuns:
    def test_rle_corners(self):
        from pdf_extractor_ray.pipelines.multimodal import silence_runs

        assert silence_runs(np.array([100, -100, 50], np.int64)) == (0, 0, 0)
        assert silence_runs(np.array([0, 0, 0], np.int64)) == (1, 3, 3)
        # silent at both ends, loud middle
        s = np.array([1, 2, 100, -3, 4, 5], np.int64)
        assert silence_runs(s) == (2, 3, 5)
        # threshold is strict
        assert silence_runs(np.array([10, 9], np.int64)) == (1, 1, 1)
        assert silence_runs(np.array([], np.int64)) == (0, 0, 0)

    def test_matches_bruteforce_on_saw(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            decode_wav,
            make_saw_wav,
            silence_runs,
        )

        for d in (0, 7, 123, 499):
            n = 100 + d % 500
            s = np.frombuffer(decode_wav(make_saw_wav(d, n))["pcm"], dtype="<i2")
            got = silence_runs(s)
            # brute force
            runs, cur = [], 0
            for v in s:
                if abs(int(v)) < 10:
                    cur += 1
                elif cur:
                    runs.append(cur)
                    cur = 0
            if cur:
                runs.append(cur)
            want = (len(runs), max(runs) if runs else 0, sum(runs))
            assert got == want


class TestLinkPrediction:
    def test_hand_graph(self, ray_session):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import common_neighbor_candidates

        # path 1-2-3 plus 1-4, 3-4: non-adjacent (1,3) shares {2,4},
        # (2,4) shares {1,3}; every other pair is an edge or shares <1
        edges = ray.data.from_items(
            [
                {"src": 1, "dst": 2},
                {"src": 2, "dst": 3},
                {"src": 1, "dst": 4},
                {"src": 3, "dst": 4},
                {"src": 2, "dst": 1},  # reverse dup must not double-count
            ]
        )
        got = common_neighbor_candidates(edges, k=10).to_pandas()
        want = pd.DataFrame({"a": [1, 2], "b": [3, 4], "n_common": [2, 2]}).astype(
            "int64"
        )
        pd.testing.assert_frame_equal(
            got.sort_values(["a", "b"]).reset_index(drop=True), want
        )

    def test_candidates_never_adjacent(self, ray_session):
        from pdf_extractor_ray.pipelines.graph import (
            document_link_edges,
            link_prediction_documents,
        )

        got = link_prediction_documents(SF_DIR).to_pandas()
        edges = document_link_edges(SF_DIR).to_pandas()
        eset = {
            (min(s, d), max(s, d)) for s, d in zip(edges["src"], edges["dst"]) if s != d
        }
        assert len(got) == 20 and (got["n_common"] > 0).all()
        for a, b in zip(got["a"], got["b"]):
            assert (int(a), int(b)) not in eset


class TestRevenueDeciles:
    def test_monotone_and_exact_ranks(self, ray_session):
        from pdf_extractor_ray.pipelines.analytics import revenue_decile_bounds

        got = (
            revenue_decile_bounds(SF_DIR)
            .to_pandas()
            .sort_values("decile")
            .reset_index(drop=True)
        )
        orders = pd.read_parquet(SF_DIR + "/orders.parquet")
        v = np.sort(np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64))
        n = len(v)
        want = pd.DataFrame(
            {
                "decile": np.arange(1, 10, dtype=np.int64),
                "boundary_cents": [int(v[(d * n) // 10 - 1]) for d in range(1, 10)],
            }
        )
        pd.testing.assert_frame_equal(got, want)
        assert (np.diff(got["boundary_cents"]) >= 0).all()

    def test_ties_share_one_boundary(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.analytics import revenue_decile_bounds

        # 20 rows, all the same price: every decile boundary is that value
        df = pd.DataFrame(
            {
                "o_orderkey": range(20),
                "o_custkey": 0,
                "o_orderstatus": "F",
                "o_totalprice": 42.0,
                "o_orderdate": pd.Timestamp("2024-01-01"),
                "o_orderpriority": "1-URGENT",
            }
        )
        df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
        df.to_parquet(tmp_path / "orders.parquet")
        got = revenue_decile_bounds(str(tmp_path)).to_pandas()
        assert len(got) == 9 and (got["boundary_cents"] == 4200).all()
