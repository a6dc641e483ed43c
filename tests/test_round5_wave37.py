"""Round-5 wave-37: audio zero-crossing rate, image entropy, edge
embeddedness, daily-volume anomaly screen.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — the sign-product crossing
rule (zeros break a crossing), the entropy identity on hand
distributions, the local-bridge-vs-community edge ordering, and both
anomaly directions with cross-multiplied thresholds.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestZeroCrossings:
    def test_sign_product_rule(self):
        from pdf_extractor_ray.pipelines.multimodal import zero_crossings

        assert zero_crossings(np.array([1, -1, 1, -1], np.int64)) == 3
        # zeros break crossings: 1,0,-1 has NO strict sign-change pair
        assert zero_crossings(np.array([1, 0, -1], np.int64)) == 0
        assert zero_crossings(np.array([5, 5, 5], np.int64)) == 0
        assert zero_crossings(np.array([7], np.int64)) == 0
        assert zero_crossings(np.array([], np.int64)) == 0

    def test_saw_crossing_count(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            decode_wav,
            make_saw_wav,
            zero_crossings,
        )

        d, n = 13, 450
        s = np.frombuffer(decode_wav(make_saw_wav(d, n))["pcm"], dtype="<i2").astype(
            np.int64
        )
        got = zero_crossings(s)
        want = int(((s[:-1] * s[1:]) < 0).sum())
        assert got == want
        # sawtooth crosses zero ~ once per 201-sample ramp (wrap jump
        # lands on the -100 side, same sign) -> low single digits
        assert 1 <= got <= 5


class TestImageEntropy:
    def test_entropy_identity_hand(self):
        # uniform over k values, c each: H = ln(k)
        q = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
        n, k, c = 12, 4, 3
        s = k * (c * q(c))
        h = q(n) - s // n
        # ln(4) = ln(12) - ln(3) up to quantization
        assert abs(h - q(k)) <= 2

    def test_matches_bruteforce_per_doc(self, ray_session):
        from pdf_extractor_ray.pipelines.multimodal import image_entropy_documents

        got = image_entropy_documents(SF_DIR).to_pandas().set_index("doc_id")
        q = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
        for d in (0, 5, 77, 499):
            w, h = 8 + d % 9, 6 + d % 5
            px = (np.add.outer(np.arange(h), np.arange(w)) + d) % 256
            _, counts = np.unique(px, return_counts=True)
            n = int(counts.sum())
            s = sum(int(c) * q(int(c)) for c in counts if c > 1)
            assert got.loc[d].tolist() == [n, q(n) - s // n]
        # the gradient image covers w+h-1 distinct values -> entropy>0
        assert (got["entropy_micro"] > 0).all()


class TestEdgeEmbeddedness:
    def test_bridge_vs_community(self, ray_session):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import edge_embeddedness

        # two triangles (1,2,3) and (4,5,6) joined by bridge 3-4
        edges = ray.data.from_items(
            [
                {"src": 1, "dst": 2},
                {"src": 2, "dst": 3},
                {"src": 3, "dst": 1},
                {"src": 4, "dst": 5},
                {"src": 5, "dst": 6},
                {"src": 6, "dst": 4},
                {"src": 3, "dst": 4},
            ]
        )
        got = edge_embeddedness(edges, k=10).to_pandas()
        assert len(got) == 7
        emb = {(a, b): e for a, b, e in got.itertuples(index=False)}
        # triangle edges each share exactly one common neighbor
        for pair in [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]:
            assert emb[pair] == 1
        # the bridge has none -> a local bridge
        assert emb[(3, 4)] == 0
        # ordering: bridge last
        assert got.iloc[-1][["a", "b"]].tolist() == [3, 4]

    def test_carrier_edges_only(self, ray_session):
        from pdf_extractor_ray.pipelines.graph import (
            document_link_edges,
            edge_embeddedness_documents,
        )

        got = edge_embeddedness_documents(SF_DIR).to_pandas()
        edges = document_link_edges(SF_DIR).to_pandas()
        eset = {
            (min(s, d), max(s, d)) for s, d in zip(edges["src"], edges["dst"]) if s != d
        }
        assert len(got) == 20
        for a, b in zip(got["a"], got["b"]):
            assert (int(a), int(b)) in eset


class TestAnomalyDays:
    def _write(self, tmp_path, day_counts):
        rows, eid = [], 0
        for day, n in day_counts.items():
            for _ in range(n):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(days=day, seconds=eid % 3600),
                        "user_id": eid % 7,
                        "event_type": "view",
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                eid += 1
        df = pd.DataFrame(rows)
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(tmp_path / "events.parquet")
        return str(tmp_path)

    def test_both_directions(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import events_anomaly_days

        d = self._write(tmp_path, {0: 10, 1: 10, 2: 10, 3: 25, 4: 4})
        got = events_anomaly_days(d).set_index("day")
        assert got.loc["2024-01-04", "anomaly"] == "high"  # 25 > 2*10
        assert got.loc["2024-01-05", "anomaly"] == "low"  # 2*4 < 10
        assert (got.loc[["2024-01-01", "2024-01-02", "2024-01-03"], "anomaly"] == "normal").all()
        assert (got["median_daily"] == 10).all()

    def test_exact_double_is_normal(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import events_anomaly_days

        # strict inequality: exactly 2x median is NOT an anomaly
        d = self._write(tmp_path, {0: 10, 1: 10, 2: 20})
        got = events_anomaly_days(d).set_index("day")
        assert got.loc["2024-01-03", "anomaly"] == "normal"
