"""Round-5 wave-32: local clustering coefficient, audio level stats,
mojibake detect/repair, first-touch attribution.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — hand-graph coefficients,
the never-corrupt-on-suspicion repair contract, the RIFF decode round
trip — plus a pandas replica for the attribution fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestClusteringCoefficient:
    def test_hand_graph(self, ray_session):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import clustering_coefficient

        # triangle 1-2-3, node 4 hangs off 1, isolated pendant pair 5-6
        edges = ray.data.from_items(
            [
                {"src": 1, "dst": 2},
                {"src": 2, "dst": 3},
                {"src": 3, "dst": 1},
                {"src": 1, "dst": 4},
                {"src": 5, "dst": 6},
                {"src": 2, "dst": 1},  # reverse dup must not double-count
            ]
        )
        got = (
            clustering_coefficient(edges)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = pd.DataFrame(
            {
                "node": [1, 2, 3, 4, 5, 6],
                "degree": [3, 2, 2, 1, 1, 1],
                "n_triangles": [1, 1, 1, 0, 0, 0],
                # 1: 2000*1//(3*2)=333; 2,3: 2000*1//2=1000; deg<2 → 0
                "clustering_milli": [333, 1000, 1000, 0, 0, 0],
            }
        ).astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestMojibake:
    def test_repair_roundtrip(self):
        from pdf_extractor_ray.pipelines.textops import repair_mojibake

        clean = "plain ascii text"
        assert repair_mojibake(clean) == (0, clean)
        mangled = "café résumé".encode("utf-8").decode("latin-1")
        n, fixed = repair_mojibake("x " + mangled)
        assert n == 3
        assert fixed == "x café résumé"

    def test_never_corrupts_on_suspicion(self):
        from pdf_extractor_ray.pipelines.textops import repair_mojibake

        # signature present but text is NOT latin-1 encodable (real
        # UTF-8 content beyond U+00FF) → must return unchanged
        tricky = "price €9 Ã©"
        n, fixed = repair_mojibake(tricky)
        assert n == 1 and fixed == tricky

    def test_double_encoded_only_suffix_repaired(self):
        from pdf_extractor_ray.pipelines.textops import (
            derive_mojibake_corpus,
            repair_mojibake,
        )

        b = pd.DataFrame({"doc_id": [4, 5], "text": ["aa", "bb"]})
        d = derive_mojibake_corpus(b)
        n0, f0 = repair_mojibake(d["text"].iloc[0])
        assert n0 == 3 and f0 == "aa menu café résumé end"
        n1, f1 = repair_mojibake(d["text"].iloc[1])
        assert n1 == 0 and f1 == "bb menu cafe resume end"


class TestAudioStats:
    def test_saw_wav_decode_roundtrip(self):
        from pdf_extractor_ray.pipelines.multimodal import decode_wav, make_saw_wav

        payload = make_saw_wav(7, 350)
        info = decode_wav(payload)
        assert info["n_samples"] == 350 and info["sample_rate"] == 16000
        s = np.frombuffer(info["pcm"], dtype="<i2").astype(np.int64)
        i = np.arange(350, dtype=np.int64)
        np.testing.assert_array_equal(s, ((i + 7) % 201) - 100)
        assert int(np.abs(s).max()) == 100


class TestFirstTouch:
    def test_matches_pandas_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import first_touch_attribution

        got = (
            first_touch_attribution(SF_DIR)
            .to_pandas()
            .sort_values("first_event_type")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(SF_DIR + "/events.parquet").sort_values(
            ["user_id", "ts", "event_id"]
        )
        first = ev.groupby("user_id", sort=False)["event_type"].first()
        purch = ev.groupby("user_id", sort=False)["event_type"].agg(
            lambda s: int((s == "purchase").any())
        )
        per_user = pd.DataFrame({"f": first, "p": purch})
        want = per_user.groupby("f").agg(n_users=("p", "size"), n_purchasers=("p", "sum"))
        want = want.reset_index().rename(columns={"f": "first_event_type"})
        want["conversion_permille"] = want["n_purchasers"] * 1000 // want["n_users"]
        want = want.astype(
            {c: "int64" for c in ["n_users", "n_purchasers", "conversion_permille"]}
        ).sort_values("first_event_type").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert int(got["n_users"].sum()) == ev["user_id"].nunique()
