"""Round-5 wave-39: deterministic LPA communities, bag-of-words dedup,
bot-regularity screen, audio decimation round-trip.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — LPA convergence on a hand
graph with the min-label tie rule, permutation invariance of the BOW
key, the ticking-vs-bursty VMR ordering, and the decimated WAV's
re-encoded header fields.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestLPA:
    def test_two_cliques_with_bridge(self, ray_session):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import label_propagation

        # cliques {1,2,3} and {7,8,9} joined by 3-7: after 3 sync
        # rounds with min-label ties each clique converges to its min
        edges = ray.data.from_items(
            [
                {"src": 1, "dst": 2},
                {"src": 2, "dst": 3},
                {"src": 3, "dst": 1},
                {"src": 7, "dst": 8},
                {"src": 8, "dst": 9},
                {"src": 9, "dst": 7},
                {"src": 3, "dst": 7},
            ]
        )
        got = (
            label_propagation(edges, iters=3)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        comm = dict(zip(got["node"], got["community"]))
        assert comm[1] == comm[2] == 1
        assert comm[8] == comm[9]
        # every label is a node id
        assert set(got["community"]) <= set(got["node"])

    def test_matches_sequential_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.graph import (
            community_lpa_documents,
            document_link_edges,
        )

        got = (
            community_lpa_documents(SF_DIR)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        e = document_link_edges(SF_DIR).to_pandas()
        und = set()
        for s, d in zip(e["src"], e["dst"]):
            if s != d:
                und.add((min(s, d), max(s, d)))
        adj: dict[int, list[int]] = {}
        for a, b in und:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        labels = {n: n for n in adj}
        for _ in range(3):
            new = {}
            for n, nbs in adj.items():
                cnt: dict[int, int] = {}
                for nb in nbs:
                    cnt[labels[nb]] = cnt.get(labels[nb], 0) + 1
                new[n] = min(
                    (lab for lab in cnt if cnt[lab] == max(cnt.values()))
                )
            labels = new
        want = pd.DataFrame(
            sorted(labels.items()), columns=["node", "community"]
        ).astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestBowDedup:
    def test_permutation_invariance(self):
        from pdf_extractor_ray.pipelines.textops import derive_bow_corpus

        b = pd.DataFrame({"doc_id": [0, 7, 14, 1], "text": ["orig"] * 4})
        d = derive_bow_corpus(b)
        k = lambda t: " ".join(sorted(t.split(" ")))
        # 0 and 14 share g0; 7 has g2 -> different multiset
        assert k(d["text"].iloc[0]) != d["text"].iloc[0] or True
        assert k(d["text"].iloc[0]) != k(d["text"].iloc[1])
        # rotation differs but multiset of same-group docs matches
        b2 = pd.DataFrame({"doc_id": [0, 35], "text": ["x", "y"]})  # both %5==0
        d2 = derive_bow_corpus(b2)
        assert d2["text"].iloc[0] != d2["text"].iloc[1]  # different rotation
        assert k(d2["text"].iloc[0]) == k(d2["text"].iloc[1])
        # non-planted rows untouched
        assert d["text"].iloc[3] == "orig"

    def test_groups_are_planted_quintets(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import bow_dedup_documents

        got = bow_dedup_documents(SF_DIR).to_pandas().sort_values("min_doc")
        # 500 docs, d%7==0 -> 72 planted docs over 5 g-groups
        assert len(got) == 5
        assert int(got["n_docs"].sum()) == len(range(0, 500, 7))
        assert (got["n_tokens"] == 8).all()


class TestBotRegularity:
    def test_ticker_beats_bursty(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import bot_regularity_users

        rows, eid = [], 0
        # user 1 ticks every 60 s (VMR 0); user 2 alternates 10/110 s
        for i in range(10):
            rows.append({"event_id": eid, "user_id": 1, "sec": 60 * i}); eid += 1
        t = 0
        for i in range(10):
            t += 10 if i % 2 else 110
            rows.append({"event_id": eid, "user_id": 2, "sec": t}); eid += 1
        df = pd.DataFrame(rows)
        df["ts"] = (pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], unit="s")).astype("datetime64[us]")
        df["event_type"] = "view"; df["value"] = 1.0; df["props"] = "{}"
        df = df.drop(columns="sec")
        df.to_parquet(tmp_path / "events.parquet")
        got = bot_regularity_users(str(tmp_path)).to_pandas()
        assert got.iloc[0]["user_id"] == 1 and got.iloc[0]["iv_vmr_milli"] == 0
        assert got.iloc[1]["user_id"] == 2 and got.iloc[1]["iv_vmr_milli"] > 0

    def test_vmr_formula_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import bot_regularity_users

        got = bot_regularity_users(SF_DIR).to_pandas()
        ev = pd.read_parquet(SF_DIR + "/events.parquet").sort_values(
            ["user_id", "ts", "event_id"]
        )
        for _, row in got.head(3).iterrows():
            g = ev[ev["user_id"] == row["user_id"]]
            d = np.diff(g["ts"].to_numpy("datetime64[us]").astype(np.int64)) // 1_000_000
            n, s, s2 = len(d), int(d.sum()), int((d.astype(object) ** 2).sum())
            assert row["n_deltas"] == n
            assert row["iv_vmr_milli"] == (1000 * (n * s2 - s * s)) // (n * s)


class TestAudioDecimate:
    def test_header_and_samples(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            decimate_wav,
            decode_wav,
            make_saw_wav,
        )

        src = make_saw_wav(5, 401)
        out = decode_wav(decimate_wav(src))
        assert out["sample_rate"] == 8000
        assert out["n_samples"] == 201  # ceil(401/2)
        s = np.frombuffer(out["pcm"], dtype="<i2")
        orig = np.frombuffer(decode_wav(src)["pcm"], dtype="<i2")
        np.testing.assert_array_equal(s, orig[::2])

    def test_factor_three(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            decimate_wav,
            decode_wav,
            make_saw_wav,
        )

        out = decode_wav(decimate_wav(make_saw_wav(1, 300), factor=3))
        assert out["n_samples"] == 100 and out["sample_rate"] == 16000 // 3
