"""Round-5 wave-44: watermark late-event accounting, source
distribution drift, PRF query expansion, token HHI.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — the arrival-order running
max across bucket boundaries, the L1 drift extremes, the relevant-set
definition of PRF lift, and HHI extremes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


class TestLateEvents:
    def test_hand_sequence(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import late_events

        # arrival order (event_id) vs event-time hour:
        # ids 0..4 hours [0, 2, 1, 2, 0] -> late: id2 (1 < 2), id4 (0 < 2)
        hours = [0, 2, 1, 2, 0]
        df = pd.DataFrame(
            {
                "event_id": range(5),
                "ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h) for h in hours],
                "user_id": 1,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(tmp_path / "events.parquet")
        got = late_events(str(tmp_path)).to_pandas().set_index("hour_epoch_s")
        base = int(pd.Timestamp("2024-01-01").value // 1000 // 3_600_000_000) * 3600
        assert got.loc[base].tolist() == [2, 1]       # hour 0: ids 0,4; id4 late
        assert got.loc[base + 3600].tolist() == [1, 1]  # hour 1: id2 late
        assert got.loc[base + 7200].tolist() == [2, 0]  # hour 2: never late

    def test_monotone_stream_has_no_late(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import late_events

        df = pd.DataFrame(
            {
                "event_id": range(200),
                "ts": [
                    pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i) for i in range(200)
                ],
                "user_id": 1,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(tmp_path / "events.parquet")
        got = late_events(str(tmp_path)).to_pandas()
        assert int(got["n_late"].sum()) == 0

    def test_matches_sequential_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import late_events

        got = (
            late_events(SF_DIR)
            .to_pandas()
            .sort_values("hour_epoch_s")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(SF_DIR + "/events.parquet").sort_values("event_id")
        h = (
            ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
        ) * 3600
        seen = np.concatenate([[np.iinfo(np.int64).min], np.maximum.accumulate(h)[:-1]])
        late = (h < seen).astype(np.int64)
        rep = pd.DataFrame({"hour_epoch_s": h, "n_events": 1, "n_late": late})
        want = (
            rep.groupby("hour_epoch_s", as_index=False)
            .sum()
            .astype("int64")
            .sort_values("hour_epoch_s")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


class TestSourceDrift:
    def test_identical_source_zero_drift(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import source_drift_documents

        # both sources have the same unigram distribution -> drift 0
        df = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": ["a b", "a b", "a b", "a b"],
                "lang": "en",
                "source": ["s1", "s1", "s2", "s2"],
                "n_chars": 3,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = source_drift_documents(str(tmp_path)).to_pandas()
        assert (got["drift_permille"] == 0).all()

    def test_disjoint_vocab_max_drift(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import source_drift_documents

        df = pd.DataFrame(
            {
                "doc_id": range(2),
                "text": ["a a a a", "b b b b"],
                "lang": "en",
                "source": ["s1", "s2"],
                "n_chars": 7,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = source_drift_documents(str(tmp_path)).to_pandas().set_index("source")
        # each source is fully disjoint from the other half: TV = 1/2
        # of the doubled L1 -> 500 permille
        assert (got["drift_permille"] == 500).all()


class TestPRF:
    def test_cooccurring_term_ranks_high(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import prf_expansion_documents

        df = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    "hash bucket bucket",
                    "hash bucket probe",
                    "tree node node",
                    "tree node leaf",
                ],
                "lang": "en",
                "source": "s",
                "n_chars": 17,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = prf_expansion_documents(str(tmp_path))
        # 'bucket' and 'probe' appear ONLY in hash-docs -> max lift;
        # 'node'/'tree'/'leaf' never co-occur -> absent
        assert got.iloc[0]["token"] in ("bucket", "probe")
        assert "hash" not in set(got["token"])
        assert not {"tree", "node", "leaf"} & set(got["token"])

    def test_lift_arithmetic_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import prf_expansion_documents

        got = prf_expansion_documents(SF_DIR)
        assert len(got) == 10 and (got["lift_milli"] > 0).all()
        assert (np.diff(got["lift_milli"].to_numpy()) <= 0).all()


class TestHHI:
    def test_extremes(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import token_hhi_documents

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["x x x x", "a b c d"],
                "lang": "en",
                "source": "s",
                "n_chars": 7,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = token_hhi_documents(str(tmp_path)).to_pandas().set_index("doc_id")
        assert got.loc[0, "hhi_permille"] == 1000  # one token dominates
        assert got.loc[1, "hhi_permille"] == 250  # 4 distinct -> 1000/4

    def test_formula_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import token_hhi_documents

        got = token_hhi_documents(SF_DIR).to_pandas().set_index("doc_id")
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        for _, row in docs.head(5).iterrows():
            toks = [t for t in row["text"].split(" ") if t]
            _, c = np.unique(toks, return_counts=True)
            t = int(c.sum())
            assert got.loc[row["doc_id"], "hhi_permille"] == 1000 * int(
                (c.astype(np.int64) ** 2).sum()
            ) // (t * t)
