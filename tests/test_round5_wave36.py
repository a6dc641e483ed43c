"""Round-5 wave-36: power-law MLE, percentile rank-transform, Simpson
diversity, cross-lingual bitext candidate mining.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — the Hill estimator against
hand arithmetic and the degenerate all-equal sentinel, percentile
boundary/tie semantics, Simpson extremes, and the planted-anchor
recovery plus the different-language constraint for bitext blocking.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _write_events(tmp_path, counts: dict[int, int]) -> str:
    rows = []
    eid = 0
    for uid, n in counts.items():
        for _ in range(n):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=eid),
                    "user_id": uid,
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


class TestPowerLaw:
    def test_hand_values(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import power_law_alpha

        d = _write_events(tmp_path, {1: 1, 2: 1, 3: 2, 4: 4})
        got = power_law_alpha(d)
        q = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
        s = q(1 / 1) + q(1 / 1) + q(2 / 1) + q(4 / 1)
        want = 1000 + (1000 * 4 * 1_000_000) // s
        assert got.iloc[0].tolist() == [4, 1, want]

    def test_all_equal_degenerate(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import power_law_alpha

        d = _write_events(tmp_path, {u: 3 for u in range(5)})
        got = power_law_alpha(d)
        assert got.iloc[0].tolist() == [5, 3, 0]

    def test_matches_replica_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import power_law_alpha

        got = power_law_alpha(SF_DIR).iloc[0]
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        c = ev.groupby("user_id").size().to_numpy(np.int64)
        xmin = int(c.min())
        s = sum(math.floor(math.log(int(v) / xmin) * 1e6 + 0.5) for v in c)
        want = 1000 + (1000 * len(c) * 1_000_000) // s if s else 0
        assert got.tolist() == [len(c), xmin, want]


class TestLengthPercentile:
    def test_boundaries_and_ties(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import length_percentile_documents

        got = length_percentile_documents(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        n = len(docs)
        assert len(got) == n
        # strict-less rank replica
        v = docs.set_index("doc_id")["n_chars"]
        sv = np.sort(v.to_numpy(np.int64))
        for _, row in got.sample(25, random_state=0).iterrows():
            n_less = int(np.searchsorted(sv, row["n_chars"], side="left"))
            assert row["pct_milli"] == 1000 * n_less // (n - 1)
        # global min is percentile 0; unique global max is 1000
        assert got.loc[got["n_chars"].idxmin(), "pct_milli"] == 0
        if (v == v.max()).sum() == 1:
            assert got.loc[got["n_chars"].idxmax(), "pct_milli"] == 1000
        # ties share a percentile
        dup = got[got.duplicated("n_chars", keep=False)]
        if len(dup):
            assert (dup.groupby("n_chars")["pct_milli"].nunique() == 1).all()


class TestSimpson:
    def test_extremes(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import source_lang_simpson

        df = pd.DataFrame(
            {
                "doc_id": range(6),
                "text": "t",
                "lang": ["en", "en", "en", "en", "fr", "de"],
                "source": ["mono", "mono", "mono", "div", "div", "div"],
                "n_chars": 1,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = source_lang_simpson(str(tmp_path)).to_pandas().set_index("source")
        assert got.loc["mono"].tolist() == [3, 0]  # single lang -> 0
        assert got.loc["div"].tolist() == [3, 1000]  # all distinct -> 1000

    def test_matches_replica_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import source_lang_simpson

        got = (
            source_lang_simpson(SF_DIR)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        rows = []
        for src, grp in docs.groupby("source"):
            ni = grp.groupby("lang").size().to_numpy(np.int64)
            n = int(ni.sum())
            same = int((ni * (ni - 1)).sum())
            rows.append((src, n, 1000 - (1000 * same) // (n * (n - 1)) if n >= 2 else 0))
        want = pd.DataFrame(rows, columns=["source", "n_docs", "simpson_permille"]).astype(
            {"n_docs": "int64", "simpson_permille": "int64"}
        )
        pd.testing.assert_frame_equal(got, want.sort_values("source").reset_index(drop=True))


class TestBitext:
    def test_planted_anchor_recovery(self, ray_session):
        from pdf_extractor_ray.pipelines.corpus import bitext_candidates

        got = bitext_candidates(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet").set_index("doc_id")
        assert len(got) == 20 and (got["n_shared"] >= 1).all()
        # the different-language constraint holds on every pair
        for a, b in zip(got["doc_a"], got["doc_b"]):
            assert docs.loc[a, "lang"] != docs.loc[b, "lang"]

    def test_same_lang_pairs_excluded(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.corpus import bitext_candidates

        # anchors shared across same-lang pairs must produce nothing;
        # xl anchors tie (0,250)... here doc_ids 0..3 -> anchors xl0..xl3
        # so the only shared rare tokens are the planted words
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["ent42 a", "ent42 b", "ent99 c", "ent99 d"],
                "lang": ["en", "fr", "de", "de"],
                "source": "s",
                "n_chars": 7,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = bitext_candidates(str(tmp_path)).to_pandas()
        # (0,1) cross-lang via ent42 kept; (2,3) same-lang via ent99 dropped
        pairs = set(zip(got["doc_a"].tolist(), got["doc_b"].tolist()))
        assert (0, 1) in pairs
        assert (2, 3) not in pairs
