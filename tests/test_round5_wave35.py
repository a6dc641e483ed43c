"""Round-5 wave-35: distributed Naive Bayes, Zipf slope, token
burstiness, video motion score.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — a sequential NB replica
(train + score, including the smoothed-zero path and argmax
tie-break), a hand-computed Zipf regression, clumped-vs-spread
burstiness ordering, and the mod-256 wraparound in frame diffs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _nb_replica(docs: pd.DataFrame, label_col: str = "source") -> pd.DataFrame:
    """Sequential NB replica with the identical micro-nat quantizer."""
    tok = {}
    tot = {}
    nd = {}
    vocab = set()
    for _, row in docs.iterrows():
        lab = row[label_col]
        nd[lab] = nd.get(lab, 0) + 1
        for t in row["text"].split(" "):
            if not t:
                continue
            vocab.add(t)
            tok[(t, lab)] = tok.get((t, lab), 0) + 1
            tot[lab] = tot.get(lab, 0) + 1
    v = len(vocab)
    labels = sorted(nd)
    n = len(docs)
    q = lambda num, den: math.floor(math.log(num / den) * 1e6 + 0.5)
    rows = []
    for _, row in docs.iterrows():
        best = None
        for lab in labels:
            s = q(nd[lab], n)
            den = tot.get(lab, 0) + v
            for t in row["text"].split(" "):
                if t:
                    s += q(tok.get((t, lab), 0) + 1, den)
            if best is None or s > best[1]:
                best = (lab, s)
        rows.append({"doc_id": row["doc_id"], "predicted": best[0], "score_micro": best[1]})
    out = pd.DataFrame(rows)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score_micro"] = out["score_micro"].astype("int64")
    return out


class TestNaiveBayes:
    def test_matches_sequential_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.nbayes import naive_bayes_documents

        got = (
            naive_bayes_documents(SF_DIR)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        want = _nb_replica(docs).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_tiny_separable_corpus(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.nbayes import naive_bayes_scores

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["cat cat purr", "cat purr purr", "dog bark bark", "dog dog bark"],
                "lang": "en",
                "source": ["pets_a", "pets_a", "pets_b", "pets_b"],
                "n_chars": 10,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = naive_bayes_scores(str(tmp_path)).to_pandas().sort_values("doc_id")
        assert got["predicted"].tolist() == ["pets_a", "pets_a", "pets_b", "pets_b"]

    def test_model_size_guard(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.nbayes import naive_bayes_scores

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["a b c", "d e f"],
                "lang": "en",
                "source": ["x", "y"],
                "n_chars": 5,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        with pytest.raises(ValueError, match="max_model_rows"):
            naive_bayes_scores(str(tmp_path), max_model_rows=2)


class TestZipfSlope:
    def test_hand_regression(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import zipf_slope_documents

        # counts: a=4, b=2, c=1 -> ranks 1,2,3
        df = pd.DataFrame(
            {
                "doc_id": [0],
                "text": ["a a a a b b c"],
                "lang": "en",
                "source": "s",
                "n_chars": 13,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = zipf_slope_documents(str(tmp_path))
        q = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
        xs = [q(1), q(2), q(3)]
        ys = [q(4), q(2), q(1)]
        n = 3
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        want = (1000 * (sx * sy - n * sxy)) // (n * sxx - sx * sx)
        assert got.iloc[0].tolist() == [3, want]
        # exact-Zipf counts 4,2,1 over ranks 1,2,3 give slope ~ -1.26
        assert 1200 <= want <= 1300

    def test_corpus_slope_plausible(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import zipf_slope_documents

        got = zipf_slope_documents(SF_DIR)
        # synthetic near-uniform vocab -> shallow but non-negative slope
        assert got.iloc[0]["n_types"] == 31
        assert 0 <= got.iloc[0]["slope_neg_milli"] <= 2000


class TestBurstiness:
    def test_clumped_beats_spread(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.textops import token_burstiness_documents

        # 'rare' appears 4x in ONE doc (clumped); 'even' once in each
        # of 4 docs (spread). Same total count, very different VMR.
        df = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    "rare rare rare rare even pad",
                    "even pad pad",
                    "even pad pad",
                    "even pad pad",
                ],
                "lang": "en",
                "source": "s",
                "n_chars": 10,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = token_burstiness_documents(str(tmp_path)).to_pandas()
        r = got.set_index("token")
        # rare: N=4, S=4, S2=16 -> vmr = 1000*(64-16)//16 = 3000
        assert r.loc["rare"].tolist() == [1, 4, 3000]
        # even: N=4, S=4, S2=4 -> vmr = 1000*(16-16)//16 = 0
        assert r.loc["even"].tolist() == [4, 4, 0]
        assert got.iloc[0]["token"] == "rare"

    def test_vmr_identity_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import token_burstiness_documents

        got = token_burstiness_documents(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        n = len(docs)
        tok = docs["text"].str.split(" ").explode()
        tok = tok[tok != ""]
        per_doc = tok.groupby([tok.index, tok]).size()
        for _, row in got.head(5).iterrows():
            c = per_doc.xs(row["token"], level=1)
            s, s2 = int(c.sum()), int((c**2).sum())
            assert row["total_count"] == s
            assert row["vmr_milli"] == (1000 * (n * s2 - s * s)) // (n * s)


class TestVideoMotion:
    def test_frames_roundtrip_and_wraparound(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            make_motion_vid1,
            vid1_frames,
        )

        d, nf = 250, 4  # d near 256 so pixels wrap within frames
        frames = vid1_frames(make_motion_vid1(d, nf))
        assert frames.shape == (4, 6, 8)
        t = np.arange(nf).reshape(nf, 1, 1)
        y = np.arange(6).reshape(1, 6, 1)
        x = np.arange(8).reshape(1, 1, 8)
        np.testing.assert_array_equal(frames, ((x + 2 * y + 5 * t + d) % 256).astype(np.uint8))
        # wraparound makes |diff| jump from 5 to 251 at the boundary
        diffs = np.abs(np.diff(frames.astype(np.int64), axis=0))
        assert set(np.unique(diffs)) == {5, 251}

    def test_truncation_guards(self):
        from pdf_extractor_ray.pipelines.multimodal import make_motion_vid1, vid1_frames

        good = make_motion_vid1(1, 2)
        with pytest.raises(ValueError, match="magic"):
            vid1_frames(b"NOPE" + good[4:])
        with pytest.raises(ValueError, match="truncated VID1 frames"):
            vid1_frames(good[:-1])
        with pytest.raises(ValueError, match="truncated VID1 header"):
            vid1_frames(b"VID1\x00\x00")

    def test_matches_bruteforce(self, ray_session):
        from pdf_extractor_ray.pipelines.multimodal import video_motion_documents

        got = video_motion_documents(SF_DIR).to_pandas().set_index("doc_id")
        for d in (0, 3, 251, 499):
            nf = 2 + d % 4
            t = np.arange(nf).reshape(nf, 1, 1)
            y = np.arange(6).reshape(1, 6, 1)
            x = np.arange(8).reshape(1, 1, 8)
            fr = ((x + 2 * y + 5 * t + d) % 256).astype(np.int64)
            per = np.abs(np.diff(fr, axis=0)).sum(axis=(1, 2))
            assert got.loc[d].tolist() == [nf, int(per.sum()), int(per.max())]
