"""Round-5 wave-33: token frequency spectrum, exact Gini activity
concentration, RFM segmentation, image intensity histogram.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — the count-of-counts Gini
rank arithmetic against hand-computed and brute-force values, the RFM
bucket edges against a pandas replica, the spectrum's planted-token
accounting, and the PNG decode→histogram round trip.
"""

from __future__ import annotations

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


class TestGini:
    def test_hand_values(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import gini_user_activity

        # x = [1,1,1,9]: S1 = 1+2+3+36 = 42, T = 12, n = 4
        # G = (2*42 - 5*12) / (4*12) = 0.5 -> 500 permille
        d = _write_events(tmp_path, {1: 1, 2: 1, 3: 1, 4: 9})
        got = gini_user_activity(d)
        assert got.iloc[0].tolist() == [4, 12, 500]

    def test_uniform_is_zero(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import gini_user_activity

        d = _write_events(tmp_path, {u: 5 for u in range(6)})
        got = gini_user_activity(d)
        assert got.iloc[0].tolist() == [6, 30, 0]

    def test_matches_bruteforce_on_corpus(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import gini_user_activity

        got = gini_user_activity(SF_DIR).iloc[0]
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        x = np.sort(ev.groupby("user_id").size().to_numpy(np.int64))
        n, total = len(x), int(x.sum())
        s1 = int(np.dot(np.arange(1, n + 1, dtype=np.int64), x))
        want = (2000 * s1 - 1000 * (n + 1) * total) // (n * total)
        assert got.tolist() == [n, total, want]


class TestRFM:
    def test_matches_pandas_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import rfm_segments

        got = (
            rfm_segments(SF_DIR)
            .to_pandas()
            .sort_values("segment")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        gmax = ev["ts"].max()
        u = ev.groupby("user_id").agg(
            n=("event_id", "size"),
            cents=("value", lambda v: int(np.floor(v * 100 + 0.5).astype("int64").sum())),
            last=("ts", "max"),
        )
        hours = (
            gmax.to_datetime64().astype("datetime64[us]").astype(np.int64)
            - u["last"].to_numpy("datetime64[us]").astype(np.int64)
        ) // 3_600_000_000
        r = np.where(hours < 12, 2, np.where(hours < 24, 1, 0))
        f = np.where(u["n"] >= 70, 2, np.where(u["n"] >= 60, 1, 0))
        m = np.where(u["cents"] >= 350_000, 2, np.where(u["cents"] >= 300_000, 1, 0))
        rep = pd.DataFrame({"segment": 100 * r + 10 * f + m, "cents": u["cents"].to_numpy()})
        want = (
            rep.groupby("segment", as_index=False)
            .agg(n_users=("cents", "size"), total_value_cents=("cents", "sum"))
            .astype("int64")
            .sort_values("segment")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        # every user lands in exactly one segment
        assert int(got["n_users"].sum()) == ev["user_id"].nunique()


class TestTokenSpectrum:
    def test_planted_accounting(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import token_spectrum_documents

        got = (
            token_spectrum_documents(SF_DIR)
            .to_pandas()
            .set_index("freq_bucket")
            .sort_index()
        )
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        n_docs = len(docs)
        # each doc plants a unique id<doc_id> token -> exactly the hapaxes
        # (the base synthetic vocab is high-frequency by construction)
        assert got.loc[1, "n_types"] == n_docs
        assert got.loc[1, "n_tokens"] == n_docs
        # grp<doc_id//3> tokens appear <= 3 times; doc_ids are contiguous
        # so full groups of 3 dominate
        assert got.loc[3, "n_types"] >= n_docs // 3 - 1
        # token conservation: sum over buckets == total token count
        base = docs["text"].str.split(" ").explode()
        base = base[base != ""]
        assert int(got["n_tokens"].sum()) == len(base) + 2 * n_docs

    def test_spectrum_is_count_of_counts(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import token_spectrum_documents

        got = token_spectrum_documents(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        derived = docs["text"] + " id" + docs["doc_id"].astype(str) + " grp" + (
            docs["doc_id"] // 3
        ).astype(str)
        tok = derived.str.split(" ").explode()
        tok = tok[tok != ""]
        counts = tok.value_counts()
        want = (
            pd.DataFrame({"freq_bucket": np.minimum(counts.to_numpy(np.int64), 6), "n": counts.to_numpy(np.int64)})
            .groupby("freq_bucket", as_index=False)
            .agg(n_types=("n", "size"), n_tokens=("n", "sum"))
            .astype("int64")
        )
        got = got.sort_values("freq_bucket").reset_index(drop=True)
        want = want.sort_values("freq_bucket").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


class TestImageHistogram:
    def test_decode_roundtrip_one_doc(self):
        from pdf_extractor_ray.pipelines.multimodal import (
            _png_decode_pixels,
            encode_png,
        )

        d = 7
        w, h = 8 + d % 9, 6 + d % 5
        x = np.arange(w, dtype=np.int64).reshape(1, w)
        y = np.arange(h, dtype=np.int64).reshape(h, 1)
        px0 = ((x + y + d) % 256).astype(np.uint8)
        px, _ = _png_decode_pixels(encode_png(px0))
        np.testing.assert_array_equal(px.reshape(h, w), px0)
        vals, cnts = np.unique(px.astype(np.int64) // 32, return_counts=True)
        # brute-force the histogram from the formula
        flat = ((np.add.outer(np.arange(h), np.arange(w)) + d) % 256) // 32
        want_vals, want_cnts = np.unique(flat, return_counts=True)
        np.testing.assert_array_equal(vals, want_vals)
        np.testing.assert_array_equal(cnts, want_cnts)

    def test_zero_buckets_omitted(self, ray_session):
        from pdf_extractor_ray.pipelines.multimodal import image_histogram_documents

        got = image_histogram_documents(SF_DIR).to_pandas()
        assert (got["n_px"] > 0).all()
        # per-doc pixel conservation: sum of bucket counts == w*h
        per_doc = got.groupby("doc_id")["n_px"].sum()
        d = per_doc.index.to_numpy(np.int64)
        np.testing.assert_array_equal(
            per_doc.to_numpy(np.int64), (8 + d % 9) * (6 + d % 5)
        )
