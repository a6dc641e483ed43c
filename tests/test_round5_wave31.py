"""Round-5 wave-31: intra-doc line dedup, train/test leakage audit,
inter-arrival gap stats, DAU/WAU stickiness.

Oracle parity for the four new queries is covered automatically by
tests/test_oracle_parity.py; these tests pin what the SQL replica
can't see — first-occurrence ORDER in the cleaned text, gap
attribution to the later event, trailing-window membership at the
corpus edge — via independent pandas/python replicas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------


class TestLineDedup:
    def test_planted_repeats_removed_first_kept(self):
        from pdf_extractor_ray.pipelines.textops import derive_line_corpus

        b = pd.DataFrame(
            {
                "doc_id": [1],
                "text": ["a b c d e f g h i j k l m n o p"],  # 16 toks → 4 lines
                "source": ["srcX"],
            }
        )
        text = derive_line_corpus(b)["text"].iloc[0]
        lines = text.split("\n")
        # 4 base + [base0, base2] + 3× footer
        assert len(lines) == 9
        assert lines[4] == lines[0] and lines[5] == lines[2]
        assert lines[6] == lines[7] == lines[8] == "footer for srcX"
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        # first-occurrence keep: base order preserved, footer once
        assert kept == lines[:4] + ["footer for srcX"]

    def test_short_and_empty_docs(self):
        from pdf_extractor_ray.pipelines.textops import derive_line_corpus

        b = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["a b", ""], "source": ["s", "s"]}
        )
        texts = list(derive_line_corpus(b)["text"])
        # <3 base lines → only the first base line repeats
        assert texts[0].split("\n") == ["a b", "a b"] + ["footer for s"] * 3
        # empty doc → footer lines only
        assert texts[1].split("\n") == ["footer for s"] * 3

    def test_query_matches_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import (
            derive_line_corpus,
            line_dedup_documents,
        )

        got = (
            line_dedup_documents(SF_DIR)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")[
            ["doc_id", "text", "source"]
        ]
        derived = derive_line_corpus(docs)
        rows = []
        for doc_id, text in zip(derived["doc_id"], derived["text"]):
            lines = text.split("\n") if text else []
            kept = list(dict.fromkeys(lines))
            rows.append((int(doc_id), len(lines), len(kept), "\n".join(kept)))
        want = pd.DataFrame(
            rows, columns=["doc_id", "n_lines", "n_kept", "clean_text"]
        ).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert (got["n_kept"] < got["n_lines"]).all()  # non-degenerate


# ---------------------------------------------------------------------------
# leakage audit
# ---------------------------------------------------------------------------


class TestLeakageAudit:
    def test_planted_leaks_found_exactly(self, ray_session):
        from pdf_extractor_ray.pipelines.corpus import (
            LEAK_PLANT_MOD,
            leakage_audit_documents,
        )

        got = (
            leakage_audit_documents(SF_DIR)
            .to_pandas()
            .sort_values("test_doc_id")
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")[["doc_id"]]
        ids = set(docs["doc_id"])
        planted = sorted(
            d for d in ids if d % LEAK_PLANT_MOD == 0 and d + 1 in ids
        )
        assert list(got["test_doc_id"]) == planted
        assert (got["train_doc_id"] == got["test_doc_id"] + 1).all()
        assert (got["n_train_dups"] == 1).all()


# ---------------------------------------------------------------------------
# inter-arrival stats
# ---------------------------------------------------------------------------


class TestInterarrival:
    def test_matches_pandas_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import events_interarrival_stats

        got = (
            events_interarrival_stats(SF_DIR)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(SF_DIR + "/events.parquet").sort_values(
            ["user_id", "ts", "event_id"]
        )
        ts = ev["ts"].to_numpy("datetime64[ns]").astype(np.int64)
        uid = ev["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        gap_ms = (ts[1:] - ts[:-1]) // 1_000_000
        # gap is attributed to the LATER event's type
        rep = pd.DataFrame(
            {"event_type": ev["event_type"].to_numpy(object)[1:][same], "g": gap_ms[same]}
        )
        want = rep.groupby("event_type", as_index=False).agg(
            n_gaps=("g", "size"), total_gap_ms=("g", "sum"), max_gap_ms=("g", "max")
        )
        want["avg_gap_ms"] = want["total_gap_ms"] // want["n_gaps"]
        want = want.astype(
            {c: "int64" for c in ["n_gaps", "total_gap_ms", "max_gap_ms", "avg_gap_ms"]}
        ).sort_values("event_type").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert int(got["n_gaps"].sum()) > 0


# ---------------------------------------------------------------------------
# stickiness
# ---------------------------------------------------------------------------


class TestStickiness:
    def test_matches_trailing_window_replica(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import (
            STICKY_WINDOW_DAYS,
            events_stickiness,
        )

        got = (
            events_stickiness(SF_DIR)
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        day_i = ev["ts"].to_numpy("datetime64[ns]").astype(np.int64) // (86_400 * 10**9)
        pairs = pd.DataFrame({"d": day_i, "u": ev["user_id"]}).drop_duplicates()
        rows = []
        for d in sorted(pairs["d"].unique()):
            dau = pairs.loc[pairs["d"] == d, "u"].nunique()
            wau = pairs.loc[
                (pairs["d"] >= d - (STICKY_WINDOW_DAYS - 1)) & (pairs["d"] <= d), "u"
            ].nunique()
            rows.append(
                (
                    pd.Timestamp(d * 86_400, unit="s").strftime("%Y-%m-%d"),
                    dau,
                    wau,
                    dau * 1000 // wau,
                )
            )
        want = pd.DataFrame(
            rows, columns=["day", "dau", "wau", "stickiness_permille"]
        ).astype({"dau": "int64", "wau": "int64", "stickiness_permille": "int64"})
        pd.testing.assert_frame_equal(got, want)
        # WAU must exceed DAU somewhere (multi-day users exist)
        assert (got["wau"] > got["dau"]).any()
