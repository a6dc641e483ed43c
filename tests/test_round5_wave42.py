"""Round-5 wave-42: hour-over-hour trending types, change-point
detection, token fertility, image projection profiles.

Oracle parity is covered by tests/test_oracle_parity.py; these pin the
kernel edges the SQL derivation can't see — the calendar-hour (not
previous-row) lag rule, the CUSUM argmax on a planted regime shift,
fertility arithmetic, and the projection argmax tie rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _events(tmp_path, rows):
    df = pd.DataFrame(rows)
    df["ts"] = (pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], unit="s")).astype(
        "datetime64[us]"
    )
    df["value"] = 1.0
    df["props"] = "{}"
    df = df.drop(columns="sec")
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


class TestTrending:
    def test_calendar_hour_not_previous_row(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import trending_event_types

        rows, eid = [], 0
        # 'view': hour 0 (2 events), hour 2 (6 events) -> gap at hour 1,
        # so hour 2 has NO previous-calendar-hour row and must not appear
        for sec in (0, 60, 7200, 7260, 7320, 7380, 7440, 7500):
            rows.append({"event_id": eid, "user_id": 1, "event_type": "view", "sec": sec})
            eid += 1
        # 'click': hour 0 (1), hour 1 (3) -> trend 3000
        for sec in (0, 3600, 3660, 3720):
            rows.append({"event_id": eid, "user_id": 2, "event_type": "click", "sec": sec})
            eid += 1
        d = _events(tmp_path, rows)
        got = trending_event_types(d).to_pandas()
        assert got["event_type"].tolist() == ["click"]
        assert got.iloc[0][["n", "prev_n", "trend_milli"]].tolist() == [3, 1, 3000]

    def test_corpus_trend_arithmetic(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import trending_event_types

        got = trending_event_types(SF_DIR).to_pandas()
        assert len(got) == 20
        assert (got["trend_milli"] == 1000 * got["n"] // got["prev_n"]).all()
        # descending by trend
        assert (np.diff(got["trend_milli"].to_numpy()) <= 0).all()


class TestChangepoint:
    def test_planted_regime_shift(self, ray_session, tmp_path):
        from pdf_extractor_ray.pipelines.windows import events_changepoint

        rows, eid = [], 0
        # days 0-2: 4/day, days 3-5: 20/day -> split after day 2
        for day in range(6):
            n = 4 if day < 3 else 20
            for i in range(n):
                rows.append(
                    {"event_id": eid, "user_id": 1, "event_type": "view",
                     "sec": day * 86400 + i}
                )
                eid += 1
        d = _events(tmp_path, rows)
        got = events_changepoint(d)
        assert got.iloc[0]["split_day"] == "2024-01-03"
        assert got.iloc[0][["n_days_left", "n_days_right"]].tolist() == [3, 3]
        assert got.iloc[0][["mean_left_milli", "mean_right_milli"]].tolist() == [4000, 20000]

    def test_score_definition(self, ray_session):
        from pdf_extractor_ray.pipelines.windows import events_changepoint

        got = events_changepoint(SF_DIR).iloc[0]
        ev = pd.read_parquet(SF_DIR + "/events.parquet")
        daily = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).value_counts().sort_index()
        n = daily.to_numpy(np.int64)
        total = int(n.sum())
        best = max(
            (abs((len(n) - i - 1) * int(n[: i + 1].sum()) - (i + 1) * (total - int(n[: i + 1].sum()))), i)
            for i in range(len(n) - 1)
        )
        assert got["score"] == best[0]


class TestFertility:
    def test_arithmetic(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import token_fertility_by_lang

        got = token_fertility_by_lang(SF_DIR).to_pandas()
        docs = pd.read_parquet(SF_DIR + "/documents.parquet")
        assert set(got["lang"]) == set(docs["lang"])
        for _, row in got.iterrows():
            sub = docs[docs["lang"] == row["lang"]]
            toks = int(sub["text"].str.split(" ").map(lambda t: sum(1 for x in t if x)).sum())
            chars = int(sub["n_chars"].sum())
            assert row["sum_tokens"] == toks and row["sum_chars"] == chars
            assert row["fertility_milli"] == 1000 * chars // max(toks, 1)


class TestProjectionProfiles:
    def test_matches_bruteforce(self, ray_session):
        from pdf_extractor_ray.pipelines.multimodal import projection_profile_documents

        got = projection_profile_documents(SF_DIR).to_pandas().set_index("doc_id")
        for d in (0, 9, 250, 499):
            w, h = 8 + d % 9, 6 + d % 5
            px = (np.add.outer(np.arange(h), np.arange(w)) + d) % 256
            rows, cols = px.sum(axis=1), px.sum(axis=0)
            assert got.loc[d].tolist() == [
                int(rows.max()), int(rows.argmax()), int(cols.max()), int(cols.argmax())
            ]

    def test_tie_takes_first_index(self):
        # argmax on equal sums must take the first index (numpy rule ==
        # the SQL ORDER BY s DESC, y rank rule)
        a = np.array([5, 5, 3])
        assert int(a.argmax()) == 0
