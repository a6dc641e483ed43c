"""Round-5 wave-25 operator tests.

Regex entity harvest, DOM template-path mining, schema-evolution
ingestion, day-over-day event delta. Ray session comes from the shared
session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestEntityCounts:
    def test_planted_counts_and_decoys(self):
        from pdf_extractor_ray.pipelines.textops import entity_counts_documents

        got = entity_counts_documents(SF_DIR).to_pandas().set_index("doc_id")
        d = got.index.to_numpy(np.int64)
        assert (got["n_urls"].to_numpy() == d % 3).all()
        assert (got["n_years"].to_numpy() == d % 4).all()
        assert (got["n_money"].to_numpy() == d % 5).all()

    def test_decoys_never_match(self):
        import re

        from pdf_extractor_ray.pipelines.textops import (
            ENTITY_MONEY_PAT,
            ENTITY_URL_PAT,
            ENTITY_YEAR_PAT,
        )

        decoys = "year 2500 $x ftp://not.a.match e1985.example.org"
        assert re.findall(ENTITY_URL_PAT, decoys) == []
        assert re.findall(ENTITY_YEAR_PAT, decoys) == []
        assert re.findall(ENTITY_MONEY_PAT, decoys) == []


class TestDomTemplatePaths:
    def test_template_vs_content_paths(self):
        from pdf_extractor_ray.pipelines.webdocs import dom_template_paths

        got = dom_template_paths(SF_DIR).to_pandas()
        ids = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        per_host = pd.Series(ids % 13).value_counts()
        # template paths appear on EVERY page of the host
        nav = got[got["path"] == "html>body>nav>ul>li"].set_index("host")["n_pages"]
        for h, n in per_host.items():
            assert nav[f"h{h}.example.org"] == n
        # depth-gated content paths cover exactly their d%3 slice
        deep = got[got["path"] == "html>body>div>div>div>p"].set_index("host")["n_pages"]
        for h in per_host.index:
            want = int(((ids % 13 == h) & (ids % 3 == 2)).sum())
            assert deep.get(f"h{h}.example.org", 0) == want


class TestSchemaEvolution:
    def test_old_generation_fills_default(self):
        from pdf_extractor_ray.pipelines.ingest import schema_evolution_documents

        got = (
            schema_evolution_documents(SF_DIR)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "lang", "text"]
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(docs)
        even = got["doc_id"] % 2 == 0
        assert (got.loc[even, "lang"].to_numpy() == docs.loc[even, "lang"].to_numpy()).all()
        assert (got.loc[~even, "lang"] == "").all()
        assert (got["n_chars"].to_numpy() == docs["text"].str.len().to_numpy()).all()


class TestEventsDailyDelta:
    def test_matches_sequential(self):
        from pdf_extractor_ray.pipelines.windows import events_daily_delta

        got = events_daily_delta(SF_DIR).to_pandas().sort_values("day").reset_index(drop=True)
        ev = pq.read_table(SF_DIR + "/events.parquet", columns=["ts"]).to_pandas()
        daily = (
            pd.to_datetime(ev["ts"]).dt.strftime("%Y-%m-%d").value_counts().sort_index()
        )
        days = daily.index.tolist()
        assert got["day"].tolist() == days[1:]  # first day excluded
        for i in range(1, len(days)):
            cur, prev = int(daily.iloc[i]), int(daily.iloc[i - 1])
            want = (1000 * cur) // prev - 1000
            assert int(got.loc[i - 1, "delta_milli"]) == want
