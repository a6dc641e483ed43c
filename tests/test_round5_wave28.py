"""Round-5 wave-28 operator tests: doc age, JSONL source, hive pruned
read, KWIC concordance.

Ray session comes from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestDocAge:
    def test_age_arithmetic(self):
        from pdf_extractor_ray.pipelines.webdocs import (
            DOC_AGE_CRAWL_DATE,
            doc_age_documents,
        )

        got = doc_age_documents(SF_DIR).to_pandas().set_index("doc_id")
        crawl = dt.date.fromisoformat(DOC_AGE_CRAWL_DATE)
        for d in got.index[:50]:
            pub = dt.date(2015, 1, 1) + dt.timedelta(days=(d * 7) % 3000)
            assert got.loc[d, "published"] == pub.isoformat()
            assert got.loc[d, "age_days"] == (crawl - pub).days
        assert (got["age_days"] > 0).all()


class TestReadJsonl:
    def test_round_trip(self):
        from pdf_extractor_ray.pipelines.webdocs import read_jsonl_documents

        got = (
            read_jsonl_documents(SF_DIR)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            pq.read_table(
                SF_DIR + "/documents.parquet", columns=["doc_id", "lang", "text"]
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "lang", "text"]], want, check_dtype=False
        )


class TestHivePrunedRead:
    def test_only_first_lang_partition(self):
        from pdf_extractor_ray.pipelines.webdocs import hive_pruned_read_documents

        got = hive_pruned_read_documents(SF_DIR).to_pandas()
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        ).to_pandas()
        target = docs["lang"].min()
        want = docs[docs["lang"] == target]
        assert set(got["doc_id"]) == set(want["doc_id"])
        assert got["n_chars"].sum() == want["n_chars"].sum()


class TestKwic:
    def test_contexts_match_token_walk(self):
        from pdf_extractor_ray.pipelines.search import (
            KWIC_TERM,
            KWIC_WINDOW,
            kwic_documents,
        )

        got = kwic_documents(SF_DIR).to_pandas()
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        want = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            ws = t.split()
            for i, w in enumerate(ws):
                if w == KWIC_TERM:
                    lo, hi = max(0, i - KWIC_WINDOW), min(len(ws), i + KWIC_WINDOW + 1)
                    want.append((int(d), i + 1, " ".join(ws[lo:hi])))
        got_t = sorted(zip(got["doc_id"], got["pos"], got["context"]))
        assert got_t == sorted(want)
        # every context contains the term at its center-ish position
        assert got["context"].str.contains(KWIC_TERM).all()
