"""Round-5 wave-17 operator tests.

Snapshot line delta, OOV rate vs corpus vocabulary, largest-remainder
crawl budget, dangling-link rate. Ray session comes from the shared
session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestSnapshotDelta:
    def test_edit_classes(self):
        from pdf_extractor_ray.pipelines.webdocs import snapshot_delta_documents

        got = snapshot_delta_documents(SF_DIR).to_pandas()
        got["d"] = got["url"].str.rsplit("/", n=1).str[1].astype(np.int64)
        even_keep = got[(got["d"] % 2 == 0) & (got["d"] % 5 != 0)]
        assert (even_keep["n_added"] == 0).all()
        assert (even_keep["n_removed"] == 0).all()
        replaced = got[(got["d"] % 2 == 1) & (got["d"] % 5 != 0)]
        assert (replaced["n_added"] == 1).all()
        assert (replaced["n_removed"] == 1).all()
        appended = got[(got["d"] % 5 == 0) & (got["d"] % 2 == 0)]
        assert (appended["n_added"] == 1).all()
        assert (appended["n_removed"] == 0).all()


class TestOovRate:
    def test_matches_local_replica(self):
        from pdf_extractor_ray.pipelines.textops import OOV_VOCAB_K, oov_rate_documents

        got = oov_rate_documents(SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        counts: dict[str, int] = {}
        for t in docs["text"]:
            for w in t.split():
                counts[w] = counts.get(w, 0) + 1
        vocab = set(
            w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:OOV_VOCAB_K]
        )
        for d, t in zip(docs["doc_id"], docs["text"]):
            ws = t.split()
            assert got.loc[d, "n_tokens"] == len(ws)
            assert got.loc[d, "n_oov"] == sum(1 for w in ws if w not in vocab)

    def test_oov_bounded_by_tokens(self):
        from pdf_extractor_ray.pipelines.textops import oov_rate_documents

        got = oov_rate_documents(SF_DIR).to_pandas()
        assert (got["n_oov"] <= got["n_tokens"]).all()


class TestCrawlBudget:
    def test_quotas_sum_exactly_and_hamilton_rule(self):
        from pdf_extractor_ray.pipelines.urlops import (
            CRAWL_BUDGET_TOTAL,
            crawl_budget_documents,
        )

        got = crawl_budget_documents(SF_DIR).to_pandas()
        assert got["quota"].sum() == CRAWL_BUDGET_TOTAL  # exact, not ±rounding
        w = got["n_tokens"].to_numpy(np.int64)
        total = int(w.sum())
        floors = (CRAWL_BUDGET_TOTAL * w) // total
        assert ((got["quota"].to_numpy() - floors) <= 1).all()
        assert ((got["quota"].to_numpy() - floors) >= 0).all()
        # bonus goes to the largest remainders (host asc tie-break)
        rem = (CRAWL_BUDGET_TOTAL * w) % total
        leftover = CRAWL_BUDGET_TOTAL - int(floors.sum())
        order = np.lexsort((got["host"].to_numpy(), -rem))
        want_bonus = np.zeros(len(w), np.int64)
        want_bonus[order[:leftover]] = 1
        assert (got["quota"].to_numpy() - floors == want_bonus).all()


class TestDanglingLinks:
    def test_matches_edge_arithmetic(self):
        from pdf_extractor_ray.pipelines.graph import dangling_links_documents

        got = dangling_links_documents(SF_DIR).to_pandas().set_index("doc_id")
        ids = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        members = set(int(v) for v in ids)
        for d in members:
            outdeg = 1 + d % 3
            dangling = sum(
                1
                for i in range(1, outdeg + 1)
                if ((d - d % 10) + ((d + 3 * i) % 10)) not in members
            )
            assert got.loc[d, "n_links"] == outdeg
            assert got.loc[d, "n_dangling"] == dangling
        # dense test ids fill every block: the corpus has ZERO dangling
        # edges, so this pins the anti-join's no-false-positive side
        assert got["n_dangling"].sum() == 0

    def test_planted_dangling_edges(self):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import dangling_links

        edges = ray.data.from_pandas(
            pd.DataFrame(
                {"src": [1, 1, 2, 3, 3, 3], "dst": [2, 99, 1, 98, 97, 1]}
            ).astype(np.int64)
        )
        members = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1, 2, 3]}).astype(np.int64)
        )
        got = (
            dangling_links(edges, members)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert got["n_links"].to_dict() == {1: 2, 2: 1, 3: 3}
        assert got["n_dangling"].to_dict() == {1: 1, 2: 0, 3: 2}
