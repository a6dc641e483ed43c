"""Round-5 wave-13 operator tests.

k-core peel, one-hop quality smoothing, host churn rollup, df-ratio
stopword discovery. Ray session comes from the shared session fixture
in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _edges() -> set[tuple[int, int]]:
    d = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    out = set()
    for i in (1, 2, 3):
        for s in d[d % 3 >= i - 1]:
            out.add((int(s), int((s - s % 10) + ((s + 3 * i) % 10))))
    return out


def _peel(edges: set, k: int) -> dict[int, int]:
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, c in deg.items() if c >= k}
        ne = {(a, b) for a, b in edges if a in keep and b in keep}
        if ne == edges:
            break
        edges = ne
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


class TestKCore:
    def test_matches_sequential_peel(self):
        from pdf_extractor_ray.pipelines.graph import KCORE_K, kcore_documents

        got = kcore_documents(SF_DIR).to_pandas().set_index("node")["deg"].to_dict()
        want = _peel(_edges(), KCORE_K)
        assert got == want
        assert all(v >= KCORE_K for v in got.values())

    def test_k_too_high_returns_empty_typed(self):
        import ray.data

        from pdf_extractor_ray.pipelines.graph import document_link_edges, kcore

        out = kcore(document_link_edges(SF_DIR), k=1000)
        # Ray 2.49 to_pandas() drops columns at zero rows; the DATASET
        # schema is the contract
        assert out.schema().names == ["node", "deg"]
        assert out.count() == 0

    def test_k2_is_whole_graph(self):
        # every node in the derived graph already has degree >= 2
        from pdf_extractor_ray.pipelines.graph import document_link_edges, kcore

        got = kcore(document_link_edges(SF_DIR), k=2).to_pandas()
        want = _peel(_edges(), 2)
        assert len(got) == len(want)


class TestQualitySmooth:
    def test_matches_sequential_replica(self):
        from pdf_extractor_ray.pipelines.graph import quality_smooth_documents

        got = (
            quality_smooth_documents(SF_DIR)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "n_chars"]
        ).to_pandas().set_index("doc_id")
        q = docs["n_chars"].to_dict()
        sums = {d: 0 for d in q}
        cnts = {d: 0 for d in q}
        for s, t in _edges():
            if t in q:
                sums[t] += q[s]
                cnts[t] += 1
        for d in q:
            assert got.loc[d, "q_chars"] == q[d]
            assert got.loc[d, "q_smooth"] == (q[d] + sums[d]) // (1 + cnts[d])
        # dangling link targets (past the corpus edge) never appear
        assert set(got.index) == set(q)


class TestHostChurn:
    def test_rollup_consistency(self):
        from pdf_extractor_ray.pipelines.webdocs import (
            host_churn_documents,
            snapshot_diff_documents,
        )

        got = host_churn_documents(SF_DIR).to_pandas().set_index("host")
        diff = snapshot_diff_documents(SF_DIR).to_pandas()
        ids = diff["url"].str.rsplit("/", n=1).str[1].astype(np.int64)
        diff["host"] = "h" + (ids % 13).astype(str) + ".example.org"
        for host, sub in diff.groupby("host"):
            n, ch = len(sub), int((sub["status"] == "changed").sum())
            assert got.loc[host, "n_urls"] == n
            assert got.loc[host, "n_changed"] == ch
            assert got.loc[host, "churn_milli"] == (1000 * ch) // n


class TestStopwordDiscovery:
    def test_threshold_and_df_exactness(self):
        from pdf_extractor_ray.pipelines.textops import (
            STOPWORD_DF_MILLI,
            stopword_discovery_documents,
        )

        got = stopword_discovery_documents(SF_DIR).to_pandas().set_index("token")
        docs = pq.read_table(SF_DIR + "/documents.parquet", columns=["text"]).to_pandas()
        n = len(docs)
        df: dict[str, int] = {}
        for t in docs["text"]:
            for w in set(t.split()):
                df[w] = df.get(w, 0) + 1
        want = {
            w: c for w, c in df.items() if (1000 * c) // n >= STOPWORD_DF_MILLI
        }
        assert got["df"].to_dict() == want
        assert (got["df_milli"] >= STOPWORD_DF_MILLI).all()
        # a repeated token inside ONE document counts once
        assert got["df"].max() <= n
