"""Round-5 wave-9 operator tests.

Redirect-chain resolution (pointer jumping), soft-404 detection through
the real WARC + HTML-extraction path, mirror-host detection, and the
exact-dup cluster-size histogram. Ray session comes from the shared
session fixture in conftest.py.
"""

from __future__ import annotations

import pandas as pd
import pytest
import ray

SF_DIR = "/root/testdata/sf0.001"


def _ptr(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["node", "nxt", "hops"]).astype("int64")
    )


class TestResolvePointers:
    def test_chain_and_terminals(self):
        from pdf_extractor_ray.pipelines.graph import resolve_pointers

        # 5→4→3→2→1→0 (terminal), 10 isolated terminal
        rows = [(i, i - 1, 1) for i in range(1, 6)] + [(0, 0, 0), (10, 10, 0)]
        got = (
            resolve_pointers(_ptr(rows))
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert got["nxt"].tolist() == [0] * 6 + [10]
        assert got["hops"].tolist() == [0, 1, 2, 3, 4, 5, 0]

    def test_long_chain_log_rounds(self):
        from pdf_extractor_ray.pipelines.graph import resolve_pointers

        n = 300  # needs ⌈log2 300⌉ = 9 doubling rounds, well under 30
        rows = [(i, i - 1, 1) for i in range(1, n)] + [(0, 0, 0)]
        got = resolve_pointers(_ptr(rows)).to_pandas()
        assert (got["nxt"] == 0).all()
        assert got.set_index("node")["hops"][n - 1] == n - 1

    def test_cycle_raises(self):
        from pdf_extractor_ray.pipelines.graph import resolve_pointers

        rows = [(1, 2, 1), (2, 1, 1)]
        with pytest.raises(RuntimeError, match="cycle|unresolved"):
            resolve_pointers(_ptr(rows), max_rounds=6)

    def test_all_terminal_zero_rounds(self):
        from pdf_extractor_ray.pipelines.graph import resolve_pointers

        rows = [(i, i, 0) for i in range(5)]
        got = resolve_pointers(_ptr(rows)).to_pandas().sort_values("node")
        assert got["nxt"].tolist() == list(range(5))
        assert got["hops"].sum() == 0


class TestSoft404:
    def test_status_gate_and_decoy(self):
        """Hard 404s (doc_id % 7 == 0) never appear; the nav-embedded
        'page not found' decoy on normal pages never flags; exactly the
        planted soft-404 ids flag."""
        from pdf_extractor_ray.pipelines.webdocs import soft404_documents

        got = soft404_documents(SF_DIR).to_pandas()
        ids = got["url"].str.rsplit("/", n=1).str[1].astype(int)
        assert not (ids % 7 == 0).any()  # hard 404s gated out
        flagged = set(ids[got["soft404"] == 1])
        expected = {i for i in ids if i % 6 == 0}  # %7 ids already absent
        assert flagged == expected

    def test_classifier_reads_extracted_text(self):
        """A raw-HTML classifier would flag the nav decoy — prove the
        phrase is present in the WARC bytes of an unflagged page."""
        from pdf_extractor_ray.pipelines.webdocs import derive_soft404_slices

        b = pd.DataFrame({"doc_id": [1], "text": ["ordinary words here"]})
        raw = bytes(derive_soft404_slices(b)["warc"][0])
        assert b"not found" in raw  # decoy IS in the raw bytes
        # and doc 1 (not %6, not %7) is unflagged per the pipeline test


class TestMirrorHosts:
    def _corpus(self, rows):
        return ray.data.from_pandas(pd.DataFrame(rows, columns=["host", "text"]))

    def test_boilerplate_cap_drops_wide_hashes(self):
        from pdf_extractor_ray.pipelines.dedup import mirror_hosts

        rows = [(f"h{k}", "UNIVERSAL FOOTER") for k in range(6)]  # 6 hosts > cap 5
        rows += [("a", "doc x"), ("b", "doc x")]  # genuine mirror pair
        got = mirror_hosts(self._corpus(rows), max_hosts=5).to_pandas()
        assert got[["host_a", "host_b"]].values.tolist() == [["a", "b"]]
        assert got["n_shared"].tolist() == [1]

    def test_min_shared_filter_and_dup_rows(self):
        from pdf_extractor_ray.pipelines.dedup import mirror_hosts

        rows = [("a", "t1"), ("b", "t1"), ("a", "t1"),  # duplicate row: distinct() dedups
                ("a", "t2"), ("b", "t2"),
                ("a", "t3"), ("c", "t3")]
        got = (
            mirror_hosts(self._corpus(rows), min_shared=2)
            .to_pandas()
            .sort_values(["host_a", "host_b"])
        )
        assert got[["host_a", "host_b"]].values.tolist() == [["a", "b"]]
        assert got["n_shared"].tolist() == [2]

    def test_three_way_mirror_emits_all_pairs(self):
        from pdf_extractor_ray.pipelines.dedup import mirror_hosts

        rows = [("a", "t"), ("b", "t"), ("c", "t")]
        got = mirror_hosts(self._corpus(rows)).to_pandas().sort_values(["host_a", "host_b"])
        assert got[["host_a", "host_b"]].values.tolist() == [["a", "b"], ["a", "c"], ["b", "c"]]


class TestDupClusterSizes:
    def test_brute_force_replica(self):
        from pdf_extractor_ray.pipelines.dedup import dup_cluster_sizes

        texts = ["a", "b", "a", "c", "a", "b", "d"]
        corpus = ray.data.from_pandas(
            pd.DataFrame({"host": ["h"] * len(texts), "text": texts})
        )
        got = dup_cluster_sizes(corpus).to_pandas().sort_values("cluster_size")
        sizes = pd.Series(texts).value_counts()
        want = sizes.value_counts().sort_index()  # {1: 2, 2: 1, 3: 1}
        assert got["cluster_size"].tolist() == want.index.tolist()
        assert got["n_clusters"].tolist() == want.values.tolist()

    def test_carrier_has_planted_structure(self):
        from pdf_extractor_ray.pipelines.dedup import dup_cluster_sizes_documents

        got = dup_cluster_sizes_documents(SF_DIR).to_pandas().set_index("cluster_size")
        # singletons, the %3 mirror pairs, and exactly one 7-host ToS cluster
        assert got.loc[2, "n_clusters"] > 0
        assert got.loc[7, "n_clusters"] == 1
