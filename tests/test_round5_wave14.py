"""Round-5 wave-14 operator tests.

DOM shape stats kernel + carrier, CSV source round-trip, token-budget
shard assignment, query-param incidence. Ray session comes from the
shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestDomStatsKernel:
    def test_script_content_never_tokenizes(self):
        from pdf_extractor_ray.kernels.html_extract import html_dom_stats as f

        r = f(b'<html><body><script>var s="<div><div><p>"</script></body></html>')
        assert r == {"n_nodes": 3, "max_depth": 3, "n_p": 0, "n_a": 0}

    def test_void_and_selfclosed_count_but_dont_push(self):
        from pdf_extractor_ray.kernels.html_extract import html_dom_stats as f

        r = f(b"<html><body><br><img src=x><iframe/></body></html>")
        assert r["n_nodes"] == 5
        assert r["max_depth"] == 2

    def test_stray_close_and_mismatched_nesting(self):
        from pdf_extractor_ray.kernels.html_extract import html_dom_stats as f

        # </span> with no open span is ignored; </div> pops through <b>
        r = f(b"<html><body></span><div><b>x</div></body></html>")
        assert r["n_nodes"] == 4
        assert r["max_depth"] == 4

    def test_truncated_and_empty(self):
        from pdf_extractor_ray.kernels.html_extract import html_dom_stats as f

        assert f(b"")["n_nodes"] == 0
        assert f(b"<html><div")["n_nodes"] >= 1  # best effort, no crash


class TestDomStatsCarrier:
    def test_matches_arithmetic(self):
        from pdf_extractor_ray.pipelines.webdocs import dom_stats_documents

        got = dom_stats_documents(SF_DIR).to_pandas().set_index("doc_id")
        d = got.index.to_numpy(np.int64)
        assert (got["max_depth"].to_numpy() == 5 + d % 7).all()
        assert (got["n_p"].to_numpy() == 1 + d % 4).all()
        assert (got["n_a"].to_numpy() == d % 3).all()
        assert (got["n_nodes"].to_numpy() == 7 + d % 7 + d % 4 + d % 3).all()


class TestReadCsv:
    def test_round_trip_values(self):
        from pdf_extractor_ray.pipelines.webdocs import read_csv_documents

        got = (
            read_csv_documents(SF_DIR)
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
        pd.testing.assert_frame_equal(got[["doc_id", "lang", "text"]], want)

    def test_types_pinned_not_inferred(self):
        from pdf_extractor_ray.pipelines.webdocs import read_csv_documents

        df = read_csv_documents(SF_DIR).to_pandas()
        assert df["doc_id"].dtype == np.int64
        assert df["lang"].dtype == object
        assert df["text"].dtype == object


class TestShardAssignment:
    def test_matches_sequential_scan(self):
        from pdf_extractor_ray.pipelines.corpus import (
            SHARD_TOKEN_BUDGET,
            shard_assignment_documents,
        )

        got = (
            shard_assignment_documents(SF_DIR)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = (
            pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        n = docs["text"].str.split().str.len().to_numpy(np.int64)
        cum_excl = np.concatenate([[0], np.cumsum(n)[:-1]])
        assert (got["n_tokens"].to_numpy() == n).all()
        assert (got["shard_id"].to_numpy() == cum_excl // SHARD_TOKEN_BUDGET).all()
        # shards are contiguous in doc order and non-decreasing
        assert (np.diff(got["shard_id"].to_numpy()) >= 0).all()

    def test_no_doc_split_and_budget_roughly_held(self):
        from pdf_extractor_ray.pipelines.corpus import (
            SHARD_TOKEN_BUDGET,
            shard_assignment_documents,
        )

        got = shard_assignment_documents(SF_DIR).to_pandas()
        per = got.groupby("shard_id")["n_tokens"].sum()
        # every full shard starts within budget of its boundary: shard
        # total < budget + max single doc
        assert (per.to_numpy() < SHARD_TOKEN_BUDGET + got["n_tokens"].max()).all()


class TestUrlParamStats:
    def test_counts_replay_arithmetic(self):
        from pdf_extractor_ray.pipelines.urlops import url_param_stats

        got = url_param_stats(SF_DIR).to_pandas()
        ids = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        page = got[got["param"] == "page"]
        assert page["n"].sum() == len(ids)
        utm = got[got["param"] == "utm_source"]
        assert utm["n"].sum() == int((ids % 2 == 0).sum())
        flag = got[got["param"] == "flag"]  # bare flag param still counts
        assert flag["n"].sum() == int((ids % 11 == 0).sum())
        # param NAMES only — no '=' or values leak through
        assert not got["param"].str.contains("=").any()
