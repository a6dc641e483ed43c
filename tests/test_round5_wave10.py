"""Round-5 wave-10 operator tests.

rel-nav pagination harvest + series reassembly, robots-meta
directives, recrawl-priority tiers, per-host mirrored-content ratio.
Ray session comes from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import pandas as pd
import ray

SF_DIR = "/root/testdata/sf0.001"


class TestRelNavKernel:
    def test_token_list_case_and_first_wins(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_relnav

        raw = (
            b"<html><head>"
            b'<link rel="PREV nofollow" href="/p1">'
            b"<link rel=next href=/p3>"
            b'<link rel="prev" href="/late-decoy">'
            b'<link rel="search" href="/os.xml">'
            b"</head><body>"
            b'<a rel="next" href="/anchor-decoy">x</a>'
            b"</body></html>"
        )
        assert html_extract_relnav(raw) == {"next": "/p3", "prev": "/p1"}

    def test_absent_and_hrefless(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_relnav

        assert html_extract_relnav(b"<html><body>hi</body></html>") == {
            "next": None,
            "prev": None,
        }
        # a rel=next link with no href must not claim the slot
        raw = b'<link rel="next"><link rel="next" href="/real">'
        assert html_extract_relnav(raw)["next"] == "/real"

    def test_rawtext_skipped(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_relnav

        raw = b'<script>var x = \'<link rel="prev" href="/fake">\';</script><link rel=prev href=/real>'
        assert html_extract_relnav(raw)["prev"] == "/real"


class TestRobotsMetaKernel:
    def test_tokens_case_none_firstwins(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_robots_meta

        f = html_extract_robots_meta
        assert f(b'<meta NAME=ROBOTS content=" NOINDEX , noarchive">') == {
            "noindex": True,
            "nofollow": False,
        }
        assert f(b"<meta name=robots content=none>") == {"noindex": True, "nofollow": True}
        # first robots meta wins over a later conflicting one
        assert f(
            b'<meta name="robots" content="all"><meta name=robots content=noindex>'
        ) == {"noindex": False, "nofollow": False}
        # name= keyed only; property= is not a robots meta
        assert f(b'<meta property="robots" content="noindex">') == {
            "noindex": False,
            "nofollow": False,
        }

    def test_empty_content(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_robots_meta

        assert html_extract_robots_meta(b'<meta name=robots content="">') == {
            "noindex": False,
            "nofollow": False,
        }


class TestPaginationSeries:
    def test_series_structure(self):
        from pdf_extractor_ray.pipelines.webdocs import pagination_series_documents

        got = pagination_series_documents(SF_DIR).to_pandas()
        assert (got["series_head"] == got["doc_id"] - got["doc_id"] % 5).all()
        assert (got["page_index"] == got["doc_id"] % 5).all()

    def test_decoys_present_in_raw(self):
        from pdf_extractor_ray.pipelines.webdocs import derive_paginated_pages

        b = pd.DataFrame({"doc_id": [7], "text": ["x"]})
        raw = bytes(derive_paginated_pages(b)["page"][0])
        assert b'<a rel="prev"' in raw and b'rel="search"' in raw


class TestRecrawlPriority:
    def test_tiers(self):
        from pdf_extractor_ray.pipelines.webdocs import recrawl_priority_documents

        got = recrawl_priority_documents(SF_DIR).to_pandas()
        ids = got["url"].str.rsplit("/", n=1).str[1].astype(int)
        # odd ids never change content → cold regardless of fetch count
        assert (got.loc[(ids % 2 == 1).values, "tier"] == "cold").all()
        # even ids with 3 snapshots (id%3==2) change twice → hot
        hot = got[(ids % 2 == 0).values & (ids % 3 == 2).values]
        assert (hot["tier"] == "hot").all() and (hot["n_changes"] == 2).all()


class TestHostDupRatio:
    def test_brute_force_replica(self):
        from pdf_extractor_ray.pipelines.dedup import host_dup_ratio

        rows = [
            ("a", "t1"), ("b", "t1"),          # mirrored pair
            ("a", "t2"),                        # unique to a
            ("a", "t3"), ("a", "t3"),          # within-host dup: NOT mirrored
            ("c", "t4"),
        ]
        corpus = ray.data.from_pandas(pd.DataFrame(rows, columns=["host", "text"]))
        got = host_dup_ratio(corpus).to_pandas().set_index("host").sort_index()
        assert got.loc["a", "n_docs"] == 4 and got.loc["a", "n_mirrored"] == 1
        assert got.loc["a", "mirrored_per_milli"] == 250
        assert got.loc["b", "n_mirrored"] == 1
        assert got.loc["c", "n_mirrored"] == 0

    def test_boilerplate_counts_as_mirrored(self):
        """Unlike mirror_hosts' capped pair fan-out, the per-host ratio
        counts widely-shared content — each ToS row makes its host 1
        doc more mirrored, with one joined row per (hash, host)."""
        from pdf_extractor_ray.pipelines.dedup import host_dup_ratio

        rows = [(f"h{k}", "TOS") for k in range(6)] + [("h0", "solo")]
        corpus = ray.data.from_pandas(pd.DataFrame(rows, columns=["host", "text"]))
        got = host_dup_ratio(corpus).to_pandas().set_index("host")
        assert got.loc["h0", "n_docs"] == 2 and got.loc["h0", "n_mirrored"] == 1
        assert (got.drop(index="h0")["mirrored_per_milli"] == 1000).all()
