"""Round-5 wave-11 operator tests.

Meta-refresh kernel, paginated-series concatenation, outlink host
diversity, canonical-declaration dedup. Ray session comes from the
shared session fixture in conftest.py.
"""

from __future__ import annotations

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


class TestMetaRefreshKernel:
    def test_variants(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_meta_refresh as f

        assert f(b'<meta HTTP-EQUIV=Refresh content="0; URL=https://x/1">') == (
            0,
            "https://x/1",
        )
        assert f(b"<meta http-equiv='refresh' content='5;url=/next'>") == (5, "/next")
        assert f(b'<meta http-equiv=refresh content="7 ; URL = \'/q\' ">') == (7, "/q")
        # bare reload: secs only, no redirect url
        assert f(b"<meta http-equiv=refresh content=30>") == (30, None)
        # malformed content → unusable
        assert f(b'<meta http-equiv=refresh content="soon;url=/x">') == (None, None)
        # wrong http-equiv is not a refresh
        assert f(b'<meta http-equiv=content-type content="text/html">') == (None, None)
        # first wins
        assert f(
            b'<meta http-equiv=refresh content="1; url=/a">'
            b'<meta http-equiv=refresh content="2; url=/b">'
        ) == (1, "/a")

    def test_rawtext_skipped(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_meta_refresh as f

        raw = (
            b"<script>document.write('<meta http-equiv=refresh content=\"0;url=/fake\">')</script>"
            b'<meta http-equiv=refresh content="3; url=/real">'
        )
        assert f(raw) == (3, "/real")


class TestSeriesConcat:
    def test_order_and_membership(self):
        import pyarrow.parquet as pq

        from pdf_extractor_ray.pipelines.webdocs import series_concat_documents

        got = series_concat_documents(SF_DIR).to_pandas().set_index("series_head")
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas().set_index("doc_id")
        # spot-check one full series: pages 10..14 in id order
        want = "\n".join(docs.loc[i, "text"] for i in range(10, 15))
        assert got.loc[10, "series_text"] == want
        assert got.loc[10, "n_pages"] == 5
        # every head is a multiple of 5 and page counts cover the corpus
        assert (got.index % 5 == 0).all()
        assert got["n_pages"].sum() == len(docs)


class TestMetaRefreshPipeline:
    def test_only_usable_refreshes_emit(self):
        from pdf_extractor_ray.pipelines.webdocs import meta_refresh_documents

        got = meta_refresh_documents(SF_DIR).to_pandas()
        assert (got["doc_id"] % 5 == 2).all()  # self-reloads + malformed dropped
        assert (got["refresh_secs"] == 0).all()


class TestOutlinkDiversity:
    def test_sidebar_excluded_and_collision_ids(self):
        from pdf_extractor_ray.pipelines.webdocs import outlink_diversity_documents

        got = outlink_diversity_documents(SF_DIR).to_pandas().set_index("doc_id")
        # even docs: exactly one main link; sidebar link must not count
        assert (got.loc[got.index % 2 == 0, "n_links"] == 1).all()
        # d ≡ 10 (mod 13), odd: both links hit the SAME host (4d ≡ 1 mod 13)
        ten = got[(got.index % 13 == 10) & (got.index % 2 == 1)]
        assert (ten["n_hosts"] == 1).all() and (ten["n_links"] == 2).all()
        # d ≡ 0 (mod 13): first link is self-host → not external
        zero = got[(got.index % 13 == 0) & (got.index % 2 == 0)]
        assert (zero["n_external"] == 0).all()


class TestCanonicalDedup:
    def test_survivors(self):
        from pdf_extractor_ray.pipelines.webdocs import canonical_dedup_documents

        got = canonical_dedup_documents(SF_DIR).to_pandas()
        by_key = got.set_index("canonical_key")["doc_id"]
        assert by_key.index.is_unique
        # group head survives for the declared groups; a % 9 == 0 doc
        # inside a group survives SEPARATELY under its own url
        ids = set(got["doc_id"])
        assert 0 in ids          # head of group 0 (also % 9 == 0)
        assert 9 in ids          # 9 % 9 == 0 → self-representative
        assert 8 in ids and 10 not in ids  # 10 declares head 8
