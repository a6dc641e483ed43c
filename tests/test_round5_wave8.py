"""Round-5 wave-8 operator tests (fourth session).

Covers the Open Graph harvest and the other wave-8 kernels/carriers.
Ray session comes from the shared session fixture in conftest.py.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


class TestHtmlExtractOpengraph:
    def test_property_vs_name_and_first_wins(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_opengraph

        raw = (
            b"<html><head>"
            b'<meta name="og:title" content="decoy name-keyed">'
            b'<meta property="og:title" content="A &amp;  B">'
            b'<meta property="og:title" content="second ignored">'
            b"<meta property='OG:Description' content='d  one'>"
            b'<meta property="og:image" content="https://i.example.com/1.jpg">'
            b'<meta property="og:unknown" content="ignored">'
            b"<meta property=og:type content=article>"
            b"</head></html>"
        )
        got = html_extract_opengraph(raw)
        assert got == {
            "og_title": "A & B",
            "og_description": "d one",
            "og_image": "https://i.example.com/1.jpg",
            "og_type": "article",
            "og_url": None,
        }

    def test_missing_and_empty(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_opengraph

        assert html_extract_opengraph(b"<p>x</p>") == {
            "og_title": None,
            "og_description": None,
            "og_image": None,
            "og_type": None,
            "og_url": None,
        }
        # empty content stays None; script payloads never parsed as tags
        raw = b'<script>var x = \'<meta property="og:title" content="in-script">\';</script>' b'<meta property="og:title" content="">'
        assert html_extract_opengraph(raw)["og_title"] is None


class TestHtmlExtractImages:
    def test_hint_model_and_caption_requirement(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_images

        raw = (
            b"<body>"
            b'<div id="content">'
            b'<img src="/a.png" alt="A &amp;  B">'
            b'<img src="/no-alt.png">'
            b'<img src="/empty.png" alt="">'
            b'<img alt="no src">'
            b"<IMG SRC=/bare.png ALT=bare>"
            b"</div>"
            b'<div class="sidebar"><img src="/logo.png" alt="logo"></div>'
            b'<img src="/after.png" alt="after sidebar closed">'
            b"</body>"
        )
        assert html_extract_images(raw) == [
            ("/a.png", "A & B"),
            ("/bare.png", "bare"),
            ("/after.png", "after sidebar closed"),
        ]

    def test_nested_demotion(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract_images

        # demotion inherited by descendants, ends at container close
        raw = (
            b'<div class="footer"><div><img src="/x.png" alt="x"></div></div>'
            b'<img src="/y.png" alt="y">'
        )
        assert html_extract_images(raw) == [("/y.png", "y")]


class TestWave8Carriers:
    def test_lang_mismatch_planted_and_shuffle_free(self):
        import pyarrow.parquet as pq

        from pdf_extractor_ray.pipelines.webdocs import lang_mismatch_documents

        ds = lang_mismatch_documents(SF_DIR)
        df = ds.to_pandas()
        n_docs = pq.read_metadata(SF_DIR + "/documents.parquet").num_rows
        assert len(df) == n_docs
        # every 7th doc declares 'xx' — guaranteed mismatch (detector
        # never emits 'xx')
        planted = df[df["doc_id"] % 7 == 0]
        assert (planted["declared_lang"] == "xx").all()
        assert (planted["declared_match"] == 0).all()
        stats = lang_mismatch_documents(SF_DIR).materialize().stats()
        for marker in ("AllToAll", "Sort", "Join"):
            assert marker not in stats

    def test_host_graph_edge_conservation(self):
        import pyarrow.parquet as pq

        from pdf_extractor_ray.pipelines.webdocs import host_graph_documents

        df = host_graph_documents(SF_DIR).to_pandas()
        t = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])
        ids = t.column("doc_id").to_pylist()
        # one edge per doc + one extra per odd doc; the sidebar decoy
        # (→ h0.example.com from every doc) must NOT appear as edges
        expect_edges = len(ids) + sum(1 for d in ids if d % 2 == 1)
        assert int(df["n_links"].sum()) == expect_edges
        assert set(df["src_host"].str.extract(r"^h(\d+)\.", expand=False).astype(int)) <= set(range(13))
