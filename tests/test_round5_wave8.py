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


class TestWarcMime:
    def test_content_type_parse(self):
        from pdf_extractor_ray.sources.warc import build_warc, parse_warc

        raw = build_warc(
            [
                {"url": "u1", "ts": "t", "body": b"x", "content_type": "Application/PDF"},
                {"url": "u2", "ts": "t", "body": b"y", "content_type": "text/html; charset=UTF-8"},
                {"url": "u3", "ts": "t", "body": b"z"},
            ]
        )
        recs = parse_warc(raw)
        assert [r["mime"] for r in recs] == ["application/pdf", "text/html", "text/html"]
        # bodies untouched by header parsing
        assert [r["body"] for r in recs] == [b"x", b"y", b"z"]


def _ref_cdc_boundaries(data: bytes, avg_bits: int, min_len: int, max_len: int) -> list[int]:
    """Independent scalar replica with CLASSIC reset-per-chunk
    semantics: h = (h<<1) + GEAR[b] restarted at every chunk start.
    With min_len >= 64 this must equal the kernel's windowed no-reset
    formulation exactly (the equivalence the kernel docstring claims)."""
    from pdf_extractor_ray.kernels.cdc import GEAR

    n = len(data)
    mask = (1 << avg_bits) - 1
    ends = []
    start = 0
    while start < n:
        h = 0
        end = min(start + max_len, n)
        cut = end
        for i in range(start, end):
            h = ((h << 1) + int(GEAR[data[i]])) & 0xFFFFFFFFFFFFFFFF
            if i + 1 - start >= min_len and (h & mask) == 0:
                cut = i + 1
                break
        ends.append(cut)
        start = cut
    return ends


class TestCdcKernel:
    PARAMS = dict(avg_bits=6, min_len=64, max_len=512)

    def test_matches_reset_semantics_replica(self):
        import random

        from pdf_extractor_ray.kernels.cdc import cdc_boundaries

        rng = random.Random(7)
        for trial in range(20):
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 4000)))
            got = cdc_boundaries(data, **self.PARAMS)
            assert got == _ref_cdc_boundaries(data, 6, 64, 512), f"trial {trial}"

    def test_bounds_and_coverage(self):
        import random

        from pdf_extractor_ray.kernels.cdc import cdc_boundaries

        rng = random.Random(11)
        data = bytes(rng.randrange(256) for _ in range(10_000))
        ends = cdc_boundaries(data, **self.PARAMS)
        assert ends[-1] == len(data)
        prev = 0
        for e in ends[:-1]:  # all but the final (may be short) chunk
            assert 64 <= e - prev <= 512
            prev = e
        # constant-byte region (never hits the mask … or always does):
        # max_len force-cuts keep chunks bounded either way
        ends2 = cdc_boundaries(b"\x00" * 5000, **self.PARAMS)
        prev = 0
        for e in ends2:
            assert e - prev <= 512
            prev = e

    def test_resync_property(self):
        """Prepending bytes only perturbs chunking locally: chunk
        hashes of the shared suffix re-align — THE property that makes
        CDC find duplicated regions at different offsets."""
        import random

        from pdf_extractor_ray.kernels.cdc import cdc_chunks

        rng = random.Random(23)
        shared = bytes(rng.randrange(256) for _ in range(6000))
        prefix = bytes(rng.randrange(256) for _ in range(777))
        a = {h for (_s, _l, h) in cdc_chunks(shared, **self.PARAMS)}
        b = {h for (_s, _l, h) in cdc_chunks(prefix + shared, **self.PARAMS)}
        # the tail of `shared` must chunk identically in both
        common = a & b
        assert len(common) >= len(a) // 2

    def test_param_validation(self):
        import pytest

        from pdf_extractor_ray.kernels.cdc import cdc_boundaries

        with pytest.raises(ValueError):
            cdc_boundaries(b"x" * 100, min_len=32)
        with pytest.raises(ValueError):
            cdc_boundaries(b"x" * 100, min_len=256, max_len=128)
        assert cdc_boundaries(b"") == []


class TestCdcPipeline:
    def test_chunks_cover_and_stats_consistent(self):
        import hashlib

        import pyarrow.parquet as pq

        from pdf_extractor_ray.pipelines.dedup import _CDC_TAIL, cdc_chunks_documents, cdc_dedup_stats

        chunks = cdc_chunks_documents(SF_DIR).to_pandas()
        docs = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
        # coverage: per-doc chunk lengths sum to the derived byte length
        got = chunks.groupby("doc_id")["length"].sum()
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            assert got[doc_id] == len((text + _CDC_TAIL).encode("utf-8"))
        # chunk hash of the first doc's first chunk recomputes
        r0 = chunks.sort_values(["doc_id", "chunk_idx"]).iloc[0]
        data0 = (docs.set_index("doc_id")["text"][r0["doc_id"]] + _CDC_TAIL).encode("utf-8")
        seg = data0[r0["start"] : r0["start"] + r0["length"]]
        assert hashlib.blake2b(seg, digest_size=8).hexdigest() == r0["chunk_hash"]

        stats = cdc_dedup_stats(SF_DIR).to_pandas().iloc[0]
        # brute-force replica of the stats over the chunk table
        per_hash = chunks.groupby("chunk_hash").agg(n=("length", "size"), bytes_sum=("length", "sum"), length=("length", "max"))
        assert stats["n_chunks"] == len(chunks)
        assert stats["n_distinct_chunks"] == len(per_hash)
        assert stats["total_bytes"] == int(per_hash["bytes_sum"].sum())
        assert stats["distinct_bytes"] == int(per_hash["length"].sum())
        # the shared licence tail guarantees real cross-doc duplication
        assert stats["dup_byte_per_milli"] > 100


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
