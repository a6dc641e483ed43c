"""Round-5 wave-30: microdata walker, embedded-resource audit,
per-user running totals, token-set containment pairs.

Oracle parity for the four new queries is covered automatically by
tests/test_oracle_parity.py; these tests pin the kernel-level edge
cases the SQL derivation can't see (tag soup, decoy isolation, EOF
close, value-channel selection) plus the zero-shuffle plan shape of
the two extraction carriers.
"""

from __future__ import annotations

import pytest

from pdf_extractor_ray.kernels.html_extract import (
    html_extract_microdata,
    html_extract_resources,
)

SF_DIR = "/root/testdata/sf0.001"


class TestMicrodataKernel:
    def test_value_channels(self):
        page = (
            b'<div itemscope itemtype="https://schema.org/Article">'
            b'<h1 itemprop="headline">Real <b>Title</b></h1>'
            b'<meta itemprop="datePublished" content="2024-01-05">'
            b'<a itemprop="url" href="/a/7">read</a>'
            b'<time itemprop="dateModified" datetime="2024-02-01">Feb 1</time>'
            b'<data itemprop="rank" value="3">third</data>'
            b'<img itemprop="image" src="/i.png">'
            b"</div>"
        )
        items = html_extract_microdata(page)
        assert len(items) == 1
        p = items[0]["props"]
        assert items[0]["itemtype"] == "https://schema.org/Article"
        assert p["headline"] == "Real Title"  # descendant text captured
        assert p["datePublished"] == "2024-01-05"  # meta → content
        assert p["url"] == "/a/7"  # a → href
        assert p["dateModified"] == "2024-02-01"  # time → datetime
        assert p["rank"] == "3"  # data → value
        assert p["image"] == "/i.png"  # img → src

    def test_decoys_ignored(self):
        page = (
            b'<span itemprop="headline">OUTSIDE any scope</span>'
            b'<div itemscope><span itemprop="k">first</span>'
            b'<span itemprop="k">second decoy</span></div>'
        )
        items = html_extract_microdata(page)
        assert len(items) == 1
        assert items[0]["props"] == {"k": "first"}  # first-occurrence wins

    def test_nested_item_isolation(self):
        page = (
            b'<div itemscope itemtype="T">'
            b'<div itemprop="author" itemscope itemtype="P">'
            b'<span itemprop="name">alice</span>'
            b'<span itemprop="headline">nested decoy</span></div>'
            b'<span itemprop="headline">outer real</span></div>'
        )
        (item,) = html_extract_microdata(page)
        assert item["props"]["headline"] == "outer real"
        assert item["props"]["author"]["props"]["name"] == "alice"
        assert item["props"]["author"]["props"]["headline"] == "nested decoy"

    def test_eof_closes_open_elements(self):
        page = b'<div itemscope><span itemprop="k">dangling text'
        (item,) = html_extract_microdata(page)
        assert item["props"] == {"k": "dangling text"}

    def test_multi_name_itemprop_and_entities(self):
        page = b'<div itemscope><span itemprop="a b">x &amp; y</span></div>'
        (item,) = html_extract_microdata(page)
        assert item["props"] == {"a": "x & y", "b": "x & y"}

    def test_unmatched_close_is_lenient(self):
        page = b'</p><div itemscope><span itemprop="k">v</span></em></div>'
        (item,) = html_extract_microdata(page)
        assert item["props"]["k"] == "v"

    def test_two_top_level_items_in_order(self):
        page = b'<p itemscope itemtype="A"></p><p itemscope itemtype="B"></p>'
        items = html_extract_microdata(page)
        assert [i["itemtype"] for i in items] == ["A", "B"]

    def test_script_body_never_fabricates(self):
        page = (
            b'<div itemscope><script>var s = "<span itemprop=\'x\'>evil</span>";</script>'
            b'<span itemprop="k">ok</span></div>'
        )
        (item,) = html_extract_microdata(page)
        assert item["props"] == {"k": "ok"}


class TestResourcesKernel:
    def test_inline_script_skipped(self):
        page = (
            b'<script>var decoy = "</iframe><iframe src=\'https://evil.example/x\'>";</script>'
            b'<script src="https://cdn.example/a.js"></script>'
            b'<iframe src="/w/1"></iframe>'
            b'<embed src="/e.swf"><object data="/o.svg"></object>'
        )
        res = html_extract_resources(page)
        assert res == [
            ("script", "https://cdn.example/a.js"),
            ("iframe", "/w/1"),
            ("embed", "/e.swf"),
            ("object", "/o.svg"),
        ]

    def test_srcless_tags_skipped(self):
        assert html_extract_resources(b"<iframe></iframeob><script></script>") == []


@pytest.mark.parametrize(
    "name",
    ["extract_microdata_documents", "embedded_resources_documents"],
)
def test_extraction_carrier_plan_is_shuffle_free(name):
    from pdf_extractor_ray.pipelines import webdocs

    ds = getattr(webdocs, name)(SF_DIR)
    ds.take(5)
    stats = ds.stats()
    for marker in ("AllToAll", "Sort", "Aggregate", "Join", "shuffle"):
        assert marker not in stats, f"{name} plan gained a {marker} stage:\n{stats[:500]}"


def test_containment_empty_src_excluded_empty_dst_zero():
    """A src with an empty token set emits no pair; an empty dst gives
    containment 0 — both directions of the ∅ edge case."""
    from pdf_extractor_ray.pipelines import dedup

    df = dedup.containment_pairs(SF_DIR).to_pandas().set_index("src")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    empties = set(docs.loc[[not t.strip() for t in docs["text"]], "doc_id"])
    if empties:
        assert not (set(df.index) & empties)
        prevs = {e - 1 for e in empties} & set(df.index)
        for p in prevs:
            assert df.loc[p, "n_common"] == 0
            assert df.loc[p, "containment_micro"] == 0
    # self-containment sanity on one non-empty doc: containment of a
    # doc in itself would be 1e6; successive-doc containment is bounded
    assert (df["containment_micro"] <= 1_000_000).all()
    assert (df["n_common"] <= df["n_src_tokens"]).all()
