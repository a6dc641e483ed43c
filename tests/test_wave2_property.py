"""Property tests for the final-session operators: random graphs vs
brute-force replicas (BFS depth, triangle counts, reciprocal links)
and random corpora vs naive replicas (phrase search, sliding windows).
Dataset-level hypothesis tests use few, large examples — each example
spins several Ray stages."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=24
)


def _edges_ds(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": pd.Series([a for a, _ in pairs], dtype="int64"),
                "dst": pd.Series([b for _, b in pairs], dtype="int64"),
            }
        )
    )


@settings(max_examples=3, deadline=None)
@given(pairs=edges_strategy, seeds=st.sets(st.integers(0, 12), min_size=1, max_size=3))
def test_bfs_depth_matches_bruteforce(pairs, seeds):
    from pdf_extractor_ray.pipelines.graph import bfs_depth

    # brute-force BFS over the directed edge set
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    d = 0
    while frontier:
        d += 1
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = d
                    nxt.add(v)
        frontier = nxt

    seeds_ds = ray.data.from_pandas(
        pd.DataFrame({"node": pd.Series(sorted(seeds), dtype="int64")})
    )
    out = bfs_depth(_edges_ds(pairs), seeds_ds).to_pandas()
    assert dict(zip(out["node"], out["depth"])) == depth


@settings(max_examples=3, deadline=None)
@given(pairs=edges_strategy)
def test_triangle_counts_match_bruteforce(pairs):
    from pdf_extractor_ray.pipelines.graph import triangle_counts

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({n for e in und for n in e})
    expect: dict[int, int] = {}
    for t in itertools.combinations(nodes, 3):
        if (
            (t[0], t[1]) in und
            and (t[1], t[2]) in und
            and (t[0], t[2]) in und
        ):
            for n in t:
                expect[n] = expect.get(n, 0) + 1

    out = triangle_counts(_edges_ds(pairs)).to_pandas()
    if len(out) == 0:
        # Ray's to_pandas drops column schema at zero rows; an empty
        # frame is the correct empty result
        assert expect == {}
    else:
        assert dict(zip(out["node"], out["n_triangles"])) == expect


@settings(max_examples=3, deadline=None)
@given(pairs=edges_strategy)
def test_reciprocal_links_match_bruteforce(pairs):
    from pdf_extractor_ray.pipelines.graph import reciprocal_links

    dir_set = {(a, b) for a, b in pairs if a != b}
    expect = sorted(
        {(a, b) for a, b in dir_set if (b, a) in dir_set and a < b}
    )
    out = reciprocal_links(_edges_ds(pairs)).to_pandas()
    if len(out) == 0:
        assert expect == []
    else:
        assert sorted(zip(out["src"], out["dst"])) == expect


word = st.sampled_from(["a", "b", "ab", "x"])
doc = st.lists(word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=2, deadline=None)
@given(texts=st.lists(doc, min_size=1, max_size=12))
def test_phrase_and_sliding_match_naive(texts):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.pipelines.corpus import sliding_chunks_documents
    from pdf_extractor_ray.pipelines.search import phrase_search_documents

    phrase = ("a", "b")
    W, S = 32, 24
    with tempfile.TemporaryDirectory() as d:
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))

        got = (
            phrase_search_documents(d, phrase=phrase)
            .to_pandas()
            .sort_values("doc_id")["n_matches"]
            .tolist()
        )
        want = [
            sum(
                1
                for i in range(len(t.split()) - 1)
                if tuple(t.split()[i : i + 2]) == phrase
            )
            for t in texts
        ]
        assert got == want

        sl = sliding_chunks_documents(d).to_pandas()
        expect = []
        for did, t in enumerate(texts):
            w = t.split()
            for k, start in enumerate(range(0, len(w), S)):
                expect.append((did, k, start, min(W, len(w) - start), w[start]))
        if len(sl) == 0:
            assert expect == []
        else:
            assert (
                sorted(zip(sl["doc_id"], sl["win_id"], sl["start_tok"], sl["n_tokens"], sl["first_tok"]))
                == sorted(expect)
            )
