"""Exact-expectation tests for the driver's rows-only queries
(VERDICT r2 #8): the DuckDB oracle cannot express these (sketches,
approximate ANN, fake embeddings, derived page bytes), but every one
is DETERMINISTIC — so each gets a pinned exact result or an in-test
exact cross-check, not just a shape check.

Pinned values were generated from /root/testdata/sf0.001 (seeded,
content-addressed synthetic data: stable across rounds unless the
operator semantics change — in which case failing here must be a
conscious decision, like tests/golden_hashes.json).
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

import sys

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

_QUERIES = entrymod.queries()


def _pdf(x):
    return x.to_pandas() if hasattr(x, "to_pandas") else pd.DataFrame(x)


# MinHash-LSH verified near-dup pairs at sf0.001: the exact pair list.
PINNED_MINHASH_PAIRS = [
    (0, 50), (0, 82), (5, 450), (8, 12), (8, 120), (8, 360), (12, 120),
    (12, 360), (16, 369), (26, 176), (33, 436), (45, 487), (50, 82),
    (56, 157), (77, 459), (89, 114), (99, 174), (110, 467), (119, 425),
    (120, 360), (144, 161), (211, 404), (229, 263), (260, 391),
    (270, 329), (328, 428), (349, 411), (474, 498),
]

PINNED_SIMHASH_PAIRS = [
    (0, 50), (0, 82), (3, 128), (5, 450), (8, 120), (8, 360), (12, 360),
    (16, 369), (26, 176), (45, 487), (56, 157), (77, 459), (99, 174),
    (110, 467), (120, 360), (144, 161), (206, 356), (260, 391),
    (270, 329), (328, 428), (349, 411), (474, 498),
]


def test_minhash_lsh_pairs_pinned():
    df = _pdf(_QUERIES["minhash_lsh_pairs"](SF_DIR))
    assert sorted(zip(df["doc_a"], df["doc_b"])) == PINNED_MINHASH_PAIRS


def test_simhash_pairs_pinned():
    df = _pdf(_QUERIES["simhash_near_dups"](SF_DIR))
    assert sorted(zip(df["doc_a"], df["doc_b"])) == PINNED_SIMHASH_PAIRS


def test_ngram_jaccard_exact_values_and_subcorpus_completeness():
    """Every reported similarity equals an exact local shingle-Jaccard
    recomputation, and on the first-120-docs subcorpus the pipeline
    reports EVERY qualifying pair a local all-pairs brute force finds
    (LSH at a lower candidate threshold must not lose pairs at the
    report threshold)."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.kernels import hashing

    df = _pdf(_QUERIES["ngram_jaccard_pairs"](SF_DIR))
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))

    shingles = {}

    def sh(doc_id):
        if doc_id not in shingles:
            shingles[doc_id] = np.sort(hashing.shingle_hashes(texts[doc_id], k=3))
        return shingles[doc_id]

    for a, b, sim in zip(df["doc_a"], df["doc_b"], df["ngram_jaccard"]):
        exact = hashing.jaccard(sh(a), sh(b))
        assert sim == pytest.approx(exact, abs=1e-12), (a, b)

    reported = set(zip(df["doc_a"], df["doc_b"]))
    sub = sorted(i for i in texts if i < 120)
    for i, a in enumerate(sub):
        for b in sub[i + 1 :]:
            if hashing.jaccard(sh(a), sh(b)) >= 0.3:
                assert (a, b) in reported, (a, b)


def test_dedup_minhash_survivors_exactly_non_losers():
    df = _pdf(_QUERIES["dedup_minhash_documents"](SF_DIR))
    losers = {b for _a, b in PINNED_MINHASH_PAIRS}
    import pyarrow.parquet as pq

    all_ids = set(
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    )
    assert set(df["doc_id"]) == all_ids - losers


def test_dedup_clusters_equal_union_find():
    """Distributed label propagation == driver union-find over the
    same (pinned) pair list, for every doc including singletons."""
    df = _pdf(_QUERIES["dedup_clusters"](SF_DIR)).set_index("doc_id")["cluster_id"]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in PINNED_MINHASH_PAIRS:
        union(a, b)
    for doc_id, cluster in df.items():
        assert cluster == find(doc_id) if doc_id in parent else cluster == doc_id, doc_id


def test_ivf_recall_pinned_vs_brute_force():
    exact = _pdf(_QUERIES["knn_cosine_topk"](SF_DIR))
    approx = _pdf(_QUERIES["knn_ivf_topk"](SF_DIR))
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / len(exact)
    # deterministic seeded IVF: the recall at sf0.001 is exactly 0.65
    assert recall == pytest.approx(0.65, abs=1e-9)


def test_fingerprint_documents_pinned():
    df = _pdf(_QUERIES["fingerprint_documents"](SF_DIR))
    csv = df.sort_values("doc_id").reset_index(drop=True).to_csv(index=False)
    assert hashlib.md5(csv.encode()).hexdigest() == "028cb6d606640decfee6b9dfa06807f6"


def test_embed_documents_pinned_checksum():
    df = _pdf(_QUERIES["embed_documents"](SF_DIR)).sort_values("doc_id")
    arr = np.stack([np.asarray(v, dtype=np.float32) for v in df["embedding"]])
    assert arr.shape == (500, 64)
    assert float(np.abs(arr).sum()) == pytest.approx(1909.974, abs=0.01)


def test_extraction_metrics_exact_from_local_derivation():
    """extraction_metrics_by_bucket == local recomputation from the
    deterministic page derivation: statuses from the documents table,
    buckets/bytes from the derived page bytes themselves."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.kernels.sniff import size_bucket
    from pdf_extractor_ray.pipelines.webdocs import _doc_to_page

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    ).to_pandas()
    exp = {}
    for _, r in docs.iterrows():
        page = _doc_to_page(int(r["doc_id"]), r["text"], r["lang"], r["source"])
        status = "empty" if not r["text"].strip() else "ok"
        key = (size_bucket(len(page)), status)
        n, b = exp.get(key, (0, 0))
        exp[key] = (n + 1, b + len(page))

    got = _pdf(_QUERIES["extraction_metrics_by_bucket"](SF_DIR))
    got_map = {
        (int(r["size_bucket"]), r["status"]): (int(r["n_docs"]), int(r["total_bytes"]))
        for _, r in got.iterrows()
    }
    assert got_map == exp


def test_contamination_screen_exact_vs_brute_force():
    """The broadcast n-gram screen == a local brute-force recomputation
    (same shingle hashing, same benchmark rule) for every document."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.kernels import hashing

    got = _pdf(_QUERIES["contamination_screen"](SF_DIR)).set_index("doc_id")
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()

    bench = np.unique(
        np.concatenate(
            [hashing.shingle_hashes(t, k=8) for d, t in zip(docs["doc_id"], docs["text"]) if d % 50 == 0]
            or [np.empty(0, dtype=np.uint64)]
        )
    )
    n_flagged = 0
    for d, t in zip(docs["doc_id"], docs["text"]):
        sh = hashing.shingle_hashes(t, k=8)
        exp_shared = int(np.isin(sh, bench).sum())
        assert got.loc[d, "n_shared_ngrams"] == exp_shared, d
        assert got.loc[d, "contaminated"] == (1 if exp_shared else 0), d
        n_flagged += 1 if exp_shared else 0
    # benchmark members are self-contaminated by construction, so the
    # screen must flag at least all of them
    assert n_flagged >= (docs["doc_id"] % 50 == 0).sum()


def test_heavy_hitters_equal_exact_top_tokens():
    """MG candidates + exact recount == brute-force top-10 tokens at
    sf0.001 (the corpus's 10th token is far above the N/(k+1)
    guarantee floor, so the candidate set provably contains them)."""
    import collections

    import pyarrow.parquet as pq

    got = _pdf(_QUERIES["heavy_hitter_tokens"](SF_DIR))
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])["text"].to_pylist()
    counts = collections.Counter(w for t in texts for w in t.split())
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["token"], got["n"])) == exp


def test_misra_gries_guarantee_adversarial():
    """Planted heavy item survives an adversarial stream and its
    counter undercounts by at most N/(k+1); merge order never loses
    the heavy item."""
    from pdf_extractor_ray.kernels import sketches

    k = 8
    stream = (["hot"] * 400) + [f"noise{i}" for i in range(900)]
    import random as _r

    _r.Random(3).shuffle(stream)
    n = len(stream)
    parts = [stream[i::7] for i in range(7)]  # 7 arbitrary shards
    merged = {}
    for p in parts:
        merged = sketches.mg_merge(merged, sketches.mg_fold(p, k=k), k=k)
    assert "hot" in merged
    assert merged["hot"] >= 400 - n // (k + 1)
    assert merged["hot"] <= 400


def test_contamination_bloom_path_row_identical():
    """The Bloom-prefilter + distributed-exact-verify variant must be
    row-identical to the broadcast-set screen (Bloom has no false
    negatives; the exact verify trims its false positives)."""
    a = (
        _pdf(_QUERIES["contamination_screen"](SF_DIR))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        _pdf(_QUERIES["contamination_screen_bloom"](SF_DIR))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)
