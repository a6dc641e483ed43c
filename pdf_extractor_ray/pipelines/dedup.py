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

import logging
import re

import numpy as np
import pandas as pd
import ray.data

_LOG = logging.getLogger(__name__)

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
def _sig_partial(
    b: pd.DataFrame,
    num_perm: int,
    num_bands: int,
    shingle_k: int,
    collapse_exact_sigs: bool,
) -> pd.DataFrame:
    """The pre-exchange stage of ``minhash_lsh_pairs``, module-level so
    the viral-key bound (≤ 1 band-row set per exact-sig class per
    batch) is directly testable on the exchange INPUT."""
    # pass 1: one signature per doc, grouped into exact-sig classes
    classes: dict[bytes, list[tuple[int, np.ndarray]]] = {}
    for doc_id, text in zip(b["doc_id"], b["text"]):
        sig = hashing.minhash_signature(
            hashing.shingle_hashes(text, k=shingle_k), num_perm=num_perm
        )
        classes.setdefault(sig.tobytes(), []).append((int(doc_id), sig))
    # pass 2: band rows — all docs, or (collapsed) only each class's
    # batch-min rep, plus one rep→loser marker per other member
    # (band_id -1 with a unique band_hash = its own singleton group,
    # so markers never enter the pair loop)
    rows = []
    for sig_b, members in classes.items():
        members.sort(key=lambda m: m[0])
        carriers = members[:1] if collapse_exact_sigs else members
        if collapse_exact_sigs:
            rep = members[0][0]
            rows.extend(
                {"band_id": -1, "band_hash": np.uint64(loser_id), "doc_id": rep, "sig": b""}
                for loser_id, _sig in members[1:]
            )
        for doc_id, sig in carriers:
            rows.extend(
                {"band_id": band_id, "band_hash": band_hash, "doc_id": doc_id, "sig": sig_b}
                for band_id, band_hash in enumerate(
                    hashing.minhash_bands(sig, num_bands=num_bands)
                )
            )
    return pd.DataFrame(
        rows, columns=["band_id", "band_hash", "doc_id", "sig"]
    ).astype({"band_id": "int64", "band_hash": "uint64", "doc_id": "int64", "sig": "object"})


def minhash_lsh_pairs(
    sf_dir: str,
    *,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    collapse_exact_sigs: bool = False,
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

    ``collapse_exact_sigs=True`` is the VIRAL-KEY bound for the dedup
    use: within each batch, docs with IDENTICAL signatures collapse to
    one representative (the batch-min doc_id) — only the rep's band
    rows cross the exchange (≤ 1 row per sig-class per batch per band,
    the keep_first bound), and each collapsed doc ships ONE
    rep→loser marker row instead of ``num_bands`` band rows. A key
    with 100k identical copies thus costs O(n) marker rows and O(1)
    per-band group size, never an O(n²) in-bucket pair loop. The PAIR
    LIST is then intentionally incomplete (loser↔loser and
    loser↔other pairs are represented only through the rep), but the
    LOSER SET — every doc with a verified smaller near-dup — is
    provably identical: identical signatures have identical similarity
    to every other doc, so any pair a collapsed doc would lose is also
    lost by (or through) its rep. Keep the default for the pairs
    QUERY; ``dedup_minhash`` enables it."""
    ds = _read_docs(sf_dir, columns=("doc_id", "text"))
    bands = ds.map_batches(
        lambda b: _sig_partial(b, num_perm, num_bands, shingle_k, collapse_exact_sigs),
        batch_format="pandas",
    )

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
        outs = []
        markers = g[g["band_id"] < 0]
        if len(markers):
            outs.append(
                pd.DataFrame(
                    {
                        "doc_a": markers["doc_id"].astype("int64"),
                        "doc_b": markers["band_hash"].astype("int64"),
                        "jaccard_sim": np.ones(len(markers), dtype=np.float64),
                    }
                )
            )
            g = g[g["band_id"] >= 0]
        # singleton band-buckets (the overwhelming majority) can't form
        # pairs — drop them vectorized before the per-group Python loop
        g = g[g.duplicated(subset=["band_id", "band_hash"], keep=False)]
        outs.extend(bucket_pairs(sub) for _, sub in g.groupby(["band_id", "band_hash"], sort=False))
        return pd.concat(outs, ignore_index=True) if outs else bucket_pairs(g.head(0))

    pairs = grouped_apply(bands, ["band_id", "band_hash"], all_bucket_pairs, num_buckets=32)
    # a pair can surface from several bands → distinct (deterministic:
    # sim is identical for every copy of the pair)
    return grouped_apply(
        pairs, ["doc_a", "doc_b"],
        lambda g: g.drop_duplicates(subset=["doc_a", "doc_b"]),
        num_buckets=16,
    )


def dedup_minhash(sf_dir: str, *, collapse_exact_sigs: bool = True, **kw) -> ray.data.Dataset:
    """Near-dup dedup: drop the larger doc_id of every verified pair.

    The loser set (doc_b of each pair) is NEVER collected on the
    driver: the pair list stays a Dataset and the removal is a
    distributed anti-join on the hash-partitioned exchange — bounded
    by nothing, correct at any dup rate.

    Exact-signature classes are collapsed per batch (see
    ``minhash_lsh_pairs(collapse_exact_sigs=True)``): a VIRAL text with
    100k identical copies ships one band-row set per batch plus one
    marker row per copy, and its LSH bucket holds one row per batch —
    never the O(n²) in-bucket pair loop. The loser set is provably
    unchanged (identical sigs are interchangeable in every pair).
    """
    from pdf_extractor_ray.joins import semi_join

    # explicit keyword (defaulting True) so a caller comparing plans can
    # pass collapse_exact_sigs=False without a duplicate-kwarg TypeError;
    # the loser SET is identical either way (see minhash_lsh_pairs)
    pairs = minhash_lsh_pairs(sf_dir, collapse_exact_sigs=collapse_exact_sigs, **kw)
    # duplicate loser ids are harmless to the anti-join on either plan
    # (broadcast set or left_anti exchange) — no distinct pass needed
    losers = pairs.select_columns(["doc_b"])
    ds = _read_docs(sf_dir, columns=("doc_id", "lang", "source", "n_chars"))
    return semi_join(ds, losers, on="doc_id", right_on="doc_b", keep=False)


def label_propagation(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Distributed connected components by iterated min-label
    propagation — the pair list never lands on the driver.

    ``edges`` is an undirected edge Dataset (one row per edge, any
    orientation). Each round: every node sends its current label to its
    neighbors (one hash join edges ⋈ labels), labels re-minimize (one
    bucketed grouped min), then POINTER-JUMP — ``label ← label[label]``
    via one more hash join of the label table against itself — and the
    round materializes so lineage stays flat. Labels only decrease, so
    ``sum(label)`` strictly decreases until the fixpoint — that sum is
    the convergence check (one cheap streaming aggregate per round).
    The neighbor step alone needs graph-diameter rounds; the jump step
    doubles the effective propagation distance per round, so an
    adversarial long-chain graph converges in O(log diameter) rounds
    (a diameter-20k chain in ~15 rounds, not 20k).

    Returns (node, label) for every node WITH at least one edge; label
    = min node id of its component. Isolated nodes are absent (their
    component is themselves — callers fill that in).
    """
    from pdf_extractor_ray.joins import join_datasets
    from pdf_extractor_ray.ops import distinct, grouped_agg

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate([b[src].to_numpy(), b[dst].to_numpy()]),
                "dst": np.concatenate([b[dst].to_numpy(), b[src].to_numpy()]),
            }
        )

    directed = edges.map_batches(both_dirs, batch_format="pandas").materialize()

    labels = distinct(directed.select_columns(["src"]), ["src"]).map_batches(
        lambda b: pd.DataFrame({"node": b["src"], "label": b["src"]}),
        batch_format="pandas",
    ).materialize()

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        msgs = join_datasets(directed, labels, on="src", right_on="node").map_batches(
            lambda b: pd.DataFrame({"node": b["dst"], "label": b["label"]}),
            batch_format="pandas",
        )
        labels = grouped_agg(
            labels.union(msgs), ["node"], {"label": ("label", "min")},
            num_buckets=num_buckets,
        ).materialize()
        # pointer jump: label ← label[label]. Every label VALUE is an
        # edge-node id (self-labels at init, neighbor labels after), so
        # the label table joined against itself on label=node matches
        # every row exactly once (nodes are unique after the min) and
        # label[label] ≤ label — monotone, same fixpoint, and the hop
        # distance compounds geometrically instead of linearly.
        jump_side = labels.map_batches(
            lambda b: pd.DataFrame({"jnode": b["node"], "jlabel": b["label"]}),
            batch_format="pandas",
        )
        labels = join_datasets(labels, jump_side, on="label", right_on="jnode").map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "label": b["jlabel"]}),
            batch_format="pandas",
        ).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # returning partial labels would silently split components —
        # surface it instead (a diameter-max_rounds graph needs more
        # rounds, or a pointer-jumping variant)
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            "(graph diameter exceeds max_rounds); raise max_rounds"
        )
    return labels


def dedup_clusters(sf_dir: str, **kw) -> ray.data.Dataset:
    """Connected components over MinHash near-dup pairs:
    (doc_id, cluster_id) with cluster_id = min doc_id of the component;
    docs with no near-dup edge are their own cluster.

    Fully distributed: the LSH pair list stays a Dataset, components
    are solved by ``label_propagation`` (iterated min-label exchange),
    and the final assignment is a left-outer hash join of the corpus
    against the edge-node labels (missing → own id). Nothing scales
    with the pair count on the driver.
    """
    from pdf_extractor_ray.joins import adaptive_inner_join

    pairs = minhash_lsh_pairs(sf_dir, **kw).select_columns(["doc_a", "doc_b"]).materialize()
    docs = _read_docs(sf_dir, columns=("doc_id",))
    if pairs.count() == 0:
        return docs.map_batches(
            lambda b: pd.DataFrame({"doc_id": b["doc_id"], "cluster_id": b["doc_id"]}),
            batch_format="pandas",
        )
    labels = label_propagation(pairs, src="doc_a", dst="doc_b")

    # edge-node labels are the small side → adaptive broadcast left
    # join (exchange above the threshold)
    out = adaptive_inner_join(docs, labels, on="doc_id", right_on="node", how="left_outer")

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        cluster = b["label"].fillna(b["doc_id"]).astype("int64")
        return pd.DataFrame({"doc_id": b["doc_id"], "cluster_id": cluster})

    return out.map_batches(finalize, batch_format="pandas")


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
    sets, not signatures).

    Texts are attached in three size-bounded steps: (1) ONE streaming
    semi-join filters the docs table down to candidate ids (the id set
    is tiny — LSH-pruned); (2-3) two adaptive joins attach text_a /
    text_b with the FILTERED candidate-text table as the build side.
    Under the broadcast plan the driver therefore holds at most the
    LSH-pruned candidates' texts (the same bound the reference-style
    id-filtered read gives); above the broadcast threshold every step
    runs on the hash-partitioned exchange with nothing collected."""
    from pdf_extractor_ray.joins import adaptive_inner_join, semi_join

    cand = minhash_lsh_pairs(sf_dir, shingle_k=k, jaccard_threshold=0.2).select_columns(
        ["doc_a", "doc_b"]
    ).materialize()
    cand_ids = cand.select_columns(["doc_a"]).map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_a"]}), batch_format="pandas"
    ).union(
        cand.select_columns(["doc_b"]).map_batches(
            lambda b: pd.DataFrame({"doc_id": b["doc_b"]}), batch_format="pandas"
        )
    )
    docs = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    cand_docs = semi_join(docs, cand_ids, on="doc_id").materialize()

    j1 = adaptive_inner_join(cand, cand_docs, on="doc_a", right_on="doc_id").map_batches(
        lambda b: pd.DataFrame(
            {"doc_a": b["doc_a"], "doc_b": b["doc_b"], "text_a": b["text"]}
        ),
        batch_format="pandas",
    )
    j2 = adaptive_inner_join(j1, cand_docs, on="doc_b", right_on="doc_id").map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_a": b["doc_a"],
                "doc_b": b["doc_b"],
                "text_a": b["text_a"],
                "text_b": b["text"],
            }
        ),
        batch_format="pandas",
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        sims = []
        for ta, tb in zip(b["text_a"], b["text_b"]):
            sa = hashing.shingle_hashes(ta, k=k)
            sb = hashing.shingle_hashes(tb, k=k)
            sims.append(hashing.jaccard(np.sort(sa), np.sort(sb)))
        out = b[["doc_a", "doc_b"]].copy()
        out["ngram_jaccard"] = sims
        return out[out["ngram_jaccard"] >= threshold]

    return j2.map_batches(verify, batch_format="pandas")


def embedding_near_dups(
    sf_dir: str, cosine_threshold: float = 0.35, num_blocks: int = 4
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via a BLOCKED pair grid — the
    all-pairs theta-join shape that never broadcasts the corpus:

    each vector is hashed to one of ``num_blocks`` blocks and emitted
    once per grid cell (i ≤ j) its block participates in; ONE bucketed
    exchange co-locates each cell's two blocks; the per-cell kernel is
    a vectorized normalized matmul (upper triangle for diagonal cells).
    Every pair (a, b) lands in exactly one cell — the one keyed by the
    sorted pair of their blocks — so output pairs are exact and unique.

    Scale: worker memory is O(2·N/num_blocks) vectors per cell (pick
    num_blocks so two blocks fit a worker heap — flops stay O(N²) as
    they must for exact all-pairs); shuffle volume is N·num_blocks
    rows. The IVF path in similarity.py is the approximate >10^8-vector
    variant.

    Default threshold 0.35 is tuned to the synthetic testdata (random
    cluster embeddings top out near cosine 0.51; a real near-dup corpus
    would use ~0.95)."""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["vec_id"].to_numpy()
        mat = np.array(list(b["embedding"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        matn = mat / norms
        blocks = (
            pd.util.hash_array(ids, hash_key="0123456789abcdef") % np.uint64(num_blocks)
        ).astype(np.int64)
        rows = []
        for r in range(len(ids)):
            blk = int(blocks[r])
            payload = matn[r].tobytes()
            for other in range(num_blocks):
                i, j = (blk, other) if blk <= other else (other, blk)
                rows.append(
                    {"grid": i * num_blocks + j, "block": blk, "vec_id": int(ids[r]), "v": payload}
                )
        return pd.DataFrame(rows)

    cells = ds.map_batches(explode, batch_format="pandas", batch_size=2048)

    empty = pd.DataFrame(columns=["vec_a", "vec_b", "cosine_sim"]).astype(
        {"vec_a": "int64", "vec_b": "int64", "cosine_sim": "float64"}
    )

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for grid, cell in g.groupby("grid", sort=False):
            i, j = divmod(int(grid), num_blocks)
            # each vector appears once per cell by construction
            left = cell[cell["block"] == i]
            ids_l = left["vec_id"].to_numpy()
            mat_l = np.frombuffer(b"".join(left["v"]), dtype=np.float64).reshape(len(left), -1) if len(left) else np.empty((0, 0))
            if i == j:
                if len(ids_l) < 2:
                    continue
                sims = mat_l @ mat_l.T
                ai, bj = np.nonzero(np.triu(sims >= cosine_threshold, k=1))
                for a, b_ in zip(ai, bj):
                    va, vb = int(ids_l[a]), int(ids_l[b_])
                    lo, hi = (va, vb) if va < vb else (vb, va)
                    out.append({"vec_a": lo, "vec_b": hi, "cosine_sim": float(sims[a, b_])})
            else:
                right = cell[cell["block"] == j]
                if not len(ids_l) or not len(right):
                    continue
                ids_r = right["vec_id"].to_numpy()
                mat_r = np.frombuffer(b"".join(right["v"]), dtype=np.float64).reshape(len(right), -1)
                sims = mat_l @ mat_r.T
                ai, bj = np.nonzero(sims >= cosine_threshold)
                for a, b_ in zip(ai, bj):
                    va, vb = int(ids_l[a]), int(ids_r[b_])
                    lo, hi = (va, vb) if va < vb else (vb, va)
                    out.append({"vec_a": lo, "vec_b": hi, "cosine_sim": float(sims[a, b_])})
        return (
            pd.DataFrame(out, columns=["vec_a", "vec_b", "cosine_sim"]).astype(empty.dtypes)
            if out
            else empty
        )

    return grouped_apply(cells, ["grid"], cell_pairs, num_buckets=min(16, num_blocks * (num_blocks + 1) // 2))


def embedding_near_dups_query(sf_dir: str, cosine_threshold: float = 0.35) -> ray.data.Dataset:
    """Driver-facing projection of ``embedding_near_dups`` with the
    similarity in integer micro-units, which hash-matches the DuckDB
    all-pairs cosine self-join oracle (the engine's blocked-grid
    normalized matmul and DuckDB's list_cosine_similarity agree to
    ~1e-15 — far inside the 1e-6 quantization and the corpus's 2.9e-5
    threshold margin)."""
    pairs = embedding_near_dups(sf_dir, cosine_threshold=cosine_threshold)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "vec_a": b["vec_a"],
                "vec_b": b["vec_b"],
                "sim_micro": np.floor(b["cosine_sim"].to_numpy() * 1e6 + 0.5).astype(np.int64),
            }
        )

    return pairs.map_batches(project, batch_format="pandas")


EMBEDDING_NEAR_DUPS_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1000000 + 0.5)
            AS BIGINT) AS sim_micro
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
"""


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication" — public method): k-means
# over embeddings, exact cosine dedup WITHIN each cluster only.
# ---------------------------------------------------------------------------


def semdedup(
    sf_dir: str,
    *,
    num_clusters: int = 8,
    cosine_threshold: float = 0.35,
    max_cluster_rows: int = 200_000,
    num_buckets: int | None = None,
    split_oversized: bool = True,
    split_branch: int = 8,
    split_sample_rows: int = 4096,
    max_split_depth: int = 4,
    split_log: "list[dict] | None" = None,
) -> ray.data.Dataset:
    """Semantic dedup: cluster embeddings with the IVF coarse k-means
    (``similarity.train_centroids`` — bounded deterministic sample,
    Lloyd on the driver), assign every vector to its nearest centroid
    (broadcast centroids, vectorized ``map_batches``), then greedily
    keep, within each cluster in ``vec_id`` order, only vectors not
    within ``cosine_threshold`` of an already-KEPT vector (the leader
    rule — deterministic, chain-consistent). Returns one row per
    vector: ``(vec_id, list_id, keep)``.

    Scale shape: ONE bucketed exchange on ``list_id``; per-cluster work
    is O(c²·d) flops and O(c·d) memory — exactly SemDeDup's bargain
    (clusters turn all-pairs N² into Σc²; ``num_clusters`` scales with
    the corpus so c stays worker-sized).

    Oversized clusters (VERDICT r4 #3): with ``split_oversized`` on, a
    cheap distributed count per list runs BEFORE any group is
    assembled; every cluster whose count exceeds ``max_cluster_rows``
    is recursively sub-clustered — sub-centroids trained on a bounded
    per-list sample (per-batch bottom-k prune, so no worker ever holds
    the oversized cluster), then ONE broadcast re-assign pass maps its
    members onto ``split_branch`` fresh sub-list ids — until every
    cluster fits or ``max_split_depth`` is hit. Dedup then runs within
    the FINAL sub-clusters, which is exactly the semantics of having
    asked for more clusters up front; clusters already under the cap
    are byte-identical to the unsplit path. A cluster still oversized
    after ``max_split_depth`` rounds (e.g. ≥ max_cluster_rows exactly
    identical vectors, which no k-means can separate) hits the
    in-group backstop raise.

    Default threshold 0.35 matches ``embedding_near_dups`` (the
    synthetic corpus tops out near cosine 0.51; a real near-dup corpus
    would use ~0.95).

    Not SQL-expressible (iterative k-means + order-dependent greedy
    keep) — rows-only driver check; exactness is pinned by a planted
    duplicate-cluster test and a single-cluster brute-force replica."""
    import os

    from pdf_extractor_ray.ops import grouped_apply
    from pdf_extractor_ray.pipelines.similarity import _assign_stage, train_centroids

    cents = train_centroids(sf_dir, num_lists=num_clusters)
    assigned = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(_assign_stage(cents), batch_format="pyarrow", batch_size=4096)

    if split_oversized:
        assigned = _split_oversized_clusters(
            assigned,
            max_cluster_rows=max_cluster_rows,
            branch=split_branch,
            sample_rows=split_sample_rows,
            max_depth=max_split_depth,
            next_id=num_clusters,
            split_log=split_log,
        )

    def cluster_dedup(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for lid, grp in g.groupby("list_id", sort=False):
            if len(grp) > max_cluster_rows:
                raise ValueError(
                    f"semdedup: cluster {lid} has {len(grp)} rows > "
                    f"max_cluster_rows={max_cluster_rows}; raise num_clusters "
                    "so per-cluster pair work stays worker-sized"
                )
            grp = grp.sort_values("vec_id")
            ids = grp["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(grp["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            matn = mat / norms
            kept = np.empty_like(matn)
            n_kept = 0
            keep = np.zeros(len(ids), dtype=bool)
            for j in range(len(ids)):
                if n_kept == 0 or float((kept[:n_kept] @ matn[j]).max()) < cosine_threshold:
                    kept[n_kept] = matn[j]
                    n_kept += 1
                    keep[j] = True
            outs.append(
                pd.DataFrame(
                    {"vec_id": ids, "list_id": np.full(len(ids), lid, dtype=np.int64), "keep": keep}
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "list_id": pd.Series([], dtype="int64"),
                    "keep": pd.Series([], dtype="bool"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return grouped_apply(assigned, ["list_id"], cluster_dedup, num_buckets=num_buckets)


def _split_oversized_clusters(
    assigned: ray.data.Dataset,
    *,
    max_cluster_rows: int,
    branch: int,
    sample_rows: int,
    max_depth: int,
    next_id: int,
    split_log: "list[dict] | None" = None,
) -> ray.data.Dataset:
    """Recursive k-means sub-split of clusters whose ASSIGN-STAGE counts
    exceed ``max_cluster_rows`` — run before any ``map_groups`` so no
    worker ever assembles an oversized cluster (VERDICT r4 #3).

    Per round: (1) distributed per-list count (the collected table is
    cluster-count-sized, never corpus-sized); (2) for each oversized
    list, train ``branch`` sub-centroids on a bounded sample — a
    per-batch bottom-k prune caps what the training group assembles at
    ``sample_rows`` × input-blocks rows, mirroring
    ``train_centroids``'s bounded-sample contract; (3) ONE broadcast
    re-assign pass maps members of oversized lists to fresh sub-list
    ids (allocated past every live id, so untouched clusters keep
    their ids and output rows byte-identical to the unsplit path).
    Rounds repeat until all clusters fit or ``max_depth``; a cluster
    k-means cannot separate (identical vectors) eventually hits the
    in-group backstop raise in ``semdedup``.

    Each round re-executes the lazy read→assign lineage instead of
    materializing the corpus mid-pipeline — at 100 TB, recomputing a
    pruned-column read + one matmul beats holding the table in the
    object store; ``max_depth`` bounds the recompute count."""
    import warnings

    import pyarrow as pa

    from pdf_extractor_ray.ops import grouped_agg, grouped_apply
    from pdf_extractor_ray.pipelines.similarity import lloyd_unit_kmeans

    def _unit_rows(vals) -> np.ndarray:
        mat = np.array(list(vals), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return mat / norms

    for _depth in range(max_depth):
        counts = grouped_agg(
            assigned, ["list_id"], {"n": ("vec_id", "count")}
        ).to_pandas()  # cluster-count-sized by construction
        over = sorted(
            int(lid)
            for lid, n in zip(counts["list_id"], counts["n"])
            if int(n) > max_cluster_rows
        )
        if not over:
            return assigned
        over_set = set(over)

        def prune(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["list_id"].isin(over_set)]
            if not len(b):
                return b[["list_id", "vec_id", "embedding"]]
            return b.groupby("list_id", group_keys=False, sort=False).apply(
                lambda g: g.nsmallest(sample_rows, "vec_id")
            )[["list_id", "vec_id", "embedding"]]

        def train_subs(g: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for lid, grp in g.groupby("list_id", sort=False):
                grp = grp.nsmallest(sample_rows, "vec_id")
                cents = lloyd_unit_kmeans(_unit_rows(grp["embedding"]), branch)
                rows.append(
                    pd.DataFrame(
                        {
                            "list_id": np.full(len(cents), lid, dtype=np.int64),
                            "centroid": [c.tolist() for c in cents],
                        }
                    )
                )
            if not rows:
                return pd.DataFrame(
                    {"list_id": pd.Series([], dtype="int64"), "centroid": pd.Series([], dtype=object)}
                )
            return pd.concat(rows, ignore_index=True)

        sub = grouped_apply(
            assigned.map_batches(prune, batch_format="pandas", batch_size=4096),
            ["list_id"],
            train_subs,
            num_buckets=min(16, len(over)),
        ).to_pandas()  # oversized × branch rows — bounded by construction

        plan = {}
        for lid, grp in sub.groupby("list_id", sort=True):
            plan[int(lid)] = (np.array(list(grp["centroid"]), dtype=np.float64), next_id)
            next_id += len(grp)
        # sizing lineage for 100-TB operators: always logged (any
        # production run captures it), additionally collected into
        # split_log when the caller wants it programmatically
        counts_by_lid = dict(zip(counts["list_id"].astype(int), counts["n"].astype(int)))
        lineage = {
            "depth": _depth,
            "split": {
                lid: {"rows": counts_by_lid[lid], "first_new_id": base, "branch": len(c)}
                for lid, (c, base) in plan.items()
            },
        }
        _LOG.info("semdedup sub-split round: %s", lineage)
        if split_log is not None:
            split_log.append(lineage)
        # run-metrics plane (TODO_ROUND5 #8 follow-up): when a named
        # collector is live, the lineage lands in the next manifest
        # commit's "events" — no caller-owned list needed in prod
        from pdf_extractor_ray.state import metrics as _metrics

        _metrics.log_event("semdedup_split", lineage)
        plan_ref = ray.put(plan)

        def reassign(t: pa.Table) -> pa.Table:
            p = ray.get(plan_ref)
            lids = t.column("list_id").to_numpy().astype(np.int64, copy=True)
            hit = np.isin(lids, np.fromiter(p, dtype=np.int64))
            if hit.any():
                matn = _unit_rows(
                    v for v, h in zip(t.column("embedding").to_pylist(), hit) if h
                )
                hit_lids = lids[hit]
                new_hit = hit_lids.copy()
                for lid, (cents, base) in p.items():
                    m = hit_lids == lid
                    if m.any():
                        new_hit[m] = base + (matn[m] @ cents.T).argmax(axis=1)
                lids[hit] = new_hit
            idx = t.column_names.index("list_id")
            return t.set_column(idx, "list_id", pa.array(lids, pa.int64()))

        assigned = assigned.map_batches(reassign, batch_format="pyarrow", batch_size=4096)

    warnings.warn(
        f"semdedup: clusters still above max_cluster_rows={max_cluster_rows} after "
        f"{max_depth} sub-split rounds (inseparable members?); the in-group guard "
        "will raise if any final cluster exceeds the cap",
        stacklevel=2,
    )
    return assigned


# ---------------------------------------------------------------------------
# Cross-document paragraph dedup (CCNet-style boilerplate removal)
# ---------------------------------------------------------------------------


def split_paragraphs(text: str) -> list[str]:
    """Newline-split, empty lines dropped — the paragraph unit used by
    CCNet-style corpus dedup. Single source for BOTH passes of
    ``paragraph_dedup`` (count and rebuild must hash identical units)."""
    return [p for p in text.split("\n") if p]


def paragraph_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "url",
    min_docs: int = 2,
    num_buckets: int | None = None,
    broadcast_limit: int | None = None,
    hot_key_docs: int = 100_000,
) -> ray.data.Dataset:
    """Cross-document paragraph dedup: remove every paragraph that
    occurs in >= ``min_docs`` DISTINCT documents (CCNet's boilerplate
    strip: repeated paragraphs across a crawl are nav bars, cookie
    banners, license boilerplate). Returns one row per input document:
    ``(id_col, n_paragraphs_kept, text_kept)`` with the surviving
    paragraphs re-joined by newline in original order.

    Scale shape (two streaming passes, no driver loop over rows):

    - Pass 1 (document frequency): each doc emits the SET of its
      paragraph hashes (within-doc dedupe makes a plain count equal
      the distinct-doc count); the exchange carries 16-byte content
      hashes + per-batch partial counts (``ops.grouped_sum``), never
      paragraph text. A boilerplate paragraph present in every
      document contributes one partial row per batch, not one per doc.
    - Pass 2 (rebuild): the common-hash set (with its doc counts) is
      materialized ONCE — the gate check, the broadcast plan, the hot
      split and the exchange right side all reuse those blocks, so the
      pass-1 exchange never re-executes. Below the rows+bytes gate the
      set is broadcast and the rebuild is a zero-shuffle
      ``map_batches``; above it, docs explode to paragraph rows, an
      anti ``semi_join`` on the hash drops common ones, and a bucketed
      reassembly restores per-doc order — the common set never lands
      on the driver. ``broadcast_limit=0`` forces the exchange plan
      (tests pin row-identity between both plans).
    - Hot-key bound: a viral paragraph (cookie banner in ~every doc)
      would otherwise route every one of its text-carrying exploded
      rows to the single exchange partition owning its hash. Pass 1
      already knows each hash's doc count, so paragraphs in
      >= ``hot_key_docs`` docs are split out as a TINY broadcast set
      and pre-dropped inside ``explode`` (sound: ``hot_key_docs`` is
      clamped to >= ``min_docs``, so every hot hash is common and the
      anti-join would drop those rows anyway). Any key surviving to
      the exchange then carries < ``hot_key_docs`` rows — bounded
      per-partition load. If the hot set itself exceeds the broadcast
      gate the split degrades to a warning, never a wrong answer.
    """
    from pdf_extractor_ray import joins

    if broadcast_limit is None:
        broadcast_limit = joins.BROADCAST_KEY_LIMIT

    narrow = ds.select_columns([id_col, text_col])

    def emit_hash_sets(b: pd.DataFrame) -> pd.DataFrame:
        hs: list[str] = []
        for t in b[text_col]:
            hs.extend({hashing.content_hash(p) for p in split_paragraphs(t)})
        return pd.DataFrame({"__ph": hs, "n_docs": np.ones(len(hs), dtype=np.int64)})

    from pdf_extractor_ray.ops import grouped_sum

    counts = grouped_sum(
        narrow.map_batches(emit_hash_sets, batch_format="pandas"),
        ["__ph"],
        ["n_docs"],
        num_buckets=num_buckets,
    )
    # keep n_docs through the materialization: the hot split below needs
    # the counts, and one materialize serves gate check + broadcast set +
    # hot set + exchange right side (no pass-1 lineage re-run anywhere)
    common_m = counts.map_batches(
        lambda b: b.loc[b["n_docs"] >= min_docs, ["__ph", "n_docs"]], batch_format="pandas"
    ).materialize()

    if broadcast_limit:
        # gate measured with the n_docs column attached — ~1.5x byte
        # conservatism vs keys-only, rows identical
        if joins._fits_broadcast(common_m, broadcast_limit):
            ref = ray.put(
                frozenset(r["__ph"] for r in common_m.select_columns(["__ph"]).take_all())
            )

            def rebuild(b: pd.DataFrame) -> pd.DataFrame:
                drop = joins._cached_get(ref)
                n_kept, texts = [], []
                for t in b[text_col]:
                    kept = [
                        p for p in split_paragraphs(t) if hashing.content_hash(p) not in drop
                    ]
                    n_kept.append(len(kept))
                    texts.append("\n".join(kept))
                return pd.DataFrame(
                    {
                        id_col: b[id_col],
                        "n_paragraphs_kept": np.array(n_kept, dtype=np.int64),
                        "text_kept": texts,
                    }
                )

            return narrow.map_batches(rebuild, batch_format="pandas")

    # Exchange plan: explode → anti-join on hash → ordered reassembly.
    # Hot split first: viral hashes (>= hot_key_docs docs) are resolved
    # by a broadcast pre-drop inside explode, so no single exchange
    # partition ever receives an unbounded viral paragraph's rows.
    hot_thresh = max(hot_key_docs, min_docs)
    hot_m = common_m.map_batches(
        lambda b: b.loc[b["n_docs"] >= hot_thresh, ["__ph"]], batch_format="pandas"
    ).materialize()
    if joins._fits_broadcast(hot_m, broadcast_limit or joins.BROADCAST_KEY_LIMIT):
        hot_set = frozenset(r["__ph"] for r in hot_m.take_all())
    else:
        import warnings

        warnings.warn(
            f"paragraph_dedup: hot-key set ({hot_m.count()} hashes in >= "
            f"{hot_thresh} docs) exceeds the broadcast gate; the exchange "
            "runs without the skew bound — raise hot_key_docs",
            stacklevel=2,
        )
        hot_set = frozenset()
    hot_ref = ray.put(hot_set)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        hot = joins._cached_get(hot_ref)
        ids, pos, paras, phs = [], [], [], []
        for u, t in zip(b[id_col], b[text_col]):
            for j, p in enumerate(split_paragraphs(t)):
                h = hashing.content_hash(p)
                if h in hot:  # hot => common => the anti-join drops it
                    continue
                ids.append(u)
                pos.append(j)
                paras.append(p)
                phs.append(h)
        return pd.DataFrame(
            {id_col: ids, "__pos": np.array(pos, dtype=np.int64), "__para": paras, "__ph": phs}
        )

    kept_rows = joins.semi_join(
        narrow.map_batches(explode, batch_format="pandas"),
        common_m.select_columns(["__ph"]),
        "__ph",
        keep=False,
        broadcast_limit=0,
    )
    # Anchor row per document so zero-kept (and zero-paragraph) docs
    # still appear in the output — anchors bypass the anti-join, so no
    # sentinel hash value can collide with a real paragraph hash.
    def anchor(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "__pos": np.full(n, -1, dtype=np.int64),
                "__para": [""] * n,
                "__ph": [""] * n,
            }
        )

    both = kept_rows.union(ds.select_columns([id_col]).map_batches(anchor, batch_format="pandas"))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "__pos"], kind="stable")
        # one anchor per input row: a duplicated id_col would interleave
        # two documents' paragraphs into one garbled row here, silently
        # diverging from the broadcast plan (which rebuilds each row
        # independently) — fail loudly instead
        anchors_per_id = g[g["__pos"] < 0].groupby(id_col, sort=False).size()
        if (anchors_per_id > 1).any():
            dup = anchors_per_id[anchors_per_id > 1].index[0]
            raise ValueError(
                f"paragraph_dedup: id_col {id_col!r} is not unique (e.g. {dup!r}); "
                "the exchange plan requires one row per id"
            )
        real = g[g["__pos"] >= 0]
        agg = real.groupby(id_col, sort=False)["__para"].agg(list)
        out = g[[id_col]].drop_duplicates()
        paras = out[id_col].map(agg)
        out = out.copy()
        out["n_paragraphs_kept"] = paras.map(lambda v: 0 if v is np.nan or isinstance(v, float) else len(v)).astype(np.int64)
        out["text_kept"] = paras.map(lambda v: "" if v is np.nan or isinstance(v, float) else "\n".join(v))
        return out

    return grouped_apply(both, [id_col], reassemble, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr variant, re-expressed
# as two streaming passes instead of a corpus-wide suffix array)
# ---------------------------------------------------------------------------

SUBSTR_NGRAM = 8
SUBSTR_MIN_SPAN_WORDS = 16


def _positional_shingles(words: list[str], k: int) -> np.ndarray:
    """uint64 rolling-polynomial hash of EVERY k-word window, in
    position order (no dedupe — position i hashes words[i:i+k]).
    Case-preserving ws-split words, so kept text reconstructs
    byte-identically for single-space corpora."""
    if len(words) < k:
        return np.empty(0, dtype=np.uint64)
    hs = hashing.word_hashes(words)
    n = len(words) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    base = np.uint64(1099511628211)
    for j in range(k):
        acc = acc * base + hs[j : j + n]
    return acc


def _cut_spans(flags: np.ndarray, k: int, min_span: int) -> np.ndarray:
    """Word-keep mask from per-window duplicate flags: a run of m
    consecutive duplicated k-gram windows covers m+k-1 words; runs
    covering >= min_span words are removed."""
    n_words = len(flags) + k - 1
    keep = np.ones(n_words, dtype=bool)
    i = 0
    while i < len(flags):
        if flags[i]:
            j = i
            while j < len(flags) and flags[j]:
                j += 1
            covered = (j - i) + k - 1
            if covered >= min_span:
                keep[i : j + k - 1] = False
            i = j
        else:
            i += 1
    return keep


def exact_substring_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = SUBSTR_NGRAM,
    min_span_words: int = SUBSTR_MIN_SPAN_WORDS,
    num_buckets: int | None = None,
    broadcast_limit: int | None = None,
    hot_key_count: int = 100_000,
    bloom_bits: int | None = None,
) -> ray.data.Dataset:
    """Remove every >= ``min_span_words``-word span whose ``ngram``-gram
    windows ALL occur more than once in the corpus (including repeats
    within one document, per Lee et al. — every copy of a duplicated
    span is cut, a later mixing stage re-adds one canonical copy if
    wanted). Returns ``(id_col, n_words_kept, n_words_removed,
    text_kept)``.

    Scale shape (no suffix array, no corpus-sized driver state):

    - Pass 1: positional n-gram hashes per doc; each batch emits its
      hash multiset pre-counted (``grouped_sum`` partials), the
      exchange carries (uint64 hash, count) — bounded by distinct
      n-grams, the tf-idf-df bound, NOT total words.
    - Pass 2: duplicated-hash set (count >= 2, counts kept) is
      materialized ONCE and reused by the gate check, the broadcast
      plan, the hot split and the exchange right side (the pass-1
      exchange never re-executes). Broadcast below the gate
      (zero-shuffle flag-and-cut per doc); above it, docs explode to
      (id, window, hash) rows, a forced-exchange ``semi_join`` keeps
      duplicated windows, window lists regroup per doc (small: only
      duplicated windows travel), and a ``left_outer`` join —
      measured-size adaptive, since the per-doc position-list table is
      far smaller than the corpus — hands each doc its dup-window list
      for the same flag-and-cut. ``broadcast_limit=0`` pins
      row-identity between plans end to end.
    - Hot-key bound: a boilerplate window duplicated across ~every doc
      is by definition the hottest key in the semi-join exchange, and
      all its (id, pos, hash) rows would land on one partition. Pass-1
      counts identify windows with >= ``hot_key_count`` occurrences;
      that TINY set is broadcast, ``explode`` skips hot windows (they
      never enter the exchange), and the final cut ORs in a local
      ``np.isin`` against the hot set — same flags, bounded exchange
      (< ``hot_key_count`` rows per surviving key). An over-gate hot
      set degrades to a warning, never a wrong answer.
    - ``bloom_bits`` (opt-in): a fixed-size Bloom filter over the dup
      hashes prefilters the exploded stream — windows PROVABLY not
      duplicated (the overwhelming majority of a real corpus) never
      enter the exchange at all; the maybe-present remainder is
      re-verified exactly. Exact either way (Bloom has no false
      negatives). Trade-off, same as ``joins.semi_join``: the split
      makes two consumers of the exploded stream, so the per-doc
      shingling lineage runs twice — worth it when the exchange, not
      the scan, is the bottleneck (the 100-TB regime).

    Reconstruction joins kept words with single spaces: byte-exact for
    single-space corpora (this repo's tables); general whitespace
    needs span offsets instead — documented limitation."""
    from pdf_extractor_ray import joins
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    if broadcast_limit is None:
        broadcast_limit = joins.BROADCAST_KEY_LIMIT

    narrow = ds.select_columns([id_col, text_col])

    def emit_counts(b: pd.DataFrame) -> pd.DataFrame:
        hs = [_positional_shingles(t.split(), ngram) for t in b[text_col]]
        flat = np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
        uniq, counts = np.unique(flat, return_counts=True)
        return pd.DataFrame({"__h": uniq.astype(np.int64), "n": counts.astype(np.int64)})

    counts = grouped_sum(
        narrow.map_batches(emit_counts, batch_format="pandas"),
        ["__h"],
        ["n"],
        num_buckets=num_buckets,
    )
    # counts kept through the materialization (hot split needs them);
    # one materialize serves every downstream consumer
    dup_m = counts.map_batches(
        lambda b: b.loc[b["n"] >= 2, ["__h", "n"]], batch_format="pandas"
    ).materialize()

    def cut_batch(dup_lookup):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            ids, kept_n, rem_n, texts = [], [], [], []
            for rid, t in zip(b[id_col], b[text_col]):
                words = t.split()
                sh = _positional_shingles(words, ngram)
                flags = dup_lookup(rid, sh)
                keep = _cut_spans(flags, ngram, min_span_words) if len(flags) else np.ones(
                    len(words), dtype=bool
                )
                ids.append(rid)
                kept_n.append(int(keep.sum()))
                rem_n.append(int(len(words) - keep.sum()))
                texts.append(" ".join(w for w, m in zip(words, keep) if m))
            return pd.DataFrame(
                {
                    id_col: ids,
                    "n_words_kept": np.array(kept_n, dtype=np.int64),
                    "n_words_removed": np.array(rem_n, dtype=np.int64),
                    "text_kept": texts,
                }
            )

        return fn

    if broadcast_limit:
        # gate measured with the count column attached — byte-conservative
        # vs keys-only, rows identical
        if joins._fits_broadcast(dup_m, broadcast_limit):
            arr = np.sort(
                np.array(
                    [r["__h"] for r in dup_m.select_columns(["__h"]).take_all()],
                    dtype=np.int64,
                )
            )
            ref = ray.put(arr)

            def lookup(_rid, sh):
                d = joins._cached_get(ref)
                return np.isin(sh.astype(np.int64), d, assume_unique=False)

            return narrow.map_batches(cut_batch(lookup), batch_format="pandas")

    # Exchange plan: explode windows → semi-join dup hashes → per-doc
    # dup-window lists → left-outer join back to docs. Hot windows
    # (>= hot_key_count occurrences) never enter the exchange: they are
    # broadcast and resolved locally in the final cut.
    hot_thresh = max(hot_key_count, 2)
    hot_m = dup_m.map_batches(
        lambda b: b.loc[b["n"] >= hot_thresh, ["__h"]], batch_format="pandas"
    ).materialize()
    if joins._fits_broadcast(hot_m, broadcast_limit or joins.BROADCAST_KEY_LIMIT):
        hot_arr = np.sort(np.array([r["__h"] for r in hot_m.take_all()], dtype=np.int64))
    else:
        import warnings

        warnings.warn(
            f"exact_substring_dedup: hot-window set ({hot_m.count()} hashes with >= "
            f"{hot_thresh} occurrences) exceeds the broadcast gate; the exchange "
            "runs without the skew bound — raise hot_key_count",
            stacklevel=2,
        )
        hot_arr = np.empty(0, dtype=np.int64)
    hot_ref = ray.put(hot_arr)

    # right side of the exchange: every dup hash NOT resolved by the hot
    # broadcast (cheap — derived from the materialized count blocks)
    if len(hot_arr):
        exch_keys = dup_m.map_batches(
            lambda b: b.loc[b["n"] < hot_thresh, ["__h"]], batch_format="pandas"
        ).materialize()
    else:
        exch_keys = dup_m.select_columns(["__h"])
    n_exch = exch_keys.count()

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        hot = joins._cached_get(hot_ref)
        ids, pos, hsl = [], [], []
        for rid, t in zip(b[id_col], b[text_col]):
            sh = _positional_shingles(t.split(), ngram).astype(np.int64)
            if len(hot) and len(sh):
                cold = ~np.isin(sh, hot)
                ps = np.nonzero(cold)[0]
                sh = sh[cold]
            else:
                ps = np.arange(len(sh))
            ids.extend([rid] * len(sh))
            pos.extend(ps.tolist())
            hsl.extend(sh)
        return pd.DataFrame(
            {id_col: ids, "__pos": np.array(pos, dtype=np.int64), "__h": np.array(hsl, dtype=np.int64)}
        )

    if n_exch == 0:
        # every duplicated window (if any) is hot-resolved: no exchange
        # at all — an empty pos_lists would also leave the join's right
        # side schema-less, so skip it outright
        joined = narrow.map_batches(
            lambda b: b.assign(__dup_pos=pd.Series([None] * len(b), dtype="object")),
            batch_format="pandas",
        )
    else:
        dup_windows = joins.semi_join(
            narrow.map_batches(explode, batch_format="pandas"),
            exch_keys,
            "__h",
            keep=True,
            bloom_bits=bloom_bits,
            broadcast_limit=0,
        )

        def collect_positions(g: pd.DataFrame) -> pd.DataFrame:
            # comma-joined string, not a list column: Ray's native hash
            # join (Acero) rejects list-typed non-key payload fields
            agg = g.groupby(id_col, sort=False)["__pos"].agg(
                lambda s: ",".join(str(int(x)) for x in sorted(s))
            )
            return pd.DataFrame({id_col: agg.index, "__dup_pos": agg.to_numpy()})

        pos_lists = grouped_apply(dup_windows, [id_col], collect_positions, num_buckets=num_buckets)
        # pos_lists (one small row per doc WITH dup windows) is usually
        # far below the gate even when the dup-hash set is not — let the
        # measured-size planner decide AGAINST THE CALLER'S OWN LIMIT
        # (a caller bounding broadcasts on memory-tight workers keeps
        # that bound here too); broadcast_limit=0 still forces the
        # exchange everywhere for the plan-identity tests
        joined = joins.adaptive_inner_join(
            narrow,
            pos_lists,
            id_col,
            how="left_outer",
            broadcast_limit=broadcast_limit,
        )

    def cut_joined(b: pd.DataFrame) -> pd.DataFrame:
        hot = joins._cached_get(hot_ref)
        out_rows = {"ids": [], "kept": [], "rem": [], "txt": []}
        for rid, t, dp in zip(b[id_col], b[text_col], b["__dup_pos"]):
            words = t.split()
            n_windows = max(len(words) - ngram + 1, 0)
            flags = np.zeros(n_windows, dtype=bool)
            if isinstance(dp, str) and dp:
                flags[np.array(dp.split(","), dtype=np.int64)] = True
            if len(hot) and n_windows:
                # hot windows bypassed the exchange; flag them locally
                sh = _positional_shingles(words, ngram).astype(np.int64)
                flags |= np.isin(sh, hot)
            keep = _cut_spans(flags, ngram, min_span_words) if n_windows else np.ones(
                len(words), dtype=bool
            )
            out_rows["ids"].append(rid)
            out_rows["kept"].append(int(keep.sum()))
            out_rows["rem"].append(int(len(words) - keep.sum()))
            out_rows["txt"].append(" ".join(w for w, m in zip(words, keep) if m))
        return pd.DataFrame(
            {
                id_col: out_rows["ids"],
                "n_words_kept": np.array(out_rows["kept"], dtype=np.int64),
                "n_words_removed": np.array(out_rows["rem"], dtype=np.int64),
                "text_kept": out_rows["txt"],
            }
        )

    return joined.map_batches(cut_joined, batch_format="pandas")


def substring_dedup_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: exact substring dedup over the documents table
    (single-space texts, so reconstruction is byte-exact). Duplicate
    doc texts guarantee real removals; rows-only driver check, pinned
    by a bit-exact brute-force replica test."""
    return exact_substring_dedup(_read_docs(sf_dir, columns=("doc_id", "text")))


# ------------------------------------------- quality-aware canonical
def canonical_by_quality(
    docs: ray.data.Dataset,
    clusters: ray.data.Dataset,
    *,
    num_buckets: int | None = None,
    batch_size: int = 32768,
) -> ray.data.Dataset:
    """RefinedWeb-style canonical selection: within each near-dup
    cluster keep the HIGHEST-quality member (tie → min doc_id), instead
    of exact dedup's first-writer-wins. ``docs`` must carry
    (doc_id, quality_micro); ``clusters`` (doc_id, cluster_id).

    Argmax-per-key is decomposable — delegated to ``ops.keep_best``
    (max quality, then min doc_id), whose per-batch partial bounds a
    viral cluster's per-bucket load by the batch count, not its member
    count. One join (adaptive: broadcast under the byte gate, hash
    exchange above) + one bucketed exchange on cluster_id."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import keep_best

    joined = adaptive_inner_join(docs, clusters, on="doc_id")
    return keep_best(
        joined,
        ["cluster_id"],
        ["quality_micro", "doc_id"],
        [False, True],
        num_buckets=num_buckets,
        batch_size=batch_size,
    )


def dedup_canonical_documents(sf_dir: str, **kw) -> ray.data.Dataset:
    """Driver carrier: minhash near-dup clusters over documents, then
    quality-aware canonical selection. Rows-only (cluster formation is
    iterative label propagation); pinned by a pandas argmax replica +
    pruning-invariance tests in tests/test_round5.py."""
    from pdf_extractor_ray.kernels import textstats

    clusters = dedup_clusters(sf_dir, **kw)
    docs = _read_docs(sf_dir, columns=("doc_id", "text"))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        raw = b["text"].map(textstats.quality_score_raw).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "quality_micro": np.floor(raw * 1e6 + 0.5).astype(np.int64),
            }
        )

    scored = docs.map_batches(score, batch_format="pandas", batch_size=4096)
    return canonical_by_quality(scored, clusters)


# ---------------------------------------------------------------------------
# Exact set-similarity self-join (distributed prefix filtering)
#
# The exact counterpart to the approximate near-dup family above:
# MinHash/SimHash trade recall for speed; this operator returns EVERY
# pair of documents whose word-set Jaccard similarity meets the
# threshold, with the exact intersection/union sizes. Shape follows the
# published MapReduce set-similarity join (Vernica, Carey, Li — SIGMOD
# 2010) built on the prefix-filter principle (Chaudhuri et al. ICDE'06;
# Bayardo et al. WWW'07): order every token stream by ascending global
# document frequency, and any pair with J >= t must share a token in
# their (L - ceil(t*L) + 1)-prefixes — so candidate generation only
# exchanges the PREFIX tokens (the rarest ~(1-t) fraction), never the
# full posting lists of stopwords.

SETSIM_THRESHOLD_MILLI = 900  # J >= 0.900; single source for fn + SQL
# (the synthetic corpus is template-generated and token-dense: at 0.6
# over half of ALL pairs qualify — 0.9 keeps the answer a near-dup set)
_SETSIM_SEP = "\x1f"  # never inside a token: str.split() splits on \x1f


def setsim_join(
    docs: ray.data.Dataset,
    threshold_milli: int = SETSIM_THRESHOLD_MILLI,
    *,
    broadcast_limit: int | None = None,
    num_buckets: int | None = None,
    max_prefix_group: int = 4096,
) -> ray.data.Dataset:
    """All pairs (doc_a < doc_b) with word-set Jaccard >= t, exact.

    Distributed plan (one df exchange + one doc_id exchange + one word
    exchange + two adaptive joins — nothing corpus-sized touches the
    driver):

    1. per-doc profile: distinct word set -> (doc_id, set_size, toks)
       with ``toks`` a \\x1f-joined string (Acero joins reject list
       payload columns; a control-char join is loss-free because the
       tokenizer splits on \\x1f).
    2. global document frequency per word: per-batch partial +
       ``grouped_sum`` (vocab-sized, stays in the cluster).
    3. prefix emission: explode distinct (doc_id, word, set_size),
       attach df via the byte-gated ``adaptive_inner_join``, then one
       bucketed exchange on doc_id ranks each doc's tokens by
       (df, word) and keeps the first L - ceil(t*L/1000) + 1 — the
       prefix-filter guarantee (rank is vectorized cumcount, no row
       loop).
    4. candidate pairs: one bucketed exchange on word; inside a word
       group the pair grid is numpy ``triu_indices`` with the exact
       length filter min*1000 >= t*max applied before emission.
       ``max_prefix_group`` guards the O(G^2) grid — G is the df of a
       PREFIX token, rare by construction; a corpus where a rare-rank
       token still exceeds it needs a higher threshold or shingled
       keys, and the raise says so.
    5. verify: pairs are deduped (``distinct``), both profiles attach
       via two adaptive joins, and the exact integer test
       inter*1000 >= t_milli*(sa+sb-inter) filters — bit-identical to
       the DuckDB oracle (SETSIM_SQL), no float anywhere.

    Scale note: candidate volume is driven by prefix-token df, so the
    operator degrades gracefully on stopword-heavy corpora (stopwords
    land at the END of the (df, word) order and never enter short
    prefixes). Near-identical mega-clusters (G identical docs) emit
    G^2/2 TRUE pairs — that is the answer's size, not an artifact.
    """
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import distinct, grouped_sum

    tm = int(threshold_milli)
    if not (0 < tm <= 1000):
        raise ValueError(f"threshold_milli must be in (0, 1000], got {tm}")
    sep = _SETSIM_SEP

    def profile(b: pd.DataFrame) -> pd.DataFrame:
        ids, szs, toks = [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            ws = sorted(set(t.split()))
            if not ws:
                continue
            ids.append(int(doc_id))
            szs.append(len(ws))
            toks.append(sep.join(ws))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "set_size": np.asarray(szs, dtype=np.int64),
                "toks": pd.Series(toks, dtype=object),
            }
        )

    profiles = docs.map_batches(profile, batch_format="pandas", batch_size=4096)

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b["text"]:
            for w in set(t.split()):
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame(
            {
                "word": list(counts),
                "df": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    df_ds = grouped_sum(
        docs.map_batches(df_partial, batch_format="pandas", batch_size=8192),
        ["word"],
        ["df"],
        num_buckets=8,
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, words, szs = [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            ws = set(t.split())
            for w in ws:
                ids.append(int(doc_id))
                words.append(w)
                szs.append(len(ws))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "word": pd.Series(words, dtype=object),
                "set_size": np.asarray(szs, dtype=np.int64),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pandas", batch_size=4096)
    with_df = adaptive_inner_join(exploded, df_ds, on="word", broadcast_limit=broadcast_limit)

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "df", "word"], kind="mergesort")
        rank = g.groupby("doc_id", sort=False).cumcount().to_numpy()
        size = g["set_size"].to_numpy()
        p = size - (tm * size + 999) // 1000 + 1
        keep = rank < p
        return pd.DataFrame(
            {
                "word": g["word"].to_numpy()[keep],
                "doc_id": g["doc_id"].to_numpy()[keep],
                "set_size": size[keep],
            }
        )

    prefix_rows = grouped_apply(with_df, ["doc_id"], prefix, num_buckets=num_buckets)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for word, grp in g.groupby("word", sort=False):
            n = len(grp)
            if n < 2:
                continue
            if n > max_prefix_group:
                raise ValueError(
                    f"setsim_join: prefix token {word!r} appears in {n} prefixes "
                    f"(> max_prefix_group={max_prefix_group}); the O(G^2) pair grid "
                    "would not fit one worker. Raise the threshold, pre-shingle the "
                    "text, or raise max_prefix_group if the worker heap allows."
                )
            order = np.argsort(grp["doc_id"].to_numpy(), kind="stable")
            ids = grp["doc_id"].to_numpy()[order]
            szs = grp["set_size"].to_numpy()[order]
            i, j = np.triu_indices(n, k=1)
            sa, sb = szs[i], szs[j]
            ok = np.minimum(sa, sb) * 1000 >= tm * np.maximum(sa, sb)
            outs.append(pd.DataFrame({"doc_a": ids[i][ok], "doc_b": ids[j][ok]}))
        if not outs:
            return pd.DataFrame(
                {"doc_a": np.array([], dtype=np.int64), "doc_b": np.array([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    cands = distinct(
        grouped_apply(prefix_rows, ["word"], pairs, num_buckets=num_buckets),
        ["doc_a", "doc_b"],
        num_buckets=num_buckets,
    )

    def _rename(names: list[str]):
        def fn(t):
            return t.rename_columns(names)

        return fn

    prof_a = profiles.map_batches(_rename(["doc_id", "size_a", "toks_a"]), batch_format="pyarrow")
    prof_b = profiles.map_batches(_rename(["doc_id", "size_b", "toks_b"]), batch_format="pyarrow")
    j1 = adaptive_inner_join(cands, prof_a, on="doc_a", right_on="doc_id", broadcast_limit=broadcast_limit)
    j2 = adaptive_inner_join(j1, prof_b, on="doc_b", right_on="doc_id", broadcast_limit=broadcast_limit)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_a, doc_b, sa, ta, sb, tb in zip(
            b["doc_a"], b["doc_b"], b["size_a"], b["toks_a"], b["size_b"], b["toks_b"]
        ):
            inter = len(set(ta.split(sep)) & set(tb.split(sep)))
            uni = int(sa) + int(sb) - inter
            if inter * 1000 >= tm * uni:
                rows.append((int(doc_a), int(doc_b), inter, uni))
        return pd.DataFrame(
            rows, columns=["doc_a", "doc_b", "inter_size", "union_size"]
        ).astype("int64")

    out = j2.map_batches(verify, batch_format="pandas", batch_size=2048)
    return out.sort(["doc_a", "doc_b"])


def setsim_join_documents(
    sf_dir: str, threshold_milli: int = SETSIM_THRESHOLD_MILLI
) -> ray.data.Dataset:
    """Driver carrier: exact Jaccard set-similarity self-join over the
    documents table (word sets, J >= SETSIM_THRESHOLD_MILLI/1000)."""
    return setsim_join(_read_docs(sf_dir, ("doc_id", "text")), threshold_milli)


def _setsim_sql() -> str:
    from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

    tw = trim_ws_sql("text")
    return f"""
WITH toks AS (
    SELECT DISTINCT doc_id, w AS word
    FROM (
        SELECT doc_id, unnest(regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}')) AS w
        FROM documents
        WHERE length({tw}) > 0
    )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter_size
    FROM toks a JOIN toks b ON a.word = b.word AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter_size,
       CAST(sa.sz + sb.sz - i.inter_size AS BIGINT) AS union_size
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter_size * 1000 >= {SETSIM_THRESHOLD_MILLI} * (sa.sz + sb.sz - i.inter_size)
ORDER BY doc_a, doc_b
"""


SETSIM_SQL = _setsim_sql()


# ---------------------------------------------------------------------------
# Winnowing fingerprint pairs (Schleimer, Wilkerson & Aiken 2003 — the
# MOSS selection rule)
# ---------------------------------------------------------------------------


def winnow_pairs(
    sf_dir: str,
    *,
    shingle_k: int = 4,
    window_w: int = 4,
    min_shared: int = 2,
    max_bucket_docs: int = 1000,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs by SHARED WINNOWING FINGERPRINTS:
    positional k-gram hashes → per-window rightmost-min selection
    (``kernels.hashing.winnow_select``; any shared run of ≥ w+k-1
    words guarantees a shared fingerprint) → explode (fingerprint,
    doc) → per-fingerprint pair emission → shared-count fold. Output
    ``(doc_a, doc_b, n_shared)`` with doc_a < doc_b and n_shared ≥
    ``min_shared``. Complements MinHash-LSH: winnowing detects LOCAL
    overlap (a shared paragraph inside otherwise-different pages, the
    plagiarism/AB-template case) that whole-document Jaccard dilutes
    away.

    Scale shape: fingerprints are ~1/((w+1)/2) of k-grams (the
    winnowing density bound), deduped per doc before the exchange; the
    one exchange groups by fingerprint; a boilerplate fingerprint
    shared by > ``max_bucket_docs`` docs is DROPPED with a warning
    before the O(g²) pair loop (a fingerprint that common identifies
    boilerplate, not plagiarism — same judgment as the LSH viral-key
    bound), keeping every group's pair emission bounded."""
    import os
    import warnings

    from pdf_extractor_ray.kernels.hashing import positional_shingle_hashes, winnow_select
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def fps(b: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            sel = winnow_select(positional_shingle_hashes(t, shingle_k), window_w)
            ids.extend([int(doc_id)] * len(sel))
            hs.append(sel)
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        return pd.DataFrame(
            {
                "fp": h.view(np.int64),  # bit-reinterpret uint64 → int64 key
                "doc_id": np.asarray(ids, dtype=np.int64),
            }
        )

    rows = ds.map_batches(fps, batch_format="pandas", batch_size=2048)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, grp in g.groupby("fp", sort=False):
            docs = np.unique(grp["doc_id"].to_numpy(np.int64))
            if len(docs) < 2:
                continue
            if len(docs) > max_bucket_docs:
                warnings.warn(
                    f"winnow_pairs: fingerprint shared by {len(docs)} docs "
                    f"> max_bucket_docs={max_bucket_docs}; dropped as boilerplate"
                )
                continue
            ia, ib = np.triu_indices(len(docs), k=1)
            outs_a.append(docs[ia])
            outs_b.append(docs[ib])
        if not outs_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "n_shared": pd.Series([], dtype="int64"),
                }
            )
        a = np.concatenate(outs_a)
        return pd.DataFrame(
            {"doc_a": a, "doc_b": np.concatenate(outs_b), "n_shared": np.ones(len(a), np.int64)}
        )

    pair_counts = grouped_sum(
        grouped_apply(rows, ["fp"], per_bucket), ["doc_a", "doc_b"], ["n_shared"]
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["n_shared"] >= min_shared]

    return pair_counts.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4 three-sentence-span dedup (Raffel et al. 2020 §2.2: "we discard all
# but one of any three-sentence span occurring more than once")
# ---------------------------------------------------------------------------

SPAN_POS_CAP = 1 << 20  # occurrence key = id * CAP + pos; pos bound


def span_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    segmenter=None,
    span: int = 3,
    min_occurrences: int = 2,
    num_buckets: int | None = None,
    broadcast_limit: int | None = None,
    hot_span_occurrences: int = 100_000,
) -> ray.data.Dataset:
    """C4's span-level dedup: hash every consecutive ``span``-sentence
    window; for a window text occurring at >= ``min_occurrences``
    locations corpus-wide, the single WINNER occurrence — the smallest
    ``(id, position)`` — keeps its sentences, and every sentence
    covered by any LOSER occurrence is deleted from its document.
    Returns one row per input document: ``(id_col, n_sentences_kept,
    text_kept)`` with survivors re-joined by newline in original
    order. ``id_col`` must be UNIQUE int64 (the winner rule needs a
    total order on occurrences; ids must stay below 2^43 so the
    ``id * 2^20 + pos`` occurrence key fits int64 — both raise).

    Scale shape (mirrors :func:`paragraph_dedup`, which audits the
    same two-pass design at the paragraph granularity):

    - Pass 1: each doc emits its span-hash occurrences ``(hash, key)``;
      a bucketed ``grouped_agg`` reduces to per-hash ``(n_occ,
      min_key)`` — 16-byte hashes + two int64s on the exchange, never
      span text; per-batch partials bound a viral span to one row per
      batch. The duplicated-span table (boilerplate-sized) is
      materialized ONCE and reused by every plan branch below.
    - Below the rows+bytes gate the ``{hash: winner}`` dict broadcasts
      and the rebuild is one zero-shuffle ``map_batches``. Above it
      (``broadcast_limit=0`` forces this; tests pin plan identity):
      loser occurrences come from an ``adaptive_inner_join`` on the
      hash, explode to deleted ``(id*CAP + pos)`` keys, and a
      distributed anti ``semi_join`` drops those sentences before a
      bucketed per-doc reassembly — the dup table never lands on the
      driver.
    - Hot-span bound: a viral span (licence boilerplate in ~every doc)
      would route all its occurrence rows to one loser-join partition.
      Spans with ``n_occ >= hot_span_occurrences`` are split into a
      TINY ``{hash: winner}`` broadcast resolved inside both explodes
      (losers pre-drop their sentences locally; the winner passes) —
      exact, since the winner rule needs only the span's own
      ``min_key``. If even the hot set exceeds the gate the split
      degrades to a warning, never a wrong answer.
    """
    from pdf_extractor_ray import joins
    from pdf_extractor_ray.ops import distinct, grouped_agg

    if segmenter is None:
        from pdf_extractor_ray.kernels.textstats import split_sentences as segmenter

    if broadcast_limit is None:
        broadcast_limit = joins.BROADCAST_KEY_LIMIT

    narrow = ds.select_columns([id_col, text_col])

    def occurrence_key(i: int, pos: int) -> int:
        if pos >= SPAN_POS_CAP:
            raise ValueError(f"span_dedup: position {pos} >= {SPAN_POS_CAP}")
        if i >= (1 << 43):
            raise ValueError(f"span_dedup: id {i} >= 2^43; occurrence key overflows")
        return i * SPAN_POS_CAP + pos

    def doc_spans(text: str):
        sents = segmenter(text)
        for i in range(len(sents) - span + 1):
            yield i, hashing.content_hash("\n".join(sents[i : i + span]))

    def emit_occurrences(b: pd.DataFrame) -> pd.DataFrame:
        hs, keys = [], []
        for i, t in zip(b[id_col], b[text_col]):
            d = int(i)
            for pos, h in doc_spans(t):
                hs.append(h)
                keys.append(occurrence_key(d, pos))
        return pd.DataFrame({"__sh": hs, "__key": np.array(keys, dtype=np.int64)})

    counts = grouped_agg(
        narrow.map_batches(emit_occurrences, batch_format="pandas"),
        ["__sh"],
        {"n_occ": ("__sh", "count"), "min_key": ("__key", "min")},
        num_buckets=num_buckets,
    )
    dup_m = counts.map_batches(
        lambda b: b.loc[b["n_occ"] >= min_occurrences, ["__sh", "n_occ", "min_key"]],
        batch_format="pandas",
    ).materialize()

    def rebuild_with(dup: dict):
        def rebuild(b: pd.DataFrame) -> pd.DataFrame:
            n_kept, texts = [], []
            for i, t in zip(b[id_col], b[text_col]):
                d = int(i)
                sents = segmenter(t)
                deleted: set[int] = set()
                for pos in range(len(sents) - span + 1):
                    h = hashing.content_hash("\n".join(sents[pos : pos + span]))
                    wk = dup.get(h)
                    if wk is not None and occurrence_key(d, pos) != wk:
                        deleted.update(range(pos, pos + span))
                kept = [s for j, s in enumerate(sents) if j not in deleted]
                n_kept.append(len(kept))
                texts.append("\n".join(kept))
            return pd.DataFrame(
                {
                    id_col: b[id_col],
                    "n_sentences_kept": np.array(n_kept, dtype=np.int64),
                    "text_kept": texts,
                }
            )

        return rebuild

    if broadcast_limit and joins._fits_broadcast(dup_m, broadcast_limit):
        dup_ref = ray.put({r["__sh"]: r["min_key"] for r in dup_m.take_all()})

        def rebuild_bc(b: pd.DataFrame) -> pd.DataFrame:
            return rebuild_with(joins._cached_get(dup_ref))(b)

        return narrow.map_batches(rebuild_bc, batch_format="pandas")

    # Exchange plan. No duplicated span at all (dup_m is materialized,
    # so the count is metadata-free) → the rebuild is the identity;
    # skipping the joins here also sidesteps Ray 2.49's native hash
    # join rejecting an all-empty right side.
    if dup_m.count() == 0:
        return narrow.map_batches(rebuild_with({}), batch_format="pandas")

    # Hot split next: viral spans resolve via a tiny broadcast winner
    # dict inside both explodes.
    hot_m = dup_m.map_batches(
        lambda b: b.loc[b["n_occ"] >= hot_span_occurrences, ["__sh", "min_key"]],
        batch_format="pandas",
    ).materialize()
    if joins._fits_broadcast(hot_m, broadcast_limit or joins.BROADCAST_KEY_LIMIT):
        hot = {r["__sh"]: r["min_key"] for r in hot_m.take_all()}
    else:
        import warnings

        warnings.warn(
            f"span_dedup: hot-span set ({hot_m.count()} hashes in >= "
            f"{hot_span_occurrences} locations) exceeds the broadcast gate; "
            "the exchange runs without the skew bound — raise "
            "hot_span_occurrences",
            stacklevel=2,
        )
        hot = {}
    hot_ref = ray.put(hot)

    def emit_cold_occurrences(b: pd.DataFrame) -> pd.DataFrame:
        h_dict = joins._cached_get(hot_ref)
        hs, keys = [], []
        for i, t in zip(b[id_col], b[text_col]):
            d = int(i)
            for pos, h in doc_spans(t):
                if h in h_dict:  # resolved locally in the sentence explode
                    continue
                hs.append(h)
                keys.append(occurrence_key(d, pos))
        return pd.DataFrame({"__sh": hs, "__key": np.array(keys, dtype=np.int64)})

    if hot and hot_m.count() == dup_m.count():
        # every duplicated span is hot → fully resolved inside the
        # sentence explode; both joins would be no-ops (and the cold
        # loser-join's sides could be all-empty, which the native hash
        # join rejects)
        losers = None
    else:
        losers = joins.adaptive_inner_join(
            narrow.map_batches(emit_cold_occurrences, batch_format="pandas"),
            dup_m.select_columns(["__sh", "min_key"]),
            "__sh",
            broadcast_limit=broadcast_limit,
        ).map_batches(
            lambda b: b.loc[b["__key"] != b["min_key"], ["__key"]], batch_format="pandas"
        )

    def explode_deleted(b: pd.DataFrame) -> pd.DataFrame:
        k = b["__key"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"__dk": np.concatenate([k + i for i in range(span)]) if len(k) else
             np.array([], dtype=np.int64)}
        )

    # The deleted-key set can be legitimately EMPTY (the hot split may
    # resolve every duplicated span), and zero-row pandas blocks lose
    # their schema on Ray 2.49 — the hash-join side of the anti
    # semi_join then raises. Same fix as bfs_depth: re-type non-empty
    # blocks to arrow and compact by block metadata, with a typed empty
    # fallback. The materialize is bounded by duplicated-text volume
    # (the exchange plan already materialized dup_m upstream).
    import pyarrow as _pa

    from pdf_extractor_ray.ops import compact_nonempty_arrow

    def _dk_arrow(b: pd.DataFrame):
        return _pa.table({"__dk": _pa.array(b["__dk"].to_numpy(dtype=np.int64), _pa.int64())})

    if losers is None:
        del_keys = ray.data.from_arrow(_pa.table({"__dk": _pa.array([], _pa.int64())}))
    else:
        del_keys = compact_nonempty_arrow(
            distinct(
                losers.map_batches(explode_deleted, batch_format="pandas"), ["__dk"],
                num_buckets=num_buckets,
            ).map_batches(_dk_arrow, batch_format="pandas"),
            _pa.table({"__dk": _pa.array([], _pa.int64())}),
        )

    def explode_sentences(b: pd.DataFrame) -> pd.DataFrame:
        h_dict = joins._cached_get(hot_ref)
        ids, pos_l, sent_l, dks = [], [], [], []
        for i, t in zip(b[id_col], b[text_col]):
            d = int(i)
            sents = segmenter(t)
            deleted: set[int] = set()
            if h_dict:
                for pos in range(len(sents) - span + 1):
                    h = hashing.content_hash("\n".join(sents[pos : pos + span]))
                    wk = h_dict.get(h)
                    if wk is not None and occurrence_key(d, pos) != wk:
                        deleted.update(range(pos, pos + span))
            for j, s in enumerate(sents):
                if j in deleted:
                    continue
                ids.append(d)
                pos_l.append(j)
                sent_l.append(s)
                dks.append(occurrence_key(d, j))
        return pd.DataFrame(
            {
                id_col: np.array(ids, dtype=np.int64),
                "__pos": np.array(pos_l, dtype=np.int64),
                "__sent": sent_l,
                "__dk": np.array(dks, dtype=np.int64),
            }
        )

    sent_rows = narrow.map_batches(explode_sentences, batch_format="pandas")
    # del_keys is already materialized (compact above), so the count is
    # block-metadata-free; an empty deleted set (hot split resolved
    # every duplicated span) skips the anti-join — Ray 2.49's native
    # hash join cannot take an all-empty right side even when typed.
    if del_keys.count() == 0:
        kept_rows = sent_rows
    else:
        kept_rows = joins.semi_join(
            sent_rows,
            del_keys,
            "__dk",
            keep=False,
            broadcast_limit=broadcast_limit,
        )

    def anchor(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(dtype=np.int64),
                "__pos": np.full(n, -1, dtype=np.int64),
                "__sent": [""] * n,
                "__dk": np.full(n, -1, dtype=np.int64),
            }
        )

    both = kept_rows.union(ds.select_columns([id_col]).map_batches(anchor, batch_format="pandas"))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "__pos"], kind="stable")
        anchors_per_id = g[g["__pos"] < 0].groupby(id_col, sort=False).size()
        if (anchors_per_id > 1).any():
            dup_id = anchors_per_id[anchors_per_id > 1].index[0]
            raise ValueError(
                f"span_dedup: id_col {id_col!r} is not unique (e.g. {dup_id!r}); "
                "the exchange plan requires one row per id"
            )
        real = g[g["__pos"] >= 0]
        agg = real.groupby(id_col, sort=False)["__sent"].agg(list)
        out = g[[id_col]].drop_duplicates().copy()
        sents = out[id_col].map(agg)
        out["n_sentences_kept"] = sents.map(
            lambda v: 0 if isinstance(v, float) else len(v)
        ).astype(np.int64)
        out["text_kept"] = sents.map(lambda v: "" if isinstance(v, float) else "\n".join(v))
        return out

    return grouped_apply(both, [id_col], reassemble, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Content-defined chunking (gear-hash CDC) + chunk-level dedup stats
# ---------------------------------------------------------------------------

# Deterministic shared licence tail appended by the CDC carrier: every
# derived doc ends with the same ~2 KB block, so cross-document
# duplicated chunks GENUINELY occur and the dedup-ratio op has real
# signal — the boilerplate-tail situation (licence footers, cookie
# banners) CDC chunking exists to catch at storage scale.
_CDC_TAIL = (
    "\nSPDX-License-Identifier: Example-1.0 - Permission is hereby "
    "granted, free of charge, to any person obtaining a copy of this "
    "corpus, to deal in the corpus without restriction, subject to "
    "the following conditions apply. " * 12
)


def cdc_chunks_documents(
    sf_dir: str, *, avg_bits: int = 8, min_len: int = 64, max_len: int = 1024
) -> ray.data.Dataset:
    """Content-defined chunks per document: ``(doc_id, chunk_idx,
    start, length, chunk_hash)`` over ``text + shared licence tail``
    (see ``_CDC_TAIL``). Rows-only (a 64-byte-window rolling hash is
    not SQL-expressible without a per-byte recursive CTE); pinned by a
    reset-semantics scalar replica and resync/bounds property tests.

    Scale shape: chunking is a vectorized per-batch map (64 shifted
    numpy adds, no per-byte Python loop), zero shuffle; the chunk
    table is the input to hash-keyed dedup exchanges
    (:func:`cdc_dedup_stats`)."""
    from pdf_extractor_ray.kernels import cdc

    ds = _read_docs(sf_dir, ("doc_id", "text"))

    def chunk(b: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, starts, lens, hashes = [], [], [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            data = (text + _CDC_TAIL).encode("utf-8")
            for i, (s, ln, h) in enumerate(
                cdc.cdc_chunks(data, avg_bits=avg_bits, min_len=min_len, max_len=max_len)
            ):
                ids.append(int(doc_id))
                idxs.append(i)
                starts.append(s)
                lens.append(ln)
                hashes.append(h)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "start": pd.Series(starts, dtype="int64"),
                "length": pd.Series(lens, dtype="int64"),
                "chunk_hash": pd.Series(hashes, dtype="object"),
            }
        )

    return ds.map_batches(chunk, batch_format="pandas", batch_size=1024)


def cdc_dedup_stats(
    sf_dir: str, *, avg_bits: int = 8, min_len: int = 64, max_len: int = 1024
) -> ray.data.Dataset:
    """Chunk-level dedup ratio: how many bytes of the corpus are
    duplicated at CDC-chunk granularity — the storage-dedup headline
    number (and a cheap cross-document boilerplate detector: shared
    licence/footer regions re-align to identical chunk hashes even at
    different offsets). One row: ``(n_chunks, n_distinct_chunks,
    total_bytes, distinct_bytes, dup_byte_per_milli)``.

    Scale shape: per-batch partials (chunk_hash counts) → ONE exchange
    keyed on the 8-byte chunk hash → a global aggregate over the
    per-hash table; integer milli-units, no float drift."""
    from ray.data.aggregate import Count, Max, Sum

    chunks = cdc_chunks_documents(sf_dir, avg_bits=avg_bits, min_len=min_len, max_len=max_len)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("chunk_hash", as_index=False).agg(
            n=("chunk_hash", "size"), bytes_sum=("length", "sum"), length=("length", "max")
        )
        return g

    per_hash = (
        chunks.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("chunk_hash")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("bytes_sum", alias_name="bytes_sum"),
            Max("length", alias_name="length"),
        )
    )
    agg = per_hash.aggregate(
        Count(alias_name="n_distinct_chunks"),
        Sum("n", alias_name="n_chunks"),
        Sum("bytes_sum", alias_name="total_bytes"),
        Sum("length", alias_name="distinct_bytes"),
    )
    total = int(agg["total_bytes"])
    distinct = int(agg["distinct_bytes"])
    row = {
        "n_chunks": int(agg["n_chunks"]),
        "n_distinct_chunks": int(agg["n_distinct_chunks"]),
        "total_bytes": total,
        "distinct_bytes": distinct,
        "dup_byte_per_milli": ((total - distinct) * 1000) // total if total else 0,
    }
    return ray.data.from_items([row])


# ---------------------------------------------------------------------------
# Mirror-host detection + dup-cluster size histogram (content-identity audit)
# ---------------------------------------------------------------------------

# Universal boilerplate doc planted on EVERY host of the derived mirror
# corpus: a content hash shared by all hosts is boilerplate, not
# mirroring, and must be dropped by the max_hosts cap (C(n_hosts, 2)
# pair fan-out is exactly the viral-key failure the cap exists for).
_MIRROR_TOS_TEXT = "BOILER terms of service all rights reserved contact webmaster"
_MIRROR_N_HOSTS = 7


def derive_mirror_corpus(b: pd.DataFrame) -> pd.DataFrame:
    """(host, text) rows: each doc lives on host ``h{doc_id % 7}``;
    every 3rd doc is MIRRORED verbatim onto ``h{(doc_id + 2) % 7}``;
    plus one shared terms-of-service doc per host (first batch only —
    keyed off doc_id 0 so the derive stays stateless/deterministic
    under any batching)."""
    hosts, texts = [], []
    for doc_id, text in zip(b["doc_id"], b["text"]):
        d = int(doc_id)
        hosts.append(f"h{d % _MIRROR_N_HOSTS}.example.com")
        texts.append(text)
        if d % 3 == 0:
            hosts.append(f"h{(d + 2) % _MIRROR_N_HOSTS}.example.com")
            texts.append(text)
        if d == 0:
            for k in range(_MIRROR_N_HOSTS):
                hosts.append(f"h{k}.example.com")
                texts.append(_MIRROR_TOS_TEXT)
    return pd.DataFrame(
        {"host": pd.Series(hosts, dtype="object"), "text": pd.Series(texts, dtype="object")}
    )


def _mirror_corpus(sf_dir: str) -> ray.data.Dataset:
    return _read_docs(sf_dir, ("doc_id", "text")).map_batches(
        derive_mirror_corpus, batch_format="pandas", batch_size=1024
    )


def mirror_hosts(
    corpus: ray.data.Dataset, *, min_shared: int = 1, max_hosts: int = 5
) -> ray.data.Dataset:
    """Host pairs serving identical content: ``(host_a, host_b,
    n_shared)`` with ``host_a < host_b`` — the mirror/spam-farm signal
    a crawl dedup pass keys on (Common Crawl's host-level dedup does
    exactly this before fetch scheduling). A content hash present on
    more than ``max_hosts`` hosts is boilerplate (cookie banners,
    licence pages), not mirroring, and is dropped BEFORE the pair
    fan-out — that cap is what bounds the C(n,2) emission per hash.

    Scale shape: 16-byte content hash per row (bodies never shuffle) →
    distinct (hash, host) → per-hash group emits C(h≤max_hosts, 2)
    pairs → grouped count keyed by the pair. Two exchanges, both on
    small keys."""
    from pdf_extractor_ray.ops import distinct, grouped_apply, grouped_sum

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"__h": b["text"].map(hashing.content_hash), "host": b["host"]}
        )

    hh = distinct(corpus.map_batches(add_hash, batch_format="pandas"), ["__h", "host"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # g is one BUCKET (many hashes) — group per hash inside
        a_out, b_out = [], []
        for _h, sub in g.groupby("__h", sort=False):
            hosts = sorted(sub["host"])
            if len(hosts) < 2 or len(hosts) > max_hosts:
                continue  # singleton, or boilerplate shared too widely
            for i in range(len(hosts)):
                for j in range(i + 1, len(hosts)):
                    a_out.append(hosts[i])
                    b_out.append(hosts[j])
        return pd.DataFrame({"host_a": pd.Series(a_out, dtype="object"),
                             "host_b": pd.Series(b_out, dtype="object"),
                             "n_shared": pd.Series([1] * len(a_out), dtype="int64")})

    emitted = grouped_apply(hh, ["__h"], pairs)
    out = grouped_sum(emitted, ["host_a", "host_b"], ["n_shared"])
    if min_shared > 1:
        out = out.map_batches(
            lambda b: b[b["n_shared"] >= min_shared], batch_format="pandas"
        )
    return out


def mirror_hosts_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: mirror detection over the derived multi-host
    corpus. The planted all-host ToS doc would emit C(7,2)=21 bogus
    pairs if the boilerplate cap were dead — the oracle counts only
    the genuine mirrored docs, so the cap is correctness-checked."""
    return mirror_hosts(_mirror_corpus(sf_dir))


MIRROR_HOSTS_SQL = """
WITH m AS (
  SELECT LEAST('h' || CAST(doc_id % 7 AS VARCHAR), 'h' || CAST((doc_id + 2) % 7 AS VARCHAR))
             || '.example.com' AS host_a,
         GREATEST('h' || CAST(doc_id % 7 AS VARCHAR), 'h' || CAST((doc_id + 2) % 7 AS VARCHAR))
             || '.example.com' AS host_b
  FROM documents WHERE doc_id % 3 = 0
)
SELECT host_a, host_b, COUNT(*) AS n_shared FROM m GROUP BY host_a, host_b
"""


def dup_cluster_sizes(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Exact-dup cluster-size histogram: ``(cluster_size, n_clusters)``
    — the first chart a dedup audit draws (how much of the corpus is
    singletons vs mirrored pairs vs viral boilerplate; the size-k tail
    decides whether exact dedup alone is worth running). Clusters are
    exact text identity via the 128-bit content hash.

    Scale shape: hash per row → per-batch partial counts → grouped_sum
    keyed by hash (per-hash cluster size) → grouped_sum keyed by SIZE
    (key space = number of distinct sizes). Bodies never shuffle; the
    second exchange is trivially small."""
    from pdf_extractor_ray.ops import grouped_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b["text"].map(hashing.content_hash).value_counts()
        return pd.DataFrame({"__h": g.index, "n": g.to_numpy(np.int64)})

    per_hash = grouped_sum(
        corpus.map_batches(partial, batch_format="pandas"), ["__h"], ["n"]
    )

    def to_hist(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"cluster_size": b["n"].to_numpy(np.int64),
             "n_clusters": np.ones(len(b), np.int64)}
        )

    return grouped_sum(
        per_hash.map_batches(to_hist, batch_format="pandas"), ["cluster_size"], ["n_clusters"]
    )


def dup_cluster_sizes_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: cluster-size histogram over the mirror corpus
    (singletons + planted pairs + one 7-host boilerplate cluster)."""
    return dup_cluster_sizes(_mirror_corpus(sf_dir))


DUP_CLUSTER_SIZES_SQL = f"""
WITH corpus AS (
  SELECT text FROM documents
  UNION ALL SELECT text FROM documents WHERE doc_id % 3 = 0
  UNION ALL SELECT '{_MIRROR_TOS_TEXT}' FROM generate_series(1, {_MIRROR_N_HOSTS})
),
c AS (SELECT COUNT(*) AS sz FROM corpus GROUP BY text)
SELECT CAST(sz AS BIGINT) AS cluster_size, COUNT(*) AS n_clusters FROM c GROUP BY sz
"""


def host_dup_ratio(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Per-host mirrored-content ratio: ``(host, n_docs, n_mirrored,
    mirrored_per_milli)`` where a doc is *mirrored* if its exact
    content appears on ≥ 2 distinct hosts — the host-level spam/mirror
    score domain curation ranks on (a host serving mostly other
    hosts' content is a scraper farm). Integer milli-units, no float
    drift.

    Scale shape: 16-byte content hash per row → distinct (hash, host)
    → grouped count = hosts-per-hash (per-batch partials bound viral
    boilerplate to one row per batch) → adaptive join hash-table back
    onto the (hash, host) rows (byte-gated broadcast vs exchange) →
    per-host grouped sum. No C(n,2) emission anywhere, so no cap is
    needed — a hash on a million hosts contributes one joined row per
    (hash, host), not a million-squared pair fan-out."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import distinct, grouped_sum

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__h": b["text"].map(hashing.content_hash), "host": b["host"]})

    hashed = corpus.map_batches(add_hash, batch_format="pandas")
    hh = distinct(hashed, ["__h", "host"])

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__h": b["__h"], "n_hosts": np.ones(len(b), np.int64)})

    hosts_per_hash = grouped_sum(hh.map_batches(ones, batch_format="pandas"), ["__h"], ["n_hosts"])

    joined = adaptive_inner_join(hashed, hosts_per_hash, on="__h")

    def per_host_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": b["host"],
                "n_docs": np.ones(len(b), np.int64),
                "n_mirrored": (b["n_hosts"].to_numpy(np.int64) >= 2).astype(np.int64),
            }
        )

    per_host = grouped_sum(
        joined.map_batches(per_host_partial, batch_format="pandas"), ["host"], ["n_docs", "n_mirrored"]
    )

    def ratio(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["mirrored_per_milli"] = (
            b["n_mirrored"].to_numpy(np.int64) * 1000 // b["n_docs"].to_numpy(np.int64)
        )
        return b

    return per_host.map_batches(ratio, batch_format="pandas")


def host_dup_ratio_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: mirrored-content ratio per host over the derived
    mirror corpus (every 3rd doc mirrored cross-host, one all-host ToS
    doc — which COUNTS as mirrored here, unlike :func:`mirror_hosts`
    where it is capped out of the pair fan-out: a ratio sums one row
    per doc, so boilerplate is signal, not a fan-out hazard)."""
    return host_dup_ratio(_mirror_corpus(sf_dir))


HOST_DUP_RATIO_SQL = f"""
WITH corpus AS (
  SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host, text FROM documents
  UNION ALL
  SELECT 'h' || CAST((doc_id + 2) % 7 AS VARCHAR) || '.example.com', text
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'h' || CAST(gs - 1 AS VARCHAR) || '.example.com', '{_MIRROR_TOS_TEXT}'
  FROM generate_series(1, {_MIRROR_N_HOSTS}) AS t(gs)
),
nh AS (
  SELECT text, COUNT(DISTINCT host) AS n_hosts FROM corpus GROUP BY text
),
d AS (
  SELECT c.host, CASE WHEN nh.n_hosts >= 2 THEN 1 ELSE 0 END AS mirrored
  FROM corpus c JOIN nh ON nh.text = c.text
)
SELECT host, COUNT(*) AS n_docs, CAST(SUM(mirrored) AS BIGINT) AS n_mirrored,
       CAST(SUM(mirrored) * 1000 // COUNT(*) AS BIGINT) AS mirrored_per_milli
FROM d GROUP BY host
"""


# ---------------------------------------------------------------------------
# Token-set containment between successive documents (asymmetric
# near-dup audit — containment |A∩B|/|A| catches a short page embedded
# in a longer one where Jaccard dilutes; Broder's original resemblance
# paper defines both, and crawl pipelines use containment for
# subset/superset template detection)
# ---------------------------------------------------------------------------


def containment_pairs(sf_dir: str) -> ray.data.Dataset:
    """Distinct-token containment of each document in its successor
    (``dst = src + 1`` — the snapshot-neighbor linkage shared with
    ``edit_distance_neighbors``): ``(src, dst, n_src_tokens, n_common,
    containment_micro)`` with containment = |tok(src) ∩ tok(dst)| /
    |tok(src)| in integer micro-units (floor — hash-exact vs SQL).
    Sources with an empty token set are excluded (containment of ∅ is
    undefined); an empty DST yields containment 0.

    Scale shape: one adaptive equi-join on an int64 key attaches the
    successor's text (broadcast under the byte gate, hash-partitioned
    exchange above it); the set intersection is per-pair local work —
    no token explode, no all-pairs grid. Same cost model as
    ``edit_distance_neighbors``: work is bounded per EDGE."""
    from pdf_extractor_ray import joins

    docs = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def as_src(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": b["doc_id"].to_numpy(np.int64), "src_text": b["text"]})

    def as_dst(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "prev": b["doc_id"].to_numpy(np.int64) - 1,
                "dst": b["doc_id"].to_numpy(np.int64),
                "dst_text": b["text"],
            }
        )

    left = docs.map_batches(as_src, batch_format="pandas")
    right = docs.map_batches(as_dst, batch_format="pandas")
    j = joins.adaptive_inner_join(left, right, on="src", right_on="prev")

    def contain(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        na = np.zeros(n, np.int64)
        ni = np.zeros(n, np.int64)
        for i, (a, c) in enumerate(zip(b["src_text"], b["dst_text"])):
            sa = set(a.split())
            if not sa:
                continue
            na[i] = len(sa)
            ni[i] = len(sa.intersection(c.split()))
        keep = na > 0
        return pd.DataFrame(
            {
                "src": b["src"].to_numpy(np.int64)[keep],
                "dst": b["dst"].to_numpy(np.int64)[keep],
                "n_src_tokens": na[keep],
                "n_common": ni[keep],
                "containment_micro": ni[keep] * 1_000_000 // na[keep],
            }
        )

    return j.map_batches(contain, batch_format="pandas", batch_size=2048)


def _containment_sql() -> str:
    from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

    tw = trim_ws_sql("text")
    return rf"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN {tw} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}') END AS arr
    FROM documents
),
d AS (SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, unnest(arr) AS tok FROM t)),
a AS (SELECT doc_id, COUNT(*) AS na FROM d GROUP BY doc_id),
pairs AS (
    SELECT t1.doc_id AS src, t2.doc_id AS dst
    FROM t t1 JOIN t t2 ON t2.doc_id = t1.doc_id + 1
    WHERE len(t1.arr) > 0
),
i AS (
    SELECT d1.doc_id AS src, COUNT(*) AS ni
    FROM d d1 JOIN d d2 ON d2.doc_id = d1.doc_id + 1 AND d2.tok = d1.tok
    GROUP BY d1.doc_id
)
SELECT p.src, p.dst,
       CAST(a.na AS BIGINT) AS n_src_tokens,
       CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(i.ni, 0) * 1000000 // a.na AS BIGINT) AS containment_micro
FROM pairs p
JOIN a ON a.doc_id = p.src
LEFT JOIN i ON i.src = p.src
"""


CONTAINMENT_PAIRS_SQL = _containment_sql()
