"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact top-k cosine — numpy float64 matmul per
  batch against a broadcast query matrix (``ray.put`` once, fetched
  from the local object store per task; never re-shipped per batch).
  The distributed top-k is a per-batch local top-k (k rows per batch
  leave the worker) followed by a tiny global sort+limit.
- ``knn_ivf``: IVF-style scale path — k-means-lite coarse centroids,
  vectors bucketed by nearest centroid (ONE groupby shuffle builds the
  inverted lists); queries probe only ``n_probe`` nearest lists.
  Approximate by construction; recall measured in tests against the
  brute-force oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray
import ray.data


def _min_vec_id(sf_dir: str) -> int:
    """Smallest vec_id WITHOUT reading any data pages: parquet row-group
    column statistics (driver touches only footers/metadata), with a
    distributed Ray min() fallback when statistics are absent."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    mins = []
    pf = pq.ParquetFile(path)
    idx = pf.schema_arrow.get_field_index("vec_id")
    for rg in range(pf.metadata.num_row_groups):
        stats = pf.metadata.row_group(rg).column(idx).statistics
        if stats is None or not stats.has_min_max:
            mins = []
            break
        mins.append(stats.min)
    if mins:
        return int(min(mins))
    ds = ray.data.read_parquet(path, columns=["vec_id"])
    return int(ds.min("vec_id"))


def _load_query_vec(sf_dir: str) -> tuple[int, np.ndarray]:
    """Deterministic query: the embedding of the smallest vec_id — a
    statistics-pruned single-row filtered read, never a full table."""
    import pyarrow.compute as pc_

    qid = _min_vec_id(sf_dir)
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=pc_.field("vec_id") == qid,
    )
    vec = np.asarray(t.column("embedding")[0].as_py(), dtype=np.float64)
    return qid, vec


def knn_brute_force(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Exact top-k cosine neighbors of the min-vec_id query vector.

    Returns (vec_id, rank) with rank 1..k — integer-only output so the
    DuckDB oracle hash-matches (cosine floats are engine-identical per
    element here, but we keep them out of the hashed result anyway).
    """
    qid, qvec = _load_query_vec(sf_dir)
    qn = qvec / np.linalg.norm(qvec)
    qref = ray.put(qn)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        mat = np.array(list(b["embedding"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ q) / norms
        ids = b["vec_id"].to_numpy()
        keep = ids != qid
        sims, ids = sims[keep], ids[keep]
        if ids.size > k:  # local prune: only k rows leave each batch.
            # lexicographic (sim desc, vec_id asc) — a bare argpartition
            # keeps an arbitrary subset of ties at the k-th boundary,
            # which breaks the oracle's deterministic tie-break
            order = np.lexsort((ids, -sims))[:k]
            sims, ids = sims[order], ids[order]
        return pd.DataFrame({"vec_id": ids.astype(np.int64), "sim": sims})

    top = (
        ds.map_batches(local_topk, batch_format="pandas", batch_size=4096)
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]]


KNN_SQL = """
WITH q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
)
SELECT vec_id,
       CAST(row_number() OVER (
           ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)) DESC,
                    vec_id) AS BIGINT) AS rank
FROM embeddings
WHERE vec_id != (SELECT min(vec_id) FROM embeddings)
ORDER BY rank LIMIT 20
"""


def train_centroids(sf_dir: str, num_lists: int = 16, iters: int = 5, sample_rows: int = 4096) -> np.ndarray:
    """Deterministic k-means-lite coarse quantizer trained on a bounded
    SAMPLE (the ``sample_rows`` smallest vec_ids — deterministic, and at
    10^12 vectors still a driver-sized array). The sample is gathered
    with a distributed bottom-k: each batch prunes to its local
    ``sample_rows`` smallest, then a sort+limit over the pruned stream —
    the driver never reads the table. Seeding by evenly-spaced sorted
    vec_id; Lloyd iterations on the sample only."""

    def local_bottomk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) > sample_rows:
            b = b.nsmallest(sample_rows, "vec_id")
        return b[["vec_id", "embedding"]]

    sample = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
        )
        .map_batches(local_bottomk, batch_format="pandas", batch_size=4096)
        .sort("vec_id")
        .limit(sample_rows)
        .to_pandas()
    )
    ids = sample["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(list(sample["embedding"]), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms
    seed_idx = np.linspace(0, len(ids) - 1, num_lists).astype(int)
    cents = matn[seed_idx].copy()
    for _ in range(iters):
        assign = (matn @ cents.T).argmax(axis=1)
        for c in range(num_lists):
            members = matn[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def knn_ivf(sf_dir: str, k: int = 20, num_lists: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """Approximate top-k via IVF probing — fully streaming:

    1. centroids trained on a bounded sample (driver-side, tiny);
    2. the probe-list filter + cosine scoring run vectorized inside
       ``map_batches`` against broadcast (centroids, query) — each batch
       keeps only vectors whose nearest centroid is probed, then its
       local top-k; nothing materializes the full table anywhere;
    3. a tiny global sort+limit over ≤ k rows per batch.

    On a persisted corpus the centroid assignment would be a stored
    ``list_id`` partition column, turning step 2's filter into a
    partition-pruned read. Output shape matches ``knn_brute_force``.
    """
    qid, qvec = _load_query_vec(sf_dir)
    qn = qvec / np.linalg.norm(qvec)
    cents = train_centroids(sf_dir, num_lists=num_lists)
    probe = set(np.argsort(-(cents @ qn))[:n_probe].tolist())
    ref = ray.put((cents, qn, probe))

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])

    def probe_topk(b: pd.DataFrame) -> pd.DataFrame:
        c, q, pr = ray.get(ref)
        mat = np.array(list(b["embedding"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        matn = mat / norms
        assign = (matn @ c.T).argmax(axis=1)
        keep = np.isin(assign, list(pr)) & (b["vec_id"].to_numpy() != qid)
        if not keep.any():
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"), "sim": pd.Series([], dtype="float64")})
        sims = matn[keep] @ q
        ids = b["vec_id"].to_numpy()[keep]
        if ids.size > k:
            order = np.lexsort((ids, -sims))[:k]  # (sim desc, vec_id asc)
            sims, ids = sims[order], ids[order]
        return pd.DataFrame({"vec_id": ids.astype(np.int64), "sim": sims})

    top = (
        ds.map_batches(probe_topk, batch_format="pandas", batch_size=4096)
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]]
