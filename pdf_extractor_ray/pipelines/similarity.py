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
    mat = np.array(list(sample["embedding"]), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return lloyd_unit_kmeans(mat / norms, num_lists, iters)


def lloyd_unit_kmeans(matn: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd iterations on UNIT-normalized rows (cosine
    k-means): evenly-spaced-row seeding, mean-then-renormalize updates.
    Shared by ``train_centroids`` and semdedup's oversized-cluster
    sub-split so every path clusters identically. Caller provides rows
    in a deterministic order (sorted by vec_id)."""
    seed_idx = np.linspace(0, len(matn) - 1, k).astype(int)
    cents = matn[seed_idx].copy()
    for _ in range(iters):
        assign = (matn @ cents.T).argmax(axis=1)
        for c in range(k):
            members = matn[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def _assign_stage(cents: np.ndarray):
    """Vectorized nearest-centroid assignment stage (shared by build,
    append and compact so every path assigns identically)."""
    import pyarrow as pa

    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        # pyarrow batch keeps embedding as plain list<double> on disk
        # (a pandas round-trip would re-infer Ray's tensor extension,
        # which poisons later filtered reads of the index)
        c = ray.get(cref)
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        lists = ((mat / norms) @ c.T).argmax(axis=1).astype(np.int64)
        if "list_id" in t.column_names:
            t = t.drop_columns(["list_id"])
        return t.append_column("list_id", pa.array(lists, pa.int64()))

    return assign


# Atomic-manifest protocol shared with the ingest content index —
# one implementation in state/index_manifest.py. A pre-manifest IVF
# index (older build) falls back to globbing data/ — equivalent, since
# without appends every fragment under data/ is committed.
from pdf_extractor_ray.state.index_manifest import (  # noqa: E402
    commit_manifest as _commit_manifest,
    manifest_path as _manifest_path,
    rel_fragments as _rel_parquet_files,
)
from pdf_extractor_ray.state.index_manifest import read_manifest as _shared_read_manifest  # noqa: E402


def _read_manifest(index_dir: str) -> dict:
    return _shared_read_manifest(index_dir, fallback_sub="data")


def build_ivf_index(
    sf_dir: str, index_dir: str, num_lists: int = 16
) -> np.ndarray:
    """Persist the IVF layout: embeddings re-written as parquet
    HIVE-PARTITIONED on ``list_id`` (nearest coarse centroid), with the
    centroid matrix stored alongside. Probing then becomes a
    partition-pruned read — only the probed lists' files are opened,
    which is the persisted-corpus scale path the transient ``knn_ivf``
    docstring promises. Assignment is a vectorized map_batches; the
    write streams (one or more files per list partition)."""
    cents = train_centroids(sf_dir, num_lists=num_lists)
    assign = _assign_stage(cents)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # data/ holds ONLY parquet (a stray sidecar file would poison
    # read_parquet's directory scan); the centroid matrix sits beside
    # it. The whole index builds into a temp dir and publishes with ONE
    # atomic rename — a crash mid-build can never leave a directory
    # that looks complete (a rebuild over a half-written dir would
    # append duplicate row files).
    import shutil
    import tempfile

    parent = os.path.dirname(os.path.abspath(index_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    # UNIQUE temp dir per builder: concurrent builds of the same index
    # cannot touch each other's shards; first atomic rename wins and
    # the loser discards its copy (same content by construction — the
    # build is deterministic in the source file).
    tmp_dir = tempfile.mkdtemp(prefix=os.path.basename(index_dir) + ".building-", dir=parent)
    ds.map_batches(assign, batch_format="pyarrow", batch_size=4096).write_parquet(
        os.path.join(tmp_dir, "data"), partition_cols=["list_id"]
    )
    np.save(os.path.join(tmp_dir, "centroids.npy"), cents)
    _commit_manifest(tmp_dir, {"version": 1, "files": _rel_parquet_files(tmp_dir, "data")})
    try:
        os.rename(tmp_dir, index_dir)
    except OSError:
        if os.path.exists(os.path.join(index_dir, "centroids.npy")):
            shutil.rmtree(tmp_dir, ignore_errors=True)  # another builder won
        else:
            raise
    return cents


def append_to_ivf_index(index_dir: str, delta: "ray.data.Dataset") -> int:
    """Incremental append (VERDICT r3 #7): new (vec_id, embedding)
    vectors join the persisted index WITHOUT retraining or rewriting —
    the growing-corpus path.

    Steps: existing centroids load from the sidecar → delta vectors
    assign to their nearest centroid (the same vectorized stage as the
    build) → fragments stream into a UNIQUE staging directory
    (hive-partitioned on list_id, one subdir per touched list) → the
    manifest bumps atomically to reference them. A crash before the
    manifest commit leaves an orphan staging dir that readers NEVER see
    (they read the manifest, not the directory tree); ``compact`` GCs
    orphans. Single appender at a time — serialize writers externally,
    as with any manifest-backed table format. Returns the new manifest
    version."""
    import uuid

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    manifest = _read_manifest(index_dir)  # snapshot BEFORE writing
    staging = f"delta-{uuid.uuid4().hex[:12]}"
    delta.map_batches(_assign_stage(cents), batch_format="pyarrow", batch_size=4096).write_parquet(
        os.path.join(index_dir, staging), partition_cols=["list_id"]
    )
    manifest = {
        "version": int(manifest.get("version", 1)) + 1,
        "files": manifest["files"] + _rel_parquet_files(index_dir, staging),
    }
    _commit_manifest(index_dir, manifest)
    return manifest["version"]


def compact_ivf_index(index_dir: str) -> int:
    """Rewrite the manifest-listed fragments into one consolidated
    hive layout, then GC with ONE generation of reader grace (ADVICE
    r4): the just-replaced generation's directories are recorded as
    ``retired`` in the new manifest and left on disk, so a reader that
    listed fragments from the OLD manifest right before the bump can
    still open them mid-query; they are swept by the NEXT compaction.
    Everything referenced by neither the new manifest nor ``retired``
    (two-generations-old data, orphaned append staging from crashes)
    is GC'd immediately. List assignment is recomputed from the
    sidecar centroids — deterministic, so rows land in the same lists;
    one distributed read→assign→write pass, then an atomic manifest
    bump. Writers stay single-at-a-time (serialized externally);
    readers need no exclusion as long as a query does not outlive a
    FULL compaction cycle. Returns the new version."""
    import shutil
    import uuid

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    manifest = _read_manifest(index_dir)
    files = [os.path.join(index_dir, f) for f in manifest["files"]]
    # UNIQUE generation dir (same rule as append staging): a compact
    # that crashed after write_parquet but before the manifest commit
    # leaves an orphan dir; a deterministic name would glob the
    # orphan's fragments into the retry's manifest and double every
    # vector. The post-commit GC sweeps the orphan instead.
    gen = f"data-v{int(manifest.get('version', 1)) + 1}-{uuid.uuid4().hex[:12]}"
    ds = ray.data.read_parquet(files)
    ds.map_batches(_assign_stage(cents), batch_format="pyarrow", batch_size=4096).write_parquet(
        os.path.join(index_dir, gen), partition_cols=["list_id"]
    )
    # top-level dirs holding the generation being replaced — retained
    # for one cycle so in-flight readers of the old manifest survive
    retired = sorted({f.split(os.sep)[0] for f in manifest["files"]})
    new_manifest = {
        "version": int(manifest.get("version", 1)) + 1,
        "files": _rel_parquet_files(index_dir, gen),
        "retired": retired,
    }
    _commit_manifest(index_dir, new_manifest)
    # GC: every data/delta directory that is neither current nor in the
    # one-cycle grace set — i.e. dirs retired by the PREVIOUS compact
    # and crash orphans no manifest ever referenced
    keep = {gen, *retired, "centroids.npy", os.path.basename(_manifest_path(index_dir))}
    for entry in os.listdir(index_dir):
        if entry in keep or entry.startswith("manifest-"):
            continue
        if entry == "data" or entry.startswith(("data-v", "delta-")):
            shutil.rmtree(os.path.join(index_dir, entry), ignore_errors=True)
    return new_manifest["version"]


def knn_ivf_indexed(
    index_dir: str,
    qvec: np.ndarray,
    *,
    exclude_vec_id: int | None = None,
    k: int = 20,
    n_probe: int = 4,
) -> pd.DataFrame:
    """Top-k over a persisted IVF index: centroids load from the index
    sidecar, the probe filter prunes PARTITIONS at the read (only
    ``n_probe`` of ``num_lists`` directories are scanned), scoring and
    local top-k run per batch. Output matches ``knn_brute_force``."""
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = qvec / np.linalg.norm(qvec)
    probe = [int(i) for i in np.argsort(-(cents @ qn))[:n_probe]]
    qref = ray.put(qn)

    # partition pruning by construction: only the probed lists'
    # COMMITTED fragments (manifest-listed — uncommitted append staging
    # is invisible) are ever handed to the reader; an un-probed list's
    # files are never opened, not even for schema sampling
    manifest = _read_manifest(index_dir)
    tags = [f"list_id={i}/" for i in probe]
    probe_files = [
        os.path.join(index_dir, f)
        for f in manifest["files"]
        if any(t in f.replace(os.sep, "/") for t in tags)
    ]
    if not probe_files:  # every probed centroid is a dead (empty) list
        return pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"), "rank": pd.Series([], dtype="int64")}
        )
    ds = ray.data.read_parquet(probe_files)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        mat = np.array(list(b["embedding"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ q) / norms
        ids = b["vec_id"].to_numpy()
        if exclude_vec_id is not None:
            keep = ids != exclude_vec_id
            sims, ids = sims[keep], ids[keep]
        if ids.size > k:
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


def knn_ivf_indexed_query(sf_dir: str, k: int = 20, num_lists: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """Driver-facing wrapper: build (or reuse) the persisted index for
    ``sf_dir`` under /tmp, then answer the standard min-vec_id query
    through the partition-pruned path."""
    import hashlib
    import os as _os

    # cache key covers semantics version AND source-file identity
    # (size+mtime) — a regenerated embeddings.parquet at the same path
    # must not reuse a stale index
    src = _os.path.join(sf_dir, "embeddings.parquet")
    st = _os.stat(src)
    tag = hashlib.blake2b(
        f"v3:{_os.path.abspath(sf_dir)}:{num_lists}:{st.st_size}:{st.st_mtime_ns}".encode(),
        digest_size=8,
    ).hexdigest()
    index_dir = _os.path.join("/tmp", f"ivf_index_{tag}")
    if not _os.path.exists(_os.path.join(index_dir, "centroids.npy")):
        build_ivf_index(sf_dir, index_dir, num_lists=num_lists)
    qid, qvec = _load_query_vec(sf_dir)
    return knn_ivf_indexed(index_dir, qvec, exclude_vec_id=qid, k=k, n_probe=n_probe)


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


# ---------------------------------------------------------------------------
# Distributed PCA over the embedding column
# ---------------------------------------------------------------------------
# The classic two-phase shape: workers reduce the corpus to EXACT
# integer second-moment statistics (one (2 + d + d²)-cell vector per
# batch, summed through one bucketed grouped_sum exchange), the driver
# assembles the d×d covariance and eigendecomposes it. Nothing
# corpus-sized ever reaches the driver — the exchange output is
# 2 + d + d² rows regardless of corpus size. Embeddings are quantized
# to 2^-20 before the moment sums, so the statistics are exact int64
# and the result is bit-identical across partitionings, batch sizes,
# and worker counts (the float work happens once, on the driver, from
# identical integers). Overflow is guarded by a summed per-batch bound
# cell: Σ_b n_b·max_b(|q|)² dominates every |Gram| entry, so if the
# bound stays below 2^62 no cell can have wrapped.
PCA_SCALE = 1 << 20
PCA_TOP_K = 8


def pca_embeddings(sf_dir: str, k: int = PCA_TOP_K) -> pd.DataFrame:
    """Top-``k`` principal components of the embedding corpus:
    ``(component, eigenvalue_nano, explained_var_ppm)``, eigenvalues
    descending, explained fraction against the covariance trace.
    Rows-only (eigendecomposition is not SQL-expressible); pinned by a
    bit-exact single-process replica and a partition-invariance test."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b["embedding"].to_numpy())
        Q = np.rint(X.astype(np.float64) * PCA_SCALE).astype(np.int64)
        n, d = Q.shape
        G = Q.T @ Q  # exact int64 matmul
        s = Q.sum(axis=0, dtype=np.int64)
        bound = n * int(np.abs(Q).max(initial=0)) ** 2
        cells = np.concatenate([[n, bound], s, G.ravel()])
        ids = np.arange(-2, d + d * d, dtype=np.int64)
        return pd.DataFrame({"cell": ids, "v": cells.astype(np.int64)})

    stats = grouped_sum(
        ds.map_batches(partial, batch_format="pandas", batch_size=4096), ["cell"], ["v"]
    ).to_pandas()  # 2 + d + d² rows — bounded by construction, never corpus-sized
    return _pca_finish(stats, k)


def _pca_finish(stats: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver epilogue shared with the replica: integer moments →
    covariance → eigh → rounded integer report rows."""
    stats = stats.sort_values("cell").reset_index(drop=True)
    m = len(stats) - 2
    d = int((-1 + (1 + 4 * m) ** 0.5) / 2)
    assert d + d * d == m, f"cell count {m} is not d+d² for any integer d"
    v = stats["v"].to_numpy(np.int64)
    n, bound = int(v[0]), int(v[1])
    if bound >= 1 << 62:
        raise OverflowError(
            f"moment bound {bound} risks int64 wrap: lower PCA_SCALE or shard the corpus"
        )
    s = v[2 : 2 + d].astype(np.float64)
    G = v[2 + d :].astype(np.float64).reshape(d, d)
    mu = s / (n * PCA_SCALE)
    C = G / (n * PCA_SCALE**2) - np.outer(mu, mu)
    w = np.linalg.eigh(C)[0][::-1]  # descending
    total = float(np.trace(C))
    top = w[: int(k)]
    return pd.DataFrame(
        {
            "component": np.arange(1, len(top) + 1, dtype=np.int64),
            "eigenvalue_nano": np.floor(top * 1e9 + 0.5).astype(np.int64),
            "explained_var_ppm": np.floor(top / total * 1e6 + 0.5).astype(np.int64),
        }
    )


def pca_reference(X: np.ndarray, k: int = PCA_TOP_K) -> pd.DataFrame:
    """Single-process replica of ``pca_embeddings`` on an in-memory
    matrix — identical quantization, moments, and epilogue."""
    Q = np.rint(X.astype(np.float64) * PCA_SCALE).astype(np.int64)
    n, d = Q.shape
    G = Q.T @ Q
    s = Q.sum(axis=0, dtype=np.int64)
    bound = n * int(np.abs(Q).max(initial=0)) ** 2
    cells = np.concatenate([[n, bound], s, G.ravel()])
    stats = pd.DataFrame({"cell": np.arange(-2, d + d * d, dtype=np.int64), "v": cells})
    return _pca_finish(stats, k)


# ---------------------------------------------------------------------------
# Per-label embedding centroids (exact integer moments)
# ---------------------------------------------------------------------------


def label_centroids_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Class centroids over the embedding corpus: per (label, dim) the
    exact integer micro-sum and count — the first-moment sibling of
    ``pca_embeddings``'s second-moment partials, and the building
    block for nearest-class-mean classifiers and per-class drift
    monitoring. Emitting (sum_micro, n_vecs) instead of the divided
    mean keeps the output exactly SQL-replayable without pinning a
    floor-division sign convention; consumers divide.

    Exactness: each float32 component is widened to float64 (exact)
    and rounded ONCE to int64 micro-units — identical in DuckDB via
    CAST(v AS DOUBLE); sums are then exact integers under any
    partitioning. Scale shape: zero joins; per-batch np.add.at fold
    over (label, dim) → one labels×dims-bounded ``grouped_sum``."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding", "label"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        micro = np.floor(m * 1_000_000 + 0.5).astype(np.int64)
        labels = b["label"].to_numpy(np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        dims = micro.shape[1]
        sums = np.zeros((len(uniq), dims), np.int64)
        np.add.at(sums, codes, micro)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(uniq, dims),
                "dim": np.tile(np.arange(dims, dtype=np.int64), len(uniq)),
                "sum_micro": sums.reshape(-1),
                "n_vecs": np.repeat(counts, dims),
            }
        )

    return grouped_sum(
        ds.map_batches(partial, batch_format="pandas", batch_size=4096),
        ["label", "dim"],
        ["sum_micro", "n_vecs"],
    )


LABEL_CENTROIDS_SQL = """
WITH x AS (
    SELECT label,
           unnest(embedding) AS v,
           unnest(range(1, len(embedding) + 1)) AS dim
    FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(dim - 1 AS BIGINT) AS dim,
       CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM x GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (the ANN memory-compression path)
# ---------------------------------------------------------------------------


def quantize_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Per-dimension int8 scalar quantization of the embedding table —
    the 4× memory compression every large ANN deployment runs before
    indexing (FAISS SQ8-style): codes ``q_d = round(255·(v_d - min_d)
    / (max_d - min_d))`` clipped to [0, 255], with a constant
    dimension quantizing to 0. Emits per-vector verification stats
    ``(vec_id, code_sum, code_min, code_max)`` rather than the raw
    code bytes (rows-only query; the codes themselves are pinned by
    the bit-exact replica test).

    Scale shape: pass 1 folds per-BATCH per-dim min/max partials (one
    dims-sized row per batch) and reduces the bounded partial set on
    the driver (dims × blocks rows, never vector count); the (min,
    scale) table broadcasts via closure; pass 2 quantizes vectorized —
    zero shuffle end to end. Float note: one float32→float64 widening
    per value (exact) and one rounding per (value, dim) — deterministic
    across partitionings because min/max reduction is order-free."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def mm_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "dim": np.arange(m.shape[1], dtype=np.int64),
                "mn": m.min(axis=0),
                "mx": m.max(axis=0),
            }
        )

    parts = ds.map_batches(mm_partial, batch_format="pandas", batch_size=4096).to_pandas()
    g = parts.groupby("dim")
    mn = g["mn"].min().sort_index().to_numpy()
    mx = g["mx"].max().sort_index().to_numpy()
    span = mx - mn
    span[span == 0] = 1.0  # constant dims quantize to 0

    def quant(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        q = np.clip(np.floor((m - mn) * (255.0 / span) + 0.5), 0, 255).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy(np.int64),
                "code_sum": q.sum(axis=1),
                "code_min": q.min(axis=1),
                "code_max": q.max(axis=1),
            }
        )

    return ds.map_batches(quant, batch_format="pandas", batch_size=4096)


def quantize_reference(emb: "np.ndarray") -> "np.ndarray":
    """Sequential replica of the quantizer (bit-exact pin for tests)."""
    m = emb.astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    span = mx - mn
    span[span == 0] = 1.0
    return np.clip(np.floor((m - mn) * (255.0 / span) + 0.5), 0, 255).astype(np.int64)
