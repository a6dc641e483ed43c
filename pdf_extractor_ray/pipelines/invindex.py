"""Persisted inverted index over the documents table: token →
postings (doc_id, tf), hive-partitioned by token-hash bucket.

The text analog of the persisted IVF index (``similarity.py``): the
build streams once over the corpus and writes postings parquet
partitioned on ``bucket = stable_hash64(token) % num_buckets``; a
token lookup then opens ONLY its bucket's files — at web scale, a
1/num_buckets partition-pruned read instead of a corpus scan. The
whole index builds into a unique temp dir and publishes with one
atomic rename (crash-safe, concurrent-builder-safe — same contract as
``build_ivf_index``).

Capability parity note: the reference engine has no corpus-search
path (its lookups are per-file field extraction); this operator is
part of the round-3 training-data-pipeline family. The driver query
(fixed-token postings) is SQL-checked end to end (``INVINDEX_SQL``),
so the build → partitioned write → pruned read → lookup path is
oracle-verified; partition pruning itself is pinned by a unit test.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import ray
import ray.data

from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql
from pdf_extractor_ray.kernels import hashing

_TW = trim_ws_sql("text")
_WS = WS_SPLIT_RE_SQL


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def build_inverted_index(sf_dir: str, index_dir: str, num_buckets: int = 16) -> None:
    """Stream documents → (token, doc_id, tf, bucket) postings parquet,
    hive-partitioned on the token-hash bucket. One pass, no shuffle:
    the partitioned write IS the routing (each row lands in its
    bucket's directory)."""

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        toks, dids, tfs = [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            tf: dict[str, int] = {}
            for w in text.split():
                tf[w] = tf.get(w, 0) + 1
            toks.extend(tf.keys())
            tfs.extend(tf.values())
            dids.extend([doc_id] * len(tf))
        out = pd.DataFrame(
            {
                "token": toks,
                "doc_id": np.asarray(dids, dtype=np.int64),
                "tf": np.asarray(tfs, dtype=np.int64),
            }
        )
        out["bucket"] = [
            hashing.stable_hash64(t) % num_buckets for t in out["token"]
        ]
        return out

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    parent = os.path.dirname(os.path.abspath(index_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp_dir = tempfile.mkdtemp(prefix=os.path.basename(index_dir) + ".building-", dir=parent)
    ds.map_batches(postings, batch_format="pandas", batch_size=4096).write_parquet(
        os.path.join(tmp_dir, "data"), partition_cols=["bucket"]
    )
    with open(os.path.join(tmp_dir, "_META"), "w") as f:
        f.write(str(num_buckets))
    try:
        os.rename(tmp_dir, index_dir)
    except OSError:
        if os.path.exists(os.path.join(index_dir, "_META")):
            shutil.rmtree(tmp_dir, ignore_errors=True)  # another builder won
        else:
            raise


def lookup_postings(index_dir: str, token: str) -> pd.DataFrame:
    """Postings for one token, ordered (tf DESC, doc_id ASC). Opens
    ONLY the token's bucket partition — files of other buckets are
    never touched, not even for schema sampling (explicit file list,
    same reason as the IVF probe: read_parquet cannot bind hive
    partition columns in a filter)."""
    with open(os.path.join(index_dir, "_META")) as f:
        num_buckets = int(f.read().strip())
    bucket = hashing.stable_hash64(token) % num_buckets
    files = sorted(
        _glob.glob(os.path.join(index_dir, "data", f"bucket={bucket}", "*.parquet"))
    )
    if not files:
        return pd.DataFrame(
            {
                "token": pd.Series([], dtype="str"),
                "doc_id": pd.Series([], dtype="int64"),
                "tf": pd.Series([], dtype="int64"),
            }
        )
    ds = ray.data.read_parquet(files, columns=["token", "doc_id", "tf"])

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["token"] == token]

    out = ds.map_batches(filt, batch_format="pandas").to_pandas()
    return out.sort_values(["tf", "doc_id"], ascending=[False, True]).reset_index(drop=True)


def inverted_index_postings(sf_dir: str, tokens: tuple[str, ...] = ("data", "spark", "window")) -> pd.DataFrame:
    """Driver-facing wrapper: build (or reuse) the persisted index for
    ``sf_dir`` under /tmp, then return the concatenated postings of a
    fixed token set through the partition-pruned path. Cache key covers
    semantics version + source identity (size+mtime)."""
    import hashlib as _hashlib

    src = _docs_path(sf_dir)
    st = os.stat(src)
    tag = _hashlib.blake2b(
        f"v1:{os.path.abspath(sf_dir)}:{st.st_size}:{st.st_mtime_ns}".encode(),
        digest_size=8,
    ).hexdigest()
    index_dir = os.path.join("/tmp", f"inv_index_{tag}")
    if not os.path.exists(os.path.join(index_dir, "_META")):
        build_inverted_index(sf_dir, index_dir)
    parts = [lookup_postings(index_dir, t) for t in tokens]
    return pd.concat(parts, ignore_index=True) if parts else lookup_postings(index_dir, "")


# The fixed-token postings ARE SQL-expressible (order-insensitive
# compare), so the whole build→partitioned-write→pruned-read→lookup
# path is oracle-checked end to end.
INVINDEX_SQL = rf"""
WITH w AS (
    SELECT doc_id, unnest(regexp_split_to_array({_TW}, '{_WS}')) AS token
    FROM documents WHERE {_TW} <> ''
)
SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
FROM w
WHERE token IN ('data', 'spark', 'window')
GROUP BY token, doc_id
"""


# ---------------------------------------------------------------------------
# Segment merge (index maintenance: N partial indexes → one)
# ---------------------------------------------------------------------------


def merge_index_segments(seg_dirs: list[str], out_dir: str, num_buckets: int = 16) -> None:
    """Merge N inverted-index SEGMENTS (each the
    :func:`build_inverted_index` layout) into one index — the
    compaction step of every segment-based index (Lucene's merge, the
    IVF compaction's text twin): per-crawl segments accumulate, then a
    merge folds them so lookups stop fanning out over generations.

    Semantics: postings union with per-(token, doc_id) tf SUM (a doc
    re-indexed in two segments contributes its combined counts).

    Scale shape: segments are read as ONE union dataset (partition-
    pruned columns), folded by a single bucketed grouped_sum keyed
    (token, doc_id) — per-batch partials bound viral tokens — and the
    bucket-partitioned write is the routing, exactly like the builder;
    atomic publish by rename (same crash contract)."""
    from pdf_extractor_ray.ops import grouped_sum

    parts = [
        ray.data.read_parquet(
            os.path.join(d, "data"), columns=["token", "doc_id", "tf"]
        )
        for d in seg_dirs
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    merged = grouped_sum(union, ["token", "doc_id"], ["tf"])

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = [hashing.stable_hash64(t) % num_buckets for t in b["token"]]
        return b

    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp_dir = tempfile.mkdtemp(prefix=os.path.basename(out_dir) + ".merging-", dir=parent)
    merged.map_batches(bucketed, batch_format="pandas").write_parquet(
        os.path.join(tmp_dir, "data"), partition_cols=["bucket"]
    )
    with open(os.path.join(tmp_dir, "_META"), "w") as f:
        f.write(str(num_buckets))
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if os.path.exists(os.path.join(out_dir, "_META")):
            shutil.rmtree(tmp_dir, ignore_errors=True)
        else:
            raise


def merged_index_postings(sf_dir: str, tokens: tuple[str, ...] = ("data", "spark", "window")) -> pd.DataFrame:
    """Driver carrier for the merge: build TWO segment indexes (even /
    odd doc ids — two 'crawls'), merge them, and look the fixed token
    set up through the merged index's pruned path. The oracle is the
    FULL-corpus postings SQL (:data:`INVINDEX_SQL`), so the carrier
    only matches if segment build + merge fold + bucket routing +
    pruned lookup all compose to exactly the single-index answer."""
    import hashlib as _hashlib

    import pyarrow.parquet as _pq

    src = _docs_path(sf_dir)
    st = os.stat(src)
    tag = _hashlib.blake2b(
        f"mrg1:{os.path.abspath(sf_dir)}:{st.st_size}:{st.st_mtime_ns}".encode(),
        digest_size=8,
    ).hexdigest()
    merged_dir = os.path.join("/tmp", f"inv_index_merged_{tag}")
    if not os.path.exists(os.path.join(merged_dir, "_META")):
        # two segment corpora: even / odd doc ids (two crawl slices)
        t = _pq.read_table(src, columns=["doc_id", "text"])
        seg_dirs = []
        for parity in (0, 1):
            seg_src = os.path.join("/tmp", f"inv_seg_src_{tag}_{parity}")
            os.makedirs(seg_src, exist_ok=True)
            mask = [int(v) % 2 == parity for v in t.column("doc_id").to_pylist()]
            _pq.write_table(t.filter(mask), os.path.join(seg_src, "documents.parquet"))
            seg_dir = os.path.join("/tmp", f"inv_seg_{tag}_{parity}")
            if not os.path.exists(os.path.join(seg_dir, "_META")):
                build_inverted_index(seg_src, seg_dir)
            seg_dirs.append(seg_dir)
        merge_index_segments(seg_dirs, merged_dir)
    parts = [lookup_postings(merged_dir, t_) for t_ in tokens]
    return pd.concat(parts, ignore_index=True)


# merged two-segment index over the same corpus ≡ the one-shot index
MERGED_INVINDEX_SQL = INVINDEX_SQL
