"""Composed training-corpus pipeline — the end-to-end story a 100 TB
training-data build runs, assembled from this engine's stages:

    extract (flagship) → quality score → language ID → exact dedup →
    deterministic embedding (batched-inference pattern) → per-lang stats

``embed_documents`` stands in for batched model inference: the "model"
is a deterministic feature-hash projection (no ML libs in this
container), but the Ray shape is the real one — an actor pool with the
model loaded once in ``__init__``, fixed-size float32 vectors out,
batch-sized for GPU-style throughput.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pdf_extractor_ray.kernels import hashing, textstats
from pdf_extractor_ray.ops import grouped_sum, keep_first

EMBED_DIM = 64


class EmbedActor:
    """Batched 'inference': feature-hash each document's words into a
    fixed-size vector, L2-normalized. Model state (projection seeds)
    lives in __init__ — swap in a real encoder without touching the
    pipeline."""

    def __init__(self, dim: int = EMBED_DIM) -> None:
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        vecs = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            words = hashing.tokenize_words(t or "")
            if not words:
                continue
            hs = hashing.word_hashes(words)
            idx = (hs % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((hs >> np.uint64(32)) & np.uint64(1), 1.0, -1.0).astype(np.float32)
            np.add.at(vecs[i], idx, sign)
            n = np.linalg.norm(vecs[i])
            if n > 0:
                vecs[i] /= n
        return batch.append_column("embedding", pa.array(list(vecs), pa.list_(pa.float32())))


def embed_documents(sf_dir: str, concurrency=(1, 4)) -> ray.data.Dataset:
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    out = ds.map_batches(
        EmbedActor, batch_format="pyarrow", batch_size=512, concurrency=concurrency, num_cpus=1
    )
    return out.drop_columns(["text"])


def corpus_pipeline(sf_dir: str, min_quality: float = 0.3) -> ray.data.Dataset:
    """The composed build: per-language counts of documents surviving
    quality filtering and exact dedup, plus the SUM of per-doc quality
    in integer permille (divide by n_docs for the mean). At scale this
    is the shape of a curation run: no full materialization, one dedup
    exchange (carrying only doc_id/lang/quality/hash — never the text
    payload), one stats exchange."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # raw (unrounded) score: the SQL oracle replays the identical
        # IEEE-double expression, so filter and permille match exactly
        b["quality"] = b["text"].map(textstats.quality_score_raw)
        b = b[b["quality"] >= min_quality]  # filter BEFORE hashing
        b["__h"] = b["text"].map(hashing.content_hash)
        # the dedup exchange only needs these columns — never ship text
        return b[["doc_id", "lang", "quality", "__h"]]

    scored = ds.map_batches(score, batch_format="pandas", batch_size=4096)
    deduped = keep_first(scored, ["__h"], "doc_id")

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": b["lang"],
                "n_docs": np.ones(len(b), dtype=np.int64),
                "quality_permille_sum": np.floor(b["quality"].to_numpy() * 1000.0 + 0.5).astype(np.int64),
            }
        )

    return grouped_sum(
        deduped.map_batches(derive, batch_format="pandas"),
        ["lang"],
        ["n_docs", "quality_permille_sum"],
        num_buckets=4,
    )


def split_train_test(sf_dir: str, test_mod: int = 10) -> ray.data.Dataset:
    """Deterministic corpus split: doc_id % test_mod == 0 → test, else
    train. Hash/mod splits beat random sampling for reproducibility at
    scale (the split of a document never depends on corpus size,
    partitioning, or run order). Returns per-split counts."""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        split = np.where(b["doc_id"].to_numpy() % test_mod == 0, "test", "train")
        return pd.DataFrame({"split": split, "n_docs": np.ones(len(b), dtype=np.int64)})

    return grouped_sum(ds.map_batches(tag, batch_format="pandas"), ["split"], ["n_docs"], num_buckets=2)


def stratified_sample(sf_dir: str, permille: int = 100) -> ray.data.Dataset:
    """Deterministic stratified sample: keep a document iff
    ``doc_id % 1000 < permille`` — the hash/mod sampling rule a
    reproducible training pipeline uses instead of RNG sampling
    (membership is independent of corpus size, partitioning, and run
    order, and the strata proportions hold per language because doc_id
    is independent of lang). Pure per-batch filter: zero shuffle."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[(b["doc_id"] % 1000) < permille]

    return ds.map_batches(keep, batch_format="pandas")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents WHERE doc_id % 1000 < 100
"""


SPLIT_SQL = """
SELECT CASE WHEN doc_id % 10 = 0 THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""


# Exact replay of corpus_pipeline for the corpus charset: the quality
# raw-score expression is the same IEEE-double chain as the kernel
# (see textops.QUALITY_SQL), the dedup partitions on text (the engine
# hashes it — identical up to 128-bit collisions), and filter-then-
# dedup commutes because quality is a function of text.
CORPUS_SQL = """
WITH q AS (
    SELECT doc_id, lang, text,
           len(text) AS n_chars,
           len(string_split(text, ' ')) AS n_words,
           len(list_filter(string_split(text, ' '), w -> w IN (
               'the','and','of','to','a','in','is','that','it','for',
               'was','with','on','as','are','this'))) AS n_stop
    FROM documents
), f AS (
    SELECT doc_id, lang, text,
           (0.35 * least(1.0, n_words / 50.0)
            + 0.3 * least(1.0, (CAST(n_stop AS DOUBLE) / n_words) / 0.2)
            + 0.2 * 1.0
            + 0.15 * (CASE WHEN (CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words)
                                BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)) AS quality
    FROM q
), d AS (
    SELECT * FROM f
    WHERE quality >= 0.3
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(floor(quality * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS quality_permille_sum
FROM d GROUP BY lang
"""
