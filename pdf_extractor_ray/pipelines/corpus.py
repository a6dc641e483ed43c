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

from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql
from pdf_extractor_ray.kernels import hashing, textstats

_TW = trim_ws_sql("text")
_WS = WS_SPLIT_RE_SQL
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
        EmbedActor,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
        num_cpus=1,
        max_restarts=0,  # spurious ctor-arg restart error otherwise (ray#53727)
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


def curation_funnel(sf_dir: str) -> ray.data.Dataset:
    """Multi-stage curation funnel with per-stage survival counts —
    the composition-correctness showpiece: Gopher format rules →
    language screen → exact dedup, each stage applied to the previous
    stage's survivors, reported as (stage_order, stage, n_docs).

    Two streaming passes, no materialization that scales with the
    corpus: pass 1 computes per-doc flags vectorized and reduces to
    THREE counters via per-batch partials; pass 2 re-derives the
    surviving rows (flags are pure functions of the row — cheaper at
    scale than caching a corpus-sized intermediate) and runs the one
    bucketed keep_first exchange carrying (hash, doc_id) only."""
    import os

    from pdf_extractor_ray.kernels import textstats as _ts

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def _flags(b: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        from pdf_extractor_ray.pipelines.textops import gopher_flag_arrays

        keep_g = gopher_flag_arrays(b["text"])["keep"]  # shared thresholds
        lang_ok = np.fromiter(
            (_ts.lang_id(t) != "und" for t in b["text"]), dtype=bool, count=len(b)
        )
        return keep_g, keep_g & lang_ok

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        keep_g, keep_gl = _flags(b)
        return pd.DataFrame(
            {
                "k": ["all"],
                "n_input": [np.int64(len(b))],
                "n_gopher": [np.int64(keep_g.sum())],
                "n_lang": [np.int64(keep_gl.sum())],
            }
        )

    totals = (
        grouped_sum(
            ds.map_batches(counts, batch_format="pandas", batch_size=4096),
            ["k"],
            ["n_input", "n_gopher", "n_lang"],
            num_buckets=1,
        )
        .to_pandas()
        .iloc[0]
    )

    def survivors(b: pd.DataFrame) -> pd.DataFrame:
        _keep_g, keep_gl = _flags(b)
        kept = b[keep_gl]
        return pd.DataFrame(
            {
                "__h": kept["text"].map(hashing.content_hash),
                "doc_id": kept["doc_id"].astype(np.int64),
            }
        )

    n_final = keep_first(
        ds.map_batches(survivors, batch_format="pandas", batch_size=4096), ["__h"], "doc_id"
    ).count()

    funnel = pd.DataFrame(
        {
            "stage_order": np.array([0, 1, 2, 3], dtype=np.int64),
            "stage": ["input", "gopher_rules", "lang_screen", "exact_dedup"],
            "n_docs": np.array(
                [totals["n_input"], totals["n_gopher"], totals["n_lang"], n_final],
                dtype=np.int64,
            ),
        }
    )
    return ray.data.from_pandas(funnel)


# NOTE on mean-word-chars: the funnel computes nonws as the sum of
# word lengths (post-split), identical to the regexp_replace form for
# \s+-separated text — the oracle uses the same expression as
# GOPHER_RULES_SQL, which the parity test pins as equivalent.
def _curation_funnel_sql() -> str:
    from pdf_extractor_ray.pipelines.textops import (
        GOPHER_KEEP_PRED,
        GOPHER_METRICS_CTE,
        LANG_PRED_CORE_SQL,
    )

    return rf"""
WITH g AS ({GOPHER_METRICS_CTE}), m AS (
    SELECT doc_id, text, n_words,
           CASE WHEN n_words = 0 THEN 0 ELSE (unique_words * 1000000) // n_words END AS unique_ratio_micro,
           CASE WHEN n_words = 0 THEN 0 ELSE (nonws * 1000000) // n_words END AS mean_word_chars_micro
    FROM g
), flags AS (
    SELECT doc_id, text, ({GOPHER_KEEP_PRED}) AS keep_g
    FROM m
), lp AS ({LANG_PRED_CORE_SQL}),
joined AS (
    SELECT f.doc_id, f.text, f.keep_g, (lp.lang_pred <> 'und') AS keep_l
    FROM flags f JOIN lp ON f.doc_id = lp.doc_id
), surv AS (
    SELECT * FROM joined WHERE keep_g AND keep_l
), ded AS (
    SELECT MIN(doc_id) AS doc_id FROM surv GROUP BY text
)
SELECT * FROM (
    SELECT CAST(0 AS BIGINT) AS stage_order, 'input' AS stage,
           (SELECT COUNT(*) FROM documents) AS n_docs
    UNION ALL
    SELECT 1, 'gopher_rules', (SELECT COUNT(*) FROM joined WHERE keep_g)
    UNION ALL
    SELECT 2, 'lang_screen', (SELECT COUNT(*) FROM surv)
    UNION ALL
    SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM ded)
)
"""


CURATION_FUNNEL_SQL = _curation_funnel_sql()


CHUNK_WORDS = 64


def chunk_documents(sf_dir: str, chunk_words: int = CHUNK_WORDS) -> ray.data.Dataset:
    """Fixed-window training-chunk preparation: split every document
    into consecutive ``chunk_words``-word windows — the flat-map that
    feeds tokenizer/packing stages in an LLM data pipeline. Pure
    per-batch expansion, zero shuffle; output is (doc_id, chunk_id,
    n_words, chunk_text) with deterministic ids, so chunking is
    idempotent and resumable at any scale."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        doc_ids, chunk_ids, n_words, texts = [], [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            words = t.split()
            for c in range(0, (len(words) + chunk_words - 1) // chunk_words):
                piece = words[c * chunk_words : (c + 1) * chunk_words]
                doc_ids.append(doc_id)
                chunk_ids.append(c)
                n_words.append(len(piece))
                texts.append(" ".join(piece))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "chunk_id": pd.Series(chunk_ids, dtype="int64"),
                "n_words": pd.Series(n_words, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype="str"),
            }
        )

    return ds.map_batches(explode, batch_format="pandas", batch_size=4096)


CHUNK_SQL = rf"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array({_TW}, '{_WS}') AS words
    FROM documents WHERE {_TW} <> ''
), c AS (
    SELECT doc_id, words,
           unnest(range(CAST(ceil(len(words) / {CHUNK_WORDS}.0) AS BIGINT))) AS chunk_id
    FROM w
)
SELECT doc_id, chunk_id,
       CAST(len(list_slice(words, chunk_id*{CHUNK_WORDS} + 1, chunk_id*{CHUNK_WORDS} + {CHUNK_WORDS})) AS BIGINT) AS n_words,
       array_to_string(list_slice(words, chunk_id*{CHUNK_WORDS} + 1, chunk_id*{CHUNK_WORDS} + {CHUNK_WORDS}), ' ') AS chunk_text
FROM c
"""


# Knuth multiplicative constant; the sample key is SQL-replicable
# because (uint64-wraparound product) % 2^32 == (exact product) % 2^32.
SAMPLE_HASH_MULT = 2654435761
SAMPLE_SEED = 12345


def _hash32(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """The shared Knuth 32-bit doc hash (uint64): XOR the seed in
    BEFORE the multiply (an additive seed would shift every hash
    equally), multiply mod 2^64, keep the low 32 bits. ONE definition
    for every SQL-mirrored sampling cut (sample_k, DSIR Gumbel keys,
    mixture up-sampling) so a fix here can't miss a copy. SQL replay
    for signed ids: ((x % 2^32) + 2^32) % 2^32 equals this masked
    value because 2^64 = 0 (mod 2^32)."""
    return (
        (doc_ids.astype(np.uint64) ^ np.uint64(seed)) * np.uint64(SAMPLE_HASH_MULT)
    ) & np.uint64(0xFFFFFFFF)
SAMPLE_K = 100


def sample_k_documents(sf_dir: str, k: int = SAMPLE_K, seed: int = SAMPLE_SEED) -> ray.data.Dataset:
    """Deterministic EXACT-k uniform sample — the distributed
    reservoir-sample equivalent: rank every doc by a seeded
    multiplicative hash of doc_id and keep the k smallest (ties broken
    by doc_id). Unlike a reservoir, membership is independent of scan
    order, partitioning, and corpus growth*, and the same seed
    reproduces the same sample on any cluster size.

    Scale shape: a per-batch partial top-k runs BEFORE the exchange,
    so the final sort sees at most k rows per input batch, never the
    corpus; the sort+limit exchange is k·blocks-sized.

    (*growth: new docs displace old ones only by hash rank, matching
    bottom-k sketch semantics — the standard distributed-sample key.)"""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # XOR the seed in BEFORE the multiply: an additive seed would
        # shift every hash equally and leave the sample unchanged
        b["__h"] = _hash32(b["doc_id"].to_numpy(np.uint64), seed).astype(np.int64)
        return b.nsmallest(k, ["__h", "doc_id"])

    top = ds.map_batches(partial, batch_format="pandas").sort(["__h", "doc_id"]).limit(k)
    return top.drop_columns(["__h"])


# the double-mod makes the replay sign-safe: DuckDB % returns negative
# remainders for negative doc_id, numpy masks into [0, 2^32)
SAMPLE_K_SQL = f"""
SELECT doc_id, lang FROM documents
ORDER BY (((CAST(xor(doc_id, {SAMPLE_SEED}) AS HUGEINT) * {SAMPLE_HASH_MULT}) % 4294967296) + 4294967296) % 4294967296, doc_id
LIMIT {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights (hashed n-gram distribution matching)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 8192
DSIR_ALPHA = 1.0  # add-alpha smoothing per bucket


def _dsir_bucket_counts(texts, num_buckets: int) -> tuple[np.ndarray, int]:
    """Hashed unigram+bigram bucket counts for a batch of texts
    (one bincount per batch, not per doc)."""
    from pdf_extractor_ray.kernels import hashing

    buckets = [hashing.ngram_buckets(t.split(), num_buckets) for t in texts]
    flat = np.concatenate(buckets) if buckets else np.empty(0, dtype=np.int64)
    return np.bincount(flat, minlength=num_buckets), len(flat)


def dsir_importance_weights(
    sf_dir: str,
    *,
    target_lang: str = "en",
    num_buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> ray.data.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every doc by
    the log-likelihood ratio of a TARGET hashed-n-gram unigram model
    (here: the corpus's ``target_lang`` slice stands in for the
    high-quality target set) against the RAW corpus model. Docs whose
    feature mix resembles the target get positive weights; importance
    resampling then keeps/samples by weight.

    Scale shape — two bounded passes, zero corpus-sized collection:

    1. Feature counts: each batch bincounts its hashed unigram+bigram
       features into ``num_buckets`` slots and emits the NONZERO
       (bucket, n) partials; ``grouped_sum`` folds them — the exchange
       and the final tables are bounded by the constant ``num_buckets``
       (8k rows), independent of corpus size, so collecting the two
       models to the driver is a fixed-size broadcast, the same bound
       as the contamination Bloom.
    2. Scoring: the log-ratio vector ships once via ``ray.put``; each
       batch re-hashes its features and sums log-ratios per doc
       (vectorized ``np.add.reduceat``-free segment sum) — zero
       shuffle.

    Float determinism: per-doc summation order is the doc's token
    order, identical on every partitioning (per-doc np.sum over its
    own feature vector), so results are bit-stable and pinned by an
    independent replica test."""
    import os

    from pdf_extractor_ray import joins
    from pdf_extractor_ray.kernels import hashing
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        # ONE pass emits both models' partials — a second scan would
        # re-read and re-hash every document just to count the
        # target-lang subset
        raw_counts, _ = _dsir_bucket_counts(b["text"], num_buckets)
        tgt_counts, _ = _dsir_bucket_counts(b.loc[b["lang"] == target_lang, "text"], num_buckets)
        nz = np.nonzero(raw_counts | tgt_counts)[0]
        return pd.DataFrame(
            {
                "bucket": nz.astype(np.int64),
                "n_raw": raw_counts[nz].astype(np.int64),
                "n_target": tgt_counts[nz].astype(np.int64),
            }
        )

    tbl = grouped_sum(
        ds.map_batches(partial_counts, batch_format="pandas"),
        ["bucket"],
        ["n_raw", "n_target"],
    ).to_pandas()  # bounded by num_buckets, never corpus-sized
    model = {}
    for which, col in (("target", "n_target"), ("raw", "n_raw")):
        dense = np.zeros(num_buckets, dtype=np.float64)
        dense[tbl["bucket"].to_numpy()] = tbl[col].to_numpy()
        total = dense.sum()
        model[which] = np.log((dense + alpha) / (total + alpha * num_buckets))

    log_ratio = model["target"] - model["raw"]
    ref = ray.put(log_ratio)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lr = joins._cached_get(ref)
        weights = np.zeros(len(b), dtype=np.float64)
        n_feats = np.zeros(len(b), dtype=np.int64)
        for i, t in enumerate(b["text"]):
            f = hashing.ngram_buckets(t.split(), num_buckets)
            n_feats[i] = len(f)
            weights[i] = lr[f].sum()
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "n_features": n_feats, "dsir_logweight": weights}
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=4096)


def dsir_select_top(sf_dir: str, k: int = 100, **kw) -> ray.data.Dataset:
    """Importance selection: top-k docs by DSIR weight (ties by
    doc_id) — per-batch partial top-k, then a k·blocks-sized final."""
    weights = dsir_importance_weights(sf_dir, **kw)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # sort on BOTH keys before head: nlargest on the weight alone
        # would drop a boundary-tied row by batch position instead of
        # the documented (weight desc, doc_id asc) rule — and tied
        # weights are real (duplicate texts hash to identical features)
        return b.sort_values(["dsir_logweight", "doc_id"], ascending=[False, True]).head(k)

    return (
        weights.map_batches(partial, batch_format="pandas")
        .sort(["dsir_logweight", "doc_id"], descending=[True, False])
        .limit(k)
    )


def dsir_resample(
    sf_dir: str, k: int = 100, seed: int = 17, **kw
) -> ray.data.Dataset:
    """DSIR importance RESAMPLING (the paper's actual selection step,
    completing :func:`dsir_importance_weights` + :func:`dsir_select_top`):
    a weighted sample WITHOUT replacement of ``k`` docs, inclusion
    probability proportional to ``exp(dsir_logweight)``, via the
    Gumbel-top-k trick (Vieira 2014 / Kool et al. 2019, public):
    ``key = logweight + Gumbel(hash(doc_id, seed))`` and the top-k keys
    ARE a without-replacement weighted sample. Deterministic: the
    Gumbel noise comes from the same seeded multiplicative doc_id hash
    as :func:`sample_k_documents`, so membership is independent of scan
    order, partitioning, and cluster size, and any seed reproduces.

    Scale shape: identical to the other exact-k samplers — per-batch
    partial top-k BEFORE the exchange, so the final sort+limit sees at
    most k rows per input batch. Rows-only (float keys; pinned by a
    local-reference replica test + a cross-seed preference check)."""
    weights = dsir_importance_weights(sf_dir, **kw)

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__key"] = dsir_gumbel_keys(
            b["doc_id"].to_numpy(), b["dsir_logweight"].to_numpy(), seed
        )
        return b.sort_values(["__key", "doc_id"], ascending=[False, True]).head(k)

    return (
        weights.map_batches(add_key, batch_format="pandas")
        .sort(["__key", "doc_id"], descending=[True, False])
        .limit(k)
        .drop_columns(["__key"])
    )


def dsir_gumbel_keys(doc_ids: np.ndarray, logweights: np.ndarray, seed: int) -> np.ndarray:
    """Perturbed keys for Gumbel-top-k: logweight + G where
    G = -ln(-ln(u)) and u is a (0,1) uniform derived from the seeded
    multiplicative hash of doc_id — shared by the pipeline and the
    test's local reference so parity is by construction.

    The ``& 0xFFFFFFFF`` mask is load-bearing (same as
    ``sample_k_documents``): the multiplicative hash is uniform MOD
    2^32 — without the mask the raw 64-bit product never wraps for
    realistic ids, leaving u tiny and monotone in doc_id, which
    degenerates the noise to a ~0.08-std sliver and turns the
    "weighted sample" into deterministic top-k-by-weight (caught by
    review; the noise-spread assertion in tests pins it now)."""
    h = _hash32(doc_ids, seed)
    u = (h.astype(np.float64) + 0.5) / float(1 << 32)
    return logweights.astype(np.float64) - np.log(-np.log(u))


# ---------------------------------------------------------------------------
# Sequence packing (training-batch prep: greedy next-fit of documents
# into fixed token budgets — the step between chunking and the
# dataloader in an LLM pipeline; local-per-shard packing with bounded
# waste is how distributed packers work, cf. the chunking stage above)
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 120
PACK_BUCKETS = 8


def pack_sequences(
    sf_dir: str,
    budget_tokens: int = PACK_BUDGET_TOKENS,
    pack_buckets: int = PACK_BUCKETS,
    max_bucket_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Greedy NEXT-FIT sequence packing: documents are split into
    ``pack_buckets`` streams by ``doc_id % pack_buckets`` (a SEMANTIC
    parameter — results are cluster-size-independent), each stream is
    walked in ``doc_id`` order, and a document joins the current pack
    while the running token sum stays within ``budget_tokens``,
    otherwise it opens the next pack. A document longer than the budget
    gets a pack of its own (and closes it for the next doc). Output:
    one row per document, ``(doc_id, n_tokens, bucket, pack_seq)`` —
    ``(bucket, pack_seq)`` is the pack key.

    Scale shape: ONE bucketed exchange carrying (doc_id, n_tokens) —
    integers only, never text; per-bucket packing is a sequential
    integer walk (inherent to next-fit) over that bucket's rows, so
    ``pack_buckets`` is BOTH the packing parallelism and the
    per-worker group bound: each bucket's ~corpus/``pack_buckets``
    integer rows materialize as one group before packing, so pick
    ``pack_buckets`` at pipeline-design time so a bucket fits a worker
    (~corpus_docs / 1e5 is a sane start; being semantic, it must then
    stay fixed for reproducibility). ``max_bucket_rows`` raises with
    that advice before a silent OOM gets close. Waste vs a global
    packer is bounded by one partial pack per bucket.

    Parity precondition: ``doc_id`` must be non-negative — numpy ``%``
    is sign-of-divisor while SQL ``%`` is sign-of-dividend, so a
    negative id would land in different buckets engine-side vs
    oracle-side."""
    import os

    from pdf_extractor_ray.ops import grouped_apply

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def tokens(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_tokens": b["text"].map(textstats.token_count_ws).astype(np.int64),
                "bucket": (b["doc_id"].astype("int64") % pack_buckets).astype(np.int64),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for bucket, grp in g.groupby("bucket", sort=False):
            if len(grp) > max_bucket_rows:
                raise ValueError(
                    f"pack_sequences: bucket {bucket} has {len(grp)} rows > "
                    f"max_bucket_rows={max_bucket_rows}; raise pack_buckets "
                    "(a semantic choice — fix it per corpus, ~corpus_docs/1e5)"
                )
            grp = grp.sort_values("doc_id")
            ns = grp["n_tokens"].to_numpy()
            seqs = np.empty(len(ns), dtype=np.int64)
            acc = 0
            seq = -1
            for i, n in enumerate(ns):
                if seq < 0 or acc + n > budget_tokens:
                    seq += 1
                    acc = int(n)
                else:
                    acc += int(n)
                seqs[i] = seq
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": grp["doc_id"].to_numpy(),
                        "n_tokens": ns,
                        "bucket": grp["bucket"].to_numpy(),
                        "pack_seq": seqs,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                    "pack_seq": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return grouped_apply(
        ds.map_batches(tokens, batch_format="pandas", batch_size=8192), ["bucket"], pack
    )


def pack_sequences_sql(
    budget_tokens: int = PACK_BUDGET_TOKENS, pack_buckets: int = PACK_BUCKETS
) -> str:
    """Exact SQL replica of ``pack_sequences``: the next-fit running
    sum with reset is a recursive CTE advancing every bucket one row
    per iteration (recursion depth = max rows per bucket)."""
    return rf"""
WITH RECURSIVE base AS (
    SELECT doc_id,
           CAST(CASE WHEN {_TW} = '' THEN 0
                     ELSE len(regexp_split_to_array({_TW}, '{_WS}')) END AS BIGINT) AS n_tokens,
           CAST(doc_id % {int(pack_buckets)} AS BIGINT) AS bucket
    FROM documents
), t AS (
    SELECT doc_id, n_tokens, bucket,
           row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
    FROM base
), p AS (
    SELECT doc_id, n_tokens, bucket, rn, CAST(0 AS BIGINT) AS pack_seq, n_tokens AS acc
    FROM t WHERE rn = 1
    UNION ALL
    SELECT t.doc_id, t.n_tokens, t.bucket, t.rn,
           CASE WHEN p.acc + t.n_tokens <= {int(budget_tokens)}
                THEN p.pack_seq ELSE p.pack_seq + 1 END,
           CASE WHEN p.acc + t.n_tokens <= {int(budget_tokens)}
                THEN p.acc + t.n_tokens ELSE t.n_tokens END
    FROM t JOIN p ON t.bucket = p.bucket AND t.rn = p.rn + 1
)
SELECT doc_id, n_tokens, bucket, pack_seq FROM p
"""


PACK_SQL = pack_sequences_sql()


# ---------------------------------------------------------------------------
# BPE vocabulary learning (Sennrich et al. 2016, "Neural Machine
# Translation of Rare Words with Subword Units" — public algorithm):
# the tokenizer-fitting step of an LLM data pipeline, distributed.
# ---------------------------------------------------------------------------

BPE_MERGES = 20
_BPE_SEP = "\x01"  # joins symbol lists into a string column
# End-of-word marker (standard BPE). A control char, NOT '</w>': no
# chain of merges over printable input chars can ever construct a
# symbol equal to it, so it cannot collide with real text the way
# '</w>' could for a word containing '<','/','w','>' adjacently.
BPE_EOW = "\x02"


def _bpe_check_word(w: str) -> str:
    """Loudly reject words that would corrupt the symbol encoding —
    the charset precondition, enforced instead of assumed (learn-time
    and encode-time segmentations silently diverge otherwise)."""
    if _BPE_SEP in w or BPE_EOW in w:
        raise ValueError(
            f"bpe: word {w!r} contains a reserved control character "
            f"(\\x01 separator / \\x02 end-of-word)"
        )
    return w


def _bpe_merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right, non-overlapping application of one merge."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_learn(
    sf_dir: str,
    num_merges: int = BPE_MERGES,
    *,
    round_batch: int = 16,
    round_sizes: "list[int] | None" = None,
    incremental: bool = False,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over the documents corpus:
    returns ``(rank, left, right, n)`` — the merge table a tokenizer
    consumes, in learned order. Deterministic: each round merges the
    most frequent adjacent symbol pair, ties broken by (left, right)
    lexicographic.

    Ray-native shape (the word-frequency trick every real BPE trainer
    uses, kept DISTRIBUTED): one corpus pass builds the (word, count)
    table — the only corpus-sized exchange, bounded by distinct words
    (the tf-idf-df bound); the table is then materialized once per
    round with its current segmentation, and each round costs one
    pair-count ``grouped_sum`` (bounded by distinct adjacent pairs,
    << vocab) plus a local-top-k-pruned driver pick of a few rows per
    block. The corpus text is never touched again after pass 1; round
    cost is independent of corpus size.

    Round batching (VERDICT r4 #7): up to ``round_batch`` merges apply
    per round while staying BIT-EXACT to one-merge-at-a-time BPE.
    Measured honestly: on this corpus most rounds still carry 1 merge
    (54 rounds for 64 merges at sf0.01 — BPE's top pairs overwhelmingly
    share the end-of-word symbol, which trips the overlap stop), so the
    win is modest (~1.03× healthy-window) and grows only on corpora
    whose top pairs are symbol-diverse; the per-round floor is the
    pair-count exchange round-trip, not the apply pass. Soundness rule:
    scanning the global pair order (n desc, left, right asc), accept
    pairs while they are pairwise symbol-disjoint, stop at the first
    pair sharing a symbol with an accepted one, then keep only accepted
    pairs whose count STRICTLY exceeds the stop row's count. Why this
    is exact: applying a batch merge (a,b)→ab only creates pairs like
    (x,ab), and — because an accepted concat must be a BRAND-NEW symbol
    string (the ``made`` guard in the body: a pair whose concat already
    exists as a symbol, built earlier via a different split, is
    accepted only as a singleton batch) — every occurrence of (x,ab)
    was an occurrence of the OLD pair (x,a), which shares symbol ``a``
    with the accepted pair, so it ranks at-or-after the stop row and
    its count is ≤ the stop count. Disjoint pairs' counts are invariant
    under the batch, so at every intermediate step the sequential
    argmax is exactly the next accepted pair, with strict count
    dominance over everything changed or new (no tie-break hazards; the
    stop count is also recorded when the round_batch limit ends the
    scan, closing the tie between the batch tail and the first
    unaccepted row). Zipfian pair tables make early batches run full;
    the tail degrades gracefully toward batch=1, which is the plain
    sequential algorithm.

    ``incremental=True`` switches to the pair-count delta table
    (TODO_ROUND6 #2): count all pairs once, then update the table from
    each apply pass instead of recounting — bit-exact (pinned), but
    measured 2.4× SLOWER at sf0.01/64 merges (47.7 s vs 19.9 s best-of,
    healthy window): it trades the recount CPU for a second per-round
    materialize plus a union+grouped_sum over the pair table, and at
    this vocab size the per-round operator latency dominates, not the
    recount. Default OFF; the crossover argument is a web-scale
    vocabulary where the recount's O(total symbols) pair emission
    dwarfs the pair-table exchange. Details in BENCH/BASELINE.md.

    Not SQL-expressible (iterative argmax); pinned by a bit-exact
    local reference implementation test."""
    import os

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def word_counts(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b["text"]:
            for w in t.split():
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame(
            {
                "word": list(counts),
                "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    wf = grouped_sum(
        docs.map_batches(word_counts, batch_format="pandas", batch_size=8192),
        ["word"],
        ["n"],
    )

    def seed_syms(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "sym": [
                    _BPE_SEP.join(list(_bpe_check_word(w)) + [BPE_EOW]) for w in b["word"]
                ],
                "n": b["n"].astype("int64"),
            }
        )

    vocab = wf.map_batches(seed_syms, batch_format="pandas").materialize()

    def pair_counts(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[tuple[str, str], int] = {}
        for s, n in zip(b["sym"], b["n"]):
            syms = s.split(_BPE_SEP)
            for a, c in zip(syms, syms[1:]):
                counts[(a, c)] = counts.get((a, c), 0) + int(n)
        return pd.DataFrame(
            {
                "left": [k[0] for k in counts],
                "right": [k[1] for k in counts],
                "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    # per-block top-k over the FULLY-SUMMED pair table (each pair lives
    # in exactly one grouped_sum bucket), so sorted(collected)[:topk]
    # is provably the true global top-k: any global-top-k pair is in
    # its own block's top-k. Collect stays blocks×topk-bounded.
    topk = 2 * max(1, round_batch) + 1

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) > topk:
            b = b.sort_values(["n", "left", "right"], ascending=[False, True, True]).head(topk)
        return b

    # NOTE (VERDICT r4 #7, measured negative result): "fold merge
    # application into the next round's pair-count pass" (apply pending
    # merges inline during counting, materialize the vocab only every N
    # merges) was implemented and measured 3.7× SLOWER at sf0.01/64
    # merges (70.9 s vs 18.4 s, healthy window): it multiplies the
    # Python _bpe_merge_word work by the average pending length while
    # the per-round materialize it saves is a vocab-sized (tiny)
    # object-store write. Per-round cost here is the pair-count
    # exchange round-trip (~0.34 s/round), which neither lever removes.
    # Reverted; details in BENCH/BASELINE.md.
    # Incremental pair-count delta table (TODO_ROUND6 #2): count all
    # pairs ONCE, then update the table from each apply pass — the
    # apply walk already visits every changed word, so it emits
    # (old pairs × -n, new pairs × +n) deltas for free and the
    # per-round recount (CPU over every word × every symbol) is
    # replaced by grouped_sum(pc ∪ deltas), whose volume is the pair
    # table plus the touched-word deltas. Exactness: batch merges are
    # pairwise symbol-disjoint AND create only brand-new symbol strings
    # (the ``made`` guard below), so a merge can neither create nor
    # destroy an occurrence of another batch pair, and the substring
    # probe (left+SEP+right in the joined symbol string) can false-
    # positive (net-zero deltas, filtered below) but never false-
    # negative. Same bit-exact contract as the batched sequential path.
    def recount_pairs(v: ray.data.Dataset) -> ray.data.Dataset:
        return grouped_sum(
            v.map_batches(pair_counts, batch_format="pandas"),
            ["left", "right"],
            ["n"],
        )

    merges: list[tuple[int, str, str, int]] = []
    # Symbol strings ever CREATED by a merge. The batching proof needs
    # every accepted concat to be a brand-new symbol: if left+right
    # already exists as a symbol (built earlier via a different split —
    # e.g. "abc" from (a,bc) while (ab,c) still has occurrences), other
    # pairs referencing it can GAIN occurrences mid-batch, and their
    # pre-round counts stop being the sequential counts. Such a pair is
    # accepted only as a singleton batch (the global argmax alone is
    # always exact) and otherwise stops the batch like an overlap.
    # Every multi-char symbol is some previous merge's concat, and a
    # concat (length ≥ 2) can never equal a seed symbol (single chars /
    # EOW), so this driver-side set is a complete existence test.
    made: set[str] = set()
    pc_inc = None
    if incremental and num_merges > 0:
        pc_inc = recount_pairs(vocab).materialize()
    while len(merges) < num_merges:
        pc = pc_inc if incremental else recount_pairs(vocab)
        cand = pc.map_batches(local_topk, batch_format="pandas").take_all()
        if not cand:
            break
        cand.sort(key=lambda r: (-int(r["n"]), r["left"], r["right"]))
        head = cand[:topk]  # the true global top-k (see local_topk note)

        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        c_stop: int | None = None
        close_batch = False
        for row in head:
            if (
                close_batch
                or len(batch) >= round_batch
                or len(merges) + len(batch) >= num_merges
                or row["left"] in used
                or row["right"] in used
                # recreates an existing symbol: singleton-only (above)
                or (batch and (row["left"] + row["right"]) in made)
            ):
                # first unaccepted row: everything at-or-below it in the
                # sort order is bounded by its count (also closes the
                # tie hazard when the round_batch limit is what stopped
                # the scan)
                c_stop = int(row["n"])
                break
            batch.append((row["left"], row["right"], int(row["n"])))
            used.add(row["left"])
            used.add(row["right"])
            if (row["left"] + row["right"]) in made:
                close_batch = True
        else:
            # head exhausted without overlap/limit: pairs beyond the
            # collected top-k have n ≤ the head's tail count
            c_stop = int(head[-1]["n"])
        if c_stop is not None:
            # strict dominance filter — but the global argmax alone is
            # always exact, so never emit an empty round
            batch = [m for m in batch if m[2] > c_stop] or batch[:1]

        if round_sizes is not None:  # observability hook (tests/bench)
            round_sizes.append(len(batch))
        for left, right, n_best in batch:
            merges.append((len(merges), left, right, n_best))
            made.add(left + right)
        if len(merges) >= num_merges:
            break  # the final apply/update below would never be read

        if incremental:
            probes = tuple(f"{left}{_BPE_SEP}{right}" for left, right, _n in batch)

            def apply_and_delta(
                b: pd.DataFrame, _batch=tuple(batch), _probes=probes
            ) -> pd.DataFrame:
                out_syms: list[str] = []
                out_n: list[int] = []
                dcounts: dict[tuple[str, str], int] = {}
                for s, n in zip(b["sym"], b["n"]):
                    if not any(p in s for p in _probes):
                        out_syms.append(s)
                        out_n.append(int(n))
                        continue
                    n = int(n)
                    syms = s.split(_BPE_SEP)
                    for a, c in zip(syms, syms[1:]):
                        k = (a, c)
                        dcounts[k] = dcounts.get(k, 0) - n
                    for left, right, _cnt in _batch:
                        syms = _bpe_merge_word(syms, left, right)
                    for a, c in zip(syms, syms[1:]):
                        k = (a, c)
                        dcounts[k] = dcounts.get(k, 0) + n
                    out_syms.append(_BPE_SEP.join(syms))
                    out_n.append(n)
                vf = pd.DataFrame(
                    {
                        "kind": ["v"] * len(out_syms),
                        "sym": out_syms,
                        "left": [""] * len(out_syms),
                        "right": [""] * len(out_syms),
                        "n": pd.Series(out_n, dtype="int64"),
                    }
                )
                if not dcounts:
                    return vf
                df = pd.DataFrame(
                    {
                        "kind": ["d"] * len(dcounts),
                        "sym": [""] * len(dcounts),
                        "left": [k[0] for k in dcounts],
                        "right": [k[1] for k in dcounts],
                        "n": np.fromiter(dcounts.values(), dtype=np.int64, count=len(dcounts)),
                    }
                )
                return pd.concat([vf, df], ignore_index=True)

            combined = vocab.map_batches(apply_and_delta, batch_format="pandas").materialize()
            vocab = combined.map_batches(
                lambda b: b.loc[b["kind"] == "v", ["sym", "n"]], batch_format="pandas"
            )
            deltas = combined.map_batches(
                lambda b: b.loc[b["kind"] == "d", ["left", "right", "n"]],
                batch_format="pandas",
            )
            pc_inc = (
                grouped_sum(pc_inc.union(deltas), ["left", "right"], ["n"])
                .map_batches(lambda b: b[b["n"] != 0], batch_format="pandas")
                .materialize()
            )
            continue

        def apply_batch(b: pd.DataFrame, _batch=tuple(batch)) -> pd.DataFrame:
            out = []
            for s in b["sym"]:
                syms = s.split(_BPE_SEP)
                for left, right, _n in _batch:
                    syms = _bpe_merge_word(syms, left, right)
                out.append(_BPE_SEP.join(syms))
            return pd.DataFrame({"sym": out, "n": b["n"]})

        vocab = vocab.map_batches(apply_batch, batch_format="pandas").materialize()

    return pd.DataFrame(
        {
            "rank": pd.Series([m[0] for m in merges], dtype="int64"),
            "left": pd.Series([m[1] for m in merges], dtype="object"),
            "right": pd.Series([m[2] for m in merges], dtype="object"),
            "n": pd.Series([m[3] for m in merges], dtype="int64"),
        }
    )


_BPE_LEN_CACHE: dict[str, dict[str, int]] = {}
_BPE_LEN_CACHE_MAX = 1 << 20  # words per table; crawl vocabularies repeat


def bpe_token_counts(
    sf_dir: str,
    num_merges: int = BPE_MERGES,
    merges: "pd.DataFrame | None" = None,
) -> ray.data.Dataset:
    """Apply a learned BPE merge table: per-document token counts under
    the corpus's own ``bpe_learn`` vocabulary —
    ``(doc_id, n_tokens_ws, n_tokens_bpe)``. Pass ``merges`` (a
    ``bpe_learn`` result) to reuse an already-learned table instead of
    paying the full learn again. The table (tiny) is broadcast;
    encoding is a zero-shuffle ``map_batches`` with a PER-WORKER
    word→length cache keyed by the broadcast ref (module-level, so it
    survives across batches in a worker process — crawl vocabularies
    repeat heavily, and most words hit the cache instead of replaying
    ``num_merges`` passes). Rows-only: pinned by a reference-encoder
    test."""
    import os

    import ray

    from pdf_extractor_ray.joins import _cached_get

    if merges is None:
        merges = bpe_learn(sf_dir, num_merges=num_merges)
    mref = ray.put([(l, r) for l, r in zip(merges["left"], merges["right"])])

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        table = _cached_get(mref)
        if len(_BPE_LEN_CACHE) > 4:  # bound stale tables, keep current
            _BPE_LEN_CACHE.clear()
        cache = _BPE_LEN_CACHE.setdefault(mref.hex(), {})

        def n_tok(w: str) -> int:
            n = cache.get(w)
            if n is None:
                syms = list(_bpe_check_word(w)) + [BPE_EOW]
                for left, right in table:
                    syms = _bpe_merge_word(syms, left, right)
                n = len(syms)
                if len(cache) < _BPE_LEN_CACHE_MAX:
                    cache[w] = n
            return n

        ids, ws_n, bpe_n = [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            words = t.split()
            ids.append(doc_id)
            ws_n.append(len(words))
            bpe_n.append(sum(n_tok(w) for w in words))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_tokens_ws": pd.Series(ws_n, dtype="int64"),
                "n_tokens_bpe": pd.Series(bpe_n, dtype="int64"),
            }
        )

    return ds.map_batches(encode, batch_format="pandas", batch_size=8192)


# ---------------------------------------------------------------------------
# Mixture up-sampling (per-source epoch weights)
# ---------------------------------------------------------------------------
# The Pile (Gao et al. 2020, table 1) and GPT-3 (Brown et al. 2020,
# table 2.2) weight training mixtures by repeating high-quality sources
# for >1 epoch while bulk crawl sees <1: each doc of source s is
# emitted floor(w_s) times, plus once more in the partial epoch iff its
# deterministic 32-bit hash rank falls below frac(w_s). Weights are in
# integer MILLI-epochs so the partial-epoch cut is exact integer
# arithmetic on both engines (h * 1000 < frac_milli * 2^32 — the
# SAMPLE_K_SQL hash, no float thresholds). Zero shuffle: a vectorized
# per-batch flat expansion; the weights map is a constant-sized closure
# (a per-source curation decision, known a priori at any corpus size).
MIXTURE_WEIGHTS_MILLI = {"src0": 2500, "src1": 2000, "src2": 500}  # others 1000
MIXTURE_SEED = 777


def mixture_upsample_documents(
    sf_dir: str,
    weights_milli: dict[str, int] | None = None,
    seed: int = MIXTURE_SEED,
) -> ray.data.Dataset:
    """(doc_id, source, epoch) with one row per (doc, epoch) the
    mixture includes — the deterministic up-sampling pass a training
    loader consumes."""
    import os

    w = MIXTURE_WEIGHTS_MILLI if weights_milli is None else weights_milli
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        wm = b["source"].map(w).fillna(1000).to_numpy(np.int64)
        full = wm // 1000
        frac_milli = wm % 1000
        h = _hash32(b["doc_id"].to_numpy(np.uint64), seed)
        partial = (h.astype(np.int64) * 1000 < frac_milli * 4294967296).astype(np.int64)
        n_copies = full + partial
        rep = np.repeat(np.arange(len(b)), n_copies)
        offsets = np.cumsum(n_copies) - n_copies  # empty-batch safe
        epoch = np.arange(int(n_copies.sum())) - np.repeat(offsets, n_copies)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64)[rep],
                "source": b["source"].to_numpy()[rep],
                "epoch": epoch.astype(np.int64),
            }
        )

    return ds.map_batches(expand, batch_format="pandas", batch_size=8192)


def _mixture_case_sql(weights_milli: dict[str, int]) -> str:
    arms = " ".join(f"WHEN '{s}' THEN {m}" for s, m in sorted(weights_milli.items()))
    return f"CASE source {arms} ELSE 1000 END"


# DuckDB's generate_series rejects lateral column bounds, so the
# replay cross-joins a STATIC series sized by the largest weight and
# filters per row — same rows, engine-friendly plan.
_MIXTURE_MAX_EPOCH = max(list(MIXTURE_WEIGHTS_MILLI.values()) + [1000]) // 1000  # + partial

MIXTURE_SQL = f"""
WITH w AS (
    SELECT doc_id, source,
           {_mixture_case_sql(MIXTURE_WEIGHTS_MILLI)} AS w_milli,
           (((CAST(xor(doc_id, {MIXTURE_SEED}) AS HUGEINT) * {SAMPLE_HASH_MULT}) % 4294967296) + 4294967296) % 4294967296 AS h
    FROM documents
), c AS (
    SELECT doc_id, source,
           (w_milli // 1000)
           + CASE WHEN h * 1000 < (w_milli % 1000) * 4294967296 THEN 1 ELSE 0 END AS n_copies
    FROM w
)
SELECT c.doc_id, c.source, CAST(gs.e AS BIGINT) AS epoch
FROM c CROSS JOIN generate_series(0, {_MIXTURE_MAX_EPOCH}) gs(e)
WHERE gs.e < c.n_copies
"""


# ---------------------------------------------------------------------------
# Concat-and-chunk packing (the GPT-pretraining layout: documents laid
# end to end in token space, cut into fixed blocks that may span
# document boundaries) — the complement of pack_sequences' next-fit
# (which never splits a document).
# ---------------------------------------------------------------------------

CHUNK_BLOCK_TOKENS = 128


def concat_chunks(sf_dir: str, block_tokens: int = CHUNK_BLOCK_TOKENS) -> ray.data.Dataset:
    """All documents laid end to end in ``doc_id`` order in token
    space, cut into fixed ``block_tokens`` blocks; a block may span
    documents and a document may span blocks. Output: one row per
    (document, block) overlap — ``(doc_id, block_id, tok_start,
    tok_end)`` with token offsets within the document, end exclusive.
    Empty documents occupy no tokens and emit no rows.

    Scale shape: the global token offsets come from
    :func:`pdf_extractor_ray.ops.prefix_sum` (range-bucketed
    distributed scan — bounded driver state, no global sort, exchange
    carries (doc_id, n_tokens) integers only); the overlap explode is
    zero-shuffle, each row expanding locally into its
    ~n/``block_tokens`` block rows."""
    import os

    from pdf_extractor_ray.ops import prefix_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def tok_counts(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n": pd.Series(
                    [len(t.split()) for t in b["text"]], dtype="int64", index=b.index
                ),
            }
        )

    counts = ds.map_batches(tok_counts, batch_format="pandas", batch_size=4096)
    laid = prefix_sum(counts, "doc_id", "n", out_col="s")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        B = block_tokens
        n = b["n"].to_numpy(dtype=np.int64)
        m = n > 0
        n = n[m]
        s = b["s"].to_numpy(dtype=np.int64)[m]
        ids = b["doc_id"].to_numpy(dtype=np.int64)[m]
        k0 = s // B
        cnt = (s + n - 1) // B - k0 + 1
        total = int(cnt.sum())
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]]) if len(cnt) else np.array([], dtype=np.int64)
        blk = np.repeat(k0, cnt) + (np.arange(total, dtype=np.int64) - np.repeat(starts, cnt))
        rs = np.repeat(s, cnt)
        rn = np.repeat(n, cnt)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, cnt),
                "block_id": blk,
                "tok_start": np.maximum(0, blk * B - rs),
                "tok_end": np.minimum(rn, (blk + 1) * B - rs),
            }
        )

    return laid.map_batches(explode, batch_format="pandas")


def concat_chunks_sql(block_tokens: int = CHUNK_BLOCK_TOKENS) -> str:
    """Exact SQL replica: window-function prefix sum (exclusive),
    per-doc block range via unnest(range(..)) — all-integer, so the
    hash compare has no float path at all."""
    b = int(block_tokens)
    return rf"""
WITH t AS (
    SELECT doc_id,
           CAST(CASE WHEN {_TW} = '' THEN 0
                ELSE len(regexp_split_to_array({_TW}, '{_WS}')) END AS BIGINT) AS n
    FROM documents
), s AS (
    -- window SUM yields HUGEINT; cast back so range()/arithmetic bind
    SELECT doc_id, n,
           CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
    FROM t
), e AS (
    SELECT doc_id, n, s,
           unnest(range(s // {b}, (s + n - 1) // {b} + 1)) AS block_id
    FROM s WHERE n > 0
)
SELECT doc_id, block_id,
       GREATEST(0, block_id * {b} - s) AS tok_start,
       LEAST(n, (block_id + 1) * {b} - s) AS tok_end
FROM e
"""


CONCAT_CHUNKS_SQL = concat_chunks_sql()


# ---------------------------------------------------------------------------
# Length-bucketed batching: assign documents to fixed-size batches in
# (token_count, doc_id) order so same-length docs batch together — the
# standard padding-minimizing layout for batched inference / training.
# ---------------------------------------------------------------------------

BATCH_DOCS = 32
# rank key = n_tokens * 2^32 + doc_id: one integer column both sorts
# on. Preconditions (asserted): 0 <= doc_id < 2^32, n_tokens < 2^31 —
# a document would need ~2 billion tokens to break the second.
_LEN_KEY_SCALE = 1 << 32


def length_bucketed_batches(sf_dir: str, batch_docs: int = BATCH_DOCS) -> ray.data.Dataset:
    """Per-batch padding stats for length-bucketed batching:
    ``(batch_id, n_docs, max_tokens, sum_tokens, padding_tokens)``
    where docs are ranked by (n_tokens, doc_id) and batch =
    rank // ``batch_docs``; padding = max·count − sum, the tokens a
    dense rectangular batch would waste.

    Scale shape: the global rank is :func:`pdf_extractor_ray.ops.
    prefix_sum` with value 1 over the composite integer key — the
    distributed-scan ranker (bounded driver state, no global sort; the
    range buckets inherit the LENGTH distribution here, its documented
    skew trade) — followed by one ``grouped_agg`` exchange carrying
    four integers per doc."""
    import os

    from pdf_extractor_ray.ops import grouped_agg, prefix_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def tok_key(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        n = np.fromiter((len(t.split()) for t in b["text"]), dtype=np.int64, count=len(b))
        if len(ids) and (ids.min() < 0 or ids.max() >= _LEN_KEY_SCALE or n.max() >= (1 << 31)):
            raise ValueError("doc_id/n_tokens outside the composite-key range")
        return pd.DataFrame(
            {"doc_id": ids, "n": n, "key": n * _LEN_KEY_SCALE + ids, "one": np.ones(len(b), dtype=np.int64)}
        )

    ranked = prefix_sum(
        ds.map_batches(tok_key, batch_format="pandas", batch_size=4096), "key", "one", out_col="rank"
    )

    def to_batch(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "batch_id": b["rank"].to_numpy(dtype=np.int64) // batch_docs,
                "n": b["n"].astype("int64"),
            }
        )

    agg = grouped_agg(
        ranked.map_batches(to_batch, batch_format="pandas"),
        ["batch_id"],
        {
            "n_docs": ("n", "count"),
            "max_tokens": ("n", "max"),
            "sum_tokens": ("n", "sum"),
        },
    )

    def pad(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["padding_tokens"] = b["max_tokens"] * b["n_docs"] - b["sum_tokens"]
        return b

    return agg.map_batches(pad, batch_format="pandas")


def length_bucketed_batches_sql(batch_docs: int = BATCH_DOCS) -> str:
    b = int(batch_docs)
    return rf"""
WITH t AS (
    SELECT doc_id,
           CAST(CASE WHEN {_TW} = '' THEN 0
                ELSE len(regexp_split_to_array({_TW}, '{_WS}')) END AS BIGINT) AS n
    FROM documents
), r AS (
    SELECT n, (row_number() OVER (ORDER BY n, doc_id) - 1) // {b} AS batch_id FROM t
)
SELECT batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n) AS BIGINT) AS max_tokens,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(MAX(n) * COUNT(*) - SUM(n) AS BIGINT) AS padding_tokens
FROM r GROUP BY batch_id
"""


LENGTH_BATCHES_SQL = length_bucketed_batches_sql()


# ---------------------------------------------------------------------------
# Deterministic global training-order shuffle (shard assignment)
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 54321
SHUFFLE_SHARD_DOCS = 64
# dropping 2 hash bits keeps the composite key h30 * 2^32 + doc_id
# inside int64 (max (2^30)·2^32 + 2^32 < 2^63)
_SHUFFLE_H_DIV = 4


def shuffle_rank_documents(
    sf_dir: str,
    *,
    shard_docs: int = SHUFFLE_SHARD_DOCS,
    seed: int = SHUFFLE_SEED,
) -> ray.data.Dataset:
    """Deterministic GLOBAL training-order shuffle: every doc gets a
    ``shuffle_pos`` (0-based position in the seeded pseudo-random
    permutation) and a ``shard`` (``pos // shard_docs``) — the layout
    step every pretraining run needs between curation and the data
    loader (a seeded permutation, reproducible on any cluster size,
    NOT ``ds.random_shuffle()`` whose result depends on partitioning).

    Order key = (h30, doc_id) with h30 the shared Knuth 32-bit doc
    hash (:func:`_hash32`, the SAMPLE_K_SQL family) dropped to 30 bits
    so the composite integer key fits int64; doc_id breaks the rare
    collisions deterministically.

    Scale shape: the global position is :func:`pdf_extractor_ray.ops.
    prefix_sum` with value 1 over the composite key — the distributed
    scan ranker (range-bucketed, bounded driver state, no global
    sort). Hashed keys are UNIFORM over the key space, so the ranker's
    range buckets are perfectly balanced here — the adversarial-skew
    caveat that applies to length keys vanishes for shuffle keys."""
    import os

    from pdf_extractor_ray.ops import prefix_sum

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def key(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= _LEN_KEY_SCALE):
            raise ValueError("doc_id outside the composite-key range [0, 2^32)")
        h30 = (_hash32(ids.astype(np.uint64), seed) // _SHUFFLE_H_DIV).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "key": h30 * _LEN_KEY_SCALE + ids,
                "one": np.ones(len(b), dtype=np.int64),
            }
        )

    ranked = prefix_sum(
        ds.map_batches(key, batch_format="pandas", batch_size=8192), "key", "one", out_col="pos"
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        pos = b["pos"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "shuffle_pos": pos,
                "shard": pos // shard_docs,
            }
        )

    return ranked.map_batches(finish, batch_format="pandas")


def shuffle_rank_sql(shard_docs: int = SHUFFLE_SHARD_DOCS, seed: int = SHUFFLE_SEED) -> str:
    # the double-mod replays numpy's uint64→low-32-bit mask for signed
    # doc_id (same derivation as SAMPLE_K_SQL)
    h = (
        f"((((CAST(xor(doc_id, {seed}) AS HUGEINT) * {SAMPLE_HASH_MULT}) % 4294967296)"
        f" + 4294967296) % 4294967296) // {_SHUFFLE_H_DIV}"
    )
    return f"""
WITH h AS (SELECT doc_id, {h} AS h30 FROM documents),
r AS (SELECT doc_id, row_number() OVER (ORDER BY h30, doc_id) - 1 AS pos FROM h)
SELECT doc_id, CAST(pos AS BIGINT) AS shuffle_pos,
       CAST(pos // {int(shard_docs)} AS BIGINT) AS shard
FROM r
"""


SHUFFLE_RANK_SQL = shuffle_rank_sql()


# ---------------------------------------------------------------------------
# Sliding token windows (overlapping context windows)
# ---------------------------------------------------------------------------

SLIDE_WINDOW = 32
SLIDE_STRIDE = 24


def sliding_chunks_documents(
    sf_dir: str,
    *,
    window: int = SLIDE_WINDOW,
    stride: int = SLIDE_STRIDE,
) -> ray.data.Dataset:
    """OVERLAPPING token windows per document — the stride-chunking
    layout for embedding/RAG indexing and long-doc pretraining where
    :func:`chunk_documents`'s disjoint chunks would cut entities at
    boundaries. One row per window: ``(doc_id, win_id, start_tok,
    n_tokens, first_tok)`` with window starts at multiples of
    ``stride`` while ``start < dl``; the last window may be short
    (``n_tokens = min(window, dl - start)``). Empty docs emit nothing.

    Zero shuffle: each batch tokenizes once into a flat token array
    and emits all windows via repeat/offset arithmetic (no per-window
    Python loop); ``first_tok`` pins window CONTENT to the oracle, not
    just the arithmetic."""
    import os

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        toks = [t.split() for t in b["text"]]
        lens = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
        n_wins = np.where(lens > 0, -(-lens // stride), 0)
        did = np.repeat(np.arange(len(toks)), n_wins)
        # win_id = 0..n_wins[d]-1 within each doc: global arange minus
        # each doc's first slot
        first_slot = np.concatenate([[0], np.cumsum(n_wins)[:-1]]) if len(toks) else np.empty(0, np.int64)
        win_id = np.arange(int(n_wins.sum()), dtype=np.int64) - first_slot[did]
        start = win_id * stride
        n_tok = np.minimum(window, lens[did] - start)
        flat = np.array([w for x in toks for w in x], dtype=object)
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(toks) else np.empty(0, np.int64)
        first_tok = flat[doc_start[did] + start] if len(did) else np.empty(0, object)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64)[did],
                "win_id": win_id,
                "start_tok": start.astype(np.int64),
                "n_tokens": n_tok.astype(np.int64),
                "first_tok": pd.Series(first_tok, dtype=object),
            }
        )

    return ds.map_batches(emit, batch_format="pandas", batch_size=4096)


def sliding_chunks_sql(window: int = SLIDE_WINDOW, stride: int = SLIDE_STRIDE) -> str:
    # unnest(range(..)) is the lateral-series idiom here — DuckDB's
    # generate_series rejects per-row column bounds (see MIXTURE_SQL)
    w, s = int(window), int(stride)
    return rf"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN {_TW} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({_TW}, '{_WS}') END AS arr
    FROM documents
), d AS (SELECT doc_id, arr, len(arr) AS dl FROM t),
w AS (SELECT doc_id, arr, dl, unnest(range((dl + {s} - 1) // {s})) AS wi FROM d)
SELECT doc_id,
       CAST(wi AS BIGINT) AS win_id,
       CAST(wi * {s} AS BIGINT) AS start_tok,
       CAST(LEAST({w}, dl - wi * {s}) AS BIGINT) AS n_tokens,
       arr[CAST(wi * {s} + 1 AS BIGINT)] AS first_tok
FROM w
"""


SLIDING_CHUNKS_SQL = sliding_chunks_sql()


# ---------------------------------------------------------------------------
# Token-budget shard assignment (deterministic output sharding)
# ---------------------------------------------------------------------------

SHARD_TOKEN_BUDGET = 2_000  # tokens per output shard (test-scale value)


def shard_assignment_documents(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic token-budget sharding: documents in doc_id order
    are cut into output shards of ≈ :data:`SHARD_TOKEN_BUDGET` tokens —
    ``(doc_id, n_tokens, shard_id)`` with
    ``shard_id = exclusive_prefix_tokens // budget`` (a document
    spanning a boundary belongs to the shard its FIRST token lands in;
    no doc is split). This is the layout step that makes training
    shards size-balanced and the write resumable per shard — the same
    assignment every run, so a failed writer skips finished shards.

    Scale shape: one vectorized token count + the :func:`ops.prefix_sum`
    scan (range buckets on doc_id, bucket totals cumsummed on the
    driver — num_buckets-bounded, never corpus-sized)."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data

    from pdf_extractor_ray.ops import prefix_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def count(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens": pd.Series(
                    [len(t.split()) for t in b["text"]], dtype="int64"
                ),
            }
        )

    counted = ds.map_batches(count, batch_format="pandas")
    scanned = prefix_sum(counted, "doc_id", "n_tokens", "cum_excl")

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens": b["n_tokens"].to_numpy(np.int64),
                "shard_id": b["cum_excl"].to_numpy(np.int64) // SHARD_TOKEN_BUDGET,
            }
        )

    return scanned.map_batches(assign, batch_format="pandas")


def _shard_assignment_sql() -> str:
    from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

    tw = trim_ws_sql("text")
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN {tw} = '' THEN 0
              ELSE len(regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}')) END AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
            // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id
FROM t
"""


SHARD_ASSIGNMENT_SQL = _shard_assignment_sql()


# ---------------------------------------------------------------------------
# Corpus-mix report (the data card's composition table)
# ---------------------------------------------------------------------------


def corpus_mix_report(sf_dir: str) -> "ray.data.Dataset":
    """Corpus composition by source: ``(source, n_docs, n_tokens,
    token_share_milli)`` with ``token_share_milli = 1000·tokens //
    total_tokens`` (exact integer). The table every data card / mixture
    design starts from (The Pile's composition table, GPT-3's dataset
    weights) — and the input :func:`mixture_upsample_documents`'s
    epoch weights are tuned against.

    Scale shape: per-batch (source, docs, tokens) partials → ONE
    source-keyed grouped_sum (sources-bounded result); the total for
    the share divides out of that same tiny table on the driver —
    never a second corpus pass."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data

    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": b["source"].astype(object),
                "n_docs": np.ones(len(b), np.int64),
                "n_tokens": pd.Series(
                    [len(t.split()) for t in b["text"]], dtype="int64"
                ),
            }
        )

    summed = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), ["source"], ["n_docs", "n_tokens"]
    ).materialize()
    total = sum(r["n_tokens"] for r in summed.take_all())  # sources-bounded

    def share(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["token_share_milli"] = (1000 * b["n_tokens"].to_numpy(np.int64)) // total
        return b

    return summed.map_batches(share, batch_format="pandas")


def _corpus_mix_sql() -> str:
    from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

    tw = trim_ws_sql("text")
    return f"""
WITH t AS (
  SELECT source,
         CASE WHEN {tw} = '' THEN 0
              ELSE len(regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}')) END AS n
  FROM documents
),
tot AS (SELECT SUM(n) AS total FROM t)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST((1000 * SUM(n)) // ANY_VALUE(tot.total) AS BIGINT) AS token_share_milli
FROM t, tot GROUP BY source
"""


CORPUS_MIX_SQL = _corpus_mix_sql()


# ---------------------------------------------------------------------------
# Exact-k-per-stratum sample (the per-host/per-lang eval-set cut)
# ---------------------------------------------------------------------------

SAMPLE_K_PER_HOST = 5


def sample_k_per_host_documents(sf_dir: str, k: int = SAMPLE_K_PER_HOST) -> "ray.data.Dataset":
    """Deterministic EXACT-k sample PER STRATUM (host): within each
    host, rank docs by the seeded multiplicative hash and keep the k
    smallest — ``(host, doc_id)``. The per-group twin of
    :func:`sample_k_documents`: the cut every per-host eval set /
    spot-check audit uses, stable under partitioning, scan order, and
    corpus growth (bottom-k semantics per stratum).

    Scale shape: a per-batch per-host partial bottom-k runs BEFORE the
    exchange (a mega-host contributes ≤ k rows per input batch), then
    one host-keyed bucketed exchange finishes the fold — group state
    is k-bounded, never host-sized."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data

    from pdf_extractor_ray.ops import grouped_apply

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "host": pd.Series(
                    [f"h{int(v) % 13}.example.org" for v in d], dtype="object"
                ),
                "doc_id": d,
                "__h": _hash32(d.astype(np.uint64), SAMPLE_SEED).astype(np.int64),
            }
        )
        return (
            out.sort_values(["__h", "doc_id"], kind="mergesort")
            .groupby("host", sort=False)
            .head(k)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["__h", "doc_id"], kind="mergesort")
            .groupby("host", sort=False)
            .head(k)
        )
        return g[["host", "doc_id"]]

    return grouped_apply(
        ds.map_batches(partial, batch_format="pandas"), ["host"], final
    )


SAMPLE_K_PER_HOST_SQL = f"""
SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.org' AS host, doc_id
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY doc_id % 13
  ORDER BY (((CAST(xor(doc_id, {SAMPLE_SEED}) AS HUGEINT) * {SAMPLE_HASH_MULT})
             % 4294967296) + 4294967296) % 4294967296, doc_id
) <= {SAMPLE_K_PER_HOST}
"""


# ---------------------------------------------------------------------------
# Train/test leakage (decontamination) audit
# ---------------------------------------------------------------------------

LEAK_TEST_MOD = 10  # doc_id % 10 == 0 → test (split_train_test's rule)
LEAK_PLANT_MOD = 30  # carrier: every doc_id % 30 == 0 copies doc_id+1's text


def leakage_audit_documents(sf_dir: str) -> ray.data.Dataset:
    """Exact-match leakage between the deterministic train/test split:
    every TEST doc whose full text also appears in TRAIN →
    ``(test_doc_id, train_doc_id, n_train_dups)`` with ``train_doc_id``
    the smallest matching train doc. The decontamination audit every
    eval-set release needs (GPT-3 §4 / C4 app. C shape).

    Scale shape: the exchange carries ``(hash16, doc_id, is_test)`` —
    never text — so a 100-TB corpus moves 25 bytes/doc; the content
    hash is the same 16-byte blake2b the exact-dedup family keys on
    (collision odds negligible vs the oracle's text equality). The
    carrier plants leaks via a distributed self-join (doc_id%30==0
    receives doc_id+1's text), exercising the join path too."""
    import os

    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_apply

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    # --- carrier derivation: plant cross-split exact dups -------------
    def donor_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % LEAK_PLANT_MOD == 0]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "text": b["text"].to_numpy(object),
                "donor_id": b["doc_id"].to_numpy(np.int64) + 1,
            }
        )

    # recipient ⋈ donor text (LEFT-join semantics: a recipient with no
    # donor row keeps its own text — matches the oracle's LEFT JOIN)
    planted = adaptive_inner_join(
        docs.map_batches(donor_key, batch_format="pandas"),
        docs.map_batches(
            lambda b: b.rename(columns={"doc_id": "donor_id", "text": "donor_text"}),
            batch_format="pandas",
        ),
        on="donor_id",
        how="left_outer",
    )
    rest = docs.map_batches(
        lambda b: b[b["doc_id"] % LEAK_PLANT_MOD != 0], batch_format="pandas"
    )

    def planted_rows(b: pd.DataFrame) -> pd.DataFrame:
        text = b["donor_text"].where(b["donor_text"].notna(), b["text"])
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64), "text": text.to_numpy(object)}
        )

    derived = rest.union(planted.map_batches(planted_rows, batch_format="pandas"))

    # --- the audit proper: 16-byte-key exchange, text never moves -----
    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": [hashing.content_hash(t) for t in b["text"]],
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "is_test": (b["doc_id"].to_numpy(np.int64) % LEAK_TEST_MOD == 0),
            }
        )

    def leaks(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("h", sort=False):
            tests = grp.loc[grp["is_test"], "doc_id"]
            trains = grp.loc[~grp["is_test"], "doc_id"]
            if len(tests) and len(trains):
                tmin, ntr = int(trains.min()), len(trains)
                out.extend((int(t), tmin, ntr) for t in tests)
        return pd.DataFrame(
            {
                "test_doc_id": pd.Series([o[0] for o in out], dtype="int64"),
                "train_doc_id": pd.Series([o[1] for o in out], dtype="int64"),
                "n_train_dups": pd.Series([o[2] for o in out], dtype="int64"),
            }
        )

    return grouped_apply(derived.map_batches(keyed, batch_format="pandas"), ["h"], leaks)


LEAKAGE_AUDIT_SQL = f"""
WITH leaked AS (
    SELECT d.doc_id,
           CASE WHEN d.doc_id % {LEAK_PLANT_MOD} = 0 AND dn.text IS NOT NULL
                THEN dn.text ELSE d.text END AS text
    FROM documents d LEFT JOIN documents dn ON dn.doc_id = d.doc_id + 1
)
SELECT te.doc_id AS test_doc_id,
       CAST(MIN(tr.doc_id) AS BIGINT) AS train_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_train_dups
FROM leaked te JOIN leaked tr ON te.text = tr.text
WHERE te.doc_id % {LEAK_TEST_MOD} = 0 AND tr.doc_id % {LEAK_TEST_MOD} <> 0
GROUP BY te.doc_id
"""


# ---------------------------------------------------------------------------
# Cross-lingual bitext candidate mining (rare-token blocking)
# ---------------------------------------------------------------------------

BITEXT_PLANT_MOD = 250
BITEXT_MAX_DF = 4


def derive_bitext_corpus(b: "pd.DataFrame") -> "pd.DataFrame":
    """Carrier: append an alignment anchor ``xl<doc_id % 250>`` to each
    doc — the shared numbers / named entities / URLs that survive
    translation and make cross-lingual pairs discoverable. Docs
    ``doc_id % 250`` apart become planted translation candidates iff
    their languages differ."""
    out = b[["doc_id", "lang"]].copy()
    out["text"] = [
        f"{t} xl{int(d) % BITEXT_PLANT_MOD}" for d, t in zip(b["doc_id"], b["text"])
    ]
    return out


def bitext_candidates(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Cross-lingual bitext CANDIDATE mining (WikiMatrix/CCAligned
    blocking stage): pair docs of DIFFERENT languages that share rare
    tokens (global df ≤ 4 — numbers, entities, URLs; frequent tokens
    block nothing) → top-``k`` ``(doc_a, doc_b, n_shared)`` pairs by
    shared-rare-token count, tie-broken on ``(doc_a, doc_b)``.

    Scale shape: tokens explode with per-batch dedup, one exchange
    counts global df, rare tokens fan out ≤ df² pairs per token GROUPED
    BY TOKEN (the df cap bounds the blowup — the same per-bucket bound
    the LSH band join uses), and one pair-count exchange folds
    candidates. The full alignment stage (margin-scored embeddings)
    would consume these candidates; blocking is the part that must
    scale."""
    import os

    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    ).map_batches(derive_bitext_corpus, batch_format="pandas", batch_size=4096)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, lang, text in zip(b["doc_id"], b["lang"], b["text"]):
            for t in set(text.split(" ")):
                if t:
                    rows.append((t, int(doc_id), lang))
        return pd.DataFrame(rows, columns=["token", "doc_id", "lang"]).astype(
            {"doc_id": "int64"}
        )

    occ = ds.map_batches(explode, batch_format="pandas", batch_size=2048)

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("token", as_index=False).agg(df=("doc_id", "size"))
        g["df"] = g["df"].astype("int64")
        return g

    dfs = grouped_sum(
        occ.map_batches(df_partial, batch_format="pandas"), ["token"], ["df"]
    )

    def rare_only(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[(b["df"] >= 2) & (b["df"] <= BITEXT_MAX_DF), ["token"]]

    rare = dfs.map_batches(rare_only, batch_format="pandas")

    # semi-join BEFORE the pair exchange: frequent (viral) tokens never
    # enter it, so no bucket sees more than BITEXT_MAX_DF rows per key
    from pdf_extractor_ray.joins import semi_join

    rare_occ = semi_join(occ, rare, on="token")

    def pairs_per_token(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("token", sort=False):
            recs = sorted(zip(grp["doc_id"].tolist(), grp["lang"].tolist()))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    if recs[i][1] != recs[j][1]:
                        rows.append((recs[i][0], recs[j][0]))
        out = pd.DataFrame(rows, columns=["doc_a", "doc_b"])
        out["n_shared"] = np.int64(1)
        return out.astype({"doc_a": "int64", "doc_b": "int64"})

    pairs = grouped_apply(rare_occ, ["token"], pairs_per_token)
    counted = grouped_sum(pairs, ["doc_a", "doc_b"], ["n_shared"])
    return counted.sort(
        ["n_shared", "doc_a", "doc_b"], descending=[True, False, False]
    ).limit(k)


BITEXT_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, text || ' xl' || (doc_id % {BITEXT_PLANT_MOD}) AS text
  FROM documents
),
occ AS (
  SELECT DISTINCT doc_id, lang, w AS token
  FROM (SELECT doc_id, lang, unnest(regexp_split_to_array(text, ' ')) AS w FROM d)
  WHERE w != ''
),
rare AS (
  SELECT token FROM occ GROUP BY token
  HAVING COUNT(*) BETWEEN 2 AND {BITEXT_MAX_DF}
),
p AS (
  SELECT o1.doc_id AS doc_a, o2.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM occ o1
  JOIN occ o2 ON o1.token = o2.token AND o1.doc_id < o2.doc_id
               AND o1.lang <> o2.lang
  JOIN rare r ON r.token = o1.token
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
FROM p ORDER BY n_shared DESC, doc_a, doc_b LIMIT 20
"""
