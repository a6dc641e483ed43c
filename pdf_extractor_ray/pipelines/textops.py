"""Text-analysis pipelines over the documents table: token stats,
language ID, quality scoring, fingerprinting — the per-document batch
transforms a training-data pipeline composes (filter-by-quality,
route-by-language, near-dup keying)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

from pdf_extractor_ray.functions.exact import WS_CHAR_RE_SQL, WS_SPLIT_RE_SQL, trim_ws_sql
from pdf_extractor_ray.kernels import hashing, textstats

# Full-whitespace trim shared by every tokenizing oracle (single
# source: functions.exact.trim_ws_sql).
_TW = trim_ws_sql("text")
_WS = WS_SPLIT_RE_SQL
_I64_MAX = 2**63 - 1


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=list(columns))


def doc_token_stats(sf_dir: str) -> ray.data.Dataset:
    """Integer token/char stats (SQL-checkable: ASCII single-space text)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_chars_text": b["text"].str.len().astype(np.int64),
                "n_tokens_ws": b["text"].map(textstats.token_count_ws).astype(np.int64),
            }
        )

    return ds.map_batches(stats, batch_format="pandas", batch_size=8192)


DOC_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_text,
       CAST(CASE WHEN {_TW} = '' THEN 0
                 ELSE array_length(regexp_split_to_array({_TW}, '{_WS}')) END AS BIGINT) AS n_tokens_ws
FROM documents
"""


def lang_count(sf_dir: str) -> ray.data.Dataset:
    """Grouped count by the table's lang column (A1-style distinct+count)."""
    from ray.data.aggregate import Count

    return _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n_docs"))


LANG_COUNT_SQL = "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang"


def lang_id_documents(sf_dir: str) -> ray.data.Dataset:
    """Heuristic language ID vs the labeled lang column; emits
    (doc_id, lang, lang_pred, agree) for accuracy aggregation."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def pred(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "lang_pred": b["text"].map(textstats.lang_id),
            }
        )
        out["agree"] = (out["lang"] == out["lang_pred"]).astype(np.int8)
        return out

    return ds.map_batches(pred, batch_format="pandas", batch_size=4096)


def _stopword_sql_set(lang: str) -> str:
    return ",".join(f"'{w}'" for w in sorted(textstats.STOPWORDS[lang]))


# Exact SQL replica of kernels.textstats.lang_id for the corpus charset
# (single-space lowercase words): first-400-words stopword vote per
# language, first-listed language wins ties (en > de > fr > es, strict
# > to displace), 'und' when no votes or vote ratio < 2%. Verified
# 0 mismatches vs the kernel at sf0.01 and sf0.1.
# (doc_id, lang, lang_pred) core — shared by LANG_ID_SQL and the
# curation-funnel oracle (corpus.CURATION_FUNNEL_SQL)
LANG_PRED_CORE_SQL = f"""
WITH w AS (
    SELECT doc_id, lang, list_slice(string_split(text, ' '), 1, 400) AS words
    FROM documents
), s AS (
    SELECT doc_id, lang, len(words) AS n,
        len(list_filter(words, x -> x IN ({_stopword_sql_set('en')}))) AS s_en,
        len(list_filter(words, x -> x IN ({_stopword_sql_set('de')}))) AS s_de,
        len(list_filter(words, x -> x IN ({_stopword_sql_set('fr')}))) AS s_fr,
        len(list_filter(words, x -> x IN ({_stopword_sql_set('es')}))) AS s_es
    FROM w
), p AS (
    SELECT doc_id, lang, n,
        CASE
            WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr > s_en AND s_fr > s_de AND s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS best_lang,
        greatest(s_en, s_de, s_fr, s_es) AS best
    FROM s
)
SELECT doc_id, lang,
       CASE WHEN best = 0 OR CAST(best AS DOUBLE)/n < 0.02
            THEN 'und' ELSE best_lang END AS lang_pred
FROM p
"""

LANG_ID_SQL = f"""
SELECT doc_id, lang, lang_pred,
       CAST(lang = lang_pred AS TINYINT) AS agree
FROM ({LANG_PRED_CORE_SQL})
"""


def quality_documents(sf_dir: str) -> ray.data.Dataset:
    """Quality features + scalar score per document. The score is
    emitted as integer micro-units (floor(raw*1e6 + 0.5)) so the DuckDB
    oracle hash-matches without decimal-rounding ambiguity; the float
    ratio columns are exact IEEE doubles replayed by the oracle."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        feats = b["text"].map(textstats.quality_stats)
        out = pd.DataFrame(list(feats))
        out.insert(0, "doc_id", b["doc_id"].to_numpy())
        raw = b["text"].map(textstats.quality_score_raw).to_numpy()
        out["quality_micro"] = np.floor(raw * 1e6 + 0.5).astype(np.int64)
        return out

    return ds.map_batches(score, batch_format="pandas", batch_size=4096)


# Exact replay of quality_stats/quality_score_raw for the synthetic
# corpus charset ([a-z0-9 ], single spaces, no newlines — asserted by
# the charset probe in tests): words = split on ' ', punct_ratio = 0,
# n_lines = 1, mean_word_len = (n_chars - (n_words-1)) / n_words, and
# the score is the same left-associated IEEE-double sum as the kernel.
# Stopword list mirrors textstats.STOPWORDS['en'].
QUALITY_SQL = """
WITH q AS (
    SELECT doc_id,
           len(text) AS n_chars,
           CASE WHEN len(text) = 0 THEN 0
                ELSE len(string_split(text, ' ')) END AS n_words,
           len(list_filter(string_split(text, ' '), w -> w IN (
               'the','and','of','to','a','in','is','that','it','for',
               'was','with','on','as','are','this'))) AS n_stop
    FROM documents
), f AS (
    SELECT doc_id, n_chars, n_words, n_stop,
           CASE WHEN n_words = 0 THEN 0.0
                ELSE CAST(n_stop AS DOUBLE) / n_words END AS stopword_ratio,
           CASE WHEN n_words = 0 THEN 0.0
                ELSE CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words END AS mean_word_len
    FROM q
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(CASE WHEN n_chars = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_lines,
       0.0 AS punct_ratio,
       stopword_ratio,
       mean_word_len,
       CAST(CASE WHEN n_words = 0 THEN 0 ELSE floor(
           (0.35 * least(1.0, n_words / 50.0)
            + 0.3 * least(1.0, stopword_ratio / 0.2)
            + 0.2 * 1.0
            + 0.15 * (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0
                           THEN 1.0 ELSE 0.5 END)) * 1000000.0 + 0.5
       ) END AS BIGINT) AS quality_micro
FROM f
"""


def approx_distinct_counts(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """HyperLogLog approximate COUNT DISTINCT over two corpus-scale
    cardinalities: events.user_id and the documents token vocabulary.
    Each batch folds into a fixed 2^p-byte register row; the driver
    max-merges the (fixed-size) register rows — no distinct shuffle,
    no key set anywhere. Accuracy ~1.04/sqrt(2^p) ≈ 1.6% at p=12
    (unit-tested); exact counts would need the ``ops.distinct``
    exchange instead."""
    from pdf_extractor_ray.kernels import sketches

    def fold_col(ds: ray.data.Dataset, col: str, explode_tokens: bool = False) -> float:
        def fold(b: pd.DataFrame) -> pd.DataFrame:
            vals = b[col]
            if explode_tokens:
                vals = vals.str.split(" ").explode()
                vals = vals[vals != ""]
            h = pd.util.hash_array(vals.to_numpy(), hash_key="0123456789abcdef")
            reg = sketches.hll_registers(h, p=p)
            return pd.DataFrame({"reg": [reg.tobytes()]})

        merged = np.zeros(1 << p, dtype=np.uint8)
        for batch in ds.map_batches(fold, batch_format="pandas").iter_batches(batch_format="pandas"):
            for packed in batch["reg"]:
                merged = sketches.hll_merge(merged, np.frombuffer(packed, dtype=np.uint8))
        return sketches.hll_estimate(merged)

    users = fold_col(
        ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"]),
        "user_id",
    )
    tokens = fold_col(
        _docs(sf_dir, ["text"]), "text", explode_tokens=True
    )
    return pd.DataFrame(
        {
            "metric": ["events.user_id", "documents.token"],
            "approx_distinct": np.array([round(users), round(tokens)], dtype=np.int64),
        }
    )


def doc_length_histogram(sf_dir: str, bucket_chars: int = 100, max_bucket: int = 19) -> ray.data.Dataset:
    """Corpus length distribution: documents bucketed by
    ``min(n_chars // bucket_chars, max_bucket)`` with per-bucket counts
    and char totals — the size-profile report a curation run uses to
    pick filtering thresholds. Per-batch partials, one tiny exchange."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = _docs(sf_dir, ["text"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.len().to_numpy()
        return pd.DataFrame(
            {
                "length_bucket": np.minimum(n // bucket_chars, max_bucket).astype(np.int64),
                "n_docs": np.ones(len(b), dtype=np.int64),
                "total_chars": n.astype(np.int64),
            }
        )

    return grouped_sum(
        ds.map_batches(derive, batch_format="pandas", batch_size=8192),
        ["length_bucket"],
        ["n_docs", "total_chars"],
        num_buckets=4,
    )


DOC_LENGTH_HISTOGRAM_SQL = """
SELECT CAST(least(len(text) // 100, 19) AS BIGINT) AS length_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(text) AS BIGINT)) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


def source_lang_matrix(sf_dir: str) -> ray.data.Dataset:
    """Two-dimensional contingency (source × lang doc counts) — the
    composition report for corpus mixing decisions."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = _docs(sf_dir, ["source", "lang"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"source": b["source"], "lang": b["lang"], "n_docs": np.ones(len(b), dtype=np.int64)}
        )

    return grouped_sum(
        ds.map_batches(derive, batch_format="pandas"), ["source", "lang"], ["n_docs"], num_buckets=4
    )


SOURCE_LANG_MATRIX_SQL = """
SELECT source, lang, COUNT(*) AS n_docs FROM documents GROUP BY source, lang
"""


def fingerprint_documents(sf_dir: str) -> ray.data.Dataset:
    """Rolling-hash fingerprint + simhash per document (dedup keying)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "fingerprint": b["text"].map(lambda t: np.int64(hashing.rolling_fingerprint(t) - (1 << 63))),
                "simhash": b["text"].map(lambda t: np.int64(hashing.simhash64(t) - (1 << 63))),
            }
        )

    return ds.map_batches(fp, batch_format="pandas", batch_size=4096)


# Gopher rule thresholds — single source of truth for BOTH the
# standalone operator and the curation funnel (Ray and SQL sides).
GOPHER_WORDS_MIN, GOPHER_WORDS_MAX = 50, 100_000
GOPHER_MEAN_CHARS_MIN, GOPHER_MEAN_CHARS_MAX = 3_000_000, 10_000_000
GOPHER_UNIQUE_RATIO_MIN = 200_000


def gopher_flag_arrays(texts) -> dict[str, np.ndarray]:
    """Vectorized Gopher rule features + flags for an iterable of
    texts — shared by ``gopher_quality_rules`` and
    ``corpus.curation_funnel`` so the thresholds can never diverge."""
    texts = list(texts)
    n_words = np.empty(len(texts), dtype=np.int64)
    uniq = np.empty(len(texts), dtype=np.int64)
    nonws = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = t.split()
        n_words[i] = len(words)
        uniq[i] = len(set(words))
        nonws[i] = sum(len(w) for w in words)
    safe = np.maximum(n_words, 1)
    unique_ratio = np.where(n_words > 0, uniq * 1_000_000 // safe, 0)
    mean_chars = np.where(n_words > 0, nonws * 1_000_000 // safe, 0)
    flag_len = (n_words >= GOPHER_WORDS_MIN) & (n_words <= GOPHER_WORDS_MAX)
    flag_mean = (mean_chars >= GOPHER_MEAN_CHARS_MIN) & (mean_chars <= GOPHER_MEAN_CHARS_MAX)
    flag_uniq = unique_ratio >= GOPHER_UNIQUE_RATIO_MIN
    return {
        "n_words": n_words,
        "unique_words": uniq,
        "unique_ratio_micro": unique_ratio.astype(np.int64),
        "mean_word_chars_micro": mean_chars.astype(np.int64),
        "flag_word_count": flag_len,
        "flag_mean_word_len": flag_mean,
        "flag_unique_ratio": flag_uniq,
        "keep": flag_len & flag_mean & flag_uniq,
    }


def gopher_quality_rules(sf_dir: str) -> ray.data.Dataset:
    """Gopher/C4-style per-document format rules (the rule family of
    Rae et al. 2021 §A1.1, restricted to the rules the corpus charset
    makes exact): word count bounds, mean-word-length bounds, and a
    distinct-word ("repetition") floor. Ratios are integer micro-units
    (floor division) so the DuckDB oracle hash-matches exactly. One
    zero-shuffle vectorized map_batches — at 100 TB this is a pure
    streaming filter stage."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def rules(b: pd.DataFrame) -> pd.DataFrame:
        f = gopher_flag_arrays(b["text"])
        out = {"doc_id": b["doc_id"]}
        for k in ("n_words", "unique_words", "unique_ratio_micro", "mean_word_chars_micro"):
            out[k] = f[k]
        for k in ("flag_word_count", "flag_mean_word_len", "flag_unique_ratio", "keep"):
            out[k] = f[k].astype(np.int8)
        return pd.DataFrame(out)

    return ds.map_batches(rules, batch_format="pandas", batch_size=8192)


# Shared SQL fragments (single source with the Python thresholds):
# metrics CTE body + the keep predicate, reused verbatim by the
# curation-funnel oracle (corpus._curation_funnel_sql).
GOPHER_METRICS_CTE = rf"""
    SELECT doc_id,
           CASE WHEN {_TW} = '' THEN 0
                ELSE array_length(regexp_split_to_array({_TW}, '{_WS}')) END AS n_words,
           CASE WHEN {_TW} = '' THEN 0
                ELSE array_length(list_distinct(regexp_split_to_array({_TW}, '{_WS}'))) END AS unique_words,
           length(regexp_replace(text, '{WS_CHAR_RE_SQL}', '', 'g')) AS nonws,
           text
    FROM documents
"""

GOPHER_KEEP_PRED = (
    f"(n_words BETWEEN {GOPHER_WORDS_MIN} AND {GOPHER_WORDS_MAX})"
    f" AND (mean_word_chars_micro BETWEEN {GOPHER_MEAN_CHARS_MIN} AND {GOPHER_MEAN_CHARS_MAX})"
    f" AND (unique_ratio_micro >= {GOPHER_UNIQUE_RATIO_MIN})"
)

# Exact SQL replica: same \s+ tokenization as DOC_TOKEN_STATS_SQL, same
# integer micro-unit floor division both sides.
GOPHER_RULES_SQL = f"""
WITH w AS ({GOPHER_METRICS_CTE}), m AS (
    SELECT doc_id, n_words, unique_words,
           CASE WHEN n_words = 0 THEN 0 ELSE (unique_words * 1000000) // n_words END AS unique_ratio_micro,
           CASE WHEN n_words = 0 THEN 0 ELSE (nonws * 1000000) // n_words END AS mean_word_chars_micro
    FROM w
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(unique_words AS BIGINT) AS unique_words,
       CAST(unique_ratio_micro AS BIGINT) AS unique_ratio_micro,
       CAST(mean_word_chars_micro AS BIGINT) AS mean_word_chars_micro,
       CAST(n_words BETWEEN {GOPHER_WORDS_MIN} AND {GOPHER_WORDS_MAX} AS TINYINT) AS flag_word_count,
       CAST(mean_word_chars_micro BETWEEN {GOPHER_MEAN_CHARS_MIN} AND {GOPHER_MEAN_CHARS_MAX} AS TINYINT) AS flag_mean_word_len,
       CAST(unique_ratio_micro >= {GOPHER_UNIQUE_RATIO_MIN} AS TINYINT) AS flag_unique_ratio,
       CAST({GOPHER_KEEP_PRED} AS TINYINT) AS keep
FROM m
"""


def contamination_screen(
    sf_dir: str, benchmark_mod: int = 50, k: int = 8
) -> ray.data.Dataset:
    """Benchmark-contamination screen (the pre-training hygiene pass:
    drop training docs that share any k-word shingle with an eval
    benchmark). Docs with ``doc_id % benchmark_mod == 0`` stand in for
    the benchmark set.

    Scale shape: the benchmark k-gram HASH set is built distributed
    (per-batch shingle hashing → fixed-width uint64 arrays), collected
    once (bounded by |benchmark| × words — the benchmark is the small
    side by construction), deduplicated, and broadcast via ``ray.put``;
    the corpus scan is then one zero-shuffle vectorized map_batches
    doing np.isin against the sorted hash array. Nothing scales with
    the corpus on the driver."""
    import ray

    from pdf_extractor_ray.joins import _cached_get

    bench = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: b[b["doc_id"] % benchmark_mod == 0], batch_format="pandas"
    )

    def to_hashes(b: pd.DataFrame) -> pd.DataFrame:
        hs = [hashing.shingle_hashes(t, k=k) for t in b["text"]]
        arr = np.unique(np.concatenate(hs)) if hs else np.empty(0, dtype=np.uint64)
        return pd.DataFrame({"h": arr})

    parts = [
        batch["h"].to_numpy().astype(np.uint64)
        for batch in bench.map_batches(to_hashes, batch_format="pandas").iter_batches(
            batch_format="pandas"
        )
    ]
    bench_hashes = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    ref = ray.put(bench_hashes)  # sorted: np.isin uses binary search path

    ds = _docs(sf_dir, ["doc_id", "text"])

    def screen(b: pd.DataFrame) -> pd.DataFrame:
        bh = _cached_get(ref)
        n_shared = np.empty(len(b), dtype=np.int64)
        for i, t in enumerate(b["text"]):
            sh = hashing.shingle_hashes(t, k=k)
            n_shared[i] = int(np.isin(sh, bh, assume_unique=False).sum())
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_shared_ngrams": n_shared,
                "contaminated": (n_shared > 0).astype(np.int8),
            }
        )

    return ds.map_batches(screen, batch_format="pandas", batch_size=4096)


TFIDF_TOP_K = 3  # single source for the function default AND the SQL oracle


def tfidf_top_terms(
    sf_dir: str, top_k: int = TFIDF_TOP_K, broadcast_limit: int | None = None
) -> ray.data.Dataset:
    """Per-document top-k tf-idf terms, exact-integer scored — with an
    ADAPTIVE df-attach plan, so no driver-side materialization scales
    with the corpus:

    1. document frequency — per-batch partial (word → docs-in-batch)
       via vectorized pandas, one bucketed exchange → a df DATASET
       (vocab-sized, stays in the cluster).
    2. df attach — measured-size plan (same gate as the join planner):
       a small df table is collected and broadcast once (the fast
       path: scoring then runs ZERO-shuffle, each doc wholly local);
       above the rows/bytes gate the df table never leaves the cluster
       — docs explode to (doc_id, word, tf), a hash-partitioned join
       attaches df, and a bucketed exchange on doc_id restores per-doc
       co-location for the top-k. A heavy-tailed web-scale token space
       (typos, URLs, numbers) takes the join path automatically.
       ``broadcast_limit=0`` forces the join plan (row-identity with
       the broadcast plan is pinned in tests).

    Scoring avoids transcendentals so the DuckDB oracle hash-matches
    bit-exactly: ``score = tf * ((N * 1_000_000) // df)`` — the
    integer idf is monotone in ln(N/df), which is all a top-k needs.
    Ties break by ascending word."""
    import ray

    from pdf_extractor_ray.joins import (
        BROADCAST_KEY_LIMIT,
        _cached_get,
        _fits_broadcast,
        join_datasets,
    )
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    if broadcast_limit is None:  # resolved at CALL time (patchable)
        broadcast_limit = BROADCAST_KEY_LIMIT

    ds_words = _docs(sf_dir, ["doc_id", "text"])

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b["text"]:
            for w in set(t.split()):
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame({"word": list(counts), "df": np.fromiter(counts.values(), dtype=np.int64, count=len(counts))})

    df_ds = grouped_sum(
        ds_words.map_batches(df_partial, batch_format="pandas", batch_size=8192),
        ["word"],
        ["df"],
        num_buckets=8,
    )
    n_docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()

    if broadcast_limit:
        df_mat = df_ds.materialize()
        if _fits_broadcast(df_mat, broadcast_limit):
            df_tbl = df_mat.to_pandas()
            # pure-Python ints: c * idf must NOT wrap at int64 (a viral
            # tf against a hapax idf at web scale), or the ranking
            # silently diverges from the HUGEINT oracle; magnitudes are
            # validated at the int64 output cast instead
            idf = {w: int(n_docs * 1_000_000) // int(d) for w, d in zip(df_tbl["word"], df_tbl["df"])}
            dfs = dict(zip(df_tbl["word"], df_tbl["df"].astype(int)))
            ref = ray.put((idf, dfs))

            def score(b: pd.DataFrame) -> pd.DataFrame:
                idf_m, df_m = _cached_get(ref)
                rows = []
                for doc_id, t in zip(b["doc_id"], b["text"]):
                    words = t.split()
                    if not words:
                        continue
                    tf: dict[str, int] = {}
                    for w in words:
                        tf[w] = tf.get(w, 0) + 1
                    scored = sorted(
                        ((w, c, c * idf_m[w]) for w, c in tf.items()),
                        key=lambda x: (-x[2], x[0]),
                    )[:top_k]
                    for w, c, s in scored:
                        if s > _I64_MAX:
                            raise ValueError(
                                f"tfidf_top_terms: score {s} for word {w!r} exceeds "
                                "int64 (the oracle's BIGINT cast would fail too)"
                            )
                        rows.append((doc_id, w, c, df_m[w], s))
                return pd.DataFrame(
                    rows, columns=["doc_id", "word", "tf", "df", "score"]
                ).astype({"doc_id": "int64", "tf": "int64", "df": "int64", "score": "int64"})

            return ds_words.map_batches(score, batch_format="pandas", batch_size=8192)
        df_ds = df_mat  # reuse the materialized blocks on the join path

    # Scale path: the df table never touches the driver. Explode docs
    # to per-(doc, word) term counts, hash-join df on word, then one
    # bucketed exchange on doc_id re-co-locates each document's terms
    # for the exact top-k. Two exchanges, both bounded by the data —
    # never by driver or single-worker memory.
    def tf_partial(b: pd.DataFrame) -> pd.DataFrame:
        ids, words, tfs = [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            tf: dict[str, int] = {}
            for w in t.split():
                tf[w] = tf.get(w, 0) + 1
            ids.extend([doc_id] * len(tf))
            words.extend(tf.keys())
            tfs.extend(tf.values())
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "word": pd.Series(words, dtype="object"),
                "tf": pd.Series(tfs, dtype="int64"),
            }
        )

    word_counts = ds_words.map_batches(tf_partial, batch_format="pandas", batch_size=8192)
    joined = join_datasets(word_counts, df_ds, on="word")

    def add_score(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["df"] = b["df"].astype("int64")
        tf_a = b["tf"].to_numpy()
        idf_a = (n_docs * 1_000_000) // b["df"].to_numpy()
        # int64 wraparound guard: the vectorized product is only trusted
        # when even max(tf) * max(idf) fits; otherwise recompute the
        # batch with exact Python ints (ranking must match the broadcast
        # plan / HUGEINT oracle) and fail loudly on true int64 overflow
        if len(tf_a) and int(tf_a.max()) * int(idf_a.max()) > _I64_MAX:
            exact = [int(t) * int(i) for t, i in zip(tf_a, idf_a)]
            worst = max(exact)
            if worst > _I64_MAX:
                raise ValueError(
                    f"tfidf_top_terms: score {worst} exceeds int64 "
                    "(the oracle's BIGINT cast would fail too)"
                )
            b["score"] = np.array(exact, dtype=np.int64)
        else:
            b["score"] = tf_a * idf_a
        return b

    scored = joined.map_batches(add_score, batch_format="pandas")

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "word"], ascending=[True, False, True], kind="mergesort")
        out = g.groupby("doc_id", sort=False).head(top_k)
        return out[["doc_id", "word", "tf", "df", "score"]].astype(
            {"doc_id": "int64", "tf": "int64", "df": "int64", "score": "int64"}
        )

    return grouped_apply(scored, ["doc_id"], doc_topk)


def tfidf_sql(top_k: int = TFIDF_TOP_K) -> str:
    """Exact SQL replica of ``tfidf_top_terms(top_k=...)``: same \\s+
    tokenization, same integer idf, same (score DESC, word ASC)
    tie-break. ``top_k`` is interpolated so a non-default call can pair
    with a matching oracle instead of silently diverging from a
    hard-coded rank cutoff."""
    return rf"""
WITH w AS (
    SELECT doc_id, unnest(regexp_split_to_array({_TW}, '{_WS}')) AS word
    FROM documents WHERE {_TW} <> ''
), tf AS (
    SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word
), df AS (
    SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word
), n AS (SELECT COUNT(*) AS n FROM documents),
s AS (
    SELECT tf.doc_id, tf.word, tf.tf, df.df,
           tf.tf * ((n.n * 1000000) // df.df) AS score
    FROM tf JOIN df USING (word) CROSS JOIN n
), r AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rk
    FROM s
)
SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score AS BIGINT) AS score
FROM r WHERE rk <= {int(top_k)}
"""


TFIDF_SQL = tfidf_sql()


def heavy_hitter_tokens(
    sf_dir: str, k_counters: int = 64, top_m: int = 10, strict: bool = True
) -> pd.DataFrame:
    """Approximate-then-exact heavy hitters: Misra-Gries candidate
    sweep + exact recount — the sketch path for "top tokens" when the
    vocabulary is too large to shuffle.

    Pass 1 folds each batch into a fixed ``k_counters``-entry summary
    (one tiny row per batch leaves the workers; merge order never
    changes the guarantee), so candidate discovery costs ZERO shuffle
    regardless of vocabulary size. Every token with true frequency
    > N/(k_counters+1) is guaranteed a candidate. Pass 2 recounts ONLY
    the candidates exactly (broadcast set, per-batch partial sums, one
    tiny exchange) — undercounts repaired, final top_m by exact count.
    Compare ``analytics.top_tokens``: exact but shuffles the full
    token stream; this shuffles ≤ k_counters tokens' partials.

    The result is only guaranteed COMPLETE when the weakest returned
    count exceeds the N/(k_counters+1) candidacy floor (a non-candidate
    token can hide at most that many occurrences). The floor is checked
    at runtime from the fold pass's token total — below it the function
    raises (``strict=True``, default) or warns and returns the
    best-effort list: silent incompleteness was the ADVICE r3 finding."""
    import json as _json

    import ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.kernels import sketches
    from pdf_extractor_ray.ops import grouped_sum

    ds = _docs(sf_dir, ["text"])

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        mg: dict[str, int] = {}
        n_tokens = 0
        distinct: set[str] = set()
        for t in b["text"]:
            words = t.split()
            n_tokens += len(words)
            if len(distinct) <= k_counters:  # early-exit: only ≤/> matters
                distinct.update(words)
            mg = sketches.mg_merge(mg, sketches.mg_fold(words, k=k_counters), k=k_counters)
        # batch distinct ≤ k ⟺ no decrement ever ran ⟺ this summary is
        # EXACT and covers every token in the batch
        return pd.DataFrame(
            {
                "summary": [_json.dumps(mg)],
                "n_tokens": [n_tokens],
                "exact": [len(distinct) <= k_counters],
            }
        )

    merged: dict[str, int] = {}
    n_total = 0
    all_exact = True
    for batch in ds.map_batches(fold, batch_format="pandas", batch_size=4096).iter_batches(
        batch_format="pandas"
    ):
        for s, nt, ex in zip(batch["summary"], batch["n_tokens"], batch["exact"]):
            loaded = _json.loads(s)
            if not ex or len(set(merged) | set(loaded)) > k_counters:
                all_exact = False  # a merge that must decrement loses exactness
            merged = sketches.mg_merge(merged, loaded, k=k_counters)
            n_total += int(nt)
    cand = frozenset(merged)
    ref = ray.put(cand)

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        cs = _cached_get(ref)
        counts: dict[str, int] = {}
        for t in b["text"]:
            for w in t.split():
                if w in cs:
                    counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame(
            {"token": list(counts), "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts))}
        )

    exact = grouped_sum(
        ds.map_batches(recount, batch_format="pandas", batch_size=4096),
        ["token"],
        ["n"],
        num_buckets=2,
    ).to_pandas()
    result = (
        exact.sort_values(["n", "token"], ascending=[False, True])
        .head(top_m)
        .reset_index(drop=True)
    )
    # completeness guard: any NON-candidate token has true frequency
    # ≤ floor, so the top_m is provably complete iff its weakest
    # returned count beats the floor (or the request outran the corpus).
    # Exemption: when no fold/merge ever decremented (all_exact), the
    # candidate set IS the full vocabulary and the counts are exact —
    # a corpus with fewer distinct tokens than top_m is then a complete
    # answer, not an incompleteness to raise on.
    floor = n_total // (k_counters + 1)
    weakest = int(result["n"].iloc[-1]) if len(result) else 0
    # fewer candidates than top_m is itself incompleteness: every
    # absent token has count <= floor, but ranks len(result)+1..top_m
    # cannot be named (min(top_m, len(exact)) made this clause dead)
    if n_total and not all_exact and (len(result) < top_m or weakest <= floor):
        msg = (
            f"heavy_hitter_tokens: top_{top_m} not guaranteed complete — weakest "
            f"returned count {weakest} ≤ candidacy floor N/(k+1) = {floor} "
            f"(N={n_total}, k_counters={k_counters}); raise k_counters"
        )
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return result


def heavy_hitter_tokens_query(sf_dir: str, top_m: int = 10) -> pd.DataFrame:
    """Driver/bench carrier for ``heavy_hitter_tokens`` (ADVICE r4): a
    long-running unattended invocation must not hard-fail when the
    completeness floor fires on a flatter corpus — auto-retry with a
    4×-larger sketch (each retry re-streams the corpus but the summary
    stays k_counters-bounded), then warn and return best-effort at the
    cap. Direct API callers keep strict=True semantics."""
    for k_counters in (64, 256, 1024):
        try:
            return heavy_hitter_tokens(sf_dir, k_counters=k_counters, top_m=top_m)
        except ValueError:
            continue
    return heavy_hitter_tokens(sf_dir, k_counters=4096, top_m=top_m, strict=False)


def contamination_screen_bloom(
    sf_dir: str, benchmark_mod: int = 50, k: int = 8, bloom_bits: int = 1 << 20
) -> ray.data.Dataset:
    """The 100 TB path for ``contamination_screen``: the benchmark
    shingle set is NEVER collected — a fixed-size Bloom filter
    (``bloom_bits/8`` bytes regardless of benchmark size) prefilters
    the corpus, and only the flagged docs' shingles go through a
    DISTRIBUTED exact semi-join against the benchmark shingle rows.

    Bloom has no false negatives, so the flagged set is a superset of
    the truth and the exact verify trims it — output is row-identical
    to ``contamination_screen`` (pinned by a test). The verify
    exchange carries (doc_id, shingle_hash) rows for FLAGGED docs
    only; at a realistic contamination rate that is a sliver of the
    corpus."""
    import ray

    from pdf_extractor_ray import joins as J
    from pdf_extractor_ray.ops import grouped_sum

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench_docs = docs.map_batches(
        lambda b: b[b["doc_id"] % benchmark_mod == 0], batch_format="pandas"
    )

    def bench_hash_rows(b: pd.DataFrame) -> pd.DataFrame:
        hs = [hashing.shingle_hashes(t, k=k) for t in b["text"]]
        arr = np.unique(np.concatenate(hs)) if hs else np.empty(0, dtype=np.uint64)
        # uint64 → int64 view: parquet/exchange-friendly, hash-stable
        return pd.DataFrame({"h": arr.view(np.int64)})

    bench_rows = bench_docs.map_batches(bench_hash_rows, batch_format="pandas").materialize()
    bloom = J.build_bloom(bench_rows, "h", num_bits=bloom_bits)
    bref = ray.put(bloom)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        bl = J._cached_get(bref)
        out = []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            sh = np.unique(hashing.shingle_hashes(t, k=k)).view(np.int64)
            if len(sh) == 0:
                continue
            maybe = J.bloom_contains(pd.Series(sh), bl, num_bits=bloom_bits)
            if maybe.any():  # only MAYBE-hit shingles go to the verify
                hits = sh[maybe]
                out.append(
                    pd.DataFrame({"doc_id": np.full(len(hits), doc_id, dtype=np.int64), "h": hits})
                )
        if out:
            return pd.concat(out, ignore_index=True)
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "h": pd.Series([], dtype="int64")}
        )

    maybe_rows = docs.map_batches(flag, batch_format="pandas", batch_size=4096)
    # exact verify: distributed semi-join of the flagged docs' shingles
    # against the benchmark shingle rows (forced exchange — the whole
    # point is that nothing benchmark-sized is broadcast)
    verified = J.semi_join(maybe_rows, bench_rows, on="h", broadcast_limit=0)
    counts = grouped_sum(
        verified.map_batches(
            lambda b: pd.DataFrame({"doc_id": b["doc_id"], "n_shared_ngrams": np.ones(len(b), dtype=np.int64)}),
            batch_format="pandas",
        ),
        ["doc_id"],
        ["n_shared_ngrams"],
        num_buckets=4,
    )
    # left-outer back onto the corpus ids: unflagged docs are clean
    ids = docs.map_batches(lambda b: b[["doc_id"]], batch_format="pandas")
    out = J.adaptive_inner_join(ids, counts, on="doc_id", how="left_outer")

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_shared_ngrams"].fillna(0).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_shared_ngrams": n,
                "contaminated": (n > 0).astype(np.int8),
            }
        )

    return out.map_batches(finalize, batch_format="pandas")


# PII patterns: deliberately backreference/lookaround-free so Python re
# and DuckDB's RE2 match IDENTICALLY (the oracle replays them verbatim)
PII_EMAIL_PAT = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_PAT = r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"


def redact_pii(sf_dir: str) -> ray.data.Dataset:
    """Training-data hygiene: redact email addresses and phone-shaped
    numbers, reporting per-doc match counts and the redacted length —
    a pure zero-shuffle map_batches (the redaction pass every public
    corpus build runs before tokenization). Patterns are RE2-safe so
    the DuckDB oracle replays them exactly."""
    import re

    email_re = re.compile(PII_EMAIL_PAT)
    phone_re = re.compile(PII_PHONE_PAT)
    ds = _docs(sf_dir, ["doc_id", "text"])

    def redact(b: pd.DataFrame) -> pd.DataFrame:
        n_email = np.empty(len(b), dtype=np.int64)
        n_phone = np.empty(len(b), dtype=np.int64)
        n_chars = np.empty(len(b), dtype=np.int64)
        for i, t in enumerate(b["text"]):
            t1, ne = email_re.subn("[EMAIL]", t)
            t2, np_ = phone_re.subn("[PHONE]", t1)
            n_email[i], n_phone[i], n_chars[i] = ne, np_, len(t2)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_emails": n_email,
                "n_phones": n_phone,
                "n_chars_redacted": n_chars,
            }
        )

    return ds.map_batches(redact, batch_format="pandas", batch_size=8192)


REDACT_PII_SQL = rf"""
WITH e AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_PAT}')) AS BIGINT) AS n_emails,
           regexp_replace(text, '{PII_EMAIL_PAT}', '[EMAIL]', 'g') AS t1
    FROM documents
)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(t1, '{PII_PHONE_PAT}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_replace(t1, '{PII_PHONE_PAT}', '[PHONE]', 'g')) AS BIGINT) AS n_chars_redacted
FROM e
"""


# ---------------------------------------------------------------------------
# Gopher repetition metrics (the rule family gopher_quality_rules lacks)
# ---------------------------------------------------------------------------

# Rae et al. 2021 §A1.1 repetition filters, bigram instance: a doc is
# repetitious when its most frequent word 2-gram covers too many of its
# characters, or too many of its 2-gram occurrences are repeats.
TOP_BIGRAM_MAX_MICRO = 200_000  # top-2-gram char fraction ≤ 0.20
DUP_BIGRAM_MAX_MICRO = 600_000  # non-first 2-gram occurrences ≤ 0.60


def repetition_metrics(sf_dir: str) -> ray.data.Dataset:
    """Per-document bigram repetition metrics in integer micro-units
    (floor division — hash-exact vs the SQL oracle):

    - ``dup_bigram_micro``: (n_bigrams − distinct_bigrams) / n_bigrams
    - ``top_bigram_chars_micro``: top-bigram occurrences × its char
      length / non-whitespace chars; the top bigram is chosen by
      (count desc, char length desc, lexicographic asc) so ties are
      deterministic on both sides.

    Zero shuffle: one vectorized ``map_batches`` — a pure streaming
    filter stage at 100 TB, same shape as ``gopher_quality_rules``."""
    from collections import Counter

    ds = _docs(sf_dir, ["doc_id", "text"])

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        n_bg = np.zeros(n, dtype=np.int64)
        dist = np.zeros(n, dtype=np.int64)
        dup_micro = np.zeros(n, dtype=np.int64)
        top_cnt = np.zeros(n, dtype=np.int64)
        top_micro = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(b["text"]):
            words = t.split()
            if len(words) < 2:
                continue
            nonws = sum(len(w) for w in words)
            counts = Counter(zip(words, words[1:]))
            n_bg[i] = len(words) - 1
            dist[i] = len(counts)
            dup_micro[i] = (n_bg[i] - dist[i]) * 1_000_000 // n_bg[i]
            (a, bword), c = min(
                counts.items(), key=lambda kv: (-kv[1], -(len(kv[0][0]) + len(kv[0][1])), kv[0])
            )
            top_cnt[i] = c
            top_micro[i] = c * (len(a) + len(bword)) * 1_000_000 // nonws
        keep = (top_micro <= TOP_BIGRAM_MAX_MICRO) & (dup_micro <= DUP_BIGRAM_MAX_MICRO)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": n_bg,
                "distinct_bigrams": dist,
                "dup_bigram_micro": dup_micro,
                "top_bigram_count": top_cnt,
                "top_bigram_chars_micro": top_micro,
                "keep_repetition": keep.astype(np.int8),
            }
        )

    return ds.map_batches(metrics, batch_format="pandas", batch_size=8192)


REPETITION_METRICS_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN {_TW} = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array({_TW}, '{_WS}') END AS ws,
         length(regexp_replace(text, '{WS_CHAR_RE_SQL}', '', 'g')) AS nonws
  FROM documents
),
bg AS (
  SELECT doc_id, nonws, unnest(ws[1:len(ws)-1]) AS a, unnest(ws[2:len(ws)]) AS b
  FROM d WHERE len(ws) >= 2
),
cnt AS (SELECT doc_id, ANY_VALUE(nonws) AS nonws, a, b, COUNT(*) AS c FROM bg GROUP BY doc_id, a, b),
agg AS (SELECT doc_id, SUM(c) AS n_bigrams, COUNT(*) AS distinct_bigrams FROM cnt GROUP BY doc_id),
top AS (
  SELECT doc_id, c, length(a) + length(b) AS bl, nonws,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY c DESC, length(a) + length(b) DESC, a ASC, b ASC
         ) AS rk
  FROM cnt
)
SELECT d.doc_id,
       CAST(COALESCE(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(agg.distinct_bigrams, 0) AS BIGINT) AS distinct_bigrams,
       CAST(COALESCE((agg.n_bigrams - agg.distinct_bigrams) * 1000000 // agg.n_bigrams, 0) AS BIGINT) AS dup_bigram_micro,
       CAST(COALESCE(top.c, 0) AS BIGINT) AS top_bigram_count,
       CAST(COALESCE(top.c * top.bl * 1000000 // top.nonws, 0) AS BIGINT) AS top_bigram_chars_micro,
       CAST(COALESCE(top.c * top.bl * 1000000 // top.nonws, 0) <= {TOP_BIGRAM_MAX_MICRO}
            AND COALESCE((agg.n_bigrams - agg.distinct_bigrams) * 1000000 // agg.n_bigrams, 0) <= {DUP_BIGRAM_MAX_MICRO}
            AS TINYINT) AS keep_repetition
FROM d
LEFT JOIN agg ON d.doc_id = agg.doc_id
LEFT JOIN top ON d.doc_id = top.doc_id AND top.rk = 1
"""


# ---------------------------------------------------------------------------
# Bigram language-model NLL scoring (CCNet-style quality signal —
# Wenzek et al. 2020 score documents by LM perplexity against clean
# reference text; here the LM is a top-K-vocabulary bigram model
# trained on the corpus's own lang='en' slice, so the whole thing is
# SQL-replicable without any hash function)
# ---------------------------------------------------------------------------

LM_VOCAB_K = 256


def _lm_topk_vocab(ref: ray.data.Dataset, vocab_k: int) -> frozenset:
    """Top-``vocab_k`` words of the reference slice by count, ties
    broken by word ASC (the LM-family vocab contract, shared by the
    bigram and trigram models so their oracles replay ONE definition).

    Scale shape: one word-count ``grouped_sum`` whose exchange is
    bounded by the slice's distinct words (the tf-idf-df bound), then
    per-batch local top-K prune → sort+limit over the PRUNED stream
    (K rows per batch, the ``train_centroids`` pattern — the full
    vocabulary is never sorted or collected)."""
    from pdf_extractor_ray.ops import grouped_sum

    def word_counts(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b["text"]:
            for w in t.split():
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame(
            {"word": list(counts), "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts))}
        )

    wc = grouped_sum(
        ref.map_batches(word_counts, batch_format="pandas", batch_size=8192),
        ["word"],
        ["n"],
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        # any global top-K row is in its batch's local top-K: prune
        # here so only K rows per batch reach the global sort
        if len(b) > vocab_k:
            b = b.sort_values(["n", "word"], ascending=[False, True], kind="mergesort").head(
                vocab_k
            )
        return b

    top = (
        wc.map_batches(local_topk, batch_format="pandas")
        .sort(["n", "word"], descending=[True, False])
        .limit(vocab_k)
        .take_all()
    )
    return frozenset(r["word"] for r in top)


def lm_bigram_nll(
    sf_dir: str, vocab_k: int = LM_VOCAB_K, ref_lang: str = "en"
) -> ray.data.Dataset:
    """Per-document bigram negative log likelihood in integer
    micro-nats: ``(doc_id, n_bigrams, nll_total_micro)``.

    Model (identical in the SQL oracle):
    - tokens: full-whitespace split of trimmed text (repo convention);
    - vocab: top ``vocab_k`` words of the ``ref_lang`` slice by count,
      ties broken by word ASC; every other word maps to the OOV
      sentinel ``''`` (unreachable by a real token — splits never
      yield empties);
    - counts: bigram table over the mapped reference slice; C1 is the
      bigram-table marginal over the first word (so P(.|w1) sums to 1);
    - per-bigram score: ``floor(-ln((C2+1)/(C1+V)) * 1e6 + 0.5)`` with
      ``V = vocab_k + 1`` (add-one smoothing over the mapped alphabet);
      summed per doc as exact integers.

    Scale shape: vocab discovery pays ONE word-count ``grouped_sum``
    whose exchange is bounded by the reference slice's distinct words
    (the tf-idf-df bound — corpus-order on a heavy-tailed web corpus,
    same as every vocabulary-building op here); the top-K then comes
    from a per-batch local top-K prune → sort+limit over the PRUNED
    stream (K rows per batch, the ``train_centroids`` pattern — the
    full vocabulary is never sorted or collected). Bigram counting is
    one ``grouped_sum`` exchange bounded by the MAPPED alphabet,
    ≤ (K+1)² pairs regardless of corpus size (the DSIR-style constant
    bound), which is also the driver-collect bound for the broadcast
    model. Scoring is zero-shuffle.

    Float note: the only non-integer step is ln() on one ratio per
    DISTINCT (C2, C1) pair. numpy/DuckDB libm may differ by ~1 ulp
    (1e-16 relative); a micro-round flip needs the value within 1e-10
    of a rounding boundary — ≤ (K+1)² distinct pairs keeps the flip
    probability ~1e-5, the same budget the micro-cosine oracles run
    on."""
    import math

    import ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.ops import grouped_sum

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    ref = ds.map_batches(
        lambda b: b.loc[b["lang"] == ref_lang, ["text"]], batch_format="pandas"
    )
    vocab = _lm_topk_vocab(ref, vocab_k)
    vref = ray.put(vocab)
    v_total = vocab_k + 1

    def bigram_counts(b: pd.DataFrame) -> pd.DataFrame:
        vset = _cached_get(vref)
        counts: dict[tuple[str, str], int] = {}
        for t in b["text"]:
            ws = t.split()
            for a, c in zip(ws, ws[1:]):
                key = (a if a in vset else "", c if c in vset else "")
                counts[key] = counts.get(key, 0) + 1
        return pd.DataFrame(
            {
                "w1": [k[0] for k in counts],
                "w2": [k[1] for k in counts],
                "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    c2_tbl = grouped_sum(
        ref.map_batches(bigram_counts, batch_format="pandas", batch_size=8192),
        ["w1", "w2"],
        ["n"],
    ).to_pandas()  # ≤ (K+1)² rows by construction — constant driver bound
    if c2_tbl.empty:
        # degenerate reference (no ref_lang docs, or none with >= 2
        # tokens): every bigram scores cold — the oracle's COALESCE
        # path; an empty grouped_sum yields a column-less frame, so the
        # zip below must not touch named columns
        c2 = {}
    else:
        c2 = {(a, b_): int(n) for a, b_, n in zip(c2_tbl["w1"], c2_tbl["w2"], c2_tbl["n"])}
    c1: dict[str, int] = {}
    for (a, _), n in c2.items():
        c1[a] = c1.get(a, 0) + n
    # per-(C2, C1) micro-nat table, computed ONCE; every expression
    # mirrors the oracle's SHAPE exactly (-ln(num/den) with the same
    # operand order) so the only float divergence is the shared-libm
    # 1-ulp, never an extra rounding step
    nll_pair = {
        k: int(math.floor(-math.log((n + 1) / (c1[k[0]] + v_total)) * 1_000_000 + 0.5))
        for k, n in c2.items()
    }
    nll_miss = {
        a: int(math.floor(-math.log(1 / (n + v_total)) * 1_000_000 + 0.5)) for a, n in c1.items()
    }
    nll_cold = int(math.floor(-math.log(1 / v_total) * 1_000_000 + 0.5))
    mref = ray.put((vocab, nll_pair, nll_miss))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vset, pair_m, miss_m = _cached_get(mref)
        ids, nbg, tot = [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            ws = t.split()
            s = 0
            n = max(len(ws) - 1, 0)
            for a, c in zip(ws, ws[1:]):
                key = (a if a in vset else "", c if c in vset else "")
                v = pair_m.get(key)
                if v is None:
                    v = miss_m.get(key[0], nll_cold)
                s += v
            ids.append(doc_id)
            nbg.append(n)
            tot.append(s)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_bigrams": pd.Series(nbg, dtype="int64"),
                "nll_total_micro": pd.Series(tot, dtype="int64"),
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=8192)


def lm_bigram_nll_sql(vocab_k: int = LM_VOCAB_K, ref_lang: str = "en") -> str:
    """Exact SQL replica of ``lm_bigram_nll``: same tokenization, same
    (count DESC, word ASC) vocab ties, same OOV sentinel, same add-one
    micro-nat rounding."""
    v_total = vocab_k + 1
    return rf"""
WITH tok AS (
    SELECT doc_id, lang, regexp_split_to_array({_TW}, '{_WS}') AS ws
    FROM documents WHERE {_TW} <> ''
), rw AS (
    SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos
    FROM tok WHERE lang = '{ref_lang}'
), vocab AS (
    SELECT w FROM (SELECT w, COUNT(*) AS n FROM rw GROUP BY w)
    ORDER BY n DESC, w LIMIT {int(vocab_k)}
), rbg AS (
    SELECT CASE WHEN a.w IN (SELECT w FROM vocab) THEN a.w ELSE '' END AS w1,
           CASE WHEN b.w IN (SELECT w FROM vocab) THEN b.w ELSE '' END AS w2
    FROM rw a JOIN rw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), c2 AS (
    SELECT w1, w2, COUNT(*) AS n FROM rbg GROUP BY w1, w2
), c1 AS (
    SELECT w1, SUM(n) AS n1 FROM c2 GROUP BY w1
), aw AS (
    SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos FROM tok
), abg AS (
    SELECT a.doc_id,
           CASE WHEN a.w IN (SELECT w FROM vocab) THEN a.w ELSE '' END AS w1,
           CASE WHEN b.w IN (SELECT w FROM vocab) THEN b.w ELSE '' END AS w2
    FROM aw a JOIN aw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), scored AS (
    SELECT abg.doc_id,
           CAST(floor(-ln((COALESCE(c2.n, 0) + 1.0) / (COALESCE(c1.n1, 0) + {v_total}))
                      * 1000000 + 0.5) AS BIGINT) AS nll
    FROM abg
    LEFT JOIN c2 ON abg.w1 = c2.w1 AND abg.w2 = c2.w2
    LEFT JOIN c1 ON abg.w1 = c1.w1
), agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll) AS BIGINT) AS nll_total_micro
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_bigrams, 0) AS n_bigrams,
       COALESCE(agg.nll_total_micro, 0) AS nll_total_micro
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


LM_NLL_SQL = lm_bigram_nll_sql()

# trigram default: the model table is bounded by min(corpus trigrams,
# (K+1)³) — at K=64 that is ≤ 275k entries (driver- and broadcast-safe
# at any corpus size); the bigram's K=256 would allow 17M. Guarded in
# the function.
LM_TRIGRAM_VOCAB_K = 64
_LM_TRIGRAM_MODEL_LIMIT = 1 << 21


def lm_trigram_nll(
    sf_dir: str, vocab_k: int = LM_TRIGRAM_VOCAB_K, ref_lang: str = "en"
) -> ray.data.Dataset:
    """Per-document TRIGRAM negative log likelihood in integer
    micro-nats: ``(doc_id, n_trigrams, nll_total_micro)`` — the
    higher-order option of :func:`lm_bigram_nll` (TODO_ROUND6 #8),
    sharing its vocab contract, OOV sentinel, add-one smoothing and
    per-n-gram integer rounding, with the context marginal taken over
    the trigram table (so P(.|w1,w2) sums to 1 over the mapped
    alphabet).

    Scale shape: identical to the bigram op except the count-table
    bound is min(corpus trigrams, (K+1)³) instead of (K+1)². That cube
    is why ``vocab_k`` defaults LOWER than the bigram's: the count
    table is driver-collected and broadcast, so the function refuses a
    ``vocab_k`` whose worst case exceeds ~2M entries rather than
    silently building a corpus-sized model. Scoring is zero-shuffle.

    Float note: same 1-ulp budget as the bigram model — one ln() per
    distinct (C3, C2ctx) pair, per-trigram integer rounding."""
    import math

    import ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.ops import grouped_sum

    if (vocab_k + 1) ** 3 > _LM_TRIGRAM_MODEL_LIMIT:
        raise ValueError(
            f"vocab_k={vocab_k}: worst-case trigram table {(vocab_k + 1) ** 3} entries "
            f"exceeds the broadcast budget ({_LM_TRIGRAM_MODEL_LIMIT}); use a smaller "
            "vocab or the bigram model"
        )

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    ref = ds.map_batches(
        lambda b: b.loc[b["lang"] == ref_lang, ["text"]], batch_format="pandas"
    )
    vocab = _lm_topk_vocab(ref, vocab_k)
    vref = ray.put(vocab)
    v_total = vocab_k + 1

    def trigram_counts(b: pd.DataFrame) -> pd.DataFrame:
        vset = _cached_get(vref)
        counts: dict[tuple[str, str, str], int] = {}
        for t in b["text"]:
            ws = [w if w in vset else "" for w in t.split()]
            for key in zip(ws, ws[1:], ws[2:]):
                counts[key] = counts.get(key, 0) + 1
        return pd.DataFrame(
            {
                "w1": [k[0] for k in counts],
                "w2": [k[1] for k in counts],
                "w3": [k[2] for k in counts],
                "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    c3_tbl = grouped_sum(
        ref.map_batches(trigram_counts, batch_format="pandas", batch_size=8192),
        ["w1", "w2", "w3"],
        ["n"],
    ).to_pandas()  # ≤ min(corpus trigrams, (K+1)³) rows — guarded above
    if c3_tbl.empty:
        c3 = {}
    else:
        c3 = {
            (a, b_, c): int(n)
            for a, b_, c, n in zip(c3_tbl["w1"], c3_tbl["w2"], c3_tbl["w3"], c3_tbl["n"])
        }
    ctx: dict[tuple[str, str], int] = {}
    for (a, b_, _), n in c3.items():
        ctx[(a, b_)] = ctx.get((a, b_), 0) + n
    nll_tri = {
        k: int(math.floor(-math.log((n + 1) / (ctx[k[:2]] + v_total)) * 1_000_000 + 0.5))
        for k, n in c3.items()
    }
    nll_miss = {
        k: int(math.floor(-math.log(1 / (n + v_total)) * 1_000_000 + 0.5)) for k, n in ctx.items()
    }
    nll_cold = int(math.floor(-math.log(1 / v_total) * 1_000_000 + 0.5))
    mref = ray.put((vocab, nll_tri, nll_miss))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vset, tri_m, miss_m = _cached_get(mref)
        ids, ntg, tot = [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            ws = [w if w in vset else "" for w in t.split()]
            s = 0
            for key in zip(ws, ws[1:], ws[2:]):
                v = tri_m.get(key)
                if v is None:
                    v = miss_m.get(key[:2], nll_cold)
                s += v
            ids.append(doc_id)
            ntg.append(max(len(ws) - 2, 0))
            tot.append(s)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_trigrams": pd.Series(ntg, dtype="int64"),
                "nll_total_micro": pd.Series(tot, dtype="int64"),
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=8192)


def lm_trigram_nll_sql(vocab_k: int = LM_TRIGRAM_VOCAB_K, ref_lang: str = "en") -> str:
    """Exact SQL replica of :func:`lm_trigram_nll`: same tokenization,
    vocab ties, OOV sentinel, context marginal and micro-nat rounding
    (positional trigrams via pos+1/pos+2 self-joins — the same pattern
    the bigram oracle uses, since ``generate_series`` cannot
    lateral-correlate in DuckDB)."""
    v_total = vocab_k + 1
    return rf"""
WITH tok AS (
    SELECT doc_id, lang, regexp_split_to_array({_TW}, '{_WS}') AS ws
    FROM documents WHERE {_TW} <> ''
), vtop AS (
    SELECT w AS word FROM (
        SELECT unnest(ws) AS w FROM tok WHERE lang = '{ref_lang}'
    ) GROUP BY w ORDER BY COUNT(*) DESC, w LIMIT {int(vocab_k)}
), rw AS (
    SELECT doc_id,
           CASE WHEN w IN (SELECT word FROM vtop) THEN w ELSE '' END AS w, pos
    FROM (
        SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos
        FROM tok WHERE lang = '{ref_lang}'
    )
), c3 AS (
    SELECT a.w AS w1, b.w AS w2, c.w AS w3, COUNT(*) AS n
    FROM rw a
    JOIN rw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    JOIN rw c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    GROUP BY a.w, b.w, c.w
), ctx AS (
    SELECT w1, w2, SUM(n) AS n2 FROM c3 GROUP BY w1, w2
), aw AS (
    SELECT doc_id,
           CASE WHEN w IN (SELECT word FROM vtop) THEN w ELSE '' END AS w, pos
    FROM (
        SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos FROM tok
    )
), atg AS (
    SELECT a.doc_id, a.w AS w1, b.w AS w2, c.w AS w3
    FROM aw a
    JOIN aw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    JOIN aw c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
), scored AS (
    SELECT atg.doc_id,
           CAST(floor(-ln((COALESCE(c3.n, 0) + 1.0) / (COALESCE(ctx.n2, 0) + {v_total}))
                      * 1000000 + 0.5) AS BIGINT) AS nll
    FROM atg
    LEFT JOIN c3 ON atg.w1 = c3.w1 AND atg.w2 = c3.w2 AND atg.w3 = c3.w3
    LEFT JOIN ctx ON atg.w1 = ctx.w1 AND atg.w2 = ctx.w2
), agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(nll) AS BIGINT) AS nll_total_micro
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_trigrams, 0) AS n_trigrams,
       COALESCE(agg.nll_total_micro, 0) AS nll_total_micro
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


LM_TRIGRAM_NLL_SQL = lm_trigram_nll_sql()


def lm_nll_buckets(
    sf_dir: str, vocab_k: int = LM_VOCAB_K, ref_lang: str = "en"
) -> ray.data.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public
    algorithm): split the corpus into ``head`` / ``middle`` / ``tail``
    terciles by per-bigram LM score — the classic quality gate that
    keeps the most-fluent third of a crawl and routes the rest to
    cheaper treatment. ``(doc_id, avg_nll_micro, ppl_bucket)``.

    Metric: ``nll_total_micro // max(n_bigrams, 1)`` from
    :func:`lm_bigram_nll` — exact integer micro-nats per bigram, no
    float in the compare path. Cutpoints are the values at nearest
    ranks ``ceil(n/3)`` and ``ceil(2n/3)`` of the sorted metric;
    ties go to the better bucket on both sides (``<=`` on the cut
    value), so the result is deterministic regardless of row order.

    Scale shape: scoring is the audited :func:`lm_bigram_nll` pipeline
    (constant-bounded exchanges); the per-doc metric table is
    materialized once; the two global order statistics come from
    :func:`pdf_extractor_ray.ops.exact_kth_smallest` — a histogram-
    guided distributed quickselect whose driver collects are bounded
    by its bin count, NOT a full sort (which would be an all-to-all
    exchange just to read two rows) and NOT a value-counts table
    (micro-nat averages are effectively continuous, so
    ``grouped_quantile_counts`` would carry ~one row per doc). Bucket
    assignment is a zero-shuffle broadcast compare."""
    from pdf_extractor_ray.ops import exact_kth_smallest

    scored = lm_bigram_nll(sf_dir, vocab_k=vocab_k, ref_lang=ref_lang)

    def add_avg(b: pd.DataFrame) -> pd.DataFrame:
        nb = np.maximum(b["n_bigrams"].to_numpy().astype(np.int64), 1)
        avg = b["nll_total_micro"].to_numpy().astype(np.int64) // nb
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"), "avg_nll_micro": pd.Series(avg, dtype="int64")}
        )

    metric = scored.map_batches(add_avg, batch_format="pandas").materialize()
    n = metric.count()
    if n == 0:
        # explicit empty result with the full 3-column schema (an empty
        # materialized dataset may have no blocks, so a map_batches
        # column-add might never run)
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "avg_nll_micro": pd.Series([], dtype="int64"),
                    "ppl_bucket": pd.Series([], dtype="object"),
                }
            )
        )
    k1 = (n + 2) // 3  # ceil(n/3), integer form shared with the oracle
    k2 = (2 * n + 2) // 3
    c1, c2 = exact_kth_smallest(metric, "avg_nll_micro", [k1, k2])

    def assign(b: pd.DataFrame, c1=c1, c2=c2) -> pd.DataFrame:
        v = b["avg_nll_micro"].to_numpy()
        bucket = np.where(v <= c1, "head", np.where(v <= c2, "middle", "tail"))
        out = b.copy()
        out["ppl_bucket"] = bucket
        return out

    return metric.map_batches(assign, batch_format="pandas")


def lm_nll_buckets_sql(vocab_k: int = LM_VOCAB_K, ref_lang: str = "en") -> str:
    """Exact SQL replica of :func:`lm_nll_buckets`: same integer
    per-bigram metric, same nearest-rank tercile cutpoints (integer
    ceil via ``(n + 2) // 3``), same ``<=`` tie direction."""
    return rf"""
WITH base AS ({lm_bigram_nll_sql(vocab_k, ref_lang)}),
scored AS (
    SELECT doc_id,
           nll_total_micro // GREATEST(n_bigrams, 1) AS avg_nll_micro
    FROM base
), ranked AS (
    SELECT avg_nll_micro,
           row_number() OVER (ORDER BY avg_nll_micro) AS r,
           count(*) OVER () AS n
    FROM scored
), cuts AS (
    SELECT
        max(CASE WHEN r = (n + 2) // 3 THEN avg_nll_micro END) AS c1,
        max(CASE WHEN r = (2 * n + 2) // 3 THEN avg_nll_micro END) AS c2
    FROM ranked
)
SELECT s.doc_id, s.avg_nll_micro,
       CASE WHEN s.avg_nll_micro <= c.c1 THEN 'head'
            WHEN s.avg_nll_micro <= c.c2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM scored s, cuts c
"""


LM_NLL_BUCKETS_SQL = lm_nll_buckets_sql()


APPROX_QUANTILES = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)


def approx_token_quantiles(
    sf_dir: str, qs: "tuple[float, ...]" = APPROX_QUANTILES, k: int = 200
) -> pd.DataFrame:
    """ONE-PASS approximate quantiles of per-document whitespace token
    counts via the KLL sketch (``kernels/sketches.KLL``) — the length
    distribution a curation run reads before picking filter/packing
    thresholds. ``(q, approx_n_tokens)``, rank error O(n/k)
    (≤ 0.6% observed at k=200 over adversarial shapes, unit-tested
    with a guarantee bound).

    Scale shape: the HLL pattern — each batch folds into a bounded
    sketch row (O(k) floats, serialized level lists), the driver
    merges the per-block sketches (blocks × O(k), never corpus-sized),
    and the quantile grid is read once at the end. The EXACT
    alternative is ``ops.exact_kth_smallest`` (histogram quickselect:
    multiple full scans); this is the one-scan approximate complement.
    Rows-only (randomized compaction is bound-guaranteed, not
    bit-pinned — the HLL precedent)."""
    import json

    from pdf_extractor_ray.kernels.sketches import KLL

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        counts = b["text"].map(textstats.token_count_ws).to_numpy()
        # per-block seed derived from the block's content so compaction
        # randomness is independent across blocks (identical seeds would
        # correlate compaction errors in sign and defeat the merge's
        # error cancellation)
        seed = int(np.uint64(pd.util.hash_array(counts.astype(np.int64)).sum()))
        s = KLL(k=k, seed=seed)
        s.update_many(counts)
        return pd.DataFrame({"sketch": [json.dumps(s.to_lists())], "n": [int(s.n)]})

    merged = KLL(k=k, seed=11)
    parts = _docs(sf_dir, ["text"]).map_batches(fold, batch_format="pandas")
    for batch in parts.iter_batches(batch_format="pandas"):
        for lists, n in zip(batch["sketch"], batch["n"]):
            merged.merge(KLL.from_lists(json.loads(lists), n, k=k))
    if merged.n == 0:  # empty corpus: empty report, not a kernel raise
        return pd.DataFrame(
            {
                "q": pd.Series([], dtype="float64"),
                "approx_n_tokens": pd.Series([], dtype="int64"),
            }
        )
    ests = merged.quantiles(list(qs))
    return pd.DataFrame(
        {
            "q": pd.Series(qs, dtype="float64"),
            "approx_n_tokens": pd.Series([int(v) for v in ests], dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# C4-style banned-phrase filter
# ---------------------------------------------------------------------------
# Raffel et al. 2020 §2.2: C4 drops any document containing a phrase
# from a "bad words" blocklist. The production shape is a broadcast
# multi-pattern matcher (the list ships once, compiled per actor) and a
# zero-shuffle scan; the planted list below draws from the synthetic
# corpus vocabulary so the driver carrier exercises real matches. The
# pattern is a boundary-anchored literal alternation with no
# backreferences/lookarounds, compiled with re.ASCII so Python's \b
# matches RE2's ASCII-only \b even on non-ASCII text, and the oracle
# replays it verbatim (the PII contract). Phrases share no words, so
# non-overlapping match counts agree between engines regardless of
# alternation precedence. The guards below enforce the invariants the
# verbatim-replay contract relies on (ASCII, no SQL quote, literal).
import re as _re

BANNED_PHRASES = ("slow merge", "vector filter", "big order")
for _p in BANNED_PHRASES:
    assert _p.isascii() and "'" not in _p, f"phrase breaks oracle replay: {_p!r}"
BANNED_PAT = r"\b(?:" + "|".join(_re.escape(p) for p in BANNED_PHRASES) + r")\b"


def banned_phrase_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-doc banned-phrase verdicts: total match count and the C4
    drop decision. Zero shuffle; the alternation is compiled on the
    driver and ships via closure pickling (re.Pattern pickles as
    source+flags, recompiling once per worker on deserialization)."""
    import re

    pat = re.compile(BANNED_PAT, re.ASCII)
    ds = _docs(sf_dir, ["doc_id", "text"])

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.count(pat).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_banned": n,
                "banned": (n > 0).astype(np.int64),
            }
        )

    return ds.map_batches(scan, batch_format="pandas", batch_size=8192)


BANNED_SQL = rf"""
SELECT doc_id, n_banned, CAST(n_banned > 0 AS BIGINT) AS banned
FROM (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BANNED_PAT}')) AS BIGINT) AS n_banned
    FROM documents
)
"""


# ------------------------------------------------- boilerplate heads
BOILERPLATE_PREFIX_WORDS = 8
BOILERPLATE_MIN_DOCS = 3


def boilerplate_prefix_stats(
    sf_dir: str,
    k_words: int = BOILERPLATE_PREFIX_WORDS,
    min_docs: int = BOILERPLATE_MIN_DOCS,
) -> ray.data.Dataset:
    """Site-template discovery: documents sharing their first
    ``k_words`` tokens are flagged as carrying a boilerplate head
    (CCNet-style shared-prefix signal — cookie banners, nav headers,
    legal blurbs repeat verbatim at document start across a site).
    Output: ``(prefix, n_docs)`` for prefixes shared by ≥ ``min_docs``
    documents.

    Scale shape: one ``grouped_sum`` exchange whose keys are k-word
    strings (bounded payload) and whose per-batch partial bounds a
    viral prefix to one row per batch; the HAVING filter is applied in
    the bucket, so only qualifying prefixes leave the exchange."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = _docs(sf_dir, ["text"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        pref = [" ".join(t.split()[:k_words]) for t in b["text"]]
        out = pd.DataFrame({"prefix": pref, "one": np.ones(len(b), dtype=np.int64)})
        return out[out["prefix"] != ""]

    counted = grouped_sum(
        ds.map_batches(derive, batch_format="pandas", batch_size=4096), ["prefix"], ["one"]
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["one"] >= min_docs].rename(columns={"one": "n_docs"})
        return b

    return counted.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------
# Beyond the document-level banned-phrase drop above, C4 cleans INSIDE
# each page: lines with too few words are removed, lines carrying
# code/boilerplate markers ("javascript" warnings, curly braces) are
# removed, and a page containing "lorem ipsum" is dropped wholesale.
# The production shape is a zero-shuffle per-batch scan — every rule is
# per-line or per-page, so nothing ever leaves the worker but the
# cleaned rows. The terminal-punctuation rule is implemented behind a
# knob (default off: the synthetic corpus plants no sentence
# punctuation, so the rule would degenerate to drop-everything; it is
# unit-tested on planted fixtures instead).
C4_MIN_WORDS = 5
C4_LINE_BANNED = ("javascript", "{")
C4_PAGE_DROP_PHRASE = "lorem ipsum"
_C4_TERMINAL = (".", "!", "?", '"')


def c4_line_filter(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = C4_MIN_WORDS,
    require_terminal_punct: bool = False,
) -> ray.data.Dataset:
    """Per-document C4 line cleaning. Output one row per input row:
    ``(id, n_lines, n_kept, page_dropped, text_kept)`` where a line is
    kept iff it has ≥ ``min_words`` whitespace tokens, contains no
    banned substring (case-insensitive "javascript", literal "{"), and
    — when ``require_terminal_punct`` — ends in .!?" after rstrip;
    ``page_dropped`` pages (any line containing "lorem ipsum",
    case-insensitive) keep their line counts but emit ``text_kept=''``.

    Scale: zero shuffle; line splitting and the rule scan run inside
    ``map_batches`` and only the per-doc verdict rows leave the worker.
    """

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        n_lines = np.empty(len(b), dtype=np.int64)
        n_kept = np.empty(len(b), dtype=np.int64)
        dropped = np.empty(len(b), dtype=np.int64)
        text_kept = []
        for i, t in enumerate(b[text_col]):
            lines = t.splitlines()
            kept = []
            for ln in lines:
                low = ln.lower()
                if len(ln.split()) < min_words:
                    continue
                if any(s in (low if s.islower() else ln) for s in C4_LINE_BANNED):
                    continue
                if require_terminal_punct and not ln.rstrip().endswith(_C4_TERMINAL):
                    continue
                kept.append(ln)
            page_drop = C4_PAGE_DROP_PHRASE in t.lower()
            n_lines[i] = len(lines)
            n_kept[i] = len(kept)
            dropped[i] = int(page_drop)
            text_kept.append("" if page_drop else "\n".join(kept))
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "n_lines": n_lines,
                "n_kept": n_kept,
                "page_dropped": dropped,
                "text_kept": text_kept,
            }
        )

    return ds.map_batches(clean, batch_format="pandas", batch_size=2048)


def boilerplate_prefix_sql(
    k_words: int = BOILERPLATE_PREFIX_WORDS, min_docs: int = BOILERPLATE_MIN_DOCS
) -> str:
    return rf"""
WITH t AS (
    SELECT array_to_string(
               list_slice(regexp_split_to_array({_TW}, '{_WS}'), 1, {int(k_words)}), ' '
           ) AS prefix
    FROM documents WHERE {_TW} <> ''
)
SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM t GROUP BY prefix HAVING COUNT(*) >= {int(min_docs)}
"""


BOILERPLATE_PREFIX_SQL = boilerplate_prefix_sql()


# ---------------------------------------------------------------------------
# PMI collocation mining (word2vec-phrases-style corpus statistics)
# ---------------------------------------------------------------------------

PMI_TOP_K = 20
PMI_MIN_COUNT = 5  # Mikolov et al. 2013 §4 discard-rare-pairs floor
PMI_SCALE = 10**12  # integer count-ratio scale; see pmi_collocations


def pmi_collocations(
    sf_dir: str,
    top_k: int = PMI_TOP_K,
    min_count: int = PMI_MIN_COUNT,
    *,
    broadcast_limit: int | None = None,
) -> ray.data.Dataset:
    """Top-k bigram collocations ranked by PMI, exact-integer scored.

    Phrase discovery for a training-data pipeline (merge "new york"
    into one token before BPE / embedding): rank adjacent word pairs
    by pointwise mutual information ln(p12 / (p1*p2)). For a FIXED
    corpus, PMI = ln(c12 * N / (c1*c2)) is monotone in the integer
    ratio ``score = c12 * PMI_SCALE // (c1 * c2)`` (N is a constant
    shift) — so the ranking needs no transcendentals and the DuckDB
    oracle hash-matches bit-exactly, the same trick as tfidf's integer
    idf. Score arithmetic is pure-Python int over the DISTINCT-pair
    table only (numpy int64 would silently wrap at web-scale counts;
    the oracle runs the identical expression in HUGEINT).

    Plan: two vectorized passes over the corpus (unigram partials,
    bigram partials), each folded by one bucketed ``grouped_sum`` —
    the exchanges carry (word, count) partials, never raw tokens; the
    ``min_count`` floor prunes the pair table BEFORE the two adaptive
    joins attach c1/c2; global top-k is a sort+limit over the scored
    distinct-pair table.
    """
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_sum

    k, mc, scale = int(top_k), int(min_count), PMI_SCALE
    docs = _docs(sf_dir, ["doc_id", "text"])

    def uni_partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b["text"]:
            for w in t.split():
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame(
            {
                "word": list(counts),
                "c": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    def bg_partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[tuple[str, str], int] = {}
        for t in b["text"]:
            ws = t.split()
            for pair in zip(ws, ws[1:]):
                counts[pair] = counts.get(pair, 0) + 1
        w1 = [p[0] for p in counts]
        w2 = [p[1] for p in counts]
        return pd.DataFrame(
            {
                "w1": pd.Series(w1, dtype=object),
                "w2": pd.Series(w2, dtype=object),
                "c12": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    uni = grouped_sum(
        docs.map_batches(uni_partial, batch_format="pandas", batch_size=8192),
        ["word"],
        ["c"],
        num_buckets=8,
    )
    bg = grouped_sum(
        docs.map_batches(bg_partial, batch_format="pandas", batch_size=8192),
        ["w1", "w2"],
        ["c12"],
        num_buckets=8,
    )
    bg = bg.filter(expr=f"c12 >= {mc}")

    def _rename(names: list[str]):
        def fn(t):
            return t.rename_columns(names)

        return fn

    uni1 = uni.map_batches(_rename(["word", "c1"]), batch_format="pyarrow")
    uni2 = uni.map_batches(_rename(["word", "c2"]), batch_format="pyarrow")
    j = adaptive_inner_join(bg, uni1, on="w1", right_on="word", broadcast_limit=broadcast_limit)
    j = adaptive_inner_join(j, uni2, on="w2", right_on="word", broadcast_limit=broadcast_limit)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        # c12 <= min(c1, c2) ==> score <= PMI_SCALE: always fits int64.
        s = [
            int(c12) * scale // (int(c1) * int(c2))
            for c12, c1, c2 in zip(b["c12"], b["c1"], b["c2"])
        ]
        return pd.DataFrame(
            {
                "w1": b["w1"].to_numpy(),
                "w2": b["w2"].to_numpy(),
                "c12": b["c12"].to_numpy().astype(np.int64),
                "c1": b["c1"].to_numpy().astype(np.int64),
                "c2": b["c2"].to_numpy().astype(np.int64),
                "score": np.asarray(s, dtype=np.int64),
            }
        )

    scored = j.map_batches(score, batch_format="pandas", batch_size=8192)
    return scored.sort(["score", "w1", "w2"], descending=[True, False, False]).limit(k)


def pmi_collocations_sql(
    top_k: int = PMI_TOP_K, min_count: int = PMI_MIN_COUNT
) -> str:
    """Exact SQL replica of ``pmi_collocations``: same tokenization,
    same integer count-ratio score (HUGEINT product, floor division —
    operands are positive so ``//`` truncation == floor), same
    (score DESC, w1, w2) total order."""
    return rf"""
WITH tok AS (
    SELECT doc_id, regexp_split_to_array({_TW}, '{_WS}') AS ws
    FROM documents WHERE {_TW} <> ''
), aw AS (
    SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos FROM tok
), uni AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM aw GROUP BY w
), bg AS (
    SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
    FROM aw a JOIN aw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1, 2
)
SELECT bg.w1, bg.w2, bg.c12, u1.c AS c1, u2.c AS c2,
       CAST(CAST(bg.c12 AS HUGEINT) * {PMI_SCALE}
            // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS score
FROM bg
JOIN uni u1 ON bg.w1 = u1.w
JOIN uni u2 ON bg.w2 = u2.w
WHERE bg.c12 >= {int(min_count)}
ORDER BY score DESC, w1, w2
LIMIT {int(top_k)}
"""


PMI_SQL = pmi_collocations_sql()


# ---------------------------------------------------------------------------
# Unicode cleanup (CCNet/Dolma-style character normalization)
# ---------------------------------------------------------------------------

# Explicit fold map — NOT library NFC/NFKC (whose tables drift across
# Unicode versions between Python's unicodedata and DuckDB's utf8proc,
# which would make the oracle silently version-dependent): unicode
# spaces → ASCII space, curly quotes → ASCII quotes, dashes → hyphen,
# ellipsis → '...'; zero-widths / soft hyphen / C0 controls (except
# \t \n \r) stripped. This is the normalization pass every public web
# corpus build runs before tokenization (CCNet, C4, Dolma all carry a
# variant); the map is the contract, replayed verbatim in SQL.
UNICODE_FOLD: dict[str, str] = {
    " ": " ", " ": " ", " ": " ", " ": " ",
    " ": " ", "　": " ",
    "‘": "'", "’": "'", "“": '"', "”": '"',
    "–": "-", "—": "-",
    "…": "...",
}
UNICODE_STRIP = (
    "​‌‍﻿­"
    + "".join(chr(c) for c in range(0x00, 0x09))
    + "\x0b\x0c"
    + "".join(chr(c) for c in range(0x0e, 0x20))
    + "\x7f"
)
_FOLD_TABLE = {ord(k): v for k, v in UNICODE_FOLD.items()} | {
    ord(c): None for c in UNICODE_STRIP
}
_FOLD_RE = _re.compile("[" + "".join(_re.escape(c) for c in UNICODE_FOLD) + "]")
_STRIP_RE = _re.compile("[" + "".join(_re.escape(c) for c in UNICODE_STRIP) + "]")


def fold_unicode(text: str) -> tuple[str, int, int]:
    """(cleaned, n_folded, n_stripped) under the UNICODE_FOLD /
    UNICODE_STRIP contract — one translate pass."""
    n_folded = len(_FOLD_RE.findall(text))
    n_stripped = len(_STRIP_RE.findall(text))
    return text.translate(_FOLD_TABLE), n_folded, n_stripped


# Deterministic decoration variants for the driver carrier: the
# synthetic corpus is pure ASCII, so the carrier plants the junk the
# operator exists to remove — derived from doc_id arithmetic so the
# oracle rebuilds the identical decorated text (the messy-url-carrier
# pattern, webdocs.py).
_DECOR = [
    ("“Q” ", "…​"),
    ("‘a’ ", "\x07\x01"),
    ("–x—　", "﻿"),
    ("", " ­ "),
]


def clean_unicode_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: decorate each document with its doc_id-selected
    junk variant, then clean. Output ``(doc_id, n_folded, n_stripped,
    text_clean)`` — the cleaned STRING is hash-compared, so the whole
    fold map is oracle-pinned. Zero shuffle."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        out_t, nf, ns = [], np.empty(len(b), np.int64), np.empty(len(b), np.int64)
        for i, (d, t) in enumerate(zip(ids, b["text"])):
            pre, suf = _DECOR[int(d) % len(_DECOR)]
            c, f, s = fold_unicode(pre + t + suf)
            out_t.append(c)
            nf[i], ns[i] = f, s
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_folded": nf,
                "n_stripped": ns,
                "text_clean": pd.Series(out_t, dtype=object),
            }
        )

    return ds.map_batches(clean, batch_format="pandas", batch_size=8192)


def _clean_unicode_sql() -> str:
    """Oracle: rebuild the decoration from doc_id, count the fold/strip
    classes with RE2 ``\\x{..}`` escapes (ASCII-clean SQL text), apply
    the fold map as chained replace() and the strip class as one
    regexp_replace."""

    def sql_str(s: str) -> str:
        # build a DuckDB expression producing s via chr() so the SQL
        # stays ASCII
        if not s:
            return "''"
        parts = []
        for ch in s:
            parts.append(f"chr({ord(ch)})" if ord(ch) > 126 or ord(ch) < 32 else f"'{ch}'")
        return " || ".join(parts)

    decor_pre = "CASE doc_id % 4 " + " ".join(
        f"WHEN {j} THEN {sql_str(p)}" for j, (p, _) in enumerate(_DECOR)
    ) + " END"
    decor_suf = "CASE doc_id % 4 " + " ".join(
        f"WHEN {j} THEN {sql_str(s)}" for j, (_, s) in enumerate(_DECOR)
    ) + " END"

    fold_class = "[" + "".join(rf"\x{{{ord(c):04x}}}" for c in UNICODE_FOLD) + "]"
    strip_class = "[" + "".join(rf"\x{{{ord(c):04x}}}" for c in UNICODE_STRIP) + "]"

    folded = "t"
    for k, v in UNICODE_FOLD.items():
        vq = v.replace("'", "''")
        folded = f"replace({folded}, chr({ord(k)}), '{vq}')"

    return f"""
WITH d AS (
    SELECT doc_id, {decor_pre} || text || {decor_suf} AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{fold_class}')) AS BIGINT) AS n_folded,
       CAST(len(regexp_extract_all(t, '{strip_class}')) AS BIGINT) AS n_stripped,
       regexp_replace({folded}, '{strip_class}', '', 'g') AS text_clean
FROM d
"""


CLEAN_UNICODE_SQL = _clean_unicode_sql()


# ---------------------------------------------------------------------------
# Count-Min sketch token counts (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_token_counts(
    sf_dir: str,
    tokens: tuple[str, ...] = ("data", "spark", "window"),
    width: int = 1 << 14,
    depth: int = 4,
) -> pd.DataFrame:
    """Approximate token frequencies from ONE corpus pass with a fixed
    ``depth × width`` int64 Count-Min table per block — the
    heavy-hitter/HLL reduction shape: no (token, count) exchange at
    all; each block contributes one fixed-size sketch row and the
    driver sum-merges them (CMS merge = elementwise +). Estimates are
    one-sided (≥ true count; overshoot ≤ 2N/width per row w.p. ≥ 1/2,
    so ≤ that with prob 1 − 2^-depth) — the knob for "roughly how
    often does each of these million phrases occur" where
    ``heavy_hitter_tokens`` answers "which tokens are the biggest" and
    ``grouped_sum`` answers exactly at exchange cost. Completing the
    sketch family: MG, HLL, Bloom, KLL, CMS."""
    from pdf_extractor_ray.kernels.sketches import cms_fold, cms_query

    ds = _docs(sf_dir, ["text"])

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        h = pd.util.hash_array(toks.to_numpy(), hash_key="0123456789abcdef")
        return pd.DataFrame({"sk": [cms_fold(h, width, depth).tobytes()]})

    merged = np.zeros((depth, width), dtype=np.int64)
    for batch in ds.map_batches(fold, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for packed in batch["sk"]:
            merged += np.frombuffer(packed, dtype=np.int64).reshape(depth, width)

    qh = pd.util.hash_array(
        np.asarray(tokens, dtype=object), hash_key="0123456789abcdef"
    )
    return pd.DataFrame(
        {"token": list(tokens), "est_count": cms_query(merged, qh)}
    )


# ---------------------------------------------------------------------------
# Per-document token entropy (unigram self-information)
# ---------------------------------------------------------------------------


def token_entropy_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-doc unigram entropy in integer micro-nats: ``(doc_id,
    n_tokens, n_types, ent_total_micro)`` where ent_total_micro =
    Σ_types floor(c·ln(n/c)·1e6 + 0.5) — the TOTAL self-information
    (n × per-token entropy), kept unnormalized so the result is an
    exact integer sum; consumers divide by n_tokens. Low-entropy docs
    are the keyboard-mash / template / repeated-token pages every
    quality funnel drops (the same family as Gopher's repetition
    rules, but distribution-level).

    Zero shuffle — one vectorized pass. Float note: one libm ln per
    DISTINCT (c, n) pair with per-term rounding, the lm_bigram_nll
    1-ulp budget; the expression tree (c·ln(n/c))·1e6 is written
    identically in the SQL."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def ent(b: pd.DataFrame) -> pd.DataFrame:
        n_tok = np.zeros(len(b), np.int64)
        n_typ = np.zeros(len(b), np.int64)
        total = np.zeros(len(b), np.int64)
        for i, t in enumerate(b["text"]):
            ws = t.split()
            if not ws:
                continue
            _, counts = np.unique(ws, return_counts=True)
            c = counts.astype(np.float64)
            n = float(len(ws))
            terms = np.floor((c * np.log(n / c)) * 1_000_000 + 0.5).astype(np.int64)
            n_tok[i], n_typ[i], total[i] = len(ws), len(counts), int(terms.sum())
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens": n_tok,
                "n_types": n_typ,
                "ent_total_micro": total,
            }
        )

    return ds.map_batches(ent, batch_format="pandas", batch_size=8192)


TOKEN_ENTROPY_SQL = rf"""
WITH w AS (
    SELECT doc_id, unnest(regexp_split_to_array({_TW}, '{_WS}')) AS token
    FROM documents WHERE {_TW} <> ''
),
n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM w GROUP BY doc_id),
c AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY doc_id, token),
h AS (
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CAST(floor((c.c * ln(CAST(n.n_tokens AS DOUBLE) / c.c)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ent_total_micro
    FROM c JOIN n ON n.doc_id = c.doc_id GROUP BY c.doc_id
)
SELECT d.doc_id,
       COALESCE(n.n_tokens, 0) AS n_tokens,
       COALESCE(h.n_types, 0) AS n_types,
       COALESCE(h.ent_total_micro, 0) AS ent_total_micro
FROM documents d
LEFT JOIN n ON n.doc_id = d.doc_id
LEFT JOIN h ON h.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# Bigram novelty vs a reference slice (memorization / distribution shift)
# ---------------------------------------------------------------------------


def bigram_novelty_documents(
    sf_dir: str, vocab_k: int = LM_VOCAB_K, ref_lang: str = "en"
) -> ray.data.Dataset:
    """Per-document novelty against the ``ref_lang`` slice: the count
    of MAPPED bigrams (top-``vocab_k`` vocab, OOV sentinel '' — the
    shared LM-family alphabet) that never occur in the reference
    slice's bigram table. ``(doc_id, n_bigrams, n_novel)``. High
    novelty flags distribution shift / junk; zero novelty on in-slice
    docs flags near-memorized text. Pure set membership — no floats
    at all, so the oracle is exact by construction.

    Scale shape: the vocab + reference-bigram passes are the
    ``lm_bigram_nll`` shapes (exchanges bounded by the slice's
    distinct words and by (K+1)² mapped pairs); the scoring pass is a
    zero-shuffle scan against the broadcast pair set (``ray.put``
    once, per-worker cache)."""
    import ray as _ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.ops import grouped_sum

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    ref = ds.map_batches(
        lambda b: b.loc[b["lang"] == ref_lang, ["text"]], batch_format="pandas"
    )
    vocab = _lm_topk_vocab(ref, vocab_k)
    vref = _ray.put(vocab)

    def bigram_counts(b: pd.DataFrame) -> pd.DataFrame:
        vset = _cached_get(vref)
        counts: dict[tuple[str, str], int] = {}
        for t in b["text"]:
            ws = t.split()
            for a, c in zip(ws, ws[1:]):
                key = (a if a in vset else "", c if c in vset else "")
                counts[key] = counts.get(key, 0) + 1
        return pd.DataFrame(
            {
                "w1": [k[0] for k in counts],
                "w2": [k[1] for k in counts],
                "n": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    seen_tbl = grouped_sum(
        ref.map_batches(bigram_counts, batch_format="pandas", batch_size=8192),
        ["w1", "w2"],
        ["n"],
    ).to_pandas()  # ≤ (K+1)² rows by construction
    seen = (
        frozenset(zip(seen_tbl["w1"], seen_tbl["w2"])) if not seen_tbl.empty else frozenset()
    )
    mref = _ray.put((vocab, seen))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vset, seen_set = _cached_get(mref)
        nbg = np.zeros(len(b), np.int64)
        nov = np.zeros(len(b), np.int64)
        for i, t in enumerate(b["text"]):
            ws = t.split()
            nbg[i] = max(len(ws) - 1, 0)
            n = 0
            for a, c in zip(ws, ws[1:]):
                key = (a if a in vset else "", c if c in vset else "")
                if key not in seen_set:
                    n += 1
            nov[i] = n
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_bigrams": nbg,
                "n_novel": nov,
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=8192)


def bigram_novelty_sql(vocab_k: int = LM_VOCAB_K, ref_lang: str = "en") -> str:
    """Exact SQL replica — the lm_bigram_nll CTE skeleton with the
    scoring join reduced to an anti-membership count."""
    return rf"""
WITH tok AS (
    SELECT doc_id, lang, regexp_split_to_array({_TW}, '{_WS}') AS ws
    FROM documents WHERE {_TW} <> ''
), rw AS (
    SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos
    FROM tok WHERE lang = '{ref_lang}'
), vocab AS (
    SELECT w FROM (SELECT w, COUNT(*) AS n FROM rw GROUP BY w)
    ORDER BY n DESC, w LIMIT {int(vocab_k)}
), seen AS (
    SELECT DISTINCT
           CASE WHEN a.w IN (SELECT w FROM vocab) THEN a.w ELSE '' END AS w1,
           CASE WHEN b.w IN (SELECT w FROM vocab) THEN b.w ELSE '' END AS w2
    FROM rw a JOIN rw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), aw AS (
    SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos FROM tok
), abg AS (
    SELECT a.doc_id,
           CASE WHEN a.w IN (SELECT w FROM vocab) THEN a.w ELSE '' END AS w1,
           CASE WHEN b.w IN (SELECT w FROM vocab) THEN b.w ELSE '' END AS w2
    FROM aw a JOIN aw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), agg AS (
    SELECT abg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN seen.w1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
    FROM abg
    LEFT JOIN seen ON abg.w1 = seen.w1 AND abg.w2 = seen.w2
    GROUP BY abg.doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_bigrams, 0) AS n_bigrams,
       COALESCE(agg.n_novel, 0) AS n_novel
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


BIGRAM_NOVELTY_SQL = bigram_novelty_sql()


# ---------------------------------------------------------------------------
# Per-group HLL: approximate distinct tokens per language
# ---------------------------------------------------------------------------


def approx_distinct_tokens_per_lang(sf_dir: str, p: int = 12) -> ray.data.Dataset:
    """Approximate per-language token-vocabulary sizes: ``(lang,
    approx_distinct)`` — the GROUP-KEYED mergeable-sketch shape that
    per-domain/per-source cardinality monitoring needs at 100 TB,
    where ``ops.distinct`` would shuffle the full (lang, token) set:
    each block emits one fixed 2^p-byte HLL register row PER LANG
    PRESENT (blocks × langs rows total, each 4 KiB at p=12); one
    bucketed exchange on lang max-merges the registers and estimates.
    Contrast with ``approx_distinct_counts`` (global sketch, driver
    merge) — here the merge itself is distributed and group-keyed."""
    from pdf_extractor_ray.kernels import sketches
    from pdf_extractor_ray.ops import grouped_apply

    ds = _docs(sf_dir, ["text", "lang"])

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        langs, regs = [], []
        for lang, grp in b.groupby("lang", sort=False):
            toks = grp["text"].str.split(" ").explode()
            toks = toks[toks.notna() & (toks != "")]
            if toks.empty:
                continue
            h = pd.util.hash_array(toks.to_numpy(), hash_key="0123456789abcdef")
            langs.append(lang)
            regs.append(sketches.hll_registers(h, p=p).tobytes())
        return pd.DataFrame({"lang": langs, "reg": regs})

    rows = ds.map_batches(fold, batch_format="pandas", batch_size=8192)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_l, out_n = [], []
        for lang, grp in g.groupby("lang", sort=True):
            merged = np.zeros(1 << p, dtype=np.uint8)
            for packed in grp["reg"]:
                merged = sketches.hll_merge(merged, np.frombuffer(packed, dtype=np.uint8))
            out_l.append(lang)
            out_n.append(round(sketches.hll_estimate(merged)))
        return pd.DataFrame(
            {"lang": out_l, "approx_distinct": np.asarray(out_n, dtype=np.int64)}
        )

    return grouped_apply(rows, ["lang"], per_bucket)


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (zlib)
# ---------------------------------------------------------------------------


def compression_ratio_documents(sf_dir: str, level: int = 6) -> ray.data.Dataset:
    """Per-doc zlib compression ratio in ppm: ``(doc_id, n_bytes,
    ratio_ppm)`` with ratio = compressed/raw — the cheap whole-document
    repetitiveness signal (template pages and keyboard mash compress
    far below prose; used alongside the Gopher rules in public corpus
    builds). Zero shuffle. Rows-only: the value is pinned to THIS
    environment's zlib (deflate output is library-version-dependent) —
    the tests pin ordering properties (repetitive < prose < random),
    not bytes; not SQL-replayable by design."""
    import zlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def ratio(b: pd.DataFrame) -> pd.DataFrame:
        n = np.zeros(len(b), np.int64)
        r = np.zeros(len(b), np.int64)
        for i, t in enumerate(b["text"]):
            raw = t.encode("utf-8")
            n[i] = len(raw)
            if raw:
                r[i] = (len(zlib.compress(raw, level)) * 1_000_000) // len(raw)
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64), "n_bytes": n, "ratio_ppm": r}
        )

    return ds.map_batches(ratio, batch_format="pandas", batch_size=8192)


# ---------------------------------------------------------------------------
# Per-group KLL: token-count quantiles per language
# ---------------------------------------------------------------------------


def token_quantiles_per_lang(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.9)
) -> ray.data.Dataset:
    """Approximate per-language document-length (token-count)
    quantiles: ``(lang, q_ppm, value)`` — the grouped KLL sibling of
    ``approx_distinct_tokens_per_lang``: each block emits ONE
    serialized KLL sketch row per lang present; one bucketed exchange
    on lang merges sketches and reads the quantiles (where an exact
    per-group quantile would sort every group's raw lengths)."""
    import json

    from pdf_extractor_ray.kernels.sketches import KLL
    from pdf_extractor_ray.ops import grouped_apply

    ds = _docs(sf_dir, ["text", "lang"])

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        langs, blobs = [], []
        for lang, grp in b.groupby("lang", sort=False):
            lens = grp["text"].str.split(" ").map(
                lambda ws: sum(1 for w in ws if w)
            )
            sk = KLL()
            sk.update_many(lens.to_numpy(np.int64).astype(float))
            langs.append(lang)
            blobs.append(json.dumps([sk.to_lists(), sk.total_weight()]))
        return pd.DataFrame({"lang": langs, "sk": blobs})

    rows = ds.map_batches(fold, batch_format="pandas", batch_size=8192)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, grp in g.groupby("lang", sort=True):
            merged = None
            for blob in grp["sk"]:
                levels, n = json.loads(blob)
                sk = KLL.from_lists(levels, n)
                merged = sk if merged is None else merged.merge(sk)
            for q in qs:
                out.append(
                    {
                        "lang": lang,
                        "q_ppm": int(round(q * 1_000_000)),
                        "value": int(merged.quantile(q)),
                    }
                )
        df = pd.DataFrame(out, columns=["lang", "q_ppm", "value"])
        df["q_ppm"] = df["q_ppm"].astype(np.int64)
        df["value"] = df["value"].astype(np.int64)
        return df

    return grouped_apply(rows, ["lang"], per_bucket)


# ---------------------------------------------------------------------------
# CCNet curation matrix: language × perplexity-tercile routing table
# ---------------------------------------------------------------------------


def ccnet_matrix_documents(
    sf_dir: str, vocab_k: int = LM_VOCAB_K, ref_lang: str = "en"
) -> ray.data.Dataset:
    """The CCNet routing table (Wenzek et al. 2020 publish exactly
    this breakdown): document and token counts per (predicted language
    × LM-perplexity tercile) — the table a curation run reads to
    decide which (lang, head/middle/tail) cells feed training and at
    what mixture weight. Composes three audited operators:
    :func:`lang_id_documents` (zero-shuffle stopword vote),
    :func:`lm_nll_buckets` (integer micro-nat scoring + distributed
    exact tercile cuts), and the token counts of
    :func:`doc_token_stats`. Output ``(lang_pred, ppl_bucket, n_docs,
    tokens_total)``.

    Scale shape: two adaptive joins on 8-byte doc ids over
    narrow projections (never text), then one ``grouped_agg`` exchange
    whose key space is at most |langs| × 3 cells."""
    from pdf_extractor_ray import joins
    from pdf_extractor_ray.ops import grouped_agg

    buckets = lm_nll_buckets(sf_dir, vocab_k=vocab_k, ref_lang=ref_lang).select_columns(
        ["doc_id", "ppl_bucket"]
    )
    langs = lang_id_documents(sf_dir).select_columns(["doc_id", "lang_pred"])
    toks = doc_token_stats(sf_dir).select_columns(["doc_id", "n_tokens_ws"])
    j = joins.adaptive_inner_join(buckets, langs, on="doc_id")
    j = joins.adaptive_inner_join(j, toks, on="doc_id")
    out = grouped_agg(
        j,
        ["lang_pred", "ppl_bucket"],
        {"n_docs": ("n_tokens_ws", "count"), "tokens_total": ("n_tokens_ws", "sum")},
    )

    def exact_types(b: pd.DataFrame) -> pd.DataFrame:
        b["n_docs"] = b["n_docs"].astype(np.int64)
        b["tokens_total"] = b["tokens_total"].astype(np.int64)
        return b

    return out.map_batches(exact_types, batch_format="pandas")


def ccnet_matrix_sql(vocab_k: int = LM_VOCAB_K, ref_lang: str = "en") -> str:
    return rf"""
WITH b AS ({lm_nll_buckets_sql(vocab_k, ref_lang)}),
l AS ({LANG_PRED_CORE_SQL}),
t AS ({DOC_TOKEN_STATS_SQL})
SELECT l.lang_pred, b.ppl_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t.n_tokens_ws) AS BIGINT) AS tokens_total
FROM b JOIN l ON l.doc_id = b.doc_id JOIN t ON t.doc_id = b.doc_id
GROUP BY 1, 2
"""


CCNET_MATRIX_SQL = ccnet_matrix_sql()


# ---------------------------------------------------------------------------
# PII incidence report per source (corpus-hygiene dashboard)
# ---------------------------------------------------------------------------


def pii_stats_by_source(sf_dir: str) -> ray.data.Dataset:
    """Per-source PII incidence: ``(source, n_docs, docs_with_pii,
    emails_total, phones_total)`` — the hygiene dashboard a corpus
    owner reads to decide which feeds need redaction or exclusion.
    Same match semantics as :func:`redact_pii` (phones counted AFTER
    email redaction, so an email's digits can't double-count as a
    phone). Zero-join: per-batch partials groupby source, one
    ``grouped_sum`` exchange carrying four integers per source."""
    import re

    from pdf_extractor_ray.ops import grouped_sum

    email_re = re.compile(PII_EMAIL_PAT)
    phone_re = re.compile(PII_PHONE_PAT)
    ds = _docs(sf_dir, ["text", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        ne = np.empty(n, dtype=np.int64)
        np_ = np.empty(n, dtype=np.int64)
        for i, t in enumerate(b["text"]):
            t1, ne[i] = email_re.subn("[EMAIL]", t)
            np_[i] = len(phone_re.findall(t1))
        g = pd.DataFrame(
            {
                "source": b["source"].to_numpy(),
                "n_docs": np.ones(n, dtype=np.int64),
                "docs_with_pii": ((ne + np_) > 0).astype(np.int64),
                "emails_total": ne,
                "phones_total": np_,
            }
        )
        return g.groupby("source", as_index=False, sort=False).sum()

    return grouped_sum(
        ds.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["source"],
        ["n_docs", "docs_with_pii", "emails_total", "phones_total"],
    )


PII_STATS_BY_SOURCE_SQL = rf"""
WITH e AS (
    SELECT source,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_PAT}')) AS BIGINT) AS n_emails,
           regexp_replace(text, '{PII_EMAIL_PAT}', '[EMAIL]', 'g') AS t1
    FROM documents
), p AS (
    SELECT source, n_emails,
           CAST(len(regexp_extract_all(t1, '{PII_PHONE_PAT}')) AS BIGINT) AS n_phones
    FROM e
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(SUM(n_emails) AS BIGINT) AS emails_total,
       CAST(SUM(n_phones) AS BIGINT) AS phones_total
FROM p GROUP BY source
"""


# ---------------------------------------------------------------------------
# Robust length-outlier detection (median + MAD, exact integers)
# ---------------------------------------------------------------------------

MAD_K = 3


def length_outliers_documents(sf_dir: str, k_mad: int = MAD_K) -> ray.data.Dataset:
    """Robust per-document length-outlier flags: ``(doc_id,
    n_tokens_ws, dev, mad_ratio_milli, is_outlier)`` with outlier =
    |n − median| > k·MAD — the median/median-absolute-deviation rule
    that, unlike mean±k·σ, isn't dragged by the very outliers it
    hunts (the standard truncation-artifact and concatenation-blob
    detector in crawl curation). Both order statistics are LOWER
    nearest-rank (rank ``(n+1)//2``), integer-exact. ``dev`` pins the
    median and ``mad_ratio_milli = 1000·dev // max(MAD, 1)`` pins the
    MAD in the oracle hash even on corpora where no document trips
    the k·MAD flag (this synthetic one has no heavy length tail).

    Scale shape: token counts come from one zero-shuffle pass; median
    and MAD each come from :func:`pdf_extractor_ray.ops.
    exact_kth_smallest` — the histogram-guided distributed quickselect
    (driver collects bounded by its bin count, no global sort); the
    flag pass is a zero-shuffle broadcast compare. Three column-pruned
    passes total over a 2-integer projection."""
    from pdf_extractor_ray.ops import exact_kth_smallest

    toks = doc_token_stats(sf_dir).select_columns(["doc_id", "n_tokens_ws"]).materialize()
    n = toks.count()
    if n == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_tokens_ws": pd.Series([], dtype="int64"),
                    "is_outlier": pd.Series([], dtype="int8"),
                }
            )
        )
    km = (n + 1) // 2
    med = exact_kth_smallest(toks, "n_tokens_ws", [km])[0]

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        v = b["n_tokens_ws"].to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64), "n_tokens_ws": v, "dev": np.abs(v - med)}
        )

    devs = toks.map_batches(dev, batch_format="pandas").materialize()
    mad = exact_kth_smallest(devs, "dev", [km])[0]

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        d = b["dev"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens_ws": b["n_tokens_ws"].to_numpy(np.int64),
                "dev": d,
                "mad_ratio_milli": (1000 * d) // max(mad, 1),
                "is_outlier": (d > k_mad * mad).astype(np.int8),
            }
        )

    return devs.map_batches(flag, batch_format="pandas")


def length_outliers_sql(k_mad: int = MAD_K) -> str:
    return rf"""
WITH t AS (
    SELECT doc_id,
           CAST(CASE WHEN {_TW} = '' THEN 0
                ELSE array_length(regexp_split_to_array({_TW}, '{_WS}')) END AS BIGINT) AS n_tokens_ws
    FROM documents
), r1 AS (
    SELECT n_tokens_ws AS v, row_number() OVER (ORDER BY n_tokens_ws) AS r,
           count(*) OVER () AS n
    FROM t
), med AS (SELECT max(CASE WHEN r = (n + 1) // 2 THEN v END) AS med FROM r1),
d AS (SELECT t.doc_id, t.n_tokens_ws, abs(t.n_tokens_ws - med.med) AS dev FROM t, med),
r2 AS (
    SELECT dev AS v, row_number() OVER (ORDER BY dev) AS r, count(*) OVER () AS n
    FROM d
), mad AS (SELECT max(CASE WHEN r = (n + 1) // 2 THEN v END) AS mad FROM r2)
SELECT d.doc_id, d.n_tokens_ws,
       CAST(d.dev AS BIGINT) AS dev,
       CAST((1000 * d.dev) // GREATEST(mad.mad, 1) AS BIGINT) AS mad_ratio_milli,
       CAST(d.dev > {int(k_mad)} * mad.mad AS TINYINT) AS is_outlier
FROM d, mad
"""


LENGTH_OUTLIERS_SQL = length_outliers_sql()


# ---------------------------------------------------------------------------
# Per-source top-k vocabulary (domain-signature terms)
# ---------------------------------------------------------------------------

SOURCE_TOP_K = 5


def top_tokens_by_source(sf_dir: str, k: int = SOURCE_TOP_K) -> ray.data.Dataset:
    """The ``k`` most frequent whitespace tokens per source feed:
    ``(source, word, n, rank)`` with ties broken word ASC — the
    per-feed vocabulary signature used to spot feed drift, template
    contamination, and language mix-ups per provider (the grouped form
    of the corpus-global ``top_tokens``).

    Scale shape: per-batch partials collapse each batch to its local
    (source, word) counts before ONE bucketed ``grouped_sum`` keyed on
    the pair (hot words are pre-combined per batch, so a viral token
    contributes one row per batch, not one per occurrence); the
    per-source top-k folds in a second exchange keyed source whose
    input is the already count-collapsed pair table."""
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = _docs(sf_dir, ["text", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        srcs, words = [], []
        for s, t in zip(b["source"], b["text"]):
            w = t.split()
            words.extend(w)
            srcs.extend([s] * len(w))
        g = pd.DataFrame({"source": srcs, "word": words})
        g["n"] = 1
        return g.groupby(["source", "word"], as_index=False, sort=False).sum()

    counts = grouped_sum(
        ds.map_batches(partial, batch_format="pandas", batch_size=4096),
        ["source", "word"],
        ["n"],
    )

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "n", "word"], ascending=[True, False, True], kind="mergesort")
        top = g.groupby("source", sort=False).head(k).copy()
        top["rank"] = top.groupby("source").cumcount().astype(np.int64) + 1
        top["n"] = top["n"].astype(np.int64)
        return top[["source", "word", "n", "rank"]]

    return grouped_apply(counts, ["source"], per_source)


def top_tokens_by_source_sql(k: int = SOURCE_TOP_K) -> str:
    return rf"""
WITH w AS (
    SELECT source, unnest(regexp_split_to_array({_TW}, '{_WS}')) AS word
    FROM documents WHERE {_TW} <> ''
), c AS (
    SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
    FROM w GROUP BY source, word
), r AS (
    SELECT source, word, n,
           row_number() OVER (PARTITION BY source ORDER BY n DESC, word ASC) AS rank
    FROM c
)
SELECT source, word, n, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {int(k)}
"""


TOP_TOKENS_BY_SOURCE_SQL = top_tokens_by_source_sql()


# ---------------------------------------------------------------------------
# Source-vocabulary Jaccard matrix (feed similarity audit)
# ---------------------------------------------------------------------------


def source_vocab_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Pairwise vocabulary Jaccard between source feeds:
    ``(source_a, source_b, inter, union_size, jaccard_milli)`` for
    source_a < source_b — the feed-similarity audit that catches
    mirrored providers and mislabeled feeds before mixture weighting
    (two feeds sharing 95% of their vocabulary are one feed).
    ``jaccard_milli = 1000·|A∩B| // |A∪B|`` in exact integers.

    Scale shape: ONE distinct exchange builds the (source, word)
    vocabulary; intersections come from a word-keyed ``grouped_apply``
    that emits each word's source-pair combinations — C(s,2) rows per
    word bounded by |sources|², NEVER the all-rows self-join on word
    (whose hot-word skew is quadratic in document frequency); one tiny
    pair-keyed ``grouped_sum`` folds them, and the |sources|-sized
    size table broadcasts onto the pair rows."""
    import itertools

    from pdf_extractor_ray import joins
    from pdf_extractor_ray.ops import distinct, grouped_apply, grouped_sum

    ds = _docs(sf_dir, ["text", "source"])

    def pairs_batch(b: pd.DataFrame) -> pd.DataFrame:
        srcs, words = [], []
        for s, t in zip(b["source"], b["text"]):
            w = set(t.split())  # per-doc dedupe shrinks the exchange
            words.extend(w)
            srcs.extend([s] * len(w))
        return pd.DataFrame({"source": srcs, "word": words})

    vocab = distinct(
        ds.map_batches(pairs_batch, batch_format="pandas", batch_size=4096),
        ["source", "word"],
    ).materialize()

    sizes = grouped_sum(
        vocab.map_batches(
            lambda b: pd.DataFrame({"source": b["source"], "n": np.ones(len(b), np.int64)}),
            batch_format="pandas",
        ),
        ["source"],
        ["n"],
    ).to_pandas()  # |sources| rows — bounded broadcast
    size_of = dict(zip(sizes["source"], sizes["n"].astype(int)))

    def word_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _w, grp in g.groupby("word", sort=False):
            ss = sorted(grp["source"].unique())
            for a, b2 in itertools.combinations(ss, 2):
                out_a.append(a)
                out_b.append(b2)
        return pd.DataFrame(
            {"source_a": out_a, "source_b": out_b, "inter": np.ones(len(out_a), np.int64)}
        )

    inter = grouped_sum(
        grouped_apply(vocab, ["word"], word_pairs), ["source_a", "source_b"], ["inter"]
    )

    sref = ray.put(size_of)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        so = joins._cached_get(sref)
        na = b["source_a"].map(so).to_numpy(np.int64)
        nb = b["source_b"].map(so).to_numpy(np.int64)
        i = b["inter"].to_numpy(np.int64)
        u = na + nb - i
        return pd.DataFrame(
            {
                "source_a": b["source_a"],
                "source_b": b["source_b"],
                "inter": i,
                "union_size": u,
                "jaccard_milli": (1000 * i) // u,
            }
        )

    return inter.map_batches(finish, batch_format="pandas")


SOURCE_VOCAB_JACCARD_SQL = rf"""
WITH v AS (
    SELECT DISTINCT source, unnest(regexp_split_to_array({_TW}, '{_WS}')) AS word
    FROM documents WHERE {_TW} <> ''
), sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source),
i AS (
    SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS inter
    FROM v a JOIN v b ON a.word = b.word AND a.source < b.source
    GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.inter,
       CAST(na.n + nb.n - i.inter AS BIGINT) AS union_size,
       CAST((1000 * i.inter) // (na.n + nb.n - i.inter) AS BIGINT) AS jaccard_milli
FROM i JOIN sz na ON na.source = i.source_a JOIN sz nb ON nb.source = i.source_b
"""


# ---------------------------------------------------------------------------
# Exact distinct-bigram vocabulary per language
# ---------------------------------------------------------------------------


def bigram_vocab_by_lang(sf_dir: str) -> ray.data.Dataset:
    """EXACT distinct word-bigram counts per language: ``(lang,
    n_distinct_bigrams)`` — the LM-vocabulary sizing number (how many
    distinct transitions a per-language bigram table must hold) and
    the exact twin of the HLL-approximate
    :func:`approx_distinct_tokens_per_lang` (use this when the count
    feeds an allocation, the sketch when it feeds a dashboard).

    Scale shape: per-doc bigram sets dedupe inside the batch before
    ONE distinct exchange keyed (lang, w1, w2) — a repeated
    boilerplate bigram crosses the wire once per batch, not once per
    occurrence; the per-lang count is a second |langs|-sized fold."""
    from pdf_extractor_ray.ops import distinct, grouped_sum

    ds = _docs(sf_dir, ["text", "lang"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        langs, w1s, w2s = [], [], []
        seen = set()
        for lang, t in zip(b["lang"], b["text"]):
            w = t.split()
            for a, c in zip(w, w[1:]):
                k = (lang, a, c)
                if k not in seen:
                    seen.add(k)
                    langs.append(lang)
                    w1s.append(a)
                    w2s.append(c)
        return pd.DataFrame({"lang": langs, "w1": w1s, "w2": w2s})

    vocab = distinct(
        ds.map_batches(pairs, batch_format="pandas", batch_size=4096), ["lang", "w1", "w2"]
    )
    return grouped_sum(
        vocab.map_batches(
            lambda b: pd.DataFrame(
                {"lang": b["lang"], "n_distinct_bigrams": np.ones(len(b), np.int64)}
            ),
            batch_format="pandas",
        ),
        ["lang"],
        ["n_distinct_bigrams"],
    )


BIGRAM_VOCAB_BY_LANG_SQL = rf"""
WITH tok AS (
    SELECT lang, regexp_split_to_array({_TW}, '{_WS}') AS ws
    FROM documents WHERE {_TW} <> ''
), bg AS (
    SELECT DISTINCT lang,
           unnest(ws[1:len(ws)-1]) AS w1,
           unnest(ws[2:len(ws)]) AS w2
    FROM tok WHERE len(ws) >= 2
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
FROM bg GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Curation verdict: one keep/drop decision per document, with reason
# ---------------------------------------------------------------------------


def curation_verdict_documents(
    sf_dir: str, vocab_k: int = LM_VOCAB_K, ref_lang: str = "en"
) -> ray.data.Dataset:
    """THE end-user curation table: one ``(doc_id, keep,
    reject_reason)`` row per document, folding the three audited gates
    in fixed priority order — ``banned`` (C4 bad-words) beats
    ``gopher`` (format rules) beats ``ppl_tail`` (worst LM tercile);
    survivors get ``keep = 1, reason = ''``. This is the decision
    record a production run writes next to the corpus so every
    dropped document is explainable (the reject-reason ledger).

    Scale shape: three zero-/constant-shuffle scoring passes (each
    audited separately) joined on 8-byte doc ids by the adaptive
    planner; the verdict fold is a vectorized compare. No new
    exchange shapes — this operator is pure composition, which is the
    point: the gates stay independently testable."""
    from pdf_extractor_ray import joins

    banned = banned_phrase_documents(sf_dir).select_columns(["doc_id", "banned"])
    gopher = gopher_quality_rules(sf_dir).select_columns(["doc_id", "keep"]).map_batches(
        lambda b: b.rename(columns={"keep": "gopher_keep"}), batch_format="pandas"
    )
    buckets = lm_nll_buckets(sf_dir, vocab_k=vocab_k, ref_lang=ref_lang).select_columns(
        ["doc_id", "ppl_bucket"]
    )
    j = joins.adaptive_inner_join(banned, gopher, on="doc_id")
    j = joins.adaptive_inner_join(j, buckets, on="doc_id")

    def verdict(b: pd.DataFrame) -> pd.DataFrame:
        is_banned = b["banned"].to_numpy() > 0
        bad_gopher = b["gopher_keep"].to_numpy() == 0
        tail = (b["ppl_bucket"] == "tail").to_numpy()
        reason = np.where(
            is_banned, "banned", np.where(bad_gopher, "gopher", np.where(tail, "ppl_tail", ""))
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "keep": (reason == "").astype(np.int8),
                "reject_reason": pd.Series(reason, dtype="object"),
            }
        )

    return j.map_batches(verdict, batch_format="pandas")


def curation_verdict_sql(vocab_k: int = LM_VOCAB_K, ref_lang: str = "en") -> str:
    return rf"""
WITH b AS ({BANNED_SQL}),
g AS ({GOPHER_RULES_SQL}),
p AS ({lm_nll_buckets_sql(vocab_k, ref_lang)}),
v AS (
    SELECT b.doc_id,
           CASE WHEN b.banned > 0 THEN 'banned'
                WHEN g.keep = 0 THEN 'gopher'
                WHEN p.ppl_bucket = 'tail' THEN 'ppl_tail'
                ELSE '' END AS reject_reason
    FROM b JOIN g ON g.doc_id = b.doc_id JOIN p ON p.doc_id = b.doc_id
)
SELECT doc_id, CAST(reject_reason = '' AS TINYINT) AS keep, reject_reason FROM v
"""


CURATION_VERDICT_SQL = curation_verdict_sql()


# ---------------------------------------------------------------------------
# Sentence segmentation (rule-based splitter through a derive carrier)
# ---------------------------------------------------------------------------

SENT_EVERY = 5  # carrier plants a terminator after every 5th token


def derive_sentence_text(b: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic punctuated text per doc: a period after every
    ``SENT_EVERY``-th token (the corpus is unpunctuated by
    construction), so the oracle knows every sentence boundary by
    token arithmetic while the engine must run the real splitter."""
    import pandas as pd

    texts = []
    for text in b["text"]:
        toks = text.split()
        texts.append(
            ". ".join(
                " ".join(toks[i : i + SENT_EVERY]) for i in range(0, len(toks), SENT_EVERY)
            )
            + ("." if toks else "")
        )
    out = b.copy()
    out["text"] = texts
    return out


def split_sentences_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: documents → punctuated text →
    :func:`kernels.textstats.split_sentences` → ``(doc_id, sent_idx,
    sentence, n_tokens)`` — the sentence-level explode that feeds
    sentence dedup and boundary-aware chunking. Zero shuffle,
    per-batch vectorized explode."""
    import os

    import pandas as pd
    import ray.data

    from pdf_extractor_ray.kernels.textstats import split_sentences

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(derive_sentence_text, batch_format="pandas", batch_size=1024)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, sents, ntoks = [], [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            for i, s in enumerate(split_sentences(text)):
                ids.append(int(doc_id))
                idxs.append(i)
                sents.append(s)
                ntoks.append(len(s.split()))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "sent_idx": pd.Series(idxs, dtype="int64"),
                "sentence": pd.Series(sents, dtype="object"),
                "n_tokens": pd.Series(ntoks, dtype="int64"),
            }
        )

    return ds.map_batches(explode, batch_format="pandas", batch_size=1024)


def _split_sentences_sql() -> str:
    from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

    tw = trim_ws_sql("text")
    k = SENT_EVERY
    return rf"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN {tw} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}') END AS arr
    FROM documents
)
SELECT doc_id, CAST(u.k AS BIGINT) AS sent_idx,
       array_to_string(arr[{k}*u.k+1 : LEAST({k}*u.k+{k}, len(arr))], ' ') AS sentence,
       CAST(LEAST({k}*u.k+{k}, len(arr)) - {k}*u.k AS BIGINT) AS n_tokens
FROM t, unnest(generate_series(0, CAST(ceil(len(arr)/{k}.0) AS INT) - 1)) AS u(k)
WHERE len(arr) > 0
"""


SPLIT_SENTENCES_SQL = _split_sentences_sql()


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth
# ---------------------------------------------------------------------------

VOCAB_CHECKPOINTS = 32


def vocab_growth_documents(
    sf_dir: str, num_checkpoints: int = VOCAB_CHECKPOINTS
) -> ray.data.Dataset:
    """Heaps-law vocabulary growth curve: distinct token-TRIGRAM types
    accumulated as the corpus is read in ``doc_id`` order, sampled at
    ``num_checkpoints`` equal-width doc-id checkpoints —
    ``(docs_prefix, new_types, cum_types)``. The curve is the standard
    corpus-health probe (sub-linear growth ≈ natural text; near-linear
    growth flags boilerplate ids, hashes, or OCR noise inflating the
    vocabulary). Trigram types, not unigrams: phrase-level vocabulary
    keeps growing long after the word list saturates, which is the
    regime the curve diagnoses (and the synthetic corpus's 31-word
    unigram pool saturates in the first batch — a flat line proves
    nothing).

    Scale shape — the key trick is that "distinct types seen so far"
    needs NO sequential scan: a type is new at exactly one place, the
    checkpoint containing its FIRST occurrence. So: per-batch partial
    min(doc_id) per trigram (a viral type collapses to one row per
    batch) → ONE bucketed ``grouped_agg`` min keyed by type → bucket
    first_doc into checkpoints (checkpoint-sized histogram via
    ``grouped_sum``) → ``prefix_sum`` over the ≤ ``num_checkpoints``
    rows for the cumulative curve. The exchange carries (type string,
    int64), never document bodies; nothing corpus-sized lands
    anywhere."""
    from pdf_extractor_ray.ops import grouped_agg, grouped_sum, prefix_sum

    narrow = _docs(sf_dir, ["doc_id", "text"])

    from ray.data.aggregate import Max, Min

    agg = narrow.select_columns(["doc_id"]).aggregate(Min("doc_id"), Max("doc_id"))
    mn, mx = agg["min(doc_id)"], agg["max(doc_id)"]
    if mn is None:
        import pandas as _pd

        return ray.data.from_pandas(
            _pd.DataFrame(
                {
                    "docs_prefix": _pd.Series([], dtype="int64"),
                    "new_types": _pd.Series([], dtype="int64"),
                    "cum_types": _pd.Series([], dtype="int64"),
                }
            )
        )
    mn, mx = int(mn), int(mx)
    span = mx - mn + 1
    width = -(-span // num_checkpoints)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        first: dict[str, int] = {}
        for doc_id, t in zip(b["doc_id"], b["text"]):
            d = int(doc_id)
            toks = t.split()
            for i in range(len(toks) - 2):
                g = f"{toks[i]} {toks[i + 1]} {toks[i + 2]}"
                prev = first.get(g)
                if prev is None or d < prev:
                    first[g] = d
        return pd.DataFrame(
            {
                "gram": list(first.keys()),
                "first_doc": np.fromiter(first.values(), dtype=np.int64, count=len(first)),
            }
        )

    firsts = grouped_agg(
        narrow.map_batches(partial, batch_format="pandas", batch_size=4096),
        ["gram"],
        {"first_doc": ("first_doc", "min")},
    )

    def to_checkpoint(b: pd.DataFrame) -> pd.DataFrame:
        ck = (b["first_doc"].to_numpy(dtype=np.int64) - mn) // width
        return pd.DataFrame({"__ck": ck, "new_types": np.ones(len(b), dtype=np.int64)})

    hist = grouped_sum(
        firsts.map_batches(to_checkpoint, batch_format="pandas"), ["__ck"], ["new_types"]
    )
    curve = prefix_sum(hist, "__ck", "new_types", out_col="__before")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ck = b["__ck"].to_numpy(dtype=np.int64)
        new = b["new_types"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "docs_prefix": np.minimum((ck + 1) * width, span),
                "new_types": new,
                "cum_types": b["__before"].to_numpy(dtype=np.int64) + new,
            }
        )

    return curve.map_batches(finish, batch_format="pandas")


def vocab_growth_sql(num_checkpoints: int = VOCAB_CHECKPOINTS) -> str:
    return rf"""
WITH b AS (
    SELECT min(doc_id) AS mn, max(doc_id) AS mx,
           (max(doc_id) - min(doc_id) + 1 + {int(num_checkpoints)} - 1)
               // {int(num_checkpoints)} AS width,
           max(doc_id) - min(doc_id) + 1 AS span
    FROM documents
),
t AS (
    SELECT doc_id, regexp_split_to_array({_TW}, '{_WS}') AS arr
    FROM documents WHERE {_TW} <> ''
),
w AS (
    SELECT doc_id, arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS gram
    FROM t, unnest(generate_series(1, len(arr) - 2)) AS u(i)
),
f AS (SELECT gram, min(doc_id) AS first_doc FROM w GROUP BY gram),
h AS (
    SELECT (f.first_doc - b.mn) // b.width AS ck,
           CAST(COUNT(*) AS BIGINT) AS new_types
    FROM f, b GROUP BY ck
)
SELECT CAST(LEAST((h.ck + 1) * b.width, b.span) AS BIGINT) AS docs_prefix,
       h.new_types,
       CAST(SUM(h.new_types) OVER (ORDER BY h.ck) AS BIGINT) AS cum_types
FROM h, b
"""


VOCAB_GROWTH_SQL = vocab_growth_sql()


# ---------------------------------------------------------------------------
# C4 three-sentence-span dedup carrier
# ---------------------------------------------------------------------------


def derive_span_corpus(b: pd.DataFrame) -> pd.DataFrame:
    """Sentence-structured corpus with PLANTED duplicated spans: each
    doc's base sentences (5-token groups, the ``derive_sentence_text``
    arithmetic) are followed by a 2-sentence lang-keyed block and a
    4-sentence source-keyed licence block. Docs sharing a source share
    the licence block, so its two interior 3-windows duplicate
    corpus-wide — the span winner (smallest (doc_id, pos)) keeps all
    four licence sentences, every other doc of the source loses them
    (overlapping-window deletion union). The 2-sentence lang block
    never fills a 3-window on its own, so it survives UNLESS a doc
    shares BOTH lang and source with another doc (then the bridging
    window duplicates too) — the oracle derives whichever holds."""
    texts = []
    for text, lang, source in zip(b["text"], b["lang"], b["source"]):
        toks = text.split()
        sents = [" ".join(toks[i : i + SENT_EVERY]) for i in range(0, len(toks), SENT_EVERY)]
        sents += [
            f"lang marker one for {lang}",
            f"lang marker two for {lang}",
            f"licence sentence one for {source}",
            f"licence sentence two for {source}",
            f"licence sentence three for {source}",
            f"licence sentence four for {source}",
        ]
        texts.append(". ".join(sents) + ".")
    out = b.copy()
    out["text"] = texts
    return out


def span_dedup_documents(
    sf_dir: str, broadcast_limit: int | None = None
) -> ray.data.Dataset:
    """Carrier: documents → planted-span corpus (above) → C4
    three-sentence-span dedup (``pipelines.dedup.span_dedup``) →
    ``(doc_id, n_sentences_kept, text_kept)``. The real rule-based
    sentence segmenter feeds the real span machinery; the SQL oracle
    replays the sentence arithmetic and the winner/overlap semantics
    end to end."""
    from pdf_extractor_ray.pipelines.dedup import span_dedup

    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source"]).map_batches(
        derive_span_corpus, batch_format="pandas", batch_size=1024
    )
    return span_dedup(
        ds, text_col="text", id_col="doc_id", broadcast_limit=broadcast_limit
    )


def _span_dedup_sql() -> str:
    k = SENT_EVERY
    cap = 1 << 20
    return rf"""
WITH t AS (
    SELECT doc_id, lang, source,
           CASE WHEN {_TW} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({_TW}, '{_WS}') END AS arr
    FROM documents
),
nb AS (SELECT doc_id, CAST(ceil(len(arr)/{k}.0) AS BIGINT) AS n_base FROM t),
s AS (
    SELECT t.doc_id, CAST(u.k AS BIGINT) AS pos,
           array_to_string(arr[{k}*u.k+1 : LEAST({k}*u.k+{k}, len(arr))], ' ') AS sentence
    FROM t, unnest(generate_series(0, CAST(ceil(len(arr)/{k}.0) AS INT) - 1)) AS u(k)
    WHERE len(arr) > 0
    UNION ALL
    SELECT t.doc_id, nb.n_base + u.i,
           CASE u.i
                WHEN 0 THEN 'lang marker one for ' || t.lang
                WHEN 1 THEN 'lang marker two for ' || t.lang
                WHEN 2 THEN 'licence sentence one for ' || t.source
                WHEN 3 THEN 'licence sentence two for ' || t.source
                WHEN 4 THEN 'licence sentence three for ' || t.source
                ELSE 'licence sentence four for ' || t.source END
    FROM t JOIN nb USING (doc_id)
    CROSS JOIN unnest([CAST(0 AS BIGINT), 1, 2, 3, 4, 5]) AS u(i)
),
sp AS (
    SELECT a.doc_id, a.pos,
           a.sentence || chr(10) || b.sentence || chr(10) || c.sentence AS sp_text
    FROM s a
    JOIN s b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN s c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
win AS (
    SELECT sp_text, min(doc_id * {cap} + pos) AS wkey
    FROM sp GROUP BY sp_text HAVING count(*) >= 2
),
del AS (
    SELECT DISTINCT sp.doc_id, sp.pos + u.i AS dpos
    FROM sp JOIN win ON sp.sp_text = win.sp_text
    CROSS JOIN unnest([CAST(0 AS BIGINT), 1, 2]) AS u(i)
    WHERE sp.doc_id * {cap} + sp.pos <> win.wkey
),
kept AS (
    SELECT s.doc_id, s.pos, s.sentence FROM s
    WHERE NOT EXISTS (
        SELECT 1 FROM del WHERE del.doc_id = s.doc_id AND del.dpos = s.pos
    )
)
SELECT d.doc_id, CAST(COUNT(kd.sentence) AS BIGINT) AS n_sentences_kept,
       COALESCE(string_agg(kd.sentence, chr(10) ORDER BY kd.pos), '') AS text_kept
FROM documents d LEFT JOIN kept kd USING (doc_id)
GROUP BY d.doc_id
"""


SPAN_DEDUP_SQL = _span_dedup_sql()


# ---------------------------------------------------------------------------
# Readability scoring (Automated Readability Index, integer-exact)
# ---------------------------------------------------------------------------


def ari_readability_documents(sf_dir: str) -> ray.data.Dataset:
    """Automated Readability Index per document (Senter & Smith 1967:
    ``4.71*chars/words + 0.5*words/sentences - 21.43``) in exact
    MILLI-units over a common denominator — the readability family is
    a standard quality-filter feature (too-low = fragment soup,
    too-high = tables/code mis-extracted as prose). ARI, not Flesch,
    because it needs no syllable model: chars/words/sentences are all
    integers both the engine and the SQL oracle can count exactly.
    ``ari_milli = (4710*C*S + 500*W*W) // (W*S) - 21430`` — a single
    division of a NON-NEGATIVE numerator, so Python's floor and
    DuckDB's truncating ``//`` agree (pulling the constant out of the
    division is exact: subtracting an integer multiple of the divisor
    commutes with floor); no float anywhere. Sentences come from the
    REAL rule-based segmenter over the punctuated carrier text (the
    ``derive_sentence_text`` arithmetic), chars are the summed token
    lengths. Empty docs emit NULL ari. Zero shuffle, one pass."""
    from pdf_extractor_ray.kernels.textstats import split_sentences

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        derive_sentence_text, batch_format="pandas", batch_size=1024
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        ids, chars, words, sents, ari = [], [], [], [], []
        for doc_id, t in zip(b["doc_id"], b["text"]):
            toks = [w for s in split_sentences(t) for w in s.split()]
            w = len(toks)
            c = sum(len(tk) for tk in toks)
            s = len(split_sentences(t))
            ids.append(int(doc_id))
            chars.append(c)
            words.append(w)
            sents.append(s)
            if w and s:
                # +21430*W*S offset keeps the numerator non-negative so
                # floor (python //) and truncation (DuckDB //) agree
                ari.append((4710 * c * s + 500 * w * w) // (w * s) - 21430)
            else:
                ari.append(None)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_chars": pd.Series(chars, dtype="int64"),
                "n_words": pd.Series(words, dtype="int64"),
                "n_sentences": pd.Series(sents, dtype="int64"),
                "ari_milli": pd.Series(ari, dtype="Int64"),
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=1024)


def _ari_readability_sql() -> str:
    k = SENT_EVERY
    return rf"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN {_TW} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({_TW}, '{_WS}') END AS arr
    FROM documents
),
m AS (
    SELECT doc_id,
           CAST(len(array_to_string(arr, '')) AS BIGINT) AS c,
           CAST(len(arr) AS BIGINT) AS w,
           CAST(ceil(len(arr) / {k}.0) AS BIGINT) AS s
    FROM t
)
SELECT doc_id, c AS n_chars, w AS n_words, s AS n_sentences,
       CASE WHEN w > 0 AND s > 0
            THEN (4710 * c * s + 500 * w * w) // (w * s) - 21430
            ELSE NULL END AS ari_milli
FROM m
"""


ARI_READABILITY_SQL = _ari_readability_sql()


# ---------------------------------------------------------------------------
# Per-host language entropy (multilingual-host / spam-farm signal)
# ---------------------------------------------------------------------------


def host_lang_entropy(sf_dir: str) -> ray.data.Dataset:
    """Language-mix entropy per host in integer micro-nats:
    ``(host, n_docs, n_langs, ent_total_micro)`` where
    ent_total_micro = Σ_langs floor(c·ln(n/c)·1e6 + 0.5), the TOTAL
    (unnormalized) Shannon self-information of the host's language
    distribution — an exact integer sum (the :func:`token_entropy_documents`
    rounding discipline). Zero entropy = single-language host; high
    entropy on one host is the machine-translation / scraper-farm
    signal crawl curation keys on (CCNet buckets per language — a host
    that spans many is worth a second look). Host derives from doc_id
    arithmetic (the carrier convention); lang is the corpus column.

    Scale shape: stage 1 is one (host, lang) bucketed count exchange
    (per-batch partials bound viral hosts); stage 2 folds per host
    over at most |langs| rows — bounded by the language vocabulary,
    never by the host's document count.

    Float note: one libm ln per (c, n) pair with per-term rounding —
    the 1-ulp budget shared with token_entropy; the SQL writes the
    identical expression tree (c·ln(n/c))·1e6 + 0.5."""
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": pd.Series(
                    [f"h{int(d) % 13}.example.org" for d in b["doc_id"]], dtype="object"
                ),
                "lang": b["lang"].astype(object),
                "c": pd.Series(np.ones(len(b), np.int64)),
            }
        )

    counts = grouped_sum(ds.map_batches(keyed, batch_format="pandas"), ["host", "lang"], ["c"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        hosts, nd, nl, ent = [], [], [], []
        for host, sub in g.groupby("host", sort=False):
            c = sub["c"].to_numpy(np.float64)
            n = float(c.sum())
            terms = np.floor((c * np.log(n / c)) * 1_000_000 + 0.5).astype(np.int64)
            hosts.append(host)
            nd.append(int(n))
            nl.append(len(sub))
            ent.append(int(terms.sum()))
        return pd.DataFrame(
            {
                "host": pd.Series(hosts, dtype="object"),
                "n_docs": pd.Series(nd, dtype="int64"),
                "n_langs": pd.Series(nl, dtype="int64"),
                "ent_total_micro": pd.Series(ent, dtype="int64"),
            }
        )

    return grouped_apply(counts, ["host"], fold)


HOST_LANG_ENTROPY_SQL = """
WITH c AS (
  SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.org' AS host,
         lang, CAST(COUNT(*) AS DOUBLE) AS c
  FROM documents GROUP BY 1, 2
), n AS (
  SELECT host, SUM(c) AS n, COUNT(*) AS n_langs FROM c GROUP BY host
)
SELECT c.host,
       CAST(ANY_VALUE(n.n) AS BIGINT) AS n_docs,
       CAST(ANY_VALUE(n.n_langs) AS BIGINT) AS n_langs,
       CAST(SUM(CAST(floor((c.c * ln(n.n / c.c)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS ent_total_micro
FROM c JOIN n USING (host) GROUP BY c.host
"""


# ---------------------------------------------------------------------------
# Corpus-driven stopword discovery (df-ratio thresholding)
# ---------------------------------------------------------------------------

STOPWORD_DF_MILLI = 300  # df ratio ≥ 30% of documents → stopword candidate


def stopword_discovery_documents(sf_dir: str) -> ray.data.Dataset:
    """Data-driven stopword discovery: tokens whose DOCUMENT frequency
    ratio meets :data:`STOPWORD_DF_MILLI` —
    ``(token, df, df_milli)`` with ``df_milli = 1000·df // N`` (exact
    integer, N = corpus document count). The language-agnostic way an
    index or tf-idf weighting derives its stop list from the corpus
    itself instead of a shipped lexicon (Luhn's classic upper-cutoff).

    Scale shape: per-batch per-doc token-set dedup (a doc repeating
    'the' 10 000 times contributes one (doc,token) pair) → ONE bucketed
    token-keyed df sum with per-batch partials → threshold filter with
    N broadcast as a closure scalar (one driver-side count of a
    metadata-only read — never row data)."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()  # metadata count — no row materialization

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in b["text"]:
            toks.extend(set(t.split()))
        return pd.DataFrame(
            {
                "token": pd.Series(toks, dtype="object"),
                "df": pd.Series(np.ones(len(toks), np.int64)),
            }
        )

    summed = grouped_sum(ds.map_batches(pairs, batch_format="pandas"), ["token"], ["df"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        df = b["df"].to_numpy(np.int64)
        milli = (1000 * df) // n_docs
        out = pd.DataFrame(
            {"token": b["token"].astype(object), "df": df, "df_milli": milli}
        )
        return out[out["df_milli"] >= STOPWORD_DF_MILLI]

    return summed.map_batches(finish, batch_format="pandas")


def _stopword_sql() -> str:
    return f"""
WITH p AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array({trim_ws_sql("text")}, '{WS_SPLIT_RE_SQL}')) AS t(token)
  WHERE {trim_ws_sql("text")} <> ''
),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       CAST((1000 * COUNT(*)) // ANY_VALUE(n.n) AS BIGINT) AS df_milli
FROM p, n GROUP BY token
HAVING (1000 * COUNT(*)) // ANY_VALUE(n.n) >= {STOPWORD_DF_MILLI}
"""


STOPWORD_DISCOVERY_SQL = _stopword_sql()


# ---------------------------------------------------------------------------
# Per-host median document length (host quality profiling)
# ---------------------------------------------------------------------------


def host_length_median(sf_dir: str) -> ray.data.Dataset:
    """Exact per-host MEDIAN document length (nearest-rank:
    sorted ascending, element at ``ceil(n/2) - 1``) —
    ``(host, p50_chars)``. Host-level length medians separate article
    sites from link farms / tag-page mills (whose per-page text
    collapses) — robust where the host MEAN is dragged by one mega
    page. Host derives from doc_id arithmetic (carrier convention).

    Scale shape: the decomposed order-statistic
    (:func:`ops.grouped_quantile_counts`) — the first exchange carries
    DISTINCT (host, n_chars) counts (bounded by the length domain,
    never the doc count), the second computes the rank from cumulative
    counts; no host's raw rows are ever co-located."""
    from pdf_extractor_ray.ops import grouped_quantile_counts

    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": pd.Series(
                    [f"h{int(d) % 13}.example.org" for d in b["doc_id"]], dtype="object"
                ),
                "n_chars": b["n_chars"].to_numpy(np.int64),
            }
        )

    return grouped_quantile_counts(
        ds.map_batches(keyed, batch_format="pandas"), ["host"], "n_chars", 0.5,
        out_col="p50_chars",
    )


HOST_LENGTH_MEDIAN_SQL = """
WITH s AS (
  SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) || '.example.org' AS host,
         CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY doc_id % 13 ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id % 13) AS n
  FROM documents
)
SELECT host, v AS p50_chars FROM s
WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
"""


# ---------------------------------------------------------------------------
# OOV rate vs the corpus top-K vocabulary (tokenizer-coverage audit)
# ---------------------------------------------------------------------------

OOV_VOCAB_K = 100


def oov_rate_documents(sf_dir: str) -> ray.data.Dataset:
    """Out-of-vocabulary audit: per document, how many tokens fall
    outside the corpus' top-:data:`OOV_VOCAB_K` vocabulary —
    ``(doc_id, n_tokens, n_oov)``. The coverage check run before
    freezing any closed vocabulary (classic LM preprocessing: Chen &
    Goodman's <unk> mapping); a doc that is mostly OOV under the
    corpus' own head vocabulary is jargon, noise, or another language.

    Scale shape: the vocabulary comes from the distributed top-K fold
    (:func:`graph._topk_vocab_ordered`: word-count exchange + local
    prune + K-limit), broadcasts as a frozenset in the closure
    (K-bounded), and the per-doc count is one zero-shuffle vectorized
    pass."""
    from pdf_extractor_ray.pipelines.graph import _topk_vocab_ordered

    vocab = frozenset(_topk_vocab_ordered(sf_dir, OOV_VOCAB_K))
    ds = _docs(sf_dir, ["doc_id", "text"])

    def rate(b: pd.DataFrame) -> pd.DataFrame:
        n_tok = np.zeros(len(b), np.int64)
        n_oov = np.zeros(len(b), np.int64)
        for i, t in enumerate(b["text"]):
            ws = t.split()
            n_tok[i] = len(ws)
            n_oov[i] = sum(1 for w in ws if w not in vocab)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_tokens": n_tok,
                "n_oov": n_oov,
            }
        )

    return ds.map_batches(rate, batch_format="pandas", batch_size=8192)


def _oov_rate_sql() -> str:
    tw = trim_ws_sql("text")
    return rf"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}')) AS token
  FROM documents WHERE {tw} <> ''
),
v AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS n FROM w GROUP BY token
  ) QUALIFY row_number() OVER (ORDER BY n DESC, token ASC) <= {OOV_VOCAB_K}
),
c AS (
  SELECT w.doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM w LEFT JOIN v ON v.token = w.token
  GROUP BY w.doc_id
)
SELECT d.doc_id, CAST(COALESCE(c.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.n_oov, 0) AS BIGINT) AS n_oov
FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id
"""


OOV_RATE_SQL = _oov_rate_sql()


# ---------------------------------------------------------------------------
# Byte/char-level entropy (compressibility proxy, zlib-free)
# ---------------------------------------------------------------------------


def char_entropy_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-doc CHARACTER entropy in integer micro-nats:
    ``(doc_id, n_chars, n_distinct, ent_total_micro)`` with
    ent_total_micro = Σ_chars floor(c·ln(n/c)·1e6 + 0.5) — the
    distribution-level compressibility proxy (low char entropy ≈ high
    zlib ratio: repeated-char padding, base64-ish uniformity sits at
    the top end) that, unlike :func:`compression_ratio_documents`'s
    zlib byte counts, is EXACTLY replayable in SQL. Zero shuffle;
    per-term rounding is the shared 1-ulp budget (token_entropy's
    discipline, char-level)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def ent(b: pd.DataFrame) -> pd.DataFrame:
        n_ch = np.zeros(len(b), np.int64)
        n_di = np.zeros(len(b), np.int64)
        total = np.zeros(len(b), np.int64)
        for i, t in enumerate(b["text"]):
            if not t:
                continue
            _, counts = np.unique(np.frombuffer(t.encode("utf-8"), np.uint8), return_counts=True)
            c = counts.astype(np.float64)
            n = float(c.sum())
            terms = np.floor((c * np.log(n / c)) * 1_000_000 + 0.5).astype(np.int64)
            n_ch[i], n_di[i], total[i] = int(n), len(counts), int(terms.sum())
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_chars": n_ch,
                "n_distinct": n_di,
                "ent_total_micro": total,
            }
        )

    return ds.map_batches(ent, batch_format="pandas", batch_size=8192)


# ASCII corpus precondition (functions/exact.py): one utf-8 byte per
# char, so SQL string_split over characters replays the byte histogram
CHAR_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, unnest(string_split_regex(text, '')) AS c
  FROM documents WHERE text <> ''
),
f AS (
  SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM ch WHERE c <> '' GROUP BY doc_id, c
),
n AS (SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS n_distinct FROM f GROUP BY doc_id),
e AS (
  SELECT f.doc_id,
         CAST(ANY_VALUE(n.n) AS BIGINT) AS n_chars,
         CAST(ANY_VALUE(n.n_distinct) AS BIGINT) AS n_distinct,
         CAST(SUM(CAST(floor((f.cnt * ln(n.n / f.cnt)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS ent_total_micro
  FROM f JOIN n USING (doc_id) GROUP BY f.doc_id
)
SELECT d.doc_id,
       COALESCE(e.n_chars, 0) AS n_chars,
       COALESCE(e.n_distinct, 0) AS n_distinct,
       COALESCE(e.ent_total_micro, 0) AS ent_total_micro
FROM documents d LEFT JOIN e ON e.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# N-gram diversity (corpus-level repetitiveness in one number per n)
# ---------------------------------------------------------------------------


def ngram_diversity_documents(sf_dir: str) -> ray.data.Dataset:
    """Corpus n-gram diversity for n ∈ {1,2,3}: ``(n, n_total,
    n_distinct, diversity_milli = 1000·distinct // total)`` — the
    type/token ratio ladder (distinct-trigram ratio is the classic
    template/boilerplate alarm: heavily templated corpora collapse at
    n=3 long before n=1; Welleck et al.'s distinct-n metric at corpus
    scale). N-grams never cross document boundaries.

    Scale shape: totals are pure per-batch partials (one 3-row frame
    per batch); distinct counts batch-dedupe per (n, gram) first, then
    ONE gram-keyed distinct exchange and a 3-group count — the exact
    twin of the per-lang bigram-vocab op, generalized over n."""
    from pdf_extractor_ray.ops import distinct, grouped_sum

    ds = _docs(sf_dir, ["doc_id", "text"])

    def totals(b: pd.DataFrame) -> pd.DataFrame:
        t = np.zeros(3, np.int64)
        for txt in b["text"]:
            ln = len(txt.split())
            for n in (1, 2, 3):
                t[n - 1] += max(0, ln - n + 1)
        return pd.DataFrame({"n": np.arange(1, 4, dtype=np.int64), "n_total": t})

    def grams(b: pd.DataFrame) -> pd.DataFrame:
        ns, gs = [], []
        for txt in b["text"]:
            ws = txt.split()
            for n in (1, 2, 3):
                seen = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
                ns.extend([n] * len(seen))
                gs.extend(seen)
        return pd.DataFrame(
            {"n": pd.Series(ns, dtype="int64"), "gram": pd.Series(gs, dtype="object")}
        )

    total = grouped_sum(
        ds.map_batches(totals, batch_format="pandas"), ["n"], ["n_total"]
    ).to_pandas().set_index("n")  # 3 rows
    dist = (
        grouped_sum(
            distinct(
                ds.map_batches(grams, batch_format="pandas", batch_size=4096),
                ["n", "gram"],
            ).map_batches(
                lambda b: pd.DataFrame(
                    {"n": b["n"].to_numpy(np.int64), "c": np.ones(len(b), np.int64)}
                ),
                batch_format="pandas",
            ),
            ["n"],
            ["c"],
        )
        .to_pandas()
        .set_index("n")
    )
    out = pd.DataFrame(
        {
            "n": np.arange(1, 4, dtype=np.int64),
            "n_total": total["n_total"].reindex(range(1, 4), fill_value=0).to_numpy(np.int64),
            "n_distinct": dist["c"].reindex(range(1, 4), fill_value=0).to_numpy(np.int64),
        }
    )
    out["diversity_milli"] = np.where(
        out["n_total"] > 0, (1000 * out["n_distinct"]) // out["n_total"].clip(lower=1), 0
    ).astype(np.int64)
    return ray.data.from_pandas(out)


def _ngram_diversity_sql() -> str:
    tw = trim_ws_sql("text")
    return rf"""
WITH t AS (
  SELECT CASE WHEN {tw} = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}') END AS arr
  FROM documents
),
g AS (
  SELECT 1 AS n, unnest(arr) AS gram FROM t
  UNION ALL
  SELECT 2, arr[p] || ' ' || arr[p + 1]
  FROM t, unnest(range(1, len(arr))) AS r(p)
  UNION ALL
  SELECT 3, arr[p] || ' ' || arr[p + 1] || ' ' || arr[p + 2]
  FROM t, unnest(range(1, len(arr) - 1)) AS r(p)
)
SELECT n, CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
       CAST((1000 * COUNT(DISTINCT gram)) // COUNT(*) AS BIGINT) AS diversity_milli
FROM g GROUP BY n
"""


NGRAM_DIVERSITY_SQL = _ngram_diversity_sql()


# ---------------------------------------------------------------------------
# Entity harvest (regex NER: the structured-signal extraction pass)
# ---------------------------------------------------------------------------

# RE2-safe (no lookarounds) so the oracle replays them exactly
ENTITY_URL_PAT = r"https?://[^\s]+"
ENTITY_YEAR_PAT = r"\b(19|20)[0-9]{2}\b"
ENTITY_MONEY_PAT = r"\$[0-9]+(\.[0-9]{2})?"


def derive_entity_texts(b: pd.DataFrame) -> pd.DataFrame:
    """Augmented text per doc with arithmetic-planted entities: every
    doc gains ``d % 3`` URLs, ``d % 4`` year mentions, and ``d % 5``
    money amounts appended to its real text — plus decoys that must
    NOT match (a bare ``2500`` outside year range is a valid year?
    no — 2500 fails the (19|20)xx class; ``$x`` with no digits; an
    ``ftp://`` scheme)."""
    texts = []
    for doc_id, text in zip(b["doc_id"], b["text"]):
        d = int(doc_id)
        extra = []
        extra += [f"https://e{d}.example.org/{j}" for j in range(d % 3)]
        extra += [f"in {1900 + (d + j) % 200}" for j in range(d % 4)]
        extra += [f"${(d + j) % 100}.{d % 100:02d}" for j in range(d % 5)]
        extra += ["year 2500", "$x", "ftp://not.a.match"]  # decoys
        texts.append((text + " " + " ".join(extra)).strip())
    out = b[["doc_id"]].copy()
    out["aug"] = texts
    return out


def entity_counts_documents(sf_dir: str) -> ray.data.Dataset:
    """Regex entity harvest: URL / year / money mention counts per doc
    through compiled RE2-safe patterns — ``(doc_id, n_urls, n_years,
    n_money)``. The structured-signal pass a metadata enricher runs
    after extraction (link graphs from body URLs, recency priors from
    year mentions, commerce classification from price mentions).
    Planted decoys pin the pattern boundaries; the corpus' own text is
    proven entity-free by the exact counts. Zero shuffle; patterns
    compile once per worker closure."""
    import re

    url_re = re.compile(ENTITY_URL_PAT)
    year_re = re.compile(ENTITY_YEAR_PAT)
    money_re = re.compile(ENTITY_MONEY_PAT)
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        derive_entity_texts, batch_format="pandas"
    )

    def harvest(b: pd.DataFrame) -> pd.DataFrame:
        n_u = np.empty(len(b), np.int64)
        n_y = np.empty(len(b), np.int64)
        n_m = np.empty(len(b), np.int64)
        for i, t in enumerate(b["aug"]):
            n_u[i] = len(url_re.findall(t))
            n_y[i] = len(year_re.findall(t))
            n_m[i] = len(money_re.findall(t))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_urls": n_u,
                "n_years": n_y,
                "n_money": n_m,
            }
        )

    return ds.map_batches(harvest, batch_format="pandas", batch_size=4096)


# planted counts replay exactly: the corpus text itself contains no
# entities (lowercase ASCII words), and each decoy matches nothing
ENTITY_COUNTS_SQL = """
SELECT doc_id,
       CAST(doc_id % 3 AS BIGINT) AS n_urls,
       CAST(doc_id % 4 AS BIGINT) AS n_years,
       CAST(doc_id % 5 AS BIGINT) AS n_money
FROM documents
"""


# ---------------------------------------------------------------------------
# Intra-document line dedup (RefinedWeb/Gopher "remove duplicate lines
# within document" cleaner) through a derive carrier
# ---------------------------------------------------------------------------

LINE_EVERY = SENT_EVERY  # carrier line = one 5-token group


def derive_line_corpus(b: "pd.DataFrame") -> "pd.DataFrame":
    """Line-structured corpus with PLANTED intra-doc repeats: each
    doc's base lines (``LINE_EVERY``-token groups) are followed by a
    re-appearance of the first and third base line (nav/menu blocks
    repeating within a page) and a source-keyed footer line repeated
    three times (cookie-banner shape). First-occurrence line dedup
    must drop exactly the re-appearances — the oracle rebuilds the
    same line array by token arithmetic."""
    texts = []
    for text, source in zip(b["text"], b["source"]):
        toks = text.split()
        base = [
            " ".join(toks[i : i + LINE_EVERY]) for i in range(0, len(toks), LINE_EVERY)
        ]
        extra = [base[0], base[2]] if len(base) >= 3 else base[:1]
        lines = base + extra + [f"footer for {source}"] * 3
        texts.append("\n".join(lines))
    out = b.copy()
    out["text"] = texts
    return out


def line_dedup_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-document duplicate-line removal, first occurrence kept —
    ``(doc_id, n_lines, n_kept, clean_text)``. Purely per-row, so the
    stage is zero-shuffle ``map_batches``; at 100 TB this is the cheap
    half of line-level cleaning (the cross-doc half is
    :func:`webdocs.paragraph_dedup_documents`)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    ).map_batches(derive_line_corpus, batch_format="pandas", batch_size=2048)

    def dedup(b: pd.DataFrame) -> pd.DataFrame:
        ids, n_lines, n_kept, clean = [], [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            lines = text.split("\n") if text else []
            seen: set[str] = set()
            kept = []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            ids.append(int(doc_id))
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            clean.append("\n".join(kept))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_lines": pd.Series(n_lines, dtype="int64"),
                "n_kept": pd.Series(n_kept, dtype="int64"),
                "clean_text": pd.Series(clean, dtype="object"),
            }
        )

    return ds.map_batches(dedup, batch_format="pandas", batch_size=2048)


def _line_dedup_sql() -> str:
    tw = trim_ws_sql("text")
    k = LINE_EVERY
    return rf"""
WITH t AS (
    SELECT doc_id, source,
           CASE WHEN {tw} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}') END AS arr
    FROM documents
), base AS (
    SELECT doc_id, source,
           list_transform(generate_series(0, CAST(ceil(len(arr)/{k}.0) AS INT) - 1),
                          i -> array_to_string(arr[{k}*i+1 : LEAST({k}*i+{k}, len(arr))], ' ')) AS bl
    FROM t
), lined AS (
    SELECT doc_id,
           bl
           || (CASE WHEN len(bl) >= 3 THEN [bl[1], bl[3]]
                    WHEN len(bl) >= 1 THEN [bl[1]]
                    ELSE CAST([] AS VARCHAR[]) END)
           || ['footer for ' || source, 'footer for ' || source, 'footer for ' || source] AS lines
    FROM base
), ln AS (
    SELECT doc_id, u.i AS idx, lines[u.i] AS line
    FROM lined, unnest(generate_series(1, len(lines))) AS u(i)
), firsts AS (
    SELECT doc_id, line, MIN(idx) AS first_idx FROM ln GROUP BY doc_id, line
), tot AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines FROM ln GROUP BY doc_id
)
SELECT f.doc_id, ANY_VALUE(t.n_lines) AS n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       string_agg(f.line, chr(10) ORDER BY f.first_idx) AS clean_text
FROM firsts f JOIN tot t USING (doc_id)
GROUP BY f.doc_id
"""


LINE_DEDUP_SQL = _line_dedup_sql()


# ---------------------------------------------------------------------------
# Mojibake (UTF-8-read-as-Latin-1) detection and repair
# ---------------------------------------------------------------------------

# UTF-8 lead bytes 0xC2-0xC5 followed by a continuation byte, both read
# as Latin-1 codepoints -- the signature of double-encoded crawl text
_MOJIBAKE_RE = _re.compile("[\u00c2-\u00c5][\u0080-\u00bf]")
MOJIBAKE_PLANT_MOD = 4


def derive_mojibake_corpus(b: "pd.DataFrame") -> "pd.DataFrame":
    """Carrier: every ``doc_id % 4 == 0`` doc gets a trailing snippet
    whose accents were mangled by the classic UTF-8->Latin-1 misread
    ('caf\u00e9 r\u00e9sum\u00e9' stored as 'caf\u00c3\u00a9 ...');
    other docs get the clean ASCII decoy so a naive substring match
    can't cheat."""
    mangled = " menu caf\u00e9 r\u00e9sum\u00e9 end".encode("utf-8").decode("latin-1")
    texts = []
    for doc_id, text in zip(b["doc_id"], b["text"]):
        if int(doc_id) % MOJIBAKE_PLANT_MOD == 0:
            texts.append(text + mangled)
        else:
            texts.append(text + " menu cafe resume end")
    out = b.copy()
    out["text"] = texts
    return out


def repair_mojibake(text: str) -> "tuple[int, str]":
    """(n_hits, repaired): when the double-encoding signature appears
    and the Latin-1 -> UTF-8 round-trip decodes cleanly, undo it;
    otherwise return the text unchanged (never corrupt on suspicion)."""
    hits = _MOJIBAKE_RE.findall(text)
    if not hits:
        return 0, text
    try:
        return len(hits), text.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return len(hits), text


def mojibake_documents(sf_dir: str) -> ray.data.Dataset:
    """Mojibake screen over the (derived) corpus -> ``(doc_id,
    n_mojibake, repaired, clean_text)``: detects the UTF-8-as-Latin-1
    double-encoding signature and repairs it by reversing the misread
    -- the ftfy-style hygiene pass a web corpus needs before tokenizer
    training (mangled accents shatter into junk BPE merges). Purely
    per-row, zero shuffle."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(derive_mojibake_corpus, batch_format="pandas", batch_size=2048)

    def screen(b: pd.DataFrame) -> pd.DataFrame:
        ids, nm, rep, clean = [], [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            n, fixed = repair_mojibake(text)
            ids.append(int(doc_id))
            nm.append(n)
            rep.append(bool(n) and fixed != text)
            clean.append(fixed)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_mojibake": pd.Series(nm, dtype="int64"),
                "repaired": pd.Series(rep, dtype="bool"),
                "clean_text": pd.Series(clean, dtype="object"),
            }
        )

    return ds.map_batches(screen, batch_format="pandas", batch_size=2048)


MOJIBAKE_SQL = f"""
SELECT doc_id,
       CAST(CASE WHEN doc_id % {MOJIBAKE_PLANT_MOD} = 0 THEN 3 ELSE 0 END AS BIGINT) AS n_mojibake,
       doc_id % {MOJIBAKE_PLANT_MOD} = 0 AS repaired,
       text || ' menu caf\u00e9 r\u00e9sum\u00e9 end' AS clean_text
FROM documents WHERE doc_id % {MOJIBAKE_PLANT_MOD} = 0
UNION ALL
SELECT doc_id, 0, FALSE, text || ' menu cafe resume end'
FROM documents WHERE doc_id % {MOJIBAKE_PLANT_MOD} <> 0
"""


# ---------------------------------------------------------------------------
# Token frequency spectrum (hapax / dis legomena analysis)
# ---------------------------------------------------------------------------


def derive_spectrum_corpus(b: "pd.DataFrame") -> "pd.DataFrame":
    """Carrier: the synthetic corpus has a tiny always-frequent vocab,
    so every doc plants one globally-unique token (``id<doc_id>`` →
    hapax) and one shared-by-≤3 token (``grp<doc_id//3>``) to make the
    low-frequency buckets live."""
    out = b[["doc_id"]].copy()
    out["text"] = [
        f"{t} id{int(d)} grp{int(d) // 3}" for d, t in zip(b["doc_id"], b["text"])
    ]
    return out


def token_spectrum_documents(sf_dir: str) -> ray.data.Dataset:
    """Token frequency SPECTRUM over the (derived) corpus → one row per
    frequency class ``(freq_bucket, n_types, n_tokens)`` with buckets
    1..5 exact and 6 = "6+": the count-of-counts view behind hapax-ratio
    quality screens and Zipf/Heaps fits (a vocabulary dominated by
    hapaxes signals OCR noise or mangled encodings; one dominated by
    the 6+ bucket signals boilerplate). Two exchanges, both shrinking:
    token partials (per-batch ``value_counts`` pre-agg, salted two-level
    combine for the viral base vocab) then a ≤6-row bucket fold."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(derive_spectrum_corpus, batch_format="pandas", batch_size=4096)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        tokens = b["text"].str.split(" ").explode()
        tokens = tokens[tokens != ""]
        g = tokens.value_counts().reset_index()
        g.columns = ["token", "n"]
        g["n"] = g["n"].astype("int64")
        return g

    counts = grouped_sum(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["token"],
        ["n"],
        two_level=True,
    )

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        g = pd.DataFrame({"freq_bucket": np.minimum(n, 6), "n_types": 1, "n_tokens": n})
        out = g.groupby("freq_bucket", as_index=False).agg(
            n_types=("n_types", "sum"), n_tokens=("n_tokens", "sum")
        )
        return out.astype({"freq_bucket": "int64", "n_types": "int64", "n_tokens": "int64"})

    return grouped_sum(
        counts.map_batches(bucketize, batch_format="pandas"),
        ["freq_bucket"],
        ["n_types", "n_tokens"],
        num_buckets=2,
    )


TOKEN_SPECTRUM_SQL = """
WITH w AS (
  SELECT unnest(regexp_split_to_array(
           text || ' id' || doc_id || ' grp' || (doc_id // 3), ' ')) AS word
  FROM documents
),
c AS (
  SELECT word, COUNT(*) AS n FROM w WHERE word != '' GROUP BY word
)
SELECT CAST(LEAST(n, 6) AS BIGINT) AS freq_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(n) AS BIGINT) AS n_tokens
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (corpus health fingerprint)
# ---------------------------------------------------------------------------


def zipf_slope_documents(sf_dir: str) -> "pd.DataFrame":
    """OLS slope of log(frequency) on log(rank) over the global token
    counts → one row ``(n_types, slope_neg_milli)`` where
    ``slope_neg_milli = 1000·(Sx·Sy − n·Sxy) // (n·Sxx − Sx²)`` is the
    NEGATED Zipf exponent in milli-units (natural text ≈ 1000; a
    boilerplate-dominated crawl flattens toward 0, OCR noise steepens
    it) — the one-number corpus-health fingerprint next to
    ``vocab_growth``'s Heaps fit.

    Exactness: x = ln(rank), y = ln(count) quantized to int64
    micro-nats (the shared ``floor(ln·1e6 + 0.5)`` quantizer); all
    sums/products in Python big-ints, one floor division at the end.
    NEGATING keeps both operands non-negative, sidestepping any
    floor-vs-truncate divergence on negative integer division. Rank
    ties are free: tied tokens share y, and {Σx, Σx², Σx·y} are
    permutation-invariant within a tie group, so the slope doesn't
    depend on tie order.

    Scale shape: one token-count exchange (per-batch pre-agg, salted);
    the driver collect is VOCAB-sized (the BPE-materialize argument),
    never corpus-sized."""
    import math

    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        tokens = b["text"].str.split(" ").explode()
        tokens = tokens[tokens != ""]
        g = tokens.value_counts().reset_index()
        g.columns = ["token", "n"]
        g["n"] = g["n"].astype("int64")
        return g

    counts = (
        grouped_sum(
            ds.map_batches(explode, batch_format="pandas", batch_size=8192),
            ["token"],
            ["n"],
            two_level=True,
        )
        .to_pandas()  # vocab-sized collect
        .sort_values(["n", "token"], ascending=[False, True])
        .reset_index(drop=True)
    )
    n_types = len(counts)
    sx = sxx = sy = sxy = 0
    for rank, c in enumerate(counts["n"].tolist(), start=1):
        x = math.floor(math.log(rank) * 1e6 + 0.5)
        y = math.floor(math.log(int(c)) * 1e6 + 0.5)
        sx += x
        sxx += x * x
        sy += y
        sxy += x * y
    denom = n_types * sxx - sx * sx
    slope_neg = (1000 * (sx * sy - n_types * sxy)) // denom if denom else 0
    return pd.DataFrame(
        {
            "n_types": pd.Series([n_types], dtype="int64"),
            "slope_neg_milli": pd.Series([slope_neg], dtype="int64"),
        }
    )


ZIPF_SLOPE_SQL = """
WITH c AS (
  SELECT word, COUNT(*) AS n
  FROM (SELECT unnest(regexp_split_to_array(text, ' ')) AS word FROM documents)
  WHERE word != '' GROUP BY word
),
r AS (
  SELECT CAST(floor(ln(ROW_NUMBER() OVER (ORDER BY n DESC, word)) * 1000000 + 0.5)
              AS BIGINT) AS x,
         CAST(floor(ln(n) * 1000000 + 0.5) AS BIGINT) AS y
  FROM c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST((1000 * (SUM(x) * SUM(y) - COUNT(*) * SUM(x * y)))
            // (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS BIGINT)
         AS slope_neg_milli
FROM r
"""


# ---------------------------------------------------------------------------
# Token burstiness (variance-to-mean ratio over per-doc counts)
# ---------------------------------------------------------------------------


def token_burstiness_documents(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Top-``k`` burstiest tokens by exact variance-to-mean ratio of
    per-document counts → ``(token, n_docs_with, total_count,
    vmr_milli)`` with ``vmr_milli = 1000·(N·S2 − S²) // (N·S)`` over
    ALL N corpus docs (absent docs contribute zero to S = Σc and
    S2 = Σc², so only present-doc partials are materialized) — the
    Church-Gale burstiness screen: content words clump (VMR ≫ 1),
    function words and injected boilerplate spread evenly (VMR ≈ 1 or
    below), so the top of this table is a topical-vocabulary report
    with no model. Numerator is non-negative by Cauchy-Schwarz, so
    Python ``//`` ≡ DuckDB ``//``.

    Scale shape: a document is one row, so per-(doc, token) counts are
    exact within a batch; one exchange moves per-token (S, S2, docs)
    partials; the top-k sorts the vocab-sized table."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    n_total = ds.count()

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        tokens = b["text"].str.split(" ")
        frame = pd.DataFrame(
            {"doc": np.repeat(np.arange(len(b)), tokens.str.len()), "token": tokens.explode().to_numpy()}
        )
        frame = frame[frame["token"] != ""]
        per_doc = frame.groupby(["doc", "token"], sort=False).size().reset_index(name="c")
        per_doc["c"] = per_doc["c"].astype("int64")
        per_doc["c2"] = per_doc["c"] ** 2
        per_doc["d"] = np.int64(1)
        out = per_doc.groupby("token", as_index=False).agg(
            s=("c", "sum"), s2=("c2", "sum"), n_docs_with=("d", "sum")
        )
        return out.astype({"s": "int64", "s2": "int64", "n_docs_with": "int64"})

    agg = grouped_sum(
        ds.map_batches(partials, batch_format="pandas", batch_size=4096),
        ["token"],
        ["s", "s2", "n_docs_with"],
        two_level=True,
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        s = b["s"].to_numpy(np.int64)
        s2 = b["s2"].to_numpy(np.int64)
        vmr = (1000 * (n_total * s2 - s * s)) // (n_total * s)
        return pd.DataFrame(
            {
                "token": b["token"],
                "n_docs_with": b["n_docs_with"].astype("int64"),
                "total_count": s,
                "vmr_milli": vmr.astype(np.int64),
            }
        )

    return (
        agg.map_batches(finalize, batch_format="pandas")
        .sort(["vmr_milli", "token"], descending=[True, False])
        .limit(k)
    )


TOKEN_BURSTINESS_SQL = """
WITH pd_ AS (
  SELECT doc_id, word AS token, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS word
        FROM documents)
  WHERE word != '' GROUP BY doc_id, word
),
n AS (SELECT COUNT(*) AS n FROM documents),
t AS (
  SELECT token, SUM(c) AS s, SUM(c * c) AS s2, COUNT(*) AS n_docs_with
  FROM pd_ GROUP BY token
)
SELECT token, CAST(n_docs_with AS BIGINT) AS n_docs_with,
       CAST(s AS BIGINT) AS total_count,
       CAST((1000 * (n.n * s2 - s * s)) // (n.n * s) AS BIGINT) AS vmr_milli
FROM t, n
ORDER BY vmr_milli DESC, token LIMIT 20
"""


# ---------------------------------------------------------------------------
# Exact percentile rank-transform (length percentile per doc)
# ---------------------------------------------------------------------------


def length_percentile_documents(sf_dir: str) -> ray.data.Dataset:
    """Exact rank-transform of document length → ``(doc_id, n_chars,
    pct_milli)`` with ``pct_milli = 1000·n_less // (n − 1)`` where
    ``n_less`` counts docs STRICTLY shorter (ties share a percentile,
    matching SQL ``RANK() − 1``) — the normalization a curation mix
    uses to compare lengths across heterogeneous sources (raw lengths
    aren't comparable between a news crawl and a forum dump; ranks
    are).

    Scale shape: the rank function is learned as COUNT-PER-DISTINCT-
    VALUE (bounded by the value domain — document lengths, not row
    count), prefix-summed into value → n_less, broadcast once via
    ``ray.put``, and applied per batch as a vectorized lookup — the
    rank-transform analog of the broadcast-a-scalar pattern. No
    per-row exchange at all."""
    import ray as _ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": b["n_chars"].astype("int64"), "m": np.ones(len(b), np.int64)})

    counts = (
        grouped_sum(ds.map_batches(ones, batch_format="pandas"), ["v"], ["m"])
        .to_pandas()  # value-domain-sized collect
        .sort_values("v")
        .reset_index(drop=True)
    )
    n = int(counts["m"].sum())
    n_less = np.concatenate([[0], np.cumsum(counts["m"].to_numpy(np.int64))[:-1]])
    lookup_ref = _ray.put(dict(zip(counts["v"].astype(int), n_less.tolist())))

    def transform(b: pd.DataFrame) -> pd.DataFrame:
        lk = _cached_get(lookup_ref)
        v = b["n_chars"].astype("int64")
        less = v.map(lk).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_chars": v,
                "pct_milli": (1000 * less // max(n - 1, 1)).astype(np.int64),
            }
        )

    return ds.map_batches(transform, batch_format="pandas")


LENGTH_PERCENTILE_SQL = """
WITH n AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(1000 * (RANK() OVER (ORDER BY n_chars) - 1)
            // GREATEST(n.n - 1, 1) AS BIGINT) AS pct_milli
FROM documents, n
"""


# ---------------------------------------------------------------------------
# Simpson diversity of languages per source (exact rational)
# ---------------------------------------------------------------------------


def source_lang_simpson(sf_dir: str) -> ray.data.Dataset:
    """Per-source Simpson diversity of document languages →
    ``(source, n_docs, simpson_permille)`` with ``simpson = 1 −
    Σ nᵢ(nᵢ−1)/(N(N−1))`` in exact permille (the probability two
    random docs from the source differ in language) — the
    monolingual-feed detector a corpus-mix report runs: diversity ≈ 0
    flags a single-language source, complementing
    ``host_lang_entropy``'s micro-nat view with a fully RATIONAL
    statistic (no log quantization at all).

    Scale shape: one (source, lang) count exchange, then a per-source
    fold over ≤ |langs| rows each."""
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "lang"]
    )

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"source": b["source"], "lang": b["lang"], "n": np.ones(len(b), np.int64)}
        )

    by_lang = grouped_sum(
        ds.map_batches(ones, batch_format="pandas"), ["source", "lang"], ["n"]
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for source, grp in g.groupby("source", sort=False):
            ni = grp["n"].to_numpy(np.int64)
            n_total = int(ni.sum())
            same = int((ni * (ni - 1)).sum())
            simpson = (
                1000 - (1000 * same) // (n_total * (n_total - 1)) if n_total >= 2 else 0
            )
            rows.append((source, n_total, simpson))
        return pd.DataFrame(rows, columns=["source", "n_docs", "simpson_permille"]).astype(
            {"n_docs": "int64", "simpson_permille": "int64"}
        )

    return grouped_apply(by_lang, ["source"], fold, num_buckets=4)


SOURCE_LANG_SIMPSON_SQL = """
WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(CASE WHEN SUM(n) >= 2
                 THEN 1000 - (1000 * SUM(n * (n - 1))) // (SUM(n) * (SUM(n) - 1))
                 ELSE 0 END AS BIGINT) AS simpson_permille
FROM c GROUP BY source
"""


# ---------------------------------------------------------------------------
# Bag-of-words (word-order-insensitive) duplicate grouping
# ---------------------------------------------------------------------------


BOW_PLANT_MOD = 7
BOW_PHRASE = "bowdup shuffled nav footer template boilerplate block"


def derive_bow_corpus(b: "pd.DataFrame") -> "pd.DataFrame":
    """Carrier: every ``doc_id % 7 == 0`` doc becomes a ROTATED
    permutation of a fixed phrase plus a group token ``g<doc_id%5>`` —
    identical token multisets in different orders, the shuffled-
    boilerplate case exact-hash dedup misses. The oracle never needs
    the permutation (the key sorts), only the multiset."""
    out = b[["doc_id"]].copy()
    texts = []
    for doc_id, text in zip(b["doc_id"], b["text"]):
        d = int(doc_id)
        if d % BOW_PLANT_MOD == 0:
            toks = BOW_PHRASE.split(" ") + [f"g{d % 5}"]
            r = (d // BOW_PLANT_MOD) % len(toks)
            texts.append(" ".join(toks[r:] + toks[:r]))
        else:
            texts.append(text)
    out["text"] = texts
    return out


def bow_dedup_documents(sf_dir: str) -> ray.data.Dataset:
    """Word-order-insensitive duplicate groups over the (derived)
    corpus: key each doc by its SORTED token multiset and report groups
    of ≥ 2 → ``(n_docs, min_doc, n_tokens)`` — catches shuffled
    boilerplate (reordered nav/footer text, template variable
    reorderings) that exact-hash dedup misses and MinHash only finds
    probabilistically; the strictest of the cheap near-dup keys
    (multiset equality, not similarity).

    Scale shape: one exchange keyed by the sorted-token string (at
    100 TB the key would be its 16-byte hash, same as
    ``dedup_exact_documents``'s content-hash trade — the raw key here
    keeps the oracle exact); per-batch key building is local. Docs with
    zero tokens form one (empty-key) group, matching the oracle's
    COALESCE."""
    from pdf_extractor_ray.ops import grouped_agg

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(derive_bow_corpus, batch_format="pandas", batch_size=2048)

    def key(b: pd.DataFrame) -> pd.DataFrame:
        keys, ntok = [], []
        for text in b["text"]:
            toks = sorted(t for t in text.split(" ") if t)
            keys.append(" ".join(toks))
            ntok.append(len(toks))
        return pd.DataFrame(
            {
                "bow": pd.Series(keys, dtype="object"),
                "doc_id": b["doc_id"].astype("int64"),
                "n_tokens": pd.Series(ntok, dtype="int64"),
                "one": pd.Series(np.ones(len(b), np.int64)),
            }
        )

    groups = grouped_agg(
        ds.map_batches(key, batch_format="pandas", batch_size=2048),
        ["bow"],
        {"n_docs": ("one", "sum"), "min_doc": ("doc_id", "min"), "n_tokens": ("n_tokens", "min")},
    )

    def dups_only(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["n_docs"] >= 2, ["n_docs", "min_doc", "n_tokens"]].astype("int64")

    return groups.map_batches(dups_only, batch_format="pandas")


BOW_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % {BOW_PLANT_MOD} = 0
              THEN '{BOW_PHRASE}' || ' g' || (doc_id % 5)
              ELSE text END AS text
  FROM documents
),
t AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY w) AS bow, COUNT(*) AS n_tokens
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w FROM d)
  WHERE w != '' GROUP BY doc_id
),
k AS (
  SELECT d.doc_id, COALESCE(t.bow, '') AS bow, COALESCE(t.n_tokens, 0) AS n_tokens
  FROM d LEFT JOIN t USING (doc_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MIN(n_tokens) AS BIGINT) AS n_tokens
FROM k GROUP BY bow HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# Cross-source quantile normalization (distribution matching)
# ---------------------------------------------------------------------------


def quantile_normalize_documents(sf_dir: str) -> ray.data.Dataset:
    """Quantile-normalize document length ACROSS sources → ``(doc_id,
    n_chars, normalized_chars)`` where each doc's length is replaced by
    the GLOBAL length at its source-LOCAL percentile position
    (``gi = n_less_source · (N_global − 1) // (N_source − 1)``, strict-
    less rank, then the global order statistic at index ``gi``) — the
    microarray-style distribution matching a curation mix runs so
    per-source length filters compare like with like (source quirks in
    raw length vanish, order within a source is preserved).

    Scale shape: the rank functions are COUNT-PER-DISTINCT-VALUE tables
    (global: value-domain-bounded; per-source: sources × domain), both
    broadcast once; the global order statistic is answered by
    ``searchsorted`` on the cumulative counts — the N-sized sorted
    array is never materialized. Per-doc work is one vectorized lookup
    pass, zero per-row exchange."""
    import ray as _ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": b["source"],
                "v": b["n_chars"].astype("int64"),
                "m": np.ones(len(b), np.int64),
            }
        )

    sv = (
        grouped_sum(ds.map_batches(ones, batch_format="pandas"), ["source", "v"], ["m"])
        .to_pandas()  # sources × value-domain — bounded collect
        .sort_values(["source", "v"])
        .reset_index(drop=True)
    )
    # global cumulative counts (inclusive) over sorted distinct values
    gl = sv.groupby("v", as_index=False)["m"].sum().sort_values("v")
    g_vals = gl["v"].to_numpy(np.int64)
    g_cum = np.cumsum(gl["m"].to_numpy(np.int64))
    n_global = int(g_cum[-1])
    # per-source: value -> strict-less count, plus source sizes
    less_maps: dict = {}
    size_map: dict = {}
    for source, grp in sv.groupby("source", sort=False):
        m = grp["m"].to_numpy(np.int64)
        less = np.concatenate([[0], np.cumsum(m)[:-1]])
        less_maps[source] = dict(zip(grp["v"].astype(int), less.tolist()))
        size_map[source] = int(m.sum())
    ref = _ray.put((less_maps, size_map, g_vals, g_cum, n_global))

    def transform(b: pd.DataFrame) -> pd.DataFrame:
        lm, sm, gv, gc, ng = _cached_get(ref)
        gi = np.empty(len(b), np.int64)
        for i, (source, v) in enumerate(zip(b["source"], b["n_chars"])):
            ns = sm[source]
            less = lm[source][int(v)]
            gi[i] = (less * (ng - 1)) // (ns - 1) if ns >= 2 else 0
        # value at global index gi = first distinct value whose
        # inclusive cumulative count exceeds gi
        ix = np.searchsorted(gc, gi, side="right")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_chars": b["n_chars"].astype("int64"),
                "normalized_chars": gv[ix],
            }
        )

    return ds.map_batches(transform, batch_format="pandas")


QUANTILE_NORMALIZE_SQL = """
WITH n AS (SELECT COUNT(*) AS ng FROM documents),
loc AS (
  SELECT doc_id, n_chars,
         RANK() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS less_s,
         COUNT(*) OVER (PARTITION BY source) AS ns
  FROM documents
),
gidx AS (
  SELECT doc_id, n_chars,
         CASE WHEN ns >= 2 THEN (less_s * (n.ng - 1)) // (ns - 1) ELSE 0 END AS gi
  FROM loc, n
),
gsorted AS (
  SELECT n_chars AS v, ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS gi0
  FROM documents
)
SELECT g.doc_id, CAST(g.n_chars AS BIGINT) AS n_chars,
       CAST(gs.v AS BIGINT) AS normalized_chars
FROM gidx g JOIN gsorted gs ON gs.gi0 = g.gi
"""


# ---------------------------------------------------------------------------
# Token fertility by language (chars per token)
# ---------------------------------------------------------------------------


def token_fertility_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Per-language token FERTILITY → ``(lang, n_docs, sum_chars,
    sum_tokens, fertility_milli)`` with ``fertility_milli =
    1000·sum_chars // sum_tokens`` — the chars-per-token budget planner
    (how many bytes of corpus buy a training token varies ~2× across
    languages; mixture weights set in tokens need this table to convert
    from bytes). Whitespace tokens here; the BPE variant composes the
    same fold over ``bpe_token_counts``.

    One pre-aggregated exchange on lang; zero per-row state."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text", "n_chars"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ").map(lambda ts: sum(1 for t in ts if t))
        return pd.DataFrame(
            {
                "lang": b["lang"],
                "n_docs": np.ones(len(b), np.int64),
                "sum_chars": b["n_chars"].astype("int64"),
                "sum_tokens": toks.astype("int64"),
            }
        )

    agg = grouped_sum(
        ds.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["lang"],
        ["n_docs", "sum_chars", "sum_tokens"],
        num_buckets=2,
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["fertility_milli"] = (
            1000 * b["sum_chars"].to_numpy(np.int64)
            // np.maximum(b["sum_tokens"].to_numpy(np.int64), 1)
        )
        return b.astype({"fertility_milli": "int64"})

    return agg.map_batches(finalize, batch_format="pandas")


TOKEN_FERTILITY_SQL = """
WITH t AS (
  SELECT lang, n_chars,
         len(list_filter(regexp_split_to_array(text, ' '), x -> x != '')) AS n_tok
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       CAST(1000 * SUM(n_chars) // GREATEST(SUM(n_tok), 1) AS BIGINT)
         AS fertility_milli
FROM t GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Source token-distribution drift (exact L1 distance vs corpus)
# ---------------------------------------------------------------------------


def source_drift_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-source DRIFT of the token distribution vs the whole corpus →
    ``(source, n_tokens, drift_permille)`` with the exact L1 (total
    variation ×2) distance cross-multiplied to integers:
    ``D = Σ_t |c_{s,t}·T − c_t·T_s|`` and ``drift_permille =
    1000·D // (2·T_s·T)`` ∈ [0, 1000] — the two-sample screen a corpus
    monitor runs per ingest batch (a source whose unigram mix walks
    away from the corpus signals a template change or spam takeover).
    No division inside the sum, so no float and no micro-nat needed.

    Scale shape: one (source, token) exchange with per-batch pre-agg;
    the per-source fold joins the corpus-level counts, which are
    VOCAB-bounded and broadcast once."""
    import ray as _ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for source, grp in b.groupby("source", sort=False):
            tokens = grp["text"].str.split(" ").explode()
            tokens = tokens[tokens != ""]
            g = tokens.value_counts().reset_index()
            g.columns = ["token", "c"]
            g["c"] = g["c"].astype("int64")
            g["source"] = source
            outs.append(g)
        if not outs:
            return pd.DataFrame(
                {
                    "token": pd.Series(dtype="object"),
                    "c": pd.Series(dtype="int64"),
                    "source": pd.Series(dtype="object"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    st = grouped_sum(
        ds.map_batches(explode, batch_format="pandas", batch_size=4096),
        ["source", "token"],
        ["c"],
        two_level=True,
    ).materialize()

    corpus = (
        grouped_sum(st, ["token"], ["c"], num_buckets=2)
        .to_pandas()  # vocab-bounded
    )
    corpus_map = dict(zip(corpus["token"], corpus["c"].astype(int)))
    t_total = int(corpus["c"].sum())
    cref = _ray.put((corpus_map, t_total))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cm, t = _cached_get(cref)
        rows = []
        for source, grp in g.groupby("source", sort=False):
            cs = dict(zip(grp["token"], grp["c"].astype(int)))
            ts = sum(cs.values())
            d = 0
            for tok, c_all in cm.items():
                c_s = cs.get(tok, 0)
                d += abs(c_s * t - c_all * ts)
            rows.append((source, ts, (1000 * d) // (2 * ts * t) if ts else 0))
        return pd.DataFrame(rows, columns=["source", "n_tokens", "drift_permille"]).astype(
            {"n_tokens": "int64", "drift_permille": "int64"}
        )

    return grouped_apply(st, ["source"], fold, num_buckets=4)


SOURCE_DRIFT_SQL = """
WITH tok AS (
  SELECT source, unnest(regexp_split_to_array(text, ' ')) AS w FROM documents
),
t2 AS (SELECT * FROM tok WHERE w != ''),
cs AS (SELECT source, w, COUNT(*) AS c FROM t2 GROUP BY source, w),
call AS (SELECT w, COUNT(*) AS c FROM t2 GROUP BY w),
tot AS (SELECT COUNT(*) AS t FROM t2),
stot AS (SELECT source, COUNT(*) AS ts FROM t2 GROUP BY source),
grid AS (
  SELECT s.source, a.w, a.c AS c_all, COALESCE(cs.c, 0) AS c_s, s.ts, tot.t
  FROM stot s CROSS JOIN call a
  LEFT JOIN cs ON cs.source = s.source AND cs.w = a.w, tot
)
SELECT source, CAST(MAX(ts) AS BIGINT) AS n_tokens,
       CAST((1000 * SUM(abs(c_s * t - c_all * ts))) // (2 * MAX(ts) * MAX(t))
            AS BIGINT) AS drift_permille
FROM grid GROUP BY source
"""


# ---------------------------------------------------------------------------
# Pseudo-relevance-feedback query expansion (Rocchio-lite)
# ---------------------------------------------------------------------------

PRF_TERM = "hash"


def prf_expansion_documents(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Query EXPANSION by pseudo-relevance feedback for the seed term
    ``'hash'``: take the docs containing the term (the pseudo-relevant
    set), rank their OTHER tokens by lift vs the corpus →
    top-``k`` ``(token, n_rel, lift_milli)`` with ``lift_milli =
    1000·(c_rel·T) // (c_all·T_rel)`` (ties: token asc) — the
    zero-training expansion stage of a search stack (run the query,
    mine co-occurring terms, re-query).

    Scale shape: the relevant set is marked per batch (no join — the
    predicate is per-row), both token-count exchanges pre-aggregate per
    batch, the lift fold runs on the vocab-bounded tables."""
    import ray as _ray

    from pdf_extractor_ray.joins import _cached_get
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for text in b["text"]:
            toks = [t for t in text.split(" ") if t]
            rel = PRF_TERM in toks
            for t in toks:
                rows.append((t, 1, 1 if rel else 0))
        out = pd.DataFrame(rows, columns=["token", "c_all", "c_rel"])
        g = out.groupby("token", as_index=False).sum()
        return g.astype({"c_all": "int64", "c_rel": "int64"})

    counts = (
        grouped_sum(
            ds.map_batches(explode, batch_format="pandas", batch_size=4096),
            ["token"],
            ["c_all", "c_rel"],
            two_level=True,
        )
        .to_pandas()  # vocab-bounded
    )
    t_all = int(counts["c_all"].sum())
    t_rel = int(counts["c_rel"].sum())
    out = counts[(counts["c_rel"] > 0) & (counts["token"] != PRF_TERM)].copy()
    out["lift_milli"] = (
        1000 * out["c_rel"].astype(np.int64) * t_all
        // (out["c_all"].astype(np.int64) * t_rel)
    )
    out = out.rename(columns={"c_rel": "n_rel"})[["token", "n_rel", "lift_milli"]]
    out = out.astype({"n_rel": "int64", "lift_milli": "int64"})
    return (
        out.sort_values(["lift_milli", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


PRF_EXPANSION_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w FROM documents
),
t2 AS (SELECT * FROM tok WHERE w != ''),
rel AS (SELECT DISTINCT doc_id FROM t2 WHERE w = '{PRF_TERM}'),
ca AS (SELECT w, COUNT(*) AS c_all FROM t2 GROUP BY w),
cr AS (
  SELECT w, COUNT(*) AS c_rel FROM t2 JOIN rel USING (doc_id) GROUP BY w
),
tots AS (
  SELECT (SELECT COUNT(*) FROM t2) AS t_all,
         (SELECT COUNT(*) FROM t2 JOIN rel USING (doc_id)) AS t_rel
)
SELECT ca.w AS token, CAST(cr.c_rel AS BIGINT) AS n_rel,
       CAST(1000 * cr.c_rel * tots.t_all // (ca.c_all * tots.t_rel) AS BIGINT)
         AS lift_milli
FROM cr JOIN ca USING (w), tots
WHERE ca.w != '{PRF_TERM}'
ORDER BY lift_milli DESC, token LIMIT 10
"""


# ---------------------------------------------------------------------------
# Token concentration (Herfindahl index per doc)
# ---------------------------------------------------------------------------


def token_hhi_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-doc Herfindahl-Hirschman token concentration →
    ``(doc_id, n_tokens, hhi_permille)`` with ``hhi_permille =
    1000·Σ cᵢ² // T²`` over the doc's token counts — the exact-rational
    repetition screen next to token entropy (HHI → 1000 means one token
    dominates: keyword stuffing, stuck templates; ≈ 1000/T means fully
    diverse). Pure per-row batch work, zero shuffle."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def analyze(b: pd.DataFrame) -> pd.DataFrame:
        ids, nt, hhi = [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            toks = [t for t in text.split(" ") if t]
            if not toks:
                continue
            _, counts = np.unique(toks, return_counts=True)
            t = int(counts.sum())
            ids.append(int(doc_id))
            nt.append(t)
            hhi.append(int(1000 * int((counts.astype(np.int64) ** 2).sum()) // (t * t)))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_tokens": pd.Series(nt, dtype="int64"),
                "hhi_permille": pd.Series(hhi, dtype="int64"),
            }
        )

    return ds.map_batches(analyze, batch_format="pandas", batch_size=4096)


TOKEN_HHI_SQL = """
WITH c AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w FROM documents)
  WHERE w != '' GROUP BY doc_id, w
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(1000 * SUM(c * c) // (SUM(c) * SUM(c)) AS BIGINT) AS hhi_permille
FROM c GROUP BY doc_id
"""
