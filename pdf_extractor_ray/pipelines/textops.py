"""Text-analysis pipelines over the documents table: token stats,
language ID, quality scoring, fingerprinting — the per-document batch
transforms a training-data pipeline composes (filter-by-quality,
route-by-language, near-dup keying)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

from pdf_extractor_ray.kernels import hashing, textstats


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


DOC_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_text,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE array_length(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens_ws
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


def quality_documents(sf_dir: str) -> ray.data.Dataset:
    """Quality features + scalar score per document."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        feats = b["text"].map(textstats.quality_stats)
        out = pd.DataFrame(list(feats))
        out.insert(0, "doc_id", b["doc_id"].to_numpy())
        out["quality"] = b["text"].map(textstats.quality_score).to_numpy()
        return out

    return ds.map_batches(score, batch_format="pandas", batch_size=4096)


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
