"""Round-4 regression tests: tfidf adaptive df-attach plan identity,
full-whitespace trim parity for every tokenizing oracle, null-key
group handling, heavy-hitter guarantee enforcement, cluster-sized
bucket defaults."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tests.conftest import SF_DIR
from tools.check_oracle import value_hash


def _doc_view(con, d):
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")


def test_tfidf_join_plan_matches_broadcast_and_oracle():
    """broadcast_limit=0 forces the distributed df-attach (hash join on
    word + doc_id re-co-location) — row-identical to the broadcast fast
    path AND to the DuckDB oracle, at the default top_k and a
    non-default one (the SQL interpolates top_k — ADVICE r3)."""
    from pdf_extractor_ray.pipelines import textops

    con = duckdb.connect()
    _doc_view(con, SF_DIR)
    for k in (textops.TFIDF_TOP_K, 5):
        oracle = con.execute(textops.tfidf_sql(k)).df()
        bro = textops.tfidf_top_terms(SF_DIR, top_k=k).to_pandas()
        jo = textops.tfidf_top_terms(SF_DIR, top_k=k, broadcast_limit=0).to_pandas()
        assert len(bro) == len(jo) == len(oracle)
        assert value_hash(bro) == value_hash(oracle), f"broadcast plan, top_k={k}"
        assert value_hash(jo) == value_hash(oracle), f"join plan, top_k={k}"
    assert textops.TFIDF_SQL == textops.tfidf_sql()


def test_tab_bounded_docs_match_tokenizing_oracles(tmp_path):
    """Tab-/newline-bounded documents: Python str.split() ignores
    leading/trailing whitespace of ANY kind, but DuckDB's bare trim()
    strips spaces only — phantom empty tokens / nonzero n_words in SQL
    (ADVICE r3). Every tokenizing oracle now uses the shared
    trim_ws_sql; this fixture plants exactly the divergent docs."""
    from pdf_extractor_ray.pipelines import corpus, invindex, textops, training

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3, 4, 5, 6], dtype="int64"),
            "text": [
                "\tleading tab words\t",
                "\n\nnewline bounded body\n",
                "\t",  # whitespace-only: must count as EMPTY in SQL too
                "",
                "plain data spark window data words",
                " \t\r\n mixed \v\f bounded \t ",
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(docs), str(d / "documents.parquet"))
    con = duckdb.connect()
    _doc_view(con, d)

    def _training_examples(sf_dir):
        import os

        ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        ex = training.validate_examples(training.build_training_examples(ds))
        return ex.select_columns(["example_id", "valid", "error"])

    pairs = [
        (textops.doc_token_stats, textops.DOC_TOKEN_STATS_SQL),
        (textops.gopher_quality_rules, textops.GOPHER_RULES_SQL),
        (textops.tfidf_top_terms, textops.TFIDF_SQL),
        (corpus.chunk_documents, corpus.CHUNK_SQL),
        (invindex.inverted_index_postings, invindex.INVINDEX_SQL),
        (_training_examples, training.TRAINING_EXAMPLES_SQL),
        (corpus.curation_funnel, corpus.CURATION_FUNNEL_SQL),
    ]
    for ray_fn, sql in pairs:
        got = ray_fn(str(d))
        got = got.to_pandas() if isinstance(got, ray.data.Dataset) else got
        exp = con.sql(sql).df()
        assert len(got) == len(exp), ray_fn.__name__
        assert sorted(got.columns) == sorted(exp.columns), ray_fn.__name__
        assert value_hash(got) == value_hash(exp), ray_fn.__name__

    # the whitespace-only doc really IS empty on both sides
    stats = textops.doc_token_stats(str(d)).to_pandas().set_index("doc_id")
    assert stats.loc[3, "n_tokens_ws"] == 0 and stats.loc[4, "n_tokens_ws"] == 0
