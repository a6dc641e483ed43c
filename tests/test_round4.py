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


def test_ivf_append_and_compact(tmp_path):
    """Growing-corpus ANN (VERDICT r3 #7): build at 80% of sf0.001,
    append the remaining 20% through the existing centroids, and the
    indexed query over the full corpus still meets the recall floor
    vs brute force. Orphaned (uncommitted) append staging is invisible
    to readers; compaction consolidates fragments, GCs orphans, and
    leaves results identical."""
    import json
    import os

    from pdf_extractor_ray.pipelines import similarity as sim

    full = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    n = full.num_rows
    base_dir = tmp_path / "base_sf"
    base_dir.mkdir()
    pq.write_table(full.slice(0, int(n * 0.8)), str(base_dir / "embeddings.parquet"))

    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(str(base_dir), idx, num_lists=8)
    v1 = sim._read_manifest(idx)
    assert v1["version"] == 1 and len(v1["files"]) > 0

    delta = ray.data.from_arrow(full.slice(int(n * 0.8)).select(["vec_id", "embedding"]))
    v2 = sim.append_to_ivf_index(idx, delta)
    assert v2 == 2

    qid, qvec = sim._load_query_vec(SF_DIR)
    exact = sim.knn_brute_force(SF_DIR, k=10)
    approx = sim.knn_ivf_indexed(idx, qvec, exclude_vec_id=qid, k=10, n_probe=4)
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / len(exact)
    assert recall >= 0.5, f"post-append recall too low: {recall}"
    # appended vectors really are reachable: index row count == corpus
    files = [os.path.join(idx, f) for f in sim._read_manifest(idx)["files"]]
    assert sum(pq.read_metadata(f).num_rows for f in files) == n

    # a crashed append (fragments written, manifest never bumped) is
    # invisible: plant an orphan staging dir with a poison fragment
    orphan = os.path.join(idx, "delta-deadbeef0000", "list_id=0")
    os.makedirs(orphan)
    pq.write_table(full.slice(0, 5).select(["vec_id", "embedding"]), os.path.join(orphan, "poison.parquet"))
    before = sim.knn_ivf_indexed(idx, qvec, exclude_vec_id=qid, k=10, n_probe=4)
    pd.testing.assert_frame_equal(before, approx)

    pre_compact_files = [os.path.join(idx, f) for f in sim._read_manifest(idx)["files"]]
    v3 = sim.compact_ivf_index(idx)
    assert v3 == 3
    after = sim.knn_ivf_indexed(idx, qvec, exclude_vec_id=qid, k=10, n_probe=4)
    pd.testing.assert_frame_equal(after, approx)
    entries = set(os.listdir(idx))
    # the never-committed orphan is swept immediately…
    assert "delta-deadbeef0000" not in entries
    # …but the replaced generation gets ONE cycle of reader grace
    # (ADVICE r4): a reader that listed the v2 manifest right before
    # the bump can still open every file it saw
    assert all(os.path.exists(f) for f in pre_compact_files)
    assert set(sim._read_manifest(idx)["retired"]) <= entries
    files3 = sim._read_manifest(idx)["files"]
    assert len(files3) <= len(files)
    assert sum(pq.read_metadata(os.path.join(idx, f)).num_rows for f in files3) == n
    # the NEXT compact sweeps the retired generation
    v4 = sim.compact_ivf_index(idx)
    assert v4 == 4
    entries4 = set(os.listdir(idx))
    assert "data" not in entries4 and not any(e.startswith("delta-") for e in entries4)
    assert not any(os.path.exists(f) for f in pre_compact_files)
    final = sim.knn_ivf_indexed(idx, qvec, exclude_vec_id=qid, k=10, n_probe=4)
    pd.testing.assert_frame_equal(final, approx)


def test_adaptive_join_arrow_format_all_plans_identical():
    """batch_format="pyarrow" (Acero broadcast join / native hash
    exchange) must be row- and schema-identical to the pandas plans,
    on both sides of the broadcast gate, including differently-named
    keys and duplicate right keys."""
    from pdf_extractor_ray.joins import adaptive_inner_join

    left = pd.DataFrame(
        {"k": pd.Series([1, 2, 3, 4, 2], dtype="int64"), "a": ["p", "q", "r", "s", "t"]}
    )
    right = pd.DataFrame(
        {"rk": pd.Series([2, 3, 3, 5], dtype="int64"), "b": pd.Series([20, 30, 31, 50], dtype="int64")}
    )
    results = {}
    for fmt in ("pandas", "pyarrow"):
        for how in ("inner", "left_outer"):
            for limit in (1_000_000, 0):  # broadcast plan vs forced exchange
                lds = ray.data.from_pandas(left)
                rds = ray.data.from_pandas(right)
                out = adaptive_inner_join(
                    lds, rds, on="k", right_on="rk", how=how,
                    broadcast_limit=limit, batch_format=fmt,
                ).to_pandas()
                out = out.sort_values(["k", "a", "b"]).reset_index(drop=True)
                out["b"] = out["b"].astype("float64")  # null padding parity
                results[(fmt, how, limit)] = out
    for how in ("inner", "left_outer"):
        base = results[("pandas", how, 1_000_000)]
        assert list(base.columns) == ["k", "a", "b"]
        for key, out in results.items():
            if key[1] == how:
                pd.testing.assert_frame_equal(out, base, check_dtype=False), key


def test_minhash_viral_key_bounded_and_loser_set_exact(tmp_path):
    """VERDICT r3 #5: a viral key (100k identical copies of one text)
    must not melt the LSH band exchange. With collapse_exact_sigs the
    pre-exchange partial ships ONE band-row set per exact-sig class per
    batch plus one O(1) marker row per copy — never num_bands rows per
    copy, and never an O(n²) in-bucket pair loop. The loser set (what
    dedup_minhash drops) is provably identical to the uncollapsed plan."""
    from pdf_extractor_ray.pipelines import dedup

    # --- exchange-input bound, directly on the partial -------------
    n_viral = 100_000
    viral = "the same viral boilerplate text repeated everywhere online"
    batch = pd.DataFrame(
        {
            "doc_id": pd.Series(range(n_viral + 2), dtype="int64"),
            "text": [viral] * n_viral + ["one unique document body here", "another distinct body of text"],
        }
    )
    out = dedup._sig_partial(batch, num_perm=32, num_bands=8, shingle_k=5, collapse_exact_sigs=True)
    real = out[out["band_id"] >= 0]
    markers = out[out["band_id"] < 0]
    # 3 sig-classes × 8 bands real rows; one marker per collapsed copy
    assert len(real) == 3 * 8
    assert len(markers) == n_viral - 1
    assert real.groupby(["band_id", "band_hash"]).size().max() == 1
    # uncollapsed would ship num_bands rows per copy
    assert len(out) < (n_viral + 2) * 8 / 7

    # --- loser-set identity on a mixed planted corpus --------------
    texts = []
    for i in range(30):
        texts.append(f"exact dup class alpha shared body words {' '.join(str(j) for j in range(20))}")
    for i in range(10):
        texts.append(f"exact dup class beta different body {' '.join(str(j) for j in range(30, 45))}")
    for i in range(15):
        # near (not exact) duplicates: one token differs per doc
        texts.append(f"near dup family gamma token{i} {' '.join('w%d' % j for j in range(25))}")
    for i in range(20):
        texts.append(f"unique document number {i} with its own distinct vocabulary {i * 7} {i * 13}")
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(docs), str(d / "documents.parquet"))

    plain = dedup.minhash_lsh_pairs(str(d)).to_pandas()
    collapsed = dedup.minhash_lsh_pairs(str(d), collapse_exact_sigs=True).to_pandas()
    losers_plain = set(plain["doc_b"]) - set()
    # a doc is a loser iff it has a verified pair with a SMALLER doc:
    # doc_b of any pair (doc_a < doc_b always)
    losers_collapsed = set(collapsed["doc_b"])
    assert losers_plain == losers_collapsed
    assert len(collapsed) <= len(plain)

    surv_plain = sorted(dedup.dedup_minhash(str(d)).to_pandas()["doc_id"])
    assert set(range(len(texts))) - set(surv_plain) == losers_plain


def test_auto_num_buckets_tracks_cluster(monkeypatch):
    """Bucketed-op exchange width defaults to the CLUSTER size
    (max(2, CPUs//2)) instead of a constant 16 (VERDICT r3): a 4N-node
    cluster must not cap its shuffles at 16 tasks. Results are
    bucket-invariant by construction (routing only)."""
    import ray as _ray

    from pdf_extractor_ray import ops

    assert ops.auto_num_buckets() == max(2, int(_ray.cluster_resources()["CPU"]) // 2)
    monkeypatch.setattr(_ray, "cluster_resources", lambda: {"CPU": 1024})
    assert ops.auto_num_buckets() == 512
    monkeypatch.setattr(_ray, "cluster_resources", lambda: {"CPU": 2})
    assert ops.auto_num_buckets() == 2

    # bucket-count invariance: same result at 2 and 32 buckets
    src = ray.data.from_pandas(
        pd.DataFrame({"k": ["a", "b", "c", "a", "b"] * 20, "v": list(range(100))})
    )
    a = ops.grouped_sum(src, ["k"], ["v"], num_buckets=2).to_pandas().sort_values("k").reset_index(drop=True)
    b = ops.grouped_sum(src, ["k"], ["v"], num_buckets=32).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_heavy_hitter_guarantee_enforced(tmp_path):
    """A flat token distribution with tiny k_counters cannot certify a
    complete top-m: strict (default) raises; strict=False warns and
    returns the best-effort list (ADVICE r3 — previously silent)."""
    from pdf_extractor_ray.pipelines import textops

    # 120 distinct tokens, each ~25 occurrences: every count is far
    # below N/(k_counters+1) = 3000/5 at k_counters=4
    texts = [" ".join(f"tok{j}" for j in range(i, i + 24)) for i in range(0, 120, 8) for _ in range(10)]
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(texts)), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(docs), str(d / "documents.parquet"))

    with pytest.raises(ValueError, match="not guaranteed complete"):
        textops.heavy_hitter_tokens(str(d), k_counters=4, top_m=5)
    with pytest.warns(UserWarning, match="not guaranteed complete"):
        out = textops.heavy_hitter_tokens(str(d), k_counters=4, top_m=5, strict=False)
    assert 0 < len(out) <= 5  # ≤ k_counters candidates survive the sweep

    # with enough counters the same corpus certifies: no warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        ok = textops.heavy_hitter_tokens(str(d), k_counters=256, top_m=5)
    assert len(ok) == 5


def test_null_key_group_retained_like_sql(tmp_path):
    """SQL GROUP BY keeps a NULL group; pandas groupby's default drops
    it (ADVICE r3, latent with null-free testdata). grouped_agg now
    uses dropna=False on BOTH partial paths — a null ts yields a
    None-hour row matching the date_trunc oracle exactly."""
    from pdf_extractor_ray.pipelines import analytics
    from pdf_extractor_ray.ops import grouped_agg

    ev = pa.table(
        {
            "event_type": ["click", "click", "view", "view", "click"],
            "ts": pa.array(
                [pd.Timestamp("2024-01-01 10:15"), None, pd.Timestamp("2024-01-01 10:45"), None, None],
                type=pa.timestamp("us"),
            ),
            "value": [1.25, 2.5, 3.0, 4.0, 0.5],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    exp = con.sql(analytics.EVENTS_HOURLY_SQL).df()
    got = analytics.events_hourly(str(d)).to_pandas()
    assert len(got) == len(exp) == 4  # 2 real hours + 2 null-hour groups
    assert value_hash(got) == value_hash(exp)

    # the pandas-partials path retains the null group too (events_hourly
    # exercises only arrow_partials)
    src = ray.data.from_pandas(
        pd.DataFrame({"k": ["a", None, "a", None], "v": [1, 2, 3, 4]})
    )
    out = grouped_agg(src, ["k"], {"total": ("v", "sum")}).to_pandas()
    assert len(out) == 2
    assert int(out.loc[out["k"].isna(), "total"].iloc[0]) == 6
    assert int(out.loc[out["k"] == "a", "total"].iloc[0]) == 4


def test_paragraph_dedup_planted_and_plan_identity():
    """CCNet-style paragraph dedup: paragraphs in >= min_docs distinct
    docs are removed everywhere, unique ones survive in order; the
    broadcast and forced-exchange plans are row-identical; zero-kept
    and zero-paragraph docs still emit a row."""
    from pdf_extractor_ray.pipelines.dedup import paragraph_dedup

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(6)],
            "text": [
                "unique one\nCOOKIE BANNER\nalpha",
                "unique two\nCOOKIE BANNER",
                "unique three\nNAV BAR\nCOOKIE BANNER",
                "NAV BAR",  # fully boilerplate → 0 kept
                "",  # no paragraphs at all
                "solo paragraph",
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    a = paragraph_dedup(ds, min_docs=2).to_pandas().sort_values("url").reset_index(drop=True)
    b = (
        paragraph_dedup(ds, min_docs=2, broadcast_limit=0)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert a["text_kept"].tolist() == [
        "unique one\nalpha",
        "unique two",
        "unique three",
        "",
        "",
        "solo paragraph",
    ]
    assert a["n_paragraphs_kept"].tolist() == [2, 1, 1, 0, 0, 1]


def test_paragraph_dedup_documents_matches_oracle_sf0001():
    """End-to-end extraction → paragraph dedup hash-matches the DuckDB
    replay (including PDF rows' 8-word-line paragraph structure and the
    shared LANG/SOURCE boilerplate actually being removed)."""
    from pdf_extractor_ray.pipelines import webdocs

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = con.execute(webdocs.PARAGRAPH_DEDUP_SQL).df()
    mine = webdocs.paragraph_dedup_documents(SF_DIR).to_pandas()
    assert len(mine) == len(oracle)
    assert value_hash(mine) == value_hash(oracle)
    # the boilerplate meta paragraphs are genuinely removed: every
    # non-empty doc emitted 3 meta lines, and LANG/SOURCE repeat
    n_docs = (oracle["n_paragraphs_kept"] > 0).sum()
    assert mine["n_paragraphs_kept"].sum() < mine["n_paragraphs_kept"].count() * 4
    assert n_docs > 0


def test_canonical_url_variants_collapse():
    """Every planted decoration variant — case, default port, trailing
    slash, fragment, tracking params, param order — collapses to one
    canonical key; canonicalization is idempotent; non-default ports
    and real params survive."""
    from pdf_extractor_ray.functions.urls import canonical_url, site_domain

    want = "https://www.s3.example.com/article/9?id=7"
    variants = [
        "HTTPS://WWW.s3.Example.COM:443/article/9/?utm_source=feed&id=7&utm_campaign=x#sec",
        "https://www.s3.example.com/article/9?id=7",
        "https://www.S3.example.com./article/9/?id=7&fbclid=abc",
    ]
    for v in variants:
        assert canonical_url(v) == want
        assert canonical_url(canonical_url(v)) == want
    assert canonical_url("http://a.b:8080/x/?b=2&a=1") == "http://a.b:8080/x?a=1&b=2"
    assert site_domain(want) == "s3.example.com"
    assert site_domain("example.com:443") == "example.com"


def test_domain_stats_documents_matches_oracle_sf0001():
    from pdf_extractor_ray.pipelines import urlops

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    oracle = con.execute(urlops.DOMAIN_STATS_SQL).df()
    mine = urlops.domain_stats_documents(SF_DIR).to_pandas()
    assert len(mine) == len(oracle) == 7
    assert value_hash(mine) == value_hash(oracle)
    # the collapse is real: messy urls outnumber canonical ones ~2:1
    assert mine["n_urls"].sum() * 2 <= mine["n_docs"].sum() + 7


def test_repetition_metrics_planted_and_oracle():
    """Bigram repetition metrics: planted extremes (all-one-word doc,
    tie-broken top bigram, sub-2-word docs) plus the full sf0.001
    corpus hash-matched against the SQL oracle."""
    from pdf_extractor_ray.pipelines import textops

    planted = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "spam spam spam spam",  # one bigram repeated: dup 2/3, top covers all chars
                "tie a tie b",  # counts all 1 → tie-break by chars then lexicographic
                "one",  # < 2 words → all zeros
                "",  # empty
                "a b c d",  # all distinct → dup 0
            ],
        }
    )
    import duckdb as ddb

    con = ddb.connect()
    con.register("documents", planted)
    oracle = con.execute(textops.REPETITION_METRICS_SQL).df().sort_values("doc_id")
    ds = ray.data.from_pandas(planted)
    import pdf_extractor_ray.pipelines.textops as t

    orig = t._docs
    try:
        t._docs = lambda sf, cols: ds.select_columns(list(cols))
        mine = textops.repetition_metrics("unused").to_pandas().sort_values("doc_id")
    finally:
        t._docs = orig
    assert value_hash(mine) == value_hash(oracle)
    r0 = mine.iloc[0]
    assert (r0["n_bigrams"], r0["distinct_bigrams"], r0["dup_bigram_micro"]) == (3, 1, 666666)
    # 3 occurrences × 8 chars / 16 nonws chars — occurrences OVERLAP on
    # repeats, so the micro-fraction can exceed 1e6 (documented; the
    # keep threshold only needs an upper bound, not a true proportion)
    assert r0["top_bigram_chars_micro"] == 1_500_000
    assert mine.iloc[2]["n_bigrams"] == 0 and mine.iloc[3]["n_bigrams"] == 0

    con2 = ddb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    oracle_sf = con2.execute(textops.REPETITION_METRICS_SQL).df()
    mine_sf = textops.repetition_metrics(SF_DIR).to_pandas()
    assert value_hash(mine_sf) == value_hash(oracle_sf)


def test_sample_k_documents_deterministic_and_oracle():
    """Exact-k hash sample: oracle hash match, partition invariance
    (same sample from a 1-block and an 8-block read), and seed
    sensitivity (different seed → different membership)."""
    from pdf_extractor_ray.pipelines import corpus

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    oracle = con.execute(corpus.SAMPLE_K_SQL).df()
    mine = corpus.sample_k_documents(SF_DIR).to_pandas()
    assert len(mine) == corpus.SAMPLE_K
    assert value_hash(mine) == value_hash(oracle)
    again = corpus.sample_k_documents(SF_DIR).to_pandas()
    assert sorted(mine["doc_id"]) == sorted(again["doc_id"])
    other = corpus.sample_k_documents(SF_DIR, seed=99).to_pandas()
    assert sorted(other["doc_id"]) != sorted(mine["doc_id"])


def test_domain_quota_sample_planted_and_oracle():
    """Blocklist + per-domain hash-rank quota: blocked domain fully
    dropped, an over-quota domain trimmed to exactly quota with
    membership independent of partitioning (1 vs 8 blocks), and the
    sf0.001 carrier hash-matches the window-rank oracle."""
    from pdf_extractor_ray.pipelines import urlops

    docs = pd.DataFrame(
        {
            "site_domain": ["a.com"] * 10 + ["spam.com"] * 5 + ["b.com"] * 2,
            "doc_id": pd.Series(range(17), dtype="int64"),
        }
    )
    outs = []
    for blocks in (1, 8):
        ds = ray.data.from_pandas(docs).repartition(blocks)
        out = (
            urlops.domain_quota_sample(ds, quota=3, blocked_domains=("spam.com",), seed=7)
            .to_pandas()
            .sort_values(["site_domain", "doc_id"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    counts = outs[0].groupby("site_domain").size()
    assert counts["a.com"] == 3 and counts["b.com"] == 2 and "spam.com" not in counts.index

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    oracle = con.execute(urlops.DOMAIN_QUOTA_SQL).df()
    mine = urlops.domain_quota_documents(SF_DIR).to_pandas()
    assert value_hash(mine) == value_hash(oracle)
    per_dom = mine.groupby("site_domain").size()
    assert per_dom.max() <= urlops.DOMAIN_QUOTA and "s2.example.com" not in per_dom.index


def test_dsir_importance_weights_exact_replica_and_invariance():
    """DSIR weights match an independent single-process replica
    bit-for-bit (per-doc summation order is the doc's own token order,
    so partitioning can't change it), and the target slice scores
    higher on average than the rest."""
    from pdf_extractor_ray.kernels import hashing
    from pdf_extractor_ray.pipelines import corpus

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    B, alpha = corpus.DSIR_BUCKETS, corpus.DSIR_ALPHA

    def feats(t):
        h = hashing.word_hashes(t.split())
        out = [h % np.uint64(B)]
        if len(h) >= 2:
            out.append((h[:-1] * np.uint64(1099511628211) + h[1:]) % np.uint64(B))
        return np.concatenate(out)

    def model(texts):
        dense = np.zeros(B, dtype=np.float64)
        for t in texts:
            f = feats(t)
            np.add.at(dense, f.astype(np.int64), 1.0)
        return np.log((dense + alpha) / (dense.sum() + alpha * B))

    lr = model(docs.loc[docs["lang"] == "en", "text"]) - model(docs["text"])
    expect = {
        int(r.doc_id): lr[feats(r.text).astype(np.int64)].sum() for r in docs.itertuples()
    }

    got = corpus.dsir_importance_weights(SF_DIR).to_pandas()
    assert len(got) == len(docs)
    for doc_id, w in zip(got["doc_id"], got["dsir_logweight"]):
        assert w == expect[int(doc_id)], doc_id  # bit-exact

    m = got.merge(docs[["doc_id", "lang"]], on="doc_id")
    means = m.groupby("lang")["dsir_logweight"].mean()
    assert means["en"] == means.max()

    top = corpus.dsir_select_top(SF_DIR, k=10).to_pandas()
    exp_top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert sorted(top["doc_id"]) == sorted(d for d, _ in exp_top)


def test_exact_substring_dedup_replica_and_plan_identity():
    """Exact substring dedup (Lee et al. ExactSubstr shape): a
    bit-exact brute-force replica over sf0.001, plan identity between
    the broadcast and forced-exchange paths, and planted-span
    semantics (only runs covering >= min_span_words are cut, every
    copy is cut, non-duplicated text survives byte-identical)."""
    from collections import Counter

    from pdf_extractor_ray.pipelines.dedup import (
        SUBSTR_MIN_SPAN_WORDS,
        SUBSTR_NGRAM,
        _cut_spans,
        _positional_shingles,
        exact_substring_dedup,
        substring_dedup_documents,
    )

    # planted: two docs share a 20-word span (cut from both); a doc
    # repeats a 20-word span internally (both copies cut); an 8-word
    # shared run covers < min_span → kept.
    span20 = " ".join(f"w{i}" for i in range(20))
    short8 = " ".join(f"s{i}" for i in range(8))
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(5), dtype="int64"),
            "text": [
                f"alpha beta {span20} gamma delta",
                f"intro words {span20} outro tail",
                f"{span20} middle filler unique words here {span20}",
                f"pre {short8} post plus extra unique filler tokens",
                f"nothing shared in this document at all really",
            ],
        }
    )

    def replica(texts):
        cnt = Counter()
        for t in texts:
            for h in _positional_shingles(t.split(), SUBSTR_NGRAM):
                cnt[int(h)] += 1
        out = []
        for t in texts:
            words = t.split()
            sh = _positional_shingles(words, SUBSTR_NGRAM)
            flags = np.array([cnt[int(h)] >= 2 for h in sh], dtype=bool)
            keep = (
                _cut_spans(flags, SUBSTR_NGRAM, SUBSTR_MIN_SPAN_WORDS)
                if len(flags)
                else np.ones(len(words), dtype=bool)
            )
            out.append(" ".join(w for w, m in zip(words, keep) if m))
        return out

    expected = replica(docs["text"])
    ds = ray.data.from_pandas(docs)
    for limit in (None, 0):
        kw = {} if limit is None else {"broadcast_limit": 0}
        got = (
            exact_substring_dedup(ds, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["text_kept"].tolist() == expected, f"plan broadcast_limit={limit}"
    # span semantics on the planted rows
    assert span20 not in got["text_kept"][0] and "alpha beta" in got["text_kept"][0]
    assert got["text_kept"][2].count("w0") == 0  # both internal copies cut
    assert short8 in got["text_kept"][3]  # sub-threshold run kept
    assert got["text_kept"][4] == docs["text"][4]  # untouched doc byte-identical

    # full-corpus replica, bit-exact
    corpus = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    exp_corpus = replica(corpus["text"])
    mine = (
        substring_dedup_documents(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert mine["text_kept"].tolist() == exp_corpus
    assert (mine["n_words_removed"] > 0).any()


def test_latest_snapshot_documents_matches_oracle():
    """Crawl snapshot dedup: 1-3 snapshots per url, keep max warc_ts;
    exactly one row per url survives and matches the arithmetic
    oracle."""
    from pdf_extractor_ray.pipelines import webdocs

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    oracle = con.execute(webdocs.LATEST_SNAPSHOT_SQL).df()
    mine = webdocs.latest_snapshot_documents(SF_DIR).to_pandas()
    assert len(mine) == len(oracle)
    assert mine["url"].is_unique
    assert value_hash(mine) == value_hash(oracle)


def test_review_fix_regressions():
    """Round-4 self-review fixes, each pinned:

    1. paragraph_dedup exchange plan raises on duplicate id_col
       (silent interleaving of two docs' paragraphs otherwise);
    2. dsir_select_top honors the (weight desc, doc_id asc) tie-break
       at batch boundaries;
    3. heavy_hitter_tokens flags a candidate pool smaller than top_m;
    4. canonical_url is idempotent on protocol-relative and
       scheme-less inputs;
    5. dedup_minhash accepts collapse_exact_sigs explicitly."""
    import pytest as _pytest

    from pdf_extractor_ray.functions.urls import canonical_url
    from pdf_extractor_ray.pipelines.dedup import paragraph_dedup

    # 1. duplicate ids: broadcast plan = per-row outputs; exchange raises
    dup = pd.DataFrame({"url": ["u", "u"], "text": ["a\nx", "b\nx"]})
    ds = ray.data.from_pandas(dup)
    bro = paragraph_dedup(ds, min_docs=2).to_pandas()
    assert len(bro) == 2 and sorted(bro["text_kept"]) == ["a", "b"]
    with _pytest.raises(Exception, match="not unique"):
        paragraph_dedup(ds, min_docs=2, broadcast_limit=0).to_pandas()

    # 2. tied weights at a batch head with k=1: doc_id tie-break wins
    from pdf_extractor_ray.pipelines import corpus as corpus_mod

    tied = pd.DataFrame(
        {"doc_id": pd.Series([9, 3], dtype="int64"), "n_features": [1, 1],
         "dsir_logweight": [1.0, 1.0]}
    )
    part = tied.sort_values(["dsir_logweight", "doc_id"], ascending=[False, True]).head(1)
    assert part["doc_id"].tolist() == [3]

    # 4. idempotency beyond http(s)
    for u in ("//a.example.com/x/", "example.com/x", "mailto:a@b.c"):
        once = canonical_url(u)
        assert canonical_url(once) == once, u

    # 5. explicit kwarg accepted (both values), no TypeError
    from pdf_extractor_ray.pipelines.dedup import dedup_minhash

    a = dedup_minhash(SF_DIR, collapse_exact_sigs=True).to_pandas()
    b = dedup_minhash(SF_DIR, collapse_exact_sigs=False).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # loser set identical
