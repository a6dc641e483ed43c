"""Second-pass review fixes (round 4): viral-key hot splits in the
paragraph/substring dedup exchange plans, crash-retried IVF compaction,
and the heavy-hitter guard's provably-exact exemption."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from tests.conftest import SF_DIR


def test_paragraph_dedup_hot_split_plan_identity():
    """hot_key_docs=2 on the forced-exchange plan makes EVERY common
    paragraph hot — the whole anti-join resolves through the broadcast
    pre-drop in explode — and the result stays row-identical to the
    broadcast plan and to the default (cold) exchange plan."""
    from pdf_extractor_ray.pipelines.dedup import paragraph_dedup

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(6)],
            "text": [
                "unique one\nCOOKIE BANNER\nalpha",
                "unique two\nCOOKIE BANNER",
                "unique three\nNAV BAR\nCOOKIE BANNER",
                "NAV BAR",
                "",
                "solo paragraph",
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    bro = paragraph_dedup(ds, min_docs=2).to_pandas().sort_values("url").reset_index(drop=True)
    for kw in ({"broadcast_limit": 0}, {"broadcast_limit": 0, "hot_key_docs": 2}):
        got = (
            paragraph_dedup(ds, min_docs=2, **kw)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(bro, got[bro.columns], obj=f"plan {kw}")
    assert bro["text_kept"].tolist()[0] == "unique one\nalpha"


def test_exact_substring_dedup_hot_split_plan_identity():
    """hot_key_count=2 forces every duplicated window through the
    broadcast hot path (explode skips them; cut_joined re-derives them
    locally) — byte-identical to the broadcast plan and the cold
    exchange plan, including a doc whose ONLY dup windows are hot
    (no pos_lists row at all)."""
    from pdf_extractor_ray.pipelines.dedup import exact_substring_dedup

    span20 = " ".join(f"w{i}" for i in range(20))
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(4), dtype="int64"),
            "text": [
                f"alpha beta {span20} gamma delta",
                f"intro words {span20} outro tail",
                f"{span20}",  # only-hot-windows doc: zero exchange rows
                "nothing shared in this document at all really",
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    bro = exact_substring_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for kw in ({"broadcast_limit": 0}, {"broadcast_limit": 0, "hot_key_count": 2}):
        got = (
            exact_substring_dedup(ds, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(bro, got[bro.columns], obj=f"plan {kw}")
    assert span20 not in bro["text_kept"][0]
    assert bro["text_kept"][2] == ""  # the only-hot doc is fully cut
    assert bro["text_kept"][3] == docs["text"][3]


def test_substring_dedup_corpus_hot_split_matches_cold(tmp_path):
    """On the sf0.001 documents corpus a low hot threshold must not
    change a single byte vs the cold exchange plan (hot resolution is
    a routing optimization, never a semantic one)."""
    from pdf_extractor_ray.pipelines.dedup import exact_substring_dedup

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ds = ray.data.from_arrow(tbl)
    cold = (
        exact_substring_dedup(ds, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    hot = (
        exact_substring_dedup(ds, broadcast_limit=0, hot_key_count=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(cold, hot[cold.columns])


def test_compact_retry_after_crash_no_duplicates(tmp_path):
    """A compact that wrote its generation dir but crashed before the
    manifest commit must not leak its fragments into a retried
    compact's manifest (the unique staging-dir rule): the retry's
    index holds each vector exactly once and GCs the orphan."""
    from pdf_extractor_ray.pipelines import similarity as sim

    full = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    base = tmp_path / "sf"
    base.mkdir()
    pq.write_table(full, str(base / "embeddings.parquet"))
    idx = str(tmp_path / "ivf")
    sim.build_ivf_index(str(base), idx, num_lists=4)
    n = full.num_rows

    # simulate the crashed first attempt: run the data-write phase by
    # hand into a v2 generation dir, skip the manifest commit
    cents = np.load(os.path.join(idx, "centroids.npy"))
    files = [os.path.join(idx, f) for f in sim._read_manifest(idx)["files"]]
    ray.data.read_parquet(files).map_batches(
        sim._assign_stage(cents), batch_format="pyarrow", batch_size=4096
    ).write_parquet(os.path.join(idx, "data-v2-dead00000000"), partition_cols=["list_id"])

    v2 = sim.compact_ivf_index(idx)  # the retry
    assert v2 == 2
    m = sim._read_manifest(idx)
    rows = sum(pq.read_metadata(os.path.join(idx, f)).num_rows for f in m["files"])
    assert rows == n, f"retried compact indexed {rows} rows for {n} vectors"
    ids = []
    for f in m["files"]:
        ids.extend(pq.read_table(os.path.join(idx, f), columns=["vec_id"])["vec_id"].to_pylist())
    assert len(ids) == len(set(ids)) == n
    # the crashed attempt's dir was GC'd
    assert not any(e == "data-v2-dead00000000" for e in os.listdir(idx))


def test_heavy_hitters_small_vocab_is_complete_not_error(tmp_path):
    """A corpus whose distinct-token count is below both k_counters and
    top_m is provably complete (no fold/merge ever decremented) — the
    strict guard must return all tokens instead of raising."""
    from pdf_extractor_ray.pipelines.textops import heavy_hitter_tokens

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(3), dtype="int64"),
            "text": [
                "aa bb cc aa",
                "bb cc dd ee",
                "aa ff gg hh",
            ],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(str(d / "documents.parquet"))
    out = heavy_hitter_tokens(str(d), k_counters=64, top_m=10, strict=True)
    assert len(out) == 8  # all distinct tokens, fewer than top_m — no raise
    assert out.iloc[0]["token"] == "aa" and int(out.iloc[0]["n"]) == 3
    counts = dict(zip(out["token"], out["n"].astype(int)))
    assert counts == {"aa": 3, "bb": 2, "cc": 2, "dd": 1, "ee": 1, "ff": 1, "gg": 1, "hh": 1}


def test_substring_dedup_bloom_prefilter_matches():
    """bloom_bits prefilters the exploded window stream (definite-absent
    windows skip the exchange) with byte-identical output — Bloom has no
    false negatives, the maybe-set is exactly re-verified."""
    from pdf_extractor_ray.pipelines.dedup import exact_substring_dedup

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ds = ray.data.from_arrow(tbl)
    plain = (
        exact_substring_dedup(ds, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bloomed = (
        exact_substring_dedup(ds, broadcast_limit=0, bloom_bits=1 << 16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, bloomed[plain.columns])


def _write_embeddings(tmp_path, vecs):
    import pyarrow as pa

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_semdedup_planted_duplicates(tmp_path):
    """Exact duplicate embeddings collapse to the lowest vec_id per
    duplicate group; near-orthogonal vectors all survive. Single
    cluster makes the expectation deterministic."""
    from pdf_extractor_ray.pipelines.dedup import semdedup

    e = np.eye(6)
    vecs = [e[0], e[0], e[1], e[0] * 0.9 + e[1] * 0.1, e[2], e[1]]  # 1,5 dup of 0,2; 3 near 0
    d = _write_embeddings(tmp_path, vecs)
    out = semdedup(d, num_clusters=1, cosine_threshold=0.95).to_pandas().sort_values("vec_id")
    assert out["keep"].tolist() == [True, False, True, False, True, False]
    # raising the bar keeps the 0.9-blend row (cos(v3, v0) ≈ 0.994 < 0.999)
    out2 = semdedup(d, num_clusters=1, cosine_threshold=0.999).to_pandas().sort_values("vec_id")
    assert out2["keep"].tolist() == [True, False, True, True, True, False]


def test_semdedup_matches_greedy_replica_on_corpus():
    """num_clusters=1 over the sf0.001 embeddings equals a local greedy
    leader replica bit-for-bit; multi-cluster output keeps exactly one
    representative per within-cluster duplicate chain (every dropped
    vector is within threshold of some kept vector in its cluster)."""
    from pdf_extractor_ray.pipelines.dedup import semdedup

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms

    thr = 0.45
    kept_rows = []
    keep_exp = {}
    for i, v in zip(ids, matn):
        if not kept_rows or max(float(np.dot(k, v)) for k in kept_rows) < thr:
            kept_rows.append(v)
            keep_exp[int(i)] = True
        else:
            keep_exp[int(i)] = False

    out = (
        semdedup(SF_DIR, num_clusters=1, cosine_threshold=thr)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert dict(zip(out["vec_id"], out["keep"])) == keep_exp
    assert (~out["keep"]).sum() > 0  # the synthetic clusters really collapse

    multi = semdedup(SF_DIR, num_clusters=4, cosine_threshold=thr).to_pandas()
    assert len(multi) == len(ids)
    by_cluster = {lid: g for lid, g in multi.groupby("list_id")}
    id_to_row = {int(i): matn[k] for k, i in enumerate(ids)}
    for lid, g in by_cluster.items():
        kept = [id_to_row[int(i)] for i in g.loc[g["keep"], "vec_id"]]
        for i in g.loc[~g["keep"], "vec_id"]:
            assert max(float(np.dot(k, id_to_row[int(i)])) for k in kept) >= thr, (lid, i)


def test_lm_bigram_nll_matches_oracle_and_hand_computation(tmp_path):
    """The bigram-LM NLL (CCNet-style quality signal) hash-matches its
    DuckDB oracle on sf0.001, and a tiny planted corpus reproduces the
    hand-computed add-one math (vocab ties, OOV mapping, micro-nat
    rounding, <2-word and empty docs)."""
    import math

    import duckdb

    from pdf_extractor_ray.pipelines import textops
    from tools.check_oracle import value_hash

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(textops.LM_NLL_SQL).df()
    mine = textops.lm_bigram_nll(SF_DIR).to_pandas()
    assert len(mine) == len(oracle)
    assert value_hash(mine) == value_hash(oracle)
    assert (mine["nll_total_micro"] > 0).any()

    # planted: vocab_k=2 over ref 'a b a b c' → vocab {a, b} (counts
    # a=2,b=2,c=1; ties a<b), OOV=''. Bigrams: (a,b)x2, (b,a), (b,'')
    # → C2; C1: a=2, b=2. V=3.
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(4), dtype="int64"),
            "text": ["a b a b c", "a b z", "solo", ""],
            "lang": ["en", "fr", "fr", "fr"],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(str(d / "documents.parquet"))

    def m(p):
        return int(math.floor(-math.log(p) * 1_000_000 + 0.5))

    exp = {
        0: (4, m(3 / 5) + m(2 / 5) + m(3 / 5) + m(2 / 5)),  # ab ba ab bc→(b,'')
        1: (2, m(3 / 5) + m(2 / 5)),  # ab, bz→(b,'')
        2: (0, 0),
        3: (0, 0),
    }
    got = (
        textops.lm_bigram_nll(str(d), vocab_k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i in range(4):
        assert (int(got["n_bigrams"][i]), int(got["nll_total_micro"][i])) == exp[i], i
    # planted oracle agrees too
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    o2 = con2.execute(textops.lm_bigram_nll_sql(vocab_k=2)).df()
    assert value_hash(got) == value_hash(o2)


def test_pack_sequences_matches_oracle_and_planted(tmp_path):
    """Next-fit sequence packing hash-matches the recursive-CTE oracle
    on sf0.001; a planted corpus pins the semantics: budget fits,
    resets, and an oversize doc taking (and closing) its own pack."""
    import duckdb

    from pdf_extractor_ray.pipelines import corpus
    from tools.check_oracle import value_hash

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(corpus.PACK_SQL).df()
    mine = corpus.pack_sequences(SF_DIR).to_pandas()
    assert len(mine) == len(oracle) > 0
    assert value_hash(mine) == value_hash(oracle)
    assert mine["pack_seq"].max() > 0  # packing actually wraps

    # planted, single bucket: tokens 5,4,12,3,6 @ budget 10
    # → packs [5+4], [12 oversize], [3+6]
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([0, 8, 16, 24, 32], dtype="int64"),  # all bucket 0 (mod 8)
            "text": [
                "a b c d e",
                "a b c d",
                "a b c d e f g h i j k l",
                "a b c",
                "a b c d e f",
            ],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(str(d / "documents.parquet"))
    got = (
        corpus.pack_sequences(str(d), budget_tokens=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["pack_seq"].tolist() == [0, 0, 1, 2, 2]
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    o2 = con2.execute(corpus.pack_sequences_sql(budget_tokens=10)).df()
    assert value_hash(got) == value_hash(o2)


def test_lm_bigram_nll_empty_reference_cold_scores(tmp_path):
    """A corpus with NO ref-lang documents (or none with >= 2 tokens)
    must cold-score every bigram at -ln(1/V) — matching the oracle's
    COALESCE path — instead of crashing on the empty count table."""
    import math

    import duckdb

    from pdf_extractor_ray.pipelines import textops
    from tools.check_oracle import value_hash

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([0, 1, 2], dtype="int64"),
            "text": ["x y z", "solo", ""],
            "lang": ["fr", "fr", "fr"],  # no 'en' reference at all
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(str(d / "documents.parquet"))
    got = (
        textops.lm_bigram_nll(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cold = int(math.floor(-math.log(1 / (textops.LM_VOCAB_K + 1)) * 1_000_000 + 0.5))
    assert got["n_bigrams"].tolist() == [2, 0, 0]
    assert got["nll_total_micro"].tolist() == [2 * cold, 0, 0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    assert value_hash(got) == value_hash(con.execute(textops.LM_NLL_SQL).df())


def test_bpe_learn_matches_local_reference(tmp_path):
    """Distributed BPE merge learning is bit-exact vs a plain local
    reference over sf0.001 (same tie-breaks), and a planted corpus
    reproduces the hand-derived first merges."""
    from collections import Counter

    from pdf_extractor_ray.pipelines.corpus import BPE_EOW, _bpe_merge_word, bpe_learn

    def reference(texts, num_merges):
        wf = Counter()
        for t in texts:
            wf.update(t.split())
        vocab = {w: list(w) + [BPE_EOW] for w in wf}
        merges = []
        for rank in range(num_merges):
            pc = Counter()
            for w, syms in vocab.items():
                n = wf[w]
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += n
            if not pc:
                break
            (left, right), n_best = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, left, right, n_best))
            vocab = {w: _bpe_merge_word(s, left, right) for w, s in vocab.items()}
        return merges

    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])["text"].to_pylist()
    exp = reference(texts, 12)
    got = bpe_learn(SF_DIR, num_merges=12)
    assert list(map(tuple, got.itertuples(index=False))) == exp
    assert len(got) == 12 and got["n"].iloc[0] >= got["n"].iloc[-1] >= 1

    # planted: 'low lower lowest low low' → most frequent pair merges
    # first; ties break lexicographically
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([0], dtype="int64"),
            "text": ["low lower lowest low low"],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(str(d / "documents.parquet"))
    got2 = bpe_learn(str(d), num_merges=3)
    exp2 = reference(["low lower lowest low low"], 3)
    assert list(map(tuple, got2.itertuples(index=False))) == exp2
    # 'l'+'o' (count 5) must be the first merge; then 'lo'+'w' (5)
    assert (got2["left"].iloc[0], got2["right"].iloc[0]) == ("l", "o")
    assert (got2["left"].iloc[1], got2["right"].iloc[1]) == ("lo", "w")


def test_bpe_token_counts_matches_reference_encoding():
    """Applying the learned merge table gives the same per-doc token
    counts as a local reference encoder, and merging strictly reduces
    token counts vs character length."""
    from collections import Counter

    from pdf_extractor_ray.pipelines.corpus import (
        BPE_EOW,
        _bpe_merge_word,
        bpe_learn,
        bpe_token_counts,
    )

    merges = bpe_learn(SF_DIR, num_merges=10)
    table = list(zip(merges["left"], merges["right"]))
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()

    def ref_count(t):
        total = 0
        for w in t.split():
            syms = list(w) + [BPE_EOW]
            for left, right in table:
                syms = _bpe_merge_word(syms, left, right)
            total += len(syms)
        return total

    exp = {int(i): ref_count(t) for i, t in zip(docs["doc_id"], docs["text"])}
    got = bpe_token_counts(SF_DIR, num_merges=10).to_pandas()
    assert dict(zip(got["doc_id"].astype(int), got["n_tokens_bpe"].astype(int))) == exp
    nonempty = got[got["n_tokens_ws"] > 0]
    # with the EOW marker, a word has <= len(w)+1 symbols; merges bite
    chars = docs.set_index("doc_id")["text"].str.replace(" ", "", regex=False).str.len()
    joined = nonempty.set_index("doc_id").join(chars.rename("n_chars"))
    assert (joined["n_tokens_bpe"] < joined["n_chars"] + joined["n_tokens_ws"]).all()
    assert (joined["n_tokens_bpe"] >= joined["n_tokens_ws"]).all()


def test_truncated_gif_bmp_never_decode_wrong():
    """EVERY proper prefix of a valid GIF/BMP either raises (the
    quarantine path) or decodes byte-identically to the full payload —
    no truncation silently yields WRONG pixels. (A GIF cut exactly at
    its 0x3B trailer still carries complete pixel data; decoding it is
    benign, and the exhaustive sweep distinguishes that one case from
    a wrong decode.)"""
    from pdf_extractor_ray.pipelines import multimodal as mm

    g = mm.make_gif(3, 12, 9)
    b = mm.make_bmp(3, 12, 9)
    for payload in (g, b):
        full = mm.decode_image(payload)
        assert full["width"] == 12 and full["height"] == 9
        benign = 0
        for cut in range(1, len(payload)):
            try:
                got = mm.decode_image(payload[:cut])
            except Exception:
                continue
            assert got == full, f"cut={cut} decoded differently"
            benign += 1
        assert benign <= 1  # only the trailer-only GIF cut may succeed


def test_codec_property_round_trips():
    """Property test: GIF (any palette size 1-256, plain/interlaced)
    and BMP (any dims incl. degenerate 1-pixel and padding-triggering
    widths) round-trip pixel-exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extractor_ray.pipelines import multimodal as mm

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 37),
        h=st.integers(1, 23),
        n_colors=st.integers(1, 256),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def gif_case(w, h, n_colors, interlace, seed):
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
        px = pal[rng.randint(0, n_colors, size=(h, w))]
        assert (mm._gif_decode_pixels(mm.encode_gif(px, interlace=interlace)) == px).all()

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 41), h=st.integers(1, 19), seed=st.integers(0, 2**31 - 1))
    def bmp_case(w, h, seed):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (mm._bmp_decode_pixels(mm.encode_bmp(px)) == px).all()

    gif_case()
    bmp_case()
