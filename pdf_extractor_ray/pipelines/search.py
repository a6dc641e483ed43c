"""Full-text retrieval over the documents table: BM25 top-k scoring
in exact integer fixed-point.

BM25 (Robertson & Spärck Jones probabilistic relevance framework;
the Okapi BM25 formula) is the standard lexical ranking function a
training-data pipeline needs for retrieval-based decontamination,
quality probes, and corpus search. The reference engine has no
corpus-search path (its lookups are per-file field extraction — see
``invindex.py``); this operator belongs to the training-data-pipeline
extension surface alongside the persisted inverted index.

Exactness contract (same family as ``lm_bigram_nll``'s micro-nats):

- ``avgdl`` is pre-rounded ONCE per corpus to integer milli-tokens
  ``A = (1000 * total_len) // N``;
- per (doc, term): with ``k1 = 12/10`` and ``b = 3/4`` the classical
  tf normalization ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
  multiplied through by ``10·A`` is the exact integer rational
  ``22·A·tf / (10·A·tf + 3·A + 9000·dl)``, floored into milli-units:
  ``tfnorm_milli = (1000·22·A·tf) // (10·A·tf + 3·A + 9000·dl)``;
- ``idf_micro = floor(ln((N − df + 0.5)/(df + 0.5))·1e6 + 0.5)`` per
  query term (the ONLY float step — one libm ln per term, ≤ |Q|
  distinct values, the lm-NLL 1-ulp budget); negative idf (df > N/2)
  is kept, as in the original formula;
- ``score_scaled = Σ_t idf_micro(t) · tfnorm_milli(t)`` summed as
  exact int64 (unit 1e-9), so the result is bit-identical under any
  partitioning and exactly replayable in DuckDB.

Scale shape: ONE corpus pass tokenizes each doc and emits a narrow
per-doc row ``(doc_id, dl, tf_0..tf_{m-1})`` (the query's m terms are
a frozenset constant inside the batch fn — no broadcast needed);
that materialized table serves the three scalar aggregates
(N, total_len, per-term df) and the zero-shuffle scoring pass; the
top-k leaves k rows per batch (local prune → global sort+limit).
No token-level explode, no exchange keyed on anything wider than the
final k rows.

Overflow: the numerator ``1000·22·A·tf`` must fit int64, i.e.
``A·tf ≤ 4.19e14`` (e.g. avgdl 500 tokens → A = 5e5 allows tf up to
~8e8). The scoring pass checks the bound per batch and raises
OverflowError with sizing advice (the tf-idf int64-guard precedent) —
numpy would wrap silently; DuckDB raises on its own.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import ray.data

from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

_TW = trim_ws_sql("text")
_WS = WS_SPLIT_RE_SQL

BM25_TERMS = ("data", "spark", "window")
BM25_K = 20
_IDF_MICRO = 10**6
_TFNORM_MILLI = 10**3
# 1000·22·A·tf must stay below 2^63: A·tf ≤ (2^63 − 1) // 22000
_AT_BOUND = (2**63 - 1) // (22 * _TFNORM_MILLI)


def _per_doc_table(sf_dir: str, terms: tuple[str, ...]) -> ray.data.Dataset:
    """One tokenize pass → materialized narrow per-doc table
    ``(doc_id, dl, tf0..tf{m-1})`` — one row per document (empty docs
    included with dl = 0, so N and total_len read off this table)."""
    term_ix = {t: j for j, t in enumerate(terms)}
    m = len(terms)

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        dl = np.zeros(n, np.int64)
        tf = np.zeros((m, n), np.int64)
        for i, text in enumerate(b["text"]):
            words = text.split()
            dl[i] = len(words)
            for w in words:
                j = term_ix.get(w)
                if j is not None:
                    tf[j, i] += 1
        out = {"doc_id": b["doc_id"].to_numpy(np.int64), "dl": dl}
        for j in range(m):
            out[f"tf{j}"] = tf[j]
        return pd.DataFrame(out)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(stats, batch_format="pandas", batch_size=8192).materialize()


def bm25_topk(
    sf_dir: str, terms: tuple[str, ...] = BM25_TERMS, k: int = BM25_K
) -> ray.data.Dataset:
    """Top-``k`` documents for the query ``terms`` by exact-integer
    BM25: ``(doc_id, score_scaled)``, score unit 1e-9, ordered
    (score DESC, doc_id ASC) with the tie-break applied identically
    in the oracle."""
    per_doc = _per_doc_table(sf_dir, terms)
    m = len(terms)

    n_docs = per_doc.count()
    total_len = int(per_doc.sum("dl") or 0)
    if n_docs == 0 or total_len == 0:
        return per_doc.map_batches(
            lambda b: pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "score_scaled": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        ).limit(0)
    avg_milli = (1000 * total_len) // n_docs  # A: floor, once per corpus

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {f"df{j}": [int((b[f"tf{j}"].to_numpy(np.int64) > 0).sum())] for j in range(m)}
        )

    df_rows = per_doc.map_batches(df_partial, batch_format="pandas").to_pandas()
    idf_micro = np.empty(m, np.int64)
    for j in range(m):
        df = int(df_rows[f"df{j}"].sum())
        idf_micro[j] = math.floor(
            math.log((n_docs - df + 0.5) / (df + 0.5)) * _IDF_MICRO + 0.5
        )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        dl = b["dl"].to_numpy(np.int64)
        total = np.zeros(len(b), np.int64)
        matched = np.zeros(len(b), bool)
        for j in range(m):
            tf = b[f"tf{j}"].to_numpy(np.int64)
            mx = int(tf.max()) if len(tf) else 0
            if avg_milli * mx > _AT_BOUND:
                raise OverflowError(
                    f"BM25 numerator exceeds int64: avgdl_milli={avg_milli} × "
                    f"tf={mx}; rescale tfnorm to a coarser unit or cap tf"
                )
            hit = tf > 0
            den = 10 * avg_milli * tf + 3 * avg_milli + 9000 * dl
            num = _TFNORM_MILLI * 22 * avg_milli * tf
            tfnorm = np.zeros(len(b), np.int64)
            np.floor_divide(num, den, out=tfnorm, where=hit)
            total += idf_micro[j] * tfnorm
            matched |= hit
        out = pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64), "score_scaled": total}
        )
        return out[matched]

    scored = per_doc.map_batches(score, batch_format="pandas")

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        # any global top-k row is in its batch's local top-k; sort on
        # BOTH keys before head so tied boundary rows break by doc_id
        if len(b) > k:
            b = b.sort_values(
                ["score_scaled", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
        return b

    return (
        scored.map_batches(local_topk, batch_format="pandas")
        .sort(["score_scaled", "doc_id"], descending=[True, False])
        .limit(k)
    )


def bm25_reference(
    docs: pd.DataFrame, terms: tuple[str, ...] = BM25_TERMS, k: int = BM25_K
) -> pd.DataFrame:
    """Sequential single-process replica of ``bm25_topk`` (same exact
    integer arithmetic) for bit-exactness tests; ``docs`` needs
    (doc_id, text)."""
    toks = [str(t).split() for t in docs["text"]]
    n = len(docs)
    total_len = sum(len(w) for w in toks)
    a = (1000 * total_len) // n
    rows = []
    for term in terms:
        df = sum(1 for w in toks if term in w)
        idf = math.floor(math.log((n - df + 0.5) / (df + 0.5)) * _IDF_MICRO + 0.5)
        rows.append((term, idf))
    out = []
    for doc_id, words in zip(docs["doc_id"], toks):
        dl = len(words)
        score = 0
        hit = False
        for term, idf in rows:
            tf = words.count(term)
            if tf == 0:
                continue
            hit = True
            score += idf * (
                (_TFNORM_MILLI * 22 * a * tf) // (10 * a * tf + 3 * a + 9000 * dl)
            )
        if hit:
            out.append({"doc_id": int(doc_id), "score_scaled": score})
    res = pd.DataFrame(out, columns=["doc_id", "score_scaled"]).astype(np.int64)
    return (
        res.sort_values(["score_scaled", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_sql(terms: tuple[str, ...] = BM25_TERMS, k: int = BM25_K) -> str:
    """Oracle: the identical integer formula in DuckDB. total_len is
    the token-row count of the exploded CTE, N the documents row
    count; BIGINT ``//`` is floor division on the non-negative
    operands here, and DuckDB raises (rather than wraps) if a product
    leaves BIGINT — the engine's OverflowError guard mirrors that."""
    termlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return rf"""
WITH w AS (
    SELECT doc_id, unnest(regexp_split_to_array({_TW}, '{_WS}')) AS token
    FROM documents WHERE {_TW} <> ''
),
consts AS (
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT COUNT(*) FROM w) AS total_len,
           (1000 * (SELECT COUNT(*) FROM w)) // (SELECT COUNT(*) FROM documents) AS a
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM w GROUP BY doc_id),
tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM w WHERE token IN ({termlist}) GROUP BY doc_id, token
),
idf AS (
    SELECT token,
           CAST(floor(ln((c.n_docs - COUNT(DISTINCT doc_id) + 0.5)
                         / (COUNT(DISTINCT doc_id) + 0.5)) * 1000000 + 0.5) AS BIGINT) AS idf_micro
    FROM w, consts c WHERE token IN ({termlist}) GROUP BY token, c.n_docs
)
SELECT tf.doc_id,
       CAST(SUM(idf.idf_micro *
                (({_TFNORM_MILLI} * 22 * c.a * tf.tf)
                 // (10 * c.a * tf.tf + 3 * c.a + 9000 * dl.dl))) AS BIGINT) AS score_scaled
FROM tf
JOIN dl ON dl.doc_id = tf.doc_id
JOIN idf ON idf.token = tf.token
CROSS JOIN consts c
GROUP BY tf.doc_id
ORDER BY score_scaled DESC, tf.doc_id
LIMIT {int(k)}
"""


BM25_SQL = bm25_sql()


# ---------------------------------------------------------------------------
# Token-level phrase search (overlapping occurrence counts)
# ---------------------------------------------------------------------------

PHRASE = ("batch", "batch")


def phrase_search_documents(sf_dir: str, phrase: tuple[str, ...] = PHRASE) -> ray.data.Dataset:
    """Per-document count of token-level occurrences of ``phrase`` —
    the exact-phrase probe behind phrase-level decontamination and
    corpus search (``"new york times" appears k times``). Occurrences
    are counted at EVERY start position (overlapping: 'batch batch
    batch' contains 'batch batch' twice) — the positional-index
    definition, not string replace()'s non-overlapping one. Output
    ``(doc_id, n_matches)`` for every doc, zeros included.

    Zero shuffle, batch-vectorized: each batch concatenates its tokens
    into ONE flat array; the phrase match is m shifted elementwise
    comparisons over that array (m = phrase length, no per-doc loop),
    matches crossing document boundaries are masked out by requiring
    the first and last token to share an owner, and per-doc counts
    fall out of one bincount."""
    if not phrase:
        raise ValueError("phrase must have at least one token")
    m = len(phrase)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        toks = [t.split() for t in b["text"]]
        lens = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
        flat = np.array([w for x in toks for w in x], dtype=object)
        owner = np.repeat(np.arange(len(toks)), lens)
        n_starts = len(flat) - m + 1
        if n_starts > 0:
            match = np.ones(n_starts, dtype=bool)
            for j, w in enumerate(phrase):
                match &= flat[j : n_starts + j] == w
            match &= owner[:n_starts] == owner[m - 1 :]
            n = np.bincount(owner[:n_starts][match], minlength=len(toks)).astype(np.int64)
        else:
            n = np.zeros(len(toks), np.int64)
        return pd.DataFrame({"doc_id": ids, "n_matches": n})

    return ds.map_batches(count, batch_format="pandas", batch_size=4096)


def phrase_search_sql(phrase: tuple[str, ...] = PHRASE) -> str:
    m = len(phrase)
    conds = " AND ".join(
        f"arr[CAST(pos + {j} AS BIGINT)] = '{w}'" for j, w in enumerate(phrase)
    )
    return rf"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN {_TW} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({_TW}, '{_WS}') END AS arr
    FROM documents
),
p AS (SELECT doc_id, arr, unnest(range(1, len(arr) - {m} + 2)) AS pos FROM t)
SELECT t.doc_id,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_matches
FROM t LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n FROM p WHERE {conds} GROUP BY doc_id
) c ON c.doc_id = t.doc_id
"""


PHRASE_SEARCH_SQL = phrase_search_sql()


# ---------------------------------------------------------------------------
# Positional postings (term → (doc, position) lists)
# ---------------------------------------------------------------------------

POSTING_TERMS = ("spark", "window", "dup")


def positional_postings(sf_dir: str, terms: tuple[str, ...] = POSTING_TERMS) -> ray.data.Dataset:
    """Positional posting list for a term set: ``(term, doc_id, pos)``
    with 1-based token positions — the index layout phrase and
    proximity queries intersect (this is what ``invindex.py``'s
    doc-level postings lack). Zero shuffle: the batch-flat token
    array + ``np.isin`` membership emits all postings in one
    vectorized pass; positions are global offsets minus each doc's
    start offset. At 100 TB the output is written hive-partitioned by
    term bucket exactly like the persisted inverted index."""
    if not terms:
        raise ValueError("terms must be non-empty")
    term_list = list(terms)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        toks = [t.split() for t in b["text"]]
        lens = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
        flat = np.array([w for x in toks for w in x], dtype=object)
        owner = np.repeat(np.arange(len(toks)), lens)
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(toks) else np.empty(0, np.int64)
        idx = np.nonzero(np.isin(flat, term_list))[0]
        did = owner[idx]
        return pd.DataFrame(
            {
                "term": pd.Series(flat[idx], dtype=object),
                "doc_id": ids[did],
                "pos": (idx - doc_start[did] + 1).astype(np.int64),
            }
        )

    return ds.map_batches(emit, batch_format="pandas", batch_size=4096)


def positional_postings_sql(terms: tuple[str, ...] = POSTING_TERMS) -> str:
    inlist = ", ".join(f"'{t}'" for t in terms)
    return rf"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN {_TW} = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array({_TW}, '{_WS}') END AS arr
    FROM documents
),
u AS (SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr) + 1)) AS pos FROM t)
SELECT term, doc_id, CAST(pos AS BIGINT) AS pos
FROM u WHERE term IN ({inlist})
"""


POSITIONAL_POSTINGS_SQL = positional_postings_sql()


# ---------------------------------------------------------------------------
# Fielded retrieval (title-weighted term scoring — BM25F's skeleton)
# ---------------------------------------------------------------------------

FIELDED_TERMS = ("data", "window")
FIELDED_TITLE_WEIGHT = 3  # a title hit is worth 3 body hits
FIELDED_K = 20


def fielded_search_documents(sf_dir: str) -> ray.data.Dataset:
    """Field-weighted retrieval: score = Σ_terms (W·tf_title + tf_body)
    with the title = the document's first token (the WAT-carrier
    convention) — exact integer scoring, top-``FIELDED_K`` by (score
    DESC, doc_id ASC). This is BM25F's structural skeleton (Robertson
    et al. 2004: per-FIELD term frequencies combined with field
    weights BEFORE saturation) with the saturation stripped so the
    oracle is pure-integer; the point under test is the fielded
    accumulation, which the flat BM25 op cannot express.

    Scale shape: zero-shuffle scoring pass (title + body tf in one
    tokenize), per-batch local top-k prune, k-rows-per-batch global
    sort+limit — the bm25_topk shape."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    terms = FIELDED_TERMS

    def score(b: pd.DataFrame) -> pd.DataFrame:
        ids, scores = [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            ws = text.split()
            title = ws[:1]
            sc = 0
            for t in terms:
                sc += FIELDED_TITLE_WEIGHT * title.count(t) + ws.count(t)
            if sc > 0:
                ids.append(int(doc_id))
                scores.append(sc)
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "score": pd.Series(scores, dtype="int64"),
            }
        )
        if len(out) > FIELDED_K:  # local prune: ≤ k rows leave the batch
            out = out.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            ).head(FIELDED_K)
        return out

    return (
        ds.map_batches(score, batch_format="pandas", batch_size=8192)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(FIELDED_K)
    )


def _fielded_sql() -> str:
    tw = trim_ws_sql("text")
    inlist = ", ".join(f"'{t}'" for t in FIELDED_TERMS)
    return rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN {tw} = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}') END AS arr
  FROM documents
),
u AS (
  SELECT doc_id,
         unnest(arr) AS term,
         unnest(range(1, len(arr) + 1)) AS pos
  FROM t
),
s AS (
  SELECT doc_id,
         SUM(CASE WHEN pos = 1 THEN {FIELDED_TITLE_WEIGHT} + 1 ELSE 1 END) AS score
  FROM u WHERE term IN ({inlist})
  GROUP BY doc_id
)
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM s ORDER BY score DESC, doc_id ASC LIMIT {FIELDED_K}
"""


FIELDED_SEARCH_SQL = _fielded_sql()


# ---------------------------------------------------------------------------
# KWIC concordance (keyword in context)
# ---------------------------------------------------------------------------

KWIC_TERM = "data"
KWIC_WINDOW = 2  # tokens of context each side


def kwic_documents(sf_dir: str) -> ray.data.Dataset:
    """Keyword-in-context concordance: every occurrence of
    :data:`KWIC_TERM` with ±:data:`KWIC_WINDOW` tokens of context —
    ``(doc_id, pos, context)`` (pos 1-based, context space-joined,
    clipped at document edges). The qualitative-inspection view every
    corpus tool ships (what does 'data' actually look like in this
    corpus?); positions make it the display layer over the positional
    postings. Zero shuffle, vectorized token walk."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def kwic(b: pd.DataFrame) -> pd.DataFrame:
        ids, poss, ctxs = [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            ws = text.split()
            for i, w in enumerate(ws):
                if w == KWIC_TERM:
                    lo = max(0, i - KWIC_WINDOW)
                    hi = min(len(ws), i + KWIC_WINDOW + 1)
                    ids.append(int(doc_id))
                    poss.append(i + 1)
                    ctxs.append(" ".join(ws[lo:hi]))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int64"),
                "context": pd.Series(ctxs, dtype="object"),
            }
        )

    return ds.map_batches(kwic, batch_format="pandas", batch_size=8192)


def _kwic_sql() -> str:
    tw = trim_ws_sql("text")
    return rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN {tw} = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}') END AS arr
  FROM documents
),
u AS (
  SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS pos FROM t
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       array_to_string(arr[greatest(1, pos - {KWIC_WINDOW}) :
                            least(len(arr), pos + {KWIC_WINDOW})], ' ') AS context
FROM u WHERE arr[pos] = '{KWIC_TERM}'
"""


KWIC_SQL = _kwic_sql()


# ---------------------------------------------------------------------------
# Query-biased snippet extraction (search-result summaries)
# ---------------------------------------------------------------------------

SNIPPET_TERMS = ("hash", "join", "merge")
SNIPPET_W = 8


def snippet_documents(sf_dir: str) -> "ray.data.Dataset":
    """Query-biased SNIPPET extraction for the fixed query
    ``{hash, join, merge}``: per matching doc, the ``SNIPPET_W``-token
    window with the most query-term occurrences (leftmost window on
    ties) → ``(doc_id, best_start, n_matches, snippet)`` with
    ``best_start`` 1-based — the result-page summary stage of a search
    stack (BM25 ranks the doc, this picks what to SHOW). Docs with no
    query term are omitted.

    Scale shape: pure per-row batch work — the indicator vector's
    sliding-window sums come from one cumsum, argmax is vectorized, and
    nothing leaves the batch. Zero shuffle."""
    import os

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    terms = set(SNIPPET_TERMS)

    def extract(b: "pd.DataFrame") -> "pd.DataFrame":
        ids, starts, matches, snips = [], [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            toks = [t for t in text.split(" ") if t]
            n = len(toks)
            if n == 0:
                continue
            ind = np.fromiter((1 if t in terms else 0 for t in toks), np.int64, n)
            if not ind.any():
                continue
            cs = np.concatenate([[0], np.cumsum(ind)])
            n_starts = max(n - SNIPPET_W + 1, 1)
            ends = np.minimum(np.arange(n_starts) + SNIPPET_W, n)
            sums = cs[ends] - cs[np.arange(n_starts)]
            s = int(np.argmax(sums))  # first max = leftmost tie
            ids.append(int(doc_id))
            starts.append(s + 1)
            matches.append(int(sums[s]))
            snips.append(" ".join(toks[s : s + SNIPPET_W]))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "best_start": pd.Series(starts, dtype="int64"),
                "n_matches": pd.Series(matches, dtype="int64"),
                "snippet": pd.Series(snips, dtype="object"),
            }
        )

    return ds.map_batches(extract, batch_format="pandas", batch_size=2048)


SNIPPET_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, ' ') AS arr,
         len(regexp_split_to_array(text, ' ')) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, i, arr[i] AS w, n FROM t, unnest(generate_series(1, n)) AS u(i)
),
hits AS (
  SELECT doc_id, i FROM pos WHERE w IN ('hash', 'join', 'merge')
),
starts AS (
  SELECT t.doc_id, s.s, t.n
  FROM t, unnest(generate_series(1, GREATEST(n - {SNIPPET_W} + 1, 1))) AS s(s)
),
scored AS (
  SELECT st.doc_id, st.s, st.n, COUNT(h.i) AS cnt
  FROM starts st
  LEFT JOIN hits h ON h.doc_id = st.doc_id
                   AND h.i >= st.s AND h.i < st.s + {SNIPPET_W}
  GROUP BY st.doc_id, st.s, st.n
),
best AS (
  SELECT doc_id, s, n, cnt FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, s) = 1
)
SELECT b.doc_id, CAST(b.s AS BIGINT) AS best_start,
       CAST(b.cnt AS BIGINT) AS n_matches,
       array_to_string(t.arr[b.s : LEAST(b.s + {SNIPPET_W} - 1, b.n)], ' ') AS snippet
FROM best b JOIN t USING (doc_id)
WHERE b.cnt >= 1
"""
