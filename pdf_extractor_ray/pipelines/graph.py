"""Link-graph analytics: deterministic edge derivation + distributed
PageRank.

PageRank is the canonical web-scale iterative graph computation a
crawl-processing engine needs (domain/page authority for curation and
crawl prioritization — see Page et al. 1999; Common Crawl publishes
exactly this as its host-level ranking). The reference has no analog
(it wraps single-document extraction); this belongs to the
training-data-pipeline extension surface.

Scale shape: one iteration = one hash join (ranks ⋈ edges on src,
byte-gated broadcast vs exchange via ``joins.adaptive_inner_join``) +
one ``grouped_sum`` exchange keyed by dst. Both exchanges are keyed on
node ids (8-byte keys); per-batch partials bound a viral dst (a page
every other page links to) to one row per batch on the inflow
exchange. Ranks are int64 micro-units with floor arithmetic, so the
result is bit-identical regardless of partitioning, batch order, or
plan choice — and exactly replayable in SQL (the oracle unrolls the
fixed iteration count as chained CTEs; recursive CTEs cannot
re-aggregate over the recursive term).

Overflow note: ranks are ≤ total mass = n_nodes × 1e6 micro-units;
the update multiplies a node's INFLOW (< total mass) by 850, so int64
is safe up to ~1e13 nodes. Beyond that, rescale the unit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data

from pdf_extractor_ray import joins
from pdf_extractor_ray.ops import distinct, grouped_sum

PAGERANK_ITERS = 4
PAGERANK_BASE_MICRO = 150_000  # (1 - d) in micro-units
PAGERANK_DAMP_MILLI = 850  # d in milli-units
PAGERANK_INIT_MICRO = 1_000_000


def document_link_edges(sf_dir: str) -> ray.data.Dataset:
    """Deterministic (src, dst) link edges derived from the documents
    table: doc ``d`` links to ``1 + d % 3`` pages inside its own
    10-id block, ``dst_i = (d - d % 10) + ((d + 3*i) % 10)`` for
    ``i = 1..outdeg``. The offsets 3/6/9 are nonzero and distinct
    mod 10, so there are no self-loops and no duplicate edges;
    block-boundary targets beyond the corpus max are simply dangling
    nodes (the graph is DEFINED by its edge list). Requires
    non-negative doc ids (numpy ``%`` and SQL ``%`` agree only there —
    same precondition as sequence packing)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)
        srcs, dsts = [], []
        for i in (1, 2, 3):  # vectorized per edge-slot, not per row
            m = d % 3 >= i - 1  # outdeg = 1 + d%3 ≥ i
            s = d[m]
            srcs.append(s)
            dsts.append((s - s % 10) + ((s + 3 * i) % 10))
        return pd.DataFrame({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})

    return ds.map_batches(derive, batch_format="pandas", batch_size=8192)


def pagerank(
    edges: ray.data.Dataset,
    iters: int = PAGERANK_ITERS,
    *,
    base_micro: int = PAGERANK_BASE_MICRO,
    damp_milli: int = PAGERANK_DAMP_MILLI,
    weight_col: str | None = None,
    personalization: frozenset | None = None,
) -> ray.data.Dataset:
    """Distributed PageRank over an (src, dst) edge Dataset in exact
    int64 fixed-point: ``r0 = 1e6`` per node, then ``iters`` rounds of

        r'[v] = base_micro + (damp_milli * Σ_{u→v} (r[u]·w(u,v) // wtot[u])) // 1000

    where ``w`` is the optional integer edge weight (``weight_col``;
    default 1, in which case ``wtot = outdeg`` and the per-edge term
    is exactly the classical ``r // outdeg``). Weighted mode is the
    TextRank/co-citation form (Mihalcea & Tarau 2004 use exactly this
    weighted update). Overflow: ``r·w`` must fit int64 — r is bounded
    by total mass (n_nodes × 1e6), so weights up to ~9e18/(n×1e6) are
    safe; rescale the unit beyond that.

    Nodes = union of srcs and dsts; dangling nodes (no out-edges) leak
    their mass, as in the simplified formulation — both engine and
    oracle implement the same formula, so the invariant is exactness,
    not stochasticity. Returns (node, rank_micro).

    ``personalization``: an optional seed-node set — init mass and the
    per-round base (teleport) land ONLY on seeds, giving exact-integer
    personalized PageRank (Haveliwala 2002's topic-sensitive form;
    crawl seed-biased importance). None reproduces the classical
    update bit-identically. At web scale ship a large seed set via
    ``ray.put`` + per-actor cache; a closure array is fine for
    bounded seed lists.

    Per round: one adaptive join (ranks onto edges by src) and one
    grouped_sum keyed by dst; ranks materialize between rounds (the
    iteration is inherently sequential). The union with a zero row per
    node keeps no-inflow nodes in the frontier."""

    def keyed(col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": b[col].to_numpy(np.int64)})

        return fn

    nodes = distinct(
        edges.map_batches(keyed("src"), batch_format="pandas").union(
            edges.map_batches(keyed("dst"), batch_format="pandas")
        ),
        ["node"],
    ).materialize()

    def wcol(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": b["src"].to_numpy(np.int64),
                "dst": b["dst"].to_numpy(np.int64),
                "w": (
                    np.ones(len(b), np.int64)
                    if weight_col is None
                    else b[weight_col].to_numpy(np.int64)
                ),
            }
        )

    ew = edges.map_batches(wcol, batch_format="pandas")

    def tot(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": b["src"].to_numpy(np.int64), "wtot": b["w"].to_numpy(np.int64)}
        )

    deg = grouped_sum(ew.map_batches(tot, batch_format="pandas"), ["src"], ["wtot"])
    edges_deg = joins.adaptive_inner_join(ew, deg, on="src").materialize()

    seed_arr = (
        np.array(sorted(personalization), dtype=np.int64)
        if personalization is not None
        else None
    )

    def init(b: pd.DataFrame) -> pd.DataFrame:
        n = b["node"].to_numpy(np.int64)
        if seed_arr is None:
            r = np.full(len(b), PAGERANK_INIT_MICRO, np.int64)
        else:
            # personalized: the walk starts (and teleports) at seeds only
            r = np.where(np.isin(n, seed_arr), PAGERANK_INIT_MICRO, 0).astype(np.int64)
        return pd.DataFrame({"node": n, "r": r})

    ranks = nodes.map_batches(init, batch_format="pandas").materialize()

    def zero(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "c": np.zeros(len(b), np.int64)}
        )

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        # per-edge mass: (r·w) // wtot — with unit weights this is
        # exactly the classical r // outdeg, so the unweighted oracle
        # is bit-unchanged
        return pd.DataFrame(
            {
                "node": b["dst"].to_numpy(np.int64),
                "c": (b["r"].to_numpy(np.int64) * b["w"].to_numpy(np.int64))
                // b["wtot"].to_numpy(np.int64),
            }
        )

    def update(b: pd.DataFrame) -> pd.DataFrame:
        n = b["node"].to_numpy(np.int64)
        if seed_arr is None:
            base = base_micro
        else:
            # teleport mass lands ONLY on the personalization seeds
            base = np.where(np.isin(n, seed_arr), base_micro, 0).astype(np.int64)
        return pd.DataFrame(
            {
                "node": n,
                "r": base + (damp_milli * b["c"].to_numpy(np.int64)) // 1000,
            }
        )

    for _ in range(int(iters)):
        joined = joins.adaptive_inner_join(edges_deg, ranks, on="src", right_on="node")
        contribs = joined.map_batches(contrib, batch_format="pandas")
        inflow = grouped_sum(
            contribs.union(nodes.map_batches(zero, batch_format="pandas")), ["node"], ["c"]
        )
        ranks = inflow.map_batches(update, batch_format="pandas").materialize()

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "rank_micro": b["r"].to_numpy(np.int64)}
        )

    return ranks.map_batches(finish, batch_format="pandas")


def pagerank_documents(sf_dir: str, iters: int = PAGERANK_ITERS) -> ray.data.Dataset:
    """Driver carrier: PageRank over the deterministic document link
    graph. Output (node, rank_micro), one row per graph node."""
    return pagerank(document_link_edges(sf_dir), iters=iters)


def pagerank_reference(edges_df: pd.DataFrame, iters: int = PAGERANK_ITERS) -> pd.DataFrame:
    """Sequential single-process replica of ``pagerank`` (same exact
    integer arithmetic) for bit-exactness tests."""
    src = edges_df["src"].to_numpy(np.int64)
    dst = edges_df["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    outdeg = np.zeros(len(nodes), np.int64)
    for s in src:
        outdeg[idx[int(s)]] += 1
    r = np.full(len(nodes), PAGERANK_INIT_MICRO, np.int64)
    for _ in range(int(iters)):
        inflow = np.zeros(len(nodes), np.int64)
        for s, t in zip(src, dst):
            inflow[idx[int(t)]] += r[idx[int(s)]] // outdeg[idx[int(s)]]
        r = PAGERANK_BASE_MICRO + (PAGERANK_DAMP_MILLI * inflow) // 1000
    return pd.DataFrame({"node": nodes, "rank_micro": r})


def _pagerank_sql(iters: int = PAGERANK_ITERS) -> str:
    """Oracle: the edge arithmetic replayed from documents, the fixed
    iteration count unrolled as chained CTEs (aggregation over the
    recursive term is not legal in a recursive CTE)."""
    ctes = [
        """e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
it0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    ]
    for k in range(1, int(iters) + 1):
        ctes.append(
            f"""it{k} AS (
  SELECT n.node,
         CAST({PAGERANK_BASE_MICRO} + ({PAGERANK_DAMP_MILLI} * COALESCE(SUM(rr.r // d.outdeg), 0)) // 1000 AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN deg d ON d.src = e.src
  LEFT JOIN it{k - 1} rr ON rr.node = e.src
  GROUP BY n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_micro FROM it{int(iters)}"
    )


PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999), exact int64 fixed-point
# ---------------------------------------------------------------------------

HITS_ITERS = 3
HITS_INIT = 1_000  # initial hub score per node
HITS_SCALE = 1_000_000_000  # per-round L1 target: sum of scores ~ 1e9


def hits(edges: ray.data.Dataset, iters: int = HITS_ITERS) -> ray.data.Dataset:
    """Distributed HITS over an (src, dst) edge Dataset in exact int64
    fixed-point — the complement to ``pagerank`` (authority = pointed
    to by good hubs; hub = points at good authorities; Kleinberg,
    JACM 1999). Per round:

        a_raw[v] = Σ_{u→v} h[u];   a[v] = a_raw[v] // q_a
        h_raw[u] = Σ_{u→v} a[v];   h[u] = h_raw[u] // q_h

    where ``q = max(1, S // HITS_SCALE)`` and S is the global sum of
    the raw scores — an L1 renormalization in pure integer floor
    arithmetic, so the result is bit-identical under any partitioning
    and exactly replayable in SQL (the oracle unrolls the rounds; the
    global S is a scalar subquery). The classical L2 normalization
    only changes the scale, never the ranking.

    Scale shape per half-round: one adaptive join (scores onto edges)
    + one ``grouped_sum`` exchange keyed by the receiving node + one
    scalar ``sum`` (dimension-0 driver scalar). Overflow bound: after
    rescale every score ≤ ~HITS_SCALE, so a node's raw inflow ≤
    degree × 1e9 — int64-safe up to ~9e9 in/out-degree; rescale the
    unit beyond that.
    """
    from pdf_extractor_ray.ops import distinct, grouped_sum

    def keyed(col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": b[col].to_numpy(np.int64)})

        return fn

    nodes = distinct(
        edges.map_batches(keyed("src"), batch_format="pandas").union(
            edges.map_batches(keyed("dst"), batch_format="pandas")
        ),
        ["node"],
    ).materialize()
    edges = edges.materialize()  # reused 2 * iters times

    def zero(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "c": np.zeros(len(b), np.int64)}
        )

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "c": np.full(len(b), HITS_INIT, np.int64)}
        )

    def half(scores: ray.data.Dataset, from_col: str, to_col: str) -> ray.data.Dataset:
        """One HITS half-round: push ``scores`` along edges from
        ``from_col`` to ``to_col``, fold, L1-rescale."""
        pushed = joins.adaptive_inner_join(edges, scores, on=from_col, right_on="node")

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": b[to_col].to_numpy(np.int64), "c": b["c"].to_numpy(np.int64)}
            )

        raw = grouped_sum(
            pushed.map_batches(contrib, batch_format="pandas").union(
                nodes.map_batches(zero, batch_format="pandas")
            ),
            ["node"],
            ["c"],
        ).materialize()
        total = int(raw.sum("c") or 0)
        q = max(1, total // HITS_SCALE)

        def rescale(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": b["node"].to_numpy(np.int64),
                    "c": b["c"].to_numpy(np.int64) // q,
                }
            )

        return raw.map_batches(rescale, batch_format="pandas").materialize()

    hub = nodes.map_batches(init, batch_format="pandas").materialize()
    auth = None
    for _ in range(int(iters)):
        auth = half(hub, "src", "dst")
        hub = half(auth, "dst", "src")

    def _rename(names: list[str]):
        def fn(t):
            return t.rename_columns(names)

        return fn

    a = auth.map_batches(_rename(["node", "auth_scaled"]), batch_format="pyarrow")
    h = hub.map_batches(_rename(["node", "hub_scaled"]), batch_format="pyarrow")
    return joins.adaptive_inner_join(a, h, on="node")


def hits_documents(sf_dir: str, iters: int = HITS_ITERS) -> ray.data.Dataset:
    """Driver carrier: HITS over the deterministic document link graph
    (same edge derivation as ``pagerank_documents``)."""
    return hits(document_link_edges(sf_dir), iters=iters)


def hits_reference(edges_df: pd.DataFrame, iters: int = HITS_ITERS) -> pd.DataFrame:
    """Sequential single-process replica of ``hits`` (same exact
    integer arithmetic) for bit-exactness tests."""
    src = edges_df["src"].to_numpy(np.int64)
    dst = edges_df["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(t)] for t in dst])
    h = np.full(len(nodes), HITS_INIT, np.int64)
    a = np.zeros(len(nodes), np.int64)

    def rescale(raw: np.ndarray) -> np.ndarray:
        q = max(1, int(raw.sum()) // HITS_SCALE)
        return raw // q

    for _ in range(int(iters)):
        raw_a = np.zeros(len(nodes), np.int64)
        np.add.at(raw_a, di, h[si])
        a = rescale(raw_a)
        raw_h = np.zeros(len(nodes), np.int64)
        np.add.at(raw_h, si, a[di])
        h = rescale(raw_h)
    return pd.DataFrame({"node": nodes, "auth_scaled": a, "hub_scaled": h})


def _hits_sql(iters: int = HITS_ITERS) -> str:
    """Oracle: edge arithmetic replayed from documents; rounds unrolled
    as chained CTEs (same reason as PAGERANK_SQL); the L1 rescale's
    global sum is a scalar subquery; BIGINT // HUGEINT floor division
    matches numpy ``//`` on the non-negative scores."""
    ctes = [
        f"""e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
h0 AS (SELECT node, CAST({HITS_INIT} AS BIGINT) AS c FROM nodes)"""
    ]
    prev_h = "h0"
    for k in range(1, int(iters) + 1):
        ctes.append(
            f"""ar{k} AS (
  SELECT n.node, CAST(COALESCE(SUM(s.c), 0) AS BIGINT) AS c
  FROM nodes n LEFT JOIN e ON e.dst = n.node LEFT JOIN {prev_h} s ON s.node = e.src
  GROUP BY n.node
),
a{k} AS (
  SELECT node, CAST(c // GREATEST(1, (SELECT SUM(c) FROM ar{k}) // {HITS_SCALE}) AS BIGINT) AS c
  FROM ar{k}
),
hr{k} AS (
  SELECT n.node, CAST(COALESCE(SUM(s.c), 0) AS BIGINT) AS c
  FROM nodes n LEFT JOIN e ON e.src = n.node LEFT JOIN a{k} s ON s.node = e.dst
  GROUP BY n.node
),
h{k} AS (
  SELECT node, CAST(c // GREATEST(1, (SELECT SUM(c) FROM hr{k}) // {HITS_SCALE}) AS BIGINT) AS c
  FROM hr{k}
)"""
        )
        prev_h = f"h{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT a.node, a.c AS auth_scaled, h.c AS hub_scaled
FROM a{int(iters)} a JOIN h{int(iters)} h ON a.node = h.node"""
    )


HITS_SQL = _hits_sql()


# ---------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
# PageRank over the token co-occurrence graph
# ---------------------------------------------------------------------------

TEXTRANK_VOCAB_K = 100
TEXTRANK_TOP_K = 30


def _topk_vocab_ordered(sf_dir: str, vocab_k: int) -> list[str]:
    """Ordered top-``vocab_k`` corpus words by count, ties broken word
    ASC — list index IS the node id (the ``_lm_topk_vocab`` contract,
    kept ordered so the SQL oracle can replay the id assignment with
    ROW_NUMBER). Same scale shape: one word-count ``grouped_sum``
    bounded by distinct words, per-batch local top-K prune, global
    sort+limit over the pruned stream."""
    import os

    ds = ray.data.read_parquet(
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

    wc = grouped_sum(
        ds.map_batches(word_counts, batch_format="pandas", batch_size=8192),
        ["word"],
        ["n"],
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
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
    return [r["word"] for r in top]


def textrank_keywords(
    sf_dir: str,
    vocab_k: int = TEXTRANK_VOCAB_K,
    iters: int = PAGERANK_ITERS,
    top_k: int = TEXTRANK_TOP_K,
) -> ray.data.Dataset:
    """Corpus-level TextRank keywords: weighted PageRank over the
    adjacent-token co-occurrence graph restricted to the top-``vocab_k``
    vocabulary; output ``(word, rank_micro)``, top ``top_k`` by
    (rank DESC, word ASC).

    Graph (identical in the oracle): nodes = vocab ids (count DESC,
    word ASC order); for every adjacent token pair inside a document
    where both tokens are in-vocab and distinct, add weight 1 in BOTH
    directions (the undirected-as-symmetric-digraph convention); an
    in-vocab word with no in-vocab neighbor is isolated and excluded
    (nodes are defined by the edge list, as in ``pagerank``).

    Scale shape: the vocab pass is the ``_lm_topk_vocab`` shape; the
    pair pass emits per-batch (src, dst, w) partials folded by one
    ``grouped_sum`` whose exchange is bounded by vocab² pairs
    regardless of corpus size (the DSIR-style constant bound); the
    PageRank rounds then run on the ≤ vocab²-edge graph. The final
    id→word mapping is a driver-side list captured in the closure
    (vocab-sized, never corpus-sized)."""
    import os

    vocab = _topk_vocab_ordered(sf_dir, int(vocab_k))
    ids = {w: i for i, w in enumerate(vocab)}

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[tuple[int, int], int] = {}
        for t in b["text"]:
            ws = t.split()
            for a, c in zip(ws, ws[1:]):
                ia = ids.get(a)
                ic = ids.get(c)
                if ia is None or ic is None or ia == ic:
                    continue
                counts[(ia, ic)] = counts.get((ia, ic), 0) + 1
                counts[(ic, ia)] = counts.get((ic, ia), 0) + 1
        return pd.DataFrame(
            {
                "src": np.fromiter((p[0] for p in counts), dtype=np.int64, count=len(counts)),
                "dst": np.fromiter((p[1] for p in counts), dtype=np.int64, count=len(counts)),
                "w": np.fromiter(counts.values(), dtype=np.int64, count=len(counts)),
            }
        )

    edges = grouped_sum(
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=8192),
        ["src", "dst"],
        ["w"],
    )
    ranks = pagerank(edges, iters=iters, weight_col="w")

    words = np.array(vocab, dtype=object)

    def to_word(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "word": pd.Series(words[b["node"].to_numpy(np.int64)], dtype=object),
                "rank_micro": b["rank_micro"].to_numpy(np.int64),
            }
        )

    return (
        ranks.map_batches(to_word, batch_format="pandas")
        .sort(["rank_micro", "word"], descending=[True, False])
        .limit(int(top_k))
    )


def _textrank_sql(
    vocab_k: int = TEXTRANK_VOCAB_K,
    iters: int = PAGERANK_ITERS,
    top_k: int = TEXTRANK_TOP_K,
) -> str:
    """Oracle: vocab ids via ROW_NUMBER over (count DESC, word ASC),
    symmetric weighted edges from positional bigrams (the PMI oracle's
    parallel-unnest pattern), weighted PageRank rounds unrolled as
    chained CTEs with the identical ``(r·w) // wtot`` integer term."""
    from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

    tw = trim_ws_sql("text")
    ctes = [
        rf"""tok AS (
    SELECT doc_id, regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}') AS ws
    FROM documents WHERE {tw} <> ''
),
aw AS (
    SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS pos FROM tok
),
vocab AS (
    SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) - 1 AS id
    FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM aw GROUP BY w
        ORDER BY c DESC, w ASC LIMIT {int(vocab_k)}
    )
),
eraw AS (
    SELECT v1.id AS src, v2.id AS dst, CAST(COUNT(*) AS BIGINT) AS w
    FROM aw a JOIN aw b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    JOIN vocab v1 ON a.w = v1.w JOIN vocab v2 ON b.w = v2.w
    WHERE v1.id <> v2.id
    GROUP BY 1, 2
),
e AS (
    SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT src, dst, w FROM eraw
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM eraw
    ) GROUP BY src, dst
),
deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM e GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM e),
it0 AS (SELECT node, CAST({PAGERANK_INIT_MICRO} AS BIGINT) AS r FROM nodes)"""
    ]
    for k in range(1, int(iters) + 1):
        ctes.append(
            f"""it{k} AS (
  SELECT n.node,
         CAST({PAGERANK_BASE_MICRO} + ({PAGERANK_DAMP_MILLI} * COALESCE(SUM((rr.r * e.w) // d.wtot), 0)) // 1000 AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN deg d ON d.src = e.src
  LEFT JOIN it{k - 1} rr ON rr.node = e.src
  GROUP BY n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v.w AS word, it.r AS rank_micro
FROM it{int(iters)} it JOIN vocab v ON v.id = it.node
ORDER BY rank_micro DESC, word ASC
LIMIT {int(top_k)}"""
    )


TEXTRANK_SQL = _textrank_sql()


# ---------------------------------------------------------------------------
# Connected components + anchor-text aggregation over the link graph
# ---------------------------------------------------------------------------


def connected_components_documents(sf_dir: str) -> ray.data.Dataset:
    """Connected components of the document link graph: ``(node,
    label)`` with label = min node id of the component — the
    driver-checkable carrier for ``dedup.label_propagation`` (whose
    minhash-cluster use is rows-only). The engine iterates
    min-label propagation with pointer jumping to a CONVERGED
    fixpoint, so the result is the mathematical component labeling —
    no round count to replay; the oracle computes the same labeling
    via a recursive-CTE transitive closure (safe here because the
    block-structured graph has bounded component size; the engine side
    has no such bound)."""
    from pdf_extractor_ray.pipelines.dedup import label_propagation

    return label_propagation(document_link_edges(sf_dir)).map_batches(
        lambda b: pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "label": b["label"].to_numpy(np.int64)}
        ),
        batch_format="pandas",
    )


CONNECTED_COMPONENTS_SQL = """
WITH RECURSIVE e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
reach AS (
  SELECT src AS node, dst AS r FROM e
  UNION
  SELECT reach.node, e.dst AS r FROM reach JOIN e ON e.src = reach.r
)
SELECT node, CAST(LEAST(node, MIN(r)) AS BIGINT) AS label
FROM reach GROUP BY node
"""


def anchor_text_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-target anchor-text aggregation — the classic web-graph
    signal (anchor text describes the TARGET page; search engines and
    crawl-quality scorers aggregate it per destination). Anchor for an
    edge = the source document's first whitespace token ('' for empty
    docs — both engines share that convention). Output per target:
    ``(dst, n_links, n_anchors, top_anchor)`` where top_anchor is the
    most frequent anchor, ties broken anchor ASC.

    Scale shape: one adaptive join attaches the source's anchor to its
    out-edges (build side is a 2-column projection of documents); one
    ``grouped_sum`` exchange keyed (dst, anchor) with per-batch
    partials bounding viral targets; the per-dst top-1/counts fold is
    a second bucketed exchange keyed dst whose input is the already
    count-collapsed (dst, anchor) table."""
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def first_tok(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "anchor": pd.Series(
                    [(t.split() or [""])[0] for t in b["text"]], dtype=object
                ),
            }
        )

    anchors = docs.map_batches(first_tok, batch_format="pandas")
    edges = document_link_edges(sf_dir)
    j = joins.adaptive_inner_join(edges, anchors, on="src", right_on="doc_id")

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dst": b["dst"].to_numpy(np.int64),
                "anchor": b["anchor"],
                "c": np.ones(len(b), np.int64),
            }
        )

    counts = grouped_sum(j.map_batches(pairs, batch_format="pandas"), ["dst", "anchor"], ["c"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dst", "c", "anchor"], ascending=[True, False, True], kind="mergesort")
        agg = g.groupby("dst", sort=True).agg(
            n_links=("c", "sum"), n_anchors=("anchor", "size"), top_anchor=("anchor", "first")
        )
        return agg.reset_index()

    return grouped_apply(counts, ["dst"], per_bucket)


def _anchor_sql() -> str:
    from pdf_extractor_ray.functions.exact import WS_SPLIT_RE_SQL, trim_ws_sql

    tw = trim_ws_sql("text")
    return rf"""
WITH e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
a AS (
  SELECT e.dst, (regexp_split_to_array({tw}, '{WS_SPLIT_RE_SQL}'))[1] AS anchor
  FROM e JOIN documents d ON d.doc_id = e.src
),
c AS (SELECT dst, anchor, CAST(COUNT(*) AS BIGINT) AS c FROM a GROUP BY dst, anchor),
r AS (
  SELECT dst, anchor, c,
         ROW_NUMBER() OVER (PARTITION BY dst ORDER BY c DESC, anchor ASC) AS rn
  FROM c
)
SELECT dst,
       CAST(SUM(c) AS BIGINT) AS n_links,
       CAST(COUNT(*) AS BIGINT) AS n_anchors,
       MAX(CASE WHEN rn = 1 THEN anchor END) AS top_anchor
FROM r GROUP BY dst
"""


ANCHOR_TEXT_SQL = _anchor_sql()


# ---------------------------------------------------------------------------
# Co-citation pairs (Small 1973): pages frequently linked by the same
# sources
# ---------------------------------------------------------------------------

COCITATION_TOP_K = 20


def cocitation_pairs(sf_dir: str, top_k: int = COCITATION_TOP_K) -> ray.data.Dataset:
    """Top-``top_k`` page pairs by co-citation count (number of common
    in-linking sources) — the classic link-structure similarity that
    needs no content. Output ``(dst_a, dst_b, n_common)`` with
    dst_a < dst_b, ordered (n DESC, dst_a, dst_b).

    Scale shape: pair emission is per-SOURCE (outdeg-bounded — C(d,2)
    pairs per source, never a dst-keyed explosion, which is the
    standard co-citation trap: a viral dst does NOT fan out because
    pairs group by the SOURCE side); one (a, b)-keyed ``grouped_sum``;
    top-k leaves k rows per batch."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)

        def dst(i: int, dd: np.ndarray) -> np.ndarray:
            return (dd - dd % 10) + ((dd + 3 * i) % 10)

        outs_a, outs_b = [], []
        for i, j in ((1, 2), (1, 3), (2, 3)):
            m = d % 3 >= j - 1  # outdeg = 1 + d%3 must reach slot j
            dd = d[m]
            x, y = dst(i, dd), dst(j, dd)
            outs_a.append(np.minimum(x, y))
            outs_b.append(np.maximum(x, y))
        a = np.concatenate(outs_a) if outs_a else np.empty(0, np.int64)
        bb = np.concatenate(outs_b) if outs_b else np.empty(0, np.int64)
        return pd.DataFrame({"dst_a": a, "dst_b": bb, "n_common": np.ones(len(a), np.int64)})

    counts = grouped_sum(
        ds.map_batches(pairs, batch_format="pandas", batch_size=8192),
        ["dst_a", "dst_b"],
        ["n_common"],
    )

    k = int(top_k)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) > k:
            b = b.sort_values(
                ["n_common", "dst_a", "dst_b"], ascending=[False, True, True], kind="mergesort"
            ).head(k)
        return b

    return (
        counts.map_batches(local_topk, batch_format="pandas")
        .sort(["n_common", "dst_a", "dst_b"], descending=[True, False, False])
        .limit(k)
    )


def _cocitation_sql(top_k: int = COCITATION_TOP_K) -> str:
    return f"""
WITH e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
)
SELECT a.dst AS dst_a, b.dst AS dst_b, CAST(COUNT(*) AS BIGINT) AS n_common
FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
GROUP BY 1, 2
ORDER BY n_common DESC, dst_a, dst_b
LIMIT {int(top_k)}
"""


COCITATION_SQL = _cocitation_sql()


# ---------------------------------------------------------------------------
# Edit-distance nearest neighbor among linked pages (template detection)
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    """Exact unit-cost Levenshtein distance, matching DuckDB's
    levenshtein() codepoint for codepoint. numpy row-DP: per source
    char one vectorized min over substitution/deletion, then the
    insertion constraint cur[j] ≤ cur[j-1]+1 applied as a running min
    of (cur - j) (the slack-transform trick — cur[j] ≤ cur[i] + (j-i)
    for i < j is exactly a running min after subtracting the index)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(len(bb) + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(len(bb) + 1, dtype=np.int64)
    for i, ch in enumerate(aa, 1):
        cur[0] = i
        np.minimum(prev[:-1] + (bb != ch), prev[1:] + 1, out=cur[1:])
        cur -= idx
        np.minimum.accumulate(cur, out=cur)
        cur += idx
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_neighbors(sf_dir: str) -> ray.data.Dataset:
    """For every source page, its most text-similar LINKED neighbor by
    exact Levenshtein distance: ``(src, nearest_dst, dist)``, ties by
    smaller dst — the template/mirror detector for pages that link to
    each other (same family as winnow_pairs but metric-exact and
    edge-scoped, so the candidate set is the out-neighborhood, never a
    similarity index).

    Scale shape: two adaptive joins attach src and dst text to the
    edge list (dangling dsts drop out — inner-join semantics shared
    with the oracle); the per-edge DP is a vectorized numpy row scan
    (O(|a|) vector ops of length |b|); the per-src argmin folds with
    one keep-first-style exchange on src. Cost is per-EDGE text
    comparison by design — the out-degree bounds the work per page."""
    from pdf_extractor_ray.ops import grouped_apply

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    edges = document_link_edges(sf_dir)
    j = joins.adaptive_inner_join(edges, docs, on="src", right_on="doc_id")
    j = j.map_batches(
        lambda b: b.rename(columns={"text": "src_text"}), batch_format="pandas"
    )
    j = joins.adaptive_inner_join(j, docs, on="dst", right_on="doc_id")

    def dists(b: pd.DataFrame) -> pd.DataFrame:
        d = np.empty(len(b), np.int64)
        for i, (a, c) in enumerate(zip(b["src_text"], b["text"])):
            d[i] = _levenshtein(a, c)
        return pd.DataFrame(
            {"src": b["src"].to_numpy(np.int64), "dst": b["dst"].to_numpy(np.int64), "dist": d}
        )

    scored = j.map_batches(dists, batch_format="pandas", batch_size=1024)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "dist", "dst"], kind="mergesort")
        top = g.groupby("src", sort=True).first().reset_index()
        return pd.DataFrame(
            {
                "src": top["src"].to_numpy(np.int64),
                "nearest_dst": top["dst"].to_numpy(np.int64),
                "dist": top["dist"].to_numpy(np.int64),
            }
        )

    return grouped_apply(scored, ["src"], per_bucket)


EDIT_NEIGHBORS_SQL = """
WITH e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
d AS (
  SELECT e.src, e.dst,
         CAST(levenshtein(s.text, t.text) AS BIGINT) AS dist,
         ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY levenshtein(s.text, t.text), e.dst) AS rn
  FROM e
  JOIN documents s ON s.doc_id = e.src
  JOIN documents t ON t.doc_id = e.dst
)
SELECT src, dst AS nearest_dst, dist FROM d WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# BFS crawl depth from a seed set (crawl-frontier distance)
# ---------------------------------------------------------------------------

BFS_MAX_ROUNDS = 50


def bfs_depth(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    max_rounds: int = BFS_MAX_ROUNDS,
) -> ray.data.Dataset:
    """Distributed breadth-first search over DIRECTED ``(src, dst)``
    edges: ``(node, depth)`` with depth = minimum hop count from any
    seed — the crawl-frontier distance every crawler tracks (seed
    list → hop-limited expansion; depth is also the classic
    crawl-prioritization feature). ``seeds`` is a Dataset with a
    ``node`` column. Unreachable nodes are absent from the result.

    Synchronous frontier expansion: because every edge has unit
    weight and rounds are strict, a node's FIRST visit is its minimum
    depth (the BFS invariant), so no per-node min-fold is needed —
    each round is one hash join (out-edges of the frontier) and one
    anti semi-join (drop already-visited dsts), both byte-gated
    adaptive plans. Messages are frontier-sized, never graph-sized —
    the whole-table alternative (label_propagation's shape) re-sends
    every node's depth every round. Rounds = eccentricity of the seed
    set (crawl graphs: ~tens); a graph deeper than ``max_rounds``
    raises rather than silently truncating the reachable set. The
    edge table is re-hashed each round — at 100 TB, pre-bucketing
    edges by src hash once (hive-partitioned parquet, the
    ``invindex.py`` shape) and reading only the frontier's buckets
    converts that to a pruned read; documented trade, same results.

    The depth table only ever APPENDS (visited nodes never improve),
    so per-round state is one union + materialize — flat lineage.

    Block-format note: per-round state is rebuilt as ARROW blocks with
    zero-row blocks DROPPED (:func:`_compact_arrow`) — a Ray 2.49
    pandas block loses its column schema at zero rows, ``map_batches``
    passes empty blocks through WITHOUT running the fn (so they can't
    be re-typed in-stream), and the native hash join raises
    ArrowInvalid when a partition holds only schema-less blocks.
    Sparse frontiers produce empty blocks constantly, so each round's
    frontier/visited compaction is what makes iteration stable."""
    import pyarrow as pa

    from pdf_extractor_ray.joins import join_datasets, semi_join
    from pdf_extractor_ray.ops import distinct

    def _nodes(t: pa.Table) -> pa.ChunkedArray:
        if "node" in t.schema.names:
            return t.column("node").cast(pa.int64())
        return pa.chunked_array([pa.array([], pa.int64())])

    def with_depth(k: int):
        def fn(t: pa.Table) -> pa.Table:
            n = _nodes(t)
            return pa.table({"node": n, "depth": pa.array([k] * len(n), pa.int64())})

        return fn

    def pin(t: pa.Table) -> pa.Table:
        # schema-stabilizer: typed single-column table at ANY row count
        return pa.table({"node": _nodes(t)})

    def msg_nodes(t: pa.Table) -> pa.Table:
        if "dst" in t.schema.names:
            return pa.table({"node": t.column("dst").cast(pa.int64())})
        return pa.table({"node": pa.array([], pa.int64())})

    from pdf_extractor_ray.ops import compact_nonempty_arrow as compact

    empty_frontier = pa.table({"node": pa.array([], pa.int64())})
    empty_visited = pa.table(
        {"node": pa.array([], pa.int64()), "depth": pa.array([], pa.int64())}
    )

    frontier = compact(
        distinct(seeds.select_columns(["node"]), ["node"]).map_batches(
            pin, batch_format="pyarrow"
        ),
        empty_frontier,
    )
    visited = compact(
        frontier.map_batches(with_depth(0), batch_format="pyarrow"), empty_visited
    )
    depth = 0
    while frontier.count() > 0:
        depth += 1
        if depth > max_rounds:
            # a partial result would silently claim unreachable nodes
            raise RuntimeError(
                f"BFS frontier still non-empty after {max_rounds} rounds "
                "(seed-set eccentricity exceeds max_rounds); raise max_rounds"
            )
        msgs = join_datasets(edges, frontier, on="src", right_on="node").map_batches(
            msg_nodes, batch_format="pyarrow"
        )
        frontier = compact(
            semi_join(distinct(msgs, ["node"]), visited, "node", keep=False).map_batches(
                pin, batch_format="pyarrow"
            ),
            empty_frontier,
        )
        visited = compact(
            visited.union(frontier.map_batches(with_depth(depth), batch_format="pyarrow")),
            empty_visited,
        )
    return visited


def crawl_depth_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: BFS depth over the document link graph from the
    block-head seed set (``doc_id % 10 == 0``) — ``(node, depth)`` for
    every reachable node. The oracle replays it as a recursive-CTE
    shortest-path; its recursion cap (12) is strictly above the
    maximum possible eccentricity inside a 10-id block, an oracle-side
    bound only — the engine iterates to frontier exhaustion with no
    depth parameter."""
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    seeds = docs.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["doc_id"].to_numpy(np.int64)[b["doc_id"].to_numpy(np.int64) % 10 == 0]}
        ),
        batch_format="pandas",
    )
    return bfs_depth(document_link_edges(sf_dir), seeds)


CRAWL_DEPTH_SQL = """
WITH RECURSIVE e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
reach AS (
  SELECT doc_id AS node, 0 AS d FROM documents WHERE doc_id % 10 = 0
  UNION
  SELECT e.dst, reach.d + 1 FROM reach JOIN e ON e.src = reach.node WHERE reach.d < 12
)
SELECT node, CAST(MIN(d) AS BIGINT) AS depth FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Degree distribution + reciprocal-link detection over the link graph
# ---------------------------------------------------------------------------


def degree_histogram(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Degree distribution of an ``(src, dst)`` edge Dataset:
    ``(direction, degree, n_nodes)`` for direction ∈ {'out', 'in'} —
    the first chart every web-graph audit draws (in-degree tails
    reveal link farms and super-hubs; out-degree tails reveal index
    pages). Nodes with zero edges in a direction are absent from that
    direction's rows, matching the edge-list-defined-graph convention.

    Scale shape: per direction, one ``grouped_sum`` keyed by node
    (8-byte keys, per-batch partials bound hot nodes) folds to
    per-node degrees, then a second tiny ``grouped_sum`` keyed by
    degree value builds the histogram — the second exchange's key
    space is the number of DISTINCT degrees, not nodes."""
    from pdf_extractor_ray.ops import grouped_sum

    def hist(direction: str, col: str) -> ray.data.Dataset:
        def keyed(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": b[col].to_numpy(np.int64), "c": np.ones(len(b), np.int64)}
            )

        deg = grouped_sum(edges.map_batches(keyed, batch_format="pandas"), ["node"], ["c"])

        def to_deg(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"degree": b["c"].to_numpy(np.int64), "n_nodes": np.ones(len(b), np.int64)}
            )

        h = grouped_sum(deg.map_batches(to_deg, batch_format="pandas"), ["degree"], ["n_nodes"])

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b.insert(0, "direction", direction)
            return b

        return h.map_batches(tag, batch_format="pandas")

    return hist("out", "src").union(hist("in", "dst"))


def degree_histogram_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: degree distribution of the document link graph."""
    return degree_histogram(document_link_edges(sf_dir))


DEGREE_HISTOGRAM_SQL = """
WITH e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
o AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY src),
i AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY dst)
SELECT 'out' AS direction, degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM o GROUP BY degree
UNION ALL
SELECT 'in' AS direction, degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM i GROUP BY degree
"""


def reciprocal_links(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Unordered page pairs linked in BOTH directions — the mutual-link
    signal link-spam and mirror detectors key on (a reciprocal edge is
    far likelier navigation/mirroring than endorsement). Output
    ``(src, dst)`` with src < dst. Robust to duplicate edges and
    self-loops (deduped / dropped).

    Scale shape: no self-join — each edge folds to its unordered pair
    key plus a direction BIT; after a distinct on (pair, bit), one
    ``grouped_sum`` keyed by the 16-byte pair sums the bits, and
    bits == 3 means both directions were present. One exchange instead
    of the classic edges⋈edgesᵀ hash join (half the shuffled bytes,
    no join skew on hub nodes)."""
    from pdf_extractor_ray.ops import distinct, grouped_sum

    def pair_bits(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        z = np.maximum(s, d)
        bit = np.where(s < d, 1, 2).astype(np.int64)
        return pd.DataFrame({"a": a, "b": z, "bit": bit})

    pairs = distinct(
        edges.map_batches(pair_bits, batch_format="pandas"), ["a", "b", "bit"]
    )
    summed = grouped_sum(pairs, ["a", "b"], ["bit"])

    def keep_mutual(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["bit"] == 3]
        return pd.DataFrame(
            {"src": m["a"].to_numpy(np.int64), "dst": m["b"].to_numpy(np.int64)}
        )

    return summed.map_batches(keep_mutual, batch_format="pandas")


def reciprocal_links_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: the base block-local edges never reciprocate (offsets
    3/6/9 can't sum to 0 mod 10 within i, j ≤ 3), so the carrier
    augments them with back-links from even sources — 'half the pages
    link back' — and the engine must DISCOVER exactly those pairs from
    the combined edge list via the generic pair-bit fold."""
    base = document_link_edges(sf_dir)

    def backlinks(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        m = s % 2 == 0
        return pd.DataFrame({"src": d[m], "dst": s[m]})

    return reciprocal_links(base.union(base.map_batches(backlinks, batch_format="pandas")))


RECIPROCAL_LINKS_SQL = """
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0
    UNION ALL
    SELECT dst AS src, src AS dst FROM e0 WHERE src % 2 = 0
  ) WHERE src <> dst
)
SELECT e.src, e.dst
FROM e JOIN e r ON r.src = e.dst AND r.dst = e.src
WHERE e.src < e.dst
"""


# ---------------------------------------------------------------------------
# Triangle counting (compact-forward wedge closure)
# ---------------------------------------------------------------------------

_TRI_KEY_SCALE = 1 << 31


def triangle_counts(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-node triangle participation over the UNDIRECTED graph of an
    ``(src, dst)`` edge Dataset: ``(node, n_triangles)`` for every node
    in at least one triangle — the clustering-coefficient numerator and
    the classic link-farm/community signal (spam clusters are triangle-
    dense; genuine endorsement graphs are triangle-sparse).

    Compact-forward shape (Latapy 2008's distributed form): symmetrize
    + dedup to oriented edges ``a < b`` (each triangle counted exactly
    once as an ordered triple a<b<c), one hash join on the wedge
    middle vertex builds candidate wedges, one semi-join against the
    packed edge keys closes them, one exchange folds per-node counts.
    Wedge volume is Σ_b d⁻(b)·d⁺(b) under id orientation — the
    production upgrade is degree ordering (orient by (degree, id)),
    which provably minimizes that sum on skewed graphs; same results,
    one extra degree join, noted not needed at this graph's bounded
    degree. Node ids must fit 31 bits for the packed (a, c) closure
    key (checked; widen the pack for larger id spaces)."""
    from pdf_extractor_ray.joins import join_datasets, semi_join
    from pdf_extractor_ray.ops import distinct, grouped_sum

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) and (min(s.min(), d.min()) < 0 or max(s.max(), d.max()) >= _TRI_KEY_SCALE):
            raise ValueError("node ids outside [0, 2^31) — widen the closure key pack")
        return pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    # arrow-pin + drop empty blocks: distinct's empty buckets yield
    # schema-less zero-row pandas blocks that the native wedge join
    # rejects (see ops.compact_nonempty_arrow) — degenerate graphs
    # (all self-loops, no edges after dedup) crash without this
    import pyarrow as pa

    from pdf_extractor_ray.ops import compact_nonempty_arrow

    def to_arrow_ab(t: "pa.Table") -> "pa.Table":
        if "a" in t.schema.names:
            return pa.table(
                {"a": t.column("a").cast(pa.int64()), "b": t.column("b").cast(pa.int64())}
            )
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})

    und = compact_nonempty_arrow(
        distinct(edges.map_batches(orient, batch_format="pandas"), ["a", "b"]).map_batches(
            to_arrow_ab, batch_format="pyarrow"
        ),
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}),
    )

    _result_empty = pa.table(
        {"node": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())}
    )
    # compact materializes, so count() here is metadata-only; an edge
    # set that dedups to nothing (all self-loops) has no triangles —
    # and its empty blocks would SKIP the map fns below, reaching the
    # joins with the wrong column set
    if und.count() == 0:
        return ray.data.from_arrow(_result_empty)

    def _i64(t: "pa.Table", col: str) -> "pa.ChunkedArray":
        return t.column(col).cast(pa.int64())

    second = und.map_batches(
        lambda t: pa.table({"b": _i64(t, "a"), "c": _i64(t, "b")}),
        batch_format="pyarrow",
    )

    # the wedge join and closure semi-join each emit empty partitions
    # whose pass-through blocks carry the WRONG (or no) schema for the
    # next keyed stage — compact at both boundaries (same metadata-only
    # pass as the und pin above)
    _wedge_empty = pa.table({c: pa.array([], pa.int64()) for c in ("a", "b", "c", "ack")})

    def pack_ac(t: "pa.Table") -> "pa.Table":
        if "a" not in t.schema.names or "c" not in t.schema.names:
            return _wedge_empty
        a, bb, c = _i64(t, "a"), _i64(t, "b"), _i64(t, "c")
        ack = pa.chunked_array(
            [
                pa.array(
                    a.combine_chunks().to_numpy(zero_copy_only=False) * _TRI_KEY_SCALE
                    + c.combine_chunks().to_numpy(zero_copy_only=False),
                    pa.int64(),
                )
            ]
        )
        return pa.table({"a": a, "b": bb, "c": c, "ack": ack})

    wedges = compact_nonempty_arrow(
        join_datasets(und, second, on="b").map_batches(pack_ac, batch_format="pyarrow"),
        _wedge_empty,
    )  # (a, b, c) with a < b < c, plus the packed closure key

    if wedges.count() == 0:  # no wedges → no triangles
        return ray.data.from_arrow(_result_empty)

    def pack_ab(t: "pa.Table") -> "pa.Table":
        a = _i64(t, "a").combine_chunks().to_numpy(zero_copy_only=False)
        b2 = _i64(t, "b").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"ek": pa.array(a * _TRI_KEY_SCALE + b2, pa.int64())})

    closed = compact_nonempty_arrow(
        semi_join(wedges, und.map_batches(pack_ab, batch_format="pyarrow"), on="ack", right_on="ek"),
        _wedge_empty,
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        if "a" not in b.columns:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"), "n_triangles": pd.Series([], dtype="int64")}
            )
        nodes = np.concatenate(
            [b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64), b["c"].to_numpy(np.int64)]
        )
        return pd.DataFrame({"node": nodes, "n_triangles": np.ones(len(nodes), np.int64)})

    return grouped_sum(
        closed.map_batches(explode, batch_format="pandas"), ["node"], ["n_triangles"]
    )


def triangle_counts_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: triangle participation over the (symmetrized) document
    link graph — 12 triangles per full 10-id block, so the closure has
    real work at every scale factor."""
    return triangle_counts(document_link_edges(sf_dir))


TRIANGLE_COUNTS_SQL = """
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
u AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM u e1
  JOIN u e2 ON e2.a = e1.b
  JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b
),
n AS (SELECT unnest([a, b, c]) AS node FROM tri)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM n GROUP BY node
"""


# ---------------------------------------------------------------------------
# Redirect-chain resolution (pointer jumping / path doubling)
# ---------------------------------------------------------------------------


def resolve_pointers(
    ptr: ray.data.Dataset, *, max_rounds: int = 30
) -> ray.data.Dataset:
    """Resolve every pointer chain in a ``(node, nxt, hops)`` table to
    its terminal: returns one row per node with ``nxt`` = the chain's
    final node and ``hops`` = total chain length. Terminals are rows
    with ``node == nxt`` (``hops`` must be 0 there); every ``nxt``
    value must appear as some row's ``node`` (total pointer function).

    The crawl use case is redirect resolution: a 301/302 map
    ``url → location`` becomes a pointer table, and the final landing
    URL per source is what canonical-URL assignment and link-graph
    rewriting key on (Common Crawl resolves redirects the same way
    before building its host graph). The reference has no analog.

    Scale shape: path doubling — each round substitutes every row's
    target with that target's CURRENT target (``ptr ⋈ ptr`` on
    ``nxt = node``, one hash exchange keyed on 8-byte node ids), so a
    chain of length L resolves in ⌈log2 L⌉ rounds, not L. The round
    count is data-driven (stop when no row advanced) with
    ``max_rounds`` as a cycle guard: 30 rounds resolve chains up to
    ~1e9 hops, and a genuine redirect CYCLE (a→b→a) would otherwise
    never terminate — raising beats silently emitting a mid-cycle
    node. Per-round state is rebuilt as typed Arrow blocks with
    zero-row blocks dropped (the Ray 2.49 schema-loss guard, same as
    :func:`bfs_depth`)."""
    import pyarrow as pa

    from pdf_extractor_ray.ops import compact_nonempty_arrow as compact

    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "nxt": pa.array([], pa.int64()),
            "hops": pa.array([], pa.int64()),
        }
    )

    def pin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "nxt": t.column("nxt").cast(pa.int64()),
                "hops": t.column("hops").cast(pa.int64()),
            }
        )

    def as_target(t: pa.Table) -> pa.Table:
        # the join's build side: where each TARGET node currently
        # points, renamed so the joined row carries both halves
        return pa.table(
            {
                "t_node": t.column("node").cast(pa.int64()),
                "t_nxt": t.column("nxt").cast(pa.int64()),
                "t_hops": t.column("hops").cast(pa.int64()),
            }
        )

    def advance(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "nxt": t.column("t_nxt").cast(pa.int64()),
                "hops": pc.add(
                    t.column("hops").cast(pa.int64()), t.column("t_hops").cast(pa.int64())
                ),
            }
        )

    ptr = compact(ptr.map_batches(pin, batch_format="pyarrow"), empty)
    for _ in range(max_rounds):
        targets = compact(ptr.map_batches(as_target, batch_format="pyarrow"), empty)
        joined = joins.join_datasets(ptr, targets, on="nxt", right_on="t_node").materialize()

        def moved_partial(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.sum(pc.cast(pc.greater(t.column("t_hops"), 0), pa.int64())).as_py()
            return pa.table({"moved": pa.array([int(m or 0)], pa.int64())})

        # fixpoint: nobody's target moved this round (all t_hops == 0);
        # vectorized per-batch partials, one scalar per block
        moved = joined.map_batches(moved_partial, batch_format="pyarrow").sum("moved")
        ptr = compact(joined.map_batches(advance, batch_format="pyarrow"), empty)
        if not moved:
            return ptr
    raise RuntimeError(
        f"pointer chains unresolved after {max_rounds} doubling rounds "
        "(cycle in the pointer table, or raise max_rounds)"
    )


def resolve_redirects_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: resolve the planted redirect map over documents
    — ids with ``doc_id % 4 != 0 and doc_id % 9 != 0`` redirect to
    ``doc_id - 1`` (runs of consecutive such ids form multi-hop
    chains, length ≤ 3) — to ``(doc_id, final_id, n_hops)`` for every
    doc. The oracle replays the chain as a recursive CTE; the engine
    path-doubles with no chain-length parameter."""
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def to_ptr(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)
        redir = (d % 4 != 0) & (d % 9 != 0)
        return pd.DataFrame(
            {
                "node": d,
                "nxt": np.where(redir, d - 1, d),
                "hops": redir.astype(np.int64),
            }
        )

    out = resolve_pointers(docs.map_batches(to_ptr, batch_format="pandas", batch_size=8192))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["node"].to_numpy(np.int64),
                "final_id": b["nxt"].to_numpy(np.int64),
                "n_hops": b["hops"].to_numpy(np.int64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


RESOLVE_REDIRECTS_SQL = """
WITH RECURSIVE r AS (
  SELECT doc_id AS node, doc_id AS cur, 0 AS hops FROM documents
  UNION ALL
  SELECT node, cur - 1, hops + 1 FROM r
  WHERE cur % 4 != 0 AND cur % 9 != 0
)
SELECT node AS doc_id, CAST(cur AS BIGINT) AS final_id, CAST(hops AS BIGINT) AS n_hops
FROM r WHERE cur % 4 = 0 OR cur % 9 = 0
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peel) — link-farm / graph-density signal
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_MAX_ROUNDS = 50
# SQL unroll margin: the peel reaches fixpoint in 4 rounds on the
# derived graph (measured at sf0.001 and sf0.1); extra rounds are
# no-ops at fixpoint, so 8 is safely past convergence at any test SF.
KCORE_SQL_ROUNDS = 8


def kcore(
    edges: ray.data.Dataset, k: int = KCORE_K, *, max_rounds: int = KCORE_MAX_ROUNDS
) -> ray.data.Dataset:
    """k-core decomposition over an UNDIRECTED view of ``(src, dst)``
    edges (each directed edge contributes one degree to both
    endpoints): iteratively remove nodes with degree < k and their
    incident edges until fixpoint, return ``(node, deg)`` — the
    surviving nodes with their within-core degree. The k-core is the
    classic link-farm / dense-community detector (spam farms are
    high-k cores; genuine content graphs peel away quickly), and the
    peel count bounds graph degeneracy.

    Scale shape: each round is one endpoint explode → bucketed degree
    count (per-batch partials bound viral nodes) → keep-set → two
    adaptive semi-joins trimming the edge list. Messages are
    node-table-sized, never quadratic. Fixpoint detection compares the
    surviving-edge COUNT between rounds (peeling strictly shrinks the
    edge set until fixpoint). Rounds = peel depth (real crawl graphs:
    tens); ``max_rounds`` raises rather than returning a half-peeled
    core. Per-round Arrow compaction drops zero-row blocks (the Ray
    2.49 schema-loss guard shared with :func:`bfs_depth`)."""
    import pyarrow as pa

    from pdf_extractor_ray.joins import semi_join
    from pdf_extractor_ray.ops import compact_nonempty_arrow as compact
    from pdf_extractor_ray.ops import grouped_sum

    empty_edges = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    empty_deg = pa.table(
        {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
    )

    def pin_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t.column("src").cast(pa.int64()), "dst": t.column("dst").cast(pa.int64())}
        )

    def endpoints(t: pa.Table) -> pa.Table:
        s, d = t.column("src").cast(pa.int64()), t.column("dst").cast(pa.int64())
        node = pa.chunked_array(s.chunks + d.chunks) if s.num_chunks else s
        return pa.table(
            {"node": node, "c": pa.array(np.ones(len(t) * 2, np.int64))}
        )

    def degrees(es: ray.data.Dataset) -> ray.data.Dataset:
        return grouped_sum(
            es.map_batches(endpoints, batch_format="pyarrow"), ["node"], ["c"]
        )

    cur = compact(edges.map_batches(pin_edges, batch_format="pyarrow"), empty_edges).materialize()
    n_edges = cur.count()
    rounds = 0
    while n_edges > 0:
        deg = degrees(cur)

        def keep_fn(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[b["c"] >= k, ["node"]]

        keep = compact(
            deg.map_batches(keep_fn, batch_format="pandas").map_batches(
                lambda t: pa.table({"node": t.column("node").cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            pa.table({"node": pa.array([], pa.int64())}),
        ).materialize()
        if keep.count() == 0:
            return ray.data.from_arrow(empty_deg)
        trimmed = semi_join(cur, keep, "src", right_on="node")
        trimmed = semi_join(trimmed, keep, "dst", right_on="node")
        trimmed = compact(
            trimmed.map_batches(pin_edges, batch_format="pyarrow"), empty_edges
        ).materialize()
        m = trimmed.count()
        if m == n_edges:
            break  # fixpoint: every surviving node already has deg >= k
        cur, n_edges = trimmed, m
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"k-core peel still shrinking after {max_rounds} rounds "
                "(peel depth exceeds max_rounds); raise max_rounds"
            )

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "deg": b["c"].to_numpy(np.int64)}
        )

    if n_edges == 0:
        return ray.data.from_arrow(empty_deg)
    return degrees(cur).map_batches(rename, batch_format="pandas")


def kcore_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier: k-core (k=3) of the derived document link graph
    — ``(node, deg)``; oracle = the peel unrolled as chained CTEs
    (:data:`KCORE_SQL_ROUNDS` rounds, safely past the measured
    fixpoint)."""
    return kcore(document_link_edges(sf_dir), KCORE_K)


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_SQL_ROUNDS) -> str:
    # MATERIALIZED: each round references the previous edge set several
    # times — without materialization DuckDB inlines the CTE chain and
    # the plan (and its file opens) grows exponentially in `rounds`
    ctes = [
        """e0 AS MATERIALIZED (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
)"""
    ]
    for r in range(1, int(rounds) + 1):
        ctes.append(
            f"""d{r} AS MATERIALIZED (
  SELECT node FROM (
    SELECT src AS node FROM e{r - 1} UNION ALL SELECT dst AS node FROM e{r - 1}
  ) GROUP BY node HAVING COUNT(*) >= {int(k)}
),
e{r} AS MATERIALIZED (
  SELECT src, dst FROM e{r - 1}
  WHERE src IN (SELECT node FROM d{r}) AND dst IN (SELECT node FROM d{r})
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
  SELECT src AS node FROM e{int(rounds)} UNION ALL SELECT dst AS node FROM e{int(rounds)}
) GROUP BY node"""
    )


KCORE_SQL = _kcore_sql()


# ---------------------------------------------------------------------------
# One-hop link-quality smoothing (neighborhood quality propagation)
# ---------------------------------------------------------------------------


def quality_smooth_documents(sf_dir: str) -> ray.data.Dataset:
    """One-hop quality smoothing over the link graph: every document's
    raw quality (``n_chars``, the integer proxy the corpus carries)
    is averaged with its IN-NEIGHBORS' quality —
    ``q_smooth = (q(v) + Σ_{u→v} q(u)) // (1 + indeg(v))`` with exact
    floor arithmetic (non-negative operands, so Python ``//``, numpy
    and DuckDB ``//`` agree). The "a page is as good as the pages
    that link to it" smoothing step quality-propagation curation runs
    before thresholding — one PageRank-flavored hop without the
    iteration. Dangling link targets (ids past the corpus edge) have
    no self row and are excluded; documents nobody links to keep
    ``q_smooth = q``.

    Scale shape: ZERO joins — the edge derive carries the source's
    own n_chars (q(src) rides the edge emission), self rows carry a
    marker, and ONE bucketed grouped_sum over doc_id folds both; a
    viral in-hub is bounded by per-batch partials."""
    from pdf_extractor_ray.ops import grouped_sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy(np.int64)
        q = b["n_chars"].to_numpy(np.int64)
        ids = [d]
        s = [q]  # self row: contributes q(v) to the numerator sum
        c = [np.zeros(len(d), np.int64)]  # ...but 0 to indeg
        m = [np.ones(len(d), np.int64)]  # self marker
        qs = [q]  # qself: the self row carries v's own quality
        for i in (1, 2, 3):
            mask = d % 3 >= i - 1
            src = d[mask]
            ids.append((src - src % 10) + ((src + 3 * i) % 10))
            s.append(q[mask])
            c.append(np.ones(mask.sum(), np.int64))
            m.append(np.zeros(mask.sum(), np.int64))
            qs.append(np.zeros(mask.sum(), np.int64))
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids),
                "s": np.concatenate(s),
                "c": np.concatenate(c),
                "m": np.concatenate(m),
                "qself": np.concatenate(qs),
            }
        )

    summed = grouped_sum(
        ds.map_batches(emit, batch_format="pandas"), ["doc_id"], ["s", "c", "m", "qself"]
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["m"] == 1]  # drop dangling targets (no self row)
        s = b["s"].to_numpy(np.int64)
        c = b["c"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "q_chars": b["qself"].to_numpy(np.int64),
                "q_smooth": s // (1 + c),
            }
        )

    return summed.map_batches(finish, batch_format="pandas")


QUALITY_SMOOTH_SQL = """
WITH e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
contrib AS (
  SELECT e.dst AS doc_id, d.n_chars AS q
  FROM e JOIN documents d ON d.doc_id = e.src
),
agg AS (
  SELECT doc_id, SUM(q) AS s, COUNT(*) AS c FROM contrib GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.n_chars AS BIGINT) AS q_chars,
       CAST((d.n_chars + COALESCE(a.s, 0)) // (1 + COALESCE(a.c, 0)) AS BIGINT) AS q_smooth
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# Dangling-link rate (frontier-discovery pressure per page)
# ---------------------------------------------------------------------------


def dangling_links(
    edges: ray.data.Dataset, members: ray.data.Dataset
) -> ray.data.Dataset:
    """Per-source dangling-outlink audit: how many of each node's
    out-edges point OUTSIDE the member set (a ``doc_id`` column) —
    ``(doc_id, n_links, n_dangling)``. The dangling rate is the
    frontier-discovery pressure a crawl scheduler budgets against
    (every dangling edge is an uncrawled URL a BFS round would
    enqueue) and the mass PageRank loses to the teleport.

    Scale shape: the membership test is ONE adaptive semi/anti-join
    split of the edge stream against the member id column (byte-gated
    broadcast or hash exchange, never a driver set); counts fold in
    one src-keyed grouped_sum with per-batch partials."""
    from pdf_extractor_ray.joins import semi_join
    from pdf_extractor_ray.ops import grouped_sum

    docs = members

    def mark(dangling: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": b["src"].to_numpy(np.int64),
                    "n_links": np.ones(len(b), np.int64),
                    "n_dangling": np.full(len(b), dangling, np.int64),
                }
            )

        return fn

    kept = semi_join(edges, docs, "dst", right_on="doc_id", keep=True)
    dropped = semi_join(edges, docs, "dst", right_on="doc_id", keep=False)
    marked = kept.map_batches(mark(0), batch_format="pandas").union(
        dropped.map_batches(mark(1), batch_format="pandas")
    )
    return grouped_sum(marked, ["doc_id"], ["n_links", "n_dangling"])


def dangling_links_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver carrier over the derived link graph. NOTE: at dense test
    ids every 10-id block is fully populated, so the corpus has zero
    dangling edges — the oracle then pins that the anti-join path
    produces exactly zero FALSE positives; the planted-dangling test
    exercises the non-zero path on a sparse member set."""
    edges = document_link_edges(sf_dir)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return dangling_links(edges, docs)


DANGLING_LINKS_SQL = """
WITH e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
)
SELECT e.src AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dangling
FROM e LEFT JOIN documents d ON d.doc_id = e.dst
GROUP BY e.src
"""


# ---------------------------------------------------------------------------
# Alias resolution: redirect chain ∘ canonical declaration
# ---------------------------------------------------------------------------


def alias_resolution_documents(sf_dir: str) -> ray.data.Dataset:
    """Unified alias key per document: follow the redirect chain to its
    final page (path-doubled :func:`resolve_pointers`, the
    resolve_redirects map), then take THAT page's rel=canonical
    declaration (REAL head harvest over the canonical-carrier pages) —
    ``(doc_id, alias_url)``. This is the full identity fold a crawl
    dedup runs before any content hashing: HTTP-level aliases
    (redirects) and markup-level aliases (canonical) collapse into one
    key in the right order — canonical is read off the page you END on,
    not the one you started at.

    Scale shape: the path-doubling rounds (log chain length), then ONE
    adaptive join attaching the final page's harvested canonical. The
    canonical harvest itself is the zero-shuffle batch parse."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.kernels.html_extract import html_extract_meta
    from pdf_extractor_ray.pipelines.webdocs import derive_canonical_pages

    resolved = resolve_redirects_documents(sf_dir)
    pages = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(derive_canonical_pages, batch_format="pandas", batch_size=1024)

    def harvest(b: pd.DataFrame) -> pd.DataFrame:
        ids, keys = [], []
        for doc_id, raw in zip(b["doc_id"], b["html"]):
            d = int(doc_id)
            canon = html_extract_meta(bytes(raw))["canonical"]
            ids.append(d)
            keys.append(canon if canon else f"https://docs.example.com/{d}")
        return pd.DataFrame(
            {
                "final_id": pd.Series(ids, dtype="int64"),
                "alias_url": pd.Series(keys, dtype="object"),
            }
        )

    canon = pages.map_batches(harvest, batch_format="pandas", batch_size=1024)
    joined = adaptive_inner_join(resolved, canon, on="final_id")
    return joined.select_columns(["doc_id", "alias_url"])


ALIAS_RESOLUTION_SQL = """
WITH RECURSIVE r AS (
  SELECT doc_id AS node, doc_id AS cur FROM documents
  UNION ALL
  SELECT node, cur - 1 FROM r WHERE cur % 4 != 0 AND cur % 9 != 0
),
f AS (SELECT node AS doc_id, cur AS final_id FROM r WHERE cur % 4 = 0 OR cur % 9 = 0)
SELECT doc_id,
       'https://docs.example.com/' ||
           CAST(CASE WHEN final_id % 9 = 0 THEN final_id
                     ELSE final_id - final_id % 4 END AS VARCHAR) AS alias_url
FROM f
"""


# ---------------------------------------------------------------------------
# Personalized PageRank (seed-biased crawl importance)
# ---------------------------------------------------------------------------

PPR_SEED_MOD = 17  # seeds = doc ids ≡ 0 (mod 17) — deterministic seed set


def ppr_documents(sf_dir: str, iters: int = PAGERANK_ITERS) -> ray.data.Dataset:
    """Personalized PageRank over the document link graph with the
    deterministic seed set ``doc_id % 17 == 0`` — ``(node,
    rank_micro)``. Seed-biased importance is how a focused crawl
    scores the frontier (pages near trusted seeds outrank globally
    popular ones); exact int64 fixed-point, the classical-PageRank
    machinery with teleport confined to seeds."""
    import pyarrow.parquet as _pq

    src = os.path.join(sf_dir, "documents.parquet")
    ids = _pq.read_table(src, columns=["doc_id"])["doc_id"].to_numpy()
    seeds = frozenset(int(d) for d in ids if int(d) % PPR_SEED_MOD == 0)
    return pagerank(document_link_edges(sf_dir), iters=iters, personalization=seeds)


def _ppr_sql(iters: int = PAGERANK_ITERS) -> str:
    """Personalized variant of the unrolled PageRank CTE: init mass and
    per-round base are CASE-gated on seed membership."""
    seed = f"node % {PPR_SEED_MOD} = 0"
    ctes = [
        f"""e AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
it0 AS (SELECT node, CAST(CASE WHEN {seed} THEN 1000000 ELSE 0 END AS BIGINT) AS r FROM nodes)"""
    ]
    for k in range(1, int(iters) + 1):
        ctes.append(
            f"""it{k} AS (
  SELECT n.node,
         CAST(CASE WHEN n.node % {PPR_SEED_MOD} = 0 THEN {PAGERANK_BASE_MICRO} ELSE 0 END
              + ({PAGERANK_DAMP_MILLI} * COALESCE(SUM(rr.r // d.outdeg), 0)) // 1000 AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN deg d ON d.src = e.src
  LEFT JOIN it{k - 1} rr ON rr.node = e.src
  GROUP BY n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_micro FROM it{int(iters)}"
    )


PPR_SQL = _ppr_sql()


# ---------------------------------------------------------------------------
# Two-hop reach (friends-of-friends neighborhood size)
# ---------------------------------------------------------------------------


def two_hop_reach_documents(sf_dir: str) -> ray.data.Dataset:
    """Distinct nodes reachable within TWO directed hops of each page
    (self excluded) — ``(doc_id, n_reach2)``. The 2-hop neighborhood
    size separates hub-adjacent pages from cul-de-sacs (a crawl-
    frontier value signal) and is the cheapest reachability feature a
    link graph yields beyond degree.

    Scale shape: one self-join of the edge table (hop-2 pairs; per-src
    fan-out bounded by outdeg², with per-hub caps the production knob
    on skewed graphs), one union with the hop-1 pairs, one distinct
    exchange on (src, node), one count fold."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import distinct, grouped_sum

    edges = document_link_edges(sf_dir)

    def hop1(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": b["src"].to_numpy(np.int64),
                "node": b["dst"].to_numpy(np.int64),
            }
        )

    def mid(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "mid": b["src"].to_numpy(np.int64),
                "node": b["dst"].to_numpy(np.int64),
            }
        )

    h1 = edges.map_batches(hop1, batch_format="pandas")
    h2 = adaptive_inner_join(
        h1.map_batches(
            lambda b: pd.DataFrame(
                {"src": b["src"].to_numpy(np.int64), "mid": b["node"].to_numpy(np.int64)}
            ),
            batch_format="pandas",
        ),
        edges.map_batches(mid, batch_format="pandas"),
        on="mid",
    ).select_columns(["src", "node"])

    pairs = distinct(h1.union(h2), ["src", "node"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["src"] != b["node"]]  # self excluded
        return pd.DataFrame(
            {
                "doc_id": b["src"].to_numpy(np.int64),
                "n_reach2": np.ones(len(b), np.int64),
            }
        )

    return grouped_sum(pairs.map_batches(count, batch_format="pandas"), ["doc_id"], ["n_reach2"])


TWO_HOP_REACH_SQL = """
WITH e AS MATERIALIZED (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
p AS (
  SELECT src, dst AS node FROM e
  UNION
  SELECT a.src, b.dst AS node FROM e a JOIN e b ON b.src = a.dst
)
SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_reach2
FROM p WHERE node <> src GROUP BY src
"""


# ---------------------------------------------------------------------------
# Local clustering coefficient (triangles ∘ degrees)
# ---------------------------------------------------------------------------


def clustering_coefficient(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-node local clustering coefficient over the undirected graph
    of an ``(src, dst)`` edge Dataset: ``(node, degree, n_triangles,
    clustering_milli)`` with ``clustering_milli = 2000·t(v) //
    (d(v)·(d(v)−1))`` (integer milli-units; 0 when degree < 2). The
    community-vs-link-farm discriminator built from parts this engine
    already has: :func:`triangle_counts` for the numerator, one
    endpoint-explode + grouped count for the denominator, one
    node-keyed left join to combine — no new exchange shape."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import distinct, grouped_sum

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct(edges.map_batches(orient, batch_format="pandas"), ["a", "b"])

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)]),
                "degree": np.ones(2 * len(b), np.int64),
            }
        )

    deg = grouped_sum(und.map_batches(endpoints, batch_format="pandas"), ["node"], ["degree"])
    tri = triangle_counts(edges)
    joined = adaptive_inner_join(deg, tri, on="node", how="left_outer")

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        d = b["degree"].to_numpy(np.int64)
        t = b["n_triangles"].fillna(0).to_numpy(np.int64)
        denom = d * (d - 1)
        coeff = np.where(denom >= 2, 2000 * t // np.maximum(denom, 1), 0)
        return pd.DataFrame(
            {
                "node": b["node"].to_numpy(np.int64),
                "degree": d,
                "n_triangles": t,
                "clustering_milli": coeff.astype(np.int64),
            }
        )

    return joined.map_batches(finalize, batch_format="pandas")


def clustering_coeff_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: local clustering coefficient over the document link
    graph (same derived edges as :func:`triangle_counts_documents`)."""
    return clustering_coefficient(document_link_edges(sf_dir))


CLUSTERING_COEFF_SQL = """
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
u AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS node FROM u UNION ALL SELECT b AS node FROM u)
  GROUP BY node
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM u e1
  JOIN u e2 ON e2.a = e1.b
  JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b
),
tn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node
)
SELECT d.node, d.degree,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.degree >= 2
                 THEN 2000 * COALESCE(t.n_triangles, 0) // (d.degree * (d.degree - 1))
                 ELSE 0 END AS BIGINT) AS clustering_milli
FROM deg d LEFT JOIN tn t USING (node)
"""


# ---------------------------------------------------------------------------
# Common-neighbor link prediction (wedge count minus existing edges)
# ---------------------------------------------------------------------------


def common_neighbor_candidates(edges: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """Link-prediction candidates over the undirected graph of an
    ``(src, dst)`` edge Dataset: the top-``k`` NON-adjacent pairs by
    common-neighbor count → ``(a, b, n_common)``, tie-broken on
    ``(a, b)`` for determinism — the classic common-neighbors score
    (Liben-Nowell & Kleinberg) a crawl uses to propose related-page
    pairs.

    Scale shape: wedges are emitted per MIDDLE node from its grouped
    neighbor list (one exchange; per-node cost is degree², the same
    bound as :func:`triangle_counts` — a viral hub needs a degree cap
    upstream, documented there), counted with a second exchange, and
    existing edges are removed by a UNION-tag fold on the pair key
    (no composite-int key that could overflow on wide id spans, no
    driver-side edge set). The final top-k sorts the candidate table,
    which is wedge-bounded, never corpus-sized."""
    from pdf_extractor_ray.ops import distinct, grouped_apply, grouped_sum

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct(edges.map_batches(orient, batch_format="pandas"), ["a", "b"])

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)]),
                "nb": np.concatenate([b["b"].to_numpy(np.int64), b["a"].to_numpy(np.int64)]),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pandas")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("node", sort=False):
            nb = np.sort(grp["nb"].to_numpy(np.int64))
            if len(nb) < 2:
                continue
            ia, ib = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"a": nb[ia], "b": nb[ib]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["n_common"] = np.int64(1)
        out["is_edge"] = np.int64(0)
        return out

    cand = grouped_apply(adj, ["node"], wedges)

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["a", "b"]].copy()
        out["n_common"] = np.int64(0)
        out["is_edge"] = np.int64(1)
        return out

    tagged = cand.union(und.map_batches(tag_edges, batch_format="pandas"))
    folded = grouped_sum(tagged, ["a", "b"], ["n_common", "is_edge"])

    def keep_nonadjacent(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["is_edge"] == 0) & (b["n_common"] > 0)
        return b.loc[m, ["a", "b", "n_common"]]

    nonadj = folded.map_batches(keep_nonadjacent, batch_format="pandas")
    # wedge-bounded table; descending score with (a, b) tiebreak
    return nonadj.sort(["n_common", "a", "b"], descending=[True, False, False]).limit(k)


def link_prediction_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: common-neighbor link prediction over the document link
    graph (same derived edges as :func:`triangle_counts_documents`)."""
    return common_neighbor_candidates(document_link_edges(sf_dir))


LINK_PREDICTION_SQL = """
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
u AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
adj AS (
  SELECT a AS node, b AS nb FROM u UNION ALL SELECT b AS node, a AS nb FROM u
),
w AS (
  SELECT a1.nb AS a, a2.nb AS b, COUNT(*) AS n_common
  FROM adj a1 JOIN adj a2 ON a1.node = a2.node AND a1.nb < a2.nb
  GROUP BY 1, 2
)
SELECT w.a, w.b, CAST(w.n_common AS BIGINT) AS n_common
FROM w LEFT JOIN u ON u.a = w.a AND u.b = w.b
WHERE u.a IS NULL
ORDER BY w.n_common DESC, w.a, w.b LIMIT 20
"""


# ---------------------------------------------------------------------------
# Edge embeddedness (common neighbors of an edge's endpoints)
# ---------------------------------------------------------------------------


def edge_embeddedness(edges: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """Top-``k`` edges by EMBEDDEDNESS — the number of common neighbors
    of the edge's endpoints — over the undirected graph of an
    ``(src, dst)`` edge Dataset → ``(a, b, embeddedness)``, ties broken
    on ``(a, b)``. Granovetter's strength-of-ties measure: an
    embeddedness-0 edge is a LOCAL BRIDGE (the only short path between
    its sides — navigation/spam links), a high-embeddedness edge sits
    inside a dense community (boilerplate nav clusters).

    Scale shape: identical wedge machinery to
    :func:`common_neighbor_candidates` (per-middle-node pair emission,
    degree²-bounded), but the UNION-tag fold now KEEPS pairs that are
    edges instead of dropping them — one flipped filter turns link
    prediction into tie-strength scoring, which is the point of
    composing both from the same exchange shapes."""
    from pdf_extractor_ray.ops import distinct, grouped_apply, grouped_sum

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct(edges.map_batches(orient, batch_format="pandas"), ["a", "b"])

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)]),
                "nb": np.concatenate([b["b"].to_numpy(np.int64), b["a"].to_numpy(np.int64)]),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pandas")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("node", sort=False):
            nb = np.sort(grp["nb"].to_numpy(np.int64))
            if len(nb) < 2:
                continue
            ia, ib = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"a": nb[ia], "b": nb[ib]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["n_common"] = np.int64(1)
        out["is_edge"] = np.int64(0)
        return out

    cand = grouped_apply(adj, ["node"], wedges)

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["a", "b"]].copy()
        out["n_common"] = np.int64(0)
        out["is_edge"] = np.int64(1)
        return out

    tagged = cand.union(und.map_batches(tag_edges, batch_format="pandas"))
    folded = grouped_sum(tagged, ["a", "b"], ["n_common", "is_edge"])

    def keep_edges(b: pd.DataFrame) -> pd.DataFrame:
        out = b.loc[b["is_edge"] == 1, ["a", "b", "n_common"]].copy()
        return out.rename(columns={"n_common": "embeddedness"})

    scored = folded.map_batches(keep_edges, batch_format="pandas")
    return scored.sort(["embeddedness", "a", "b"], descending=[True, False, False]).limit(k)


def edge_embeddedness_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: edge embeddedness over the document link graph."""
    return edge_embeddedness(document_link_edges(sf_dir))


EDGE_EMBEDDEDNESS_SQL = """
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
u AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
adj AS (
  SELECT a AS node, b AS nb FROM u UNION ALL SELECT b AS node, a AS nb FROM u
),
w AS (
  SELECT a1.nb AS a, a2.nb AS b, COUNT(*) AS n_common
  FROM adj a1 JOIN adj a2 ON a1.node = a2.node AND a1.nb < a2.nb
  GROUP BY 1, 2
)
SELECT u.a, u.b, CAST(COALESCE(w.n_common, 0) AS BIGINT) AS embeddedness
FROM u LEFT JOIN w ON w.a = u.a AND w.b = u.b
ORDER BY embeddedness DESC, u.a, u.b LIMIT 20
"""


# ---------------------------------------------------------------------------
# Synchronous label propagation communities (deterministic LPA)
# ---------------------------------------------------------------------------

LPA_ITERS = 3


def label_propagation(edges: ray.data.Dataset, iters: int = LPA_ITERS) -> ray.data.Dataset:
    """Deterministic synchronous label-propagation communities over the
    undirected graph of an ``(src, dst)`` edge Dataset → ``(node,
    community)`` after ``iters`` rounds: every node starts as its own
    label and each round adopts its neighbors' MOST FREQUENT label,
    ties broken by SMALLEST label (the determinism rule that makes an
    oracle possible — textbook LPA breaks ties randomly and is
    therefore unverifiable). Communities after a fixed small round
    count are the cheap mesoscale view between connected components
    (too coarse) and k-core (too strict).

    Scale shape: per round, ONE label-lookup join (labels keyed by
    node, fact-sized — the adaptive planner broadcasts while it fits,
    exchanges beyond) and ONE (node, label) count exchange; tables stay
    node-sized throughout, the same iteration discipline as
    :func:`pagerank`. Sequential rounds are inherent to synchronous
    LPA."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import distinct, grouped_apply, grouped_sum

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct(edges.map_batches(orient, batch_format="pandas"), ["a", "b"])

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)]),
                "nb": np.concatenate([b["b"].to_numpy(np.int64), b["a"].to_numpy(np.int64)]),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pandas").materialize()
    labels = distinct(
        adj.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "label": b["node"]}),
            batch_format="pandas",
        ),
        ["node", "label"],
    )

    for _ in range(iters):
        # key the label table as "nb" before joining so the left's own
        # "node" column never collides with the right key
        nb_keyed = labels.map_batches(
            lambda b: b.rename(columns={"node": "nb"}), batch_format="pandas"
        )
        nb_labels = adaptive_inner_join(adj, nb_keyed, on="nb")  # (node, nb, label)

        def vote_partial(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(["node", "label"], as_index=False).size()
            g = g.rename(columns={"size": "c"})
            return g.astype({"c": "int64"})

        votes = grouped_sum(
            nb_labels.map_batches(vote_partial, batch_format="pandas"),
            ["node", "label"],
            ["c"],
        )

        def adopt(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["node", "c", "label"], ascending=[True, False, True])
            top = g.groupby("node", sort=False).head(1)
            return top[["node", "label"]].astype({"node": "int64", "label": "int64"})

        labels = grouped_apply(votes, ["node"], adopt).materialize()

    return labels.map_batches(
        lambda b: b.rename(columns={"label": "community"}), batch_format="pandas"
    )


def community_lpa_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: 3-round deterministic LPA over the document link
    graph."""
    return label_propagation(document_link_edges(sf_dir))


def _lpa_sql(iters: int = LPA_ITERS) -> str:
    head = """
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
u AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS nb FROM u UNION ALL SELECT b AS node, a AS nb FROM u
),
l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM adj)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(
            f""",
v{i} AS MATERIALIZED (
  SELECT a.node, l.label, COUNT(*) AS c
  FROM adj a JOIN l{i - 1} l ON l.node = a.nb GROUP BY 1, 2
),
l{i} AS MATERIALIZED (
  SELECT node, label FROM v{i}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) = 1
)"""
        )
    parts.append(
        f"""
SELECT node, CAST(label AS BIGINT) AS community FROM l{iters}"""
    )
    return "".join(parts)


COMMUNITY_LPA_SQL = _lpa_sql()


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (authority × content rankings)
# ---------------------------------------------------------------------------

RRF_K = 60


def rrf_fusion_documents(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Reciprocal-rank fusion of two document rankings — link AUTHORITY
    (in-degree, descending) and CONTENT length (n_chars, descending) —
    → the top-``k`` docs by ``rrf_micro = Σ 10⁶ // (60 + rank)`` with
    RANK semantics (ties share the best rank; Cormack et al.'s fusion
    constant 60), ties on doc_id — the standard zero-training way to
    merge heterogeneous rankers in a search/curation stack.

    Scale shape: NO global sort for either ranking — with RANK
    semantics, ``rank(x) = 1 + #{strictly better}``, so each ranking is
    a COUNT-PER-DISTINCT-VALUE table (value-domain-bounded) suffix-
    summed on the driver and broadcast as a value → rank lookup; the
    in-degree attaches via the adaptive left join (never a doc-sized
    driver dict), the per-doc pass scores, and a top-k prune closes.
    The fused score is exact integer floor division on both engines."""
    import ray as _ray

    from pdf_extractor_ray.joins import _cached_get, adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_sum

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    edges = document_link_edges(sf_dir)

    def dst_ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["dst"].to_numpy(np.int64), "indeg": np.ones(len(b), np.int64)}
        )

    indeg = grouped_sum(
        edges.map_batches(dst_ones, batch_format="pandas"), ["doc_id"], ["indeg"]
    )
    docs_deg = adaptive_inner_join(docs, indeg, on="doc_id", how="left_outer")

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_chars": b["n_chars"].astype("int64"),
                "indeg": b["indeg"].fillna(0).astype("int64"),
            }
        )

    docs_deg = docs_deg.map_batches(clean, batch_format="pandas").materialize()

    def value_counts(col: str) -> "pd.DataFrame":
        def ones(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"v": b[col].astype("int64"), "m": np.ones(len(b), np.int64)})

        return (
            grouped_sum(docs_deg.map_batches(ones, batch_format="pandas"), ["v"], ["m"])
            .to_pandas()  # value-domain-bounded collect
            .sort_values("v", ascending=False)
            .reset_index(drop=True)
        )

    def rank_lookup(vc: "pd.DataFrame") -> dict:
        greater = np.concatenate([[0], np.cumsum(vc["m"].to_numpy(np.int64))[:-1]])
        return dict(zip(vc["v"].astype(int), (greater + 1).tolist()))

    lookups = _ray.put((rank_lookup(value_counts("indeg")), rank_lookup(value_counts("n_chars"))))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        rr1, rr2 = _cached_get(lookups)
        rank1 = b["indeg"].map(rr1).to_numpy(np.int64)
        rank2 = b["n_chars"].map(rr2).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "indeg": b["indeg"].astype("int64"),
                "rrf_micro": (
                    1_000_000 // (RRF_K + rank1) + 1_000_000 // (RRF_K + rank2)
                ).astype(np.int64),
            }
        )

    scored = docs_deg.map_batches(score, batch_format="pandas")
    return scored.sort(["rrf_micro", "doc_id"], descending=[True, False]).limit(k)


RRF_FUSION_SQL = f"""
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
deg AS (SELECT dst, COUNT(*) AS indeg FROM e0 GROUP BY dst),
d AS (
  SELECT doc_id, n_chars, COALESCE(deg.indeg, 0) AS indeg
  FROM documents LEFT JOIN deg ON deg.dst = doc_id
),
r AS (
  SELECT doc_id, indeg,
         RANK() OVER (ORDER BY indeg DESC) AS r1,
         RANK() OVER (ORDER BY n_chars DESC) AS r2
  FROM d
)
SELECT doc_id, CAST(indeg AS BIGINT) AS indeg,
       CAST(1000000 // ({RRF_K} + r1) + 1000000 // ({RRF_K} + r2) AS BIGINT)
         AS rrf_micro
FROM r ORDER BY rrf_micro DESC, doc_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# Top term per LPA community (community ∘ token-count composition)
# ---------------------------------------------------------------------------


def community_top_terms(sf_dir: str) -> ray.data.Dataset:
    """Characteristic term per link community: join the 3-round LPA
    labels (:func:`community_lpa_documents`) onto the documents they
    label, count tokens per community, keep each community's top token
    (count desc, token asc) → ``(community, top_token, n)`` — the
    composition a crawl analyst actually runs ("what is each link
    cluster ABOUT?"), and a cross-module pipeline proof: graph
    iteration output feeding a text aggregation with one label join.

    Scale shape: LPA's node-sized label table joins the corpus
    (adaptive: broadcast while it fits), token partials pre-aggregate
    per batch, one (community, token) exchange, then a per-community
    top-1 fold."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import grouped_apply, grouped_sum

    labels = community_lpa_documents(sf_dir).map_batches(
        lambda b: b.rename(columns={"node": "doc_id"}), batch_format="pandas"
    )
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    joined = adaptive_inner_join(docs, labels, on="doc_id")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for community, grp in b.groupby("community", sort=False):
            tokens = grp["text"].str.split(" ").explode()
            tokens = tokens[tokens != ""]
            g = tokens.value_counts().reset_index()
            g.columns = ["token", "n"]
            g["n"] = g["n"].astype("int64")
            g["community"] = np.int64(community)
            outs.append(g)
        if not outs:
            return pd.DataFrame(
                {
                    "token": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                    "community": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    counts = grouped_sum(
        joined.map_batches(explode, batch_format="pandas", batch_size=2048),
        ["community", "token"],
        ["n"],
        two_level=True,
    )

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["community", "n", "token"], ascending=[True, False, True])
        top = g.groupby("community", sort=False).head(1)
        return top.rename(columns={"token": "top_token"})[
            ["community", "top_token", "n"]
        ].astype({"community": "int64", "n": "int64"})

    return grouped_apply(counts, ["community"], top1)


COMMUNITY_TOP_TERMS_SQL = f"""
WITH lpa AS ({COMMUNITY_LPA_SQL}),
tok AS (
  SELECT lpa.community, w.w AS token
  FROM lpa
  JOIN documents d ON d.doc_id = lpa.node,
  unnest(regexp_split_to_array(d.text, ' ')) AS w(w)
  WHERE w.w != ''
),
c AS (SELECT community, token, COUNT(*) AS n FROM tok GROUP BY 1, 2)
SELECT community, token AS top_token, CAST(n AS BIGINT) AS n
FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY community ORDER BY n DESC, token) = 1
"""


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (bounded Bellman-Ford rounds)
# ---------------------------------------------------------------------------

SSSP_ROUNDS = 4


def weighted_sssp(
    edges: ray.data.Dataset,
    seeds_mod: int = 100,
    rounds: int = SSSP_ROUNDS,
) -> ray.data.Dataset:
    """Weighted multi-source shortest paths over the undirected graph of
    an ``(src, dst)`` edge Dataset with integer weight ``w = 1 +
    (a + b) % 3`` per undirected pair → ``(node, dist)`` for every node
    reached within ``rounds`` Bellman-Ford relaxation rounds from the
    seed set ``{node : node % seeds_mod == 0}`` — the link-distance
    prior behind crawl-frontier cost models, where hop counts
    (:func:`crawl_depth`'s BFS) under-price heavy edges.

    Scale shape: per round ONE frontier-lookup join (dist table,
    node-sized, adaptive broadcast/exchange) and ONE min-fold exchange
    — exactly :func:`pagerank`'s iteration discipline with ``min``
    replacing ``sum``. ``rounds`` bounds path length explored, the
    standard frontier-limited form; unreached nodes are absent (the
    oracle's semantics too)."""
    from pdf_extractor_ray.joins import adaptive_inner_join
    from pdf_extractor_ray.ops import distinct, grouped_agg

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(np.int64)
        d = b["dst"].to_numpy(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct(edges.map_batches(orient, batch_format="pandas"), ["a", "b"])

    def both_dirs_w(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(np.int64)
        bb = b["b"].to_numpy(np.int64)
        w = 1 + (a + bb) % 3
        return pd.DataFrame(
            {
                "node": np.concatenate([a, bb]),
                "nb": np.concatenate([bb, a]),
                "w": np.concatenate([w, w]),
            }
        )

    adj = und.map_batches(both_dirs_w, batch_format="pandas").materialize()

    def seed(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["node"].to_numpy(np.int64) % seeds_mod) == 0
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64)[m], "dist": np.zeros(int(m.sum()), np.int64)}
        )

    dist = distinct(adj.map_batches(seed, batch_format="pandas"), ["node", "dist"])

    for _ in range(rounds):
        keyed = dist.map_batches(
            lambda b: b.rename(columns={"node": "nb", "dist": "dist_nb"}),
            batch_format="pandas",
        )
        relaxed = adaptive_inner_join(adj, keyed, on="nb")

        def candidates(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": b["node"].astype("int64"),
                    "dist": (b["dist_nb"].astype("int64") + b["w"].astype("int64")),
                }
            )

        cand = relaxed.map_batches(candidates, batch_format="pandas")
        dist = grouped_agg(
            dist.union(cand), ["node"], {"dist": ("dist", "min")}
        ).materialize()

    return dist


def sssp_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: 4-round weighted SSSP over the document link graph from
    the ``doc_id % 100 == 0`` seed set."""
    return weighted_sssp(document_link_edges(sf_dir))


def _sssp_sql(rounds: int = SSSP_ROUNDS) -> str:
    head = """
WITH e0 AS (
  SELECT doc_id AS src,
         (doc_id - doc_id % 10) + ((doc_id + 3 * gs) % 10) AS dst
  FROM documents JOIN generate_series(1, 3) AS t(gs) ON gs <= 1 + doc_id % 3
),
u AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst
),
adj AS MATERIALIZED (
  SELECT a AS node, b AS nb, 1 + (a + b) % 3 AS w FROM u
  UNION ALL
  SELECT b AS node, a AS nb, 1 + (a + b) % 3 AS w FROM u
),
d0 AS MATERIALIZED (
  SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM adj WHERE node % 100 = 0
)"""
    parts = [head]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
d{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT a.node, d.dist + a.w FROM adj a JOIN d{i - 1} d ON d.node = a.nb
  ) GROUP BY node
)"""
        )
    parts.append(
        f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}"""
    )
    return "".join(parts)


SSSP_SQL = _sssp_sql()
