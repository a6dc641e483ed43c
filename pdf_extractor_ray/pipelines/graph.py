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
) -> ray.data.Dataset:
    """Distributed PageRank over an (src, dst) edge Dataset in exact
    int64 fixed-point: ``r0 = 1e6`` per node, then ``iters`` rounds of

        r'[v] = base_micro + (damp_milli * Σ_{u→v} (r[u] // outdeg[u])) // 1000

    Nodes = union of srcs and dsts; dangling nodes (no out-edges) leak
    their mass, as in the simplified formulation — both engine and
    oracle implement the same formula, so the invariant is exactness,
    not stochasticity. Returns (node, rank_micro).

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

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": b["src"].to_numpy(np.int64), "outdeg": np.ones(len(b), np.int64)}
        )

    deg = grouped_sum(edges.map_batches(ones, batch_format="pandas"), ["src"], ["outdeg"])
    edges_deg = joins.adaptive_inner_join(edges, deg, on="src").materialize()

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": b["node"].to_numpy(np.int64),
                "r": np.full(len(b), PAGERANK_INIT_MICRO, np.int64),
            }
        )

    ranks = nodes.map_batches(init, batch_format="pandas").materialize()

    def zero(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": b["node"].to_numpy(np.int64), "c": np.zeros(len(b), np.int64)}
        )

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": b["dst"].to_numpy(np.int64),
                "c": b["r"].to_numpy(np.int64) // b["outdeg"].to_numpy(np.int64),
            }
        )

    def update(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": b["node"].to_numpy(np.int64),
                "r": base_micro + (damp_milli * b["c"].to_numpy(np.int64)) // 1000,
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
