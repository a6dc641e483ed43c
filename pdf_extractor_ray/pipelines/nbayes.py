"""Distributed multinomial Naive Bayes (train + score in one pipeline).

The fastText/CCNet-style lightweight document classifier, rebuilt
Ray-Data-first: class priors and per-(token, class) counts are learned
with ordinary bucketed aggregations over the corpus, the model —
bounded by vocabulary × classes, never corpus-sized — is broadcast once
via ``ray.put``, and scoring is a vectorized per-batch pass (token
counts × log-prob matrix, no Python loop over tokens).

Exactness contract (same micro-nat family as ``bm25`` /
``lm_bigram_nll``): every log-probability is quantized to int64
micro-nats with ``floor(ln(x)·1e6 + 0.5)`` where ``x`` is a ratio of
exactly-representable int64s — one IEEE divide and one libm ``ln``,
bit-identical between numpy/math and DuckDB on the same host — and
scores are integer SUMS of those, so the oracle comparison is exact
arithmetic, no float tolerance.

Reference capability analog: the reference scores each document with a
remote LLM call (pdf_service.py's per-document prompt loop); this
module is the corpus-scale counterpart — a trained-from-the-corpus
classifier whose cost is two aggregations, not one API call per row.

Scale notes: the two training exchanges move (token, class) partials
pre-aggregated per batch; the model collect is vocab × classes rows
(the BPE-vocab-materialize argument — bounded by the model, not the
data). ``max_model_rows`` guards the collect and raises with sizing
advice rather than OOMing the driver.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import ray
import ray.data

from pdf_extractor_ray.ops import grouped_sum


def _lp_micro(num: int, den: int) -> int:
    """floor(ln(num/den)·1e6 + 0.5) — the shared quantizer."""
    return math.floor(math.log(num / den) * 1e6 + 0.5)


def naive_bayes_scores(
    sf_dir: str,
    *,
    label_col: str = "source",
    max_model_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Train multinomial NB with add-one smoothing to predict
    ``label_col`` from tokens, then score the SAME corpus →
    ``(doc_id, predicted, score_micro)`` where ``predicted`` is the
    argmax class (ties broken by label ascending) and ``score_micro``
    its integer log-posterior ``prior_micro + Σ_occurrences
    lp_micro(token, class)``.

    Self-scoring means no OOV path: every scored token is in the
    training vocabulary by construction. (A held-out variant would
    route unseen tokens to the smoothed-zero bucket ``lp0 =
    ln(1/(tot_c + V))`` — the model already carries it for
    (token, class) pairs with zero count.)"""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", label_col],
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for label, grp in b.groupby(label_col, sort=False):
            tokens = grp["text"].str.split(" ").explode()
            tokens = tokens[tokens != ""]
            g = tokens.value_counts().reset_index()
            g.columns = ["token", "c"]
            g["c"] = g["c"].astype("int64")
            g["label"] = label
            outs.append(g)
        if not outs:
            return pd.DataFrame(
                {
                    "token": pd.Series(dtype="object"),
                    "c": pd.Series(dtype="int64"),
                    "label": pd.Series(dtype="object"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    tc = grouped_sum(
        ds.map_batches(explode, batch_format="pandas", batch_size=4096),
        ["token", "label"],
        ["c"],
        two_level=True,
    ).materialize()
    n_model = tc.count()
    if n_model > max_model_rows:
        raise ValueError(
            f"NB model has {n_model} (token, class) rows > max_model_rows="
            f"{max_model_rows}; raise the cap or hash the vocabulary "
            f"(feature-hashing trades exactness for a fixed model size)"
        )
    model = tc.to_pandas()  # vocab × classes rows — model-sized collect

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({label_col: b[label_col], "n_docs": np.ones(len(b), np.int64)})

    prior_counts = (
        grouped_sum(
            ds.map_batches(ones, batch_format="pandas"), [label_col], ["n_docs"]
        )
        .to_pandas()
        .sort_values(label_col)
        .reset_index(drop=True)
    )  # classes-sized

    labels = prior_counts[label_col].tolist()
    n_total = int(prior_counts["n_docs"].sum())
    vocab = sorted(model["token"].unique().tolist())
    v = len(vocab)
    tok_ix = {t: i for i, t in enumerate(vocab)}
    tot_c = model.groupby("label")["c"].sum().to_dict()

    # dense (V × C) micro-nat log-prob matrix + per-class priors
    lp = np.empty((v, len(labels)), np.int64)
    for j, lab in enumerate(labels):
        den = int(tot_c.get(lab, 0)) + v
        lp[:, j] = _lp_micro(1, den)  # smoothed zero
        sub = model[model["label"] == lab]
        rows = sub["token"].map(tok_ix).to_numpy()
        cs = sub["c"].to_numpy(np.int64)
        for r, c in zip(rows, cs):
            lp[r, j] = _lp_micro(int(c) + 1, den)
    prior = np.array(
        [_lp_micro(int(n), n_total) for n in prior_counts["n_docs"]], np.int64
    )
    model_ref = ray.put((tok_ix, lp, prior, labels))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from pdf_extractor_ray.joins import _cached_get

        tok_ix_, lp_, prior_, labels_ = _cached_get(model_ref)
        ids, preds, scores = [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            counts: dict[int, int] = {}
            for t in text.split(" "):
                if t:
                    counts[tok_ix_[t]] = counts.get(tok_ix_[t], 0) + 1
            if counts:
                ix = np.fromiter(counts.keys(), np.int64, len(counts))
                ct = np.fromiter(counts.values(), np.int64, len(counts))
                s = prior_ + ct @ lp_[ix]  # (C,) int64 exact
            else:
                s = prior_.copy()
            j = int(np.argmax(s))  # first max = lowest label index (sorted)
            ids.append(int(doc_id))
            preds.append(labels_[j])
            scores.append(int(s[j]))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "predicted": pd.Series(preds, dtype="object"),
                "score_micro": pd.Series(scores, dtype="int64"),
            }
        )

    return ds.map_batches(score, batch_format="pandas", batch_size=2048)


def naive_bayes_documents(sf_dir: str) -> ray.data.Dataset:
    """Carrier: NB predicting ``source`` from document tokens."""
    return naive_bayes_scores(sf_dir, label_col="source")


NAIVE_BAYES_SQL = """
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(text, ' ')) AS w
  FROM documents
),
t2 AS (SELECT * FROM tok WHERE w != ''),
cls AS (SELECT source, COUNT(*) AS n_tok FROM t2 GROUP BY source),
dpc AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
nd AS (SELECT COUNT(*) AS n FROM documents),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM t2),
tc AS (SELECT source, w, COUNT(*) AS c FROM t2 GROUP BY source, w),
grid AS (
  SELECT cls.source, vv.w, cls.n_tok
  FROM cls, (SELECT DISTINCT w FROM t2) AS vv
),
lp AS (
  SELECT g.source, g.w,
         CAST(floor(ln((COALESCE(tc.c, 0) + 1) / CAST(g.n_tok + vocab.v AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS lp_micro
  FROM grid g
  LEFT JOIN tc ON tc.source = g.source AND tc.w = g.w, vocab
),
prior AS (
  SELECT d.source,
         CAST(floor(ln(d.n_docs / CAST(nd.n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS prior_micro
  FROM dpc d, nd
),
scores AS (
  SELECT t2.doc_id, lp.source, prior.prior_micro + SUM(lp.lp_micro) AS s
  FROM t2
  JOIN lp ON lp.w = t2.w
  JOIN prior ON prior.source = lp.source
  GROUP BY t2.doc_id, lp.source, prior.prior_micro
)
SELECT doc_id, source AS predicted, CAST(s AS BIGINT) AS score_micro
FROM scores
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, source) = 1
"""


def derive_holdout_corpus(b: "pd.DataFrame") -> "pd.DataFrame":
    """Carrier for the held-out paths: TRAIN docs of class src0 gain a
    class-exclusive token ('srczero' — in-vocab, unseen by 19 classes,
    so scoring it exercises the smoothed-zero); every TEST doc gains a
    globally-unseen token ('oov<doc_id>' — exercises the
    contribute-nothing OOV rule), and every other test doc also gains
    'srczero' so the smoothed-zero fires at score time."""
    texts = []
    for doc_id, text, label in zip(b["doc_id"], b["text"], b["source"]):
        d = int(doc_id)
        if d % 5 != 0:
            texts.append(text + " srczero" if label == "src0" else text)
        else:
            t = f"{text} oov{d}"
            if d % 10 == 0:
                t += " srczero"
            texts.append(t)
    out = b.copy()
    out["text"] = texts
    return out


def naive_bayes_holdout(sf_dir: str, *, label_col: str = "source") -> ray.data.Dataset:
    """Held-out NB: train on docs with ``doc_id % 5 != 0``, score the
    held-out 20 % → ``(doc_id, predicted, score_micro, n_oov)`` — the
    deployment shape of :func:`naive_bayes_scores`, which self-scores.
    The difference under test is the OOV path: tokens absent from the
    TRAINING vocabulary contribute NOTHING to any class score (they are
    constant offsets in a comparison between classes and carry no
    signal), and their count is reported so a drift monitor can alarm
    when OOV mass rises. Tokens in-vocab but unseen for a class use the
    smoothed-zero ``ln(1/(tot_c + V))`` — live here, unlike
    self-scoring where every (token, class) pair was observed... for
    classes that never saw a vocab token.

    Same two-exchange training shape; the broadcast model additionally
    carries the vocabulary for the OOV test."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", label_col],
    ).map_batches(derive_holdout_corpus, batch_format="pandas", batch_size=4096)

    def is_train(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["doc_id"] % 5 != 0]

    def is_test(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["doc_id"] % 5 == 0]

    train = ds.map_batches(is_train, batch_format="pandas")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for label, grp in b.groupby(label_col, sort=False):
            tokens = grp["text"].str.split(" ").explode()
            tokens = tokens[tokens != ""]
            g = tokens.value_counts().reset_index()
            g.columns = ["token", "c"]
            g["c"] = g["c"].astype("int64")
            g["label"] = label
            outs.append(g)
        if not outs:
            return pd.DataFrame(
                {
                    "token": pd.Series(dtype="object"),
                    "c": pd.Series(dtype="int64"),
                    "label": pd.Series(dtype="object"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    model = grouped_sum(
        train.map_batches(explode, batch_format="pandas", batch_size=4096),
        ["token", "label"],
        ["c"],
        two_level=True,
    ).to_pandas()  # vocab × classes — model-sized collect

    def ones(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({label_col: b[label_col], "n_docs": np.ones(len(b), np.int64)})

    prior_counts = (
        grouped_sum(
            train.map_batches(ones, batch_format="pandas"), [label_col], ["n_docs"]
        )
        .to_pandas()
        .sort_values(label_col)
        .reset_index(drop=True)
    )
    labels = prior_counts[label_col].tolist()
    n_total = int(prior_counts["n_docs"].sum())
    vocab = sorted(model["token"].unique().tolist())
    v = len(vocab)
    tok_ix = {t: i for i, t in enumerate(vocab)}
    tot_c = model.groupby("label")["c"].sum().to_dict()
    lp = np.empty((v, len(labels)), np.int64)
    for j, lab in enumerate(labels):
        den = int(tot_c.get(lab, 0)) + v
        lp[:, j] = _lp_micro(1, den)
        sub = model[model["label"] == lab]
        for r, c in zip(sub["token"].map(tok_ix).to_numpy(), sub["c"].to_numpy(np.int64)):
            lp[r, j] = _lp_micro(int(c) + 1, den)
    prior = np.array(
        [_lp_micro(int(n), n_total) for n in prior_counts["n_docs"]], np.int64
    )
    model_ref = ray.put((tok_ix, lp, prior, labels))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        from pdf_extractor_ray.joins import _cached_get

        tok_ix_, lp_, prior_, labels_ = _cached_get(model_ref)
        ids, preds, scores, oov = [], [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            counts: dict[int, int] = {}
            n_oov = 0
            for t in text.split(" "):
                if not t:
                    continue
                ix = tok_ix_.get(t)
                if ix is None:
                    n_oov += 1
                else:
                    counts[ix] = counts.get(ix, 0) + 1
            if counts:
                ixs = np.fromiter(counts.keys(), np.int64, len(counts))
                ct = np.fromiter(counts.values(), np.int64, len(counts))
                s = prior_ + ct @ lp_[ixs]
            else:
                s = prior_.copy()
            j = int(np.argmax(s))
            ids.append(int(doc_id))
            preds.append(labels_[j])
            scores.append(int(s[j]))
            oov.append(n_oov)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "predicted": pd.Series(preds, dtype="object"),
                "score_micro": pd.Series(scores, dtype="int64"),
                "n_oov": pd.Series(oov, dtype="int64"),
            }
        )

    return ds.map_batches(is_test, batch_format="pandas").map_batches(
        score, batch_format="pandas", batch_size=2048
    )


NAIVE_BAYES_HOLDOUT_SQL = """
WITH derived AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 != 0 THEN
                CASE WHEN source = 'src0' THEN text || ' srczero' ELSE text END
              ELSE text || ' oov' || doc_id ||
                CASE WHEN doc_id % 10 = 0 THEN ' srczero' ELSE '' END
         END AS text
  FROM documents
),
train AS (SELECT * FROM derived WHERE doc_id % 5 != 0),
test AS (SELECT * FROM derived WHERE doc_id % 5 = 0),
tok AS (
  SELECT doc_id, source, unnest(regexp_split_to_array(text, ' ')) AS w FROM train
),
t2 AS (SELECT * FROM tok WHERE w != ''),
cls AS (SELECT source, COUNT(*) AS n_tok FROM t2 GROUP BY source),
dpc AS (SELECT source, COUNT(*) AS n_docs FROM train GROUP BY source),
nd AS (SELECT COUNT(*) AS n FROM train),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM t2),
tc AS (SELECT source, w, COUNT(*) AS c FROM t2 GROUP BY source, w),
grid AS (
  SELECT cls.source, vv.w, cls.n_tok
  FROM cls, (SELECT DISTINCT w FROM t2) AS vv
),
lp AS (
  SELECT g.source, g.w,
         CAST(floor(ln((COALESCE(tc.c, 0) + 1) / CAST(g.n_tok + vocab.v AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS lp_micro
  FROM grid g
  LEFT JOIN tc ON tc.source = g.source AND tc.w = g.w, vocab
),
prior AS (
  SELECT d.source,
         CAST(floor(ln(d.n_docs / CAST(nd.n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS prior_micro
  FROM dpc d, nd
),
ttok AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) AS w FROM test
),
tt2 AS (SELECT * FROM ttok WHERE w != ''),
oov AS (
  SELECT t.doc_id, CAST(COUNT(*) FILTER (WHERE tt2.w IS NOT NULL AND lv.w IS NULL) AS BIGINT) AS n_oov
  FROM test t
  LEFT JOIN tt2 ON tt2.doc_id = t.doc_id
  LEFT JOIN (SELECT DISTINCT w FROM t2) lv ON lv.w = tt2.w
  GROUP BY t.doc_id
),
scores AS (
  SELECT t.doc_id, p.source, p.prior_micro + COALESCE(SUM(lp.lp_micro), 0) AS s
  FROM test t
  CROSS JOIN prior p
  LEFT JOIN tt2 ON tt2.doc_id = t.doc_id
  LEFT JOIN lp ON lp.w = tt2.w AND lp.source = p.source
  GROUP BY t.doc_id, p.source, p.prior_micro
)
SELECT s.doc_id, s.source AS predicted, CAST(s.s AS BIGINT) AS score_micro, o.n_oov
FROM scores s JOIN oov o USING (doc_id)
QUALIFY ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY s.s DESC, s.source) = 1
"""
