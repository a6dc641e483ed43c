"""Golden-fixture conformance: the Ray pipeline's extracted text must be
byte-identical per url to the sequential oracle (north rule), including
under input shuffling and different batch sizes (metamorphic checks)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from pdf_extractor_ray.pipelines.flagship import build_extraction_pipeline, extraction_summary


def _by_url(table: pa.Table) -> dict:
    d = {}
    urls = table.column("url").to_pylist()
    texts = table.column("extracted_text").to_pylist()
    status = table.column("status").to_pylist()
    spans = table.column("char_spans").to_pylist()
    for u, t, s, cs in zip(urls, texts, status, spans):
        # duplicate urls exist in the corpus by design; identical content
        d.setdefault(u, (t, s, cs))
    return d


@pytest.fixture(scope="module")
def pipeline_output(pages_corpus):
    ds = build_extraction_pipeline(pages_corpus, concurrency=2, batch_size=32)
    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


def test_byte_identical_to_oracle(pipeline_output, goldens):
    got = _by_url(pipeline_output)
    exp = _by_url(goldens)
    assert set(got) == set(exp)
    mismatches = [u for u in exp if got[u][0] != exp[u][0]]
    assert mismatches == [], f"text differs for {len(mismatches)} urls, e.g. {mismatches[:3]}"
    status_mism = [u for u in exp if got[u][1] != exp[u][1]]
    assert status_mism == []
    span_mism = [u for u in exp if got[u][2] != exp[u][2]]
    assert span_mism == []


def test_invariant_under_shuffle_and_batch_size(pages_corpus, goldens):
    ds = build_extraction_pipeline(pages_corpus, concurrency=3, batch_size=7)
    ds = ds.random_shuffle(seed=123)
    out = ds.to_pandas()
    exp = _by_url(goldens)
    got = dict(zip(out["url"], out["extracted_text"]))
    for u, t in got.items():
        assert t == exp[u][0], f"mismatch for {u}"


def test_quarantine_rows_present(pipeline_output):
    status = pipeline_output.column("status").to_pylist()
    assert any(s.startswith("quarantined") for s in status), "edge rows should quarantine"
    assert any(s == "ok" for s in status)
    # quarantined rows are not silently dropped: every input row surfaces
    assert len(status) == 300


def test_actor_pool_shape_identical(pages_corpus, goldens):
    """use_actor_pool=True (branch+union, stateful PDF pool) must be
    row-identical to the fused task shape and to the oracle."""
    ds = build_extraction_pipeline(pages_corpus, use_actor_pool=True, concurrency=2)
    out = ds.to_pandas()
    exp = _by_url(goldens)
    assert len(out) == goldens.num_rows
    for u, t, s in zip(out["url"], out["extracted_text"], out["status"]):
        assert t == exp[u][0]
        assert s == exp[u][1]


def test_extraction_summary_aggregate(pages_corpus):
    ds = build_extraction_pipeline(pages_corpus, concurrency=2)
    summary = extraction_summary(ds).to_pandas()
    assert summary["n_docs"].sum() == 300
    assert set(summary.columns) == {"kind", "status", "n_docs", "total_bytes"}
