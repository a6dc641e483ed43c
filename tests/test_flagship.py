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


def test_mega_doc_skew(tmp_path):
    """A ~5MB doc (bucket 3, ~2000x median) must neither stall nor
    poison the run — it lands in the top size bucket and extracts."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extractor_ray.sources.pages import generate_pages_table, make_html_page

    tab = generate_pages_table(500, seed=5)
    raw, _ = make_html_page(random.Random(1), 9000)  # ~5MB
    mega = pa.table(
        {
            "url": pa.array(["https://mega.example.com/0"], pa.string()),
            "warc_ts": pa.array([None], tab.schema.field("warc_ts").type),
            "html": pa.array([raw], pa.binary()),
            "text": pa.array([""], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pa.concat_tables([tab, mega]), path)
    out = build_extraction_pipeline([path]).to_pandas()
    assert len(out) == 501
    mrow = out[out["url"] == "https://mega.example.com/0"].iloc[0]
    assert mrow["status"] == "ok"
    assert mrow["size_bucket"] >= 2  # big or mega bucket
    assert len(mrow["extracted_text"]) > 1_000_000


def test_bucket_routing_shape_identical(pages_corpus, goldens):
    """bucket_routing=True (size-bucket branches, batch_size=1 for the
    mega bucket) must be row-identical to the default shape."""
    ds = build_extraction_pipeline(pages_corpus, bucket_routing=True)
    out = ds.to_pandas()
    exp = _by_url(goldens)
    assert len(out) == goldens.num_rows
    for u, t, s in zip(out["url"], out["extracted_text"], out["status"]):
        assert t == exp[u][0]
        assert s == exp[u][1]


def test_flagship_plan_is_shuffle_free(tmp_path):
    """The extraction path must never contain an all-to-all exchange —
    the zero-shuffle property is the core 100 TB claim; this pins it
    against future regressions (e.g. an accidental groupby/sort)."""
    from pdf_extractor_ray.pipelines.flagship import build_extraction_pipeline
    from pdf_extractor_ray.sources.pages import write_pages_corpus

    paths = write_pages_corpus(str(tmp_path / "p"), n_rows=300, n_files=2, seed=11)
    ds = build_extraction_pipeline(paths, batch_size=64)
    ds.take(5)  # execute enough to materialize the plan
    stats = ds.stats()
    for marker in ("AllToAll", "Sort", "Aggregate", "Join", "shuffle"):
        assert marker not in stats, f"flagship plan gained a {marker} stage:\n{stats[:500]}"
