"""Flagship extraction pipeline (SURVEY.md §7.1).

    read_parquet(pages)                         # url, html pruned at the read
      → map_batches(sniff_batch, pyarrow)       # kind-agnostic size bucketing
      → map_batches(ExtractPages, actor pool)   # per-doc layout parse
      → [consume: write_parquet / aggregate / iter_batches]

Dispatch note: the SURVEY sketch branches pdf/html into separate
`map_batches` stages and unions. On Ray Data, branch + union re-executes
the shared read per branch; since both kernels are per-document Python
either way, a single actor stage that dispatches per row inside the
batch does the same work with one scan and no union barrier. The
size-skew lever is batch sizing: `batch_size` is chosen so one mega-doc
(bucket 3) cannot head-of-line-block hundreds of small docs — Ray's
dynamic block splitting handles the output side.

At 100 TB: this pipeline is embarrassingly parallel (no shuffle at
all); throughput scales with actors × per-doc parse speed, and the
object store only ever holds a window of blocks (streaming backpressure).
"""

from __future__ import annotations

import ray.data

from pdf_extractor_ray.stages.extract import ExtractPages, sniff_batch


def build_extraction_pipeline(
    paths: str | list[str],
    *,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Lazy extraction Dataset over pages parquet. Caller consumes it
    (write_parquet / iter_batches); nothing is materialized here."""
    ds = ray.data.read_parquet(
        paths,
        columns=["url", "html"],  # prune: warc_ts/text/lang unused by extraction
        override_num_blocks=override_num_blocks,
    )
    ds = ds.map_batches(sniff_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        ExtractPages,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return ds


def extraction_summary(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-(kind, status) counts + byte totals — the run report."""
    from ray.data.aggregate import Count, Sum

    return ds.groupby(["kind", "status"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_bytes", alias_name="total_bytes"),
    )
