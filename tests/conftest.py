import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    from pdf_extractor_ray.quiet import quiet_data_logs

    quiet_data_logs()
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_corpus(tmp_path_factory):
    """Small deterministic pages corpus written once per test session."""
    from pdf_extractor_ray.sources.pages import write_pages_corpus

    out = tmp_path_factory.mktemp("pages_t1")
    paths = write_pages_corpus(str(out), n_rows=300, n_files=4, seed=42)
    return paths


@pytest.fixture(scope="session")
def goldens(pages_corpus):
    """Sequential-oracle golden extraction over the corpus."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    from pdf_extractor_ray.oracle import oracle_extract_table

    pages = pa.concat_tables([pq.read_table(p) for p in pages_corpus])
    return oracle_extract_table(pages)


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("GRAFT_TEST_SF_DIR_T2", "/root/testdata/sf0.01")
