"""Round-5 wave-12 operator tests.

Declared-vs-sniffed MIME audit, duplicate-title clusters, per-host
language entropy, robots.txt sitemap discovery. Ray session comes
from the shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


class TestParseRobotsSitemaps:
    def test_group_independent_and_decoys(self):
        from pdf_extractor_ray.functions.urls import parse_robots_sitemaps as f

        body = (
            "# sitemap: https://decoy/x.xml\n"
            "User-agent: *\nDisallow: /private\n"
            "Sitemap:\n"  # empty: ignored
            "Sitemap: https://a/s1.xml\n"
            "User-agent: OtherBot\nDisallow: /\n"
            "SITEMAP: https://a/s2.xml\n"  # inside a foreign group: still harvested
            "Sitemap: https://a/s1.xml\n"  # duplicate: deduped
        )
        assert f(body) == ["https://a/s1.xml", "https://a/s2.xml"]

    def test_empty_and_noise_only(self):
        from pdf_extractor_ray.functions.urls import parse_robots_sitemaps as f

        assert f("") == []
        assert f("User-agent: *\nDisallow: /\n# Sitemap: https://x/s.xml\n") == []


class TestSitemapDiscovery:
    def test_per_host_counts_and_order(self):
        from pdf_extractor_ray.pipelines.urlops import sitemap_discovery_documents

        got = sitemap_discovery_documents(SF_DIR).to_pandas()
        per_host = got.groupby("host").size()
        for host, n in per_host.items():
            hid = int(host.split(".")[0][1:])
            assert n == (2 if hid % 3 == 0 else 1)
            assert hid % 3 != 2  # no-sitemap hosts emit nothing
        # rank order: sitemap.xml is always rank 1
        first = got[got["sm_rank"] == 1]
        assert first["sitemap_url"].str.endswith("/sitemap.xml").all()


class TestMimeMismatch:
    def test_planted_lies_detected(self):
        from pdf_extractor_ray.pipelines.webdocs import mime_mismatch_documents

        got = mime_mismatch_documents(SF_DIR).to_pandas()
        got["doc_id"] = got["url"].str.rsplit("/", n=1).str[1].astype(np.int64)
        got = got.set_index("doc_id")
        pdf_lies = got[got.index % 5 == 1]
        assert (pdf_lies["sniffed"] == "application/pdf").all()
        assert (pdf_lies["declared"] == "text/html").all()  # params/case normalized
        assert (pdf_lies["mismatch"] == 1).all()
        html_lies = got[got.index % 5 == 3]
        assert (html_lies["sniffed"] == "text/html").all()
        assert (html_lies["mismatch"] == 1).all()
        honest = got[(got.index % 5 % 2 == 0) & (got.index % 11 != 0)]
        assert (honest["mismatch"] == 0).all()


class TestTitleDup:
    def test_clusters_and_exclusions(self):
        from pdf_extractor_ray.pipelines.webdocs import title_dup_documents

        got = title_dup_documents(SF_DIR).to_pandas().set_index("title")
        assert (got["n_docs"] >= 2).all()
        assert (got["n_hosts"] <= got["n_docs"]).all()
        # titleless docs (d % 3 == 2) never join: total clustered docs
        # equals the number of title-bearing docs in shared topics
        import pyarrow.parquet as pq

        ids = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        titled = ids[ids % 3 != 2]
        topics, counts = np.unique(titled % 97, return_counts=True)
        expect = {f"Topic {t}": c for t, c in zip(topics, counts) if c >= 2}
        assert got["n_docs"].to_dict() == expect

    def test_decoy_titles_never_win(self):
        from pdf_extractor_ray.pipelines.webdocs import title_dup_documents

        got = title_dup_documents(SF_DIR).to_pandas()
        assert not got["title"].str.startswith("DECOY").any()
        assert not got["title"].str.startswith("Heading").any()


class TestHostLangEntropy:
    def test_matches_local_replica(self):
        import pyarrow.parquet as pq

        from pdf_extractor_ray.pipelines.textops import host_lang_entropy

        got = host_lang_entropy(SF_DIR).to_pandas().set_index("host")
        df = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        df["host"] = "h" + (df["doc_id"] % 13).astype(str) + ".example.org"
        for host, sub in df.groupby("host"):
            c = sub.groupby("lang").size().to_numpy(np.float64)
            n = float(c.sum())
            want = int(np.floor((c * np.log(n / c)) * 1_000_000 + 0.5).astype(np.int64).sum())
            assert got.loc[host, "ent_total_micro"] == want
            assert got.loc[host, "n_docs"] == int(n)
            assert got.loc[host, "n_langs"] == len(c)

    def test_single_lang_host_is_zero(self):
        from pdf_extractor_ray.pipelines.textops import host_lang_entropy

        got = host_lang_entropy(SF_DIR).to_pandas()
        mono = got[got["n_langs"] == 1]
        assert (mono["ent_total_micro"] == 0).all()
