"""Round-5 wave-15 operator tests.

WARC revisit records, robots crawl-delay parsing + politeness ETA,
per-host median length, corpus-mix report. Ray session comes from the
shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestWarcRevisitRecords:
    def test_round_trip_and_channel_separation(self):
        from pdf_extractor_ray.sources.warc import (
            build_warc,
            parse_warc,
            parse_warc_revisits,
        )

        raw = build_warc(
            [
                {"url": "https://x/1", "ts": "t1", "body": b"<html>a</html>"},
                {"url": "https://x/1b", "ts": "t2", "revisit_of": "https://x/1"},
                {"url": "https://x/2", "ts": "t3", "body": b"<html>b</html>"},
            ]
        )
        resp = parse_warc(raw)
        rev = parse_warc_revisits(raw)
        assert [r["url"] for r in resp] == ["https://x/1", "https://x/2"]
        assert rev == [{"url": "https://x/1b", "ts": "t2", "refers_to": "https://x/1"}]

    def test_gzip_members_and_truncation(self):
        from pdf_extractor_ray.sources.warc import build_warc, parse_warc_revisits

        raw = build_warc(
            [{"url": "https://x/1b", "ts": "t", "revisit_of": "https://x/1"}],
            gzip_members=True,
        )
        assert parse_warc_revisits(raw)[0]["refers_to"] == "https://x/1"
        # truncation mid-record: stop, never crash
        for cut in range(0, len(raw), 7):
            parse_warc_revisits(raw[:cut])

    def test_missing_refers_to_skipped(self):
        from pdf_extractor_ray.sources.warc import parse_warc_revisits

        raw = (
            b"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: https://x/1\r\n"
            b"Content-Length: 0\r\n\r\n"
        )
        assert parse_warc_revisits(raw) == []


class TestWarcRevisitPipeline:
    def test_resolution(self):
        from pdf_extractor_ray.pipelines.webdocs import warc_revisit_documents

        got = warc_revisit_documents(SF_DIR).to_pandas()
        got["d"] = got["url"].str.rsplit("/", n=1).str[1].astype(np.int64)
        rev = got[got["d"] % 4 == 1]
        assert (rev["is_revisit"] == 1).all()
        assert (
            rev["resolved_url"]
            == "https://docs.example.com/" + (rev["d"] - 1).astype(str)
        ).all()
        norm = got[got["d"] % 4 != 1]
        assert (norm["is_revisit"] == 0).all()
        assert (norm["resolved_url"] == norm["url"]).all()


class TestCrawlDelayParse:
    def test_scoping_and_malformed(self):
        from pdf_extractor_ray.functions.urls import parse_robots_crawl_delay as f

        assert f("User-agent: *\nCrawl-delay: 5\n") == 5
        # foreign group only: no applicable delay
        assert f("User-agent: OtherBot\nCrawl-delay: 9\n") is None
        # malformed value ignored; later applicable value wins
        assert f("User-agent: *\nCrawl-delay: soon\nCrawl-delay: 3\n") == 3
        # first applicable wins over later groups
        assert (
            f("User-agent: *\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 7\n") == 2
        )
        assert f("") is None


class TestCrawlEta:
    def test_eta_is_wave_times_delay(self):
        from pdf_extractor_ray.pipelines.urlops import crawl_eta_documents

        got = crawl_eta_documents(SF_DIR).to_pandas()
        hid = got["host"].str.extract(r"h(\d+)")[0].astype(int)
        delay = np.where(hid % 4 == 0, 5, 1)
        assert (got["eta_sec"].to_numpy() == got["wave"].to_numpy() * delay).all()
        # delayed hosts genuinely spread further out
        assert got.loc[hid % 4 == 0, "eta_sec"].max() > got.loc[hid % 4 != 0, "eta_sec"].max()


class TestHostLengthMedian:
    def test_matches_nearest_rank_replica(self):
        from pdf_extractor_ray.pipelines.textops import host_length_median

        got = host_length_median(SF_DIR).to_pandas().set_index("host")
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "n_chars"]
        ).to_pandas()
        docs["host"] = "h" + (docs["doc_id"] % 13).astype(str) + ".example.org"
        for host, sub in docs.groupby("host"):
            v = np.sort(sub["n_chars"].to_numpy(np.int64))
            want = v[max(1, int(np.ceil(0.5 * len(v)))) - 1]
            assert got.loc[host, "p50_chars"] == want


class TestCorpusMixReport:
    def test_shares_and_totals(self):
        from pdf_extractor_ray.pipelines.corpus import corpus_mix_report

        got = corpus_mix_report(SF_DIR).to_pandas().set_index("source")
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["source", "text"]
        ).to_pandas()
        n_tok = docs["text"].str.split().str.len()
        total = int(n_tok.sum())
        for src, sub in docs.groupby("source"):
            t = int(n_tok[sub.index].sum())
            assert got.loc[src, "n_docs"] == len(sub)
            assert got.loc[src, "n_tokens"] == t
            assert got.loc[src, "token_share_milli"] == (1000 * t) // total
        # shares sum to ~1000 (floor loss < number of sources)
        s = got["token_share_milli"].sum()
        assert 1000 - len(got) < s <= 1000
