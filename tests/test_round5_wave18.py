"""Round-5 wave-18 operator tests.

Alias resolution (redirect∘canonical), char-level entropy, multi-grain
URL rollup, CDX index generation from WARC. Ray session comes from the
shared session fixture in conftest.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


class TestAliasResolution:
    def test_composition_order(self):
        from pdf_extractor_ray.pipelines.graph import alias_resolution_documents

        got = alias_resolution_documents(SF_DIR).to_pandas().set_index("doc_id")
        ids = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy()
        for d in (int(v) for v in ids):
            cur = d
            while cur % 4 != 0 and cur % 9 != 0:
                cur -= 1
            alias = cur if cur % 9 == 0 else cur - cur % 4
            assert got.loc[d, "alias_url"] == f"https://docs.example.com/{alias}", d
        # canonical applies to the FINAL page, not the start page: a
        # redirecting doc whose own canonical differs must not leak
        assert len(got) == len(ids)


class TestCharEntropy:
    def test_matches_local_replica(self):
        from pdf_extractor_ray.pipelines.textops import char_entropy_documents

        got = char_entropy_documents(SF_DIR).to_pandas().set_index("doc_id")
        docs = pq.read_table(
            SF_DIR + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        for d, t in zip(docs["doc_id"], docs["text"]):
            if not t:
                assert got.loc[d, "ent_total_micro"] == 0
                continue
            _, counts = np.unique(
                np.frombuffer(t.encode("utf-8"), np.uint8), return_counts=True
            )
            c = counts.astype(np.float64)
            n = float(c.sum())
            want = int(
                np.floor((c * np.log(n / c)) * 1_000_000 + 0.5).astype(np.int64).sum()
            )
            assert got.loc[d, "ent_total_micro"] == want
            assert got.loc[d, "n_chars"] == int(n)

    def test_uniform_beats_repeated(self):
        # entropy sanity at the kernel level via the replica expression
        def ent(s: str) -> int:
            _, counts = np.unique(
                np.frombuffer(s.encode(), np.uint8), return_counts=True
            )
            c = counts.astype(np.float64)
            n = float(c.sum())
            return int(np.floor((c * np.log(n / c)) * 1e6 + 0.5).sum())

        assert ent("aaaaaaaa") == 0
        assert ent("abcdefgh") > ent("aabbccdd") > ent("aaaaaaab") > 0


class TestUrlGrainRollup:
    def test_grain_totals_and_collapse(self):
        from pdf_extractor_ray.pipelines.urlops import url_grain_rollup

        got = url_grain_rollup(SF_DIR).to_pandas()
        n = pq.read_metadata(SF_DIR + "/documents.parquet").num_rows
        for grain in ("host", "domain", "tld"):
            assert got.loc[got["grain"] == grain, "n_docs"].sum() == n
        tlds = set(got.loc[got["grain"] == "tld", "key"])
        assert tlds == {"co.uk", "github.io", "com", "com.au"}
        # fam-2 registrable domains collapse to ONE owner key
        dom = got[(got["grain"] == "domain") & (got["key"] == "example.com")]
        assert dom["n_docs"].sum() == (
            pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id"])[
                "doc_id"
            ].to_numpy()
            % 4
            == 2
        ).sum()


class TestWarcCdx:
    def test_slice_identity(self):
        # every indexed record must re-parse standalone from its slice
        from pdf_extractor_ray.sources.warc import (
            build_warc,
            parse_warc,
            parse_warc_index,
        )

        recs = [
            {"url": f"https://x/{i}", "ts": f"t{i}", "body": b"<p>" + b"y" * i + b"</p>"}
            for i in range(20)
        ]
        recs.insert(5, {"url": "https://x/rv", "ts": "tr", "revisit_of": "https://x/1"})
        raw = build_warc(recs)
        idx = parse_warc_index(raw)
        assert len(idx) == 21
        offs = [r["offset"] for r in idx]
        assert offs == sorted(offs)
        for r in idx:
            sl = raw[r["offset"] : r["offset"] + r["length"]]
            if r["warc_type"] == "response":
                one = parse_warc(sl)
                assert len(one) == 1 and one[0]["url"] == r["url"]

    def test_gzip_offsets_against_decompressed_stream(self):
        from pdf_extractor_ray.sources.warc import (
            _gunzip_members,
            build_warc,
            parse_warc,
            parse_warc_index,
        )

        raw = build_warc(
            [{"url": "https://x/1", "ts": "t", "body": b"<html>z</html>"}],
            gzip_members=True,
        )
        idx = parse_warc_index(raw)
        plain = _gunzip_members(raw)
        r = idx[0]
        assert parse_warc(plain[r["offset"] : r["offset"] + r["length"]])[0]["url"] == "https://x/1"

    def test_pipeline_counts(self):
        from pdf_extractor_ray.pipelines.webdocs import warc_cdx_documents

        got = warc_cdx_documents(SF_DIR).to_pandas()
        n = pq.read_metadata(SF_DIR + "/documents.parquet").num_rows
        assert len(got) == n
        assert (got["record_idx"] < 16).all()
        assert (got["length"] > 0).all()
