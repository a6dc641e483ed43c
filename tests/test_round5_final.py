"""Round-5 final-session wave: table-structure extraction and the
session's other additions. Kernel tests are pure-Python (no Ray);
carrier tests run through the session Ray fixture."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_ray.kernels.html_extract import html_extract_tables


class TestHtmlExtractTables:
    def test_basic_grid_with_header(self):
        raw = b"<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>"
        assert html_extract_tables(raw) == [
            (0, 0, 0, 1, "A"),
            (0, 0, 1, 1, "B"),
            (0, 1, 0, 0, "1"),
            (0, 1, 1, 0, "2"),
        ]

    def test_rowspan_occupies_column_below_anchor(self):
        raw = (
            b'<table><tr><td rowspan="2">X</td><td>a</td><td>b</td></tr>'
            b"<tr><td>c</td><td>d</td></tr></table>"
        )
        # row 1's first free grid column is 1: col 0 is covered by X
        assert html_extract_tables(raw) == [
            (0, 0, 0, 0, "X"),
            (0, 0, 1, 0, "a"),
            (0, 0, 2, 0, "b"),
            (0, 1, 1, 0, "c"),
            (0, 1, 2, 0, "d"),
        ]

    def test_colspan_advances_grid_cursor(self):
        raw = b"<table><tr><td colspan=2>W</td><td>z</td></tr></table>"
        assert html_extract_tables(raw) == [(0, 0, 0, 0, "W"), (0, 0, 2, 0, "z")]

    def test_rowspan_colspan_combined_block(self):
        # a 2x2 merged block: covers cols 0-1 of rows 0-1
        raw = (
            b'<table><tr><td rowspan="2" colspan="2">M</td><td>a</td></tr>'
            b"<tr><td>b</td></tr><tr><td>c</td></tr></table>"
        )
        assert html_extract_tables(raw) == [
            (0, 0, 0, 0, "M"),
            (0, 0, 2, 0, "a"),
            (0, 1, 2, 0, "b"),
            (0, 2, 0, 0, "c"),
        ]

    def test_demoted_container_table_dropped_and_idx_not_consumed(self):
        raw = (
            b'<div class="sidebar"><table><tr><td>CHROME</td></tr></table></div>'
            b"<table><tr><td>data</td></tr></table>"
        )
        assert html_extract_tables(raw) == [(0, 0, 0, 0, "data")]

    def test_self_demoted_table_dropped(self):
        raw = (
            b'<table class="footer"><tr><td>x</td></tr></table>'
            b"<table><tr><td>y</td></tr></table>"
        )
        assert html_extract_tables(raw) == [(0, 0, 0, 0, "y")]

    def test_nested_table_gets_own_idx_and_does_not_leak(self):
        raw = (
            b"<table><tr><td>outer <table><tr><td>inner</td></tr></table>"
            b" tail</td></tr></table>"
        )
        out = sorted(html_extract_tables(raw))
        assert out == [(0, 0, 0, 0, "outer tail"), (1, 0, 0, 0, "inner")]

    def test_implicit_closes_and_unclosed_eof(self):
        raw = b"<table><tr><td>a<td>b<tr><td>c"
        assert html_extract_tables(raw) == [
            (0, 0, 0, 0, "a"),
            (0, 0, 1, 0, "b"),
            (0, 1, 0, 0, "c"),
        ]

    def test_entities_unescaped_whitespace_collapsed(self):
        raw = b"<table><tr><td>  a&amp;b \n  c </td></tr></table>"
        assert html_extract_tables(raw) == [(0, 0, 0, 0, "a&b c")]

    def test_empty_cell_emitted_at_its_grid_position(self):
        raw = b"<table><tr><td></td><td>v</td></tr></table>"
        assert html_extract_tables(raw) == [(0, 0, 0, 0, ""), (0, 0, 1, 0, "v")]

    def test_script_payload_inside_cell_skipped(self):
        raw = b"<table><tr><td>x<script>var t = '<td>evil</td>';</script>y</td></tr></table>"
        assert html_extract_tables(raw) == [(0, 0, 0, 0, "xy")]

    def test_markup_inside_cell_contributes_text_only(self):
        raw = b"<table><tr><td><b>bold</b> and <i>em</i></td></tr></table>"
        assert html_extract_tables(raw) == [(0, 0, 0, 0, "bold and em")]

    def test_no_tables(self):
        assert html_extract_tables(b"<p>plain</p>") == []

    def test_truncated_garbage_never_raises(self):
        raw = b'<table><tr><td rowspan="2">X</td><td>a</td></tr><tr><td>c</td></tr></table>'
        for i in range(len(raw)):
            html_extract_tables(raw[:i])  # must not raise


class TestExtractTablesCarrier:
    def test_sf0001_matches_token_arithmetic(self, ray_session):
        from pdf_extractor_ray.pipelines.webdocs import extract_tables_documents

        df = extract_tables_documents("/root/testdata/sf0.001").to_pandas()
        # every doc contributes exactly one table (idx 0) with a header row
        assert (df["table_idx"] == 0).all()
        hdr = df[df["is_header"] == 1]
        assert set(hdr["cell"]) == {"KEY", "VALUE"}
        import pyarrow.parquet as pq

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        n_docs = len(docs)
        assert (hdr.groupby("doc_id").size() == 2).all() and hdr["doc_id"].nunique() == n_docs
        # spot-check the first data row of a doc with >= 2 tokens
        row = docs[docs["text"].str.split().str.len() >= 2].iloc[0]
        toks = row["text"].split()
        got = df[(df["doc_id"] == row["doc_id"]) & (df["row_idx"] == 1)].sort_values("col_idx")
        assert list(got["cell"]) == [toks[0], toks[1]]
        # chrome (BOILER) cells never survive
        assert not df["cell"].str.startswith("BOILER").any()
