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


class TestCharsetDetect:
    def test_bom_precedence_over_meta(self):
        from pdf_extractor_ray.kernels.sniff import detect_charset

        raw = b"\xef\xbb\xbf" + b'<meta charset="iso-8859-1">x'
        assert detect_charset(raw) == ("utf-8", "bom")

    def test_utf16_boms(self):
        from pdf_extractor_ray.kernels.sniff import detect_charset

        assert detect_charset(b"\xff\xfe" + "x".encode("utf-16-le")) == ("utf-16-le", "bom")
        assert detect_charset(b"\xfe\xff" + "x".encode("utf-16-be")) == ("utf-16-be", "bom")

    def test_meta_charset_forms_and_aliases(self):
        from pdf_extractor_ray.kernels.sniff import detect_charset

        assert detect_charset(b'<meta charset="ISO-8859-1">') == ("windows-1252", "meta")
        assert detect_charset(
            b'<meta http-equiv="Content-Type" content="text/html; charset=Shift_JIS">'
        ) == ("shift_jis", "meta")
        # WHATWG: a meta-declared utf-16 label is treated as utf-8
        assert detect_charset(b'<meta charset="utf-16">') == ("utf-8", "meta")
        # unknown label falls through the chain
        assert detect_charset(b'<meta charset="no-such-enc">ascii body') == (
            "utf-8",
            "utf8-valid",
        )

    def test_strict_utf8_then_cp1252_fallback(self):
        from pdf_extractor_ray.kernels.sniff import detect_charset

        assert detect_charset("café".encode("utf-8")) == ("utf-8", "utf8-valid")
        assert detect_charset(b"caf\xe9") == ("windows-1252", "fallback")

    def test_decode_strips_bom_and_maps_cp1252(self):
        from pdf_extractor_ray.kernels.sniff import decode_html_bytes

        text, codec, src = decode_html_bytes(b"\xff\xfe" + "hé".encode("utf-16-le"))
        assert (text, codec, src) == ("hé", "utf-16-le", "bom")
        # 0x93/0x94 are cp1252 curly quotes; 0x81 is undefined -> latin-1
        assert decode_html_bytes(b"\x93q\x94")[0] == "“q”"
        assert decode_html_bytes(b"a\x81b")[0] == "a\x81b"

    def test_sniff_classifies_bom_utf16_html_but_keeps_garbage_binary(self):
        from pdf_extractor_ray.kernels.sniff import KIND_BINARY, KIND_HTML, sniff

        page = b"\xff\xfe" + "<html><body><p>hi</p></body></html>".encode("utf-16-le")
        assert sniff(page) == KIND_HTML
        garbage = bytes([0xFF, 0xFE, 0x00]) + bytes(range(128))
        assert sniff(garbage) == KIND_BINARY

    def test_html_extract_decodes_cp1252_and_utf16(self):
        from pdf_extractor_ray.kernels.html_extract import html_extract

        cp = '<div id="content"><p>résumé and café content here</p></div>'
        text, _ = html_extract(cp.encode("cp1252"))
        assert "résumé" in text and "café" in text
        u16 = b"\xff\xfe" + cp.encode("utf-16-le")
        text16, _ = html_extract(u16)
        assert text16 == text


class TestExtractCharsetCarrier:
    def test_sf0001_all_four_encodings_recovered(self, ray_session):
        from pdf_extractor_ray.pipelines.webdocs import extract_charset_documents

        df = extract_charset_documents("/root/testdata/sf0.001").to_pandas()
        import pyarrow.parquet as pq

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        assert len(df) == len(docs)
        m = df.merge(docs, on="doc_id")
        mod = m["doc_id"] % 4
        assert (m.loc[mod == 2, "charset"] == "utf-16-le").all()
        assert (m.loc[mod == 3, "charset"] == "windows-1252").all()
        assert (m.loc[mod == 3, "charset_source"] == "meta").all()
        # byte-identical text recovery for the plain rows
        plain = m[(mod < 3) & (m["text"].str.strip() != "")]
        assert (plain["extracted_text"] == plain["text"]).all()
        # cp1252 rows carry the non-ascii marker, decoded correctly
        assert m.loc[mod == 3, "extracted_text"].str.endswith("émigré café").all()


class TestPdfInfo:
    def _pdf(self, **info):
        from pdf_extractor_ray.sources.pages import make_pdf

        return make_pdf([[(72.0, 720.0, 12.0, "hello world")]], info=info or None)

    def test_info_roundtrip_with_escapes(self):
        from pdf_extractor_ray.kernels.pdf_extract import pdf_extract_info

        raw = self._pdf(Title="a (nested) \\ title", Author="me", Subject="en")
        assert pdf_extract_info(raw) == {
            "Title": "a (nested) \\ title",
            "Author": "me",
            "Subject": "en",
        }

    def test_no_info_dict_returns_empty(self):
        from pdf_extractor_ray.kernels.pdf_extract import pdf_extract_info

        assert pdf_extract_info(self._pdf()) == {}

    def test_non_pdf_raises(self):
        from pdf_extractor_ray.kernels.pdf_extract import pdf_extract_info

        with pytest.raises(ValueError):
            pdf_extract_info(b"<html></html>")

    def test_utf16be_hex_value(self):
        from pdf_extractor_ray.kernels.pdf_extract import pdf_extract_info

        raw = self._pdf(Author="z")
        hexs = (b"\xfe\xff" + "tïtle".encode("utf-16-be")).hex().encode()
        raw = raw.replace(b"/Author (z)", b"/Author (z) /Title <" + hexs + b">")
        assert pdf_extract_info(raw) == {"Title": "tïtle", "Author": "z"}

    def test_utf16be_literal_value(self):
        from pdf_extractor_ray.kernels.pdf_extract import pdf_extract_info

        raw = self._pdf(Author="z")
        # plant a UTF-16BE literal string (BOM + big-endian code units)
        lit = b"\xfe\xff" + "hé".encode("utf-16-be")
        esc = lit.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
        raw = raw.replace(b"/Author (z)", b"/Author (z) /Title (" + esc + b")")
        assert pdf_extract_info(raw)["Title"] == "hé"

    def test_incremental_update_last_trailer_wins(self):
        from pdf_extractor_ray.kernels.pdf_extract import pdf_extract_info

        base = self._pdf(Title="old")
        upd = base + (
            b"\n97 0 obj<< /Title (new) >>\nendobj\n"
            b"trailer\n<< /Size 9 /Root 1 0 R /Info 97 0 R >>\nstartxref\n0\n%%EOF\n"
        )
        assert pdf_extract_info(upd) == {"Title": "new"}

    def test_extraction_text_unaffected_by_info(self):
        from pdf_extractor_ray.kernels.pdf_extract import pdf_extract

        with_info = self._pdf(Title="t", Author="a")
        without = self._pdf()
        assert pdf_extract(with_info)[0] == pdf_extract(without)[0] == "hello world"

    def test_carrier_sf0001(self, ray_session):
        from pdf_extractor_ray.pipelines.webdocs import extract_pdfinfo_documents

        df = extract_pdfinfo_documents("/root/testdata/sf0.001").to_pandas()
        import pyarrow.parquet as pq

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        ).to_pandas()
        m = df.merge(docs, on="doc_id")
        assert len(m) == len(docs)
        assert (m["author"] == m["source"]).all() and (m["subject"] == m["lang"]).all()
        nonempty = m[m["text"].str.strip() != ""]
        exp = nonempty["text"].str.split().str[:3].str.join(" ")
        assert (nonempty["title"] == exp).all()


class TestPolitenessSchedule:
    def test_wave_invariants_sf0001(self, ray_session):
        from pdf_extractor_ray.pipelines.urlops import (
            SCHEDULE_PER_WAVE,
            crawl_schedule_documents,
        )

        df = crawl_schedule_documents("/root/testdata/sf0.001").to_pandas()
        # politeness: never more than per_wave fetches of a host per wave
        per = df.groupby(["host", "wave"]).size()
        assert (per <= SCHEDULE_PER_WAVE).all()
        # waves are dense from 0 per host: every wave below the max is full
        for host, g in df.groupby("host"):
            waves = sorted(g["wave"])
            n = len(g)
            assert waves == [i // SCHEDULE_PER_WAVE for i in range(n)]

    def test_partition_invariance(self, ray_session):
        import ray.data

        from pdf_extractor_ray.pipelines.urlops import politeness_schedule

        rows = pd.DataFrame({"doc_id": range(40), "host": [f"h{i % 3}" for i in range(40)]})
        a = politeness_schedule(ray.data.from_pandas(rows), seed=7).to_pandas()
        b = politeness_schedule(
            ray.data.from_pandas(rows).repartition(8), seed=7
        ).to_pandas()
        key = ["host", "doc_id", "wave"]
        assert a[key].sort_values(key).reset_index(drop=True).equals(
            b[key].sort_values(key).reset_index(drop=True)
        )


class TestSplitSentences:
    def test_basic_terminators(self):
        from pdf_extractor_ray.kernels.textstats import split_sentences

        assert split_sentences("First one. Second here! Third?  Fourth") == [
            "First one",
            "Second here",
            "Third",
            "Fourth",
        ]

    def test_abbreviations_and_initials_do_not_split(self):
        from pdf_extractor_ray.kernels.textstats import split_sentences

        assert split_sentences("Dr. Who met J. Smith. They left.") == [
            "Dr. Who met J. Smith",
            "They left",
        ]
        assert split_sentences("See e.g. the spec. Done.") == ["See e.g. the spec", "Done"]

    def test_lowercase_single_letter_splits(self):
        from pdf_extractor_ray.kernels.textstats import split_sentences

        # lowercase 'a.' is a word, not an initial — must split
        assert split_sentences("ends in a. next one") == ["ends in a", "next one"]

    def test_multi_terminator_runs(self):
        from pdf_extractor_ray.kernels.textstats import split_sentences

        assert split_sentences("Multi!!! Bang?! End.") == ["Multi", "Bang", "End"]

    def test_empty_and_unterminated(self):
        from pdf_extractor_ray.kernels.textstats import split_sentences

        assert split_sentences("") == []
        assert split_sentences("no terminator here") == ["no terminator here"]

    def test_carrier_matches_token_arithmetic(self, ray_session):
        from pdf_extractor_ray.pipelines.textops import SENT_EVERY, split_sentences_documents

        df = split_sentences_documents("/root/testdata/sf0.001").to_pandas()
        import pyarrow.parquet as pq

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        row = docs[docs["text"].str.split().str.len() >= SENT_EVERY + 1].iloc[0]
        toks = row["text"].split()
        got = df[df["doc_id"] == row["doc_id"]].sort_values("sent_idx")
        assert got.iloc[0]["sentence"] == " ".join(toks[:SENT_EVERY])
        assert (got["n_tokens"] == got["sentence"].str.split().str.len()).all()
        import math

        assert len(got) == math.ceil(len(toks) / SENT_EVERY)
