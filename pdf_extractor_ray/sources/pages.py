"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1).

Schema: ``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``. Row mix: ~80% HTML (known main content wrapped in
link-dense boilerplate), ~15% synthesized PDFs (text runs at known
coordinates, out-of-order emission, ligatures, Flate-compressed
streams), ~5% edge rows (empty / truncated / non-UTF-8 / mega-doc /
punctuation-variant duplicate urls).

Everything is keyed off ``seed`` and the row index only — content for
row *i* is identical regardless of how many rows are generated or in
what order, which is what makes goldens stable across scales.

The PDF writer here targets exactly the operator subset the kernel
parser (``kernels/pdf_extract.py``) implements — but note the tests
assert against *planted plain text*, not against the parser itself, so
writer and parser cannot be trivially co-wrong.
"""

from __future__ import annotations

import random
import zlib
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

_WORDS = (
    "data engine stream batch arrow block actor shuffle spill partition "
    "table schema column vector kernel ray cluster worker driver object "
    "store memory page document text span layout line order hash key "
    "merge union filter project aggregate window join sort limit sample "
    "crawl web html parse extract content boiler plate density link "
    "quality language token shingle finger print signature bucket band "
    "field value record output input golden oracle manifest commit resume"
).split()

_DE_WORDS = "der die das und ist nicht eine mit von auf für im daten seite inhalt sprache".split()
_FR_WORDS = "le la les et est une des dans que pour qui sur pas page contenu texte".split()

_EPOCH = datetime(2024, 1, 1)

LIG_SENTENCE = "The ﬁrst ﬂoor ofﬁce is efﬁcient."  # planted ligatures (PDF rows)


def _sentence(rng: random.Random, n: int, words=_WORDS) -> str:
    ws = [rng.choice(words) for _ in range(n)]
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, n_sent: int, words=_WORDS) -> str:
    return " ".join(_sentence(rng, rng.randint(6, 14), words) for _ in range(n_sent))


def wrap_in_boilerplate(main_html: str, extra_links: str = "") -> bytes:
    """Wrap main content in the link-dense nav/header/aside/footer
    scaffolding (BOILER markers) shared by every synthetic page — the
    known-wrong content a text/link-density extractor must strip.

    The ``div.promo.sidebar`` block is text-HEAVY and link-free: link
    density alone cannot reject it — only the id/class demotion hints
    can, which makes every synthetic page (and thus the flagship
    golden + driver oracles) exercise the hint path."""
    nav_links = "".join(f'<li><a href="/cat/{i}">BOILER nav {i}</a></li>' for i in range(8))
    side_links = "".join(f'<a href="/rel/{i}">BOILER related {i}</a> ' for i in range(12))
    promo = (
        "BOILER promo: subscribe to our excellent newsletter today for "
        "weekly curated updates and exclusive long-form partner stories."
    )
    html = (
        "<!DOCTYPE html><html><head><title>BOILER title</title>"
        "<style>body{margin:0}</style><script>var x=1;</script></head>"
        f"<body><nav><ul>{nav_links}{extra_links}</ul></nav>"
        '<header><a href="/">BOILER home</a> | <a href="/about">BOILER about</a></header>'
        f'<div id="content">{main_html}</div>'
        f'<div class="promo sidebar"><p>{promo}</p></div>'
        f'<aside class="sidebar">{side_links}</aside>'
        f"<footer><p><a href='/tos'>BOILER terms</a> <a href='/priv'>BOILER privacy</a></p></footer>"
        "</body></html>"
    )
    return html.encode("utf-8")


def make_html_page(rng: random.Random, n_paras: int, lang: str = "en") -> tuple[bytes, str]:
    """Boilerplate-wrapped page; returns (html_bytes, expected_main_text).

    The nav/header/footer/sidebar are link-dense (BOILER markers) and
    the promo box is class-demoted, so the extractor has a known right
    answer: exactly the main ``<p>`` paragraphs — plus, on ~1/3 of
    pages, a small data table whose rows serialize cell-joined
    ("h1 | h2" …) after the paragraphs — in order, joined by newlines.
    """
    words = {"en": _WORDS, "de": _DE_WORDS, "fr": _FR_WORDS}.get(lang, _WORDS)
    paras = [_paragraph(rng, rng.randint(2, 5), words) for _ in range(n_paras)]
    expected = list(paras)
    table_html = ""
    if rng.random() < 0.35:  # data table: short numeric cells are content
        headers = ["metric", "value"]
        rows = [[rng.choice(words), str(rng.randint(0, 999))] for _ in range(rng.randint(2, 4))]
        table_html = (
            "<table><tr>"
            + "".join(f"<th>{h}</th>" for h in headers)
            + "</tr>"
            + "".join("<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows)
            + "</table>"
        )
        expected.append(" | ".join(headers))
        expected.extend(" | ".join(r) for r in rows)
    main_html = "<article>" + "".join(f"<p>{p}</p>" for p in paras) + table_html + "</article>"
    extra = f'<li><a href="/x/{rng.randint(0, 99)}">BOILER extra {rng.choice(_WORDS)}</a></li>'
    return wrap_in_boilerplate(main_html, extra), "\n".join(expected)


def make_pdf(
    pages: list[list[tuple[float, float, float, str]]],
    compress: bool = False,
    page_height: float = 792.0,
    info: dict[str, str] | None = None,
) -> bytes:
    """Minimal multi-page PDF. Each page = list of text runs
    ``(x, y_pdf_bottom_up, font_size, text)`` emitted in the given
    (possibly shuffled) order; reading order is a function of coords.
    ``info`` plants a document-information dictionary (/Title, /Author,
    …) referenced from the trailer's ``/Info`` key.
    """
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    n_pages = len(pages)
    # obj 1 catalog, obj 2 pages, then per page: page obj, contents obj
    def add_obj(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj".encode())
        out.extend(body)
        out.extend(b"endobj\n")

    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    add_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>\n")
    add_obj(2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>\n".encode())
    for i, runs in enumerate(pages):
        page_num = 3 + 2 * i
        cont_num = page_num + 1
        add_obj(
            page_num,
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 {page_height:g}] "
                f"/Contents {cont_num} 0 R /Resources << /Font << /F1 99 0 R >> >> >>\n"
            ).encode(),
        )
        stream = bytearray()
        for x, y, size, text in runs:
            esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            stream.extend(
                f"BT /F1 {size:g} Tf 1 0 0 1 {x:g} {y:g} Tm (".encode()
                + esc.encode("utf-8")
                + b") Tj ET\n"
            )
        data = bytes(stream)
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
        else:
            head = f"<< /Length {len(data)} >>\nstream\n".encode()
        add_obj(cont_num, head + data + b"\nendstream\n")
    add_obj(99, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n")
    info_ref = ""
    if info:
        ents = bytearray(b"<<")
        for k, v in info.items():
            esc = v.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            ents += f" /{k} (".encode() + esc.encode("utf-8") + b")"
        ents += b" >>\n"
        add_obj(98, bytes(ents))
        info_ref = " /Info 98 0 R"
    # xref (not parsed by our kernel, but keeps the file honest-looking)
    xref_at = len(out)
    out.extend(f"xref\n0 1\n0000000000 65535 f \ntrailer\n<< /Size {len(offsets)+1} /Root 1 0 R{info_ref} >>\nstartxref\n{xref_at}\n%%EOF\n".encode())
    return bytes(out)


def _pdf_runs_for_row(rng: random.Random, n_pages: int) -> list[list[tuple[float, float, float, str]]]:
    """Known text runs at known coordinates; emission order shuffled to
    exercise the y/x reading-order sort."""
    pages = []
    for _ in range(n_pages):
        runs = []
        y = 720.0
        for _line in range(rng.randint(3, 8)):
            x = 72.0
            for _seg in range(rng.randint(1, 3)):
                text = _sentence(rng, rng.randint(2, 5))
                runs.append((x, y, 12.0, text))
                x += 6.0 * len(text) + 12.0
            y -= 24.0
        if rng.random() < 0.5:
            runs.append((72.0, y, 12.0, LIG_SENTENCE))
        rng.shuffle(runs)  # out-of-order emission
        pages.append(runs)
    return pages


def generate_pages_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Build the pages table in memory (deterministic per (seed, row))."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_rows):
        rng = random.Random((seed << 32) ^ i)
        r = rng.random()
        url = f"https://site{i % 97}.example.com/page/{i}"
        ts = _EPOCH + timedelta(seconds=i * 37)
        lang = rng.choice(["en", "en", "en", "de", "fr"])
        if r < 0.80:  # HTML row
            raw, main = make_html_page(rng, rng.randint(2, 6), lang)
        elif r < 0.95:  # PDF row
            runs = _pdf_runs_for_row(rng, rng.randint(1, 3))
            raw = make_pdf(runs, compress=rng.random() < 0.5)
            main = ""  # goldens come from the oracle, not pre-known here
        else:  # edge rows
            edge = rng.randint(0, 4)
            if edge == 0:
                raw = b""  # empty
                main = ""
            elif edge == 1:
                raw = b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(64))  # truncated pdf
                main = ""
            elif edge == 2:
                raw = bytes([0xFF, 0xFE, 0x00]) + bytes(rng.getrandbits(8) for _ in range(128))  # non-utf8
                main = ""
            elif edge == 3:  # mega HTML doc (~100x median)
                raw, main = make_html_page(rng, 200, lang)
            else:  # duplicate url with punctuation/case variant
                base = i - (i % 10) - 1
                if base < 0:
                    base = 0
                url = f"HTTPS://Site{base % 97}.Example.com/Page/{base}!!"
                rng2 = random.Random((seed << 32) ^ base)
                r2 = rng2.random()
                if r2 < 0.80:
                    raw, main = make_html_page(rng2, rng2.randint(2, 6), lang)
                else:
                    raw, main = make_html_page(rng2, 3, lang)
        urls.append(url)
        tss.append(ts)
        htmls.append(raw)
        texts.append("")  # raw crawl text unused by the extractor
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_corpus(out_dir: str, n_rows: int, n_files: int = 4, seed: int = 42) -> list[str]:
    """Write the corpus as multiple parquet files (so partitioning,
    resume, and skew are real). Returns the file paths."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_rows + n_files - 1) // n_files
    table = generate_pages_table(n_rows, seed)
    for f in range(n_files):
        lo = f * per
        hi = min(n_rows, lo + per)
        if lo >= hi:
            break
        path = os.path.join(out_dir, f"pages_{f:05d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path)
        paths.append(path)
    return paths
