"""Property-based tests (hypothesis): kernels never crash on arbitrary
bytes, and writer→parser round trips hold for arbitrary content."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from pdf_extractor_ray.kernels.html_extract import html_extract
from pdf_extractor_ray.kernels.normalize import format_value, normalize_key
from pdf_extractor_ray.kernels.record import extract_record
from pdf_extractor_ray.kernels.pdf_extract import pdf_extract
from pdf_extractor_ray.sources.pages import make_pdf

_SETTINGS = dict(max_examples=150, suppress_health_check=[HealthCheck.too_slow], deadline=None)


@given(raw=st.binary(max_size=4096))
@settings(**_SETTINGS)
def test_extract_record_total_on_arbitrary_bytes(raw):
    """extract_record is total: any byte string → a well-formed record."""
    rec = extract_record("u", raw)
    assert rec["status"].split(":")[0] in {"ok", "empty", "quarantined"}
    assert isinstance(rec["extracted_text"], str)
    for s in rec["char_spans"]:
        assert 0 <= s["start"] <= s["end"] <= len(rec["extracted_text"])


@given(html=st.text(max_size=2048))
@settings(**_SETTINGS)
def test_html_extract_never_raises(html):
    text, spans = html_extract(html.encode("utf-8"))
    for s in spans:
        assert text[s["start"] : s["end"]].strip() == text[s["start"] : s["end"]]


_pdf_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF),
    min_size=1,
    max_size=40,
).filter(lambda t: t.strip())


@given(
    runs=st.lists(
        st.tuples(
            st.floats(10, 500),  # x
            st.floats(10, 700),  # y
            _pdf_text,
        ),
        min_size=1,
        max_size=8,
    ),
    compress=st.booleans(),
)
@settings(**_SETTINGS)
def test_pdf_writer_parser_roundtrip_words_preserved(runs, compress):
    """Every non-empty word written into a PDF reappears in the
    extracted text (modulo ligature/whitespace normalization and
    reading-order concatenation)."""
    from pdf_extractor_ray.kernels.normalize import normalize_ligatures

    pdf = make_pdf([[(x, y, 12.0, t) for x, y, t in runs]], compress=compress)
    text, spans = pdf_extract(pdf)
    for _, _, t in runs:
        expected = normalize_ligatures(t).strip()
        if expected:
            assert expected in text
    # offsets index the text
    for s in spans:
        assert 0 <= s["start"] < s["end"] <= len(text)


@given(v=st.text(max_size=60))
@settings(**_SETTINGS)
def test_normalizers_total_and_idempotent(v):
    f = format_value(v)
    assert format_value(f) == f or "$" not in f  # idempotent modulo symbols
    k = normalize_key(v)
    assert normalize_key(k) == k


def test_join_planner_plans_agree_property():
    """Property: for random tables, semi/anti/inner results are
    identical across the broadcast plan, the exchange plan, and a
    pandas ground truth."""
    import numpy as np
    import pandas as pd
    import ray.data

    from pdf_extractor_ray.joins import adaptive_inner_join, semi_join

    rng = np.random.default_rng(1234)
    for trial in range(3):
        n_l, n_r = int(rng.integers(1, 400)), int(rng.integers(1, 120))
        left = pd.DataFrame(
            {"k": rng.integers(0, 50, size=n_l), "v": rng.integers(0, 1000, size=n_l)}
        )
        right = pd.DataFrame(
            {"rk": rng.integers(0, 50, size=n_r), "w": rng.integers(0, 1000, size=n_r)}
        )
        lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
        rkeys = set(right["rk"])

        for keep in (True, False):
            exp = sorted(left.loc[left["k"].isin(rkeys) == keep, "v"])
            for lim in (1_000_000, 0):
                got = semi_join(
                    lds, rds.select_columns(["rk"]), on="k", right_on="rk",
                    keep=keep, broadcast_limit=lim,
                ).to_pandas()
                assert sorted(got["v"]) == exp, (trial, keep, lim)

        exp_inner = (
            left.merge(right, left_on="k", right_on="rk")
            .sort_values(["k", "v", "w"])[["k", "v", "w"]]
            .reset_index(drop=True)
        )
        for lim in (1_000_000, 0):
            got = adaptive_inner_join(lds, rds, on="k", right_on="rk", broadcast_limit=lim).to_pandas()
            got = got.sort_values(["k", "v", "w"])[["k", "v", "w"]].reset_index(drop=True)
            pd.testing.assert_frame_equal(got, exp_inner)
