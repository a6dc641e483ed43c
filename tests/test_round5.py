"""Round-5 additions: PSL-backed registrable-domain extraction
(VERDICT r4 #6), the r4 ADVICE fixes in functions/urls.py, and the
round-5 operator work (SemDeDup sub-split, heavy-hitter strictness).
"""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# functions/urls.py — registrable_domain + ADVICE fixes
# ---------------------------------------------------------------------------


def test_registrable_domain_psl_longest_match():
    """eTLD+1 via the vendored PSL snapshot: multi-label ICANN
    suffixes, private-section hosting suffixes, implicit single-label
    TLDs, and the degenerate cases (host IS a suffix, IP literal,
    single label)."""
    from pdf_extractor_ray.functions.urls import registrable_domain

    # multi-label ICANN suffix: suffix is co.uk, owner is example.co.uk
    assert registrable_domain("https://foo.example.co.uk/x") == "example.co.uk"
    assert registrable_domain("example.co.uk") == "example.co.uk"
    assert registrable_domain("a.b.c.example.co.uk") == "example.co.uk"
    # implicit single-label TLD: subdomains pool to example.com
    assert registrable_domain("https://a.example.com") == "example.com"
    assert registrable_domain("https://b.example.com") == "example.com"
    assert registrable_domain("https://www.example.com:8443/p") == "example.com"
    # PSL private section: every github.io user site is its own owner
    assert registrable_domain("https://a.b.github.io/repo") == "b.github.io"
    assert registrable_domain("alice.github.io") == "alice.github.io"
    assert registrable_domain("x.alice.github.io") != "x.bob.github.io"
    # host that IS a public suffix: returned unchanged, not truncated
    assert registrable_domain("github.io") == "github.io"
    assert registrable_domain("co.uk") == "co.uk"
    # IP literal and single label pass through
    assert registrable_domain("http://192.168.0.1:8080/x") == "192.168.0.1"
    assert registrable_domain("localhost") == "localhost"
    # deeper ICANN two-label suffix from another family
    assert registrable_domain("https://deep.a.shop.com.au") == "shop.com.au"


def test_site_domain_schemeless_inputs_extract_host_only():
    """ADVICE r4 #1: scheme-less inputs ('example.com/x') must key by
    HOST — previously the path leaked into the domain key, so quotas
    degenerated to per-URL."""
    from pdf_extractor_ray.functions.urls import registrable_domain, site_domain

    assert site_domain("example.com/x/y?q=1") == "example.com"
    assert site_domain("www.example.com/x") == "example.com"
    assert site_domain("//cdn.example.com/asset.js") == "cdn.example.com"
    assert site_domain("EXAMPLE.com:8080/path") == "example.com"
    assert registrable_domain("a.example.co.uk/x") == "example.co.uk"


def test_canonical_url_keeps_content_selecting_ref_param():
    """ADVICE r4 #2: 'ref' is often content-selecting (?ref=branch on a
    code host picks a different page) — it must survive default
    canonicalization; callers can still drop it explicitly."""
    from pdf_extractor_ray.functions.urls import canonical_url

    u = "https://example.com/repo/tree?ref=main"
    assert canonical_url(u) == u
    assert (
        canonical_url(u, tracking_params=frozenset({"ref"}))
        == "https://example.com/repo/tree"
    )
    # the unambiguous analytics set still drops
    assert (
        canonical_url("https://example.com/a?gclid=z&utm_source=x&id=3")
        == "https://example.com/a?id=3"
    )


def test_urls_malformed_inputs_do_not_raise():
    from pdf_extractor_ray.functions.urls import (
        canonical_url,
        registrable_domain,
        site_domain,
    )

    for bad in ["", "   ", "http://[not-ipv6/x", "mailto:a@b.c", "data:text/plain,hi"]:
        canonical_url(bad)
        site_domain(bad)
        registrable_domain(bad)


# ---------------------------------------------------------------------------
# pipelines/urlops.py — registrable-domain stats oracle parity
# ---------------------------------------------------------------------------


def test_registrable_domain_stats_matches_oracle_sf0001():
    """The PSL carrier: engine computes owner keys from URL strings via
    the snapshot; the oracle from doc_id arithmetic. A wrong longest
    match (co.uk kept as owner, github.io user sites pooled) breaks
    the hash."""
    from tools.check_oracle import value_hash

    from pdf_extractor_ray.pipelines import urlops

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = con.execute(urlops.REGISTRABLE_DOMAIN_STATS_SQL).df()
    mine = urlops.registrable_domain_stats_documents(SF_DIR).to_pandas()
    assert len(mine) == len(oracle)
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert value_hash(mine) == value_hash(oracle)
    # the collapse is observable: example.com pools multiple s{k} hosts
    ex = mine[mine["registrable_domain"] == "example.com"]
    assert len(ex) == 1 and int(ex["n_hosts"].iloc[0]) > 1
    # github.io user sites do NOT pool: every owner has exactly 1 host
    gh = mine[mine["registrable_domain"].str.endswith("github.io")]
    assert len(gh) > 1 and (gh["n_hosts"] == 1).all()
