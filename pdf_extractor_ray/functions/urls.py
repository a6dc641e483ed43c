"""URL canonicalization and site-domain extraction.

The reference has no URL layer (its inputs are SharePoint drive paths
— `sync_to_onedrive.py`'s M21 URL parsers are a justified drop); this
module is part of the web-scale extension surface: crawl curation
keys every doc by a canonical URL (dedup, domain mixing, blocklists).

Pure stdlib functions, vectorizable inside ``map_batches``; the
pipeline layer is ``pipelines.urlops``.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit

# Query parameters that never change page content (analytics /
# click-tracking decorations) — dropped by canonicalization.
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAMS = {"gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref"}

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonical_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, default port stripped,
    fragment dropped, tracking params removed, remaining query params
    sorted by (key, value), trailing path slash stripped.

    Deterministic and idempotent: canonical_url(canonical_url(u)) ==
    canonical_url(u) — required for it to serve as a dedup key."""
    raw = url.strip()
    parts = urlsplit(raw)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        # scheme-less host-less input ('example.com/x', mailto:, data:)
        # — pass through unchanged rather than emit a malformed
        # '://...' that would NOT re-parse (idempotency violation)
        return raw
    try:
        port = parts.port
    except ValueError:  # malformed port text → keep host only
        port = None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path.rstrip("/")
    pairs = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k not in TRACKING_PARAMS and not k.startswith(TRACKING_PARAM_PREFIXES)
    ]
    pairs.sort()
    query = urlencode(pairs)
    # protocol-relative input keeps its '//' prefix (re-parses to the
    # same netloc, so canonicalization stays idempotent)
    prefix = f"{scheme}://" if scheme else "//"
    return f"{prefix}{netloc}{path}" + (f"?{query}" if query else "")


def site_domain(url: str) -> str:
    """Site key for per-domain aggregation: lowercased host, port and
    a leading ``www.`` stripped. (A full registrable-domain split
    needs the public-suffix list, unavailable offline — ``www.`` strip
    plus lowercase covers the crawl-stat use; swap in a PSL lookup
    when packaging for production.)"""
    host = url
    if "://" in host:
        host = urlsplit(host.strip()).hostname or ""
    host = host.lower().rstrip(".").split(":")[0]
    return host[4:] if host.startswith("www.") else host
