"""Exact cross-engine arithmetic.

The driver's correctness gate hashes result *values* produced by the
Ray pipeline and by DuckDB. Floating-point SUMs are order-dependent in
the last bits, so any float aggregate would flap. Money-like doubles are
therefore converted to integer cents with

    cents(x) = floor(x * 100 + 0.5)  as int64

before summation. ``x * 100`` and ``+ 0.5`` are single IEEE-754
operations — bit-identical in numpy and DuckDB for identical input
doubles — and integer sums are exact and order-independent. (``floor(x
+ 0.5)`` also sidesteps the banker's-rounding vs half-away-from-zero
mismatch between numpy ``round`` and SQL ``round``.)

ASCII-WHITESPACE CORPUS PRECONDITION (ADVICE r4): the trim/split SQL
fragments below replicate Python ``str.strip()`` / ``str.split()`` for
the ASCII whitespace set only. Python additionally splits on the
Unicode whitespace set (\\x1c-\\x1f, \\x85, NBSP, ideographic spaces,
…), which neither DuckDB ``trim`` nor RE2 ``\\s`` covers — so ANY
non-ASCII whitespace in a document makes every tokenizing oracle
diverge from the engine. This holds for the synthetic test corpus
(ASCII text by construction) and is the documented precondition for a
production corpus: normalize exotic whitespace upstream (e.g. in the
extraction/normalize stage) before running tokenizing oracles, or
accept that the SQL oracle is not an exact replica there. This single
module is the source of truth for that contract — every oracle that
tokenizes imports these fragments rather than re-deriving them.
"""

from __future__ import annotations

import numpy as np

# SQL fragment template — keep in lockstep with cents_np.
CENTS_SQL = "CAST(floor({expr} * 100 + 0.5) AS BIGINT)"


def cents_np(x) -> np.ndarray:
    """Vectorized cents conversion matching CENTS_SQL bit-for-bit."""
    arr = np.asarray(x, dtype=np.float64)
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)


def trim_ws_sql(col: str = "text") -> str:
    """SQL replica of Python ``str.strip()`` / ``str.split()`` edge
    handling: DuckDB's bare ``trim()`` strips SPACES only, so a
    tab-/newline-bounded document would split into phantom empty tokens
    (or classify non-empty) in SQL while the engine calls it empty.
    Trim the full ASCII whitespace set instead. Every oracle that
    tokenizes with ``regexp_split_to_array(trim(...), '\\s+')`` or
    tests emptiness must use this expression, never bare ``trim``."""
    return f"trim({col}, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))"


# RE2's ``\s`` is ``[\t\n\f\r ]`` — it EXCLUDES \v (0x0B), which
# Python's ``str.split()`` / ``re \s`` treat as whitespace, so a
# '\x0b'-separated document tokenizes differently under a bare ``\s``
# oracle. Tokenizing oracles must use these explicit classes.
WS_CHAR_RE_SQL = r"[ \t\n\x0B\f\r]"
WS_SPLIT_RE_SQL = WS_CHAR_RE_SQL + "+"
