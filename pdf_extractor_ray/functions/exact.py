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
"""

from __future__ import annotations

import numpy as np

# SQL fragment template — keep in lockstep with cents_np.
CENTS_SQL = "CAST(floor({expr} * 100 + 0.5) AS BIGINT)"


def cents_np(x) -> np.ndarray:
    """Vectorized cents conversion matching CENTS_SQL bit-for-bit."""
    arr = np.asarray(x, dtype=np.float64)
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)
