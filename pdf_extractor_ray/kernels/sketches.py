"""Distributed cardinality sketch: HyperLogLog.

The mergeable-sketch pattern a 100 TB pipeline uses for COUNT DISTINCT
without a distinct shuffle: every batch folds its values into a fixed
2^p-byte register array (vectorized numpy), register arrays merge by
elementwise max (associative + commutative → any reduction tree), and
the estimate is read once at the end. Standard HLL bias correction
with linear-counting small-range correction (Flajolet et al. 2007 /
the HLL++ small-range rule — public algorithms).
"""

from __future__ import annotations

import numpy as np

# powers of two for vectorized bit_length via searchsorted
_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Fold uint64 hashes into a fresh 2^p register array (uint8).

    Register index = top p bits; rank = position of the first 1-bit in
    the remaining 64-p bits (1-based; all-zero → 64-p+1).
    """
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if hashes.size == 0:
        return reg
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & _MASK64
    # bit_length(w) via searchsorted over powers of two (exact for uint64,
    # no float-log precision traps near 2^k)
    bl = np.searchsorted(_POW2, w, side="right").astype(np.int64)  # 0 for w=0
    # first-1-bit position from the top, capped at 64-p+1 for w == 0
    rank = np.minimum(64 - bl + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two register arrays (elementwise max)."""
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected cardinality estimate with small-range correction."""
    m = reg.size
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(2.0 ** -reg.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int((reg == 0).sum())
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return float(est)
