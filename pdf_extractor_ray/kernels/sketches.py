"""Distributed mergeable sketches: HyperLogLog, Misra-Gries, KLL.

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


# ------------------------------------------------------- Misra-Gries
# Mergeable heavy-hitters sketch (Misra & Gries 1982; mergeability per
# Agarwal et al., "Mergeable Summaries", PODS 2012 — public
# algorithms). A k-counter summary guarantees every item with true
# frequency > N/(k+1) keeps a counter, and each kept counter
# undercounts by at most N/(k+1). The 100 TB use: per-batch fixed-size
# summaries merge associatively (no token shuffle); an exact recount
# pass over the candidate set then repairs the undercount.


def mg_fold(tokens, k: int = 64) -> dict[str, int]:
    """Fold an iterable of tokens into a Misra-Gries summary of at
    most ``k`` counters."""
    c: dict[str, int] = {}
    for t in tokens:
        if t in c:
            c[t] += 1
        elif len(c) < k:
            c[t] = 1
        else:
            # decrement-all step, vectorized over the dict
            dead = []
            for key in c:
                c[key] -= 1
                if c[key] == 0:
                    dead.append(key)
            for key in dead:
                del c[key]
    return c


def mg_merge(a: dict[str, int], b: dict[str, int], k: int = 64) -> dict[str, int]:
    """Merge two summaries: sum counters, then restore the k-counter
    bound by subtracting the (k+1)-largest combined count from every
    counter and dropping non-positives (the PODS'12 mergeable rule —
    error bounds add, never multiply)."""
    out = dict(a)
    for t, n in b.items():
        out[t] = out.get(t, 0) + n
    if len(out) <= k:
        return out
    kth = sorted(out.values(), reverse=True)[k]
    return {t: n - kth for t, n in out.items() if n > kth}


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin, Lang, Liberty 2016, "Optimal Quantile
# Approximation in Streams" — public algorithm): the mergeable
# order-statistic sketch. One pass, O(k) memory, rank error O(n/k);
# per-batch sketches merge associatively, so quantiles of 100 TB cost
# one map_batches plus a bounded driver merge — the approximate
# complement to ops.exact_kth_smallest (exact, but multi-pass).
# ---------------------------------------------------------------------------

import math
import random


class KLL:
    """Levels of compactors: level ``h`` items carry weight ``2**h``.
    Level capacities decay geometrically (ratio 2/3) below the top, so
    total memory is O(k). Compaction sorts an over-full level and
    promotes every other element (random parity offset) to the next —
    total weight is conserved EXACTLY (an invariant the tests pin), so
    rank queries are unbiased with error O(n/k).

    Deterministic for a fixed seed and update order; across a Ray
    reduction the block order varies, so results are
    bound-guaranteed, not bit-pinned (the HLL precedent)."""

    def __init__(self, k: int = 200, seed: int = 0) -> None:
        if k < 8:
            raise ValueError("KLL: k must be >= 8")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._rng = random.Random(seed)

    def _cap(self, h: int) -> int:
        depth = len(self.levels) - h - 1
        return max(2, int(math.ceil(self.k * (2.0 / 3.0) ** depth)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _compress(self) -> None:
        changed = True
        while changed:
            changed = False
            for h in range(len(self.levels)):
                if len(self.levels[h]) <= self._cap(h):
                    continue
                buf = sorted(self.levels[h])
                keep: list[float] = []
                if len(buf) % 2:
                    keep.append(buf.pop())  # odd item stays: weight exact
                off = self._rng.randint(0, 1)
                promoted = buf[off::2]
                if h + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[h + 1].extend(promoted)
                self.levels[h] = keep
                changed = True
                break  # capacities depend on len(levels); re-derive

    def update_many(self, values) -> None:
        vs = [float(v) for v in values]
        if any(v != v for v in vs):  # NaN breaks sorted() ordering
            raise ValueError("KLL: NaN values are not sketchable")
        self.levels[0].extend(vs)
        self.n += len(vs)
        self._compress()

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for h, lv in enumerate(other.levels):
            self.levels[h].extend(lv)
        self.n += other.n
        self._compress()
        return self

    def total_weight(self) -> int:
        return sum(len(lv) * (1 << h) for h, lv in enumerate(self.levels))

    def _cdf(self) -> "list[tuple[float, int]]":
        items: list[tuple[float, int]] = []
        for h, lv in enumerate(self.levels):
            w = 1 << h
            items.extend((v, w) for v in lv)
        items.sort()
        return items

    def quantile(self, q: float) -> float:
        """Approximate nearest-rank quantile: the smallest sketched
        value whose cumulative weight reaches ceil(q * n)."""
        return self.quantiles([q])[0]

    def quantiles(self, qs: "list[float]") -> "list[float]":
        """Batch form: ONE weighted-CDF build serves every requested
        quantile (the multi-quantile report path)."""
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"KLL: quantile {q} outside [0, 1]")
        if self.n == 0:
            raise ValueError("KLL: empty sketch")
        items = self._cdf()
        out: "list[float]" = []
        for q in qs:
            target = max(1, math.ceil(q * self.n))
            cum = 0
            for v, w in items:
                cum += w
                if cum >= target:
                    out.append(v)
                    break
            else:  # unreachable: total weight == n >= target (pinned)
                raise AssertionError("KLL: weight conservation violated")
        return out

    def to_lists(self) -> "list[list[float]]":
        """Arrow-friendly transport form (list per level)."""
        return [list(lv) for lv in self.levels]

    @classmethod
    def from_lists(cls, levels: "list[list[float]]", n: int, k: int = 200, seed: int = 0) -> "KLL":
        s = cls(k=k, seed=seed)
        s.levels = [list(lv) for lv in levels] or [[]]
        s.n = int(n)
        return s


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def _cms_splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound) — the
    derived-hash trick from joins._splitmix64: d independent rows come
    from iterating the finalizer, never from re-keying (pd.util.
    hash_array IGNORES hash_key for numeric dtypes — round-2 finding)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def cms_fold(hashes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """Fold 64-bit item hashes into a (depth, width) int64 Count-Min
    table: row j buckets by the j-th splitmix64 iterate. Mergeable by
    elementwise +; point estimate = min over rows (one-sided:
    estimate ≥ true count always)."""
    table = np.zeros((depth, width), dtype=np.int64)
    h = hashes.astype(np.uint64, copy=False)
    for j in range(depth):
        h = _cms_splitmix64(h)
        np.add.at(table[j], (h % np.uint64(width)).astype(np.int64), 1)
    return table


def cms_query(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates for item hashes against a folded table."""
    depth, width = table.shape
    est = np.full(len(hashes), np.iinfo(np.int64).max, dtype=np.int64)
    h = np.asarray(hashes, dtype=np.uint64)
    for j in range(depth):
        h = _cms_splitmix64(h)
        est = np.minimum(est, table[j, (h % np.uint64(width)).astype(np.int64)])
    return est
