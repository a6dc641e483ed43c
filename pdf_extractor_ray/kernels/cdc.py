"""Content-defined chunking (gear-hash CDC, FastCDC-family).

The storage-dedup primitive (LBFS, Muthitacharoen et al. SOSP'01;
FastCDC, Xia et al. ATC'16 — both public): chunk boundaries are chosen
where a rolling hash of the last 64 bytes hits a mask, so an insertion
or deletion only perturbs boundaries locally and identical regions in
DIFFERENT documents re-align to identical chunks — the property
fixed-size blocking lacks and the reason CDC chunk hashes find
cross-document duplicated bytes that whole-doc hashing misses.

Gear hash: ``h_i = (h_{i-1} << 1) + GEAR[b_i]  (mod 2^64)``, i.e.
``h_i = Σ_{j=0..63} GEAR[b_{i-j}] << j`` — a weighted sum of the last
64 bytes only (older terms shift out). That windowed form makes the
whole scan VECTORIZABLE: 64 shifted numpy adds over the byte array
instead of a Python loop per byte, which is what makes this kernel
viable inside ``map_batches`` at corpus scale.

Boundary semantics: position ``i`` ends a chunk when
``h_i & mask == 0`` (average chunk = 2^avg_bits bytes), subject to
``min_len``/``max_len``. The hash is NOT reset per chunk; with
``min_len >= 64`` this is *exactly* equivalent to the classic
reset-per-chunk formulation (any position closer than 64 bytes to the
previous cut is below min_len and skipped, and beyond 64 bytes the
windowed hash equals the reset hash) while keeping the global resync
property. The equivalence is pinned by a reset-semantics replica in
tests.

Reference analog: none — pdf-extractor has no sub-document dedup; this
is part of the training-data-scale dedup family (SURVEY.md §2 note on
near-dup extensions).
"""

from __future__ import annotations

import hashlib

import numpy as np

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return x ^ (x >> np.uint64(31))


# 256-entry gear table, a pure function of the byte value — stable
# across processes/machines, no RNG state involved.
GEAR = _splitmix64(np.arange(1, 257, dtype=np.uint64))


def cdc_boundaries(
    data: bytes, *, avg_bits: int = 11, min_len: int = 256, max_len: int = 8192
) -> list[int]:
    """Chunk END offsets (exclusive, ascending, last == len(data)).

    ``avg_bits`` sets the expected chunk size (2^avg_bits bytes);
    ``min_len`` must be >= 64 for the reset-equivalence documented in
    the module docstring; ``max_len`` force-cuts pathological runs
    (e.g. a constant byte region that never hits the mask).
    """
    if min_len < 64:
        raise ValueError("min_len must be >= 64 (windowed-hash equivalence)")
    if max_len < min_len:
        raise ValueError("max_len must be >= min_len")
    n = len(data)
    if n == 0:
        return []
    g = GEAR[np.frombuffer(data, dtype=np.uint8)]
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(min(64, n)):
            if j == 0:
                h += g
            else:
                h[j:] += g[: n - j] << np.uint64(j)
    mask = np.uint64((1 << avg_bits) - 1)
    cand = (np.nonzero((h & mask) == 0)[0] + 1).tolist()
    ends: list[int] = []
    start = 0
    ci = 0
    n_cand = len(cand)
    while start < n:
        lo = start + min_len
        hi = min(start + max_len, n)
        while ci < n_cand and cand[ci] < lo:
            ci += 1
        if ci < n_cand and cand[ci] < hi:
            end = cand[ci]
        else:
            end = hi  # max-length force cut (or end of data)
        ends.append(end)
        start = end
    return ends


def cdc_chunks(
    data: bytes, *, avg_bits: int = 11, min_len: int = 256, max_len: int = 8192
) -> list[tuple[int, int, str]]:
    """``[(start, length, chunk_hash), ...]`` — chunk_hash is an
    8-byte blake2b hex digest of the chunk bytes (16 hex chars), the
    key cross-document chunk dedup exchanges on."""
    out: list[tuple[int, int, str]] = []
    start = 0
    for end in cdc_boundaries(data, avg_bits=avg_bits, min_len=min_len, max_len=max_len):
        out.append((start, end - start, hashlib.blake2b(data[start:end], digest_size=8).hexdigest()))
        start = end
    return out
