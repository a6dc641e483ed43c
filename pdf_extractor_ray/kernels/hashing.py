"""Stable hashing + sketch kernels: content hash, shingles, MinHash,
SimHash. Process-independent (blake2b-seeded, never Python ``hash()``)
so signatures agree across Ray workers, runs, and the oracle.

Vectorized with numpy where it matters: MinHash permutations are a
single ``(n_shingles, 1) * (1, k)`` broadcast ``min`` per document;
SimHash unpacks hash bits with ``np.unpackbits``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_MERSENNE_P = (1 << 61) - 1
_WORD_RE = re.compile(r"\w+", re.UNICODE)


def stable_hash64(data: bytes | str) -> int:
    """Deterministic 64-bit hash (blake2b truncation)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def content_hash(data: bytes | str) -> str:
    """Hex content hash for manifests / exact dedup columns."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.blake2b(data, digest_size=16).hexdigest()


def tokenize_words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


# Per-worker word→hash cache: crawl vocabularies repeat heavily, and
# blake2b per shingle was the dedup hotspot (10s for 5k docs). Bounded
# so a pathological vocabulary can't grow worker heaps.
_WORD_HASH_CACHE: dict[str, int] = {}
_WORD_HASH_CACHE_MAX = 1_000_000
_SHINGLE_BASE = np.uint64(1099511628211)


def word_hashes(words: list[str]) -> np.ndarray:
    out = np.empty(len(words), dtype=np.uint64)
    cache = _WORD_HASH_CACHE
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = stable_hash64(w)
            if len(cache) < _WORD_HASH_CACHE_MAX:
                cache[w] = h
        out[i] = h
    return out


def ngram_buckets(words: list[str], num_buckets: int) -> np.ndarray:
    """Hashed unigram+bigram bucket ids (int64, one per token occurrence,
    NOT deduplicated) — the shared feature space of the DSIR importance
    model (pipelines/corpus.py) and the trained quality classifier
    (pipelines/quality_clf.py). One definition so the 'same feature
    space' contract between them can't silently diverge."""
    h = word_hashes(words)
    feats = [h % np.uint64(num_buckets)]
    if len(h) >= 2:
        bg = h[:-1] * _SHINGLE_BASE + h[1:]
        feats.append(bg % np.uint64(num_buckets))
    return np.concatenate(feats).astype(np.int64)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-word shingles of ``text`` (deduplicated).

    Vectorized: per-word blake2b (cached across calls) combined by a
    rolling polynomial in uint64 wraparound arithmetic. Short texts
    (< k words) hash as a single shingle so every non-empty document
    gets a signature.
    """
    words = tokenize_words(text)
    if not words:
        return np.empty(0, dtype=np.uint64)
    hs = word_hashes(words)
    if len(words) < k:
        acc = np.uint64(0)
        for h in hs:
            acc = acc * _SHINGLE_BASE + h
        return np.array([acc], dtype=np.uint64)
    n_out = len(words) - k + 1
    acc = np.zeros(n_out, dtype=np.uint64)
    for j in range(k):
        acc = acc * _SHINGLE_BASE + hs[j : j + n_out]
    return np.unique(acc)


def _minhash_coeffs(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient vectors for the universal hash
    family h_i(x) = (a_i * x + b_i) mod p."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


_COEFF_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 7) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle-hash set."""
    key = (num_perm, seed)
    if key not in _COEFF_CACHE:
        _COEFF_CACHE[key] = _minhash_coeffs(num_perm, seed)
    a, b = _COEFF_CACHE[key]
    if shingles.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # hash family mod 2^64 via uint64 wraparound (exact, vectorized)
    vals = shingles[:, None] * a[None, :] + b[None, :]
    return vals.min(axis=0)


def minhash_bands(sig: np.ndarray, num_bands: int = 16) -> list[int]:
    """Split a signature into bands; hash each band → LSH bucket keys."""
    rows = sig.size // num_bands
    out = []
    for i in range(num_bands):
        band = sig[i * rows : (i + 1) * rows]
        out.append(stable_hash64(band.tobytes()) & 0x7FFFFFFFFFFFFFFF)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigram counts."""
    words = tokenize_words(text)
    if not words:
        return 0
    uniq, counts = np.unique(np.array(words, dtype=object), return_counts=True)
    hashes = word_hashes(list(uniq))
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    # weight +count for 1 bits, -count for 0 bits
    contrib = (bits.astype(np.int64) * 2 - 1) * counts[:, None]
    total = contrib.sum(axis=0)
    out_bits = (total > 0).astype(np.uint8)
    return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Polynomial rolling-hash document fingerprint: min-hash over all
    ``window``-token rolling hashes (a cheap winnowing-style signature)."""
    words = tokenize_words(text)
    if not words:
        return 0
    hs = word_hashes(words)
    if hs.size <= window:
        return int(hs.min())
    base = np.uint64(1099511628211)
    acc = np.zeros(hs.size - window + 1, dtype=np.uint64)
    for j in range(window):
        acc = acc * base + hs[j : j + acc.size]
    return int(acc.min())


def positional_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Like ``shingle_hashes`` but IN POSITION ORDER and without the
    dedup — the winnowing input (window selection needs the sequence,
    not the set)."""
    words = tokenize_words(text)
    if not words:
        return np.empty(0, dtype=np.uint64)
    hs = word_hashes(words)
    if len(words) < k:
        acc = np.uint64(0)
        for h in hs:
            acc = acc * _SHINGLE_BASE + h
        return np.array([acc], dtype=np.uint64)
    n_out = len(words) - k + 1
    acc = np.zeros(n_out, dtype=np.uint64)
    for j in range(k):
        acc = acc * _SHINGLE_BASE + hs[j : j + n_out]
    return acc


def winnow_select(h: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
    2003): over every window of ``w`` consecutive k-gram hashes keep
    the minimum, ties broken RIGHTMOST (a pure function of the window
    contents, so two documents sharing a token run of ≥ w+k-1 words
    share at least one selected fingerprint — the winnowing
    guarantee). Returns the deduplicated selected hash set."""
    n = len(h)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= w:
        i = n - 1 - int(np.argmin(h[::-1]))
        return h[i : i + 1].copy()
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    idx = (w - 1) - np.argmin(win[:, ::-1], axis=1)
    pos = np.unique(np.arange(len(win)) + idx)
    return np.unique(h[pos])
