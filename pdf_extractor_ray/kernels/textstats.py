"""Text-analysis kernels: token counting, quality scoring, language ID,
document fingerprinting. All deterministic; the hot paths are written to
be applied per batch (pandas Series.map / numpy), not per Dataset row.
"""

from __future__ import annotations

import re

try:  # BPE-ish tokenization wants \p{L}/\p{N}; fall back to stdlib re
    import regex as _regex

    _BPE_RE = _regex.compile(
        r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
    )
except ImportError:  # pragma: no cover
    _BPE_RE = re.compile(r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

_WS_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# Tiny stopword inventories for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with", "on", "as", "are", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den", "mit", "von", "auf", "für", "im"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "dans", "que", "pour", "qui", "sur", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en", "que", "por", "con", "para", "no"},
}


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    if not text:
        return 0
    return len(_WS_TOKEN_RE.findall(text))


def token_count_bpeish(text: str) -> int:
    """GPT-2-style pre-tokenizer regex token count (BPE upper bound)."""
    if not text:
        return 0
    return len(_BPE_RE.findall(text))


def quality_stats(text: str) -> dict:
    """Length / punctuation / stopword quality features for filtering."""
    if text is None:
        text = ""
    words = _WORD_RE.findall(text.lower())
    n_words = len(words)
    n_chars = len(text)
    n_punct = len(_PUNCT_RE.findall(text))
    stop_en = STOPWORDS["en"]
    n_stop = sum(1 for w in words if w in stop_en)
    mean_wl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_lines": text.count("\n") + (1 if text else 0),
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "mean_word_len": mean_wl,
    }


def quality_score_raw(text: str) -> float:
    """Unrounded scalar quality in [0,1]: rewards stopword presence,
    sane word length, low punctuation noise, non-trivial length. The
    term order is part of the contract — the SQL oracle replays the
    identical IEEE-double expression."""
    s = quality_stats(text)
    if s["n_words"] == 0:
        return 0.0
    length_term = min(1.0, s["n_words"] / 50.0)
    stop_term = min(1.0, s["stopword_ratio"] / 0.2)
    punct_term = max(0.0, 1.0 - s["punct_ratio"] * 4.0)
    wl = s["mean_word_len"]
    wl_term = 1.0 if 3.0 <= wl <= 10.0 else 0.5
    return 0.35 * length_term + 0.3 * stop_term + 0.2 * punct_term + 0.15 * wl_term


def quality_score(text: str) -> float:
    """``quality_score_raw`` rounded to 6 dp (filtering convenience)."""
    return round(quality_score_raw(text), 6)


def lang_id(text: str) -> str:
    """Stopword-vote language heuristic → 'en'/'de'/'fr'/'es'/'und'."""
    if not text:
        return "und"
    words = _WORD_RE.findall(text.lower())[:400]
    if not words:
        return "und"
    best_lang = "und"
    best = 0
    for lang in ("en", "de", "fr", "es"):  # fixed order → deterministic ties
        score = sum(1 for w in words if w in STOPWORDS[lang])
        if score > best:
            best = score
            best_lang = lang
    if best == 0 or best / len(words) < 0.02:
        return "und"
    return best_lang


# ---------------------------------------------------------------------------
# Sentence segmentation (rule-based)
# ---------------------------------------------------------------------------

# terminator run followed by whitespace or end-of-text; common
# abbreviation + initial guards keep "e.g. foo" / "J. Smith" unsplit
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])[.!?]*\s+")
_ABBREV = frozenset(
    {"mr", "mrs", "ms", "dr", "prof", "st", "vs", "etc", "e.g", "i.e", "no", "fig", "jr", "sr"}
)


def split_sentences(text: str) -> list[str]:
    """Rule-based sentence segmentation: split after a ``.!?`` run that
    is followed by whitespace, EXCEPT when the terminator ends a known
    abbreviation or a single-letter initial ("Dr. Who", "J. Smith") —
    the standard pre-neural splitter (cf. NLTK's punkt heuristics,
    public domain rule set). Returned sentences are
    whitespace-collapsed with trailing terminators stripped; empty
    sentences are dropped. Deterministic pure function — safe in any
    ``map_batches`` stage."""
    out: list[str] = []
    start = 0
    for m in _SENT_SPLIT_RE.finditer(text):
        candidate = text[start : m.start()]  # ends at the first terminator
        # the token immediately before the terminator run
        head = candidate.rstrip(".!?")
        tok = head.rsplit(None, 1)[-1] if head.split() else ""
        is_initial = len(tok) == 1 and tok.isalpha() and tok.isupper()
        if candidate.endswith(".") and (tok.lower() in _ABBREV or is_initial):
            continue  # abbreviation / capitalized initial: not a boundary
        sent = " ".join(text[start : m.end()].split()).rstrip(".!?").strip()
        if sent:
            out.append(sent)
        start = m.end()
    tail = " ".join(text[start:].split()).rstrip(".!?").strip()
    if tail:
        out.append(tail)
    return out
