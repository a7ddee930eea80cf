"""Text analysis functions for training-data pipelines.

Tokenization, language-ID (n-gram/stopword heuristic), quality scoring,
token counting, and document fingerprinting — each designed as a vectorized
per-batch kernel to be used inside ``map_batches`` (never per-row ``ds.map``).

These extend the reference (which has no scalar functions beyond
``to_lowercase`` at /root/reference/src/scanner.rs:75) per the build brief's
text-analysis requirements.
"""

from __future__ import annotations

import re

import numpy as np

from camden_ray.functions.hashing import POLY_P, TokenHasher, mix64

# one compiled tokenizer for the whole engine: word chars, unicode-aware.
TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# BPE-ish sub-word split for token *counting*: words, numbers, punctuation runs.
BPE_ISH_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

# tiny seeded stopword lists for the heuristic language identifier
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is that it for on with as was at by".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf ein nicht".split()),
    "fr": frozenset("le la les de et un une est pour dans que sur avec pas".split()),
    "es": frozenset("el la los las de y un una es para en que con por no".split()),
}

_EN_STOP = _LANG_STOPWORDS["en"]


def tokenize(text: str) -> list[str]:
    """Lowercased word tokens; the shared tokenizer for shingles and analysis."""
    return TOKEN_RE.findall(text.lower())


def token_count(text: str) -> int:
    """BPE-ish token count (words + punctuation marks)."""
    return len(BPE_ISH_RE.findall(text))


def whitespace_token_count(text: str) -> int:
    return len(text.split())


def detect_lang(text: str) -> str:
    """Heuristic language ID: CJK codepoint ratio, else stopword voting.

    Deterministic and dependency-free. Returns one of en/de/fr/es/zh/unknown.
    """
    if not text:
        return "unknown"
    sample = text[:2000]
    cjk = sum(1 for ch in sample if "一" <= ch <= "鿿")
    if cjk > 0.05 * len(sample):
        return "zh"
    toks = tokenize(sample)
    if not toks:
        return "unknown"
    best_lang, best_hits = "unknown", 0
    for lang, stops in _LANG_STOPWORDS.items():
        hits = sum(1 for t in toks if t in stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0:
        return "unknown"
    return best_lang


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation / stopword / repetition features for quality scoring."""
    n_chars = len(text)
    toks = tokenize(text)
    n_tok = len(toks)
    if n_chars == 0 or n_tok == 0:
        return {
            "n_chars": float(n_chars),
            "n_tokens": 0.0,
            "mean_word_len": 0.0,
            "stopword_ratio": 0.0,
            "punct_ratio": 0.0,
            "digit_ratio": 0.0,
            "uniq_token_ratio": 0.0,
            "quality_score": 0.0,
        }
    punct = sum(1 for ch in text if not ch.isalnum() and not ch.isspace())
    digits = sum(1 for ch in text if ch.isdigit())
    stop = sum(1 for t in toks if t in _EN_STOP)
    uniq = len(set(toks))
    feats = {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tok),
        "mean_word_len": sum(len(t) for t in toks) / n_tok,
        "stopword_ratio": stop / n_tok,
        "punct_ratio": punct / n_chars,
        "digit_ratio": digits / n_chars,
        "uniq_token_ratio": uniq / n_tok,
    }
    # simple monotone score in [0,1]: long enough, diverse, not punct/digit
    # soup. math.sqrt (not **0.5): IEEE-exact, so a SQL oracle's sqrt()
    # reproduces the identical double.
    import math

    score = 1.0
    score *= min(1.0, n_tok / 50.0)
    score *= math.sqrt(feats["uniq_token_ratio"])
    score *= 1.0 - min(0.5, feats["punct_ratio"]) / 0.5 * 0.5
    score *= 1.0 - min(0.5, feats["digit_ratio"]) / 0.5 * 0.5
    feats["quality_score"] = float(score)
    return feats


def fingerprint(text: str, hasher: TokenHasher | None = None) -> int:
    """64-bit document fingerprint: order-sensitive polynomial rolling hash
    over token hashes (a cheap content identity robust to whitespace noise)."""
    hasher = hasher or _default_hasher()
    th = hasher.hash_tokens(tokenize(text))
    if len(th) == 0:
        return 0
    with np.errstate(over="ignore"):
        acc = np.uint64(0)
        for v in th:
            acc = acc * POLY_P + v
    return int(mix64(np.array([acc], dtype=np.uint64))[0])


_HASHER: TokenHasher | None = None


def _default_hasher() -> TokenHasher:
    global _HASHER
    if _HASHER is None:
        _HASHER = TokenHasher(seed=42)
    return _HASHER
