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


def gopher_features(text: str) -> dict[str, float]:
    """Per-row reference for the Gopher-style quality-rule features (Rae et
    al. 2021, "Scaling Language Models", §A1.1 — public rule set, thresholds
    applied downstream in the query layer): token count, mean word length,
    fraction of tokens containing an alphabetic character, symbol counts
    ('#' and non-overlapping '...'), and English-stopword hits.

    ``batch_gopher_features`` is the vectorized twin (exact on ASCII rows);
    this function is the semantic truth and the non-ASCII fallback."""
    toks = tokenize(text)
    ntok = len(toks)
    n_hash = float(text.count("#"))
    n_ellipsis = float(text.count("..."))
    if ntok == 0:
        return {
            "n_tokens": 0.0,
            "mean_word_len": 0.0,
            "alpha_word_frac": 0.0,
            "symbol_ratio": 0.0,
            "n_stopwords": 0.0,
            "n_hash": n_hash,
            "n_ellipsis": n_ellipsis,
        }
    swl = sum(len(t) for t in toks)
    alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
    stop = sum(1 for t in toks if t in _EN_STOP)
    return {
        "n_tokens": float(ntok),
        "mean_word_len": swl / ntok,
        "alpha_word_frac": alpha / ntok,
        "symbol_ratio": (n_hash + n_ellipsis) / ntok,
        "n_stopwords": float(stop),
        "n_hash": n_hash,
        "n_ellipsis": n_ellipsis,
    }


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


# ---------------------------------------------------------------------------
# Batch (vectorized) twins of quality_features / detect_lang.
#
# The per-row reference implementations above are the SEMANTIC truth (and the
# DuckDB-oracle contract); the batch kernels below replicate them exactly on
# the vectorized ASCII fast path — char-class tables are BUILT FROM Python's
# own str.isalnum/isspace/isdigit, token identity is exact byte packing, and
# float ops run in the identical order — and fall back to the per-row
# reference for any row containing a non-ASCII byte or a token longer than
# 16 bytes (where packed identity stops being injective). Differential
# fuzz-tested in tests/test_corpus_stats.py.
# ---------------------------------------------------------------------------

_T_ALNUM = np.zeros(256, dtype=bool)
_T_SPACE = np.zeros(256, dtype=bool)
_T_DIGIT = np.zeros(256, dtype=bool)
_T_WORD = np.zeros(256, dtype=bool)  # Python re \w for ASCII: alnum + '_'
_T_ALPHA = np.zeros(256, dtype=bool)
for _i in range(128):
    _c = chr(_i)
    _T_ALNUM[_i] = _c.isalnum()
    _T_SPACE[_i] = _c.isspace()
    _T_DIGIT[_i] = _c.isdigit()
    _T_WORD[_i] = _c.isalnum() or _c == "_"
    _T_ALPHA[_i] = _c.isalpha()
del _i, _c

_PACK_POWS = (np.uint64(1) << (np.uint64(8) * np.arange(8, dtype=np.uint64)))


def _pack8(words: list[str]) -> np.ndarray:
    """Exact uint64 identity of ASCII tokens ≤ 8 bytes (zero-padded —
    unambiguous because NUL is never a word char)."""
    out = np.zeros(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        b = w.encode()
        assert len(b) <= 8
        out[i] = int.from_bytes(b.ljust(8, b"\0"), "little")
    return out


_STOP_EN_PACKED = _pack8(sorted(_EN_STOP))
# per-language packed stopwords for the detect_lang voter; non-ASCII
# stopwords (e.g. 'für') can never match an ASCII token and are skipped on
# the fast path (non-ASCII rows take the reference fallback anyway)
_LANG_STOP_PACKED = [
    (lang, _pack8(sorted(w for w in stops if w.isascii() and len(w) <= 8)))
    for lang, stops in _LANG_STOPWORDS.items()
]


def _flat_ascii_view(col):
    """Arrow string column → (data_u8, offsets, ascii_row_mask). Nulls read
    as empty strings."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from camden_ray.functions.hashing import _string_array_view

    if isinstance(col, (list, np.ndarray)):
        col = pa.array(["" if x is None else x for x in col], type=pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    data, offsets = _string_array_view(col)
    hi = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(data >= 128, out=hi[1:])
    ascii_rows = (hi[offsets[1:]] - hi[offsets[:-1]]) == 0
    return data, offsets, ascii_rows, col


def _row_counts(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    # int32 cumsum: halves the write bandwidth of the hot per-byte pass
    # (a map_batches block is far below 2^31 bytes)
    cs = np.zeros(len(mask) + 1, dtype=np.int32)
    np.cumsum(mask, out=cs[1:])
    return (cs[offsets[1:]] - cs[offsets[:-1]]).astype(np.int64)


def _token_runs(lb: np.ndarray, offsets: np.ndarray):
    """Token (``\\w+`` run) starts/ends over a row-segmented byte buffer.

    Returns (starts_idx, lens, tok_counts_per_row): global byte index of each
    token start, token byte length, and per-row token counts — tokens never
    straddle row boundaries."""
    w = _T_WORD[lb]
    prev = np.zeros(len(w), dtype=bool)
    if len(w) > 1:
        prev[1:] = w[:-1]
    nxt = np.zeros(len(w), dtype=bool)
    if len(w) > 1:
        nxt[:-1] = w[1:]
    nonempty = offsets[1:] > offsets[:-1]
    row_starts = offsets[:-1][nonempty]
    row_ends = offsets[1:][nonempty] - 1
    prev[row_starts] = False
    nxt[row_ends] = False
    tok_start = w & ~prev
    tok_end = w & ~nxt
    starts_idx = np.flatnonzero(tok_start)
    ends_idx = np.flatnonzero(tok_end)
    lens = ends_idx - starts_idx + 1
    return starts_idx, lens, _row_counts(tok_start, offsets)


# prefix-mask LUT: _MASK_LUT[k] keeps the low k bytes of a little-endian u64
_MASK_LUT = np.array(
    [0] + [(1 << (8 * k)) - 1 for k in range(1, 8)] + [~0 & 0xFFFFFFFFFFFFFFFF],
    dtype=np.uint64,
)


def _pack_tokens(
    lb: np.ndarray, starts_idx: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) uint64 pair identity of each token's first 16 bytes —
    injective for tokens ≤ 16 bytes (callers route longer ones to the
    reference fallback). Two unaligned little-endian u64 strided reads per
    token + a prefix-mask LUT gather — no m×16 byte matrix."""
    if not len(starts_idx):
        e = np.zeros(0, dtype=np.uint64)
        return e, e.copy()
    pad = np.r_[lb, np.zeros(16, dtype=np.uint8)]
    # unaligned u64 window at every byte offset (numpy handles the unaligned
    # loads; little-endian layout matches the byte-packing definition)
    win = np.ndarray(
        buffer=pad, dtype="<u8", shape=(len(pad) - 7,), strides=(1,)
    )
    lo = win[starts_idx] & _MASK_LUT[np.minimum(lens, 8)]
    hi = win[starts_idx + 8] & _MASK_LUT[np.clip(lens - 8, 0, 8)]
    return lo, hi


def _lb_token_view(data: np.ndarray, offsets: np.ndarray):
    """Shared first stage of the batch text kernels: lowercased byte copy,
    token (``\\w+``) runs, and the per-row token-offset array. One
    definition so the packing/stopword kernels cannot drift apart."""
    lb = data.copy()
    up = (lb >= 65) & (lb <= 90)
    lb[up] += 32
    starts_idx, lens, ntok = _token_runs(lb, offsets)
    tok_row_off = np.zeros(len(offsets), dtype=np.int64)
    np.cumsum(ntok, out=tok_row_off[1:])
    return lb, starts_idx, lens, ntok, tok_row_off


def _stop_counts(
    lo: np.ndarray, hi: np.ndarray, tok_row_off: np.ndarray
) -> np.ndarray:
    """Per-row English-stopword hits from packed token identities (exact:
    stopwords are ≤ 8 bytes, so ``hi != 0`` can never match)."""
    stop_mask = np.isin(lo, _STOP_EN_PACKED) & (hi == 0)
    scs = np.zeros(len(stop_mask) + 1, dtype=np.int64)
    np.cumsum(stop_mask, out=scs[1:])
    return scs[tok_row_off[1:]] - scs[tok_row_off[:-1]]


def batch_quality_features(col) -> dict[str, np.ndarray]:
    """Vectorized :func:`quality_features` over a text column: one byte-level
    pass per batch instead of one Python call + dict per row. Returns the
    same keys as the per-row reference, as float64 arrays. Exactness: see the
    section comment above."""
    data, offsets, ascii_rows, col = _flat_ascii_view(col)
    n = len(ascii_rows)
    n_chars = (offsets[1:] - offsets[:-1]).astype(np.float64)
    punct = _row_counts(~_T_ALNUM[data] & ~_T_SPACE[data], offsets)
    digits = _row_counts(_T_DIGIT[data], offsets)

    lb, starts_idx, lens, ntok, tok_row_off = _lb_token_view(data, offsets)
    wc = _row_counts(_T_WORD[lb], offsets)  # Σ len(tok) per row

    lo, hi = _pack_tokens(lb, starts_idx, lens)
    # rows needing the reference fallback: non-ASCII bytes, or a token the
    # 16-byte packing can't identify exactly
    fallback = ~ascii_rows
    if len(lens) and int(lens.max()) > 16:
        long_rows = np.unique(
            np.searchsorted(tok_row_off[1:], np.flatnonzero(lens > 16), side="right")
        )
        fallback[long_rows] = True
    stop = _stop_counts(lo, hi, tok_row_off)

    # per-row distinct tokens: sort (row, lo, hi) and count group changes
    if len(lo):
        tok_row = np.repeat(np.arange(n, dtype=np.int64), ntok)
        order = np.lexsort((hi, lo, tok_row))
        tr, tl, th_ = tok_row[order], lo[order], hi[order]
        new = np.r_[True, (tr[1:] != tr[:-1]) | (tl[1:] != tl[:-1]) | (th_[1:] != th_[:-1])]
        uniq = np.bincount(tr[new], minlength=n).astype(np.int64)
    else:
        uniq = np.zeros(n, dtype=np.int64)

    ntok_f = ntok.astype(np.float64)
    live = (n_chars > 0) & (ntok > 0)
    safe_ntok = np.where(ntok > 0, ntok_f, 1.0)
    safe_nc = np.where(n_chars > 0, n_chars, 1.0)
    mean_word_len = np.where(live, wc / safe_ntok, 0.0)
    stopword_ratio = np.where(live, stop / safe_ntok, 0.0)
    punct_ratio = np.where(live, punct / safe_nc, 0.0)
    digit_ratio = np.where(live, digits / safe_nc, 0.0)
    uniq_ratio = np.where(live, uniq / safe_ntok, 0.0)
    # identical op order to the reference → identical IEEE doubles
    score = np.minimum(1.0, ntok_f / 50.0)
    score = score * np.sqrt(uniq_ratio)
    score = score * (1.0 - np.minimum(0.5, punct_ratio) / 0.5 * 0.5)
    score = score * (1.0 - np.minimum(0.5, digit_ratio) / 0.5 * 0.5)
    score = np.where(live, score, 0.0)

    out = {
        "n_chars": n_chars,
        "n_tokens": np.where(live, ntok_f, 0.0),
        "mean_word_len": mean_word_len,
        "stopword_ratio": stopword_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "uniq_token_ratio": uniq_ratio,
        "quality_score": score,
    }
    if fallback.any():
        for i in np.flatnonzero(fallback):
            f = quality_features(col[int(i)].as_py() or "")
            for k in out:
                out[k][i] = f[k]
    return out


def batch_detect_lang(col) -> list[str]:
    """Vectorized :func:`detect_lang` over a text column (ASCII fast path +
    per-row reference fallback; ASCII rows cannot be CJK by construction)."""
    data, offsets, ascii_rows, col = _flat_ascii_view(col)
    n = len(ascii_rows)
    # truncate each row to its first 2000 bytes (== chars for ASCII rows)
    lens_full = offsets[1:] - offsets[:-1]
    lens_t = np.minimum(lens_full, 2000)
    total = int(lens_t.sum())
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_t, out=new_off[1:])
    if total:
        from camden_ray.functions.hashing import seg_positions

        nz = lens_t > 0
        src = seg_positions(offsets[:-1][nz], lens_t[nz])
        sample = data[src]
    else:
        sample = np.empty(0, dtype=np.uint8)
    lb, starts_idx, tlens, ntok, tok_row_off = _lb_token_view(sample, new_off)
    lo, hi = _pack_tokens(lb, starts_idx, tlens)
    valid16 = hi == 0  # stopwords are ≤ 8 bytes; longer tokens never match

    best_hits = np.zeros(n, dtype=np.int64)
    best_lang = np.full(n, "unknown", dtype=object)
    for lang, packed in _LANG_STOP_PACKED:
        m = np.isin(lo, packed) & valid16
        cs = np.zeros(len(m) + 1, dtype=np.int64)
        np.cumsum(m, out=cs[1:])
        hits = cs[tok_row_off[1:]] - cs[tok_row_off[:-1]]
        upd = hits > best_hits  # strict >: first language wins ties, like
        best_hits[upd] = hits[upd]  # the reference's dict-order loop
        best_lang[upd] = lang
    best_lang[(lens_full == 0) | (ntok == 0) | (best_hits == 0)] = "unknown"

    out = best_lang.tolist()
    for i in np.flatnonzero(~ascii_rows):
        out[int(i)] = detect_lang(col[int(i)].as_py() or "")
    return out


def batch_gopher_features(col) -> dict[str, np.ndarray]:
    """Vectorized :func:`gopher_features` over a text column — one byte-level
    pass per batch. Exact on ASCII rows (char-class LUTs built from Python's
    own predicates, counts are integer); non-ASCII rows take the per-row
    reference fallback. Long tokens need no fallback here: stopword identity
    only requires ≤ 8-byte exactness (hi != 0 can never match a packed
    stopword) and no feature depends on full-token identity."""
    data, offsets, ascii_rows, col = _flat_ascii_view(col)
    n = len(ascii_rows)

    lb, starts_idx, lens, ntok, tok_row_off = _lb_token_view(data, offsets)
    swl = _row_counts(_T_WORD[lb], offsets)  # Σ len(tok) per row

    lo, hi = _pack_tokens(lb, starts_idx, lens)
    stop = _stop_counts(lo, hi, tok_row_off)

    # tokens containing ≥1 alphabetic char: cumsum gather per token span
    acs = np.zeros(len(lb) + 1, dtype=np.int64)
    np.cumsum(_T_ALPHA[lb], out=acs[1:])
    tok_alpha = (acs[starts_idx + lens] - acs[starts_idx]) > 0
    tcs = np.zeros(len(tok_alpha) + 1, dtype=np.int64)
    np.cumsum(tok_alpha, out=tcs[1:])
    alpha = tcs[tok_row_off[1:]] - tcs[tok_row_off[:-1]]

    n_hash = _row_counts(data == 35, offsets)  # '#'

    # non-overlapping '...' count == Σ floor(run_len/3) over per-row '.' runs
    # (str.count / SQL replace() both consume greedily left-to-right)
    dot = data == 46
    prev = np.zeros(len(dot), dtype=bool)
    nxt = np.zeros(len(dot), dtype=bool)
    if len(dot) > 1:
        prev[1:] = dot[:-1]
        nxt[:-1] = dot[1:]
    nonempty = offsets[1:] > offsets[:-1]
    if nonempty.any():
        prev[offsets[:-1][nonempty]] = False
        nxt[offsets[1:][nonempty] - 1] = False
    run_s = np.flatnonzero(dot & ~prev)
    run_e = np.flatnonzero(dot & ~nxt)
    n_ellipsis = np.zeros(n, dtype=np.int64)
    if len(run_s):
        per_run = (run_e - run_s + 1) // 3
        row_of = np.searchsorted(offsets[1:], run_s, side="right")
        np.add.at(n_ellipsis, row_of, per_run)

    ntok_f = ntok.astype(np.float64)
    live = ntok > 0
    safe = np.where(live, ntok_f, 1.0)
    out = {
        "n_tokens": ntok_f,
        "mean_word_len": np.where(live, swl / safe, 0.0),
        "alpha_word_frac": np.where(live, alpha / safe, 0.0),
        "symbol_ratio": np.where(
            live, (n_hash + n_ellipsis).astype(np.float64) / safe, 0.0
        ),
        "n_stopwords": stop.astype(np.float64),
        "n_hash": n_hash.astype(np.float64),
        "n_ellipsis": n_ellipsis.astype(np.float64),
    }
    if not ascii_rows.all():
        for i in np.flatnonzero(~ascii_rows):
            f = gopher_features(col[int(i)].as_py() or "")
            for k in out:
                out[k][i] = f[k]
    return out
