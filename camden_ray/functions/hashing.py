"""Deterministic hash kernels (stdlib + numpy only — sandbox has no xxhash/blake3).

Role in the engine: the generalization of camden's streaming xxHash64 content
checksum (/root/reference/src/scanner.rs:81-95) to row granularity, plus the
seeded universal hashing the reference never needed (MinHash permutations,
shingle hashes, rolling polynomial hashes for L-gram substring dedup).

Every function here is pure and seeded — same input ⇒ same output across
processes, workers and parallelism levels (the determinism contract of
SURVEY.md §4.1).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_EMPTY_U64 = np.empty(0, dtype=U64)
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# Odd multiplier for polynomial rolling hashes (mod 2^64 via uint64 wraparound).
POLY_P = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
# Modular inverse of POLY_P mod 2^64 (exists because POLY_P is odd).
POLY_P_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def blake2b_u64(data: bytes, *, seed: int = 0) -> int:
    """64-bit content digest of raw bytes (camden M1 analogue, BLAKE2-class)."""
    h = hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def blake2b_hex(data: bytes) -> str:
    """Full-width content digest (hex) for manifests / fingerprints."""
    return hashlib.blake2b(data, digest_size=16).hexdigest()


def digest_column_u64(values: list[bytes | str | None], seed: int = 0) -> np.ndarray:
    """Per-row 64-bit digests of a binary/string column. Null ⇒ digest 0."""
    salt = seed.to_bytes(8, "little")
    out = np.zeros(len(values), dtype=U64)
    for i, v in enumerate(values):
        if v is None:
            continue
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        out[i] = int.from_bytes(
            hashlib.blake2b(v, digest_size=8, salt=salt).digest(), "little"
        )
    return out


def _string_array_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """pyarrow (large_)string array → (data_u8, per-row offsets rebased to 0).
    Zero-copy views over the Arrow buffers (honors ``arr.offset``)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if not pa.types.is_large_string(arr.type) and not pa.types.is_string(arr.type):
        arr = arr.cast(pa.string())
    off_width = 8 if pa.types.is_large_string(arr.type) else 4
    off_dtype = np.int64 if off_width == 8 else np.int32
    offsets = np.frombuffer(
        arr.buffers()[1], dtype=off_dtype, count=n + 1, offset=arr.offset * off_width
    ).astype(np.int64)
    total = int(offsets[-1] - offsets[0])
    data = (
        np.frombuffer(
            arr.buffers()[2], dtype=np.uint8, count=total, offset=int(offsets[0])
        )
        if total
        else np.empty(0, dtype=np.uint8)
    )
    return data, offsets - offsets[0]


_POW_CACHE: dict[int, np.ndarray] = {}
_POW_CACHE_MAX = 1 << 25  # ≈268 MB of u64 per constant — don't pin more


def geom_pows(const: np.uint64, n: int) -> np.ndarray:
    """First ``n`` powers ``const^0 .. const^(n-1)`` under u64 wraparound, as
    a read-only view of a per-process cache grown geometrically.

    The ``multiply.accumulate`` chain is loop-carried (inherently
    sequential) and every poly-hash call site used to recompute it per
    batch — measured ~20% of the signature-stage profile. Above
    ``_POW_CACHE_MAX`` entries the table is computed transiently instead of
    pinned (a single call that big is an exchange-sized outlier, not the
    steady-state batch path)."""
    key = int(const)
    a = _POW_CACHE.get(key)
    if a is None or len(a) < n:
        m = max(n, 1 << 16)
        if a is not None:
            m = max(m, 2 * len(a))
        b = np.empty(m, dtype=U64)
        b[0] = np.uint64(1)
        if m > 1:
            with np.errstate(over="ignore"):
                np.multiply.accumulate(np.full(m - 1, const, dtype=U64), out=b[1:])
        if m <= _POW_CACHE_MAX:
            b.flags.writeable = False  # views inherit this — callers must copy
            _POW_CACHE[key] = b
        a = b
    return a[:n]


def poly_hash_segments(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """Polynomial hash of arbitrary byte segments of one uint8 array, via
    invertible prefix sums: h(seg) = mix64(poly(bytes) ^ len·C). O(len(data)
    + n_segments) numpy, no per-segment Python."""
    total = len(data)
    if len(starts) == 0:
        return np.empty(0, dtype=U64)
    if total == 0:
        return mix64(np.zeros(len(starts), dtype=U64))
    with np.errstate(over="ignore"):
        pinv_pows = geom_pows(POLY_P_INV, total)
        prefix = np.zeros(total + 1, dtype=U64)
        # buffered-cast multiply straight into the prefix buffer, then an
        # in-place cumsum — no full u64 copy of data (8x its size) and no
        # product temp
        np.multiply(data, pinv_pows, out=prefix[1:], casting="unsafe")
        np.cumsum(prefix[1:], out=prefix[1:])
        p_pows = geom_pows(POLY_P, total + 1)
        lens = (ends - starts).astype(U64)
        h = p_pows[np.maximum(ends - 1, 0)] * (prefix[ends] - prefix[starts])
        h ^= lens * np.uint64(0x9E3779B97F4A7C15)
    return mix64(h)


def hash_string_column(arr) -> np.ndarray:
    """Vectorized 64-bit hash of a pyarrow string column — the KEY hash for
    partitioning / node ids / pair ids (NOT the content digest: exact-dedup
    digests stay blake2b, see :func:`digest_column_u64`).

    Polynomial hash over UTF-8 bytes via invertible prefix sums (same O(total
    bytes) trick as :func:`rolling_lgram_hashes`): h(row) = mix64(poly(bytes)
    ^ len·C). No per-row Python loop or per-row bytes objects — several times
    the blake2b-path throughput on url-sized strings, O(total bytes) numpy.
    Deterministic across processes.
    """
    data, offsets = _string_array_view(arr)
    if len(offsets) <= 1:
        return np.empty(0, dtype=U64)
    return poly_hash_segments(data, offsets[:-1], offsets[1:])


def mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — scrambles structured integers into uniform u64."""
    x = x.astype(U64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def minhash_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) parameter vectors for num_perms multiply-shift hashes."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perms, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perms, dtype=np.uint64)
    return a, b


class TokenHasher:
    """Token → u64 via blake2b, memoized (compile-once actor state).

    The cache makes shingle hashing amortized-vectorizable: unique tokens are
    hashed once per actor lifetime; per-batch work is numpy only.
    """

    def __init__(self, seed: int = 42, max_cache: int = 4_000_000):
        self._seed = seed
        self._salt = seed.to_bytes(8, "little")
        self._cache: dict[str, int] = {}
        self._max_cache = max_cache

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        cache, salt = self._cache, self._salt
        out = np.empty(len(tokens), dtype=U64)
        for i, t in enumerate(tokens):
            v = cache.get(t)
            if v is None:
                v = int.from_bytes(
                    hashlib.blake2b(
                        t.encode("utf-8", "surrogatepass"), digest_size=8, salt=salt
                    ).digest(),
                    "little",
                )
                if len(cache) < self._max_cache:
                    cache[t] = v
            out[i] = v
        return out


def digest_string_array_u64(arr, seed: int = 0) -> np.ndarray:
    """Per-row 64-bit blake2b digests of a pyarrow string column, hashing
    memoryview slices of the Arrow data buffer directly — value-identical to
    :func:`digest_column_u64` on the decoded strings (the stored UTF-8 IS
    the encoding) without materializing per-row Python strings + re-encoded
    bytes. Null ⇒ digest 0 (matches digest_column_u64)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    data, offsets = _string_array_view(arr)
    n = len(offsets) - 1
    salt = seed.to_bytes(8, "little")
    mv = memoryview(data)
    out = np.zeros(n, dtype=U64)
    null_mask = None
    if arr.null_count:
        null_mask = arr.is_null().to_numpy(zero_copy_only=False)
    blake2b = hashlib.blake2b
    for i in range(n):
        if null_mask is not None and null_mask[i]:
            continue
        out[i] = int.from_bytes(
            blake2b(mv[offsets[i] : offsets[i + 1]], digest_size=8, salt=salt).digest(),
            "little",
        )
    return out


# byte-level lookup tables replicating ``tokenize`` (text.lower() + \w+
# findall) for pure-ASCII text: lowercase map, then word-class membership of
# the LOWERCASED byte ([a-z0-9_] — Python's \w on ASCII)
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[65:91] += 32
_WORD_LUT = np.zeros(256, dtype=bool)
_WORD_LUT[np.frombuffer(b"abcdefghijklmnopqrstuvwxyz0123456789_", dtype=np.uint8)] = True


class BatchTokenHasher:
    """Batch-vectorized twin of ``TokenHasher.hash_tokens(tokenize(text))``
    — value-identical for EVERY input (parity-asserted in
    tests/test_hashing.py), structured so the per-token Python work
    disappears for the common case:

    * pure-ASCII docs run a fully-vectorized byte path: lowercase + word
      mask via 256-entry LUTs, token boundaries from mask transitions
      (doc-boundary-aware), one :func:`poly_hash_segments` pass for a 64-bit
      key per token occurrence, ``np.unique`` to collapse occurrences, then
      ONE memoized blake2b per unique-token-key per actor lifetime. Per
      occurrence: zero Python objects (the old path built a Python string +
      dict lookup per token occurrence — 64 % of pipeline wall at 6M docs).
    * docs containing any non-ASCII byte (or nulls) fall back per-doc to the
      reference ``TokenHasher`` path, so unicode tokenization semantics are
      bit-identical to Python's ``\\w``.

    The key cache maps poly-key → blake2b value; a 64-bit key collision
    between two distinct tokens (p ≈ 4e-7 at the 4M-token cache cap) would
    alias their hashes — recall-neutral noise, same failure class as any
    64-bit token hash collision.
    """

    def __init__(self, seed: int = 42, max_cache: int = 4_000_000):
        self._seed = seed
        self._salt = seed.to_bytes(8, "little")
        self._ref = TokenHasher(seed=seed, max_cache=max_cache)
        self._key_cache: dict[int, int] = {}
        self._max_cache = max_cache
        # open-addressing numpy snapshot of _key_cache for vectorized
        # lookups: keys are mix64 outputs (uniform), so ``key & mask``
        # indexes a load-factor-¼ linear-probing table directly — one
        # vectorized probe round resolves ~all occurrences. This replaces a
        # per-batch np.unique (a full u64 sort of the occurrence stream —
        # measured ~55% of warm hash_array wall, and np.searchsorted was no
        # better at ~76 ns/lookup); misses (new vocabulary only) still go
        # through the memo dict + blake2b. Rebuilt geometrically as the
        # dict grows, so amortized O(C log C) total.
        self._ht_keys = np.empty(0, dtype=U64)
        self._ht_vals = np.empty(0, dtype=U64)
        self._ht_filled = np.empty(0, dtype=bool)
        self._ht_mask = np.uint64(0)
        self._ht_maxprobe = 0
        self._ht_n = 0

    def _rebuild_table(self) -> None:
        cache = self._key_cache
        n = len(cache)
        ks = np.fromiter(cache.keys(), dtype=U64, count=n)
        vs = np.fromiter(cache.values(), dtype=U64, count=n)
        M = 1 << max((4 * n - 1).bit_length() if n else 6, 6)
        mask = np.uint64(M - 1)
        tk = np.zeros(M, dtype=U64)
        tv = np.zeros(M, dtype=U64)
        tf = np.zeros(M, dtype=bool)
        idx = np.arange(n)
        probe = np.uint64(0)
        # vectorized insertion: per round, the first pending key per slot
        # whose slot is free wins; the rest retry at slot+1. Uniform keys at
        # load ¼ converge in a handful of rounds.
        while len(idx):
            s = ((ks[idx] + probe) & mask).astype(np.int64)
            order = np.argsort(s, kind="stable")
            ss = s[order]
            first = np.ones(len(ss), dtype=bool)
            first[1:] = ss[1:] != ss[:-1]
            winners = order[first]
            free = ~tf[s[winners]]
            w = winners[free]
            sw = s[w]
            tk[sw] = ks[idx[w]]
            tv[sw] = vs[idx[w]]
            tf[sw] = True
            keep = np.ones(len(idx), dtype=bool)
            keep[w] = False
            idx = idx[keep]
            probe += np.uint64(1)
        self._ht_keys, self._ht_vals, self._ht_filled = tk, tv, tf
        self._ht_mask = mask
        self._ht_maxprobe = int(probe)
        self._ht_n = n

    def _resolve_keys(
        self, keys: np.ndarray, low: np.ndarray, ts: np.ndarray, te: np.ndarray
    ) -> np.ndarray:
        """Vectorized key→hash resolution: snapshot hits via hash-table
        probing, misses (new vocabulary only) through the memo dict +
        blake2b."""
        th = np.empty(len(keys), dtype=U64)
        if self._ht_n:
            mask = self._ht_mask
            found = np.zeros(len(keys), dtype=bool)
            pending = np.arange(len(keys))
            probe = np.uint64(0)
            # probe until an empty slot (true miss) or a key match; bounded
            # by the build's max displacement.
            while len(pending) and probe <= np.uint64(self._ht_maxprobe):
                s = ((keys[pending] + probe) & mask).astype(np.int64)
                tf = self._ht_filled[s]
                hit = tf & (self._ht_keys[s] == keys[pending])
                if hit.any():
                    ph = pending[hit]
                    th[ph] = self._ht_vals[s[hit]]
                    found[ph] = True
                pending = pending[tf & ~hit]
                probe += np.uint64(1)
            miss_idx = np.flatnonzero(~found)
        else:
            miss_idx = np.arange(len(keys))
        if len(miss_idx):
            mkeys = keys[miss_idx]
            uk, first_local = np.unique(mkeys, return_index=True)
            vals = np.empty(len(uk), dtype=U64)
            cache, salt = self._key_cache, self._salt
            blake2b = hashlib.blake2b
            mv = memoryview(low)
            for i, k in enumerate(uk.tolist()):
                v = cache.get(k)
                if v is None:
                    j = int(miss_idx[first_local[i]])
                    v = int.from_bytes(
                        blake2b(
                            mv[ts[j] : te[j]], digest_size=8, salt=salt
                        ).digest(),
                        "little",
                    )
                    if len(cache) < self._max_cache:
                        cache[k] = v
                vals[i] = v
            th[miss_idx] = vals[np.searchsorted(uk, mkeys)]
            if len(cache) > max(2 * self._ht_n, 1024):
                self._rebuild_table()
        return th

    def hash_array(self, arr) -> tuple[np.ndarray, np.ndarray]:
        """(large_)string array → (th_flat:u64, th_lens:int64) in doc order:
        each doc's token-hash stream, concatenated."""
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        if n == 0:
            return np.empty(0, dtype=U64), np.empty(0, dtype=np.int64)
        data, off = _string_array_view(arr)
        total = len(data)

        # docs eligible for the vectorized path: non-null, pure-ASCII bytes.
        # Segment OR via reduceat (high bit set anywhere in the doc) — one
        # u8 pass, replacing a full-corpus int64 cumsum (8x the traffic).
        if total:
            idx = np.minimum(off[:-1], total - 1)
            seg_or = np.bitwise_or.reduceat(data, idx)
            nonempty = off[:-1] < off[1:]
            fast = ~((seg_or >= 0x80) & nonempty)
        else:
            fast = np.ones(n, dtype=bool)
        if arr.null_count:
            fast &= ~arr.is_null().to_numpy(zero_copy_only=False)

        if total == 0 or not fast.any():
            return self._fallback_all(arr, fast)

        low = _LOWER_LUT[data]
        wmask = _WORD_LUT[low]
        # token run boundaries, with breaks forced at doc boundaries so a
        # doc ending mid-word never merges with the next doc's first token
        prev = np.empty(total, dtype=bool)
        prev[0] = False
        prev[1:] = wmask[:-1]
        nxt = np.empty(total, dtype=bool)
        nxt[-1] = False
        nxt[:-1] = wmask[1:]
        inner = off[1:-1]
        inner = inner[(inner > 0) & (inner < total)]
        prev[inner] = False
        nxt[inner - 1] = False
        ts = np.flatnonzero(wmask & ~prev)
        te = np.flatnonzero(wmask & ~nxt) + 1
        # per-doc token counts from doc boundaries into the sorted start
        # positions (n+1 binary searches instead of one per token; token
        # runs never straddle doc boundaries — breaks were forced above)
        counts_all = np.diff(np.searchsorted(ts, off))
        keep = np.repeat(fast, counts_all)
        ts, te = ts[keep], te[keep]
        counts = np.where(fast, counts_all, 0).astype(np.int64)

        keys = poly_hash_segments(low, ts, te)
        if len(keys):
            th_fast = self._resolve_keys(keys, low, ts, te)
        else:
            th_fast = np.empty(0, dtype=U64)

        if fast.all():
            return th_fast, counts
        # merge: fast docs take slice views, fallback docs re-run the
        # reference path (per-DOC python, not per-token)
        foff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=foff[1:])
        from camden_ray.functions.text import tokenize

        chunks: list[np.ndarray] = []
        lens = np.empty(n, dtype=np.int64)
        for i in range(n):
            if fast[i]:
                c = th_fast[foff[i] : foff[i + 1]]
            else:
                v = arr[i].as_py()
                c = self._ref.hash_tokens(tokenize(v) if v else [])
            chunks.append(c)
            lens[i] = len(c)
        flat = np.concatenate(chunks) if chunks else np.empty(0, dtype=U64)
        return flat, lens

    def _fallback_all(self, arr, fast) -> tuple[np.ndarray, np.ndarray]:
        from camden_ray.functions.text import tokenize

        chunks = []
        lens = np.empty(len(arr), dtype=np.int64)
        for i, v in enumerate(arr.to_pylist()):
            c = self._ref.hash_tokens(tokenize(v) if v else [])
            chunks.append(c)
            lens[i] = len(c)
        flat = np.concatenate(chunks) if chunks else np.empty(0, dtype=U64)
        return flat, lens


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Hashes of all k-token shingles: polynomial combine, mod 2^64.

    Returns an array of length max(0, n-k+1). Fully vectorized (k numpy passes).
    """
    n = len(token_hashes)
    if n < k:
        return np.empty(0, dtype=U64)
    m = n - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=U64)
        for j in range(k):
            acc = acc * POLY_P + token_hashes[j : j + m]
    return mix64(acc)


def rolling_lgram_hashes(token_hashes: np.ndarray, L: int) -> np.ndarray:
    """Hashes of ALL L-token grams in O(n) via invertible prefix polynomials.

    gram(i) = Σ_{j=0..L-1} th[i+j] · P^(L-1-j)  (mod 2^64), computed as
    P^(L-1+i) · (A[i+L] − A[i]) where A[i] = Σ_{j<i} th[j] · P^(−j).
    P is odd so P^(−1) exists mod 2^64; uint64 wraparound IS the modulus.
    """
    n = len(token_hashes)
    if n < L:
        return np.empty(0, dtype=U64)
    m = n - L + 1
    with np.errstate(over="ignore"):
        # pinv_pows[j] = P^(-j); p_pows[i] = P^(L-1+i)
        pinv_pows = geom_pows(POLY_P_INV, n)
        prefix = np.zeros(n + 1, dtype=U64)
        np.cumsum(token_hashes * pinv_pows, out=prefix[1:], dtype=U64)
        # fresh array (cached view is read-only): P^(L-1) · P^i
        p_pows = geom_pows(POLY_P, m) * np.uint64(pow(int(POLY_P), L - 1, 1 << 64))
        grams = p_pows * (prefix[L : L + m] - prefix[:m])
    return mix64(grams)


def seg_positions(starts: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """``concatenate([arange(s, s+l) for s, l in zip(starts, seg_lens)])``
    without the per-segment Python loop (one arange + a repeat'd shift)."""
    total = int(seg_lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(seg_lens)
    r = np.arange(total, dtype=np.int64)
    shift = np.repeat(starts - np.concatenate(([0], ends[:-1])), seg_lens)
    return r + shift


def flat_rolling_grams(th_flat: np.ndarray, L: int) -> np.ndarray:
    """All L-gram rolling hashes over a CONCATENATED token-hash stream —
    the batch-flat core of :func:`rolling_lgram_hashes` (value-identical at
    every position; the gram value P^(L-1+i)·(A[i+L]−A[i]) is
    position-independent, so per-doc values are exactly the flat values at
    the doc's global offsets — callers mask doc-straddling windows)."""
    T = len(th_flat)
    if T < L:
        return np.empty(0, dtype=U64)
    m = T - L + 1
    with np.errstate(over="ignore"):
        pinv = geom_pows(POLY_P_INV, T)
        prefix = np.zeros(T + 1, dtype=U64)
        np.cumsum(th_flat * pinv, out=prefix[1:], dtype=U64)
        # fresh array (cached view is read-only): P^(L-1) · P^i
        p_pows = geom_pows(POLY_P, m) * np.uint64(pow(int(POLY_P), L - 1, 1 << 64))
        return mix64(p_pows * (prefix[L : L + m] - prefix[:m]))


def sliding_min(g: np.ndarray, w: int) -> np.ndarray:
    """Minimum of every ``w``-wide window of ``g`` (length ``len(g)-w+1``),
    via sparse-table doubling: ``log2(w)+1`` pairwise ``np.minimum`` passes
    instead of the strided ``sliding_window_view(...).min(axis=1)`` reduce —
    measured 5x at w=8 (the strided reduce re-reads every element w times
    through a non-contiguous view)."""
    out_len = len(g) - w + 1
    if out_len <= 0:
        return np.empty(0, dtype=g.dtype)
    k = w.bit_length() - 1  # largest power of two <= w
    M = g
    step = 1
    for _ in range(k):
        M = np.minimum(M[: len(M) - step], M[step:])
        step *= 2
    if step == w:
        return M[:out_len]
    return np.minimum(M[:out_len], M[w - step : w - step + out_len])


def batch_winnowed_lgrams(
    th_flat: np.ndarray, lens: np.ndarray, off: np.ndarray, L: int, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed L-gram fingerprints for a whole batch of documents in one
    vectorized pass (value-identical to per-doc ``winnow(rolling_lgram_hashes)``
    — asserted in tests/test_hashing.py).

    ``th_flat`` is the batch's concatenated token-hash streams, ``lens`` the
    per-doc token counts, ``off`` the (n+1) cumulative offsets. Returns
    ``(values, counts)``: per-doc fingerprint arrays concatenated in doc
    order (each doc's values sorted unique) and the per-doc counts.

    Works because the rolling gram value P^(L-1+i)·(A[i+L]−A[i]) is
    position-independent — computing it at GLOBAL flat indices yields the
    exact per-doc values; only window/boundary masking differs. Measured
    2.5× the per-doc loop at 1000-doc batches (the per-doc version pays ~8
    small-array numpy calls per document).
    """
    n = len(lens)
    # all L-gram hashes over the flat stream (invalid positions masked below)
    g_all = flat_rolling_grams(th_flat, L)
    gm = np.maximum(lens - L + 1, 0)  # grams per doc
    has = gm > 0
    g = g_all[seg_positions(off[:-1][has], gm[has])]  # per-doc runs, contiguous
    hidx = np.flatnonzero(has)
    # local (within-g) start of each has-doc's gram run
    gloc = np.zeros(len(hidx), dtype=np.int64)
    np.cumsum(gm[hidx][:-1], out=gloc[1:])

    # per-doc sorted-unique selections assembled in doc order (same
    # segment-local np.unique pattern as the signature shingle dedup — the
    # former two global (value, doc) lexsorts were the kernel's main cost):
    #   * 1..w grams  → the single segment min (winnow small case)
    #   * > w grams   → unique sliding-window minima (winnow general case),
    #     one global vectorized sliding min over the concatenated runs
    #     (windows never straddle docs: slices below stay within each run)
    parts: list[np.ndarray] = [_EMPTY_U64] * n
    if len(hidx):
        wm = sliding_min(g, w) if len(g) >= w else None
        gm_h = gm[hidx].tolist()
        for j, (d, m) in enumerate(zip(hidx.tolist(), gm_h)):
            s = gloc[j]
            if m <= w:
                seg = g[s : s + m]
                parts[d] = seg.min(keepdims=True)
            else:
                parts[d] = np.unique(wm[s : s + m - w + 1])
        V = np.concatenate(parts)
        counts = np.fromiter((len(p) for p in parts), dtype=np.int64, count=n)
    else:
        V = np.empty(0, dtype=U64)
        counts = np.zeros(n, dtype=np.int64)
    return V, counts


def winnow(gram_hashes: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD'03).

    Select every gram that is the minimum of SOME window of w consecutive
    grams. Guarantee: any run of >= w consecutive shared grams contributes at
    least one shared selection, and selections are content-defined (identical
    shared runs select identical grams in both documents). Expected density
    ~ 2/(w+1) — vs mod-sampling's 1/w with NO guarantee (a 60-token span at
    w=8 would be missed with prob (7/8)^11 ≈ 0.23).
    """
    m = len(gram_hashes)
    if m == 0:
        return gram_hashes
    if m <= w:
        return np.array([gram_hashes.min()], dtype=U64)
    return np.unique(sliding_min(gram_hashes, w))


def band_hashes(signatures: np.ndarray, num_bands: int) -> np.ndarray:
    """LSH band keys: (n_docs, num_perms) signatures → (n_docs, num_bands) u64.

    Each band's r signature components are combined with the same polynomial
    scheme as shingles, so a band hash collides iff (w.h.p.) all r rows match.
    """
    n, p = signatures.shape
    r = p // num_bands
    bands = signatures.reshape(n, num_bands, r)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, num_bands), dtype=U64)
        for j in range(r):
            acc = acc * POLY_P + bands[:, :, j]
    return mix64(acc.reshape(-1)).reshape(n, num_bands)


def parallel_argsort(arr: np.ndarray) -> np.ndarray:
    """Multi-threaded argsort of a 1-D int array (polars ``arg_sort``, whose
    thread pool is bounded by POLARS_MAX_THREADS — bench pins that to the
    measured CPU level so a driver sort can't out-parallelize its claimed
    cluster size), with a numpy fallback.

    NOT stability-guaranteed across the two paths: callers must be
    order-insensitive within equal keys (segment-min grouping, unique keys).
    """
    try:
        import polars as pl

        return pl.Series(arr).arg_sort().to_numpy()
    except Exception:  # pragma: no cover - polars always present in CI
        return np.argsort(arr, kind="stable")


# ---------------------------------------------------------------------------
# DuckDB-parity md5 hashing — for queries whose SQL oracle must replicate
# every hash value exactly (DuckDB has md5 but no blake2/xxhash). Mirrors the
# exact_dup digest's "blake2b internally, md5 for oracle parity" convention.
# ---------------------------------------------------------------------------

#: fold multiplier for the md5-token polynomial fingerprint. SMALL on purpose:
#: the DuckDB oracle folds in HUGEINT (signed 128-bit) — acc < 2^64 times a
#: 20-bit multiplier stays < 2^84, while the engine's 64-bit POLY_P would
#: overflow the oracle's intermediate product.
MD5_POLY_P = U64(1000003)


def md5_lower64(values: "list[str] | np.ndarray", cache: dict | None = None) -> np.ndarray:
    """Per-string 64-bit md5 hashes with DuckDB parity:
    ``md5_number_lower(s)`` == bytes [8:16] of the md5 digest, little-endian.

    Hashes each UNIQUE string once (md5 is the irreducible per-string cost);
    an optional caller-held ``cache`` persists hashes across batches.
    """
    uniq, inv = np.unique(np.asarray(values, dtype=object), return_inverse=True)
    uh = np.empty(len(uniq), dtype=U64)
    _md5 = hashlib.md5
    if cache is None:
        for i, s in enumerate(uniq):
            uh[i] = int.from_bytes(_md5(s.encode("utf-8")).digest()[8:], "little")
    else:
        for i, s in enumerate(uniq):
            v = cache.get(s)
            if v is None:
                v = int.from_bytes(_md5(s.encode("utf-8")).digest()[8:], "little")
                cache[s] = v
            uh[i] = v
    return uh[inv]


def md5_poly_fingerprints(texts: list[str | None]) -> np.ndarray:
    """Per-text order-sensitive fingerprint: fold
    ``acc = acc * MD5_POLY_P + md5_lower64(token)`` (mod 2^64) over the
    whitespace tokens, empty text → 0. Batch-vectorized: one md5 pass over
    unique tokens, then one segment-sum (fp = Σ th[i]·P^(n-1-i) expressed as
    cumsum diffs — uint64 wraparound IS the mod)."""
    toks_per_doc = [(t or "").split() for t in texts]
    lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
    total = int(lens.sum())
    out = np.zeros(len(texts), dtype=U64)
    if total == 0:
        return out
    flat: list[str] = []
    for toks in toks_per_doc:
        flat.extend(toks)
    th = md5_lower64(flat)
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent of each token = (its doc's end - 1 - global index)
    k = np.repeat(ends - 1, lens) - np.arange(total, dtype=np.int64)
    pows = geom_pows(MD5_POLY_P, int(lens.max()))
    with np.errstate(over="ignore"):
        vals = th * pows[k]
        csum = np.zeros(total + 1, dtype=U64)
        np.cumsum(vals, out=csum[1:], dtype=U64)
        nz = lens > 0
        out[nz] = csum[ends[nz]] - csum[starts[nz]]
    return out


#: modulus for the md5-parity MinHash twin permutations: prime 2^31 - 1.
#: SMALL on purpose — A*(h mod M) + B stays under 2^62, so BOTH numpy uint64
#: and DuckDB UBIGINT evaluate the affine map without 128-bit intermediates.
MD5_MINHASH_M = 2147483647


def md5_affine_minhash(
    texts: "list[str | None]", k: int, ab: "list[tuple[int, int]]"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-text MinHash signatures with DuckDB-replicable hashing: shingle
    base hash = ``md5_lower64`` of the space-joined word-``k``-gram (DISTINCT
    set, whitespace tokens), permutation ``j`` value =
    ``(A_j * (h % M) + B_j) % M`` with ``M = MD5_MINHASH_M`` and fixed
    ``(A_j, B_j)`` pairs, signature = per-permutation minimum.

    Returns ``(has_sig: bool[n], sig: uint64[n, len(ab)])`` — texts with
    fewer than ``k`` tokens have no shingles and ``has_sig`` False.
    """
    n = len(texts)
    P = len(ab)
    M = np.uint64(MD5_MINHASH_M)
    A = np.array([a for a, _ in ab], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in ab], dtype=np.uint64)[:, None]
    sig = np.zeros((n, P), dtype=np.uint64)
    has = np.zeros(n, dtype=bool)
    cache: dict = {}
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if len(toks) < k:
            continue
        sh = list({" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)})
        h = md5_lower64(sh, cache) % M
        sig[i] = ((A * h[None, :] + B) % M).min(axis=1)
        has[i] = True
    return has, sig


def md5_twin_signatures(
    texts: "list[str | None]", k: int, ab: "list[tuple[int, int]]"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused md5-parity twin signatures: ONE distinct-shingle md5 pass per
    text feeds BOTH the affine MinHash signature (``md5_affine_minhash``
    semantics) and the majority-vote SimHash (``md5_shingle_simhash``
    semantics). The flagship oracle twin runs every method over one corpus
    scan, so the dominant per-doc cost — md5 over the distinct word-k-gram
    set — is paid once, not once per method.

    Returns ``(has_sig: bool[n], minsig: uint64[n, len(ab)],
    simhash: uint64[n])``; texts with fewer than ``k`` tokens have
    ``has_sig`` False and simhash 0 (empty vote set — such docs still pair
    with each other at Hamming 0, matching the SQL's COALESCE(…, 0))."""
    n = len(texts)
    P = len(ab)
    M = np.uint64(MD5_MINHASH_M)
    A = np.array([a for a, _ in ab], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in ab], dtype=np.uint64)[:, None]
    minsig = np.zeros((n, P), dtype=U64)
    has = np.zeros(n, dtype=bool)
    sim = np.zeros(n, dtype=U64)
    bit_idx = np.arange(64, dtype=U64)
    bit_vals = U64(1) << bit_idx
    cache: dict = {}
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if len(toks) < k:
            continue
        sh = list({" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)})
        hs = md5_lower64(sh, cache)
        hm = hs % M
        minsig[i] = ((A * hm[None, :] + B) % M).min(axis=1)
        has[i] = True
        ones = ((hs[:, None] >> bit_idx) & U64(1)).sum(axis=0)
        sim[i] = bit_vals[2 * ones > len(hs)].sum()
    return has, minsig, sim


def md5_shingle_simhash(texts: list[str | None], k: int) -> np.ndarray:
    """Per-text 64-bit SimHash over the DISTINCT word-``k``-gram set, shingle
    hash = md5_lower64 of the space-joined shingle (DuckDB-replicable). Bit b
    set iff a strict majority of the shingle set has bit b; < k tokens → 0
    (empty set, no bits)."""
    n = len(texts)
    out = np.zeros(n, dtype=U64)
    bit_vals = U64(1) << np.arange(64, dtype=U64)
    cache: dict = {}
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if len(toks) < k:
            continue
        sh = list({" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)})
        hs = md5_lower64(sh, cache)
        ones = ((hs[:, None] >> np.arange(64, dtype=U64)) & U64(1)).sum(axis=0)
        out[i] = bit_vals[2 * ones > len(hs)].sum()
    return out
