"""Hash-kernel units: determinism and correctness of the vectorized paths."""

import numpy as np

from camden_ray.functions.hashing import (
    POLY_P,
    TokenHasher,
    band_hashes,
    digest_column_u64,
    minhash_params,
    mix64,
    rolling_lgram_hashes,
    shingle_hashes,
)


def test_rolling_lgram_matches_bruteforce():
    rng = np.random.default_rng(7)
    th = rng.integers(0, 1 << 63, size=311, dtype=np.uint64)
    L = 13
    fast = rolling_lgram_hashes(th, L)
    slow = np.zeros(len(th) - L + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(len(slow)):
            acc = np.uint64(0)
            for j in range(L):
                acc = acc * POLY_P + th[i + j]
            slow[i] = acc
    assert np.array_equal(fast, mix64(slow))


def test_shingle_hashes_window_identity():
    th = np.arange(20, dtype=np.uint64)
    k = 5
    sh = shingle_hashes(th, k)
    assert len(sh) == 16
    # identical windows hash identically regardless of position
    th2 = np.concatenate([th[5:10], th[5:10]])
    sh2 = shingle_hashes(th2, k)
    assert sh2[0] == sh2[5] == sh[5]


def test_digest_matches_across_str_and_bytes():
    d = digest_column_u64(["abc", b"abc", None, ""])
    assert d[0] == d[1]
    assert d[2] == 0
    assert d[3] != 0  # empty string still digests


def test_token_hasher_deterministic_across_instances():
    a = TokenHasher(seed=42).hash_tokens(["foo", "bar", "foo"])
    b = TokenHasher(seed=42).hash_tokens(["foo", "bar", "foo"])
    c = TokenHasher(seed=43).hash_tokens(["foo", "bar", "foo"])
    assert np.array_equal(a, b)
    assert a[0] == a[2]
    assert not np.array_equal(a, c)


def test_minhash_params_seeded():
    a1, b1 = minhash_params(128, 42)
    a2, b2 = minhash_params(128, 42)
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2)
    assert np.all(a1 % 2 == 1)  # odd multipliers


def test_band_hashes_collide_iff_rows_match():
    rng = np.random.default_rng(3)
    sig = rng.integers(0, 1 << 63, size=(2, 128), dtype=np.uint64)
    sig[1] = sig[0]
    sig[1, 8] += 1  # corrupt one component in band 1 (r=8)
    bh = band_hashes(sig, 16)
    assert bh[0, 0] == bh[1, 0]
    assert bh[0, 1] != bh[1, 1]
    assert np.array_equal(bh[0, 2:], bh[1, 2:])


def test_batch_winnowed_lgrams_matches_per_doc():
    """Batch-flat vectorized path must be value-identical to the per-doc
    winnow(rolling_lgram_hashes) composition, including edge cases."""
    import numpy as np

    from camden_ray.functions.hashing import (
        TokenHasher,
        batch_winnowed_lgrams,
        rolling_lgram_hashes,
        winnow,
    )

    L, w = 7, 4
    rng = np.random.default_rng(3)
    h = TokenHasher(seed=1)
    docs = [
        [],                                  # empty
        ["a"],                               # < L tokens
        ["b"] * L,                           # exactly L -> one gram
        ["c"] * (L + w - 1),                 # w grams (small-winnow boundary)
        ["d"] * (L + w),                     # w+1 grams (big-winnow boundary)
        [f"t{i}" for i in rng.integers(0, 50, size=200)],
        [f"t{i}" for i in rng.integers(0, 9, size=300)],  # repetitive
        [],                                  # empty in the middle matters
        [f"u{i}" for i in range(40)],
    ]
    th_lists = [h.hash_tokens(d) for d in docs]
    lens = np.array([len(t) for t in th_lists], dtype=np.int64)
    off = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    th_flat = np.concatenate(th_lists)

    V, counts = batch_winnowed_lgrams(th_flat, lens, off, L, w)
    want = []
    for th in th_lists:
        g = rolling_lgram_hashes(th, L)
        if len(g):
            g = winnow(g, w)
        want.append(g)
    assert np.array_equal(counts, np.array([len(x) for x in want]))
    assert np.array_equal(V, np.concatenate(want))


def test_batch_token_hasher_matches_reference():
    """BatchTokenHasher.hash_array must be value-identical to
    TokenHasher.hash_tokens(tokenize(text)) per doc — ASCII fast path,
    non-ASCII fallback, nulls, empties, doc-boundary word adjacency."""
    import pyarrow as pa

    from camden_ray.functions.hashing import BatchTokenHasher, TokenHasher
    from camden_ray.functions.text import tokenize

    docs = [
        "Hello, World_1 and FOO-bar!",
        "",                      # empty
        None,                    # null
        "wordend",               # ends with word char (boundary merge trap)
        "startsword and more",   # starts with word char right after
        "punct only !!! ...",
        "Ünïcode tökens häßlich",         # non-ASCII -> fallback
        "mixed ascii then café au lait",  # non-ASCII -> fallback
        "UPPER lower 123_abc",
        "日本語のテキスト",       # CJK -> fallback
        "a",                     # single char
        "trailing space ",
    ]
    arr = pa.array(docs, type=pa.string())
    got_flat, got_lens = BatchTokenHasher(seed=7).hash_array(arr)
    ref = TokenHasher(seed=7)
    want = [ref.hash_tokens(tokenize(d) if d else []) for d in docs]
    want_lens = np.array([len(w) for w in want], dtype=np.int64)
    assert got_lens.tolist() == want_lens.tolist()
    want_flat = (
        np.concatenate(want) if want else np.empty(0, dtype=np.uint64)
    )
    assert np.array_equal(got_flat, want_flat)


def test_batch_token_hasher_all_ascii_and_sliced_array():
    """Pure-ASCII batch (the zero-Python path) and an offset/sliced Arrow
    array must both match the reference."""
    import pyarrow as pa

    from camden_ray.functions.hashing import BatchTokenHasher, TokenHasher
    from camden_ray.functions.text import tokenize

    rng = np.random.default_rng(3)
    docs = [
        " ".join(f"w{int(x)}" for x in rng.integers(0, 300, size=50))
        for _ in range(40)
    ]
    arr = pa.array(docs, type=pa.string()).slice(7, 25)  # nonzero offset
    got_flat, got_lens = BatchTokenHasher(seed=42).hash_array(arr)
    ref = TokenHasher(seed=42)
    want = [ref.hash_tokens(tokenize(d)) for d in docs[7:32]]
    assert got_lens.tolist() == [len(w) for w in want]
    assert np.array_equal(got_flat, np.concatenate(want))


def test_digest_string_array_matches_list_path():
    import pyarrow as pa

    from camden_ray.functions.hashing import (
        digest_column_u64,
        digest_string_array_u64,
    )

    docs = ["hello", "", None, "Ünïcode", "x" * 1000]
    got = digest_string_array_u64(pa.array(docs, type=pa.string()), seed=9)
    want = digest_column_u64(docs, seed=9)
    assert np.array_equal(got, want)


def test_flat_rolling_grams_equals_per_doc():
    from camden_ray.functions.hashing import (
        flat_rolling_grams,
        rolling_lgram_hashes,
        seg_positions,
    )

    rng = np.random.default_rng(5)
    lens = [0, 3, 12, 50, 7]
    docs = [rng.integers(0, 1 << 63, size=l, dtype=np.uint64) for l in lens]
    flat = np.concatenate([d for d in docs if len(d)])
    off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    L = 5
    g_all = flat_rolling_grams(flat, L)
    gm = np.maximum(np.array(lens) - L + 1, 0)
    has = gm > 0
    got = g_all[seg_positions(off[:-1][has], gm[has])]
    want = np.concatenate(
        [rolling_lgram_hashes(d, L) for d in docs if len(d) >= L]
    )
    assert np.array_equal(got, want)


def test_md5_twin_signatures_equals_separate_kernels():
    """The fused flagship kernel must be bit-identical to the two
    single-method twins it replaces (same shingle set, same md5 base
    hash, same affine map / majority vote)."""
    from camden_ray.functions.hashing import (
        md5_affine_minhash,
        md5_shingle_simhash,
        md5_twin_signatures,
    )

    ab = [(1852099020, 2037822335), (892695477, 282947329),
          (61098809, 1324107815), (838085128, 813788856)]
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "",
        None,
        "one two three four",          # exactly k-1 tokens at k=5
        "one two three four five",     # exactly k tokens
        "Ünïcode tökens für äll däs texte here now ok",
        " ".join(["rep"] * 40),        # degenerate single-shingle text
    ]
    k = 5
    has_a, minsig_a = md5_affine_minhash(texts, k, ab)
    sim_a = md5_shingle_simhash(texts, k)
    has_f, minsig_f, sim_f = md5_twin_signatures(texts, k, ab)
    assert np.array_equal(has_a, has_f)
    assert np.array_equal(minsig_a, minsig_f)
    assert np.array_equal(sim_a, sim_f)
