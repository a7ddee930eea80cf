"""Driver-contract query library: one callable per operator (SURVEY.md §2),
each over the driver tables in ``sf_dir``, paired (where SQL-expressible)
with a DuckDB oracle in ``ORACLE_SQL``.

Naming contract: every computed column is named identically in the Ray code
and the oracle SQL (the driver sorts columns by name and hashes values).
Float aggregates are emitted as bigint fixed-point (``round(x * 100)``) on
BOTH sides so value-hashes can match exactly.

None of these call ray.init() — the driver owns the session.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from camden_ray.config import DedupConfig
from camden_ray.functions.text import detect_lang, quality_features


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(_t(sf_dir, name), columns=columns)


def _cents(arr, scale: int = 100):
    """double → fixed-point bigint, DuckDB-compatible rounding (half away
    from zero, vs pyarrow's default half-to-even)."""
    return pc.cast(
        pc.round(pc.multiply(arr, scale), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def _fp_round(v: np.ndarray, scale: int = 100_000) -> np.ndarray:
    """double → fixed-point int64 with DuckDB's rounding (half AWAY from
    zero; numpy's round is half-to-even, which mismatches oracles on
    boundary values — same reason common.cents() pins the round mode)."""
    v = v * scale
    return np.trunc(v + np.copysign(0.5, v)).astype(np.int64)


def _cos_fp_f32seq(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise cosine of A[i] vs B[i] replicating DuckDB's
    ``list_cosine_similarity`` on FLOAT lists bit-for-bit: SEQUENTIAL
    float32 accumulation of dot and norms, cos = dot/(sqrt(na)·sqrt(nb)),
    then the shared 1e-5 half-away-from-zero fixed point. Vectorized across
    rows (one float32 add per dimension — identical rounding sequence to a
    scalar loop), so it's used on matmul-prefiltered survivors only.
    """
    A = np.ascontiguousarray(A, dtype=np.float32)
    B = np.ascontiguousarray(B, dtype=np.float32)
    n, d = A.shape
    dot = np.zeros(n, dtype=np.float32)
    na = np.zeros(n, dtype=np.float32)
    nb = np.zeros(n, dtype=np.float32)
    for k in range(d):
        dot += A[:, k] * B[:, k]
        na += A[:, k] * A[:, k]
        nb += B[:, k] * B[:, k]
    denom = np.sqrt(na) * np.sqrt(nb)
    denom[denom == 0] = np.float32(1.0)
    # the ×1e5 multiply ALSO stays float32 (DuckDB: FLOAT * INT → FLOAT)
    # before the half-away-from-zero round — this decides .5 boundaries
    v = ((dot / denom) * np.float32(100000.0)).astype(np.float64)
    return np.trunc(v + np.copysign(0.5, v)).astype(np.int64)


# f64-matmul prefilter slack around a fixed-point threshold: covers the
# float32-vs-float64 cosine gap (~1e-6 ≪ 10 fp units) with a wide margin
_COS_PREFILTER_SLACK = 50


def _emb_matrix(col, dtype=np.float64) -> np.ndarray:
    """(fixed-size-)list<float> column → (n, d) numpy matrix via one
    ``list_flatten`` over the Arrow value buffer — no per-row Python lists
    (``to_pylist`` materializes n·d PyFloats and was the dominant
    non-matmul cost of every ANN kernel)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.reshape(n, len(flat) // n).astype(dtype, copy=False)


def _md5_col(t: pa.Table, col: str, out: str = "digest") -> pa.Table:
    vals = t[col].to_pylist()
    digs = [hashlib.md5((v or "").encode()).hexdigest() for v in vals]
    return t.append_column(out, pa.array(digs, type=pa.string()))


# ---------------------------------------------------------------------------
# camden-invariant queries (digest → group → having/aggregate) over documents
# ---------------------------------------------------------------------------


def exact_dup_groups(sf_dir: str):
    """Digest groups with >= 2 members (G1+G2: scanner.rs:17-49, reporting.rs:33)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(lambda t: _md5_col(t, "text"), batch_format="pyarrow")
    agg = ds.groupby("digest").aggregate(
        Count(alias_name="cnt"), Min("doc_id", alias_name="rep")
    )
    # return the (dup-group-sized) Dataset and let the harness collect — no
    # in-operator to_pandas.  materialize() holds the result distributed in
    # the object store (never driver-resident) and makes the empty check a
    # metadata read; the typed-empty Arrow fallback exists because Ray's
    # to_pandas() on a 0-row Dataset drops the column schema entirely.
    out = agg.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], 1)), batch_format="pyarrow"
    ).materialize()
    if out.count() == 0:
        return pa.table(
            {"digest": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64()),
             "rep": pa.array([], pa.int64())}
        )
    return out


def digest_group_sizes(sf_dir: str):
    """Full digest histogram incl. singletons (camden keeps them in the map)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(lambda t: _md5_col(t, "text"), batch_format="pyarrow")
    return ds.groupby("digest").aggregate(Count(alias_name="cnt"))


def dup_count(sf_dir: str):
    """Σ(group_size − 1): the MoveStats analogue (operations.rs:66-72)."""
    sizes = digest_group_sizes(sf_dir)
    out = sizes.map_batches(
        lambda t: pa.table(
            {"excess": pc.subtract(t["cnt"], 1)}
        ),
        batch_format="pyarrow",
    ).sum("excess")
    return pd.DataFrame({"dup_count": [int(out or 0)]})


def lang_filter_count(sf_dir: str):
    """Allow-list predicate analogue of the extension filter (scanner.rs:71-79)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["lang"], value_set=pa.array(["en", "de"]))),
        batch_format="pyarrow",
    )
    return ds.groupby("lang").aggregate(Count(alias_name="cnt"))


def source_counts(sf_dir: str):
    return _read(sf_dir, "documents", columns=["source"]).groupby("source").aggregate(
        Count(alias_name="cnt")
    )


_SOURCE_CAP_K = 5

# hash-threshold Bernoulli sampling cutoff: keep iff md5(doc_id) < 0.3·2^128.
# As a 32-hex-digit string it is ALSO the DuckDB oracle's cutoff (comparing
# md5 hexdigests lexicographically == comparing the 128-bit digests).
_BERNOULLI_RATE = 0.3
_BERNOULLI_CUTOFF_HEX = format(int(_BERNOULLI_RATE * (1 << 128)), "032x")


def doc_bernoulli_sample(sf_dir: str):
    """Deterministic Bernoulli downsampling — keep each document iff
    ``md5(doc_id) < rate·2^128``. The standard corpus-downsampling primitive:
    map-only (NO shuffle, no state, no RNG), every run and every cluster
    size selects the identical subset, and composing pipelines can re-derive
    membership from the key alone."""
    cutoff = _BERNOULLI_CUTOFF_HEX

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        md5 = hashlib.md5
        keep = np.fromiter(
            (md5(str(d).encode()).hexdigest() < cutoff for d in ids.tolist()),
            dtype=bool,
            count=len(ids),
        )
        return batch.filter(pa.array(keep))

    return _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        f, batch_format="pyarrow"
    )


def _source_topk_batch(batch: pa.Table, k: int) -> pa.Table:
    """Block-local per-source top-k by (md5(doc_id) hex order, doc_id) —
    the combiner half of :func:`source_cap_sample`. Rank = the md5 digest
    split into two big-endian u64 halves, so (hi, lo) ordering equals
    DuckDB's hex-string ordering of ``md5(CAST(doc_id AS VARCHAR))``."""
    n = batch.num_rows
    if n == 0:
        return batch.select(["source", "doc_id"]).append_column(
            "rhi", pa.array([], type=pa.uint64())
        ).append_column("rlo", pa.array([], type=pa.uint64()))
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    md5 = hashlib.md5
    hi = np.empty(n, dtype=np.uint64)
    lo = np.empty(n, dtype=np.uint64)
    for i, d in enumerate(doc_id.tolist()):
        dg = md5(str(d).encode()).digest()
        hi[i] = int.from_bytes(dg[:8], "big")
        lo[i] = int.from_bytes(dg[8:], "big")
    src = batch.column("source")
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    codes = src.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    order = np.lexsort((doc_id, lo, hi, codes))
    sc = codes[order]
    # rank within each source run (sc is grouped after the sort)
    starts = np.empty(n, dtype=bool)
    starts[0] = True
    np.not_equal(sc[1:], sc[:-1], out=starts[1:])
    run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
    rank = np.arange(n) - run_start
    keep = order[rank < k]
    return pa.table(
        {
            "source": src.take(pa.array(keep)),
            "doc_id": pa.array(doc_id[keep]),
            "rhi": pa.array(hi[keep], type=pa.uint64()),
            "rlo": pa.array(lo[keep], type=pa.uint64()),
        }
    )


def source_cap_sample(sf_dir: str):
    """Per-source quota sampling — the web-pipeline "cap documents per
    domain" stage (hot domains otherwise dominate a crawl corpus): keep at
    most K documents per source, chosen deterministically by md5(doc_id)
    hash order (a seedless uniform random sample that every run and every
    cluster size agrees on).

    Scale shape: a block-local per-source top-k combiner inside
    ``map_batches`` first (so the groupby shuffle moves at most K rows per
    (source, block), not the corpus), then one small per-source reduce.
    """
    k = _SOURCE_CAP_K
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    partial = ds.map_batches(
        lambda b: _source_topk_batch(b, k), batch_format="pyarrow"
    )

    def final_topk(g: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                g.column("doc_id").to_numpy(zero_copy_only=False),
                g.column("rlo").to_numpy(zero_copy_only=False),
                g.column("rhi").to_numpy(zero_copy_only=False),
            )
        )[:k]
        kept = g.take(pa.array(np.sort(order)))
        return kept.select(["source", "doc_id"])

    return partial.groupby("source").map_groups(final_topk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def doc_token_counts(sf_dir: str):
    """Whitespace token counts, vectorized per batch.

    ``count_substring_regex(text, '\\S+')`` counts non-whitespace runs — the
    exact cardinality of a whitespace split — in one RE2 kernel pass (the SAME
    regex engine DuckDB uses for the oracle's ``string_split_regex``, so the
    whitespace class matches bit-for-bit; Python's unicode ``str.split`` did
    not guarantee that)."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(t["text"], pattern=r"\S+")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pc.fill_null(n, 0).cast(pa.int64()),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# BPE-ish pretokenizer (GPT-2 family, made lookahead-free so it runs on
# RE2 — the engine BOTH Arrow and DuckDB use, which is what makes the
# oracle hash-exact; RE2 has no (?!...) so the trailing-space lookahead of
# the original pattern is dropped): contraction suffixes, space-prefixed
# letter runs, space-prefixed digit runs, space-prefixed punctuation runs,
# whitespace runs.
_BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def doc_bpe_token_counts(sf_dir: str):
    """Subword-budget token counts — the BPE-ish pretokenizer cardinality
    (GPT-2-family pretokenization, lookahead-free RE2 variant) next to the
    whitespace count: the number every training-data budget is denominated
    in is TOKENIZER tokens, not whitespace words, and the pretokenizer
    match count is the standard cheap proxy (each pretoken maps to >= 1 BPE
    token). Map-only, one RE2 kernel pass per batch
    (``count_substring_regex``); hash-exact DuckDB oracle via the SAME
    regex on the SAME engine (both Arrow and DuckDB embed RE2, default
    leftmost-first alternation)."""

    def f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pattern=_BPE_PRETOKEN_RE)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_pretokens": pc.fill_null(n, 0).cast(pa.int64()),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def source_token_budget(sf_dir: str):
    """Per-source token budget — the table a corpus owner reads before
    setting mixture weights: document count, whitespace-token total and
    BPE-pretoken total per source. One map-only pass (two RE2 kernel
    counts per batch) reduced to a source-sized groupby; the per-block
    partial is (sources × 3) no matter the corpus size."""

    def part(t: pa.Table) -> pa.Table:
        ws = pc.fill_null(
            pc.count_substring_regex(t["text"], pattern=r"\S+"), 0
        ).cast(pa.int64())
        bpe = pc.fill_null(
            pc.count_substring_regex(t["text"], pattern=_BPE_PRETOKEN_RE), 0
        ).cast(pa.int64())
        return pa.table(
            {"source": t["source"], "ws": ws, "bpe": bpe}
        )

    return (
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("ws", alias_name="ws_tokens"),
            Sum("bpe", alias_name="bpe_pretokens"),
        )
    )


_TOP_BIGRAMS_K = 20


def _batch_ngrams(col, n: int) -> tuple[pa.Array, np.ndarray]:
    """Text column → (word n-gram strings, per-gram row index) for one batch,
    fully vectorized (no per-row Python). Tokenization is RE2 ``\\s+``
    splitting — Arrow and DuckDB share the RE2 engine, so the whitespace
    class matches the oracles' ``regexp_extract_all('\\S+')`` bit-for-bit;
    doc-edge empty tokens are dropped without merging tokens across
    documents. Returns an empty string array + empty seg when no document
    has ≥ n tokens."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(pc.fill_null(col, ""), pattern=r"\s+")
    flat = toks.flatten()
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0]
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # per-doc non-empty token counts (empties appear only at doc edges,
    # so dropping them never merges adjacent documents' tokens)
    kept_before = np.zeros(len(nonempty) + 1, dtype=np.int64)
    np.cumsum(nonempty, out=kept_before[1:])
    counts = kept_before[offs[1:]] - kept_before[offs[:-1]]
    kept_idx = np.flatnonzero(nonempty)
    tok_arr = flat.take(pa.array(kept_idx))
    # n-gram start positions within each doc's kept-token run
    m = np.maximum(counts - (n - 1), 0)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    from camden_ray.functions.hashing import seg_positions

    has = m > 0
    first = seg_positions(starts[has], m[has])
    seg = np.repeat(np.flatnonzero(has), m[has])
    if not len(first):
        return pa.array([], type=pa.string()), seg
    parts = [tok_arr.take(pa.array(first + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return grams, seg


def doc_top_bigrams(sf_dir: str):
    """Corpus-level top-K most frequent word bigrams — the n-gram corpus
    statistic behind boilerplate screens and contamination checks.

    Scale shape: bigram extraction + per-block partial counts inside
    ``map_batches`` (one Arrow ``value_counts`` per block — the combiner),
    ONE ``groupby(gram).sum`` over the partial counts (gram-vocabulary-sized,
    ≪ corpus), then a block-local top-K over the SUMMED table and a tiny
    (blocks × K)-row driver merge.  The block top-K is exact, not a sketch:
    after the groupby each gram appears in exactly ONE block with its final
    global count, and the comparator (cnt desc, gram asc) is the same at
    block and global level, so any global top-K gram is necessarily inside
    its own block's top-K — the union is a guaranteed superset and the
    vocabulary never lands on the driver.  Tokenization is RE2 ``\\s+``
    splitting (Arrow and DuckDB share the RE2 engine, so the whitespace
    class matches the oracle's ``regexp_extract_all('\\S+')`` bit-for-bit;
    doc-edge empty tokens are dropped without merging tokens across
    documents)."""

    def partial(t: pa.Table) -> pa.Table:
        grams, _ = _batch_ngrams(t.column("text"), 2)
        if not len(grams):
            return pa.table(
                {"gram": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        vc = grams.value_counts()
        return pa.table(
            {"gram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    def block_topk(t: pa.Table) -> pa.Table:
        if "gram" not in t.column_names:  # schema-less empty block
            return pa.table(
                {"gram": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        if t.num_rows <= _TOP_BIGRAMS_K:
            return t.select(["gram", "cnt"])
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("gram", "ascending")]
        )
        return t.take(idx.slice(0, _TOP_BIGRAMS_K)).select(["gram", "cnt"])

    cand = (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(block_topk, batch_format="pyarrow")
    )
    # (blocks × K)-row union → final exact top-K (deterministic tie-break)
    merged = pa.Table.from_pylist(
        cand.take_all(), schema=pa.schema([("gram", pa.string()), ("cnt", pa.int64())])
    )
    idx = pc.sort_indices(
        merged, sort_keys=[("cnt", "descending"), ("gram", "ascending")]
    )
    return merged.take(idx.slice(0, _TOP_BIGRAMS_K))


# Decontamination: benchmark holdout = docs with md5(doc_id) below this
# cutoff (~5% of the corpus — standing in for an eval/benchmark set, which
# is small by definition). Contamination n-gram size 4.
_DECON_N = 4
_DECON_CUTOFF_HEX = format(int(0.05 * (1 << 128)), "032x")


def _md5_below(ids, cutoff_hex: str) -> np.ndarray:
    """Boolean mask: md5(str(id)) hexdigest < cutoff (the engine's
    deterministic hash-bucket membership; hexdigest string compare ==
    128-bit digest compare)."""
    md5 = hashlib.md5
    return np.fromiter(
        (md5(str(d).encode()).hexdigest() < cutoff_hex for d in ids),
        dtype=bool,
        count=len(ids),
    )


# Deterministic corpus split fractions: 80 / 10 / 10 by md5(doc_id) hash
# bucket — reproducible across runs, machines, and re-partitions, and
# disjoint from the Bernoulli/decontamination cutoffs by construction.
_SPLIT_TRAIN_HEX = format(int(0.80 * (1 << 128)), "032x")
_SPLIT_VAL_HEX = format(int(0.90 * (1 << 128)), "032x")


def doc_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment — the canonical
    corpus-prep step: membership is a pure function of md5(doc_id) so the
    split is stable under re-runs, re-sharding and incremental appends
    (new docs land in splits at the same fractions without touching old
    assignments). Map-only, zero-shuffle; hash-exact DuckDB oracle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def assign(t: pa.Table) -> pa.Table:
        ids = [str(d) for d in t["doc_id"].to_pylist()]
        train = _md5_below(ids, _SPLIT_TRAIN_HEX)
        val = _md5_below(ids, _SPLIT_VAL_HEX) & ~train
        split = np.where(train, "train", np.where(val, "val", "test"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "split": pa.array(split, type=pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def doc_decontaminate(sf_dir: str):
    """Benchmark decontamination — the training-data hygiene stage that flags
    corpus documents sharing any word 4-gram with a benchmark/eval holdout
    (Brown et al. 2020 §4 style n-gram overlap). Output: every non-benchmark
    document with its count of DISTINCT 4-grams that also occur in the
    benchmark set (0 = clean).

    Scale shape: the benchmark side is small by definition — its distinct
    gram hashes are reduced per-block in ``map_batches``, unioned on the
    driver, and broadcast ONCE via ``ray.put`` (a sorted uint64 array read
    zero-copy by every scoring task; never re-shipped per batch). The corpus
    side is a single map-only pass: vectorized n-gram extraction, per-doc
    dedup via one lexsort, membership via ``searchsorted`` into the
    broadcast array. Grams compare by 64-bit hash — a collision needs
    ~2^32 distinct grams (birthday bound) and could only overcount by 1;
    exact-string parity is verified against the DuckDB oracle at test scale.
    """
    from camden_ray.functions.hashing import hash_string_column

    cutoff = _DECON_CUTOFF_HEX
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(_md5_below(ids.tolist(), cutoff)))
        grams, _ = _batch_ngrams(sub.column("text"), _DECON_N)
        gh = np.unique(hash_string_column(grams)) if len(grams) else np.empty(
            0, dtype=np.uint64
        )
        return pa.table({"gh": pa.array(gh, type=pa.uint64())})

    parts = [
        b["gh"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(bench_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    bench_gh = np.unique(np.concatenate(parts)) if parts else np.empty(
        0, dtype=np.uint64
    )
    bench_ref = ray.put(bench_gh)

    def score(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # zero-copy plasma read, once per task
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(~_md5_below(ids.tolist(), cutoff)))
        n = sub.num_rows
        grams, seg = _batch_ngrams(sub.column("text"), _DECON_N)
        overlap = np.zeros(n, dtype=np.int64)
        if len(grams) and len(bench):
            gh = hash_string_column(grams)
            # per-doc distinct grams: one lexsort + neighbor-dedup mask
            order = np.lexsort((gh, seg))
            ss, gs = seg[order], gh[order]
            keep = np.empty(len(order), dtype=bool)
            keep[0] = True
            keep[1:] = (ss[1:] != ss[:-1]) | (gs[1:] != gs[:-1])
            ss, gs = ss[keep], gs[keep]
            pos = np.searchsorted(bench, gs).clip(max=len(bench) - 1)
            member = bench[pos] == gs
            overlap = np.bincount(ss[member], minlength=n).astype(np.int64)
        return pa.table(
            {"doc_id": sub["doc_id"], "n_overlap": pa.array(overlap, pa.int64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")


def doc_decontaminate_spans(sf_dir: str):
    """Span-granular decontamination: where :func:`doc_decontaminate` FLAGS
    documents overlapping the benchmark split, this emits the overlap
    LOCATIONS — one row per (doc_id, 1-based gram start position) whose
    4-gram also occurs in the benchmark set — so a training pipeline can
    surgically remove the contaminated spans (each hit marks tokens
    [pos, pos+3]) instead of dropping whole documents. Same scale shape:
    benchmark gram hashes reduced per-block → one ``ray.put`` broadcast;
    corpus side map-only. Full DuckDB oracle (exact string-gram join twin).
    """
    from camden_ray.functions.hashing import hash_string_column

    cutoff = _DECON_CUTOFF_HEX
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(_md5_below(ids.tolist(), cutoff)))
        grams, _ = _batch_ngrams(sub.column("text"), _DECON_N)
        gh = np.unique(hash_string_column(grams)) if len(grams) else np.empty(
            0, dtype=np.uint64
        )
        return pa.table({"gh": pa.array(gh, type=pa.uint64())})

    parts = [
        b["gh"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(bench_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    bench_gh = np.unique(np.concatenate(parts)) if parts else np.empty(
        0, dtype=np.uint64
    )
    bench_ref = ray.put(bench_gh)

    def hits(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(~_md5_below(ids.tolist(), cutoff)))
        grams, seg = _batch_ngrams(sub.column("text"), _DECON_N)
        empty = pa.table(
            {"doc_id": pa.array([], type=sub["doc_id"].type),
             "pos": pa.array([], type=pa.int64())}
        )
        if not len(grams) or not len(bench):
            return empty
        # gram start position within its doc: grams are emitted doc-by-doc
        # in order, so position = index − its segment's first index
        starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
        runs = np.diff(np.r_[starts, len(seg)])
        pos = np.arange(len(seg), dtype=np.int64) - np.repeat(starts, runs)
        gh = hash_string_column(grams)
        p = np.searchsorted(bench, gh).clip(max=len(bench) - 1)
        member = bench[p] == gh
        if not member.any():
            return empty
        doc_ids = sub["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        return pa.table(
            {
                "doc_id": doc_ids.take(pa.array(seg[member])),
                "pos": pa.array(pos[member] + 1, type=pa.int64()),  # 1-based
            }
        )

    return ds.map_batches(hits, batch_format="pyarrow")


_PHRASE_QUERY = "row column sort"


def doc_phrase_search(sf_dir: str, phrase: str | None = None):
    """Distributed exact phrase search — grep over the corpus, emitting one
    row per (doc_id, 1-based token position) where the query phrase's token
    sequence occurs. Map-only (no shuffle, no index build): vectorized
    n-gram extraction per batch + one Arrow equality kernel; the shape a
    100 TB corpus scan wants when the phrase list is small. Full DuckDB
    oracle (string-gram position twin, the doc_decontaminate_spans CTE with
    a constant gram)."""
    phrase = _PHRASE_QUERY if phrase is None else phrase
    # n-grams are single-space joined; normalize the query's whitespace so
    # a tab/multi-space phrase still matches its token sequence
    phrase = " ".join(phrase.split())
    n = len(phrase.split())
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hits(t: pa.Table) -> pa.Table:
        grams, seg = _batch_ngrams(t["text"], n)
        empty = pa.table(
            {"doc_id": pa.array([], type=t["doc_id"].type),
             "pos": pa.array([], type=pa.int64())}
        )
        if not len(grams):
            return empty
        member = pc.equal(grams, phrase).to_numpy(zero_copy_only=False)
        if not member.any():
            return empty
        starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
        runs = np.diff(np.r_[starts, len(seg)])
        pos = np.arange(len(seg), dtype=np.int64) - np.repeat(starts, runs)
        doc_ids = t["doc_id"]
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        return pa.table(
            {
                "doc_id": doc_ids.take(pa.array(seg[member])),
                "pos": pa.array(pos[member] + 1, type=pa.int64()),
            }
        )

    return ds.map_batches(hits, batch_format="pyarrow")


def source_dup_stats(sf_dir: str):
    """Per-source exact-duplicate profile — the dup-rate breakdown a corpus
    owner reads before deciding which sources to keep (the reference's
    G1/G3 group-and-count generalized to a grouped dimension). Distributed
    shape: one (source, digest) groupby-count (the dedup core), then a
    source-sized groupby; dup_count = Σcnt − #groups needs no custom
    aggregate. Hash-exact DuckDB oracle via the md5 digest twin."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def dig(t: pa.Table) -> pa.Table:
        return _md5_col(t, "text").select(["source", "digest"])

    agg = (
        ds.map_batches(dig, batch_format="pyarrow")
        .groupby(["source", "digest"])
        .aggregate(Count(alias_name="cnt"))
        .groupby("source")
        .aggregate(
            Sum("cnt", alias_name="n_docs"), Count(alias_name="n_distinct")
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_docs" not in t.column_names:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "n_docs": pa.array([], pa.int64()),
                 "n_distinct": pa.array([], pa.int64()),
                 "dup_count": pa.array([], pa.int64()),
                 "dup_rate_fp": pa.array([], pa.int64())}
            )
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        nu = t["n_distinct"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = nd - nu
        rate = _fp_round(
            np.where(nd > 0, dup / np.where(nd > 0, nd, 1), 0.0),
            scale=1_000_000,
        )
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pa.array(nd, pa.int64()),
                "n_distinct": pa.array(nu, pa.int64()),
                "dup_count": pa.array(dup, pa.int64()),
                "dup_rate_fp": pa.array(rate, pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def doc_repetition(sf_dir: str):
    """Per-document repetition quality metrics (the Gopher-rule family,
    Rae et al. 2021 §A1.1): bigram multiset stats — count of the most
    frequent bigram, distinct-bigram count, fraction of bigram occurrences
    taken by the top bigram, and fraction of bigram occurrences belonging
    to any repeated bigram. High values mark boilerplate/spam for
    filtering. Map-only, fully vectorized: per-batch Arrow dictionary
    encoding (exact — no hashes), one lexsort, run-length reduceats."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        n = t.num_rows
        grams, seg = _batch_ngrams(t.column("text"), 2)
        mx = np.zeros(n, dtype=np.int64)
        ndist = np.zeros(n, dtype=np.int64)
        dup = np.zeros(n, dtype=np.int64)
        ntot = np.bincount(seg, minlength=n).astype(np.int64)
        if len(grams):
            codes = grams.dictionary_encode().indices.to_numpy(
                zero_copy_only=False
            )
            order = np.lexsort((codes, seg))
            ss, cs = seg[order], codes[order]
            newrun = np.empty(len(order), dtype=bool)
            newrun[0] = True
            newrun[1:] = (ss[1:] != ss[:-1]) | (cs[1:] != cs[:-1])
            run_starts = np.flatnonzero(newrun)
            rl = np.diff(np.append(run_starts, len(order)))
            rs = ss[run_starts]  # doc of each run; runs grouped by doc
            ndist = np.bincount(rs, minlength=n).astype(np.int64)
            segnew = np.empty(len(rs), dtype=bool)
            segnew[0] = True
            segnew[1:] = rs[1:] != rs[:-1]
            seg_starts = np.flatnonzero(segnew)
            present = rs[seg_starts]
            mx[present] = np.maximum.reduceat(rl, seg_starts)
            dup[present] = np.add.reduceat(np.where(rl > 1, rl, 0), seg_starts)
        denom = np.maximum(ntot, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "max_bigram_cnt": pa.array(mx, pa.int64()),
                "n_distinct_bigrams": pa.array(ndist, pa.int64()),
                "top_bigram_frac_fp": pa.array(
                    _fp_round(mx / denom, scale=1_000_000), pa.int64()
                ),
                "dup_bigram_frac_fp": pa.array(
                    _fp_round(dup / denom, scale=1_000_000), pa.int64()
                ),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def corpus_vocab_stats(sf_dir: str):
    """Corpus vocabulary statistics in one pass: total token occurrences,
    distinct unigram vocabulary, distinct bigram vocabulary, and hapax
    bigrams (frequency 1 — the tail that dominates open-vocab corpora).

    Scale shape: unigram+bigram partial ``value_counts`` per block (the
    combiner), ONE vocabulary-sized ``groupby((kind, tk)).sum``, then
    single-row partial aggregates summed by Ray — the corpus itself is
    never re-shuffled and nothing corpus-sized reaches the driver."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        kinds, tks, cnts = [], [], []
        for kind, n in ((0, 1), (1, 2)):
            grams, _ = _batch_ngrams(t.column("text"), n)
            if not len(grams):
                continue
            vc = grams.value_counts()
            k = len(vc)
            kinds.append(np.full(k, kind, dtype=np.int8))
            tks.append(vc.field("values"))
            cnts.append(vc.field("counts").cast(pa.int64()))
        if not kinds:
            return pa.table(
                {"kind": pa.array([], pa.int8()),
                 "tk": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds), pa.int8()),
                "tk": pa.concat_arrays(
                    [
                        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                        for a in tks
                    ]
                ),
                "cnt": pa.concat_arrays(cnts),
            }
        )

    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "tk"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        uni = kind == 0
        bi = ~uni
        return pa.table(
            {
                "n_tokens": pa.array([int(cnt[uni].sum())], pa.int64()),
                "n_distinct_tokens": pa.array([int(uni.sum())], pa.int64()),
                "n_distinct_bigrams": pa.array([int(bi.sum())], pa.int64()),
                "n_hapax_bigrams": pa.array(
                    [int((bi & (cnt == 1)).sum())], pa.int64()
                ),
            }
        )

    partials = summed.map_batches(finalize, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([partials.sum(axis=0).astype("int64")]).reset_index(
        drop=True
    )


_QUANTILE_PS = (0.10, 0.25, 0.50, 0.75, 0.90, 0.99)


def _quantile_disc(vals: np.ndarray, cum: np.ndarray, q: float) -> int:
    """DuckDB ``quantile_disc`` over a sorted value histogram: the value at
    the smallest k ≥ 1 with k/N ≥ q under IEEE double compare (probed
    around ceil(q·N) to dodge float boundary error). ONE definition for
    every quantile operator — this boundary logic must not fork."""
    import math

    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return 0
    k0 = math.ceil(q * n)
    kstar = next(k for k in range(max(1, k0 - 2), k0 + 3) if k / n >= q)
    return int(vals[np.searchsorted(cum, kstar, side="left")])


def corpus_token_quantiles(sf_dir: str):
    """Exact corpus-level quantiles of per-document token counts — the
    length-distribution report every corpus build starts from. Distributed
    shape: the token counts reduce to a VALUE HISTOGRAM via one
    ``groupby(n).count`` (domain = distinct document lengths, bounded and
    tiny vs the corpus), and quantiles are read off the cumulative
    histogram on the driver — exact at any corpus size, no sort, no
    sampling, no corpus-sized collect.

    Quantile semantics replicate DuckDB's ``quantile_disc`` via the shared
    :func:`_quantile_disc` helper."""
    hist = (
        doc_token_counts(sf_dir)
        .groupby("n_ws_tokens")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
        .sort_values("n_ws_tokens")
        .reset_index(drop=True)
    )
    vals = hist["n_ws_tokens"].to_numpy(dtype=np.int64)
    cum = hist["cnt"].to_numpy(dtype=np.int64).cumsum()
    n_docs = int(cum[-1]) if len(cum) else 0

    row = {"n_docs": n_docs}
    for q in _QUANTILE_PS:
        row[f"p{int(round(q * 100))}"] = _quantile_disc(vals, cum, q)
    return pd.DataFrame([row]).astype("int64")


_TFIDF_K = 5


def source_tfidf_terms(sf_dir: str):
    """Top-K distinctive terms per source by tf·idf — the corpus-analytics
    operator behind domain profiling and boilerplate diagnosis. idf is the
    rational S/df (S = number of sources, df = number of sources containing
    the term) — no transcendentals, so the engine and the SQL oracle agree
    bit-for-bit (IEEE division is correctly rounded; ln() library rounding
    is not portable).

    Scale shape: per-block (source, token) partial counts (the combiner) →
    ONE vocabulary×source-sized ``groupby.sum`` = the global tf table; df
    derives from tf by a token-keyed count whose result — (token-hash, df),
    vocabulary-sized ≪ corpus — is broadcast ONCE via ``ray.put``; scoring
    + block-local per-source top-K runs map-only over tf; one final
    K-rows-per-(source, block) groupby picks the global top-K."""
    from camden_ray.functions.hashing import hash_string_column

    k = _TFIDF_K
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks, seg = _batch_ngrams(t.column("text"), 1)
        if not len(toks):
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "tk": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        scodes = src.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        tcodes = toks.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        sk = scodes[seg]
        order = np.lexsort((tcodes, sk))
        ss, ts = sk[order], tcodes[order]
        newrun = np.empty(len(order), dtype=bool)
        newrun[0] = True
        newrun[1:] = (ss[1:] != ss[:-1]) | (ts[1:] != ts[:-1])
        starts = np.flatnonzero(newrun)
        rl = np.diff(np.append(starts, len(order)))
        return pa.table(
            {
                "source": src.take(pa.array(ss[starts])),
                "tk": toks.take(pa.array(order[starts])),
                "cnt": pa.array(rl, pa.int64()),
            }
        )

    tf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "tk"])
        .aggregate(Sum("cnt", alias_name="tf_cnt"))
    )
    # S: number of distinct sources in the corpus (a tiny aggregate)
    n_sources = _read(sf_dir, "documents", columns=["source"]).groupby(
        "source"
    ).aggregate(Count(alias_name="c")).count()
    # df: sources-per-token, derived from tf (one row per (source, token));
    # vocabulary-sized — broadcast as (sorted token hash, df) arrays
    dft = tf.groupby("tk").aggregate(Count(alias_name="df_cnt"))
    dh, dc = [], []
    for b in dft.iter_batches(batch_format="pyarrow"):
        dh.append(hash_string_column(b["tk"].combine_chunks()))
        dc.append(b["df_cnt"].to_numpy(zero_copy_only=False))
    dh = np.concatenate(dh) if dh else np.empty(0, dtype=np.uint64)
    dc = np.concatenate(dc) if dc else np.empty(0, dtype=np.int64)
    o = np.argsort(dh)
    df_ref = ray.put((dh[o], dc[o].astype(np.int64)))

    def score_topk(t: pa.Table) -> pa.Table:
        keys, dfs = ray.get(df_ref)
        tk = t["tk"].combine_chunks() if isinstance(
            t["tk"], pa.ChunkedArray
        ) else t["tk"]
        th = hash_string_column(tk)
        pos = np.searchsorted(keys, th)
        if len(keys) and not np.array_equal(keys[pos.clip(max=len(keys) - 1)], th):
            raise ValueError("token missing from broadcast df table")
        df_col = dfs[pos]
        tfv = t["tf_cnt"].to_numpy(zero_copy_only=False)
        score = tfv * n_sources / df_col  # BIGINT·BIGINT exact, then one IEEE divide
        scored = pa.table(
            {
                "source": t["source"],
                "tk": tk,
                "tf_cnt": t["tf_cnt"],
                "df_cnt": pa.array(df_col, pa.int64()),
                "score_fp": pa.array(_fp_round(score, 1_000_000), pa.int64()),
                "_score": pa.array(score, pa.float64()),
            }
        )
        idx = pc.sort_indices(
            scored,
            sort_keys=[("source", "ascending"), ("_score", "descending"),
                       ("tk", "ascending")],
        ).to_numpy(zero_copy_only=False)
        srt = scored.take(pa.array(idx))
        sc = srt["source"].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        n = len(sc)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        np.not_equal(sc[1:], sc[:-1], out=starts[1:])
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        keep = (np.arange(n) - run_start) < k
        return srt.filter(pa.array(keep))

    def final_topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[("_score", "descending"), ("tk", "ascending")],
        )[:k]
        return g.take(idx).drop_columns(["_score"])

    scored = tf.map_batches(score_topk, batch_format="pyarrow")
    return scored.groupby("source").map_groups(final_topk, batch_format="pyarrow")


def source_token_quantiles(sf_dir: str):
    """Per-source exact token-count quantiles (p50/p90) — the grouped form
    of :func:`corpus_token_quantiles`: one (source, n)-keyed count reduces
    each source to its length histogram (domain-sized, tiny vs the corpus),
    and quantiles read off the per-group cumulative histogram inside
    ``map_groups`` — exact at any corpus size, no per-source sort of
    documents."""

    def add_src(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], pattern=r"\S+")
        return pa.table(
            {"source": t["source"],
             "n": pc.fill_null(n, 0).cast(pa.int64())}
        )

    hist = (
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(add_src, batch_format="pyarrow")
        .groupby(["source", "n"])
        .aggregate(Count(alias_name="cnt"))
    )

    def quantiles(g: pa.Table) -> pa.Table:
        vals = g["n"].to_numpy(zero_copy_only=False)
        cnts = g["cnt"].to_numpy(zero_copy_only=False)
        o = np.argsort(vals)
        vals, cnts = vals[o], cnts[o]
        cum = cnts.cumsum()
        n_docs = int(cum[-1])

        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "p50": pa.array([_quantile_disc(vals, cum, 0.50)], pa.int64()),
                "p90": pa.array([_quantile_disc(vals, cum, 0.90)], pa.int64()),
            }
        )

    return hist.groupby("source").map_groups(quantiles, batch_format="pyarrow")


def top_docs_by_chars(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


def doc_quality(sf_dir: str):
    """Quality features per document, emitted as fixed-point int64 (×1e6,
    half-away-from-zero) so the DuckDB oracle can replicate every value
    exactly — counts stay plain int64. One vectorized byte-level pass per
    batch (functions.text.batch_quality_features), not a Python call per
    row."""

    _INT_COLS = ("n_chars", "n_tokens")

    def scorer(t: pa.Table) -> pa.Table:
        from camden_ray.functions.text import batch_quality_features

        feats = batch_quality_features(t["text"])
        cols = {"doc_id": t["doc_id"]}
        for k, v in feats.items():
            if k in _INT_COLS:
                cols[k] = pa.array(v.astype(np.int64), type=pa.int64())
            else:
                cols[f"{k}_fp"] = pa.array(
                    _fp_round(v, scale=1_000_000), type=pa.int64()
                )
        return pa.table(cols)

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        scorer, batch_format="pyarrow"
    )


def doc_lang_id(sf_dir: str):
    """Heuristic language ID vs the labeled lang column — batch-vectorized
    (functions.text.batch_detect_lang)."""

    def f(t: pa.Table) -> pa.Table:
        from camden_ray.functions.text import batch_detect_lang

        det = batch_detect_lang(t["text"])
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"],
             "detected": pa.array(det, type=pa.string())}
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
        f, batch_format="pyarrow"
    )


# Broadcast cap for the unigram-LM vocabulary (distinct-token, NOT corpus,
# sized — web-corpus vocabularies plateau in the tens of millions while the
# corpus grows unbounded). Above it the scoring join runs as a kind-tagged
# token-hash co-partition exchange instead (parity-tested with the cap
# forced to 0, the house pattern for every driver-resident structure).
_UNIGRAM_BROADCAST_MAX_VOCAB = 2_000_000


def doc_unigram_logprob(sf_dir: str, *, broadcast_max_vocab: int | None = None):
    """Corpus unigram language-model scoring — the classic two-phase
    distributed shape (train-on-corpus, score-the-corpus; the fixed-point
    cousin of CCNet/KenLM perplexity filtering, Wenzek et al. 2019): phase 1
    reduces per-block token counts into a global (token, cnt) table; phase 2
    scores every document by the sum and mean of its tokens' corpus log
    probabilities.

    Hash-exact vs the DuckDB oracle: each distinct token's logprob is
    quantized ONCE to ×1e6 fixed point (``round(ln(cnt/T)·1e6)``), so the
    per-doc sums are order-independent integer arithmetic on both sides;
    the per-doc mean re-rounds ``sum/n`` half-away-from-zero. Docs with no
    tokens emit no row (mirrored by the oracle's inner join).

    Scale shape: the vocab table is aggregated distributively; at or below
    ``_UNIGRAM_BROADCAST_MAX_VOCAB`` distinct tokens it is broadcast once
    via ``ray.put`` and the scoring pass is map-only (``pc.index_in`` +
    one weighted bincount per batch); above it, scoring runs through the
    engine's ``partition_map`` exchange co-partitioned on token hash."""
    from camden_ray.functions.hashing import hash_string_column
    from camden_ray.stages.candidates import partition_map, partitions_for

    cap = (
        _UNIGRAM_BROADCAST_MAX_VOCAB
        if broadcast_max_vocab is None
        else broadcast_max_vocab
    )
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        toks, _ = _batch_ngrams(t["text"], 1)
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        vc = toks.value_counts()
        return pa.table(
            {"token": vc.field("values"),
             "cnt": vc.field("counts").cast(pa.int64())}
        )

    vocab = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    total = float(vocab.aggregate(Sum("cnt", alias_name="t"))["t"] or 0)
    n_vocab = vocab.count()

    _LP_EMPTY = pa.table(
        {"token": pa.array([], pa.string()),
         "cnt": pa.array([], pa.int64()),
         "lp_fp": pa.array([], pa.int64())}
    )

    def with_lp(t: pa.Table) -> pa.Table:
        # groupby can emit schema-less zero-row blocks; normalize them
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return _LP_EMPTY
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        lp = _fp_round(np.log(cnt / total), scale=1_000_000)
        return t.append_column("lp_fp", pa.array(lp, type=pa.int64()))

    lp_ds = vocab.map_batches(with_lp, batch_format="pyarrow")

    def finalize_arrays(doc_ids, s, n):
        mean = _fp_round(s.astype(np.float64) / n, scale=1)
        return pa.table(
            {
                "doc_id": doc_ids,
                "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
                "logprob_sum_fp": pa.array(s.astype(np.int64), pa.int64()),
                "mean_logprob_fp": pa.array(mean, pa.int64()),
            }
        )

    if n_vocab <= cap:
        tabs = [t for t in ray.get(lp_ds.to_arrow_refs()) if t.num_rows]
        vt = pa.concat_tables(tabs) if tabs else _LP_EMPTY
        ref = ray.put(
            (vt["token"].combine_chunks(),
             vt["lp_fp"].to_numpy(zero_copy_only=False))
        )

        def score(t: pa.Table) -> pa.Table:
            tok_v, lp_v = ray.get(ref)  # zero-copy plasma read, once per task
            toks, seg = _batch_ngrams(t["text"], 1)
            n_rows = t.num_rows
            counts = np.bincount(seg, minlength=n_rows).astype(np.int64)
            sums = np.zeros(n_rows, dtype=np.float64)
            if len(toks):
                idx = pc.index_in(toks, value_set=tok_v).to_numpy(
                    zero_copy_only=False
                )
                sums = np.bincount(seg, weights=lp_v[idx], minlength=n_rows)
            live = counts > 0
            mask = pa.array(live)
            return finalize_arrays(
                t["doc_id"].filter(mask), sums[live], counts[live]
            )

        return docs.map_batches(score, batch_format="pyarrow")

    # co-shuffle fallback: vocab rows (kind 0) and per-(doc, token) occurrence
    # rows (kind 1) meet in token-hash partitions; per-doc sums reduce after.
    P = partitions_for(DedupConfig(), 4096)

    def tag_vocab(t: pa.Table) -> pa.Table:
        pk = (hash_string_column(t["token"]) % np.uint64(P)).view(np.int64)
        return pa.table(
            {
                "token": t["token"],
                "lp_fp": t["lp_fp"],
                "doc_id": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "occ": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "pkey": pa.array(pk, type=pa.int64()),
            }
        )

    def tag_docs(t: pa.Table) -> pa.Table:
        toks, seg = _batch_ngrams(t["text"], 1)
        ids = t["doc_id"].take(pa.array(seg))
        g = (
            pa.table({"doc_id": ids, "token": toks})
            .group_by(["doc_id", "token"])
            .aggregate([("doc_id", "count")])
        )
        pk = (hash_string_column(g["token"]) % np.uint64(P)).view(np.int64)
        n = g.num_rows
        return pa.table(
            {
                "token": g["token"],
                "lp_fp": pa.array(np.zeros(n, np.int64), pa.int64()),
                "doc_id": g["doc_id"],
                "occ": g["doc_id_count"].cast(pa.int64()),
                "kind": pa.array(np.ones(n, np.int8), pa.int8()),
                "pkey": pa.array(pk, type=pa.int64()),
            }
        )

    tagged = lp_ds.map_batches(tag_vocab, batch_format="pyarrow").union(
        docs.map_batches(tag_docs, batch_format="pyarrow")
    )

    def join_part(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        vmask = pa.array(kind == 0)
        vt = t.filter(vmask)
        dt = t.filter(pc.invert(vmask))
        if dt.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "s": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        idx = pc.index_in(
            dt["token"].combine_chunks(), value_set=vt["token"].combine_chunks()
        ).to_numpy(zero_copy_only=False)
        lp = vt["lp_fp"].to_numpy(zero_copy_only=False)[idx]
        occ = dt["occ"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": dt["doc_id"],
             "s": pa.array(occ * lp, pa.int64()),
             "n": pa.array(occ, pa.int64())}
        )

    agg = partition_map(tagged, P, join_part, key="pkey").groupby(
        "doc_id"
    ).aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "s" not in t.column_names:
            return finalize_arrays(
                pa.array([], pa.int64()),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
            )
        return finalize_arrays(
            t["doc_id"],
            t["s"].to_numpy(zero_copy_only=False),
            t["n"].to_numpy(zero_copy_only=False),
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# CCNet bucket granularity: scores bin at 0.01 logprob (×1e6 fp // 1e4), so
# the threshold histogram's domain is the score RANGE / 0.01 — a few
# thousand bins regardless of corpus size.
_CCNET_BIN_FP = 10000


def doc_ccnet_bucket(sf_dir: str):
    """CCNet-style corpus partition (Wenzek et al. 2019 §4.3): every doc is
    assigned to the head / middle / tail third of the corpus by its unigram
    LM score (head = most probable text, what CCNet keeps for LM training).
    Tertile thresholds are EXACT, computed from a bounded value histogram:
    scores bin at 0.01 logprob, one ``groupby(bin).count`` reduces the
    corpus to a few thousand rows, and the thresholds are read off the
    cumulative histogram on the driver with ``quantile_disc`` semantics
    (the shared :func:`_quantile_disc`) — no corpus sort, no sampling.
    The skinny (doc_id, score) table materializes once and is scanned
    twice (histogram, then assignment); bucket boundaries and floor()
    binning are integer/IEEE-identical to the SQL oracle."""
    scores = doc_unigram_logprob(sf_dir)

    def binned(t: pa.Table) -> pa.Table:
        m = t["mean_logprob_fp"].to_numpy(zero_copy_only=False)
        b = np.floor(m / float(_CCNET_BIN_FP)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "mean_logprob_fp": t["mean_logprob_fp"],
                "bin": pa.array(b, pa.int64()),
            }
        )

    bds = scores.map_batches(binned, batch_format="pyarrow").materialize()
    hist = (
        bds.groupby("bin")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    vals = hist["bin"].to_numpy(dtype=np.int64)
    cum = hist["cnt"].to_numpy(dtype=np.int64).cumsum()

    t1 = _quantile_disc(vals, cum, 1.0 / 3.0)
    t2 = _quantile_disc(vals, cum, 2.0 / 3.0)

    def assign(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False)
        bucket = np.where(b <= t1, "tail", np.where(b <= t2, "middle", "head"))
        return t.append_column("bucket", pa.array(bucket, type=pa.string()))

    return bds.map_batches(assign, batch_format="pyarrow")


# Gopher-style rule thresholds (Rae et al. 2021 §A1.1, adapted to the short
# synthetic fixture docs; frozen as literals so the SQL oracle embeds them)
_GOPHER_MIN_WORDS = 25
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MWL = 3.0
_GOPHER_MAX_MWL = 10.0
_GOPHER_MAX_SYMBOL_RATIO = 0.1
_GOPHER_MIN_ALPHA_FRAC = 0.8
_GOPHER_MIN_STOPWORDS = 2


def doc_gopher_filter(sf_dir: str):
    """Gopher-style quality-rule filter (Rae et al. 2021, public rule set)
    per document, hash-exact vs the DuckDB oracle: word-count bounds, mean
    word length bounds, symbol-to-word ratio ('#' + non-overlapping '...'),
    alphabetic-word fraction, and minimum English-stopword hits, plus the
    conjunctive ``keep`` verdict. One vectorized byte-level pass per batch
    (functions.text.batch_gopher_features); ratios are emitted as ×1e6
    fixed point, rule verdicts as 0/1 BIGINT. Rule comparisons happen on
    the raw IEEE doubles with SQL-identical numerator/denominator, so the
    threshold boundaries cannot flip between the two sides. Tokenization
    parity with the oracle follows the driver-table convention shared by
    every text oracle here (doc_quality, the n-gram family): the oracle's
    ``string_split(text, ' ')`` equals the engine's ``\\w+`` runs on these
    tables' lowercase single-space text; the engine's semantic truth on
    ARBITRARY text is the per-row :func:`camden_ray.functions.text.
    gopher_features` reference, which the batch kernel matches exactly
    (hypothesis-fuzzed)."""

    def f(t: pa.Table) -> pa.Table:
        from camden_ray.functions.text import batch_gopher_features

        g = batch_gopher_features(t["text"])
        ntok = g["n_tokens"]
        live = ntok > 0
        ok_wc = (ntok >= _GOPHER_MIN_WORDS) & (ntok <= _GOPHER_MAX_WORDS)
        ok_mwl = live & (g["mean_word_len"] >= _GOPHER_MIN_MWL) & (
            g["mean_word_len"] <= _GOPHER_MAX_MWL
        )
        ok_sym = live & (g["symbol_ratio"] <= _GOPHER_MAX_SYMBOL_RATIO)
        ok_alpha = live & (g["alpha_word_frac"] >= _GOPHER_MIN_ALPHA_FRAC)
        ok_stop = g["n_stopwords"] >= _GOPHER_MIN_STOPWORDS
        keep = ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop

        def b(m):
            return pa.array(m.astype(np.int64), type=pa.int64())

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": b(ntok),
                "n_hash": b(g["n_hash"]),
                "n_ellipsis": b(g["n_ellipsis"]),
                "n_stopwords": b(g["n_stopwords"]),
                "mean_word_len_fp": pa.array(
                    _fp_round(g["mean_word_len"], scale=1_000_000), pa.int64()
                ),
                "alpha_word_frac_fp": pa.array(
                    _fp_round(g["alpha_word_frac"], scale=1_000_000), pa.int64()
                ),
                "symbol_ratio_fp": pa.array(
                    _fp_round(g["symbol_ratio"], scale=1_000_000), pa.int64()
                ),
                "ok_word_count": b(ok_wc),
                "ok_mean_word_len": b(ok_mwl),
                "ok_symbol_ratio": b(ok_sym),
                "ok_alpha_words": b(ok_alpha),
                "ok_stopwords": b(ok_stop),
                "keep": b(keep),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def corpus_gopher_summary(sf_dir: str):
    """The filter report a corpus owner reads after a Gopher pass: one row
    of per-rule failure counts plus the overall keep count/rate —
    per-block partial sums over :func:`doc_gopher_filter`'s verdict
    columns, driver-summed (rule-cardinality-bounded, never doc-sized)."""
    out = doc_gopher_filter(sf_dir)
    cols = ["ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
            "ok_alpha_words", "ok_stopwords", "keep"]

    def partial(t: pa.Table) -> pa.Table:
        row = {"n_docs": pa.array([t.num_rows], pa.int64())}
        for c in cols:
            row["n_" + c] = pa.array(
                [int(pc.sum(t[c]).as_py() or 0)], pa.int64()
            )
        return pa.table(row)

    df = out.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = int(df["n_docs"])
    row = {"n_docs": n}
    for c in cols:
        row["n_" + c] = int(df["n_" + c])
    row["keep_rate_fp"] = int(
        _fp_round(np.array([row["n_keep"] / n if n else 0.0]), 1_000_000)[0]
    )
    return pd.DataFrame([row]).astype("int64")


def doc_length_zscore(sf_dir: str):
    """Per-document length standardization with EXACT two-phase moments:
    phase 1 reduces (n, Σx, Σx²) as integers per block (three scalars to
    the driver — never a quantile sort, never float accumulation order),
    phase 2 is a map-only scoring pass. Mean/variance derive from the
    integer sums through one fixed expression tree, so the doubles — and
    the ±1e6 fixed-point z-scores and |z| > 3 outlier flags — are
    bit-identical to the SQL oracle computing the same rational forms."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def drop_nulls(t: pa.Table) -> pa.Table:
        # a null-bearing int64 to_numpy converts to float64+NaN and poisons
        # the integer moments; null-length docs are excluded on both sides
        return t.filter(pc.is_valid(t["n_chars"]))

    ds = ds.map_batches(drop_nulls, batch_format="pyarrow")

    def moments(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"n": pa.array([len(x)], pa.int64()),
             "s1": pa.array([int(x.sum())], pa.int64()),
             "s2": pa.array([int((x * x).sum())], pa.int64())}
        )

    m = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, s1, s2 = int(m["n"]), int(m["s1"]), int(m["s2"])
    mean = s1 / float(n) if n else 0.0
    var = (n * s2 - s1 * s1) / (float(n) * (n - 1)) if n > 1 else 0.0
    sd = float(np.sqrt(var))

    def score(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        z = (x - mean) / sd if sd > 0 else np.zeros(len(x))
        z_fp = _fp_round(z, scale=1_000_000)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "z_fp": pa.array(z_fp, pa.int64()),
                "is_outlier": pa.array(
                    (np.abs(z) > 3.0).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str):
    """Order-sensitive polynomial rolling-hash fingerprints, hash-exact vs
    the DuckDB oracle: token hash = ``md5_number_lower`` (the engine's
    blake2b :func:`camden_ray.functions.text.fingerprint` stays for internal
    use; this query uses the md5-parity twin, mirroring the exact-dup
    digest's "blake2b internally, md5 for the oracle" convention), fold
    ``acc = acc*1000003 + th`` mod 2^64 — replicated in SQL by a HUGEINT
    ``list_reduce``. Batch-vectorized: one md5 pass over unique tokens, one
    segment cumsum."""
    from camden_ray.functions.hashing import md5_poly_fingerprints

    def f(t: pa.Table) -> pa.Table:
        fps = md5_poly_fingerprints(t["text"].to_pylist())
        return pa.table(
            {"doc_id": t["doc_id"],
             "fp": pa.array(fps.view(np.int64), type=pa.int64())}
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# events: windowed aggregate (streaming-shaped, batch semantics)
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per user: count + fixed-point value sum."""

    def add_win(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        cents = _cents(t["value"])
        return pa.table(
            {"user_id": t["user_id"], "hour": hour, "value_cents": cents}
        )

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"]).map_batches(
        add_win, batch_format="pyarrow"
    )
    return ds.groupby(["user_id", "hour"]).aggregate(
        Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_cents")
    )


# Hopping-window geometry: 10-minute hop, 30-minute width — every event
# belongs to exactly width/hop = 3 overlapping windows (win_start =
# (floor(t/hop) - k)·hop for k = 0..2; (t mod hop) + k·hop < width holds
# for all k < width/hop, so membership needs no per-row filter).
_HOP_US = 600_000_000
_HOP_K = 3


def events_hopping_windows(sf_dir: str):
    """HOPPING (sliding) window aggregate — the overlapping-window class a
    streaming analytics engine exposes and batch SQL lacks natively: 30-min
    windows advancing every 10 min, each event contributing to exactly 3.
    Scale shape: membership is a closed form (no range join) — a map-only
    ×3 replication with computed ``win_start_us``, then ONE window-keyed
    groupby; the replication factor is width/hop, constant in corpus size.
    Null-ts rows are dropped (the ``events_pivot`` NOT-NULL contract).
    Hash-exact DuckDB oracle via the same unnest-offsets construction."""

    def rows(t: pa.Table) -> pa.Table:
        if t["ts"].null_count:
            t = t.filter(pc.is_valid(t["ts"]))
        us = (
            pc.cast(t["ts"], pa.int64())  # timestamp[us] → epoch micros
            .to_numpy(zero_copy_only=False)
        )
        cents = _cents(t["value"])
        base = (us // _HOP_US) * _HOP_US  # exact integer bucket floor
        parts = [
            pa.table(
                {
                    "win_start_us": pa.array(base - k * _HOP_US,
                                             type=pa.int64()),
                    "value_cents": cents,
                }
            )
            for k in range(_HOP_K)
        ]
        return pa.concat_tables(parts)

    ds = _read(sf_dir, "events", columns=["ts", "value"]).map_batches(
        rows, batch_format="pyarrow"
    )
    return ds.groupby("win_start_us").aggregate(
        Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_cents")
    )


def events_user_cumsum(sf_dir: str):
    """Distributed window function: per-user running value sum + row number
    in (ts, event_id) order — SQL's ``SUM(...) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``, a class Ray Data has no native operator for.
    Co-locating one partition key's rows IS the semantics, so the shuffle
    is irreducible; per-user history is the only materialized unit (bounded
    per key, never corpus-sized), making this the scale shape a multi-node
    run wants. The ordered prefix sum runs vectorized inside each group."""

    def win(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = t.take(order)
        # fill nulls BEFORE to_numpy: a null-bearing int64 converts to
        # float64+NaN and np.cumsum poisons every later row (SQL's SUM
        # skips NULLs, which equals adding 0 to a running sum)
        cents = pc.fill_null(_cents(t["value"]), 0).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "rn": pa.array(np.arange(1, t.num_rows + 1), pa.int64()),
                "cum_value_cents": pa.array(
                    np.cumsum(cents).astype(np.int64), pa.int64()
                ),
            }
        )

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return ds.groupby("user_id").map_groups(win, batch_format="pyarrow")


_WINDOW_US = 3_600_000_000  # 1-hour RANGE frame, microseconds


def events_user_window(sf_dir: str):
    """Sliding RANGE-frame window — SQL's ``RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW`` per user: at every event, the count and
    value sum of that user's events in the trailing hour (peers of the
    current timestamp included, per RANGE semantics). The row-frame cousin
    is :func:`events_user_cumsum`; this one's frame bounds are VALUES, so
    the per-group kernel is two vectorized ``searchsorted`` probes into
    the sorted timestamp array + prefix-sum differences — O(n log n) per
    user, no per-row loop, co-partitioned by the window key."""

    def win(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = t.take(order)
        ts = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # null values: fill with 0 before to_numpy (≡ SQL SUM's null skip;
        # avoids the int64→float64 NaN poisoning of the prefix sums)
        cents = pc.fill_null(_cents(t["value"]), 0).to_numpy(
            zero_copy_only=False
        )
        ps = np.zeros(len(cents) + 1, dtype=np.int64)
        np.cumsum(cents, out=ps[1:])
        lo = np.searchsorted(ts, ts - _WINDOW_US, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "w_cnt": pa.array(hi - lo, pa.int64()),
                "w_sum_cents": pa.array(ps[hi] - ps[lo], pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return ds.groupby("user_id").map_groups(win, batch_format="pyarrow")


def events_funnel(sf_dir: str):
    """Two-step funnel analytics — per user: view→click conversion within a
    1-hour window (a click converts iff some view by the same user lies in
    ``[click.ts − 1h, click.ts]``). The classic product-analytics operator:
    co-partition by user, one sorted pass per group with two
    ``searchsorted`` probes per step pair — no per-row loop, no self-join
    blowup (SQL's EXISTS correlated join is the oracle, not the plan).
    Output per user: step counts, converted-click count, and the 0/1
    converted flag."""

    def funnel(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ts = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = np.sort(ts[et == "view"])
        c = ts[et == "click"]
        if len(v) and len(c):
            lo = np.searchsorted(v, c - _WINDOW_US, side="left")
            hi = np.searchsorted(v, c, side="right")
            conv = int((hi > lo).sum())
        else:
            conv = 0
        uid = t["user_id"][0]
        return pa.table(
            {
                "user_id": pa.array([uid.as_py()], pa.int64()),
                "n_views": pa.array([int((et == "view").sum())], pa.int64()),
                "n_clicks": pa.array([len(c)], pa.int64()),
                "n_converted_clicks": pa.array([conv], pa.int64()),
                "converted": pa.array([int(conv > 0)], pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    return ds.groupby("user_id").map_groups(funnel, batch_format="pyarrow")


_WEEK_US = 7 * 24 * 3_600_000_000


def events_retention(sf_dir: str):
    """Cohort retention — the analytics table behind every retention curve:
    users cohorted by first-activity week, counted per (cohort_week,
    week_offset) they return in. Distributed shape: one (user, week)
    distinct reduce (activity-sized, ≪ events), then per-user cohort
    assignment inside ``map_groups`` (each group is ONE user's week set),
    then a cohort²-bounded groupby — the raw events are never self-joined.
    Weeks are exact integer epoch-µs floor-divisions on both sides."""

    def to_weeks(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {"user_id": t["user_id"],
             "wk": pa.array(ts // _WEEK_US, pa.int64())}
        )

    weeks = (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(to_weeks, batch_format="pyarrow")
        .groupby(["user_id", "wk"])
        .aggregate(Count(alias_name="_n"))
    )

    def per_user(g: pa.Table) -> pa.Table:
        wk = g["wk"].to_numpy(zero_copy_only=False)
        cw = int(wk.min())
        return pa.table(
            {
                "cohort_week": pa.array(np.full(len(wk), cw), pa.int64()),
                "week_offset": pa.array(wk - cw, pa.int64()),
            }
        )

    return (
        weeks.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


def events_type_stats(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        return pa.table({"event_type": t["event_type"], "value_cents": cents})

    ds = _read(sf_dir, "events", columns=["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value_cents", alias_name="sum_cents"),
        Min("value_cents", alias_name="min_cents"),
        Max("value_cents", alias_name="max_cents"),
    )


# ---------------------------------------------------------------------------
# lineitem: pre-aggregated pricing summary (the partial-aggregate pattern)
# ---------------------------------------------------------------------------


def lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped: per-batch partial aggregation BEFORE the groupby
    shuffle (SURVEY.md §4.1 'pre-aggregate inside map_batches')."""

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": _cents(t["l_quantity"]),
                "price_c": _cents(t["l_extendedprice"]),
            }
        )
        # pure-Arrow partial aggregate (pa.TableGroupBy): no pandas detour,
        # no per-cell Python objects inside the hot per-batch combiner
        g = tmp.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("qty_c", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_cents", "sum_price_cents",
             "count_order"]
        )

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("count_order", alias_name="count_order"),
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def knn_brute_force(sf_dir: str):
    """Exact cosine top-10 vs the vec_id=0 query vector.

    The query vector is broadcast once (ray.put); each batch does one numpy
    matmul. Per-batch top-k then a global top-k — never a full sort.
    """
    import pyarrow.parquet as pq

    # row-group-pruned point read: only row groups whose vec_id stats can
    # contain 0 are decoded — never the whole table for one query row
    qrow = pq.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    q_raw = np.array(qrow["embedding"][0].as_py(), dtype=np.float32)
    q = q_raw.astype(np.float64)
    q /= np.linalg.norm(q)
    q_ref = ray.put((q, q_raw))

    def score(t: pa.Table) -> pa.Table:
        qv, qraw = ray.get(q_ref)
        emb = _emb_matrix(t["embedding"])
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        # f64 matmul ranks candidates; the top slice is re-scored with the
        # DuckDB-identical f32-sequential recipe over the RAW float32
        # vectors, so the reported values (and final ordering) match the
        # oracle bit-for-bit
        est = (emb @ qv) / norms
        top = np.argsort(-est, kind="stable")[:40]
        cos_fp = _cos_fp_f32seq(
            emb[top], np.broadcast_to(qraw, (len(top), len(qraw)))
        )
        ids = t["vec_id"].to_numpy(zero_copy_only=False)[top]
        idx = np.lexsort((ids, -cos_fp))[:10]
        return pa.table(
            {"vec_id": pa.array(ids[idx], type=pa.int64()),
             "cos_fp": pa.array(cos_fp[idx], type=pa.int64())}
        )

    ds = _read(sf_dir, "embeddings").map_batches(score, batch_format="pyarrow")
    return ds.sort(["cos_fp", "vec_id"], descending=[True, False]).limit(10)


def knn_lsh(sf_dir: str):
    """Multi-table random-hyperplane-LSH ANN: candidates = union of the
    query's bucket across T tables, exact cosine re-rank inside candidates.

    Bit width adapts to the table size (expected bucket ≈ 256 rows): at the
    driver-table scales the 32 tables jointly cover the space, so the ANN
    result provably equals the brute-force top-10 (that equality IS the
    DuckDB oracle); at corpus scale the per-table buckets shrink and the
    candidate union stays ~T × 256 rows per batch — the scale path.
    """
    import pyarrow.parquet as pq

    TABLES = 32
    n_rows = pq.read_metadata(_t(sf_dir, "embeddings")).num_rows
    bits = int(np.clip(np.log2(max(2, n_rows / 256)), 3, 16))
    qrow = pq.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    dim = len(qrow["embedding"][0])
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((TABLES, dim, bits))
    q_raw = np.array(
        qrow.filter(pc.equal(qrow["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float32,
    )
    q = q_raw.astype(np.float64)
    q = q / np.linalg.norm(q)
    pow2 = 1 << np.arange(bits)
    qsigs = np.array([int(((q @ planes[ti]) > 0) @ pow2) for ti in range(TABLES)])
    state = ray.put((planes, q, q_raw, qsigs))

    def bucket_and_rank(t: pa.Table) -> pa.Table:
        pl, qv, qraw, qs = ray.get(state)
        emb = _emb_matrix(t["embedding"])
        p2 = 1 << np.arange(pl.shape[2])
        mask = np.zeros(len(emb), dtype=bool)
        for ti in range(pl.shape[0]):
            mask |= (((emb @ pl[ti]) > 0) @ p2) == qs[ti]
        emb, ids = emb[mask], t["vec_id"].to_numpy(zero_copy_only=False)[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cos_fp": pa.array([], type=pa.int64())})
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        est = (emb @ qv) / norms
        top = np.argsort(-est, kind="stable")[:40]
        cos_fp = _cos_fp_f32seq(
            emb[top], np.broadcast_to(qraw, (len(top), len(qraw)))
        )
        ids = ids[top]
        idx = np.lexsort((ids, -cos_fp))[:10]
        return pa.table({"vec_id": pa.array(ids[idx], type=pa.int64()),
                         "cos_fp": pa.array(cos_fp[idx], type=pa.int64())})

    ds = _read(sf_dir, "embeddings").map_batches(bucket_and_rank, batch_format="pyarrow")
    return ds.sort(["cos_fp", "vec_id"], descending=[True, False]).limit(10)


def _ivf_params(n_rows: int) -> tuple[int, int]:
    """(nlist, nprobe) for :func:`knn_ivf`: ~64 expected rows per list, and
    probe enough lists that the expected candidate pool is >= 8192 rows
    (a recall floor — the same adaptivity shape as knn_lsh's bit width),
    never fewer than nlist/16. Below ~8k rows the floor makes the probe set
    exhaustive — IVF degenerates to a flat scan there, which is why the
    exact SQL is a valid oracle at the driver-table scales; the pruning
    regime starts when the corpus outgrows the floor (asserted in
    tests/test_similarity.py at synthetic large n)."""
    nlist = int(np.clip(round(np.sqrt(n_rows / 64.0)), 4, 4096))
    by_floor = int(np.ceil(nlist * min(1.0, 8192.0 / max(1, n_rows))))
    nprobe = int(np.clip(max(nlist // 16, by_floor), 1, nlist))
    return nlist, nprobe


def knn_ivf(sf_dir: str):
    """IVF (inverted-file) ANN: seeded spherical k-means centroids trained
    on a fixed-cap driver-side sample, the query probes its nprobe nearest
    lists, and only rows assigned to probed lists are exactly re-ranked.

    Scale path: the centroid matrix is the only broadcast state (nlist × d,
    KBs–low MBs via one ray.put); each batch runs one matmul against the
    centroids to assign lists, masks to the probed lists (expected
    n·nprobe/nlist of the corpus reaches the re-rank), and reuses the
    knn_brute_force top-k recipe on the survivors. Training never reads the
    full table — the sample is capped at max(4096, 64·nlist) rows. At the
    driver-table scales the probed lists deterministically cover the exact
    top-10 (seeded training; asserted against knn_brute_force in
    tests/test_similarity.py), so the exact SQL doubles as the oracle —
    the same contract as knn_lsh.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(_t(sf_dir, "embeddings"))
    n_rows = pf.metadata.num_rows
    nlist, nprobe = _ivf_params(n_rows)
    want = min(n_rows, max(4096, 64 * nlist))
    parts, got = [], 0
    for rb in pf.iter_batches(batch_size=8192, columns=["embedding"]):
        parts.append(pa.Table.from_batches([rb]))
        got += rb.num_rows
        if got >= want:
            break
    sample = _emb_matrix(pa.concat_tables(parts)["embedding"])
    snorm = np.linalg.norm(sample, axis=1)
    snorm[snorm == 0] = 1.0
    X = sample / snorm[:, None]
    rng = np.random.default_rng(42)
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)].copy()
    for _ in range(8):  # spherical Lloyd on the sample (driver-side, capped)
        a = np.argmax(X @ C.T, axis=1)
        order = np.argsort(a, kind="stable")
        ao = a[order]
        starts = np.flatnonzero(np.r_[True, ao[1:] != ao[:-1]])
        sums = np.add.reduceat(X[order], starts, axis=0)
        nv = np.linalg.norm(sums, axis=1)
        upd = nv > 0
        C[ao[starts][upd]] = sums[upd] / nv[upd][:, None]
    qrow = pq.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    q_raw = np.array(qrow["embedding"][0].as_py(), dtype=np.float32)
    q = q_raw.astype(np.float64)
    q /= np.linalg.norm(q)
    probed = np.sort(np.argsort(-(C @ q), kind="stable")[:nprobe])
    state = ray.put((C, probed, q, q_raw))

    def probe_and_rank(t: pa.Table) -> pa.Table:
        C_, pr, qv, qraw = ray.get(state)
        emb = _emb_matrix(t["embedding"])
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        assign = np.argmax((emb / norms[:, None]) @ C_.T, axis=1)
        mask = np.isin(assign, pr)
        emb = emb[mask]
        ids = t["vec_id"].to_numpy(zero_copy_only=False)[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cos_fp": pa.array([], type=pa.int64())})
        nr = norms[mask]
        est = (emb @ qv) / nr
        top = np.argsort(-est, kind="stable")[:40]
        cos_fp = _cos_fp_f32seq(
            emb[top], np.broadcast_to(qraw, (len(top), len(qraw)))
        )
        ids = ids[top]
        idx = np.lexsort((ids, -cos_fp))[:10]
        return pa.table({"vec_id": pa.array(ids[idx], type=pa.int64()),
                         "cos_fp": pa.array(cos_fp[idx], type=pa.int64())})

    ds = _read(sf_dir, "embeddings").map_batches(
        probe_and_rank, batch_format="pyarrow"
    )
    return ds.sort(["cos_fp", "vec_id"], descending=[True, False]).limit(10)


_KMEANS_K = 10
_KMEANS_ITERS = 3
_KMEANS_SCALE = 1_000_000


def embedding_kmeans(sf_dir: str):
    """Iterative ML under a FULL DuckDB oracle: fixed-point Lloyd k-means
    over the embeddings table (k=10, 3 update iterations, deterministic
    init = the k smallest vec_ids). Every quantity is integer — embeddings
    quantized to ×1e6 int64 (DuckDB round parity), distances are exact
    int64 squared-L2, centroid update is exact integer FLOOR division
    (empty cluster keeps its previous centroid), ties break to the lowest
    cluster index — so per-block partial sums commute and the distributed
    result is bit-identical to the oracle's unrolled-CTE iterations
    regardless of block order or parallelism.

    Scale shape: per iteration ONE map-only pass (centroids broadcast via
    ``ray.put``, per-block (k×d) int64 partial sums + counts) and a tiny
    driver-side k×d update — the classic mini-batch-free distributed Lloyd
    step; no shuffle at any point. Output: (vec_id, cluster) final
    assignment."""
    iters = _KMEANS_ITERS

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()

    def quant(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        X = _emb_matrix(t["embedding"], dtype=np.float64)
        return ids, _fp_round(X, scale=_KMEANS_SCALE)

    # deterministic init: embeddings of the k smallest vec_ids (fewer than
    # k rows ⇒ k shrinks, matching the oracle's LIMIT k)
    seed_t = pa.concat_tables(
        ray.get(ds.sort("vec_id").limit(_KMEANS_K).to_arrow_refs())
    )
    _, C = quant(seed_t)
    C = C[np.argsort(seed_t["vec_id"].to_numpy(zero_copy_only=False))]
    k = C.shape[0]

    def partials_fn(c_ref):
        def f(t: pa.Table) -> pa.Table:
            Cb = ray.get(c_ref)
            ids, X = quant(t)
            x2 = (X * X).sum(axis=1)
            c2 = (Cb * Cb).sum(axis=1)
            d2 = x2[:, None] + c2[None, :] - 2 * (X @ Cb.T)
            a = np.argmin(d2, axis=1)  # first occurrence = lowest cluster
            S = np.zeros((k, X.shape[1]), dtype=np.int64)
            np.add.at(S, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cl": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(cnt, type=pa.int64()),
                    "s": pa.array(list(S), type=pa.list_(pa.int64())),
                }
            )

        return f

    for _ in range(iters):
        c_ref = ray.put(C)
        parts = ray.get(
            ds.map_batches(partials_fn(c_ref), batch_format="pyarrow")
            .to_arrow_refs()
        )
        S = np.zeros_like(C)
        cnt = np.zeros(k, dtype=np.int64)
        for p in parts:
            if not p.num_rows:
                continue
            cnt += p["cnt"].to_numpy(zero_copy_only=False)
            sm = p["s"].combine_chunks()
            flat = sm.flatten().to_numpy(zero_copy_only=False)
            S += flat.reshape(k, -1)
        nz = cnt > 0
        C = C.copy()
        C[nz] = np.floor_divide(S[nz], cnt[nz, None])  # exact floor, like SQL

    c_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        Cb = ray.get(c_ref)
        ids, X = quant(t)
        x2 = (X * X).sum(axis=1)
        c2 = (Cb * Cb).sum(axis=1)
        d2 = x2[:, None] + c2[None, :] - 2 * (X @ Cb.T)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(np.argmin(d2, axis=1), type=pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def media_byte_features(sf_dir: str):
    """Multimodal plumbing demo: documents' text bytes as opaque payloads
    through the media decoder actor pool (fake decoder — see
    stages/multimodal.py); the projection is DuckDB-oracle-checked."""
    from camden_ray.stages.multimodal import media_features

    def to_media(t: pa.Table) -> pa.Table:
        from camden_ray.functions.hashing import _string_array_view

        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        # zero-copy utf-8 → binary; md5 runs over buffer views (the digest
        # itself is the irreducible per-row cost — no bytes objects built)
        data, offs = _string_array_view(txt)
        md5s = [
            hashlib.md5(data[offs[i] : offs[i + 1]]).hexdigest()
            for i in range(len(txt))
        ]
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": txt.cast(pa.binary()),
                "media_type": pa.array(["image"] * len(t), type=pa.string()),
                "digest_md5": pa.array(md5s, type=pa.string()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    feats = media_features(ds, decoder="fake", batch_size=128, concurrency=(1, 4))

    # scalar-only, SQL-matchable projection (value-hash harnesses can't sort
    # list columns, and the stage's blake2b digest has no SQL analogue): the
    # md5 payload digest lets DuckDB verify content identity; the full
    # feature vectors + blake2b digest stay on the stage API and are covered
    # by tests/test_multimodal.py.
    def scalarize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "n_bytes": t["n_bytes"],
                "digest_md5": t["digest_md5"],
            }
        )

    return feats.map_batches(scalarize, batch_format="pyarrow")


def media_knn(sf_dir: str):
    """Multimodal retrieval over DECODED features — the composition the
    media plumbing exists for: payloads → decoder actor pool → top-10
    cosine neighbors of media 0's feature vector. Runs on the decoder's
    RAW integer accumulator (``feature_hist``; cosine is invariant to the
    L1 normalize), so dot products and squared norms are exact int64 on
    both sides and the DuckDB oracle — which re-derives the byte-bucket
    histogram with 16 regexp counts — matches hash-exactly. Query hist is
    built by the same actor kernel from a row-group-pruned point read and
    broadcast once; per-batch local top-k, then a global top-k."""
    import pyarrow.parquet as pq

    from camden_ray.stages.multimodal import MediaDecoderActor, media_features

    qrow = pq.read_table(
        _t(sf_dir, "documents"), columns=["doc_id", "text"],
        filters=[("doc_id", "=", 0)],
    )
    qtext = (qrow["text"][0].as_py() or "").encode()
    q = MediaDecoderActor(decoder="fake")._hist_fake(qtext)
    nq = float((q * q).sum())
    q_ref = ray.put(q)

    def to_media(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        return pa.table(
            {
                "media_id": t["doc_id"],
                "payload": txt.cast(pa.binary()),
                "media_type": pa.array(["image"] * len(t), type=pa.string()),
            }
        )

    payloads = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    feats = media_features(payloads, decoder="fake", batch_size=128,
                           concurrency=(1, 4))

    def score(t: pa.Table) -> pa.Table:
        qh = ray.get(q_ref)
        H = _emb_matrix(t["feature_hist"], dtype=np.int64)
        dot = (H * qh).sum(axis=1)
        na = (H * H).sum(axis=1)
        denom = np.sqrt(na.astype(np.float64)) * np.sqrt(nq)
        cos = np.where(
            (na > 0) & (nq > 0),
            dot / np.where(denom > 0, denom, 1.0),
            0.0,
        )
        cos_fp = _fp_round(cos, scale=100_000)
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((ids, -cos_fp))[:10]
        return pa.table(
            {"media_id": pa.array(ids[idx], type=pa.int64()),
             "cos_fp": pa.array(cos_fp[idx], type=pa.int64())}
        )

    ds = feats.map_batches(score, batch_format="pyarrow")
    return ds.sort(["cos_fp", "media_id"], descending=[True, False]).limit(10)


# above this many rows the "exact" query stops broadcasting the full matrix
# (an O(n·d) driver materialization + O(n²) compare) and delegates to the
# LSH-bucketed scale path, which holds the exact query's own oracle at every
# tested scale — so a user calling the exact entry on a corpus gets the
# bucketed plan instead of a driver OOM
_EXACT_NEARDUP_MAX_ROWS = 200_000


def embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (exact, verification-grade).

    The full (small-side) normalized matrix is broadcast once via ``ray.put``;
    each batch does one numpy matmul against it and keeps pairs with
    cos ≥ 0.4 and vec_id_a < vec_id_b (so no pair is emitted twice across
    batches). This is the distributed O(n²/B) exact path, capped at
    ``_EXACT_NEARDUP_MAX_ROWS`` rows (metadata-only check); above it the
    LSH-bucketed plan runs instead — same pair semantics, no full-matrix
    broadcast.
    """
    import pyarrow.parquet as pq

    if pq.read_metadata(_t(sf_dir, "embeddings")).num_rows > _EXACT_NEARDUP_MAX_ROWS:
        return embedding_near_dup_lsh(sf_dir)

    tbl = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    emb = _emb_matrix(tbl["embedding"])
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    state = ray.put((ids, emb / norms, emb.astype(np.float32)))
    tau_fp = 40_000  # cos >= 0.4, in 1e-5 fixed point

    def pairs(t: pa.Table) -> pa.Table:
        all_ids, En, Eraw = ray.get(state)
        bid = t["vec_id"].to_numpy(zero_copy_only=False)
        be = _emb_matrix(t["embedding"])
        bn = np.linalg.norm(be, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        # f64 matmul prefilter with slack, then DuckDB-identical f32 rescore
        est = _fp_round((be / bn) @ En.T)
        ii, jj = np.nonzero(
            (est >= tau_fp - _COS_PREFILTER_SLACK)
            & (bid[:, None] < all_ids[None, :])
        )
        if len(ii) == 0:
            return pa.table(
                {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64()),
                 "cos_fp": pa.array([], type=pa.int64())}
            )
        cos_fp = _cos_fp_f32seq(be[ii], Eraw[jj])
        keep = cos_fp >= tau_fp
        return pa.table(
            {
                "a": pa.array(bid[ii[keep]], type=pa.int64()),
                "b": pa.array(all_ids[jj[keep]], type=pa.int64()),
                "cos_fp": pa.array(cos_fp[keep], type=pa.int64()),
            }
        )

    return _read(sf_dir, "embeddings").map_batches(pairs, batch_format="pyarrow")


def embedding_near_dup_lsh(sf_dir: str):
    """LSH-bucketed embedding near-dup pairs — the SCALE path for vector
    dedup (the exact ``embedding_near_dup`` is its verification oracle).

    Random-hyperplane signatures (Charikar 2002), T=32 tables × b bits with
    b adapted to the table size (expected bucket ≈ 256 rows): each vector is
    hashed into one bucket per table; exact cosine verification runs ONLY
    inside buckets (pairwise work O(T · n · bucket) instead of O(n²)); the
    same pair surfacing from several tables is deduped by a groupby. No
    full-matrix broadcast, no driver state — embeddings travel the shuffle
    as float32 bytes. τ=0.4 matches the exact query, whose SQL doubles as
    this query's oracle: at the driver-table scales the 32 tables provably
    recover every pair (pinned by tests/test_similarity.py); at corpus
    scale b grows and recall concentrates on the high-cosine band.
    """
    import pyarrow.parquet as pq

    from camden_ray.functions.hashing import mix64
    from camden_ray.stages.candidates import default_partitions, partition_map

    TABLES = 32
    TAU_FP = 40_000
    n_rows = pq.read_metadata(_t(sf_dir, "embeddings")).num_rows
    bits = int(np.clip(np.log2(max(2, n_rows / 256)), 3, 10))
    P = default_partitions(DedupConfig())
    _TBL_SALT = np.uint64(0x9E3779B97F4A7C15)
    _PK_MIX = np.uint64(0xA24BAED4963EE407)
    planes_state: dict = {}

    def _planes(d: int) -> np.ndarray:
        # deterministic per dim: every worker builds the same planes
        r = np.random.default_rng(42)
        return r.standard_normal((TABLES, d, bits))

    def expand(t: pa.Table) -> pa.Table:
        emb = _emb_matrix(t["embedding"])
        n, d = emb.shape
        pl = planes_state.setdefault(d, _planes(d))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        pow2 = 1 << np.arange(bits)
        keys = np.empty((TABLES, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for ti in range(TABLES):
                sig = ((emb @ pl[ti]) > 0) @ pow2
                keys[ti] = mix64(
                    sig.astype(np.uint64) ^ (np.uint64(ti + 1) * _TBL_SALT)
                )
        # one binary array built straight from the float32 buffer (vectorized
        # offsets, no per-row Python bytes); repeated per table as chunks of
        # one ChunkedArray — TABLES references to one buffer, not n·TABLES
        # bytes objects
        width = d * 4
        payload = pa.py_buffer(
            np.ascontiguousarray(emb.astype(np.float32)).tobytes()
        )
        offsets = np.arange(n + 1, dtype=np.int32) * width
        emb_arr = pa.Array.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()), payload]
        )
        flat_keys = keys.reshape(-1)
        pkey = (mix64(flat_keys ^ _PK_MIX) % np.uint64(P)).view(np.int64)
        return pa.table(
            {
                "key": pa.array(flat_keys.view(np.int64), type=pa.int64()),
                "vec_id": pa.array(np.tile(ids, TABLES), type=pa.int64()),
                "emb": pa.chunked_array([emb_arr] * TABLES),
                "pkey": pa.array(pkey, type=pa.int64()),
            }
        )

    CAP = 4096  # pairwise-compared members per bucket (cf. simhash_group_cap)

    def grouper(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64()),
             "cos_fp": pa.array([], type=pa.int64())}
        )
        n = len(t)
        if n < 2:
            return empty
        t = t.combine_chunks()  # multi-key sort over the reduce concat's
        # chunks is ~2.5x the contiguous sort (see candidates.py grouper)
        order = pc.sort_indices(
            t, sort_keys=[("key", "ascending"), ("vec_id", "ascending")]
        )
        t = t.take(order)
        keys = t["key"].to_numpy()
        ids = t["vec_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, n])
        from camden_ray.stages.candidates import _binary_matrix

        emb_col = t["emb"]
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        # decode the whole partition's payload once from the Arrow data
        # buffer (embeddings are uniform-width binary), slice per bucket
        width = len(emb_col[0].as_py())
        raw_all = _binary_matrix(emb_col, width).view(np.float32)
        aa, bb, cc = [], [], []
        for gi in np.flatnonzero(sizes >= 2):
            s0, gn = int(starts[gi]), int(sizes[gi])
            for lo in range(s0, s0 + gn, CAP):
                hi = min(s0 + gn, lo + CAP)
                if hi - lo < 2:
                    continue
                raw = raw_all[lo:hi]
                mat = raw.astype(np.float64)
                norms = np.linalg.norm(mat, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                matn = mat / norms
                # f64 matmul prefilter with slack, DuckDB-identical rescore
                est = _fp_round(matn @ matn.T)
                ii, jj = np.nonzero(
                    np.triu(est >= TAU_FP - _COS_PREFILTER_SLACK, k=1)
                )
                gi_ids = ids[lo:hi]
                # de-dup identical vec_ids colliding inside one bucket
                keep = gi_ids[ii] != gi_ids[jj]
                ii, jj = ii[keep], jj[keep]
                if len(ii) == 0:
                    continue
                cos_fp = _cos_fp_f32seq(raw[ii], raw[jj])
                ok = cos_fp >= TAU_FP
                ii, jj, cos_fp = ii[ok], jj[ok], cos_fp[ok]
                a = np.minimum(gi_ids[ii], gi_ids[jj])
                b = np.maximum(gi_ids[ii], gi_ids[jj])
                aa.append(a)
                bb.append(b)
                cc.append(cos_fp)
        if not aa:
            return empty
        return pa.table(
            {"a": pa.array(np.concatenate(aa), type=pa.int64()),
             "b": pa.array(np.concatenate(bb), type=pa.int64()),
             "cos_fp": pa.array(np.concatenate(cc), type=pa.int64())}
        )

    rows = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        expand, batch_format="pyarrow"
    )
    pairs = partition_map(rows, P, grouper)
    # same pair from several tables → one row
    return pairs.groupby(["a", "b"]).aggregate(Max("cos_fp", alias_name="cos_fp"))


# ---------------------------------------------------------------------------
# dedup over the documents table (rows-only: non-SQL-expressible)
# ---------------------------------------------------------------------------


def _documents_as_webtext(sf_dir: str) -> "ray.data.Dataset":
    def conv(t: pa.Table) -> pa.Table:
        urls = [f"doc://{i}" for i in t["doc_id"].to_pylist()]
        return pa.table({"url": pa.array(urls, type=pa.string()), "text": t["text"]})

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        conv, batch_format="pyarrow"
    )


# Session-level signature-table cache: the four dedup-family queries share
# identical signature geometry (seed / shingle_k / num_perms / verify_perms /
# lgram_*; τ and methods only affect DOWNSTREAM verification), so one
# materialized table serves all of them in a bench/correctness session
# instead of re-tokenizing the corpus per query. Keyed by sf_dir + the
# signature-relevant config fields; built with the all-methods config so the
# token-hash stream column is present (a superset — extra columns are inert).
_SIG_CACHE: dict[tuple, "ray.data.Dataset"] = {}


def _doc_sig(sf_dir: str, cfg: DedupConfig) -> "ray.data.Dataset":
    from dataclasses import replace

    from camden_ray.pipelines.dedup import signature_table

    key = (
        sf_dir, cfg.seed, cfg.shingle_k, cfg.num_perms, cfg.verify_perms,
        cfg.lgram_tokens, cfg.lgram_mod,
    )
    sig = _SIG_CACHE.get(key)
    if sig is None:
        sig_cfg = replace(
            cfg,
            methods=("exact", "minhash", "simhash", "substring"),
            verify_substring_spans=True,
        )
        sig = signature_table(
            _documents_as_webtext(sf_dir), sig_cfg, extract=False
        ).materialize()
        _SIG_CACHE[key] = sig
    return sig


def _gkey_allpairs(t: pa.Table) -> pa.Table:
    """Per-partition all-pairs emission: rows (gkey, url) grouped by gkey →
    every unordered pair within a group, url-sorted so a < b. Shared by the
    minhash-twin queries and the flagship twin's band exchange."""
    empty = pa.table(
        {"a": pa.array([], type=pa.string()),
         "b": pa.array([], type=pa.string())}
    )
    if t.num_rows == 0:
        return empty
    order = pc.sort_indices(
        t, sort_keys=[("gkey", "ascending"), ("url", "ascending")]
    )
    t = t.take(order)
    g = t["gkey"].to_numpy()
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], len(g)]
    ia_parts, ib_parts = [], []
    for s, e in zip(starts.tolist(), ends.tolist()):
        m = e - s
        if m < 2:
            continue
        iu, iv = np.triu_indices(m, k=1)
        ia_parts.append(iu + s)
        ib_parts.append(iv + s)
    if not ia_parts:
        return empty
    urls = t["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ia = pa.array(np.concatenate(ia_parts))
    ib = pa.array(np.concatenate(ib_parts))
    # segment-sorted by url, so take(ia) < take(ib) lexicographically
    return pa.table({"a": urls.take(ia), "b": urls.take(ib)})


def _gkey_star(t: pa.Table) -> pa.Table:
    """Per-partition STAR emission: rows (gkey, url) grouped by gkey → one
    (hub=min url, member) edge per non-hub member. Linear in group size (no
    m² blowup on hot keys) and component-equivalent to all-pairs under
    union-find — exactly what the deterministic edge sources (shared digest,
    shared L-token gram) need, where membership itself IS the relation and
    no per-pair verification follows."""
    empty = pa.table(
        {"a": pa.array([], type=pa.string()),
         "b": pa.array([], type=pa.string())}
    )
    if t.num_rows == 0:
        return empty
    order = pc.sort_indices(
        t, sort_keys=[("gkey", "ascending"), ("url", "ascending")]
    )
    t = t.take(order)
    g = t["gkey"].to_numpy()
    n = len(g)
    starts_mask = np.r_[True, g[1:] != g[:-1]]
    run_start = np.maximum.accumulate(np.where(starts_mask, np.arange(n), 0))
    member = ~starts_mask  # everyone but the per-run hub (min url)
    if not member.any():
        return empty
    urls = t["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pa.table(
        {
            "a": urls.take(pa.array(run_start[member])),
            "b": urls.take(pa.array(np.flatnonzero(member))),
        }
    )


# Flagship twin substring geometry: any shared exact run of 15 tokens links
# two documents (the sub-document duplication signal, Lee et al. 2021 —
# span_trim removes these spans; the flagship clusters on them).
_DEDUP_TWIN_SUB_L = 15


def doc_dedup_clusters(sf_dir: str):
    """Flagship dedup — ALL FOUR methods (exact digest, MinHash+LSH with
    exact-Jaccard verification, SimHash Hamming-ball, shared-substring) over
    the documents table, composed under ONE full DuckDB oracle.

    This is the engine's complete candidate-generation → verification →
    union-find chain (the generalization of reference
    ``src/scanner.rs:17-49`` grouping + ``src/operations.rs:50`` keep-first)
    run in md5-parity twin geometry so every edge source is SQL-replicable:

    - signatures: ONE fused corpus scan (``md5_twin_signatures`` — the
      distinct-shingle md5 pass feeds both the 4×2 affine MinHash bands and
      the 64-bit majority-vote SimHash), plus the content digest;
    - exact: shared-digest groups → star edges (linear, no m² on hot keys);
    - minhash: band-bucket all-pairs through the partition_map exchange,
      deduped, then distributed exact shingle-Jaccard verification at
      τ=0.5 (co-shuffled texts — no driver corpus dict);
    - simhash: the Manku pigeonhole exchange at Hamming radius ≤ 3;
    - substring: shared exact 15-token-gram star edges (the sub-document
      duplication relation; star emission keeps hot boilerplate grams
      linear);
    - union-find over the edge union, min-url representatives, singletons
      attached via one broadcast lookup (cluster table is edge-url-sized,
      ≪ corpus; ray.put once, vectorized index_in per batch).

    Output: one row per document — (url, cluster_id, is_representative).
    The production blake2b/xxhash path (``run_dedup``) remains the bench
    headline and fixture-recall surface; this registry entry is the same
    pipeline SHAPE with oracle-replicable hashes, closing the last
    ``no_oracle`` row. Scale bounds: components run through the driver
    union-find here (edge-list-sized pull — the twin's oracle comparison
    is inherently small-scale); the production pipeline this mirrors
    switches to the distributed hash-to-min path above
    ``driver_unionfind_max_edges`` (``stages/cluster.py``,
    parity-tested), and the singleton attach switches from broadcast to a
    distributed left join above ``_ATTACH_BROADCAST_MAX_ROWS``."""
    from camden_ray.functions.hashing import (
        hash_string_column,
        md5_twin_signatures,
        mix64,
    )
    from camden_ray.stages.candidates import (
        partition_map,
        partitions_for,
        simhash_edges,
    )
    from camden_ray.stages.cluster import unionfind_table
    from camden_ray.stages.spanverify import verify_jaccard_pairs

    cfg = DedupConfig()
    k = cfg.shingle_k
    P = partitions_for(cfg, 4096)
    Pu = np.uint64(P)
    docs = _documents_as_webtext(sf_dir).materialize()

    def sig(t: pa.Table) -> pa.Table:
        urls = t["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        texts = pc.fill_null(t["text"], "")
        has, minsig, sim = md5_twin_signatures(texts.to_pylist(), k,
                                               _MINHASH_TWIN_AB)
        cols = {
            "url": urls,
            "uid": pa.array(
                hash_string_column(urls).view(np.int64), type=pa.int64()
            ),
            "simhash": pa.array(sim.view(np.int64), type=pa.int64()),
            "dkey": pa.array(
                hash_string_column(texts).view(np.int64), type=pa.int64()
            ),
            "has_min": pa.array(has),
        }
        for band in range(_MINHASH_TWIN_BANDS):
            gkey = (
                (np.uint64(band) << np.uint64(62))
                | (minsig[:, 2 * band] << np.uint64(31))
                | minsig[:, 2 * band + 1]
            )
            cols[f"mh{band}"] = pa.array(gkey.view(np.int64), type=pa.int64())
        return pa.table(cols)

    sig_ds = docs.map_batches(sig, batch_format="pyarrow").materialize()

    # --- exact: shared content digest → star edges ---
    def dkey_rows(t: pa.Table) -> pa.Table:
        dk = t["dkey"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "gkey": t["dkey"],
                "url": t["url"],
                "pkey": pa.array(
                    (mix64(dk) % Pu).view(np.int64), type=pa.int64()
                ),
            }
        )

    def exact_branch() -> "ray.data.Dataset":
        return partition_map(
            sig_ds.map_batches(dkey_rows, batch_format="pyarrow"),
            P, _gkey_star, key="pkey",
        ).materialize()

    # --- minhash: band buckets → all-pairs → dedup → exact-Jaccard τ=0.5 ---
    def band_rows(t: pa.Table) -> pa.Table:
        t = t.filter(t["has_min"])
        parts = []
        for band in range(_MINHASH_TWIN_BANDS):
            gk = t[f"mh{band}"].to_numpy(zero_copy_only=False).view(np.uint64)
            parts.append(
                pa.table(
                    {
                        "gkey": t[f"mh{band}"],
                        "url": t["url"],
                        "pkey": pa.array(
                            (mix64(gk) % Pu).view(np.int64), type=pa.int64()
                        ),
                    }
                )
            )
        if not parts:
            return pa.table(
                {"gkey": pa.array([], type=pa.int64()),
                 "url": pa.array([], type=pa.string()),
                 "pkey": pa.array([], type=pa.int64())}
            )
        return pa.concat_tables(parts)

    def minhash_branch() -> "ray.data.Dataset":
        mh_cand = (
            partition_map(
                sig_ds.map_batches(band_rows, batch_format="pyarrow"),
                P, _gkey_allpairs, key="pkey",
            )
            .groupby(["a", "b"])
            .aggregate(Count(alias_name="_nb"))
            .select_columns(["a", "b"])
            .materialize()
        )
        return verify_jaccard_pairs(
            mh_cand, docs, cfg, tau=0.5
        ).select_columns(["a", "b"]).materialize()

    # --- simhash: pigeonhole exchange at radius <= 3 ---
    def simhash_branch() -> "ray.data.Dataset":
        return simhash_edges(
            sig_ds.select_columns(["url", "uid", "simhash"]), cfg
        ).select_columns(["a", "b"]).materialize()

    # --- substring: shared exact 15-token gram → star edges ---
    def lgram_rows(t: pa.Table) -> pa.Table:
        grams, seg = _batch_ngrams(t.column("text"), _DEDUP_TWIN_SUB_L)
        urls = t["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        if not len(grams):
            return pa.table(
                {"gkey": pa.array([], type=pa.int64()),
                 "url": pa.array([], type=pa.string()),
                 "pkey": pa.array([], type=pa.int64())}
            )
        gh = hash_string_column(grams)
        # distinct (doc, gram): duplicates within a doc add only redundant
        # star edges — drop them before the exchange (exact lexsort dedupe)
        order = np.lexsort((gh, seg))
        gs, ss = gh[order], seg[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (ss[1:] != ss[:-1])]
        gh, seg = gs[keep], ss[keep]
        return pa.table(
            {
                "gkey": pa.array(gh.view(np.int64), type=pa.int64()),
                "url": urls.take(pa.array(seg)),
                "pkey": pa.array(
                    (mix64(gh) % Pu).view(np.int64), type=pa.int64()
                ),
            }
        )

    def substring_branch() -> "ray.data.Dataset":
        return partition_map(
            docs.map_batches(lgram_rows, batch_format="pyarrow"),
            P, _gkey_star, key="pkey",
        ).materialize()

    # The four edge sources are independent given (docs, sig_ds) but each
    # runs as its own streaming execution with internal barriers
    # (exchanges, the verify co-shuffle), so sequencing them stacks their
    # fixed orchestration latencies. Drive the four materializations from
    # driver threads so the cluster can overlap them. Honest measurement at
    # sf0.1/32: a modest ~4% wall gain — Ray 2.49 serializes a large share
    # of concurrent executions on the driver loop — but the branches also
    # contend less as the corpus (and task count per branch) grows, and the
    # structure documents the true dependency graph.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(b)
            for b in (exact_branch, minhash_branch, simhash_branch,
                      substring_branch)
        ]
        edges_exact, edges_min, edges_sim, edges_sub = [
            f.result() for f in futs
        ]

    tab = unionfind_table(
        edges_exact.union(edges_min, edges_sim, edges_sub)
    )
    return _attach_cluster_ids(docs.select_columns(["url"]), tab)


# above this many clustered urls the assignment table stops being a
# broadcastable small side (at high dup rates it approaches corpus size) —
# route the singleton attach through the distributed left hash_join instead
# (parity-tested with the cap forced to 0 in tests/test_flagship_twin.py)
_ATTACH_BROADCAST_MAX_ROWS = 50_000_000


def _attach_cluster_ids(
    urls_ds: "ray.data.Dataset",
    tab: "pa.Table | None",
    broadcast_max_rows: int | None = None,
):
    """(url) rows + a driver-side (url, cluster_id) assignment table →
    (url, cluster_id, is_representative) for EVERY url, singletons mapping
    to themselves. Below the cap the assignment is ``ray.put`` once and
    probed with a vectorized ``index_in`` per batch (map-only); above it,
    the broadcast regime is replaced by ``stages.cojoin.hash_join``'s left
    join — both-sides-sized movement, never driver-broadcast."""
    cap = (
        _ATTACH_BROADCAST_MAX_ROWS
        if broadcast_max_rows is None
        else broadcast_max_rows
    )

    def finalize(urls: pa.Array, cid: pa.Array) -> pa.Table:
        return pa.table(
            {
                "url": urls,
                "cluster_id": cid,
                "is_representative": pc.equal(urls, cid),
            }
        )

    if tab is not None and tab.num_rows > cap:
        from camden_ray.stages.cojoin import hash_join

        assign = ray.data.from_arrow(
            pa.table(
                {"url": tab["url"].cast(pa.string()),
                 "cluster_id": tab["cluster_id"].cast(pa.string())}
            )
        )
        joined = hash_join(
            urls_ds,
            assign,
            on="url",
            how="left",
            num_partitions=64,
            left_schema=pa.schema([("url", pa.string())]),
            right_schema=pa.schema(
                [("url", pa.string()), ("cluster_id", pa.string())]
            ),
        )

        def fin(t: pa.Table) -> pa.Table:
            urls = t["url"]
            if isinstance(urls, pa.ChunkedArray):
                urls = urls.combine_chunks()
            cid = pc.coalesce(t["cluster_id"], urls)
            if isinstance(cid, pa.ChunkedArray):
                cid = cid.combine_chunks()
            return finalize(urls, cid)

        return joined.map_batches(fin, batch_format="pyarrow")

    lookup_ref = None
    if tab is not None:
        lookup_ref = ray.put(
            (tab["url"].cast(pa.string()).combine_chunks(),
             tab["cluster_id"].cast(pa.string()).combine_chunks())
        )

    def attach(t: pa.Table) -> pa.Table:
        urls = t["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        if lookup_ref is None:
            cid = urls
        else:
            tu, tc = ray.get(lookup_ref)
            idx = pc.index_in(urls, value_set=tu)
            cid = pc.if_else(pc.is_valid(idx), pc.take(tc, idx), urls)
        return finalize(urls, cid)

    return urls_ds.map_batches(attach, batch_format="pyarrow")


def dup_group_size_histogram(sf_dir: str):
    """Cluster-size histogram over the flagship's all-method clusters — the
    corpus owner's duplication report (the reference's stdout report
    aggregates digest groups by size, ``src/reporting.rs:33``; this is that
    W1 semantics over the full four-method near-dup clustering, under the
    flagship's own oracle chain). Two tiny groupbys over the
    already-computed cluster assignment: (cluster_id → size) then
    (size → n_clusters); singletons are size-1 clusters, so the histogram
    sums to the corpus row count by construction."""
    clusters = doc_dedup_clusters(sf_dir)
    sizes = clusters.groupby("cluster_id").aggregate(
        Count(alias_name="cluster_size")
    )
    return (
        sizes.groupby("cluster_size")
        .aggregate(Count(alias_name="n_clusters"))
    )


# Fixed affine-permutation constants for the md5-parity MinHash twin
# (random.Random(4242) draw, frozen as literals so the SQL oracle embeds the
# identical values). 8 permutations = 4 bands x 2 rows.
_MINHASH_TWIN_AB = [
    (1852099020, 2037822335), (892695477, 282947329),
    (61098809, 1324107815), (838085128, 813788856),
    (689317831, 590803523), (397091626, 1107121707),
    (1060106689, 51411011), (1747350150, 1007537441),
]
_MINHASH_TWIN_BANDS = 4
_MINHASH_TWIN_ROWS = 2


def doc_minhash_pairs(sf_dir: str):
    """MinHash+LSH candidate pairs, hash-exact vs the DuckDB oracle (the
    ``doc_simhash_pairs`` md5-parity-twin recipe applied to MinHash): shingle
    base hash = ``md5_number_lower`` of the distinct word-5-gram, permutation
    j = ``(A_j * (h % M) + B_j) % M`` with ``M = 2^31 - 1`` and the fixed
    ``_MINHASH_TWIN_AB`` constants — both numpy uint64 and DuckDB UBIGINT
    evaluate this without 128-bit intermediates — signature = per-permutation
    min, banded b=4 × r=2. A band's two 31-bit row values pack EXACTLY into
    one int64 bucket key ``(band << 62) | (v0 << 31) | v1`` (no band-hash
    collision mode at all); candidate generation runs through the engine's
    partition_map exchange with all-pairs emission per bucket, and
    ``n_bands`` (distinct colliding bands per pair) is the byte-stable
    agreement measure. Docs with < 5 tokens have no shingles and emit no
    rows, matching the SQL. The production star-salted minhash path stays
    covered by doc_dedup_clusters / doc_ngram_jaccard_pairs."""
    from camden_ray.functions.hashing import md5_affine_minhash, mix64
    from camden_ray.stages.candidates import partition_map, partitions_for

    k = DedupConfig().shingle_k
    P = partitions_for(DedupConfig(), 4096)

    def band_rows(t: pa.Table) -> pa.Table:
        has, sig = md5_affine_minhash(
            t["text"].to_pylist(), k, _MINHASH_TWIN_AB
        )
        urls = pc.binary_join_element_wise(
            pa.array(["doc://"] * len(t)), pc.cast(t["doc_id"], pa.string()), ""
        ).filter(pa.array(has))
        sig = sig[has]
        n = len(urls)
        parts = []
        for band in range(_MINHASH_TWIN_BANDS):
            v0 = sig[:, 2 * band]
            v1 = sig[:, 2 * band + 1]
            gkey = (
                (np.uint64(band) << np.uint64(62))
                | (v0 << np.uint64(31))
                | v1
            )
            parts.append(
                pa.table(
                    {
                        "gkey": pa.array(gkey.view(np.int64), type=pa.int64()),
                        "url": urls,
                        "pkey": pa.array(
                            (mix64(gkey) % np.uint64(P)).view(np.int64),
                            type=pa.int64(),
                        ),
                    }
                )
            )
        if not parts:
            return pa.table(
                {"gkey": pa.array([], type=pa.int64()),
                 "url": pa.array([], type=pa.string()),
                 "pkey": pa.array([], type=pa.int64())}
            )
        return pa.concat_tables(parts)

    rows = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        band_rows, batch_format="pyarrow"
    )
    pairs = partition_map(rows, P, _gkey_allpairs, key="pkey")
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))


def doc_simhash_pairs(sf_dir: str):
    """SimHash Hamming-ball pairs (radius ≤ 3), hash-exact vs the DuckDB
    oracle. SimHash = strict-majority bit vote over the DISTINCT word-5-gram
    shingle set with md5 shingle hashes (the oracle-parity twin of the
    pipeline's blake2b simhash — same vote semantics, SQL-replicable
    hashes); candidate generation runs through the SAME two-level pigeonhole
    exchange as the dedup pipeline (Manku WWW'07 — provably complete for
    ham ≤ radius), so the oracle's all-pairs Hamming join is a true bound.
    Pairs surfacing in several pigeonhole tables are deduped; ``hamming``
    (int) is emitted instead of a float estimate so the value-hash is
    byte-stable."""
    from camden_ray.functions.hashing import hash_string_column, md5_shingle_simhash
    from camden_ray.stages.candidates import simhash_edges

    cfg = DedupConfig()
    k = cfg.shingle_k
    bits = float(cfg.simhash_bits)

    def sig(t: pa.Table) -> pa.Table:
        urls = pc.binary_join_element_wise(
            pa.array(["doc://"] * len(t)), pc.cast(t["doc_id"], pa.string()), ""
        )
        sh = md5_shingle_simhash(t["text"].to_pylist(), k)
        return pa.table(
            {
                "url": urls,
                "uid": pa.array(hash_string_column(urls).view(np.int64), type=pa.int64()),
                "simhash": pa.array(sh.view(np.int64), type=pa.int64()),
            }
        )

    sig_ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        sig, batch_format="pyarrow"
    )
    edges = simhash_edges(sig_ds, cfg)

    def to_hamming(t: pa.Table) -> pa.Table:
        ham = np.rint((1.0 - t["est"].to_numpy(zero_copy_only=False)) * bits)
        return pa.table(
            {"a": t["a"], "b": t["b"],
             "hamming": pa.array(ham.astype(np.int64), type=pa.int64())}
        )

    return (
        edges.map_batches(to_hamming, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


def doc_ngram_jaccard_pairs(sf_dir: str):
    """Brute-force-verified n-gram Jaccard pairs at τ=0.5 — the oracle-grade
    exact method, fully distributed: LSH prefilter at a low threshold, then
    exact shingle-set verification with texts co-shuffled to the partitions
    whose pairs reference them (stages/spanverify.py — no driver-side corpus
    dict, no whole-dataset broadcast)."""
    from camden_ray.pipelines.dedup import build_edges
    from camden_ray.stages.spanverify import verify_jaccard_pairs

    cfg = DedupConfig(jaccard_threshold=0.30, verify_margin=0.15, methods=("minhash",))
    docs = _documents_as_webtext(sf_dir).materialize()
    sig = _doc_sig(sf_dir, cfg)
    # distinct (a, b): the same pair surfaces once per colliding LSH band
    cand = (
        build_edges(sig, cfg)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["a", "b"])
        .materialize()
    )
    return verify_jaccard_pairs(cand, docs, cfg, tau=0.5)


def doc_minhash_clusters(sf_dir: str):
    """The COMPLETE near-dup chain — LSH candidate generation → exact
    Jaccard verification → union-find clustering — under one FULL DuckDB
    oracle. Candidates come from the md5 affine-permutation MinHash twin
    (``doc_minhash_pairs``'s hash-exact construction), verification is the
    distributed exact shingle-set Jaccard at τ=0.5 (co-shuffled texts, no
    driver corpus dict), and components take the engine's deterministic
    min-url representative. ``doc_dedup_clusters`` stays the probabilistic
    flagship; this query proves the identical pipeline SHAPE end-to-end
    hash-exact (the twin recipe extended from pairs to clusters)."""
    from camden_ray.stages.cluster import unionfind_table
    from camden_ray.stages.spanverify import verify_jaccard_pairs

    cfg = DedupConfig()
    docs = _documents_as_webtext(sf_dir).materialize()
    cand = doc_minhash_pairs(sf_dir).select_columns(["a", "b"]).materialize()
    verified = verify_jaccard_pairs(cand, docs, cfg, tau=0.5).select_columns(
        ["a", "b"]
    )
    tab = unionfind_table(verified)
    if tab is None:
        return pa.table(
            {"url": pa.array([], type=pa.string()),
             "cluster_id": pa.array([], type=pa.string())}
        )
    return pa.table(
        {"url": tab["url"].cast(pa.string()),
         "cluster_id": tab["cluster_id"].cast(pa.string())}
    )


def source_neardup_matrix(sf_dir: str):
    """Cross-source contamination forensics: for every source pair, the
    number of verified near-duplicate document pairs (exact 5-gram Jaccard
    ≥ 0.5) spanning them — the matrix a corpus owner reads to find scraped
    mirrors and shared boilerplate between feeds. Distributed shape: the
    verified pair list (pair-sized, ≪ corpus) hash-joins against the
    (doc_id, source) projection twice — two skinny shuffles — then one
    source²-bounded groupby; pair order is normalized (lexicographic
    min/max) so the matrix is upper-triangular on both sides."""
    pairs = doc_ngram_jaccard_pairs(sf_dir).select_columns(["a", "b"])
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def to_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table(
                {"ida": pa.array([], pa.int64()),
                 "idb": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "ida": pc.cast(pc.utf8_slice_codeunits(t["a"], 6), pa.int64()),
                "idb": pc.cast(pc.utf8_slice_codeunits(t["b"], 6), pa.int64()),
            }
        )

    da = docs.map_batches(
        lambda t: pa.table({"ida": t["doc_id"], "sa": t["source"]}),
        batch_format="pyarrow",
    )
    db = docs.map_batches(
        lambda t: pa.table({"idb": t["doc_id"], "sb": t["source"]}),
        batch_format="pyarrow",
    )
    # repartition compacts the exchange's schema-less zero-row blocks, which
    # Ray's hash-shuffle join cannot ingest (pair-sized data; 8 blocks match
    # the join partitioning)
    j = (
        pairs.map_batches(to_ids, batch_format="pyarrow")
        .repartition(8)
        .join(da, join_type="inner", num_partitions=8, on=("ida",))
        .join(db, join_type="inner", num_partitions=8, on=("idb",))
    )

    def norm(t: pa.Table) -> pa.Table:
        sa = t["sa"].to_numpy(zero_copy_only=False)
        sb = t["sb"].to_numpy(zero_copy_only=False)
        lo = np.where(sa <= sb, sa, sb)
        hi = np.where(sa <= sb, sb, sa)
        return pa.table(
            {"source_a": pa.array(lo, pa.string()),
             "source_b": pa.array(hi, pa.string())}
        )

    return j.map_batches(norm, batch_format="pyarrow").groupby(
        ["source_a", "source_b"]
    ).aggregate(Count(alias_name="n_pairs"))


def doc_simhash_clusters(sf_dir: str):
    """The SimHash end-to-end chain under one FULL oracle — the second
    probabilistic method's pairs → union-find composition (the
    ``doc_minhash_clusters`` recipe on the Hamming-ball candidate source):
    pairs from the md5-parity SimHash twin at radius ≤ 3, clustered with
    deterministic min-url representatives; the oracle extends the
    all-pairs Hamming SQL with the recursive-CTE transitive closure."""
    from camden_ray.stages.cluster import unionfind_table

    pairs = doc_simhash_pairs(sf_dir).select_columns(["a", "b"])
    tab = unionfind_table(pairs)
    if tab is None:
        return pa.table(
            {"url": pa.array([], type=pa.string()),
             "cluster_id": pa.array([], type=pa.string())}
        )
    return pa.table(
        {"url": tab["url"].cast(pa.string()),
         "cluster_id": tab["cluster_id"].cast(pa.string())}
    )


def doc_exact_ngram_clusters(sf_dir: str):
    """Connected-components clustering with min-url representatives over the
    two DETERMINISTIC edge sources: exact content duplicates (shared digest)
    and exact word-5-gram Jaccard ≥ 0.5 pairs.

    This is the engine's core G1+K1 semantics (reference
    ``src/scanner.rs:17-49`` grouping + ``src/operations.rs:50`` keep-first,
    made deterministic) placed under a FULL DuckDB oracle: unlike
    ``doc_dedup_clusters`` — whose minhash/simhash branches are
    probabilistic and therefore pytest-pinned — every edge here is
    SQL-reproducible, so union-find + representative selection are checked
    rows+schema+hash against a recursive-CTE transitive-closure twin.

    Output: one row per url that appears in any edge (i.e. every member of
    a non-trivial cluster), with ``cluster_id`` = lexicographic min url of
    its connected component.
    """
    from camden_ray.pipelines.dedup import build_edges
    from camden_ray.stages.cluster import unionfind_table

    cfg = DedupConfig(methods=("exact",))
    exact = build_edges(_doc_sig(sf_dir, cfg), cfg).select_columns(["a", "b"])
    ngram = doc_ngram_jaccard_pairs(sf_dir).select_columns(["a", "b"])
    tab = unionfind_table(exact.union(ngram))
    if tab is None:
        return pa.table(
            {"url": pa.array([], type=pa.string()),
             "cluster_id": pa.array([], type=pa.string())}
        )
    # unionfind_table emits large_string (2 GiB-offset safety at corpus
    # scale); cast back to string for the public/oracle schema
    return pa.table(
        {"url": tab["url"].cast(pa.string()),
         "cluster_id": tab["cluster_id"].cast(pa.string())}
    )


_SPAN_TRIM_L = 15


def doc_span_trim(sf_dir: str):
    """Span-trimmed corpus output (Lee et al. 2021; stages/spantrim.py —
    the sub-document generalization of W3's move-duplicates,
    /root/reference/src/operations.rs:40-64) under a FULL DuckDB oracle:
    every token span ≥ L=15 that also appears in an earlier document
    (winner = min doc_id containing the gram) is cut from the later doc.
    Projection emitted for the oracle: per doc, its token count, the number
    of removed tokens, and the md5 of the space-joined kept tokens — the
    cleaned text itself plus exact removed byte extents stay on the stage
    API (pytest-pinned in tests/test_spantrim.py)."""
    from camden_ray.stages.candidates import partitions_for
    from camden_ray.stages.spantrim import span_trim

    P = partitions_for(DedupConfig(), 4096)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = span_trim(docs, _SPAN_TRIM_L, P, key="doc_id", text="text")
    return out.select_columns(["doc_id", "n_tokens", "n_removed", "cleaned_md5"])


def corpus_span_dup_rate(sf_dir: str):
    """Corpus-level duplication headline (the Lee-et-al number a corpus
    owner reports): one row of (n_docs, total_tokens, removed_tokens,
    dup_rate_fp) aggregated from the span-trim operator — dup_rate_fp =
    round(removed/total × 1e6), half away from zero on both sides."""
    out = doc_span_trim(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_docs": pa.array([len(t)], type=pa.int64()),
                "total_tokens": pa.array(
                    [int(pc.sum(t["n_tokens"]).as_py() or 0)], type=pa.int64()
                ),
                "removed_tokens": pa.array(
                    [int(pc.sum(t["n_removed"]).as_py() or 0)], type=pa.int64()
                ),
            }
        )

    df = out.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_docs = int(df["n_docs"].sum())
    tot = int(df["total_tokens"].sum())
    rem = int(df["removed_tokens"].sum())
    rate = _fp_round(
        np.array([rem / tot if tot else 0.0]), scale=1_000_000
    )[0]
    return pa.table(
        {
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "total_tokens": pa.array([tot], type=pa.int64()),
            "removed_tokens": pa.array([rem], type=pa.int64()),
            "dup_rate_fp": pa.array([int(rate)], type=pa.int64()),
        }
    )


def doc_quality_rep_clusters(sf_dir: str):
    """Quality-aware representative selection (K1 generalized twice: camden's
    arrival-order keep-first → deterministic min-url → keep the BEST member)
    under a FULL DuckDB oracle.

    Clusters = connected components over the two deterministic edge sources
    (exact digest + exact 5-gram Jaccard ≥ 0.5 — the doc_exact_ngram_clusters
    graph); cluster_id = the member with the highest fixed-point quality
    score (doc_quality's oracle-proven ×1e6 score), min-url tiebreak. Runs
    the SAME skey mechanism as the pipeline's ``representative="quality"``
    mode (stages/cluster.quality_rep_view packing): endpoints are mapped to
    ``f"{9999999-q:07d}|url"`` keys, the unchanged min-label union-find picks
    the argmax-quality rep, and the fixed-width prefix is stripped.

    The (url → skey) map here is broadcast once (documents-table-sized at
    registry scale); the pipeline path instead carries ``q`` as a signature
    column so no broadcast grows with the corpus.
    """
    from camden_ray.functions.text import batch_quality_features
    from camden_ray.pipelines.dedup import build_edges
    from camden_ray.stages.cluster import REP_PREFIX_LEN, unionfind_table

    cfg = DedupConfig(methods=("exact",))
    exact = build_edges(_doc_sig(sf_dir, cfg), cfg).select_columns(["a", "b"])
    ngram = doc_ngram_jaccard_pairs(sf_dir).select_columns(["a", "b"])
    edges = exact.union(ngram)

    def score_rows(t: pa.Table) -> pa.Table:
        urls = pc.binary_join_element_wise(
            pa.array(["doc://"] * len(t)), pc.cast(t["doc_id"], pa.string()), ""
        )
        q = _fp_round(
            batch_quality_features(t["text"])["quality_score"], scale=1_000_000
        )
        inv = 9_999_999 - np.clip(q, 0, 1_000_000)
        pad = pc.utf8_lpad(
            pc.cast(pa.array(inv, type=pa.int64()), pa.string()), 7, "0"
        )
        skey = pc.binary_join_element_wise(pad, urls, "|")
        return pa.table({"url": urls, "skey": skey})

    smap_tabs = [
        t
        for t in ray.get(
            _read(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(score_rows, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not smap_tabs:  # empty documents table: no edges, no clusters
        return pa.table(
            {"url": pa.array([], type=pa.string()),
             "cluster_id": pa.array([], type=pa.string())}
        )
    smap = pa.concat_tables(smap_tabs).combine_chunks()
    order = pc.sort_indices(smap["url"])
    s_urls = smap["url"].take(order).combine_chunks()
    s_keys = smap["skey"].take(order).combine_chunks()
    smap_ref = ray.put((s_urls, s_keys))

    def to_skey(t: pa.Table) -> pa.Table:
        su, sk = ray.get(smap_ref)
        out = {}
        for c in ("a", "b"):
            idx = pc.index_in(t[c], value_set=su)
            out[c] = sk.take(idx)
        return pa.table(out)

    tab = unionfind_table(edges.map_batches(to_skey, batch_format="pyarrow"))
    if tab is None:
        return pa.table(
            {"url": pa.array([], type=pa.string()),
             "cluster_id": pa.array([], type=pa.string())}
        )
    return pa.table(
        {
            "url": pc.utf8_slice_codeunits(
                tab["url"], REP_PREFIX_LEN, 1 << 30
            ).cast(pa.string()),
            "cluster_id": pc.utf8_slice_codeunits(
                tab["cluster_id"], REP_PREFIX_LEN, 1 << 30
            ).cast(pa.string()),
        }
    )


def doc_incremental_clusters(sf_dir: str):
    """Incremental exact dedup over documents: rows whose ``md5(url)`` first
    hex digit is 0-2 (~19 %) form the "new shard"; the rest are the base
    corpus. The base corpus is deduped with :func:`run_dedup`
    (methods=exact), then the new shard is attached with
    :func:`run_dedup_incremental` — new docs ADOPT existing cluster ids
    (the stability contract of pipelines/incremental.py), unmatched new
    docs cluster among themselves under the min new url.

    Exact-method semantics are SQL-expressible, so this query pins the
    incremental path under the full DuckDB oracle: cluster_id =
    min base url sharing the text, else min new url sharing the text.
    """
    import hashlib

    from camden_ray.pipelines.dedup import run_dedup
    from camden_ray.pipelines.incremental import run_dedup_incremental

    cfg = DedupConfig(methods=("exact",))

    def _split(new: bool):
        def f(t: pa.Table) -> pa.Table:
            urls = t["url"].to_pylist()
            m = np.fromiter(
                (hashlib.md5(u.encode()).hexdigest()[0] in "012" for u in urls),
                dtype=bool, count=len(urls),
            )
            return t.filter(pa.array(m if new else ~m))
        return f

    docs = _documents_as_webtext(sf_dir)
    base = run_dedup(
        None, cfg, extract=False,
        input_ds=docs.map_batches(_split(False), batch_format="pyarrow"),
    )
    inc = run_dedup_incremental(
        None,
        base_sig=base["signatures"],
        base_clusters=base["clusters"],
        cfg=cfg,
        extract=False,
        new_input_ds=docs.map_batches(_split(True), batch_format="pyarrow"),
    )
    return inc["clusters"]


# ---------------------------------------------------------------------------
# window-lag / pivot / anti-join / sketch operators (round-4 session-6)
# ---------------------------------------------------------------------------


def events_user_lag(sf_dir: str):
    """LAG window — SQL's ``LAG(...) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)``: per event, the microsecond gap to the user's previous event
    and that event's value (cents); NULL on each user's first row. Same
    irreducible key-partitioned shuffle as :func:`events_user_cumsum` (rows
    of one user must co-locate — that IS the semantics); the lag itself is
    one vectorized shift per group, no per-row loop."""

    def win(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = t.take(order)
        ts = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(ts)
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            gap[1:] = ts[1:] - ts[:-1]
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
        # prev value keeps SQL LAG's null semantics: the previous ROW's
        # value, null if that value is null OR this is the first row —
        # so cents keeps its nulls (no fill_null) and shifts by one
        cents = _cents(t["value"])
        if isinstance(cents, pa.ChunkedArray):
            cents = cents.combine_chunks()
        prev = pa.concat_arrays([pa.nulls(1, pa.int64()), cents.slice(0, n - 1)])
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "gap_us": pa.array(gap, type=pa.int64(), mask=first),
                "prev_value_cents": prev,
            }
        )

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return ds.groupby("user_id").map_groups(win, batch_format="pyarrow")


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str):
    """Pivot / conditional aggregation: the hour-of-day × event-type count
    matrix as wide columns (SQL's ``SUM(CASE WHEN ...)`` pivot — a class Ray
    Data has no native operator for). Scale shape: each block reduces to ONE
    24-row partial (vectorized ``bincount`` per type), so the groupby-sum
    moves blocks × 24 rows no matter the corpus size; hours absent from the
    data are dropped after the aggregate to match GROUP BY semantics."""

    def part(t: pa.Table) -> pa.Table:
        # a null ts yields a null hour → NaN → astype(int64) is undefined and
        # np.bincount raises on the negative; mask null-ts rows out up front.
        # Documented contract vs the oracle: the oracle emits a NULL-hour
        # group for null ts, this operator drops those rows (events.ts is
        # NOT NULL in the driver tables, asserted nowhere cheaper than here).
        if t["ts"].null_count:
            t = t.filter(pc.is_valid(t["ts"]))
        h = pc.hour(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "hour": pa.array(np.arange(24, dtype=np.int64)),
            "n_total": pa.array(np.bincount(h, minlength=24).astype(np.int64)),
        }
        for name in _PIVOT_TYPES:
            m = pc.fill_null(pc.equal(t["event_type"], name), False).to_numpy(
                zero_copy_only=False
            )
            cols[f"n_{name}"] = pa.array(
                np.bincount(h[m], minlength=24).astype(np.int64)
            )
        return pa.table(cols)

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    aggs = [Sum("n_total", alias_name="n_total")] + [
        Sum(f"n_{n}", alias_name=f"n_{n}") for n in _PIVOT_TYPES
    ]
    out = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(*aggs)
    )
    return out.filter(expr="n_total > 0")


# above this many distinct probe keys the anti-join broadcast would hold a
# driver/object-store array too big to ship whole — route through the
# distributed hash_join anti path instead (parity-tested with the cap at 0)
_ANTI_BROADCAST_MAX_KEYS = 50_000_000


def customers_without_orders(sf_dir: str):
    """Distributed ANTI-join: customers that never placed an URGENT-priority
    order (SQL's ``NOT IN`` / anti-semi-join — the join class the registry
    lacked; the priority predicate keeps the result non-degenerate on the
    driver tables, where every customer has ~10 orders). Scale shape: the
    orders side collapses to per-block DISTINCT key partials (≤
    key-domain-sized, fact row count irrelevant), unioned and broadcast
    ONCE via ``ray.put``; the customer scan is then map-only with a
    vectorized ``searchsorted`` miss test. Above
    ``_ANTI_BROADCAST_MAX_KEYS`` distinct probe keys the broadcast regime
    is replaced IN CODE by ``stages.cojoin.hash_join(how="anti")`` — the
    co-partition exchange whose movement is both-sides-sized but never
    driver-resident (parity-tested against the broadcast path with the cap
    forced to 0)."""
    from camden_ray.stages.cojoin import hash_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def urgent_keys(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(t["o_orderpriority"], "1-URGENT"), False)
        # NULL keys never match under NOT EXISTS semantics (the oracle's
        # form) — drop them from the probe side
        return pa.table(
            {"k": pc.drop_null(pc.unique(t.filter(m)["o_custkey"]))}
        )

    # materialize the distinct-key partials ONCE: the cap decision (count)
    # and the chosen path both consume them; without this the orders scan
    # + distinct reduce (the op's dominant cost) would execute twice
    key_parts = orders.map_batches(
        urgent_keys, batch_format="pyarrow"
    ).materialize()
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])

    # cheap decision on the materialized partials: row count, not the keys
    n_keys = key_parts.count()
    if n_keys > _ANTI_BROADCAST_MAX_KEYS:
        from camden_ray.stages.candidates import default_partitions

        probe = key_parts.map_batches(
            lambda t: pa.table({"c_custkey": t["k"]}), batch_format="pyarrow"
        )
        return hash_join(
            cust,
            probe,
            on="c_custkey",
            how="anti",
            num_partitions=default_partitions(DedupConfig()),
            right_schema=pa.schema([("c_custkey", pa.int64())]),
        )

    parts = [
        b["k"].to_numpy(zero_copy_only=False)
        for b in key_parts.iter_batches(batch_format="pyarrow")
    ]
    keys = (
        np.unique(np.concatenate(parts))
        if parts
        else np.empty(0, dtype=np.int64)
    )
    ref = ray.put(keys)

    def anti(t: pa.Table) -> pa.Table:
        arr = ray.get(ref)  # zero-copy plasma read, once per task
        kcol = t["c_custkey"]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        # null customer keys are always unmatched (NOT EXISTS semantics);
        # fill before to_numpy to dodge the int64→float64 null trap
        valid = (
            pc.is_valid(kcol).to_numpy(zero_copy_only=False)
            if kcol.null_count
            else np.ones(len(kcol), dtype=bool)
        )
        ks = pc.fill_null(kcol, 0).to_numpy(zero_copy_only=False)
        if len(arr) == 0:
            return t
        pos = np.searchsorted(arr, ks)
        pos_c = np.minimum(pos, len(arr) - 1)
        hit = (pos < len(arr)) & (arr[pos_c] == ks) & valid
        return t.filter(pa.array(~hit))

    return cust.map_batches(anti, batch_format="pyarrow")


_KMV_K = 64


def events_approx_distinct(sf_dir: str):
    """Approximate COUNT DISTINCT via a deterministic KMV (k-minimum-values)
    sketch (Bar-Yossef et al. 2002): per-block partial = the k smallest
    md5-derived 64-bit hashes of the key's DISTINCT values; partials merge
    by union + truncate (a mergeable O(k) sketch — the approximate-aggregate
    class a 100-TB key domain needs when even the distinct keys no longer
    fit a shuffle); estimate = (k−1)·2⁶⁴ // (h_k + 1) in EXACT integer math,
    so the DuckDB oracle (the same k-th order statistic over the same hash
    domain, HUGEINT arithmetic) matches hash-exactly. When fewer than k
    distinct hashes exist the sketch is the exact distinct set."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def part(t: pa.Table) -> pa.Table:
        # drop_null BEFORE to_numpy: a nullable int64 column converts to
        # float64+NaN (int(u) raises, large ids round); after drop_null the
        # conversion stays exact int64, matching the oracle's NULL-skipping
        # md5(CAST(user_id AS VARCHAR)).
        ids = pc.drop_null(t["user_id"]).combine_chunks()
        uu = np.unique(ids.to_numpy(zero_copy_only=False))
        hs = np.sort(
            np.fromiter(
                (
                    int(hashlib.md5(str(int(u)).encode()).hexdigest()[:16], 16)
                    for u in uu
                ),
                dtype=np.uint64,
                count=len(uu),
            )
        )
        return pa.table({"h": pa.array(hs[:_KMV_K], type=pa.uint64())})

    parts = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    )[:_KMV_K]
    if len(merged) < _KMV_K:
        est = len(merged)
    else:
        est = ((_KMV_K - 1) << 64) // (int(merged[-1]) + 1)
    return pa.table(
        {
            "k": pa.array([_KMV_K], pa.int64()),
            "est": pa.array([est], pa.int64()),
        }
    )


_HH_K = 500  # heavy hitter = token with count·K > total tokens


def corpus_heavy_hitters(sf_dir: str):
    """Frequent-items sketch with exact verification — corpus tokens whose
    global count exceeds total/K (Misra-Gries class). Scale shape that
    avoids the vocabulary-sized shuffle of ``corpus_vocab_stats``: (1) each
    block emits only its LOCAL heavy candidates (cnt_b·K > T_b — by
    pigeonhole any global heavy hitter is locally heavy in ≥ 1 block, so
    the union is a guaranteed superset, < K rows per block); (2) the
    candidate set is broadcast once and counted EXACTLY in a second
    map-only pass (``index_in`` + ``bincount`` partials, candidate-sized
    groupby-sum); (3) the global-total filter applies the strict ``cnt·K >
    T`` rule. Exact counts in, exact rows out — the sketch only bounds what
    moves."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def local_heavy(t: pa.Table) -> pa.Table:
        grams, _ = _batch_ngrams(t.column("text"), 1)
        if not len(grams):
            return pa.table({"tk": pa.array([], pa.string())})
        vc = grams.value_counts()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        tb = int(cnts.sum())
        keep = cnts * _HH_K > tb
        vals = vc.field("values")
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        return pa.table({"tk": vals.filter(pa.array(keep))})

    cand = sorted(
        {
            v
            for b in ds.map_batches(
                local_heavy, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            for v in b["tk"].to_pylist()
        }
    )
    cand_arr = pa.array(cand, type=pa.string())
    cand_ref = ray.put(cand_arr)

    def count_part(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        grams, _ = _batch_ngrams(t.column("text"), 1)
        nb = int(len(grams))
        cnts = np.zeros(len(cands), dtype=np.int64)
        if nb and len(cands):
            idx = pc.index_in(grams, value_set=cands)
            hits = pc.drop_null(idx).to_numpy(zero_copy_only=False)
            cnts = np.bincount(hits, minlength=len(cands)).astype(np.int64)
        return pa.table(
            {
                "i": pa.array(np.arange(len(cands), dtype=np.int64)),
                "cnt": pa.array(cnts),
                "tb": pa.array(np.full(len(cands), nb, dtype=np.int64)),
            }
        )

    summed = (
        ds.map_batches(count_part, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("tb", alias_name="tb"))
        .take_all()  # candidate-sized (< K per block, deduped)
    )
    if not summed:
        return pa.table(
            {"tk": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    total = sum(r["tb"] for r in summed) // max(len(summed), 1)
    rows = [
        (cand[r["i"]], r["cnt"]) for r in summed if r["cnt"] * _HH_K > total
    ]
    return pa.table(
        {
            "tk": pa.array([r[0] for r in rows], pa.string()),
            "cnt": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


_STOPWORD_RE = r"\b(the|a|an|of|to|in|and|is)\b"


def doc_stopword_strip(sf_dir: str):
    """Corpus-hygiene rewrite: strip stopwords and collapse whitespace,
    emitting the cleaned text's md5 and the removed-token count — the
    text-normalization class (regex rewrite) of an indexing/training
    pipeline. Map-only, zero shuffle; pyarrow's regex kernels are RE2,
    the same engine DuckDB binds, so the rewrite is byte-identical to the
    oracle's ``regexp_replace(..., 'g')`` chain."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        stripped = pc.replace_substring_regex(
            txt, pattern=_STOPWORD_RE, replacement=""
        )
        collapsed = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(stripped, pattern=r"\s+", replacement=" ")
        )
        n_rem = pc.count_substring_regex(txt, pattern=_STOPWORD_RE)
        md5s = [
            hashlib.md5(s.encode()).hexdigest()
            for s in collapsed.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_md5": pa.array(md5s, pa.string()),
                "n_removed": n_rem.cast(pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def orders_customer_join(sf_dir: str):
    """Distributed hash INNER join (the generic two-sided shuffle join,
    ``stages.cojoin.hash_join``): every order enriched with its customer's
    name and segment — fact × dim co-partitioned on the key, per-partition
    vectorized range match, duplicate-tolerant on both sides. This is the
    join shape for dim sides too big to broadcast; ``orders_top_revenue``
    shows the broadcast-semi + native alternatives."""
    from camden_ray.stages.candidates import default_partitions
    from camden_ray.stages.cojoin import hash_join

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "total_cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "c_mktsegment": t["c_mktsegment"],
            }
        ),
        batch_format="pyarrow",
    )
    P = default_partitions(DedupConfig())
    return hash_join(orders, cust, on="custkey", how="inner", num_partitions=P)


def customer_urgent_counts(sf_dir: str):
    """Distributed hash LEFT join: every customer with their URGENT-order
    count, NULL where none (SQL LEFT JOIN null semantics preserved end to
    end). The orders side pre-reduces to one (custkey, n_urgent) row per
    key BEFORE the join — the combine-then-join plan that keeps the
    exchange key-domain-sized."""
    from camden_ray.stages.candidates import default_partitions
    from camden_ray.stages.cojoin import hash_join

    counts = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda t: pa.table(
                {
                    "custkey": t.filter(
                        pc.fill_null(
                            pc.equal(t["o_orderpriority"], "1-URGENT"), False
                        )
                    )["o_custkey"]
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("custkey")
        .aggregate(Count(alias_name="n_urgent"))
    )
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name"]
    ).map_batches(
        lambda t: pa.table(
            {"custkey": t["c_custkey"], "c_name": t["c_name"]}
        ),
        batch_format="pyarrow",
    )
    P = default_partitions(DedupConfig())
    return hash_join(
        cust,
        counts,
        on="custkey",
        how="left",
        num_partitions=P,
        right_schema=pa.schema(
            [("custkey", pa.int64()), ("n_urgent", pa.int64())]
        ),
    )


def orders_priority_rollup(sf_dir: str):
    """ROLLUP aggregation — SQL's ``GROUP BY ROLLUP(priority, status)``:
    per-(priority, status) totals, per-priority subtotals, and the grand
    total in one result, NULL marking each rolled-up level. Scale shape:
    ONE fine-grained groupby (the only corpus-sized shuffle), then the
    subtotal and grand-total levels reduce the already-tiny fine result —
    the classic rollup-from-finest-level plan, no second pass over the
    fact table."""
    ds = _read(
        sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderstatus": t["o_orderstatus"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    fine = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
        .take_all()  # (priority × status)-sized: ≤ 15 rows at any corpus size
    )
    # SQL SUM semantics at the rollup levels: NULL addends (a fine group
    # whose o_totalprice values were all NULL) are skipped, and a subtotal
    # is itself NULL only when EVERY contributing fine sum is NULL — mirror
    # that with None-tracking instead of bare `+=` (which would raise on the
    # first NULL group sum).
    pr: dict = {}
    tot_n, tot_c = 0, None
    for r in fine:
        key = r["o_orderpriority"]
        a = pr.setdefault(key, [0, None])
        a[0] += r["n"]
        s = r["sum_cents"]
        if s is not None:
            a[1] = s if a[1] is None else a[1] + s
            tot_c = s if tot_c is None else tot_c + s
        tot_n += r["n"]
    rows = [
        (r["o_orderpriority"], r["o_orderstatus"], r["n"], r["sum_cents"])
        for r in fine
    ]
    rows += [(k, None, a[0], a[1]) for k, a in pr.items()]
    # the () grouping set exists even over an EMPTY table (SQL ROLLUP emits
    # one grand-total row with n=0 and a NULL sum)
    rows.append((None, None, tot_n, tot_c))
    return pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "sum_cents": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def events_value_rank(sf_dir: str):
    """Value-ordered ranking window — SQL's ``RANK()`` and ``DENSE_RANK()
    OVER (PARTITION BY user_id ORDER BY value)``, the tie-semantics window
    class (peers share a rank; RANK leaves gaps, DENSE_RANK does not;
    NULL values sort last and are peers of each other, DuckDB's default).
    Key-partitioned ``map_groups``; the rank kernel is one sort + one
    run-boundary scan per group, fully vectorized."""

    def win(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("value", "ascending")], null_placement="at_end"
        )
        t = t.take(order)
        v = t["value"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        n = len(v)
        vals = v.to_numpy(zero_copy_only=False)  # float64, NaN for nulls
        # NULL and a stored NaN VALUE are distinct peer groups in SQL
        # (Arrow's sort also separates them: NaN after numbers, nulls
        # last) — track validity so only null-null and NaN-NaN pairs
        # merge, never null-NaN
        isnull = (
            pc.is_null(v).to_numpy(zero_copy_only=False)
            if v.null_count
            else np.zeros(n, dtype=bool)
        )
        real_nan = np.isnan(vals) & ~isnull
        peers_special = np.r_[
            False,
            (real_nan[1:] & real_nan[:-1]) | (isnull[1:] & isnull[:-1]),
        ]
        # a float compare against NaN is True under !=, so NaN-NaN (and
        # null-null) pairs must be cleared explicitly to stay peers
        new_run = np.r_[True, vals[1:] != vals[:-1]]
        new_run &= ~peers_special
        new_run[0] = True
        starts = np.flatnonzero(new_run)
        runs = np.diff(np.r_[starts, n])
        rank = np.repeat(starts + 1, runs)
        dense = np.repeat(np.arange(1, len(starts) + 1), runs)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value_rank": pa.array(rank, pa.int64()),
                "value_dense_rank": pa.array(dense, pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return ds.groupby("user_id").map_groups(win, batch_format="pyarrow")


def embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION vector aggregates over the embedding column (the
    array/list aggregate class): n, fixed-point sum, min, max for each of
    the d dimensions. Scale shape: each block reduces its (n_block × d)
    zero-copy matrix to ONE d-row partial (vectorized column reductions),
    so the groupby moves blocks × d rows regardless of corpus size.
    Fixed-point ×1e6 on the float32→float64-exact values makes the sums
    order-independent integers — bit-identical to the oracle's
    generate_series/list_extract twin."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def part(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t["embedding"])  # float32 → float64, exact
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_fp": pa.array([], pa.int64()),
                    "min_fp": pa.array([], pa.int64()),
                    "max_fp": pa.array([], pa.int64()),
                }
            )
        fp = _fp_round(m.ravel(), 1_000_000).reshape(m.shape)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n": pa.array(np.full(d, m.shape[0], dtype=np.int64)),
                "sum_fp": pa.array(fp.sum(axis=0, dtype=np.int64)),
                "min_fp": pa.array(fp.min(axis=0).astype(np.int64)),
                "max_fp": pa.array(fp.max(axis=0).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_fp", alias_name="sum_fp"),
            Min("min_fp", alias_name="min_fp"),
            Max("max_fp", alias_name="max_fp"),
        )
    )


def embedding_gram(sf_dir: str):
    """Distributed Gram-matrix accumulator ``G = XᵀX`` over the quantized
    embedding column — the second-moment sufficient statistic behind PCA /
    covariance whitening of an embedding corpus (cov = (G − n·μμᵀ)/n with
    μ from ``embedding_dim_stats``; kept as exact integer raw moments
    because the centering division is the only non-integer step).

    Scale shape: each block reduces its (n_block × d) zero-copy matrix to
    ONE d×d int64 partial via an integer matmul, so the groupby moves
    blocks × d(d+1)/2 rows no matter the corpus size — the canonical
    mergeable-moment pattern. Exact: quantized |iv| ≤ ~5.3e5 at d=64 keeps
    even a 10^10-row global sum below 2^63. Upper triangle emitted (G is
    symmetric); hash-exact DuckDB oracle via a positional-unnest self-join
    twin."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def part(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t["embedding"])
        if m.size == 0:
            return pa.table(
                {
                    "dim_i": pa.array([], pa.int64()),
                    "dim_j": pa.array([], pa.int64()),
                    "sxy_fp": pa.array([], pa.int64()),
                }
            )
        fp = _fp_round(m.ravel(), 1_000_000).reshape(m.shape).astype(np.int64)
        # int64 matmul has no BLAS path in numpy (naive loops, ~5x slower);
        # run BLAS float64 matmuls over row chunks sized so every partial
        # sum stays an exact float64 integer (< 2^53), accumulating int64
        vmax = float(np.abs(fp).max() or 1)
        chunk = max(1, int((1 << 53) / (vmax * vmax)))
        d = fp.shape[1]
        G = np.zeros((d, d), dtype=np.int64)
        for s in range(0, fp.shape[0], chunk):
            blk = fp[s : s + chunk].astype(np.float64)
            G += (blk.T @ blk).astype(np.int64)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "dim_i": pa.array((iu + 1).astype(np.int64)),
                "dim_j": pa.array((ju + 1).astype(np.int64)),
                "sxy_fp": pa.array(G[iu, ju]),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["dim_i", "dim_j"])
        .aggregate(Sum("sxy_fp", alias_name="sxy_fp"))
    )


def supplier_nation_revenue(sf_dir: str):
    """Revenue per nation through its suppliers — a 3-table star pipeline
    (lineitem fact × supplier × nation dims) completing driver-table
    coverage: every table the driver ships now has a registry consumer.
    Scale shape: the fact side pre-reduces per block to (suppkey, cents)
    partials, ONE supplier-domain-sized groupby, then the two tiny dims
    (supplier→nation, nation→name) broadcast once via ``ray.put`` for a
    map-only enrich; the final groupby is nation-sized. n_suppliers =
    COUNT(DISTINCT suppkey with sales) falls out of the supplier-grain
    intermediate for free."""
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "price_c": _cents(t["l_extendedprice"]),
            }
        )
        g = tmp.group_by(["l_suppkey"]).aggregate([("price_c", "sum")])
        return g.rename_columns(["l_suppkey", "sum_price_cents"])

    per_supp = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_suppkey")
        .aggregate(Sum("sum_price_cents", alias_name="sum_price_cents"))
    )

    supp = pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(sk)
    s_sorted = sk[order]
    s_nation = supp["s_nationkey"].to_numpy(zero_copy_only=False)[order]
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    norder = np.argsort(nk)
    n_sorted = nk[norder]
    n_names = nat["n_name"].combine_chunks().take(pa.array(norder))
    dims_ref = ray.put((s_sorted, s_nation, n_sorted, n_names))

    def enrich(t: pa.Table) -> pa.Table:
        s_keys, s_nat, n_keys, names = ray.get(dims_ref)
        ks = t["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(s_keys, ks)
        pos_c = np.minimum(pos, max(len(s_keys) - 1, 0))
        ok = (
            (pos < len(s_keys)) & (s_keys[pos_c] == ks)
            if len(s_keys)
            else np.zeros(len(ks), dtype=bool)
        )
        # inner-join semantics: a fact suppkey missing from the dim drops
        t = t.filter(pa.array(ok))
        natk = s_nat[pos_c[ok]]
        npos = np.searchsorted(n_keys, natk)
        npos_c = np.minimum(npos, max(len(n_keys) - 1, 0))
        nok = (
            (npos < len(n_keys)) & (n_keys[npos_c] == natk)
            if len(n_keys)
            else np.zeros(len(natk), dtype=bool)
        )
        t = t.filter(pa.array(nok))
        return pa.table(
            {
                "n_name": names.take(pa.array(npos_c[nok])),
                "sum_price_cents": t["sum_price_cents"],
            }
        )

    return (
        per_supp.map_batches(enrich, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
        )
    )


def events_user_setops(sf_dir: str):
    """Set operations over derived key sets — EXCEPT and INTERSECT in one
    result: viewers vs purchasers classified as view_only / purchase_only /
    both (the FULL OUTER of the two DISTINCT sets). The set-ops class the
    599-line reference has no implementation of (SURVEY §2 'categories with
    NO reference implementation'). Scale shape: per-block DISTINCT
    membership-flag partials, ONE key-domain-sized groupby-max — the event
    fact table is never re-shuffled and no set is driver-resident."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def flags(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        isv = pc.fill_null(pc.equal(et, "view"), False).to_numpy(
            zero_copy_only=False
        )
        isp = pc.fill_null(pc.equal(et, "purchase"), False).to_numpy(
            zero_copy_only=False
        )
        ucol = t["user_id"]
        if isinstance(ucol, pa.ChunkedArray):
            ucol = ucol.combine_chunks()
        # NULL user ids belong to no set (SQL NULL never equals NULL in the
        # oracle's FULL OUTER join key, and the int64→float64 null trap
        # would corrupt the ids) — excluded on both sides
        uvalid = (
            pc.is_valid(ucol).to_numpy(zero_copy_only=False)
            if ucol.null_count
            else np.ones(len(ucol), dtype=bool)
        )
        us = pc.fill_null(ucol, 0).to_numpy(zero_copy_only=False)
        keep = (isv | isp) & uvalid
        us, isv, isp = us[keep], isv[keep], isp[keep]
        uu, inv = np.unique(us, return_inverse=True)
        v = np.zeros(len(uu), dtype=np.int64)
        p = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(v, inv, isv.astype(np.int64))
        np.maximum.at(p, inv, isp.astype(np.int64))
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "v": pa.array(v),
                "p": pa.array(p),
            }
        )

    agg = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("v", alias_name="v"), Max("p", alias_name="p"))
    )

    def label(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(bool)
        p = t["p"].to_numpy(zero_copy_only=False).astype(bool)
        lab = np.where(v & p, "both", np.where(v, "view_only", "purchase_only"))
        return pa.table(
            {"user_id": t["user_id"], "set_op": pa.array(lab, pa.string())}
        )

    return agg.map_batches(label, batch_format="pyarrow")


def orders_monthly(sf_dir: str):
    """Calendar truncation aggregate — monthly order volume and revenue
    (SQL's ``date_trunc('month', ...)`` time-series rollup; the hourly
    cousin is ``events_hourly``). Month key = year·100+month as an int64
    (identical arithmetic on both engines, no timezone/locale surface).
    Per-block combiner: Arrow year/month kernels + one group_by per batch,
    then a months-sized groupby-sum."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"]).cast(pa.int64())
        m = pc.month(t["o_orderdate"]).cast(pa.int64())
        tmp = pa.table(
            {
                "ym": pc.add(pc.multiply(y, 100), m),
                "cents": _cents(t["o_totalprice"]),
            }
        )
        g = tmp.group_by(["ym"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["ym", "sum_cents", "n"])

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


def corpus_chars_quantile_cont(sf_dir: str):
    """INTERPOLATED percentiles (the ``quantile_cont`` class; the disc
    cousin is :func:`corpus_token_quantiles`) of document length, in EXACT
    integer fixed-point: position p = q·(n−1) splits into lo = ⌊p⌋ and a
    rational remainder r/100, and the interpolated value ×100 is
    v_lo·(100−r) + v_hi·r — a closed form with NO float arithmetic
    anywhere, so the SQL twin (row_number + the same integer form) matches
    hash-exactly with no last-ulp exposure (the reason
    corpus_token_quantiles chose disc semantics; this closes the cont
    half). Same scale shape: one value-histogram groupby, driver reads the
    two neighboring order statistics off the cumulative."""
    hist = (
        _read(sf_dir, "documents", columns=["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    hist = hist.dropna(subset=["n_chars"]).sort_values("n_chars")
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    cum = hist["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pd.DataFrame(
            {"n_docs": [], "p50_x100": [], "p90_x100": []}
        ).astype("int64")

    def at_rank(k: int) -> int:  # k is 0-based
        return int(vals[np.searchsorted(cum, k + 1, side="left")])

    row = {"n_docs": n}
    for q_pct in (50, 90):
        h = q_pct * (n - 1)
        lo, r = divmod(h, 100)
        v_lo = at_rank(lo)
        v_hi = v_lo if r == 0 else at_rank(lo + 1)
        row[f"p{q_pct}_x100"] = v_lo * (100 - r) + v_hi * r
    return pd.DataFrame([row]).astype("int64")


def events_user_first_last(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE window reduction — per user: the first and
    last event type and timestamp in (ts, event_id) order plus the event
    count (the arg-min/arg-max-by-time aggregate class; deterministic
    under ties via the event_id tiebreak). One key-partitioned
    ``map_groups``: sort once, take the two boundary rows — per-user
    state stays group-sized, never corpus-sized."""

    def win(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = t.take(order)
        ts = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        n = t.num_rows
        return pa.table(
            {
                "user_id": t["user_id"].slice(0, 1),
                "first_type": et.slice(0, 1),
                "last_type": et.slice(n - 1, 1),
                "first_ts_us": ts.slice(0, 1),
                "last_ts_us": ts.slice(n - 1, 1),
                "n": pa.array([n], pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return ds.groupby("user_id").map_groups(win, batch_format="pyarrow")


def events_user_path(sf_dir: str):
    """Ordered string aggregation — SQL's ``string_agg(x, sep ORDER BY
    ...)``: each user's full event-type sequence in (ts, event_id) order
    joined with '>' (the path/journey string funnel miners consume). The
    aggregate is order-SENSITIVE, so the key-partitioned sort-then-join
    shape is the semantics; the per-user string is group-bounded, never
    corpus-sized."""

    def win(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = t.take(order)
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # SQL string_agg SKIPS null elements (no separator emitted for
        # them) and is NULL when every element is null — mirror both
        vals = [v for v in et.to_pylist() if v is not None]
        path = ">".join(vals) if vals else None
        return pa.table(
            {
                "user_id": t["user_id"].slice(0, 1),
                "path": pa.array([path], pa.string()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return ds.groupby("user_id").map_groups(win, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

from camden_ray.pipelines.relational import (  # noqa: E402
    ORACLE_SQL_RELATIONAL,
    customer_region_counts,
    events_asof_view,
    events_distinct_users,
    events_props_stats,
    events_sessions,
    lineitem_part_revenue,
    orders_by_segment,
    orders_top_revenue,
)

# Registry order is load-bearing: the driver's correctness snapshot hashes
# only the FIRST 50 entries (list(queries())[:50]).  Rounds 1-4 certified the
# original leading 50; round 5 rotates the 30 queries that had never had a
# driver-green row (the session-6 join/window/rollup surface plus the
# span/quality/incremental cluster chains) to the FRONT, followed by the
# flagship and the 19 most load-bearing already-certified queries (including
# every query whose implementation changed this round).  The trailing 30 were
# all driver-certified hash-exact in CORRECTNESS_r01..r04 and remain covered
# by the identical local gate (tools/check_correctness.py runs all entries).
QUERIES = {
    # -- previously driver-unchecked (rounds 1-4 window cut at 50) --
    "doc_exact_ngram_clusters": doc_exact_ngram_clusters,
    "doc_span_trim": doc_span_trim,
    "corpus_span_dup_rate": corpus_span_dup_rate,
    "doc_quality_rep_clusters": doc_quality_rep_clusters,
    "doc_incremental_clusters": doc_incremental_clusters,
    "orders_by_segment": orders_by_segment,
    "orders_top_revenue": orders_top_revenue,
    "customer_region_counts": customer_region_counts,
    "lineitem_part_revenue": lineitem_part_revenue,
    "events_sessions": events_sessions,
    "events_asof_view": events_asof_view,
    "events_distinct_users": events_distinct_users,
    "events_props_stats": events_props_stats,
    "events_user_lag": events_user_lag,
    "events_pivot": events_pivot,
    "customers_without_orders": customers_without_orders,
    "events_approx_distinct": events_approx_distinct,
    "corpus_heavy_hitters": corpus_heavy_hitters,
    "doc_stopword_strip": doc_stopword_strip,
    "orders_customer_join": orders_customer_join,
    "customer_urgent_counts": customer_urgent_counts,
    "orders_priority_rollup": orders_priority_rollup,
    "events_value_rank": events_value_rank,
    "embedding_dim_stats": embedding_dim_stats,
    "supplier_nation_revenue": supplier_nation_revenue,
    "events_user_setops": events_user_setops,
    "orders_monthly": orders_monthly,
    "corpus_chars_quantile_cont": corpus_chars_quantile_cont,
    "events_user_first_last": events_user_first_last,
    "events_user_path": events_user_path,
    # -- flagship + load-bearing re-certifications (changed or central) --
    "doc_dedup_clusters": doc_dedup_clusters,
    "doc_minhash_pairs": doc_minhash_pairs,
    "doc_minhash_clusters": doc_minhash_clusters,
    "doc_simhash_pairs": doc_simhash_pairs,
    "doc_simhash_clusters": doc_simhash_clusters,
    "exact_dup_groups": exact_dup_groups,
    "digest_group_sizes": digest_group_sizes,
    "dup_count": dup_count,
    "doc_top_bigrams": doc_top_bigrams,
    "doc_fingerprints": doc_fingerprints,
    "knn_brute_force": knn_brute_force,
    "embedding_near_dup_lsh": embedding_near_dup_lsh,
    "embedding_kmeans": embedding_kmeans,
    "media_knn": media_knn,
    "events_hourly": events_hourly,
    "lineitem_pricing": lineitem_pricing,
    "source_tfidf_terms": source_tfidf_terms,
    "doc_gopher_filter": doc_gopher_filter,
    "doc_decontaminate": doc_decontaminate,
    "doc_lang_id": doc_lang_id,
    # ---- 50-entry driver window ends here ----
    # -- driver-certified hash-exact in CORRECTNESS_r01..r04 --
    "lang_filter_count": lang_filter_count,
    "source_counts": source_counts,
    "source_cap_sample": source_cap_sample,
    "doc_bernoulli_sample": doc_bernoulli_sample,
    "doc_split_assign": doc_split_assign,
    "doc_token_counts": doc_token_counts,
    "doc_decontaminate_spans": doc_decontaminate_spans,
    "doc_phrase_search": doc_phrase_search,
    "source_dup_stats": source_dup_stats,
    "doc_repetition": doc_repetition,
    "corpus_vocab_stats": corpus_vocab_stats,
    "corpus_token_quantiles": corpus_token_quantiles,
    "source_token_quantiles": source_token_quantiles,
    "top_docs_by_chars": top_docs_by_chars,
    "doc_quality": doc_quality,
    "corpus_gopher_summary": corpus_gopher_summary,
    "doc_length_zscore": doc_length_zscore,
    "doc_unigram_logprob": doc_unigram_logprob,
    "doc_ccnet_bucket": doc_ccnet_bucket,
    "events_user_cumsum": events_user_cumsum,
    "events_user_window": events_user_window,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "events_type_stats": events_type_stats,
    "knn_lsh": knn_lsh,
    "knn_ivf": knn_ivf,
    "embedding_near_dup": embedding_near_dup,
    "media_byte_features": media_byte_features,
    "doc_ngram_jaccard_pairs": doc_ngram_jaccard_pairs,
    "source_neardup_matrix": source_neardup_matrix,
    # -- round-5 additions (below the driver window; local gate covers) --
    "doc_bpe_token_counts": doc_bpe_token_counts,
    "embedding_gram": embedding_gram,
    "events_hopping_windows": events_hopping_windows,
    "dup_group_size_histogram": dup_group_size_histogram,
    "source_token_budget": source_token_budget,
}

# Shared unigram-LM score CTE chain (used by doc_unigram_logprob and
# doc_ccnet_bucket so the two oracles cannot drift): uds = per-doc
# (doc_id, s = Σ quantized token logprob, n = token count).
_UNIGRAM_SQL_CTES = """tok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS tk
            FROM documents
        ),
        freq AS (SELECT tk, count(*) AS cnt FROM tok GROUP BY tk),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS T FROM freq),
        lp AS (
            SELECT tk, CAST(round(ln(cnt / T) * 1000000) AS BIGINT) AS lp_fp
            FROM freq, tot
        ),
        uds AS (
            SELECT t.doc_id, sum(lp.lp_fp) AS s, count(*) AS n
            FROM tok t JOIN lp ON t.tk = lp.tk GROUP BY t.doc_id
        )"""

ORACLE_SQL = {
    "exact_dup_groups": """
        SELECT md5(text) AS digest, count(*) AS cnt, min(doc_id) AS rep
        FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
    "digest_group_sizes": """
        SELECT md5(text) AS digest, count(*) AS cnt FROM documents GROUP BY 1
    """,
    "dup_count": """
        SELECT COALESCE(SUM(cnt - 1), 0)::BIGINT AS dup_count FROM (
            SELECT count(*) AS cnt FROM documents GROUP BY md5(text)
        )
    """,
    "lang_filter_count": """
        SELECT lang, count(*) AS cnt FROM documents
        WHERE lang IN ('en', 'de') GROUP BY lang
    """,
    "source_counts": "SELECT source, count(*) AS cnt FROM documents GROUP BY source",
    "doc_top_bigrams": f"""
        WITH toks AS (
            SELECT regexp_extract_all(COALESCE(text, ''), '\\S+') AS t
            FROM documents
        )
        SELECT gram, count(*) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS gram
            FROM toks
        )
        GROUP BY gram
        ORDER BY cnt DESC, gram
        LIMIT {_TOP_BIGRAMS_K}
    """,
    "doc_bernoulli_sample": f"""
        SELECT doc_id, lang FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) < '{_BERNOULLI_CUTOFF_HEX}'
    """,
    "doc_decontaminate": f"""
        WITH tok AS (
            SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS t
            FROM documents
        ),
        g AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                range(1, len(t) - 2),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
            ))) AS gram
            FROM tok
        ),
        bench AS (
            SELECT DISTINCT gram FROM g
            WHERE md5(CAST(doc_id AS VARCHAR)) < '{_DECON_CUTOFF_HEX}'
        ),
        hits AS (
            SELECT g.doc_id, count(*) AS n_overlap
            FROM g JOIN bench USING (gram)
            WHERE md5(CAST(g.doc_id AS VARCHAR)) >= '{_DECON_CUTOFF_HEX}'
            GROUP BY g.doc_id
        )
        SELECT d.doc_id, COALESCE(h.n_overlap, 0)::BIGINT AS n_overlap
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE md5(CAST(d.doc_id AS VARCHAR)) >= '{_DECON_CUTOFF_HEX}'
    """,
    "doc_decontaminate_spans": f"""
        WITH tok AS (
            SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS t
            FROM documents
        ),
        gp AS (
            SELECT doc_id,
                   unnest(range(1, greatest(len(t) - 3, 0) + 1)) AS pos, t
            FROM tok
        ),
        g AS (
            SELECT doc_id, pos,
                   array_to_string(t[pos:pos+3], ' ') AS gram
            FROM gp
        ),
        bench AS (
            SELECT DISTINCT gram FROM g
            WHERE md5(CAST(doc_id AS VARCHAR)) < '{_DECON_CUTOFF_HEX}'
        )
        SELECT g.doc_id, g.pos
        FROM g JOIN bench USING (gram)
        WHERE md5(CAST(g.doc_id AS VARCHAR)) >= '{_DECON_CUTOFF_HEX}'
    """,
    "doc_phrase_search": f"""
        WITH tok AS (
            SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS t
            FROM documents
        ),
        gp AS (
            SELECT doc_id,
                   unnest(range(1, greatest(len(t) - {len(_PHRASE_QUERY.split()) - 1}, 0) + 1)) AS pos, t
            FROM tok
        )
        SELECT doc_id, pos
        FROM gp
        WHERE array_to_string(t[pos:pos+{len(_PHRASE_QUERY.split()) - 1}], ' ')
              = '{_PHRASE_QUERY}'
    """,
    "source_dup_stats": """
        WITH g AS (
            SELECT source, md5(text) AS d, count(*) AS cnt
            FROM documents GROUP BY 1, 2
        )
        SELECT source,
               CAST(sum(cnt) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(cnt) - count(*) AS BIGINT) AS dup_count,
               CAST(round((sum(cnt) - count(*)) / sum(cnt) * 1000000) AS BIGINT)
                   AS dup_rate_fp
        FROM g GROUP BY source
    """,
    "doc_repetition": """
        WITH tok AS (
            SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS t
            FROM documents
        ),
        g AS (
            SELECT doc_id, unnest(list_transform(
                range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
            FROM tok
        ),
        c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
        a AS (
            SELECT doc_id, max(cnt) AS mx, count(*) AS ndist, sum(cnt) AS ntot,
                   sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
            FROM c GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(a.mx, 0)::BIGINT AS max_bigram_cnt,
               COALESCE(a.ndist, 0)::BIGINT AS n_distinct_bigrams,
               CASE WHEN a.ntot IS NULL OR a.ntot = 0 THEN 0
                    ELSE CAST(round(a.mx / a.ntot * 1000000) AS BIGINT)
               END AS top_bigram_frac_fp,
               CASE WHEN a.ntot IS NULL OR a.ntot = 0 THEN 0
                    ELSE CAST(round(a.dup / a.ntot * 1000000) AS BIGINT)
               END AS dup_bigram_frac_fp
        FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
    """,
    "corpus_vocab_stats": """
        WITH tok AS (
            SELECT regexp_extract_all(COALESCE(text, ''), '\\S+') AS t
            FROM documents
        ),
        uni AS (SELECT unnest(t) AS tk FROM tok),
        bi AS (
            SELECT unnest(list_transform(
                range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS tk
            FROM tok
        ),
        cu AS (SELECT tk, count(*) AS cnt FROM uni GROUP BY tk),
        cb AS (SELECT tk, count(*) AS cnt FROM bi GROUP BY tk)
        SELECT
            (SELECT CAST(COALESCE(sum(cnt), 0) AS BIGINT) FROM cu) AS n_tokens,
            (SELECT count(*)::BIGINT FROM cu) AS n_distinct_tokens,
            (SELECT count(*)::BIGINT FROM cb) AS n_distinct_bigrams,
            (SELECT count(*) FILTER (cnt = 1)::BIGINT FROM cb) AS n_hapax_bigrams
    """,
    "corpus_token_quantiles": """
        WITH tc AS (
            SELECT CASE WHEN trim(text) = '' THEN 0
                        ELSE length(string_split_regex(trim(text), '\\s+'))
                   END::BIGINT AS n
            FROM documents
        )
        SELECT count(*)::BIGINT AS n_docs,
               quantile_disc(n, 0.10)::BIGINT AS p10,
               quantile_disc(n, 0.25)::BIGINT AS p25,
               quantile_disc(n, 0.50)::BIGINT AS p50,
               quantile_disc(n, 0.75)::BIGINT AS p75,
               quantile_disc(n, 0.90)::BIGINT AS p90,
               quantile_disc(n, 0.99)::BIGINT AS p99
        FROM tc
    """,
    "source_tfidf_terms": f"""
        WITH tok AS (
            SELECT source,
                   unnest(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS tk
            FROM documents
        ),
        tf AS (SELECT source, tk, count(*) AS tf_cnt FROM tok GROUP BY 1, 2),
        dfx AS (SELECT tk, count(*) AS df_cnt FROM tf GROUP BY tk),
        sx AS (SELECT count(DISTINCT source) AS s FROM documents),
        scored AS (
            SELECT tf.source, tf.tk, tf.tf_cnt, dfx.df_cnt,
                   CAST(round(tf.tf_cnt * sx.s / dfx.df_cnt * 1000000)
                        AS BIGINT) AS score_fp,
                   row_number() OVER (
                       PARTITION BY tf.source
                       ORDER BY tf.tf_cnt * sx.s / dfx.df_cnt DESC, tf.tk
                   ) AS rn
            FROM tf JOIN dfx USING (tk), sx
        )
        SELECT source, tk, tf_cnt, df_cnt, score_fp
        FROM scored WHERE rn <= {_TFIDF_K}
    """,
    "source_token_quantiles": """
        WITH tc AS (
            SELECT source,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(string_split_regex(trim(text), '\\s+'))
                   END::BIGINT AS n
            FROM documents
        )
        SELECT source, count(*)::BIGINT AS n_docs,
               quantile_disc(n, 0.50)::BIGINT AS p50,
               quantile_disc(n, 0.90)::BIGINT AS p90
        FROM tc GROUP BY source
    """,
    "source_cap_sample": """
        SELECT source, doc_id FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= 5
    """,
    "doc_token_counts": """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(string_split_regex(trim(text), '\\s+')) END::BIGINT
                   AS n_ws_tokens
        FROM documents
    """,
    "doc_bpe_token_counts": f"""
        SELECT doc_id,
               len(regexp_extract_all(COALESCE(text, ''),
                   '{_BPE_PRETOKEN_RE.replace("'", "''")}'))::BIGINT
                   AS n_pretokens
        FROM documents
    """,
    "source_token_budget": f"""
        SELECT source, count(*) AS n_docs,
               CAST(SUM(CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                    ELSE length(string_split_regex(
                        trim(COALESCE(text, '')), '\\s+'))
                    END) AS BIGINT) AS ws_tokens,
               CAST(SUM(len(regexp_extract_all(COALESCE(text, ''),
                   '{_BPE_PRETOKEN_RE.replace("'", "''")}'))) AS BIGINT)
                   AS bpe_pretokens
        FROM documents GROUP BY source
    """,
    "top_docs_by_chars": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id ASC LIMIT 10
    """,
    "doc_quality": """
        WITH c AS (
            SELECT doc_id, COALESCE(text, '') AS t,
                   length(COALESCE(text, '')) AS nc,
                   string_split(COALESCE(text, ''), ' ') AS toks
            FROM documents
        ), d AS (
            SELECT doc_id, t, nc, toks,
                   CASE WHEN t = '' THEN 0 ELSE len(toks) END AS ntok,
                   length(regexp_replace(t, '[a-zA-Z0-9\\s]', '', 'g')) AS punct,
                   length(regexp_replace(t, '[^0-9]', '', 'g')) AS digits,
                   len(list_filter(toks, x -> x IN
                       ('the','and','of','to','a','in','is','that','it','for',
                        'on','with','as','was','at','by'))) AS stop,
                   len(list_distinct(toks)) AS uniq,
                   list_sum(list_transform(toks, x -> length(x))) AS swl
            FROM c
        )
        SELECT doc_id,
               CAST(nc AS BIGINT) AS n_chars,
               CAST(CASE WHEN nc = 0 OR ntok = 0 THEN 0 ELSE ntok END AS BIGINT)
                   AS n_tokens,
               CASE WHEN nc = 0 OR ntok = 0 THEN 0
                    ELSE CAST(round(swl / ntok * 1000000) AS BIGINT)
               END AS mean_word_len_fp,
               CASE WHEN nc = 0 OR ntok = 0 THEN 0
                    ELSE CAST(round(stop / ntok * 1000000) AS BIGINT)
               END AS stopword_ratio_fp,
               CASE WHEN nc = 0 OR ntok = 0 THEN 0
                    ELSE CAST(round(punct / nc * 1000000) AS BIGINT)
               END AS punct_ratio_fp,
               CASE WHEN nc = 0 OR ntok = 0 THEN 0
                    ELSE CAST(round(digits / nc * 1000000) AS BIGINT)
               END AS digit_ratio_fp,
               CASE WHEN nc = 0 OR ntok = 0 THEN 0
                    ELSE CAST(round(uniq / ntok * 1000000) AS BIGINT)
               END AS uniq_token_ratio_fp,
               CASE WHEN nc = 0 OR ntok = 0 THEN 0
                    ELSE CAST(round(
                        least(1.0, ntok / 50.0)
                        * sqrt(uniq / ntok)
                        * (1.0 - least(0.5, punct / nc) / 0.5 * 0.5)
                        * (1.0 - least(0.5, digits / nc) / 0.5 * 0.5)
                        * 1000000) AS BIGINT)
               END AS quality_score_fp
        FROM d
    """,
    "doc_unigram_logprob": f"""
        WITH {_UNIGRAM_SQL_CTES}
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(s AS BIGINT) AS logprob_sum_fp,
               CAST(round(s / n) AS BIGINT) AS mean_logprob_fp
        FROM uds
    """,
    "doc_ccnet_bucket": f"""
        WITH {_UNIGRAM_SQL_CTES},
        scores AS (
            SELECT doc_id, CAST(round(s / n) AS BIGINT) AS mean_logprob_fp
            FROM uds
        ),
        bins AS (
            SELECT doc_id, mean_logprob_fp,
                   CAST(floor(mean_logprob_fp / {_CCNET_BIN_FP}.0) AS BIGINT)
                       AS bin
            FROM scores
        ),
        th AS (
            SELECT quantile_disc(bin, 1.0/3.0) AS t1,
                   quantile_disc(bin, 2.0/3.0) AS t2
            FROM bins
        )
        SELECT doc_id, mean_logprob_fp, bin,
               CASE WHEN bin <= t1 THEN 'tail'
                    WHEN bin <= t2 THEN 'middle'
                    ELSE 'head'
               END AS bucket
        FROM bins, th
    """,
    "doc_gopher_filter": f"""
        WITH c AS (
            SELECT doc_id, COALESCE(text, '') AS t,
                   string_split(COALESCE(text, ''), ' ') AS toks
            FROM documents
        ), d AS (
            SELECT doc_id, t, toks,
                   CASE WHEN t = '' THEN 0 ELSE len(toks) END AS ntok,
                   len(list_filter(toks,
                       x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
                   len(list_filter(toks, x -> x IN
                       ('the','and','of','to','a','in','is','that','it','for',
                        'on','with','as','was','at','by'))) AS stop,
                   list_sum(list_transform(toks, x -> length(x))) AS swl,
                   length(t) - length(replace(t, '#', '')) AS nhash,
                   (length(t) - length(replace(t, '...', ''))) // 3 AS nell
            FROM c
        ), r AS (
            SELECT doc_id, ntok, nhash, nell, stop, swl, alpha,
                   ntok >= {_GOPHER_MIN_WORDS}
                       AND ntok <= {_GOPHER_MAX_WORDS} AS ok_wc,
                   ntok > 0 AND swl / ntok >= {_GOPHER_MIN_MWL}
                       AND swl / ntok <= {_GOPHER_MAX_MWL} AS ok_mwl,
                   ntok > 0 AND (nhash + nell) / ntok
                       <= {_GOPHER_MAX_SYMBOL_RATIO} AS ok_sym,
                   ntok > 0 AND alpha / ntok
                       >= {_GOPHER_MIN_ALPHA_FRAC} AS ok_alpha,
                   stop >= {_GOPHER_MIN_STOPWORDS} AS ok_stop
            FROM d
        )
        SELECT doc_id,
               CAST(ntok AS BIGINT) AS n_tokens,
               CAST(nhash AS BIGINT) AS n_hash,
               CAST(nell AS BIGINT) AS n_ellipsis,
               CAST(stop AS BIGINT) AS n_stopwords,
               CASE WHEN ntok = 0 THEN 0
                    ELSE CAST(round(swl / ntok * 1000000) AS BIGINT)
               END AS mean_word_len_fp,
               CASE WHEN ntok = 0 THEN 0
                    ELSE CAST(round(alpha / ntok * 1000000) AS BIGINT)
               END AS alpha_word_frac_fp,
               CASE WHEN ntok = 0 THEN 0
                    ELSE CAST(round((nhash + nell) / ntok * 1000000) AS BIGINT)
               END AS symbol_ratio_fp,
               CAST(ok_wc AS BIGINT) AS ok_word_count,
               CAST(ok_mwl AS BIGINT) AS ok_mean_word_len,
               CAST(ok_sym AS BIGINT) AS ok_symbol_ratio,
               CAST(ok_alpha AS BIGINT) AS ok_alpha_words,
               CAST(ok_stop AS BIGINT) AS ok_stopwords,
               CAST(ok_wc AND ok_mwl AND ok_sym AND ok_alpha AND ok_stop
                    AS BIGINT) AS keep
        FROM r
    """,
    "doc_length_zscore": """
        WITH docs AS (
            SELECT * FROM documents WHERE n_chars IS NOT NULL
        ),
        stats AS (
            SELECT count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS s1,
                   CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
            FROM docs
        )
        SELECT doc_id, n_chars,
               CASE WHEN n <= 1 OR n * s2 - s1 * s1 <= 0 THEN 0
                    ELSE CAST(round(
                        (n_chars - s1 / CAST(n AS DOUBLE))
                        / sqrt((n * s2 - s1 * s1)
                               / (CAST(n AS DOUBLE) * (n - 1)))
                        * 1000000) AS BIGINT)
               END AS z_fp,
               CASE WHEN n <= 1 OR n * s2 - s1 * s1 <= 0 THEN 0
                    ELSE CAST(abs(
                        (n_chars - s1 / CAST(n AS DOUBLE))
                        / sqrt((n * s2 - s1 * s1)
                               / (CAST(n AS DOUBLE) * (n - 1)))
                    ) > 3.0 AS BIGINT)
               END AS is_outlier
        FROM docs, stats
    """,
    "doc_lang_id": """
        WITH c AS (
            SELECT doc_id, lang, COALESCE(text, '') AS t,
                   substr(COALESCE(text, ''), 1, 2000) AS s
            FROM documents
        ), d AS (
            SELECT doc_id, lang, t, s,
                   string_split(s, ' ') AS toks,
                   length(regexp_replace(s, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))
                       AS cjk
            FROM c
        ), e AS (
            SELECT doc_id, lang, t, s, cjk,
                   len(list_filter(toks, x -> x IN
                       ('the','and','of','to','a','in','is','that','it','for',
                        'on','with','as','was','at','by'))) AS h_en,
                   len(list_filter(toks, x -> x IN
                       ('der','die','das','und','ist','von','zu','mit','den',
                        'im','für','auf','ein','nicht'))) AS h_de,
                   len(list_filter(toks, x -> x IN
                       ('le','la','les','de','et','un','une','est','pour',
                        'dans','que','sur','avec','pas'))) AS h_fr,
                   len(list_filter(toks, x -> x IN
                       ('el','la','los','las','de','y','un','una','es','para',
                        'en','que','con','por','no'))) AS h_es
            FROM d
        )
        SELECT doc_id, lang,
               CASE WHEN t = '' THEN 'unknown'
                    WHEN cjk > 0.05 * length(s) THEN 'zh'
                    WHEN h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0
                        THEN 'unknown'
                    WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                    WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                    WHEN h_fr >= h_es THEN 'fr'
                    ELSE 'es'
               END AS detected
        FROM e
    """,
    "media_byte_features": """
        SELECT doc_id AS media_id,
               'image' AS media_type,
               CAST(strlen(COALESCE(text, '')) AS BIGINT) AS n_bytes,
               md5(COALESCE(text, '')) AS digest_md5
        FROM documents
    """,
    "events_hourly": """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               count(*) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2
    """,
    "doc_split_assign": f"""
        SELECT doc_id, source,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_SPLIT_TRAIN_HEX}'
                        THEN 'train'
                    WHEN md5(CAST(doc_id AS VARCHAR)) < '{_SPLIT_VAL_HEX}'
                        THEN 'val'
                    ELSE 'test'
               END AS split
        FROM documents
    """,
    "events_user_window": """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS w_cnt,
               CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)) OVER w,
                             0) AS BIGINT) AS w_sum_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    "events_retention": """
        WITH w AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS wk
            FROM events
        ),
        c AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id)
        SELECT CAST(c.cw AS BIGINT) AS cohort_week,
               CAST(w.wk - c.cw AS BIGINT) AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM w JOIN c USING (user_id)
        GROUP BY 1, 2
    """,
    "events_funnel": """
        WITH clicks AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'
        ),
        conv AS (
            SELECT c.user_id, count(*) AS n_conv
            FROM clicks c
            WHERE EXISTS (
                SELECT 1 FROM events v
                WHERE v.user_id = c.user_id AND v.event_type = 'view'
                  AND v.ts <= c.ts
                  AND v.ts >= c.ts - INTERVAL 1 HOUR
            )
            GROUP BY c.user_id
        )
        SELECT u.user_id,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                   AS n_views,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                   AS n_clicks,
               CAST(COALESCE(any_value(conv.n_conv), 0) AS BIGINT)
                   AS n_converted_clicks,
               CAST(COALESCE(any_value(conv.n_conv), 0) > 0 AS BIGINT)
                   AS converted
        FROM events u
        LEFT JOIN conv ON conv.user_id = u.user_id
        GROUP BY u.user_id
    """,
    "events_user_cumsum": """
        SELECT event_id, user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)) OVER w,
                             0) AS BIGINT) AS cum_value_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "events_type_stats": """
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
               MIN(CAST(round(value * 100) AS BIGINT)) AS min_cents,
               MAX(CAST(round(value * 100) AS BIGINT)) AS max_cents
        FROM events GROUP BY event_type
    """,
    "lineitem_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "knn_brute_force": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               CAST(round(list_cosine_similarity(embedding, (SELECT qe FROM q))
                          * 100000) AS BIGINT) AS cos_fp
        FROM embeddings
        ORDER BY cos_fp DESC, vec_id ASC LIMIT 10
    """,
    "embedding_near_dup": """
        SELECT e1.vec_id AS a, e2.vec_id AS b,
               CAST(round(list_cosine_similarity(e1.embedding, e2.embedding)
                          * 100000) AS BIGINT) AS cos_fp
        FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
        WHERE CAST(round(list_cosine_similarity(e1.embedding, e2.embedding)
                         * 100000) AS BIGINT) >= 40000
    """,
    **ORACLE_SQL_RELATIONAL,
}

# The LSH scale paths are held to their exact counterparts' oracles: at the
# driver-table scales the multi-table probes provably cover every result
# (verified by tests/test_similarity.py), so the exact SQL doubles as their
# oracle. At corpus scale the adaptive bit width trades the low-cosine band
# for bounded bucket sizes — the documented ANN contract.
ORACLE_SQL["knn_lsh"] = ORACLE_SQL["knn_brute_force"]
ORACLE_SQL["knn_ivf"] = ORACLE_SQL["knn_brute_force"]
ORACLE_SQL["embedding_near_dup_lsh"] = ORACLE_SQL["embedding_near_dup"]

# Exact word-5-gram Jaccard pairs >= 0.5 via an inverted shingle index —
# complete by construction; the Ray pipeline's LSH prefilter provably
# recovers the same set on the driver tables (its exact verification stage
# computes the identical jaccard on raw token tuples).
ORACLE_SQL["doc_ngram_jaccard_pairs"] = """
    WITH d AS (
        SELECT 'doc://' || doc_id AS url,
               string_split(COALESCE(text, ''), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT url,
               list_distinct(list_transform(
                   range(1, greatest(len(toks) - 4, 0) + 1),
                   i -> array_to_string(toks[i:i+4], ' ')
               )) AS sh
        FROM d
    ), e AS (
        SELECT s1.url AS a, s2.url AS b
        FROM (SELECT url, unnest(sh) AS g FROM s) s1
        JOIN (SELECT url, unnest(sh) AS g FROM s) s2
          ON s1.g = s2.g AND s1.url < s2.url
        GROUP BY 1, 2
    ), j AS (
        SELECT e.a, e.b,
               len(list_intersect(sa.sh, sb.sh)) AS inter,
               len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS uni
        FROM e
        JOIN s sa ON sa.url = e.a
        JOIN s sb ON sb.url = e.b
    )
    SELECT a, b,
           CAST(round(inter / greatest(uni, 1) * 100000) AS BIGINT) AS jaccard_fp
    FROM j
    WHERE inter / greatest(uni, 1) >= 0.5
"""

# Cross-source matrix over the verified pair list: the jaccard-pairs SQL is
# embedded as a subquery so the two oracles share one edge definition.
ORACLE_SQL["source_neardup_matrix"] = f"""
    WITH p AS ({ORACLE_SQL["doc_ngram_jaccard_pairs"]}),
    ids AS (
        SELECT CAST(substr(a, 7) AS BIGINT) AS ida,
               CAST(substr(b, 7) AS BIGINT) AS idb
        FROM p
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs
    FROM ids
    JOIN documents da ON da.doc_id = ids.ida
    JOIN documents db ON db.doc_id = ids.idb
    GROUP BY 1, 2
"""

# Connected components over the two deterministic edge sources (exact
# content duplicates ∪ exact word-5-gram Jaccard >= 0.5 pairs) via a
# recursive-CTE transitive closure with min-label aggregation: reach(src)
# covers src's whole component (edges are symmetrized), so
# least(src, min(dst)) IS the component's lexicographic-min url — the
# engine's deterministic-representative contract (K1). Closure size is
# bounded by Σ component_size², fine at driver-table scales; the engine
# side runs the same semantics as distributed union-find.
ORACLE_SQL["doc_exact_ngram_clusters"] = """
    WITH RECURSIVE d AS (
        SELECT 'doc://' || doc_id AS url, COALESCE(text, '') AS text,
               string_split(COALESCE(text, ''), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT url,
               list_distinct(list_transform(
                   range(1, greatest(len(toks) - 4, 0) + 1),
                   i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM d
    ), cand AS (
        SELECT s1.url AS a, s2.url AS b
        FROM (SELECT url, unnest(sh) AS g FROM s) s1
        JOIN (SELECT url, unnest(sh) AS g FROM s) s2
          ON s1.g = s2.g AND s1.url < s2.url
        GROUP BY 1, 2
    ), jac AS (
        SELECT cand.a, cand.b
        FROM cand
        JOIN s sa ON sa.url = cand.a
        JOIN s sb ON sb.url = cand.b
        WHERE len(list_intersect(sa.sh, sb.sh))
              / greatest(len(sa.sh) + len(sb.sh)
                         - len(list_intersect(sa.sh, sb.sh)), 1) >= 0.5
    ), ex AS (
        SELECT d1.url AS a, d2.url AS b
        FROM d d1 JOIN d d2
          ON md5(d1.text) = md5(d2.text) AND d1.url < d2.url
    ), sym AS (
        SELECT a, b FROM jac UNION SELECT a, b FROM ex
        UNION SELECT b AS a, a AS b FROM jac
        UNION SELECT b AS a, a AS b FROM ex
    ), reach(src, dst) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.src, e.b FROM reach r JOIN sym e ON e.a = r.dst
    )
    SELECT src AS url, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
"""

# Fixed-point k-means oracle: the engine's integer semantics (×1e6
# quantization, exact int squared-L2, exact integer floor-division centroid
# update, lowest-index tie-break) unrolled as one CTE chain per iteration.
# The ((s % c) + c) % c adjustment makes the numerator divisible, so
# DuckDB's truncating // equals numpy's flooring // on negatives too.
def _kmeans_sql() -> str:
    k, iters, scale = _KMEANS_K, _KMEANS_ITERS, _KMEANS_SCALE
    steps = []
    prev = "c0"
    for i in range(1, iters + 1):
        steps.append(f"""
    , d{i} AS (
        SELECT e.vec_id, c.cl,
               sum((e.v - c.cv) * (e.v - c.cv)) AS dist
        FROM e JOIN {prev} c ON c.dim = e.dim
        GROUP BY 1, 2
    ), a{i} AS (
        SELECT vec_id, cl FROM (
            SELECT vec_id, cl,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cl) AS rn
            FROM d{i}
        ) WHERE rn = 1
    ), s{i} AS (
        SELECT a.cl, e.dim, sum(e.v) AS s, count(*) AS c
        FROM a{i} a JOIN e ON e.vec_id = a.vec_id
        GROUP BY 1, 2
    ), c{i} AS (
        SELECT p.cl, p.dim,
               COALESCE((s{i}.s - ((s{i}.s % s{i}.c) + s{i}.c) % s{i}.c)
                        // s{i}.c, p.cv) AS cv
        FROM {prev} p LEFT JOIN s{i}
          ON s{i}.cl = p.cl AND s{i}.dim = p.dim
    )""")
        prev = f"c{i}"
    return f"""
    WITH e0 AS (
        SELECT vec_id,
               unnest(range(1, len(embedding) + 1)) AS dim,
               unnest(embedding) AS x
        FROM embeddings
    ), e AS (
        SELECT vec_id, dim,
               CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT) AS v
        FROM e0
    ), init AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, vec_id
        FROM (SELECT DISTINCT vec_id FROM embeddings
              ORDER BY vec_id LIMIT {k})
    ), c0 AS (
        SELECT i.cl, e.dim, e.v AS cv
        FROM init i JOIN e ON e.vec_id = i.vec_id
    ){''.join(steps)}
    , df AS (
        SELECT e.vec_id, c.cl,
               sum((e.v - c.cv) * (e.v - c.cv)) AS dist
        FROM e JOIN {prev} c ON c.dim = e.dim
        GROUP BY 1, 2
    )
    SELECT vec_id, cl AS cluster FROM (
        SELECT vec_id, cl,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cl) AS rn
        FROM df
    ) WHERE rn = 1
    """


ORACLE_SQL["embedding_kmeans"] = _kmeans_sql()

# Exact span-trim semantics in SQL: gram at 1-based token position pos =
# L consecutive \S+ tokens; winner(gram) = min doc_id; a position is covered
# iff some gram window containing it has winner < doc_id; cleaned = kept
# tokens joined by ' '. DuckDB list slices are 1-based inclusive
# (t[pos:pos+L-1] = L elements); fully-covered and token-less docs both
# clean to md5('') on each side.
ORACLE_SQL["doc_span_trim"] = f"""
    WITH tok AS (
        SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS t
        FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(range(1, greatest(len(t) - {_SPAN_TRIM_L} + 1, 0) + 1))
                   AS pos,
               t
        FROM tok
    ), g2 AS (
        SELECT doc_id, pos,
               array_to_string(t[pos:pos+{_SPAN_TRIM_L - 1}], ' ') AS gram
        FROM g
    ), w AS (
        SELECT gram, min(doc_id) AS win FROM g2 GROUP BY gram
    ), cov AS (
        SELECT g2.doc_id,
               unnest(range(g2.pos, g2.pos + {_SPAN_TRIM_L})) AS cpos
        FROM g2 JOIN w USING (gram) WHERE w.win < g2.doc_id
    ), covd AS (
        SELECT DISTINCT doc_id, cpos FROM cov
    ), pt AS (
        SELECT doc_id, unnest(t) AS tk,
               unnest(range(1, len(t) + 1)) AS pos
        FROM tok
    ), kept AS (
        SELECT p.doc_id, p.pos, p.tk
        FROM pt p LEFT JOIN covd c
          ON p.doc_id = c.doc_id AND p.pos = c.cpos
        WHERE c.doc_id IS NULL
    ), agg AS (
        SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(tk, ' ' ORDER BY pos)) AS cleaned_md5
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(len(t.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(a.cleaned_md5, md5('')) AS cleaned_md5
    FROM tok t LEFT JOIN agg a USING (doc_id)
"""

# Corpus duplication headline: the span-trim oracle wrapped as a subquery
# (sum-division rate computed in double on both sides — identical IEEE op
# on identical integers, so the half-away fp rounding matches exactly).
ORACLE_SQL["corpus_span_dup_rate"] = f"""
    SELECT count(*) AS n_docs,
           COALESCE(sum(n_tokens), 0)::BIGINT AS total_tokens,
           COALESCE(sum(n_removed), 0)::BIGINT AS removed_tokens,
           CASE WHEN COALESCE(sum(n_tokens), 0) = 0 THEN 0
                ELSE CAST(round(sum(n_removed) / CAST(sum(n_tokens) AS DOUBLE)
                                * 1000000) AS BIGINT)
           END AS dup_rate_fp
    FROM ({ORACLE_SQL["doc_span_trim"]})
"""

# Quality-rep twin of doc_exact_ngram_clusters: the identical
# transitive-closure graph, but each component's representative is the
# member with the max doc_quality fixed-point score (min-url tiebreak) —
# the score expression is doc_quality's oracle-proven formula verbatim.
ORACLE_SQL["doc_quality_rep_clusters"] = """
    WITH RECURSIVE d AS (
        SELECT 'doc://' || doc_id AS url, COALESCE(text, '') AS text,
               string_split(COALESCE(text, ''), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT url,
               list_distinct(list_transform(
                   range(1, greatest(len(toks) - 4, 0) + 1),
                   i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM d
    ), cand AS (
        SELECT s1.url AS a, s2.url AS b
        FROM (SELECT url, unnest(sh) AS g FROM s) s1
        JOIN (SELECT url, unnest(sh) AS g FROM s) s2
          ON s1.g = s2.g AND s1.url < s2.url
        GROUP BY 1, 2
    ), jac AS (
        SELECT cand.a, cand.b
        FROM cand
        JOIN s sa ON sa.url = cand.a
        JOIN s sb ON sb.url = cand.b
        WHERE len(list_intersect(sa.sh, sb.sh))
              / greatest(len(sa.sh) + len(sb.sh)
                         - len(list_intersect(sa.sh, sb.sh)), 1) >= 0.5
    ), ex AS (
        SELECT d1.url AS a, d2.url AS b
        FROM d d1 JOIN d d2
          ON md5(d1.text) = md5(d2.text) AND d1.url < d2.url
    ), sym AS (
        SELECT a, b FROM jac UNION SELECT a, b FROM ex
        UNION SELECT b AS a, a AS b FROM jac
        UNION SELECT b AS a, a AS b FROM ex
    ), reach(src, dst) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.src, e.b FROM reach r JOIN sym e ON e.a = r.dst
    ), comp AS (
        SELECT src AS url, least(src, min(dst)) AS comp_id
        FROM reach GROUP BY src
    ), qf AS (
        SELECT 'doc://' || doc_id AS url,
               length(COALESCE(text, '')) AS nc,
               CASE WHEN COALESCE(text, '') = '' THEN 0
                    ELSE len(string_split(COALESCE(text, ''), ' ')) END AS ntok,
               length(regexp_replace(COALESCE(text, ''),
                                     '[a-zA-Z0-9\\s]', '', 'g')) AS punct,
               length(regexp_replace(COALESCE(text, ''),
                                     '[^0-9]', '', 'g')) AS digits,
               len(list_distinct(string_split(COALESCE(text, ''), ' '))) AS uniq
        FROM documents
    ), q AS (
        SELECT url,
               CASE WHEN nc = 0 OR ntok = 0 THEN 0
                    ELSE CAST(round(
                        least(1.0, ntok / 50.0)
                        * sqrt(uniq / ntok)
                        * (1.0 - least(0.5, punct / nc) / 0.5 * 0.5)
                        * (1.0 - least(0.5, digits / nc) / 0.5 * 0.5)
                        * 1000000) AS BIGINT)
               END AS qs
        FROM qf
    ), reps AS (
        SELECT comp_id, url AS rep FROM (
            SELECT c.comp_id, c.url,
                   row_number() OVER (PARTITION BY c.comp_id
                                      ORDER BY q.qs DESC, c.url ASC) AS rn
            FROM comp c JOIN q ON q.url = c.url
        ) WHERE rn = 1
    )
    SELECT c.url, r.rep AS cluster_id
    FROM comp c JOIN reps r ON r.comp_id = c.comp_id
"""

# md5-token polynomial fingerprint: token hash = md5_number_lower (parity
# pinned in functions/hashing.md5_lower64), fold acc = acc*1000003 + th mod
# 2^64 via a HUGEINT list_reduce (the prepended 0 makes the fold start at
# acc=0 and yields fp=0 for token-less docs, matching the engine kernel).
ORACLE_SQL["doc_fingerprints"] = """
    WITH tk AS (
        SELECT doc_id,
               CASE WHEN trim(COALESCE(text, '')) = '' THEN []
                    ELSE string_split_regex(trim(COALESCE(text, '')), '\\s+')
               END AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN fpu >= CAST('9223372036854775808' AS HUGEINT)
                     THEN fpu - CAST('18446744073709551616' AS HUGEINT)
                     ELSE fpu END AS BIGINT) AS fp
    FROM (
        SELECT doc_id, list_reduce(
            list_prepend(CAST(0 AS HUGEINT),
                list_transform(toks, s -> CAST(md5_number_lower(s) AS HUGEINT))),
            (acc, x) -> (acc * 1000003 + x)
                        % CAST('18446744073709551616' AS HUGEINT)) AS fpu
        FROM tk
    )
"""

# All-pairs Hamming join over SQL-computed simhashes (strict-majority bit
# vote across the distinct word-5-gram md5 shingle set; < 5 tokens → 0).
# The Ray pipeline's 16-table pigeonhole exchange is provably complete for
# hamming <= 3, so this complete oracle must match it exactly.
# md5-parity MinHash twin: identical shingling to the simhash twin, affine
# permutations over h % (2^31-1) with the frozen _MINHASH_TWIN_AB constants
# (CASTs keep every product inside UBIGINT — max A*(h%M) < 2^62), band = two
# consecutive signature rows; pairs share a band iff both rows are equal.
def _minhash_twin_sql() -> str:
    mins = ",\n            ".join(
        f"min((CAST({a} AS UBIGINT) * h + CAST({b} AS UBIGINT)) "
        f"% 2147483647) AS v{j}"
        for j, (a, b) in enumerate(_MINHASH_TWIN_AB)
    )
    bands = "\n        UNION ALL\n".join(
        f"""        SELECT s1.url AS a, s2.url AS b
        FROM sig s1 JOIN sig s2
          ON s1.url < s2.url
         AND s1.v{2 * i} = s2.v{2 * i} AND s1.v{2 * i + 1} = s2.v{2 * i + 1}"""
        for i in range(_MINHASH_TWIN_BANDS)
    )
    return f"""
    WITH d AS (
        SELECT 'doc://' || doc_id AS url,
               string_split(COALESCE(text, ''), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT url, list_distinct(list_transform(
            range(1, greatest(len(toks) - 4, 0) + 1),
            i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM d
    ), u AS (
        SELECT url, md5_number_lower(unnest(sh)) % 2147483647 AS h FROM s
    ), sig AS (
        SELECT url,
            {mins}
        FROM u GROUP BY url
    ), pb AS (
{bands}
    )
    SELECT a, b, count(*) AS n_bands FROM pb GROUP BY a, b
    """


ORACLE_SQL["doc_minhash_pairs"] = _minhash_twin_sql()


# Byte-bucket histogram twin of the fake decoder: bucket k counts the chars
# with CODEPOINT in [16k, 16k+15] — equal to the engine's UTF-8 BYTE buckets
# only on ASCII text. Any non-ASCII char diverges (e.g. 'é' U+00E9 lands in
# SQL bucket 14 via [\xe0-\xef], while its UTF-8 bytes 0xC3,0xA9 land in
# engine buckets 12 and 10; codepoints > \xff fall in no SQL bucket at
# all). The driver tables are all-ASCII, where the two definitions
# coincide; the engine's semantic truth for arbitrary bytes stays the
# actor kernel, pytest-pinned in tests/test_multimodal.py.
def _media_knn_sql() -> str:
    buckets = ",\n               ".join(
        "length(t) - length(regexp_replace(t, "
        f"'[\\x{16 * k:02x}-\\x{16 * k + 15:02x}]', '', 'g'))"
        for k in range(16)
    )
    return f"""
    WITH d AS (
        SELECT doc_id AS media_id, COALESCE(text, '') AS t FROM documents
    ), h AS (
        SELECT media_id,
               [{buckets}] AS hist
        FROM d
    ), q AS (SELECT hist AS qh FROM h WHERE media_id = 0),
    s AS (
        SELECT h.media_id,
               list_sum(list_transform(range(1, 17),
                                       i -> h.hist[i] * q.qh[i])) AS dot,
               list_sum(list_transform(range(1, 17),
                                       i -> h.hist[i] * h.hist[i])) AS na,
               list_sum(list_transform(range(1, 17),
                                       i -> q.qh[i] * q.qh[i])) AS nq
        FROM h, q
    )
    SELECT media_id,
           CASE WHEN na = 0 OR nq = 0 THEN 0
                ELSE CAST(round(dot / (sqrt(na) * sqrt(nq)) * 100000)
                          AS BIGINT)
           END AS cos_fp
    FROM s
    ORDER BY cos_fp DESC, media_id
    LIMIT 10
    """


ORACLE_SQL["media_knn"] = _media_knn_sql()

# One-row filter report over the gopher verdicts; wraps the per-doc SQL as
# a subquery so the rule definitions live in exactly one place.
ORACLE_SQL["corpus_gopher_summary"] = f"""
    WITH g AS ({ORACLE_SQL["doc_gopher_filter"]})
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ok_word_count) AS BIGINT) AS n_ok_word_count,
           CAST(sum(ok_mean_word_len) AS BIGINT) AS n_ok_mean_word_len,
           CAST(sum(ok_symbol_ratio) AS BIGINT) AS n_ok_symbol_ratio,
           CAST(sum(ok_alpha_words) AS BIGINT) AS n_ok_alpha_words,
           CAST(sum(ok_stopwords) AS BIGINT) AS n_ok_stopwords,
           CAST(sum(keep) AS BIGINT) AS n_keep,
           CAST(round(sum(keep) / count(*) * 1000000) AS BIGINT)
               AS keep_rate_fp
    FROM g
"""


# The twin recipe extended from pairs to clusters: identical sig/band CTEs,
# then exact-Jaccard verification at τ=0.5 and a recursive-CTE transitive
# closure with min-label aggregation (the doc_exact_ngram_clusters closure
# over the LSH-candidate edge source).
def _minhash_clusters_sql() -> str:
    mins = ",\n            ".join(
        f"min((CAST({a} AS UBIGINT) * h + CAST({b} AS UBIGINT)) "
        f"% 2147483647) AS v{j}"
        for j, (a, b) in enumerate(_MINHASH_TWIN_AB)
    )
    bands = "\n        UNION ALL\n".join(
        f"""        SELECT s1.url AS a, s2.url AS b
        FROM sig s1 JOIN sig s2
          ON s1.url < s2.url
         AND s1.v{2 * i} = s2.v{2 * i} AND s1.v{2 * i + 1} = s2.v{2 * i + 1}"""
        for i in range(_MINHASH_TWIN_BANDS)
    )
    return f"""
    WITH RECURSIVE d AS (
        SELECT 'doc://' || doc_id AS url,
               string_split(COALESCE(text, ''), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT url, list_distinct(list_transform(
            range(1, greatest(len(toks) - 4, 0) + 1),
            i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM d
    ), u AS (
        SELECT url, md5_number_lower(unnest(sh)) % 2147483647 AS h FROM s
    ), sig AS (
        SELECT url,
            {mins}
        FROM u GROUP BY url
    ), pb AS (
{bands}
    ), cand AS (
        SELECT DISTINCT a, b FROM pb
    ), jac AS (
        SELECT cand.a, cand.b
        FROM cand
        JOIN s sa ON sa.url = cand.a
        JOIN s sb ON sb.url = cand.b
        WHERE len(list_intersect(sa.sh, sb.sh))
              / greatest(len(sa.sh) + len(sb.sh)
                         - len(list_intersect(sa.sh, sb.sh)), 1) >= 0.5
    ), sym AS (
        SELECT a, b FROM jac UNION SELECT b AS a, a AS b FROM jac
    ), reach(src, dst) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.src, e.b FROM reach r JOIN sym e ON e.a = r.dst
    )
    SELECT src AS url, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
    """


ORACLE_SQL["doc_minhash_clusters"] = _minhash_clusters_sql()


# Flagship all-four-methods oracle: one shingle/md5 CTE chain feeds the
# MinHash bands AND the SimHash votes (mirroring the engine's fused
# md5_twin_signatures scan), the four edge sources union symmetrized into
# the recursive-CTE min-label closure, and every document appears in the
# output (LEFT JOIN — singletons are their own cluster), matching the
# engine's broadcast singleton attach.
def _dedup_clusters_sql() -> str:
    mins = ",\n            ".join(
        f"min((CAST({a} AS UBIGINT) * (h % 2147483647) + CAST({b} AS UBIGINT)) "
        f"% 2147483647) AS v{j}"
        for j, (a, b) in enumerate(_MINHASH_TWIN_AB)
    )
    bands = "\n        UNION ALL\n".join(
        f"""        SELECT s1.url AS a, s2.url AS b
        FROM sig s1 JOIN sig s2
          ON s1.url < s2.url
         AND s1.v{2 * i} = s2.v{2 * i} AND s1.v{2 * i + 1} = s2.v{2 * i + 1}"""
        for i in range(_MINHASH_TWIN_BANDS)
    )
    L = _DEDUP_TWIN_SUB_L
    return f"""
    WITH RECURSIVE d AS (
        SELECT 'doc://' || doc_id AS url, COALESCE(text, '') AS text,
               string_split(COALESCE(text, ''), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT url, list_distinct(list_transform(
            range(1, greatest(len(toks) - 4, 0) + 1),
            i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM d
    ), u AS (
        SELECT url, md5_number_lower(unnest(sh)) AS h FROM s
    ), sig AS (
        SELECT url,
            {mins}
        FROM u GROUP BY url
    ), pb AS (
{bands}
    ), cand AS (
        SELECT DISTINCT a, b FROM pb
    ), jac AS (
        SELECT cand.a, cand.b
        FROM cand
        JOIN s sa ON sa.url = cand.a
        JOIN s sb ON sb.url = cand.b
        WHERE len(list_intersect(sa.sh, sb.sh))
              / greatest(len(sa.sh) + len(sb.sh)
                         - len(list_intersect(sa.sh, sb.sh)), 1) >= 0.5
    ), v AS (
        SELECT url, r.range AS b,
               SUM(CASE WHEN (h >> CAST(r.range AS UBIGINT)) & 1 = 1
                        THEN 1 ELSE -1 END) AS vote
        FROM u, range(64) r GROUP BY url, r.range
    ), sim0 AS (
        SELECT url,
               CAST(SUM(CASE WHEN vote > 0
                        THEN (CAST(1 AS HUGEINT) << CAST(b AS INTEGER))
                        ELSE 0 END) AS UBIGINT) AS shh
        FROM v GROUP BY url
    ), sim AS (
        SELECT d.url, COALESCE(sim0.shh, CAST(0 AS UBIGINT)) AS shh
        FROM d LEFT JOIN sim0 USING (url)
    ), ham AS (
        SELECT s1.url AS a, s2.url AS b
        FROM sim s1 JOIN sim s2 ON s1.url < s2.url
        WHERE bit_count(xor(s1.shh, s2.shh)) <= 3
    ), ex AS (
        SELECT d1.url AS a, d2.url AS b
        FROM d d1 JOIN d d2
          ON md5(d1.text) = md5(d2.text) AND d1.url < d2.url
    ), lg AS (
        SELECT url, unnest(list_distinct(list_transform(
            range(1, greatest(len(toks) - {L - 1}, 0) + 1),
            i -> array_to_string(toks[i:i+{L - 1}], ' ')))) AS g
        FROM d
    ), sub AS (
        SELECT l1.url AS a, l2.url AS b
        FROM lg l1 JOIN lg l2 ON l1.g = l2.g AND l1.url < l2.url
        GROUP BY 1, 2
    ), sym AS (
        SELECT a, b FROM jac UNION SELECT a, b FROM ham
        UNION SELECT a, b FROM ex UNION SELECT a, b FROM sub
        UNION SELECT b, a FROM jac UNION SELECT b, a FROM ham
        UNION SELECT b, a FROM ex UNION SELECT b, a FROM sub
    ), reach(src, dst) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.src, e.b FROM reach r JOIN sym e ON e.a = r.dst
    ), cl AS (
        SELECT src AS url, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    )
    SELECT d.url AS url,
           COALESCE(cl.cluster_id, d.url) AS cluster_id,
           d.url = COALESCE(cl.cluster_id, d.url) AS is_representative
    FROM d LEFT JOIN cl USING (url)
    """


ORACLE_SQL["doc_dedup_clusters"] = _dedup_clusters_sql()

# Reference-report semantics (reporting.rs:33 group-size aggregation) over
# the flagship chain: the flagship SQL as a subquery, two GROUP BYs on top.
ORACLE_SQL["dup_group_size_histogram"] = f"""
    WITH flag AS ({_dedup_clusters_sql()}),
    sizes AS (
        SELECT cluster_id, count(*) AS cluster_size FROM flag GROUP BY 1
    )
    SELECT cluster_size, count(*) AS n_clusters
    FROM sizes GROUP BY 1
"""

ORACLE_SQL["doc_simhash_pairs"] = """
    WITH d AS (
        SELECT 'doc://' || doc_id AS url,
               string_split(COALESCE(text, ''), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT url,
               list_distinct(list_transform(
                   range(1, greatest(len(toks) - 4, 0) + 1),
                   i -> array_to_string(toks[i:i+4], ' '))) AS sh
        FROM d
    ), u AS (
        SELECT url, md5_number_lower(unnest(sh)) AS h FROM s
    ), v AS (
        SELECT url, r.range AS b,
               SUM(CASE WHEN (h >> CAST(r.range AS UBIGINT)) & 1 = 1
                        THEN 1 ELSE -1 END) AS vote
        FROM u, range(64) r GROUP BY url, r.range
    ), sim0 AS (
        SELECT url,
               CAST(SUM(CASE WHEN vote > 0
                        THEN (CAST(1 AS HUGEINT) << CAST(b AS INTEGER))
                        ELSE 0 END) AS UBIGINT) AS sh
        FROM v GROUP BY url
    ), sim AS (
        SELECT d.url, COALESCE(sim0.sh, CAST(0 AS UBIGINT)) AS sh
        FROM d LEFT JOIN sim0 USING (url)
    )
    SELECT s1.url AS a, s2.url AS b,
           CAST(bit_count(xor(s1.sh, s2.sh)) AS BIGINT) AS hamming
    FROM sim s1 JOIN sim s2 ON s1.url < s2.url
    WHERE bit_count(xor(s1.sh, s2.sh)) <= 3
"""

# SimHash chain end-to-end: pairs SQL as a subquery + the recursive-CTE
# min-label closure (the minhash-clusters recipe on the Hamming source).
ORACLE_SQL["doc_simhash_clusters"] = f"""
    WITH RECURSIVE p AS ({ORACLE_SQL["doc_simhash_pairs"]}),
    sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
    reach(src, dst) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.src, e.b FROM reach r JOIN sym e ON e.a = r.dst
    )
    SELECT src AS url, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
"""

# Incremental attach under the full oracle: new docs (md5(url) first hex
# digit 0-2) adopt the base corpus's exact-dedup cluster id (min base url
# sharing the text — the base run's deterministic representative), else
# cluster among themselves under the min new-shard url. Exact-only config
# means no base-cluster merges, so this closed form IS the semantics.
ORACLE_SQL["doc_incremental_clusters"] = """
    WITH doc AS (
        SELECT 'doc://' || doc_id AS url, text,
               substr(md5('doc://' || doc_id), 1, 1) IN ('0','1','2') AS is_new
        FROM documents
    ),
    base_rep AS (SELECT text, min(url) AS rep FROM doc WHERE NOT is_new GROUP BY text),
    new_rep AS (SELECT text, min(url) AS nrep FROM doc WHERE is_new GROUP BY text)
    SELECT d.url AS url,
           COALESCE(b.rep, n.nrep) AS cluster_id,
           d.url = COALESCE(b.rep, n.nrep) AS is_representative
    FROM doc d
    LEFT JOIN base_rep b USING (text)
    LEFT JOIN new_rep n USING (text)
    WHERE d.is_new
"""

# Round-4 session-6 operator oracles: LAG window, pivot, anti-join, KMV
# sketch, heavy hitters, stopword strip.
ORACLE_SQL["events_user_lag"] = """
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us,
           LAG(CAST(round(value * 100) AS BIGINT)) OVER w AS prev_value_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLE_SQL["events_pivot"] = """
    SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour,
           count(*) AS n_total,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
    FROM events GROUP BY hour
"""

# NOT EXISTS, not NOT IN: the Ray paths implement anti-join semantics
# (null keys never match, null-key customers survive), which NOT IN would
# contradict the moment a NULL key appeared on either side
ORACLE_SQL["customers_without_orders"] = """
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderpriority = '1-URGENT'
          AND o.o_custkey = c.c_custkey
    )
"""

# KMV estimate in exact integer math: the Ray sketch and this SQL compute the
# SAME k-th order statistic over the SAME md5-derived 64-bit hash domain, so
# (k-1)*2^64 // (h_k+1) matches bit-for-bit (HUGEINT is 128-bit: 63*2^64 fits).
ORACLE_SQL["events_approx_distinct"] = """
    WITH h AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
        FROM events
    ),
    tops AS (SELECT h FROM h ORDER BY h LIMIT 64),
    agg AS (SELECT count(*) AS c, max(h) AS hk FROM tops)
    SELECT CAST(64 AS BIGINT) AS k,
           CAST(CASE WHEN c < 64 THEN c
                ELSE (63::HUGEINT * 18446744073709551616::HUGEINT)
                     // (hk::HUGEINT + 1::HUGEINT) END AS BIGINT) AS est
    FROM agg
"""

ORACLE_SQL["corpus_heavy_hitters"] = """
    WITH tok AS (
        SELECT unnest(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS tk
        FROM documents
    ),
    freq AS (SELECT tk, count(*) AS cnt FROM tok GROUP BY tk),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS T FROM freq)
    SELECT tk, cnt FROM freq, tot WHERE cnt * 500 > T
"""

ORACLE_SQL["doc_stopword_strip"] = """
    SELECT doc_id,
           md5(trim(regexp_replace(
               regexp_replace(COALESCE(text, ''),
                              '\\b(the|a|an|of|to|in|and|is)\\b', '', 'g'),
               '\\s+', ' ', 'g'))) AS clean_md5,
           CAST(len(regexp_extract_all(COALESCE(text, ''),
                    '\\b(the|a|an|of|to|in|and|is)\\b')) AS BIGINT) AS n_removed
    FROM documents
"""

ORACLE_SQL["orders_customer_join"] = """
    SELECT o.o_custkey AS custkey, o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""

ORACLE_SQL["customer_urgent_counts"] = """
    SELECT c.c_custkey AS custkey, c.c_name, u.n_urgent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_urgent FROM orders
        WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    ) u ON c.c_custkey = u.o_custkey
"""

ORACLE_SQL["orders_priority_rollup"] = """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""

ORACLE_SQL["events_value_rank"] = """
    SELECT event_id, user_id,
           CAST(RANK() OVER w AS BIGINT) AS value_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS value_dense_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value)
"""

ORACLE_SQL["events_hopping_windows"] = f"""
    WITH e AS (
        SELECT epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE ts IS NOT NULL
    ), h AS (
        SELECT us, cents, unnest([{", ".join(str(k) for k in range(_HOP_K))}]) AS k
        FROM e
    )
    SELECT ((us // {_HOP_US}) - k) * {_HOP_US} AS win_start_us,
           count(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM h GROUP BY 1
"""

ORACLE_SQL["embedding_gram"] = """
    WITH vals AS (
        SELECT vec_id,
               CAST(unnest(range(1, len(embedding) + 1)) AS BIGINT) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS fp
        FROM embeddings
    )
    SELECT a.dim AS dim_i, b.dim AS dim_j,
           CAST(SUM(a.fp * b.fp) AS BIGINT) AS sxy_fp
    FROM vals a JOIN vals b ON a.vec_id = b.vec_id AND a.dim <= b.dim
    GROUP BY 1, 2
"""

ORACLE_SQL["embedding_dim_stats"] = """
    WITH vals AS (
        SELECT CAST(unnest(range(1, len(embedding) + 1)) AS BIGINT) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS fp
        FROM embeddings
    )
    SELECT dim, count(*) AS n,
           CAST(sum(fp) AS BIGINT) AS sum_fp,
           min(fp) AS min_fp, max(fp) AS max_fp
    FROM vals GROUP BY dim
"""

ORACLE_SQL["supplier_nation_revenue"] = """
    SELECT n.n_name,
           CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS sum_price_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""

ORACLE_SQL["events_user_setops"] = """
    WITH v AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view' AND user_id IS NOT NULL),
         p AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND user_id IS NOT NULL)
    SELECT COALESCE(v.user_id, p.user_id) AS user_id,
           CASE WHEN p.user_id IS NULL THEN 'view_only'
                WHEN v.user_id IS NULL THEN 'purchase_only'
                ELSE 'both' END AS set_op
    FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
"""

ORACLE_SQL["orders_monthly"] = """
    SELECT CAST(date_part('year', o_orderdate) * 100
                + date_part('month', o_orderdate) AS BIGINT) AS ym,
           count(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM orders GROUP BY ym
"""

ORACLE_SQL["corpus_chars_quantile_cont"] = """
    WITH v AS (
        SELECT n_chars AS x,
               row_number() OVER (ORDER BY n_chars) - 1 AS rn
        FROM documents WHERE n_chars IS NOT NULL
    ),
    c AS (SELECT count(*) AS n FROM v),
    p AS (SELECT n,
                 (50 * (n - 1)) // 100 AS lo50, (50 * (n - 1)) % 100 AS r50,
                 (90 * (n - 1)) // 100 AS lo90, (90 * (n - 1)) % 100 AS r90
          FROM c)
    SELECT p.n AS n_docs,
           CAST(SUM(CASE WHEN v.rn = p.lo50 THEN v.x * (100 - p.r50)
                         WHEN p.r50 > 0 AND v.rn = p.lo50 + 1 THEN v.x * p.r50
                         ELSE 0 END) AS BIGINT) AS p50_x100,
           CAST(SUM(CASE WHEN v.rn = p.lo90 THEN v.x * (100 - p.r90)
                         WHEN p.r90 > 0 AND v.rn = p.lo90 + 1 THEN v.x * p.r90
                         ELSE 0 END) AS BIGINT) AS p90_x100
    FROM v, p GROUP BY p.n
"""

ORACLE_SQL["events_user_first_last"] = """
    WITH w AS (
        SELECT user_id,
               first_value(event_type) OVER win AS first_type,
               last_value(event_type) OVER winf AS last_type,
               first_value(epoch_us(ts)) OVER win AS first_ts_us,
               last_value(epoch_us(ts)) OVER winf AS last_ts_us,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id),
               winf AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)
    )
    SELECT DISTINCT user_id, first_type, last_type, first_ts_us, last_ts_us,
                    CAST(n AS BIGINT) AS n
    FROM w
"""

ORACLE_SQL["events_user_path"] = """
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
           count(*) AS n
    FROM events GROUP BY user_id
"""
