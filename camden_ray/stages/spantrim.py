"""Span-trimmed corpus output: cut duplicated token spans ≥ L from every
losing document and emit the cleaned text.

This is the Lee et al. 2021 ("Deduplicating Training Data Makes Language
Models Better") *product* deliverable — the sub-document generalization of
camden's W3 "move the duplicate" (/root/reference/src/operations.rs:40-64):
instead of moving whole duplicate files, the duplicated BYTES are removed
from each losing document while the winning occurrence keeps them.

Semantics (exact, deterministic, SQL-expressible — the DuckDB oracle for
``doc_span_trim`` replicates it verbatim):

* tokens = RE2 ``\\S+`` runs (the class DuckDB's ``regexp_extract_all('\\S+')``
  uses; byte-level here — multi-byte UTF-8 chars are non-space bytes, so the
  runs agree with RE2 on any input);
* the *gram* at token position i = the L consecutive tokens starting there;
* a gram's **winner** is the minimum key (doc_id / url order) among all
  documents containing it;
* token position p of doc d is **covered** iff some gram window containing p
  (start in [p-L+1, p]) has a winner < d — i.e. the span also appears in an
  earlier document;
* the cleaned document drops every covered token. Two flavors are emitted:
  ``cleaned_md5`` hashes the space-joined kept tokens (the oracle contract),
  and ``text_clean`` removes the covered spans' exact byte extents from the
  original text (surrounding whitespace kept), with the removed byte ranges
  reported in ``span_starts``/``span_ends``.

Physical plan — two partition_map exchanges, never an all-pairs step:

1. gram exchange: rows (ghash, key, pos) hash-partitioned on the 64-bit
   rolling gram hash; each partition computes per-gram winners with one
   sort and emits only the **covered** (key, pos) rows (losing occurrences);
2. trim exchange: covered rows co-partitioned with the documents on the doc
   key; one vectorized pass per partition rebuilds each doc.

A 64-bit gram-hash collision can only *add* coverage (two different spans
colliding marks the later doc's span as duplicated) — never lose any — at
~n²/2⁶⁴ odds over the gram count; the same documented mode as every other
hashed exchange in the engine.

Scale notes: exchange 1 moves one skinny row per token (16-24 B) — the
honest cost floor of exact span dedup (Lee et al.'s suffix arrays touch the
same volume); exchange 2 moves each doc's text once plus the covered-start
rows. Keys should be compact (int64 doc ids; map urls to ranks first if url
order is the required winner order).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from camden_ray.functions.hashing import (
    _string_array_view,
    flat_rolling_grams,
    mix64,
    poly_hash_segments,
    seg_positions,
)
from camden_ray.stages.candidates import partition_map

_GRAM_MIX = np.uint64(0x8F5C28F5C28F5C29)
_KEY_MIX = np.uint64(0xD1B54A32D192ED03)

# RE2 \s = {\t, \n, \f, \r, ' '}; token bytes are everything else (including
# every byte ≥ 0x80 — multi-byte UTF-8 chars are never whitespace)
_T_TOK = np.ones(256, dtype=bool)
_T_TOK[[9, 10, 12, 13, 32]] = False


def _ws_token_runs(data: np.ndarray, offsets: np.ndarray):
    """RE2 ``\\S+`` token runs over a row-segmented byte buffer.

    Returns (starts_idx, ends_idx, counts): global byte index of each
    token's first byte, one-past-last byte, and per-row token counts.
    Tokens never straddle row boundaries."""
    w = _T_TOK[data]
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
    starts_idx = np.flatnonzero(w & ~prev)
    ends_idx = np.flatnonzero(w & ~nxt) + 1
    cs = np.zeros(len(w) + 1, dtype=np.int64)
    np.cumsum(w & ~prev, out=cs[1:])
    counts = cs[offsets[1:]] - cs[offsets[:-1]]
    return starts_idx, ends_idx, counts


def _key_ids(col) -> np.ndarray:
    """64-bit partition ids for a key column (integer columns widen to
    int64 and are their own ids; strings hash)."""
    from camden_ray.functions.hashing import hash_string_column

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        if col.type != pa.int64():
            col = col.cast(pa.int64())
        return col.to_numpy(zero_copy_only=False).view(np.uint64)
    return hash_string_column(col)


@ray.remote(num_cpus=0.25)
def _block_nrows(t: "pa.Table") -> int:
    return t.num_rows


@ray.remote(num_cpus=0.25)
def _stamp_rank(t: "pa.Table", base: int, key: str, ktype) -> "pa.Table":
    if key not in t.column_names:  # schema-less empty block (empty sort)
        return pa.table(
            {key: pa.array([], type=ktype),
             "__rank": pa.array([], type=pa.int64())}
        )
    return pa.table(
        {
            key: t[key],
            "__rank": pa.array(
                base + np.arange(t.num_rows, dtype=np.int64), type=pa.int64()
            ),
        }
    )


def attach_dense_ranks(
    docs: "ray.data.Dataset", key: str, text: str, P: int
) -> "ray.data.Dataset":
    """(key, text) rows → (key, text, __rank): the key's global dense rank
    (rank order ≡ key sort order), so winner election can run on 8-byte
    ints instead of repeating a ~30-byte url on every gram row (string keys
    cost more than the gram hash + position combined on exchange 1).

    One corpus-KEY-sized ``Dataset.sort`` (text never enters it) + one
    co-partition merge attaching ranks back onto the doc rows.
    """
    ktype = pa.string()
    try:
        sch = docs.schema()
        t0 = dict(zip(sch.names, sch.types)).get(key)
        if isinstance(t0, pa.DataType):
            ktype = t0
        elif t0 is not None and np.issubdtype(np.dtype(t0), np.integer):
            ktype = pa.int64()
    except Exception:
        pass
    s = docs.select_columns([key]).sort(key).materialize()
    refs = s.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    offs = np.r_[0, np.cumsum(counts)]
    ranks = ray.data.from_arrow_refs(
        [
            _stamp_rank.remote(r, int(offs[i]), key, ktype)
            for i, r in enumerate(refs)
        ]
    )

    def norm_docs(t: pa.Table) -> pa.Table:
        if key not in t.column_names:  # schema-less empty block
            return pa.table(
                {key: pa.array([], type=ktype),
                 text: pa.array([], type=pa.string())}
            )
        return pa.table({key: t[key], text: pc.fill_null(t[text], "")})

    # doc keys are unique by contract, so the inner join attaches exactly
    # one rank per doc row; hash_join (stages/cojoin.py) concentrates the
    # co-partition pitfalls this function used to re-implement
    from camden_ray.stages.cojoin import hash_join

    sch = pa.schema([(key, ktype), (text, pa.string())])
    joined = hash_join(
        docs.map_batches(norm_docs, batch_format="pyarrow"),
        ranks,
        on=key,
        how="inner",
        num_partitions=P,
        left_schema=sch,
        right_schema=pa.schema([(key, ktype), ("__rank", pa.int64())]),
    ).materialize()
    # Contract assert (cheap: offs[-1] is already computed and the caller
    # materializes anyway): the inner join silently DROPS null-key docs and
    # CROSS-EXPANDS duplicate keys, which would break span_trim's
    # one-row-per-input-doc guarantee — fail loudly instead.
    n_in, n_out = int(offs[-1]), joined.count()
    if n_out != n_in:
        raise ValueError(
            f"attach_dense_ranks: key column {key!r} violated the unique "
            f"non-null contract ({n_in} doc rows -> {n_out} ranked rows; "
            "null keys drop, duplicate keys cross-expand)"
        )
    return joined


def make_gram_rows(
    L: int,
    P: int,
    key: str = "key",
    text: str = "text",
    shard: "tuple[int, int] | None" = None,
):
    """map_batches fn: (key, text) rows → (g, key, pos, pkey) gram rows —
    one row per L-gram start, hash-partitioned on the gram hash.

    ``shard=(i, S)``: emit only grams whose remixed hash lands in shard
    ``i`` of ``S`` — the gram-hash-space sharding behind
    ``span_trim(gram_shards=S)``. Remixed (``mix64(g)``) so shard
    membership is independent of ``pkey = g % P``; winner election is
    per-gram, so each shard's cover pass is exact on its own slice."""

    def f(t: pa.Table) -> pa.Table:
        keys = t[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        texts = t[text]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        data, offs = _string_array_view(texts)
        tok_s, tok_e, counts = _ws_token_runs(data, offs)
        th_flat = poly_hash_segments(data, tok_s, tok_e)
        th_off = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(counts, out=th_off[1:])
        m = np.maximum(counts - L + 1, 0)  # valid gram starts per doc
        g_all = flat_rolling_grams(th_flat, L)
        has = m > 0
        if not has.any():
            return pa.table(
                {"g": pa.array([], type=pa.int64()),
                 key: keys.slice(0, 0),
                 "pos": pa.array([], type=pa.int64()),
                 "pkey": pa.array([], type=pa.int64())}
            )
        src = seg_positions(th_off[:-1][has], m[has])
        g = mix64(g_all[src] ^ _GRAM_MIX)
        doc_idx = np.repeat(np.flatnonzero(has), m[has])
        pos = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(m[has])[:-1]], m[has]
        )
        if shard is not None:
            s_i, s_n = shard
            smask = (mix64(g) % np.uint64(s_n)) == np.uint64(s_i)
            g = g[smask]
            doc_idx = doc_idx[smask]
            pos = pos[smask]
        return pa.table(
            {
                "g": pa.array(g.view(np.int64), type=pa.int64()),
                key: keys.take(pa.array(doc_idx)),
                "pos": pa.array(pos, type=pa.int64()),
                "pkey": pa.array(
                    (g % np.uint64(P)).view(np.int64), type=pa.int64()
                ),
            }
        )

    return f


def _winner_cover(key: str):
    """Exchange-1 reduce: per gram, keep only the LOSING occurrences
    (key > per-gram min key) as (key, pos) covered-gram-start rows."""

    def f(t: pa.Table) -> pa.Table:
        if key not in t.column_names:
            # fully-empty input corpus: Ray emits schema-less empty blocks
            # (a merely-empty PARTITION of a non-empty corpus keeps the
            # pipeline schema via _reduce_partition's schema-carrying slice)
            return pa.table(
                {key: pa.array([], type=pa.int64()),
                 "pos": pa.array([], type=pa.int64())}
            )
        if t.num_rows == 0:
            return pa.table(
                {key: t[key], "pos": pa.array([], type=pa.int64())}
            )
        order = pc.sort_indices(
            t, sort_keys=[("g", "ascending"), (key, "ascending")]
        )
        t = t.take(order)
        g = t["g"].to_numpy()
        seg_start = np.r_[True, g[1:] != g[:-1]]
        seg_id = np.cumsum(seg_start) - 1
        first_idx = np.flatnonzero(seg_start)
        keys = t[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        winners = keys.take(pa.array(first_idx[seg_id]))
        lose = pc.not_equal(keys, winners)  # sorted: != winner ⇒ > winner
        out = t.filter(lose)
        return pa.table({key: out[key], "pos": out["pos"]})

    return f


def make_trim_reduce(
    L: int, key: str = "key", text: str = "text", out_key: str | None = None
):
    """Exchange-2 reduce: doc rows (kind=0: key, text) + covered rows
    (kind=1: key, pos) → one cleaned row per doc. ``out_key``: rank mode —
    group on ``key`` (the dense int rank) but emit the doc rows'
    passthrough ``out_key`` column (the original string key) instead.

    Vectorized across the whole partition: coverage is ONE global diff-array
    cumsum over the flat token stream (per-doc contributions cancel at doc
    boundaries, so no reset is needed), the space-joined kept-token buffer
    is built by a single numpy scatter into a space-prefilled output buffer,
    and md5 runs over buffer slices — per-token Python objects never exist
    (a b'' .join per doc made the trim exchange ~2/3 of the operator's wall
    at 100k docs). Only the TOUCHED docs (usually a small minority) take a
    per-doc loop, for span-extent recovery and the char-preserving rewrite.
    """

    def f(t: pa.Table) -> pa.Table:
        if "kind" not in t.column_names:
            # fully-empty input corpus (see _winner_cover's guard)
            kt = pa.int64() if out_key is None else pa.string()
            return pa.table(
                {
                    (out_key or key): pa.array([], type=kt),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "n_removed": pa.array([], type=pa.int64()),
                    "cleaned_md5": pa.array([], type=pa.string()),
                    "text_clean": pa.array([], type=pa.string()),
                    "span_starts": pa.array([], type=pa.list_(pa.int64())),
                    "span_ends": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        kind = t["kind"].to_numpy(zero_copy_only=False)
        dt = t.filter(pa.array(kind == 0))
        ct = t.filter(pa.array(kind == 1))
        n = len(dt)
        keys = dt[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        texts = dt[text]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        data, offs = _string_array_view(texts)
        tok_s, tok_e, counts = _ws_token_runs(data, offs)
        tok_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=tok_off[1:])
        total_tok = int(tok_off[-1])
        # covered rows → doc row index (exact Arrow match, any key type)
        cov_doc = pc.index_in(ct[key], value_set=keys)
        valid = pc.is_valid(cov_doc)
        cov_doc = cov_doc.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
        cov_pos = pc.fill_null(ct["pos"], 0).to_numpy(zero_copy_only=False)[
            valid.to_numpy(zero_copy_only=False)
        ]
        # global coverage: +1 at each covered gram start, -1 at start+L
        # (capped at the doc's token count, so contributions cancel before
        # the next doc and one global cumsum needs no per-doc reset)
        diff = np.zeros(total_tok + 1, dtype=np.int32)
        if len(cov_doc):
            g_start = tok_off[cov_doc] + cov_pos
            g_end = tok_off[cov_doc] + np.minimum(cov_pos + L, counts[cov_doc])
            np.add.at(diff, g_start, 1)
            np.add.at(diff, g_end, -1)
        covered = np.cumsum(diff[:-1], dtype=np.int32) > 0
        kept = ~covered
        token_doc = np.repeat(np.arange(n, dtype=np.int64), counts)
        kc = np.bincount(token_doc[covered], minlength=n) if len(token_doc) else np.zeros(n, dtype=np.int64)
        n_rem = kc.astype(np.int64)
        nk_doc = counts - n_rem

        # --- space-joined kept-token buffer, one scatter ------------------
        kidx = np.flatnonzero(kept)
        kl = (tok_e - tok_s)[kidx]
        kd = token_doc[kidx]
        out_len = (
            np.bincount(kd, weights=kl, minlength=n).astype(np.int64)
            + np.maximum(nk_doc - 1, 0)
        )
        out_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(out_len, out=out_off[1:])
        out_buf = np.full(int(out_off[-1]), 0x20, dtype=np.uint8)
        if len(kidx):
            kstart = np.zeros(n, dtype=np.int64)
            np.cumsum(nk_doc[:-1], out=kstart[1:])
            ckl = np.zeros(len(kl) + 1, dtype=np.int64)
            np.cumsum(kl, out=ckl[1:])
            within_cum = ckl[:-1] - ckl[kstart[kd]]
            k_in_doc = np.arange(len(kd), dtype=np.int64) - kstart[kd]
            dest = out_off[kd] + within_cum + k_in_doc
            src = seg_positions(tok_s[kidx], kl)
            dst = seg_positions(dest, kl)
            out_buf[dst] = data[src]
        md5 = hashlib.md5
        md5s = [
            md5(out_buf[out_off[i] : out_off[i + 1]]).hexdigest()
            for i in range(n)
        ]

        # --- touched docs: span extents + char-preserving rewrite ---------
        touched = np.flatnonzero(n_rem > 0)
        sp_s: list[list[int]] = [[] for _ in range(n)]
        sp_e: list[list[int]] = [[] for _ in range(n)]
        if len(touched):
            repl: list[str] = []
            mask = np.zeros(n, dtype=bool)
            mask[touched] = True
            for i in touched.tolist():
                lo, hi = tok_off[i], tok_off[i + 1]
                cov_i = covered[lo:hi]
                ts = tok_s[lo:hi] - offs[i]
                te = tok_e[lo:hi] - offs[i]
                cov_idx = np.flatnonzero(cov_i)
                run_start = np.r_[True, np.diff(cov_idx) > 1]
                run_end = np.r_[run_start[1:], True]
                starts_b = ts[cov_idx[run_start]]
                ends_b = te[cov_idx[run_end]]
                sp_s[i] = starts_b.tolist()
                sp_e[i] = ends_b.tolist()
                doc_bytes = data[offs[i] : offs[i + 1]]
                keep_mask = np.ones(len(doc_bytes), dtype=bool)
                for s, e in zip(sp_s[i], sp_e[i]):
                    keep_mask[s:e] = False
                repl.append(doc_bytes[keep_mask].tobytes().decode("utf-8"))
            clean = pc.replace_with_mask(
                texts, pa.array(mask), pa.array(repl, type=pa.string())
            )
        else:
            clean = texts
        if out_key is not None:
            keys = dt[out_key]
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
        return pa.table(
            {
                (out_key or key): keys,
                "n_tokens": pa.array(counts, type=pa.int64()),
                "n_removed": pa.array(n_rem, type=pa.int64()),
                "cleaned_md5": pa.array(md5s, type=pa.string()),
                "text_clean": clean,
                "span_starts": pa.array(sp_s, type=pa.list_(pa.int64())),
                "span_ends": pa.array(sp_e, type=pa.list_(pa.int64())),
            }
        )

    return f


def span_trim(
    docs: "ray.data.Dataset",
    L: int,
    num_partitions: int,
    key: str = "key",
    text: str = "text",
    rank_keys: bool = False,
    gram_shards: int = 1,
) -> "ray.data.Dataset":
    """Distributed span-level dedup over (key, text) rows — see module
    docstring. Winner order = the key column's natural order (int64 doc ids
    or lexicographic strings). Returns one row per input doc:
    (key, n_tokens, n_removed, cleaned_md5, text_clean, span_starts,
    span_ends).

    ``rank_keys=True`` (string-keyed corpora on MULTI-NODE clusters): keys
    are first mapped to global dense int64 ranks (:func:`attach_dense_ranks`
    — one key-column sort; min rank ≡ min key, so winner semantics are
    IDENTICAL), the gram/winner exchanges then carry 8-byte ints instead of
    repeating the string on every gram row (~22 B × grams/doc off the
    exchange), and the original key is re-attached in the trim reduce.
    Measured single-node trade at 1M docs/32 CPUs: 14.6 s direct vs 18.8 s
    ranked — zero-copy plasma makes exchange BYTES nearly free on one node,
    so the extra sort + rank join only pays for itself when the gram
    exchange crosses a network. Output equality with the direct mode is
    pytest-pinned; default stays False.

    ``gram_shards=S>1``: exchange 1 (the corpus-TOKEN-sized gram exchange —
    the operator's dominant data volume, ~1.1 B rows at 6 M webtext docs)
    runs as S SEQUENTIAL passes over the gram-hash space, each materializing
    only its shard's covered-position output (dup-span-sized, ≪ grams)
    before the next pass starts, so peak object-store + spill footprint is
    ~1/S of the unsharded exchange. EXACT by construction: winner election
    is per-gram-independent and trim-reduce coverage is a union over gram
    contributions, so shard outputs merge additively (P/S parity is
    pytest-pinned). The trade is re-reading + re-tokenizing the corpus S
    times — multi-pass CPU for bounded disk, the knob that lets one node's
    spill disk stop bounding corpus size."""
    P = num_partitions
    Pu = np.uint64(P)

    out_key = None
    out_type = pa.string()
    if rank_keys:
        try:  # original key type for the passthrough nulls (int64 doc ids
            # are allowed here too, not just string urls)
            sch = docs.schema()
            t0 = dict(zip(sch.names, sch.types)).get(key)
            if isinstance(t0, pa.DataType):
                out_type = t0
            elif t0 is not None and np.issubdtype(np.dtype(t0), np.integer):
                out_type = pa.int64()
        except Exception:
            pass
        docs = attach_dense_ranks(docs, key, text, P).materialize()
        out_key, key = key, "__rank"

    if gram_shards <= 1:
        covered = partition_map(
            docs.map_batches(
                make_gram_rows(L, P, key=key, text=text),
                batch_format="pyarrow",
            ),
            P,
            _winner_cover(key),
            key="pkey",
        )
    else:
        # hold the (key, text) projection once so the S passes re-tokenize
        # but don't re-run the upstream pipeline; sequential materialize per
        # shard releases each shard's exchange spill before the next starts
        docs = docs.materialize()
        parts = []
        for s_i in range(gram_shards):
            parts.append(
                partition_map(
                    docs.map_batches(
                        make_gram_rows(
                            L, P, key=key, text=text,
                            shard=(s_i, gram_shards),
                        ),
                        batch_format="pyarrow",
                    ),
                    P,
                    _winner_cover(key),
                    key="pkey",
                ).materialize()
            )
        covered = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def tag_doc(t: pa.Table) -> pa.Table:
        ids = _key_ids(t[key])
        cols = {
            key: t[key],
            text: pc.fill_null(t[text], ""),
            "pos": pa.nulls(len(t), type=pa.int64()),
            "kind": pa.array(np.zeros(len(t), dtype=np.int8)),
            "pkey": pa.array(
                (mix64(ids ^ _KEY_MIX) % Pu).view(np.int64),
                type=pa.int64(),
            ),
        }
        if out_key is not None:
            cols[out_key] = t[out_key]
        return pa.table(cols)

    def tag_cov(t: pa.Table) -> pa.Table:
        ids = _key_ids(t[key])
        cols = {
            key: t[key],
            text: pa.nulls(len(t), type=pa.string()),
            "pos": t["pos"],
            "kind": pa.array(np.ones(len(t), dtype=np.int8)),
            "pkey": pa.array(
                (mix64(ids ^ _KEY_MIX) % Pu).view(np.int64),
                type=pa.int64(),
            ),
        }
        if out_key is not None:
            cols[out_key] = pa.nulls(len(t), type=out_type)
        return pa.table(cols)

    rows = docs.map_batches(tag_doc, batch_format="pyarrow").union(
        covered.map_batches(tag_cov, batch_format="pyarrow")
    )
    return partition_map(
        rows, P,
        make_trim_reduce(L, key=key, text=text, out_key=out_key),
        key="pkey",
    )
