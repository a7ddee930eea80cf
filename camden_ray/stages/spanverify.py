"""Distributed candidate-pair verification against the actual token streams.

The coarse substring pass (winnowed L-gram star buckets,
stages/signatures.py) guarantees detection of every shared span >=
``lgram_tokens + lgram_mod - 1`` tokens, but a bucket collision — two docs
whose 64-bit rolling-gram hashes collide without sharing a span — would
produce a FALSE edge that the coarse pass simply trusts. This module is the
refinement stage (SURVEY.md §8 TODO 3; the suffix-array analogue of Lee et
al. 2021): every candidate pair is re-verified against the real token
streams of both documents, distributed, with no driver-side text map.

Physical plan (all candidate-subset-sized — pairs ≪ corpus):

1. pair rows   — each pair (a, b) keyed by ``ppk = mix(digest(a) ^ digest(b))
                 % P`` (one partition owns the pair).
2. need rows   — (url, ppk) for BOTH endpoints, deduped.
3. text fetch  — the needs map (url → partitions that reference it) is
                 candidate-output-sized, so it is broadcast ONCE as CSR
                 arrays (``ray.put``, the sanctioned small-side pattern) and
                 every text batch replicates its rows to exactly the
                 partitions that need them — no second shuffle. If the map
                 ever exceeds driver comfort, a co-hash-partitioned
                 searchsorted semi-join (same merge as stages/cluster.py)
                 takes over — correct either way.
4. verify      — union(pair rows, text rows) → groupby(ppk): one partition
                 sees its pairs plus exactly the texts they reference;
                 per-pair check runs on numpy token-hash arrays with a final
                 raw-token window comparison (hash equality is only a
                 filter, the tokens themselves are the proof).

Generalizes camden's "verify by content, not by name" invariant
(/root/reference/src/scanner.rs:81-95) to span granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from camden_ray.config import DedupConfig
from camden_ray.functions.hashing import (
    TokenHasher,
    hash_string_column,
    mix64,
    rolling_lgram_hashes,
)
from camden_ray.functions.text import tokenize
from camden_ray.stages.candidates import default_partitions, partition_map

_PPK_MIX = np.uint64(0x9E6C63D0762C23C5)
_URL_MIX = np.uint64(0xC2B2AE3D27D4EB4F)


def _key_type(ds: "ray.data.Dataset"):
    """pyarrow type of the pair key column 'a', normalized — the ray Schema
    wrapper reports numpy/python types for non-Arrow-backed datasets."""
    t = dict(zip(ds.schema().names, ds.schema().types))["a"]
    if isinstance(t, pa.DataType):
        return t
    if np.issubdtype(np.dtype(t) if not isinstance(t, type) else t, np.integer):
        return pa.int64()
    return pa.string()


def _ids_any(col) -> np.ndarray:
    """64-bit ids of a key column: int64 columns ARE their ids (uid mode —
    no hashing), string columns get the vectorized url key hash."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).view(np.uint64)
    return hash_string_column(col)


def _url_pkey(urls: "pa.Array", P: int) -> np.ndarray:
    ids = _ids_any(urls)
    return (mix64(ids ^ _URL_MIX) % np.uint64(P)).view(np.int64)


def _pair_ppk(a: "pa.Array", b: "pa.Array", P: int) -> np.ndarray:
    ida = _ids_any(a)
    idb = _ids_any(b)
    return (mix64(ida ^ idb ^ _PPK_MIX) % np.uint64(P)).view(np.int64)


def _block_pair_digests(t: "pa.Table") -> "pa.Table":
    """Per-block symmetric pair digests, pre-uniqued (the merge task then
    unions block-sized partials instead of the raw pair stream)."""
    pk = mix64(mix64(_ids_any(t["a"])) ^ mix64(_ids_any(t["b"])))
    return pa.table({"pk": pa.array(np.unique(pk.view(np.int64)), type=pa.int64())})


@ray.remote(num_cpus=1)
def _merge_pair_digests(*tabs: "pa.Table") -> np.ndarray:
    """Union the per-block digest partials into one sorted array (the
    broadcast side of the anti-join's semi-join pushdown)."""
    parts = [t["pk"].to_numpy(zero_copy_only=False) for t in tabs if t.num_rows]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def _dedupe_pairs_table(t: "pa.Table") -> "pa.Table":
    """First occurrence per pair digest; drops the bookkeeping columns."""
    pk = t["pk"].to_numpy(zero_copy_only=False)
    first = np.zeros(len(pk), dtype=bool)
    first[np.unique(pk, return_index=True)[1]] = True
    out = t.filter(pa.array(first))
    return pa.table({"a": out["a"], "b": out["b"]})


@ray.remote(num_cpus=1)
def _dedupe_pairs_block(*tabs: "pa.Table") -> "pa.Table":
    """Small-residual dedup: concat + first-per-digest in one task."""
    parts = [t for t in tabs if t.num_rows]
    if not parts:
        t = max(tabs, key=lambda s: s.num_columns)
        return pa.table({"a": t["a"], "b": t["b"]})
    return _dedupe_pairs_table(pa.concat_tables(parts))


def _stamp_ppk(P: int):
    def f(t: "pa.Table") -> "pa.Table":
        pk = t["pk"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "ppk",
            pa.array((pk.view(np.uint64) % np.uint64(P)).view(np.int64),
                     type=pa.int64()),
        )

    return f


def antijoin_pairs(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    num_partitions: int,
    dedupe_left: bool = True,
    prefilter_cap: int = 20_000_000,
) -> "ray.data.Dataset":
    """Distributed anti-join of (a, b) pair sets: rows of ``left`` whose pair
    does NOT appear in ``right``, deduplicated by pair. Co-hash-partitioned
    on a 64-bit pair digest (one numpy searchsorted per partition; a digest
    collision can only suppress a pair, i.e. skip one verification — never
    invent an edge). Dedup happens inside the same shuffle, so callers don't
    need a separate distinct-groupby pass over the left side.

    Semi-join pushdown: ``right`` is typically the FULL corroborating edge
    set (corpus-scale) while ``left`` is the residual candidate set
    (pair-scale). When the left digest set fits ``prefilter_cap`` rows, it is
    collected in one driver pass and broadcast, and each right map task drops
    rows whose digest cannot match any left pair BEFORE the exchange — the
    shuffle then moves O(left) rows instead of O(right) (measured ~25× fewer
    rows on the substring anti-join). Output is identical either way: a
    right row removed by the prefilter could never have suppressed anything.
    """
    P = num_partitions

    left = left.materialize()  # consumed twice: digest pull + exchange
    digest_ref = None
    if prefilter_cap and left.count() <= prefilter_cap:
        # digest set built IN THE CLUSTER: per-block unique pair digests
        # (parallel map wave) merged by one assembly task whose return IS the
        # broadcast object — the previous driver iter_batches streamed the
        # whole left side serially through the driver (a corpus-growth-linear
        # serial section on the span critical path)
        refs = (
            left.select_columns(["a", "b"])
            .map_batches(_block_pair_digests, batch_format="pyarrow")
            .to_arrow_refs()
        )
        digest_ref = _merge_pair_digests.remote(*refs)

    if digest_ref is not None:
        # EXCHANGE-FREE anti-join (broadcast regime): the residual —
        # left pairs with no corroborating right pair — is usually a tiny
        # fraction of the inputs, so a partition exchange over left+right
        # rows is mostly wasted movement. Three map waves + two small merge
        # tasks replace it:
        #   1. right wave: per-block digests that MATCH the left set
        #      (pk ∈ D_left), merged to the corroborated set D_corr
        #      (≤ |left| ≤ prefilter_cap entries — broadcastable by
        #      construction);
        #   2. left wave: keep pk ∉ D_corr (the residual, pair-scale);
        #   3. dedup: one merge task when the residual is small, else a
        #      residual-sized exchange (never a left+right-sized one).
        def match_right(t: pa.Table) -> pa.Table:
            pk = mix64(mix64(_ids_any(t["a"])) ^ mix64(_ids_any(t["b"]))).view(
                np.int64
            )
            d = ray.get(digest_ref)
            if len(d) == 0:
                m = np.empty(0, dtype=np.int64)
            else:
                pos = np.searchsorted(d, pk)
                pos_c = np.minimum(pos, len(d) - 1)
                m = pk[(pos < len(d)) & (d[pos_c] == pk)]
            return pa.table({"pk": pa.array(np.unique(m), type=pa.int64())})

        corr_ref = _merge_pair_digests.remote(
            *right.select_columns(["a", "b"])
            .map_batches(match_right, batch_format="pyarrow")
            .to_arrow_refs()
        )

        def residual(t: pa.Table) -> pa.Table:
            pk = mix64(mix64(_ids_any(t["a"])) ^ mix64(_ids_any(t["b"]))).view(
                np.int64
            )
            d = ray.get(corr_ref)
            if len(d):
                pos = np.searchsorted(d, pk)
                pos_c = np.minimum(pos, len(d) - 1)
                keep = ~((pos < len(d)) & (d[pos_c] == pk))
            else:
                keep = np.ones(len(pk), dtype=bool)
            t = t.filter(pa.array(keep))
            return pa.table(
                {"pk": pa.array(pk[keep], type=pa.int64()),
                 "a": t["a"], "b": t["b"]}
            )

        res = (
            left.select_columns(["a", "b"])
            .map_batches(residual, batch_format="pyarrow")
            .materialize()
        )
        if not dedupe_left:
            return res.select_columns(["a", "b"])
        if res.count() <= 5_000_000:
            res_refs = res.to_arrow_refs()
            if not res_refs:
                return res.select_columns(["a", "b"])
            out_ref = _dedupe_pairs_block.remote(*res_refs)
            return ray.data.from_arrow_refs([out_ref])
        return partition_map(
            res.map_batches(_stamp_ppk(P), batch_format="pyarrow"),
            P,
            _dedupe_pairs_table,
            key="ppk",
        )

    def tag(is_right: bool):
        def f(t: pa.Table) -> pa.Table:
            ida = _ids_any(t["a"])
            idb = _ids_any(t["b"])
            # symmetric pair digest: (a,b) and (b,a) collide by construction
            pk = mix64(mix64(ida) ^ mix64(idb))
            if is_right and digest_ref is not None:
                d = ray.get(digest_ref)  # zero-copy from local store
                pkv = pk.view(np.int64)
                if len(d) == 0:
                    keep = np.zeros(len(pkv), dtype=bool)
                else:
                    pos = np.searchsorted(d, pkv)
                    pos_c = np.minimum(pos, len(d) - 1)
                    keep = (pos < len(d)) & (d[pos_c] == pkv)
                t = t.filter(pa.array(keep))
                pk = pk[keep]
            return pa.table(
                {
                    "pk": pa.array(pk.view(np.int64), type=pa.int64()),
                    "a": t["a"],
                    "b": t["b"],
                    "is_right": pa.array(np.full(len(t), is_right)),
                    "ppk": pa.array(
                        (pk % np.uint64(P)).view(np.int64), type=pa.int64()
                    ),
                }
            )

        return f

    def merge(t: pa.Table) -> pa.Table:
        is_right = t["is_right"].to_numpy(zero_copy_only=False)
        pk = t["pk"].to_numpy()
        rk = np.sort(pk[is_right])
        lt = t.filter(pa.array(~is_right))
        lk = pk[~is_right]
        if len(rk):
            pos = np.searchsorted(rk, lk)
            pos_c = np.minimum(pos, len(rk) - 1)
            keep = ~((pos < len(rk)) & (rk[pos_c] == lk))
        else:
            keep = np.ones(len(lk), dtype=bool)
        if dedupe_left and keep.any():
            first = np.zeros(len(lk), dtype=bool)
            first[np.unique(lk, return_index=True)[1]] = True
            keep &= first
        out = lt.filter(pa.array(keep))
        return pa.table({"a": out["a"], "b": out["b"]})

    rows = left.map_batches(tag(False), batch_format="pyarrow").union(
        right.map_batches(tag(True), batch_format="pyarrow")
    )
    # no repartition needed: partition_map groups fragmented upstream blocks
    # into ~P map tasks itself (the old pre-barrier paid a full extra copy)
    return partition_map(rows, P, merge, key="ppk")


def needed_url_array(
    pairs: "ray.data.Dataset", cap: int = 50_000_000
) -> "pa.Array | None":
    """Distinct endpoint urls of a candidate-pair Dataset, as a sorted Arrow
    array for broadcast prefiltering — or None when the set exceeds ``cap``
    (caller then skips the broadcast filter; the co-shuffle semi-join still
    handles the subset selection correctly, just with more data movement)."""
    urls: set = set()
    key_type = _key_type(pairs)
    for b in pairs.select_columns(["a", "b"]).iter_batches(
        batch_size=262144, batch_format="pyarrow"
    ):
        urls.update(b["a"].to_pylist())
        urls.update(b["b"].to_pylist())
        if len(urls) > cap:
            return None
    return pa.array(sorted(urls), type=key_type)


def pull_needs_csr(pairs: "ray.data.Dataset", num_partitions: int, cap: int = 50_000_000):
    """ONE driver pass over the (materialized, candidate-output-sized) pairs
    Dataset building the url → sorted-partition-list CSR map used to
    replicate texts — replaces a distributed distinct-groupby + pull.
    Returns (urls: pa.Array sorted unique, offsets: int64[n+1], ppks: int64)
    or None when the pair set exceeds ``cap`` rows (co-shuffle fallback).
    """
    url_chunks: list[pa.Array] = []
    ppk_chunks: list[np.ndarray] = []
    n = 0
    for b in pairs.select_columns(["a", "b"]).iter_batches(
        batch_size=262144, batch_format="pyarrow"
    ):
        ppk = _pair_ppk(b["a"], b["b"], num_partitions)
        a = b["a"].combine_chunks() if isinstance(b["a"], pa.ChunkedArray) else b["a"]
        bb = b["b"].combine_chunks() if isinstance(b["b"], pa.ChunkedArray) else b["b"]
        url_chunks.append(pa.concat_arrays([a, bb]))
        ppk_chunks.append(np.concatenate([ppk, ppk]))
        n += 2 * len(b["a"])
        if n > cap:
            return None
    if n == 0:
        return (
            pa.array([], type=_key_type(pairs)),
            np.zeros(1, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    urls = pa.chunked_array(url_chunks)
    ppks = np.concatenate(ppk_chunks)
    order = pc.sort_indices(urls)
    urls = urls.take(order).combine_chunks()
    ppks = ppks[order.to_numpy(zero_copy_only=False)]
    eq_prev = pc.equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    is_new = np.r_[True, ~eq_prev.to_numpy(zero_copy_only=False)]
    firsts = np.flatnonzero(is_new)
    csr_urls = urls.take(pa.array(firsts))
    # dedupe (url, ppk) repeats — vectorized via a combined group·P+ppk key
    runs = np.diff(np.r_[firsts, len(ppks)])
    gidx = np.repeat(np.arange(len(firsts), dtype=np.int64), runs)
    key = gidx * np.int64(num_partitions) + ppks
    uk = np.unique(key)
    out_ppks = uk % np.int64(num_partitions)
    g_of = uk // np.int64(num_partitions)
    new_offsets = np.searchsorted(g_of, np.arange(len(firsts) + 1, dtype=np.int64))
    return csr_urls, new_offsets.astype(np.int64), out_ppks


def pair_texts_partitions(
    pairs: "ray.data.Dataset",
    texts: "ray.data.Dataset",
    num_partitions: int,
    carry: tuple[str, ...] = (),
    needs_csr=None,
    text_type: "pa.DataType | None" = None,
) -> "ray.data.Dataset":
    """Co-locate each candidate pair with both endpoint payloads.

    ``pairs``: (a, b [, carry...]); ``texts``: (url, text) where the ``url``
    column is the JOIN KEY in the same id-space as the pair endpoints —
    url strings, or int64 uids (uid mode: no string ever enters the pair
    shuffles) — and ``text`` is any payload column (string text, or the
    list<int64> token-hash stream; pass ``text_type``). Returns a Dataset
    whose partitions (grouped by ``ppk``) contain, per pair, rows kind=0
    (a, b, carry) and kind=1 (key→a slot, payload column) for every
    referenced doc — ready for a per-partition verification pass. ``carry``
    columns must be float64.
    """
    P = num_partitions
    key_type = _key_type(pairs)
    text_type = text_type or pa.string()

    def pair_rows(t: pa.Table) -> pa.Table:
        ppk = _pair_ppk(t["a"], t["b"], P)
        cols = {
            "ppk": pa.array(ppk, type=pa.int64()),
            "kind": pa.array(np.zeros(len(t), dtype=np.int8)),
            "a": t["a"],
            "b": t["b"],
            "text": pa.nulls(len(t), type=text_type),
        }
        for c in carry:
            cols[c] = t[c]
        return pa.table(cols)

    def need_rows(t: pa.Table) -> pa.Table:
        ppk = _pair_ppk(t["a"], t["b"], P)
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"]
        urls = pa.concat_arrays([a, b])
        pk = np.concatenate([ppk, ppk])
        return pa.table(
            {"url": urls, "ppk": pa.array(pk, type=pa.int64())}
        )

    # The needs map (url → sorted list of partitions referencing it) is
    # candidate-output-sized: pulled in ONE driver pass (or handed in by the
    # caller, who typically also used its url list to prefilter the corpus
    # read) and broadcast ONCE via ray.put as CSR arrays. Every text batch
    # then replicates its rows to exactly the partitions that reference
    # them with two Arrow/numpy gathers: no second shuffle. Cap guard:
    # above driver comfort, fall back to a co-hash-partitioned searchsorted
    # semi-join (slower, zero driver state).
    csr = needs_csr if needs_csr is not None else pull_needs_csr(pairs, P)
    if csr is not None:
        csr_ref = ray.put(csr)

        def replicate(t: pa.Table) -> pa.Table:
            urls_s, offs, ppks = ray.get(csr_ref)
            idx = pc.index_in(t["url"], value_set=urls_s)
            valid = pc.is_valid(idx)
            t = t.filter(valid)
            g = idx.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
            counts = offs[g + 1] - offs[g]
            total = int(counts.sum())
            if total == 0:
                return pa.table(
                    {"ppk": pa.array([], type=pa.int64()),
                     "url": pa.array([], type=t["url"].type),
                     "text": pa.array([], type=text_type)}
                )
            row_rep = np.repeat(np.arange(len(t), dtype=np.int64), counts)
            cum0 = np.r_[0, np.cumsum(counts)[:-1]]
            within = np.arange(total, dtype=np.int64) - np.repeat(cum0, counts)
            ppk_out = ppks[np.repeat(offs[g], counts) + within]
            rt = t.take(pa.array(row_rep))
            return pa.table(
                {"ppk": pa.array(ppk_out, type=pa.int64()),
                 "url": rt["url"], "text": rt["text"]}
            )

        text_rows = texts.map_batches(replicate, batch_format="pyarrow")
    else:
        needs = (
            pairs.map_batches(need_rows, batch_format="pyarrow")
            .groupby(["url", "ppk"])
            .count()
            .select_columns(["url", "ppk"])
        )
        text_rows = _coshuffle_semijoin(needs, texts, P, text_type)

    def as_text_kind(t: pa.Table) -> pa.Table:
        cols = {
            "ppk": t["ppk"],
            "kind": pa.array(np.ones(len(t), dtype=np.int8)),
            "a": t["url"],
            "b": pa.nulls(len(t), type=key_type),
            "text": t["text"],
        }
        for c in carry:
            cols[c] = pa.nulls(len(t), type=pa.float64())
        return pa.table(cols)

    # no coalesce: the downstream partition_map groups fragmented upstream
    # blocks into ~P map tasks itself
    return pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        text_rows.map_batches(as_text_kind, batch_format="pyarrow")
    )


def _coshuffle_semijoin(
    needs: "ray.data.Dataset", texts: "ray.data.Dataset", P: int,
    text_type: "pa.DataType | None" = None,
) -> "ray.data.Dataset":
    """Fallback semi-join for needs maps too large to broadcast: co-hash-
    partition needs and texts on url, searchsorted merge per partition.
    Returns (ppk, url, text) — one row per (needing partition, url)."""
    text_type = text_type or pa.string()

    def tag_need(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "upk": pa.array(_url_pkey(t["url"], P), type=pa.int64()),
                "url": t["url"],
                "ppk": t["ppk"],
                "text": pa.nulls(len(t), type=text_type),
                "is_text": pa.array(np.zeros(len(t), dtype=bool)),
            }
        )

    def tag_text(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "upk": pa.array(_url_pkey(t["url"], P), type=pa.int64()),
                "url": t["url"],
                "ppk": pa.nulls(len(t), type=pa.int64()),
                "text": t["text"],
                "is_text": pa.array(np.ones(len(t), dtype=bool)),
            }
        )

    def attach_text(t: pa.Table) -> pa.Table:
        is_text = t["is_text"].to_numpy(zero_copy_only=False)
        turl = t["url"].filter(pa.array(is_text))
        ttext = t["text"].filter(pa.array(is_text))
        order = pc.sort_indices(turl)
        turl = turl.take(order).combine_chunks()
        ttext = ttext.take(order).combine_chunks()
        nt = t.filter(pa.array(~is_text))
        nurl = nt["url"]
        if isinstance(nurl, pa.ChunkedArray):
            nurl = nurl.combine_chunks()
        idx = pc.index_in(nurl, value_set=turl)
        valid = pc.is_valid(idx)
        nt = nt.filter(valid)
        idx = idx.filter(valid)
        return pa.table(
            {"ppk": nt["ppk"], "url": nt["url"], "text": ttext.take(idx)}
        )

    rows = needs.map_batches(tag_need, batch_format="pyarrow").union(
        texts.map_batches(tag_text, batch_format="pyarrow")
    )
    return partition_map(rows, P, attach_text, key="upk")


def _partition_pairs_and_texts(t: pa.Table):
    kind = t["kind"].to_numpy(zero_copy_only=False)
    is_pair = kind == 0
    pt = t.filter(pa.array(is_pair))
    tt = t.filter(pa.array(~is_pair))
    col = tt["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) and col.null_count == 0:
        # token-hash streams: zero-copy numpy views into the flat values
        # buffer instead of to_pylist (which boxed ~400 Python ints per doc
        # and dominated the span-verify partitions' wall)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]  # filter/slice can leave a nonzero start
        keys = tt["a"].to_pylist()
        texts = {k: flat[offs[i] : offs[i + 1]] for i, k in enumerate(keys)}
    else:
        texts = dict(zip(tt["a"].to_pylist(), col.to_pylist()))
    return pt, texts


def _verify_span_pairs_arrays(
    a_ids, b_ids, th_of, L: int
) -> tuple[list, list, list]:
    """Shared span-verification kernel: keep (a, b) iff the two token-hash
    streams truly share a contiguous >= L-token window. ``th_of(id)`` returns
    the doc's uint64 token-hash array. Used identically by the distributed
    per-partition pass and the driver-inline small-residual path, so the two
    paths cannot drift semantically."""
    gram_cache: dict = {}

    def grams(u) -> tuple[np.ndarray, np.ndarray]:
        g = gram_cache.get(u)
        if g is None:
            raw = rolling_lgram_hashes(th_of(u), L)
            # sorted-unique twin cached per url: the pair loop intersects via
            # searchsorted instead of re-sorting both arrays per pair
            # (np.intersect1d sorts the concatenation on every call)
            g = (raw, np.unique(raw))
            gram_cache[u] = g
        return g

    keep_a: list = []
    keep_b: list = []
    est: list[float] = []
    for a, b in zip(a_ids, b_ids):
        (ga, sa), (gb, sb) = grams(a), grams(b)
        if not len(sa) or not len(sb):
            continue
        if len(sa) > len(sb):  # search the smaller set in the bigger one
            sa, sb = sb, sa
        idx = np.searchsorted(sb, sa)
        idx[idx == len(sb)] = 0
        common = sa[sb[idx] == sa]  # sorted ascending, same as intersect1d
        if not len(common):
            continue
        ta, tb = th_of(a), th_of(b)
        verified = False
        # confirm up to 4 distinct matching gram hashes on the token-hash
        # windows themselves (hash equality is only a filter — the windows
        # are the proof)
        for hv in common[:4]:
            pa_pos = np.flatnonzero(ga == hv)
            pb_pos = np.flatnonzero(gb == hv)
            for i in pa_pos[:2]:
                wa = ta[i : i + L]
                for j in pb_pos[:2]:
                    if np.array_equal(wa, tb[j : j + L]):
                        verified = True
                        break
                if verified:
                    break
            if verified:
                break
        if verified:
            keep_a.append(a)
            keep_b.append(b)
            est.append(min(1.0, len(common) / max(1, min(len(ga), len(gb)))))
    return keep_a, keep_b, est


def verify_span_edges(
    pairs: "ray.data.Dataset",
    ths: "ray.data.Dataset",
    cfg: DedupConfig,
    needs_csr=None,
) -> "ray.data.Dataset":
    """Substring-edge refinement: keep a pair iff the two token streams truly
    share a contiguous >= ``lgram_tokens``-token span.

    ``ths``: (url, text) where ``text`` is each doc's FULL token-hash stream
    (list<int64>, the signature stage's ``th`` column) — no document is ever
    re-read or re-extracted. Hash positions are found with the full
    (unwinnowed) rolling-gram arrays; every gram-hash match is confirmed by
    comparing the per-token-hash windows, so a single 64-bit rolling-gram
    collision cannot survive (a false span would need ``lgram_tokens``
    simultaneous independent token-hash collisions). Output schema matches
    the edge schema (a, b, est, method='substring'); ``est`` = matched-span
    length / tokens.
    """

    P = default_partitions(cfg)
    L = cfg.lgram_tokens
    key_type = _key_type(pairs)

    rows = pair_texts_partitions(
        pairs, ths, P, needs_csr=needs_csr, text_type=pa.list_(pa.int64())
    )

    def verify(t: pa.Table) -> pa.Table:
        pt, tx = _partition_pairs_and_texts(t)
        th_cache: dict = {}

        def th_arr(u) -> np.ndarray:
            v = th_cache.get(u)
            if v is None:
                raw = tx.get(u)
                v = (
                    np.asarray(raw, dtype=np.int64).view(np.uint64)
                    if raw is not None and len(raw)
                    else np.empty(0, dtype=np.uint64)
                )
                th_cache[u] = v
            return v

        keep_a, keep_b, est = _verify_span_pairs_arrays(
            pt["a"].to_pylist(), pt["b"].to_pylist(), th_arr, L
        )
        return pa.table(
            {
                "a": pa.array(keep_a, type=key_type),
                "b": pa.array(keep_b, type=key_type),
                "est": pa.array(est, type=pa.float64()),
                "method": pa.array(["substring"] * len(keep_a), type=pa.string()),
            }
        )

    return partition_map(rows, P, verify, key="ppk")


def refine_substring_edges_inline(
    edges: "ray.data.Dataset",
    sig_ds: "ray.data.Dataset",
    cfg: DedupConfig,
    timings: dict | None = None,
) -> "ray.data.Dataset | None":
    """Driver-inline twin of the distributed substring refinement for SMALL
    edge sets: the anti-join and span verification run as numpy passes on the
    driver instead of two partition_map exchanges (~3-4 s of fixed exchange
    orchestration that dominates small runs; at 100 TB the distributed path
    takes over via ``cfg.span_inline_max_edges``).

    Semantics identical to antijoin_pairs + verify_span_edges (parity-tested
    in tests/test_spanverify.py): uncorroborated substring pairs, deduped by
    symmetric pair digest, verified against the real token-hash streams via
    the SAME kernel (:func:`_verify_span_pairs_arrays`). Token streams are
    fetched with one broadcast-prefiltered pass over the signature table —
    endpoint-set-sized, never corpus-sized. Returns None if the endpoint set
    exceeds ``cfg.span_inline_max_endpoints`` (caller falls back to the
    distributed path; the edge-count gate normally keeps us far below)."""
    import time as _time

    t0 = _time.monotonic()
    # one driver pass over the (materialized, capped-size) edge set
    a_chunks: list[np.ndarray] = []
    b_chunks: list[np.ndarray] = []
    sub_mask_chunks: list[np.ndarray] = []
    for t in edges.select_columns(["a", "b", "method"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        a_chunks.append(t["a"].to_numpy(zero_copy_only=False))
        b_chunks.append(t["b"].to_numpy(zero_copy_only=False))
        sub_mask_chunks.append(
            pc.equal(t["method"], "substring").to_numpy(zero_copy_only=False)
        )
    if not a_chunks:
        return edges
    a = np.concatenate(a_chunks)
    b = np.concatenate(b_chunks)
    is_sub = np.concatenate(sub_mask_chunks)
    # symmetric pair digest — the same key the distributed anti-join uses
    pk = mix64(mix64(a.view(np.uint64)) ^ mix64(b.view(np.uint64)))
    other_k = np.unique(pk[~is_sub])
    sa, sb, spk = a[is_sub], b[is_sub], pk[is_sub]
    pos = np.searchsorted(other_k, spk)
    pos_c = np.minimum(pos, max(0, len(other_k) - 1))
    corroborated = (
        (pos < len(other_k)) & (other_k[pos_c] == spk)
        if len(other_k)
        else np.zeros(len(spk), dtype=bool)
    )
    residual = ~corroborated
    # dedupe by pair digest (same rule as the distributed merge)
    first = np.zeros(len(spk), dtype=bool)
    first[np.unique(spk, return_index=True)[1]] = True
    residual &= first
    ra, rb = sa[residual], sb[residual]
    if timings is not None:
        timings["span_antijoin"] = round(_time.monotonic() - t0, 3)
        timings["span_residual_pairs"] = int(len(ra))
    if not len(ra):
        return edges.map_batches(
            lambda t: t.filter(pc.not_equal(t["method"], "substring")),
            batch_format="pyarrow",
        )

    endpoints = np.unique(np.concatenate([ra, rb]))
    if len(endpoints) > cfg.span_inline_max_endpoints:
        return None  # too many token streams for driver comfort

    # fetch exactly the needed token-hash streams: broadcast the endpoint
    # set once, prefilter inside each map task (endpoint-sized output)
    t0 = _time.monotonic()
    ep_ref = ray.put(endpoints)

    def pick(t: pa.Table) -> pa.Table:
        ep = ray.get(ep_ref)
        u = t["uid"].to_numpy(zero_copy_only=False)
        p = np.searchsorted(ep, u)
        p_c = np.minimum(p, len(ep) - 1)
        return t.filter(pa.array((p < len(ep)) & (ep[p_c] == u)))

    th_map: dict[int, np.ndarray] = {}
    for t in (
        sig_ds.select_columns(["uid", "th"])
        .map_batches(pick, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 18, batch_format="pyarrow")
    ):
        uids = t["uid"].to_numpy(zero_copy_only=False)
        ths = t["th"].to_pylist()
        for u, v in zip(uids, ths):
            th_map[int(u)] = (
                np.asarray(v, dtype=np.int64).view(np.uint64)
                if v is not None and len(v)
                else np.empty(0, dtype=np.uint64)
            )
    if timings is not None:
        timings["span_endpoint_urls"] = int(len(endpoints))
        timings["span_th_fetch"] = round(_time.monotonic() - t0, 3)

    t0 = _time.monotonic()
    _empty = np.empty(0, dtype=np.uint64)

    def th_of(u) -> np.ndarray:
        return th_map.get(int(u), _empty)

    keep_a, keep_b, est = _verify_span_pairs_arrays(
        ra, rb, th_of, cfg.lgram_tokens
    )
    if timings is not None:
        timings["span_verify_exec"] = round(_time.monotonic() - t0, 3)
        timings["span_verified_pairs"] = int(len(keep_a))
    others = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["method"], "substring")),
        batch_format="pyarrow",
    )
    verified = pa.table(
        {
            "a": pa.array(keep_a, type=pa.int64()),
            "b": pa.array(keep_b, type=pa.int64()),
            "est": pa.array(est, type=pa.float64()),
            "method": pa.array(["substring"] * len(keep_a), type=pa.string()),
        }
    )
    return others.union(ray.data.from_arrow(verified))


def verify_jaccard_pairs(
    pairs: "ray.data.Dataset",
    texts: "ray.data.Dataset",
    cfg: DedupConfig,
    tau: float,
    needs_csr=None,
) -> "ray.data.Dataset":
    """Exact shingle-set Jaccard >= tau per candidate pair — distributed.

    Replaces the driver-side whole-corpus text dict (the old
    ``doc_ngram_jaccard_pairs`` broadcast): texts travel only to partitions
    whose pairs reference them. Jaccard is computed on raw token k-gram
    TUPLES (set semantics) — exact, not hash-estimated.
    """

    P = default_partitions(cfg)
    k = cfg.shingle_k
    key_type = _key_type(pairs)

    rows = pair_texts_partitions(pairs, texts, P, needs_csr=needs_csr)

    def verify(t: pa.Table) -> pa.Table:
        pt, tx = _partition_pairs_and_texts(t)
        shingle_cache: dict[str, set] = {}

        def shingles(u: str) -> set:
            s = shingle_cache.get(u)
            if s is None:
                tk = tokenize(tx.get(u, "") or "")
                s = {tuple(tk[i : i + k]) for i in range(max(0, len(tk) - k + 1))}
                shingle_cache[u] = s
            return s

        keep_a: list = []
        keep_b: list = []
        jac: list[int] = []
        seen: set = set()
        for a, b in zip(pt["a"].to_pylist(), pt["b"].to_pylist()):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            sa, sb = shingles(a), shingles(b)
            j = len(sa & sb) / max(1, len(sa | sb))
            if j >= tau:
                keep_a.append(a)
                keep_b.append(b)
                # half-away-from-zero (DuckDB round), not Python's half-even
                jac.append(int(np.trunc(j * 100_000 + 0.5)))
        return pa.table(
            {
                "a": pa.array(keep_a, type=key_type),
                "b": pa.array(keep_b, type=key_type),
                "jaccard_fp": pa.array(jac, type=pa.int64()),
            }
        )

    return partition_map(rows, P, verify, key="ppk")
