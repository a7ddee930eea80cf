"""Incremental dedup: match a NEW shard against an existing corpus without
recomputing the corpus.

The production shape of camden's scan→checksum→group loop
(/root/reference/src/scanner.rs:17-49) at corpus scale is not "re-run the
whole pipeline when a crawl shard lands" — it is "dedup the new shard against
what we already know". This module does that with three corpus-side costs,
all map-only column-pruned scans (NO corpus shuffle, NO re-extraction, NO
re-signature — the signature stage is >50 % of full-run wall):

  1. expand+filter: each base doc's candidate keys are computed in the
     worker's heap and immediately filtered against the (broadcast) key set
     the new shard touches — only matching rows (≈ bucket mates of new docs)
     leave the task;
  2. a (uid, vsig) semi-join to build the verification-sketch sidecar for
     exactly the docs sitting in touched buckets;
  3. a (uid, url) semi-join to resolve edge endpoints / representative urls.

Everything that shuffles is sized by the NEW shard and its bucket mates,
not the corpus.

Why this is exact (the bucket-completeness invariant): a bucket's key is a
pure function of one document's content, so the BASE members of any bucket
are the same in the base run and in a full (base ∪ new) run. Hence
  * every bucket containing ≥ 1 new doc is reconstructed COMPLETELY here
    (all its base members match the key filter), so all new-touching edges
    of a full run are found; and
  * every base–base edge of a full run was already present in the base run,
    so base-side connectivity is fully captured by the base run's cluster
    assignments — carried here by mapping base endpoints onto their existing
    cluster representatives before union-find.
Therefore the partition of new docs into clusters equals the full run's
partition restricted to new docs (asserted by tests/test_incremental.py).

Cluster-id semantics differ from a full run ON PURPOSE: existing cluster ids
are STABLE. A new doc joining an existing cluster adopts its id even if the
new url is lexicographically smaller (a full run would rename the cluster to
the new min url — useless churn in production, where downstream state is
keyed by cluster id). When a new doc bridges several existing clusters they
merge under the lexicographically smallest existing id; the merges are
reported in ``base_merges``.

Scale regimes (code-level, not doc caveats): below
``cfg.driver_unionfind_max_edges`` the delta edges are collected and
clustered on the driver (the fast small regime); above it
:func:`_cluster_delta_distributed` takes over — base endpoints are remapped
to their existing cluster reps by a co-partition merge, components run
through the distributed hash-to-min propagation, and assignments
shuffle-join onto the new shard, so NO edge-sized driver state exists in
that regime (parity with the driver path is pinned by
tests/test_incremental.py with the bar forced to 0). What remains
driver/broadcast-resident is *shard-sized* by construction — the new
shard's distinct bucket keys and uid set, which the broadcast-filter
architecture itself requires (the same bounded role as the benchmark gram
broadcast in decontamination).
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from camden_ray.config import DedupConfig
from camden_ray.sources.webtext import read_webtext


def _sorted_u64(vals_i64: np.ndarray) -> np.ndarray:
    return np.unique(vals_i64.view(np.uint64))


def _member_mask(vals_i64: np.ndarray, sorted_u64: np.ndarray) -> np.ndarray:
    """Vectorized membership of int64 values in a sorted uint64 array."""
    if not len(sorted_u64) or not len(vals_i64):
        return np.zeros(len(vals_i64), dtype=bool)
    v = vals_i64.view(np.uint64)
    pos = np.searchsorted(sorted_u64, v)
    posc = np.minimum(pos, len(sorted_u64) - 1)
    return (pos < len(sorted_u64)) & (sorted_u64[posc] == v)


def _collect_column(ds: "ray.data.Dataset", col: str) -> np.ndarray:
    """Driver-side int64 column pull (block refs, no projection task wave)."""
    tabs = ray.get(ds.to_arrow_refs())
    parts = [
        t[col].to_numpy(zero_copy_only=False) for t in tabs if t.num_rows
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts)


def _distinct_keys(cand: "ray.data.Dataset", col: str) -> np.ndarray:
    """Distinct int64 keys of a (new-shard-sized) candidate-row dataset,
    merged on the driver from per-block unique partials."""

    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(t[col].to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(u, type=pa.int64())})

    tabs = ray.get(
        cand.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    parts = [t[col].to_numpy(zero_copy_only=False) for t in tabs if t.num_rows]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return _sorted_u64(np.concatenate(parts))


def _semijoin_sig(
    sig_ds: "ray.data.Dataset", uids_sorted: np.ndarray, columns: list[str]
) -> "ray.data.Dataset":
    """Map-only semi-join: sig rows whose uid is in the broadcast set."""
    need_ref = ray.put(uids_sorted)

    def pick(t: pa.Table) -> pa.Table:
        m = _member_mask(t["uid"].to_numpy(zero_copy_only=False), ray.get(need_ref))
        return t.filter(pa.array(m))

    return sig_ds.select_columns(columns).map_batches(
        pick, batch_format="pyarrow"
    )


def _incremental_star_edges(
    new_sig: "ray.data.Dataset",
    base_sig: "ray.data.Dataset",
    union_sig: "ray.data.Dataset",
    cfg: DedupConfig,
    P: int,
) -> "ray.data.Dataset":
    """New-touching star edges (exact / minhash / substring) via ONE small
    exchange over (new ∪ matching-base) candidate rows."""
    from camden_ray.stages.candidates import (
        _count_hot,
        _hot_array,
        _salt_keys,
        _stamp_edges,
        build_vsig_sidecar,
        make_unified_partition_grouper,
        make_unified_star_expander,
        partition_map,
        salted_gkey_map,
    )

    expander = make_unified_star_expander(cfg)  # count mode: (key, uid, branch)
    sig_cols = [
        c
        for c in ("uid", "digest", "sig", "lgrams")
        if c in new_sig.schema().names
    ]

    new_cand = (
        new_sig.select_columns(sig_cols)
        .map_batches(expander, batch_format="pyarrow")
        .materialize()
    )
    keys_new = _distinct_keys(new_cand, "key")
    keys_ref = ray.put(keys_new)

    def expand_filter(t: pa.Table) -> pa.Table:
        c = expander(t)
        m = _member_mask(
            c["key"].to_numpy(zero_copy_only=False), ray.get(keys_ref)
        )
        return c.filter(pa.array(m))

    base_cand = (
        base_sig.select_columns(sig_cols)
        .map_batches(expand_filter, batch_format="pyarrow")
        .materialize()
    )
    cand = new_cand.union(base_cand).materialize()

    # hot buckets counted EXACTLY (the candidate set is already filtered and
    # small — no sampling needed, unlike the full pipeline's corpus pass)
    hot_keys = _count_hot(cand, float(cfg.bucket_cap))
    hot_arr = _hot_array(hot_keys)
    smap = salted_gkey_map(hot_keys, cfg)

    vsig_ref = None
    if "minhash" in cfg.methods:
        # sketch sidecar over exactly the docs in touched buckets: bucket
        # members all survive the key filter, so the grouper's membership
        # check holds by construction
        bucket_uids = _sorted_u64(_collect_column(cand, "uid")).view(np.int64)
        vsig_cols = ["uid", "vsig" if "vsig" in union_sig.schema().names else "sig"]
        sub_sig = _semijoin_sig(union_sig, bucket_uids.view(np.uint64), vsig_cols)
        vsig_ref = build_vsig_sidecar(sub_sig, cfg)

    def salt_pkey(t: pa.Table) -> pa.Table:
        keys = t["key"].to_numpy(zero_copy_only=False)
        uids = t["uid"].to_numpy(zero_copy_only=False)
        gkey, pkey = _salt_keys(keys, uids, hot_arr, cfg, P)
        return pa.table(
            {
                "gkey": pa.array(gkey, type=pa.int64()),
                "uid": t["uid"],
                "branch": t["branch"],
                "pkey": pa.array(pkey, type=pa.int64()),
            }
        )

    grouped = partition_map(
        cand,
        P,
        make_unified_partition_grouper(cfg, salted_map=smap, vsig_ref=vsig_ref),
        map_fn=salt_pkey,
    ).materialize()
    edges = grouped.map_batches(_stamp_edges, batch_format="pyarrow")
    if not len(hot_arr):
        return edges

    # hot-bucket rep re-link (same second pass as unified_star_edges_uid)
    def rep_rows_fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "rep"))
        return pa.table(
            {
                "gkey": t["key"],
                "uid": t["a"],
                "branch": t["branch"],
                "vsig": t["vsig"],
                "pkey": pa.array([0] * len(t), type=pa.int64()),
            }
        )

    rep_rows = grouped.map_batches(rep_rows_fn, batch_format="pyarrow")
    rep_grouped = partition_map(
        rep_rows,
        1,
        make_unified_partition_grouper(cfg, salted_map=None, vsig_ref=vsig_ref),
    )
    rep_edges = rep_grouped.map_batches(_stamp_edges, batch_format="pyarrow")
    return edges.union(rep_edges)


def _incremental_simhash_edges(
    new_sig: "ray.data.Dataset",
    base_sig: "ray.data.Dataset",
    cfg: DedupConfig,
    P: int,
) -> "ray.data.Dataset":
    """New-touching simhash edges: pigeonhole keys of the new shard filter
    the base expansion before the (small) exchange."""
    from camden_ray.functions.hashing import mix64
    from camden_ray.stages.candidates import (
        _PKEY_MIX,
        make_simhash_expander,
        make_simhash_partition_grouper,
        partition_map,
    )

    expander = make_simhash_expander(cfg)  # (gkey, uid, simhash)
    new_rows = (
        new_sig.select_columns(["uid", "simhash"])
        .map_batches(expander, batch_format="pyarrow")
        .materialize()
    )
    keys_new = _distinct_keys(new_rows, "gkey")
    keys_ref = ray.put(keys_new)

    def expand_filter(t: pa.Table) -> pa.Table:
        c = expander(t)
        m = _member_mask(
            c["gkey"].to_numpy(zero_copy_only=False), ray.get(keys_ref)
        )
        return c.filter(pa.array(m))

    base_rows = (
        base_sig.select_columns(["uid", "simhash"])
        .map_batches(expand_filter, batch_format="pyarrow")
        .materialize()
    )
    rows = new_rows.union(base_rows)

    Pu = np.uint64(P)

    def add_pkey(t: pa.Table) -> pa.Table:
        k = t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64)
        pkey = (mix64(k ^ _PKEY_MIX) % Pu).view(np.int64)
        return t.append_column("pkey", pa.array(pkey, type=pa.int64()))

    grouped = partition_map(
        rows, P, make_simhash_partition_grouper(cfg), map_fn=add_pkey
    )
    return grouped.map_batches(
        lambda t: t.append_column(
            "method", pa.array(["simhash"] * len(t), type=pa.string())
        ),
        batch_format="pyarrow",
    )


def _remap_endpoint_col(
    edges: "ray.data.Dataset",
    bmap: "ray.data.Dataset",
    col: str,
    other: str,
    new_ref,
    P: int,
) -> "ray.data.Dataset":
    """Distributed endpoint remap: edge column ``col`` values found in
    ``bmap`` (uid → rep_uid) are replaced by their base cluster-rep uid;
    values in the new-shard set pass through. A base endpoint matching
    NEITHER means ``base_clusters`` does not cover every base doc — the
    merge task raises, mirroring the driver path's validation."""
    from camden_ray.functions.hashing import mix64
    from camden_ray.stages.candidates import partition_map

    Pu = np.uint64(P)
    KMIX = np.uint64(0x94D049BB133111EB)

    def _pkey(vals: np.ndarray) -> pa.Array:
        return pa.array(
            (mix64(vals.view(np.uint64) ^ KMIX) % Pu).view(np.int64),
            type=pa.int64(),
        )

    def tag_fact(t: pa.Table) -> pa.Table:
        k = t[col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": t[col],
                "other": t[other],
                "m": pa.nulls(len(t), type=pa.int64()),
                "is_dim": pa.array(np.zeros(len(t), dtype=bool)),
                "pkey": _pkey(k),
            }
        )

    def tag_dim(t: pa.Table) -> pa.Table:
        k = t["uid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": t["uid"],
                "other": pa.nulls(len(t), type=pa.int64()),
                "m": t["rep_uid"],
                "is_dim": pa.array(np.ones(len(t), dtype=bool)),
                "pkey": _pkey(k),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        is_dim = t["is_dim"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        dk = k[is_dim]
        order = np.argsort(dk)
        dk = dk[order]
        # fill the cross-kind null slots BEFORE to_numpy: a null-bearing
        # int64 column converts to float64 + NaN, which silently rounds
        # 64-bit uid hashes past double precision
        m_all = pc.fill_null(t["m"], 0).to_numpy(zero_copy_only=False)
        o_all = pc.fill_null(t["other"], 0).to_numpy(zero_copy_only=False)
        dm = m_all[is_dim][order]
        fmask = ~is_dim
        fk = k[fmask]
        fo = o_all[fmask]
        # NEW-shard membership takes precedence over the base map — same
        # rule as the driver path (a url present in BOTH shards is a new
        # doc; remapping it to its base rep would silently drop it from
        # the components)
        is_new = _member_mask(fk, ray.get(new_ref))
        if len(dk):
            pos = np.searchsorted(dk, fk)
            ok = pos < len(dk)
            pos_c = np.minimum(pos, len(dk) - 1)
            ok &= dk[pos_c] == fk
            ok &= ~is_new
            mapped = np.where(ok, dm[pos_c], fk)
        else:
            ok = np.zeros(len(fk), dtype=bool)
            mapped = fk
        n_miss = int((~ok & ~is_new).sum())
        if n_miss:
            raise ValueError(
                f"{n_miss} base edge endpoints are missing from "
                "base_clusters — it must cover every base document"
            )
        return pa.table(
            {col: pa.array(mapped, type=pa.int64()),
             other: pa.array(fo, type=pa.int64())}
        )

    rows = edges.map_batches(tag_fact, batch_format="pyarrow").union(
        bmap.map_batches(tag_dim, batch_format="pyarrow")
    )
    return partition_map(rows, P, merge, key="pkey")


def _cluster_delta_distributed(
    e: "ray.data.Dataset",
    new_sig: "ray.data.Dataset",
    base_sig: "ray.data.Dataset",
    base_clusters: "ray.data.Dataset | None",
    new_uids: np.ndarray,
    P: int,
) -> tuple:
    """Delta clustering above ``driver_unionfind_max_edges`` — NO edge-sized
    driver state (the code-level fallback for the module's one remaining
    driver cap): base endpoints are remapped to their existing cluster-rep
    uid with a co-partition merge, components run through
    ``hash_to_min_components_uid``, and assignments shuffle-join onto the
    new shard. The incremental naming contract (existing ids take priority,
    min existing id on merges, else min new url) is encoded by a 1-byte
    name prefix — "0"+cluster_id for base reps, "1"+url for new docs — so
    the unchanged distributed Min(name) fixup picks exactly the driver
    path's representative; the prefix is stripped before assignment.
    Parity with the driver path is asserted by
    tests/test_incremental.py (cap forced to 0).

    Returns ``(clusters, base_merges, n_dup_new)``.
    """
    from camden_ray.functions.hashing import hash_string_column
    from camden_ray.stages.cluster import (
        assign_clusters_distributed_uid,
        hash_to_min_components_uid,
    )

    new_ref = ray.put(new_uids)
    e2 = e.select_columns(["a", "b"])

    def _prefix(tag: str, col) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.binary_join_element_wise(
            pa.array([tag] * len(col)), col, ""
        )

    if base_clusters is not None:
        def to_bmap(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "uid": pa.array(
                        hash_string_column(t["url"]).view(np.int64),
                        type=pa.int64(),
                    ),
                    "rep_uid": pa.array(
                        hash_string_column(t["cluster_id"]).view(np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        bmap = base_clusters.select_columns(["url", "cluster_id"]).map_batches(
            to_bmap, batch_format="pyarrow"
        ).materialize()
        e2 = _remap_endpoint_col(e2, bmap, "a", "b", new_ref, P)
        e2 = _remap_endpoint_col(e2, bmap, "b", "a", new_ref, P).materialize()

        def rep_names(t: pa.Table) -> pa.Table:
            cid = t["cluster_id"]
            if isinstance(cid, pa.ChunkedArray):
                cid = cid.combine_chunks()
            names = _prefix("0", cid)
            uids = hash_string_column(cid).view(np.int64)
            # dual rows: a base url re-crawled in the new shard keeps its own
            # uid through clustering (never remapped), so its base cluster id
            # must ALSO be named at that uid — same rule as the driver path
            u_uid = hash_string_column(t["url"]).view(np.int64)
            dual = _member_mask(u_uid, ray.get(new_ref))
            out_uid = np.concatenate([uids, u_uid[dual]])
            out_name = pa.concat_arrays(
                [names, names.filter(pa.array(dual))]
            )
            return pa.table(
                {
                    "uid": pa.array(out_uid, type=pa.int64()),
                    "url": out_name,
                }
            )

        base_names = base_clusters.select_columns(["url", "cluster_id"]).map_batches(
            rep_names, batch_format="pyarrow"
        )
    else:
        # no base assignment state: every base doc is its own rep
        def base_self_names(t: pa.Table) -> pa.Table:
            return pa.table(
                {"uid": t["uid"], "url": _prefix("0", t["url"])}
            )

        base_names = base_sig.select_columns(["uid", "url"]).map_batches(
            base_self_names, batch_format="pyarrow"
        )

    def new_names(t: pa.Table) -> pa.Table:
        return pa.table({"uid": t["uid"], "url": _prefix("1", t["url"])})

    name_dim = base_names.union(
        new_sig.select_columns(["uid", "url"]).map_batches(
            new_names, batch_format="pyarrow"
        )
    )
    comp = hash_to_min_components_uid(e2, name_dim, num_partitions=P).materialize()

    def strip_cid(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "uid": t["uid"],
                "url": t["url"],
                "cluster_id": pc.utf8_slice_codeunits(
                    t["cluster_id"], 1, 1 << 30
                ),
            }
        )

    comp_s = comp.map_batches(strip_cid, batch_format="pyarrow").materialize()
    clusters = assign_clusters_distributed_uid(
        new_sig.select_columns(["url", "uid"]), comp_s, num_partitions=P
    ).materialize()

    # stats + base-merge reporting (merge groups are rare — only the
    # multi-base-name components come back to the driver)
    def base_members(t: pa.Table) -> pa.Table:
        url = t["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        is_base = pc.equal(pc.utf8_slice_codeunits(url, 0, 1), "0")
        sub = t.filter(is_base)
        surl = sub["url"]
        if isinstance(surl, pa.ChunkedArray):
            surl = surl.combine_chunks()
        return pa.table(
            {
                "cid": sub["cluster_id"],
                "name": pc.utf8_slice_codeunits(surl, 1, 1 << 30),
            }
        )

    bm_rows = (
        comp_s.map_batches(base_members, batch_format="pyarrow")
        # DISTINCT (cid, name): several members can resolve to the same base
        # name (e.g. a dual uid plus its own rep node) — a merge exists only
        # when a component holds >1 DISTINCT base cluster ids
        .groupby(["cid", "name"])
        .count()
        .select_columns(["cid", "name"])
        .materialize()
    )
    counts = bm_rows.groupby("cid").count()
    cnt_col = [c for c in counts.schema().names if c != "cid"][0]
    multi = counts.map_batches(
        lambda t: t.filter(pc.greater(t[cnt_col], 1)), batch_format="pyarrow"
    )
    multi_df = multi.to_pandas()
    base_merges: list = []
    if len(multi_df):
        # only the MERGED components' rows come to the driver: the multi-cid
        # set is broadcast and filtered inside the map tasks (collecting the
        # full bm_rows table would be corpus-cluster-scale — exactly the
        # driver state this path exists to avoid)
        cids_arr = pa.array(sorted(set(multi_df["cid"])), type=pa.string())
        cids_ref = ray.put(cids_arr)

        def pick_merged(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.is_in(t["cid"], value_set=ray.get(cids_ref))
            )

        bm_df = bm_rows.map_batches(
            pick_merged, batch_format="pyarrow"
        ).to_pandas()
        for cid, g in sorted(bm_df.groupby("cid"), key=lambda kv: kv[0]):
            others = sorted(set(g["name"]) - {cid})
            base_merges.append((cid, others))

    # new docs appearing in any component (the driver path's assign set) —
    # by new-shard MEMBERSHIP, not name prefix: a dual uid's min name is the
    # base-prefixed one, but it is still a new doc
    def only_new(t: pa.Table) -> pa.Table:
        m = _member_mask(
            t["uid"].to_numpy(zero_copy_only=False), ray.get(new_ref)
        )
        return t.filter(pa.array(m))

    n_dup_new = comp_s.map_batches(only_new, batch_format="pyarrow").count()
    return clusters, base_merges, n_dup_new


def _load_base(base: "ray.data.Dataset | str", stage: str) -> "ray.data.Dataset":
    if isinstance(base, str):
        sdir = os.path.join(base, f"stage={stage}")
        if not os.path.isdir(sdir):
            raise FileNotFoundError(
                f"no '{stage}' checkpoint under {base} — run the base "
                "run_dedup with out_dir set"
            )
        return ray.data.read_parquet(sdir)
    return base


def run_dedup_incremental(
    new_input: "str | list[str] | None",
    base_sig: "ray.data.Dataset | str",
    base_clusters: "ray.data.Dataset | str | None" = None,
    cfg: DedupConfig | None = None,
    extract: bool = True,
    new_input_ds: "ray.data.Dataset | None" = None,
    new_sig_ds: "ray.data.Dataset | None" = None,
) -> dict[str, Any]:
    """Dedup a NEW shard against an existing corpus (see module docstring).

    ``base_sig`` / ``base_clusters``: the base run's signature table and
    cluster assignments — as Datasets, or as the base run's checkpoint
    ``out_dir`` (stages ``signatures`` / ``clusters``). ``cfg`` MUST be the
    base run's config (same seeds and signature geometry — uids, digests and
    bucket keys must agree across runs).

    With ``base_clusters=None`` every matched base doc is treated as its own
    cluster of one (valid when the base corpus is known duplicate-free);
    otherwise new docs adopt existing cluster ids (stability contract above).

    Returns ``{"clusters": <Dataset over NEW docs: url, cluster_id,
    is_representative>, "edges": <url-pair edges touching the new shard>,
    "edges_uid": ..., "base_merges": [(kept_id, [merged ids]), ...],
    "stats": {...}, "timings": {...}}``.
    """
    from camden_ray.functions.hashing import hash_string_column
    from camden_ray.pipelines.dedup import refine_substring_edges, signature_table
    from camden_ray.stages.candidates import partitions_for, resolve_edge_urls
    from camden_ray.stages.cluster import unionfind_uid_arrays

    cfg = cfg or DedupConfig()
    timings: dict[str, Any] = {}
    base_sig = _load_base(base_sig, "signatures")
    if base_clusters is not None:
        base_clusters = _load_base(base_clusters, "clusters")

    # --- new-shard signatures (the only extraction/signature work) --------
    t0 = time.monotonic()
    if new_sig_ds is not None:
        new_sig = new_sig_ds
    else:
        if new_input_ds is not None:
            ds = new_input_ds
        else:
            columns = ["url", "html"] if extract else ["url", "text"]
            ds = read_webtext(
                new_input,
                columns=columns,
                langs=cfg.langs,
                min_text_chars=0 if extract else cfg.min_text_chars,
            )
        new_sig = signature_table(ds, cfg, extract=extract).materialize()
    n_new = new_sig.count()
    timings["signatures_new"] = round(time.monotonic() - t0, 3)

    if n_new == 0:
        # empty crawl shard (everything filtered): zero-doc result, not a
        # crash — a zero-row dataset has no schema for the edge builders
        empty_clusters = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], type=pa.string()),
                    "cluster_id": pa.array([], type=pa.string()),
                    "is_representative": pa.array([], type=pa.bool_()),
                }
            )
        )
        empty_edges = ray.data.from_arrow(
            pa.table(
                {"a": pa.array([], type=pa.string()),
                 "b": pa.array([], type=pa.string()),
                 "est": pa.array([], type=pa.float64()),
                 "method": pa.array([], type=pa.string())}
            )
        )
        return {
            "clusters": empty_clusters,
            "edges_uid": empty_edges,
            "edges": empty_edges,
            "base_merges": [],
            "stats": {
                "new_docs": 0, "edges_total": 0, "edges_delta": 0,
                "new_docs_in_clusters": 0, "new_singletons": 0,
                "base_cluster_merges": 0,
            },
            "timings": timings,
            "config": cfg,
        }

    new_uids = _sorted_u64(_collect_column(new_sig, "uid"))
    union_sig = base_sig.union(new_sig)
    P = partitions_for(cfg, n_new)

    # --- candidate edges over touched buckets ------------------------------
    t0 = time.monotonic()
    parts = []
    if {"exact", "minhash", "substring"} & set(cfg.methods):
        parts.append(_incremental_star_edges(new_sig, base_sig, union_sig, cfg, P))
    if "simhash" in cfg.methods:
        parts.append(_incremental_simhash_edges(new_sig, base_sig, cfg, P))
    if not parts:
        raise ValueError(f"no enabled methods in {cfg.methods!r}")
    e = parts[0]
    for p in parts[1:]:
        e = e.union(p)
    e = e.materialize()
    timings["edges"] = round(time.monotonic() - t0, 3)

    if "substring" in cfg.methods and cfg.verify_substring_spans:
        t0 = time.monotonic()
        e = refine_substring_edges(e, union_sig, cfg, timings=timings).materialize()
        timings["span_verify"] = round(time.monotonic() - t0, 3)

    # --- clustering over the delta ------------------------------------------
    # Edge set is bucket-mate-sized (≪ corpus). Below the driver bar the
    # delta is collected and clustered on the driver (fast small regime);
    # above it the whole delta stays in the cluster
    # (:func:`_cluster_delta_distributed` — remap, hash-to-min and
    # assignment are all shuffles, no edge-sized driver state; parity with
    # the driver path is asserted by tests with the bar forced to 0).
    t0 = time.monotonic()
    n_edges = e.count()
    if n_edges > cfg.driver_unionfind_max_edges:
        clusters, base_merges, n_dup_new = _cluster_delta_distributed(
            e, new_sig, base_sig, base_clusters, new_uids, P
        )
        timings["clustering_distributed"] = round(time.monotonic() - t0, 3)
        return _finish_incremental(
            e, clusters, base_merges, n_dup_new, n_new, n_edges,
            new_uids, union_sig, cfg, timings,
        )

    tabs = ray.get(e.select_columns(["a", "b"]).to_arrow_refs())
    a_parts = [t["a"].to_numpy(zero_copy_only=False) for t in tabs if t.num_rows]
    b_parts = [t["b"].to_numpy(zero_copy_only=False) for t in tabs if t.num_rows]
    a = np.concatenate(a_parts) if a_parts else np.empty(0, dtype=np.int64)
    b = np.concatenate(b_parts) if b_parts else np.empty(0, dtype=np.int64)

    a_new = _member_mask(a, new_uids)
    b_new = _member_mask(b, new_uids)

    # Base IDENTITY is looked up for ALL endpoints — a re-crawled url is in
    # BOTH shards (a "dual" uid): it clusters as a NEW doc (never remapped)
    # but still carries its base cluster id into component NAMING and merge
    # reporting, matching the distributed path and the module's naming
    # contract (existing ids take priority).
    eps_all = (
        np.unique(np.concatenate([a, b])) if n_edges
        else np.empty(0, dtype=np.int64)
    )
    eps_is_new = _member_mask(eps_all, new_uids)
    base_eps = eps_all[~eps_is_new]  # remap targets (strictly-base docs)
    # dual naming entries: (uid, base cluster id) for uids in both shards
    dual_uid_list: np.ndarray = np.empty(0, dtype=np.int64)
    dual_name_py: list[str] = []
    if base_clusters is not None and len(eps_all):
        need_ref = ray.put(np.sort(eps_all.view(np.uint64)))

        def pick(t: pa.Table) -> pa.Table:
            uid = hash_string_column(t["url"]).view(np.int64)
            m = _member_mask(uid, ray.get(need_ref))
            mt = t.filter(pa.array(m))
            return pa.table(
                {
                    "uid": pa.array(uid[m], type=pa.int64()),
                    "cluster_id": mt["cluster_id"],
                }
            )

        lk_tabs = ray.get(
            base_clusters.select_columns(["url", "cluster_id"])
            .map_batches(pick, batch_format="pyarrow")
            .to_arrow_refs()
        )
        lk_tabs = [t for t in lk_tabs if t.num_rows]
        lk = (
            pa.concat_tables(lk_tabs).combine_chunks()
            if lk_tabs
            else pa.table(
                {"uid": pa.array([], type=pa.int64()),
                 "cluster_id": pa.array([], type=pa.string())}
            )
        )
        bu_all = lk["uid"].to_numpy(zero_copy_only=False)
        # canonical UNSIGNED ordering throughout (uids are hash-valued int64s,
        # so int64 and uint64 sort orders genuinely differ)
        order = np.argsort(bu_all.view(np.uint64))
        bu_all = bu_all[order]
        bids_all = lk["cluster_id"].take(pa.array(order))
        # duplicate uids (shouldn't occur) keep first deterministically
        first = np.r_[True, bu_all[1:] != bu_all[:-1]]
        bu_all = bu_all[first]
        bids_all = bids_all.filter(pa.array(first))
        # strictly-base endpoints must all be covered
        missing = ~_member_mask(base_eps, bu_all.view(np.uint64))
        if missing.any():
            raise ValueError(
                f"{int(missing.sum())} base edge endpoints are missing from "
                "base_clusters — it must cover every base document"
            )
        bu = bu_all
        rep_of_ep = hash_string_column(bids_all).view(np.int64)  # aligned
        rep_ids = bids_all  # aligned strings for naming
        dual_mask = _member_mask(bu_all, new_uids)
        if dual_mask.any():
            dual_uid_list = bu_all[dual_mask]
            dual_name_py = bids_all.filter(pa.array(dual_mask)).to_pylist()
    else:
        # no base assignment state: each matched base doc is its own rep.
        # Dual identity = membership in base_sig (resolved with the naming
        # semijoin below, which now scans ALL endpoints).
        bu = base_eps[np.argsort(base_eps.view(np.uint64))] if len(base_eps) else base_eps
        rep_of_ep = bu
        rep_ids = None  # names resolved from sig urls below

    def remap(vals: np.ndarray, is_new: np.ndarray) -> np.ndarray:
        out = vals.copy()
        if len(bu):
            m = ~is_new
            if m.any():
                pos = np.searchsorted(bu.view(np.uint64), vals[m].view(np.uint64))
                out[m] = rep_of_ep[pos]
        return out

    ra = remap(a, a_new)
    rb = remap(b, b_new)

    # array core directly: the endpoints already live on the driver — a
    # from_arrow + to_arrow_refs round trip would copy the delta edge set
    # through the object store for nothing
    uf = unionfind_uid_arrays(ra, rb) if n_edges else None
    timings["unionfind"] = round(time.monotonic() - t0, 3)

    # --- component naming ---------------------------------------------------
    t0 = time.monotonic()
    if uf is not None:
        nodes, roots = uf
    else:
        nodes = np.empty(0, dtype=np.int64)
        roots = np.empty(0, dtype=np.int64)

    node_is_new = _member_mask(nodes, new_uids)
    # url lookup for edge-touching NEW uids (delta-sized semi-join)
    touched_new = nodes[node_is_new]
    if len(touched_new):
        nu_tabs = ray.get(
            _semijoin_sig(
                new_sig, np.sort(touched_new.view(np.uint64)), ["uid", "url"]
            ).to_arrow_refs()
        )
        nu_tabs = [t for t in nu_tabs if t.num_rows]
        nu = pa.concat_tables(nu_tabs).combine_chunks() if nu_tabs else None
    else:
        nu = None
    if nu is not None:
        nuid = nu["uid"].to_numpy(zero_copy_only=False)
        order = np.argsort(nuid)
        nuid = nuid[order]
        nurl = nu["url"].take(pa.array(order))
        nurl_py = nurl.to_pylist()
    else:
        nuid = np.empty(0, dtype=np.int64)
        nurl_py = []

    # rep-node names: existing cluster ids (or base urls when no base state),
    # PLUS the dual uids' base identity (re-crawled urls keep their own uid
    # through clustering but still name components by their base cluster id)
    if rep_ids is not None:
        rep_uid_arr = np.concatenate([rep_of_ep, dual_uid_list])
        rep_name_py = rep_ids.to_pylist() + dual_name_py
    elif len(eps_all):
        # resolve base-DOC endpoints (incl. duals) from the base signature
        # table; only the strictly-base endpoints are required to be present
        be_tabs = ray.get(
            _semijoin_sig(
                base_sig, np.sort(eps_all.view(np.uint64)), ["uid", "url"]
            ).to_arrow_refs()
        )
        be_tabs = [t for t in be_tabs if t.num_rows]
        be = pa.concat_tables(be_tabs).combine_chunks() if be_tabs else None
        if be is None or be.num_rows < len(bu):
            raise ValueError("base signature table is missing edge endpoints")
        beu = be["uid"].to_numpy(zero_copy_only=False)
        if not _member_mask(bu, np.sort(beu.view(np.uint64))).all():
            raise ValueError("base signature table is missing edge endpoints")
        order = np.argsort(beu)
        rep_uid_arr = beu[order]
        rep_name_py = be["url"].take(pa.array(order)).to_pylist()
    else:
        rep_uid_arr = np.empty(0, dtype=np.int64)
        rep_name_py = []

    # sort rep names by uid for lookup
    if len(rep_uid_arr):
        ro = np.argsort(rep_uid_arr)
        rep_uid_sorted = rep_uid_arr[ro]
        rep_name_sorted = [rep_name_py[i] for i in ro.tolist()]
        # dedupe (several base endpoints share a rep uid)
        keep = np.r_[True, rep_uid_sorted[1:] != rep_uid_sorted[:-1]]
        rep_uid_sorted = rep_uid_sorted[keep]
        rep_name_sorted = [
            n for n, k in zip(rep_name_sorted, keep.tolist()) if k
        ]
    else:
        rep_uid_sorted = np.empty(0, dtype=np.int64)
        rep_name_sorted = []

    # group nodes by root, pick names
    comp_name: dict[int, str] = {}
    comp_base: dict[int, list[str]] = {}
    if len(nodes):
        order = np.argsort(roots, kind="stable")
        rs = roots[order]
        ns = nodes[order]
        is_new_s = node_is_new[order]
        starts = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
        ends = np.r_[starts[1:], len(rs)]
        for s, epos in zip(starts.tolist(), ends.tolist()):
            root = int(rs[s])
            base_names: list[str] = []
            new_urls: list[str] = []
            for i in range(s, epos):
                node = int(ns[i])
                # base identity first (dual uids have BOTH — base id names
                # the component, the new url only counts as a member)
                p = np.searchsorted(rep_uid_sorted, node)
                if p < len(rep_uid_sorted) and rep_uid_sorted[p] == node:
                    base_names.append(rep_name_sorted[p])
                if is_new_s[i]:
                    p = np.searchsorted(nuid, node)
                    if p < len(nuid) and nuid[p] == node:
                        new_urls.append(nurl_py[p])
            if base_names:
                comp_name[root] = min(base_names)
                if len(set(base_names)) > 1:
                    comp_base[root] = sorted(set(base_names))
            elif new_urls:
                comp_name[root] = min(new_urls)

    base_merges = [
        (comp_name[r], [x for x in names if x != comp_name[r]])
        for r, names in sorted(comp_base.items(), key=lambda kv: comp_name[kv[0]])
    ]

    # --- assignment over the new shard (distributed; singletons stay put) --
    assign_uids = nodes[node_is_new]
    assign_names = [comp_name[int(r)] for r in roots[node_is_new]]
    ao = np.argsort(assign_uids)
    assign_uids = assign_uids[ao]
    assign_names_arr = pa.array(
        [assign_names[i] for i in ao.tolist()], type=pa.string()
    )
    au_ref = ray.put(assign_uids)
    an_ref = ray.put(assign_names_arr)

    def assign(t: pa.Table) -> pa.Table:
        au = ray.get(au_ref)
        an = ray.get(an_ref)
        uid = t["uid"].to_numpy(zero_copy_only=False)
        urls = t["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        if len(au):
            pos = np.searchsorted(au, uid)
            posc = np.minimum(pos, len(au) - 1)
            m = (pos < len(au)) & (au[posc] == uid)
            names_full = an.take(pa.array(posc))
            cid_arr = pc.if_else(pa.array(m), names_full, urls)
        else:
            cid_arr = urls
        return pa.table(
            {
                "url": urls,
                "cluster_id": cid_arr,
                "is_representative": pc.equal(urls, cid_arr),
            }
        )

    clusters = new_sig.select_columns(["url", "uid"]).map_batches(
        assign, batch_format="pyarrow"
    ).materialize()
    timings["assign"] = round(time.monotonic() - t0, 3)

    return _finish_incremental(
        e, clusters, base_merges, len(assign_uids), n_new, n_edges,
        new_uids, union_sig, cfg, timings,
    )


def _finish_incremental(
    e, clusters, base_merges, n_dup_new, n_new, n_edges,
    new_uids, union_sig, cfg, timings,
) -> dict:
    """Common result tail of both clustering regimes: the new-shard-touching
    edge view, stats, and the public dict."""
    from camden_ray.stages.candidates import resolve_edge_urls

    # public edge view: only pairs touching the new shard (the delta a user
    # acts on); bucket-internal base–base pairs fed the clustering above but
    # are already known to the base run
    new_ref = ray.put(new_uids)

    def delta_only(t: pa.Table) -> pa.Table:
        nu_ = ray.get(new_ref)
        am = _member_mask(t["a"].to_numpy(zero_copy_only=False), nu_)
        bm = _member_mask(t["b"].to_numpy(zero_copy_only=False), nu_)
        return t.filter(pa.array(am | bm))

    e_delta = e.map_batches(delta_only, batch_format="pyarrow").materialize()

    stats = {
        "new_docs": n_new,
        "edges_total": n_edges,
        "edges_delta": e_delta.count(),
        "new_docs_in_clusters": n_dup_new,
        "new_singletons": n_new - n_dup_new,
        "base_cluster_merges": len(base_merges),
    }

    return {
        "clusters": clusters,
        "edges_uid": e_delta,
        "edges": resolve_edge_urls(e_delta, union_sig, cfg),
        "base_merges": base_merges,
        "stats": stats,
        "timings": timings,
        "config": cfg,
    }
