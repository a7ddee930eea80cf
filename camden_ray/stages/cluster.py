"""Clustering: verified dup-pair edges → connected components → assignments.

The reference's analogue is trivially its ``HashMap<u64, Vec<PathBuf>>``
grouping (/root/reference/src/scanner.rs:22-23) — single-method, so groups ARE
components. With four candidate methods (exact/minhash/simhash/substring) the
edge sets must be unioned and transitively closed.

Two implementations behind one interface:

* :func:`unionfind_assignments` — driver-side union-find fed by streaming
  ``iter_batches`` over the (tiny relative to input) edge Dataset. Used when
  the edge count fits ``cfg.driver_unionfind_max_edges``.
* :func:`hash_to_min_components` — distributed min-label propagation in
  alternating groupby rounds (Rastogi et al. 2013 "hash-to-min" shape) for
  edge sets too large for any single machine. O(log d) rounds.

Cluster id = lexicographic min url of the component (deterministic
representative — replaces camden's arrival-order keep-first,
/root/reference/src/operations.rs:50).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from camden_ray.stages.candidates import partition_map


class UnionFind:
    """Path-halving union-find over string keys, min-root ordering."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.nodes: set[str] = set()

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        self.nodes.add(a)
        self.nodes.add(b)
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def assignments(self) -> dict[str, str]:
        """url → component root, for EVERY node ever seen (roots included)."""
        return {x: self.find(x) for x in self.nodes}


def unionfind_table(edges: "ray.data.Dataset") -> "pa.Table | None":
    """Stream edge batches to the driver; returns an Arrow table
    ``(url: large_string, cluster_id: large_string)`` covering every url that
    appears in an edge (non-edge urls are singletons), or ``None`` when there
    are no edges.

    Vectorized connected components (no per-edge Python loop): node ids from
    Arrow hash-unique + sort — whose lexicographic order makes min-id ≡
    min-url, so the representative contract is preserved — then numpy
    min-label propagation with pointer jumping (``np.minimum.reduceat`` over
    the endpoint-sorted segment layout per round, O(log n) rounds). Input,
    labels and output all stay in Arrow/numpy; no
    Python string objects are ever materialized (a 1M-node python dict costs
    seconds to build and tens of seconds to pickle-broadcast — the Arrow
    table is zero-copy both ways).
    """
    import numpy as np
    import pyarrow.compute as pc

    # parallel block fetch: to_arrow_refs + one ray.get pulls every block
    # concurrently (iter_batches streams serially — measured 3-5x slower on
    # multi-GB edge sets)
    tables = ray.get(edges.select_columns(["a", "b"]).to_arrow_refs())
    a_parts = [t["a"].combine_chunks() for t in tables if t.num_rows]
    b_parts = [t["b"].combine_chunks() for t in tables if t.num_rows]
    if not a_parts or sum(map(len, a_parts)) == 0:
        return None
    # node ids via Arrow C kernels (hash-unique + sort), then remap to
    # lexicographic ranks so min-id ≡ min-url — no Python-object sort.
    # large_string: 100M+ urls of realistic length overflow the 2 GiB int32
    # string-offset limit of combine_chunks on plain string arrays.
    both = pc.cast(pa.chunked_array(a_parts + b_parts), pa.large_string()).combine_chunks()
    uniq = both.unique()
    rank_of = np.empty(len(uniq), dtype=np.int64)
    rank_of[pc.sort_indices(uniq).to_numpy()] = np.arange(len(uniq))
    idx = pc.index_in(both, value_set=uniq).to_numpy(zero_copy_only=False)
    inv = rank_of[idx]
    nodes = uniq.take(pc.sort_indices(uniq))  # lexicographically ordered
    n_edges = len(both) // 2
    # same propagation scheme as unionfind_uid: one sort of the 2E endpoint
    # ids yields the per-node segment layout, and partner(position p) is
    # (p + E) mod 2E in the concatenated [a, b] layout — each round is then
    # one edge-sized gather + one ``np.minimum.reduceat`` segment-min plus a
    # full pointer-jump fixpoint (the old ``np.minimum.at`` scatter was ~10x
    # slower per round). ``inv`` is already dense over [0, n_nodes), so
    # segment k IS node k.
    from camden_ray.functions.hashing import parallel_argsort

    order = parallel_argsort(inv)
    si = inv[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    partner = np.where(order < n_edges, order + n_edges, order - n_edges)
    dst_perm = inv[partner]
    lab = np.arange(len(nodes))
    while True:
        old = lab
        segmin = np.minimum.reduceat(lab[dst_perm], starts)
        lab = np.minimum(lab, segmin)
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    reps = nodes.take(pa.array(lab))
    return pa.table({"url": nodes, "cluster_id": reps})


def unionfind_uid(edges_uid: "ray.data.Dataset") -> "tuple | None":
    """Driver union-find over int64 uid-pair edges (the pre-resolution edge
    space): returns ``(nodes, roots)`` — sorted uid array and, aligned, each
    uid's component root uid — or ``None`` when there are no edges.

    This is the fast small-regime path: staying in uid space avoids the
    string unique/index_in/rank machinery of :func:`unionfind_table` (~10 s
    driver-serial at 8M edges vs ~2 s here) and lets the public url-edge
    resolution stay lazy. Root identity is min-uid (arbitrary but
    deterministic); the REPRESENTATIVE contract (cluster id = lexicographic
    min url) is restored by :func:`component_min_urls`, which scans actual
    member urls. A 64-bit uid collision can only merge two clusters, never
    split one — the same documented mode as the distributed path.
    """
    import numpy as np

    # pull the materialized blocks directly — a select_columns projection
    # would schedule a full task wave over ~300 blocks just to drop two
    # small columns the driver can ignore for free
    tables = ray.get(edges_uid.to_arrow_refs())
    a_parts = [t["a"].to_numpy(zero_copy_only=False) for t in tables if t.num_rows]
    b_parts = [t["b"].to_numpy(zero_copy_only=False) for t in tables if t.num_rows]
    if not a_parts:
        return None
    return unionfind_uid_arrays(np.concatenate(a_parts), np.concatenate(b_parts))


def unionfind_uid_arrays(a: "np.ndarray", b: "np.ndarray") -> "tuple | None":
    """Array core of :func:`unionfind_uid` for callers that already hold the
    edge endpoints on the driver (e.g. the incremental delta path) — no
    object-store round trip just to pull them straight back."""
    import numpy as np

    if not len(a):
        return None
    # EXACT pair dedup before the propagation machinery: the 16 LSH bands
    # (and multiple gram buckets) emit the same (hub, member) edge many
    # times — measured ~13x duplication at 100k docs — and every duplicate
    # inflates the endpoint sort and all per-round gathers. polars hash
    # unique is multithreaded (pool pinned via POLARS_MAX_THREADS); exact,
    # so no 64-bit-digest collision can ever drop a real edge.
    try:
        import polars as pl

        uniq = pl.DataFrame({"a": a, "b": b}).unique()
        a = uniq["a"].to_numpy()
        b = uniq["b"].to_numpy()
    except Exception:  # pragma: no cover - polars always present
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        a, b = a[keep], b[keep]
    E = len(a)
    # ONE sort of the 2E endpoint array replaces the previous three heavy
    # passes (np.unique's sort + 2 searchsorteds + an edge argsort): node ids,
    # the per-node segment layout AND each occurrence's partner index all fall
    # out of the same permutation, because partner(position p) is exactly
    # (p + E) mod 2E in the concatenated [a, b] layout. polars arg_sort is
    # multi-threaded (bounded by POLARS_MAX_THREADS, which bench.py pins to
    # the session CPU budget so the driver can't out-parallelize its level).
    # Measured at 8M edges: 14 s (old) → ~2 s, and the sort now scales with
    # cores instead of being numpy-single-threaded.
    from camden_ray.functions.hashing import parallel_argsort

    both = np.concatenate([a, b])
    order = parallel_argsort(both)
    sb = both[order]
    change = np.r_[True, sb[1:] != sb[:-1]]
    starts = np.flatnonzero(change)
    nodes = sb[starts]
    # int32 ids: E <= driver_unionfind_max_edges << 2^31, and the narrow
    # dtype halves the scatter/gather memory traffic of the rounds
    seg_id = (np.cumsum(change, dtype=np.int64) - 1).astype(np.int32)
    inv = np.empty(2 * E, dtype=np.int32)
    inv[order] = seg_id
    partner = np.where(order < E, order + E, order - E)
    dst_perm = inv[partner]  # partner dense id, in src-sorted segment order
    # min-label propagation: per round one edge-sized gather + one
    # np.minimum.reduceat segment-min, then a FULL pointer-jump fixpoint
    # (node-sized gathers are ~100x cheaper than an extra edge-sized round,
    # so full shortcutting per round minimizes the expensive outer rounds —
    # star-shaped candidate edges converge in ~3)
    lab = np.arange(len(nodes), dtype=np.int32)
    while True:
        old = lab
        segmin = np.minimum.reduceat(lab[dst_perm], starts)
        lab = np.minimum(lab, segmin)  # segment k IS node k: direct align
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    return nodes, nodes[lab.astype(np.int64)]


def _empty_comp_table() -> pa.Table:
    return pa.table(
        {"root": pa.array([], type=pa.int64()),
         "cluster_id": pa.array([], type=pa.string())}
    )


#: width of the quality prefix "NNNNNNN|" packed in front of urls by
#: :func:`quality_rep_view` (7 zero-padded digits + separator)
REP_PREFIX_LEN = 8


def quality_rep_view(sig_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(uid, url, q) → (uid, url=skey) where ``skey = f"{9999999-q:07d}|url"``.

    The fixed-point quality score q ∈ [0, 1e6] is folded into a FIXED-WIDTH
    descending prefix, so *lexicographic min of skey ≡ argmax quality, min-url
    tiebreak*. Both representative-selection paths (the driver comp-table
    min aggregate and the distributed groupby-Min fixup) then run unchanged
    on skeys; the prefix is stripped (``REP_PREFIX_LEN``) before assignments
    are emitted. No new shuffle, no new aggregate kernel, bit-reproducible.
    """
    import numpy as np
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        q = t["q"].to_numpy(zero_copy_only=False)
        inv = 9_999_999 - np.clip(q, 0, 1_000_000)
        pad = pc.utf8_lpad(
            pc.cast(pa.array(inv, type=pa.int64()), pa.string()), 7, "0"
        )
        skey = pc.binary_join_element_wise(pad, t["url"], "|")
        return pa.table({"uid": t["uid"], "url": skey})

    return sig_ds.select_columns(["uid", "url", "q"]).map_batches(
        f, batch_format="pyarrow"
    )


def strip_rep_prefix(ds: "ray.data.Dataset", columns=("cluster_id",)) -> "ray.data.Dataset":
    """Remove the quality skey prefix from the given string columns."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        for c in columns:
            t = t.set_column(
                t.schema.get_field_index(c), c,
                pc.utf8_slice_codeunits(t[c], REP_PREFIX_LEN, 1 << 30),
            )
        return t

    return ds.map_batches(f, batch_format="pyarrow")


@ray.remote(num_cpus=2, num_returns=2)
def _merge_comp_partials(strip: int, *tabs: "pa.Table"):
    """Merge per-block (root, url_min) partials → the sorted comp table.

    Runs as a cluster task: block-level group_by rarely combines anything
    (components span blocks), so the partial set is ~node-count-sized WITH
    url strings — merging it on the driver was a serial section that grew
    linearly with the touched-node count and did not shrink with CPUs
    (measured comp_minurls 6.5 s @4 vs 7.7 s @16 at 6M docs). As a task its
    first return value is ALREADY the plasma object the assignment wave
    broadcasts; the second (the component count) is all the driver pulls.
    """
    import pyarrow.compute as pc

    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return _empty_comp_table(), 0
    merged = pa.concat_tables(tabs).group_by("root").aggregate([("url_min", "min")])
    order = pc.sort_indices(merged["root"])
    merged = merged.take(order)
    cid = merged["url_min_min"].combine_chunks()
    if strip:  # quality-rep skeys: drop the fixed-width score prefix
        cid = pc.utf8_slice_codeunits(cid, strip, 1 << 30)
        if isinstance(cid, pa.ChunkedArray):
            cid = cid.combine_chunks()
    comp = pa.table({"root": merged["root"], "cluster_id": cid})
    return comp, comp.num_rows


def component_min_urls(
    sig_ds: "ray.data.Dataset", nodes, roots, strip: int = 0
) -> "tuple":
    """Per-component lexicographic-min url, as a broadcastable comp table:
    ``(comp_ref, n_comps, nodes_ref, roots_ref)`` where ``comp_ref`` is an
    ObjectRef to a sorted ``(root:int64, cluster_id:string)`` table.

    One parallel pass over the (uid, url) table: each block computes a
    per-root partial min via Arrow's native group_by; the partials merge in
    a cluster task (:func:`_merge_comp_partials`) whose return IS the
    broadcast object — no component-sized strings ever cross the driver.
    The ``nodes``/``roots`` broadcast refs are returned so the assignment
    wave reuses them instead of re-putting the arrays.

    ``strip``: pass ``REP_PREFIX_LEN`` when ``sig_ds`` is a
    :func:`quality_rep_view` (skey urls) — min-skey selects the
    quality-argmax representative and the prefix is removed in the merge.
    """
    import numpy as np

    nodes_ref = ray.put(nodes)
    roots_ref = ray.put(roots)

    def partial(t: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        rt = ray.get(roots_ref)
        uid = t["uid"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nd, uid)
        ok = pos < len(nd)
        pos_c = np.minimum(pos, max(0, len(nd) - 1))
        ok &= nd[pos_c] == uid
        sub = pa.table(
            {"root": pa.array(rt[pos_c[ok]], type=pa.int64()),
             "url": t["url"].filter(pa.array(ok))}
        )
        return sub.group_by("root").aggregate([("url", "min")])

    refs = (
        sig_ds.select_columns(["uid", "url"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    if not refs:
        return ray.put(_empty_comp_table()), 0, nodes_ref, roots_ref
    comp_ref, n_ref = _merge_comp_partials.remote(strip, *refs)
    return comp_ref, int(ray.get(n_ref)), nodes_ref, roots_ref


def make_uid_assigner(nodes_ref, roots_ref, comp_ref):
    """map_batches fn over (url, uid) rows → (url, cluster_id,
    is_representative). All lookups are int64 searchsorted against
    zero-copy broadcast arrays; the only string op is one ``take`` on the
    component-min-url array."""
    import numpy as np
    import pyarrow.compute as pc

    cache: list = []

    def assign(t: pa.Table) -> pa.Table:
        if not cache:
            comp = ray.get(comp_ref)
            cache.append(
                (ray.get(nodes_ref), ray.get(roots_ref),
                 comp["root"].to_numpy(zero_copy_only=False),
                 comp["cluster_id"].combine_chunks())
            )
        nd, rt, comp_roots, comp_urls = cache[0]
        uid = t["uid"].to_numpy(zero_copy_only=False)
        url = t["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        if len(nd) == 0:
            cid = url
            ok = np.zeros(len(t), dtype=bool)
        else:
            pos = np.searchsorted(nd, uid)
            ok = pos < len(nd)
            pos_c = np.minimum(pos, len(nd) - 1)
            ok &= nd[pos_c] == uid
            ci = np.searchsorted(comp_roots, rt[pos_c])
            ci = np.minimum(ci, max(0, len(comp_roots) - 1))
            taken = comp_urls.take(pa.array(ci))
            cid = pc.if_else(pa.array(ok), taken, url)
        return pa.table(
            {
                "url": url,
                "cluster_id": cid,
                "is_representative": pc.equal(cid, url),
            }
        )

    return assign


def unionfind_assignments(edges: "ray.data.Dataset") -> dict[str, str]:
    """Dict view of :func:`unionfind_table` (url → cluster_id).

    Kept for tests and small-scale callers; the pipeline broadcasts the Arrow
    table instead (dict pickling is the scaling bottleneck it replaced).
    """
    t = unionfind_table(edges)
    if t is None:
        return {}
    return dict(zip(t["url"].to_pylist(), t["cluster_id"].to_pylist()))


def _label_fingerprint(labels: "ray.data.Dataset") -> tuple[int, int]:
    """Order-insensitive content fingerprint of an int (node,label) Dataset.

    Vectorized: one mix64 pass per block, a one-row partial per block, tiny
    driver-side sum — never a per-row Python loop.
    """
    import numpy as np

    from camden_ray.functions.hashing import mix64

    def fp(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy().view(np.uint64)
        l = t["label"].to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            h = int(mix64(n * np.uint64(0x9E3779B97F4A7C15) ^ l).sum())
        return pa.table(
            {"h": pa.array([h & 0x7FFFFFFFFFFFFFFF], type=pa.int64()),
             "n": pa.array([len(t)], type=pa.int64())}
        )

    df = labels.map_batches(fp, batch_format="pyarrow").to_pandas()
    return (int(df["h"].sum()) & 0x7FFFFFFFFFFFFFFF, int(df["n"].sum()))


def hash_to_min_components(
    edges: "ray.data.Dataset", max_iter: int = 30, num_partitions: int = 64
) -> "ray.data.Dataset":
    """Distributed connected components over (a, b) string edges — thin
    wrapper around :func:`hash_to_min_components_uid`: node id = the same
    64-bit url key hash the signature stage stamps as ``uid``
    (``hash_string_column`` — vectorized, deterministic across processes;
    a collision ≈ n²/2⁶⁵ could only merge two clusters, never split one).
    The (uid → url) dimension is derived from the edge endpoints themselves.

    Returns Dataset (url, cluster_id) for every url appearing in an edge.
    """
    import numpy as np

    from camden_ray.functions.hashing import hash_string_column

    def to_uid_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(
                    hash_string_column(t["a"]).view(np.int64), type=pa.int64()
                ),
                "b": pa.array(
                    hash_string_column(t["b"]).view(np.int64), type=pa.int64()
                ),
            }
        )

    def to_node_rows(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"]
        urls = pa.concat_arrays([a, b])
        ids = np.concatenate(
            [hash_string_column(a).view(np.int64), hash_string_column(b).view(np.int64)]
        )
        return pa.table({"uid": pa.array(ids, type=pa.int64()), "url": urls})

    e2 = edges.select_columns(["a", "b"])
    # distinct (uid,url): all urls of one uid are identical, so Min is a dedup
    node_urls = (
        e2.map_batches(to_node_rows, batch_format="pyarrow")
        .groupby("uid")
        .aggregate(Min("url", alias_name="url"))
    )
    out = hash_to_min_components_uid(
        e2.map_batches(to_uid_pairs, batch_format="pyarrow"),
        node_urls,
        max_iter=max_iter,
        num_partitions=num_partitions,
    )
    return out.select_columns(["url", "cluster_id"])


def hash_to_min_components_uid(
    edges_uid: "ray.data.Dataset",
    node_urls: "ray.data.Dataset",
    max_iter: int = 30,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Distributed connected components over int64 uid-pair edges — the scale
    path: NO driver-side state at any point; every step is a native shuffle,
    and url strings never enter the propagation (the pipeline feeds the
    candidate shuffles' uid edges directly, so the url-pair edge view is
    never even materialized for clustering).

    ``node_urls``: (uid, url) dimension — the signature table in the
    pipeline (already unique per uid), or an endpoint-derived dedup in the
    string wrapper.

    Physical plan:

    1. min-label propagation (hash-to-min shape, Rastogi et al. 2013) on int
       ids: L(v) ← min(L(v), min_{(u,v)∈E} L(u)) per round, implemented as a
       coarse hash-partition co-locating each node's label row with its edge
       rows, ONE numpy searchsorted pass per partition, then a NATIVE
       groupby-Min. Rounds = O(component diameter); convergence detected by
       an order-insensitive label fingerprint.
    2. min-url fixup: join int labels to urls via ``node_urls``,
       groupby(label)·Min(url) gives each component its lexicographic-min-url
       cluster id (the same representative contract as the driver
       union-find), joined back onto members.

    Returns Dataset (uid, url, cluster_id) for every uid appearing in an
    edge.
    """
    import numpy as np

    from camden_ray.functions.hashing import mix64

    P = num_partitions
    PKEY_MIX = np.uint64(0xA24BAED4963EE407)

    def _pkey(ids: np.ndarray) -> pa.Array:
        return pa.array(
            (mix64(ids.view(np.uint64) ^ PKEY_MIX) % np.uint64(P)).view(np.int64),
            type=pa.int64(),
        )

    def to_directed(t: pa.Table) -> pa.Table:
        ida = t["a"].to_numpy(zero_copy_only=False)
        idb = t["b"].to_numpy(zero_copy_only=False)
        src = np.concatenate([ida, idb])
        dst = np.concatenate([idb, ida])
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "pkey": _pkey(src),
            }
        )

    graph = (
        edges_uid.select_columns(["a", "b"])
        .map_batches(to_directed, batch_format="pyarrow")
        .materialize()
    )
    nodes = node_urls

    # --- 2. labels(node,label) init to min(node, neighbors) — native agg ---
    labels = (
        graph.groupby("src")
        .aggregate(Min("dst", alias_name="nmin"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["src"],
                    "label": pa.compute.min_element_wise(t["src"], t["nmin"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    old_fp = None

    def lab_to_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table(
            {
                "src": t["node"],
                "other": t["label"],
                "is_label": pa.array(np.ones(len(t), dtype=bool)),
                "pkey": _pkey(node),
            }
        )

    def edge_to_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"],
                "other": t["dst"],
                "is_label": pa.array(np.zeros(len(t), dtype=bool)),
                "pkey": t["pkey"],
            }
        )

    def propagate(t: pa.Table) -> pa.Table:
        """One partition: every node's label row is co-located with its
        outgoing edge rows. Edge (src,dst) forwards label(src) to dst;
        label rows re-propose to their own node. Pure numpy (sort +
        searchsorted), no pandas merge, no Python objects."""
        is_lab = t["is_label"].to_numpy(zero_copy_only=False)
        src = t["src"].to_numpy()
        other = t["other"].to_numpy()
        lsrc, llab = src[is_lab], other[is_lab]
        order = np.argsort(lsrc, kind="stable")
        lsrc, llab = lsrc[order], llab[order]
        esrc, edst = src[~is_lab], other[~is_lab]
        pos = np.searchsorted(lsrc, esrc)
        # initial labels cover every src, so every edge finds its label row
        ok = pos < len(lsrc)
        pos = np.minimum(pos, max(0, len(lsrc) - 1))
        ok &= lsrc[pos] == esrc
        node = np.concatenate([edst[ok], lsrc])
        cand = np.concatenate([llab[pos[ok]], llab])
        return pa.table(
            {"node": pa.array(node, type=pa.int64()),
             "cand": pa.array(cand, type=pa.int64())}
        )

    for _ in range(max_iter):
        lab_rows = labels.map_batches(lab_to_rows, batch_format="pyarrow")
        edge_rows = graph.map_batches(edge_to_rows, batch_format="pyarrow")
        labels = (
            partition_map(lab_rows.union(edge_rows), P, propagate)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
        ).materialize()
        new_fp = _label_fingerprint(labels)
        if new_fp == old_fp:
            break
        old_fp = new_fp

    # --- 3. min-url fixup: component key (int) → cluster id (min url) ------
    # Two co-partition merges (NOT Dataset.join — chained join operators
    # mis-resolve key fields in ray 2.49; and this keeps the whole algorithm
    # on the one shuffle primitive the engine already relies on):
    #   member(uid, url, label) = labels ⨝ node_urls on node==uid
    #   out(uid, url, cluster_id) = member ⨝ [groupby(label).Min(url)]
    def lab_facts(t: pa.Table) -> pa.Table:
        return pa.table(
            {"k": t["node"], "ival": t["label"],
             "sval": pa.nulls(len(t), type=pa.string())}
        )

    def node_dims(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["uid"], "val": t["url"]})

    member = _copartition_lookup(
        labels.map_batches(lab_facts, batch_format="pyarrow"),
        nodes.map_batches(node_dims, batch_format="pyarrow"),
        P,
    ).map_batches(
        lambda t: pa.table({"uid": t["k"], "url": t["val"], "label": t["ival"]}),
        batch_format="pyarrow",
    ).materialize()

    reps = member.groupby("label").aggregate(Min("url", alias_name="cluster_id"))

    def mem_facts(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["label"], "ival": t["uid"], "sval": t["url"]})

    def rep_dims(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["label"], "val": t["cluster_id"]})

    return _copartition_lookup(
        member.map_batches(mem_facts, batch_format="pyarrow"),
        reps.map_batches(rep_dims, batch_format="pyarrow"),
        P,
    ).map_batches(
        lambda t: pa.table(
            {"uid": t["ival"], "url": t["sval"], "cluster_id": t["val"]}
        ),
        batch_format="pyarrow",
    )


def _copartition_lookup(
    facts: "ray.data.Dataset", dims: "ray.data.Dataset", num_partitions: int
) -> "ray.data.Dataset":
    """Distributed int-keyed lookup join — now a thin contract wrapper over
    the engine's generic :func:`camden_ray.stages.cojoin.hash_join`.

    ``facts`` rows (k:int64, ival:int64, sval:string) are matched against
    ``dims`` rows (k:int64, val:string) by co-hash-partitioning both sides
    on k; duplicate dim keys resolve DETERMINISTICALLY to the min ``val``
    (``right_unique_by`` — k is unique in most callers, but the incremental
    name dim can carry two names for a uid that is both a base rep and a
    re-crawled new doc, and min picks the base-prefixed name, the driver
    path's priority). Returns matched fact rows (k, ival, sval, val) — an
    inner equi-join that never touches ``Dataset.join`` and holds no
    driver state.
    """
    from camden_ray.stages.cojoin import hash_join

    return hash_join(
        facts,
        dims,
        on="k",
        how="inner",
        num_partitions=num_partitions,
        right_unique_by="val",
    )


def assign_clusters_distributed_uid(
    url_uid: "ray.data.Dataset",
    comp: "ray.data.Dataset",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Scale-path cluster assignment on int64 uids: shuffle join, no driver
    map, no string hashing (the corpus side already carries the uid the
    signature stage stamped; ``comp`` is :func:`hash_to_min_components_uid`
    output). Unmatched uids are singletons (cluster_id = own url).

    Returns (url, cluster_id, is_representative).
    """
    import numpy as np

    from camden_ray.functions.hashing import mix64

    P = np.uint64(num_partitions)
    LOOKUP_MIX = np.uint64(0xC2B2AE3D27D4EB4F)

    def tag(is_dim: bool):
        def f(t: pa.Table) -> pa.Table:
            k = t["uid"].to_numpy(zero_copy_only=False).view(np.uint64)
            pkey = (mix64(k ^ LOOKUP_MIX) % P).view(np.int64)
            return pa.table(
                {
                    "k": t["uid"],
                    "url": t["url"],
                    "cid": t["cluster_id"] if is_dim else pa.nulls(len(t), type=pa.string()),
                    "is_dim": pa.array(np.full(len(t), is_dim)),
                    "pkey": pa.array(pkey, type=pa.int64()),
                }
            )

        return f

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_dim = t["is_dim"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy()
        dk = k[is_dim]
        order = np.argsort(dk, kind="stable")
        dk = dk[order]
        dcid = t["cid"].filter(pa.array(is_dim)).take(pa.array(order))
        fmask = ~is_dim
        fk = k[fmask]
        ft = t.filter(pa.array(fmask))
        furl = ft["url"]
        if isinstance(furl, pa.ChunkedArray):
            furl = furl.combine_chunks()
        if len(dk) == 0:
            cid = furl  # no components in this partition: all singletons
        else:
            pos = np.searchsorted(dk, fk)
            ok = pos < len(dk)
            pos_c = np.minimum(pos, len(dk) - 1)
            ok &= dk[pos_c] == fk
            taken = dcid.take(pa.array(np.where(ok, pos_c, 0)))
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            cid = pc.if_else(pa.array(ok), taken, furl)
        return pa.table(
            {
                "url": furl,
                "cluster_id": cid,
                "is_representative": pc.equal(cid, furl),
            }
        )

    rows = url_uid.map_batches(tag(False), batch_format="pyarrow").union(
        comp.select_columns(["uid", "url", "cluster_id"]).map_batches(
            tag(True), batch_format="pyarrow"
        )
    )
    return partition_map(rows, num_partitions, merge)


def assign_clusters_distributed(
    urls: "ray.data.Dataset",
    comp: "ray.data.Dataset",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """String-keyed wrapper around :func:`assign_clusters_distributed_uid`:
    derives the int64 key with the same vectorized url hash the propagation
    runs on (no new collision mode). ``urls`` (url) LEFT-joined with ``comp``
    (url, cluster_id); unmatched urls are singletons. Kept for callers that
    only have the public string-keyed component output.
    """
    import numpy as np

    from camden_ray.functions.hashing import hash_string_column

    def add_uid(t: pa.Table) -> pa.Table:
        return t.append_column(
            "uid",
            pa.array(hash_string_column(t["url"]).view(np.int64), type=pa.int64()),
        )

    return assign_clusters_distributed_uid(
        urls.map_batches(add_uid, batch_format="pyarrow"),
        comp.map_batches(add_uid, batch_format="pyarrow"),
        num_partitions=num_partitions,
    )


def make_assigner(assign_ref: "ray.ObjectRef"):
    """map_batches fn: stamp cluster assignments onto url rows.

    The assignment table (``(url, cluster_id)`` Arrow table from
    :func:`unionfind_table`, only urls in some component) is broadcast ONCE
    via ``ray.put``; each task reads it from the local object store —
    zero-copy deserialization (Arrow buffers, not a pickled dict) and never
    re-shipped per batch. Lookup is a vectorized ``pc.index_in`` + ``take``;
    urls missing from the table (singletons) cluster to themselves.
    """
    import pyarrow.compute as pc

    cache: list = []

    def assign(t: pa.Table) -> pa.Table:
        if not cache:
            at = ray.get(assign_ref)
            cache.append((at["url"].combine_chunks(), at["cluster_id"].combine_chunks()))
        nodes, reps = cache[0]
        urls = pc.cast(t["url"], nodes.type)
        idx = pc.index_in(urls, value_set=nodes)
        cids = pc.cast(
            pc.coalesce(pc.take(reps, idx), urls), t["url"].type
        )
        is_rep = pc.equal(cids, t["url"])
        out = t.append_column("cluster_id", cids)
        return out.append_column("is_representative", is_rep)

    return assign
