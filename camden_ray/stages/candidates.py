"""Candidate-pair generation: the engine's shuffle stages.

Generalizes camden's single mutex-guarded hash-grouping
(/root/reference/src/scanner.rs:17-49,61-63) into real hash shuffles with
explicit skew handling (north_rule: "explicit groupby-aggregate shuffles keyed
on LSH band buckets with salted repartitioning for skewed hot buckets").

Physical plan: bucket keys are NOT grouped one-group-per-call (millions of
tiny buckets ⇒ per-group Python overhead dominates). Instead rows are hash-
partitioned into ``num_partitions`` coarse partitions (``pkey = mix(gkey) %
P``) and each partition is processed by ONE vectorized numpy pass
(:func:`make_unified_partition_grouper`): lexsort by (gkey, url), group boundaries by
run-length, star edges emitted via ``np.repeat`` — a Python loop touches only
multi-member *candidate* buckets needing all-pairs verification.

Skew handling is a separate explicit mechanism (not the partitioner): a
partial-aggregated count pass finds buckets above ``bucket_cap``; their rows
are salt-split into ``num_salts`` sub-buckets (salt = deterministic url hash)
BEFORE partitioning, so no single reduce task owns a pathological bucket;
sub-bucket hubs are then linked by a second (tiny) grouping pass keyed on the
original bucket key.

Cost model: star emission is O(|bucket|) rows per bucket (never O(n²));
all-pairs verification only for buckets ≤ ``allpairs_cap`` members.

Edges schema (unified across methods):
    a: string, b: string  (a < b), est: float64, method: string
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from camden_ray.config import DedupConfig
from camden_ray.functions.hashing import mix64

EDGE_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("est", pa.float64()), ("method", pa.string())]
)

_SALT_MIX = np.uint64(0xD6E8FEB86659FD93)
_PKEY_MIX = np.uint64(0xA24BAED4963EE407)

ALLPAIRS_CAP = 16


def default_partitions(cfg: DedupConfig) -> int:
    """Coarse reduce-partition count: explicit config wins; else 4× cluster CPUs.

    4× (not 1×) so one slow partition doesn't stall a whole wave — with
    vectorized groupers the per-partition overhead is negligible next to the
    straggler savings (measured: P=4×CPUs halved the candidate-shuffle wall
    vs P=2×CPUs at 1.2M docs / 32 CPUs).
    """
    if cfg.shuffle_partitions:
        return cfg.shuffle_partitions
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus * 4)


def partitions_for(cfg: DedupConfig, n_rows: int) -> int:
    """Data-sized reduce-partition count: max(cluster CPUs, rows/target).

    P grows with the DATA, not the cluster — per-partition shuffle overhead
    (the boundary sort creates map_blocks × P object slices) then stays
    constant when the same input runs on a bigger cluster, so extra CPUs
    buy parallel reduce waves instead of more overhead. The CPU floor keeps
    small inputs from under-using wide clusters.
    """
    if cfg.shuffle_partitions:
        return cfg.shuffle_partitions
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(cpus, -(-n_rows // max(1, cfg.rows_per_partition)))


def partition_map(
    ds: "ray.data.Dataset",
    P: int,
    fn,
    key: str = "pkey",
    batch_format: str = "pyarrow",
) -> "ray.data.Dataset":
    """Co-locate rows by a precomputed integer partition key in ``[0, P)`` and
    apply ``fn`` once per partition (whole-partition Arrow batches).

    This replaces ``groupby(key).map_groups(fn)`` on coarse partition keys:
    Ray's sort-based groupby quantile-samples boundaries, which collapse on a
    low-cardinality key (P distinct values → skewed reduce blocks, empty
    partitions, and an expensive re-merge). An explicit-boundary sort places
    each key in exactly one reduce partition — perfectly hash-balanced, no
    sampling pass — and each reduce partition arrives as exactly ONE block
    (sort_task_spec.reduce merges to a single block), so ``batch_size=None``
    hands ``fn`` complete partitions. Measured 4–20× faster than the groupby
    path on the 54M-row candidate shuffle.

    Scale note: one partition = one block, so P must keep partitions under
    the object-store block budget — size P ∝ data volume via
    ``cfg.shuffle_partitions`` when 4×CPUs isn't enough.

    ``fn`` MUST tolerate an empty batch: a ``key`` value with no rows still
    yields one (empty) reduce block, which groupby-map_groups never produced.
    """
    P = int(P)
    if P <= 1:
        return ds.repartition(1).map_batches(
            fn, batch_format=batch_format, batch_size=None
        )
    return ds.sort(key, boundaries=list(range(1, P))).map_batches(
        fn, batch_format=batch_format, batch_size=None
    )


def _url_salts(urls: np.ndarray, num_salts: int) -> np.ndarray:
    """Deterministic per-url salt (process-independent — never builtin hash)."""
    return np.fromiter(
        (zlib.crc32(u.encode()) % num_salts for u in urls),
        count=len(urls),
        dtype=np.int64,
    )


def _salt_keys(
    keys: np.ndarray,
    url_col: "pa.Array",
    hot: np.ndarray,
    cfg: DedupConfig,
    P: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (salt, gkey, pkey) for candidate rows.

    ``keys`` is int64 (bucket keys), ``hot`` a sorted uint64 array of hot
    bucket keys. Membership is one ``np.isin`` pass (the per-row Python
    ``int(k) in set`` predecessor cost ~14 s over the 54M-row candidate set);
    the crc32 salting loop touches only rows of hot buckets.
    """
    n = len(keys)
    salts = np.full(n, -1, dtype=np.int64)
    if len(hot):
        mask = np.isin(keys.view(np.uint64), hot)
        if mask.any():
            urls = np.asarray(url_col.take(pa.array(np.flatnonzero(mask))).to_pylist(), dtype=object)
            salts[mask] = _url_salts(urls, int(cfg.num_salts))
    gkey = keys.view(np.uint64).copy()
    m = salts >= 0
    if m.any():
        gkey[m] = mix64(
            gkey[m] ^ ((salts[m].view(np.uint64) + np.uint64(1)) * _SALT_MIX)
        )
    pkey = (mix64(gkey ^ _PKEY_MIX) % np.uint64(P)).view(np.int64)
    return salts, gkey.view(np.int64), pkey


def _count_hot(sample_rows: "ray.data.Dataset", threshold: float) -> frozenset[int]:
    chunks = [
        b["key"].to_numpy(zero_copy_only=False)
        for b in sample_rows.select_columns(["key"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    ]
    if not chunks:
        return frozenset()
    keys = np.concatenate(chunks)
    uniq, cnt = np.unique(keys, return_counts=True)
    return frozenset(int(k) for k in uniq[cnt >= threshold])


def hot_bucket_keys(rows: "ray.data.Dataset", cfg: DedupConfig) -> frozenset[int]:
    """Skew-detection pass: bucket keys likely above ``bucket_cap`` members.

    Shuffle-free: a SEEDED row sample streams to the driver and keys whose
    sampled count clears ``cap × frac / 2`` are flagged hot. Detection errors
    are benign for correctness — salting a cold bucket merely splits it (the
    rep pass re-links), and a missed slightly-hot bucket still groups
    correctly since star emission is linear in bucket size — so sampling
    trades nothing but load-balance precision for removing an entire
    all-to-all count shuffle. The fixed seed keeps runs bit-reproducible.
    (A truly-hot key — boilerplate shared by millions of rows — is hit by
    any sample; shrink ``hot_sample_frac`` as the corpus grows.)
    """
    frac = cfg.hot_sample_frac
    threshold = max(2.0, cfg.bucket_cap * frac / 2.0)
    return _count_hot(rows.random_sample(frac, seed=cfg.seed), threshold)


def hot_bucket_keys_from_sig(
    sig_ds: "ray.data.Dataset", cfg: DedupConfig
) -> frozenset[int]:
    """Hot-bucket detection from a sample of the SIGNATURE table.

    Sampling docs instead of expanded candidate rows gives the same binomial
    estimate of bucket sizes (each bucket member comes from a distinct doc
    for the digest/band branches), but the expander only runs over ``frac``
    of the corpus — the full 17+-rows/doc candidate set never needs to be
    materialized just to count it (that mid-pipeline materialization was a
    full extra pass over ~6 GB at 1.2M docs).
    """
    frac = cfg.hot_sample_frac
    threshold = max(2.0, cfg.bucket_cap * frac / 2.0)
    sample = sig_ds.random_sample(frac, seed=cfg.seed).map_batches(
        make_unified_star_expander(cfg), batch_format="pyarrow"
    )
    return _count_hot(sample, threshold)


def _hot_array(hot: frozenset[int] | np.ndarray) -> np.ndarray:
    """Hot-key set → sorted uint64 array (the np.isin probe side)."""
    if isinstance(hot, np.ndarray):
        return hot
    return np.sort(np.fromiter((k for k in hot), dtype=np.int64, count=len(hot)).view(np.uint64))


def make_salter(hot_ref: "ray.ObjectRef", cfg: DedupConfig, num_partitions: int):
    """map_batches fn: add (salt, gkey, pkey) columns.

    salt  = deterministic url-hash sub-bucket for rows of hot keys (−1 else);
    gkey  = key, or mix(key, salt) for hot rows — the logical bucket id;
    pkey  = mix(gkey) % P — the coarse reduce partition.

    (Standalone pass; the production star path computes the same columns
    inside the expander — see :func:`make_unified_star_expander`.)
    """
    P = int(num_partitions)

    def add_salt(t: pa.Table) -> pa.Table:
        hot = _hot_array(ray.get(hot_ref))
        keys = t["key"].to_numpy(zero_copy_only=False)
        url_col = t["url"]
        if isinstance(url_col, pa.ChunkedArray):
            url_col = url_col.combine_chunks()
        salts, gkey, pkey = _salt_keys(keys, url_col, hot, cfg, P)
        out = t.append_column("salt", pa.array(salts, type=pa.int64()))
        out = out.append_column("gkey", pa.array(gkey, type=pa.int64()))
        return out.append_column("pkey", pa.array(pkey, type=pa.int64()))

    return add_salt


# ---------------------------------------------------------------------------
# Unified star path: exact + minhash + substring in ONE shuffle
# ---------------------------------------------------------------------------

BRANCH_METHOD = {0: "exact", 1: "minhash", 2: "substring"}
_BRANCH_SALTS = {
    0: np.uint64(0x8E2A_11D3_5C77_0A51),
    1: np.uint64(0x6F4B_93D1_2AD8_4E17),
    2: np.uint64(0xB7E1_5163_8AED_2A6B),
}


def make_unified_star_expander(
    cfg: DedupConfig,
    hot_ref: "ray.ObjectRef | None" = None,
    num_partitions: int | None = None,
):
    """sig table → ONE keyed row set for every enabled star branch.

    Reads the signature table once and emits, per doc: 1 digest row (exact),
    ``num_bands`` band rows with vsig (minhash), ~len(lgrams) rows
    (substring). Branch ids are folded into the key-space with per-branch
    salts, so the three branches share a single count pass + groupby shuffle
    (one partitioning key reused — SURVEY.md 'minimize shuffles') while their
    buckets can never collide.

    Row schema: key:int64, url:string, vsig:binary (b"" unless minhash),
    branch:int32. With ``hot_ref``/``num_partitions`` set the expander ALSO
    emits (salt, gkey, pkey) — the skew-salting pass fused in, so the
    candidate row set goes straight into the partitioning sort with no
    intermediate materialization or second full pass.
    """
    from camden_ray.functions.hashing import band_hashes

    nb = cfg.num_bands
    npms = cfg.num_perms
    vp = cfg.verify_perms
    methods = cfg.methods

    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        keys_parts: list[np.ndarray] = []
        urls_parts: list[pa.Array] = []
        vsig_parts: list[list[bytes]] = []
        branch_parts: list[np.ndarray] = []
        url_col = t["url"]
        if isinstance(url_col, pa.ChunkedArray):
            url_col = url_col.combine_chunks()

        if "exact" in methods:
            dig = t["digest"].to_numpy(zero_copy_only=False).view(np.uint64)
            keys_parts.append(mix64(dig ^ _BRANCH_SALTS[0]))
            urls_parts.append(url_col)
            vsig_parts.append([b""] * n)
            branch_parts.append(np.zeros(n, dtype=np.int32))

        if "minhash" in methods and n:
            # reinterpret the Arrow binary buffer directly — no per-row
            # Python bytes objects (same zero-copy trick as _binary_matrix)
            sigs = _binary_matrix(t["sig"], npms * 8).view(np.uint64)
            bh = band_hashes(sigs, nb)  # (n, nb)
            # verification sketch: low byte of each of the first vp minhash
            # components. A 1-byte component only inflates the agreement
            # estimate by ~1/256 per disagreeing slot (negligible vs the
            # sampling noise of vp slots) and shrinks the dominant shuffle
            # payload 8x vs shipping full u64 components.
            qs = (sigs[:, :vp] & np.uint64(0xFF)).astype(np.uint8).tobytes()
            band_salt = mix64(
                (np.arange(nb, dtype=np.uint64) + np.uint64(1)) * _SALT_MIX
            )
            keys = mix64((bh ^ band_salt[None, :]) ^ _BRANCH_SALTS[1]).reshape(-1)
            keys_parts.append(keys)
            urls_parts.append(
                url_col.take(np.repeat(np.arange(n), nb))
            )
            vsig = [qs[i * vp : (i + 1) * vp] for i in range(n)]
            vsig_parts.append([vsig[i] for i in range(n) for _ in range(nb)])
            branch_parts.append(np.ones(n * nb, dtype=np.int32))

        if "substring" in methods:
            lg = t["lgrams"]
            if isinstance(lg, pa.ChunkedArray):
                lg = lg.combine_chunks()
            flat = lg.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
            parent = lg.value_parent_indices()
            keys_parts.append(mix64(flat ^ _BRANCH_SALTS[2]))
            urls_parts.append(url_col.take(parent))
            vsig_parts.append([b""] * len(flat))
            branch_parts.append(np.full(len(flat), 2, dtype=np.int32))

        if not keys_parts:
            out = pa.table(
                {
                    "key": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                    "vsig": pa.array([], type=pa.binary()),
                    "branch": pa.array([], type=pa.int32()),
                }
            )
            if hot_ref is None:
                return out
            empty64 = pa.array([], type=pa.int64())
            out = out.append_column("salt", empty64)
            out = out.append_column("gkey", empty64)
            return out.append_column("pkey", empty64)
        all_keys = np.concatenate(keys_parts).view(np.int64)
        all_vsigs = [v for part in vsig_parts for v in part]
        url_arr = pa.concat_arrays(
            [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u for u in urls_parts]
        )
        out = pa.table(
            {
                "key": pa.array(all_keys, type=pa.int64()),
                "url": url_arr,
                "vsig": pa.array(all_vsigs, type=pa.binary()),
                "branch": pa.array(np.concatenate(branch_parts), type=pa.int32()),
            }
        )
        if hot_ref is None:
            return out
        hot = _hot_array(ray.get(hot_ref))
        salts, gkey, pkey = _salt_keys(all_keys, url_arr, hot, cfg, num_partitions)
        out = out.append_column("salt", pa.array(salts, type=pa.int64()))
        out = out.append_column("gkey", pa.array(gkey, type=pa.int64()))
        return out.append_column("pkey", pa.array(pkey, type=pa.int64()))

    return expand


def _binary_matrix(arr: "pa.Array", width: int) -> np.ndarray:
    """Fixed-width BinaryArray → (n, width) uint8 matrix, zero-copy from
    the Arrow data buffer (no per-cell Python bytes objects)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, width), dtype=np.uint8)
    offsets = arr.buffers()[1]
    starts = np.frombuffer(offsets, dtype=np.int32, count=n + 1, offset=arr.offset * 4)
    if starts[-1] - starts[0] != n * width:
        # mixed-width values (e.g. a cross-branch key collision placed an
        # empty vsig among minhash rows): safe per-value path, zero-padded
        out = np.zeros((n, width), dtype=np.uint8)
        for i, v in enumerate(arr.to_pylist()):
            b = np.frombuffer(v or b"", dtype=np.uint8)[:width]
            out[i, : len(b)] = b
        return out
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8, count=n * width, offset=int(starts[0]))
    return data.reshape(n, width)


def _empty_grouped_table() -> pa.Table:
    return pa.table(
        {
            "key": pa.array([], type=pa.int64()),
            "kind": pa.array([], type=pa.string()),
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
            "est": pa.array([], type=pa.float64()),
            "branch": pa.array([], type=pa.int32()),
            "vsig": pa.array([], type=pa.binary()),
        }
    )


def make_unified_partition_grouper(cfg: DedupConfig, emit_reps: bool):
    """Partition grouper over mixed-branch rows (buckets are branch-pure —
    branch ids are baked into the keys).

    Arrow-native hot path: within-partition ordering via ``pc.sort_indices``
    + ``take`` (C), group boundaries and star-edge index math in numpy over
    zero-copy int columns, verification signatures reinterpreted straight
    from the Arrow binary buffer (:func:`_binary_matrix`), and url strings
    only ever gathered by ``take`` for the (few) emitted edges — the 18M-row
    partition input never materializes a Python object per cell (the
    pandas-based predecessor spent ~70% of its time doing exactly that).

    Output adds a ``branch`` column so edges can be method-stamped after the
    shuffle.
    """
    tau = cfg.jaccard_threshold - cfg.verify_margin
    vp = cfg.verify_perms
    vw = vp  # vsig byte width: 1 quantized byte per verification component

    def grouper(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return _empty_grouped_table()
        order = pc.sort_indices(
            t, sort_keys=[("gkey", "ascending"), ("url", "ascending")]
        )
        t = t.take(order).combine_chunks()
        g = t["gkey"].to_numpy()
        keys = t["key"].to_numpy()
        salts = t["salt"].to_numpy()
        branch = t["branch"].to_numpy()
        urls = t["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()

        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        sizes = np.diff(np.r_[starts, n])
        hub_per_row = np.repeat(starts, sizes)
        is_member = np.arange(n) != hub_per_row

        # --- verified (minhash) rows: est vs bucket hub --------------------
        vmask = branch == 1
        a_parts: list[np.ndarray] = []   # hub/src row indices
        b_parts: list[np.ndarray] = []   # member/dst row indices
        est_parts: list[np.ndarray] = []

        if vmask.any():
            vidx = np.cumsum(vmask) - 1  # row index → minhash-subset index
            vs = _binary_matrix(t["vsig"].filter(pa.array(vmask)), vw)
            vm = np.flatnonzero(is_member & vmask)
            vh = hub_per_row[vm]
            est = (vs[vidx[vm]] == vs[vidx[vh]]).mean(axis=1)
            ok = est >= tau
            a_parts.append(vh[ok])
            b_parts.append(vm[ok])
            est_parts.append(est[ok])
            # small buckets: exact all-pairs (pairs agreeing with each other
            # but not the hub). Python loop touches only multi-member
            # verified buckets — actual candidate collisions, rare vs rows.
            small = np.flatnonzero(
                (sizes >= 3) & (sizes <= ALLPAIRS_CAP) & vmask[starts]
            )
            aa2: list[int] = []
            bb2: list[int] = []
            ee2: list[float] = []
            for gi in small:
                lo = starts[gi]
                gvs = vs[vidx[lo] : vidx[lo] + sizes[gi]]
                pe = (gvs[:, None, :] == gvs[None, :, :]).mean(axis=2)
                ii, jj = np.nonzero(np.triu(pe >= tau, k=1))
                for i, j in zip(ii.tolist(), jj.tolist()):
                    if i == 0:
                        continue  # hub pairs covered vectorized above
                    aa2.append(lo + i)
                    bb2.append(lo + j)
                    ee2.append(float(pe[i, j]))
            if aa2:
                a_parts.append(np.asarray(aa2, dtype=np.int64))
                b_parts.append(np.asarray(bb2, dtype=np.int64))
                est_parts.append(np.asarray(ee2, dtype=np.float64))

        # --- unverified (exact / substring): membership IS the criterion ---
        um = np.flatnonzero(is_member & ~vmask)
        if len(um):
            a_parts.append(hub_per_row[um])
            b_parts.append(um)
            est_parts.append(np.ones(len(um), dtype=np.float64))

        tables: list[pa.Table] = []
        if a_parts:
            ai = np.concatenate(a_parts)
            bi = np.concatenate(b_parts)
            ee = np.concatenate(est_parts)
            ne = len(ai)
            tables.append(
                pa.table(
                    {
                        "key": pa.array(keys[bi], type=pa.int64()),
                        "kind": pa.array(["edge"] * ne, type=pa.string()),
                        "a": urls.take(pa.array(ai)),
                        "b": urls.take(pa.array(bi)),
                        "est": pa.array(ee, type=pa.float64()),
                        "branch": pa.array(branch[bi], type=pa.int32()),
                        "vsig": pa.array([b""] * ne, type=pa.binary()),
                    }
                )
            )

        if emit_reps:
            rep_idx = starts[salts[starts] >= 0]
            if len(rep_idx):
                ri = pa.array(rep_idx)
                tables.append(
                    pa.table(
                        {
                            "key": pa.array(keys[rep_idx], type=pa.int64()),
                            "kind": pa.array(["rep"] * len(rep_idx), type=pa.string()),
                            "a": urls.take(ri),
                            "b": pa.array([""] * len(rep_idx), type=pa.string()),
                            "est": pa.array(
                                np.zeros(len(rep_idx)), type=pa.float64()
                            ),
                            "branch": pa.array(branch[rep_idx], type=pa.int32()),
                            "vsig": t["vsig"].take(ri),
                        }
                    )
                )

        if not tables:
            return _empty_grouped_table()
        out = pa.concat_tables(tables)
        return out.cast(_empty_grouped_table().schema)

    return grouper


def unified_star_edges(
    sig_ds: "ray.data.Dataset", cfg: DedupConfig
) -> "ray.data.Dataset":
    """Signature table → edges for all enabled star branches via one shuffle.

    Skew handling: hot-bucket detection from a SAMPLE of the signature table
    (cheap — the expander runs over ``hot_sample_frac`` of the docs), then
    ONE fused expand+salt pass feeds the partitioning sort directly: the
    17+-rows/doc candidate set is never materialized as a standalone dataset
    and never walked twice (the un-fused predecessor spent a full
    materialization plus a 54M-row salting pass here at 1.2M docs).
    """
    P = default_partitions(cfg)
    hot_keys = hot_bucket_keys_from_sig(sig_ds, cfg)
    hot_ref = ray.put(_hot_array(hot_keys))
    salted = sig_ds.map_batches(
        make_unified_star_expander(cfg, hot_ref=hot_ref, num_partitions=P),
        batch_format="pyarrow",
    )
    grouped = partition_map(
        salted, P, make_unified_partition_grouper(cfg, emit_reps=bool(hot_keys))
    )
    grouped = grouped.materialize()

    _method_lut = np.array(
        [BRANCH_METHOD[i] for i in range(len(BRANCH_METHOD))], dtype=object
    )

    def stamp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "edge"))
        branch = t["branch"].to_numpy(zero_copy_only=False)
        methods = pa.array(_method_lut[branch], type=pa.string())
        return pa.table(
            {"a": t["a"], "b": t["b"], "est": t["est"], "method": methods}
        )

    edges = grouped.map_batches(stamp, batch_format="pyarrow")
    if not hot_keys:
        return edges  # no skew detected → no salted sub-buckets to re-link

    def rep_rows_fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "rep"))
        return pa.table(
            {
                "key": t["key"],
                "url": t["a"],
                "vsig": t["vsig"],
                "branch": t["branch"],
                "salt": pa.array([-1] * len(t), type=pa.int64()),
                "gkey": t["key"],
                "pkey": pa.array([0] * len(t), type=pa.int64()),
            }
        )

    rep_rows = grouped.map_batches(rep_rows_fn, batch_format="pyarrow")
    rep_grouped = partition_map(
        rep_rows, 1, make_unified_partition_grouper(cfg, emit_reps=False)
    )
    rep_edges = rep_grouped.map_batches(stamp, batch_format="pyarrow")
    return edges.union(rep_edges)


def make_simhash_expander(cfg: DedupConfig):
    """sig table → two-level pigeonhole rows (Manku et al. WWW'07).

    Hamming radius ≤ 3 over 64 bits: 4 primary blocks of 16 bits (≥ 1 equal),
    then the complementary 48 bits split into 4 sub-blocks of 12 (≥ 1 equal)
    — 16 tables, key = mix(table_idx, block value, sub-block value).
    Emits (key, url, simhash) rows: 16 per doc.
    """
    B = cfg.simhash_blocks  # 4
    bw = cfg.simhash_bits // B  # 16
    sw = (cfg.simhash_bits - bw) // B  # 12

    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        sh = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        keys = np.empty((n, B * B), dtype=np.uint64)
        mask_b = np.uint64((1 << bw) - 1)
        mask_s = np.uint64((1 << sw) - 1)
        for i in range(B):
            block = (sh >> np.uint64(i * bw)) & mask_b
            # complement bits: everything except block i, packed contiguously
            lo = sh & (np.uint64((1 << (i * bw)) - 1) if i else np.uint64(0))
            hi = sh >> np.uint64((i + 1) * bw)
            comp = lo | (hi << np.uint64(i * bw))
            for j in range(B):
                sub = (comp >> np.uint64(j * sw)) & mask_s
                tbl = np.uint64(i * B + j + 1)
                with np.errstate(over="ignore"):
                    keys[:, i * B + j] = mix64(
                        (block << np.uint64(20)) ^ sub ^ (tbl * _SALT_MIX)
                    )
        url_col = t["url"]
        if isinstance(url_col, pa.ChunkedArray):
            url_col = url_col.combine_chunks()
        rep_idx = np.repeat(np.arange(n, dtype=np.int64), B * B)
        return pa.table(
            {
                "key": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "url": url_col.take(pa.array(rep_idx)),
                "simhash": pa.array(np.repeat(sh.view(np.int64), B * B), type=pa.int64()),
            }
        )

    return expand


_POPCNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming_matrix(v: np.ndarray) -> np.ndarray:
    """(n,n) pairwise Hamming distances between uint64 simhashes."""
    x = np.bitwise_xor.outer(v, v)
    return _POPCNT_LUT[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1)


def make_simhash_partition_grouper(cfg: DedupConfig):
    """One-call-per-partition simhash grouper: pairwise Hamming ≤ radius
    within each pigeonhole bucket. Arrow-native like the unified grouper:
    C-speed sort/take, numpy over zero-copy int columns, urls gathered only
    for emitted pairs; the Python loop touches only multi-member buckets
    (actual pigeonhole collisions).

    Buckets above ``simhash_group_cap`` are chunked after sorting by simhash
    value (documented approximation: cross-chunk pairs in oversized buckets
    are candidates in other tables w.h.p.).
    """
    radius = cfg.hamming_radius
    cap = cfg.simhash_group_cap
    bits = float(cfg.simhash_bits)

    def grouper(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], type=pa.string()),
                "b": pa.array([], type=pa.string()),
                "est": pa.array([], type=pa.float64()),
            }
        )
        n = len(t)
        if n < 2:
            return empty
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("gkey", "ascending"),
                ("simhash", "ascending"),
                ("url", "ascending"),
            ],
        )
        t = t.take(order).combine_chunks()
        g = t["gkey"].to_numpy()
        shs = t["simhash"].to_numpy().view(np.uint64)
        urls = t["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        sizes = np.diff(np.r_[starts, n])

        ii_all: list[np.ndarray] = []
        jj_all: list[np.ndarray] = []
        hv_all: list[np.ndarray] = []
        for gi in np.flatnonzero(sizes >= 2):
            s0 = int(starts[gi])
            gn = int(sizes[gi])
            for lo in range(s0, s0 + gn, cap):
                hi = min(s0 + gn, lo + cap)
                hv = hamming_matrix(shs[lo:hi])
                ci, cj = np.nonzero(np.triu(hv <= radius, k=1))
                if len(ci):
                    ii_all.append(ci.astype(np.int64) + lo)
                    jj_all.append(cj.astype(np.int64) + lo)
                    hv_all.append(hv[ci, cj])
        if not ii_all:
            return empty
        ii = np.concatenate(ii_all)
        jj = np.concatenate(jj_all)
        hv = np.concatenate(hv_all).astype(np.float64)
        ua = urls.take(pa.array(ii))
        ub = urls.take(pa.array(jj))
        # canonical a < b ordering without touching Python strings
        return pa.table(
            {
                "a": pc.min_element_wise(ua, ub),
                "b": pc.max_element_wise(ua, ub),
                "est": pa.array(1.0 - hv / bits, type=pa.float64()),
            }
        )

    return grouper


def simhash_edges(sig_ds: "ray.data.Dataset", cfg: DedupConfig) -> "ray.data.Dataset":
    P = np.uint64(default_partitions(cfg))
    rows = sig_ds.map_batches(make_simhash_expander(cfg), batch_format="pyarrow")

    def add_pkey(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False).view(np.uint64)
        pkey = (mix64(k ^ _PKEY_MIX) % P).view(np.int64)
        t = t.append_column("gkey", t["key"])
        return t.append_column("pkey", pa.array(pkey, type=pa.int64()))

    grouped = partition_map(
        rows.map_batches(add_pkey, batch_format="pyarrow"),
        int(P),
        make_simhash_partition_grouper(cfg),
    )

    def stamp(t: pa.Table) -> pa.Table:
        return t.append_column("method", pa.array(["simhash"] * len(t), type=pa.string()))

    return grouped.map_batches(stamp, batch_format="pyarrow")
