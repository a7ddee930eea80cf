"""Candidate-pair generation: the engine's shuffle stages.

Generalizes camden's single mutex-guarded hash-grouping
(/root/reference/src/scanner.rs:17-49,61-63) into real hash shuffles with
explicit skew handling (north_rule: "explicit groupby-aggregate shuffles keyed
on LSH band buckets with salted repartitioning for skewed hot buckets").

Physical plan: bucket keys are NOT grouped one-group-per-call (millions of
tiny buckets ⇒ per-group Python overhead dominates). Instead rows are hash-
partitioned into ``num_partitions`` coarse partitions (``pkey = mix(gkey) %
P``) and each partition is processed by ONE vectorized numpy pass
(:func:`make_unified_partition_grouper`): lexsort by (gkey, uid), group
boundaries by run-length, star edges emitted via ``np.repeat`` — a Python
loop touches only multi-member *candidate* buckets needing all-pairs
verification. Candidate rows carry int64 doc uids, never url strings — the
string payload made the dominant exchange ~25× slower (70.5 s → 2.8 s on
54.6M rows / 32 CPUs); urls are resolved back only for emitted edges
(:func:`resolve_edge_urls`).

Skew handling is a separate explicit mechanism (not the partitioner): a
sampled count pass finds buckets above ``bucket_cap``; their rows are
salt-split into ``num_salts`` sub-buckets (salt = deterministic uid mix)
BEFORE partitioning, so no single reduce task owns a pathological bucket;
sub-bucket hubs are then linked by a second (tiny) grouping pass keyed on the
original bucket key (recovered via the broadcast salted-gkey map).

Cost model: star emission is O(|bucket|) rows per bucket (never O(n²));
all-pairs verification only for buckets ≤ ``allpairs_cap`` members.

Public edges schema (unified across methods, post-resolution):
    a: string, b: string  (a < b), est: float64, method: string
"""

from __future__ import annotations

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
    P = max(cpus, -(-n_rows // max(1, cfg.rows_per_partition)))
    if P > cpus:
        # data-sized regime: round up to a multiple of 32 so reduce waves
        # quantize evenly across common worker counts (P=92 on 16 slots is
        # 5.75 waves — the last wave idles a quarter of the cluster; P=96 is
        # exactly 6). Level-independent, so scaling runs stay honest.
        P = -(-P // 32) * 32
    return P


#: slices per exchange map-output object. Bundling 4 partitions' slices into
#: one plasma object cuts the exchange's object count (and per-object
#: serialize/seal/schedule overhead) 4x with ZERO read amplification: a
#: reduce task deserializes its bundle zero-copy from the shared mmap and
#: only its own slice's pages are ever touched by the concat.
SLICE_BUNDLE = 4


@ray.remote(num_cpus=1)
def _split_by_pkey(P: int, bundle: int, key: str, map_fn, *tabs: "pa.Table"):
    """One exchange map task: concatenate this task's input blocks,
    (optionally transform, then) order by the partition key and return the P
    zero-copy slices as ``ceil(P/bundle)`` bundle objects (Ray's Arrow
    serializer IPC-truncates slices, so a bundle ships only its rows).

    Accepts MULTIPLE input blocks: partition_map groups upstream blocks into
    ~P map tasks, so a union of many small block sets needs no driver-side
    repartition barrier first and the exchange's object count stays bounded
    regardless of upstream block fragmentation.

    ``map_fn`` fuses a row-expanding transform (e.g. the candidate-row
    expander) into the exchange map side: the expanded rows go straight from
    this task's heap into their slices, never materializing as a standalone
    dataset (one full object-store round trip of the engine's largest
    intermediate saved). map_fn runs per input block (not on the concat) so
    its heap watermark matches the un-grouped behavior."""
    slices = _ordered_pkey_slices(tabs, key, map_fn, np.arange(P + 1), drop_key=True)
    B = -(-P // bundle)
    out = tuple(slices[j * bundle : (j + 1) * bundle] for j in range(B))
    # num_returns == B: Ray unpacks the tuple only for num_returns > 1
    return out if B > 1 else out[0]


#: numpy dtypes the splitter fast path can gather with fancy indexing
_NP_GATHER_TYPES = frozenset(
    {
        pa.int8(), pa.int16(), pa.int32(), pa.int64(),
        pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
        pa.float32(), pa.float64(),
    }
)


def _numpy_partition_sort(t: "pa.Table", key: str, boundaries: np.ndarray):
    """Fast path for the splitter's order-by-pkey: downcast radix argsort of
    the partition key + numpy fancy-index gather of every column.

    The exchange's hot shape is an all-primitive skinny table whose pkey is a
    small partition ordinal — ``np.argsort`` on a uint16 view is a 2-pass
    radix sort and the per-column numpy gather skips Arrow's chunked-take
    machinery (measured 52 → 30 ms on a 1.44M-row 3-col map block; the
    exchange map wave is memory-bandwidth-bound at full width, so fewer
    passes shrink the contention dilation too). Returns ``(sorted_columns
    dict, bounds)`` or None when any column needs the general Arrow path
    (strings/binary/nulls/non-primitive)."""
    cols = {}
    for name in t.column_names:
        col = t[name]
        if col.type not in _NP_GATHER_TYPES or col.null_count:
            return None
        cols[name] = col.to_numpy(zero_copy_only=False)
    pk = cols[key]
    hi = int(boundaries[-1])
    # downcast only when every key is provably in range — a wrapped value
    # would missort silently (one min/max pass is ~2% of the gather)
    in_range = len(pk) == 0 or (pk.min() >= 0 and pk.max() < hi)
    if in_range and hi <= np.iinfo(np.uint16).max:
        order = np.argsort(pk.astype(np.uint16), kind="stable")
    elif in_range and hi <= np.iinfo(np.uint32).max:
        order = np.argsort(pk.astype(np.uint32), kind="stable")
    else:
        order = np.argsort(pk, kind="stable")
    cols = {n: a[order] for n, a in cols.items()}
    bounds = np.searchsorted(cols[key], boundaries)
    return cols, bounds


def _ordered_pkey_slices(
    tabs, key: str, map_fn, boundaries: np.ndarray, drop_key: bool = False
):
    """Splitter core shared by all exchange levels: concat the input blocks,
    order by ``key`` once (one C-speed sort) and return ``len(boundaries)-1``
    zero-copy slices; slice ``i`` holds rows with
    ``boundaries[i] <= key < boundaries[i+1]``.

    ``drop_key=True`` (final exchange level only): the partition key has
    done its job once the slice boundaries are cut — no reduce fn reads it
    (they key on their own payload columns), so shipping it wastes 8 B on
    every exchanged row (~25-30% of the skinny candidate rows). Intermediate
    levels keep it: ``_split_locals`` re-sorts by it."""
    n_out = len(boundaries) - 1
    if map_fn is not None:
        # zero-row upstream blocks can carry an EMPTY schema (repartition of
        # a tiny input emits schemaless filler blocks) — map_fn must never
        # see those; they contribute no rows either way
        tabs = [map_fn(t) for t in tabs if t.num_rows]
        if not tabs:
            empty = pa.table({key: pa.array([], type=pa.int64())})
            if drop_key:
                empty = empty.drop_columns([key])
            return tuple(empty for _ in range(n_out))
    nonempty = [t for t in tabs if t.num_rows]
    if not nonempty:
        t = max(tabs, key=lambda s: s.num_columns)
        if drop_key and key in t.column_names:
            t = t.drop_columns([key])
        return tuple(t.slice(0, 0) for _ in range(n_out))
    t = pa.concat_tables(nonempty) if len(nonempty) > 1 else nonempty[0]
    fast = _numpy_partition_sort(t, key, boundaries)
    if fast is not None:
        cols, bounds = fast
        if drop_key:
            del cols[key]
        t = pa.table({n: pa.array(a) for n, a in cols.items()})
    else:
        order = pc.sort_indices(t[key])
        t = t.take(order).combine_chunks()
        pk = t[key].to_numpy()
        bounds = np.searchsorted(pk, boundaries)
        if drop_key:
            t = t.drop_columns([key])
    return tuple(t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_out))


@ray.remote(num_cpus=1)
def _split_supers(S: int, sub: int, key: str, map_fn, *tabs: "pa.Table"):
    """Two-level exchange, level 1: split a map task's rows into S SUPER
    partitions (super s covers pkeys ``[s*sub, (s+1)*sub)``)."""
    return _ordered_pkey_slices(tabs, key, map_fn, np.arange(S + 1) * sub)


@ray.remote(num_cpus=1)
def _split_locals(base: int, n_local: int, key: str, *slices: "pa.Table"):
    """Two-level exchange, level 2: concat one super partition's slices and
    split into its final partitions (pkeys ``[base, base+n_local)``). Rows
    arrive pre-sorted per slice but the concat is not globally ordered, so
    the shared core re-sorts (cheap: one super partition's rows only)."""
    out = _ordered_pkey_slices(
        slices, key, None, base + np.arange(n_local + 1), drop_key=True
    )
    # num_returns == n_local: Ray unpacks a tuple only for num_returns > 1
    return out if n_local > 1 else out[0]


@ray.remote(num_cpus=1)
def _reduce_partition(fn, batch_format: str, idx: int, *bundles):
    """One exchange reduce task: gather this partition's slice from each map
    task's bundle (``idx`` = position within the bundle; a bare Table is a
    1-slice bundle from the two-level path), concatenate, apply ``fn``."""
    slices = [b[idx] if isinstance(b, tuple) else b for b in bundles]
    parts = [s for s in slices if s.num_rows]
    if parts:
        t = pa.concat_tables(parts)
    else:
        # all-empty partition: pick a slice that still carries the pipeline
        # schema (union stages can emit schemaless empty blocks)
        t = max(slices, key=lambda s: s.num_columns)
    if batch_format == "pandas":
        out = fn(t.to_pandas())
        return pa.Table.from_pandas(out, preserve_index=False)
    return fn(t)


#: exchange-object budget above which partition_map goes hierarchical:
#: 256 map tasks × 256 partitions stays single-level (65,536 objects is
#: cheap); a 1k×1k exchange (10⁶ objects) switches to ~1k×32+1k ≈ 33k.
TWO_LEVEL_MIN_OBJECTS = 65_536


def partition_map(
    ds: "ray.data.Dataset",
    P: int,
    fn,
    key: str = "pkey",
    batch_format: str = "pyarrow",
    map_fn=None,
    two_level_min_objects: int = TWO_LEVEL_MIN_OBJECTS,
) -> "ray.data.Dataset":
    """Co-locate rows by a precomputed integer partition key in ``[0, P)`` and
    apply ``fn`` once per partition (whole-partition Arrow batches).

    This replaces ``groupby(key).map_groups(fn)`` on coarse partition keys:
    Ray's sort-based groupby quantile-samples boundaries, which collapse on a
    low-cardinality key (P distinct values → skewed reduce blocks, empty
    partitions, and an expensive re-merge).

    Physical plan: a RAW map/reduce hash exchange — each input block is
    ordered by ``key`` once and returned as P zero-copy slices, bundled
    ``SLICE_BUNDLE`` adjacent partitions per plasma object
    (``num_returns=ceil(P/SLICE_BUNDLE)``); each reduce task indexes its
    slice out of every map task's bundle, concatenates, and runs ``fn`` on
    the complete partition. Bundling cuts map-side object seals and
    scheduler-visible objects 4x; single-node reads stay zero-copy from the
    shared mmap. Multi-node caveat: the reduce tasks of one bundle's 4
    adjacent partitions each fetch the bundle object — Ray's object manager
    caches it per node after the first pull, so worst-case network
    amplification is min(SLICE_BUNDLE, nodes-touched) and locality-aware
    scheduling biases those sibling tasks onto the same node. This replaced the explicit-boundary
    ``Dataset.sort``: Ray's sort machinery went superlinear in ROW COUNT on
    the candidate exchange (48M rows ≈ 4 s but 136M rows ≈ 39 s at 32 CPUs,
    payload-width-independent — push-based and hash-shuffle strategies
    measured worse still), while the raw exchange is one C-speed
    sort+slice per map block and one concat per reduce partition. Slices are
    plasma objects, so a multi-node cluster moves each slice exactly once
    (the same map→reduce network pattern as any MR shuffle).

    Scale notes: single-level object count is map_tasks × P ≈ O(P²) (the
    engine shapes inputs to ~P blocks). Above ``two_level_min_objects`` the
    exchange switches to TWO levels — map tasks split into S ≈ √P super
    partitions, one mid task per super partition sub-splits into its final
    partitions — so object count drops to map_tasks × √P + P ≈ O(P^1.5):
    P = 300k (a 10¹⁰-doc job) creates ~1.6×10⁸ objects instead of ~10¹¹.
    Each row still crosses the network twice (map→mid, mid→reduce slices
    stay node-local when the mid task feeds its own reduces), the standard
    MR trade for object-count headroom. One partition = one reduce output
    block, so P must keep partitions under the object-store block budget —
    size P ∝ data volume via ``cfg.shuffle_partitions`` when 4×CPUs isn't
    enough.

    ``fn`` MUST tolerate an empty batch: a ``key`` value with no rows still
    yields one (empty) reduce block, which groupby-map_groups never produced.
    """
    P = int(P)
    if P <= 1:
        if map_fn is not None:
            ds = ds.map_batches(map_fn, batch_format="pyarrow")
        return ds.repartition(1).map_batches(
            fn, batch_format=batch_format, batch_size=None
        )
    blocks = ds.to_arrow_refs()
    if not blocks:
        if map_fn is not None:
            ds = ds.map_batches(map_fn, batch_format="pyarrow")
        return ds.map_batches(fn, batch_format=batch_format, batch_size=None)
    # ship fns through the object store ONCE (closures capture config and the
    # salted-key map — pickling them per task is blocks/P redundant copies)
    map_ref = ray.put(map_fn) if map_fn is not None else None
    # group upstream blocks into ~max(P, cpus) map tasks: keeps the exchange's
    # object count at ~P² even when the input arrives as hundreds of tiny
    # blocks (union stages), replacing the driver-side repartition barrier +
    # full extra copy callers used to need
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # 4×CPUs floor mirrors default_partitions' straggler logic: grouping must
    # only collapse genuinely fragmented inputs (unions of hundreds of tiny
    # blocks), never halve the map-wave parallelism of a well-shaped input
    target_maps = max(P, 4 * cpus)
    if len(blocks) > target_maps:
        per = -(-len(blocks) // target_maps)
        groups = [blocks[i : i + per] for i in range(0, len(blocks), per)]
    else:
        groups = [[b] for b in blocks]
    fn_ref = ray.put(fn)
    if len(groups) * P > two_level_min_objects and P >= 4:
        # hierarchical exchange: O(P^1.5) objects instead of O(P²)
        import math

        S = max(2, math.isqrt(P - 1) + 1)  # ceil(sqrt(P))
        sub = -(-P // S)                    # final partitions per super
        S = -(-P // sub)                    # actual super count
        sliced = [
            _split_supers.options(num_returns=S).remote(S, sub, key, map_ref, *grp)
            for grp in groups
        ]
        outs = []
        for s in range(S):
            base = s * sub
            n_local = min(sub, P - base)
            locs = _split_locals.options(num_returns=n_local).remote(
                base, n_local, key, *[sl[s] for sl in sliced]
            )
            if n_local == 1:
                locs = [locs]
            outs.extend(
                _reduce_partition.remote(fn_ref, batch_format, 0, locs[j])
                for j in range(n_local)
            )
        return ray.data.from_arrow_refs(outs)
    B = -(-P // SLICE_BUNDLE)
    sliced = [
        _split_by_pkey.options(num_returns=B).remote(
            P, SLICE_BUNDLE, key, map_ref, *grp
        )
        for grp in groups
    ]
    if B == 1:
        # num_returns=1 yields a bare ref; normalize to the list shape
        sliced = [[s] for s in sliced]
    import os as _os

    if _os.environ.get("CAMDEN_STAGE_STATS"):
        # diagnosis only: barrier on the map wave so its wall is attributable
        # (disables map/reduce pipelining — never set in timed benches)
        import sys as _sys
        import time as _time

        _t0 = _time.monotonic()
        flat = [r for s in sliced for r in (s if isinstance(s, list) else [s])]
        ray.wait(flat, num_returns=len(flat), fetch_local=False)
        print(
            f"== exchange map wave {_time.monotonic()-_t0:.2f}s "
            f"(maps={len(groups)}, P={P})",
            file=_sys.stderr,
        )
    outs = [
        _reduce_partition.remote(
            fn_ref,
            batch_format,
            i % SLICE_BUNDLE,
            *[s[i // SLICE_BUNDLE] for s in sliced],
        )
        for i in range(P)
    ]
    return ray.data.from_arrow_refs(outs)


_UID_SALT_MIX = np.uint64(0xFF51AFD7ED558CCD)


def _salt_keys(
    keys: np.ndarray,
    uids: np.ndarray,
    hot: np.ndarray,
    cfg: DedupConfig,
    P: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (gkey, pkey) for candidate rows.

    ``keys``/``uids`` are int64 (bucket keys / doc ids), ``hot`` a sorted
    uint64 array of hot bucket keys. Membership is one ``np.isin`` pass (the
    per-row Python ``int(k) in set`` predecessor cost ~14 s over the 54M-row
    candidate set); the sub-bucket salt is a mix of the doc uid — fully
    vectorized, deterministic across processes.
    """
    gkey = keys.view(np.uint64).copy()
    if len(hot):
        mask = np.isin(gkey, hot)
        if mask.any():
            salts = mix64(uids[mask].view(np.uint64) ^ _UID_SALT_MIX) % np.uint64(
                cfg.num_salts
            )
            gkey[mask] = mix64(gkey[mask] ^ ((salts + np.uint64(1)) * _SALT_MIX))
    pkey = (mix64(gkey ^ _PKEY_MIX) % np.uint64(P)).view(np.int64)
    return gkey.view(np.int64), pkey


def salted_gkey_map(
    hot_keys: frozenset[int] | np.ndarray, cfg: DedupConfig
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted salted-gkey u64 array, aligned original keys i64).

    Enumerates mix(key, salt) for every (hot key × salt) — |hot|·num_salts
    entries, tiny — so the partition grouper can recognize salted sub-buckets
    (emit a rep row) and recover the ORIGINAL bucket key for the re-link
    pass without any per-row salt/key columns travelling through the shuffle
    (those two int64 columns were ~30% of the exchange payload).
    """
    hot = _hot_array(hot_keys)
    if not len(hot):
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    s = np.arange(int(cfg.num_salts), dtype=np.uint64) + np.uint64(1)
    gk = mix64(hot[:, None] ^ (s[None, :] * _SALT_MIX)).reshape(-1)
    orig = np.repeat(hot.view(np.int64), int(cfg.num_salts))
    order = np.argsort(gk)
    return gk[order], orig[order]


def _count_hot(sample_rows: "ray.data.Dataset", threshold: float) -> frozenset[int]:
    # per-block partial (key, count) aggregates computed IN the cluster, then
    # a parallel block fetch — the driver merges pre-uniqued partials instead
    # of streaming every sampled key serially (iter_batches on the raw sample
    # was a fixed ~6 s driver section at 3M docs / 10% sample)
    def partial(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(t["key"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"key": pa.array(uniq, type=pa.int64()),
             "cnt": pa.array(cnt.astype(np.int64), type=pa.int64())}
        )

    tabs = ray.get(
        sample_rows.select_columns(["key"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return frozenset()
    merged = pa.concat_tables(tabs)
    keys = merged["key"].to_numpy(zero_copy_only=False)
    cnts = merged["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    totals = np.add.reduceat(cnts, starts)
    hot = keys[starts][totals >= threshold]
    return frozenset(int(k) for k in hot)


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

    The effective fraction SHRINKS with corpus size (floor 0.02, targeting
    ~150k sampled docs): detection quality depends on the expected sampled
    count per hot bucket, not the fraction — a cap-sized bucket still lands
    E≈3 sampled members at the floor, and the failure mode of a miss is a
    load-imbalanced (never wrong) partition, while the sample pass itself is
    corpus-linear work on the star branch's critical path. Deterministic:
    the fraction is a pure function of (n, config).
    """
    frac = cfg.hot_sample_frac
    try:
        n = sig_ds.count()  # materialized upstream: metadata-only
    except Exception:
        n = 0
    if n > 0:
        frac = min(frac, max(0.02, 150_000 / n))
    threshold = max(2.0, cfg.bucket_cap * frac / 2.0)
    # prune to the expander's inputs BEFORE sampling: the sample's row-take
    # otherwise copies the wide token-hash streams (th: ~45x the key columns)
    # just to drop them in the expander
    cols = [c for c in ("uid", "digest", "sig", "lgrams") if c in sig_ds.schema().names]
    sample = (
        sig_ds.select_columns(cols)
        .random_sample(frac, seed=cfg.seed)
        .map_batches(make_unified_star_expander(cfg), batch_format="pyarrow")
    )
    return _count_hot(sample, threshold)


def _hot_array(hot: frozenset[int] | np.ndarray) -> np.ndarray:
    """Hot-key set → sorted uint64 array (the np.isin probe side)."""
    if isinstance(hot, np.ndarray):
        return hot
    return np.sort(np.fromiter((k for k in hot), dtype=np.int64, count=len(hot)).view(np.uint64))


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
    carry_vsig: bool = False,
):
    """sig table → ONE keyed row set for every enabled star branch.

    Reads the signature table once and emits, per doc: 1 digest row (exact),
    ``num_bands`` band rows with vsig (minhash), ~len(lgrams) rows
    (substring). Branch ids are folded into the key-space with per-branch
    salts, so the three branches share a single count pass + groupby shuffle
    (one partitioning key reused — SURVEY.md 'minimize shuffles') while their
    buckets can never collide.

    Docs are carried as their int64 ``uid`` (the signature table's url key
    hash), NOT the url string: the candidate row set is the engine's largest
    exchange (~45 rows/doc at default config) and shipping ~50-byte urls on
    every row made the partitioning sort ~25× slower than the skinny int
    layout (measured 70.5 s vs 2.8 s on the same 54.6M rows at 32 CPUs).
    Urls are resolved back only for the emitted edges (:func:`resolve_edge_urls`).

    Base row schema (sampling/counting mode): key:int64, uid:int64,
    branch:int8. With ``hot_ref``/``num_partitions`` set, (key is replaced
    by) gkey and pkey are emitted — the skew-salting pass fused in, so
    candidate rows go straight into the partitioning exchange with no
    intermediate materialization or second pass.

    Candidate rows are SKINNY (17 B + pkey): the minhash verification
    sketches do NOT travel with the rows — the grouper gathers them by uid
    from the broadcast sidecar (:func:`build_vsig_sidecar`). Shipping the
    per-row sketch was 64 B on each of ~16 band rows per doc (~45 % of the
    exchange payload) for data that exists once per doc.

    ``carry_vsig=True`` is the >``vsig_broadcast_max_docs`` fallback: the
    sidecar would not fit a node's object store, so each minhash row DOES
    carry its doc's sketch (a ``vsig`` binary column; empty for
    exact/substring rows) and the grouper verifies from the co-shuffled
    column — heavier exchange, zero broadcast state, identical edges.
    """
    from camden_ray.functions.hashing import band_hashes

    nb = cfg.num_bands
    npms = cfg.num_perms
    vp = cfg.verify_perms
    methods = cfg.methods

    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        keys_parts: list[np.ndarray] = []
        uid_parts: list[np.ndarray] = []
        branch_parts: list[np.ndarray] = []
        width_parts: list[np.ndarray] = []  # per-row vsig byte widths
        vsig_data: bytes = b""
        uid_col = t["uid"].to_numpy(zero_copy_only=False)

        if "exact" in methods:
            dig = t["digest"].to_numpy(zero_copy_only=False).view(np.uint64)
            keys_parts.append(mix64(dig ^ _BRANCH_SALTS[0]))
            uid_parts.append(uid_col)
            branch_parts.append(np.zeros(n, dtype=np.int8))
            width_parts.append(np.zeros(n, dtype=np.int32))

        if "minhash" in methods and n:
            # reinterpret the Arrow binary buffer directly — no per-row
            # Python bytes objects (same zero-copy trick as _binary_matrix)
            sigs = _binary_matrix(t["sig"], npms * 8).view(np.uint64)
            bh = band_hashes(sigs, nb)  # (n, nb)
            band_salt = mix64(
                (np.arange(nb, dtype=np.uint64) + np.uint64(1)) * _SALT_MIX
            )
            keys = mix64((bh ^ band_salt[None, :]) ^ _BRANCH_SALTS[1]).reshape(-1)
            keys_parts.append(keys)
            uid_parts.append(np.repeat(uid_col, nb))
            branch_parts.append(np.ones(n * nb, dtype=np.int8))
            if carry_vsig:
                if "vsig" in t.column_names:
                    qmat = _binary_matrix(t["vsig"], vp)
                else:  # pre-vsig checkpoint: derive from the full signature
                    qmat = (sigs[:, :vp] & np.uint64(0xFF)).astype(np.uint8)
                vsig_data = np.repeat(qmat, nb, axis=0).tobytes()
                width_parts.append(np.full(n * nb, vp, dtype=np.int32))
            else:
                width_parts.append(np.zeros(n * nb, dtype=np.int32))

        if "substring" in methods:
            lg = t["lgrams"]
            if isinstance(lg, pa.ChunkedArray):
                lg = lg.combine_chunks()
            flat = lg.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
            parent = lg.value_parent_indices().to_numpy(zero_copy_only=False)
            keys_parts.append(mix64(flat ^ _BRANCH_SALTS[2]))
            uid_parts.append(uid_col[parent])
            branch_parts.append(np.full(len(flat), 2, dtype=np.int8))
            width_parts.append(np.zeros(len(flat), dtype=np.int32))

        if not keys_parts:
            empty64 = pa.array([], type=pa.int64())
            empty8 = pa.array([], type=pa.int8())
            cols = {"uid": empty64, "branch": empty8}
            if carry_vsig:
                cols["vsig"] = pa.array([], type=pa.large_binary())
            if hot_ref is not None:
                return pa.table({"gkey": empty64, **cols, "pkey": empty64})
            return pa.table({"key": empty64, **cols})
        all_keys = np.concatenate(keys_parts).view(np.int64)
        all_uids = np.concatenate(uid_parts)
        all_branch = np.concatenate(branch_parts)
        extra = {}
        if carry_vsig:
            # large_binary (int64 offsets): a map block of >2.1M docs would
            # overflow int32 offsets (n*num_bands*verify_perms bytes) and
            # silently corrupt the column — and the choice must be the same
            # for every block or the reduce-side concat sees mixed schemas
            widths = np.concatenate(width_parts)
            offs = np.zeros(len(widths) + 1, dtype=np.int64)
            np.cumsum(widths, out=offs[1:])
            extra["vsig"] = pa.Array.from_buffers(
                pa.large_binary(), len(widths),
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(vsig_data)],
            )

        if hot_ref is None:
            return pa.table(
                {
                    "key": pa.array(all_keys, type=pa.int64()),
                    "uid": pa.array(all_uids, type=pa.int64()),
                    "branch": pa.array(all_branch, type=pa.int8()),
                    **extra,
                }
            )
        hot = _hot_array(ray.get(hot_ref))
        gkey, pkey = _salt_keys(all_keys, all_uids, hot, cfg, num_partitions)
        return pa.table(
            {
                "gkey": pa.array(gkey, type=pa.int64()),
                "uid": pa.array(all_uids, type=pa.int64()),
                "branch": pa.array(all_branch, type=pa.int8()),
                **extra,
                "pkey": pa.array(pkey, type=pa.int64()),
            }
        )

    return expand


def build_vsig_sidecar(
    sig_ds: "ray.data.Dataset", cfg: DedupConfig
) -> "ray.ObjectRef":
    """Broadcast verification-sketch sidecar: ``(uid_sorted, qmat)`` where
    ``qmat[i]`` is the quantized minhash sketch (low byte of the first
    ``verify_perms`` components) of ``uid_sorted[i]``.

    Built in one parallel pass over the signature table (per-block sketch
    matrices assembled from the Arrow buffers, no Python objects), merged and
    sorted on the driver, ``ray.put`` once — every grouper task reads it
    zero-copy from the local object store and gathers only the rows of
    multi-member verified buckets. vp=64 → 64 B/doc: ~190 MB at 3M docs,
    ~6 GB at 100M docs/node — within a worker node's store. Beyond that
    regime the sketches must co-shuffle as a (uid, vsig) table joined onto
    candidate pairs (pair-sized exchange) instead of a broadcast; the
    grouper's bucket logic is unchanged either way.
    """
    vp = cfg.verify_perms
    npms = cfg.num_perms
    # fast path: the signature stage stamps the quantized sketch as its own
    # `vsig` column, so this pass ships vp bytes/doc instead of num_perms*8
    # (older persisted checkpoints lack the column — fall back to deriving
    # the sketch from the full sig)
    has_vsig = "vsig" in sig_ds.schema().names

    def partial(t: pa.Table) -> pa.Table:
        if "vsig" in t.column_names:
            return pa.table({"uid": t["uid"], "q": t["vsig"]})
        sigs = _binary_matrix(t["sig"], npms * 8).view(np.uint64)
        q = (sigs[:, :vp] & np.uint64(0xFF)).astype(np.uint8)
        offsets = np.arange(len(t) + 1, dtype=np.int32) * vp
        qa = pa.Array.from_buffers(
            pa.binary(), len(t),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(q.tobytes())],
        )
        return pa.table({"uid": t["uid"], "q": qa})

    refs = (
        sig_ds.select_columns(["uid", "vsig" if has_vsig else "sig"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    if not refs:
        return ray.put((np.empty(0, dtype=np.int64), np.empty((0, vp), dtype=np.uint8)))
    # assemble IN THE CLUSTER, not on the driver: the concat + argsort +
    # gather over ~(8+vp) bytes/doc was a driver-serial section that grew
    # linearly with the corpus (~6-8 s at 3M docs) and sat on the star
    # branch's critical path at every parallelism level. As a task it
    # overlaps the hot-bucket pass and the result is ALREADY a plasma object
    # (a task return) — the groupers read it exactly like a ray.put ref.
    return _assemble_sidecar.remote(vp, *refs)


@ray.remote(num_cpus=2)
def _assemble_sidecar(vp: int, *tabs: "pa.Table"):
    """Sidecar assembly task: per-block (uid, q) tables → (uid_sorted, qmat).

    Assembles the (n, vp) matrix PER BLOCK, never concatenating the Arrow
    binary column across blocks: a concat+combine_chunks of the q column
    overflows binary's int32 offsets at 2 GiB (~33.5M docs at vp=64) —
    exactly the regime between there and vsig_broadcast_max_docs where the
    broadcast sidecar is still the chosen transport. num_cpus=2 reflects the
    concat+sort burst so the scheduler doesn't co-pack it with a full wave.
    """
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return (np.empty(0, dtype=np.int64), np.empty((0, vp), dtype=np.uint8))
    uids = np.concatenate(
        [t["uid"].to_numpy(zero_copy_only=False) for t in tabs]
    )
    qmat = (
        np.concatenate([_binary_matrix(t["q"], vp) for t in tabs])
        if len(tabs) > 1
        else _binary_matrix(tabs[0]["q"], vp)
    )
    order = np.argsort(uids)  # uids unique; numpy sort inside the task
    return (uids[order], np.ascontiguousarray(qmat[order]))


def _binary_matrix(arr: "pa.Array", width: int) -> np.ndarray:
    """Fixed-width Binary/LargeBinaryArray → (n, width) uint8 matrix,
    zero-copy from the Arrow data buffer (no per-cell Python bytes objects)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, width), dtype=np.uint8)
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = arr.buffers()[1]
    starts = np.frombuffer(
        offsets, dtype=off_dtype, count=n + 1,
        offset=arr.offset * np.dtype(off_dtype).itemsize,
    )
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
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "est": pa.array([], type=pa.float64()),
            "branch": pa.array([], type=pa.int8()),
            # hub sketch bytes for salted "rep" rows in co-shuffle (carry_vsig)
            # mode — empty everywhere else (4 B offset/row, no data bytes)
            "vsig": pa.array([], type=pa.binary()),
        }
    )


def _empty_binary(n: int) -> pa.Array:
    offs = np.zeros(n + 1, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(b"")]
    )


def make_unified_partition_grouper(cfg: DedupConfig, salted_map=None, vsig_ref=None):
    """Partition grouper over mixed-branch rows (buckets are branch-pure —
    branch ids are baked into the keys).

    Arrow/numpy-native hot path: within-partition ordering via
    ``pc.sort_indices`` + ``take`` (C), group boundaries and star-edge index
    math in numpy over zero-copy int columns. Rows carry doc uids (int64),
    not urls — the emitted edges are uid pairs, canonical ``a < b`` by
    construction (hubs are per-bucket min uid under the (gkey, uid) sort).

    Verification sketches come from the broadcast ``vsig_ref`` sidecar
    (:func:`build_vsig_sidecar`): the grouper gathers sketch rows by uid ONLY
    for rows sitting in multi-member verified buckets (actual band
    collisions — rare vs rows), instead of every candidate row shipping its
    sketch through the exchange. ``vsig_ref=None`` ⇒ minhash buckets cannot
    be verified (only valid when the minhash branch is disabled).

    ``salted_map`` — (sorted salted-gkey u64 array, aligned original keys)
    from :func:`salted_gkey_map` — identifies salted sub-buckets: each gets a
    "rep" row (hub uid + ORIGINAL bucket key) so the re-link pass can join
    sub-hubs of the same hot bucket (gathering sketches from the same
    sidecar). No per-row salt/key columns.

    Output adds a ``branch`` column so edges can be method-stamped after the
    shuffle.
    """
    tau = cfg.jaccard_threshold - cfg.verify_margin
    if salted_map is None:
        salted_map = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    salted_gkeys, salted_orig = salted_map

    def grouper(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return _empty_grouped_table()
        # contiguous FIRST: a multi-key sort_indices over the reduce concat's
        # ~96 chunks is 2.5x the contiguous sort (576 vs 220 ms on a 1.4M-row
        # partition), and take on chunked pays again (128 vs 42 ms) — one
        # 25 MB combine pass buys both back
        t = t.combine_chunks()
        order = pc.sort_indices(
            t, sort_keys=[("gkey", "ascending"), ("uid", "ascending")]
        )
        t = t.take(order)
        g = t["gkey"].to_numpy()
        branch = t["branch"].to_numpy()
        uids = t["uid"].to_numpy()

        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        sizes = np.diff(np.r_[starts, n])
        hub_per_row = np.repeat(starts, sizes)
        is_member = np.arange(n) != hub_per_row

        # --- verified (minhash) rows: est vs bucket hub --------------------
        vmask = branch == 1
        a_parts: list[np.ndarray] = []   # hub/src row indices
        b_parts: list[np.ndarray] = []   # member/dst row indices
        est_parts: list[np.ndarray] = []

        multi = np.repeat(sizes >= 2, sizes)
        vsel = vmask & multi
        row_vsig = vsig_ref is None and "vsig" in t.column_names
        if vsel.any():
            ridx = np.flatnonzero(vsel)
            if row_vsig:
                # co-shuffle mode: sketches ride the rows (all selected rows
                # are minhash rows, so widths are uniform vp)
                qrows = _binary_matrix(
                    t["vsig"].take(pa.array(ridx)), cfg.verify_perms
                )
            else:
                us, qm = ray.get(vsig_ref)  # zero-copy from local object store
                pos = np.searchsorted(us, uids[ridx])
                # hard membership check (mirrors component_min_urls / the
                # copartition merges): a uid absent from the sidecar would
                # otherwise raise IndexError past the end or SILENTLY verify
                # against the wrong doc's sketch. The invariant (sidecar built
                # from the same signature table) holds today; a caller passing
                # a signature subset must fail loudly, not corrupt edges.
                if len(pos) and (
                    pos.max() >= len(us) or not np.array_equal(us[pos], uids[ridx])
                ):
                    raise ValueError(
                        "vsig sidecar is missing candidate uids — it must be "
                        "built from the same signature table as the exchange"
                    )
                qrows = qm[pos]
            lookup = np.full(n, -1, dtype=np.int64)
            lookup[ridx] = np.arange(len(ridx))
            vm = np.flatnonzero(is_member & vsel)
            vh = hub_per_row[vm]
            est = (qrows[lookup[vm]] == qrows[lookup[vh]]).mean(axis=1)
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
                gvs = qrows[lookup[lo : lo + sizes[gi]]]
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
                        "key": pa.array(np.zeros(ne, dtype=np.int64)),
                        "kind": pa.array(["edge"] * ne, type=pa.string()),
                        "a": pa.array(uids[ai], type=pa.int64()),
                        "b": pa.array(uids[bi], type=pa.int64()),
                        "est": pa.array(ee, type=pa.float64()),
                        "branch": pa.array(branch[bi], type=pa.int8()),
                        "vsig": _empty_binary(ne),
                    }
                )
            )

        if len(salted_gkeys):
            sg = g[starts].view(np.uint64)
            pos = np.searchsorted(salted_gkeys, sg)
            pos_c = np.minimum(pos, len(salted_gkeys) - 1)
            is_salted = (pos < len(salted_gkeys)) & (salted_gkeys[pos_c] == sg)
            rep_gi = np.flatnonzero(is_salted)
            if len(rep_gi):
                rep_idx = starts[rep_gi]
                orig_keys = salted_orig[pos_c[rep_gi]]
                # cast to plain binary to match the grouped schema (rep rows
                # are hot-bucket hubs only — far under the int32 offset limit)
                rep_vsig = (
                    pc.cast(t["vsig"].take(pa.array(rep_idx)), pa.binary())
                    if row_vsig
                    else _empty_binary(len(rep_idx))
                )
                tables.append(
                    pa.table(
                        {
                            "key": pa.array(orig_keys, type=pa.int64()),
                            "kind": pa.array(["rep"] * len(rep_idx), type=pa.string()),
                            "a": pa.array(uids[rep_idx], type=pa.int64()),
                            "b": pa.array(
                                np.zeros(len(rep_idx), dtype=np.int64)
                            ),
                            "est": pa.array(
                                np.zeros(len(rep_idx)), type=pa.float64()
                            ),
                            "branch": pa.array(
                                branch[rep_idx].astype(np.int8), type=pa.int8()
                            ),
                            "vsig": rep_vsig,
                        }
                    )
                )

        if not tables:
            return _empty_grouped_table()
        out = pa.concat_tables(tables)
        return out.cast(_empty_grouped_table().schema)

    return grouper


_METHOD_LUT = np.array(
    [BRANCH_METHOD[i] for i in range(len(BRANCH_METHOD))], dtype=object
)


def _stamp_edges(t: pa.Table) -> pa.Table:
    """grouped rows → uid-pair edge rows with the method name stamped on."""
    t = t.filter(pc.equal(t["kind"], "edge"))
    branch = t["branch"].to_numpy(zero_copy_only=False)
    methods = pa.array(_METHOD_LUT[branch], type=pa.string())
    return pa.table(
        {"a": t["a"], "b": t["b"], "est": t["est"], "method": methods}
    )


def unified_star_edges_uid(
    sig_ds: "ray.data.Dataset", cfg: DedupConfig
) -> "ray.data.Dataset":
    """Signature table → uid-pair edges for all enabled star branches via one
    shuffle.

    Skew handling: hot-bucket detection from a SAMPLE of the signature table
    (cheap — the expander runs over ``hot_sample_frac`` of the docs), then
    ONE fused expand+salt pass feeds the partitioning sort directly: the
    17+-rows/doc candidate set is never materialized as a standalone dataset
    and never walked twice (the un-fused predecessor spent a full
    materialization plus a 54M-row salting pass here at 1.2M docs).
    """
    import os as _os
    import sys as _sys
    import time as _time

    _stats = _os.environ.get("CAMDEN_STAGE_STATS")
    P = default_partitions(cfg)
    _t0 = _time.monotonic()
    # sketch transport mode: broadcast sidecar (vp bytes/doc in every node's
    # object store — the fast path) below vsig_broadcast_max_docs, per-row
    # co-shuffle above it (no broadcast state; the exchange carries vp bytes
    # on each minhash row instead)
    carry_vsig = False
    if "minhash" in cfg.methods:  # short-circuit: don't execute a lazy
        try:  # pipeline just to count docs when no sketches are needed
            carry_vsig = sig_ds.count() > cfg.vsig_broadcast_max_docs
        except Exception:
            carry_vsig = False
    # hot-bucket detection and the sidecar build are independent passes over
    # the signature table — overlap them (each is cluster-tasks + a driver
    # merge; two driver threads just interleave the waits)
    def _timed(name, f, *a):
        t0 = _time.monotonic()
        out = f(*a)
        if _stats:
            print(f"== star: {name} {_time.monotonic()-t0:.2f}s", file=_sys.stderr)
        return out

    if "minhash" in cfg.methods and not carry_vsig:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            hot_f = pool.submit(_timed, "hot", hot_bucket_keys_from_sig, sig_ds, cfg)
            vsig_f = pool.submit(_timed, "vsig", build_vsig_sidecar, sig_ds, cfg)
            hot_keys = hot_f.result()
            vsig_ref = vsig_f.result()
    else:
        hot_keys = hot_bucket_keys_from_sig(sig_ds, cfg)
        vsig_ref = None
    if _stats:
        print(f"== star: hot+vsig {_time.monotonic()-_t0:.2f}s", file=_sys.stderr)
        _t0 = _time.monotonic()
    hot_ref = ray.put(_hot_array(hot_keys))
    smap = salted_gkey_map(hot_keys, cfg)
    # expander fused into the exchange map side (map_fn): the ~45-rows/doc
    # candidate set goes straight from each map task's heap into its slices —
    # it never exists as a materialized dataset (7.4 GB at 3M docs)
    grouped = partition_map(
        sig_ds, P,
        make_unified_partition_grouper(cfg, salted_map=smap, vsig_ref=vsig_ref),
        map_fn=make_unified_star_expander(
            cfg, hot_ref=hot_ref, num_partitions=P, carry_vsig=carry_vsig
        ),
    )
    grouped = grouped.materialize()
    if _stats:
        print(f"== star: exchange {_time.monotonic()-_t0:.2f}s (P={P})", file=_sys.stderr)
    edges = grouped.map_batches(_stamp_edges, batch_format="pyarrow")
    if not hot_keys:
        return edges  # no skew detected → no salted sub-buckets to re-link

    def rep_rows_fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "rep"))
        return pa.table(
            {
                "gkey": t["key"],  # original (pre-salt) bucket key
                "uid": t["a"],
                "branch": t["branch"],
                # co-shuffle mode: the sub-hub's sketch rides its rep row so
                # the re-link grouper can verify hub pairs without a sidecar
                "vsig": t["vsig"],
                "pkey": pa.array([0] * len(t), type=pa.int64()),
            }
        )

    rep_rows = grouped.map_batches(rep_rows_fn, batch_format="pyarrow")
    rep_grouped = partition_map(
        rep_rows, 1,
        make_unified_partition_grouper(cfg, salted_map=None, vsig_ref=vsig_ref),
    )
    rep_edges = rep_grouped.map_batches(_stamp_edges, batch_format="pyarrow")
    return edges.union(rep_edges)


def unified_star_edges(
    sig_ds: "ray.data.Dataset", cfg: DedupConfig
) -> "ray.data.Dataset":
    """url-pair view of :func:`unified_star_edges_uid` (public edge schema)."""
    return resolve_edge_urls(unified_star_edges_uid(sig_ds, cfg), sig_ds, cfg)


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
        uid_col = t["uid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gkey": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "uid": pa.array(np.repeat(uid_col, B * B), type=pa.int64()),
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
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "est": pa.array([], type=pa.float64()),
            }
        )
        n = len(t)
        if n < 2:
            return empty
        t = t.combine_chunks()  # multi-key sort over the reduce concat's
        # chunks is 2.5x the contiguous sort — see the unified grouper
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("gkey", "ascending"),
                ("simhash", "ascending"),
                ("uid", "ascending"),
            ],
        )
        t = t.take(order)
        g = t["gkey"].to_numpy()
        shs = t["simhash"].to_numpy().view(np.uint64)
        uids = t["uid"].to_numpy()
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
        ua, ub = uids[ii], uids[jj]
        # canonical a < b ordering (int uids)
        return pa.table(
            {
                "a": pa.array(np.minimum(ua, ub), type=pa.int64()),
                "b": pa.array(np.maximum(ua, ub), type=pa.int64()),
                "est": pa.array(1.0 - hv / bits, type=pa.float64()),
            }
        )

    return grouper


def simhash_edges_uid(
    sig_ds: "ray.data.Dataset", cfg: DedupConfig
) -> "ray.data.Dataset":
    """Signature table → uid-pair simhash edges (pigeonhole shuffle)."""
    P = np.uint64(default_partitions(cfg))
    expander = make_simhash_expander(cfg)

    def expand_with_pkey(t: pa.Table) -> pa.Table:
        t = expander(t)
        k = t["gkey"].to_numpy(zero_copy_only=False).view(np.uint64)
        pkey = (mix64(k ^ _PKEY_MIX) % P).view(np.int64)
        return t.append_column("pkey", pa.array(pkey, type=pa.int64()))

    grouped = partition_map(
        sig_ds,
        int(P),
        make_simhash_partition_grouper(cfg),
        map_fn=expand_with_pkey,
    )

    def stamp(t: pa.Table) -> pa.Table:
        return t.append_column("method", pa.array(["simhash"] * len(t), type=pa.string()))

    return grouped.map_batches(stamp, batch_format="pyarrow")


def simhash_edges(sig_ds: "ray.data.Dataset", cfg: DedupConfig) -> "ray.data.Dataset":
    """url-pair view of :func:`simhash_edges_uid` (public edge schema)."""
    return resolve_edge_urls(simhash_edges_uid(sig_ds, cfg), sig_ds, cfg)


# ---------------------------------------------------------------------------
# uid → url edge resolution
# ---------------------------------------------------------------------------


def resolve_edge_urls(
    edges: "ray.data.Dataset",
    sig_ds: "ray.data.Dataset",
    cfg: DedupConfig,
    endpoint_cap: int | None = None,
) -> "ray.data.Dataset":
    """uid-pair edges → url-pair edges (the public EDGE_SCHEMA).

    The endpoint set is EDGE-sized (≪ corpus): distinct endpoint uids are
    collected on the driver (ints only), broadcast once to semi-join the
    signature table down to the referenced (uid, url) rows, and the edge
    batches are mapped through a sorted-array ``searchsorted`` gather.
    Output pairs are re-canonicalized to ``a < b`` BY URL so the public edge
    schema keeps its deterministic ordering contract.

    Above ``endpoint_cap`` distinct endpoints (default: the same
    driver-memory bar as ``driver_unionfind_max_edges``) the driver
    collection is skipped and resolution runs as two co-hash-partitioned
    searchsorted merges against the full (uid, url) table — zero driver
    state, two extra candidate-sized shuffles.
    """
    cap = endpoint_cap if endpoint_cap is not None else cfg.driver_unionfind_max_edges
    P = default_partitions(cfg)

    uid_chunks: list[np.ndarray] = []
    n_seen = 0
    over = False
    # endpoint-denominated cap: ``cap`` bounds EDGES for the driver union-find,
    # and each edge contributes at most 2 distinct endpoints — so up to 2*cap
    # unique endpoint uids are within the same driver-memory budget. The
    # running bound sums per-batch UNIQUE counts (an upper bound on the global
    # unique count), not raw occurrences: the old occurrence count tripped the
    # scale path at cap/2 edges even when the endpoint set was tiny.
    for b in edges.select_columns(["a", "b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        ab = np.concatenate(
            [
                b["a"].to_numpy(zero_copy_only=False),
                b["b"].to_numpy(zero_copy_only=False),
            ]
        )
        chunk = np.unique(ab)
        uid_chunks.append(chunk)
        n_seen += len(chunk)
        if n_seen > 2 * cap:
            over = True
            break
    if over:
        return _resolve_edges_copartition(edges, sig_ds, P)

    if not uid_chunks:
        need = np.empty(0, dtype=np.int64)
    else:
        need = np.unique(np.concatenate(uid_chunks))
    need_ref = ray.put(need)

    def pick(t: pa.Table) -> pa.Table:
        m = np.isin(t["uid"].to_numpy(zero_copy_only=False), ray.get(need_ref))
        mt = t.filter(pa.array(m))
        return pa.table({"uid": mt["uid"], "url": mt["url"]})

    tabs = ray.get(
        sig_ds.select_columns(["uid", "url"])
        .map_batches(pick, batch_format="pyarrow")
        .to_arrow_refs()
    )
    tabs = [t for t in tabs if t.num_rows]
    if tabs:
        lk = pa.concat_tables(tabs).combine_chunks()
        # deterministic under a (vanishingly unlikely) uid collision: sort by
        # (uid, url) and keep the first url per uid
        order = pc.sort_indices(
            lk, sort_keys=[("uid", "ascending"), ("url", "ascending")]
        )
        lk = lk.take(order)
        uids = lk["uid"].to_numpy()
        first = np.r_[True, uids[1:] != uids[:-1]]
        lk = lk.filter(pa.array(first))
        uids = lk["uid"].to_numpy()
        urls = lk["url"].combine_chunks() if isinstance(lk["url"], pa.ChunkedArray) else lk["url"]
    else:
        uids = np.empty(0, dtype=np.int64)
        urls = pa.array([], type=pa.string())
    lut_ref = ray.put(pa.table({"uid": pa.array(uids, type=pa.int64()), "url": urls}))

    def resolve(t: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)  # zero-copy Arrow from the local object store
        lu = lut["uid"].to_numpy()
        lurl = lut["url"]
        if isinstance(lurl, pa.ChunkedArray):
            lurl = lurl.combine_chunks()
        ia = np.searchsorted(lu, t["a"].to_numpy(zero_copy_only=False))
        ib = np.searchsorted(lu, t["b"].to_numpy(zero_copy_only=False))
        ua = lurl.take(pa.array(ia))
        ub = lurl.take(pa.array(ib))
        return pa.table(
            {
                "a": pc.min_element_wise(ua, ub),
                "b": pc.max_element_wise(ua, ub),
                "est": t["est"],
                "method": t["method"],
            }
        )

    return edges.map_batches(resolve, batch_format="pyarrow")


def _resolve_edges_copartition(
    edges: "ray.data.Dataset", sig_ds: "ray.data.Dataset", P: int
) -> "ray.data.Dataset":
    """Scale-path resolution: attach endpoint urls with two co-partitioned
    searchsorted merges (no driver-side endpoint set)."""

    dims = sig_ds.select_columns(["uid", "url"])

    def attach(rows: "ray.data.Dataset", key: str, out: str) -> "ray.data.Dataset":
        def tag_fact(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False)
            pk = (mix64(k.view(np.uint64) ^ _PKEY_MIX) % np.uint64(P)).view(np.int64)
            cols = {c: t[c] for c in t.column_names}
            cols["__k"] = t[key]
            cols["__url"] = pa.nulls(len(t), type=pa.string())
            cols["__is_dim"] = pa.array(np.zeros(len(t), dtype=bool))
            cols["pkey"] = pa.array(pk, type=pa.int64())
            return pa.table(cols)

        fact_schema: list = []

        def tag_dim(t: pa.Table) -> pa.Table:
            k = t["uid"].to_numpy(zero_copy_only=False)
            pk = (mix64(k.view(np.uint64) ^ _PKEY_MIX) % np.uint64(P)).view(np.int64)
            cols = {}
            for name, typ in fact_schema:
                cols[name] = pa.nulls(len(t), type=typ)
            cols["__k"] = t["uid"]
            cols["__url"] = t["url"]
            cols["__is_dim"] = pa.array(np.ones(len(t), dtype=bool))
            cols["pkey"] = pa.array(pk, type=pa.int64())
            return pa.table(cols)

        # fact columns (minus the tag columns) for dim-side null fill
        sch = rows.schema()
        fact_schema.extend(zip(sch.names, sch.types))

        def merge(t: pa.Table) -> pa.Table:
            is_dim = t["__is_dim"].to_numpy(zero_copy_only=False)
            k = t["__k"].to_numpy(zero_copy_only=False)
            dk = k[is_dim]
            order = np.argsort(dk, kind="stable")
            dk = dk[order]
            durl = t["__url"].filter(pa.array(is_dim)).take(pa.array(order))
            ft = t.filter(pa.array(~is_dim))
            fk = k[~is_dim]
            if len(dk) == 0:
                ft = ft.slice(0, 0)
                attached = pa.array([], type=pa.string())
            else:
                pos = np.searchsorted(dk, fk)
                ok = pos < len(dk)
                pos_c = np.minimum(pos, len(dk) - 1)
                ok &= dk[pos_c] == fk
                ft = ft.filter(pa.array(ok))
                attached = durl.take(pa.array(pos_c[ok]))
            cols = {
                name: ft[name] for name, _ in fact_schema if name != "pkey"
            }
            cols[out] = attached
            return pa.table(cols)

        rows_tagged = rows.map_batches(tag_fact, batch_format="pyarrow").union(
            dims.map_batches(tag_dim, batch_format="pyarrow")
        )
        return partition_map(rows_tagged, P, merge)

    with_a = attach(edges, "a", "__a_url")
    with_b = attach(with_a, "b", "__b_url")

    def finish(t: pa.Table) -> pa.Table:
        ua = t["__a_url"]
        ub = t["__b_url"]
        return pa.table(
            {
                "a": pc.min_element_wise(ua, ub),
                "b": pc.max_element_wise(ua, ub),
                "est": t["est"],
                "method": t["method"],
            }
        )

    return with_b.map_batches(finish, batch_format="pyarrow")
