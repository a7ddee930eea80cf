"""Distributed hash equi-join on the engine's one shuffle primitive.

``hash_join`` is the first-class, duplicate-tolerant generalization of the
three bespoke co-partition merges the engine grew (``cluster.
_copartition_lookup``, ``incremental._remap_endpoint_col``, ``spantrim.
attach_dense_ranks``): both sides are tagged, unioned, hash-partitioned on
the key via :func:`camden_ray.stages.candidates.partition_map`, and each
partition resolves matches with one vectorized sort + ``searchsorted`` range
expansion — never ``ray.data.Dataset.join`` (which mis-resolves key fields
when join operators chain in ray 2.49; see SURVEY.md §8) and never a driver-
side map.

Design points concentrated here (the pitfalls the bespoke copies each had to
re-learn):

- **Null-bearing int64 keys**: Arrow's ``to_numpy`` converts them to float64
  + NaN, silently rounding 64-bit values — keys are null-masked first and
  null keys never match (SQL semantics), so ``fill_null(0)`` is safe.
- **Hash-range + exact verify**: string keys partition and range-match on a
  64-bit polynomial hash, then verify actual string equality inside the
  candidate range — a hash collision cannot produce a false match. Integer
  keys are their own ids (exact by construction).
- **Duplicate keys on BOTH sides** expand to the per-key cross product
  (true join semantics), vectorized via repeat/arange — no per-row loop.
- **Chunked arrays** are combined once per partition before kernels that
  require contiguity.
- **Schema-less zero-row blocks** (Ray groupby/map_batches empty outputs)
  normalize to typed empties on both the tag and merge sides.

Reference lineage: generalizes the reference's single hash-grouping reduce
(camden ``src/scanner.rs:17-49``) to two-sided keyed co-location.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from camden_ray.functions.hashing import mix64

_JOIN_MIX = np.uint64(0x9E3779B97F4A7C15)


def _combined(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _key_ids_masked(col) -> tuple[np.ndarray, np.ndarray]:
    """(ids, valid): 64-bit ids for a key column plus its non-null mask.
    Null slots get id 0 but are excluded from matching by the mask."""
    from camden_ray.functions.hashing import hash_string_column

    col = _combined(col)
    valid = np.ones(len(col), dtype=bool)
    if col.null_count:
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(col.type):
        if col.type != pa.int64():
            col = col.cast(pa.int64())
        if col.null_count:
            col = pc.fill_null(col, 0)
        return col.to_numpy(zero_copy_only=False).view(np.uint64), valid
    if col.null_count:
        col = pc.fill_null(col, "")
    return hash_string_column(col), valid


def _empty_like(schema: pa.Schema) -> pa.Table:
    return pa.table(
        {f.name: pa.array([], type=f.type) for f in schema}
    )


def hash_join(
    left,
    right,
    on: str,
    how: str = "inner",
    num_partitions: int = 64,
    suffix: str = "_r",
    right_unique_by: str | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Join two Datasets on one key column (int or string).

    ``how``: ``inner`` | ``left`` | ``semi`` | ``anti``. ``semi``/``anti``
    emit left columns only (one row per left row, no expansion); ``left``
    emits unmatched left rows with null right columns; duplicate keys
    expand combinatorially per partition (bounded by per-key multiplicity —
    salt upstream if a key is pathologically hot). Right payload columns
    whose names clash with left columns are renamed with ``suffix``.
    Null join keys never match (SQL semantics): they are dropped from the
    right side and from ``inner``/``semi`` output, and survive as
    unmatched rows under ``left``/``anti``.

    ``right_unique_by``: dedupe the right side to ONE row per key — the row
    with the MINIMUM value of this column (deterministic duplicate-dim
    resolution, the ``_copartition_lookup`` contract). The dedup happens
    per-partition AFTER co-location (block-local dedup upstream could not
    see cross-block duplicates). Integer key columns only: dedup groups by
    the 64-bit key id, which for strings could merge two colliding keys and
    silently drop one key's dim row (the join's own range-match verifies
    string equality, so plain joins have no such exposure).
    """
    from camden_ray.stages.candidates import partition_map

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")

    # a fully-empty mid-pipeline Dataset reports schema() None (Ray's
    # schema-less zero-row blocks) — callers that can hit that pass hints
    lsch = left.schema() or left_schema
    rsch = right.schema() or right_schema
    if lsch is None or rsch is None:
        raise ValueError(
            "a side has no inferable schema (empty dataset?) — pass "
            "left_schema/right_schema hints"
        )
    lnames = list(lsch.names)
    if on not in lnames or on not in rsch.names:
        raise ValueError(f"key column {on!r} missing from a side")
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    # fail at plan time, not deep inside the exchange with an opaque
    # union-schema error (int and string ids hash differently — a mixed
    # pair could even mis-match silently)
    l_int = pa.types.is_integer(ltypes[on])
    if l_int != pa.types.is_integer(rtypes[on]):
        raise ValueError(
            f"key column {on!r} type mismatch: left {ltypes[on]} vs "
            f"right {rtypes[on]}"
        )
    lpay = [c for c in lnames if c != on]
    # semi/anti never emit right payload — don't ship it through the
    # exchange (null-padded wide right columns would inflate every row)
    rpay = (
        [c for c in rsch.names if c != on] if how in ("inner", "left") else []
    )
    if right_unique_by is not None and how in ("semi", "anti"):
        raise ValueError("right_unique_by is meaningless for semi/anti")
    # output names for right payload (suffix on collision with ANY left col)
    rout = {
        c: (c + suffix if c in lnames else c) for c in rpay
    }
    if len(set(rout.values()) | set(lnames)) != len(lnames) + len(rpay):
        raise ValueError("right payload names collide even after suffixing")
    if right_unique_by is not None:
        if right_unique_by not in rpay:
            raise ValueError(f"right_unique_by={right_unique_by!r} not a right payload column")
        if not pa.types.is_integer(ltypes[on]):
            raise ValueError("right_unique_by requires an integer key column")

    key_t = ltypes[on]
    out_fields = [(on, key_t)] + [(c, ltypes[c]) for c in lpay]
    if how in ("inner", "left"):
        out_fields += [(rout[c], rtypes[c]) for c in rpay]
    out_schema = pa.schema(out_fields)

    Pu = np.uint64(num_partitions)

    def _pkey(col) -> pa.Array:
        ids, _ = _key_ids_masked(col)
        return pa.array(
            (mix64(ids ^ _JOIN_MIX) % Pu).view(np.int64), type=pa.int64()
        )

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {"__k": _combined(t[on]) if on in t.column_names else pa.array([], key_t)}
        n = len(cols["__k"])
        for c in lpay:
            cols[f"__l_{c}"] = t[c] if c in t.column_names else pa.array([], ltypes[c])
        for c in rpay:
            cols[f"__r_{c}"] = pa.nulls(n, type=rtypes[c])
        cols["__side"] = pa.array(np.zeros(n, dtype=bool))
        cols["pkey"] = _pkey(cols["__k"])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {"__k": _combined(t[on]) if on in t.column_names else pa.array([], key_t)}
        n = len(cols["__k"])
        for c in lpay:
            cols[f"__l_{c}"] = pa.nulls(n, type=ltypes[c])
        for c in rpay:
            cols[f"__r_{c}"] = t[c] if c in t.column_names else pa.array([], rtypes[c])
        cols["__side"] = pa.array(np.ones(n, dtype=bool))
        cols["pkey"] = _pkey(cols["__k"])
        return pa.table(cols)

    is_str_key = not pa.types.is_integer(key_t)

    def merge(t: pa.Table) -> pa.Table:
        if "__side" not in t.column_names:  # fully-empty partition
            return _empty_like(out_schema)
        is_r = t["__side"].to_numpy(zero_copy_only=False)
        keys = _combined(t["__k"])
        ids, valid = _key_ids_masked(keys)

        r_pos = np.flatnonzero(is_r & valid)
        l_pos = np.flatnonzero(~is_r)
        l_valid = valid[l_pos]
        rids = ids[r_pos]
        order = np.argsort(rids, kind="stable")
        r_pos = r_pos[order]
        rids = rids[order]
        if right_unique_by is not None and len(rids):
            # min-value row per key: order by (key id, dedup col), keep the
            # first occurrence of each id (ids stay sorted ascending, so the
            # searchsorted below is unaffected)
            u = _combined(t[f"__r_{right_unique_by}"]).take(pa.array(r_pos))
            o2 = pc.sort_indices(
                pa.table({"i": pa.array(rids, type=pa.uint64()), "u": u}),
                sort_keys=[("i", "ascending"), ("u", "ascending")],
            ).to_numpy(zero_copy_only=False)
            rids, r_pos = rids[o2], r_pos[o2]
            first = np.r_[True, rids[1:] != rids[:-1]]
            rids, r_pos = rids[first], r_pos[first]
        lids = ids[l_pos]

        lo = np.searchsorted(rids, lids, side="left")
        hi = np.searchsorted(rids, lids, side="right")
        counts = np.where(l_valid, hi - lo, 0)
        total = int(counts.sum())
        # expand candidate ranges: left occurrence i repeats counts[i] times
        rep = np.repeat(np.arange(len(l_pos), dtype=np.int64), counts)
        cs = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=cs[1:])
        ridx = np.repeat(lo, counts) + (np.arange(total, dtype=np.int64) - np.repeat(cs[:-1], counts))
        if is_str_key and total:
            # verify true equality inside the hash range — a 64-bit string
            # collision must not fabricate a match
            lk = keys.take(pa.array(l_pos[rep]))
            rk = keys.take(pa.array(r_pos[ridx]))
            okm = pc.fill_null(pc.equal(lk, rk), False).to_numpy(
                zero_copy_only=False
            )
            rep, ridx = rep[okm], ridx[okm]

        matched = np.zeros(len(l_pos), dtype=bool)
        matched[rep] = True

        def emit(l_take: np.ndarray, r_take: np.ndarray | None) -> pa.Table:
            cols = {on: keys.take(pa.array(l_take))}
            for c in lpay:
                cols[c] = _combined(t[f"__l_{c}"]).take(pa.array(l_take))
            if how in ("inner", "left"):
                for c in rpay:
                    src = _combined(t[f"__r_{c}"])
                    if r_take is None:
                        cols[rout[c]] = pa.nulls(len(l_take), type=rtypes[c])
                    else:
                        cols[rout[c]] = src.take(pa.array(r_take))
            return pa.table(cols)

        if how == "inner":
            return emit(l_pos[rep], r_pos[ridx])
        if how == "semi":
            return emit(l_pos[matched], None)
        if how == "anti":
            return emit(l_pos[~matched], None)
        # left: matched expansion + unmatched rows with null right columns
        return pa.concat_tables(
            [emit(l_pos[rep], r_pos[ridx]), emit(l_pos[~matched], None)]
        )

    rows = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    return partition_map(rows, num_partitions, merge)
