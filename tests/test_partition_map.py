"""The raw map/reduce hash exchange (partition_map) — block-shape invariance.

The exchange groups fragmented upstream block sets into ~max(P, 4×CPUs) map
tasks itself (so unions of hundreds of tiny blocks need no repartition
pre-barrier); these tests pin that the grouped and ungrouped paths produce
identical partition contents, including empty partitions and fused map_fns.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from camden_ray.stages.candidates import partition_map


# NOTE: functions shipped to Ray workers must be closures (pickled by value)
# — a test-module top-level function pickles by reference and the module is
# not importable on the worker side.
def _make_ident():
    def ident(t: pa.Table) -> pa.Table:
        return t

    return ident


def _rows(ds) -> set[tuple]:
    # the exchange CONSUMES the key column (it is not delivered to fn) — the
    # fixtures carry a payload copy (pk2) to assert partition contents
    out = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        out |= set(zip(b["pk2"].to_pylist(), b["v"].to_pylist()))
    return out


def _fragmented(n_rows: int, n_blocks: int, P: int):
    rng = np.random.default_rng(7)
    v = np.arange(n_rows, dtype=np.int64)
    pkey = rng.integers(0, P, size=n_rows).astype(np.int64)
    df = pd.DataFrame({"pkey": pkey, "pk2": pkey, "v": v})
    parts = np.array_split(df, n_blocks)
    ds = ray.data.from_pandas([p.reset_index(drop=True) for p in parts])
    return ds, set(zip(pkey.tolist(), v.tolist()))


def test_grouped_fragmented_blocks_match_input(ray_session):
    # 400 tiny blocks >> max(P, 4*cpus): the grouping path engages
    P = 5
    ds, want = _fragmented(2000, 400, P)
    out = partition_map(ds, P, _make_ident())
    assert _rows(out) == want
    # each reduce BLOCK (one per partition) holds exactly one pkey's rows
    # (iter_batches would coalesce blocks, hiding the partition boundaries)
    for t in ray.get(out.to_arrow_refs()):
        assert "pkey" not in t.column_names  # key consumed by the exchange
        assert len(set(t["pk2"].to_pylist())) <= 1


def test_grouped_map_fn_runs_per_block(ray_session):
    # a fused row-expanding map_fn must see original blocks (not the concat):
    # emit one marker row per input block and count them
    P = 3
    ds, _ = _fragmented(300, 60, P)

    def expand(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pkey": pa.array([0], type=pa.int64()),
                "v": pa.array([len(t)], type=pa.int64()),
            }
        )

    out = partition_map(ds, P, _make_ident(), map_fn=expand)
    sizes = []
    for b in out.iter_batches(batch_format="pyarrow"):
        sizes.extend(b["v"].to_pylist())
    assert len(sizes) == 60  # one marker per original block
    assert sum(sizes) == 300


def test_empty_pkey_values_yield_empty_partitions(ray_session):
    P = 8
    df = pd.DataFrame({"pkey": [0, 0, 1], "pk2": [0, 0, 1], "v": [1, 2, 3]})
    out = partition_map(ray.data.from_pandas(df), P, _make_ident())
    assert _rows(out) == {(0, 1), (0, 2), (1, 3)}


def test_bundled_slices_all_regimes(ray_session):
    # the single-level exchange bundles SLICE_BUNDLE (=4) adjacent
    # partitions' slices per map-output object: pin parity across the
    # B==1 path (P <= bundle → bare-ref normalization), an exact multiple,
    # and remainder bundles, each preserving partition-block granularity
    for P in (2, 4, 9, 12):
        ds, want = _fragmented(1500, 90, P)
        out = partition_map(ds, P, _make_ident())
        assert _rows(out) == want
        tabs = ray.get(out.to_arrow_refs())
        assert len(tabs) == P
        for t in tabs:
            assert "pkey" not in t.column_names
            assert len(set(t["pk2"].to_pylist())) <= 1


def test_two_level_matches_single_level(ray_session):
    # force the hierarchical path (threshold 0) and pin parity with the
    # single-level exchange, including the one-partition last super
    # (P=7 → S=3, sub=3, locals 3/3/1 exercises num_returns=1 unwrapping)
    for P in (7, 8, 13):
        ds, want = _fragmented(3000, 120, P)
        two = partition_map(ds, P, _make_ident(), two_level_min_objects=0)
        assert _rows(two) == want
        # partition granularity is preserved: one pkey per reduce block
        tabs = ray.get(two.to_arrow_refs())
        assert len(tabs) == P
        for t in tabs:
            assert "pkey" not in t.column_names
            assert len(set(t["pk2"].to_pylist())) <= 1


def test_two_level_map_fn_and_empties(ray_session):
    # fused map_fn + empty partitions behave identically on the two-level path
    P = 6
    ds, _ = _fragmented(300, 60, P)

    def expand(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pkey": pa.array([0], type=pa.int64()),
                "v": pa.array([len(t)], type=pa.int64()),
            }
        )

    out = partition_map(ds, P, _make_ident(), map_fn=expand, two_level_min_objects=0)
    sizes = []
    for b in out.iter_batches(batch_format="pyarrow"):
        sizes.extend(b["v"].to_pylist())
    assert len(sizes) == 60 and sum(sizes) == 300


def test_two_level_object_count_is_subquadratic():
    # the planner math (no cluster needed): at P=1024 with ~P map tasks the
    # hierarchical exchange creates map×S + P objects, far below map×P
    import math

    P = 1024
    maps = P
    S = max(2, math.isqrt(P - 1) + 1)
    sub = -(-P // S)
    S = -(-P // sub)
    two_level = maps * S + P
    single = maps * P
    assert maps * P > 65_536  # the default threshold would engage
    assert two_level < single / 10
    assert two_level <= int(maps * math.sqrt(P)) + P + S
