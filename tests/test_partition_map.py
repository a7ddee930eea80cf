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
    out = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        out |= set(zip(b["pkey"].to_pylist(), b["v"].to_pylist()))
    return out


def _fragmented(n_rows: int, n_blocks: int, P: int):
    rng = np.random.default_rng(7)
    v = np.arange(n_rows, dtype=np.int64)
    pkey = rng.integers(0, P, size=n_rows).astype(np.int64)
    df = pd.DataFrame({"pkey": pkey, "v": v})
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
        assert len(set(t["pkey"].to_pylist())) <= 1


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
    df = pd.DataFrame({"pkey": [0, 0, 1], "v": [1, 2, 3]})
    out = partition_map(ray.data.from_pandas(df), P, _make_ident())
    assert _rows(out) == {(0, 1), (0, 2), (1, 3)}
