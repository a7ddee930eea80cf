"""Throughput + CPU-scaling evidence for the corpus-analytics operators.

Builds a deterministic 1M-doc documents table by tiling the driver's sf0.1
fixture with doc_id offsets (doc_id uniqueness preserved; text distribution
unchanged; no external data), then times a chosen registry query over it in
THE CURRENT process's Ray session. Run it twice in fresh processes at two
num_cpus levels for a scaling pair (the SCALING.json protocol, applied to
one operator):

    python tools/bench_corpus_ops.py --cpus 8  --op doc_unigram_logprob
    python tools/bench_corpus_ops.py --cpus 32 --op doc_unigram_logprob
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TILED_BASE = "/tmp/camden_ray_docs"
SRC = "/root/testdata/sf0.1/documents.parquet"
SF_DIR = "/root/testdata/sf0.1"
DEFAULT_TILES = 200  # sf0.1 documents is 5k rows → 1M docs

# key columns to offset per tile, per table (keeps per-key group sizes and
# join fan-in CONSTANT as the corpus grows — growth adds keys, the realistic
# scale axis — instead of inflating every group/bucket). Each entry is
# (column, owner) — the offset stride comes from the OWNER table's key
# domain so foreign keys stay aligned across tables tiled independently
# (orders.o_custkey must stride by the CUSTOMER domain, not its own max).
_TILE_OFFSETS = {
    "documents": [("doc_id", ("documents", "doc_id"))],
    "events": [("event_id", ("events", "event_id")),
               ("user_id", ("events", "user_id"))],
    "orders": [("o_orderkey", ("orders", "o_orderkey")),
               ("o_custkey", ("customer", "c_custkey"))],
    "customer": [("c_custkey", ("customer", "c_custkey"))],
}


def _domain_stride(owner: tuple) -> int:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tb, col = owner
    t = pq.read_table(os.path.join(SF_DIR, f"{tb}.parquet"), columns=[col])
    return int(pc.max(t[col]).as_py()) + 1


def ensure_tiled(tiles: int) -> str:
    """Tile sf0.1 documents ``tiles``× with offset doc_ids (5k rows per
    tile), one shard per tile (deterministic; cached per size)."""
    return ensure_tiled_table("documents", tiles)


def ensure_tiled_table(table: str, tiles: int) -> str:
    """Tile one sf0.1 table ``tiles``× with per-tile offsets on its key
    columns (deterministic; cached per (table, size))."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = TILED_BASE if table == "documents" else f"{TILED_BASE}_{table}"
    tiled_dir = f"{base}_{tiles}"
    marker = os.path.join(tiled_dir, "_done")
    if os.path.exists(marker):
        return tiled_dir
    os.makedirs(os.path.join(tiled_dir, "shards"), exist_ok=True)
    t = pq.read_table(os.path.join(SF_DIR, f"{table}.parquet"))
    n = t.num_rows
    strides = {
        col: _domain_stride(owner) for col, owner in _TILE_OFFSETS[table]
    }
    for i in range(tiles):
        shifted = t
        for col, _ in _TILE_OFFSETS[table]:
            shifted = shifted.set_column(
                shifted.schema.get_field_index(col),
                col,
                pc.add(shifted[col], i * strides[col]),
            )
        pq.write_table(
            shifted, os.path.join(tiled_dir, "shards", f"tile-{i:03d}.parquet")
        )
    with open(marker, "w") as f:
        f.write(str(tiles * n))
    return tiled_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--op", default="doc_unigram_logprob")
    ap.add_argument("--tiles", type=int, default=DEFAULT_TILES)
    ap.add_argument(
        "--tables",
        default="documents",
        help="comma list of tables to tile (documents, events, orders, "
        "customer); the op's sf_dir serves tiled versions of these and "
        "the plain sf0.1 file for any other table",
    )
    args = ap.parse_args()

    tables = [tb.strip() for tb in args.tables.split(",") if tb.strip()]
    unknown = [tb for tb in tables if tb not in _TILE_OFFSETS]
    if unknown:
        ap.error(
            f"unsupported table(s) {unknown}; tileable: "
            f"{sorted(_TILE_OFFSETS)}"
        )
    sf_dir = None
    n_docs = 0
    for tb in tables:
        tiled_dir = ensure_tiled_table(tb, args.tiles)
        # the registry reads <sf_dir>/<table>.parquet; point a symlink dir
        # at the sharded tile directory (read_parquet accepts a directory)
        if sf_dir is None:
            sf_dir = os.path.join(tiled_dir, "as_sf_" + "_".join(tables))
            os.makedirs(sf_dir, exist_ok=True)
        link = os.path.join(sf_dir, f"{tb}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(tiled_dir, "shards"), link)
        with open(os.path.join(tiled_dir, "_done")) as f:
            rows = int(f.read())
        if tb == tables[0]:
            n_docs = rows
    # non-tiled tables fall back to the plain sf0.1 files
    for fname in os.listdir(SF_DIR):
        dst = os.path.join(sf_dir, fname)
        if fname.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, fname), dst)

    import ray

    ray.init(
        address="local", num_cpus=args.cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from camden_ray.pipelines.queries import QUERIES

    import ray.data

    fn = QUERIES[args.op]
    t0 = time.monotonic()
    res = fn(sf_dir)
    # pandas DataFrames also have .count (a per-column Series) — dispatch
    # on type, not attribute presence
    rows = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    wall = time.monotonic() - t0
    print(json.dumps({
        "op": args.op, "num_cpus": args.cpus, "docs": n_docs, "rows": rows,
        "wall_s": round(wall, 3), "docs_per_sec": round(n_docs / wall, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
