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
DEFAULT_TILES = 200  # sf0.1 documents is 5k rows → 1M docs


def ensure_tiled(tiles: int) -> str:
    """Tile sf0.1 documents ``tiles``× with offset doc_ids (5k rows per
    tile), one shard per tile (deterministic; cached per size)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tiled_dir = f"{TILED_BASE}_{tiles}"
    marker = os.path.join(tiled_dir, "_done")
    if os.path.exists(marker):
        return tiled_dir
    os.makedirs(os.path.join(tiled_dir, "shards"), exist_ok=True)
    t = pq.read_table(SRC)
    n = t.num_rows
    for i in range(tiles):
        shifted = t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(t["doc_id"], i * n),
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
    args = ap.parse_args()

    tiled_dir = ensure_tiled(args.tiles)
    # the registry reads <sf_dir>/documents.parquet; point a symlink dir at
    # the sharded tile directory (read_parquet accepts a directory)
    sf_dir = os.path.join(tiled_dir, "as_sf")
    os.makedirs(sf_dir, exist_ok=True)
    link = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(tiled_dir, "shards"), link)

    import ray

    ray.init(
        address="local", num_cpus=args.cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from camden_ray.pipelines.queries import QUERIES

    with open(os.path.join(tiled_dir, "_done")) as f:
        n_docs = int(f.read())
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
