"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 alongside its ``oracle_sql()`` via
DuckDB; compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    s = df.astype(str).to_csv(index=False)
    return hashlib.md5(s.encode()).hexdigest()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only, {wall:.1f}s)")
            continue
        want = normalize(con.execute(oracles[name]).fetchdf())
        problems = []
        if len(mine) != len(want):
            problems.append(f"rows {len(mine)} != {len(want)}")
        if list(mine.columns) != list(want.columns):
            problems.append(f"cols {list(mine.columns)} != {list(want.columns)}")
        elif value_hash(mine) != value_hash(want):
            problems.append("value hash mismatch")
            diff = mine.compare(want) if len(mine) == len(want) else None
            if diff is not None and not diff.empty:
                problems.append(f"first diffs:\n{diff.head(3)}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: rows={len(mine)} ({wall:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
