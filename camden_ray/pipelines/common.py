"""Shared helpers for the driver-contract query library."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    """Column-pruned parquet read (SURVEY.md 'prune at the read')."""
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns)


def cents(arr, scale: int = 100):
    """double → fixed-point bigint, DuckDB-compatible rounding (half away
    from zero, vs pyarrow's default half-to-even)."""
    return pc.cast(
        pc.round(pc.multiply(arr, scale), round_mode="half_towards_infinity"),
        pa.int64(),
    )
