"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
camden_ray) calls ray.init()/ray.shutdown().

- ``entry()``     — flagship dedup pipeline over /root/testdata/sf0.001.
- ``queries()``   — one callable per implemented operator (SURVEY.md §2),
                    each taking sf_dir.
- ``oracle_sql()``— DuckDB-equivalent SQL per SQL-expressible query; the
                    non-SQL dedup/ANN/heuristic queries get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from camden_ray.pipelines.queries import doc_dedup_clusters

    return doc_dedup_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from camden_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from camden_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
