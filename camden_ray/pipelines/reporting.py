"""Human-readable JSON report sink — the row-granular analogue of camden's
``identical_files.json`` (reference /root/reference/src/reporting.rs:42-61:
pretty JSON of every duplicate group, groups of size > 1 only).

The report is built from the ``removed`` side of the clusters table only:
``cluster_id`` IS the representative's url (min-url contract), so a
duplicate group is exactly ``[cluster_id] + its removed members`` — the
dataflow touched here is duplicate-count-sized, never corpus-sized. Rows
stream through one duplicate-sized sort and are written incrementally
(group-at-a-time), so the driver never holds the whole report in memory.
Output is deterministic: groups sorted by cluster_id, urls sorted within
each group (the reference's HashMap-order nondeterminism is deliberately
fixed, same as K1/W1 — SURVEY.md §2).
"""

from __future__ import annotations

import json
from typing import TextIO


def _emit(out: TextIO, cid: str, members: list[str], first: bool, indent: int) -> None:
    if not first:
        out.write(",\n")
    pad = " " * indent
    obj = {"cluster_id": cid, "urls": sorted([cid] + members)}
    block = json.dumps(obj, indent=indent, ensure_ascii=False)
    out.write("\n".join(pad + ln for ln in block.splitlines()))


def write_json_report(
    clusters: "ray.data.Dataset", path: str, indent: int = 2
) -> int:
    """Write every duplicate group (size > 1) in ``clusters`` as a pretty
    JSON array of ``{"cluster_id": ..., "urls": [...]}`` to ``path``.
    Returns the number of groups written."""
    import ray.data  # noqa: F401  (type reference only)

    removed = clusters.filter(expr="is_representative == False").select_columns(
        ["cluster_id", "url"]
    )
    # duplicate-sized sort: groups arrive contiguously, stream-group adjacent
    # rows across batch boundaries
    removed = removed.sort(["cluster_id", "url"])

    n_groups = 0
    with open(path, "w", encoding="utf-8") as out:
        out.write("[")
        cur_cid: str | None = None
        cur_members: list[str] = []
        for b in removed.iter_batches(batch_size=65536, batch_format="pyarrow"):
            cids = b["cluster_id"].to_pylist()
            urls = b["url"].to_pylist()
            for cid, url in zip(cids, urls):
                if cid != cur_cid:
                    if cur_cid is not None:
                        _emit(out, cur_cid, cur_members, n_groups == 0, indent)
                        n_groups += 1
                    cur_cid, cur_members = cid, []
                cur_members.append(url)
        if cur_cid is not None:
            _emit(out, cur_cid, cur_members, n_groups == 0, indent)
            n_groups += 1
        out.write("\n]" if n_groups else "]")
        out.write("\n")
    return n_groups
