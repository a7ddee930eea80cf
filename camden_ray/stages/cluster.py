"""Clustering: verified dup-pair edges → connected components → assignments.

The reference's analogue is trivially its ``HashMap<u64, Vec<PathBuf>>``
grouping (/root/reference/src/scanner.rs:22-23) — single-method, so groups ARE
components. With four candidate methods (exact/minhash/simhash/substring) the
edge sets must be unioned and transitively closed.

Two implementations behind one interface:

* :func:`unionfind_assignments` — driver-side union-find fed by streaming
  ``iter_batches`` over the (tiny relative to input) edge Dataset. Used when
  the edge count fits ``cfg.driver_unionfind_max_edges``.
* :func:`hash_to_min_components` — distributed min-label propagation in
  alternating groupby rounds (Rastogi et al. 2013 "hash-to-min" shape) for
  edge sets too large for any single machine. O(log d) rounds.

Cluster id = lexicographic min url of the component (deterministic
representative — replaces camden's arrival-order keep-first,
/root/reference/src/operations.rs:50).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min


class UnionFind:
    """Path-halving union-find over string keys, min-root ordering."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.nodes: set[str] = set()

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        self.nodes.add(a)
        self.nodes.add(b)
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def assignments(self) -> dict[str, str]:
        """url → component root, for EVERY node ever seen (roots included)."""
        return {x: self.find(x) for x in self.nodes}


def unionfind_assignments(edges: "ray.data.Dataset") -> dict[str, str]:
    """Stream edge batches to a driver union-find; returns url → cluster_id
    for every url that appears in an edge (non-edge urls are singletons)."""
    uf = UnionFind()
    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            uf.union(a, b)
    return uf.assignments()


def hash_to_min_components(
    edges: "ray.data.Dataset", max_iter: int = 12
) -> "ray.data.Dataset":
    """Distributed connected components over (a, b) string edges.

    Iterative min-label propagation: labels L(v) start at v; each round every
    edge proposes min(L(a), L(b)) to both endpoints via a groupby-Min shuffle;
    converged when a round changes nothing. Returns Dataset (url, cluster_id)
    for nodes appearing in edges.

    This is the scale path (no driver state); rounds = O(graph diameter),
    which for dup clusters (star-shaped around hubs) is small.
    """

    def to_directed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        )

    graph = edges.select_columns(["a", "b"]).map_batches(
        to_directed, batch_format="pyarrow"
    ).materialize()

    # labels(node,label) initialised to identity over distinct nodes
    labels = (
        graph.groupby("src")
        .aggregate(Min("dst", alias_name="nmin"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["src"],
                    "label": pa.compute.min_element_wise(t["src"], t["nmin"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(max_iter):
        # join labels onto edges by broadcasting via groupby: rows
        # (node, peer) ∪ (node→label) grouped per node propose label to peers
        lab_rows = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "payload": t["label"], "is_label": pa.array([True] * len(t))}),
            batch_format="pyarrow",
        )
        edge_rows = graph.map_batches(
            lambda t: pa.table({"src": t["src"], "payload": t["dst"], "is_label": pa.array([False] * len(t))}),
            batch_format="pyarrow",
        )

        def propagate(df: pd.DataFrame) -> pd.DataFrame:
            own = df.loc[df["is_label"], "payload"]
            label = own.min() if len(own) else df["src"].iloc[0]
            peers = df.loc[~df["is_label"], "payload"]
            nodes = peers.tolist() + [df["src"].iloc[0]]
            return pd.DataFrame({"node": nodes, "cand": [label] * len(nodes)})

        proposed = (
            lab_rows.union(edge_rows)
            .groupby("src")
            .map_groups(propagate, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
        ).materialize()

        # converged? compare aggregate fingerprint of labels
        old = labels.map_batches(
            lambda t: pa.table({"h": [int(pa.compute.sum(pa.compute.binary_length(t["label"]).cast(pa.int64())).as_py() or 0)], "n": [len(t)]}),
            batch_format="pyarrow",
        ).to_pandas()
        new = proposed.map_batches(
            lambda t: pa.table({"h": [int(pa.compute.sum(pa.compute.binary_length(t["label"]).cast(pa.int64())).as_py() or 0)], "n": [len(t)]}),
            batch_format="pyarrow",
        ).to_pandas()
        labels = proposed
        if old["h"].sum() == new["h"].sum() and old["n"].sum() == new["n"].sum():
            break

    return labels.map_batches(
        lambda t: pa.table({"url": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def make_assigner(assign_ref: "ray.ObjectRef"):
    """map_batches fn: stamp cluster assignments onto url rows.

    The assignment map (url → cluster_id, only for urls in some component) is
    broadcast ONCE via ``ray.put``; each task reads it from the local object
    store (zero-copy for the dict's buffer, one fetch per node) — never
    re-shipped per batch. Singletons cluster to themselves.
    """
    cache: dict[int, dict[str, str]] = {}

    def assign(t: pa.Table) -> pa.Table:
        amap = cache.setdefault(0, None) or ray.get(assign_ref)
        cache[0] = amap
        urls = t["url"].to_pylist()
        cids = [amap.get(u, u) for u in urls]
        reps = [c == u for u, c in zip(urls, cids)]
        out = t.append_column("cluster_id", pa.array(cids, type=pa.string()))
        return out.append_column("is_representative", pa.array(reps, type=pa.bool_()))

    return assign
