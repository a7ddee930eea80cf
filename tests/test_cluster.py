"""Union-find + distributed hash-to-min connected components."""

import pandas as pd
import ray.data

from camden_ray.stages.cluster import (
    UnionFind,
    hash_to_min_components,
    unionfind_assignments,
)


def test_unionfind_min_root():
    uf = UnionFind()
    uf.union("c", "b")
    uf.union("b", "a")
    uf.union("x", "y")
    a = uf.assignments()
    assert a == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_unionfind_from_dataset():
    edges = ray.data.from_pandas(
        pd.DataFrame({"a": ["u1", "u2", "u5"], "b": ["u2", "u3", "u6"],
                      "est": [1.0] * 3, "method": ["exact"] * 3})
    )
    a = unionfind_assignments(edges)
    assert a["u1"] == a["u2"] == a["u3"] == "u1"
    assert a["u5"] == a["u6"] == "u5"


def test_hash_to_min_matches_unionfind():
    df = pd.DataFrame(
        {
            "a": ["u1", "u2", "u5", "u7", "u8"],
            "b": ["u2", "u3", "u6", "u8", "u9"],
            "est": [1.0] * 5,
            "method": ["exact"] * 5,
        }
    )
    edges = ray.data.from_pandas(df)
    want = unionfind_assignments(edges)
    got = {
        r["url"]: r["cluster_id"]
        for b in hash_to_min_components(edges).iter_batches(batch_format="pandas")
        for r in b.to_dict("records")
    }
    assert got == want


def test_unionfind_uid_random_graphs_match_reference():
    """Randomized: the single-sort uid union-find must match a classic
    pointer-chasing union-find on arbitrary edge multisets (self-loops,
    duplicates, chains, stars)."""
    import numpy as np

    from camden_ray.stages.cluster import unionfind_uid

    rng = np.random.default_rng(123)
    for trial in range(8):
        n_nodes = int(rng.integers(2, 400))
        n_edges = int(rng.integers(1, 1200))
        ids = np.unique(
            rng.integers(-(2**62), 2**62, size=n_nodes * 2, dtype=np.int64)
        )[:n_nodes]
        n_nodes = len(ids)
        a = ids[rng.integers(0, n_nodes, n_edges)]
        b = ids[rng.integers(0, n_nodes, n_edges)]

        # reference: dict union-find with min-root ordering
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(a.tolist(), b.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                if ry < rx:
                    rx, ry = ry, rx
                parent[ry] = rx
        seen = set(a.tolist()) | set(b.tolist())
        want = {x: find(x) for x in seen}

        ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
        nodes, roots = unionfind_uid(ds)
        got = dict(zip(nodes.tolist(), roots.tolist()))
        assert got == want, f"trial {trial}: mismatch"
