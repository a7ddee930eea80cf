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
