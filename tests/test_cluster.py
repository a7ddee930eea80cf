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


def test_doc_exact_ngram_clusters_matches_bruteforce(ray_session):
    """doc_exact_ngram_clusters (the fully-DuckDB-oracled clustering query)
    against an independent in-process reference: Python union-find over
    text-equality duplicate pairs ∪ the oracle-passing exact-Jaccard ≥ 0.5
    pairs, representatives = component min url. Pins the same semantics the
    recursive-CTE oracle checks, without DuckDB in the loop."""
    import pyarrow.parquet as pq

    from camden_ray.pipelines.queries import (
        doc_exact_ngram_clusters,
        doc_ngram_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.001"
    got = doc_exact_ngram_clusters(sf).to_pandas()

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    urls = [f"doc://{i}" for i in docs["doc_id"].to_pylist()]
    texts = docs["text"].to_pylist()
    by_text: dict[str, list[str]] = {}
    for u, t in zip(urls, texts):
        by_text.setdefault(t or "", []).append(u)
    pairs = set()
    for members in by_text.values():
        members.sort()
        pairs.update((members[0], m) for m in members[1:])
    jac = doc_ngram_jaccard_pairs(sf).to_pandas()
    pairs.update(zip(jac["a"], jac["b"]))
    assert pairs, "fixture must produce at least one deterministic edge"

    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    want = uf.assignments()

    assert dict(zip(got["url"], got["cluster_id"])) == want
    # every emitted cluster is non-trivial and its id is a member min
    sizes = got.groupby("cluster_id").size()
    assert (sizes >= 2).all()
    assert (got.groupby("cluster_id")["url"].min() == sizes.index).all()
