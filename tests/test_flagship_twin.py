"""Flagship oracle-twin invariants (doc_dedup_clusters).

The hash-exact DuckDB comparison lives in the driver gate /
tools/check_correctness.py; these tests pin the structural contract so a
refactor that breaks representative or coverage semantics fails fast.
"""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _flagship_df() -> pd.DataFrame:
    from camden_ray.pipelines.queries import doc_dedup_clusters

    res = doc_dedup_clusters(SF)
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_flagship_covers_every_doc_once(ray_session):
    import pyarrow.parquet as pq

    df = _flagship_df()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(df) == n_docs
    assert df.url.is_unique


def test_flagship_min_url_representative(ray_session):
    df = _flagship_df()
    # representative = lexicographic min url of the cluster, so cluster_id
    # is never greater than any member url and appears as a member itself
    assert (df.cluster_id <= df.url).all()
    members = set(df.url)
    assert set(df.cluster_id) <= members
    assert (df.is_representative == (df.url == df.cluster_id)).all()
    # min url within each observed cluster equals the cluster id
    got = df.groupby("cluster_id").url.min()
    assert (got.index == got.values).all()


def test_flagship_refines_per_method_chains(ray_session):
    """More edge sources can only MERGE clusters: any pair co-clustered by
    the minhash-only or simhash-only chain must be co-clustered by the
    flagship union."""
    from camden_ray.pipelines.queries import (
        doc_minhash_clusters,
        doc_simhash_clusters,
    )

    df = _flagship_df()
    flag = dict(zip(df.url, df.cluster_id))
    for sub in (doc_minhash_clusters(SF), doc_simhash_clusters(SF)):
        sdf = sub.to_pandas() if hasattr(sub, "to_pandas") else sub
        for cid, grp in sdf.groupby("cluster_id"):
            urls = list(grp.url)
            assert len({flag[u] for u in urls}) == 1, (
                f"method cluster {cid} split by flagship"
            )


def test_attach_coshuffle_parity_with_broadcast(ray_session):
    """The above-cap hash_join attach regime must produce exactly the
    broadcast regime's output (cap forced to 0 routes everything through
    the distributed left join)."""
    import pyarrow as pa
    import ray

    from camden_ray.pipelines.queries import _attach_cluster_ids

    urls = [f"doc://{i}" for i in range(50)]
    tab = pa.table(
        {
            "url": pa.array(urls[10:30], type=pa.large_string()),
            "cluster_id": pa.array(
                [urls[10]] * 10 + [urls[20]] * 10, type=pa.large_string()
            ),
        }
    )
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    a = (
        _attach_cluster_ids(ds, tab)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    b = (
        _attach_cluster_ids(ds, tab, broadcast_max_rows=0)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a[~a.url.isin(urls[10:30])].cluster_id
            == a[~a.url.isin(urls[10:30])].url).all()
