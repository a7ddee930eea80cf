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
