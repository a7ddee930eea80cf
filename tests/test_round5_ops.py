"""Structural invariants for the round-5 registry additions (the hash-exact
DuckDB comparison lives in tools/check_correctness.py)."""

from __future__ import annotations

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_hopping_windows_replication_invariant(ray_session):
    """Every non-null-ts event lands in exactly width/hop = 3 windows."""
    from camden_ray.pipelines.queries import _HOP_K, events_hopping_windows

    df = events_hopping_windows(SF).to_pandas()
    n_events = pq.read_table(SF + "/events.parquet", columns=["ts"])
    n_valid = n_events.num_rows - n_events["ts"].null_count
    assert df.n_events.sum() == _HOP_K * n_valid
    # window starts are hop-aligned
    from camden_ray.pipelines.queries import _HOP_US

    assert (df.win_start_us % _HOP_US == 0).all()


def test_embedding_gram_symmetry_and_diagonal(ray_session):
    """Upper triangle covers d(d+1)/2 cells; the diagonal is a sum of
    squares (non-negative) and dominates by Cauchy-Schwarz."""
    from camden_ray.pipelines.queries import embedding_gram

    df = embedding_gram(SF).to_pandas()
    d = df.dim_i.max()
    assert len(df) == d * (d + 1) // 2
    assert (df.dim_i <= df.dim_j).all()
    diag = df[df.dim_i == df.dim_j].set_index("dim_i").sxy_fp
    assert (diag >= 0).all()
    off = df[df.dim_i != df.dim_j]
    # |G_ij| <= sqrt(G_ii * G_jj)
    import numpy as np

    bound = np.sqrt(diag.loc[off.dim_i].values.astype(float)
                    * diag.loc[off.dim_j].values.astype(float))
    assert (np.abs(off.sxy_fp.values.astype(float)) <= bound + 1).all()


def test_bpe_pretokens_at_least_ws_tokens(ray_session):
    """The pretokenizer splits at least as finely as whitespace."""
    from camden_ray.pipelines.queries import (
        doc_bpe_token_counts,
        doc_token_counts,
    )

    bpe = doc_bpe_token_counts(SF).to_pandas().set_index("doc_id")
    ws = doc_token_counts(SF).to_pandas().set_index("doc_id")
    j = bpe.join(ws)
    assert (j.n_pretokens >= j.n_ws_tokens).all()


def test_dup_histogram_partitions_the_corpus(ray_session):
    """Cluster sizes weighted by multiplicity must sum to the doc count
    (clusters partition the corpus; singletons included)."""
    from camden_ray.pipelines.queries import dup_group_size_histogram

    df = dup_group_size_histogram(SF).to_pandas()
    n_docs = pq.read_metadata(SF + "/documents.parquet").num_rows
    assert int((df.cluster_size * df.n_clusters).sum()) == n_docs
    assert (df.cluster_size >= 1).all() and (df.n_clusters >= 1).all()
