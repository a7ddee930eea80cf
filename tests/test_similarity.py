"""Similarity-search correctness: the LSH scale paths are gated against
their exact counterparts on the driver testdata."""

import os

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _pairs(df: pd.DataFrame) -> set[tuple[int, int]]:
    return set(zip(df["a"].astype(int), df["b"].astype(int)))


def test_embedding_near_dup_lsh_equals_exact():
    """Bucketed near-dup pairs vs the exact all-pairs query at τ=0.4: the
    32-table probe must recover the IDENTICAL pair set with identical
    fixed-point cosines (this equality is what lets the exact query's SQL
    double as the LSH query's oracle)."""
    from camden_ray.pipelines.queries import (
        embedding_near_dup,
        embedding_near_dup_lsh,
    )

    exact = embedding_near_dup(SF_DIR).to_pandas()
    got = embedding_near_dup_lsh(SF_DIR).to_pandas()
    want_pairs, got_pairs = _pairs(exact), _pairs(got)
    assert want_pairs, "fixture has no near-dup pairs at tau=0.4"
    assert got_pairs == want_pairs, (
        f"missed: {sorted(want_pairs - got_pairs)[:5]} "
        f"extra: {sorted(got_pairs - want_pairs)[:5]}"
    )
    merged = got.merge(exact, on=["a", "b"], suffixes=("_lsh", "_exact"))
    assert (merged.cos_fp_lsh == merged.cos_fp_exact).all()


def test_knn_lsh_matches_brute_force():
    """ANN top-10 for the vec_id=0 query equals exact brute-force top-10 on
    the driver tables (the 32 tables jointly cover the space at this n)."""
    from camden_ray.pipelines.queries import knn_brute_force, knn_lsh

    bf = knn_brute_force(SF_DIR).to_pandas()
    ann = knn_lsh(SF_DIR).to_pandas()
    assert list(ann.vec_id) == list(bf.vec_id)
    assert list(ann.cos_fp) == list(bf.cos_fp)


def test_exact_near_dup_delegates_above_row_cap(monkeypatch):
    """Above _EXACT_NEARDUP_MAX_ROWS the exact query must route to the LSH
    plan WITHOUT the driver-side full-table read (the cap check is
    metadata-only): pq.read_table raising proves the big-n branch never
    touches it."""
    import pyarrow.parquet as pq

    from camden_ray.pipelines import queries as q

    monkeypatch.setattr(q, "_EXACT_NEARDUP_MAX_ROWS", 0)

    real_read = pq.read_table

    def forbidden(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError("driver-side pq.read_table in the big-n branch")

    monkeypatch.setattr(pq, "read_table", forbidden)
    try:
        ds = q.embedding_near_dup(SF_DIR)
    finally:
        monkeypatch.setattr(pq, "read_table", real_read)
    got = ds.to_pandas()
    exact_pairs = _pairs(q.embedding_near_dup_lsh(SF_DIR).to_pandas())
    assert _pairs(got) == exact_pairs and len(exact_pairs) > 0


def test_minhash_pairs_bound_by_exact_jaccard(ray_session):
    """The PRODUCTION minhash path (128-perm signatures, star-salted LSH
    exchange, est-threshold verification — the registry's doc_minhash_pairs
    is now the md5-parity twin under a full SQL oracle, so this test keeps
    the production config covered): bound it by the pair-COMPLETE
    exact-Jaccard set (doc_ngram_jaccard_pairs passes the full DuckDB
    oracle): at the same τ=0.5 the estimated pair set must cover ≥ 0.99 of
    the true pairs, and most of what it emits must be real (est≥τ on 128
    perms is noisy ±, so precision is bounded loosely)."""
    from camden_ray.config import DedupConfig
    from camden_ray.pipelines.dedup import build_edges
    from camden_ray.pipelines.queries import _doc_sig, doc_ngram_jaccard_pairs

    cfg = DedupConfig(jaccard_threshold=0.5, methods=("minhash",))
    est = build_edges(_doc_sig(SF_DIR, cfg), cfg).to_pandas()
    exact = doc_ngram_jaccard_pairs(SF_DIR).to_pandas()
    est_pairs = set(zip(est["a"], est["b"]))
    true_pairs = set(zip(exact["a"], exact["b"]))
    assert true_pairs, "exact pair set must be non-empty for a meaningful bound"
    recall = len(est_pairs & true_pairs) / len(true_pairs)
    precision = len(est_pairs & true_pairs) / max(1, len(est_pairs))
    assert recall >= 0.99, f"minhash recall {recall:.4f} vs exact τ=0.5 pairs"
    assert precision >= 0.5, f"minhash precision {precision:.4f}"


def test_fingerprints_self_consistent(ray_session):
    """Two independent executions of doc_fingerprints hash-equal (the SQL
    oracle pins values; this pins engine determinism across runs)."""
    from camden_ray.pipelines.queries import doc_fingerprints

    a = doc_fingerprints(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = doc_fingerprints(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["fp"] != 0).any()


def test_knn_ivf_matches_brute_force():
    """IVF top-10 for the vec_id=0 query equals exact brute-force top-10 on
    the driver tables (the candidate-pool floor makes the probe set
    exhaustive at this n — the documented reason the exact SQL is a valid
    oracle for knn_ivf)."""
    from camden_ray.pipelines.queries import knn_brute_force, knn_ivf

    bf = knn_brute_force(SF_DIR).to_pandas()
    ivf = knn_ivf(SF_DIR).to_pandas()
    assert list(ivf.vec_id) == list(bf.vec_id)
    assert list(ivf.cos_fp) == list(bf.cos_fp)


def test_ivf_params_prune_at_scale():
    """The scale regime must actually prune (nprobe ≪ nlist) — otherwise
    knn_ivf is a flat scan wearing an index; and the driver-scale regime
    must be exhaustive (nprobe == nlist) — otherwise the exact oracle would
    be unsound."""
    from camden_ray.pipelines.queries import _ivf_params

    for n in (10, 500, 8192):
        nlist, nprobe = _ivf_params(n)
        assert nprobe == nlist, f"driver scale n={n} must probe all lists"
    for n in (10**5, 10**7, 10**9):
        nlist, nprobe = _ivf_params(n)
        assert nprobe <= max(nlist // 8, 1), (
            f"scale regime n={n} must prune: {nprobe}/{nlist}"
        )
        assert nprobe * (n / nlist) >= 8192, "candidate floor violated"


def test_source_cap_sample_matches_duckdb(ray_session):
    """Per-source quota sampling equals the windowed-SQL oracle row-for-row
    (DuckDB md5-hex ordering == the engine's big-endian digest ordering),
    and the block-local combiner never lets a source exceed its cap."""
    import duckdb

    from camden_ray.pipelines.queries import ORACLE_SQL, source_cap_sample

    df = (
        source_cap_sample(SF_DIR)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    od = (
        con.execute(ORACLE_SQL["source_cap_sample"])
        .df()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype(od["doc_id"].dtype)
    assert df.equals(od)
    assert (df.groupby("source").size() <= 5).all()


def test_bernoulli_sample_matches_duckdb(ray_session):
    """Hash-threshold Bernoulli sampling equals the oracle subset exactly
    (engine digest compare == DuckDB hex-string compare) and lands near the
    configured rate."""
    import duckdb

    from camden_ray.pipelines.queries import (
        _BERNOULLI_RATE,
        ORACLE_SQL,
        doc_bernoulli_sample,
    )

    df = (
        doc_bernoulli_sample(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    od = (
        con.execute(ORACLE_SQL["doc_bernoulli_sample"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype(od["doc_id"].dtype)
    assert df.equals(od)
    assert abs(len(df) / 500 - _BERNOULLI_RATE) < 0.1


def test_top_bigrams_matches_duckdb(ray_session):
    """Corpus top-K bigrams equal the unnest/list_transform oracle exactly
    (RE2 tokenization parity + deterministic (cnt desc, gram) tie-break)."""
    import duckdb

    from camden_ray.pipelines.queries import ORACLE_SQL, doc_top_bigrams

    tbl = doc_top_bigrams(SF_DIR)
    df = tbl.to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    od = con.execute(ORACLE_SQL["doc_top_bigrams"]).df().reset_index(drop=True)
    assert df.equals(od)
    assert len(df) == 20 and (df["cnt"].diff().dropna() <= 0).all()


def test_asof_view_matches_duckdb(ray_session):
    """The as-of join (click -> most recent prior view per user) equals the
    window-function oracle row-for-row, including inclusive equal-ts matches
    and the max-event_id tie-break."""
    import duckdb

    from camden_ray.pipelines.relational import events_asof_view
    from camden_ray.pipelines.queries import ORACLE_SQL

    df = (
        events_asof_view(SF_DIR)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    od = (
        con.execute(ORACLE_SQL["events_asof_view"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for c in df.columns:
        df[c] = df[c].astype(od[c].dtype)
    assert df.equals(od)
    assert (df["gap_us"] >= 0).all()


def test_kmeans_improves_objective_and_is_deterministic(ray_session):
    """Fixed-point k-means: the SQL oracle pins exact values; this pins the
    ALGORITHM properties SQL can't see — the Lloyd iterations strictly
    improve the quantized SSE objective vs the init centroids, every
    cluster is used (no collapse), and re-execution is bit-identical
    (integer partial sums commute across block layouts). Label purity is
    deliberately NOT asserted: even the planted labels' own centroids
    classify only ~37% of this synthetic space (not L2-separable)."""
    import numpy as np
    import pyarrow.parquet as pq

    from camden_ray.pipelines.queries import (
        _KMEANS_K,
        _KMEANS_SCALE,
        _fp_round,
        embedding_kmeans,
    )

    out = embedding_kmeans(SF_DIR).to_pandas().sort_values("vec_id")
    assert out.cluster.nunique() == _KMEANS_K  # no cluster collapse

    t = pq.read_table(SF_DIR + "/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    X = _fp_round(
        np.vstack([np.asarray(x) for x in t["embedding"].to_pylist()]).astype(
            np.float64
        ),
        scale=_KMEANS_SCALE,
    )
    order = np.argsort(ids)
    X = X[order]

    def sse(assign, cents):
        return int(((X - cents[assign]) ** 2).sum())

    # init = embeddings of the k smallest vec_ids; init SSE from its own
    # nearest-centroid assignment
    C0 = X[:_KMEANS_K]
    d0 = ((X[:, None, :] - C0[None]) ** 2).sum(-1)
    init_sse = int(d0.min(axis=1).sum())
    a = out.sort_values("vec_id")["cluster"].to_numpy()
    cents = np.vstack(
        [
            np.floor_divide(X[a == j].sum(0), max(1, (a == j).sum()))
            for j in range(_KMEANS_K)
        ]
    )
    assert sse(a, cents) < init_sse

    again = embedding_kmeans(SF_DIR).to_pandas().sort_values("vec_id")
    assert out.reset_index(drop=True).equals(again.reset_index(drop=True))
