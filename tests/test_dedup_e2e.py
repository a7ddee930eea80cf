"""End-to-end dedup: recall gate, precision, exact-branch coverage,
parallel ≡ sequential equivalence (mirror of /root/reference/src/scanner.rs:135-143).
"""

import os

import pyarrow.parquet as pq
import pytest

from camden_ray.config import DedupConfig
from camden_ray.pipelines.dedup import run_dedup


@pytest.fixture(scope="module")
def truth(fixture_dir):
    pairs = pq.read_table(os.path.join(fixture_dir, "truth_pairs.parquet")).to_pandas()
    clus = pq.read_table(os.path.join(fixture_dir, "truth_clusters.parquet")).to_pandas()
    return pairs, clus.set_index("url")["cluster_id"]


def test_dup_pair_recall(dedup_result, truth):
    """north_rule gate: dup-pair recall >= 0.99 vs reference assignments."""
    pairs, _ = truth
    dup = pairs[pairs.is_dup]
    cl = dedup_result["clusters"].to_pandas().set_index("url")["cluster_id"]
    hits = int((cl[dup.url_a].to_numpy() == cl[dup.url_b].to_numpy()).sum())
    recall = hits / len(dup)
    assert recall >= 0.99, f"recall {recall:.4f} < 0.99 ({hits}/{len(dup)})"


def test_precision_distinct_stay_apart(dedup_result, truth):
    """Truly-distinct docs (incl. hot-bucket boilerplate rows) stay unmerged.

    Borderline near-pairs (true Jaccard within verify_margin of τ) are the
    only tolerated extra merges.
    """
    pairs, tcid = truth
    borderline = set()
    for p in pairs.itertuples():
        if not p.is_dup and p.jaccard >= 0.65:
            borderline.add((p.url_a, p.url_b))
    cl = dedup_result["clusters"].to_pandas().set_index("url")["cluster_id"]
    import itertools

    bad = []
    for _, members in cl.groupby(cl).groups.items():
        if len(members) < 2:
            continue
        for a, b in itertools.combinations(sorted(members), 2):
            if tcid[a] != tcid[b] and (a, b) not in borderline:
                bad.append((a, b))
    assert not bad, f"false merges of truly distinct docs: {bad[:5]}"


def test_exact_branch_catches_verbatim_copies(dedup_result, truth):
    pairs, _ = truth
    n_exact_pairs = (pairs.kind == "exact").sum()
    ed = dedup_result["edges"].to_pandas()
    assert (ed.method == "exact").sum() >= n_exact_pairs


def test_every_method_contributes(dedup_result):
    ed = dedup_result["edges"].to_pandas()
    assert {"exact", "minhash", "substring"} <= set(ed.method.unique())


def test_stats_shape(dedup_result):
    s = dedup_result["stats"]
    assert s["rows"] == 300
    assert s["duplicates_removed"] == s["clustered_urls"] - s["clusters_nontrivial"]
    assert s["duplicates_removed"] > 0


def test_kept_removed_partition(dedup_result):
    kept = dedup_result["kept"].to_pandas()
    removed = dedup_result["removed"].to_pandas()
    assert len(kept) + len(removed) == 300
    assert kept.is_representative.all()
    assert (~removed.is_representative).all()
    # representatives are the min url of their cluster (determinism contract,
    # vs the reference's arrival-order keep-first, operations.rs:50)
    assert (kept.cluster_id == kept.url).all()


def test_distributed_clustering_matches_driver_path(webtext_path, dedup_result):
    """Force the scale path (driver_unionfind_max_edges=0): distributed
    hash-to-min + shuffle-join assignment must produce the SAME clusters as
    the driver union-find + broadcast map, with no driver-side assignment
    map anywhere in the run."""
    res = run_dedup(
        webtext_path,
        DedupConfig(driver_unionfind_max_edges=0),
        extract=True,
    )
    a = (
        dedup_result["clusters"].to_pandas()
        .sort_values("url").reset_index(drop=True)
    )
    b = res["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    assert res["stats"] == dedup_result["stats"]


def test_parallel_equals_sequential(webtext_path, dedup_result):
    """Same input, 1 block vs many blocks ⇒ identical sorted clusters."""
    import ray.data

    seq_input = ray.data.read_parquet(
        webtext_path, columns=["url", "html"], override_num_blocks=1
    )
    res_seq = run_dedup(
        webtext_path, DedupConfig(), extract=True, input_ds=seq_input
    )
    a = (
        dedup_result["clusters"].to_pandas()
        .sort_values("url").reset_index(drop=True)
    )
    b = res_seq["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_edge_resolution_copartition_matches_broadcast(webtext_path):
    """resolve_edge_urls: the zero-driver-state co-partition fallback
    (endpoint_cap=0 forces it) produces the same url-pair edge set as the
    broadcast path."""
    from camden_ray.pipelines.dedup import signature_table
    from camden_ray.stages.candidates import (
        resolve_edge_urls,
        unified_star_edges_uid,
    )
    from camden_ray.sources.webtext import read_webtext

    cfg = DedupConfig()
    ds = read_webtext(webtext_path, columns=["url", "html"], min_text_chars=0)
    sig = signature_table(ds, cfg, extract=True).materialize()
    uid_edges = unified_star_edges_uid(sig, cfg).materialize()

    def pairs(ds_):
        df = ds_.to_pandas()[["a", "b", "method"]]
        return set(map(tuple, df.itertuples(index=False)))

    broad = pairs(resolve_edge_urls(uid_edges, sig, cfg))
    copart = pairs(resolve_edge_urls(uid_edges, sig, cfg, endpoint_cap=0))
    assert broad and broad == copart


def test_vsig_coshuffle_matches_broadcast(webtext_path, dedup_result):
    """Force the >vsig_broadcast_max_docs transport (sketches co-shuffled on
    the candidate rows, no broadcast sidecar): the full pipeline must produce
    the SAME clusters and stats as the broadcast-sidecar mode."""
    res = run_dedup(
        webtext_path,
        DedupConfig(vsig_broadcast_max_docs=0),
        extract=True,
    )
    a = (
        dedup_result["clusters"].to_pandas()
        .sort_values("url").reset_index(drop=True)
    )
    b = res["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    assert res["stats"] == dedup_result["stats"]


def test_quality_representative_selection(webtext_path, dedup_result):
    """representative="quality": each cluster keeps its argmax-quality member
    (min-url tiebreak) instead of the min url; cluster MEMBERSHIP is
    identical to the default run; the distributed clustering path
    (driver_unionfind_max_edges=0) picks the same representatives."""
    import numpy as np

    from camden_ray.functions.text import quality_features

    cfg = DedupConfig(representative="quality")
    res = run_dedup(webtext_path, cfg, extract=True)
    cl = res["clusters"].to_pandas()
    base = dedup_result["clusters"].to_pandas()

    # same partition of urls into clusters (ids differ, membership must not)
    def groups(df):
        return {
            frozenset(g["url"]) for _, g in df.groupby("cluster_id")
        }

    assert groups(cl) == groups(base)

    # recompute scores independently from the extracted text and assert the
    # rep of every non-trivial cluster is argmax-q (min-url tiebreak)
    from camden_ray.stages.extract import FastTextExtractor

    import pyarrow.parquet as pq
    import glob
    import os

    ext = FastTextExtractor()
    tabs = [pq.read_table(p) for p in glob.glob(os.path.join(webtext_path, "*.parquet"))]
    url_q = {}
    for t in tabs:
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            txt = ext.extract(h.decode("utf-8", "replace")) if h is not None else ""
            s = quality_features(txt)["quality_score"]
            url_q[u] = int(np.trunc(s * 1_000_000 + 0.5))
    for cid, g in cl.groupby("cluster_id"):
        if len(g) < 2:
            continue
        best = sorted(g["url"], key=lambda u: (-url_q[u], u))[0]
        assert cid == best, (cid, best, [(u, url_q[u]) for u in g["url"]])
        rep_rows = g[g.is_representative]
        assert list(rep_rows["url"]) == [best]

    # distributed path parity
    res_d = run_dedup(
        webtext_path,
        DedupConfig(representative="quality", driver_unionfind_max_edges=0),
        extract=True,
    )
    cl_d = res_d["clusters"].to_pandas()
    a = cl.sort_values("url").reset_index(drop=True)
    b = cl_d.sort_values("url").reset_index(drop=True)
    assert a.equals(b)
