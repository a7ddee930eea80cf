"""Fixture generator: determinism and ground-truth structure."""

import glob
import os

import pyarrow.parquet as pq

from camden_ray.fixture import generate, generate_docs


def test_generation_deterministic(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate(d1, 200, seed=42)
    generate(d2, 200, seed=42)
    for sub in ["webtext/part-00000.parquet", "truth_pairs.parquet", "truth_clusters.parquet"]:
        b1 = open(os.path.join(d1, sub), "rb").read()
        b2 = open(os.path.join(d2, sub), "rb").read()
        assert b1 == b2, f"{sub} not byte-identical across generations"


def test_truth_structure(fixture_dir):
    pairs = pq.read_table(os.path.join(fixture_dir, "truth_pairs.parquet")).to_pandas()
    assert set(pairs.kind.unique()) <= {"exact", "near", "substring"}
    assert (pairs[pairs.kind == "exact"].jaccard == 1.0).all()
    assert pairs[pairs.is_dup].shape[0] > 0
    clus = pq.read_table(os.path.join(fixture_dir, "truth_clusters.parquet")).to_pandas()
    assert clus.url.is_unique
    # every dup pair lands in one truth cluster
    cid = clus.set_index("url")["cluster_id"]
    dup = pairs[pairs.is_dup]
    assert (cid[dup.url_a].to_numpy() == cid[dup.url_b].to_numpy()).all()


def test_exact_copies_render_byte_identical():
    docs, pairs = generate_docs(200, seed=42)
    from camden_ray.fixture import render_doc

    by_idx = {d.idx: d for d in docs}
    exact = [d for d in docs if d.kind == "exact"]
    assert exact
    for d in exact:
        h1, t1 = render_doc(d, 42)
        h2, t2 = render_doc(by_idx[d.source], 42)
        assert t1 == t2  # verbatim copies extract byte-identically
