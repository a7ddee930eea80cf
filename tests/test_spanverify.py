"""Distributed span/jaccard verification of candidate pairs (the refinement
stage that makes a coarse L-gram bucket collision unable to produce a false
substring edge)."""

import pandas as pd
import ray.data

from camden_ray.config import DedupConfig
from camden_ray.stages.spanverify import verify_jaccard_pairs, verify_span_edges


def _texts_ds(d: dict[str, str]):
    return ray.data.from_pandas(
        pd.DataFrame({"url": list(d), "text": list(d.values())})
    )


def _ths_ds(d: dict[str, str], seed: int = 42):
    """(url, token-hash stream) view of text docs — the signature table's
    ``th`` column shape that verify_span_edges consumes."""
    import numpy as np

    from camden_ray.functions.hashing import TokenHasher
    from camden_ray.functions.text import tokenize

    h = TokenHasher(seed=seed)
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "url": list(d),
                "text": [
                    h.hash_tokens(tokenize(v)).view(np.int64).tolist()
                    for v in d.values()
                ],
            }
        )
    )


def _pairs_ds(pairs):
    return ray.data.from_pandas(
        pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})
    )


def test_span_verify_keeps_true_span_drops_false_pair():
    """A/B share a 60-token span (>= lgram_tokens=50) → edge survives; C/D
    share nothing → a candidate pair between them (a collided bucket) is
    refuted by the token streams."""
    base = [f"w{i}" for i in range(200)]
    span = [f"s{i}" for i in range(60)]
    texts = {
        "u://a": " ".join(base[:50] + span + base[50:100]),
        "u://b": " ".join(base[100:150] + span + base[150:200]),
        "u://c": " ".join(f"c{i}" for i in range(150)),
        "u://d": " ".join(f"d{i}" for i in range(150)),
    }
    pairs = _pairs_ds([("u://a", "u://b"), ("u://c", "u://d")])
    out = verify_span_edges(pairs, _ths_ds(texts), DedupConfig()).to_pandas()
    assert set(zip(out.a, out.b)) == {("u://a", "u://b")}
    assert (out.method == "substring").all()


def test_span_verify_just_below_threshold_refuted():
    """A shared span one token SHORT of lgram_tokens must not verify."""
    cfg = DedupConfig()
    span = [f"s{i}" for i in range(cfg.lgram_tokens - 1)]
    texts = {
        "u://a": " ".join([f"x{i}" for i in range(80)] + span),
        "u://b": " ".join(span + [f"y{i}" for i in range(80)]),
    }
    pairs = _pairs_ds([("u://a", "u://b")])
    out = verify_span_edges(pairs, _ths_ds(texts), cfg).to_pandas()
    assert len(out) == 0


def test_jaccard_verify_matches_bruteforce():
    va = [f"t{i}" for i in range(100)]
    vb = list(va)
    vb[10] = "zzz"  # one substitution: J just under 1.0, well over 0.5
    texts = {
        "u://a": " ".join(va),
        "u://b": " ".join(vb),
        "u://c": " ".join(f"q{i}" for i in range(100)),
    }
    pairs = _pairs_ds([("u://a", "u://b"), ("u://a", "u://c")])
    cfg = DedupConfig()
    out = verify_jaccard_pairs(pairs, _texts_ds(texts), cfg, tau=0.5).to_pandas()
    assert set(zip(out.a, out.b)) == {("u://a", "u://b")}
    # exact tuple-shingle jaccard, fixed-point 1e-5
    k = cfg.shingle_k
    sa = {tuple(va[i : i + k]) for i in range(len(va) - k + 1)}
    sb = {tuple(vb[i : i + k]) for i in range(len(vb) - k + 1)}
    want = int(round(len(sa & sb) / len(sa | sb) * 100_000))
    assert out.jaccard_fp.iloc[0] == want


def test_antijoin_prefilter_matches_full_exchange(ray_session):
    """The broadcast semi-join pushdown (left-digest prefilter on the right
    side) must produce the same anti-join result as the full exchange
    (prefilter_cap=0 disables it)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from camden_ray.stages.spanverify import antijoin_pairs

    rng = np.random.default_rng(11)
    uids = rng.integers(-(2**62), 2**62, size=64, dtype=np.int64)
    la = uids[rng.integers(0, 64, 300)]
    lb = uids[rng.integers(0, 64, 300)]
    ra = uids[rng.integers(0, 64, 5000)]
    rb = uids[rng.integers(0, 64, 5000)]
    left = ray.data.from_pandas(pd.DataFrame({"a": la, "b": lb}))
    right = ray.data.from_pandas(pd.DataFrame({"a": ra, "b": rb}))

    def rows(ds):
        out = set()
        for t in ds.iter_batches(batch_format="pyarrow"):
            out |= set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
        return out

    fast = rows(antijoin_pairs(left, right, 7))
    slow = rows(antijoin_pairs(left, right, 7, prefilter_cap=0))
    assert fast == slow
    # sanity: the anti-join did remove something and kept something
    assert 0 < len(fast) < 300


def test_inline_refine_matches_distributed(ray_session):
    """The driver-inline substring refinement (small-edge-set fast path) must
    produce the identical final edge SET as the distributed anti-join +
    verify exchanges on the same input."""
    import os

    from dataclasses import replace

    from camden_ray.fixture import ensure_fixture
    from camden_ray.pipelines.dedup import (
        build_edges_uid,
        refine_substring_edges,
        signature_table,
    )

    fx = ensure_fixture(3000)
    from camden_ray.sources.webtext import read_webtext

    cfg = DedupConfig(extract_concurrency=2)
    ds = read_webtext(os.path.join(fx, "webtext"), columns=["url", "html"])
    sig = signature_table(ds, cfg, extract=True).materialize()
    edges = build_edges_uid(sig, cfg).materialize()

    def edge_set(res):
        df = res.select_columns(["a", "b", "method"]).to_pandas()
        return set(map(tuple, df.itertuples(index=False)))

    inline = refine_substring_edges(edges, sig, cfg)  # small -> inline path
    forced = refine_substring_edges(
        edges, sig, replace(cfg, span_inline_max_edges=0)
    )  # forced distributed path
    s_inline, s_forced = edge_set(inline), edge_set(forced)
    assert len(s_inline) > 0
    assert s_inline == s_forced
