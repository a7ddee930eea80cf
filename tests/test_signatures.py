"""Signature-stage units: MinHash estimates track true Jaccard; SimHash
Hamming distance tracks similarity; L-gram sampling finds shared spans."""

import numpy as np
import pyarrow as pa

from camden_ray.config import DedupConfig
from camden_ray.functions.text import tokenize
from camden_ray.stages.signatures import SignatureActor, unpack_sigs


def _sig_table(texts):
    actor = SignatureActor(DedupConfig())
    batch = pa.table(
        {"url": [f"u{i}" for i in range(len(texts))], "text": texts}
    )
    return actor(batch)


def _true_jaccard(a, b, k=5):
    ta, tb = tokenize(a), tokenize(b)
    sa = {tuple(ta[i : i + k]) for i in range(len(ta) - k + 1)}
    sb = {tuple(tb[i : i + k]) for i in range(len(tb) - k + 1)}
    return len(sa & sb) / len(sa | sb)


def _words(rng, n):
    return " ".join(f"w{int(x)}" for x in rng.integers(0, 5000, size=n))


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(11)
    base = _words(rng, 400)
    toks = base.split()
    mod = list(toks)
    for p in rng.choice(len(mod), size=4, replace=False):
        mod[p] = "zzz" + str(p)
    near = " ".join(mod)
    other = _words(rng, 400)

    out = _sig_table([base, near, other])
    sigs = unpack_sigs(out["sig"].to_pylist(), 128)
    est_near = (sigs[0] == sigs[1]).mean()
    est_other = (sigs[0] == sigs[2]).mean()
    true_near = _true_jaccard(base, near)
    assert abs(est_near - true_near) < 0.12
    assert est_other < 0.05


def test_exact_copy_same_everything():
    t = "alpha beta gamma delta epsilon zeta eta theta " * 20
    out = _sig_table([t, t])
    assert out["digest"][0].as_py() == out["digest"][1].as_py()
    assert out["sig"][0].as_py() == out["sig"][1].as_py()
    assert out["simhash"][0].as_py() == out["simhash"][1].as_py()
    assert out["lgrams"][0].as_py() == out["lgrams"][1].as_py()


def test_simhash_hamming_small_for_near_dups():
    rng = np.random.default_rng(5)
    base = _words(rng, 500)
    toks = base.split()
    toks[100] = "changed"
    near = " ".join(toks)
    other = _words(rng, 500)
    out = _sig_table([base, near, other])
    sh = np.array(out["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
    ham_near = bin(int(sh[0] ^ sh[1])).count("1")
    ham_other = bin(int(sh[0] ^ sh[2])).count("1")
    assert ham_near <= 3
    assert ham_other > 10


def test_lgrams_shared_span_detected():
    rng = np.random.default_rng(9)
    span = _words(rng, 80)  # > lgram_tokens + lgram_mod
    doc_a = _words(rng, 100) + " " + span + " " + _words(rng, 50)
    doc_b = _words(rng, 60) + " " + span
    doc_c = _words(rng, 200)
    out = _sig_table([doc_a, doc_b, doc_c])
    la, lb, lc = (set(x) for x in out["lgrams"].to_pylist())
    assert la & lb, "shared 80-token span produced no shared sampled L-gram"
    assert not (la & lc) and not (lb & lc)


def test_short_docs_do_not_crash():
    out = _sig_table(["", "one", "two words", "a b c d e f"])
    assert len(out) == 4


def test_vsig_column_matches_sig_derivation():
    """The stamped vsig column must equal the sketch derived from the full
    sig (the sidecar's fallback path for pre-vsig checkpoints)."""
    cfg = DedupConfig()
    out = _sig_table(["alpha beta gamma delta " * 10, "omega psi chi " * 8])
    sigs = unpack_sigs(out["sig"].to_pylist(), cfg.num_perms)
    want = (sigs[:, : cfg.verify_perms] & np.uint64(0xFF)).astype(np.uint8)
    got = np.stack(
        [np.frombuffer(v, dtype=np.uint8) for v in out["vsig"].to_pylist()]
    )
    assert np.array_equal(got, want)


def test_vsig_sidecar_fallback_without_column(ray_session):
    """build_vsig_sidecar must produce identical broadcast content whether
    the signature table carries the vsig column (fast path) or not (resume
    from a pre-vsig checkpoint)."""
    import ray
    import ray.data

    from camden_ray.stages.candidates import build_vsig_sidecar

    cfg = DedupConfig()
    out = _sig_table(["doc one text " * 6, "doc two text " * 6, "three " * 9])
    with_col = ray.data.from_arrow(out)
    without_col = ray.data.from_arrow(out.drop_columns(["vsig"]))
    u1, q1 = ray.get(build_vsig_sidecar(with_col, cfg))
    u2, q2 = ray.get(build_vsig_sidecar(without_col, cfg))
    assert np.array_equal(u1, u2)
    assert np.array_equal(q1, q2)
