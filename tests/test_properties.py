"""Hypothesis property tests over the pure (Ray-free) kernels.

These complement the fixed-fuzz differential tests: hypothesis explores the
input space adversarially and shrinks failures. All properties are against
independent reference implementations (Python re / decimal / brute force),
never against the kernel itself.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# RE2 \S byte class used by the span-trim tokenizer
_RE2_TOKEN = re.compile(rb"[^\t\n\f\r ]+")

texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
        max_size=60,
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_ws_token_runs_match_regex(rows):
    """_ws_token_runs over a row-segmented utf-8 buffer equals per-row RE2
    \\S+ byte runs (starts, lengths, counts)."""
    from camden_ray.functions.hashing import _string_array_view
    from camden_ray.stages.spantrim import _ws_token_runs

    col = pa.array(rows, type=pa.string())
    data, offs = _string_array_view(col)
    s_idx, e_idx, counts = _ws_token_runs(data, offs)

    exp_starts, exp_ends, exp_counts = [], [], []
    for i, r in enumerate(rows):
        b = r.encode()
        ms = list(_RE2_TOKEN.finditer(b))
        exp_counts.append(len(ms))
        for m in ms:
            exp_starts.append(offs[i] + m.start())
            exp_ends.append(offs[i] + m.end())
    assert s_idx.tolist() == exp_starts
    assert e_idx.tolist() == exp_ends
    assert counts.tolist() == exp_counts


@settings(max_examples=150, deadline=None)
@given(texts)
def test_batch_quality_matches_reference(rows):
    """batch_quality_features is bit-identical to the per-row reference on
    arbitrary (incl. non-ASCII, fallback-routing) input."""
    from camden_ray.functions.text import batch_quality_features, quality_features

    col = pa.array(rows, type=pa.string())
    out = batch_quality_features(col)
    for i, r in enumerate(rows):
        ref = quality_features(r)
        for k, v in ref.items():
            assert out[k][i] == v, (i, k, r)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_batch_gopher_matches_reference(rows):
    """batch_gopher_features is bit-identical to the per-row reference on
    arbitrary (incl. non-ASCII, fallback-routing, dot-run boundary) input."""
    from camden_ray.functions.text import batch_gopher_features, gopher_features

    col = pa.array(rows, type=pa.string())
    out = batch_gopher_features(col)
    for i, r in enumerate(rows):
        ref = gopher_features(r)
        for k, v in ref.items():
            assert out[k][i] == v, (i, k, r)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_batch_detect_lang_matches_reference(rows):
    from camden_ray.functions.text import batch_detect_lang, detect_lang

    col = pa.array(rows, type=pa.string())
    out = batch_detect_lang(col)
    for i, r in enumerate(rows):
        assert out[i] == detect_lang(r), (i, r)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
             min_size=1, max_size=20)
)
def test_fp_round_matches_duckdb(vals):
    """_fp_round's CONTRACT is DuckDB's round() — compare against DuckDB
    itself on the identical doubles (including injected .5 boundaries)."""
    import duckdb

    from camden_ray.pipelines.queries import _fp_round

    vals = list(vals) + [0.0000005, -0.0000005, 2.5e-6, -2.5e-6, 0.0]
    got = _fp_round(np.array(vals, dtype=np.float64), scale=1_000_000)
    con = duckdb.connect()
    import pandas as pd

    con.register("v", pd.DataFrame({"x": vals}))
    want = con.execute(
        "SELECT CAST(round(x * 1000000) AS BIGINT) FROM v"
    ).df().iloc[:, 0].to_numpy()
    assert np.array_equal(got, want), (vals, got.tolist(), want.tolist())


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=40),
        min_size=0, max_size=8,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_rolling_grams_equal_iff_windows_equal(docs, L):
    """rolling_lgram_hashes: equal L-windows hash equal (always), and on
    these tiny alphabets hash-equal windows are window-equal (no collisions
    at this scale) — the property span verification relies on. Also checks
    the flat form is value-identical at per-doc offsets."""
    from camden_ray.functions.hashing import flat_rolling_grams, rolling_lgram_hashes

    arrs = [np.array(d, dtype=np.uint64) for d in docs]
    grams = [rolling_lgram_hashes(a, L) for a in arrs]
    windows = [
        [tuple(a[i : i + L].tolist()) for i in range(max(0, len(a) - L + 1))]
        for a in arrs
    ]
    # pairwise: hash equality ⇔ window equality
    flat_h = [h for g in grams for h in g.tolist()]
    flat_w = [w for ws in windows for w in ws]
    for i in range(len(flat_h)):
        for j in range(i + 1, len(flat_h)):
            assert (flat_h[i] == flat_h[j]) == (flat_w[i] == flat_w[j])
    # flat form matches per-doc values at the right offsets
    th_flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.uint64)
    g_all = flat_rolling_grams(th_flat, L)
    off = 0
    for a, g in zip(arrs, grams):
        m = max(0, len(a) - L + 1)
        if m:
            assert np.array_equal(g_all[off : off + m], g)
        off += len(a)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 200)),
        min_size=0, max_size=60,
    )
)
def test_unionfind_uid_matches_bruteforce(edges):
    """unionfind_uid components equal a brute-force transitive closure."""
    import ray

    if not ray.is_initialized():
        import pytest

        pytest.skip("needs the session ray fixture")
    import ray.data

    from camden_ray.stages.cluster import unionfind_uid

    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], type=pa.int64()),
            "b": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    uf = unionfind_uid(ray.data.from_arrow(t))
    # brute force
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    if uf is None:
        assert not edges
        return
    nodes, roots = uf
    assert sorted(nodes.tolist()) == sorted(parent.keys())
    got = {int(n): int(r) for n, r in zip(nodes, roots)}
    for n in parent:
        assert got[n] == find(n), (n, got[n], find(n))
