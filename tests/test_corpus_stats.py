"""Corpus-statistics / data-hygiene operators vs their DuckDB oracles:
decontamination, repetition quality metrics, vocabulary stats, exact
length quantiles."""

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _doc_view(con):
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )


def _compare(query_fn, sql, sort_cols):
    import duckdb

    res = query_fn(SF_DIR)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    res = res.sort_values(sort_cols).reset_index(drop=True)
    con = duckdb.connect()
    _doc_view(con)
    od = con.execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    assert list(res.columns).sort() == list(od.columns).sort()
    od = od[list(res.columns)]
    for c in res.columns:
        res[c] = res[c].astype(od[c].dtype)
    assert res.equals(od), f"{query_fn.__name__} diverges from its oracle"
    return res


def test_decontaminate_matches_duckdb(ray_session):
    """Benchmark 4-gram decontamination equals the unnest/join oracle
    row-for-row (hash-set membership == exact string-gram membership at this
    scale), the benchmark holdout itself is excluded from the output, and
    contamination is non-trivially present in the fixture."""
    from camden_ray.pipelines.queries import (
        _DECON_CUTOFF_HEX,
        _md5_below,
        ORACLE_SQL,
        doc_decontaminate,
    )

    df = _compare(
        doc_decontaminate, ORACLE_SQL["doc_decontaminate"], ["doc_id"]
    )
    assert (df["n_overlap"] > 0).any(), "fixture should show contamination"
    assert (df["n_overlap"] == 0).any(), "fixture should have clean docs"
    bench_mask = _md5_below(
        [str(d) for d in df["doc_id"].tolist()], _DECON_CUTOFF_HEX
    )
    assert not bench_mask.any(), "benchmark docs must not appear in output"


def test_repetition_matches_duckdb(ray_session):
    """Per-doc bigram repetition metrics equal the group-by oracle exactly
    (dictionary-encode path is hash-free), with sane metric bounds."""
    from camden_ray.pipelines.queries import ORACLE_SQL, doc_repetition

    df = _compare(doc_repetition, ORACLE_SQL["doc_repetition"], ["doc_id"])
    assert len(df) == 500
    assert (df["top_bigram_frac_fp"] <= 1_000_000).all()
    assert (df["dup_bigram_frac_fp"] <= 1_000_000).all()
    assert (df["max_bigram_cnt"] >= 1).all()  # every fixture doc has >= 2 tokens
    assert (df["dup_bigram_frac_fp"] > 0).any()


def test_vocab_stats_matches_duckdb(ray_session):
    """Corpus vocabulary stats (one combiner pass + one vocab-sized groupby)
    equal the exact SQL aggregates."""
    from camden_ray.pipelines.queries import ORACLE_SQL, corpus_vocab_stats

    df = _compare(
        corpus_vocab_stats, ORACLE_SQL["corpus_vocab_stats"], ["n_tokens"]
    )
    row = df.iloc[0]
    assert row["n_tokens"] > row["n_distinct_tokens"] > 0
    assert row["n_distinct_bigrams"] >= row["n_hapax_bigrams"] >= 0


def test_source_tfidf_matches_duckdb(ray_session):
    """Per-source top-K tf·idf terms equal the window-function oracle
    row-for-row (rational idf S/df keeps both sides on exact IEEE division;
    the broadcast df join hard-errors on missing tokens)."""
    from camden_ray.pipelines.queries import (
        _TFIDF_K,
        ORACLE_SQL,
        source_tfidf_terms,
    )

    df = _compare(
        source_tfidf_terms,
        ORACLE_SQL["source_tfidf_terms"],
        ["source", "tk"],
    )
    assert (df.groupby("source").size() == _TFIDF_K).all()
    assert (df["df_cnt"] >= 1).all() and (df["tf_cnt"] >= 1).all()


def test_source_token_quantiles_match_duckdb(ray_session):
    """Grouped exact quantiles (per-source p50/p90 via the per-group value
    histogram) equal DuckDB's grouped quantile_disc."""
    from camden_ray.pipelines.queries import (
        ORACLE_SQL,
        source_token_quantiles,
    )

    df = _compare(
        source_token_quantiles,
        ORACLE_SQL["source_token_quantiles"],
        ["source"],
    )
    assert (df["p50"] <= df["p90"]).all()
    assert df["n_docs"].sum() == 500


def test_token_quantiles_match_duckdb(ray_session):
    """Histogram-derived exact quantiles replicate DuckDB's quantile_disc
    (smallest k with k/N >= q under double compare) at every probed p."""
    from camden_ray.pipelines.queries import (
        ORACLE_SQL,
        corpus_token_quantiles,
    )

    df = _compare(
        corpus_token_quantiles, ORACLE_SQL["corpus_token_quantiles"], ["n_docs"]
    )
    row = df.iloc[0]
    assert row["n_docs"] == 500
    assert row["p10"] <= row["p25"] <= row["p50"] <= row["p75"] <= row["p90"] <= row["p99"]


def test_gopher_filter_matches_duckdb(ray_session):
    """Gopher-rule filtering equals the list-lambda oracle row-for-row, and
    the fixture exercises both verdicts (kept and dropped docs) with at
    least one discriminating rule on each side."""
    from camden_ray.pipelines.queries import ORACLE_SQL, doc_gopher_filter

    df = _compare(doc_gopher_filter, ORACLE_SQL["doc_gopher_filter"], ["doc_id"])
    assert (df["keep"] == 1).any(), "fixture should keep some docs"
    assert (df["keep"] == 0).any(), "fixture should drop some docs"
    dropped = df[df["keep"] == 0]
    assert ((dropped["ok_word_count"] == 0) | (dropped["ok_stopwords"] == 0)).all()


def test_unigram_logprob_matches_duckdb(ray_session):
    """Two-phase unigram-LM scoring equals the freq/ln CTE oracle exactly
    (per-token ×1e6 quantization makes the doc sums order-independent), and
    the fixture shows real score spread."""
    from camden_ray.pipelines.queries import ORACLE_SQL, doc_unigram_logprob

    df = _compare(
        doc_unigram_logprob, ORACLE_SQL["doc_unigram_logprob"], ["doc_id"]
    )
    assert df["mean_logprob_fp"].nunique() > 10
    assert (df["mean_logprob_fp"] < 0).all()


def test_unigram_logprob_shuffle_fallback_parity(ray_session):
    """Forcing the broadcast cap to 0 routes scoring through the token-hash
    co-partition exchange; the result is row-identical to the broadcast
    path (the same pattern every driver-resident cap in the engine uses)."""
    from camden_ray.pipelines.queries import doc_unigram_logprob

    a = (
        doc_unigram_logprob(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        doc_unigram_logprob(SF_DIR, broadcast_max_vocab=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a[b.columns].equals(b)


def test_ccnet_bucket_matches_duckdb(ray_session):
    """CCNet head/middle/tail partition equals the quantile_disc oracle
    exactly and splits the corpus into three non-empty, roughly balanced
    buckets with head > middle > tail score ordering."""
    from camden_ray.pipelines.queries import ORACLE_SQL, doc_ccnet_bucket

    df = _compare(doc_ccnet_bucket, ORACLE_SQL["doc_ccnet_bucket"], ["doc_id"])
    counts = df["bucket"].value_counts()
    # tiny fixtures can produce t1 == t2 (empty middle); head and tail are
    # always populated, and score ordering must hold across present buckets
    assert counts.get("head", 0) > 0 and counts.get("tail", 0) > 0
    means = df.groupby("bucket")["mean_logprob_fp"].mean()
    if "middle" in means:
        assert means["head"] > means["middle"] > means["tail"]
    else:
        assert means["head"] > means["tail"]
    # every tail score <= every head score (tertile contract)
    assert (
        df.loc[df.bucket == "tail", "bin"].max()
        <= df.loc[df.bucket == "head", "bin"].min()
    )


def test_phrase_search_matches_duckdb(ray_session):
    """Distributed phrase grep equals the constant-gram position oracle and
    finds the planted phrase at least once in the small fixture."""
    from camden_ray.pipelines.queries import ORACLE_SQL, doc_phrase_search

    df = _compare(
        doc_phrase_search, ORACLE_SQL["doc_phrase_search"], ["doc_id", "pos"]
    )
    assert len(df) >= 1
    assert (df["pos"] >= 1).all()


def test_source_dup_stats_matches_duckdb(ray_session):
    from camden_ray.pipelines.queries import ORACLE_SQL, source_dup_stats

    df = _compare(source_dup_stats, ORACLE_SQL["source_dup_stats"], ["source"])
    assert (df["n_docs"] >= df["n_distinct"]).all()
    assert (df["dup_count"] == df["n_docs"] - df["n_distinct"]).all()


def test_source_neardup_matrix_matches_duckdb(ray_session):
    """Cross-source near-dup matrix equals the subquery-composed oracle and
    is upper-triangular (source_a <= source_b) with positive counts."""
    from camden_ray.pipelines.queries import ORACLE_SQL, source_neardup_matrix

    df = _compare(
        source_neardup_matrix,
        ORACLE_SQL["source_neardup_matrix"],
        ["source_a", "source_b"],
    )
    assert len(df) >= 1
    assert (df["source_a"] <= df["source_b"]).all()
    assert (df["n_pairs"] >= 1).all()


def test_gopher_summary_matches_duckdb(ray_session):
    from camden_ray.pipelines.queries import ORACLE_SQL, corpus_gopher_summary

    df = _compare(
        corpus_gopher_summary, ORACLE_SQL["corpus_gopher_summary"], ["n_docs"]
    )
    row = df.iloc[0]
    assert 0 < row["n_keep"] < row["n_docs"]
    assert 0 < row["keep_rate_fp"] < 1_000_000


def test_length_zscore_matches_duckdb(ray_session):
    """Exact two-phase standardization equals the integer-moments oracle;
    z-scores are centered (sum ≈ 0 at fp precision) and flags match |z|>3."""
    from camden_ray.pipelines.queries import ORACLE_SQL, doc_length_zscore

    df = _compare(doc_length_zscore, ORACLE_SQL["doc_length_zscore"], ["doc_id"])
    assert abs(df["z_fp"].mean()) < 10_000  # centered to < 0.01 sd
    assert ((df["z_fp"].abs() > 3_000_000) == (df["is_outlier"] == 1)).all()


def test_batch_text_kernels_match_reference():
    """Differential fuzz: the vectorized batch_quality_features /
    batch_detect_lang kernels are bit-identical to the per-row reference
    implementations on adversarial inputs — empty/null rows, unicode (which
    routes to the per-row fallback), CJK, >16-byte tokens (packing
    non-injective → fallback), odd ASCII whitespace (\\x1c is isspace in
    Python), the 2000-char detect_lang truncation boundary, and random
    mixed-alphabet fuzz."""
    import random
    import string

    import pyarrow as pa

    from camden_ray.functions.text import (
        batch_detect_lang,
        batch_quality_features,
        detect_lang,
        quality_features,
    )

    rng = random.Random(7)
    cases = [
        "", " ", None, "the and of to", "foo_bar baz",
        "aaaaaaaaaaaaaaaaaaaaaaaaaa bb",      # > 16-byte token
        "abcdefghijklmnop qrstuvwx",           # exactly-16-byte token
        "abcdefgh the",                        # exactly-8-byte token
        "Hello, World! 123 45.6??",
        "der die das und ist von zu",
        "le la les de et un une est pour",
        "一" * 200 + " hello",             # CJK ratio → zh
        "für die straße",            # non-ASCII → fallback row
        "x" * 3000 + " the the the",           # tokens beyond the 2000-char cut
        "the " * 600,
        "ab\tcd\nef\x1cgh",
    ]
    alpha = string.ascii_letters + string.digits + " .,_!\t\näü"
    for _ in range(200):
        n = rng.randrange(0, 400)
        cases.append("".join(rng.choice(alpha) for _ in range(n)))

    col = pa.array(cases, type=pa.string())
    bq = batch_quality_features(col)
    bl = batch_detect_lang(col)
    for i, c in enumerate(cases):
        ref = quality_features(c or "")
        for k, v in ref.items():
            assert bq[k][i] == v, (i, k, c, v, bq[k][i])
        assert bl[i] == detect_lang(c or ""), (i, c)


def test_decontaminate_spans_consistent_with_flags(ray_session):
    """Span-granular decontamination agrees with the doc-level flagger: a
    doc has >= 1 overlap span iff its n_overlap > 0, and its DISTINCT
    overlapping grams (n_overlap) never exceed its span-hit count."""
    from camden_ray.pipelines.queries import (
        doc_decontaminate,
        doc_decontaminate_spans,
    )

    flags = doc_decontaminate(SF_DIR).to_pandas().set_index("doc_id")
    spans = doc_decontaminate_spans(SF_DIR).to_pandas()
    hit_counts = spans.groupby("doc_id").size()
    flagged = set(flags[flags.n_overlap > 0].index)
    assert set(hit_counts.index) == flagged
    for d in flagged:
        assert flags.loc[d, "n_overlap"] <= hit_counts[d]
    assert len(spans) > 0
