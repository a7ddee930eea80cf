"""Span-trimmed corpus output (stages/spantrim.py): exact byte offsets,
winner semantics, partition parity, multi-byte safety.

The DuckDB oracle (queries.ORACLE_SQL["doc_span_trim"]) pins the
count/md5 projection on the driver tables; these tests pin what SQL cannot
see — the cleaned TEXT itself and the removed byte extents."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from camden_ray.stages.spantrim import span_trim

W = [f"w{i}" for i in range(80)]


def _run(rows: list[tuple[int, str]], L: int, P: int = 4):
    t = pa.table(
        {
            "key": pa.array([k for k, _ in rows], type=pa.int64()),
            "text": pa.array([s for _, s in rows], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return (
        span_trim(ds, L=L, num_partitions=P, key="key", text="text")
        .to_pandas()
        .sort_values("key")
        .set_index("key")
    )


def test_planted_span_exact_offsets(ray_session):
    """A 20-token span copied from doc 1 into doc 5 is cut from doc 5 at
    exact byte extents; the winner keeps it; kept-token md5 matches."""
    doc_a = " ".join(W[:50])
    shared = W[10:30]
    doc_b = " ".join(["x1", "x2", "x3"] + shared + ["y1", "y2"])
    out = _run([(1, doc_a), (5, doc_b)], L=10)

    a = out.loc[1]
    assert a.n_removed == 0 and a.text_clean == doc_a

    b = out.loc[5]
    assert b.n_tokens == 25 and b.n_removed == 20
    start = len("x1 x2 x3 ")
    end = start + len(" ".join(shared))
    assert list(b.span_starts) == [start] and list(b.span_ends) == [end]
    assert b.text_clean == "x1 x2 x3  y1 y2"  # exact extents; whitespace kept
    kept = "x1 x2 x3 y1 y2"
    assert b.cleaned_md5 == hashlib.md5(kept.encode()).hexdigest()


def test_within_doc_repetition_not_trimmed(ray_session):
    """Self-repetition is not cross-doc duplication: a doc repeating its own
    span is its own winner and stays whole."""
    doc = " ".join(["zz"] * 40)
    out = _run([(3, doc)], L=10)
    assert out.loc[3].n_removed == 0 and out.loc[3].text_clean == doc


def test_transitive_winner_chain(ray_session):
    """Three docs sharing one span: only the min-key doc keeps it; both
    later docs lose it (winner = min key over ALL occurrences, not
    pairwise)."""
    shared = W[0:20]
    docs = [
        (2, " ".join(["a1"] + shared)),
        (7, " ".join(["b1"] + shared + ["b2"])),
        (9, " ".join(shared + ["c1"])),
    ]
    out = _run(docs, L=10)
    assert out.loc[2].n_removed == 0
    assert out.loc[7].n_removed == 20
    assert out.loc[9].n_removed == 20
    assert out.loc[9].text_clean == " c1"


def test_edge_docs(ray_session):
    """Empty docs, docs under L tokens, and whitespace-only docs pass
    through untouched with md5('')-consistent hashes."""
    out = _run([(1, ""), (2, " ".join(W[:5])), (3, "  \t \n ")], L=10)
    assert out.loc[1].n_tokens == 0 and out.loc[1].text_clean == ""
    assert out.loc[1].cleaned_md5 == hashlib.md5(b"").hexdigest()
    assert out.loc[2].n_removed == 0
    assert out.loc[3].n_tokens == 0 and out.loc[3].text_clean == "  \t \n "


def test_multibyte_tokens_survive(ray_session):
    """UTF-8 multi-byte tokens: byte-level \\S+ runs agree with RE2 and the
    cut lands on token boundaries, so cleaned text stays valid UTF-8."""
    shared = [f"tök{i}" for i in range(12)]
    doc_a = " ".join(shared)
    doc_b = "straße " + " ".join(shared) + " füü"
    out = _run([(1, doc_a), (4, doc_b)], L=10)
    b = out.loc[4]
    assert b.n_removed == 12
    assert b.text_clean == "straße  füü"
    assert out.loc[1].text_clean == doc_a


def test_partition_parity(ray_session):
    """P=1 and P=8 produce identical output (no partition-boundary loss)."""
    rng = np.random.default_rng(11)
    docs = []
    base = [f"t{i}" for i in range(200)]
    for i in range(30):
        s = int(rng.integers(0, 150))
        ln = int(rng.integers(5, 40))
        noise = [f"n{i}_{j}" for j in range(int(rng.integers(0, 20)))]
        docs.append((i, " ".join(noise + base[s : s + ln])))
    a = _run(docs, L=12, P=1)
    b = _run(docs, L=12, P=8)
    assert a.reset_index().equals(b.reset_index())
    assert (a.n_removed > 0).any()  # fixture actually exercises trimming


def test_gram_shard_parity(ray_session):
    """gram_shards=S produces output identical to the unsharded exchange
    (winner election is per-gram independent; shard covers merge
    additively)."""
    rng = np.random.default_rng(13)
    docs = []
    base = [f"t{i}" for i in range(200)]
    for i in range(30):
        s = int(rng.integers(0, 150))
        ln = int(rng.integers(5, 40))
        noise = [f"n{i}_{j}" for j in range(int(rng.integers(0, 20)))]
        docs.append((i, " ".join(noise + base[s : s + ln])))
    t = pa.table(
        {
            "key": pa.array([k for k, _ in docs], type=pa.int64()),
            "text": pa.array([s for _, s in docs], type=pa.string()),
        }
    )
    a = (
        span_trim(ray.data.from_arrow(t), L=12, num_partitions=4)
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    for S in (2, 5):
        b = (
            span_trim(
                ray.data.from_arrow(t), L=12, num_partitions=4,
                gram_shards=S,
            )
            .to_pandas().sort_values("key").reset_index(drop=True)
        )
        assert a.equals(b), f"gram_shards={S} diverged"
    assert (a.n_removed > 0).any()


def test_string_keys_lexicographic_winner(ray_session):
    """String keys: winner order is lexicographic (url semantics)."""
    shared = W[0:15]
    t = pa.table(
        {
            "url": pa.array(["doc://b", "doc://a"], type=pa.string()),
            "text": pa.array(
                [" ".join(shared), " ".join(shared + ["tail"])],
                type=pa.string(),
            ),
        }
    )
    out = (
        span_trim(
            ray.data.from_arrow(t), L=10, num_partitions=3,
            key="url", text="text",
        )
        .to_pandas()
        .set_index("url")
    )
    assert out.loc["doc://a"].n_removed == 0
    assert out.loc["doc://b"].n_removed == 15


def test_hot_gram_skew(ray_session):
    """A span shared by MANY docs (hot gram bucket): winner election is one
    sort per partition — never an all-pairs step — so a 400-doc bucket must
    both finish and trim every non-winner doc completely."""
    shared = [f"s{i}" for i in range(15)]
    rows = [(0, " ".join(shared))]  # winner
    rows += [
        (i, " ".join([f"u{i}"] + shared + [f"v{i}"])) for i in range(1, 400)
    ]
    out = _run(rows, L=10, P=8)
    assert out.loc[0].n_removed == 0
    losers = out.drop(index=0)
    assert (losers.n_removed == 15).all()
    assert (losers.n_tokens == 17).all()


def test_rank_keys_mode_equals_direct(ray_session):
    """rank_keys=True (dense-int winner election for string-keyed corpora)
    must produce EXACTLY the direct string-key output — min rank ≡ min key
    by construction of the global sort."""
    rng = np.random.default_rng(23)
    base = [f"t{i}" for i in range(150)]
    docs = []
    for i in range(40):
        s = int(rng.integers(0, 100))
        ln = int(rng.integers(8, 40))
        noise = [f"n{i}_{j}" for j in range(int(rng.integers(0, 10)))]
        # shuffled url order vs insertion order (ranks must follow URL order)
        docs.append((f"https://h{(i * 7) % 40}.x/p{i}", " ".join(noise + base[s : s + ln])))
    t = pa.table(
        {
            "url": pa.array([u for u, _ in docs], type=pa.string()),
            "text": pa.array([s for _, s in docs], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    direct = (
        span_trim(ds, L=10, num_partitions=6, key="url", text="text")
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    ranked = (
        span_trim(ds, L=10, num_partitions=6, key="url", text="text",
                  rank_keys=True)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert (direct.n_removed > 0).any()
    assert direct.equals(ranked[direct.columns])


def test_empty_corpus(ray_session):
    """A fully-empty input corpus returns an empty result in both modes
    (Ray emits schema-less empty blocks for zero-row datasets — the guard
    builds typed empties instead of reading absent columns)."""
    t = pa.table(
        {"key": pa.array([], type=pa.int64()),
         "text": pa.array([], type=pa.string())}
    )
    ds = ray.data.from_arrow(t)
    out = span_trim(ds, L=5, num_partitions=3, key="key", text="text")
    assert out.count() == 0
    out_r = span_trim(ds, L=5, num_partitions=3, key="key", text="text",
                      rank_keys=True)
    assert out_r.count() == 0


def test_rank_keys_int64(ray_session):
    """rank_keys=True also works for int64 doc-id keys (the passthrough
    nulls must match the key type) and equals the direct mode."""
    shared = W[0:15]
    rows = [(9, " ".join(shared)), (3, " ".join(shared + ["tail"]))]
    direct = _run(rows, L=10)
    t = pa.table(
        {"key": pa.array([k for k, _ in rows], type=pa.int64()),
         "text": pa.array([s for _, s in rows], type=pa.string())}
    )
    ranked = (
        span_trim(ray.data.from_arrow(t), L=10, num_partitions=3,
                  key="key", text="text", rank_keys=True)
        .to_pandas().sort_values("key").set_index("key")
    )
    assert direct.equals(ranked[direct.columns])
    assert ranked.loc[9].n_removed == 15  # min key 3 wins
