"""Deterministic synthetic webtext fixture (FIXTURES.md §A).

Generates the exact `input_hint` table shape from BASELINE.json —
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string) —
with *known ground truth* duplicate structure, scaled up from the reference's
test fixture of 2 identical + 1 distinct file
(/root/reference/src/scanner.rs:110-133):

  * exact       — verbatim copies under different urls (~5%)
  * near        — copies with a small fraction of token substitutions, true
                  shingle-Jaccard recorded per pair (~10%)
  * substring   — docs embedding a >= (lgram_tokens + lgram_mod)-token span
                  copied from another doc (~5%)
  * hot         — one boilerplate header/footer shared by ~1% of rows
                  (skewed LSH buckets; NOT true duplicates — precision check)
  * distinct    — everything else (singletons)

Sidecars: truth_pairs.parquet (url_a, url_b, kind, jaccard, is_dup) and
truth_clusters.parquet (url, cluster_id) — the "reference cluster
assignments" for the dup-pair recall >= 0.99 gate.

Fully deterministic: same (n, seed) ⇒ byte-identical parquet. No external
data; vocab is constructed in source. The `text` column is built directly
from the same pieces the HTML templater uses, so `extract_text(html) == text`
byte-identically — that equality is itself a test of the extractor.
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_VERSION = 3
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


def _vocab_latin() -> list[str]:
    cons = "b c d f g h j k l m n p r s t v w z".split()
    vow = "a e i o u".split()
    words = [c1 + v1 + c2 + v2 for c1 in cons for v1 in vow for c2 in cons for v2 in vow[:2]]
    stop = "the and of to a in is that it for on with as was at by an be this are or".split()
    return stop * 40 + words[:4000]  # stopwords repeated → Zipf-ish head


def _vocab_zh() -> list[str]:
    return [chr(0x4E00 + i) for i in range(600)]


_LANGS = ["en", "de", "fr", "es", "zh"]
_LANG_P = [0.70, 0.10, 0.07, 0.07, 0.06]


@dataclass
class _Doc:
    idx: int
    lang: str
    tokens: list[str]
    kind: str          # distinct | exact | near | substring | hot
    source: int = -1   # idx of source doc for copy classes
    jaccard: float = 1.0


def _doc_length(rng: np.random.Generator) -> int:
    return int(np.clip(rng.lognormal(mean=5.0, sigma=0.6), 30, 2000))


def _rand_tokens(rng: np.random.Generator, vocab: list[str], n: int) -> list[str]:
    idx = rng.integers(0, len(vocab), size=n)
    return [vocab[i] for i in idx]


def _shingle_set(tokens: list[str], k: int = 5) -> set[tuple[str, ...]]:
    return {tuple(tokens[i : i + k]) for i in range(max(0, len(tokens) - k + 1))}


def _true_jaccard(a: list[str], b: list[str], k: int = 5) -> float:
    sa, sb = _shingle_set(a, k), _shingle_set(b, k)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def url_for(idx: int) -> str:
    return f"https://s{idx % 97}.example/p{idx:08d}"


def generate_docs(n: int, seed: int = 42) -> tuple[list[_Doc], list[dict]]:
    """Build the doc population + truth pair records (pure python/numpy)."""
    rng = np.random.default_rng(seed)
    vl, vz = _vocab_latin(), _vocab_zh()

    n_exact = n // 20 if n >= 20 else (1 if n >= 3 else 0)
    n_near = n // 10 if n >= 10 else (1 if n >= 3 else 0)
    n_sub = n // 20 if n >= 20 else 0
    n_hot = n // 100 if n >= 200 else 0
    n_base = n - n_exact - n_near - n_sub - n_hot
    assert n_base > 0

    boiler_head = _rand_tokens(np.random.default_rng(seed + 1), vl, 35)
    boiler_foot = _rand_tokens(np.random.default_rng(seed + 2), vl, 35)

    docs: list[_Doc] = []
    # base/distinct docs first (indices 0..n_base-1)
    langs = rng.choice(len(_LANGS), size=n, p=_LANG_P)
    for i in range(n_base):
        lang = _LANGS[langs[i]]
        vocab = vz if lang == "zh" else vl
        docs.append(_Doc(i, lang, _rand_tokens(rng, vocab, _doc_length(rng)), "distinct"))

    pairs: list[dict] = []
    nxt = n_base

    def add_pair(a: int, b: int, kind: str, jac: float, is_dup: bool) -> None:
        ua, ub = url_for(a), url_for(b)
        if ua > ub:
            ua, ub = ub, ua
        pairs.append(
            {"url_a": ua, "url_b": ub, "kind": kind, "jaccard": jac, "is_dup": is_dup}
        )

    # exact copies
    for _ in range(n_exact):
        src = int(rng.integers(0, n_base))
        d = docs[src]
        docs.append(_Doc(nxt, d.lang, list(d.tokens), "exact", src, 1.0))
        add_pair(nxt, src, "exact", 1.0, True)
        nxt += 1

    # near copies: substitute a small number of tokens (keeps J mostly >= 0.8)
    for _ in range(n_near):
        src = int(rng.integers(0, n_base))
        d = docs[src]
        toks = list(d.tokens)
        vocab = vz if d.lang == "zh" else vl
        max_sub = max(1, int(len(toks) * 0.015))
        n_subst = int(rng.integers(1, max_sub + 1))
        pos = rng.choice(len(toks), size=min(n_subst, len(toks)), replace=False)
        for p in pos:
            toks[p] = vocab[int(rng.integers(0, len(vocab)))]
        jac = _true_jaccard(d.tokens, toks)
        docs.append(_Doc(nxt, d.lang, toks, "near", src, jac))
        add_pair(nxt, src, "near", jac, jac >= 0.8)
        nxt += 1

    # substring: own text embedding a long span from a source doc.
    # span >= 60 > lgram_tokens + lgram_mod - 1 = 57 so the winnowed L-gram
    # stage is GUARANTEED to detect it; sources must be long enough to donate.
    long_bases = [i for i in range(n_base) if len(docs[i].tokens) > 130]
    for _ in range(n_sub):
        src = long_bases[int(rng.integers(0, len(long_bases)))]
        d = docs[src]
        span_len = int(rng.integers(60, 121))
        start = int(rng.integers(0, len(d.tokens) - span_len))
        span = d.tokens[start : start + span_len]
        vocab = vz if d.lang == "zh" else vl
        own_a = _rand_tokens(rng, vocab, int(rng.integers(20, 120)))
        own_b = _rand_tokens(rng, vocab, int(rng.integers(20, 120)))
        toks = own_a + span + own_b
        docs.append(_Doc(nxt, d.lang, toks, "substring", src, 0.0))
        add_pair(nxt, src, "substring", _true_jaccard(d.tokens, toks), True)
        nxt += 1

    # hot bucket: shared boilerplate head+foot, distinct bodies (NOT dups)
    for _ in range(n_hot):
        body = _rand_tokens(rng, vl, int(rng.integers(80, 250)))
        toks = boiler_head + body + boiler_foot
        docs.append(_Doc(nxt, "en", toks, "hot", -1, 0.0))
        nxt += 1

    assert nxt == n
    return docs, pairs


def _paragraphs(tokens: list[str], rng: np.random.Generator) -> list[str]:
    paras, i = [], 0
    while i < len(tokens):
        step = int(rng.integers(40, 81))
        paras.append(" ".join(tokens[i : i + step]))
        i += step
    return paras


def render_doc(d: _Doc, seed: int) -> tuple[bytes, str]:
    """(html, text) where extract_text(html) == text byte-identically.

    The render rng is seeded from the CONTENT (not the row index) so verbatim
    copies render byte-identical html/text — the exact-digest invariant.
    """
    import hashlib

    content_seed = int.from_bytes(
        hashlib.blake2b(" ".join(d.tokens).encode(), digest_size=8).digest(), "little"
    )
    rng = np.random.default_rng((seed << 20) ^ content_seed)
    paras = _paragraphs(d.tokens, rng)
    title = " ".join(d.tokens[:6])
    noise = int(rng.integers(0, 1_000_000))
    body_parts = [
        f'<p id="p{i}" class="x{(noise + i) % 7}">{p}</p>' for i, p in enumerate(paras)
    ]
    html = (
        f'<html><head><title>{title}</title><meta charset="utf-8">'
        f'<style>.x{noise % 7} {{color: #333}}</style>'
        f'<script>var v={noise};</script></head>'
        f'<body class="c{noise % 13}" data-v="{noise}">'
        + "".join(body_parts)
        + "</body></html>"
    )
    text = "\n".join(paras)
    return html.encode("utf-8"), text


def truth_clusters(pairs: list[dict], n: int) -> list[dict]:
    """Union-find over is_dup pairs; cluster_id = min url in component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for p in pairs:
        if not p["is_dup"]:
            continue
        ra, rb = find(p["url_a"]), find(p["url_b"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = []
    for i in range(n):
        u = url_for(i)
        out.append({"url": u, "cluster_id": find(u)})
    return out


def generate(
    out_dir: str,
    n: int,
    seed: int = 42,
    rows_per_shard: int = 25_000,
) -> str:
    """Write the fixture: sharded webtext parquet + truth sidecars + meta.json."""
    os.makedirs(out_dir, exist_ok=True)
    docs, pairs = generate_docs(n, seed)

    urls = [url_for(d.idx) for d in docs]
    ts = pa.array(
        (EPOCH_US + np.arange(n, dtype=np.int64) * 1_000_000),
        type=pa.timestamp("us"),
    )
    htmls: list[bytes] = []
    texts: list[str] = []
    for d in docs:
        h, t = render_doc(d, seed)
        htmls.append(h)
        texts.append(t)

    table = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([d.lang for d in docs], type=pa.string()),
        }
    )
    data_dir = os.path.join(out_dir, "webtext")
    os.makedirs(data_dir, exist_ok=True)
    for s, lo in enumerate(range(0, n, rows_per_shard)):
        pq.write_table(
            table.slice(lo, rows_per_shard),
            os.path.join(data_dir, f"part-{s:05d}.parquet"),
            row_group_size=8192,
        )

    pair_table = pa.table(
        {
            "url_a": pa.array([p["url_a"] for p in pairs]),
            "url_b": pa.array([p["url_b"] for p in pairs]),
            "kind": pa.array([p["kind"] for p in pairs]),
            "jaccard": pa.array([p["jaccard"] for p in pairs], type=pa.float64()),
            "is_dup": pa.array([p["is_dup"] for p in pairs]),
        }
    )
    pq.write_table(pair_table, os.path.join(out_dir, "truth_pairs.parquet"))

    clus = truth_clusters(pairs, n)
    pq.write_table(
        pa.table(
            {
                "url": pa.array([c["url"] for c in clus]),
                "cluster_id": pa.array([c["cluster_id"] for c in clus]),
            }
        ),
        os.path.join(out_dir, "truth_clusters.parquet"),
    )

    kinds: dict[str, int] = {}
    for d in docs:
        kinds[d.kind] = kinds.get(d.kind, 0) + 1
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "version": FIXTURE_VERSION,
                "n": n,
                "seed": seed,
                "kinds": kinds,
                "n_truth_pairs": len(pairs),
                "n_dup_pairs": sum(1 for p in pairs if p["is_dup"]),
            },
            f,
            indent=2,
        )
    return data_dir


def ensure_fixture(n: int, seed: int = 42, root: str = "/tmp/camden_ray_fixtures") -> str:
    """Idempotent cached generation; returns the fixture out_dir."""
    out_dir = os.path.join(root, f"webtext_n{n}_s{seed}_v{FIXTURE_VERSION}")
    marker = os.path.join(out_dir, "meta.json")
    if not os.path.exists(marker):
        generate(out_dir, n, seed)
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="Generate deterministic webtext fixture")
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.out:
        generate(args.out, args.n, args.seed)
        print(args.out)
    else:
        print(ensure_fixture(args.n, args.seed))
