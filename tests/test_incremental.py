"""Incremental dedup (pipelines/incremental.py): the new-shard partition must
equal the full run's partition restricted to new docs (the
bucket-completeness invariant), with stable existing cluster ids.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from camden_ray.config import DedupConfig
from camden_ray.pipelines.dedup import run_dedup
from camden_ray.pipelines.incremental import run_dedup_incremental


def _ds(rows: dict) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table(rows))


def _text_table(items: list[tuple[str, str]]) -> "ray.data.Dataset":
    return _ds(
        {
            "url": pa.array([u for u, _ in items], type=pa.string()),
            "text": pa.array([t for _, t in items], type=pa.string()),
        }
    )


def test_exact_incremental_unit():
    """New doc duplicating a base doc adopts the existing cluster id; a
    unique new doc stays a singleton."""
    cfg = DedupConfig(methods=("exact",))
    base = run_dedup(
        None,
        cfg,
        input_ds=_text_table(
            [
                ("http://a/1", "hello world one two three"),
                ("http://a/2", "hello world one two three"),
                ("http://a/3", "completely different content here"),
            ]
        ),
        extract=False,
    )
    bcl = base["clusters"].to_pandas().set_index("url")["cluster_id"]
    assert bcl["http://a/1"] == bcl["http://a/2"] == "http://a/1"

    inc = run_dedup_incremental(
        None,
        base_sig=base["signatures"],
        base_clusters=base["clusters"],
        cfg=cfg,
        extract=False,
        new_input_ds=_text_table(
            [
                ("http://b/1", "hello world one two three"),  # dup of a/1,a/2
                ("http://b/2", "nothing like anything else at all"),
            ]
        ),
    )
    icl = inc["clusters"].to_pandas().set_index("url")
    # stability: b/1 adopts the EXISTING id even though its url sorts first
    assert icl.loc["http://b/1", "cluster_id"] == "http://a/1"
    assert not icl.loc["http://b/1", "is_representative"]
    assert icl.loc["http://b/2", "cluster_id"] == "http://b/2"
    assert icl.loc["http://b/2", "is_representative"]
    assert inc["stats"]["new_docs_in_clusters"] == 1
    assert inc["stats"]["new_singletons"] == 1
    assert inc["base_merges"] == []
    ed = inc["edges"].to_pandas()
    assert len(ed) >= 1 and set(ed.method) == {"exact"}


def test_substring_bridge_merges_base_clusters():
    """A new doc containing verbatim spans of two distinct base clusters
    merges them under the lexicographically smaller existing id."""
    ta = " ".join(f"alpha{i}" for i in range(90))
    tb = " ".join(f"beta{i}" for i in range(90))
    cfg = DedupConfig(methods=("exact", "substring"))
    base = run_dedup(
        None,
        cfg,
        input_ds=_text_table(
            [("http://a/1", ta), ("http://a/2", ta), ("http://a/3", tb), ("http://a/4", tb)]
        ),
        extract=False,
    )
    bcl = base["clusters"].to_pandas().set_index("url")["cluster_id"]
    assert bcl["http://a/1"] == "http://a/1" and bcl["http://a/3"] == "http://a/3"

    inc = run_dedup_incremental(
        None,
        base_sig=base["signatures"],
        base_clusters=base["clusters"],
        cfg=cfg,
        extract=False,
        new_input_ds=_text_table([("http://b/bridge", ta + " " + tb)]),
    )
    icl = inc["clusters"].to_pandas().set_index("url")
    assert icl.loc["http://b/bridge", "cluster_id"] == "http://a/1"
    assert inc["base_merges"] == [("http://a/1", ["http://a/3"])]


def test_hot_bucket_incremental():
    """A new member of a salted hot bucket still attaches (exact counting +
    salting + rep re-link run inside the incremental exchange)."""
    cfg = DedupConfig(methods=("exact",), bucket_cap=16, num_salts=4)
    text = "the same boilerplate page body repeated everywhere"
    base = run_dedup(
        None,
        cfg,
        input_ds=_text_table([(f"http://a/{i:03d}", text) for i in range(120)]),
        extract=False,
    )
    inc = run_dedup_incremental(
        None,
        base_sig=base["signatures"],
        base_clusters=base["clusters"],
        cfg=cfg,
        extract=False,
        new_input_ds=_text_table([("http://b/new", text)]),
    )
    icl = inc["clusters"].to_pandas().set_index("url")
    assert icl.loc["http://b/new", "cluster_id"] == "http://a/000"
    assert inc["stats"]["new_docs_in_clusters"] == 1


@pytest.fixture(scope="module")
def split_fixture(fixture_dir):
    """Deterministic 80/20 split of the shared tiny fixture by doc index."""
    t = pq.read_table(
        sorted(
            os.path.join(fixture_dir, "webtext", f)
            for f in os.listdir(os.path.join(fixture_dir, "webtext"))
            if f.endswith(".parquet")
        )[0]
    )
    urls = t["url"].to_pylist()
    new_mask = np.array([i % 5 == 0 for i in range(len(urls))])
    base_t = t.filter(pa.array(~new_mask))
    new_t = t.filter(pa.array(new_mask))
    return t, base_t, new_t


def test_fixture_parity_with_full_run(split_fixture, truth_pairs):
    """Partition of new docs == full run's partition restricted to new docs;
    attachments agree with full-run co-membership; recall holds on
    new-touching true pairs."""
    all_t, base_t, new_t = split_fixture
    cfg = DedupConfig()
    full = run_dedup(None, cfg, input_ds=ray.data.from_arrow(all_t), extract=True)
    base = run_dedup(None, cfg, input_ds=ray.data.from_arrow(base_t), extract=True)
    inc = run_dedup_incremental(
        None,
        base_sig=base["signatures"],
        base_clusters=base["clusters"],
        cfg=cfg,
        extract=True,
        new_input_ds=ray.data.from_arrow(new_t),
    )

    new_urls = set(new_t["url"].to_pylist())
    fcl = full["clusters"].to_pandas().set_index("url")["cluster_id"]
    bcl = base["clusters"].to_pandas().set_index("url")["cluster_id"]
    icl = inc["clusters"].to_pandas().set_index("url")["cluster_id"]
    assert set(icl.index) == new_urls

    # 1. partition equality over new docs (naming-agnostic)
    def groups(series, members):
        out = {}
        for u in members:
            out.setdefault(series[u], set()).add(u)
        return {frozenset(v) for v in out.values()}

    assert groups(icl, new_urls) == groups(fcl[list(new_urls)], new_urls)

    # 2. attachment consistency: a new doc adopting base id C shares the
    # full run's cluster with C's url; an unattached new doc shares its
    # full-run cluster with NO base doc
    full_groups = {}
    for u, c in fcl.items():
        full_groups.setdefault(c, set()).add(u)
    for u in new_urls:
        cid = icl[u]
        if cid in new_urls:  # named by a new url ⇒ no base attachment
            members = full_groups[fcl[u]]
            assert not (members - new_urls), (
                f"{u} unattached incrementally but full run clusters it "
                f"with base docs {sorted(members - new_urls)[:3]}"
            )
        else:
            assert fcl[u] == fcl[cid], (u, cid)

    # 3. recall on true dup pairs touching the new shard
    dup = truth_pairs[truth_pairs.is_dup]
    member = dict(icl)
    member.update({u: c for u, c in bcl.items()})
    # base docs merged by new bridges share the kept id
    merged = {m: kept for kept, ms in inc["base_merges"] for m in ms}
    hits = total = 0
    for p in dup.itertuples():
        if p.url_a not in new_urls and p.url_b not in new_urls:
            continue
        total += 1
        ca = merged.get(member[p.url_a], member[p.url_a])
        cb = merged.get(member[p.url_b], member[p.url_b])
        hits += ca == cb
    assert total > 0
    assert hits / total >= 0.99, f"incremental recall {hits}/{total}"


@pytest.fixture(scope="module")
def truth_pairs(fixture_dir):
    return pq.read_table(
        os.path.join(fixture_dir, "truth_pairs.parquet")
    ).to_pandas()


def test_distributed_delta_matches_driver_path(split_fixture):
    """Force the scale path (driver_unionfind_max_edges=0): the distributed
    delta clustering — co-partition base-rep remap, hash-to-min, shuffle
    assignment, NO edge-sized driver state — must produce the SAME new-shard
    clusters, base merges and stats as the driver union-find path."""
    _, base_t, new_t = split_fixture
    cfg = DedupConfig()
    base = run_dedup(None, cfg, input_ds=ray.data.from_arrow(base_t), extract=True)

    def attach(c):
        return run_dedup_incremental(
            None,
            base_sig=base["signatures"],
            base_clusters=base["clusters"],
            cfg=c,
            extract=True,
            new_input_ds=ray.data.from_arrow(new_t),
        )

    drv = attach(cfg)
    dist = attach(DedupConfig(driver_unionfind_max_edges=0))
    assert dist["stats"]["edges_total"] > 0  # the forced path actually ran

    a = drv["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    b = dist["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    assert drv["base_merges"] == dist["base_merges"]
    assert drv["stats"] == dist["stats"]
    assert "clustering_distributed" in dist["timings"]


def test_distributed_delta_no_base_clusters(ray_session):
    """Scale path with base_clusters=None (duplicate-free base): base
    endpoints act as their own reps; parity with the driver path."""
    cfg = DedupConfig(methods=("exact",))
    base = run_dedup(
        None, cfg, extract=False,
        input_ds=_text_table(
            [("http://a/1", "one two three four five"),
             ("http://a/2", "six seven eight nine ten")]
        ),
    )

    def attach(c):
        return run_dedup_incremental(
            None, base_sig=base["signatures"], base_clusters=None,
            cfg=c, extract=False,
            new_input_ds=_text_table(
                [("http://b/1", "one two three four five"),
                 ("http://b/2", "unrelated words entirely here now")]
            ),
        )

    drv = attach(cfg)
    dist = attach(DedupConfig(methods=("exact",), driver_unionfind_max_edges=0))
    a = drv["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    b = dist["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    assert a.set_index("url").loc["http://b/1", "cluster_id"] == "http://a/1"


def test_url_in_both_shards_parity(ray_session):
    """A url present in BOTH the base corpus and the new shard (a re-crawl)
    must be treated as a NEW doc in both clustering regimes — the
    distributed path's base-rep remap must not swallow it (new-membership
    precedence, same rule as the driver path)."""
    cfg = DedupConfig(methods=("exact",))
    base = run_dedup(
        None, cfg, extract=False,
        input_ds=_text_table(
            [("http://a/1", "alpha beta gamma delta epsilon"),
             ("http://a/2", "alpha beta gamma delta epsilon"),
             ("http://a/3", "zeta eta theta iota kappa")]
        ),
    )

    new_rows = [
        # same URL re-crawled, same content: must adopt its own base cluster
        ("http://a/2", "alpha beta gamma delta epsilon"),
        ("http://b/1", "zeta eta theta iota kappa"),  # dup of a/3
        ("http://b/2", "totally fresh content right here"),
    ]

    def attach(c):
        return run_dedup_incremental(
            None, base_sig=base["signatures"], base_clusters=base["clusters"],
            cfg=c, extract=False, new_input_ds=_text_table(new_rows),
        )

    drv = attach(cfg)
    dist = attach(DedupConfig(methods=("exact",), driver_unionfind_max_edges=0))
    a = drv["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    b = dist["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b), (a, b)
    assert drv["stats"] == dist["stats"]
    m = a.set_index("url")["cluster_id"]
    assert m["http://a/2"] == "http://a/1"  # re-crawl adopts its base cluster
    assert m["http://b/1"] == "http://a/3"


def test_recrawl_of_base_rep_bridging_merge(ray_session):
    """A re-crawled BASE REP url whose new content duplicates another base
    cluster: the component must be named by the MIN existing cluster id
    (naming contract: existing ids take priority even though the re-crawl
    is clustered as a new doc), the merge must be reported, and both
    clustering regimes must agree."""
    cfg = DedupConfig(methods=("exact",))
    base = run_dedup(
        None, cfg, extract=False,
        input_ds=_text_table(
            [("http://a/1", "alpha beta gamma delta"),
             ("http://c/1", "omega psi chi phi")]
        ),
    )

    # re-crawl of a/1 whose content now duplicates cluster C
    new_rows = [("http://a/1", "omega psi chi phi")]

    def attach(c):
        return run_dedup_incremental(
            None, base_sig=base["signatures"], base_clusters=base["clusters"],
            cfg=c, extract=False, new_input_ds=_text_table(new_rows),
        )

    drv = attach(cfg)
    dist = attach(DedupConfig(methods=("exact",), driver_unionfind_max_edges=0))
    for res in (drv, dist):
        m = res["clusters"].to_pandas().set_index("url")["cluster_id"]
        assert m["http://a/1"] == "http://a/1"  # min existing id
        assert res["base_merges"] == [("http://a/1", ["http://c/1"])]
    assert drv["stats"] == dist["stats"]


def test_recrawl_no_base_state_keeps_base_identity(ray_session):
    """base_clusters=None: a re-crawled base url Z bridged by a new dup A<Z
    must still name the cluster Z (the base doc's identity survives), in
    both regimes, with consistent stats."""
    cfg = DedupConfig(methods=("exact",))
    base = run_dedup(
        None, cfg, extract=False,
        input_ds=_text_table([("http://z/9", "one two three four")]),
    )

    new_rows = [
        ("http://z/9", "one two three four"),   # re-crawl of base doc
        ("http://a/0", "one two three four"),   # new dup, url < z
    ]

    def attach(c):
        return run_dedup_incremental(
            None, base_sig=base["signatures"], base_clusters=None,
            cfg=c, extract=False, new_input_ds=_text_table(new_rows),
        )

    drv = attach(cfg)
    dist = attach(DedupConfig(methods=("exact",), driver_unionfind_max_edges=0))
    for res in (drv, dist):
        m = res["clusters"].to_pandas().set_index("url")["cluster_id"]
        assert m["http://a/0"] == "http://z/9"
        assert m["http://z/9"] == "http://z/9"
    assert drv["stats"] == dist["stats"]
    assert drv["stats"]["new_docs_in_clusters"] == 2


def test_empty_new_shard(ray_session):
    """An empty crawl shard returns zero-doc stats instead of crashing."""
    cfg = DedupConfig(methods=("exact",))
    base = run_dedup(
        None, cfg, extract=False,
        input_ds=_text_table([("http://a/1", "one two three")]),
    )
    inc = run_dedup_incremental(
        None, base_sig=base["signatures"], base_clusters=base["clusters"],
        cfg=cfg, extract=False, new_input_ds=_text_table([]),
    )
    assert inc["stats"]["new_docs"] == 0
    assert inc["clusters"].count() == 0
    assert inc["base_merges"] == []
