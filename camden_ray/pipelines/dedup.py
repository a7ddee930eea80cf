"""The flagship pipeline: webtext → extract → signatures → candidate shuffles
→ union-find → cluster assignments → kept/removed outputs.

Row-granular generalization of camden's whole program
(/root/reference/src/main.rs:16-55): scan → checksum → group → report/move,
widened to four dup methods and made deterministic, distributed, resumable.

Dataflow (SURVEY.md §3.4)::

    read_parquet(webtext)                         # S1
      → map_batches(SignatureActor(extract=True)) # fused actor pool: html→text
        (M1 invariant) + digest+minhash+simhash+lgrams in one pass
      → [checkpoint: signatures]                  # compact; html/text dropped
      ├→ unified star shuffle (exact + minhash-LSH + substring L-grams,
      │    branch-salted keys, hot buckets salt-split)    # shuffle 1 (G1)
      ├→ simhash : pigeonhole rows → partition pairwise   # shuffle 2
      → union(edges) → [checkpoint: edges]
      → union-find (driver; distributed hash-to-min above threshold)
      → assignments broadcast → clusters / kept / removed parquet   # W2/W3
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from camden_ray.config import DedupConfig
from camden_ray.sources.webtext import read_webtext
from camden_ray.stages.signatures import SignatureActor
from camden_ray.state.checkpoint import Checkpointer, input_fingerprint


class LazyResult(dict):
    """run_dedup's result dict with deferred-construction values.

    Some result views cost a corpus-scale pass just to CONSTRUCT (the url
    edge view's endpoint resolution scans the signature table) — registering
    them as thunks keeps that pass off the critical path of callers that
    never read them. ``res["edges"]`` builds on first access and caches.
    Note plain ``dict.get``/iteration do NOT trigger construction — public
    callers use item access.
    """

    def __init__(self, base: dict, lazy: dict | None = None):
        super().__init__(base)
        self._lazy = dict(lazy or {})

    def __getitem__(self, k):
        if not super().__contains__(k) and k in self._lazy:
            self[k] = self._lazy.pop(k)()
        return super().__getitem__(k)

    def __contains__(self, k):
        return super().__contains__(k) or k in self._lazy


def signature_table(
    ds: "ray.data.Dataset",
    cfg: DedupConfig,
    extract: bool = True,
    coalesce: bool = True,
) -> "ray.data.Dataset":
    """text/html rows → compact signature table (url, digest, sig, simhash, lgrams).

    With ``extract=True`` the extraction runs INSIDE the signature actor
    (fused stage): one actor pool instead of two chained pools, and the wide
    html batches never make an extra object-store round trip. Extraction
    semantics are identical to the standalone :class:`HtmlExtractorActor`
    (byte-identical text per url — asserted in tests/test_extract.py).
    """
    from camden_ray.stages.candidates import default_partitions
    from camden_ray.stages.signatures import signature_map_fn

    sequential = cfg.extract_concurrency in ((1, 1), 1)
    if cfg.signature_actor_pool or sequential:
        # dedicated actor pool: explicit isolation / a pinned single actor
        # for --sequential parity runs
        out = ds.map_batches(
            SignatureActor,
            fn_constructor_kwargs={"cfg": cfg, "extract": extract},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.extract_concurrency,
            num_cpus=1,
        )
    else:
        # default: stateless tasks + once-per-worker-process lazy state —
        # identical output (the state is the same SignatureActor), but no
        # per-execution actor-pool spawn (see config.signature_actor_pool)
        out = ds.map_batches(
            signature_map_fn(cfg, extract),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            num_cpus=1,
        )
    if not coalesce:
        # caller already shaped the input block count (e.g. run_dedup reads
        # with override_num_blocks=P) — skip the extra barrier + copy
        return out
    # Coalesce: the signature table inherits one block per input file; web
    # corpora arrive as thousands of small shards, and every downstream
    # shuffle pays per-block scheduling cost × output partitions (measured
    # 30× slowdown at 782 blocks vs 64 on the same rows). Minimal-movement
    # repartition, not a shuffle.
    return out.repartition(default_partitions(cfg))


def build_edges_uid(
    sig_ds: "ray.data.Dataset", cfg: DedupConfig, timings: dict | None = None
) -> "ray.data.Dataset":
    """Union of verified candidate UID-pair edges from every enabled method.

    The three star-shaped branches (exact / minhash / substring) share ONE
    unified shuffle (branch ids folded into the bucket-key space — see
    candidates.unified_star_edges_uid): one expander pass over the signature
    table, one hot-key count pass, one groupby. SimHash keeps its own
    pigeonhole shuffle. Branches run SEQUENTIALLY by default — each shuffle
    already saturates the cluster, and two concurrent streaming executions
    contend for the same slots (measured: threaded overlap was equal-or-
    slower at both 8 and 32 CPUs); set CAMDEN_THREADED_BUILDERS=1 to overlap
    anyway (can help when one branch is driver-bound). Both exchanges ship
    doc uids (int64), never url strings.
    """
    from camden_ray.stages.candidates import (
        simhash_edges_uid,
        unified_star_edges_uid,
    )

    def timed(name, f):
        def g():
            t0 = time.monotonic()
            out = f()
            if timings is not None:
                timings[name] = round(time.monotonic() - t0, 3)
            return out

        return g

    builders = []
    if set(cfg.methods) & {"exact", "minhash", "substring"}:
        builders.append(
            timed("edges_star", lambda: unified_star_edges_uid(sig_ds, cfg).materialize())
        )
    if "simhash" in cfg.methods:
        builders.append(
            timed("edges_simhash", lambda: simhash_edges_uid(sig_ds, cfg).materialize())
        )
    if not builders:
        raise ValueError("no methods enabled")
    if os.environ.get("CAMDEN_THREADED_BUILDERS"):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(builders)) as pool:
            branches = [f.result() for f in [pool.submit(b) for b in builders]]
    else:
        branches = [b() for b in builders]
    edges = branches[0]
    for b in branches[1:]:
        edges = edges.union(b)
    return edges


def build_edges(sig_ds: "ray.data.Dataset", cfg: DedupConfig) -> "ray.data.Dataset":
    """url-pair view of :func:`build_edges_uid` (public edge schema; the
    endpoint set is edge-sized — candidates.resolve_edge_urls)."""
    from camden_ray.stages.candidates import resolve_edge_urls

    return resolve_edge_urls(build_edges_uid(sig_ds, cfg), sig_ds, cfg)


def refine_substring_edges(
    edges: "ray.data.Dataset",
    sig_ds: "ray.data.Dataset",
    cfg: DedupConfig,
    timings: dict | None = None,
) -> "ray.data.Dataset":
    """Suffix-array refinement (SURVEY.md §8 TODO 3): re-verify substring
    candidate edges against the actual token-hash streams.

    Only UNCORROBORATED substring pairs are verified: a pair that is also an
    exact / minhash / simhash edge is already content-verified by that
    method, and its substring copy is redundant for clustering (union-find
    unions the pair either way) — so it is dropped, not re-proved. What
    remains is exactly the set a coarse L-gram collision could have faked.

    Verification streams come from the signature table's ``th`` column (the
    per-doc token-hash array the signature pass already computed) — no
    document is re-read, re-extracted or re-tokenized. Runs entirely in uid
    space (``edges`` are int64 uid pairs): the anti-join and the pair/stream
    co-shuffle move only ints and hash arrays, never url strings or text.
    """
    from camden_ray.stages.spanverify import (
        antijoin_pairs,
        pull_needs_csr,
        refine_substring_edges_inline,
        verify_span_edges,
    )

    # small-edge-set fast path: anti-join + span verify inline on the driver
    # (the distributed exchanges below carry fixed orchestration that
    # dominates runs whose whole edge set is a few MB)
    try:
        n_total_edges = edges.count()
    except Exception:
        n_total_edges = None
    if n_total_edges is not None and n_total_edges <= cfg.span_inline_max_edges:
        out = refine_substring_edges_inline(edges, sig_ds, cfg, timings=timings)
        if out is not None:
            return out

    sub = edges.map_batches(
        lambda t: t.filter(pc.equal(t["method"], "substring")),
        batch_format="pyarrow",
    ).select_columns(["a", "b"])
    # NOT materialized: `edges` is already materialized by the caller, and the
    # method filter is a trivial map — consuming it twice (antijoin right side
    # + final union) re-runs the filter, which is cheaper than a full extra
    # object-store copy of the edge set
    others = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["method"], "substring")),
        batch_format="pyarrow",
    )

    from camden_ray.stages.candidates import default_partitions

    # one shuffle: anti-join vs corroborating methods + per-pair dedup (the
    # same pair surfaces from several gram buckets)
    t0 = time.monotonic()
    sub = antijoin_pairs(
        sub, others.select_columns(["a", "b"]), default_partitions(cfg)
    ).materialize()
    n_sub = sub.count()
    if timings is not None:
        timings["span_antijoin"] = round(time.monotonic() - t0, 3)
        timings["span_residual_pairs"] = n_sub
    if n_sub == 0:
        return others

    # ONE driver pass builds the needs CSR (uid-keyed); the replicate pass
    # ships each referenced doc's token-hash stream to exactly the
    # partitions whose pairs need it
    csr = pull_needs_csr(sub, default_partitions(cfg))
    ths = sig_ds.select_columns(["uid", "th"]).map_batches(
        lambda t: pa.table({"url": t["uid"], "text": t["th"]}),
        batch_format="pyarrow",
    )

    t0 = time.monotonic()
    verified = verify_span_edges(sub, ths, cfg, needs_csr=csr).materialize()
    if os.environ.get("CAMDEN_STAGE_STATS"):
        import sys as _sys

        print("== span_verify stats ==\n" + verified.stats(), file=_sys.stderr)
    if timings is not None:
        timings["span_verify_exec"] = round(time.monotonic() - t0, 3)
        timings["span_verified_pairs"] = verified.count()
        if csr is not None:
            timings["span_endpoint_urls"] = len(csr[0])
    return others.union(verified)


def run_dedup(
    input_path: str | list[str],
    cfg: DedupConfig | None = None,
    out_dir: str | None = None,
    extract: bool = True,
    input_ds: "ray.data.Dataset | None" = None,
    sig_ds: "ray.data.Dataset | None" = None,
    input_format: str = "parquet",
) -> dict[str, Any]:
    """Run the full dedup pipeline.

    Returns dict with Datasets: ``clusters`` (url, cluster_id,
    is_representative), ``edges``, ``kept``, ``removed`` and driver-side
    ``stats`` (the MoveStats analogue, /root/reference/src/operations.rs:9-11).

    With ``out_dir`` set, every stage checkpoints (resume = rerun with the
    same out_dir; finished stages are skipped via manifest fingerprints).

    ``sig_ds``: a precomputed (materialized) signature table — skips the
    read + signature stages (no-checkpoint mode only; callers that run
    several pipeline variants over one corpus share the table instead of
    re-extracting per variant — see pipelines/queries.py's session cache).
    """
    cfg = cfg or DedupConfig()
    if sig_ds is not None and out_dir:
        raise ValueError("sig_ds injection is no-checkpoint mode only")
    columns = ["url", "html"] if extract else ["url", "text"]
    ds = None
    if sig_ds is not None:
        pass
    elif input_ds is not None:
        ds = input_ds
    else:
        from camden_ray.sources.webtext import read_webtext_any

        ds = read_webtext_any(
            input_path, input_format, columns=columns, langs=cfg.langs,
            min_text_chars=0 if extract else cfg.min_text_chars,
        )
        if input_format == "jsonl":
            # JSON has no metadata row-count fast path, so the
            # partition-sizing count() below would execute the whole decode
            # and the signature stage would re-execute it; materialize ONCE
            # instead (spillable; the count then reads block metadata)
            ds = ds.materialize()

    if cfg.push_based_shuffle:
        from ray.data import DataContext

        DataContext.get_current().use_push_based_shuffle = True

    coalesce = True
    if not cfg.shuffle_partitions:
        # Freeze a DATA-sized reduce-partition count for the whole run (see
        # config.rows_per_partition): every default_partitions(cfg) call
        # downstream then agrees, with no per-callsite plumbing. The count
        # is parquet-metadata-only for fresh reads — no execution.
        from dataclasses import replace

        from camden_ray.stages.candidates import partitions_for

        try:
            n_in = (sig_ds if sig_ds is not None else ds).count()
        except Exception:
            n_in = 0
        cfg = replace(cfg, shuffle_partitions=partitions_for(cfg, n_in))
        if input_ds is None and sig_ds is None and input_format != "jsonl":
            # re-shape the read to >= P blocks up front: the signature table
            # then needs no coalescing repartition (one barrier + full copy
            # saved). Block count also bounds signature TASK granularity: with
            # exactly P blocks, a wide actor pool quantizes into few huge
            # tasks (92 blocks / 28 actors = 3.3 waves; the last wave leaves
            # most of the pool idle behind ~40 s stragglers — measured ~15%
            # of the stage wall at 3M docs / 32 CPUs). 4 tasks per actor
            # keeps the tail short; the downstream sort is insensitive to
            # map-side block count at this magnitude.
            actors = cfg.extract_concurrency
            if isinstance(actors, tuple):
                actors = actors[-1]
            read_blocks = max(cfg.shuffle_partitions, 4 * int(actors))
            ds = read_webtext(
                input_path, columns=columns, langs=cfg.langs,
                min_text_chars=0 if extract else cfg.min_text_chars,
                override_num_blocks=read_blocks,
            )
            coalesce = False

    ckpt = Checkpointer(out_dir, cfg) if out_dir else None
    in_fp = input_fingerprint(input_path) if isinstance(input_path, (str, list)) and input_path else "adhoc"

    timings: dict[str, float] = {}

    def _uid_edges(sig: "ray.data.Dataset") -> "ray.data.Dataset":
        t0 = time.monotonic()
        e = build_edges_uid(sig, cfg, timings=timings).materialize()
        timings["edges"] = round(time.monotonic() - t0, 3)
        if "substring" in cfg.methods and cfg.verify_substring_spans:
            t0 = time.monotonic()
            e = refine_substring_edges(e, sig, cfg, timings=timings)
            e = e.materialize()
            timings["span_verify"] = round(time.monotonic() - t0, 3)
        return e

    def _edges_url_view(e_uid: "ray.data.Dataset") -> "ray.data.Dataset":
        # urls re-enter the dataflow only here, for the PUBLIC edge view.
        # The view stays lazy: clustering runs in uid space, so resolution
        # executes only when a caller actually consumes the url edges
        # (report sinks, tests) — it is not on the clusters critical path.
        from camden_ray.stages.candidates import resolve_edge_urls

        return resolve_edge_urls(e_uid, sig_ds, cfg)

    def _uid_view(e_url: "ray.data.Dataset") -> "ray.data.Dataset":
        # checkpoint-resume path: the persisted edge stage is url-keyed;
        # re-derive the uid pairs (the same vectorized hash the signature
        # stage stamps) for uid-space clustering
        from camden_ray.functions.hashing import hash_string_column

        def h(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "a": pa.array(
                        hash_string_column(t["a"]).view(np.int64), type=pa.int64()
                    ),
                    "b": pa.array(
                        hash_string_column(t["b"]).view(np.int64), type=pa.int64()
                    ),
                }
            )

        return e_url.map_batches(h, batch_format="pyarrow")

    if ckpt:
        sig_ds, sig_fp = ckpt.run_stage(
            "signatures", in_fp, lambda: signature_table(ds, cfg, extract=extract, coalesce=coalesce)
        )
        edges, edge_fp = ckpt.run_stage(
            "edges", sig_fp, lambda: _edges_url_view(_uid_edges(sig_ds))
        )
        uid_edges = _uid_view(edges)
    else:
        # no checkpoint dir: materialize the compact signature table once so
        # the four candidate branches don't re-execute extraction per branch
        if sig_ds is None:
            t0 = time.monotonic()
            sig_ds = signature_table(
                ds, cfg, extract=extract, coalesce=coalesce
            ).materialize()
            timings["signatures"] = round(time.monotonic() - t0, 3)
        else:
            timings["signatures"] = 0.0  # injected precomputed table
        t0 = time.monotonic()
        uid_edges = _uid_edges(sig_ds)
        timings["edges_total"] = round(time.monotonic() - t0, 3)
        # DEFERRED: resolving uids back to urls costs an endpoint scan of the
        # edge set plus a full (uid, url) pass over the signature table just
        # to CONSTRUCT the view — clustering never needs it, so it runs only
        # when a caller actually reads result["edges"] (LazyResult below).
        edges = None
        edge_fp = "adhoc"

    t0 = time.monotonic()
    n_edges = uid_edges.count()
    timings["edges_count"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    uf = None
    if n_edges <= cfg.driver_unionfind_max_edges:
        # small regime: driver union-find on int64 uid pairs + broadcast of
        # three flat arrays (uid→root and root→min-url). Strings never enter
        # the driver algorithm; the representative contract (cluster id =
        # lexicographic min url of the component) is computed by one parallel
        # Arrow group_by pass over the (uid, url) table.
        from camden_ray.stages.cluster import (
            component_min_urls,
            make_uid_assigner,
            unionfind_uid,
        )

        uf = unionfind_uid(uid_edges)
        timings["unionfind"] = round(time.monotonic() - t0, 3)
        if uf is None:
            nodes = np.empty(0, dtype=np.int64)
            roots = np.empty(0, dtype=np.int64)
            from camden_ray.stages.cluster import _empty_comp_table

            nodes_ref, roots_ref = ray.put(nodes), ray.put(roots)
            comp_ref = ray.put(_empty_comp_table())
            n_reps_small = 0
        else:
            nodes, roots = uf
            t1 = time.monotonic()
            # comp_ref IS the assignment broadcast object (merged in-cluster;
            # component-sized strings never cross the driver). Quality mode:
            # the same min aggregate runs over skey-packed urls, selecting
            # the argmax-quality member (cluster.quality_rep_view).
            if cfg.representative == "quality":
                from camden_ray.stages.cluster import (
                    REP_PREFIX_LEN,
                    quality_rep_view,
                )

                rep_view, strip = quality_rep_view(sig_ds), REP_PREFIX_LEN
            else:
                rep_view, strip = sig_ds, 0
            comp_ref, n_reps_small, nodes_ref, roots_ref = component_min_urls(
                rep_view, nodes, roots, strip=strip
            )
            timings["comp_minurls"] = round(time.monotonic() - t1, 3)
        clusters = sig_ds.select_columns(["url", "uid"]).map_batches(
            make_uid_assigner(nodes_ref, roots_ref, comp_ref),
            batch_format="pyarrow",
        )
        n_clustered_small = len(nodes)
    else:
        # scale path: distributed hash-to-min components + shuffle-join
        # assignment — NO driver-side assignment map at any point (the regime
        # that triggers this path is exactly the one where it wouldn't fit).
        # Runs directly on the candidate shuffles' int64 uid edges with the
        # signature table as the (uid → url) dimension: the url-pair edge
        # view is never materialized for clustering, and no url is re-hashed.
        from camden_ray.stages.candidates import default_partitions
        from camden_ray.stages.cluster import (
            assign_clusters_distributed_uid,
            hash_to_min_components_uid,
        )

        P = default_partitions(cfg)
        if cfg.representative == "quality":
            # skey-packed node dimension: the distributed groupby-Min fixup
            # then selects quality-argmax reps; prefix stripped before the
            # assignment join (comp's own url column stays skeyed — unused
            # by the assigner's dim side)
            from camden_ray.stages.cluster import quality_rep_view, strip_rep_prefix

            node_dim = quality_rep_view(sig_ds)
        else:
            node_dim = sig_ds.select_columns(["uid", "url"])
        comp = hash_to_min_components_uid(
            uid_edges, node_dim, num_partitions=P
        ).materialize()
        if cfg.representative == "quality":
            comp = strip_rep_prefix(comp).materialize()
        clusters = assign_clusters_distributed_uid(
            sig_ds.select_columns(["url", "uid"]), comp, num_partitions=P
        )
    timings["clustering"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    if uf is not None or n_edges <= cfg.driver_unionfind_max_edges:
        n_clustered = n_clustered_small
        n_reps_in_comps = n_reps_small
    else:  # distributed stats: count components without collecting them
        n_clustered = comp.count()
        n_reps_in_comps = comp.groupby("cluster_id").count().count()

    if ckpt:
        clusters, _ = ckpt.run_stage(
            "clusters", edge_fp, lambda: clusters, params=str(n_clustered)
        )
    else:
        # executed by stats below AND by the caller — materialize once
        clusters = clusters.materialize()
    timings["assign"] = round(time.monotonic() - t0, 3)

    kept = clusters.filter(expr="is_representative == True")
    removed = clusters.filter(expr="is_representative == False")

    if out_dir:
        kept.write_parquet(os.path.join(out_dir, "kept"))
        removed.write_parquet(os.path.join(out_dir, "removed"))
        ckpt.write_metrics()

    n_total = clusters.count()
    stats = {
        "rows": n_total,
        "edges": n_edges,
        "clustered_urls": n_clustered,
        "clusters_nontrivial": n_reps_in_comps,
        "duplicates_removed": n_clustered - n_reps_in_comps,
    }
    base = {
        "clusters": clusters,
        "kept": kept,
        "removed": removed,
        # materialized signature table — the corpus state an incremental run
        # (pipelines/incremental.py) matches new shards against
        "signatures": sig_ds,
        "stats": stats,
        # wall-clock per stage — kept OUT of stats so result comparisons
        # across runs/paths stay deterministic
        "timings": timings,
        "config": cfg,
    }
    if edges is not None:  # checkpoint path: the url view is the persisted stage
        base["edges"] = edges
        return LazyResult(base)
    return LazyResult(base, {"edges": lambda: _edges_url_view(uid_edges)})
