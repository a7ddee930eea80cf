"""Pipeline configuration.

Generalizes the reference's ``CliConfig`` (/root/reference/src/cli.rs:7-12):
where camden exposes root/target/threading/extensions, the dedup engine pins
every semantic knob — hash seeds, shingle/signature geometry, thresholds —
so that runs are bit-reproducible (the reference is nondeterministic under
its parallel mode, /root/reference/src/scanner.rs:29,62; we strengthen that
to full determinism, see SURVEY.md §4.1 "Ordering / determinism").

All defaults match the fixture ground-truth config in FIXTURES.md §A:
Jaccard τ=0.8, k=5 word shingles, 128 permutations, 16 bands × 8 rows.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- global determinism ---
    seed: int = 42

    # --- filtering (analogue of camden's extension allow-list,
    #     /root/reference/src/scanner.rs:71-79; empty tuple = keep all) ---
    langs: tuple[str, ...] = ()
    min_text_chars: int = 1

    # --- MinHash / LSH (Broder 1997) ---
    shingle_k: int = 5            # word k-grams
    num_perms: int = 128          # signature length
    num_bands: int = 16           # b
    rows_per_band: int = 8        # r;  b * r == num_perms
    jaccard_threshold: float = 0.8  # τ — verify candidates at this level

    # --- skew control (north_rule: salted repartitioning of hot buckets) ---
    bucket_cap: int = 64          # LSH bucket size above which we salt-split
    num_salts: int = 16           # sub-buckets per hot bucket
    hot_sample_frac: float = 0.1  # seeded row-sample fraction for hot-bucket
                                  # detection (shuffle-free; FP/FN are benign:
                                  # salting a cold bucket just splits it, and a
                                  # missed warm bucket still groups correctly —
                                  # star emission is linear. Shrink at scale.)

    # --- candidate verification (signature-estimated Jaccard) ---
    verify_perms: int = 64        # signature components carried on band rows
    verify_margin: float = 0.10   # accept est >= τ - margin (2σ sampling noise)

    # --- SimHash (Charikar 2002; Manku et al. WWW'07 pigeonhole blocks) ---
    simhash_bits: int = 64
    simhash_blocks: int = 4       # pigeonhole: radius ≤ blocks - 1
    hamming_radius: int = 3
    simhash_group_cap: int = 4096  # max pairwise-compared members per bucket

    # --- substring / winnowed L-gram dedup (Lee et al. 2021) ---
    lgram_tokens: int = 50        # minimum duplicated span, in tokens
    lgram_mod: int = 8            # winnowing window w: shared spans >=
                                  # lgram_tokens + w - 1 are guaranteed detected
    lgram_group_cap: int = 1024   # max members star-linked per shared-gram bucket
    verify_substring_spans: bool = True
    # Below this many total edges, the substring anti-join + span
    # verification run INLINE on the driver (numpy passes + one broadcast-
    # prefiltered token-stream fetch) instead of two partition_map exchanges
    # — the exchanges carry ~3-4 s of fixed orchestration that dominates
    # small runs while the data involved is a few MB. Above it (or above
    # span_inline_max_endpoints distinct endpoint docs), the distributed
    # path runs — identical output, parity-tested.
    span_inline_max_edges: int = 2_000_000
    span_inline_max_endpoints: int = 300_000
    # re-verify every substring candidate edge against the actual token
    # streams (stages/spanverify.py) — a 64-bit L-gram collision cannot
    # produce a false edge; costs one candidate-subset-sized shuffle

    # --- execution ---
    materialize_candidate_rows: bool = False
    # Legacy knob (no effect): the star path now detects hot buckets from a
    # sample of the signature table and fuses salting into the expander, so
    # the candidate row set streams straight into the partitioning sort —
    # it is never materialized and the expander runs once regardless.
    batch_size: int = 256         # rows per map_batches call (html is wide;
                                  # small batches keep the actor pool saturated
                                  # and batch × concurrency inside worker heap)
    extract_concurrency: tuple[int, int] | int = (1, 8)
    # signature actor pool: (min, max) autoscale bounds, or an int for a
    # FIXED-size pool (no ramp — preferred for throughput-measured runs).
    # Only consulted when signature_actor_pool is true (or in sequential
    # mode, where (1, 1) pins a single actor).
    signature_actor_pool: bool = False
    # False (default): the signature stage runs as stateless map_batches
    # TASKS with once-per-worker-process lazy state (token-hash memo cache,
    # seeded permutations, compiled extractor) — same setup-once semantics
    # as an actor pool, but tasks reuse the session's already-warm worker
    # processes while a fresh actor pool pays ~28 process spawns + full
    # imports on EVERY execution (measured 2.1x stage wall at 100k docs/32
    # CPUs: 5.0 s vs 10.6 s). True restores the dedicated actor pool —
    # the right choice when the per-worker state must be isolated or
    # memory-capped per stage.
    shuffle_partitions: int = 0   # 0 = size from data (see rows_per_partition)
    # Push-based shuffle for the sort/repartition exchanges (Ray Data's
    # large-shuffle path: pipelined merge instead of map_blocks × P pull
    # slices). Measured on the 54M-row candidate exchange at 32 CPUs:
    # edges phase 40-60 s → 17 s. Applied to the session DataContext by
    # run_dedup.
    push_based_shuffle: bool = True
    # Reduce-partition sizing when shuffle_partitions is 0: P = max(cluster
    # CPUs, ceil(docs / rows_per_partition)). Tying P to DATA (not CPUs)
    # keeps per-partition shuffle overhead constant across cluster sizes —
    # the explicit-boundary sort creates map_blocks × P object slices, and a
    # CPU-proportional P made every shuffle stage anti-scale (measured: P=128
    # was 2× slower than P=32 on the same 1.2M-doc input at 32 CPUs).
    rows_per_partition: int = 32768

    # Above this many docs, the verification-sketch sidecar is NOT broadcast
    # (vp bytes × docs would exceed a worker node's object store comfort —
    # ~6 GB at 100M docs with vp=64); the expander instead ships each
    # minhash row's sketch through the exchange (vp bytes on each of
    # num_bands rows/doc — heavier payload, zero broadcast state) and the
    # grouper verifies from the co-shuffled column. Identical edge output
    # either way (tests force both modes).
    vsig_broadcast_max_docs: int = 100_000_000

    # --- clustering ---
    # Above this, clustering switches to distributed hash-to-min label
    # propagation. The driver path is vectorized numpy/Arrow (~7M edges in
    # ~13s, ~6 GB per 100M edges), so the bar sits where driver memory — not
    # CPU — becomes the limit; the distributed path exists for the 10^12-row
    # regime where edges themselves are object-store-scale.
    driver_unionfind_max_edges: int = 50_000_000
    methods: tuple[str, ...] = ("exact", "minhash", "simhash", "substring")

    # --- representative selection (K1 generalized) ---
    # "min_url": cluster id = lexicographic min url (the deterministic fix of
    # camden's arrival-order keep-first, /root/reference/src/operations.rs:50).
    # "quality": keep the BEST cluster member instead — argmax of the
    # fixed-point quality score (functions.text.quality_features, stamped as
    # a ``q`` column by the signature stage), min-url tiebreak so runs stay
    # bit-reproducible. Implemented by packing (q, url) into one sortable
    # key, so both the driver and the distributed clustering paths reuse the
    # min-aggregate machinery unchanged (stages/cluster.py).
    representative: str = "min_url"

    def __post_init__(self) -> None:
        if self.representative not in ("min_url", "quality"):
            raise ValueError(
                f"representative must be 'min_url' or 'quality', "
                f"got {self.representative!r}"
            )
        if self.num_bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"num_bands*rows_per_band must equal num_perms "
                f"({self.num_bands}*{self.rows_per_band} != {self.num_perms})"
            )
        if self.simhash_bits % self.simhash_blocks != 0:
            raise ValueError("simhash_bits must divide evenly into simhash_blocks")
        if self.hamming_radius >= self.simhash_blocks * (
            self.simhash_bits // self.simhash_blocks
        ):
            raise ValueError("hamming_radius too large")

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "DedupConfig":
        d = json.loads(s)
        for key in ("langs", "extract_concurrency", "methods"):
            if key in d and isinstance(d[key], list):
                d[key] = tuple(d[key])
        return cls(**d)

    def fingerprint(self) -> str:
        """Stable digest of the full config — stamped into checkpoint manifests."""
        import hashlib

        return hashlib.blake2b(self.to_json().encode(), digest_size=16).hexdigest()


DEFAULT_CONFIG = DedupConfig()
