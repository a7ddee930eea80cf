"""Signature stage: one vectorized pass producing every dedup signal per row.

Generalizes camden's single per-file checksum (/root/reference/src/scanner.rs:81-95)
into four row-granular signals computed together over shared token hashes
(one tokenization, one shingle pass per document):

  digest   : int64   — exact content digest (blake2b-8 of text bytes)
  sig      : binary  — MinHash signature, num_perms × u64 little-endian
  simhash  : int64   — 64-bit SimHash of the shingle set
  lgrams   : list<int64> — content-defined sample of L-token rolling-gram
                           hashes (winnowed substring-dedup seeds)

Stateful actor pool: the token-hash memo cache and the seeded MinHash
permutation parameters are built once per actor (``__init__``), then every
batch is numpy-vectorized (``np.minimum.reduceat`` / ``np.add.reduceat``
over the concatenated shingle arrays — no per-permutation Python loops over
documents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from camden_ray.config import DedupConfig
from camden_ray.functions.hashing import (
    BatchTokenHasher,
    batch_winnowed_lgrams,
    digest_string_array_u64,
    flat_rolling_grams,
    hash_string_column,
    minhash_params,
    seg_positions,
)

SIG_COLUMNS = ["url", "uid", "digest", "sig", "vsig", "simhash", "lgrams", "th"]


def _list_array(counts: np.ndarray, flat_i64: np.ndarray) -> pa.ListArray:
    """list<int64> column from per-row counts + concatenated values —
    no per-row Python list objects."""
    off = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=off[1:])
    return pa.ListArray.from_arrays(pa.array(off), pa.array(flat_i64))

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
# bit 0 of each 16-bit lane — the 4-lane packed SimHash vote accumulator mask
_LANE_MASK = np.uint64(0x0001000100010001)


class SignatureActor:
    """``map_batches`` callable class: text rows → signature rows.

    Usage::

        ds.map_batches(SignatureActor, fn_constructor_kwargs={"cfg": cfg},
                       batch_format="pyarrow", batch_size=cfg.batch_size,
                       concurrency=..., num_cpus=1)
    """

    def __init__(
        self, cfg: DedupConfig | None = None, extract: bool = False
    ) -> None:
        self.cfg = cfg or DedupConfig()
        self.hasher = BatchTokenHasher(seed=self.cfg.seed)
        self.perm_a, self.perm_b = minhash_params(self.cfg.num_perms, self.cfg.seed)
        # token-hash streams are consumed only by substring span verification
        self._emit_th = (
            "substring" in self.cfg.methods and self.cfg.verify_substring_spans
        )
        self._shifts = np.arange(64, dtype=np.uint64)
        self._bit_vals = np.uint64(1) << self._shifts
        # fused extract+signature mode: one actor pool instead of two chained
        # pools, and the wide html batches never transit the object store
        # between stages (same extraction semantics as HtmlExtractorActor)
        self._extractor = None
        if extract:
            from camden_ray.stages.extract import FastTextExtractor

            self._extractor = FastTextExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        if self._extractor is not None:
            # identical semantics to the standalone HtmlExtractorActor
            # (asserted by tests/test_extract.py::test_fused_equals_standalone):
            # null html keeps any existing text (else ""), parser exceptions
            # fall back to "" instead of killing the pipeline.
            htmls = batch.column("html").to_pylist()
            existing = (
                batch.column("text").to_pylist()
                if "text" in batch.column_names
                else [None] * len(htmls)
            )
            texts = []
            for raw, fallback in zip(htmls, existing):
                if raw is None:
                    texts.append(fallback if fallback is not None else "")
                    continue
                if isinstance(raw, bytes):
                    raw = raw.decode("utf-8", "replace")
                try:
                    texts.append(self._extractor.extract(raw))
                except Exception:
                    texts.append("")
            try:
                text_arr = pa.array(texts, type=pa.string())
            except pa.ArrowInvalid:
                # lone surrogates can't live in Arrow strings; no valid
                # extractor output contains them (inputs are decoded with
                # errors="replace"), but a defensive degrade beats a crash
                texts = [
                    t.encode("utf-8", "replace").decode("utf-8") for t in texts
                ]
                text_arr = pa.array(texts, type=pa.string())
        else:
            text_arr = batch.column("text")
            if isinstance(text_arr, pa.ChunkedArray):
                text_arr = text_arr.combine_chunks()
        n = len(text_arr)

        # content digest straight off the UTF-8 buffer (blake2b per row —
        # the streaming-checksum invariant, camden M1)
        digests = digest_string_array_u64(text_arr, seed=cfg.seed)

        # batch-vectorized tokenize + token hashing (BatchTokenHasher:
        # ASCII docs never touch per-token Python; values bit-identical to
        # the per-doc reference path) — everything downstream runs on the
        # batch-flat stream
        th_flat, th_lens = self.hasher.hash_array(text_arr)
        th_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(th_lens, out=th_off[1:])

        # --- shingle sets, batch-flat: k-gram rolling hashes over the flat
        # token stream (value-identical to per-doc shingle_hashes — the gram
        # value is position-independent), short-doc unigram fallbacks ---
        k = cfg.shingle_k
        gm = np.maximum(th_lens - k + 1, 0)
        g_all = flat_rolling_grams(th_flat, k)
        has = gm > 0
        short = ~has & (th_lens > 0)  # unigram "shingles" keep segments non-empty
        # per-doc sorted-unique shingle segments, assembled in doc order:
        # one working buffer gathered in doc order, in-place per-segment
        # sorts, then ONE global dedup mask + bincount. Byte-identical to
        # per-doc np.unique (sorted distinct per segment) while skipping
        # np.unique's per-call machinery (~8 allocations/doc — measured
        # 1.5x at 256-doc batches; a global (value, doc) lexsort is worse
        # still, 7x at 350k grams/2048 docs).
        empty = th_lens == 0  # tokenless doc: its digest is its one "shingle"
        src_counts = np.where(has, gm, np.where(short, th_lens, 1))
        total_src = int(src_counts.sum())
        buf = np.empty(total_src, dtype=np.uint64)
        dst = np.zeros(n, dtype=np.int64)
        np.cumsum(src_counts[:-1], out=dst[1:])
        if has.any():
            buf[seg_positions(dst[has], gm[has])] = g_all[
                seg_positions(th_off[:-1][has], gm[has])
            ]
        if short.any():
            buf[seg_positions(dst[short], th_lens[short])] = th_flat[
                seg_positions(th_off[:-1][short], th_lens[short])
            ]
        if empty.any():
            buf[dst[empty]] = digests[empty]
        for s, m in zip(dst.tolist(), src_counts.tolist()):
            if m > 1:
                buf[s : s + m].sort()
        if total_src:
            keepm = np.empty(total_src, dtype=bool)
            keepm[0] = True
            np.not_equal(buf[1:], buf[:-1], out=keepm[1:])
            keepm[dst] = True
            S = buf[keepm]
            doc_ids = np.repeat(np.arange(n), src_counts)
            sh_counts = np.bincount(doc_ids[keepm], minlength=n).astype(np.int64)
        else:
            S = np.empty(0, dtype=np.uint64)
            sh_counts = np.zeros(n, dtype=np.int64)
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(sh_counts[:-1], out=offsets[1:])

        # winnowed L-gram substring fingerprints: guaranteed shared selection
        # for any shared span >= lgram_tokens + lgram_mod - 1 tokens; one
        # batch-vectorized pass (value-identical to the per-doc loop)
        lg_flat, lg_counts = batch_winnowed_lgrams(
            th_flat, th_lens, th_off, cfg.lgram_tokens, cfg.lgram_mod
        )

        # --- MinHash: perm p → min over each doc's shingle segment ---
        # one reused hv buffer + reduceat(out=) — the naive `a*S + b` form
        # allocates two shingle-stream temps per permutation (×128)
        sigs = np.empty((cfg.num_perms, n), dtype=np.uint64)
        if n:
            hv = np.empty(len(S), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for p in range(cfg.num_perms):
                    np.multiply(S, self.perm_a[p], out=hv)
                    hv += self.perm_b[p]
                    np.minimum.reduceat(hv, offsets, out=sigs[p])
        sigs = np.ascontiguousarray(sigs.T)  # (n, num_perms)

        # --- SimHash: sign of per-bit vote over the shingle set ---
        # 64 contiguous bit-plane passes, each a 1-D ``np.add.reduceat``
        # segment-sum. (The obvious 2-D ``np.add.reduceat(bits, offsets,
        # axis=0)`` walks segments in a slow generic inner loop — measured
        # 24 s vs 0.08 s per 1024-doc batch; a column-wise cumsum over the
        # unpacked bit matrix is nearly as bad at ~9 s.)
        if n:
            seg_sizes_1d = np.diff(np.append(offsets, len(S)))
            votes = np.empty((64, n), dtype=np.uint64)
            if seg_sizes_1d.max(initial=0) < 0x10000:
                # 4 bit-planes per pass: bits b, b+16, b+32, b+48 live in the
                # four 16-bit lanes of one u64 accumulator, so each reduceat
                # sums four counters at once (16 passes, measured 3.2x the
                # 64-pass form). Lanes cannot carry while every segment is
                # < 65536 shingles; bigger docs take the plain path below.
                acc = np.empty(len(S), dtype=np.uint64)
                packed = np.empty(n, dtype=np.uint64)
                m16 = np.uint64(0xFFFF)
                for b in range(16):
                    np.right_shift(S, np.uint64(b), out=acc)
                    acc &= _LANE_MASK
                    np.add.reduceat(acc, offsets, out=packed)
                    votes[b] = packed & m16
                    votes[b + 16] = (packed >> np.uint64(16)) & m16
                    votes[b + 32] = (packed >> np.uint64(32)) & m16
                    votes[b + 48] = (packed >> np.uint64(48)) & m16
            else:
                one = np.uint64(1)
                for b in range(64):
                    np.add.reduceat((S >> np.uint64(b)) & one, offsets, out=votes[b])
            seg_sizes = seg_sizes_1d.astype(np.uint64)[None, :]
            simhash_bits = (votes * np.uint64(2) > seg_sizes).astype(np.uint64)
            simhash = np.bitwise_or.reduce(
                simhash_bits * self._bit_vals[:, None], axis=0
            )
        else:
            simhash = np.empty(0, dtype=np.uint64)

        # binary signature column from ONE buffer (row i = sigs[i].tobytes())
        sw = cfg.num_perms * 8
        sig_off = np.arange(n + 1, dtype=np.int32) * sw
        sig_col = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(sig_off.tobytes()), pa.py_buffer(sigs.tobytes())],
        )
        # quantized verification sketch (low byte of the first verify_perms
        # components): computed here for free — the sidecar broadcast pass
        # then scans vp bytes/doc instead of the full num_perms*8 sig column
        # (measured: the sidecar build was half the star-branch wall at 3M)
        vp = cfg.verify_perms
        q = (sigs[:, :vp] & np.uint64(0xFF)).astype(np.uint8)
        voffsets = np.arange(n + 1, dtype=np.int32) * vp
        vsig = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(voffsets.tobytes()), pa.py_buffer(q.tobytes())],
        )
        cols = {
            "url": batch.column("url"),
            # uid: vectorized 64-bit url key hash — the doc's int identity
            # through every candidate shuffle (string urls are resolved
            # back only for the emitted edges; shipping them per candidate
            # row made the star exchange ~25x slower, see candidates.py)
            "uid": pa.array(
                hash_string_column(batch.column("url")).view(np.int64),
                type=pa.int64(),
            ),
            "digest": pa.array(digests.view(np.int64), type=pa.int64()),
            "sig": sig_col,
            "vsig": vsig,
            "simhash": pa.array(simhash.view(np.int64), type=pa.int64()),
            "lgrams": _list_array(lg_counts, lg_flat.view(np.int64)),
        }
        if self._emit_th:
            # full token-hash stream: lets the substring-span refinement
            # verify candidate pairs on token-hash windows (a false span
            # needs lgram_tokens simultaneous 64-bit collisions) without
            # re-reading or re-extracting any document. Emitted only when
            # span verification will actually consume it — it is roughly
            # text-sized and inflates every signature checkpoint otherwise.
            cols["th"] = _list_array(th_lens, th_flat.view(np.int64))
        if cfg.representative == "quality":
            # fixed-point quality score (×1e6, ∈ [0, 1e6]): computed here —
            # the only stage that still holds the text — so representative
            # selection never re-reads a document (stages/cluster.py packs
            # it with the url into one sortable key)
            from camden_ray.functions.text import batch_quality_features

            score = batch_quality_features(text_arr)["quality_score"]
            qfp = np.trunc(score * 1_000_000 + 0.5).astype(np.int64)
            cols["q"] = pa.array(np.clip(qfp, 0, 1_000_000), type=pa.int64())
        return pa.table(cols)


# once-per-worker-process state for the task-based signature stage: the same
# SignatureActor instances an actor pool would hold, keyed by the
# signature-relevant config fields so two pipelines with different geometry
# never share permutations/extractor flags. Worker processes are long-lived
# within a Ray session, so the token-hash memo cache warms across batches,
# executions AND pipeline runs (an actor pool's cache dies with each
# execution's pool).
_WORKER_SIGNERS: dict[tuple, "SignatureActor"] = {}


def signature_map_fn(cfg: DedupConfig, extract: bool):
    """Stateless ``map_batches`` fn wrapping :class:`SignatureActor` with
    lazy per-worker-process construction — task form of the signature stage
    (see ``DedupConfig.signature_actor_pool`` for the trade-off)."""
    key = (
        cfg.seed, cfg.shingle_k, cfg.num_perms, cfg.verify_perms,
        cfg.lgram_tokens, cfg.lgram_mod, cfg.methods,
        cfg.verify_substring_spans, bool(extract),
    )

    def sign_batch(batch: pa.Table) -> pa.Table:
        actor = _WORKER_SIGNERS.get(key)
        if actor is None:
            actor = SignatureActor(cfg, extract=extract)
            _WORKER_SIGNERS[key] = actor
        return actor(batch)

    return sign_batch


def unpack_sigs(sig_column: list[bytes], num_perms: int) -> np.ndarray:
    """binary signature column → (n, num_perms) uint64 matrix (zero-copy-ish)."""
    if not sig_column:
        return np.empty((0, num_perms), dtype=np.uint64)
    buf = b"".join(sig_column)
    return np.frombuffer(buf, dtype=np.uint64).reshape(len(sig_column), num_perms)
