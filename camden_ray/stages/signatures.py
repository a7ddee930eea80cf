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
    TokenHasher,
    digest_column_u64,
    hash_string_column,
    minhash_params,
    rolling_lgram_hashes,
    shingle_hashes,
    winnow,
)
from camden_ray.functions.text import tokenize

SIG_COLUMNS = ["url", "uid", "digest", "sig", "vsig", "simhash", "lgrams", "th"]

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


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
        self.hasher = TokenHasher(seed=self.cfg.seed)
        self.perm_a, self.perm_b = minhash_params(self.cfg.num_perms, self.cfg.seed)
        self._shifts = np.arange(64, dtype=np.uint64)
        self._bit_vals = np.uint64(1) << self._shifts
        # fused extract+signature mode: one actor pool instead of two chained
        # pools, and the wide html batches never transit the object store
        # between stages (same extraction semantics as HtmlExtractorActor)
        self._extractor = None
        if extract:
            from camden_ray.stages.extract import _TextExtractor

            self._extractor = _TextExtractor()

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
        else:
            texts = batch.column("text").to_pylist()
        n = len(texts)

        digests = digest_column_u64(texts, seed=cfg.seed)

        shingle_chunks: list[np.ndarray] = []
        offsets = np.zeros(n, dtype=np.int64)
        lgram_values: list[np.ndarray] = []
        th_values: list[np.ndarray] = []
        pos = 0
        for i, text in enumerate(texts):
            toks = tokenize(text) if text else []
            th = self.hasher.hash_tokens(toks)
            th_values.append(th.view(np.int64))
            sh = shingle_hashes(th, cfg.shingle_k)
            if len(sh) == 0:
                # short doc fallback: unigram "shingles" keep segments non-empty
                sh = th if len(th) else np.array([digests[i]], dtype=np.uint64)
            sh = np.unique(sh)  # set semantics for Jaccard
            offsets[i] = pos
            pos += len(sh)
            shingle_chunks.append(sh)

            grams = rolling_lgram_hashes(th, cfg.lgram_tokens)
            if len(grams):
                # winnowed selection: any shared span >= lgram_tokens +
                # lgram_mod - 1 tokens is GUARANTEED a shared fingerprint
                grams = winnow(grams, cfg.lgram_mod)
            lgram_values.append(grams.view(np.int64))

        S = (
            np.concatenate(shingle_chunks)
            if shingle_chunks
            else np.empty(0, dtype=np.uint64)
        )

        # --- MinHash: perm p → min over each doc's shingle segment ---
        sigs = np.empty((cfg.num_perms, n), dtype=np.uint64)
        if n:
            with np.errstate(over="ignore"):
                for p in range(cfg.num_perms):
                    hv = self.perm_a[p] * S + self.perm_b[p]
                    sigs[p] = np.minimum.reduceat(hv, offsets)
        sigs = np.ascontiguousarray(sigs.T)  # (n, num_perms)

        # --- SimHash: sign of per-bit vote over the shingle set ---
        # 64 contiguous bit-plane passes, each a 1-D ``np.add.reduceat``
        # segment-sum. (The obvious 2-D ``np.add.reduceat(bits, offsets,
        # axis=0)`` walks segments in a slow generic inner loop — measured
        # 24 s vs 0.08 s per 1024-doc batch; a column-wise cumsum over the
        # unpacked bit matrix is nearly as bad at ~9 s.)
        if n:
            votes = np.empty((64, n), dtype=np.int64)
            one = np.uint64(1)
            for b in range(64):
                col = ((S >> np.uint64(b)) & one).astype(np.int64)
                votes[b] = np.add.reduceat(col, offsets)
            seg_sizes = np.diff(np.append(offsets, len(S)))[None, :]
            simhash_bits = (votes * 2 > seg_sizes).astype(np.uint64)
            simhash = np.bitwise_or.reduce(
                simhash_bits * self._bit_vals[:, None], axis=0
            )
        else:
            simhash = np.empty(0, dtype=np.uint64)

        sig_bytes = [sigs[i].tobytes() for i in range(n)]
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
        return pa.table(
            {
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
                "sig": pa.array(sig_bytes, type=pa.binary()),
                "vsig": vsig,
                "simhash": pa.array(simhash.view(np.int64), type=pa.int64()),
                "lgrams": pa.array(list(lgram_values), type=pa.list_(pa.int64())),
                # full token-hash stream: lets the substring-span refinement
                # verify candidate pairs on token-hash windows (a false span
                # needs lgram_tokens simultaneous 64-bit collisions) without
                # re-reading or re-extracting any document
                "th": pa.array(list(th_values), type=pa.list_(pa.int64())),
            }
        )


def unpack_sigs(sig_column: list[bytes], num_perms: int) -> np.ndarray:
    """binary signature column → (n, num_perms) uint64 matrix (zero-copy-ish)."""
    if not sig_column:
        return np.empty((0, num_perms), dtype=np.uint64)
    buf = b"".join(sig_column)
    return np.frombuffer(buf, dtype=np.uint64).reshape(len(sig_column), num_perms)
