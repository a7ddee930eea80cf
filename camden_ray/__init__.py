"""camden_ray — a Ray-Data-native web-scale deduplication engine.

A brand-new engine (NOT a port) generalizing the reference's
scan → checksum → group-by-hash → report/act invariant
(/root/reference/src/scanner.rs:17-49, src/reporting.rs:32-61,
src/operations.rs:40-64) from file granularity to row granularity over
Parquet tables of Common-Crawl-style web pages:

    (url: string, warc_ts: timestamp[us], html: binary,
     text: string, lang: string)

Capabilities (see SURVEY.md §2 / §2.1):
  * HTML→text extraction        — stateful actor pool, byte-deterministic
  * exact dedup                 — content digests + groupby (camden M1+G1)
  * near-dup                    — MinHash + LSH banding with salted
                                  repartitioning of hot buckets
  * SimHash                     — Hamming-ball candidates via pigeonhole blocks
  * substring dedup             — winnowed L-gram rolling hashes
  * clustering                  — union-find / distributed hash-to-min
  * checkpoint / lineage        — per-stage manifests, resumable
  * text analysis, similarity search, multimodal plumbing (functions/)

All library code is driver-initialised: nothing here calls ray.init().
"""

from camden_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
