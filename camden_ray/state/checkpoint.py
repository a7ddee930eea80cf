"""Per-stage checkpointing with lineage manifests (SURVEY.md §4.3).

The reference has no checkpointing — a crash reruns everything (SURVEY.md
§4.1 "Checkpoint / resume: none"). north_rule requires: "checkpoints
per-partition lineage and metrics so any stage is resumable mid-run".

Layout::

    out/
      _pipeline.json                  # full config incl. every hash seed
      stage=<name>/part-*.parquet     # stage output partitions
      stage=<name>/_manifest.json     # lineage: input fingerprint, per-file
                                      # row counts/bytes, wall time, status

A stage is identified by (name, input_fingerprint, config_fingerprint); the
input fingerprint chains from the parent stage's manifest digest, so editing
any upstream stage or config invalidates everything downstream. ``run_stage``
skips a stage whose committed manifest matches — that is resume. The
manifest is written LAST (commit marker); a crash mid-write leaves no
manifest and the stage reruns. Per-file rows/bytes in the manifest are the
per-partition lineage + metrics record (generalizing camden's progress bar
and MoveStats, /root/reference/src/progress.rs:3-10, src/operations.rs:9-11).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Callable

import pyarrow.parquet as pq
import ray.data

from camden_ray.config import DedupConfig
from camden_ray.functions.hashing import blake2b_hex


class Checkpointer:
    def __init__(self, root: str, cfg: DedupConfig):
        self.root = root
        self.cfg = cfg
        self.cfg_fp = cfg.fingerprint()
        os.makedirs(root, exist_ok=True)
        pipeline_json = os.path.join(root, "_pipeline.json")
        if not os.path.exists(pipeline_json):
            with open(pipeline_json, "w") as f:
                f.write(cfg.to_json())
        self.metrics: list[dict] = []

    # ----- lineage fingerprints -----

    def stage_fingerprint(self, name: str, input_fp: str, params: str = "") -> str:
        return blake2b_hex(f"{name}|{input_fp}|{self.cfg_fp}|{params}".encode())

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, f"stage={name}")

    def manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "_manifest.json")

    def committed_manifest(self, name: str) -> dict | None:
        p = self.manifest_path(name)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    # ----- stage execution -----

    def run_stage(
        self,
        name: str,
        input_fp: str,
        build: Callable[[], "ray.data.Dataset"],
        params: str = "",
    ) -> tuple["ray.data.Dataset", str]:
        """Run (or resume-skip) a stage.

        ``build()`` returns the stage's output Dataset; it is written to
        parquet under ``stage=<name>/`` and read back, so every consumer
        streams from disk instead of re-executing the upstream graph (this
        doubles as the fan-out materialization point for multi-branch DAGs).

        Returns (dataset, stage_fingerprint) — the fingerprint chains into
        downstream stages.
        """
        fp = self.stage_fingerprint(name, input_fp, params)
        sdir = self._stage_dir(name)
        manifest = self.committed_manifest(name)
        if manifest and manifest.get("fingerprint") == fp and manifest.get("status") == "done":
            self.metrics.append({**manifest, "resumed": True})
            return ray.data.read_parquet(sdir), fp

        if os.path.exists(sdir):
            shutil.rmtree(sdir)
        tmp = sdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)

        t0 = time.monotonic()
        ds = build()
        ds.write_parquet(tmp)
        wall = time.monotonic() - t0

        parts = []
        total_rows = 0
        total_bytes = 0
        for f in sorted(glob.glob(os.path.join(tmp, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            nbytes = os.path.getsize(f)
            parts.append(
                {"file": os.path.basename(f), "rows": md.num_rows, "bytes": nbytes}
            )
            total_rows += md.num_rows
            total_bytes += nbytes
        os.rename(tmp, sdir)
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "input_fingerprint": input_fp,
            "config_fingerprint": self.cfg_fp,
            "rows": total_rows,
            "bytes": total_bytes,
            "wall_s": round(wall, 3),
            "partitions": parts,
            "status": "done",
        }
        with open(self.manifest_path(name), "w") as f:  # commit marker
            json.dump(manifest, f, indent=1)
        self.metrics.append({**manifest, "resumed": False})
        return ray.data.read_parquet(sdir), fp

    def write_metrics(self) -> str:
        p = os.path.join(self.root, "_metrics.json")
        with open(p, "w") as f:
            json.dump(self.metrics, f, indent=1, default=str)
        return p


def input_fingerprint(paths: str | list[str]) -> str:
    """Fingerprint of an input data dir/file (parquet or JSONL shards):
    names + sizes + mtimes (content-digest-free so 100 TB inputs aren't
    re-read to fingerprint)."""
    if isinstance(paths, str):
        paths = [paths]
    entries = []
    for p in paths:
        if os.path.isdir(p):
            files = sorted(
                f
                for pat in ("*.parquet", "*.json", "*.jsonl")
                for f in glob.glob(os.path.join(p, "**", pat), recursive=True)
            )
        else:
            files = [p]
        for f in files:
            st = os.stat(f)
            entries.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    return blake2b_hex("|".join(entries).encode())
