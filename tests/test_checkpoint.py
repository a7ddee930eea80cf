"""Checkpoint / lineage / resume (SURVEY.md §5 item 4)."""

import json
import os

from camden_ray.config import DedupConfig
from camden_ray.pipelines.dedup import run_dedup
from camden_ray.state.checkpoint import Checkpointer, input_fingerprint


def test_resume_skips_finished_stages(webtext_path, tmp_path):
    out = str(tmp_path / "run")
    cfg = DedupConfig()
    r1 = run_dedup(webtext_path, cfg, out_dir=out, extract=True)
    c1 = r1["clusters"].to_pandas().sort_values("url").reset_index(drop=True)

    # manifests committed for each stage
    for stage in ["signatures", "edges", "clusters"]:
        m = json.load(open(os.path.join(out, f"stage={stage}", "_manifest.json")))
        assert m["status"] == "done"
        assert m["rows"] > 0
        assert m["partitions"], "per-partition lineage missing"

    # rerun: every stage must be resumed (skipped), results identical
    r2 = run_dedup(webtext_path, cfg, out_dir=out, extract=True)
    c2 = r2["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    assert c1.equals(c2)
    metrics = json.load(open(os.path.join(out, "_metrics.json")))
    resumed = {m["stage"]: m["resumed"] for m in metrics[-3:]}
    assert all(resumed.values()), f"stages not resumed: {resumed}"


def test_config_change_invalidates(webtext_path, tmp_path):
    out = str(tmp_path / "run2")
    run_dedup(webtext_path, DedupConfig(), out_dir=out, extract=True)
    # different shingle config ⇒ new fingerprints ⇒ stages rerun
    cfg2 = DedupConfig(shingle_k=4)
    run_dedup(webtext_path, cfg2, out_dir=out, extract=True)
    metrics = json.load(open(os.path.join(out, "_metrics.json")))
    assert not any(m["resumed"] for m in metrics[-3:])


def test_stage_fingerprint_chain(tmp_path):
    ck = Checkpointer(str(tmp_path / "c"), DedupConfig())
    f1 = ck.stage_fingerprint("sig", "inputA")
    f2 = ck.stage_fingerprint("sig", "inputB")
    f3 = ck.stage_fingerprint("edges", f1)
    assert len({f1, f2, f3}) == 3


def test_input_fingerprint_tracks_files(webtext_path):
    assert input_fingerprint(webtext_path) == input_fingerprint(webtext_path)


def test_resume_with_distributed_clustering(webtext_path, tmp_path):
    """Checkpoint-resume composed with the forced scale path
    (driver_unionfind_max_edges=0): the resumed run re-derives uid edges from
    the persisted url-keyed edge stage and must cluster identically to a
    fresh driver-path run."""
    cols = ["url", "cluster_id", "is_representative"]

    def clusters(r):
        # checkpointed runs read back a hive-partition `stage` column
        return r["clusters"].to_pandas()[cols].sort_values("url").reset_index(drop=True)

    out = str(tmp_path / "run_dist")
    cfg = DedupConfig(driver_unionfind_max_edges=0)
    r1 = run_dedup(webtext_path, cfg, out_dir=out, extract=True)
    c1 = clusters(r1)

    # resume: signature + edge stages skipped, clustering recomputed on the
    # uid view of the PERSISTED edges
    r2 = run_dedup(webtext_path, cfg, out_dir=out, extract=True)
    assert c1.equals(clusters(r2))

    # and the scale path agrees with the driver union-find path end-to-end
    r3 = run_dedup(webtext_path, DedupConfig(), extract=True)
    assert c1.equals(clusters(r3))
