"""JSON report sink (W2): the row-granular mirror of the reference scanner
test /root/reference/src/scanner.rs:110-133 — 2 byte-identical records and 1
distinct record must yield exactly one duplicate group containing both
identical records, with the distinct record absent from the report."""

import json

import pyarrow as pa
import pytest
import ray.data

from camden_ray.config import DedupConfig
from camden_ray.pipelines.dedup import run_dedup
from camden_ray.pipelines.reporting import write_json_report


@pytest.fixture(scope="module")
def tiny_result():
    body = "<html><body>" + "the same paragraph of text " * 40 + "</body></html>"
    other = "<html><body>" + "completely different words here " * 40 + "</body></html>"
    t = pa.table(
        {
            "url": ["http://a/1", "http://a/2", "http://b/1"],
            "warc_ts": pa.array([0, 0, 0], type=pa.timestamp("us")),
            "html": pa.array(
                [body.encode(), body.encode(), other.encode()], type=pa.binary()
            ),
            "text": pa.array([None, None, None], type=pa.string()),
            "lang": ["en", "en", "en"],
        }
    )
    return run_dedup(
        None,
        DedupConfig(extract_concurrency=(1, 1)),
        extract=True,
        input_ds=ray.data.from_arrow(t),
    )


def test_json_report_groups_identical_records(tiny_result, tmp_path):
    path = tmp_path / "identical_urls.json"
    n = write_json_report(tiny_result["clusters"], str(path))
    groups = json.loads(path.read_text())
    assert n == 1 and len(groups) == 1
    (g,) = groups
    assert g["urls"] == ["http://a/1", "http://a/2"]
    assert g["cluster_id"] == "http://a/1"  # min-url representative


def test_json_report_empty_when_no_duplicates(tmp_path):
    t = pa.table(
        {
            "url": ["http://x/1", "http://x/2"],
            "warc_ts": pa.array([0, 0], type=pa.timestamp("us")),
            "html": pa.array(
                [b"<html><body>alpha bravo charlie delta</body></html>",
                 b"<html><body>echo foxtrot golf hotel</body></html>"],
                type=pa.binary(),
            ),
            "text": pa.array([None, None], type=pa.string()),
            "lang": ["en", "en"],
        }
    )
    res = run_dedup(
        None,
        DedupConfig(extract_concurrency=(1, 1)),
        extract=True,
        input_ds=ray.data.from_arrow(t),
    )
    path = tmp_path / "r.json"
    n = write_json_report(res["clusters"], str(path))
    assert n == 0
    assert json.loads(path.read_text()) == []
