"""Extractor invariant: deterministic, byte-identical text per url.

Row-granular mirror of the reference's checksum-equivalence contract
(/root/reference/src/scanner.rs:110-143): same content ⇒ same result, across
runs and across parallelism levels.
"""

import os

import pyarrow.parquet as pq
import ray.data

from camden_ray.fixture import generate_docs, render_doc
from camden_ray.stages.extract import HtmlExtractorActor, extract_text


def test_handcrafted_extraction():
    html = (
        "<html><head><title>skip me</title><style>p{}</style>"
        "<script>var x=1;</script></head>"
        '<body><p>hello   world</p><div>a <b>bold</b> move</div>'
        "<p>&amp; escaped</p></body></html>"
    )
    assert extract_text(html) == "hello world\na bold move\n& escaped"


def test_extraction_is_deterministic():
    html = "<html><body><p>alpha beta</p><p>gamma</p></body></html>"
    assert extract_text(html) == extract_text(html) == "alpha beta\ngamma"


def test_malformed_html_is_deterministic_not_dropped():
    bad = "<html><body><p>ok</p><unclosed <<< nonsense"
    out1, out2 = extract_text(bad), extract_text(bad)
    assert out1 == out2  # never silently dropped (vs reference scanner.rs:60)


def test_fixture_byte_identity():
    docs, _ = generate_docs(50, seed=42)
    for d in docs:
        html, text = render_doc(d, 42)
        assert extract_text(html.decode()) == text


def test_fused_equals_standalone():
    """SignatureActor(extract=True) must produce the same text semantics as
    the standalone HtmlExtractorActor — incl. null-html rows keeping an
    existing text column (the digest is over the same text iff semantics
    match; asserted via the digest column)."""
    import pyarrow as pa

    from camden_ray.config import DedupConfig
    from camden_ray.functions.hashing import digest_column_u64
    from camden_ray.stages.signatures import SignatureActor

    batch = pa.table(
        {
            "url": ["u1", "u2", "u3", "u4"],
            "html": [
                b"<html><body><p>alpha beta</p></body></html>",
                None,  # null html + existing text: text must be KEPT
                None,  # null html, no usable text
                b"<p>ok</p><unclosed <<< nonsense",  # malformed: fallback
            ],
            "text": ["ignored", "kept text", None, "ignored"],
        }
    )
    standalone = HtmlExtractorActor()(batch)
    fused = SignatureActor(DedupConfig(), extract=True)(batch)
    expected = digest_column_u64(standalone["text"].to_pylist(), seed=42)
    import numpy as np

    got = fused["digest"].to_numpy().view(np.uint64)
    assert standalone["text"].to_pylist()[1] == "kept text"
    assert (got == expected).all()


def test_actor_pool_extraction_matches_text_column(webtext_path):
    """map_batches(HtmlExtractorActor) output == stored ground-truth text."""
    ds = ray.data.read_parquet(webtext_path, columns=["url", "html", "text"])
    truth = {
        u: t
        for b in ds.iter_batches(batch_format="pyarrow")
        for u, t in zip(b["url"].to_pylist(), b["text"].to_pylist())
    }
    extracted = (
        ray.data.read_parquet(webtext_path, columns=["url", "html"])
        .map_batches(HtmlExtractorActor, batch_format="pyarrow", batch_size=64,
                     concurrency=2, num_cpus=1)
        .select_columns(["url", "text"])
    )
    for b in extracted.iter_batches(batch_format="pyarrow"):
        for u, t in zip(b["url"].to_pylist(), b["text"].to_pylist()):
            assert t == truth[u], f"extraction mismatch for {u}"
