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


# ---------------------------------------------------------------------------
# Fast-path extractor: must be byte-identical to the html.parser reference
# implementation everywhere it answers (it falls back where it declines).
# ---------------------------------------------------------------------------

ADVERSARIAL_HTML = [
    "<html><head><title>skip</title><style>p{}</style><script>var x=1;"
    '</script></head><body><p>hello   world</p><div>a <b>bold</b> move</div>'
    "<p>&amp; escaped</p></body></html>",
    "<html><body><p>ok</p><unclosed <<< nonsense",
    "a < b and c > d",
    "<p>x &amp; y &lt;z&gt; &#65; &#x42; &notarealref; &amp</p>",
    "<!-- comment --><p>a</p><!-- multi\nline --  ><p>b</p>",
    "<!DOCTYPE html><p>doc</p>",
    "<?php echo 1; ?><p>pi</p>",
    "<br/><br /><p/>self<hr/>",
    '<script>if (a<b) { x("</scr"+"ipt>"); }</script><p>after</p>',
    "<script src='x.js'></script><p>t</p>",
    "<style>a>b {color:red}</style><p>s</p>",
    '<p a="x>y">quoted gt</p>',
    "<P>UPPER</P><DiV>mixed</dIv>",
    "<p >space</p ><p\tattr>tab</p>",
    "</p>lone end</nosuch>",
    "<p!>weird</p!>",
    "<p foo bar=1 baz='q'>attrs</p>",
    "< p>not a tag</p>",
    "<>empty<></>end",
    "text &#38;#38; double",
    "<script></script><p>empty script</p>",
    "<script>x</script ><p>weird close</p>",
    "<script>x</script\tfoo><p>weirder</p>",
    "<title>&amp; in title</title>after",
    "<head><p>p inside head?!</p></head>after",
    "x<head><p></head>y",  # block marker emitted inside a skip region
    "<template><p>tpl</p></template>after",
    "é café <p>unicode 中文</p>",
    "<p>trailing <",
    "<p>amp at end &",
    "<p>amp frag &am",
    "<![CDATA[ raw > stuff ]]><p>x</p>",
    "<p data-x='a<b'>lt in attr</p>",
    "<div><script>a</script>mid</div>",
    "<li>1<li>2<li>3",
    "<table><tr><td>a</td><td>b</td></tr></table>",
    "<style>@media x { p > a {c:d} }</style>tail",
    "<p\n  multi\n  line='attr'\n>nl attrs</p>",
]


def test_fast_path_equals_parser_on_adversarial_cases():
    from camden_ray.stages.extract import (
        FastTextExtractor,
        _TextExtractor,
        _Unsupported,
        _extract_fast,
    )

    for case in ADVERSARIAL_HTML:
        want = _TextExtractor().extract(case)
        assert FastTextExtractor().extract(case) == want, repr(case)
        # and where the fast path answers directly, it must agree
        try:
            got = _extract_fast(case)
        except _Unsupported:
            continue
        assert got == want, repr(case)


def test_fast_path_covers_fixture_corpus():
    """Every fixture doc must take the fast path AND match the reference
    extractor byte-for-byte (no silent always-fallback)."""
    from camden_ray.stages.extract import _TextExtractor, _extract_fast

    docs, _ = generate_docs(300, seed=42)
    slow = _TextExtractor()
    for d in docs:
        html, text = render_doc(d, 42)
        h = html.decode()
        assert _extract_fast(h) == slow.extract(h) == text


def test_normalize_matches_regex_for_all_whitespace():
    """str.split whitespace set == regex \\s set (the _normalize rewrite)."""
    import re

    from camden_ray.stages.extract import _normalize

    ws_re = re.compile(r"\s+")

    def old(s):
        return "\n".join(
            line
            for piece in s.split("\n")
            for line in [ws_re.sub(" ", piece).strip()]
            if line
        )

    ws_chars = [chr(c) for c in range(0x11000) if chr(c).isspace()]
    assert len(ws_chars) >= 25
    for c in ws_chars:
        for s in (f"a{c}b", f"{c}a", f"a{c}", f"a{c}{c}b", f"x\n{c}y", c):
            assert _normalize(s) == old(s), (hex(ord(c)), repr(s))


def test_fast_path_hypothesis_differential():
    """Random HTML-ish soup: FastTextExtractor must equal the html.parser
    reference on every input (the fast path bails where it can't)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from camden_ray.stages.extract import FastTextExtractor, _TextExtractor

    alphabet = st.sampled_from(
        list("<>&/!?=\"' \t\n-;#xabcdefghijklmnopqrstuvwxyzPDIV")
        + ["<p>", "</p>", "<div ", "<script>", "</script>", "<style>",
           "</style>", "<!--", "-->", "<head>", "</head>", "<br/>", "&amp;",
           "&#65;", "<title>", "</title>", "<li>", "<template>", "</template>"]
    )

    @settings(max_examples=400, deadline=None)
    @given(st.lists(alphabet, min_size=0, max_size=60).map("".join))
    def check(s):
        assert FastTextExtractor().extract(s) == _TextExtractor().extract(s)

    check()
