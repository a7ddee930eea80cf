"""HTML → text extraction as a stateful actor-pool map_batches stage.

Row-granular analogue of camden's per-file checksum invariant
(/root/reference/src/scanner.rs:81-95): where the reference's contract is
"same bytes ⇒ same checksum regardless of path", ours is "same html bytes ⇒
byte-identical extracted text per url, across runs and parallelism levels"
(BASELINE.json input_hint).

The extractor is a compiled stdlib ``html.parser.HTMLParser`` held in actor
state — built once per actor in ``__init__`` (the actor-pool pattern), reused
for every batch. No third-party HTML libs exist in this sandbox.

Extraction semantics (fixed, versioned by EXTRACTOR_VERSION):
  * content inside <script>/<style>/<template>/<head> is dropped;
  * block-level tags (p, div, h1-h6, li, br, tr, section, article, header,
    footer, nav, blockquote, pre, td separation) break lines;
  * within a line, whitespace runs collapse to a single space; lines are
    stripped; empty lines dropped; lines joined with "\n";
  * character references are decoded (convert_charrefs=True).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

EXTRACTOR_VERSION = 1

_WS_RE = re.compile(r"\s+")

_SKIP_TAGS = frozenset({"script", "style", "template", "head", "title"})
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li br tr section article header footer nav "
    "blockquote pre ul ol table body html".split()
)


class _TextExtractor(HTMLParser):
    """Streaming extractor: collects text chunks with block-boundary markers."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def reset_state(self) -> None:
        self.reset()
        self._chunks = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._chunks.append(data)

    def extract(self, html: str) -> str:
        self.reset_state()
        try:
            self.feed(html)
            self.close()
        except Exception:
            # malformed markup: fall back to tag-stripping (deterministic)
            stripped = re.sub(r"<[^>]*>", "\n", html)
            self._chunks = [stripped]
        lines: list[str] = []
        for piece in "".join(self._chunks).split("\n"):
            line = _WS_RE.sub(" ", piece).strip()
            if line:
                lines.append(line)
        return "\n".join(lines)


def extract_text(html: str) -> str:
    """One-shot convenience (tests, fixture generation). Pipelines use the actor."""
    return _TextExtractor().extract(html)


class HtmlExtractorActor:
    """Actor-pool callable for ``map_batches``.

    Usage::

        ds.map_batches(HtmlExtractorActor, batch_format="pyarrow",
                       batch_size=cfg.batch_size,
                       concurrency=cfg.extract_concurrency, num_cpus=1)

    Input batch: must contain ``html`` (binary or string). Output: input
    columns with ``text`` (string) replaced/added from extraction. Rows whose
    html is null keep their existing ``text`` if present, else "".

    Unparsable rows are NOT silently dropped (the reference drops I/O-error
    records silently, /root/reference/src/scanner.rs:60 — we surface instead):
    the fallback extraction is deterministic and an ``extract_error`` flag
    column records that the fallback fired.
    """

    def __init__(self) -> None:
        self._parser = _TextExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        existing = (
            batch.column("text").to_pylist()
            if "text" in batch.column_names
            else [None] * len(htmls)
        )
        texts: list[str] = []
        errors: list[bool] = []
        parser = self._parser
        for raw, fallback in zip(htmls, existing):
            if raw is None:
                texts.append(fallback if fallback is not None else "")
                errors.append(raw is None)
                continue
            if isinstance(raw, bytes):
                raw = raw.decode("utf-8", "replace")
            try:
                texts.append(parser.extract(raw))
                errors.append(False)
            except Exception:
                texts.append("")
                errors.append(True)
        out = batch
        if "text" in out.column_names:
            out = out.drop_columns(["text"])
        out = out.append_column("text", pa.array(texts, type=pa.string()))
        out = out.append_column("extract_error", pa.array(errors, type=pa.bool_()))
        return out
