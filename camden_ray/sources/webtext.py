"""Webtext parquet source (the S1 analogue: recursive dir walk → parquet read,
/root/reference/src/scanner.rs:26-33).

Always prune columns at the read: a dedup run that starts from pre-extracted
``text`` must never ship the wide ``html`` binary column out of storage.
"""

from __future__ import annotations

import pyarrow.compute as pc
import ray.data

WEBTEXT_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_webtext(
    path: str | list[str],
    columns: list[str] | None = None,
    langs: tuple[str, ...] = (),
    min_text_chars: int = 0,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Column-pruned, predicate-pushed read of a webtext table.

    ``langs`` is the allow-list predicate (F2 analogue of camden's extension
    allow-list, /root/reference/src/scanner.rs:71-79) pushed into the parquet
    scan as a row-group filter.
    """
    flt = None
    if langs:
        flt = pc.field("lang").isin(list(langs))
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = ray.data.read_parquet(path, columns=columns, filter=flt, **kwargs)
    if min_text_chars > 0 and (columns is None or "text" in columns):
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.greater_equal(
                    pc.utf8_length(pc.coalesce(t["text"], "")), min_text_chars
                )
            ),
            batch_format="pyarrow",
        )
    return ds


def read_webtext_any(
    path: str | list[str],
    input_format: str,
    columns: list[str] | None = None,
    langs: tuple[str, ...] = (),
    min_text_chars: int = 0,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Format dispatch for the webtext readers — the ONE place the CLI and
    run_dedup resolve ``input_format``, so predicate gating and argument
    plumbing cannot drift between surfaces. ``override_num_blocks`` is a
    parquet-only read-shaping knob (JSONL readers shard per file)."""
    if input_format == "jsonl":
        if override_num_blocks is not None:
            raise ValueError("override_num_blocks is parquet-only")
        from camden_ray.sources.jsonl import read_webtext_jsonl

        return read_webtext_jsonl(
            path, columns=columns, langs=langs, min_text_chars=min_text_chars
        )
    if input_format != "parquet":
        raise ValueError(f"unknown input_format {input_format!r}")
    return read_webtext(
        path, columns=columns, langs=langs, min_text_chars=min_text_chars,
        override_num_blocks=override_num_blocks,
    )
