"""JSONL (newline-delimited JSON) source/sink for webtext corpora.

LLM training corpora interchange as JSONL at least as often as parquet;
this pairs a reader/writer so a camden_ray pipeline can ingest or emit
either format with the same downstream stages. JSON has no binary or
timestamp types, so the sink encodes them losslessly (binary → base64
under ``<name>_b64``, timestamp → ISO-8601 microsecond strings) and the
reader reverses both — round-trip is exact (tests/test_jsonl.py).

Scale shape: both directions are per-file map work under Ray Data's
streaming executor (one task per shard, no shuffle); the base64 codec is
a per-row Python call at the serialization boundary only (the same
budget class as the reference's whole-file checksum I/O, never inside
the analytic hot path).
"""

from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Arrow's strftime %S prints seconds WITH the fractional part (unlike C), so
# this emits full ISO-8601 microsecond strings; the reader parses them with
# a plain string→timestamp cast (Arrow's ISO parser handles subseconds,
# which strptime would not).
_TS_FMT = "%Y-%m-%dT%H:%M:%S"
_B64_SUFFIX = "_b64"
_ISO_SUFFIX = "_iso"


def _encode_batch(t: pa.Table) -> pa.Table:
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for name in t.column_names:
        col = t[name]
        typ = col.type
        if pa.types.is_timestamp(typ):
            cols[name + _ISO_SUFFIX] = pc.strftime(
                col.cast(pa.timestamp("us")), format=_TS_FMT
            )
        elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
            vals = col.to_pylist()
            cols[name + _B64_SUFFIX] = pa.array(
                [None if v is None else base64.b64encode(v).decode("ascii")
                 for v in vals],
                type=pa.string(),
            )
        else:
            cols[name] = col
    return pa.table(cols)


def _decode_batch(t: pa.Table) -> pa.Table:
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for name in t.column_names:
        col = t[name]
        if name.endswith(_B64_SUFFIX):
            vals = col.to_pylist()
            cols[name[: -len(_B64_SUFFIX)]] = pa.array(
                [None if v is None else base64.b64decode(v) for v in vals],
                type=pa.binary(),
            )
        elif name.endswith(_ISO_SUFFIX):
            cols[name[: -len(_ISO_SUFFIX)]] = col.cast(pa.timestamp("us"))
        elif name == "warc_ts" and pa.types.is_string(col.type):
            # externally-produced webtext JSONL carries warc_ts as a plain
            # ISO string without the round-trip tag
            cols[name] = col.cast(pa.timestamp("us"))
        else:
            cols[name] = col
    return pa.table(cols)


def write_jsonl(ds: "ray.data.Dataset", path: str) -> None:
    """Write a dataset as sharded JSONL (one file per block, resumable at
    shard granularity like every engine sink)."""
    ds.map_batches(_encode_batch, batch_format="pyarrow").write_json(path)


def read_webtext_jsonl(
    path: str | list[str],
    columns: list[str] | None = None,
    langs: tuple[str, ...] = (),
    min_text_chars: int = 0,
) -> "ray.data.Dataset":
    """JSONL twin of :func:`camden_ray.sources.webtext.read_webtext`: same
    allow-list / min-length predicates, binary+timestamp columns restored.
    JSON readers cannot prune columns inside the file scan, so ``columns``
    prunes immediately after decode (the text JSONL rows are line-atomic
    either way)."""
    ds = ray.data.read_json(path).map_batches(
        _decode_batch, batch_format="pyarrow"
    )
    # matches the parquet twin's gating (webtext.py): the text-length
    # predicate applies only when text is among the requested columns (an
    # html-only read must not touch a possibly-absent text field), while
    # the lang allow-list applies regardless of pruning
    apply_text = min_text_chars > 0 and (columns is None or "text" in columns)

    def flt(t: pa.Table) -> pa.Table:
        # predicates run BEFORE column pruning (matching read_webtext, whose
        # filters push into the scan): a pruned `lang` column must not
        # silently drop the allow-list
        if langs:
            t = t.filter(pc.is_in(t["lang"], value_set=pa.array(list(langs))))
        if apply_text and "text" in t.column_names:
            t = t.filter(
                pc.greater_equal(
                    pc.utf8_length(pc.coalesce(t["text"], "")), min_text_chars
                )
            )
        return t

    if langs or apply_text:
        ds = ds.map_batches(flt, batch_format="pyarrow")
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
