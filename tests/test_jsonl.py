"""JSONL source/sink round-trip: parquet webtext → JSONL → Dataset must be
value-identical (binary html via base64, timestamps via ISO-8601 strings),
and the reader's predicates must match read_webtext's."""

import os

import pyarrow as pa
import pyarrow.compute as pc


def _sorted_pandas(ds, cols):
    df = ds.to_pandas()
    return df[cols].sort_values("url").reset_index(drop=True)


def test_jsonl_round_trip(ray_session, webtext_path, tmp_path):
    from camden_ray.sources.jsonl import read_webtext_jsonl, write_jsonl
    from camden_ray.sources.webtext import WEBTEXT_COLUMNS, read_webtext

    src = read_webtext(webtext_path)
    out = str(tmp_path / "jsonl")
    write_jsonl(src, out)
    assert any(f.endswith(".json") for f in os.listdir(out))

    back = read_webtext_jsonl(out)
    a = _sorted_pandas(read_webtext(webtext_path), WEBTEXT_COLUMNS)
    b = _sorted_pandas(back, WEBTEXT_COLUMNS)
    assert a["html"].equals(b["html"])  # bytes survive base64
    assert a["warc_ts"].equals(b["warc_ts"])  # µs timestamps survive ISO
    assert a.equals(b)


def test_jsonl_reader_predicates(ray_session, webtext_path, tmp_path):
    from camden_ray.sources.jsonl import read_webtext_jsonl, write_jsonl
    from camden_ray.sources.webtext import read_webtext

    out = str(tmp_path / "jsonl")
    write_jsonl(read_webtext(webtext_path), out)

    langs = ("en",)
    got = read_webtext_jsonl(
        out, columns=["url", "text", "lang"], langs=langs, min_text_chars=10
    )
    want = read_webtext(
        webtext_path, columns=["url", "text", "lang"], langs=langs,
        min_text_chars=10,
    )
    ga = _sorted_pandas(got, ["url", "text", "lang"])
    wa = _sorted_pandas(want, ["url", "text", "lang"])
    assert len(ga) > 0
    assert ga.equals(wa)


def test_jsonl_lang_filter_survives_column_pruning(ray_session, webtext_path, tmp_path):
    """Regression: the lang allow-list must apply even when `lang` is not in
    the requested columns (predicates run before pruning, like the parquet
    twin's pushed-down filter)."""
    from camden_ray.sources.jsonl import read_webtext_jsonl, write_jsonl
    from camden_ray.sources.webtext import read_webtext

    out = str(tmp_path / "jsonl")
    write_jsonl(read_webtext(webtext_path), out)

    got = read_webtext_jsonl(out, columns=["url", "text"], langs=("en",))
    want = read_webtext(webtext_path, columns=["url", "text"], langs=("en",))
    assert got.count() == want.count()
    assert got.count() < read_webtext(webtext_path).count()
    assert set(got.schema().names) == {"url", "text"}


def test_jsonl_codec_batch_round_trip_fuzz():
    """The encode/decode batch kernels invert each other on arbitrary
    binary payloads and microsecond timestamps (no Ray needed — pure
    Arrow)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from camden_ray.sources.jsonl import _decode_batch, _encode_batch

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.binary(max_size=64)),
                st.one_of(
                    st.none(),
                    st.integers(min_value=0, max_value=4_102_444_800_000_000),
                ),
                st.one_of(st.none(), st.text(max_size=40)),
            ),
            min_size=0,
            max_size=8,
        )
    )
    def check(rows):
        t = pa.table(
            {
                "html": pa.array([r[0] for r in rows], type=pa.binary()),
                "warc_ts": pa.array(
                    [r[1] for r in rows], type=pa.timestamp("us")
                ),
                "text": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
        back = _decode_batch(_encode_batch(t))
        for name in t.column_names:
            got = back[name].cast(t[name].type).combine_chunks()
            assert got.equals(t[name].combine_chunks()), name

    check()


def test_jsonl_null_html_and_text(ray_session, tmp_path):
    """Null binary / null text rows survive the codec."""
    import ray

    from camden_ray.sources.jsonl import read_webtext_jsonl, write_jsonl

    t = pa.table(
        {
            "url": pa.array(["a", "b"]),
            "html": pa.array([b"\x00\xffraw", None], type=pa.binary()),
            "text": pa.array([None, "hello"], type=pa.string()),
        }
    )
    out = str(tmp_path / "jsonl")
    write_jsonl(ray.data.from_arrow(t), out)
    back = read_webtext_jsonl(out).to_pandas().sort_values("url")
    assert back["html"].tolist()[0] == b"\x00\xffraw"
    assert back["html"].tolist()[1] is None
    assert back["text"].tolist() == [None, "hello"]
