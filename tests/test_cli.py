"""CLI parsing tests — mirror of the reference's cli.rs test battery
(/root/reference/src/cli.rs:108-170: root-only, positional target, flag
forms, --no-thread, missing-root error, invalid-flag error)."""

import pytest

from camden_ray.cli import CliError, parse_args


def test_input_only():
    inp, out, cfg, _ = parse_args(["/data/webtext"])
    assert inp == "/data/webtext"
    assert out is None
    assert cfg.methods == ("exact", "minhash", "simhash", "substring")


def test_positional_out_dir():
    inp, out, _, _ = parse_args(["/data/webtext", "/out"])
    assert (inp, out) == ("/data/webtext", "/out")


def test_flag_forms():
    inp, out, _, _ = parse_args(["--input=/data/webtext", "--out=/out"])
    assert (inp, out) == ("/data/webtext", "/out")


def test_sequential_switch():
    _, _, cfg, _ = parse_args(["/d", "--sequential"])
    assert cfg.shuffle_partitions == 1
    assert cfg.extract_concurrency == (1, 1)


def test_methods_and_langs():
    _, _, cfg, _ = parse_args(["/d", "--methods", "exact,minhash", "--langs", "en,de"])
    assert cfg.methods == ("exact", "minhash")
    assert cfg.langs == ("en", "de")


def test_missing_input_is_error():
    with pytest.raises(CliError):
        parse_args([])


def test_unknown_flag_is_error():
    with pytest.raises(CliError):
        parse_args(["/d", "--bogus"])


def test_unknown_method_is_error():
    with pytest.raises(CliError):
        parse_args(["/d", "--methods", "exact,nope"])


def test_duplicate_input_is_error():
    with pytest.raises(CliError):
        parse_args(["/d", "--input=/other"])


def test_json_report_flag():
    # bare flag -> reference-style default file name (src/reporting.rs:42-61
    # hardcodes identical_files.json; ours is configurable)
    _, _, _, args = parse_args(["/d", "--json-report"])
    assert args.json_report == "identical_urls.json"
    _, _, _, args = parse_args(["/d", "--json-report", "/tmp/r.json"])
    assert args.json_report == "/tmp/r.json"
    _, _, _, args = parse_args(["/d"])
    assert args.json_report is None


def test_cli_span_trim_output(ray_session, tmp_path):
    """--span-trim emits a span-deduplicated parquet corpus whose rows match
    a direct span_trim() call at the same L, and reports summary stats."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from camden_ray.cli import main
    from camden_ray.stages.spantrim import span_trim

    W = [f"w{i}" for i in range(40)]
    docs = pa.table(
        {
            "url": pa.array(["http://a/1", "http://a/2"], type=pa.string()),
            "text": pa.array(
                [" ".join(W[:30]), "pre " + " ".join(W[:20]) + " post"],
                type=pa.string(),
            ),
        }
    )
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part.parquet")
    out_dir = tmp_path / "trimmed"

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            [str(inp), "--no-extract", "--methods", "exact",
             "--span-trim", str(out_dir), "--span-trim-l", "10"]
        )
    assert rc == 0
    stats = json.loads(buf.getvalue())["stats"]["span_trim"]
    assert stats["docs"] == 2 and stats["docs_trimmed"] == 1
    assert stats["tokens_removed"] == 20

    got = (
        ray.data.read_parquet(str(out_dir))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        span_trim(ray.data.from_arrow(docs), L=10, num_partitions=4,
                  key="url", text="text")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "n_tokens", "n_removed", "text_clean"]]
    )
    assert got[["url", "n_tokens", "n_removed", "text_clean"]].equals(want)


def test_cli_representative_flag_parses():
    from camden_ray.cli import parse_args

    _, _, cfg, _ = parse_args(["in", "--representative", "quality"])
    assert cfg.representative == "quality"


def test_cli_jsonl_input_matches_parquet(ray_session, webtext_path, tmp_path):
    """--input-format jsonl runs the identical pipeline: same cluster count,
    dup count, and representative set as the parquet run on the same data."""
    import contextlib
    import io
    import json

    import ray.data

    from camden_ray.cli import main
    from camden_ray.sources.jsonl import write_jsonl
    from camden_ray.sources.webtext import read_webtext

    jdir = tmp_path / "jsonl_in"
    write_jsonl(read_webtext(webtext_path), str(jdir))

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(argv)
        assert rc == 0
        return json.loads(buf.getvalue())["stats"]

    a = run([webtext_path, "--methods", "exact,minhash"])
    b = run([str(jdir), "--methods", "exact,minhash",
             "--input-format", "jsonl"])
    for k in ("rows", "edges", "clustered_urls", "clusters_nontrivial",
              "duplicates_removed"):
        assert a[k] == b[k], (k, a[k], b[k])
    assert a["rows"] > 0 and a["clusters_nontrivial"] > 0


def test_cli_jsonl_checkpoint_invalidates_on_corpus_change(
    ray_session, webtext_path, tmp_path
):
    """Regression: a JSONL run with an out_dir must fingerprint the shard
    files — growing the corpus and re-running the same out_dir must NOT
    resume the old run's stages."""
    import contextlib
    import io
    import json

    import pyarrow as pa

    import ray.data

    from camden_ray.cli import main
    from camden_ray.sources.jsonl import write_jsonl
    from camden_ray.sources.webtext import read_webtext

    jdir = tmp_path / "jsonl_in"
    write_jsonl(read_webtext(webtext_path), str(jdir))
    out_dir = str(tmp_path / "ckpt")

    def run():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(
                [str(jdir), out_dir, "--methods", "exact",
                 "--input-format", "jsonl"]
            )
        assert rc == 0
        return json.loads(buf.getvalue())["stats"]

    a = run()
    # append one shard with two exact-dup docs (plain text, no html)
    extra = pa.table(
        {"url": pa.array(["http://zzz/1", "http://zzz/2"]),
         "html": pa.array(
             [b"<html><body>zz dup zz</body></html>"] * 2, type=pa.binary()
         )}
    )
    write_jsonl(ray.data.from_arrow(extra), str(tmp_path / "extra"))
    import shutil

    for f in (tmp_path / "extra").iterdir():
        shutil.copy(f, jdir / f"extra-{f.name}")
    b = run()
    assert b["rows"] == a["rows"] + 2
    assert b["clustered_urls"] >= a["clustered_urls"] + 2
