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
