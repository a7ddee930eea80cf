"""CLI entry point: the generalization of camden's argument parsing
(/root/reference/src/cli.rs:38-84) for ``ray job submit``.

Shape parity with the reference (C1 in SURVEY.md §2):
  * positional ``input [out_dir]`` or ``--input=`` / ``--out=`` flag forms
    (camden: ``root [target]`` / ``--root=`` / ``--target=``,
    /root/reference/src/cli.rs:55-76);
  * ``--sequential`` — run with one shuffle partition and a single-actor
    pool, the analogue of camden's ``--no-thread``
    (/root/reference/src/cli.rs:44,48-51); results must equal the parallel
    run's (tested parallel ≡ sequential, like src/scanner.rs:135-143);
  * missing input, unknown flags, and excess positionals are errors
    (/root/reference/src/cli.rs:20-24,87-96);
  * the extension allow-list generalizes to ``--langs`` (scanner.rs:71-79).

Everything else (thresholds, shingle/signature geometry, methods) maps onto
:class:`DedupConfig` fields.

Usage::

    python -m camden_ray INPUT [OUT_DIR] [--methods exact,minhash]
        [--langs en,de] [--threshold 0.8] [--sequential] [--no-extract]

Owns its Ray session (scripts only — library code never calls ray.init,
SURVEY.md §3.4 driver contract).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from camden_ray.config import DedupConfig


class CliError(Exception):
    """Invalid command line (camden CliError, /root/reference/src/cli.rs:20-24)."""


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="camden_ray",
        description="Ray-Data-native web-scale near-duplicate detection",
        add_help=True,
    )
    p.add_argument("input", nargs="?", help="input Parquet path/dir (webtext schema)")
    p.add_argument("out_dir", nargs="?", help="checkpointed output directory")
    p.add_argument("--input", dest="input_flag", help="flag form of INPUT")
    p.add_argument("--out", dest="out_flag", help="flag form of OUT_DIR")
    p.add_argument(
        "--methods",
        default="exact,minhash,simhash,substring",
        help="comma list of dedup methods",
    )
    p.add_argument("--langs", default="", help="comma allow-list of langs (empty = all)")
    p.add_argument("--threshold", type=float, default=0.8, help="Jaccard τ")
    p.add_argument(
        "--sequential",
        action="store_true",
        help="single-partition run (camden --no-thread analogue)",
    )
    p.add_argument(
        "--no-extract",
        action="store_true",
        help="input already has extracted text column",
    )
    p.add_argument("--num-cpus", type=int, default=None, help="ray.init CPU cap")
    p.add_argument(
        "--json-report",
        nargs="?",
        const="identical_urls.json",
        default=None,
        metavar="PATH",
        help="write duplicate groups as pretty JSON (camden "
        "identical_files.json analogue, reference src/reporting.rs:42-61); "
        "default file name identical_urls.json",
    )
    p.add_argument(
        "--representative",
        choices=["min_url", "quality"],
        default="min_url",
        help="cluster representative: lexicographic min url (default) or "
        "the argmax-quality member (min-url tiebreak)",
    )
    p.add_argument(
        "--span-trim",
        metavar="DIR",
        default=None,
        help="ALSO emit a span-deduplicated corpus to DIR: every token span "
        ">= --span-trim-l that appears in a lexicographically earlier url "
        "is cut from the later doc (stages/spantrim.py; Lee et al. 2021)",
    )
    p.add_argument(
        "--span-trim-l",
        type=int,
        default=50,
        metavar="L",
        help="minimum duplicated span length in tokens for --span-trim",
    )
    p.add_argument(
        "--span-gram-shards",
        type=int,
        default=1,
        metavar="S",
        help="run the span-trim gram exchange as S sequential hash-space "
        "passes (peak spill ~1/S; exact — use when the corpus-token-sized "
        "exchange overflows a node's spill disk)",
    )
    p.add_argument(
        "--input-format",
        choices=["parquet", "jsonl"],
        default="parquet",
        help="input encoding: webtext parquet (default) or JSONL "
        "(sources/jsonl.py; binary html as <name>_b64, timestamps as "
        "ISO strings). Checkpoint resume fingerprints the shard files "
        "in either format",
    )
    return p


def parse_args(argv: list[str]) -> tuple[str, str | None, DedupConfig, argparse.Namespace]:
    """argv → (input, out_dir, config, raw args); raises CliError on misuse."""
    parser = build_parser()
    try:
        args = parser.parse_args(argv)
    except SystemExit as e:
        if e.code == 0:  # -h/--help: argparse printed usage; clean exit, not an error
            raise
        # unknown flags / bad values — surface as CliError (camden cli.rs:20-24)
        raise CliError(f"invalid arguments: {argv}") from e

    inp = args.input_flag or args.input
    if args.input_flag and args.input:
        raise CliError("input given both positionally and via --input")
    if not inp:
        raise CliError("input path is required (positional or --input=)")
    out = args.out_flag or args.out_dir
    if args.out_flag and args.out_dir:
        raise CliError("out_dir given both positionally and via --out")

    methods = tuple(m for m in args.methods.split(",") if m)
    bad = set(methods) - {"exact", "minhash", "simhash", "substring"}
    if bad:
        raise CliError(f"unknown methods: {sorted(bad)}")
    langs = tuple(l for l in args.langs.split(",") if l)

    cfg = DedupConfig(
        methods=methods,
        langs=langs,
        jaccard_threshold=args.threshold,
        shuffle_partitions=1 if args.sequential else 0,
        extract_concurrency=(1, 1) if args.sequential else (1, 8),
        representative=args.representative,
    )
    return inp, out, cfg, args


def _read_input(inp, input_format, columns, cfg, extract):
    from camden_ray.sources.webtext import read_webtext_any

    return read_webtext_any(
        inp, input_format, columns=columns, langs=cfg.langs,
        min_text_chars=0 if extract else cfg.min_text_chars,
    )


def run_span_trim(
    inp: str, out_dir: str, cfg: DedupConfig, L: int, extract: bool,
    input_format: str = "parquet", gram_shards: int = 1,
) -> dict:
    """--span-trim: emit the span-deduplicated corpus (url, text_clean,
    n_tokens, n_removed) as partitioned Parquet; winner order =
    lexicographic url. Returns summary stats."""
    from camden_ray.stages.candidates import partitions_for
    from camden_ray.stages.spantrim import span_trim

    columns = ["url", "html"] if extract else ["url", "text"]
    ds = _read_input(inp, input_format, columns, cfg, extract)
    if extract:
        from camden_ray.stages.extract import HtmlExtractorActor

        ds = ds.map_batches(
            HtmlExtractorActor,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.extract_concurrency,
            num_cpus=1,
        ).select_columns(["url", "text"])
    # materialize: count() + span_trim's two traversals would otherwise
    # re-run the read (and the extraction actor pool) three times
    ds = ds.materialize()
    try:
        n = ds.count()
    except Exception:
        n = 0
    P = partitions_for(cfg, n)
    out = span_trim(ds, L=L, num_partitions=P, key="url", text="text",
                    gram_shards=gram_shards)
    out = out.select_columns(["url", "n_tokens", "n_removed", "text_clean"])
    out = out.materialize()
    out.write_parquet(out_dir)
    import pyarrow as pa
    import pyarrow.compute as _pc

    def summary(t: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "removed": [int(_pc.sum(t["n_removed"]).as_py() or 0)],
                "touched": [
                    int(_pc.sum(_pc.cast(
                        _pc.greater(t["n_removed"], 0), "int64")).as_py() or 0)
                ],
            }
        )

    agg = out.map_batches(summary, batch_format="pyarrow").to_pandas()
    return {
        "docs": n,
        "docs_trimmed": int(agg["touched"].sum()),
        "tokens_removed": int(agg["removed"].sum()),
        "out_dir": out_dir,
    }


def main(argv: list[str] | None = None) -> int:
    try:
        inp, out, cfg, args = parse_args(
            argv if argv is not None else sys.argv[1:]
        )
    except CliError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from camden_ray.pipelines.dedup import run_dedup

    res = run_dedup(
        inp, cfg, out_dir=out, extract=not args.no_extract,
        input_format=args.input_format,
    )
    stats = dict(res["stats"])
    if args.json_report:
        from camden_ray.pipelines.reporting import write_json_report

        stats["json_report_groups"] = write_json_report(
            res["clusters"], args.json_report
        )
    if args.span_trim:
        stats["span_trim"] = run_span_trim(
            inp, args.span_trim, cfg,
            L=args.span_trim_l, extract=not args.no_extract,
            input_format=args.input_format,
            gram_shards=args.span_gram_shards,
        )
    print(json.dumps({"stats": stats, "config": dataclasses.asdict(cfg)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
