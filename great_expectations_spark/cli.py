"""Command-line interface — the reference's ``cli/`` core verbs
(``great_expectations suite new`` / ``checkpoint run`` / ``docs build``)
mapped onto this engine:

    python -m great_expectations_spark.cli validate \\
        --data /path/table.parquet --suite suite.json --out result.json
    python -m great_expectations_spark.cli profile \\
        --data /path/table.parquet --out suite.json
    python -m great_expectations_spark.cli docs \\
        --result result.json --out-dir data_docs/

``validate`` exits 0 on suite success and 1 on failure (the reference
checkpoint-run contract), so it drops straight into shell pipelines and
schedulers.  ``--partition-column`` + ``--checkpoint-dir`` switch to the
resumable per-partition checkpoint runner.  All verbs are plain argparse
over the library API — scripting the Python API directly stays the
first-class path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional


def _build_spark(args):
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(args.master)
        .appName("gx-spark-cli")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def _load_df(spark, args):
    from great_expectations_spark.sources.readers import (
        BatchSpec,
        load_batch,
    )

    spec = BatchSpec(
        path=args.data,
        table=getattr(args, "table", None),
        format=args.format,
    )
    return load_batch(spark, spec)


def _cmd_validate(args) -> int:
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    with open(args.suite) as f:
        suite = ExpectationSuite.from_dict(json.load(f))
    if not args.partition_column and (
        getattr(args, "detect_changes", False)
        or getattr(args, "sketch_columns", None)
    ):
        print(
            "--detect-changes/--sketch-columns require --partition-column"
            " (they only apply to per-partition checkpoint runs)",
            file=sys.stderr,
        )
        return 2
    spark = _build_spark(args)
    try:
        df = _load_df(spark, args)
        if args.partition_column:
            from great_expectations_spark.checkpoint.runner import (
                run_checkpoint,
            )

            if not args.checkpoint_dir:
                print(
                    "--partition-column requires --checkpoint-dir",
                    file=sys.stderr,
                )
                return 2
            kinds = tuple(
                getattr(args, "sketch_kinds", "hll").split(",")
            )
            from great_expectations_spark.checkpoint.sketches import KINDS

            bad_kinds = sorted(set(kinds) - set(KINDS))
            if bad_kinds:
                print(
                    f"unknown --sketch-kinds {bad_kinds}; pick from "
                    f"{','.join(KINDS)}",
                    file=sys.stderr,
                )
                return 2
            hist_edges = None
            if getattr(args, "sketch_histogram_edges", None):
                try:
                    hist_edges = {
                        str(c): [float(x) for x in edges]
                        for c, edges in json.loads(
                            args.sketch_histogram_edges
                        ).items()
                    }
                except (ValueError, AttributeError, TypeError) as exc:
                    # TypeError: a non-list edge value ({"col": 5})
                    print(
                        "--sketch-histogram-edges must be a JSON object "
                        f"of column -> numeric edge list: {exc}",
                        file=sys.stderr,
                    )
                    return 2
            if "histogram" in kinds and not hist_edges:
                print(
                    "--sketch-kinds histogram needs "
                    "--sketch-histogram-edges (JSON column -> edges)",
                    file=sys.stderr,
                )
                return 2
            summary = run_checkpoint(
                df,
                suite,
                partition_column=args.partition_column,
                checkpoint_dir=args.checkpoint_dir,
                result_format=args.result_format,
                detect_changes=bool(
                    getattr(args, "detect_changes", False)
                ),
                sketch_columns=(
                    args.sketch_columns.split(",")
                    if getattr(args, "sketch_columns", None)
                    else None
                ),
                sketch_kinds=kinds,
                sketch_histogram_edges=hist_edges,
            )
            payload = summary
            success = bool(summary.get("success"))
            if args.docs_dir:
                from great_expectations_spark.render.html import (
                    render_table_stats_html,
                )

                os.makedirs(args.docs_dir, exist_ok=True)
                out = os.path.join(args.docs_dir, "table_stats.html")
                with open(out, "w") as f:
                    f.write(
                        render_table_stats_html(
                            distinct=summary.get("distinct_estimates"),
                            moments=summary.get("stats_estimates"),
                            top_values=summary.get("top_values"),
                            histograms=summary.get("histograms"),
                            partitions=summary.get("partitions_done"),
                        )
                    )
                print(f"docs: {out}", file=sys.stderr)
        else:
            result = SuiteValidator().validate(
                df, suite, result_format=args.result_format
            )
            payload = result.to_json_dict()
            success = bool(result.success)
            if args.docs_dir:
                from great_expectations_spark.render.html import (
                    render_suite_result_html,
                )

                os.makedirs(args.docs_dir, exist_ok=True)
                out = os.path.join(args.docs_dir, "validation_result.html")
                with open(out, "w") as f:
                    f.write(render_suite_result_html(result))
                print(f"docs: {out}", file=sys.stderr)
        text = json.dumps(payload, indent=2, sort_keys=True, default=str)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text)
        else:
            print(text)
        print(
            f"validation {'succeeded' if success else 'FAILED'}",
            file=sys.stderr,
        )
        return 0 if success else 1
    finally:
        if not args.keep_session:
            spark.stop()


def _cmd_profile(args) -> int:
    spark = _build_spark(args)
    try:
        df = _load_df(spark, args)
        if args.rule_config:
            from great_expectations_spark.operators.rule_profiler import (
                RuleBasedProfiler,
            )

            with open(args.rule_config) as f:
                profiler = RuleBasedProfiler.from_config(json.load(f))
            suite = profiler.run([df], suite_name=args.suite_name).suite
        elif args.assistant:
            from great_expectations_spark.operators.rule_profiler import (
                onboarding_assistant,
            )

            suite = onboarding_assistant().run(
                [df], suite_name=args.suite_name
            ).suite
        else:
            from great_expectations_spark.operators.profiler import (
                suggest_suite,
            )

            suite = suggest_suite(
                df,
                suite_name=args.suite_name,
                columns=args.columns or None,
            )
        text = suite.to_json()
        if args.out:
            with open(args.out, "w") as f:
                f.write(text)
        else:
            print(text)
        print(
            f"profiled {len(suite.expectations)} expectations",
            file=sys.stderr,
        )
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def _suite_store(args):
    from great_expectations_spark.checkpoint.store_backends import (
        FilesystemResultBackend,
    )
    from great_expectations_spark.checkpoint.suite_store import SuiteStore

    return SuiteStore(FilesystemResultBackend(args.store_dir))


def _cmd_suite(args) -> int:
    """``suite save/list/show/delete`` — reference ``cli/suite.py`` verbs
    over the SuiteStore (no Spark session needed for the filesystem
    backend)."""
    from great_expectations_spark.core.suite import ExpectationSuite

    store = _suite_store(args)
    if args.suite_command == "save":
        with open(args.suite) as f:
            suite = ExpectationSuite.from_dict(json.load(f))
        if args.name:
            suite.expectation_suite_name = args.name
        version = store.save(suite)
        print(f"saved {suite.expectation_suite_name} @ {version}")
        return 0
    if args.suite_command == "list":
        for name in store.list_suites():
            print(name)
        return 0
    if args.suite_command == "show":
        try:
            print(store.load(args.name).to_json())
        except KeyError as exc:
            print(str(exc), file=sys.stderr)
            return 1
        return 0
    if args.suite_command == "delete":
        store.delete(args.name)
        print(f"deleted {args.name}")
        return 0
    return 2


def _cmd_docs(args) -> int:
    from great_expectations_spark.render.site import SiteBuilder

    with open(args.result) as f:
        loaded = json.load(f)
    # incremental: re-running docs over successive result files extends
    # the same navigable site (home -> suite -> run -> report)
    SiteBuilder(args.out_dir).add_validation_result(loaded)
    index = os.path.join(args.out_dir, "index.html")
    print(f"docs: {index}", file=sys.stderr)
    return 0


def _cmd_init(args) -> int:
    """Scaffold a file-backed DataContext (reference ``gx init``)."""
    from great_expectations_spark.context import FileDataContext

    ctx = FileDataContext.create(args.root)
    print(ctx.root_directory)
    return 0


def _cmd_checkpoint(args) -> int:
    """Checkpoint verbs against a project directory (reference
    ``great_expectations checkpoint run/list``)."""
    from great_expectations_spark.context import FileDataContext

    gx_dir = os.path.join(args.root, FileDataContext.GX_DIR)
    if not os.path.isdir(gx_dir):
        gx_dir = args.root  # allow pointing at the gx dir itself
    spark = None
    if args.checkpoint_command == "run":
        spark = _build_spark(args)
    ctx = FileDataContext(gx_dir, spark=spark)
    try:
        if args.checkpoint_command == "list":
            for name in ctx.list_checkpoints():
                print(name)
            return 0
        # run
        run_kwargs = {}
        if args.data:
            if not args.suite_name:
                print(
                    "--data needs --suite-name (ad-hoc runtime batch)",
                    file=sys.stderr,
                )
                return 2
            run_kwargs["validations"] = [
                {
                    "dataframe": _load_df(spark, args),
                    "expectation_suite_name": args.suite_name,
                }
            ]
        result = ctx.run_checkpoint(args.name, **run_kwargs)
        print(
            json.dumps(
                {
                    "checkpoint": result.checkpoint_name,
                    "run_id": result.run_id,
                    "success": result.success,
                    "validations": len(result.run_results),
                }
            )
        )
        return 0 if result.success else 1
    finally:
        if spark is not None and not args.keep_session:
            spark.stop()


def _cmd_compare(args) -> int:
    """Diff two stored validation runs (exit 1 when anything regressed,
    so the verb gates pipelines like `validate` does)."""
    from great_expectations_spark.checkpoint.compare import (
        compare_to_markdown,
    )
    from great_expectations_spark.context import FileDataContext

    gx_dir = os.path.join(args.root, FileDataContext.GX_DIR)
    if not os.path.isdir(gx_dir):
        gx_dir = args.root
    ctx = FileDataContext(gx_dir)
    try:
        diff = ctx.compare_runs(
            args.suite, run_before=args.before, run_after=args.after
        )
    except (KeyError, ValueError) as exc:
        print(f"compare: {exc}", file=sys.stderr)
        return 2
    if args.json:
        print(json.dumps(diff, indent=1, sort_keys=True))
    else:
        print(compare_to_markdown(diff), end="")
    return 1 if diff["regressed"] else 0


def _cmd_examples(args) -> int:
    """Turns -> masked training examples parquet; prints example_stats
    JSON (the dataloader contract totals) on stdout."""
    from great_expectations_spark.functions.examples import (
        build_training_examples,
        example_stats,
    )
    from great_expectations_spark.functions.tokenize import (
        bpe_load,
        bpe_save,
        train_bpe,
    )

    spark = _build_spark(args)
    try:
        df = _load_df(spark, args)
        if args.tokenizer:
            tok = bpe_load(spark, args.tokenizer)
        else:
            tok = train_bpe(
                df.where(f"`{args.text_column}` IS NOT NULL"),
                args.text_column,
                vocab_size=args.vocab_size,
            )
            if args.save_tokenizer:
                bpe_save(spark, tok, args.save_tokenizer)
                print(f"tokenizer: {args.save_tokenizer}", file=sys.stderr)
        examples = build_training_examples(
            df,
            tok,
            conv_column=args.conv_column,
            order_column=args.order_column,
            role_column=args.role_column,
            text_column=args.text_column,
            max_len=args.max_len,
            supervise_roles=tuple(
                r.strip() for r in args.supervise.split(",") if r.strip()
            ),
            drop_unsupervised=not args.keep_unsupervised,
        )
        examples.write.mode("overwrite").parquet(args.out)
        stats = example_stats(
            spark.read.parquet(args.out), conv_column=args.conv_column
        ).first()
        print(json.dumps(stats.asDict(), default=str, sort_keys=True))
        print(f"examples: {args.out}", file=sys.stderr)
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def _cmd_curate(args) -> int:
    """Resumable checkpointed curation run (curate_by_partition): exit 0
    when every partition is done, 1 when any partition failed (re-run to
    retry only those)."""
    from great_expectations_spark.checkpoint.curation_runner import (
        curate_by_partition,
    )

    spark = _build_spark(args)
    try:
        df = _load_df(spark, args)
        kwargs: dict = {}
        if args.config:
            with open(args.config, encoding="utf-8") as f:
                kwargs = json.load(f)
            if not isinstance(kwargs, dict):
                print("curate: --config must hold a JSON object",
                      file=sys.stderr)
                return 2
        summary = curate_by_partition(
            df,
            args.partition_column,
            args.out,
            args.checkpoint_dir,
            curate_kwargs=kwargs,
            output_format=args.output_format,
            write_docs=args.docs,
        )
        print(json.dumps(
            {k: v for k, v in summary.items() if k != "entries"},
            indent=1, sort_keys=True,
        ))
        return 0 if summary["by_status"].get("failed", 0) == 0 else 1
    finally:
        if not args.keep_session:
            spark.stop()


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="great_expectations_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = parser.add_subparsers(dest="command", required=True)

    def add_spark_args(p):
        p.add_argument("--master", default="local[*]")
        p.add_argument("--shuffle-partitions", type=int, default=32)
        p.add_argument(
            "--keep-session",
            action="store_true",
            help="do not stop the SparkSession on exit (shared sessions)",
        )

    def add_data_args(p):
        p.add_argument("--data", help="input path (file/directory)")
        p.add_argument("--table", help="catalog table instead of --data")
        p.add_argument(
            "--format", help="reader format (default: inferred from path)"
        )

    v = sub.add_parser("validate", help="run a suite against a batch")
    add_spark_args(v)
    add_data_args(v)
    v.add_argument("--suite", required=True, help="suite JSON file")
    v.add_argument("--result-format", default="SUMMARY")
    v.add_argument("--out", help="write result JSON here (default stdout)")
    v.add_argument(
        "--partition-column",
        help="validate per partition via the resumable checkpoint runner",
    )
    v.add_argument("--checkpoint-dir", help="manifest dir for resume")
    v.add_argument(
        "--detect-changes",
        action="store_true",
        help="fingerprint partitions; re-validate ones whose data changed",
    )
    v.add_argument(
        "--sketch-columns",
        help="comma-separated columns for incremental table stats",
    )
    v.add_argument(
        "--sketch-kinds",
        default="hll",
        help=(
            "comma-separated from hll,moments,topk,histogram (default "
            "hll); histogram also needs --sketch-histogram-edges"
        ),
    )
    v.add_argument(
        "--sketch-histogram-edges",
        help=(
            "JSON mapping column -> strictly-increasing bin edges, e.g. "
            '\'{"turn_idx": [0, 5, 10, 50]}\' — required with '
            "--sketch-kinds histogram"
        ),
    )
    v.add_argument("--docs-dir", help="also render HTML docs here")
    v.set_defaults(fn=_cmd_validate)

    p = sub.add_parser("profile", help="generate a suite from data")
    add_spark_args(p)
    add_data_args(p)
    p.add_argument("--out", help="write suite JSON here (default stdout)")
    p.add_argument("--suite-name", default="profiled")
    p.add_argument(
        "--columns", nargs="*", help="restrict profiling to these columns"
    )
    p.add_argument(
        "--assistant",
        action="store_true",
        help="use the onboarding-assistant rule pack (multi-rule profiler)",
    )
    p.add_argument(
        "--rule-config",
        help="JSON RuleBasedProfiler config (declarative rules)",
    )
    p.set_defaults(fn=_cmd_profile)

    s = sub.add_parser(
        "suite", help="suite CRUD against a store directory"
    )
    s.add_argument("--store-dir", required=True, help="suite store root")
    ssub = s.add_subparsers(dest="suite_command", required=True)
    s_save = ssub.add_parser("save", help="persist a suite JSON file")
    s_save.add_argument("--suite", required=True, help="suite JSON file")
    s_save.add_argument("--name", help="override the stored suite name")
    ssub.add_parser("list", help="list live suites")
    s_show = ssub.add_parser("show", help="print the latest suite JSON")
    s_show.add_argument("--name", required=True)
    s_del = ssub.add_parser("delete", help="tombstone a suite")
    s_del.add_argument("--name", required=True)
    s.set_defaults(fn=_cmd_suite)

    d = sub.add_parser("docs", help="render HTML docs from a stored result")
    d.add_argument("--result", required=True, help="validation result JSON")
    d.add_argument("--out-dir", required=True)
    d.set_defaults(fn=_cmd_docs)

    i = sub.add_parser(
        "init", help="scaffold a file-backed project (reference `gx init`)"
    )
    i.add_argument("--root", default=".", help="project root directory")
    i.set_defaults(fn=_cmd_init)

    c = sub.add_parser(
        "checkpoint", help="named-checkpoint verbs against a project dir"
    )
    c.add_argument(
        "--root", required=True,
        help="project root (or the great_expectations/ dir itself)",
    )
    csub = c.add_subparsers(dest="checkpoint_command", required=True)
    c_run = csub.add_parser(
        "run", help="run a stored checkpoint; exit 0 iff every suite passed"
    )
    add_spark_args(c_run)
    add_data_args(c_run)
    c_run.add_argument("--name", required=True)
    c_run.add_argument(
        "--suite-name",
        help="with --data: run the named stored suite on an ad-hoc batch",
    )
    csub.add_parser("list", help="list stored checkpoint names")
    c.set_defaults(fn=_cmd_checkpoint)

    cmp_p = sub.add_parser(
        "compare",
        help="diff two stored validation runs; exit 1 on regression",
    )
    cmp_p.add_argument("--root", required=True)
    cmp_p.add_argument("--suite", required=True)
    cmp_p.add_argument("--before", help="run id (default: second-latest)")
    cmp_p.add_argument("--after", help="run id (default: latest)")
    cmp_p.add_argument(
        "--json", action="store_true", help="JSON instead of markdown"
    )
    cmp_p.set_defaults(fn=_cmd_compare)

    cu = sub.add_parser(
        "curate",
        help="resumable per-partition corpus curation "
             "(checkpoint manifest; re-run retries failures only)",
    )
    add_spark_args(cu)
    add_data_args(cu)
    cu.add_argument("--partition-column", required=True)
    cu.add_argument("--out", required=True, help="curated output root")
    cu.add_argument(
        "--checkpoint-dir", required=True, help="manifest directory"
    )
    cu.add_argument(
        "--config",
        help="JSON file of curate_corpus kwargs (stages/thresholds); "
             "DataFrame-valued stages are API-only",
    )
    cu.add_argument("--output-format", default="parquet")
    cu.add_argument(
        "--docs", action="store_true",
        help="render per-partition attrition HTML under the checkpoint",
    )
    cu.set_defaults(fn=_cmd_curate)

    ex = sub.add_parser(
        "examples",
        help="assemble masked training examples from conversation turns "
             "(deterministic role headers, per-token loss masks, "
             "fixed-length chunks)",
    )
    add_spark_args(ex)
    add_data_args(ex)
    ex.add_argument("--out", required=True, help="examples parquet root")
    ex.add_argument(
        "--tokenizer", help="trained BPE JSON (bpe_save); omit to train"
    )
    ex.add_argument(
        "--vocab-size", type=int, default=8192,
        help="when training inline (no --tokenizer)",
    )
    ex.add_argument(
        "--save-tokenizer", help="persist the inline-trained tokenizer"
    )
    ex.add_argument("--conv-column", default="conv_id")
    ex.add_argument("--order-column", default="turn_idx")
    ex.add_argument("--role-column", default="role")
    ex.add_argument("--text-column", default="text")
    ex.add_argument("--max-len", type=int, default=2048)
    ex.add_argument(
        "--supervise", default="assistant",
        help="comma-separated roles whose tokens carry loss",
    )
    ex.add_argument(
        "--keep-unsupervised", action="store_true",
        help="keep examples whose loss mask is all zeros",
    )
    ex.set_defaults(fn=_cmd_examples)
    return parser


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
