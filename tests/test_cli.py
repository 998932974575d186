"""CLI verbs (cli.py): profile -> validate -> docs pipeline over a
parquet batch, exit codes as the reference checkpoint-run contract
(0 = suite success, 1 = failure)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from great_expectations_spark.cli import main
from great_expectations_spark.core.suite import ExpectationSuite


@pytest.fixture(scope="module")
def data_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "events.parquet")
    spark.createDataFrame(
        [
            Row(day="2026-01-01", kind="a", value=float(i % 10))
            for i in range(50)
        ]
        + [
            Row(day="2026-01-02", kind="b", value=float(i % 7))
            for i in range(50)
        ]
    ).write.mode("overwrite").parquet(path)
    return path


def _run(argv):
    # --keep-session: the CLI must not stop the shared test session
    return main(argv + ["--keep-session"])


def test_profile_then_validate_then_docs(data_path, tmp_path, capsys):
    suite_path = str(tmp_path / "suite.json")
    assert _run(["profile", "--data", data_path, "--out", suite_path]) == 0
    suite = ExpectationSuite.from_json(open(suite_path).read())
    assert len(suite.expectations) > 3

    result_path = str(tmp_path / "result.json")
    rc = _run(
        [
            "validate",
            "--data",
            data_path,
            "--suite",
            suite_path,
            "--out",
            result_path,
        ]
    )
    assert rc == 0
    loaded = json.loads(open(result_path).read())
    assert loaded["success"] is True
    assert loaded["statistics"]["unsuccessful_expectations"] == 0

    docs_dir = str(tmp_path / "docs")
    assert (
        main(["docs", "--result", result_path, "--out-dir", docs_dir]) == 0
    )
    # docs now emits the navigable site: home -> suite -> run -> report
    import glob

    index = open(f"{docs_dir}/index.html").read()
    assert "suites/" in index and "index.html" in index
    reports = [
        p
        for p in glob.glob(f"{docs_dir}/suites/*/runs/*/*.html")
        if not p.endswith("index.html")
    ]
    assert reports
    page = open(reports[0]).read()
    assert "expect_" in page


def test_validate_failure_exit_code(data_path, tmp_path):
    suite = ExpectationSuite("failing")
    suite.add(
        "expect_table_row_count_to_be_between", min_value=1, max_value=2
    )
    suite_path = str(tmp_path / "failing.json")
    open(suite_path, "w").write(suite.to_json())
    rc = _run(
        ["validate", "--data", data_path, "--suite", suite_path,
         "--out", str(tmp_path / "r.json")]
    )
    assert rc == 1


def test_validate_per_partition_checkpoint(data_path, tmp_path):
    suite = ExpectationSuite("per_part")
    suite.add("expect_column_values_to_not_be_null", column="kind")
    suite_path = str(tmp_path / "pp.json")
    open(suite_path, "w").write(suite.to_json())
    out_path = str(tmp_path / "summary.json")
    rc = _run(
        [
            "validate",
            "--data",
            data_path,
            "--suite",
            suite_path,
            "--partition-column",
            "day",
            "--checkpoint-dir",
            str(tmp_path / "ckpt"),
            "--out",
            out_path,
        ]
    )
    assert rc == 0
    summary = json.loads(open(out_path).read())
    assert summary["success"] is True
    assert summary["partitions_total"] == 2
    assert len(summary["entries"]) == 2


def test_validate_checkpoint_sketches_and_detect_changes(
    data_path, tmp_path
):
    suite = ExpectationSuite("per_part")
    suite.add("expect_column_values_to_not_be_null", column="kind")
    suite_path = str(tmp_path / "pp.json")
    open(suite_path, "w").write(suite.to_json())
    out_path = str(tmp_path / "summary.json")
    docs_dir = str(tmp_path / "docs")
    argv = [
        "validate", "--data", data_path, "--suite", suite_path,
        "--partition-column", "day",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--detect-changes",
        "--sketch-columns", "kind",
        "--sketch-kinds", "hll,topk",
        "--docs-dir", docs_dir,
        "--out", out_path,
    ]
    assert _run(argv) == 0
    summary = json.loads(open(out_path).read())
    assert summary["success"] is True
    assert len(summary["sketch_partitions_computed"]) == 2
    assert summary["distinct_estimates"]["kind"] >= 1
    assert summary["top_values"]["kind"]
    stats_page = open(
        str(tmp_path / "docs" / "table_stats.html")
    ).read()
    assert "kind" in stats_page and "merged from" in stats_page
    # unchanged rerun: fingerprints match, nothing revalidated/resketched
    assert _run(argv) == 0
    summary2 = json.loads(open(out_path).read())
    assert summary2["partitions_validated_now"] == 0
    assert summary2["sketch_partitions_computed"] == []
    # sketch/change flags without --partition-column must error loudly,
    # not silently run a plain validation
    assert _run(
        ["validate", "--data", data_path, "--suite", suite_path,
         "--sketch-columns", "kind"]
    ) == 2
    assert _run(
        ["validate", "--data", data_path, "--suite", suite_path,
         "--detect-changes"]
    ) == 2


def test_examples_verb(spark, tmp_path, capsys):
    turns = str(tmp_path / "turns.parquet")
    spark.createDataFrame(
        [
            ("c1", 0, "user", "what is the answer"),
            ("c1", 1, "assistant", "the answer is forty two"),
            ("c2", 0, "user", "no reply here"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    ).write.mode("overwrite").parquet(turns)
    out = str(tmp_path / "examples")
    tok_path = str(tmp_path / "tok.json")
    rc = _run(
        ["examples", "--data", turns, "--out", out,
         "--vocab-size", "300", "--max-len", "32",
         "--save-tokenizer", tok_path]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_conversations"] == 1  # c2 has no supervised tokens
    assert 0 < stats["supervised_tokens"] <= stats["total_tokens"]
    got = spark.read.parquet(out).collect()
    assert all(len(r["input_ids"]) == len(r["loss_mask"]) for r in got)
    # round 2: reuse the persisted tokenizer
    assert _run(
        ["examples", "--data", turns, "--out", out,
         "--tokenizer", tok_path, "--max-len", "32",
         "--keep-unsupervised"]
    ) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["n_conversations"] == 2


def test_profile_assistant_and_rule_config(data_path, tmp_path):
    out = str(tmp_path / "assistant.json")
    assert (
        _run(["profile", "--data", data_path, "--assistant", "--out", out])
        == 0
    )
    suite = ExpectationSuite.from_json(open(out).read())
    types = {e.expectation_type for e in suite.expectations}
    assert "expect_table_row_count_to_be_between" in types

    config = {
        "name": "cli_rules",
        "rules": {
            "numeric": {
                "domain_builder": {
                    "class_name": "ColumnDomainBuilder",
                    "include_semantic_types": ["numeric"],
                },
                "parameter_builders": [
                    {
                        "class_name": "NumericMetricRangeParameterBuilder",
                        "name": "mean_range",
                        "metric_name": "column.mean",
                        "estimator": "exact",
                    }
                ],
                "expectation_configuration_builders": [
                    {
                        "class_name": (
                            "DefaultExpectationConfigurationBuilder"
                        ),
                        "expectation_type": (
                            "expect_column_mean_to_be_between"
                        ),
                        "min_value": "$parameter.mean_range.value[0]",
                        "max_value": "$parameter.mean_range.value[1]",
                    }
                ],
            }
        },
    }
    cfg_path = str(tmp_path / "rules.json")
    open(cfg_path, "w").write(json.dumps(config))
    out2 = str(tmp_path / "rules_suite.json")
    assert (
        _run(
            ["profile", "--data", data_path, "--rule-config", cfg_path,
             "--out", out2]
        )
        == 0
    )
    suite2 = ExpectationSuite.from_json(open(out2).read())
    assert {e.kwargs["column"] for e in suite2.expectations} == {"value"}


def test_suite_crud_verbs(tmp_path, capsys):
    """suite save/list/show/delete (reference cli/suite.py) — no Spark
    session involved for the filesystem store."""
    store_dir = str(tmp_path / "suite_store")
    suite_path = str(tmp_path / "s.json")
    suite = (
        ExpectationSuite("crud_suite")
        .add("expect_column_values_to_not_be_null", column="kind")
    )
    with open(suite_path, "w") as f:
        f.write(suite.to_json())

    assert main(["suite", "--store-dir", store_dir,
                 "save", "--suite", suite_path]) == 0
    capsys.readouterr()
    assert main(["suite", "--store-dir", store_dir, "list"]) == 0
    assert capsys.readouterr().out.strip() == "crud_suite"
    assert main(["suite", "--store-dir", store_dir,
                 "show", "--name", "crud_suite"]) == 0
    shown = json.loads(capsys.readouterr().out)
    assert shown["expectation_suite_name"] == "crud_suite"
    # save under an overridden name, then delete the original
    assert main(["suite", "--store-dir", store_dir,
                 "save", "--suite", suite_path, "--name", "renamed"]) == 0
    assert main(["suite", "--store-dir", store_dir,
                 "delete", "--name", "crud_suite"]) == 0
    capsys.readouterr()
    assert main(["suite", "--store-dir", store_dir, "list"]) == 0
    assert capsys.readouterr().out.split() == ["renamed"]
    assert main(["suite", "--store-dir", store_dir,
                 "show", "--name", "crud_suite"]) == 1


def test_init_and_checkpoint_verbs(spark, data_path, tmp_path, capsys):
    root = str(tmp_path / "proj")
    assert main(["init", "--root", root]) == 0
    gx_dir = capsys.readouterr().out.strip()
    assert gx_dir.endswith("great_expectations")

    # store a suite + a checkpoint config through the context API
    import great_expectations_spark as gx

    ctx = gx.get_context(context_root_dir=gx_dir, spark=spark)
    ctx.add_or_update_expectation_suite(
        "cli.suite",
        expectations=[
            {
                "expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": "kind"},
            }
        ],
    )
    ds = ctx.sources.add_spark("local", spark=spark)
    asset = ds.add_parquet_asset("events", data_path)
    ctx.add_checkpoint(
        name="nightly",
        validations=[{"asset": asset, "expectation_suite_name": "cli.suite"}],
    )

    assert main(["checkpoint", "--root", root, "list"]) == 0
    assert capsys.readouterr().out.strip() == "nightly"

    rc = main(
        ["checkpoint", "--root", root, "run", "--name", "nightly",
         "--keep-session"]
    )
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["success"] is True and out["validations"] == 1

    # ad-hoc runtime batch against a stored suite
    rc = main(
        ["checkpoint", "--root", root, "run", "--name", "nightly",
         "--data", data_path, "--suite-name", "cli.suite",
         "--keep-session"]
    )
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["success"] is True


def test_compare_verb(spark, data_path, tmp_path, capsys):
    import great_expectations_spark as gx

    gx_dir = str(tmp_path / "great_expectations")
    ctx = gx.get_context(context_root_dir=gx_dir, spark=spark)
    ctx.add_or_update_expectation_suite(
        "c.suite",
        expectations=[
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "value", "min_value": 0,
                           "max_value": 5},
            }
        ],
    )
    good = spark.read.parquet(data_path).filter("value <= 5")
    bad = spark.read.parquet(data_path)
    ctx.add_checkpoint(
        name="c",
        validations=[{"dataframe": good,
                      "expectation_suite_name": "c.suite"}],
    )
    ctx.run_checkpoint("c", run_id="a")
    ctx.run_checkpoint(
        "c", run_id="b",
        validations=[{"dataframe": bad,
                      "expectation_suite_name": "c.suite"}],
    )
    rc = main(["compare", "--root", gx_dir, "--suite", "c.suite"])
    out = capsys.readouterr().out
    assert rc == 1 and "regressed" in out
    rc = main(["compare", "--root", gx_dir, "--suite", "c.suite",
               "--before", "b", "--after", "a", "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["counts"].get("fixed") == 1


def test_curate_verb(spark, tmp_path, capsys):
    data = str(tmp_path / "docs.parquet")
    rows = []
    for src in ("a", "b"):
        for i in range(5):
            rows.append(Row(doc_id=len(rows), text=f"{src} doc {i}",
                            source=src))
        rows.append(Row(doc_id=len(rows), text=f"{src} doc 0", source=src))
    spark.createDataFrame(rows).write.mode("overwrite").parquet(data)
    cfg = str(tmp_path / "curate.json")
    with open(cfg, "w") as f:
        json.dump({"dedup_method": "exact"}, f)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rc = _run([
        "curate", "--data", data, "--partition-column", "source",
        "--out", out, "--checkpoint-dir", ckpt, "--config", cfg, "--docs",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["by_status"] == {"done": 2}
    assert spark.read.parquet(out + "/source=a").count() == 5
    # resume is a no-op second time
    rc2 = _run([
        "curate", "--data", data, "--partition-column", "source",
        "--out", out, "--checkpoint-dir", ckpt, "--config", cfg,
    ])
    assert rc2 == 0
    summary2 = json.loads(capsys.readouterr().out)
    assert summary2["executed"] == 0 and summary2["resumed"] == 2


def test_validate_sketch_histogram_flag(data_path, tmp_path):
    """--sketch-kinds histogram works end-to-end with
    --sketch-histogram-edges (JSON column -> edges), renders the
    histogram into the docs page, and fails LOUDLY at argument level —
    not with a store-level error later — when edges are missing or a
    kind is unknown (ADVICE r4 #4)."""
    suite = ExpectationSuite("hist")
    suite.add("expect_column_values_to_not_be_null", column="value")
    suite_path = str(tmp_path / "h.json")
    open(suite_path, "w").write(suite.to_json())
    out_path = str(tmp_path / "s.json")
    docs_dir = str(tmp_path / "docs")
    base = [
        "validate", "--data", data_path, "--suite", suite_path,
        "--partition-column", "day",
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--sketch-columns", "value",
    ]
    ok = base + [
        "--sketch-kinds", "hll,histogram",
        "--sketch-histogram-edges", '{"value": [0, 2, 5, 10]}',
        "--docs-dir", docs_dir, "--out", out_path,
    ]
    assert _run(ok) == 0
    summary = json.loads(open(out_path).read())
    assert summary["histograms"]["value"]["counts"]
    assert sum(summary["histograms"]["value"]["counts"]) == 100
    page = open(str(tmp_path / "docs" / "table_stats.html")).read()
    assert "histogram" in page and "[0, 2)" in page
    # histogram kind without edges: clear exit-2, before any Spark work
    assert _run(base + ["--sketch-kinds", "histogram"]) == 2
    # unknown kind: same
    assert _run(base + ["--sketch-kinds", "hll,bogus"]) == 2
    # malformed JSON: same
    assert _run(
        base + ["--sketch-kinds", "histogram",
                "--sketch-histogram-edges", "not json"]
    ) == 2
    # non-list edge value: clean exit-2, not a TypeError traceback
    assert _run(
        base + ["--sketch-kinds", "histogram",
                "--sketch-histogram-edges", '{"value": 5}']
    ) == 2
