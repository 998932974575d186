"""DataContext facade (context.py) — the reference's get_context()
surface (util.py:1735-1824, data_context/data_context/*.py): suite CRUD,
get_validator, named checkpoints, URN-chained evaluation parameters,
Data Docs, file-context persistence across reopen."""

from __future__ import annotations

import json
import os

import pytest

import great_expectations_spark as gx
from great_expectations_spark.context import (
    EphemeralDataContext,
    FileDataContext,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(i, f"t{i}", float(i)) for i in range(100)],
        "turn_idx int, text string, value double",
    )


def test_get_context_default_is_ephemeral(spark):
    ctx = gx.get_context(spark=spark)
    assert isinstance(ctx, EphemeralDataContext)


def test_suite_crud_roundtrip(spark):
    ctx = gx.get_context(spark=spark)
    suite = ctx.add_or_update_expectation_suite(
        "s1",
        expectations=[
            {
                "expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": "text"},
            }
        ],
    )
    assert suite.expectation_suite_name == "s1"
    loaded = ctx.get_expectation_suite("s1")
    assert loaded.expectations[0].expectation_type == (
        "expect_column_values_to_not_be_null"
    )
    assert ctx.list_expectation_suite_names() == ["s1"]
    with pytest.raises(ValueError):
        ctx.add_expectation_suite("s1")
    ctx.delete_expectation_suite("s1")
    with pytest.raises(KeyError):
        ctx.get_expectation_suite("s1")


def test_get_validator_accumulates_into_stored_suite(spark, df):
    ctx = gx.get_context(spark=spark)
    v = ctx.get_validator(dataframe=df, expectation_suite_name="s2")
    r = v.expect_column_values_to_not_be_null("text")
    assert r.success
    ctx.save_expectation_suite(v.get_expectation_suite())
    # reload → the expectation persisted; validator seeded with it
    v2 = ctx.get_validator(dataframe=df, expectation_suite_name="s2")
    assert len(v2.get_expectation_suite().expectations) == 1
    v2.expect_column_mean_to_be_between("value", min_value=0)
    assert len(v2.get_expectation_suite().expectations) == 2


def test_checkpoint_run_dataframe_and_docs(spark, df):
    ctx = gx.get_context(spark=spark)
    ctx.add_or_update_expectation_suite(
        "s3",
        expectations=[
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "value", "min_value": 0,
                           "max_value": 1000},
            }
        ],
    )
    cp = ctx.add_checkpoint(
        name="nightly",
        validations=[{"dataframe": df, "expectation_suite_name": "s3"}],
    )
    result = ctx.run_checkpoint("nightly")
    assert result.success
    assert result.checkpoint_name == "nightly"
    assert len(result.list_validation_results()) == 1
    # result stored → URN-resolvable
    latest = ctx.validations_store.latest("s3")
    assert latest["success"] is True
    # docs site got the run page
    index = ctx.open_data_docs()
    assert os.path.exists(index)
    assert cp is ctx.get_checkpoint("nightly")


def test_checkpoint_urn_chained_evaluation_parameters(spark, df):
    """Downstream suite consumes the upstream suite's observed row count
    via the urn:great_expectations:validations: grammar, resolved from
    the context's own validations store."""
    ctx = gx.get_context(spark=spark)
    ctx.add_or_update_expectation_suite(
        "upstream",
        expectations=[
            {
                "expectation_type": "expect_table_row_count_to_be_between",
                "kwargs": {"min_value": 1},
            }
        ],
    )
    ctx.add_or_update_expectation_suite(
        "downstream",
        expectations=[
            {
                "expectation_type": "expect_table_row_count_to_equal",
                "kwargs": {
                    "value": {
                        "$PARAMETER": (
                            "urn:great_expectations:validations:upstream:"
                            "expect_table_row_count_to_be_between"
                            ".result.observed_value"
                        )
                    }
                },
            }
        ],
    )
    ctx.add_checkpoint(
        name="chain",
        validations=[
            {"dataframe": df, "expectation_suite_name": "upstream"},
            {"dataframe": df, "expectation_suite_name": "downstream"},
        ],
    )
    result = ctx.run_checkpoint("chain")
    assert result.success, json.dumps(result.to_json_dict(), indent=1)[:2000]


def test_file_context_scaffold_and_persistence(spark, df, tmp_path):
    root = str(tmp_path)
    ctx = gx.get_context(project_root_dir=root, spark=spark)
    assert isinstance(ctx, FileDataContext)
    gx_dir = os.path.join(root, "great_expectations")
    assert os.path.exists(os.path.join(gx_dir, "great_expectations.yml"))
    for sub in (
        "expectations",
        "checkpoints",
        os.path.join("uncommitted", "validations"),
        os.path.join("uncommitted", "data_docs", "local_site"),
    ):
        assert os.path.isdir(os.path.join(gx_dir, sub)), sub

    parquet = os.path.join(root, "events.parquet")
    df.write.mode("overwrite").parquet(parquet)
    ds = ctx.sources.add_spark("local", spark=spark)
    asset = ds.add_parquet_asset("events", parquet)
    ctx.add_or_update_expectation_suite(
        "file.suite",
        expectations=[
            {
                "expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": "text"},
            }
        ],
    )
    ctx.add_checkpoint(
        name="persisted",
        validations=[
            {"asset": asset, "expectation_suite_name": "file.suite"}
        ],
    )
    r1 = ctx.run_checkpoint("persisted")
    assert r1.success

    # a FRESH context over the same directory sees everything
    ctx2 = gx.get_context(context_root_dir=gx_dir, spark=spark)
    assert ctx2.list_expectation_suite_names() == ["file.suite"]
    assert "persisted" in ctx2.list_checkpoints()
    # checkpoint reloads from its persisted batch_spec (no datasource
    # re-registration needed) and runs
    r2 = ctx2.run_checkpoint("persisted")
    assert r2.success
    # batch lineage survived the reload
    res = r2.list_validation_results()[0]
    assert res.meta["batch_spec"]["path"] == parquet

    # build_data_docs rebuilds from the full stored history
    site = ctx2.build_data_docs()
    assert os.path.exists(site["local_site"])
    html = open(site["local_site"], encoding="utf-8").read()
    assert "file.suite" in html


def test_runtime_checkpoint_reload_requires_override(spark, df, tmp_path):
    gx_dir = os.path.join(str(tmp_path), "great_expectations")
    ctx = gx.get_context(context_root_dir=gx_dir, spark=spark)
    ctx.add_or_update_expectation_suite(
        "rt",
        expectations=[
            {
                "expectation_type": "expect_table_row_count_to_be_between",
                "kwargs": {"min_value": 1},
            }
        ],
    )
    ctx.add_checkpoint(
        name="runtime_cp",
        validations=[{"dataframe": df, "expectation_suite_name": "rt"}],
    )
    ctx2 = gx.get_context(context_root_dir=gx_dir, spark=spark)
    cp = ctx2.get_checkpoint("runtime_cp")
    with pytest.raises(ValueError):
        cp.run()  # dataframe can't persist
    r = cp.run(
        validations=[{"dataframe": df, "expectation_suite_name": "rt"}]
    )
    assert r.success


def test_checkpoint_action_list_fires(spark, df):
    from great_expectations_spark.checkpoint.actions import FunctionAction

    ctx = gx.get_context(spark=spark)
    ctx.add_or_update_expectation_suite(
        "act",
        expectations=[
            {
                "expectation_type": "expect_column_values_to_be_between",
                # half the rows violate → suite fails → failure action
                "kwargs": {"column": "value", "max_value": 49},
            }
        ],
    )
    seen = []
    action = FunctionAction(lambda c: seen.append(c.suite_name))
    action.notify_on = "failure"
    ctx.add_checkpoint(
        name="with_action",
        validations=[{"dataframe": df, "expectation_suite_name": "act"}],
        action_list=[action],
    )
    result = ctx.run_checkpoint("with_action")
    assert not result.success
    assert seen == ["act"]


def test_file_context_honors_yml_base_directory_overrides(spark, tmp_path):
    import textwrap

    gx_dir = os.path.join(str(tmp_path), "great_expectations")
    os.makedirs(gx_dir)
    with open(os.path.join(gx_dir, "great_expectations.yml"), "w") as f:
        f.write(textwrap.dedent("""\
            config_version: 3.0
            stores:
              expectations_store:
                class_name: SuiteStore
                base_directory: my_suites/
              validations_store:
                base_directory: /%s/abs_validations
              checkpoint_store:
                base_directory: cps/
            data_docs_sites:
              local_site:
                base_directory: site/
            """) % str(tmp_path).strip("/"))
    ctx = gx.get_context(context_root_dir=gx_dir, spark=spark)
    ctx.add_or_update_expectation_suite(
        "o",
        expectations=[
            {
                "expectation_type": "expect_table_row_count_to_be_between",
                "kwargs": {"min_value": 0},
            }
        ],
    )
    assert os.path.isdir(os.path.join(gx_dir, "my_suites"))
    assert ctx.checkpoints_directory == os.path.join(gx_dir, "cps/")
    assert ctx.data_docs_directory == os.path.join(gx_dir, "site/")
    # absolute override lands outside the gx dir
    df = spark.range(3).toDF("n")
    ctx.add_checkpoint(
        name="cp", validations=[{"dataframe": df,
                                 "expectation_suite_name": "o"}])
    assert ctx.run_checkpoint("cp").success
    assert os.path.isdir(os.path.join(str(tmp_path), "abs_validations"))
    # reopen still resolves the same layout
    ctx2 = gx.get_context(context_root_dir=gx_dir, spark=spark)
    assert ctx2.list_expectation_suite_names() == ["o"]


def test_compare_runs_regression_diff(spark):
    """Two checkpoint runs of one suite over good then degraded data ->
    per-expectation transitions, metric deltas, markdown render."""
    from great_expectations_spark.checkpoint.compare import (
        compare_to_markdown,
    )

    ctx = gx.get_context(spark=spark)
    ctx.add_or_update_expectation_suite(
        "reg",
        expectations=[
            {
                "expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": "text"},
            },
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "value", "min_value": 0,
                           "max_value": 49},
            },
            {
                "expectation_type": "expect_column_mean_to_be_between",
                "kwargs": {"column": "value", "min_value": 0,
                           "max_value": 1000},
            },
        ],
    )
    good = spark.createDataFrame(
        [(f"t{i}", float(i % 50)) for i in range(100)],
        "text string, value double",
    )
    bad = spark.createDataFrame(
        [(f"t{i}" if i % 4 else None, float(i % 80)) for i in range(100)],
        "text string, value double",
    )
    ctx.add_checkpoint(
        name="rcp",
        validations=[{"dataframe": good, "expectation_suite_name": "reg"}],
    )
    ctx.run_checkpoint("rcp", run_id="r1")
    ctx.run_checkpoint(
        "rcp",
        run_id="r2",
        validations=[{"dataframe": bad, "expectation_suite_name": "reg"}],
    )
    diff = ctx.compare_runs("reg")
    assert diff["run_before"] == "r1" and diff["run_after"] == "r2"
    assert diff["regressed"] is True
    by_type = {r["expectation_type"]: r for r in diff["expectations"]}
    assert by_type["expect_column_values_to_not_be_null"][
        "transition"] == "regressed"
    assert by_type["expect_column_values_to_be_between"][
        "transition"] == "regressed"
    nn = by_type["expect_column_values_to_not_be_null"]
    assert nn["unexpected_percent_before"] == 0.0
    assert nn["unexpected_percent_delta"] == pytest.approx(25.0)
    mean = by_type["expect_column_mean_to_be_between"]
    assert mean["transition"] == "stable_pass"
    assert mean["observed_value_delta"] == pytest.approx(
        mean["observed_value_after"] - mean["observed_value_before"])
    md = compare_to_markdown(diff)
    assert "regressed" in md and "expect_column_values_to_not_be_null" in md
    # explicit run selection and the reversed direction
    rev = ctx.compare_runs("reg", run_before="r2", run_after="r1")
    assert {r["transition"] for r in rev["expectations"]} >= {"fixed"}


def test_convert_to_file_context(spark, df, tmp_path):
    ctx = gx.get_context(spark=spark)
    ctx.add_or_update_expectation_suite(
        "conv",
        expectations=[
            {
                "expectation_type": "expect_table_row_count_to_be_between",
                "kwargs": {"min_value": 1},
            }
        ],
    )
    parquet = os.path.join(str(tmp_path), "d.parquet")
    df.write.mode("overwrite").parquet(parquet)
    ds = ctx.sources.add_spark("local", spark=spark)
    asset = ds.add_parquet_asset("d", parquet)
    ctx.add_checkpoint(
        name="cp",
        validations=[{"asset": asset, "expectation_suite_name": "conv"}],
    )
    assert ctx.run_checkpoint("cp", run_id="e1").success

    root = os.path.join(str(tmp_path), "proj")
    fctx = ctx.convert_to_file_context(root)
    # everything persisted: reopen a COLD context over the directory
    cold = gx.get_context(
        context_root_dir=fctx.root_directory, spark=spark
    )
    assert cold.list_expectation_suite_names() == ["conv"]
    assert "cp" in cold.list_checkpoints()
    assert cold.validations_store.latest("conv")["success"] is True
    assert cold.run_checkpoint("cp").success
