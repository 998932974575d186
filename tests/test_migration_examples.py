"""Every code path MIGRATION.md shows a reference user must actually
run — this module executes the guide's snippets so the doc cannot rot."""

from __future__ import annotations

import json

import great_expectations_spark as gx
from great_expectations_spark.checkpoint.actions import (
    NotificationAction,
    StoreValidationResultAction,
)
from great_expectations_spark.dataset import SparkDFDataset
from great_expectations_spark.render.html import HtmlDocsAction


def _df(spark):
    return spark.createDataFrame(
        [("c1", 0, "user", "hi"), ("c1", 1, "assistant", "hello"),
         ("c2", 0, "user", None)],
        "conv_id string, turn_idx int, role string, text string",
    )


def test_suite_json_load_and_validate(spark):
    suite_json = json.dumps(
        {
            "expectation_suite_name": "mig",
            "expectations": [
                {
                    "expectation_type": "expect_column_values_to_not_be_null",
                    "kwargs": {"column": "text", "mostly": 0.5},
                }
            ],
        }
    )
    suite = gx.ExpectationSuite.from_json(suite_json)
    result = gx.SuiteValidator().validate(
        _df(spark), suite, result_format="SUMMARY"
    )
    assert result.success
    assert result.to_json_dict()["results"][0]["success"]


def test_interactive_validator(spark):
    v = gx.Validator(_df(spark))
    r = v.expect_column_values_to_not_be_null(column="text", mostly=0.5)
    assert r.success
    assert len(v.get_expectation_suite().expectations) == 1


def test_v2_dataset_shim(spark):
    ds = SparkDFDataset(_df(spark))
    # v2 positional call styles, verbatim from reference call sites
    assert ds.expect_column_values_to_be_between("turn_idx", 0, 10).success
    assert ds.expect_column_values_to_be_in_set(
        "role", ["user", "assistant"]
    ).success
    assert ds.expect_column_values_to_match_regex("conv_id", "^c").success
    assert not ds.expect_column_value_lengths_to_equal("role", 4).success
    assert ds.expect_table_row_count_to_equal(3).success


def test_checkpoint_with_actions(spark, tmp_path):
    suite = gx.ExpectationSuite("mig").add(
        "expect_column_values_to_not_be_null", column="conv_id"
    )
    sent = []
    summary = gx.run_checkpoint(
        _df(spark),
        suite,
        "role",
        str(tmp_path / "ckpt"),
        actions=[
            StoreValidationResultAction(str(tmp_path / "stores")),
            HtmlDocsAction(str(tmp_path / "site")),
            NotificationAction(sender=sent.append, notify_on="all"),
        ],
    )
    assert summary["success"] and summary["failures"] == []
    assert (tmp_path / "site" / "index.html").exists()
    assert len(sent) == summary["partitions_validated_now"]

    # resume: second run skips everything already marked done
    again = gx.run_checkpoint(
        _df(spark), suite, "role", str(tmp_path / "ckpt")
    )
    assert (
        again["partitions_skipped_resume"]
        == summary["partitions_validated_now"]
    )
