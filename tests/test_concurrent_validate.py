"""Concurrent intra-suite job orchestration (`SuiteValidator
job_concurrency`) must be a pure scheduling change: byte-identical
results vs sequential submission across every compiled-spec family, with
unchanged exception semantics."""

from __future__ import annotations

import json

import pytest

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


@pytest.fixture(scope="module")
def orders_view(spark):
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView(
        "orders_conc_test"
    )
    return "orders_conc_test"


@pytest.fixture(scope="module")
def mixed_suite(orders_view):
    # one of every compiled-spec family, several deliberately failing so
    # the sample phase and window-sample prefetch run for real
    return (
        ExpectationSuite("concurrent-mix")
        # CompiledMap, passing
        .add("expect_column_values_to_not_be_null", column="l_orderkey")
        # CompiledMap, failing -> map samples
        .add(
            "expect_column_values_to_be_between",
            column="l_quantity",
            min_value=0,
            max_value=5,
        )
        # CompiledMap with row_condition (separate domain gate)
        .add(
            "expect_column_values_to_be_in_set",
            column="l_returnflag",
            value_set=["A", "R"],
            row_condition='col("l_linestatus") == "F"',
            condition_parser="great_expectations",
        )
        # CompiledAggregate riding phase A
        .add(
            "expect_column_mean_to_be_between",
            column="l_discount",
            min_value=0.0,
            max_value=1.0,
        )
        # CompiledAggregate with followup job (distinct value set)
        .add(
            "expect_column_distinct_values_to_be_in_set",
            column="l_returnflag",
            value_set=["A", "N", "R"],
        )
        # domain-scoped aggregate -> dedicated filtered agg job
        .add(
            "expect_column_max_to_be_between",
            column="l_quantity",
            min_value=1,
            max_value=100,
            row_condition='col("l_returnflag") == "A"',
            condition_parser="great_expectations",
        )
        # CompiledWindow, failing -> window sample prefetch
        .add(
            "expect_column_values_to_be_unique",
            column="l_partkey",
        )
        # CompiledWindow, passing
        .add(
            "expect_compound_columns_to_be_unique",
            column_list=["l_orderkey", "l_linenumber"],
        )
        # CompiledJob: referential anti-join
        .add(
            "expect_column_values_to_exist_in_other_table",
            column="l_orderkey",
            other_table=orders_view,
            other_column="o_orderkey",
        )
        # CompiledJob: templated query expectation
        .add(
            "expect_query_to_return_no_rows",
            query="SELECT * FROM {active_batch} WHERE l_quantity < 0",
        )
        # CompiledSchemaCheck
        .add("expect_column_to_exist", column="l_shipdate")
        # compile error -> exception_info row (missing column)
        .add("expect_column_values_to_not_be_null", column="no_such_column")
    )


def _normalized(res):
    payload = []
    for r in res.results:
        d = r.to_json_dict() if hasattr(r, "to_json_dict") else {
            "success": r.success,
            "expectation_config": r.expectation_config,
            "result": r.result,
        }
        d = {
            "type": d["expectation_config"]["expectation_type"],
            "kwargs": d["expectation_config"].get("kwargs"),
            "success": d["success"],
            "result": d.get("result"),
            "raised": bool(
                (d.get("exception_info") or {}).get("raised_exception")
            ),
        }
        payload.append(d)
    return json.dumps(payload, sort_keys=True, default=str)


def test_concurrent_equals_sequential(lineitem, mixed_suite):
    seq = SuiteValidator(job_concurrency=1).validate(
        lineitem, mixed_suite, result_format="SUMMARY"
    )
    conc = SuiteValidator(job_concurrency=8).validate(
        lineitem, mixed_suite, result_format="SUMMARY"
    )
    assert _normalized(seq) == _normalized(conc)
    assert seq.success == conc.success
    assert seq.statistics == conc.statistics


def test_concurrent_complete_format_with_index_cols(lineitem, mixed_suite):
    rf = {
        "result_format": "COMPLETE",
        "unexpected_index_column_names": ["l_orderkey", "l_linenumber"],
    }
    seq = SuiteValidator(job_concurrency=1).validate(
        lineitem, mixed_suite, result_format=rf
    )
    conc = SuiteValidator(job_concurrency=8).validate(
        lineitem, mixed_suite, result_format=rf
    )
    assert _normalized(seq) == _normalized(conc)


def test_concurrent_exception_semantics(lineitem):
    # catch_exceptions=False must still raise out of validate() when a
    # prefetched job expectation fails
    suite = ExpectationSuite("boom").add(
        "expect_query_to_return_no_rows",
        query="SELECT * FROM {active_batch} WHERE not_a_column < 0",
    )
    with pytest.raises(Exception):
        SuiteValidator(job_concurrency=8).validate(
            lineitem, suite, catch_exceptions=False
        )
    # and with catch_exceptions=True the error lands on its own row only
    res = SuiteValidator(job_concurrency=8).validate(
        lineitem, suite, catch_exceptions=True
    )
    assert not res.results[0].success
    assert res.results[0].exception_info["raised_exception"]


def test_concurrent_boolean_only(lineitem, mixed_suite):
    seq = SuiteValidator(job_concurrency=1).validate(
        lineitem, mixed_suite, result_format="BOOLEAN_ONLY"
    )
    conc = SuiteValidator(job_concurrency=8).validate(
        lineitem, mixed_suite, result_format="BOOLEAN_ONLY"
    )
    assert [r.success for r in seq.results] == [
        r.success for r in conc.results
    ]
