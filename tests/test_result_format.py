"""Pure-Python result-semantics parity tests (reference
``expectations/expectation.py:3401-3575``)."""

from __future__ import annotations

import pytest

from great_expectations_spark.core.result_format import (
    format_map_output,
    map_expectation_success,
    mostly_success,
    parse_result_format,
    validate_metric_value_between,
)


def test_parse_result_format_string_shorthand():
    out = parse_result_format("SUMMARY")
    assert out == {
        "result_format": "SUMMARY",
        "partial_unexpected_count": 20,
        "include_unexpected_rows": False,
    }


def test_parse_result_format_dict_defaults():
    out = parse_result_format({"result_format": "COMPLETE"})
    assert out["partial_unexpected_count"] == 20
    assert out["include_unexpected_rows"] is False


def test_parse_result_format_rejects_orphan_include_rows():
    with pytest.raises(ValueError):
        parse_result_format({"include_unexpected_rows": True})


def test_mostly_success_boundary():
    assert mostly_success(10, 2, 0.8)
    assert not mostly_success(10, 3, 0.8)


def test_vacuous_true():
    assert map_expectation_success(0, 0, 0, 1.0)
    assert map_expectation_success(5, 0, None, 1.0)
    assert map_expectation_success(5, 0, 3, 1.0)  # nonnull == 0


def test_format_map_output_boolean_only():
    out = format_map_output(
        parse_result_format("BOOLEAN_ONLY"), True, 10, 8, 1, [1]
    )
    assert out == {"success": True}


def test_format_map_output_basic_percentages():
    out = format_map_output(
        parse_result_format("BASIC"),
        success=False,
        element_count=10,
        nonnull_count=8,
        unexpected_count=2,
        unexpected_list=[5, 7],
    )
    r = out["result"]
    assert r["element_count"] == 10
    assert r["unexpected_count"] == 2
    assert r["unexpected_percent"] == 25.0  # of nonnull
    assert r["unexpected_percent_total"] == 20.0  # of all rows
    assert r["missing_count"] == 2
    assert r["missing_percent"] == 20.0
    assert r["partial_unexpected_list"] == [5, 7]


def test_format_map_output_null_denominator_skips_missing():
    # not_be_null path: nonnull_count=None => no missing_* fields
    out = format_map_output(
        parse_result_format("BASIC"),
        success=False,
        element_count=10,
        nonnull_count=None,
        unexpected_count=2,
        unexpected_list=[None, None],
    )
    r = out["result"]
    assert "missing_count" not in r
    assert r["unexpected_percent"] == 20.0


def test_format_map_output_summary_counts_ordering():
    out = format_map_output(
        parse_result_format("SUMMARY"),
        success=False,
        element_count=10,
        nonnull_count=10,
        unexpected_count=5,
        unexpected_list=["b", "a", "b", "c", "a"],
    )
    counts = out["result"]["partial_unexpected_counts"]
    # sorted by (-count, value)
    assert counts == [
        {"value": "a", "count": 2},
        {"value": "b", "count": 2},
        {"value": "c", "count": 1},
    ]


def test_format_map_output_complete_includes_full_list():
    out = format_map_output(
        parse_result_format("COMPLETE"),
        success=False,
        element_count=3,
        nonnull_count=3,
        unexpected_count=3,
        unexpected_list=[1, 2, 3],
        unexpected_index_list=[0, 1, 2],
    )
    assert out["result"]["unexpected_list"] == [1, 2, 3]
    assert out["result"]["unexpected_index_list"] == [0, 1, 2]


def test_format_map_output_multicolumn_dict_flatten():
    out = format_map_output(
        parse_result_format("SUMMARY"),
        success=False,
        element_count=2,
        nonnull_count=2,
        unexpected_count=2,
        unexpected_list=[{"a": 1, "b": 2}, {"a": 1, "b": 2}],
    )
    assert out["result"]["partial_unexpected_counts"] == [
        {"value": (1, 2), "count": 2}
    ]


def test_validate_between_bounds():
    assert validate_metric_value_between(5, 1, 10)["success"]
    assert not validate_metric_value_between(5, 6, None)["success"]
    assert not validate_metric_value_between(5, None, 4)["success"]
    assert validate_metric_value_between(5, 5, 5)["success"]
    assert not validate_metric_value_between(5, 5, None, strict_min=True)["success"]
    assert validate_metric_value_between(5, None, None)["success"]


def test_validate_between_null_observed():
    out = validate_metric_value_between(None, 0, 1)
    assert out == {"success": False, "result": {"observed_value": None}}
    out = validate_metric_value_between(float("nan"), 0, 1)
    assert not out["success"]


def test_planner_include_unexpected_rows(spark):
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    df = spark.createDataFrame(
        [(1, "x", 5), (2, "y", 100), (3, "z", 200)],
        "id int, name string, qty int",
    )
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between",
        column="qty", min_value=0, max_value=50,
    )
    res = SuiteValidator().validate(
        df, suite,
        result_format={
            "result_format": "SUMMARY",
            "include_unexpected_rows": True,
        },
    )
    rows = res.results[0].result["unexpected_rows"]
    assert {r["id"] for r in rows} == {2, 3}
    assert set(rows[0]) == {"id", "name", "qty"}  # full original rows


def test_planner_unexpected_index_query_complete(spark):
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    df = spark.createDataFrame([(1, 5), (2, 100)], "id int, qty int")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between",
        column="qty", min_value=0, max_value=50,
    )
    res = SuiteValidator().validate(df, suite, result_format="COMPLETE")
    q = res.results[0].result["unexpected_index_query"]
    assert q.startswith("df.filter(F.expr(")
    assert "qty" in q
    # opting out suppresses the query (reference :807-812)
    res2 = SuiteValidator().validate(
        df, suite,
        result_format={
            "result_format": "COMPLETE",
            "return_unexpected_index_query": False,
        },
    )
    assert "unexpected_index_query" not in res2.results[0].result


def test_planner_unexpected_rows_empty_when_no_violations(spark):
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    df = spark.createDataFrame([(1, 5)], "id int, qty int")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between",
        column="qty", min_value=0, max_value=50,
    )
    res = SuiteValidator().validate(
        df, suite,
        result_format={
            "result_format": "BASIC",
            "include_unexpected_rows": True,
        },
    )
    assert res.results[0].result["unexpected_rows"] == []
