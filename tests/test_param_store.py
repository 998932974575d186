"""Cross-suite URN evaluation parameters via the ValidationResultStore
(reference ``core/evaluation_parameters.py:274-430``, ``core/urn.py``)."""

import pytest

from great_expectations_spark.checkpoint.param_store import (
    ValidationResultStore,
)
from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(i, float(i) * 2) for i in range(100)], "id int, amount double"
    )


def test_chained_suite_threshold_from_stored_result(df, tmp_path):
    store = ValidationResultStore(str(tmp_path / "store"))
    v = SuiteValidator()

    suite_a = (
        ExpectationSuite("upstream")
        .add("expect_table_row_count_to_be_between", min_value=1)
        .add(
            "expect_column_mean_to_be_between",
            column="amount", min_value=0,
        )
    )
    res_a = v.validate(df, suite_a, run_id="run-1")
    assert res_a.success
    store.save(res_a)

    # suite B: row count must match suite A's observed row count exactly,
    # and the mean bound chains from A's observed mean
    urn_rows = (
        "urn:great_expectations:validations:upstream:"
        "expect_table_row_count_to_be_between.result.observed_value"
    )
    urn_mean = (
        "urn:great_expectations:validations:upstream:"
        "expect_column_mean_to_be_between.result.observed_value"
        ":column=amount"
    )
    suite_b = (
        ExpectationSuite("downstream")
        .add(
            "expect_table_row_count_to_be_between",
            min_value={"$PARAMETER": urn_rows},
            max_value={"$PARAMETER": urn_rows},
        )
        .add(
            "expect_column_mean_to_be_between",
            column="amount",
            min_value={"$PARAMETER": urn_mean},
            max_value={"$PARAMETER": urn_mean},
        )
    )
    res_b = v.validate(df, suite_b, parameter_store=store)
    assert res_b.success, [r.result for r in res_b.results]

    # and the chained check actually bites: fewer rows -> failure
    res_c = v.validate(df.limit(50), suite_b, parameter_store=store)
    assert not res_c.results[0].success


def test_urn_without_store_fails_cleanly(df):
    urn = (
        "urn:great_expectations:validations:upstream:"
        "expect_table_row_count_to_be_between.result.observed_value"
    )
    suite = ExpectationSuite("s").add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": urn},
    )
    res = SuiteValidator().validate(df, suite)
    r = res.results[0]
    assert r.exception_info["raised_exception"]
    assert "parameter_store" in r.exception_info["exception_message"]


def test_urn_kwargs_disambiguation(df, tmp_path):
    store = ValidationResultStore(str(tmp_path / "store"))
    v = SuiteValidator()
    suite_a = (
        ExpectationSuite("multi")
        .add("expect_column_mean_to_be_between", column="id", min_value=0)
        .add("expect_column_mean_to_be_between", column="amount", min_value=0)
    )
    store.save(v.validate(df, suite_a, run_id="r1"))
    got_id = store.resolve_urn(
        "urn:great_expectations:validations:multi:"
        "expect_column_mean_to_be_between.result.observed_value:column=id"
    )
    got_amount = store.resolve_urn(
        "urn:great_expectations:validations:multi:"
        "expect_column_mean_to_be_between.result.observed_value"
        ":column=amount"
    )
    assert got_id == pytest.approx(49.5)
    assert got_amount == pytest.approx(99.0)
    with pytest.raises(KeyError, match="no stored result"):
        store.resolve_urn(
            "urn:great_expectations:validations:multi:"
            "expect_column_stdev_to_be_between.result.observed_value"
        )
