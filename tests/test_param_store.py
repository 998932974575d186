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


# --- pluggable store backends ----------------------------------------------


def test_spark_table_backend_roundtrip_and_urn(spark, tmp_path):
    """Round-trip: run checkpoint -> results land in a queryable Spark
    table -> resolve a URN from that table (reference
    database_store_backend.py contract)."""
    from pyspark.sql import functions as F

    from great_expectations_spark.checkpoint.runner import run_checkpoint
    from great_expectations_spark.checkpoint.store_backends import (
        BackendValidationResultStore,
        SparkTableResultBackend,
        StoreResultToBackendAction,
    )
    from great_expectations_spark.core.suite import ExpectationSuite

    df = spark.createDataFrame(
        [("p1", 5), ("p1", 7), ("p2", 500)], "part string, qty int"
    )
    suite = ExpectationSuite("qty_checks").add(
        "expect_column_values_to_be_between",
        column="qty", min_value=0, max_value=100,
    )
    loc = str(tmp_path / "result_log")
    store = BackendValidationResultStore(
        SparkTableResultBackend(spark, loc, fmt="parquet")
    )
    run_checkpoint(
        df, suite, "part", str(tmp_path / "ck"),
        actions=[StoreResultToBackendAction(store)],
    )

    # the result log is a plain queryable table
    log = spark.read.parquet(loc)
    assert set(log.columns) == {
        "suite_name", "run_id", "stored_at_ns", "payload"
    }
    assert log.count() == 2
    assert {
        r["suite_name"] for r in log.select("suite_name").collect()
    } == {"qty_checks.p1", "qty_checks.p2"}

    # latest() parses back to a full result dict
    stored = store.latest("qty_checks.p2")
    assert stored["success"] is False

    # per-partition URN resolution straight from the table ('.' is legal
    # in the URN suite segment)
    got = store.resolve_urn(
        "urn:great_expectations:validations:qty_checks.p2:"
        "expect_column_values_to_be_between.result.unexpected_count"
    )
    assert got == 1
    got_ok = store.resolve_urn(
        "urn:great_expectations:validations:qty_checks.p1:"
        "expect_column_values_to_be_between.result.unexpected_count"
    )
    assert got_ok == 0


def test_latest_payload_picks_newest_version(spark, tmp_path):
    from great_expectations_spark.checkpoint.store_backends import (
        SparkTableResultBackend,
    )

    b = SparkTableResultBackend(spark, str(tmp_path / "log"), fmt="parquet")
    b.append("s", "r1", '{"v": 1}')
    b.append("s", "r2", '{"v": 2}')
    assert b.latest_payload("s") == '{"v": 2}'
    assert b.list_suites() == ["s"]


def test_filesystem_backend_matches_store(tmp_path):
    from great_expectations_spark.checkpoint.store_backends import (
        BackendValidationResultStore,
        FilesystemResultBackend,
    )

    b = FilesystemResultBackend(str(tmp_path / "fsb"))
    store = BackendValidationResultStore(b)
    b.append("s1", "r1", '{"success": true, "results": []}')
    assert store.latest("s1") == {"success": True, "results": []}
    assert b.list_suites() == ["s1"]


def test_unknown_backend_format_rejected(spark, tmp_path):
    import pytest as _pytest

    from great_expectations_spark.checkpoint.store_backends import (
        SparkTableResultBackend,
    )

    with _pytest.raises(ValueError, match="unsupported result-store"):
        SparkTableResultBackend(spark, str(tmp_path), fmt="csvx")
