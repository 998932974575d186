"""Suite CRUD through the pluggable store backends (reference
``data_context/store/expectations_store.py`` ExpectationsStore and the
DataContext suite verbs in ``data_context/abstract_data_context.py``)."""

import pytest

from great_expectations_spark.checkpoint.store_backends import (
    FilesystemResultBackend,
    SparkTableResultBackend,
)
from great_expectations_spark.checkpoint.suite_store import SuiteStore
from great_expectations_spark.core.suite import ExpectationSuite


def _suite(name="orders_suite", max_value=10):
    return (
        ExpectationSuite(name)
        .add("expect_column_values_to_not_be_null", column="o_orderkey")
        .add(
            "expect_column_mean_to_be_between",
            column="o_totalprice", min_value=0, max_value=max_value,
        )
    )


def test_filesystem_round_trip(tmp_path):
    store = SuiteStore(FilesystemResultBackend(str(tmp_path / "suites")))
    suite = _suite()
    version = store.save(suite)
    assert version == suite.suite_hash()

    loaded = store.load("orders_suite")
    assert loaded.expectation_suite_name == "orders_suite"
    assert loaded.suite_hash() == version
    assert [e.expectation_type for e in loaded.expectations] == [
        e.expectation_type for e in suite.expectations
    ]
    assert store.list_suites() == ["orders_suite"]


def test_save_again_load_returns_latest(tmp_path):
    store = SuiteStore(FilesystemResultBackend(str(tmp_path / "s")))
    store.save(_suite(max_value=10))
    v2 = store.save(_suite(max_value=99))
    loaded = store.load("orders_suite")
    assert loaded.suite_hash() == v2
    assert loaded.expectations[1].kwargs["max_value"] == 99


def test_delete_tombstones_but_keeps_history(tmp_path):
    store = SuiteStore(FilesystemResultBackend(str(tmp_path / "s")))
    store.save(_suite())
    store.delete("orders_suite")
    with pytest.raises(KeyError):
        store.load("orders_suite")
    assert store.list_suites() == []
    # saving again resurrects the name (append-only log, latest wins)
    store.save(_suite(max_value=7))
    assert store.load("orders_suite").expectations[1].kwargs[
        "max_value"
    ] == 7


def test_missing_suite_raises(tmp_path):
    store = SuiteStore(FilesystemResultBackend(str(tmp_path / "s")))
    with pytest.raises(KeyError):
        store.load("nope")


def test_spark_table_backend_round_trip(spark, tmp_path):
    backend = SparkTableResultBackend(
        spark, str(tmp_path / "suite_log"), fmt="parquet"
    )
    store = SuiteStore(backend)
    store.save(_suite("a_suite"))
    store.save(_suite("b_suite", max_value=5))
    assert store.list_suites() == ["a_suite", "b_suite"]
    assert store.load("b_suite").expectations[1].kwargs["max_value"] == 5
    store.delete("a_suite")
    assert store.list_suites() == ["b_suite"]


def test_suites_and_results_share_a_backend(spark, tmp_path):
    """One backend directory can carry suites AND validation results —
    the suite namespace keeps keys disjoint."""
    from great_expectations_spark.checkpoint.store_backends import (
        BackendValidationResultStore,
    )
    from great_expectations_spark.plans.planner import SuiteValidator

    backend = FilesystemResultBackend(str(tmp_path / "both"))
    suites = SuiteStore(backend)
    results = BackendValidationResultStore(backend)

    df = spark.createDataFrame(
        [(1, 3.0), (2, 4.0)], "o_orderkey int, o_totalprice double"
    )
    suite = _suite(max_value=100)
    suites.save(suite)
    res = SuiteValidator().validate(df, suites.load("orders_suite"))
    assert res.success
    results.save(res)
    assert suites.list_suites() == ["orders_suite"]
    assert results.latest("orders_suite")["success"] is True
