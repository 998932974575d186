"""V2 ``SparkDFDataset`` compatibility shim tests.

Mirrors the reference's v2 dataset behavior (reference
``dataset/sparkdf_dataset.py:531-833`` and
``tests/test_definitions/...``): immediate expect_* evaluation,
discard_failed_expectations, and driver-side metric getters whose values
are checked here against pandas/numpy computed truth.
"""

import math

import numpy as np
import pandas as pd
import pytest

from great_expectations_spark.dataset import SparkDFDataset


@pytest.fixture(scope="module")
def ds(spark):
    pdf = pd.DataFrame(
        {
            "w": [1, 2, 2, 3, 3, 3, 4, 5, None, 7],
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0],
            "name": ["aa", "bb", "bb", "cc", "cc", "cc", "dd", "ee",
                     "ff", "gg"],
            "ts": ["2024-01-0%d" % d for d in range(1, 10)] + ["2024-01-10"],
        }
    )
    df = spark.createDataFrame(pdf)
    d = SparkDFDataset(df)
    yield d
    d.unpersist()


def test_expect_dispatch_and_discard_failed(ds):
    ok = ds.expect_column_values_to_not_be_null("x")
    assert ok.success is True
    bad = ds.expect_column_values_to_be_between("x", min_value=2,
                                                max_value=3)
    assert bad.success is False
    suite = ds.get_expectation_suite(discard_failed_expectations=True)
    kept = [e.expectation_type for e in suite.expectations]
    assert "expect_column_values_to_not_be_null" in kept
    assert "expect_column_values_to_be_between" not in kept
    full = ds.get_expectation_suite(discard_failed_expectations=False)
    assert len(full.expectations) == len(kept) + 1


def test_validate_runs_accumulated_suite(ds):
    result = ds.validate()
    assert result.statistics["evaluated_expectations"] >= 1


def test_table_getters(ds):
    assert ds.get_row_count() == 10
    assert ds.get_column_count() == 4
    assert ds.get_table_columns() == ["w", "x", "name", "ts"]
    head = ds.head(3)
    assert isinstance(head, pd.DataFrame) and len(head) == 3


def test_scalar_getters(ds):
    assert ds.get_column_nonnull_count("w") == 9
    assert ds.get_column_mean("x") == pytest.approx(5.5)
    assert ds.get_column_sum("x") == pytest.approx(55.0)
    assert ds.get_column_min("x") == 1.0
    assert ds.get_column_max("x") == 10.0
    assert ds.get_column_unique_count("name") == 7
    assert ds.get_column_stdev("x") == pytest.approx(
        float(np.std(np.arange(1.0, 11.0), ddof=1))
    )


def test_mean_requires_numeric(ds):
    with pytest.raises(TypeError, match="mean"):
        ds.get_column_mean("name")


def test_minmax_parse_strings_as_datetimes(ds):
    hi = ds.get_column_max("ts", parse_strings_as_datetimes=True)
    assert str(hi).startswith("2024-01-10")


def test_value_counts_and_modes(ds):
    by_value = ds.get_column_value_counts("name")
    assert list(by_value.index[:2]) == ["aa", "bb"]
    assert by_value["cc"] == 3
    by_count = ds.get_column_value_counts("name", sort="count")
    assert by_count.index[0] == "cc"
    with pytest.raises(ValueError, match="sort"):
        ds.get_column_value_counts("name", sort="bogus")
    with pytest.raises(ValueError, match="collate"):
        ds.get_column_value_counts("name", collate="en_US")
    assert ds.get_column_modes("name") == ["cc"]
    assert ds.get_column_modes("w") == [3.0]


def test_median_and_quantiles(ds):
    # even count: reference averages the two middle values
    assert ds.get_column_median("x") == pytest.approx(5.5)
    qs = ds.get_column_quantiles("x", [0.0, 0.5, 1.0])
    assert qs[0] == 1.0 and qs[2] == 10.0
    with pytest.raises(ValueError, match="relative error"):
        ds.get_column_quantiles("x", [0.5], allow_relative_error=2.0)
    with pytest.raises(ValueError, match="relative error"):
        ds.get_column_quantiles("x", [0.5], allow_relative_error=True)


def test_hist_last_bin_closed(ds):
    # bins [1,4,7,10]: last bin includes the right edge (value 10)
    assert ds.get_column_hist("x", [1.0, 4.0, 7.0, 10.0]) == [3, 3, 4]
    # open-ended first/last via infinities
    assert ds.get_column_hist("x", [-math.inf, 5.0, math.inf]) == [4, 6]


def test_count_in_range(ds):
    # default: min inclusive, max exclusive (reference :813-833)
    assert ds.get_column_count_in_range("x", 2.0, 5.0) == 3
    assert ds.get_column_count_in_range(
        "x", 2.0, 5.0, strict_min=True, strict_max=False) == 3
    assert ds.get_column_count_in_range("x", min_val=9.0) == 2
    with pytest.raises(ValueError, match="min or max"):
        ds.get_column_count_in_range("x")
    with pytest.raises(ValueError, match="Min value"):
        ds.get_column_count_in_range("x", 5.0, 2.0)


def test_from_dataset_and_add_expectation(spark):
    df = spark.range(5).withColumnRenamed("id", "v")
    a = SparkDFDataset(df, persist=False)
    a.expect_column_values_to_not_be_null("v")
    b = SparkDFDataset.from_dataset(a)
    assert b.get_row_count() == 5
    with pytest.raises(ValueError):
        SparkDFDataset.from_dataset("nope")
    from great_expectations_spark.core.suite import ExpectationConfiguration
    b.add_expectation(
        ExpectationConfiguration(
            "expect_column_values_to_be_between",
            {"column": "v", "min_value": 0, "max_value": 4},
        )
    )
    # preloaded expectation never evaluated -> survives discard
    suite = b.get_expectation_suite(discard_failed_expectations=True)
    assert len(suite.expectations) == 1
    result = b.validate()
    assert result.success is True


def test_quantile_ranges_positional_v2_signature(ds):
    """v2 signature takes quantile_ranges as the second positional —
    the generic *_to_be_between min/max mapping must not catch it."""
    qr = {"quantiles": [0.5], "value_ranges": [[1.0, 10.0]]}
    res = ds.expect_column_quantile_values_to_be_between("x", qr)
    assert res.success is True
