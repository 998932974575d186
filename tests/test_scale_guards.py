"""Guards that keep driver/executor memory bounded on high-cardinality
inputs, and the reference-parity fix for categorical KL holdout scaling."""

import math

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.operators import aggregates, distribution
from great_expectations_spark.plans.planner import SuiteValidator


def _one_result(df, etype, **kwargs):
    suite = ExpectationSuite("g").add(etype, **kwargs)
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    return res.results[0]


def test_distinct_set_phase_a_has_no_collect_set(spark):
    # the bundled (phase-A) agg must carry only the fixed-width distinct
    # COUNT; the value set is deferred to the cap-gated followup job
    compiled = aggregates._distinct_in_set(
        {"column": "c", "value_set": ["a"]}
    )
    for key, col in compiled.agg_exprs.items():
        assert "collect_set" not in str(col).lower(), key
    assert compiled.followup is not None


def test_distinct_set_cap_fails_fast(spark, monkeypatch):
    monkeypatch.setattr(aggregates, "DISTINCT_COLLECT_CAP", 5)
    df = spark.range(100).select(F.col("id").alias("c"))
    r = _one_result(
        df, "expect_column_distinct_values_to_be_in_set",
        value_set=list(range(100)), column="c",
    )
    assert r.exception_info["raised_exception"]
    assert "exceeds the collect cap" in r.exception_info["exception_message"]


def test_distinct_set_under_cap_still_correct(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",)], "c string"
    )
    r = _one_result(
        df, "expect_column_distinct_values_to_be_in_set",
        value_set=["a", "b", "x"], column="c",
    )
    assert r.success
    assert r.result["observed_value"] == ["a", "b"]


def test_categorical_chi2_cardinality_cap(spark, monkeypatch):
    monkeypatch.setattr(distribution, "CATEGORICAL_COLLECT_CAP", 5)
    df = spark.range(100).select(
        F.col("id").cast("string").alias("c"),
        (F.col("id") < 50).alias("is_base"),
    )
    r = _one_result(
        df, "expect_column_two_sample_chisquare_p_to_be_greater_than",
        column="c", baseline_condition="is_base",
    )
    assert r.exception_info["raised_exception"]
    assert "categorical cap" in r.exception_info["exception_message"]


def test_cramers_phi_cardinality_cap(spark, monkeypatch):
    monkeypatch.setattr(distribution, "CATEGORICAL_COLLECT_CAP", 5)
    df = spark.range(100).select(
        F.col("id").cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"),
    )
    r = _one_result(
        df, "expect_column_pair_cramers_phi_value_to_be_less_than",
        column_A="a", column_B="b", threshold=0.9,
    )
    assert r.exception_info["raised_exception"]
    assert "categorical cap" in r.exception_info["exception_message"]


def test_kl_categorical_tail_holdout_scales_all_known_weights(spark):
    # pk = [0.5, 0.3, 0.2] over (a, b, c); expected knows only a, b.
    # Reference algebra: qk = [0.6*0.9, 0.4*0.9, 0.1] with holdout 0.1 —
    # EVERY known weight scaled by (1 - holdout), including any weight
    # smaller than the holdout itself.
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "c string")
    partition = {"values": ["a", "b"], "weights": [0.6, 0.4]}
    r = _one_result(
        df, "expect_column_kl_divergence_to_be_less_than",
        column="c", partition_object=partition, threshold=5.0,
        tail_weight_holdout=0.1,
    )
    expected_kl = (
        0.5 * math.log(0.5 / 0.54)
        + 0.3 * math.log(0.3 / 0.36)
        + 0.2 * math.log(0.2 / 0.1)
    )
    assert r.result["observed_value"] == pytest.approx(expected_kl)


def test_kl_categorical_small_known_weight_is_scaled(spark):
    # regression for the membership-vs-magnitude bug: a known expected
    # weight BELOW the holdout must still be scaled by (1 - holdout)
    rows = [("a",)] * 9 + [("b",)] * 1 + [("x",)] * 10
    df = spark.createDataFrame(rows, "c string")
    partition = {"values": ["a", "b"], "weights": [0.95, 0.05]}
    holdout = 0.2
    r = _one_result(
        df, "expect_column_kl_divergence_to_be_less_than",
        column="c", partition_object=partition, threshold=10.0,
        tail_weight_holdout=holdout,
    )
    qk = [0.95 * 0.8, 0.05 * 0.8, 0.2]
    pk = [0.45, 0.05, 0.5]
    expected_kl = sum(p * math.log(p / q) for p, q in zip(pk, qk))
    assert r.result["observed_value"] == pytest.approx(expected_kl)


def test_categorical_partition_object_cap(spark, monkeypatch):
    from great_expectations_spark.operators.distribution import (
        build_categorical_partition_object,
    )

    monkeypatch.setattr(distribution, "CATEGORICAL_COLLECT_CAP", 5)
    df = spark.range(100).select(F.col("id").cast("string").alias("c"))
    with pytest.raises(ValueError, match="categorical cap"):
        build_categorical_partition_object(df, "c", None)


def test_most_common_mode_tie_cap(spark):
    # an all-distinct column has every value tied for mode — must fail
    # with a clear error, not ship the column to the driver
    df = spark.range(5000).select(F.col("id").cast("string").alias("c"))
    r = _one_result(
        df, "expect_column_most_common_value_to_be_in_set",
        column="c", value_set=["0"],
    )
    assert r.exception_info["raised_exception"]
    assert "tie for most-common" in r.exception_info["exception_message"]
