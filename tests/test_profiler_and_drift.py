"""Profiler suggestion + two-sample drift numeric checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.operators.profiler import suggest_suite
from great_expectations_spark.plans.planner import SuiteValidator


def test_suggest_suite_and_self_validate(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    suite = suggest_suite(df)
    types = [e.expectation_type for e in suite.expectations]
    assert "expect_table_columns_to_match_set" in types
    assert types.count("expect_column_values_to_not_be_null") >= 5
    in_set = [
        e for e in suite.expectations
        if e.expectation_type == "expect_column_values_to_be_in_set"
    ]
    assert any(e.kwargs["column"] == "l_returnflag" for e in in_set)
    # a profiled suite must validate green against its own data
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    assert res.success, [
        (r.expectation_config, r.result)
        for r in res.results
        if not r.success
    ]


def test_suggest_suite_depth_on_transcripts(spark):
    from great_expectations_spark.datagen.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, 300, hot_conversations=0)
    suite = suggest_suite(df)
    types = {e.expectation_type for e in suite.expectations}
    # the profiler must cover >= 8 expectation families on transcripts
    assert len(types) >= 8, sorted(types)
    assert {
        "expect_table_columns_to_match_set",
        "expect_column_values_to_not_be_null",
        "expect_column_values_to_be_in_set",
        "expect_column_values_to_be_between",
        "expect_column_value_lengths_to_be_between",
        "expect_column_values_to_match_regex",
        "expect_column_mean_to_be_between",
        "expect_column_quantile_values_to_be_between",
    } <= types, sorted(types)
    # the regex candidate chosen for conv_id actually matches its shape
    rx = [
        e for e in suite.expectations
        if e.expectation_type == "expect_column_values_to_match_regex"
        and e.kwargs["column"] == "conv_id"
    ]
    assert rx, "conv_id should get a regex candidate"
    # the suggested suite self-validates green
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    assert res.success, [
        (r.expectation_config, r.result)
        for r in res.results
        if not r.success
    ]


def test_suggest_suite_datetime_string_candidate(spark):
    df = spark.createDataFrame(
        [("2024-01-15 10:00:00",), ("2024-02-20 11:30:00",)], "when string"
    )
    suite = suggest_suite(df)
    types = [
        (e.expectation_type, e.kwargs.get("column"))
        for e in suite.expectations
    ]
    assert ("expect_column_values_to_be_dateutil_parseable", "when") in types
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    assert res.success


def test_two_sample_drift_detects_planted_shift(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, 4000)
    drifted = rng.normal(0.8, 1.3, 4000)
    rows = [(float(v), 0) for v in base] + [(float(v), 1) for v in drifted]
    df = spark.createDataFrame(rows, "x double, side int")
    suite = (
        ExpectationSuite("drift")
        .add(
            "expect_column_two_sample_ks_to_be_less_than",
            column="x",
            baseline_condition="side = 0",
            threshold=0.05,
            n_bins=30,
        )
        .add(
            "expect_column_two_sample_psi_to_be_less_than",
            column="x",
            baseline_condition="side = 0",
            threshold=0.1,
            n_bins=30,
        )
    )
    res = SuiteValidator().validate(df, suite)
    ks, psi = res.results
    assert not ks.success and ks.result["observed_value"] > 0.2
    assert not psi.success and psi.result["observed_value"] > 0.3

    # identical halves: no drift flagged
    rows2 = [(float(v), i % 2) for i, v in enumerate(base)]
    df2 = spark.createDataFrame(rows2, "x double, side int")
    res2 = SuiteValidator().validate(df2, suite)
    assert res2.success


def test_two_sample_chi2_role_mix(spark):
    rows = (
        [("user", 0)] * 500 + [("assistant", 0)] * 500
        + [("user", 1)] * 200 + [("assistant", 1)] * 800
    )
    df = spark.createDataFrame(rows, "role string, side int")
    suite = ExpectationSuite("mix").add(
        "expect_column_two_sample_chisquare_p_to_be_greater_than",
        column="role",
        baseline_condition="side = 0",
        p=0.05,
    )
    res = SuiteValidator().validate(df, suite)
    assert not res.results[0].success  # 50/50 vs 20/80 must flag


def test_no_days_missing_expectation(spark):
    rows = [("2024-01-01",), ("2024-01-02",), ("2024-01-04",)]
    df = spark.createDataFrame(rows, "d string").select(
        F.to_timestamp("d").alias("ts")
    )
    suite = ExpectationSuite("dm").add(
        "expect_column_to_have_no_days_missing", column="ts", threshold=0
    )
    r = SuiteValidator().validate(df, suite).results[0]
    assert not r.success
    assert r.result["observed_value"] == 1  # 2024-01-03 missing
    suite_ok = ExpectationSuite("dm").add(
        "expect_column_to_have_no_days_missing", column="ts", threshold=1
    )
    assert SuiteValidator().validate(df, suite_ok).results[0].success


def test_suggest_drift_suite_detects_planted_shift(spark):
    from great_expectations_spark.datagen.transcripts import (
        generate_transcripts,
    )
    from great_expectations_spark.operators.profiler import (
        suggest_drift_suite,
    )

    df = generate_transcripts(spark, 2000, hot_conversations=0).withColumn(
        "text_len", F.length("text")
    )
    split = "ts < timestamp '2025-01-25 00:00:00'"
    suite = suggest_drift_suite(
        df, split, columns=["text_len", "role"]
    )
    types = [e.expectation_type for e in suite.expectations]
    assert "expect_column_two_sample_ks_to_be_less_than" in types
    assert "expect_column_two_sample_psi_to_be_less_than" in types
    assert "expect_column_two_sample_chisquare_p_to_be_greater_than" in types
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    by_type = {
        r.expectation_config["expectation_type"]: r for r in res.results
    }
    # the datagen plants a text-length + role-mix shift after 2025-01-25:
    # the chi2 homogeneity test must flag the role mix
    chi = by_type["expect_column_two_sample_chisquare_p_to_be_greater_than"]
    assert not chi.success, chi.result


def _ks_result(spark, df, **kw):
    suite = ExpectationSuite("ks").add(
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_"
        "greater_than",
        **kw,
    )
    res = SuiteValidator().validate(df, suite, "BASIC")
    r = res.results[0]
    assert not r.exception_info["raised_exception"], r.exception_info
    return r


def test_exact_distributed_ks_matches_sorted_collect(spark):
    """method='exact' (bucketed global ranks, no driver collect) must be
    bit-identical to the auto path's sorted-collect statistic — same
    floats, same scalar CDF — including heavy ties."""
    df = (
        spark.range(20_000)
        .select(
            # lognormal-ish with heavy duplicates: floor to 2 decimals
            (F.round(F.exp(F.sin(F.col("id") * 0.37) * 2.0), 2)).alias("v")
        )
        .repartition(7)
    )
    kw = dict(
        column="v",
        distribution="norm",
        params={"mean": 2.0, "std_dev": 2.5},
        p=0.0,
    )
    auto = _ks_result(spark, df, **kw)
    exact = _ks_result(spark, df, method="exact", **kw)
    assert (
        exact.result["details"]["statistic"]
        == auto.result["details"]["statistic"]
    )
    assert exact.result["observed_value"] == auto.result["observed_value"]


def test_exact_distributed_ks_other_distributions(spark):
    """Exact path agrees with the collect path for uniform and expon
    CDFs (different closure shapes through np.frompyfunc)."""
    df = spark.range(5_000).select(
        ((F.col("id") * 37 % 1000) / 10.0).alias("v")
    )
    for dist, params in [
        ("uniform", {"min": 0.0, "max": 100.0}),
        ("expon", (0.0, 30.0)),
    ]:
        kw = dict(column="v", distribution=dist, params=params, p=0.0)
        auto = _ks_result(spark, df, **kw)
        exact = _ks_result(spark, df, method="exact", **kw)
        assert (
            exact.result["details"]["statistic"]
            == auto.result["details"]["statistic"]
        ), dist


def test_exact_grouped_ks_matches_per_partition(spark):
    """Grouped method='exact' (per-group distributed ranks, two jobs for
    ALL partitions) must equal a dedicated whole-table exact run on each
    partition slice."""
    from great_expectations_spark.checkpoint.runner import (
        validate_by_partition,
    )

    df = spark.range(30_000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.sin(F.col("id") * 0.11) * 50 + 50).alias("v"),
    )
    suite = ExpectationSuite("ks").add(
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_"
        "greater_than",
        column="v",
        distribution="uniform",
        params={"min": 0.0, "max": 100.0},
        p=0.0,
        method="exact",
    )
    grouped = validate_by_partition(df, suite, "g")
    assert len(grouped) == 7
    for g, result in grouped.items():
        gr = result.results[0]
        full = _ks_result(
            spark,
            df.filter(F.col("g") == g),
            column="v",
            distribution="uniform",
            params={"min": 0.0, "max": 100.0},
            p=0.0,
            method="exact",
        )
        assert (
            gr.result["details"]["statistic"]
            == full.result["details"]["statistic"]
        ), g
        assert gr.result["observed_value"] == full.result["observed_value"]


def test_exact_ks_empty_and_constant(spark):
    """Degenerate shapes: empty input passes with observed 1.0; a
    constant column's exact statistic equals the collect path's."""
    empty = spark.range(10).filter("id < 0").select(
        F.col("id").cast("double").alias("v")
    )
    r = _ks_result(
        spark, empty, column="v", distribution="norm",
        params={"mean": 0.0, "std_dev": 1.0}, method="exact",
    )
    assert r.success and r.result["observed_value"] == 1.0
    const = spark.range(1_000).select(F.lit(5.0).alias("v"))
    kw = dict(
        column="v", distribution="norm",
        params={"mean": 0.0, "std_dev": 1.0}, p=0.0,
    )
    auto = _ks_result(spark, const, **kw)
    exact = _ks_result(spark, const, method="exact", **kw)
    assert (
        exact.result["details"]["statistic"]
        == auto.result["details"]["statistic"]
    )
