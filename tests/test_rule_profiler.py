"""Rule-based profiler engine (operators/rule_profiler.py) — reference
``rule_based_profiler/`` parity: domain builders, parameter builders with
multi-batch range estimators, $parameter/$variables substitution,
conditionally-gated configuration builders, declarative config
round-trip, and the onboarding assistant rule pack self-validating."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.operators.rule_profiler import (
    CategoricalColumnDomainBuilder,
    ColumnDomainBuilder,
    ColumnPairDomainBuilder,
    DefaultExpectationConfigurationBuilder,
    Domain,
    MapMetricColumnDomainBuilder,
    MetricParameterBuilder,
    MultiColumnDomainBuilder,
    NumericMetricRangeParameterBuilder,
    RegexPatternStringParameterBuilder,
    Rule,
    RuleBasedProfiler,
    SimpleDateFormatStringParameterBuilder,
    TableDomainBuilder,
    ValueSetParameterBuilder,
    onboarding_assistant,
    resolve_reference,
)
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture(scope="module")
def batches(spark):
    """Three deterministic monthly batches of a transcripts-like table."""
    out = []
    for month in (1, 2, 3):
        rows = []
        for conv in range(40):
            for turn in range(5):
                i = conv * 5 + turn
                rows.append(
                    Row(
                        conv_id=f"c{month}_{conv}",
                        turn_idx=turn,
                        role=["user", "assistant", "system"][i % 3],
                        text=f"hello world {month} {i}",
                        score=float((i * 37 + month * 11) % 100),
                        day=f"2026-0{month}-{(i % 27) + 1:02d}",
                    )
                )
        out.append(spark.createDataFrame(rows))
    return out


def test_column_domain_builder_filters(batches):
    df = batches[0]
    db = ColumnDomainBuilder(include_semantic_types=["numeric"])
    assert [d.kwargs["column"] for d in db.get_domains(df, None)] == [
        "turn_idx",
        "score",
    ]
    db2 = ColumnDomainBuilder(
        include_column_name_suffixes=["_id", "_idx"],
        exclude_column_names=["turn_idx"],
    )
    assert [d.kwargs["column"] for d in db2.get_domains(df, None)] == [
        "conv_id"
    ]
    db3 = ColumnDomainBuilder(include_column_name_regexes=["^ro"])
    assert [d.kwargs["column"] for d in db3.get_domains(df, None)] == [
        "role"
    ]


def test_categorical_domain_builder_screens_cardinality(batches):
    df = batches[0]
    db = CategoricalColumnDomainBuilder(
        max_unique_values=5, include_semantic_types=["text"]
    )
    screen = df.agg(
        *[c.alias(k) for k, c in db.screen_aggs(df).items()]
    ).first()
    cols = [d.kwargs["column"] for d in db.get_domains(df, screen)]
    assert cols == ["role"]  # conv_id/text/day are high-cardinality


def test_map_metric_domain_builder(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=2, b=2), Row(a=3, b=None)]
    )
    db = MapMetricColumnDomainBuilder(
        map_metric_name="column_values.nonnull", max_unexpected_ratio=0.0
    )
    screen = df.agg(
        *[c.alias(k) for k, c in db.screen_aggs(df).items()]
    ).first()
    assert [d.kwargs["column"] for d in db.get_domains(df, screen)] == ["a"]
    # b is 2/3 null: allowed at 0.7
    db2 = MapMetricColumnDomainBuilder(
        map_metric_name="column_values.nonnull", max_unexpected_ratio=0.7
    )
    screen2 = df.agg(
        *[c.alias(k) for k, c in db2.screen_aggs(df).items()]
    ).first()
    assert [d.kwargs["column"] for d in db2.get_domains(df, screen2)] == [
        "a",
        "b",
    ]


def test_multicolumn_and_pair_domains(batches):
    df = batches[0]
    md = MultiColumnDomainBuilder(
        include_column_names=["conv_id", "turn_idx"]
    )
    (dom,) = md.get_domains(df, None)
    assert dom.domain_type == "multicolumn"
    assert dom.kwargs["column_list"] == ["conv_id", "turn_idx"]
    pd_ = ColumnPairDomainBuilder(
        include_column_names=["turn_idx", "score"]
    )
    (pair,) = pd_.get_domains(df, None)
    assert pair.kwargs == {"column_A": "turn_idx", "column_B": "score"}
    with pytest.raises(ValueError):
        ColumnPairDomainBuilder(
            include_column_names=["conv_id"]
        ).get_domains(df, None)


def test_resolve_reference_paths():
    params = {
        "range": {"value": [3, 9], "details": {"estimator": "exact"}}
    }
    dom = Domain.column("score")
    assert resolve_reference("$parameter.range", {}, params, dom) == [3, 9]
    assert (
        resolve_reference("$parameter.range.value[1]", {}, params, dom) == 9
    )
    assert (
        resolve_reference(
            "$parameter.range.details.estimator", {}, params, dom
        )
        == "exact"
    )
    assert resolve_reference("$variables.fpr", {"fpr": 0.05}, params, dom) == 0.05
    assert (
        resolve_reference("$domain.domain_kwargs.column", {}, params, dom)
        == "score"
    )
    # non-reference strings pass through untouched
    assert resolve_reference("plain", {}, params, dom) == "plain"
    with pytest.raises(KeyError):
        resolve_reference("$parameter.nope", {}, params, dom)


def test_numeric_range_estimators():
    pb_exact = NumericMetricRangeParameterBuilder(
        "r", "column.mean", estimator="exact"
    )
    out = pb_exact.finish(
        Domain.column("x"), [{"v": 10.0}, {"v": 14.0}, {"v": 12.0}]
    )
    assert out["value"] == pytest.approx([10.0, 14.0], abs=1e-6)

    pb_q = NumericMetricRangeParameterBuilder(
        "r", "column.mean", estimator="quantiles", false_positive_rate=0.5
    )
    lo, hi = pb_q.finish(
        Domain.column("x"), [{"v": float(v)} for v in range(1, 12)]
    )["value"]
    assert 2.0 <= lo <= 4.0 and 8.0 <= hi <= 10.0

    pb_b = NumericMetricRangeParameterBuilder(
        "r", "column.mean", estimator="bootstrap", round_decimals=2
    )
    v1 = pb_b.finish(
        Domain.column("x"), [{"v": float(v)} for v in (5, 6, 7, 8)]
    )["value"]
    v2 = pb_b.finish(
        Domain.column("x"), [{"v": float(v)} for v in (5, 6, 7, 8)]
    )["value"]
    assert v1 == v2  # deterministic seed
    assert 5.0 <= v1[0] <= v1[1] <= 8.0

    # vector metric -> element-wise ranges
    pb_vec = NumericMetricRangeParameterBuilder(
        "r", "column.quantile_values", estimator="exact"
    )
    out = pb_vec.finish(
        Domain.column("x"),
        [{"v": [1.0, 10.0]}, {"v": [2.0, 8.0]}],
    )
    assert out["value"][0] == pytest.approx([1.0, 2.0], abs=1e-6)
    assert out["value"][1] == pytest.approx([8.0, 10.0], abs=1e-6)


def test_condition_gating():
    ecb = DefaultExpectationConfigurationBuilder(
        "expect_column_values_to_match_strftime_format",
        strftime_format="$parameter.fmt.value",
        condition="$parameter.fmt.value != None",
    )
    dom = Domain.column("day")
    none_params = {"fmt": {"value": None, "details": {}}}
    assert ecb.build(dom, {}, none_params) is None
    got = ecb.build(dom, {}, {"fmt": {"value": "%Y-%m-%d", "details": {}}})
    assert got.kwargs == {"column": "day", "strftime_format": "%Y-%m-%d"}

    ecb2 = DefaultExpectationConfigurationBuilder(
        "expect_table_row_count_to_be_between",
        min_value="$parameter.rc.value[0]",
        condition="$parameter.rc.value[0] > 100",
    )
    assert (
        ecb2.build(Domain.table(), {}, {"rc": {"value": [50, 60]}}) is None
    )
    assert (
        ecb2.build(Domain.table(), {}, {"rc": {"value": [150, 160]}})
        is not None
    )
    # callable condition
    ecb3 = DefaultExpectationConfigurationBuilder(
        "expect_column_values_to_not_be_null",
        condition=lambda kwargs, params: params["rc"]["value"][0] > 100,
    )
    assert ecb3.build(Domain.column("a"), {}, {"rc": {"value": [150]}})


def test_profiler_end_to_end_one_agg_per_batch(spark, batches):
    profiler = RuleBasedProfiler(
        "test_profiler",
        variables={"fpr": 0.05},
        rules=[
            Rule(
                name="row_count",
                domain_builder=TableDomainBuilder(),
                parameter_builders=[
                    NumericMetricRangeParameterBuilder(
                        "rc", "table.row_count",
                        estimator="exact", round_decimals=0,
                    )
                ],
                expectation_configuration_builders=[
                    DefaultExpectationConfigurationBuilder(
                        "expect_table_row_count_to_be_between",
                        min_value="$parameter.rc.value[0]",
                        max_value="$parameter.rc.value[1]",
                    )
                ],
            ),
            Rule(
                name="numeric",
                domain_builder=ColumnDomainBuilder(
                    include_semantic_types=["numeric"]
                ),
                parameter_builders=[
                    NumericMetricRangeParameterBuilder(
                        "mean_range", "column.mean", estimator="exact"
                    )
                ],
                expectation_configuration_builders=[
                    DefaultExpectationConfigurationBuilder(
                        "expect_column_mean_to_be_between",
                        min_value="$parameter.mean_range.value[0]",
                        max_value="$parameter.mean_range.value[1]",
                    )
                ],
            ),
            Rule(
                name="categorical",
                domain_builder=CategoricalColumnDomainBuilder(
                    max_unique_values=5,
                    include_semantic_types=["text"],
                ),
                parameter_builders=[ValueSetParameterBuilder("vs")],
                expectation_configuration_builders=[
                    DefaultExpectationConfigurationBuilder(
                        "expect_column_values_to_be_in_set",
                        value_set="$parameter.vs.value",
                    )
                ],
            ),
        ],
    )
    result = profiler.run(batches)
    suite = result.get_expectation_suite()
    types = sorted(
        (e.expectation_type, e.kwargs.get("column")) for e in suite.expectations
    )
    assert types == [
        ("expect_column_mean_to_be_between", "score"),
        ("expect_column_mean_to_be_between", "turn_idx"),
        ("expect_column_values_to_be_in_set", "role"),
        ("expect_table_row_count_to_be_between", None),
    ]
    rc = next(
        e
        for e in suite.expectations
        if e.expectation_type == "expect_table_row_count_to_be_between"
    )
    assert rc.kwargs["min_value"] == 200 and rc.kwargs["max_value"] == 200
    in_set = next(
        e
        for e in suite.expectations
        if e.expectation_type == "expect_column_values_to_be_in_set"
    )
    assert in_set.kwargs["value_set"] == ["assistant", "system", "user"]
    # the produced suite self-validates green on the batches it profiled
    validation = SuiteValidator().validate(batches[-1], suite)
    assert validation.success, [
        r.expectation_config["expectation_type"]
        for r in validation.results
        if not r.success
    ]


def test_profiler_details_metadata(batches):
    profiler = RuleBasedProfiler(
        "meta_test",
        rules=[
            Rule(
                name="numeric",
                domain_builder=ColumnDomainBuilder(
                    include_column_names=["score"]
                ),
                parameter_builders=[
                    NumericMetricRangeParameterBuilder(
                        "mean_range", "column.mean", estimator="exact"
                    )
                ],
                expectation_configuration_builders=[
                    DefaultExpectationConfigurationBuilder(
                        "expect_column_mean_to_be_between",
                        min_value="$parameter.mean_range.value[0]",
                        max_value="$parameter.mean_range.value[1]",
                    )
                ],
            )
        ],
    )
    result = profiler.run(batches)
    (cfg,) = result.suite.expectations
    details = cfg.meta["profiler_details"]["mean_range"]
    assert len(details["batch_values"]) == 3
    assert details["estimator"] == "exact"
    assert "column|column=score" in result.parameters_by_domain


def test_date_format_and_regex_builders(spark):
    df = spark.createDataFrame(
        [Row(day=f"2026-0{m}-1{d}", code=f"ab_{d}") for m in (1, 2) for d in range(5)]
    )
    fmt = SimpleDateFormatStringParameterBuilder("fmt", threshold=0.9)
    got = fmt.finish(
        Domain.column("day"),
        [
            {
                k: v
                for k, v in df.agg(
                    *[
                        c.alias(k)
                        for k, c in fmt.aggs(
                            Domain.column("day"), df
                        ).items()
                    ]
                )
                .first()
                .asDict()
                .items()
            }
        ],
    )
    assert got["value"] == "%Y-%m-%d"
    rx = RegexPatternStringParameterBuilder("rx", threshold=1.0)
    row = df.agg(
        *[
            c.alias(k)
            for k, c in rx.aggs(Domain.column("code"), df).items()
        ]
    ).first()
    got = rx.finish(Domain.column("code"), [row.asDict()])
    assert got["value"] == r"^[a-z]+_[0-9]+$"


def test_config_round_trip(batches):
    config = {
        "name": "declarative",
        "config_version": 1.0,
        "variables": {"fpr": 0.05},
        "rules": {
            "numeric": {
                "domain_builder": {
                    "class_name": "ColumnDomainBuilder",
                    "include_semantic_types": ["numeric"],
                },
                "parameter_builders": [
                    {
                        "class_name": "NumericMetricRangeParameterBuilder",
                        "name": "mean_range",
                        "metric_name": "column.mean",
                        "estimator": "exact",
                    }
                ],
                "expectation_configuration_builders": [
                    {
                        "class_name": (
                            "DefaultExpectationConfigurationBuilder"
                        ),
                        "expectation_type": (
                            "expect_column_mean_to_be_between"
                        ),
                        "min_value": "$parameter.mean_range.value[0]",
                        "max_value": "$parameter.mean_range.value[1]",
                    }
                ],
            }
        },
    }
    profiler = RuleBasedProfiler.from_config(config)
    result = profiler.run(batches)
    assert {e.kwargs["column"] for e in result.suite.expectations} == {
        "turn_idx",
        "score",
    }
    # round-trip: config -> profiler -> config -> profiler gives same suite
    rt = RuleBasedProfiler.from_config(profiler.to_config())
    result2 = rt.run(batches)
    assert [e.to_json_dict() for e in result.suite.expectations] == [
        e.to_json_dict() for e in result2.suite.expectations
    ]


def test_onboarding_assistant_self_validates(spark, batches):
    assistant = onboarding_assistant(estimator="exact")
    result = assistant.run(batches, suite_name="onboarded")
    suite = result.get_expectation_suite()
    types = {e.expectation_type for e in suite.expectations}
    assert {
        "expect_table_row_count_to_be_between",
        "expect_column_min_to_be_between",
        "expect_column_max_to_be_between",
        "expect_column_mean_to_be_between",
        "expect_column_median_to_be_between",
        "expect_column_stdev_to_be_between",
        "expect_column_quantile_values_to_be_between",
        "expect_column_values_to_be_in_set",
        "expect_column_values_to_match_strftime_format",
        "expect_column_values_to_not_be_null",
    } <= types
    # the date column is detected, free-text is not
    fmt_cols = {
        e.kwargs["column"]
        for e in suite.expectations
        if e.expectation_type
        == "expect_column_values_to_match_strftime_format"
    }
    assert fmt_cols == {"day"}
    # exact estimator on the profiled batches must self-validate green
    validation = SuiteValidator().validate(batches[-1], suite)
    failed = [
        (
            r.expectation_config["expectation_type"],
            r.expectation_config.get("kwargs", {}).get("column"),
            r.result.get("observed_value"),
        )
        for r in validation.results
        if not r.success
    ]
    assert validation.success, failed


def test_all_null_column_skips_expectation_not_whole_run(spark):
    """A null parameter path (all-null numeric column -> no range
    estimate) must skip THAT expectation and keep profiling the rest
    (NullParameterPath contract), not crash the run."""
    from pyspark.sql import Row

    from great_expectations_spark.operators.rule_profiler import (
        onboarding_assistant,
    )

    df = spark.createDataFrame(
        [Row(ok=float(i % 7), broken=None, name=f"n{i}") for i in range(40)],
        "ok double, broken double, name string",
    )
    result = onboarding_assistant().run([df], suite_name="nulls")
    types_by_col = {
        (e.kwargs.get("column"), e.expectation_type)
        for e in result.suite.expectations
    }
    # the healthy numeric column still got range expectations
    assert any(col == "ok" for col, _ in types_by_col)
    # nothing asserts a numeric range on the all-null column
    assert not any(
        col == "broken" and "between" in t for col, t in types_by_col
    )
