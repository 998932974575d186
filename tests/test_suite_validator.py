"""End-to-end SuiteValidator tests over a small in-memory table with known
violations (GE-fixture style: exact counts, lists, percentages)."""

from __future__ import annotations

import pytest

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        # id, name, qty, price, cat, pair_b
        (1, "alpha", 5, 10.0, "a", 4),
        (2, "beta", 7, 20.0, "b", 6),
        (3, None, 9, 30.0, "a", 8),
        (4, "delta", 11, 40.0, "zz", 10),
        (5, "echo", 200, 50.0, "b", 300),
        (5, "echo2", 13, 60.0, "a", 12),  # duplicate id
    ]
    return spark.createDataFrame(
        rows, "id int, name string, qty int, price double, cat string, pair_b int"
    )


def _one(df, expectation_type, result_format="SUMMARY", **kwargs):
    suite = ExpectationSuite("t").add(expectation_type, **kwargs)
    res = SuiteValidator().validate(df, suite, result_format=result_format)
    assert len(res.results) == 1
    return res.results[0]


def test_not_null_counts(table):
    r = _one(table, "expect_column_values_to_not_be_null", column="name")
    assert not r.success
    assert r.result["element_count"] == 6
    assert r.result["unexpected_count"] == 1
    assert r.result["unexpected_percent"] == pytest.approx(100 / 6)
    assert "missing_count" not in r.result  # element-denominator family


def test_not_null_mostly(table):
    r = _one(
        table, "expect_column_values_to_not_be_null", column="name", mostly=0.8
    )
    assert r.success


def test_in_set_ignores_nulls(table):
    r = _one(
        table,
        "expect_column_values_to_be_in_set",
        column="cat",
        value_set=["a", "b"],
    )
    assert not r.success
    assert r.result["element_count"] == 6
    assert r.result["unexpected_count"] == 1
    assert r.result["partial_unexpected_list"] == ["zz"]
    assert r.result["missing_count"] == 0


def test_between_with_row_condition(table):
    r = _one(
        table,
        "expect_column_values_to_be_between",
        column="qty",
        min_value=0,
        max_value=100,
        row_condition="cat = 'b'",
        condition_parser="spark",
    )
    # domain: rows 2 and 5; qty 200 violates
    assert not r.success
    assert r.result["element_count"] == 2
    assert r.result["unexpected_count"] == 1
    assert r.result["partial_unexpected_list"] == [200]


def test_unique_two_phase(table):
    r = _one(table, "expect_column_values_to_be_unique", column="id")
    assert not r.success
    assert r.result["element_count"] == 6
    assert r.result["unexpected_count"] == 2  # both rows with id=5
    assert r.result["partial_unexpected_list"] == [5, 5]


def test_compound_unique(table):
    r = _one(
        table,
        "expect_compound_columns_to_be_unique",
        column_list=["id", "cat"],
    )
    assert r.success  # (5,'b') and (5,'a') differ


def test_pair_greater(table):
    r = _one(
        table,
        "expect_column_pair_values_a_to_be_greater_than_b",
        column_A="qty",
        column_B="pair_b",
    )
    assert not r.success
    assert r.result["unexpected_count"] == 1  # 200 < 300
    assert r.result["element_count"] == 6


def test_multicolumn_sum(table):
    df = table.sparkSession.createDataFrame(
        [(1, 2, 7), (3, 3, 4), (5, 5, 0)], "a int, b int, c int"
    )
    r = _one(
        df,
        "expect_multicolumn_sum_to_equal",
        column_list=["a", "b", "c"],
        sum_total=10,
    )
    assert r.success


def test_aggregate_mean(table):
    r = _one(
        table,
        "expect_column_mean_to_be_between",
        column="qty",
        min_value=40,
        max_value=41,
    )
    assert r.success
    assert r.result["observed_value"] == pytest.approx(245 / 6)


def test_aggregate_quantiles(table):
    r = _one(
        table,
        "expect_column_quantile_values_to_be_between",
        column="price",
        quantile_ranges={
            "quantiles": [0.0, 0.5, 1.0],
            "value_ranges": [[0, 15], [25, 40], [55, 65]],
        },
        exact=True,
    )
    assert r.success
    assert r.result["observed_value"]["values"][2] == 60.0


def test_distinct_set(table):
    r = _one(
        table,
        "expect_column_distinct_values_to_be_in_set",
        column="cat",
        value_set=["a", "b", "zz", "q"],
    )
    assert r.success
    assert r.result["observed_value"] == ["a", "b", "zz"]


def test_schema_checks(table):
    r = _one(table, "expect_column_to_exist", column="price")
    assert r.success
    r = _one(
        table,
        "expect_column_values_to_be_of_type",
        column="price",
        type_="DoubleType",
    )
    assert r.success
    r = _one(
        table,
        "expect_table_columns_to_match_set",
        column_set=["id", "name", "qty", "price", "cat", "pair_b"],
    )
    assert r.success


def test_row_count(table):
    r = _one(
        table, "expect_table_row_count_to_be_between", min_value=6, max_value=6
    )
    assert r.success


def test_z_score(table):
    r = _one(
        table,
        "expect_column_value_z_scores_to_be_less_than",
        column="qty",
        threshold=2.0,
        double_sided=True,
    )
    assert not r.success
    assert r.result["partial_unexpected_list"] == [200]


def test_most_common_value(table):
    r = _one(
        table,
        "expect_column_most_common_value_to_be_in_set",
        column="cat",
        value_set=["a"],
    )
    assert r.success
    assert r.result["observed_value"] == ["a"]


def test_suite_statistics_and_meta(table):
    suite = (
        ExpectationSuite("combo")
        .add("expect_column_values_to_not_be_null", column="id")
        .add("expect_column_values_to_not_be_null", column="name")
        .add("expect_column_mean_to_be_between", column="qty", min_value=0)
    )
    res = SuiteValidator().validate(table, suite)
    assert res.statistics["evaluated_expectations"] == 3
    assert res.statistics["successful_expectations"] == 2
    assert res.statistics["success_percent"] == pytest.approx(200 / 3)
    assert not res.success
    payload = res.to_json_dict()
    assert payload["meta"]["expectation_suite_name"] == "combo"


def test_catch_exceptions_shape(table):
    suite = ExpectationSuite("err").add(
        "expect_column_values_to_be_in_set", column="nope", value_set=["x"]
    )
    res = SuiteValidator().validate(table, suite, catch_exceptions=True)
    r = res.results[0]
    assert not r.success
    assert r.exception_info["raised_exception"] is True
    assert r.exception_info["exception_message"]


def test_unknown_expectation_is_caught(table):
    suite = ExpectationSuite("bad").add("expect_total_nonsense", column="id")
    res = SuiteValidator().validate(table, suite)
    assert not res.results[0].success
    assert res.results[0].exception_info["raised_exception"]


def test_evaluation_parameters(table):
    suite = ExpectationSuite("params").add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": "min_rows"},
        max_value=10,
    )
    res = SuiteValidator().validate(
        table, suite, evaluation_parameters={"min_rows": 6}
    )
    assert res.results[0].success


def test_hot_conversation_skew_correctness(spark):
    """Uniqueness + monotonicity + contiguity stay CORRECT when one
    conversation holds 10k turns (hot key): the two-phase groupBy and
    per-key windows must agree with direct Spark SQL ground truth."""
    from great_expectations_spark.datagen.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(
        spark, 200, hot_conversations=2, hot_turns=10_000
    ).persist()
    try:
        suite = (
            ExpectationSuite("hot")
            .add(
                "expect_compound_columns_to_be_unique",
                column_list=["conv_id", "turn_idx"], mostly=0.5,
            )
            .add(
                "expect_column_values_to_be_increasing",
                column="ts", partition_by="conv_id", order_by="turn_idx",
                mostly=0.5,
            )
        )
        res = SuiteValidator().validate(df, suite, result_format="BASIC")
        by_type = {
            r.expectation_config["expectation_type"]: r for r in res.results
        }
        # ground truth via direct SQL on the same session
        df.createOrReplaceTempView("hot_t")
        dup_truth = spark.sql(
            "SELECT coalesce(sum(c), 0) FROM (SELECT count(*) c FROM hot_t "
            "WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL "
            "GROUP BY conv_id, turn_idx HAVING count(*) > 1)"
        ).first()[0]
        mono_truth = spark.sql(
            "SELECT count(*) FROM (SELECT ts, lag(ts) OVER (PARTITION BY "
            "conv_id ORDER BY turn_idx) prev FROM hot_t WHERE ts IS NOT "
            "NULL) WHERE prev IS NOT NULL AND ts < prev"
        ).first()[0]
        assert (
            by_type["expect_compound_columns_to_be_unique"].result[
                "unexpected_count"
            ]
            == dup_truth
        )
        assert (
            by_type["expect_column_values_to_be_increasing"].result[
                "unexpected_count"
            ]
            == mono_truth
        )
        assert dup_truth > 0  # planted duplicates present in hot convs
    finally:
        df.unpersist()
        spark.catalog.dropTempView("hot_t")


def test_warm_up_populates_caches_and_changes_nothing(spark):
    """warm_up validates a 1-row slice (BOOLEAN_ONLY, no samples) purely
    to fill the Catalyst/codegen caches; a following real validate must
    return exactly what a cold validate returns."""
    from great_expectations_spark.datagen.transcripts import (
        default_suite,
        generate_transcripts,
    )

    t = generate_transcripts(spark, 40)
    suite = default_suite()
    v = SuiteValidator()
    v.warm_up(t, suite)
    warm = v.validate(t, suite, result_format="SUMMARY")
    cold = SuiteValidator().validate(t, suite, result_format="SUMMARY")
    assert warm.success == cold.success
    assert warm.statistics == cold.statistics
    for a, b in zip(warm.results, cold.results):
        assert a.success == b.success
        assert (a.result or {}).get("unexpected_count") == (
            (b.result or {}).get("unexpected_count")
        )


def test_warm_up_skips_job_expectations(spark, monkeypatch):
    """warm_up excludes job expectations (limit(1) cannot bound their
    reference-table scans) and still warms the rest; an all-job suite
    is a no-op."""
    from great_expectations_spark.datagen.transcripts import (
        generate_transcripts,
    )

    t = generate_transcripts(spark, 30)
    dim = t.select("conv_id").distinct()
    suite = (
        ExpectationSuite("wj")
        .add("expect_column_values_to_not_be_null", column="text")
        .add(
            "expect_column_values_to_exist_in_other_table",
            column="conv_id", other_table=dim, other_column="conv_id",
        )
    )
    v = SuiteValidator()
    seen = {}
    real = SuiteValidator.validate

    def spy(self, df, s, **kw):
        seen["types"] = [e.expectation_type for e in s.expectations]
        return real(self, df, s, **kw)

    monkeypatch.setattr(SuiteValidator, "validate", spy)
    v.warm_up(t, suite)
    assert seen["types"] == ["expect_column_values_to_not_be_null"]

    seen.clear()
    jobs_only = ExpectationSuite("jo").add(
        "expect_column_values_to_exist_in_other_table",
        column="conv_id", other_table=dim, other_column="conv_id",
    )
    v.warm_up(t, jobs_only)  # no-op, no validate call
    assert "types" not in seen
