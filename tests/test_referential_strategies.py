"""Referential-check strategies: the distinct-key 'aggregate' path must be
result-identical to the reference-parity row-level anti-join, while its
shuffle carries distinct (key, count) pairs instead of fact rows.

Reference contract: expect_column_values_to_exist_in_other_table judges
every fact row by membership in the referenced key set
(`query_metrics`-style cross-table check); the strategy only changes the
physical reduction, never counts, success, or sample multiplicity.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.operators.query_ops import distinct_key_counts
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture(scope="module")
def fact(spark):
    # repeated FKs (the case the aggregate path compresses), two missing
    # keys with different multiplicity, nulls (never violations)
    rows = (
        [("c1", i) for i in range(4)]
        + [("c2", i) for i in range(3)]
        + [("ghost", i) for i in range(5)]
        + [("phantom", 0)]
        + [(None, 9), (None, 10)]
    )
    return spark.createDataFrame(rows, "conv_id string, turn_idx int")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("c1",), ("c2",), ("c3",), (None,)], "conv_id string"
    )


def _run(df, dim, result_format="COMPLETE", **kwargs):
    suite = ExpectationSuite("ref").add(
        "expect_column_values_to_exist_in_other_table",
        column="conv_id",
        other_table=dim,
        other_column="conv_id",
        **kwargs,
    )
    res = SuiteValidator().validate(df, suite, result_format=result_format)
    r = res.results[0]
    if r.exception_info["raised_exception"]:
        raise AssertionError(r.exception_info["exception_message"])
    return r


def test_aggregate_matches_join_counts_and_samples(fact, dim):
    # broadcast_other=False forces the shuffle variants of both paths
    join = _run(fact, dim, strategy="join", broadcast_other=False)
    agg = _run(fact, dim, strategy="aggregate", broadcast_other=False)
    for field in ("element_count", "unexpected_count", "missing_count"):
        assert agg.result.get(field) == join.result.get(field), field
    assert agg.success == join.success
    # COMPLETE sample lists are multisets of violating values with row
    # multiplicity — 5x ghost + 1x phantom — on BOTH paths
    assert Counter(agg.result["unexpected_list"]) == Counter(
        join.result["unexpected_list"]
    ) == Counter({"ghost": 5, "phantom": 1})


def test_auto_uses_join_when_broadcast(fact, dim):
    # auto + broadcastable dim: identical to explicit join w/ broadcast
    auto = _run(fact, dim)  # strategy defaults to auto
    join = _run(fact, dim, strategy="join", broadcast_other=True)
    assert auto.result == join.result


def test_partial_list_caps_multiplicity(fact, dim):
    agg = _run(
        fact, dim, result_format={
            "result_format": "SUMMARY", "partial_unexpected_count": 3,
        },
        strategy="aggregate", broadcast_other=False,
    )
    lst = agg.result["partial_unexpected_list"]
    assert len(lst) == 3
    assert set(lst) <= {"ghost", "phantom"}
    assert agg.result["unexpected_count"] == 6


def test_mostly_gate_same_on_both_paths(fact, dim):
    # 6 violations / 13 non-null rows -> 53.8% pass rate; mostly=0.5
    # passes, mostly=0.6 fails, identically per strategy
    for strategy in ("join", "aggregate"):
        ok = _run(fact, dim, strategy=strategy, mostly=0.5,
                  broadcast_other=False)
        bad = _run(fact, dim, strategy=strategy, mostly=0.6,
                   broadcast_other=False)
        assert ok.success and not bad.success


def test_bad_strategy_raises(fact, dim):
    with pytest.raises(Exception, match="strategy"):
        _run(fact, dim, strategy="bloom")


def test_grouped_aggregate_matches_grouped_join(spark, fact, dim):
    from great_expectations_spark.checkpoint.runner import (
        validate_by_partition,
    )

    part = fact.withColumn(
        "day", F.when(F.col("turn_idx") % 2 == 0, "d0").otherwise("d1")
    )

    def run(strategy):
        suite = ExpectationSuite("ref").add(
            "expect_column_values_to_exist_in_other_table",
            column="conv_id",
            other_table=dim,
            other_column="conv_id",
            strategy=strategy,
            broadcast_other=False,
            mostly=0.5,
        )
        out = validate_by_partition(part, suite, "day")
        return {
            p: (
                r.results[0].result["unexpected_count"],
                r.results[0].result["element_count"],
                r.success,
            )
            for p, r in out.items()
        }

    agg, join = run("aggregate"), run("join")
    assert agg == join
    assert set(agg) == {"d0", "d1"}
    # per-partition violation split of the 6 violating rows is exact
    assert agg["d0"][0] + agg["d1"][0] == 6


def test_plan_shape_distinct_key_anti_join(spark, fact, dim):
    """The exact construction the aggregate strategy runs: partial
    aggregation below the exchange (hot keys pre-combined per upstream
    partition), anti-join over the reduced side, zero Python nodes."""
    base = fact.filter(F.col("conv_id").isNotNull())
    keys = dim.select(F.col("conv_id").alias("__gx_key")).dropDuplicates(
        ["__gx_key"]
    )
    missing = distinct_key_counts(base, "conv_id").join(
        keys, "__gx_key", "left_anti"
    )
    plan = missing._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan
    assert "LeftAnti" in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan
    # and it is correct
    got = {
        (r["__gx_key"], r["__gx_cnt"]) for r in missing.collect()
    }
    assert got == {("ghost", 5), ("phantom", 1)}
