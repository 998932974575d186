"""Suite-level fuzz of the error contract (SURVEY §8.5, reference
``validator.py:1227-1261``): random suites mixing healthy expectations
with poisoned ones — unknown types, bad regexes, type-hostile kwargs
(ANSI casts throw in Spark 4), missing columns, malformed JSON schemas,
bad row_conditions — validated with ``catch_exceptions=True`` must

* never abort: one EVR per expectation, in suite order, each carrying
  its ``expectation_config``;
* mark every poisoned expectation ``success=False`` with
  ``exception_info = {raised_exception: True, exception_message,
  exception_traceback}``;
* leave every healthy expectation's verdict EXACTLY what it gets in a
  clean suite alone (isolation: one bad apple cannot poison the fused
  bundled agg — ``_run_bundled_phase_isolating``);
* keep statistics consistent and the whole result JSON-serializable;

and with ``catch_exceptions=False`` must raise.  The property
differentials cover correct suites; this file fuzzes the FAILURE path
end-to-end, including the per-partition grouped runner.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.checkpoint.runner import validate_by_partition
from great_expectations_spark.plans.planner import SuiteValidator

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (i, float(i) if i % 5 else None, f"w{i}" if i % 7 else None,
         "p%d" % (i % 3))
        for i in range(30)
    ]
    d = spark.createDataFrame(
        rows, "x int, v double, s string, p string"
    ).persist()
    d.count()
    yield d
    d.unpersist()


# --- strategies: (config, is_poisoned) pairs -------------------------------

HEALTHY = [
    ("expect_column_values_to_not_be_null", {"column": "x"}),
    ("expect_column_values_to_not_be_null", {"column": "v", "mostly": 0.5}),
    ("expect_column_values_to_be_between",
     {"column": "x", "min_value": 0, "max_value": 100}),
    ("expect_column_values_to_be_in_set",
     {"column": "s", "value_set": ["w1", "w2", None], "mostly": 0.01}),
    ("expect_column_values_to_match_regex",
     {"column": "s", "regex": "^w", "mostly": 0.9}),
    ("expect_column_mean_to_be_between",
     {"column": "v", "min_value": -1e9, "max_value": 1e9}),
    ("expect_column_unique_value_count_to_be_between",
     {"column": "x", "min_value": 0}),
    ("expect_column_value_lengths_to_be_between",
     {"column": "s", "min_value": 0, "max_value": 50}),
    ("expect_column_values_to_be_unique", {"column": "x"}),
    ("expect_column_values_to_be_between",
     {"column": "x", "min_value": None, "max_value": None}),  # vacuous
    # weird-but-defined: an unsatisfiable range is a clean False verdict
    # (observed value not between), NOT an exception
    ("expect_column_mean_to_be_between",
     {"column": "v", "min_value": 10, "max_value": -10, "strict_min": True}),
]

POISONED = [
    # unknown type: fails at compile, still one EVR in order
    ("expect_this_does_not_exist", {"column": "x"}),
    # bad regex: compiles fine, explodes inside codegen at run time
    ("expect_column_values_to_match_regex", {"column": "s", "regex": "["}),
    ("expect_column_values_to_not_match_regex",
     {"column": "s", "regex": "(unclosed"}),
    # ANSI cast bomb: mean over a string column throws CAST_INVALID_INPUT
    ("expect_column_mean_to_be_between",
     {"column": "s", "min_value": 0, "max_value": 1}),
    # missing column
    ("expect_column_values_to_be_between", {"column": "no_such", "min_value": 0}),
    # malformed JSON schema
    ("expect_column_values_to_match_json_schema",
     {"column": "s", "json_schema": {"type": ["not-a-type!!"]}}),
    # bad row_condition
    ("expect_column_values_to_not_be_null",
     {"column": "x", "row_condition": "x ===== 1",
      "condition_parser": "spark"}),
]

suite_plan = st.lists(
    st.one_of(
        st.sampled_from(HEALTHY).map(lambda c: (c, False)),
        st.sampled_from(POISONED).map(lambda c: (c, True)),
    ),
    min_size=1,
    max_size=7,
)


def _build(plan):
    suite = ExpectationSuite("fuzz")
    for (etype, kwargs), _poisoned in plan:
        suite.add(etype, **dict(kwargs))
    return suite


def _check_contract(result, plan):
    results = result.results
    assert len(results) == len(plan)
    n_fail = 0
    for r, ((etype, kwargs), _p) in zip(results, plan):
        cfg = r.expectation_config
        assert cfg is not None and cfg["expectation_type"] == etype
        assert cfg["kwargs"] == kwargs
        if not r.success:
            n_fail += 1
        if r.exception_info and r.exception_info.get("raised_exception"):
            assert not r.success
            assert r.exception_info.get("exception_message")
            assert r.exception_info.get("exception_traceback")
    stats = result.statistics
    assert stats["evaluated_expectations"] == len(plan)
    assert (
        stats["successful_expectations"]
        + stats["unsuccessful_expectations"]
        == len(plan)
    )
    assert stats["unsuccessful_expectations"] == n_fail
    assert result.success == (n_fail == 0)
    json.dumps(result.to_json_dict())  # fully serializable
    return n_fail


@given(plan=suite_plan)
@settings(**SETTINGS)
def test_random_suite_never_aborts_and_isolates_failures(spark, df, plan):
    suite = _build(plan)
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    _check_contract(res, plan)
    # every POISONED expectation must have raised (not silently passed)
    for r, (_cfg, poisoned) in zip(res.results, plan):
        if poisoned:
            assert not r.success
            assert r.exception_info and r.exception_info["raised_exception"]
    # isolation: healthy expectations get the same verdict they get in a
    # suite with the poison removed
    clean_plan = [e for e in plan if not e[1]]
    if clean_plan:
        clean = SuiteValidator().validate(
            df, _build(clean_plan), result_format="BASIC"
        )
        healthy = [r for r, (_c, p) in zip(res.results, plan) if not p]
        for got, want in zip(healthy, clean.results):
            assert got.success == want.success, got.expectation_config
            assert (
                (got.result or {}).get("unexpected_count")
                == (want.result or {}).get("unexpected_count")
            )


@given(plan=suite_plan)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_random_suite_grouped_runner_same_contract(spark, df, plan):
    """validate_by_partition: same error contract per partition."""
    out = validate_by_partition(df, _build(plan), "p")
    assert sorted(out) == ["p0", "p1", "p2"]
    for res in out.values():
        _check_contract(res, plan)
        for r, (_cfg, poisoned) in zip(res.results, plan):
            if poisoned:
                assert not r.success


def test_invalid_mostly_fails_fast_at_authoring(spark):
    """kwargs the CONFIG model itself rejects (mostly outside [0, 1])
    raise at suite.add() time — authoring-time fail-fast, the
    reference's validate_configuration contract — rather than surfacing
    later as a runtime exception EVR."""
    suite = ExpectationSuite("bad")
    with pytest.raises(ValueError, match="mostly"):
        suite.add(
            "expect_column_values_to_not_be_null", column="x", mostly=7
        )
    with pytest.raises(ValueError, match="mostly"):
        suite.add(
            "expect_column_values_to_not_be_null", column="x", mostly=-0.1
        )


@given(plan=suite_plan.filter(lambda p: any(x[1] for x in p)))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_catch_exceptions_false_raises(spark, df, plan):
    with pytest.raises(Exception):
        SuiteValidator().validate(
            df, _build(plan), result_format="BASIC", catch_exceptions=False
        )
