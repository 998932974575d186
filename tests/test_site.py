"""Data Docs site builder (reference render/renderer/site_builder.py
contract): incremental home → suite → run → partition navigation,
column-grouped expectation content blocks, atomic/idempotent rewrites.
Pure driver-side rendering — no SparkSession involved."""

from __future__ import annotations

import json
import os

from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
    ExpectationValidationResult,
)
from great_expectations_spark.render.site import (
    SiteBuilder,
    describe_expectation,
)


def _result(suite, run, ok=True, column="text"):
    return ExpectationSuiteValidationResult(
        success=ok,
        results=[
            ExpectationValidationResult(
                success=ok,
                expectation_config={
                    "expectation_type": "expect_column_values_to_not_be_null",
                    "kwargs": {"column": column, "mostly": 0.9},
                },
                result={"unexpected_count": 0 if ok else 3,
                        "partial_unexpected_list": [] if ok else [None] * 3},
            ),
            ExpectationValidationResult(
                success=True,
                expectation_config={
                    "expectation_type": "expect_column_mean_to_be_between",
                    "kwargs": {"column": "value", "min_value": 0,
                               "max_value": 10},
                },
                result={"observed_value": 4.2},
            ),
        ],
        statistics={"evaluated_expectations": 2,
                    "successful_expectations": 2 if ok else 1,
                    "success_percent": 100.0 if ok else 50.0},
        meta={"expectation_suite_name": suite, "run_id": run,
              "validation_time": "2026-08-18T00:00:00+00:00"},
    )


def test_describe_expectation_templates():
    assert describe_expectation(
        {"expectation_type": "expect_column_values_to_be_between",
         "kwargs": {"column": "q", "min_value": 1, "max_value": 5,
                    "mostly": 0.8}}
    ) == "values must be between 1 and 5, at least 80% of the time"
    assert describe_expectation(
        {"expectation_type": "expect_column_values_to_not_be_null",
         "kwargs": {"column": "q", "row_condition": "flag = 'A'"}}
    ) == "values must not be null (where flag = 'A')"
    # unknown types degrade to type + non-domain kwargs, never raise
    out = describe_expectation(
        {"expectation_type": "expect_custom_thing",
         "kwargs": {"column": "c", "threshold": 3}}
    )
    assert "expect_custom_thing" in out and "threshold" in out


def test_site_navigation_and_blocks(tmp_path):
    site = SiteBuilder(str(tmp_path))
    p1 = site.add_validation_result(
        _result("orders", "r1"), partition_id="day=2026-01-01"
    )
    site.add_validation_result(
        _result("orders", "r1", ok=False), partition_id="day=2026-01-02"
    )
    site.add_validation_result(
        _result("orders", "r2"), partition_id="day=2026-01-01"
    )
    site.add_validation_result(
        _result("lineitem", "r1", column="l_comment"), partition_id="all"
    )

    # home lists both suites with run counts and links
    home = open(os.path.join(tmp_path, "index.html")).read()
    assert 'href="suites/orders/index.html"' in home
    assert 'href="suites/lineitem/index.html"' in home

    # suite page: column-grouped blocks + run history, newest first
    suite_page = open(
        os.path.join(tmp_path, "suites", "orders", "index.html")
    ).read()
    assert "<h3><code>text</code></h3>" in suite_page
    assert "<h3><code>value</code></h3>" in suite_page
    assert "values must not be null" in suite_page
    assert "mean must be between 0 and 10" in suite_page
    assert suite_page.index('href="runs/r2/index.html"') < suite_page.index(
        'href="runs/r1/index.html"'
    )

    # run page: one row per partition, failed partition marked FAIL
    run_page = open(
        os.path.join(tmp_path, "suites", "orders", "runs", "r1",
                     "index.html")
    ).read()
    assert run_page.count("<td><a href=") == 2
    assert 'class="fail"' in run_page

    # partition report exists, carries breadcrumbs back up the tree
    report = open(p1).read()
    assert '<a href="../../../../index.html">docs</a>' in report
    assert '<a href="../../index.html">orders</a>' in report

    # state file is valid JSON and drives idempotent rebuilds
    state = json.load(open(os.path.join(tmp_path, "_site_state.json")))
    assert set(state["suites"]) == {"orders", "lineitem"}
    assert set(state["suites"]["orders"]["runs"]) == {"r1", "r2"}


def test_site_incremental_across_instances(tmp_path):
    # a NEW SiteBuilder over the same directory (fresh process) must
    # extend the existing site, not clobber it — state is the JSON file
    SiteBuilder(str(tmp_path)).add_validation_result(
        _result("a_suite", "r1"), partition_id="all"
    )
    SiteBuilder(str(tmp_path)).add_validation_result(
        _result("b_suite", "r1"), partition_id="all"
    )
    home = open(os.path.join(tmp_path, "index.html")).read()
    assert 'href="suites/a_suite/index.html"' in home
    assert 'href="suites/b_suite/index.html"' in home


def test_latest_run_is_arrival_order_not_lexicographic(tmp_path):
    site = SiteBuilder(str(tmp_path))
    site.add_validation_result(
        _result("s", "run-9", ok=True), partition_id="all"
    )
    site.add_validation_result(
        _result("s", "run-10", ok=False), partition_id="all"
    )
    home = open(os.path.join(tmp_path, "index.html")).read()
    # run-10 arrived last: it is the latest despite sorting before run-9
    assert "run-10" in home
    suite_page = open(
        os.path.join(tmp_path, "suites", "s", "index.html")
    ).read()
    # header badge reflects run-10's failure
    assert suite_page.index("run-10") < suite_page.index("run-9")
