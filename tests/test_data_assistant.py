"""Data-assistant result layer (reference
``experimental/rule_based_profiler/data_assistant_result/``): structured
per-rule result object over the onboarding rule pack, markdown/HTML
rendering, plot data, and the generated suite self-validating green."""

from __future__ import annotations

import pytest

from great_expectations_spark.operators.data_assistant import (
    DataAssistantResult,
    run_onboarding_assistant,
)
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture(scope="module")
def batches(spark):
    rows = [
        (i, float(10 + (i % 7)), ["low", "mid", "high"][i % 3])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id int, amount double, tier string")
    return [df, df]


@pytest.fixture(scope="module")
def assistant(batches):
    return run_onboarding_assistant(batches, suite_name="assist_suite")


def test_result_structure(assistant):
    assert isinstance(assistant, DataAssistantResult)
    assert assistant.batch_count == 2
    # the onboarding pack's rules all report their domains
    assert "table_rule" in assistant.rules
    assert "numeric_rule" in assistant.rules
    numeric = assistant.rules["numeric_rule"]
    assert any("amount" in d for d in numeric["domains"])
    # fitted parameters are exposed per domain
    amount_domain = next(d for d in numeric["domains"] if "amount" in d)
    params = numeric["parameters"][amount_domain]
    assert any("min_range" in k for k in params)
    # and per-rule expectation attribution is complete: the union equals
    # the generated suite
    total = sum(len(r["expectations"]) for r in assistant.rules.values())
    assert total == len(assistant.get_expectation_suite().expectations)
    assert total > 0


def test_suite_self_validates_green(batches, assistant):
    suite = assistant.get_expectation_suite()
    res = SuiteValidator().validate(batches[-1], suite)
    failed = [
        r.expectation_config["expectation_type"]
        for r in res.results
        if not r.success
    ]
    assert res.success, failed


def test_markdown_and_html_render_per_rule(assistant, tmp_path):
    md = assistant.to_markdown()
    assert "## rule `numeric_rule`" in md
    assert "min_range" in md

    path = assistant.save_html(str(tmp_path / "assistant.html"))
    html = open(path).read()
    assert html.startswith("<!doctype html>")
    assert "rule <code>numeric_rule</code>" in html
    assert "amount" in html
    assert "min_range" in html
    # numeric fitted parameters with >= 2 domains chart as inline SVG
    # (the reference renders these series via altair plot_metrics)
    if html.count("<td><code>") >= 2:
        assert '<svg class="dist"' in html


def test_plot_data_and_domain_view(assistant):
    plot = assistant.plot_data()
    assert set(plot) == set(assistant.rules)
    numeric = plot["numeric_rule"]
    amount_domain = next(d for d in numeric if "amount" in d)
    assert numeric[amount_domain]  # fitted values present

    by_domain = assistant.show_expectations_by_domain_type()
    assert "table" in by_domain
    assert any("amount" in d for d in by_domain)


def test_get_expectation_suite_rename_does_not_mutate_shared(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "id long, value double"
    )
    res = run_onboarding_assistant(df)
    original = res.profiler_result.suite.expectation_suite_name
    renamed = res.get_expectation_suite("custom_name")
    assert renamed.expectation_suite_name == "custom_name"
    assert res.profiler_result.suite.expectation_suite_name == original
    assert res.get_expectation_suite().expectation_suite_name == original
