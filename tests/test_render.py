"""Markdown renderer (Data-Docs-lite) — pure-Python, no Spark needed."""

from great_expectations_spark.render.markdown import (
    render_checkpoint_summary_markdown,
    render_suite_result_markdown,
)

RESULT = {
    "success": False,
    "meta": {
        "expectation_suite_name": "orders.daily",
        "run_id": "r-1",
        "validation_time": "2026-08-17T00:00:00",
    },
    "statistics": {
        "evaluated_expectations": 2,
        "successful_expectations": 1,
        "unsuccessful_expectations": 1,
        "success_percent": 50.0,
    },
    "results": [
        {
            "success": True,
            "expectation_config": {
                "expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": "id"},
            },
            "result": {"element_count": 10, "unexpected_count": 0},
        },
        {
            "success": False,
            "expectation_config": {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "qty", "min_value": 0, "max_value": 5},
            },
            "result": {
                "element_count": 10,
                "unexpected_count": 2,
                "observed_value": None,
                "partial_unexpected_list": [9, 12],
            },
        },
    ],
}


def test_render_suite_result_markdown():
    doc = render_suite_result_markdown(RESULT)
    assert doc.startswith("# ❌ orders.daily")
    assert "1/2 passed (50.0%)" in doc
    assert "| ✅ | `expect_column_values_to_not_be_null` | id |" in doc
    assert "## ❌ `expect_column_values_to_be_between`" in doc
    assert "- `9`" in doc and "- `12`" in doc


def test_render_handles_exception_results():
    bad = dict(RESULT)
    bad["results"] = [
        {
            "success": False,
            "expectation_config": {
                "expectation_type": "expect_x",
                "kwargs": {},
            },
            "result": {},
            "exception_info": {
                "raised_exception": True,
                "exception_message": "boom | with pipe\nand newline",
            },
        }
    ]
    doc = render_suite_result_markdown(bad)
    assert "Raised:" in doc
    assert "boom \\| with pipe and newline" in doc


def test_render_checkpoint_summary():
    summary = {
        "success": True,
        "run_id": "r-2",
        "partitions_total": 2,
        "partitions_done": 2,
        "partitions_skipped_resume": 0,
        "failures": [],
        "entries": [
            {
                "partition_id": "2024-01-01",
                "status": "done",
                "success": True,
                "rows": 100,
                "rows_per_sec": 1000.0,
            },
        ],
    }
    doc = render_checkpoint_summary_markdown(summary)
    assert doc.startswith("# ✅ checkpoint run")
    assert "| 2024-01-01 | done | ✅ | 100 | 1000.0 |" in doc


def test_render_docs_action_writes_file(tmp_path):
    from great_expectations_spark.checkpoint.actions import ActionContext
    from great_expectations_spark.core.results import (
        ExpectationSuiteValidationResult,
    )
    from great_expectations_spark.render.markdown import RenderDocsAction

    res = ExpectationSuiteValidationResult(
        success=True, results=[], statistics={"evaluated_expectations": 0,
                                              "successful_expectations": 0,
                                              "success_percent": 100.0},
        meta={"expectation_suite_name": "s", "run_id": "r-3"},
    )
    action = RenderDocsAction(str(tmp_path / "docs"))
    ctx = ActionContext(
        run_id="r-3", suite_name="s", partition_column="day",
        partition_id="2024-01-01", result=res, entry_status="done",
    )
    path = action.run(ctx)
    assert path.endswith("2024-01-01.md")
    with open(path) as f:
        assert f.read().startswith("# ✅ s — day=2024-01-01")


# --- HTML Data Docs --------------------------------------------------------


def test_render_suite_result_html_golden():
    """Stable golden-file contract for the HTML renderer (reference:
    render/renderer/site_builder.py renders the same surface)."""
    import os

    from great_expectations_spark.render.html import render_suite_result_html

    doc = render_suite_result_html(RESULT)
    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "suite_result.html"
    )
    with open(golden_path) as f:
        assert doc == f.read()


def test_render_suite_result_html_content():
    from great_expectations_spark.render.html import render_suite_result_html

    doc = render_suite_result_html(RESULT)
    assert doc.startswith("<!doctype html>")
    assert '<span class="fail">FAIL</span>' in doc
    assert "orders.daily" in doc
    assert "expect_column_values_to_not_be_null" in doc
    # violation samples rendered
    assert "<li>9</li>" in doc and "<li>12</li>" in doc
    # user strings are escaped
    evil = {
        **RESULT,
        "meta": {"expectation_suite_name": "<script>alert(1)</script>"},
    }
    out = render_suite_result_html(evil)
    assert "<script>" not in out
    assert "&lt;script&gt;" in out


def test_render_index_html():
    from great_expectations_spark.render.html import render_index_html

    idx = render_index_html(
        [
            {"partition_id": "p2", "success": True, "expectations": "2/2",
             "file": "p2.html"},
            {"partition_id": "p1", "success": False, "expectations": "1/2",
             "file": "p1.html"},
        ],
        title="daily run",
    )
    assert '<a href="p1.html">' in idx and '<a href="p2.html">' in idx
    # sorted by partition, overall verdict FAIL
    assert idx.index("p1.html") < idx.index("p2.html")
    assert '<span class="fail">FAIL</span> daily run' in idx


def test_render_zero_expectation_result_does_not_raise():
    """statistics.success_percent is None when nothing was evaluated —
    rendering must not TypeError on the format spec."""
    from great_expectations_spark.render.html import (
        render_suite_result_html,
    )

    html = render_suite_result_html(
        {
            "success": True,
            "results": [],
            "statistics": {
                "evaluated_expectations": 0,
                "successful_expectations": 0,
                "unsuccessful_expectations": 0,
                "success_percent": None,
            },
            "meta": {"expectation_suite_name": "empty"},
        }
    )
    assert "0/0 expectations passed" in html


def test_render_distribution_charts():
    """Results carrying observed_partition or partial_unexpected_counts
    render inline-SVG bar charts (reference draws these via altair)."""
    from great_expectations_spark.render.html import render_suite_result_html

    res = {
        "success": True,
        "statistics": {"evaluated_expectations": 2,
                       "successful_expectations": 2,
                       "success_percent": 100.0},
        "meta": {"expectation_suite_name": "charts", "run_id": "r-9"},
        "results": [
            {
                "success": True,
                "expectation_config": {
                    "expectation_type":
                        "expect_column_kl_divergence_to_be_less_than",
                    "kwargs": {"column": "v"},
                },
                "result": {
                    "observed_value": 0.02,
                    "details": {
                        "observed_partition": {
                            "bins": [0, 10, 20, 30],
                            "weights": [0.5, 0.3, 0.2],
                        }
                    },
                },
            },
            {
                "success": False,
                "expectation_config": {
                    "expectation_type": "expect_column_values_to_be_in_set",
                    "kwargs": {"column": "c"},
                },
                "result": {
                    "unexpected_count": 7,
                    "partial_unexpected_counts": [
                        {"value": "x", "count": 5},
                        {"value": "<y>", "count": 2},
                    ],
                    "partial_unexpected_list": ["x", "x"],
                },
            },
        ],
    }
    doc = render_suite_result_html(res)
    assert "<h2>distributions</h2>" in doc
    assert doc.count('<svg class="dist"') == 2
    assert doc.count("<rect") == 3 + 2  # 3 histogram bins + 2 value bars
    assert "[0, 10)" in doc
    assert "&lt;y&gt;" in doc  # labels escaped inside <title>
    # empty weights / no distribution -> no chart section
    from great_expectations_spark.render.html import _chart_of
    assert _chart_of({"observed_value": 1}) == ""
    assert _chart_of({"details": {"observed_partition": {"weights": []}}}) == ""


def test_render_table_stats_html():
    from great_expectations_spark.render.html import render_table_stats_html

    html = render_table_stats_html(
        distinct={"user_id": 1500, "value": 6728},
        moments={
            "value": {
                "count": 10000, "mean": 49.6307, "stddev": 49.0999,
                "min": 0.01, "max": 490.02, "sum": 496306.57,
                "variance": 2410.8,
            }
        },
        top_values={"event_type": [("click", 4000), ("view", 3500)]},
        title="events stats",
        partitions=30,
    )
    assert "events stats" in html
    assert "merged from 30 partition sketches" in html
    assert "1,500" in html and "6,728" in html
    assert "49.6307" in html and "490.02" in html
    assert "10,000" in html
    assert "heaviest values" in html and "event_type" in html
    assert "<svg" in html and html.count("<rect") == 2
    # columns from all three dicts appear even when partially covered
    for col in ("user_id", "value", "event_type"):
        assert f"<td>{col}</td>" in html
    empty = render_table_stats_html()
    assert "no sketched columns" in empty


def test_render_curation_report_html():
    from great_expectations_spark.render.html import (
        render_curation_report_html,
    )

    report = [
        {"stage": "input", "rows": 1000, "retained": 1.0},
        {"stage": "c4_clean", "rows": 800, "retained": 0.8},
        {"stage": "dedup[minhash]", "rows": 600, "retained": 0.6},
        {"stage": "mixture", "rows": 300, "retained": 0.3},
    ]
    html = render_curation_report_html(report, title="run-42")
    assert "run-42" in html
    assert "3 stages, 1000 input rows" in html
    assert "300" in html and "30.0%" in html
    assert "dedup[minhash]" in html
    assert html.count("<tr>") == 5  # header + 4 stage rows
    assert "<svg" in html and html.count("<rect") == 4
    assert "200" in html  # dropped-here for c4_clean
    # empty report doesn't raise
    empty = render_curation_report_html([])
    assert "empty report" in empty
