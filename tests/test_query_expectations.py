"""Query-expectation variants (user SQL escape hatch) and table.head.

Reference contract: query metrics render a templated SQL string against a
temp view of the batch (`query_metrics/query_column.py:70-95`,
`query_column_pair.py:49-67`, `query_multiple_columns.py:51-77`,
`query_template_values.py:51-71`) and the expectation judges the rows.
"""

import pytest

from great_expectations_spark import table_head
from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture()
def sales(spark):
    rows = [
        (1, "a", 10.0, 2),
        (2, "a", 20.0, 4),
        (3, "b", 30.0, 6),
        (4, "b", 40.0, 8),
        (5, "c", -5.0, 1),
    ]
    return spark.createDataFrame(
        rows, "id int, cat string, amount double, qty int"
    )


def _run(df, etype, **kwargs):
    suite = ExpectationSuite("q").add(etype, **kwargs)
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    r = res.results[0]
    if r.exception_info["raised_exception"]:
        raise AssertionError(r.exception_info["exception_message"])
    return r


def test_query_no_rows_pass_and_fail(sales):
    ok = _run(
        sales, "expect_query_results_to_return_no_rows",
        query="SELECT * FROM {batch} WHERE amount < -100",
    )
    assert ok.success and ok.result["unexpected_count"] == 0
    bad = _run(
        sales, "expect_query_results_to_return_no_rows",
        query="SELECT id, amount FROM {batch} WHERE amount < 0",
    )
    assert not bad.success
    assert bad.result["unexpected_count"] == 1
    assert bad.result["partial_unexpected_list"][0]["id"] == 5


def test_query_value_between_column_template(sales):
    r = _run(
        sales, "expect_query_value_to_be_between",
        query="SELECT avg({col}) FROM {active_batch}",
        column="amount", min_value=15, max_value=25,
    )
    assert r.success
    assert r.result["observed_value"] == pytest.approx(19.0)


def test_query_value_between_pair_and_multicolumn_templates(sales):
    r = _run(
        sales, "expect_query_value_to_be_between",
        query="SELECT corr({column_A}, {column_B}) FROM {batch}",
        column_A="amount", column_B="qty", min_value=0.9,
    )
    assert r.success
    r2 = _run(
        sales, "expect_query_value_to_be_between",
        query="SELECT sum({col_1}) / sum({col_2}) FROM {batch}",
        columns=["amount", "qty"], min_value=4, max_value=5,
    )
    assert r2.success


def test_query_value_between_template_dict(sales):
    r = _run(
        sales, "expect_query_value_to_be_between",
        query="SELECT count(*) FROM {batch} WHERE {condition}",
        template_dict={"condition": "cat = 'b'"},
        min_value=2, max_value=2,
    )
    assert r.success
    assert r.result["observed_value"] == 2


def test_query_value_requires_single_row(sales):
    with pytest.raises(AssertionError, match="exactly one scalar"):
        _run(
            sales, "expect_query_value_to_be_between",
            query="SELECT amount FROM {batch}", min_value=0,
        )


def test_query_collect_cap(sales, monkeypatch):
    from great_expectations_spark.operators import query_ops

    monkeypatch.setattr(query_ops, "QUERY_RESULT_COLLECT_CAP", 2)
    with pytest.raises(AssertionError, match="more than 2 rows"):
        _run(
            sales, "expect_query_results_to_return_no_rows",
            query="SELECT * FROM {batch}",
        )


def test_queried_value_frequency_threshold(sales):
    r = _run(
        sales, "expect_queried_column_value_frequency_to_meet_threshold",
        column="cat", value="a", threshold=0.3,
    )
    assert r.success
    assert r.result["observed_value"] == pytest.approx(0.4)
    r2 = _run(
        sales, "expect_queried_column_value_frequency_to_meet_threshold",
        column="cat", value="c", threshold=0.5,
    )
    assert not r2.success


def test_query_respects_row_condition(sales):
    r = _run(
        sales, "expect_query_value_to_be_between",
        query="SELECT count(*) FROM {batch}",
        row_condition="cat = 'a'", condition_parser="spark",
        min_value=2, max_value=2,
    )
    assert r.success


def test_table_head(sales):
    assert len(table_head(sales, n_rows=3)) == 3
    assert len(table_head(sales, fetch_all=True)) == 5
    assert len(table_head(sales, n_rows=-2)) == 3  # pandas-style negative
    head = table_head(sales, n_rows=1)
    assert set(head[0]) == {"id", "cat", "amount", "qty"}


def test_concurrent_query_expectations_no_view_race(spark, tmp_path):
    """max_concurrency>1 runs validations on one SparkSession; with the
    per-invocation unique view name each partition's user-SQL count must
    see ONLY its own rows (regression for the shared-view race)."""
    from great_expectations_spark.checkpoint.runner import run_checkpoint
    from great_expectations_spark.core.suite import ExpectationSuite

    rows = [(p, i) for p in ["a", "b", "c", "d"] for i in range(100 * (ord(p) - 96))]
    df = spark.createDataFrame(rows, "part string, v int")
    # each partition p has exactly 100*(ord(p)-96) rows; assert per
    # partition via a query expectation with exact bounds resolved from
    # the batch itself
    suite = ExpectationSuite("c").add(
        "expect_query_value_to_be_between",
        query="SELECT count(*) * 0 + "
              "(SELECT count(DISTINCT part) FROM {batch}) FROM {batch}",
        min_value=1, max_value=1,  # exactly ONE distinct partition visible
    )
    summary = run_checkpoint(
        df, suite, "part", str(tmp_path / "ckpt"), max_concurrency=4,
    )
    assert summary["success"], summary["failures"]
    assert summary["partitions_validated_now"] == 4
