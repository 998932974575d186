"""Column-pair and multicolumn map operators.

Denominator parity: success ratio uses the count of rows surviving
``ignore_row_if`` (reference ``expectations/expectation.py:3097-3113`` pair,
``:3372-3388`` multicolumn) — the planner computes
``considered_count`` (= ``filtered_row_count``) from the ``considered``
Column here.

Defaults mirror the reference: pair expectations default
``ignore_row_if="both_values_are_missing"``; multicolumn default
``"all_values_are_missing"`` (reference ``expectation.py:2887, 3153``).
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Callable, Dict, List

from pyspark.sql import Column
from pyspark.sql import functions as F

from great_expectations_spark.core.domain import (
    ignore_row_if_multicolumn,
    ignore_row_if_pair,
)
from great_expectations_spark.plans.specs import CompiledMap

PAIR_COMPILERS: Dict[str, Callable[[Dict[str, Any]], CompiledMap]] = {}


def register_pair(name: str):
    def deco(fn):
        PAIR_COMPILERS[name] = fn
        return fn

    return deco


def _pair(kwargs: Dict[str, Any], expected: Column) -> CompiledMap:
    column_a, column_b = kwargs["column_A"], kwargs["column_B"]
    keep = ignore_row_if_pair(
        column_a,
        column_b,
        kwargs.get("ignore_row_if", "both_values_are_missing"),
    )
    return CompiledMap(
        kind="column_pair_map",
        domain_columns=[column_a, column_b],
        considered=keep if keep is not None else F.lit(True),
        unexpected=~F.coalesce(expected.cast("boolean"), F.lit(False)),
        denominator="filtered",
        value_expr=F.struct(
            F.col(column_a).alias("A"), F.col(column_b).alias("B")
        ),
    )


def _multicolumn(
    kwargs: Dict[str, Any], expected: Column, default_ignore: str
) -> CompiledMap:
    column_list: List[str] = list(kwargs["column_list"])
    keep = ignore_row_if_multicolumn(
        column_list, kwargs.get("ignore_row_if", default_ignore)
    )
    return CompiledMap(
        kind="multicolumn_map",
        domain_columns=column_list,
        considered=keep if keep is not None else F.lit(True),
        unexpected=~F.coalesce(expected.cast("boolean"), F.lit(False)),
        denominator="filtered",
        value_expr=F.struct(*[F.col(c) for c in column_list]),
        value_is_dict=True,
    )


# ref: column_pair_map_metrics/column_pair_values_greater.py:92-119
@register_pair("expect_column_pair_values_a_to_be_greater_than_b")
def _a_greater_than_b(kwargs: Dict[str, Any]) -> CompiledMap:
    a, b = F.col(kwargs["column_A"]), F.col(kwargs["column_B"])
    if kwargs.get("or_equal"):
        expected = (a >= b) | a.eqNullSafe(b)
    else:
        expected = a > b
    return _pair(kwargs, expected)


# ref: column_pair_map_metrics/column_pair_values_equal.py:42-44
@register_pair("expect_column_pair_values_to_be_equal")
def _pair_equal(kwargs: Dict[str, Any]) -> CompiledMap:
    a, b = F.col(kwargs["column_A"]), F.col(kwargs["column_B"])
    return _pair(kwargs, a.eqNullSafe(b))


# ref: column_pair_map_metrics/column_pair_values_in_set.py:77-91
@register_pair("expect_column_pair_values_to_be_in_set")
def _pair_in_set(kwargs: Dict[str, Any]) -> CompiledMap:
    a, b = F.col(kwargs["column_A"]), F.col(kwargs["column_B"])
    pairs = kwargs.get("value_pairs_set") or []
    conds = [
        a.eqNullSafe(F.lit(x)) & b.eqNullSafe(F.lit(y)) for x, y in pairs
    ]
    expected = reduce(lambda p, q: p | q, conds) if conds else F.lit(False)
    return _pair(kwargs, expected)


# ref: multicolumn_map_metrics/multicolumn_sum_equal.py:40-46
@register_pair("expect_multicolumn_sum_to_equal")
def _multicolumn_sum_equal(kwargs: Dict[str, Any]) -> CompiledMap:
    total = kwargs["sum_total"]
    cols = [F.coalesce(F.col(c), F.lit(0)) for c in kwargs["column_list"]]
    expected = reduce(lambda p, q: p + q, cols) == F.lit(total)
    return _multicolumn(kwargs, expected, "all_values_are_missing")


# ref: contrib expect_multicolumn_sum_values_to_be_between (row-wise sum
# bounded instead of exactly equal — the between variant of sum_to_equal)
@register_pair("expect_multicolumn_sum_values_to_be_between")
def _multicolumn_sum_between(kwargs: Dict[str, Any]) -> CompiledMap:
    min_value = kwargs.get("min_value")
    max_value = kwargs.get("max_value")
    cols = [F.coalesce(F.col(c), F.lit(0)) for c in kwargs["column_list"]]
    total = reduce(lambda p, q: p + q, cols)
    expected = F.lit(True)
    if min_value is not None:
        expected = expected & (total >= F.lit(min_value))
    if max_value is not None:
        expected = expected & (total <= F.lit(max_value))
    return _multicolumn(kwargs, expected, "all_values_are_missing")


# ref: contrib expect_multicolumn_values_not_to_be_all_null — at least one
# of the listed columns must be non-null per row
@register_pair("expect_multicolumn_values_not_to_be_all_null")
def _multicolumn_not_all_null(kwargs: Dict[str, Any]) -> CompiledMap:
    any_nonnull = reduce(
        lambda p, q: p | q,
        [F.col(c).isNotNull() for c in kwargs["column_list"]],
    )
    # never ignore rows: an all-null row is exactly the violation
    return _multicolumn(kwargs, any_nonnull, "never")


# ref: multicolumn_map_metrics/select_column_values_unique_within_record.py:72-86
@register_pair("expect_select_column_values_to_be_unique_within_record")
def _unique_within_record(kwargs: Dict[str, Any]) -> CompiledMap:
    column_list = list(kwargs["column_list"])
    dup_conds = [
        F.col(column_list[i]).eqNullSafe(F.col(column_list[j]))
        for i in range(len(column_list))
        for j in range(i + 1, len(column_list))
    ]
    any_dup = reduce(lambda p, q: p | q, dup_conds)
    return _multicolumn(kwargs, ~any_dup, "all_values_are_missing")


def compile_pair_expectation(
    expectation_type: str, kwargs: Dict[str, Any]
) -> CompiledMap:
    try:
        compiler = PAIR_COMPILERS[expectation_type]
    except KeyError:
        raise KeyError(f"no pair/multicolumn compiler for {expectation_type!r}")
    return compiler(kwargs)
