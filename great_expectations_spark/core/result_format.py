"""Result-shape semantics, ported 1:1 for parity with the reference.

These are pure-Python (no Spark) so they can be golden-tested against the
reference's JSON fixture corpus.  Semantics sources (behavior, not code):

* ``parse_result_format``  — reference
  ``great_expectations/core/expectation_configuration.py:61-86``
* ``format_map_output``    — reference
  ``great_expectations/expectations/expectation.py:3401-3546``
* ``mostly_success``       — reference ``expectations/expectation.py:3566-3575``
* ``validate_metric_value_between`` — reference
  ``expectations/expectation.py:2336-2425``
* vacuous-true rule        — reference ``expectations/expectation.py:2836-2846``
"""

from __future__ import annotations

import datetime
import math
from collections import Counter
from typing import Any, Dict, List, Optional, Union

DEFAULT_PARTIAL_UNEXPECTED_COUNT = 20

RESULT_FORMATS = ("BOOLEAN_ONLY", "BASIC", "SUMMARY", "COMPLETE")


def parse_result_format(result_format: Union[str, dict, None]) -> dict:
    """Normalize a result_format (string shorthand or dict) to the canonical
    dict ``{result_format, partial_unexpected_count, include_unexpected_rows}``.
    """
    if result_format is None:
        result_format = "BASIC"
    if isinstance(result_format, str):
        out = {
            "result_format": result_format,
            "partial_unexpected_count": DEFAULT_PARTIAL_UNEXPECTED_COUNT,
            "include_unexpected_rows": False,
        }
    else:
        out = dict(result_format)
        if "include_unexpected_rows" in out and "result_format" not in out:
            raise ValueError(
                "When using include_unexpected_rows, result_format must be "
                "explicitly specified"
            )
        out.setdefault(
            "partial_unexpected_count", DEFAULT_PARTIAL_UNEXPECTED_COUNT
        )
        out.setdefault("include_unexpected_rows", False)
    if out["result_format"] not in RESULT_FORMATS:
        raise ValueError(f"Unknown result_format {out['result_format']!r}")
    return out


def mostly_success(
    rows_considered_count: int, unexpected_count: int, mostly: float
) -> bool:
    """success iff (considered - unexpected) / considered >= mostly."""
    considered = float(rows_considered_count)
    ratio = (considered - float(unexpected_count)) / considered
    return ratio >= mostly


def map_expectation_success(
    element_count: Optional[int],
    nonnull_count: Optional[int],
    unexpected_count: Optional[int],
    mostly: float,
) -> bool:
    """Success rule for map expectations including the vacuous-true edge:
    no rows / no non-null rows / no count available => True."""
    if (
        unexpected_count is None
        or not element_count
        or not nonnull_count
    ):
        return True
    return mostly_success(nonnull_count, unexpected_count, mostly)


def format_map_output(
    result_format: dict,
    success: bool,
    element_count: Optional[int] = None,
    nonnull_count: Optional[int] = None,
    unexpected_count: Optional[int] = None,
    unexpected_list: Optional[List[Any]] = None,
    unexpected_index_list: Optional[List[Any]] = None,
    unexpected_index_query: Optional[str] = None,
    unexpected_index_column_names: Optional[List[str]] = None,
    unexpected_rows: Optional[List[Any]] = None,
) -> Dict[str, Any]:
    """Build the ``result`` payload for a map expectation at the requested
    verbosity.  Field set and percent formulas match the reference exactly:

    * ``unexpected_percent`` is the percent of *non-missing* rows,
    * ``unexpected_percent_total`` is of all rows in the domain,
    * ``missing_count = element_count - nonnull_count``,
    * ``partial_unexpected_counts`` sorted by ``(-count, value)``.
    """
    if element_count is None:
        element_count = 0

    return_obj: Dict[str, Any] = {"success": success}
    if result_format["result_format"] == "BOOLEAN_ONLY":
        return return_obj

    skip_missing = nonnull_count is None
    missing_count: Optional[int] = (
        None if skip_missing else element_count - int(nonnull_count)
    )

    missing_percent: Optional[float] = None
    unexpected_percent_total: Optional[float] = None
    unexpected_percent_nonmissing: Optional[float] = None
    if unexpected_count is not None and element_count > 0:
        unexpected_percent_total = unexpected_count / element_count * 100
        if not skip_missing and missing_count is not None:
            missing_percent = missing_count / element_count * 100
            if nonnull_count:
                unexpected_percent_nonmissing = (
                    unexpected_count / nonnull_count * 100
                )
        else:
            unexpected_percent_nonmissing = unexpected_percent_total

    return_obj["result"] = {
        "element_count": element_count,
        "unexpected_count": unexpected_count,
        "unexpected_percent": unexpected_percent_nonmissing,
    }

    if unexpected_list is not None:
        return_obj["result"]["partial_unexpected_list"] = unexpected_list[
            : result_format["partial_unexpected_count"]
        ]

    if unexpected_index_column_names is not None:
        return_obj["result"][
            "unexpected_index_column_names"
        ] = unexpected_index_column_names

    if not skip_missing:
        return_obj["result"]["missing_count"] = missing_count
        return_obj["result"]["missing_percent"] = missing_percent
        return_obj["result"]["unexpected_percent_total"] = unexpected_percent_total
        return_obj["result"][
            "unexpected_percent_nonmissing"
        ] = unexpected_percent_nonmissing

    if result_format["include_unexpected_rows"]:
        return_obj["result"]["unexpected_rows"] = unexpected_rows

    if result_format["result_format"] == "BASIC":
        return return_obj

    immutable_unexpected_list: List[Any] = []
    if unexpected_list is not None:
        if unexpected_list and isinstance(unexpected_list[0], dict):
            # multicolumn map unexpected entries are dicts -> flatten to
            # hashable tuples before counting
            immutable_unexpected_list = [
                tuple(item.values()) for item in unexpected_list
            ]
        else:
            immutable_unexpected_list = unexpected_list

    partial_n = result_format.get("partial_unexpected_count")
    if partial_n is not None and partial_n > 0:
        try:
            partial_unexpected_counts: List[Dict[str, Any]] = [
                {"value": value, "count": count}
                for value, count in sorted(
                    Counter(immutable_unexpected_list).most_common(partial_n),
                    key=lambda item: (-item[1], item[0]),
                )
            ]
        except TypeError:
            partial_unexpected_counts = [
                {"error": "partial_exception_counts requires a hashable type"}
            ]
        if unexpected_index_list is not None:
            return_obj["result"]["partial_unexpected_index_list"] = (
                unexpected_index_list[:partial_n]
            )
        return_obj["result"][
            "partial_unexpected_counts"
        ] = partial_unexpected_counts

    if result_format["result_format"] == "SUMMARY":
        return return_obj

    if unexpected_list is not None:
        return_obj["result"]["unexpected_list"] = unexpected_list
    if unexpected_index_list is not None:
        return_obj["result"]["unexpected_index_list"] = unexpected_index_list
    if unexpected_index_query is not None:
        return_obj["result"]["unexpected_index_query"] = unexpected_index_query
    return return_obj


def _is_null_scalar(value: Any) -> bool:
    if value is None:
        return True
    if isinstance(value, float) and math.isnan(value):
        return True
    return False


def validate_metric_value_between(
    metric_value: Any,
    min_value: Any = None,
    max_value: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
) -> Dict[str, Any]:
    """Shared validator for every ``expect_<metric>_to_be_between`` family
    expectation.  None bound => unbounded on that side; None/NaN observed
    value => failure with observed_value None; datetime bounds given as
    strings are parsed.
    """
    if metric_value is None:
        return {"success": False, "result": {"observed_value": None}}
    if not isinstance(metric_value, datetime.datetime) and _is_null_scalar(
        metric_value
    ):
        return {"success": False, "result": {"observed_value": None}}

    if isinstance(metric_value, datetime.datetime):
        if isinstance(min_value, str):
            min_value = datetime.datetime.fromisoformat(min_value)
        if isinstance(max_value, str):
            max_value = datetime.datetime.fromisoformat(max_value)

    if min_value is not None:
        above_min = metric_value > min_value if strict_min else metric_value >= min_value
    else:
        above_min = True
    if max_value is not None:
        below_max = metric_value < max_value if strict_max else metric_value <= max_value
    else:
        below_max = True

    return {
        "success": bool(above_min and below_max),
        "result": {"observed_value": metric_value},
    }
