"""Interactive validator — the reference's ephemeral ``validator.expect_*``
API (``validator/validator.py:465-614``): each call builds one
ExpectationConfiguration, validates it immediately, appends it to the
in-session suite, and returns the ExpectationValidationResult.

    v = Validator(df)
    v.expect_column_values_to_not_be_null("text", mostly=0.99)
    v.expect_column_mean_to_be_between("turn_idx", min_value=0)
    suite = v.get_expectation_suite()        # accumulated suite
    result = v.validate()                     # full suite, one-pass engine
"""

from __future__ import annotations

import inspect
from typing import Any, Dict, List, Optional, Union

from pyspark.sql import DataFrame

from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
    ExpectationValidationResult,
)
from great_expectations_spark.core.suite import (
    ExpectationConfiguration,
    ExpectationSuite,
)
from great_expectations_spark.plans.planner import (
    SuiteValidator,
    registered_expectation_types,
)

# kwargs that position-one arguments map to, per expectation family
_FIRST_ARG_KEY = {
    "column_list": (
        "expect_compound_columns_to_be_unique",
        "expect_multicolumn_values_to_be_unique",
        "expect_multicolumn_sum_to_equal",
        "expect_select_column_values_to_be_unique_within_record",
    ),
}


def _rest_arg_keys(name: str) -> List[str]:
    """Kwarg names that positional args AFTER the column map to — the
    reference's v2 ``SparkDFDataset`` method signatures
    (``dataset/dataset.py`` / ``dataset/sparkdf_dataset.py``), so v2
    call sites like ``expect_column_values_to_be_between("c", 0, 10)``
    keep working verbatim through the shim."""
    if name == "expect_multicolumn_sum_to_equal":
        return ["sum_total"]
    if name == "expect_column_quantile_values_to_be_between":
        # v2 signature takes quantile_ranges second, NOT min/max —
        # must beat the generic _to_be_between suffix rule below
        return ["quantile_ranges"]
    if name.endswith("_to_be_between") or name.endswith(
        "_to_be_strictly_between"
    ):
        return ["min_value", "max_value"]
    for suffix, keys in (
        ("_kl_divergence_to_be_less_than", ["partition_object", "threshold"]),
        ("_chisquare_test_p_value_to_be_greater_than",
         ["partition_object", "p"]),
        ("_bootstrapped_ks_test_p_value_to_be_greater_than",
         ["partition_object", "p"]),
        ("_parameterized_distribution_ks_test_p_value_to_be_greater_than",
         ["distribution", "p_value"]),
        ("_to_be_in_type_list", ["type_list"]),
        ("_to_be_of_type", ["type_"]),
        ("_to_be_in_set", ["value_set"]),
        ("_to_not_be_in_set", ["value_set"]),
        ("_to_contain_set", ["value_set"]),
        ("_to_equal_set", ["value_set"]),
        ("_to_match_regex_list", ["regex_list"]),
        ("_to_not_match_regex_list", ["regex_list"]),
        ("_to_match_regex", ["regex"]),
        ("_to_not_match_regex", ["regex"]),
        ("_to_match_like_pattern_list", ["like_pattern_list"]),
        ("_to_not_match_like_pattern_list", ["like_pattern_list"]),
        ("_to_match_like_pattern", ["like_pattern"]),
        ("_to_not_match_like_pattern", ["like_pattern"]),
        ("_to_match_strftime_format", ["strftime_format"]),
        ("_to_match_json_schema", ["json_schema"]),
        ("_to_equal_other_table", ["other_table_name"]),
        ("_to_equal", ["value"]),
    ):
        if name.endswith(suffix):
            return keys
    return []


class Validator:
    def __init__(
        self,
        df: DataFrame,
        suite_name: str = "default",
        result_format: Union[str, dict] = "BASIC",
        engine: Optional[SuiteValidator] = None,
        suite: Optional[ExpectationSuite] = None,
    ) -> None:
        self._df = df
        # an existing suite (e.g. loaded from a DataContext store) keeps
        # accumulating in place — the reference's
        # context.get_validator(expectation_suite_name=...) behavior
        self._suite = suite if suite is not None else ExpectationSuite(
            suite_name
        )
        self._result_format = result_format
        self._engine = engine or SuiteValidator()
        self._types = set(registered_expectation_types())

    def __getattr__(self, name: str):
        if name.startswith("expect_"):
            if name not in self._types:
                raise AttributeError(
                    f"unknown expectation {name!r}; see "
                    "registered_expectation_types()"
                )

            def runner(*args: Any, **kwargs: Any) -> ExpectationValidationResult:
                if args:
                    first_key = "column"
                    for key, types in _FIRST_ARG_KEY.items():
                        if name in types:
                            first_key = key
                    if name.startswith("expect_column_pair"):
                        kwargs.setdefault("column_A", args[0])
                        if len(args) > 1:
                            kwargs.setdefault("column_B", args[1])
                    elif name.startswith(("expect_table", "expect_query")):
                        # table-level: positionals are the value args
                        rest = _rest_arg_keys(name)
                        if len(args) > len(rest):
                            raise TypeError(
                                f"{name} takes at most {len(rest)} "
                                "positional args"
                            )
                        for key, val in zip(rest, args):
                            kwargs.setdefault(key, val)
                    else:
                        kwargs.setdefault(first_key, args[0])
                        # v2 signatures put the value args positionally
                        # after the column: map them by family
                        rest = _rest_arg_keys(name)
                        if len(args) - 1 > len(rest):
                            raise TypeError(
                                f"{name} takes at most {1 + len(rest)} "
                                "positional args"
                            )
                        for key, val in zip(rest, args[1:]):
                            kwargs.setdefault(key, val)
                config = ExpectationConfiguration(name, kwargs)
                one = ExpectationSuite(self._suite.expectation_suite_name)
                one.expectations = [config]
                result = self._engine.validate(
                    self._df, one, result_format=self._result_format
                )
                self._suite.expectations.append(config)
                return result.results[0]

            return runner
        raise AttributeError(name)

    def get_expectation_suite(self) -> ExpectationSuite:
        return self._suite

    def validate(
        self,
        suite: Optional[ExpectationSuite] = None,
        result_format: Union[str, dict, None] = None,
        **kwargs: Any,
    ) -> ExpectationSuiteValidationResult:
        return self._engine.validate(
            self._df,
            suite or self._suite,
            result_format=result_format or self._result_format,
            **kwargs,
        )
