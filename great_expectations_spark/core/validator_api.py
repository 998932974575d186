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


class Validator:
    def __init__(
        self,
        df: DataFrame,
        suite_name: str = "default",
        result_format: Union[str, dict] = "BASIC",
        engine: Optional[SuiteValidator] = None,
    ) -> None:
        self._df = df
        self._suite = ExpectationSuite(suite_name)
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
                        pass  # table-level: no positional column
                    else:
                        kwargs.setdefault(first_key, args[0])
                        if len(args) > 1:
                            raise TypeError(
                                f"{name} takes at most one positional arg"
                            )
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
