"""V2 ``SparkDFDataset`` compatibility shim.

The reference's deprecated-but-widely-used v2 API
(``dataset/sparkdf_dataset.py:531-619``) wraps a Spark DataFrame in an
object whose ``expect_*`` methods evaluate immediately and whose metric
getters (``get_column_mean``, ``get_column_value_counts``,
``get_column_hist``, ... — reference ``:631-833``) return driver-side
scalars / pandas objects.  This shim gives a v2 user the same call
surface backed by the one-pass SuiteValidator engine:

    ds = SparkDFDataset(df)
    ds.expect_column_values_to_not_be_null("text", mostly=0.99)
    ds.get_column_mean("turn_idx")
    result = ds.validate()          # accumulated suite, one-pass engine

Deviations from the reference, on purpose:

* ``head(n)`` returns a pandas DataFrame (the reference returns a
  ``PandasDataset``; there is no pandas execution engine here and the
  practical use is eyeballing rows).
* Metric getters use Spark's JVM-side aggregates (``approxQuantile``
  with rel-error 0 for exact quantiles) rather than the reference's
  mixed collect/NumPy paths — same values, no driver-side row loops.

Every getter is a single Spark job over the (optionally persisted)
DataFrame; the interactive surface is not the 100 TB hot path — suites
built here should be run through ``validate()`` / checkpoints, which
batch all expectations into one aggregate pass.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
    ExpectationValidationResult,
)
from great_expectations_spark.core.suite import (
    ExpectationConfiguration,
    ExpectationSuite,
)
from great_expectations_spark.core.validator_api import Validator
from great_expectations_spark.plans.planner import SuiteValidator

_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float",
                     "double", "decimal", "long", "short", "byte")


class SparkDFDataset:
    """V2-style dataset over a Spark DataFrame (reference
    ``dataset/sparkdf_dataset.py:531``)."""

    def __init__(
        self,
        spark_df: DataFrame,
        expectation_suite: Optional[ExpectationSuite] = None,
        persist: bool = True,
        result_format: Union[str, dict] = "BASIC",
        engine: Optional[SuiteValidator] = None,
    ) -> None:
        self.spark_df = spark_df
        self._persist = persist
        if persist:
            self.spark_df.persist()
        self._validator = Validator(
            spark_df,
            suite_name=(
                expectation_suite.expectation_suite_name
                if expectation_suite is not None else "default"
            ),
            result_format=result_format,
            engine=engine,
        )
        # success per accumulated expectation (None = preloaded, never
        # evaluated interactively) — feeds discard_failed_expectations
        self._successes: List[Optional[bool]] = []
        if expectation_suite is not None:
            for cfg in expectation_suite.expectations:
                self._validator.get_expectation_suite().expectations.append(
                    cfg
                )
                self._successes.append(None)
        self._row_count: Optional[int] = None

    # -- construction ---------------------------------------------------

    @classmethod
    def from_dataset(cls, dataset: Optional["SparkDFDataset"] = None
                     ) -> "SparkDFDataset":
        if isinstance(dataset, SparkDFDataset):
            return cls(spark_df=dataset.spark_df)
        raise ValueError("from_dataset requires a SparkDFDataset dataset")

    # -- expectation dispatch -------------------------------------------

    def __getattr__(self, name: str):
        if name.startswith("expect_"):
            inner = getattr(self._validator, name)

            def runner(*args: Any, **kwargs: Any
                       ) -> ExpectationValidationResult:
                result = inner(*args, **kwargs)
                self._successes.append(bool(result.success))
                return result

            return runner
        raise AttributeError(name)

    def add_expectation(self, config: ExpectationConfiguration) -> None:
        """Append without evaluating (reference DataAsset.append_expectation)."""
        self._validator.get_expectation_suite().expectations.append(config)
        self._successes.append(None)

    def get_expectation_suite(
        self, discard_failed_expectations: bool = True
    ) -> ExpectationSuite:
        suite = self._validator.get_expectation_suite()
        if not discard_failed_expectations:
            return suite
        kept = ExpectationSuite(suite.expectation_suite_name)
        kept.evaluation_parameters = dict(suite.evaluation_parameters)
        kept.meta = dict(suite.meta)
        for cfg, ok in zip(suite.expectations, self._successes):
            if ok is not False:
                kept.expectations.append(cfg)
        return kept

    def validate(
        self,
        expectation_suite: Optional[ExpectationSuite] = None,
        result_format: Union[str, dict, None] = None,
        **kwargs: Any,
    ) -> ExpectationSuiteValidationResult:
        return self._validator.validate(
            expectation_suite, result_format=result_format, **kwargs
        )

    # -- table-level getters (reference :619-643) -----------------------

    def head(self, n: int = 5) -> pd.DataFrame:
        return self.spark_df.limit(n).toPandas()

    def get_row_count(self) -> int:
        if self._row_count is None:
            self._row_count = self.spark_df.count()
        return self._row_count

    def get_column_count(self) -> int:
        return len(self.spark_df.columns)

    def get_table_columns(self) -> List[str]:
        return list(self.spark_df.columns)

    # -- column-level getters (reference :640-833) ----------------------

    def _dtype(self, column: str) -> str:
        return dict(self.spark_df.dtypes)[column]

    def _require_numeric(self, column: str, fn: str) -> None:
        if not self._dtype(column).startswith(_NUMERIC_PREFIXES):
            raise TypeError(
                f"Expected numeric column type for function {fn}()"
            )

    def _scalar(self, expr) -> Any:
        return self.spark_df.agg(expr.alias("v")).collect()[0]["v"]

    def get_column_nonnull_count(self, column: str) -> int:
        return int(self._scalar(F.count(F.col(column))))

    def get_column_mean(self, column: str) -> Optional[float]:
        self._require_numeric(column, "mean")
        v = self._scalar(F.avg(F.col(column)))
        return None if v is None else float(v)

    def get_column_sum(self, column: str) -> Any:
        return self._scalar(F.sum(F.col(column)))

    def _minmax_col(self, column: str, parse_strings_as_datetimes: bool):
        c = F.col(column)
        if parse_strings_as_datetimes and self._dtype(column).startswith(
            ("string", "varchar")
        ):
            c = F.to_timestamp(c)
        return c

    def get_column_max(self, column: str,
                       parse_strings_as_datetimes: bool = False) -> Any:
        return self._scalar(
            F.max(self._minmax_col(column, parse_strings_as_datetimes))
        )

    def get_column_min(self, column: str,
                       parse_strings_as_datetimes: bool = False) -> Any:
        return self._scalar(
            F.min(self._minmax_col(column, parse_strings_as_datetimes))
        )

    def get_column_value_counts(self, column: str, sort: str = "value",
                                collate: Optional[str] = None) -> pd.Series:
        if sort not in ("value", "count", "none"):
            raise ValueError("sort must be either 'value', 'count', or 'none'")
        if collate is not None:
            raise ValueError(
                "collate parameter is not supported in SparkDFDataset"
            )
        vc = (
            self.spark_df.select(column)
            .where(F.col(column).isNotNull())
            .groupBy(column)
            .count()
        )
        if sort == "value":
            vc = vc.orderBy(column)
        elif sort == "count":
            vc = vc.orderBy(F.desc("count"))
        rows = vc.collect()
        return pd.Series(
            [r["count"] for r in rows],
            index=pd.Index([r[column] for r in rows], name="value"),
            name="count",
        )

    def get_column_unique_count(self, column: str) -> int:
        return int(self._scalar(F.countDistinct(F.col(column))))

    def get_column_modes(self, column: str) -> List[Any]:
        s = self.get_column_value_counts(column)
        if s.empty:
            return []
        return list(s[s == s.max()].index)

    def get_column_median(self, column: str) -> Optional[float]:
        # exact two-middle-values trick as the reference (:717-729):
        # quantiles at 0.5 and 0.5+eps with rel-error 0, averaged
        n = self.get_row_count()
        qs = self.spark_df.stat.approxQuantile(
            column, [0.5, 0.5 + 1.0 / (2 + 2 * n)], 0.0
        )
        if not qs:
            return None
        return float(sum(qs) / len(qs))

    def get_column_quantiles(
        self, column: str, quantiles: Sequence[float],
        allow_relative_error: Union[bool, float] = False,
    ) -> List[float]:
        if allow_relative_error is False:
            allow_relative_error = 0.0
        if (not isinstance(allow_relative_error, float)
                or not 0 <= allow_relative_error <= 1):
            raise ValueError(
                "SparkDFDataset requires relative error to be False or a "
                "float between 0 and 1."
            )
        return self.spark_df.stat.approxQuantile(
            column, list(quantiles), allow_relative_error
        )

    def get_column_stdev(self, column: str) -> Optional[float]:
        v = self._scalar(F.stddev_samp(F.col(column)))
        return None if v is None else float(v)

    def get_column_hist(self, column: str,
                        bins: Sequence[float]) -> List[int]:
        """Counts per bin, half-open [lo, hi) with the LAST bin closed —
        one conditional-sum pass (the reference does the same semantics
        via RDD histogram + edge patching, :749-810)."""
        bins = [float(b) for b in bins]
        c = F.col(column)
        aggs = []
        last = len(bins) - 2
        for i in range(len(bins) - 1):
            lo, hi = bins[i], bins[i + 1]
            cond = c >= F.lit(lo) if not math.isinf(lo) else c.isNotNull()
            if not math.isinf(hi):
                upper = (c <= F.lit(hi)) if i == last else (c < F.lit(hi))
                cond = cond & upper
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"b{i}")
            )
        row = self.spark_df.agg(*aggs).collect()[0]
        return [int(row[f"b{i}"] or 0) for i in range(len(bins) - 1)]

    def get_column_count_in_range(
        self, column: str,
        min_val: Optional[float] = None,
        max_val: Optional[float] = None,
        strict_min: bool = False,
        strict_max: bool = True,
    ) -> int:
        if min_val is None and max_val is None:
            raise ValueError("Must specify either min or max value")
        if (min_val is not None and max_val is not None
                and min_val > max_val):
            raise ValueError("Min value must be <= to max value")
        c = F.col(column)
        cond = c.isNotNull()
        if min_val is not None:
            cond = cond & ((c > min_val) if strict_min else (c >= min_val))
        if max_val is not None:
            cond = cond & ((c < max_val) if strict_max else (c <= max_val))
        return int(
            self._scalar(F.sum(F.when(cond, 1).otherwise(0))) or 0
        )

    # -- lifecycle -------------------------------------------------------

    def unpersist(self) -> None:
        if self._persist:
            self.spark_df.unpersist()
