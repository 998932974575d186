"""Suite suggestion from data — a minimal counterpart of the reference's
profiler (``rule_based_profiler`` / legacy ``BasicSuiteBuilderProfiler``),
Spark-first: ONE bundled agg over all columns gathers null rates, distinct
estimates, min/max and value lengths; the resulting ExpectationSuite can be
edited and versioned.

Heuristics (deliberately simple and explainable):
  * null rate <= 1 - mostly_floor  -> expect_column_values_to_not_be_null
    with mostly = floor(observed completeness, 2dp)
  * string column with <= max_set_size distinct -> in_set (observed set)
  * numeric column -> between [min, max]
  * timestamp column -> between [min, max]
  * all columns -> expect_table_columns_to_match_set
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from great_expectations_spark.core.suite import ExpectationSuite

NUMERIC_TYPES = (
    T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def suggest_suite(
    df: DataFrame,
    suite_name: str = "profiled",
    max_set_size: int = 50,
    mostly_floor: float = 0.9,
    columns: Optional[List[str]] = None,
) -> ExpectationSuite:
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        aggs.append(F.approx_count_distinct(col, 0.05).alias(f"dc__{c}"))
        dtype = fields[c]
        if isinstance(dtype, NUMERIC_TYPES + (T.TimestampType, T.DateType)):
            aggs.append(F.min(col).alias(f"mn__{c}"))
            aggs.append(F.max(col).alias(f"mx__{c}"))
    row = df.agg(*aggs).first()
    n = int(row["__n"]) or 1

    suite = ExpectationSuite(suite_name)
    suite.add("expect_table_columns_to_match_set", column_set=list(df.columns))
    small_set_cols: List[str] = []
    for c in cols:
        dtype = fields[c]
        nonnull = int(row[f"nn__{c}"] or 0)
        completeness = nonnull / n
        if completeness >= mostly_floor:
            mostly = max(0.0, min(1.0, math.floor(completeness * 100) / 100))
            suite.add(
                "expect_column_values_to_not_be_null",
                column=c,
                **({"mostly": mostly} if mostly < 1.0 else {}),
            )
        distinct = int(row[f"dc__{c}"] or 0)
        if (
            isinstance(dtype, T.StringType)
            and 0 < distinct <= max_set_size
            and nonnull > 0
        ):
            small_set_cols.append(c)
        if isinstance(dtype, NUMERIC_TYPES) and row[f"mn__{c}"] is not None:
            suite.add(
                "expect_column_values_to_be_between",
                column=c,
                min_value=_plain(row[f"mn__{c}"]),
                max_value=_plain(row[f"mx__{c}"]),
            )
        if isinstance(dtype, (T.TimestampType, T.DateType)) and row[
            f"mn__{c}"
        ] is not None:
            suite.add(
                "expect_column_values_to_be_between",
                column=c,
                min_value=str(row[f"mn__{c}"]),
                max_value=str(row[f"mx__{c}"]),
                parse_strings_as_datetimes=True,
            )

    # second tiny pass only for the few low-cardinality string columns
    if small_set_cols:
        sets = df.agg(
            *[
                F.collect_set(F.col(c)).alias(f"set__{c}")
                for c in small_set_cols
            ]
        ).first()
        for c in small_set_cols:
            values = sorted(sets[f"set__{c}"])
            if len(values) <= max_set_size:
                suite.add(
                    "expect_column_values_to_be_in_set",
                    column=c,
                    value_set=values,
                )
    return suite


def _plain(value: Any) -> Any:
    try:
        import decimal

        if isinstance(value, decimal.Decimal):
            return float(value)
    except ImportError:
        pass
    return value
