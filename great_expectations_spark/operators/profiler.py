"""Suite suggestion from data — the counterpart of the reference's
profilers (``rule_based_profiler`` domain builders + parameter estimators,
legacy ``BasicSuiteBuilderProfiler``), Spark-first: ONE bundled agg over
all columns gathers null rates, distinct estimates, min/max, value
lengths, means/stddevs, quantile sketches, and regex/datetime candidate
match rates; the resulting ExpectationSuite can be edited, versioned, and
self-validates green on the profiled data.

Domain builders (which columns get which expectation families) and
parameter estimators (bounds derived from observed stats, with slack so
approx sketches re-validate) mirror the reference's rule structure
(``rule_based_profiler/domain_builder``, ``parameter_builder``) without
its fixpoint machinery — everything resolves in one scan plus one tiny
follow-up for low-cardinality value sets.

Heuristics (deliberately simple and explainable):
  * null rate <= 1 - mostly_floor  -> expect_column_values_to_not_be_null
    with mostly = floor(observed completeness, 2dp)
  * string column with <= max_set_size distinct -> in_set (observed set)
  * string column fully matching a candidate pattern -> match_regex
    (most specific candidate wins); fully to_timestamp-parseable ->
    dateutil_parseable
  * string columns -> value_lengths between observed [min, max]
  * numeric column -> between [min, max], mean/stdev/quantiles within
    slack-widened observed bounds
  * approx-unique column -> proportion_of_unique_values floor
  * timestamp column -> between [min, max]
  * all columns -> expect_table_columns_to_match_set
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from great_expectations_spark.core.suite import ExpectationSuite

NUMERIC_TYPES = (
    T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

# candidate regexes, most specific first — suggested when every non-null
# value matches (counted JVM-side in the same bundled agg)
REGEX_CANDIDATES: List[Tuple[str, str]] = [
    (r"^\d{4}-\d{2}-\d{2}$", "iso_date"),
    (r"^[0-9]+$", "digits"),
    (r"^[a-z]+_[0-9]+$", "prefixed_id"),
    (r"^[A-Za-z]+$", "alpha"),
    (r"^[A-Za-z0-9_]+$", "word"),
    (r"^[A-Za-z0-9_\-]+$", "slug"),
]

PROFILE_QUANTILES = [0.25, 0.5, 0.75]
PROFILE_QUANTILE_BRACKET = 0.01


def _bracketed_probs() -> List[float]:
    probs: List[float] = []
    for p in PROFILE_QUANTILES:
        probs.append(max(p - PROFILE_QUANTILE_BRACKET, 0.0))
        probs.append(min(p + PROFILE_QUANTILE_BRACKET, 1.0))
    return probs


def suggest_suite(
    df: DataFrame,
    suite_name: str = "profiled",
    max_set_size: int = 50,
    mostly_floor: float = 0.9,
    columns: Optional[List[str]] = None,
    unique_floor: float = 0.95,
) -> ExpectationSuite:
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        dtype = fields[c]
        aggs.append(F.count(col).alias(f"nn__{c}"))
        aggs.append(F.approx_count_distinct(col, 0.05).alias(f"dc__{c}"))
        if isinstance(dtype, NUMERIC_TYPES + (T.TimestampType, T.DateType)):
            aggs.append(F.min(col).alias(f"mn__{c}"))
            aggs.append(F.max(col).alias(f"mx__{c}"))
        if isinstance(dtype, NUMERIC_TYPES):
            aggs.append(F.mean(col).alias(f"mean__{c}"))
            aggs.append(F.stddev_samp(col).alias(f"std__{c}"))
            # bracket each target quantile with the p±0.01 order statistics:
            # any re-validation sketch (including the expectation's exact
            # order-statistic default) lands inside the bracket as long as
            # its rank error < 0.01 — ours is 1e-4 at accuracy 10k
            aggs.append(
                F.percentile_approx(
                    col, _bracketed_probs(), 10_000
                ).alias(f"q__{c}")
            )
        if isinstance(dtype, T.StringType):
            aggs.append(F.min(F.length(col)).alias(f"lmn__{c}"))
            aggs.append(F.max(F.length(col)).alias(f"lmx__{c}"))
            # candidate-pattern + datetime-parseability match counters ride
            # the same single scan
            for i, (pattern, _) in enumerate(REGEX_CANDIDATES):
                aggs.append(
                    F.sum(
                        F.when(col.rlike(pattern), 1).otherwise(0)
                    ).alias(f"rx{i}__{c}")
                )
            aggs.append(
                F.count(F.try_to_timestamp(col)).alias(f"ts__{c}")
            )
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
        if nonnull > 0 and distinct / nonnull >= unique_floor:
            # approx_count_distinct rsd=0.05 — floor the bound by 2 rsd so
            # the exact re-validation stays green
            suite.add(
                "expect_column_proportion_of_unique_values_to_be_between",
                column=c,
                min_value=round(min(distinct / nonnull, 1.0) * 0.9, 2),
            )
        if (
            isinstance(dtype, T.StringType)
            and 0 < distinct <= max_set_size
            and nonnull > 0
        ):
            small_set_cols.append(c)
        if isinstance(dtype, T.StringType) and nonnull > 0:
            _suggest_string_shape(suite, row, c, nonnull)
        if isinstance(dtype, NUMERIC_TYPES) and row[f"mn__{c}"] is not None:
            _suggest_numeric_bounds(suite, row, c)
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


def _suggest_string_shape(
    suite: ExpectationSuite, row: Any, c: str, nonnull: int
) -> None:
    lmn, lmx = row[f"lmn__{c}"], row[f"lmx__{c}"]
    if lmn is not None:
        suite.add(
            "expect_column_value_lengths_to_be_between",
            column=c, min_value=int(lmn), max_value=int(lmx),
        )
    if int(row[f"ts__{c}"] or 0) == nonnull:
        # every value parses as a timestamp -> datetime-string column
        suite.add("expect_column_values_to_be_dateutil_parseable", column=c)
        return
    for i, (pattern, _) in enumerate(REGEX_CANDIDATES):
        if int(row[f"rx{i}__{c}"] or 0) == nonnull:
            suite.add(
                "expect_column_values_to_match_regex", column=c, regex=pattern
            )
            return  # most specific candidate only


def _suggest_numeric_bounds(
    suite: ExpectationSuite, row: Any, c: str
) -> None:
    mn, mx = _plain(row[f"mn__{c}"]), _plain(row[f"mx__{c}"])
    suite.add(
        "expect_column_values_to_be_between",
        column=c, min_value=mn, max_value=mx,
    )
    spread = float(mx) - float(mn)
    slack = max(spread * 0.05, 1e-9)
    mean = row[f"mean__{c}"]
    if mean is not None:
        suite.add(
            "expect_column_mean_to_be_between",
            column=c,
            min_value=float(mean) - slack,
            max_value=float(mean) + slack,
        )
    std = row[f"std__{c}"]
    if std is not None:
        suite.add(
            "expect_column_stdev_to_be_between",
            column=c,
            min_value=max(float(std) - slack, 0.0),
            max_value=float(std) + slack,
        )
    quants = row[f"q__{c}"]
    if quants is not None:
        eps = max(spread * 1e-6, 1e-9)
        ranges = [
            [float(quants[2 * i]) - eps, float(quants[2 * i + 1]) + eps]
            for i in range(len(PROFILE_QUANTILES))
        ]
        suite.add(
            "expect_column_quantile_values_to_be_between",
            column=c,
            quantile_ranges={
                "quantiles": list(PROFILE_QUANTILES),
                "value_ranges": ranges,
            },
        )


def _plain(value: Any) -> Any:
    try:
        import decimal

        if isinstance(value, decimal.Decimal):
            return float(value)
    except ImportError:
        pass
    return value


def suggest_drift_suite(
    df: DataFrame,
    baseline_condition: str,
    suite_name: str = "drift",
    columns: Optional[List[str]] = None,
    max_set_size: int = 50,
    ks_threshold: float = 0.2,
    psi_threshold: float = 0.25,
    chi2_p: float = 0.001,
    bins: int = 10,
) -> ExpectationSuite:
    """Suggest a two-sample drift suite for a table split by
    ``baseline_condition`` (e.g. ``"ts < timestamp '...'"``).

    Numeric columns get KS (quantile-binned from the baseline window) +
    PSI; low-cardinality string columns get a two-sample chi² homogeneity
    test.  One profiling agg classifies columns; one quantile pass per
    numeric column derives bin edges from the BASELINE side so the bins
    are meaningful for the comparison window too.
    """
    from great_expectations_spark.core.domain import parse_row_condition

    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    baseline = parse_row_condition(baseline_condition, "spark")
    base_df = df.filter(baseline)

    aggs = []
    numeric_cols, string_cols = [], []
    for c in cols:
        dtype = fields[c]
        if isinstance(dtype, NUMERIC_TYPES):
            numeric_cols.append(c)
            aggs.append(
                F.percentile_approx(
                    F.col(c),
                    [i / bins for i in range(1, bins)],
                    10_000,
                ).alias(f"q__{c}")
            )
        elif isinstance(dtype, T.StringType):
            string_cols.append(c)
            aggs.append(F.approx_count_distinct(F.col(c), 0.05).alias(f"dc__{c}"))
    if not aggs:
        return ExpectationSuite(suite_name)
    row = base_df.agg(*aggs).first()

    suite = ExpectationSuite(suite_name)
    for c in numeric_cols:
        quants = row[f"q__{c}"]
        if quants is None:
            continue
        edges = sorted(set(float(q) for q in quants))
        if len(edges) < 2:
            continue
        suite.add(
            "expect_column_two_sample_ks_to_be_less_than",
            column=c, baseline_condition=baseline_condition,
            threshold=ks_threshold, bins=edges,
        )
        suite.add(
            "expect_column_two_sample_psi_to_be_less_than",
            column=c, baseline_condition=baseline_condition,
            threshold=psi_threshold, bins=edges,
        )
    for c in string_cols:
        if 0 < int(row[f"dc__{c}"] or 0) <= max_set_size:
            suite.add(
                "expect_column_two_sample_chisquare_p_to_be_greater_than",
                column=c, baseline_condition=baseline_condition, p=chi2_p,
            )
    return suite
