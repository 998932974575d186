"""Rule-based profiler — the reference's configurable profiling engine
(``rule_based_profiler/rule_based_profiler.py``,
``rule_based_profiler/rule/rule.py``) rebuilt Spark-first.

A :class:`Rule` is (DomainBuilder, [ParameterBuilder], [Expectation
ConfigurationBuilder]) exactly as in the reference
(``rule/rule.py:45-86``): the domain builder decides WHERE expectations
apply (which columns / column pairs / the table), parameter builders
compute WHAT the data says (metric values, ranges across batches, value
sets, candidate regex / date formats), and configuration builders emit
``ExpectationConfiguration`` objects whose kwargs reference those
parameters through ``$parameter.<name>`` / ``$variables.<name>``
fully-qualified names (reference ``parameter_container.py``).

Execution model — the Spark-first difference
--------------------------------------------
The reference resolves each builder's metrics one validator call at a
time (its metric graph issues one compute per metric per batch).  Here
the profiler COMPILES the whole run first: every (rule x domain x
parameter-builder) metric request across every rule becomes one aggregate
expression, and each batch is scanned ONCE with a single bundled
``df.agg(...)`` — profiling B batches costs B jobs regardless of how many
rules/domains/parameters are configured (plus at most one tiny follow-up
job per batch for cardinality-capped value sets).  Domain builders that
need data (categorical cardinality, map-metric fractions) likewise share
one screening pass per batch-list.  At 10^12 rows the dominant cost is
the scan, so the job count — not the rule count — is what matters.

Multi-batch semantics: ``run(batches=[df_jan, df_feb, ...])`` computes
per-batch metric values; range estimators (exact / quantiles /
bootstrap, reference ``numeric_metric_range_multi_batch_parameter_
builder.py:89-107``) turn the per-batch series into [lower, upper]
bounds at a configured ``false_positive_rate``.  Vector metrics
(``column.quantile_values``) estimate element-wise ranges, feeding
``expect_column_quantile_values_to_be_between``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from great_expectations_spark.core.suite import (
    ExpectationConfiguration,
    ExpectationSuite,
)
from great_expectations_spark.operators.profiler import (
    NUMERIC_TYPES,
    REGEX_CANDIDATES,
)

VALUE_SET_CAP = 10_000  # guard: never collect unbounded distinct sets


# --------------------------------------------------------------------------
# Domains
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Domain:
    """A resolved rule domain (reference ``core/domain.py``): the table,
    a column, a column pair, or a multicolumn set."""

    domain_type: str  # "table" | "column" | "column_pair" | "multicolumn"
    domain_kwargs: Tuple[Tuple[str, Any], ...] = ()

    @property
    def kwargs(self) -> Dict[str, Any]:
        return {k: list(v) if isinstance(v, tuple) else v
                for k, v in self.domain_kwargs}

    @property
    def id(self) -> str:
        parts = [self.domain_type] + [
            f"{k}={v}" for k, v in self.domain_kwargs
        ]
        return "|".join(parts)

    @staticmethod
    def table() -> "Domain":
        return Domain("table")

    @staticmethod
    def column(name: str) -> "Domain":
        return Domain("column", (("column", name),))


def _semantic_type(dtype: T.DataType) -> str:
    if isinstance(dtype, NUMERIC_TYPES):
        return "numeric"
    if isinstance(dtype, T.StringType):
        return "text"
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        return "datetime"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.BinaryType):
        return "binary"
    return "other"


class DomainBuilder:
    """Base: subclasses yield Domains for a batch list.  ``screen_aggs``
    lets data-dependent builders ride the shared screening pass."""

    class_name = "DomainBuilder"

    def screen_aggs(self, df: DataFrame) -> Dict[str, Column]:
        return {}

    def get_domains(
        self, df: DataFrame, screen: Optional[Row]
    ) -> List[Domain]:  # pragma: no cover - abstract
        raise NotImplementedError

    def to_config(self) -> Dict[str, Any]:
        cfg = {"class_name": self.class_name}
        cfg.update(
            {
                k.lstrip("_"): v
                for k, v in self.__dict__.items()
                if v is not None
            }
        )
        return cfg


class TableDomainBuilder(DomainBuilder):
    """Reference ``domain_builder/table_domain_builder.py``."""

    class_name = "TableDomainBuilder"

    def get_domains(self, df, screen):
        return [Domain.table()]


class ColumnDomainBuilder(DomainBuilder):
    """Name/type-filtered column domains (reference
    ``domain_builder/column_domain_builder.py``: include/exclude names,
    suffixes, regex, semantic types)."""

    class_name = "ColumnDomainBuilder"

    def __init__(
        self,
        include_column_names: Optional[List[str]] = None,
        exclude_column_names: Optional[List[str]] = None,
        include_column_name_suffixes: Optional[List[str]] = None,
        exclude_column_name_suffixes: Optional[List[str]] = None,
        include_column_name_regexes: Optional[List[str]] = None,
        include_semantic_types: Optional[List[str]] = None,
        exclude_semantic_types: Optional[List[str]] = None,
    ) -> None:
        self.include_column_names = include_column_names
        self.exclude_column_names = exclude_column_names
        self.include_column_name_suffixes = include_column_name_suffixes
        self.exclude_column_name_suffixes = exclude_column_name_suffixes
        self.include_column_name_regexes = include_column_name_regexes
        self.include_semantic_types = include_semantic_types
        self.exclude_semantic_types = exclude_semantic_types

    def candidate_columns(self, df: DataFrame) -> List[str]:
        fields = {f.name: f.dataType for f in df.schema.fields}
        cols = list(
            self.include_column_names
            if self.include_column_names is not None
            else fields
        )
        cols = [c for c in cols if c in fields]
        if self.exclude_column_names:
            cols = [c for c in cols if c not in self.exclude_column_names]
        if self.include_column_name_suffixes:
            cols = [
                c
                for c in cols
                if any(
                    c.endswith(s) for s in self.include_column_name_suffixes
                )
            ]
        if self.exclude_column_name_suffixes:
            cols = [
                c
                for c in cols
                if not any(
                    c.endswith(s) for s in self.exclude_column_name_suffixes
                )
            ]
        if self.include_column_name_regexes:
            cols = [
                c
                for c in cols
                if any(
                    re.search(p, c)
                    for p in self.include_column_name_regexes
                )
            ]
        if self.include_semantic_types:
            cols = [
                c
                for c in cols
                if _semantic_type(fields[c]) in self.include_semantic_types
            ]
        if self.exclude_semantic_types:
            cols = [
                c
                for c in cols
                if _semantic_type(fields[c])
                not in self.exclude_semantic_types
            ]
        return cols

    def get_domains(self, df, screen):
        return [Domain.column(c) for c in self.candidate_columns(df)]


#: named cardinality modes, reference
#: ``helpers/cardinality_checker.py`` (CardinalityLimitMode)
CARDINALITY_MODES = {
    "one": 1,
    "two": 2,
    "very_few": 10,
    "few": 100,
    "some": 1_000,
    "many": 10_000,
}


class CategoricalColumnDomainBuilder(ColumnDomainBuilder):
    """Columns whose distinct count is under a cardinality limit
    (reference ``categorical_column_domain_builder.py``).  Cardinality is
    screened for ALL candidate columns in the one shared
    ``approx_count_distinct`` pass — no per-column jobs."""

    class_name = "CategoricalColumnDomainBuilder"

    def __init__(
        self,
        limit_mode: str = "few",
        max_unique_values: Optional[int] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.limit_mode = limit_mode
        self.max_unique_values = max_unique_values

    @property
    def _limit(self) -> int:
        if self.max_unique_values is not None:
            return int(self.max_unique_values)
        return CARDINALITY_MODES[self.limit_mode]

    def screen_aggs(self, df):
        return {
            f"card__{c}": F.approx_count_distinct(F.col(c), 0.02)
            for c in self.candidate_columns(df)
        }

    def get_domains(self, df, screen):
        # 2% rsd sketch: accept up to (1 + 2*rsd) * limit so borderline
        # categoricals aren't dropped by sketch noise; the value-set
        # builder's exact follow-up still caps the emitted set
        slack = 1.04
        return [
            Domain.column(c)
            for c in self.candidate_columns(df)
            if int(screen[f"card__{c}"] or 0) <= self._limit * slack
        ]


class MultiColumnDomainBuilder(ColumnDomainBuilder):
    """One multicolumn domain over the included names (reference
    ``multi_column_domain_builder.py``)."""

    class_name = "MultiColumnDomainBuilder"

    def get_domains(self, df, screen):
        cols = self.candidate_columns(df)
        if not cols:
            return []
        return [
            Domain(
                "multicolumn", (("column_list", tuple(cols)),)
            )
        ]


class ColumnPairDomainBuilder(ColumnDomainBuilder):
    """One ordered column-pair domain (reference
    ``column_pair_domain_builder.py`` requires exactly two names)."""

    class_name = "ColumnPairDomainBuilder"

    def get_domains(self, df, screen):
        cols = self.candidate_columns(df)
        if len(cols) != 2:
            raise ValueError(
                "ColumnPairDomainBuilder needs exactly 2 columns, got "
                f"{cols!r}"
            )
        return [
            Domain(
                "column_pair",
                (("column_A", cols[0]), ("column_B", cols[1])),
            )
        ]


class MapMetricColumnDomainBuilder(ColumnDomainBuilder):
    """Columns where a map condition holds on at least
    ``1 - max_unexpected_ratio`` of rows (reference
    ``map_metric_column_domain_builder.py``).  The per-column
    unexpected counters ride the shared screening pass."""

    class_name = "MapMetricColumnDomainBuilder"

    #: reference map-metric names -> our registered map expectations
    _METRIC_TO_EXPECTATION = {
        "column_values.nonnull": "expect_column_values_to_not_be_null",
        "column_values.null": "expect_column_values_to_be_null",
        "column_values.unique": None,  # window metric: not a row condition
    }

    def __init__(
        self,
        map_metric_name: str,
        max_unexpected_ratio: float = 0.0,
        metric_kwargs: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.map_metric_name = map_metric_name
        self.max_unexpected_ratio = max_unexpected_ratio
        self.metric_kwargs = metric_kwargs or {}

    def _compiled(self, column: str):
        from great_expectations_spark.operators.map_conditions import (
            MAP_COMPILERS,
        )

        exp = self._METRIC_TO_EXPECTATION.get(
            self.map_metric_name, self.map_metric_name
        )
        if exp is None or exp not in MAP_COMPILERS:
            raise ValueError(
                f"map metric {self.map_metric_name!r} has no row-condition "
                "compiler"
            )
        return MAP_COMPILERS[exp](dict(self.metric_kwargs, column=column))

    def screen_aggs(self, df):
        aggs: Dict[str, Column] = {}
        for c in self.candidate_columns(df):
            cm = self._compiled(c)
            aggs[f"mmu__{self.map_metric_name}__{c}"] = F.sum(
                F.when(cm.considered & cm.unexpected, 1).otherwise(0)
            )
            aggs[f"mmc__{self.map_metric_name}__{c}"] = F.sum(
                F.when(cm.considered, 1).otherwise(0)
            )
        return aggs

    def get_domains(self, df, screen):
        out = []
        for c in self.candidate_columns(df):
            unexpected = int(
                screen[f"mmu__{self.map_metric_name}__{c}"] or 0
            )
            considered = int(
                screen[f"mmc__{self.map_metric_name}__{c}"] or 0
            )
            if considered == 0:
                continue
            if unexpected / considered <= self.max_unexpected_ratio:
                out.append(Domain.column(c))
        return out


# --------------------------------------------------------------------------
# Metric registry: metric_name -> bundled aggregate expression
# --------------------------------------------------------------------------

QUANTILE_ACCURACY = 10_000


def _metric_aggs(
    metric_name: str,
    domain: Domain,
    value_kwargs: Dict[str, Any],
) -> Dict[str, Column]:
    """One or more aggregate Columns computing ``metric_name`` for
    ``domain`` — all evaluated inside the single bundled per-batch agg.
    Metric names follow the reference's registry
    (``expectations/metrics/``)."""

    col_name = domain.kwargs.get("column")
    col = F.col(col_name) if col_name else None
    m = metric_name
    if m == "table.row_count":
        return {"v": F.count(F.lit(1))}
    if col is None:
        raise ValueError(f"metric {m!r} needs a column domain")
    if m == "column.min":
        return {"v": F.min(col)}
    if m == "column.max":
        return {"v": F.max(col)}
    if m == "column.mean":
        return {"v": F.mean(col)}
    if m == "column.sum":
        return {"v": F.sum(col)}
    if m == "column.median":
        return {
            "v": F.percentile_approx(col, 0.5, QUANTILE_ACCURACY)
        }
    if m == "column.standard_deviation":
        return {"v": F.stddev_samp(col)}
    if m == "column.quantile_values":
        quantiles = list(value_kwargs.get("quantiles", [0.25, 0.5, 0.75]))
        return {
            "v": F.percentile_approx(
                col, quantiles, QUANTILE_ACCURACY
            )
        }
    if m == "column.distinct_values.count":
        if value_kwargs.get("exact"):
            return {"v": F.countDistinct(col)}
        return {"v": F.approx_count_distinct(col, 0.02)}
    if m == "column.distinct_values":
        # bounded: collect one extra element so overflow is detectable
        cap = int(value_kwargs.get("cap", VALUE_SET_CAP))
        return {
            "v": F.slice(F.collect_set(col), 1, cap + 1),
            "n": F.approx_count_distinct(col, 0.02),
        }
    if m == "column_values.null.count":
        return {"v": F.sum(F.when(col.isNull(), 1).otherwise(0))}
    if m == "column_values.nonnull.count":
        return {"v": F.count(col)}
    if m == "column.value_lengths.min":
        return {"v": F.min(F.length(col))}
    if m == "column.value_lengths.max":
        return {"v": F.max(F.length(col))}
    if m == "column.unique_proportion":
        return {
            "v": F.approx_count_distinct(col, 0.02)
            / F.greatest(F.count(col), F.lit(1))
        }
    raise ValueError(f"unknown metric {metric_name!r}")


def _metric_finish(metric_name, value_kwargs, got: Dict[str, Any]) -> Any:
    if metric_name == "column.distinct_values":
        cap = int(value_kwargs.get("cap", VALUE_SET_CAP))
        vals = got["v"] or []
        if len(vals) > cap:
            raise ValueError(
                f"column.distinct_values overflowed cap={cap} "
                f"(approx distinct {got['n']}); raise cap or use "
                "CategoricalColumnDomainBuilder to pre-screen"
            )
        return sorted(vals)
    v = got["v"]
    if isinstance(v, list):
        return list(v)
    return v


# --------------------------------------------------------------------------
# Parameter builders
# --------------------------------------------------------------------------


class ParameterBuilder:
    """Base.  ``aggs(domain, df)`` contributes bundled aggregate columns
    per batch; ``finish(domain, per_batch)`` turns the per-batch values
    into the parameter payload ``{"value": ..., "details": {...}}``."""

    class_name = "ParameterBuilder"

    def __init__(self, name: str) -> None:
        self.name = name

    def aggs(
        self, domain: Domain, df: DataFrame
    ) -> Dict[str, Column]:  # pragma: no cover - abstract
        raise NotImplementedError

    def finish(
        self, domain: Domain, per_batch: List[Dict[str, Any]]
    ) -> Dict[str, Any]:  # pragma: no cover - abstract
        raise NotImplementedError

    def to_config(self) -> Dict[str, Any]:
        cfg = {"class_name": self.class_name}
        cfg.update(
            {k: v for k, v in self.__dict__.items() if v is not None}
        )
        return cfg


class MetricParameterBuilder(ParameterBuilder):
    """Single/multi-batch raw metric value (reference
    ``metric_single_batch_parameter_builder.py`` /
    ``metric_multi_batch_parameter_builder.py``).  ``value`` is the last
    batch's metric; ``details.batch_values`` carries the series."""

    class_name = "MetricParameterBuilder"

    def __init__(
        self,
        name: str,
        metric_name: str,
        metric_value_kwargs: Optional[Dict[str, Any]] = None,
    ) -> None:
        super().__init__(name)
        self.metric_name = metric_name
        self.metric_value_kwargs = metric_value_kwargs or {}

    def aggs(self, domain, df):
        return _metric_aggs(
            self.metric_name, domain, self.metric_value_kwargs
        )

    def finish(self, domain, per_batch):
        values = [
            _metric_finish(self.metric_name, self.metric_value_kwargs, got)
            for got in per_batch
        ]
        return {
            "value": values[-1],
            "details": {"batch_values": values},
        }


class ValueSetParameterBuilder(ParameterBuilder):
    """Union of observed distinct values across batches (reference
    ``value_set_multi_batch_parameter_builder.py``), cap-guarded."""

    class_name = "ValueSetParameterBuilder"

    def __init__(self, name: str, cap: int = VALUE_SET_CAP) -> None:
        super().__init__(name)
        self.cap = cap

    def aggs(self, domain, df):
        return _metric_aggs(
            "column.distinct_values", domain, {"cap": self.cap}
        )

    def finish(self, domain, per_batch):
        union: set = set()
        for got in per_batch:
            union.update(
                _metric_finish(
                    "column.distinct_values", {"cap": self.cap}, got
                )
            )
        return {
            "value": sorted(union),
            "details": {"parse_strings_as_datetimes": False},
        }


class NumericMetricRangeParameterBuilder(ParameterBuilder):
    """[lower, upper] bounds for a numeric metric across batches at a
    false-positive tolerance (reference
    ``numeric_metric_range_multi_batch_parameter_builder.py:89-107``).

    Estimators:
      * ``exact``     -> [min, max] of the per-batch series
      * ``quantiles`` -> empirical quantiles at [fpr/2, 1 - fpr/2]
      * ``bootstrap`` -> mean over resamples of those quantiles
        (deterministic seed; SciPy-free numpy implementation)
    Vector metrics (column.quantile_values) estimate element-wise and
    produce a list of [lower, upper] pairs (-> quantile_ranges)."""

    class_name = "NumericMetricRangeParameterBuilder"

    def __init__(
        self,
        name: str,
        metric_name: str,
        metric_value_kwargs: Optional[Dict[str, Any]] = None,
        false_positive_rate: float = 0.05,
        estimator: str = "bootstrap",
        n_resamples: int = 999,
        random_seed: int = 42,
        round_decimals: Optional[int] = None,
    ) -> None:
        super().__init__(name)
        self.metric_name = metric_name
        self.metric_value_kwargs = metric_value_kwargs or {}
        self.false_positive_rate = false_positive_rate
        self.estimator = estimator
        self.n_resamples = n_resamples
        self.random_seed = random_seed
        self.round_decimals = round_decimals

    def aggs(self, domain, df):
        return _metric_aggs(
            self.metric_name, domain, self.metric_value_kwargs
        )

    def _range(self, series: np.ndarray) -> List[float]:
        fpr = self.false_positive_rate
        if self.estimator == "exact":
            lo, hi = float(np.min(series)), float(np.max(series))
        elif self.estimator == "quantiles":
            lo = float(np.quantile(series, fpr / 2))
            hi = float(np.quantile(series, 1 - fpr / 2))
        elif self.estimator == "bootstrap":
            rng = np.random.default_rng(self.random_seed)
            idx = rng.integers(
                0, len(series), size=(self.n_resamples, len(series))
            )
            samples = series[idx]
            lo = float(
                np.mean(np.quantile(samples, fpr / 2, axis=1))
            )
            hi = float(
                np.mean(np.quantile(samples, 1 - fpr / 2, axis=1))
            )
        else:
            raise ValueError(f"unknown estimator {self.estimator!r}")
        # equal-bound ranges (identical batch distributions) must survive
        # re-validation: partial-agg order is not fp-associative, so the
        # recomputed metric can differ from the profiled one in the last
        # ulps — widen by a relative epsilon far below data significance
        eps = 1e-9 * max(abs(lo), abs(hi), 1.0)
        lo, hi = lo - eps, hi + eps
        if self.round_decimals is not None:
            lo = round(lo, self.round_decimals)
            hi = round(hi, self.round_decimals)
            if self.round_decimals == 0:
                lo, hi = int(lo), int(hi)
        return [lo, hi]

    def finish(self, domain, per_batch):
        all_values = [
            _metric_finish(self.metric_name, self.metric_value_kwargs, got)
            for got in per_batch
        ]
        # an empty batch (or all-null column) yields a null metric: it
        # contributes no evidence, so drop it from the estimation series
        values = [v for v in all_values if v is not None]
        if not values:
            return {"value": None, "details": {"batch_values": all_values}}
        if isinstance(values[0], list):  # vector metric: element-wise
            arr = np.asarray(values, dtype=float)  # (batches, k)
            value: Any = [
                self._range(arr[:, j]) for j in range(arr.shape[1])
            ]
        else:
            value = self._range(np.asarray(values, dtype=float))
        return {
            "value": value,
            "details": {
                "batch_values": all_values,
                "estimator": self.estimator,
                "false_positive_rate": self.false_positive_rate,
            },
        }


#: strftime candidates -> Spark datetime patterns (JVM `try_to_timestamp`
#: counts matches inside the bundled agg; reference
#: ``simple_date_format_string_parameter_builder.py`` tries strptime
#: per-row in Python)
DATE_FORMAT_CANDIDATES: List[Tuple[str, str]] = [
    ("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss"),
    ("%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss"),
    ("%Y-%m-%d", "yyyy-MM-dd"),
    ("%Y/%m/%d", "yyyy/MM/dd"),
    ("%m/%d/%Y", "MM/dd/yyyy"),
    ("%d/%m/%Y", "dd/MM/yyyy"),
    ("%Y%m%d", "yyyyMMdd"),
    ("%d-%b-%Y", "dd-MMM-yyyy"),
]


class SimpleDateFormatStringParameterBuilder(ParameterBuilder):
    """Best-matching strftime format for a string column (reference
    ``simple_date_format_string_parameter_builder.py``): the candidate
    with the highest nonnull match ratio >= threshold wins."""

    class_name = "SimpleDateFormatStringParameterBuilder"

    def __init__(
        self,
        name: str,
        threshold: float = 0.9,
        candidate_strings: Optional[List[str]] = None,
    ) -> None:
        super().__init__(name)
        self.threshold = threshold
        self.candidate_strings = candidate_strings

    def _candidates(self) -> List[Tuple[str, str]]:
        if self.candidate_strings is None:
            return DATE_FORMAT_CANDIDATES
        by_strftime = dict(DATE_FORMAT_CANDIDATES)
        out = []
        for s in self.candidate_strings:
            if s not in by_strftime:
                raise ValueError(
                    f"no Spark pattern known for strftime {s!r}"
                )
            out.append((s, by_strftime[s]))
        return out

    def aggs(self, domain, df):
        col = F.col(domain.kwargs["column"])
        aggs = {"nn": F.count(col)}
        for i, (_, spark_fmt) in enumerate(self._candidates()):
            aggs[f"m{i}"] = F.count(
                F.try_to_timestamp(col, F.lit(spark_fmt))
            )
        return aggs

    def finish(self, domain, per_batch):
        cands = self._candidates()
        nn = sum(int(g["nn"] or 0) for g in per_batch)
        ratios = {}
        best, best_ratio = None, -1.0
        for i, (strftime_fmt, _) in enumerate(cands):
            matched = sum(int(g[f"m{i}"] or 0) for g in per_batch)
            ratio = matched / nn if nn else 0.0
            ratios[strftime_fmt] = round(ratio, 4)
            if ratio > best_ratio:
                best, best_ratio = strftime_fmt, ratio
        value = best if best_ratio >= self.threshold else None
        return {
            "value": value,
            "details": {"success_ratio": ratios, "threshold": self.threshold},
        }


class RegexPatternStringParameterBuilder(ParameterBuilder):
    """Best-matching candidate regex for a string column (reference
    ``regex_pattern_string_parameter_builder.py``); most specific
    (earliest-listed) candidate clearing the threshold wins."""

    class_name = "RegexPatternStringParameterBuilder"

    def __init__(
        self,
        name: str,
        threshold: float = 0.9,
        candidate_regexes: Optional[List[str]] = None,
    ) -> None:
        super().__init__(name)
        self.threshold = threshold
        self.candidate_regexes = candidate_regexes

    def _candidates(self) -> List[str]:
        if self.candidate_regexes is not None:
            return list(self.candidate_regexes)
        return [p for p, _ in REGEX_CANDIDATES]

    def aggs(self, domain, df):
        col = F.col(domain.kwargs["column"])
        aggs = {"nn": F.count(col)}
        for i, pattern in enumerate(self._candidates()):
            aggs[f"m{i}"] = F.sum(
                F.when(col.rlike(pattern), 1).otherwise(0)
            )
        return aggs

    def finish(self, domain, per_batch):
        cands = self._candidates()
        nn = sum(int(g["nn"] or 0) for g in per_batch)
        ratios = {}
        value = None
        for i, pattern in enumerate(cands):
            matched = sum(int(g[f"m{i}"] or 0) for g in per_batch)
            ratio = matched / nn if nn else 0.0
            ratios[pattern] = round(ratio, 4)
            if value is None and ratio >= self.threshold:
                value = pattern
        return {
            "value": value,
            "details": {"success_ratio": ratios, "threshold": self.threshold},
        }


# --------------------------------------------------------------------------
# $parameter / $variables resolution + configuration builder
# --------------------------------------------------------------------------

_REF_RE = re.compile(
    r"^\$(?P<root>variables|parameter|domain)\.(?P<path>[A-Za-z0-9_.\[\]]+)$"
)


class NullParameterPath(LookupError):
    """Raised when a reference navigates INTO a null parameter value
    (e.g. ``$parameter.range.value[0]`` when the range could not be
    estimated — empty batches, all-null column).  Configuration builders
    treat it as "nothing to assert": the expectation is skipped.  Unknown
    parameter NAMES still raise KeyError — a config typo must fail loud."""


def resolve_reference(
    token: Any,
    variables: Dict[str, Any],
    parameters: Dict[str, Dict[str, Any]],
    domain: Domain,
) -> Any:
    """Resolve one ``$variables.x`` / ``$parameter.name[.value][idx]`` /
    ``$domain.domain_kwargs.column`` token (reference fully-qualified
    parameter names, ``parameter_container.py``)."""
    if not isinstance(token, str):
        return token
    m = _REF_RE.match(token)
    if not m:
        return token
    root, path = m.group("root"), m.group("path")
    # "name[0][1]" -> ["name", 0, 1]; "a.b[2]" -> ["a", "b", 2]
    segments: List[Any] = []
    for seg in path.split("."):
        name_part = seg.split("[", 1)[0]
        if name_part:
            segments.append(name_part)
        segments.extend(int(i) for i in re.findall(r"\[(\d+)\]", seg))

    if root == "variables":
        cur: Any = variables
    elif root == "domain":
        cur = {"domain_kwargs": domain.kwargs, "domain_type": domain.domain_type}
    else:
        name = segments.pop(0)
        if name not in parameters:
            raise KeyError(
                f"unknown parameter {name!r} (have {sorted(parameters)})"
            )
        cur = parameters[name]
        if not segments:
            segments = ["value"]  # bare $parameter.name means its value
    for seg in segments:
        if cur is None:
            raise NullParameterPath(token)
        if isinstance(seg, int):
            cur = cur[seg]
        elif isinstance(cur, dict):
            cur = cur[seg]
        else:
            raise KeyError(f"cannot resolve segment {seg!r} in {token!r}")
    if root == "parameter" and cur is None:
        # a parameter VALUE of None means the estimator had nothing to
        # estimate (empty batch, all-null column) — same "nothing to
        # assert" semantics as navigating into a null, so the
        # configuration builder skips this expectation instead of
        # emitting a vacuous config (e.g. value_ranges=None)
        raise NullParameterPath(token)
    return cur


def _resolve_tree(value, variables, parameters, domain):
    if isinstance(value, str):
        return resolve_reference(value, variables, parameters, domain)
    if isinstance(value, list):
        return [
            _resolve_tree(v, variables, parameters, domain) for v in value
        ]
    if isinstance(value, dict):
        return {
            k: _resolve_tree(v, variables, parameters, domain)
            for k, v in value.items()
        }
    return value


_CONDITION_RE = re.compile(
    r"^\s*(?P<left>\S+)\s*(?P<op>>=|<=|==|!=|>|<)\s*(?P<right>.+?)\s*$"
)
_OPS: Dict[str, Callable[[Any, Any], bool]] = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


class DefaultExpectationConfigurationBuilder:
    """Emit one ExpectationConfiguration per domain, substituting
    ``$parameter`` / ``$variables`` / ``$domain`` references in kwargs
    (reference ``default_expectation_configuration_builder.py``).

    ``condition``: optional gate — a callable(resolved_kwargs, params) or
    a string ``"$ref <op> literal"`` parsed without eval (reference
    conditions are full boolean DSL; the comparison form covers the
    common "only emit when the parameter is meaningful" use)."""

    class_name = "DefaultExpectationConfigurationBuilder"

    def __init__(
        self,
        expectation_type: str,
        condition: Any = None,
        meta: Optional[Dict[str, Any]] = None,
        **kwargs: Any,
    ) -> None:
        self.expectation_type = expectation_type
        self.condition = condition
        self.meta = meta or {}
        self.kwargs = kwargs

    def _condition_holds(self, variables, parameters, domain) -> bool:
        if self.condition is None:
            return True
        if callable(self.condition):
            resolved = _resolve_tree(
                self.kwargs, variables, parameters, domain
            )
            return bool(self.condition(resolved, parameters))
        m = _CONDITION_RE.match(str(self.condition))
        if not m:
            raise ValueError(
                f"unparseable condition {self.condition!r}"
            )
        left = resolve_reference(
            m.group("left"), variables, parameters, domain
        )
        right_txt = m.group("right")
        right: Any
        if _REF_RE.match(right_txt):
            right = resolve_reference(
                right_txt, variables, parameters, domain
            )
        elif right_txt in ("None", "null"):
            right = None
        elif right_txt in ("True", "False"):
            right = right_txt == "True"
        else:
            try:
                right = int(right_txt)
            except ValueError:
                try:
                    right = float(right_txt)
                except ValueError:
                    right = right_txt.strip("'\"")
        op = m.group("op")
        if right is None:
            if op == "==":
                return left is None
            if op == "!=":
                return left is not None
            raise ValueError(f"cannot order-compare with None: {self.condition!r}")
        if left is None:
            return False
        return _OPS[op](left, right)

    def build(
        self,
        domain: Domain,
        variables: Dict[str, Any],
        parameters: Dict[str, Dict[str, Any]],
    ) -> Optional[ExpectationConfiguration]:
        try:
            if not self._condition_holds(variables, parameters, domain):
                return None
            resolved = _resolve_tree(
                self.kwargs, variables, parameters, domain
            )
        except NullParameterPath:
            # a referenced parameter value is null (empty batch, all-null
            # column): nothing to assert — skip this expectation, exactly
            # like a failed condition
            return None
        kwargs = dict(domain.kwargs)
        kwargs.update(resolved)
        meta = dict(self.meta)
        meta.setdefault("profiler_details", {})
        for pname, payload in parameters.items():
            if any(
                isinstance(v, str) and f"$parameter.{pname}" in v
                for v in _iter_strings(self.kwargs)
            ):
                meta["profiler_details"][pname] = payload.get("details", {})
        return ExpectationConfiguration(
            expectation_type=self.expectation_type,
            kwargs=kwargs,
            meta=meta,
        )

    def to_config(self) -> Dict[str, Any]:
        cfg = {
            "class_name": self.class_name,
            "expectation_type": self.expectation_type,
        }
        if self.condition is not None and not callable(self.condition):
            cfg["condition"] = self.condition
        if self.meta:
            cfg["meta"] = self.meta
        cfg.update(self.kwargs)
        return cfg


def _iter_strings(value):
    if isinstance(value, str):
        yield value
    elif isinstance(value, list):
        for v in value:
            yield from _iter_strings(v)
    elif isinstance(value, dict):
        for v in value.values():
            yield from _iter_strings(v)


# --------------------------------------------------------------------------
# Rule + profiler
# --------------------------------------------------------------------------


@dataclass
class Rule:
    """(reference ``rule/rule.py:45``) — name + builders + rule-local
    variables (merged over profiler variables at run time)."""

    name: str
    domain_builder: DomainBuilder
    parameter_builders: List[ParameterBuilder] = field(default_factory=list)
    expectation_configuration_builders: List[
        DefaultExpectationConfigurationBuilder
    ] = field(default_factory=list)
    variables: Dict[str, Any] = field(default_factory=dict)


@dataclass
class RuleBasedProfilerResult:
    """(reference ``rule_based_profiler_result.py``)"""

    suite: ExpectationSuite
    parameters_by_domain: Dict[str, Dict[str, Any]]
    rule_domains: Dict[str, List[str]]
    # per-rule attribution of generated configs (feeds the data-assistant
    # result layer's per-rule summary; reference DataAssistantResult)
    expectations_by_rule: Dict[str, List[Any]] = field(default_factory=dict)

    def get_expectation_suite(self) -> ExpectationSuite:
        return self.suite


class RuleBasedProfiler:
    """(reference ``rule_based_profiler.py:93,1493``) — run configured
    rules over a batch list, producing an ExpectationSuite.

    Spark execution: ONE screening agg on the last batch resolves all
    data-dependent domains, then ONE bundled agg per batch computes every
    parameter metric for every rule — job count is O(batches), not
    O(rules x domains x parameters)."""

    def __init__(
        self,
        name: str,
        config_version: float = 1.0,
        variables: Optional[Dict[str, Any]] = None,
        rules: Optional[List[Rule]] = None,
    ) -> None:
        self.name = name
        self.config_version = config_version
        self.variables = variables or {}
        self.rules = rules or []

    def add_rule(self, rule: Rule) -> "RuleBasedProfiler":
        self.rules.append(rule)
        return self

    # -- execution ---------------------------------------------------------

    def run(
        self,
        batches: Sequence[DataFrame],
        suite_name: Optional[str] = None,
    ) -> RuleBasedProfilerResult:
        if isinstance(batches, DataFrame):
            batches = [batches]
        batches = list(batches)
        if not batches:
            raise ValueError("need at least one batch")
        reference_df = batches[-1]  # domains resolve on the latest batch

        # 1. shared screening pass (categorical cardinality, map-metric
        #    ratios) — one job total
        screen_aggs: Dict[str, Column] = {}
        for rule in self.rules:
            screen_aggs.update(
                rule.domain_builder.screen_aggs(reference_df)
            )
        screen = (
            reference_df.agg(
                *[c.alias(k) for k, c in screen_aggs.items()]
            ).first()
            if screen_aggs
            else None
        )

        # 2. resolve domains per rule
        domains_by_rule: Dict[str, List[Domain]] = {}
        for rule in self.rules:
            domains_by_rule[rule.name] = rule.domain_builder.get_domains(
                reference_df, screen
            )

        # 3. compile every parameter metric into one agg per batch
        requests: List[Tuple[str, Domain, ParameterBuilder, Dict[str, str]]] = []
        bundled: Dict[str, Column] = {}
        for rule in self.rules:
            for domain in domains_by_rule[rule.name]:
                for pb in rule.parameter_builders:
                    keymap: Dict[str, str] = {}
                    for sub, col in pb.aggs(domain, reference_df).items():
                        key = (
                            f"r{len(requests)}__{sub}"
                        )
                        bundled[key] = col
                        keymap[sub] = key
                    requests.append((rule.name, domain, pb, keymap))

        per_batch_rows: List[Row] = []
        if bundled:
            for df in batches:
                per_batch_rows.append(
                    df.agg(
                        *[c.alias(k) for k, c in bundled.items()]
                    ).first()
                )

        # 4. finish parameters per (rule, domain)
        params_by_rule_domain: Dict[Tuple[str, str], Dict[str, Dict]] = {}
        for rule_name, domain, pb, keymap in requests:
            series = [
                {sub: row[key] for sub, key in keymap.items()}
                for row in per_batch_rows
            ]
            payload = pb.finish(domain, series)
            params_by_rule_domain.setdefault(
                (rule_name, domain.id), {}
            )[pb.name] = payload

        # 5. build expectation configurations
        suite = ExpectationSuite(suite_name or f"{self.name}_suite")
        parameters_by_domain: Dict[str, Dict[str, Any]] = {}
        expectations_by_rule: Dict[str, List[Any]] = {}
        for rule in self.rules:
            merged_vars = {**self.variables, **rule.variables}
            for domain in domains_by_rule[rule.name]:
                params = params_by_rule_domain.get(
                    (rule.name, domain.id), {}
                )
                parameters_by_domain.setdefault(domain.id, {}).update(
                    {
                        f"$parameter.{k}": v["value"]
                        for k, v in params.items()
                    }
                )
                for ecb in rule.expectation_configuration_builders:
                    try:
                        cfg = ecb.build(domain, merged_vars, params)
                    except NullParameterPath:
                        # a reference navigated into a null parameter value
                        # (empty batch / all-null column): nothing to
                        # assert for THIS expectation on THIS domain —
                        # skip it, keep the rest of the run
                        continue
                    if cfg is not None:
                        suite.expectations.append(cfg)
                        expectations_by_rule.setdefault(
                            rule.name, []
                        ).append(cfg)
        return RuleBasedProfilerResult(
            suite=suite,
            parameters_by_domain=parameters_by_domain,
            rule_domains={
                r: [d.id for d in ds] for r, ds in domains_by_rule.items()
            },
            expectations_by_rule=expectations_by_rule,
        )

    # -- declarative config (reference YAML-config style) ------------------

    _DOMAIN_BUILDERS = {
        c.class_name: c
        for c in (
            TableDomainBuilder,
            ColumnDomainBuilder,
            CategoricalColumnDomainBuilder,
            MultiColumnDomainBuilder,
            ColumnPairDomainBuilder,
            MapMetricColumnDomainBuilder,
        )
    }
    _PARAMETER_BUILDERS = {
        c.class_name: c
        for c in (
            MetricParameterBuilder,
            ValueSetParameterBuilder,
            NumericMetricRangeParameterBuilder,
            SimpleDateFormatStringParameterBuilder,
            RegexPatternStringParameterBuilder,
        )
    }

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "RuleBasedProfiler":
        """Instantiate from a config dict mirroring the reference's
        profiler YAML (``rule_based_profiler/config/base.py``):
        ``{"name", "config_version", "variables", "rules": {rule_name:
        {"domain_builder": {...}, "parameter_builders": [...],
        "expectation_configuration_builders": [...]}}}``."""
        rules = []
        for rule_name, rc in (config.get("rules") or {}).items():
            db_cfg = dict(rc["domain_builder"])
            db_cls = cls._DOMAIN_BUILDERS[db_cfg.pop("class_name")]
            pb_list = []
            for pc in rc.get("parameter_builders", []):
                pc = dict(pc)
                pb_cls = cls._PARAMETER_BUILDERS[pc.pop("class_name")]
                pb_list.append(pb_cls(**pc))
            ecb_list = []
            for ec in rc.get("expectation_configuration_builders", []):
                ec = dict(ec)
                ec.pop("class_name", None)
                etype = ec.pop("expectation_type")
                ecb_list.append(
                    DefaultExpectationConfigurationBuilder(etype, **ec)
                )
            rules.append(
                Rule(
                    name=rule_name,
                    domain_builder=db_cls(**db_cfg),
                    parameter_builders=pb_list,
                    expectation_configuration_builders=ecb_list,
                    variables=rc.get("variables", {}),
                )
            )
        return cls(
            name=config["name"],
            config_version=float(config.get("config_version", 1.0)),
            variables=config.get("variables", {}),
            rules=rules,
        )

    def to_config(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "config_version": self.config_version,
            "variables": self.variables,
            "rules": {
                r.name: {
                    "domain_builder": r.domain_builder.to_config(),
                    "parameter_builders": [
                        pb.to_config() for pb in r.parameter_builders
                    ],
                    "expectation_configuration_builders": [
                        ecb.to_config()
                        for ecb in r.expectation_configuration_builders
                    ],
                    **({"variables": r.variables} if r.variables else {}),
                }
                for r in self.rules
            },
        }


# --------------------------------------------------------------------------
# Onboarding assistant: default rule pack (reference
# ``experimental/rule_based_profiler/data_assistant/onboarding_data_
# assistant.py`` — the curated rules, without the altair plotting)
# --------------------------------------------------------------------------


def onboarding_assistant(
    false_positive_rate: float = 0.05,
    estimator: str = "bootstrap",
    max_value_set_cardinality: int = 100,
) -> RuleBasedProfiler:
    """The reference OnboardingDataAssistant's rule pack as an explicit,
    editable RuleBasedProfiler: table row-count range, per-numeric-column
    min/max/mean/median/stdev + quantile ranges, categorical value sets,
    text date-format detection, and nullity."""
    p = RuleBasedProfiler(
        "onboarding_assistant",
        variables={
            "false_positive_rate": false_positive_rate,
            "estimator": estimator,
        },
    )
    p.add_rule(
        Rule(
            name="table_rule",
            domain_builder=TableDomainBuilder(),
            parameter_builders=[
                NumericMetricRangeParameterBuilder(
                    "row_count_range",
                    "table.row_count",
                    false_positive_rate=false_positive_rate,
                    estimator=estimator,
                    round_decimals=0,
                )
            ],
            expectation_configuration_builders=[
                DefaultExpectationConfigurationBuilder(
                    "expect_table_row_count_to_be_between",
                    min_value="$parameter.row_count_range.value[0]",
                    max_value="$parameter.row_count_range.value[1]",
                )
            ],
        )
    )
    numeric_db = ColumnDomainBuilder(include_semantic_types=["numeric"])
    p.add_rule(
        Rule(
            name="numeric_rule",
            domain_builder=numeric_db,
            parameter_builders=[
                NumericMetricRangeParameterBuilder(
                    "min_range", "column.min",
                    false_positive_rate=false_positive_rate,
                    estimator=estimator,
                ),
                NumericMetricRangeParameterBuilder(
                    "max_range", "column.max",
                    false_positive_rate=false_positive_rate,
                    estimator=estimator,
                ),
                NumericMetricRangeParameterBuilder(
                    "mean_range", "column.mean",
                    false_positive_rate=false_positive_rate,
                    estimator=estimator,
                ),
                NumericMetricRangeParameterBuilder(
                    "median_range", "column.median",
                    false_positive_rate=false_positive_rate,
                    estimator=estimator,
                ),
                NumericMetricRangeParameterBuilder(
                    "stdev_range", "column.standard_deviation",
                    false_positive_rate=false_positive_rate,
                    estimator=estimator,
                ),
                NumericMetricRangeParameterBuilder(
                    "quantile_ranges", "column.quantile_values",
                    metric_value_kwargs={
                        "quantiles": [0.25, 0.5, 0.75]
                    },
                    false_positive_rate=false_positive_rate,
                    estimator=estimator,
                ),
            ],
            expectation_configuration_builders=[
                DefaultExpectationConfigurationBuilder(
                    "expect_column_min_to_be_between",
                    min_value="$parameter.min_range.value[0]",
                    max_value="$parameter.min_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_max_to_be_between",
                    min_value="$parameter.max_range.value[0]",
                    max_value="$parameter.max_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_mean_to_be_between",
                    min_value="$parameter.mean_range.value[0]",
                    max_value="$parameter.mean_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_median_to_be_between",
                    min_value="$parameter.median_range.value[0]",
                    max_value="$parameter.median_range.value[1]",
                    # the profiled metric is the percentile_approx order
                    # statistic; exact interpolated median can differ by
                    # half a step on even counts
                    approximate=True,
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_stdev_to_be_between",
                    min_value="$parameter.stdev_range.value[0]",
                    max_value="$parameter.stdev_range.value[1]",
                ),
                DefaultExpectationConfigurationBuilder(
                    "expect_column_quantile_values_to_be_between",
                    quantile_ranges={
                        "quantiles": [0.25, 0.5, 0.75],
                        "value_ranges": "$parameter.quantile_ranges.value",
                    },
                    # accuracy 1/1e-4 = QUANTILE_ACCURACY: validation's
                    # sketch == the profiled sketch
                    allow_relative_error=1e-4,
                ),
            ],
        )
    )
    p.add_rule(
        Rule(
            name="categorical_rule",
            domain_builder=CategoricalColumnDomainBuilder(
                max_unique_values=max_value_set_cardinality,
                include_semantic_types=["text", "boolean"],
            ),
            parameter_builders=[
                ValueSetParameterBuilder("value_set")
            ],
            expectation_configuration_builders=[
                DefaultExpectationConfigurationBuilder(
                    "expect_column_values_to_be_in_set",
                    value_set="$parameter.value_set.value",
                )
            ],
        )
    )
    p.add_rule(
        Rule(
            name="datetime_text_rule",
            domain_builder=ColumnDomainBuilder(
                include_semantic_types=["text"]
            ),
            parameter_builders=[
                SimpleDateFormatStringParameterBuilder(
                    "date_format", threshold=0.95
                )
            ],
            expectation_configuration_builders=[
                DefaultExpectationConfigurationBuilder(
                    "expect_column_values_to_match_strftime_format",
                    strftime_format="$parameter.date_format.value",
                    condition="$parameter.date_format.value != None",
                )
            ],
        )
    )
    p.add_rule(
        Rule(
            name="nullity_rule",
            domain_builder=MapMetricColumnDomainBuilder(
                map_metric_name="column_values.nonnull",
                max_unexpected_ratio=0.0,
            ),
            expectation_configuration_builders=[
                DefaultExpectationConfigurationBuilder(
                    "expect_column_values_to_not_be_null",
                )
            ],
        )
    )
    return p
