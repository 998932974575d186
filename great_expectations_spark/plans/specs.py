"""Compiled-expectation spec types shared between operators and the planner."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame


@dataclass
class CompiledMap:
    """A map-style expectation compiled to boolean Columns.

    The planner turns this into counters inside ONE bundled ``df.agg``:
      element_count   = sum(when(domain, 1))
      considered_count= sum(when(domain & considered, 1))
      unexpected_count= sum(when(domain & considered & unexpected, 1))

    ``denominator`` picks the mostly/missing semantics (reference
    ``expectations/expectation.py``):
      'nonnull'  — column map default: ratio over non-null rows (:2834-2846)
      'element'  — null/not-null expectations: ratio over all rows, result
                   carries no missing_* fields (expect_column_values_to_not_
                   be_null.py:280-325)
      'filtered' — pair/multicolumn: ratio over rows kept by ignore_row_if
                   (:3097-3113, :3372-3388)
    """

    kind: str  # 'column_map' | 'column_pair_map' | 'multicolumn_map'
    domain_columns: List[str]
    considered: Column
    unexpected: Column
    denominator: str = "nonnull"
    value_expr: Optional[Column] = None  # what lands in unexpected_list
    value_is_dict: bool = False  # multicolumn: entries are {col: val} dicts
    required_column_types: Optional[tuple] = None  # e.g. (StringType,)
    # optional custom schema validation: fn(column_datatype) raises on bad
    type_check: Optional[Callable[[Any], None]] = None


@dataclass
class CompiledWindow:
    """A uniqueness/monotonicity expectation needing its own (shuffling)
    physical plan; executed by the planner in a separate phase.

    ``execute(df, domain_cond)`` returns a metrics dict:
      {element_count, considered_count, unexpected_count}
    ``sample(df, domain_cond, n)`` returns up to n unexpected values
    (and optionally index rows) for the result payload.
    """

    kind: str
    domain_columns: List[str]
    denominator: str
    execute: Callable[[DataFrame, Optional[Column]], Dict[str, int]]
    sample: Callable[[DataFrame, Optional[Column], int], List[Any]]
    value_is_dict: bool = False
    considered: Optional[Column] = None  # counted in the bundled agg phase
    # lag/window-flag expectations sharing a window spec can be evaluated
    # together in ONE pass: flag_builder returns the row-level unexpected
    # Column; window_signature groups compatible specs
    flag_builder: Optional[Callable[[], Column]] = None
    window_signature: Optional[tuple] = None
    # pooled group sampling: expectations riding a SHARED window pass can
    # also share ONE violation-sample job (instead of one full
    # re-scan+re-shuffle per expectation — the measured non-scaling term
    # of the suite).  ``sample_columns(index_cols)`` lists the row columns
    # the pooled collector must carry for this member;
    # ``pool_sample(row_dicts, index_cols)`` formats the member's flagged
    # rows (already limited) into the exact dict ``sample()`` returns.
    sample_columns: Optional[
        Callable[[Optional[List[str]]], List[str]]
    ] = None
    pool_sample: Optional[
        Callable[[List[dict], Optional[List[str]]], Dict[str, Any]]
    ] = None


@dataclass
class CompiledAggregate:
    """An aggregate-metric expectation.

    ``agg_exprs`` maps metric-key -> aggregate Column (joins the bundled
    agg; the planner dedups identical keys across expectations).
    ``validate(metric_values)`` -> {'success': bool, 'result': {...}}.
    ``needs_prepass`` metric keys must be resolved before the main bundle
    (e.g. z-score needs mean/std scalars first).
    ``followup(df, values)`` — optional second tiny job that runs AFTER the
    bundled agg, given the (domain-scoped) DataFrame and the phase-A metric
    values; returns extra metric values merged before ``validate``.  Used
    to gate unbounded collects (e.g. ``collect_set``) behind a phase-A
    cardinality check so the guard fires BEFORE any heavy aggregation.
    ``grouped_followup(df, partition_column, values_by_partition)`` —
    optional scale hook for ``validate_by_partition``: the followup for
    ALL partitions in O(1) Spark jobs, given each partition's phase-A
    values; returns {partition: extra-values-dict-or-Exception} (an
    Exception marks that partition's expectation failed-with-error, e.g.
    over the collect cap, without poisoning the others).  Without it the
    runner falls back to one partition-filtered ``followup`` job per
    partition.
    """

    agg_exprs: Dict[str, Column]
    validate: Callable[[Dict[str, Any]], Dict[str, Any]]
    finisher_inputs: List[str] = field(default_factory=list)
    followup: Optional[
        Callable[[DataFrame, Dict[str, Any]], Dict[str, Any]]
    ] = None
    grouped_followup: Optional[
        Callable[[DataFrame, str, Dict[Any, Dict[str, Any]]], Dict[Any, Any]]
    ] = None


@dataclass
class CompiledSchemaCheck:
    """Schema-only expectation — no scan at all.

    ``validate(df)`` -> {'success': bool, 'result': {...}}.
    """

    validate: Callable[[DataFrame], Dict[str, Any]]


@dataclass
class CompiledJob:
    """An expectation that runs its own Spark job(s) (query expectations,
    referential anti-joins, KS/PSI drift two-sample checks).

    ``run(df, spark, domain_cond)`` -> {'success': bool, 'result': {...}}.

    ``grouped(df, spark, domain_cond, partition_column)`` — optional scale
    hook for ``validate_by_partition``: evaluates the expectation for ALL
    partitions in O(1) Spark jobs (one grouped aggregation / one grouped
    anti-join instead of one job per partition) and returns
    ``{partition_value: vout}``.  Partitions absent from the mapping fall
    back to a per-partition ``run`` (only happens when the expectation's
    domain filters a partition empty).
    """

    run: Callable[..., Dict[str, Any]]
    grouped: Optional[Callable[..., Dict[Any, Dict[str, Any]]]] = None
