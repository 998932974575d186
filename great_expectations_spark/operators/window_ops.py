"""Uniqueness and monotonicity operators — the shuffling expectations.

Scalability re-design vs the reference (SURVEY.md §2.E):

* ``expect_column_values_to_be_unique`` — reference evaluates
  ``count(1) over (partition by value) <= 1`` (``column_values_unique.py:
  77-82``): every row is shuffled by its value and a hot value lands on one
  task.  Ours is a two-phase hash aggregation: ``groupBy(value).count()``
  (map-side partial aggregation collapses duplicates before the shuffle, so
  a hot key ships as ONE row per upstream partition) then a tiny
  ``filter(cnt > 1).agg(sum(cnt))``.
* ``expect_compound_columns_to_be_unique`` — same two-phase plan on the
  struct of columns (reference ``compound_columns_unique.py:159-164``).
* ``expect_column_values_to_be_increasing`` / ``_decreasing`` — reference
  uses ``Window.orderBy(F.lit("constant"))`` (``column_values_increasing.py:
  70-150``) which forces the ENTIRE table into one partition.  Ours accepts
  ``partition_by`` (e.g. ``conv_id``) + ``order_by`` (e.g. ``turn_idx``)
  kwargs and runs ``Window.partitionBy(keys).orderBy(order)`` — per-key
  monotonicity, shuffle distributed over keys.  Without ``partition_by`` we
  fall back to the reference's single-partition semantics (warned).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from great_expectations_spark.core.domain import domain_gate
from great_expectations_spark.plans.specs import CompiledWindow

logger = logging.getLogger(__name__)

WINDOW_COMPILERS: Dict[str, Callable[[Dict[str, Any]], CompiledWindow]] = {}


def register_window(name: str):
    def deco(fn):
        WINDOW_COMPILERS[name] = fn
        return fn

    return deco


def uniqueness_flag_over_window(
    key_cols: List[str], partition_by: List[str], order_by: List[str]
) -> Column:
    """Row-level duplicate flag for key_cols == partition_by + order_by:
    a row is a duplicate iff a window-adjacent row carries the same order
    value (within a group of k equal keys every row has an equal
    neighbor, so all k rows flag — identical counts to the two-phase
    groupBy).  Lets a compound-uniqueness expectation ride an existing
    window pass instead of shuffling all rows by key."""
    w = _window_spec(partition_by, order_by)
    order_struct = F.struct(*[F.col(c) for c in order_by])
    prev = F.lag(order_struct).over(w)
    nxt = F.lead(order_struct).over(w)
    nonnull = None
    for c in key_cols:
        cond = F.col(c).isNotNull()
        nonnull = cond if nonnull is None else nonnull & cond
    dup = F.coalesce(prev == order_struct, F.lit(False)) | F.coalesce(
        nxt == order_struct, F.lit(False)
    )
    return nonnull & dup


def _uniqueness_window(
    key_cols: List[str], kind: str, value_is_dict: bool
) -> CompiledWindow:
    def base(df: DataFrame, domain: Optional[Column]) -> DataFrame:
        out = df
        if domain is not None:
            out = out.filter(domain_gate(domain))
        for c in key_cols:
            out = out.filter(F.col(c).isNotNull())
        return out

    # memoized per-df so the sample pass reuses the SAME DataFrame (and
    # thus the already-materialized shuffle stage) from the count pass
    _cache: Dict[int, DataFrame] = {}

    def dup_groups(df: DataFrame, domain: Optional[Column]) -> DataFrame:
        key = id(df)
        if key not in _cache:
            _cache[key] = (
                base(df, domain)
                .groupBy(*key_cols)
                .agg(F.count(F.lit(1)).alias("__gx_cnt"))
                .filter(F.col("__gx_cnt") > 1)
            )
        return _cache[key]

    def execute(df: DataFrame, domain: Optional[Column]) -> Dict[str, int]:
        row = dup_groups(df, domain).agg(
            F.coalesce(F.sum("__gx_cnt"), F.lit(0)).alias("unexpected_count")
        ).first()
        return {"unexpected_count": int(row["unexpected_count"])}

    def sample(
        df: DataFrame,
        domain: Optional[Column],
        n: int,
        index_cols: Optional[List[str]] = None,
    ) -> Dict[str, List[Any]]:
        if index_cols:
            # row-level sample: semi-join rows back to duplicated keys so
            # each violating ROW carries its index lineage
            dup_keys = dup_groups(df, domain).select(*key_cols)
            rows = (
                base(df, domain)
                .join(F.broadcast(dup_keys), key_cols, "left_semi")
                .select(*key_cols, *[c for c in index_cols if c not in key_cols])
                .limit(n)
                .collect()
            )
            values: List[Any] = []
            for r in rows:
                if value_is_dict:
                    values.append({c: r[c] for c in key_cols})
                elif len(key_cols) == 1:
                    values.append(r[key_cols[0]])
                else:
                    values.append(tuple(r[c] for c in key_cols))
            return {
                "unexpected_list": values,
                "unexpected_index_list": [
                    {c: r[c] for c in index_cols} for r in rows
                ],
            }
        rows = dup_groups(df, domain).limit(n).collect()
        out: List[Any] = []
        for r in rows:
            if value_is_dict:
                value: Any = {c: r[c] for c in key_cols}
            elif len(key_cols) == 1:
                value = r[key_cols[0]]
            else:
                value = tuple(r[c] for c in key_cols)
            # each duplicated key contributes cnt unexpected rows
            out.extend([value] * min(int(r["__gx_cnt"]), n - len(out)))
            if len(out) >= n:
                break
        return {"unexpected_list": out[:n]}

    considered = None
    for c in key_cols:
        cond = F.col(c).isNotNull()
        considered = cond if considered is None else considered & cond

    def sample_columns(index_cols):
        return list(key_cols) + [
            c for c in (index_cols or []) if c not in key_cols
        ]

    def pool_sample(rows, index_cols):
        # only reachable when the planner ADOPTED this expectation into a
        # shared window pass (adjacent-duplicate flag) — each flagged row
        # is one duplicated record, matching the adopted count semantics
        values: List[Any] = []
        for r in rows:
            if value_is_dict:
                values.append({c: r[c] for c in key_cols})
            elif len(key_cols) == 1:
                values.append(r[key_cols[0]])
            else:
                values.append(tuple(r[c] for c in key_cols))
        out: Dict[str, Any] = {"unexpected_list": values}
        if index_cols:
            out["unexpected_index_list"] = [
                {c: r[c] for c in index_cols} for r in rows
            ]
        return out

    cw = CompiledWindow(
        kind=kind,
        domain_columns=key_cols,
        denominator="nonnull",
        execute=execute,
        sample=sample,
        value_is_dict=value_is_dict,
        sample_columns=sample_columns,
        pool_sample=pool_sample,
    )
    cw.considered = considered  # counted in the bundled phase by the planner
    # marker for the planner's shared-window adoption: ONLY uniqueness
    # semantics may be rewritten as a lag/lead duplicate flag over an
    # existing window spec (other flag_builder-less windows, e.g. the
    # join-strategy contiguity, must keep their own execute path)
    cw.uniqueness_keys = list(key_cols)
    return cw


@register_window("expect_column_values_to_be_unique")
def _unique(kwargs: Dict[str, Any]) -> CompiledWindow:
    return _uniqueness_window([kwargs["column"]], "column_map", False)


@register_window("expect_compound_columns_to_be_unique")
def _compound_unique(kwargs: Dict[str, Any]) -> CompiledWindow:
    return _uniqueness_window(
        list(kwargs["column_list"]), "multicolumn_map", True
    )


@register_window("expect_multicolumn_values_to_be_unique")
def _multicolumn_unique(kwargs: Dict[str, Any]) -> CompiledWindow:
    # deprecated alias of compound uniqueness (reference skip list
    # self_check/util.py:2069)
    return _uniqueness_window(
        list(kwargs["column_list"]), "multicolumn_map", True
    )


def _window_spec(partition_by, order_by):
    if partition_by:
        w = Window.partitionBy(*partition_by)
    else:
        w = Window.partitionBy()
    return w.orderBy(
        *[F.col(c) for c in order_by]
        if order_by
        else [F.monotonically_increasing_id()]
    )


def _prev_nonnull(column: str, partition_by, order_by) -> Column:
    """Previous NON-NULL value of ``column`` in window order.  Unlike
    ``lag`` over a pre-filtered frame, this is null-transparent, so several
    window expectations with different null columns can share ONE pass
    over the unfiltered rows (null rows simply don't count and don't
    perturb each other's predecessors)."""
    w = _window_spec(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return F.last(F.col(column), ignorenulls=True).over(w)


def _monotonic_window(
    kwargs: Dict[str, Any], increasing: bool
) -> CompiledWindow:
    column = kwargs["column"]
    strictly = bool(kwargs.get("strictly", False))
    partition_by = kwargs.get("partition_by")
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    order_by = kwargs.get("order_by")
    if isinstance(order_by, str):
        order_by = [order_by]
    if not partition_by:
        logger.warning(
            "expect_column_values_to_be_%s without partition_by forces a "
            "single-partition global window (reference semantics, "
            "column_values_increasing.py:70-150); pass partition_by for "
            "scale.",
            "increasing" if increasing else "decreasing",
        )

    def unexpected_flag() -> Column:
        col = F.col(column)
        prev = _prev_nonnull(column, partition_by, order_by)
        if increasing:
            bad = (col <= prev) if strictly else (col < prev)
        else:
            bad = (col >= prev) if strictly else (col > prev)
        return (
            col.isNotNull()
            & prev.isNotNull()
            & F.coalesce(bad, F.lit(False))
        )

    _cache: Dict[int, DataFrame] = {}

    def annotated(df: DataFrame, domain: Optional[Column]) -> DataFrame:
        key = id(df)
        if key not in _cache:
            out = df
            if domain is not None:
                out = out.filter(domain_gate(domain))
            _cache[key] = out.withColumn(
                "__gx_unexpected", unexpected_flag()
            ).filter(F.col(column).isNotNull())
        return _cache[key]

    def execute(df: DataFrame, domain: Optional[Column]) -> Dict[str, int]:
        row = annotated(df, domain).agg(
            F.coalesce(
                F.sum(F.when(F.col("__gx_unexpected"), 1).otherwise(0)),
                F.lit(0),
            ).alias("unexpected_count")
        ).first()
        return {"unexpected_count": int(row["unexpected_count"])}

    def sample(
        df: DataFrame,
        domain: Optional[Column],
        n: int,
        index_cols: Optional[List[str]] = None,
    ) -> Dict[str, List[Any]]:
        extra = [c for c in (index_cols or []) if c != column]
        rows = (
            annotated(df, domain)
            .filter(F.col("__gx_unexpected"))
            .select(column, *extra)
            .limit(n)
            .collect()
        )
        out = {"unexpected_list": [r[column] for r in rows]}
        if index_cols:
            out["unexpected_index_list"] = [
                {c: r[c] for c in index_cols} for r in rows
            ]
        return out

    def sample_columns(index_cols):
        return [column] + [
            c for c in (index_cols or []) if c != column
        ]

    def pool_sample(rows, index_cols):
        out = {"unexpected_list": [r[column] for r in rows]}
        if index_cols:
            out["unexpected_index_list"] = [
                {c: r[c] for c in index_cols} for r in rows
            ]
        return out

    cw = CompiledWindow(
        kind="column_map",
        domain_columns=[column],
        denominator="nonnull",
        execute=execute,
        sample=sample,
        flag_builder=unexpected_flag,
        window_signature=(
            tuple(partition_by or ()),
            tuple(order_by or ()),
        ),
        sample_columns=sample_columns,
        pool_sample=pool_sample,
    )
    cw.considered = F.col(column).isNotNull()
    return cw


@register_window("expect_sequence_to_be_contiguous")
def _sequence_contiguous_window(kwargs: Dict[str, Any]) -> CompiledWindow:
    """Every (group, index-1) predecessor exists — the transcript
    referential check (north rule: every (conv_id, turn_idx-1) exists).

    Two physical strategies, identical counts:

    * ``strategy="window"`` (default) — ONE shuffle: previous non-null
      index per group; a row whose predecessor is below ``index - 1``
      (duplicates of ``index`` still count as present) is a violation.
      Shares its window pass with any monotonicity expectation on the
      same (group, order) spec.  A window partitioned by group sorts
      each WHOLE group on one task, so a pathologically hot group
      (one conversation with 10^8 turns) serializes.
    * ``strategy="join"`` — skew-immune: each row emits self/predecessor
      markers and ONE two-phase hash aggregation on the ``(group,
      index)`` PAIR flags pairs whose predecessor marker is absent.  A
      hot group collapses to one row per index per upstream partition
      before the shuffle (map-side combine), so task balance is
      independent of group size; no sort, no join anywhere.  Same
      unexpected_count as the window path: one per distinct (group,
      index) whose predecessor is absent.
    """
    group_column = kwargs.get("group_column", "conv_id")
    index_column = kwargs.get("index_column", "turn_idx")
    first_index = int(kwargs.get("first_index", 0))
    strategy = kwargs.get("strategy", "window")
    if strategy == "join":
        return _sequence_contiguous_join(
            group_column, index_column, first_index
        )
    if strategy != "window":
        raise ValueError(
            f"expect_sequence_to_be_contiguous strategy={strategy!r}; "
            "expected 'window' or 'join'"
        )
    partition_by = [group_column]
    order_by = [index_column]

    def unexpected_flag() -> Column:
        idx = F.col(index_column)
        prev = _prev_nonnull(index_column, partition_by, order_by)
        return (
            idx.isNotNull()
            & (idx > F.lit(first_index))
            & (prev.isNull() | (prev < idx - F.lit(1)))
        )

    _cache: Dict[int, DataFrame] = {}

    def annotated(df: DataFrame, domain: Optional[Column]) -> DataFrame:
        key = id(df)
        if key not in _cache:
            out = df
            if domain is not None:
                out = out.filter(domain_gate(domain))
            _cache[key] = out.withColumn(
                "__gx_unexpected", unexpected_flag()
            ).filter(F.col(index_column).isNotNull())
        return _cache[key]

    def execute(df: DataFrame, domain: Optional[Column]) -> Dict[str, int]:
        row = annotated(df, domain).agg(
            F.coalesce(
                F.sum(F.when(F.col("__gx_unexpected"), 1).otherwise(0)),
                F.lit(0),
            ).alias("unexpected_count")
        ).first()
        return {"unexpected_count": int(row["unexpected_count"])}

    def sample(
        df: DataFrame,
        domain: Optional[Column],
        n: int,
        index_cols: Optional[List[str]] = None,
    ) -> Dict[str, List[Any]]:
        rows = (
            annotated(df, domain)
            .filter(F.col("__gx_unexpected"))
            .select(group_column, index_column)
            .limit(n)
            .collect()
        )
        values = [
            {group_column: r[group_column], index_column: r[index_column]}
            for r in rows
        ]
        return {
            "unexpected_list": values,
            "unexpected_index_list": values,
        }

    def sample_columns(index_cols):
        return [group_column, index_column]

    def pool_sample(rows, index_cols):
        values = [
            {group_column: r[group_column], index_column: r[index_column]}
            for r in rows
        ]
        return {
            "unexpected_list": values,
            "unexpected_index_list": values,
        }

    cw = CompiledWindow(
        kind="multicolumn_map",
        domain_columns=[group_column, index_column],
        denominator="nonnull",
        execute=execute,
        sample=sample,
        value_is_dict=True,
        flag_builder=unexpected_flag,
        window_signature=(tuple(partition_by), tuple(order_by)),
        sample_columns=sample_columns,
        pool_sample=pool_sample,
    )
    cw.considered = F.col(index_column).isNotNull()
    return cw


def _sequence_contiguous_join(
    group_column: str, index_column: str, first_index: int
) -> CompiledWindow:
    """Skew-immune contiguity: the north rule's "every (conv_id,
    turn_idx-1) predecessor exists" in ONE pair-keyed aggregation (see
    strategy='join' docs on the registered compiler above).

    Plan: every non-null row emits two markers — (group, index) tagged
    "self" and (group, index+1) tagged "pred" — and a single
    ``groupBy(group, index)`` takes ``max`` of each tag.  A pair whose
    "self" marker is set, whose index exceeds ``first_index``, and whose
    "pred" marker is absent has a missing predecessor.  ONE shuffle on
    the PAIR key (the original anti-join formulation shuffled three
    times: distinct + both join sides); duplicates of a hot group
    collapse to one row per index per upstream partition via map-side
    combine, so task balance is independent of group size; no sort, no
    join anywhere."""

    _cache: Dict[int, DataFrame] = {}

    def missing_pred(df: DataFrame, domain: Optional[Column]) -> DataFrame:
        key = id(df)
        if key not in _cache:
            out = df
            if domain is not None:
                out = out.filter(domain_gate(domain))
            markers = (
                out.filter(F.col(index_column).isNotNull())
                .select(
                    F.col(group_column).alias("__gx_g"),
                    F.explode(
                        F.array(
                            F.struct(
                                F.col(index_column)
                                .cast("long")
                                .alias("i"),
                                F.lit(1).alias("s"),
                                F.lit(0).alias("p"),
                            ),
                            F.struct(
                                (F.col(index_column).cast("long") + 1)
                                .alias("i"),
                                F.lit(0).alias("s"),
                                F.lit(1).alias("p"),
                            ),
                        )
                    ).alias("__gx_m"),
                )
                .select(
                    "__gx_g",
                    F.col("__gx_m.i").alias("__gx_i"),
                    F.col("__gx_m.s").alias("__gx_s"),
                    F.col("__gx_m.p").alias("__gx_p"),
                )
            )
            _cache[key] = (
                markers.groupBy("__gx_g", "__gx_i")
                .agg(
                    F.max("__gx_s").alias("__gx_self"),
                    F.max("__gx_p").alias("__gx_pred"),
                )
                .filter(
                    (F.col("__gx_self") == 1)
                    & (F.col("__gx_i") > F.lit(first_index))
                    & (F.col("__gx_pred") == 0)
                )
                .select("__gx_g", "__gx_i")
            )
        return _cache[key]

    def execute(df: DataFrame, domain: Optional[Column]) -> Dict[str, int]:
        return {"unexpected_count": missing_pred(df, domain).count()}

    def sample(
        df: DataFrame,
        domain: Optional[Column],
        n: int,
        index_cols: Optional[List[str]] = None,
    ) -> Dict[str, List[Any]]:
        rows = (
            missing_pred(df, domain)
            .select("__gx_g", "__gx_i")
            .limit(n)
            .collect()
        )
        values = [
            {group_column: r["__gx_g"], index_column: r["__gx_i"]}
            for r in rows
        ]
        return {
            "unexpected_list": values,
            "unexpected_index_list": values,
        }

    cw = CompiledWindow(
        kind="multicolumn_map",
        domain_columns=[group_column, index_column],
        denominator="nonnull",
        execute=execute,
        sample=sample,
        value_is_dict=True,
    )
    cw.considered = F.col(index_column).isNotNull()
    # plan-contract hook: tests assert the violating-pairs frame contains
    # no Window operator and no join (the skew-proofness claim)
    cw.violation_frame = missing_pred
    return cw


@register_window("expect_column_values_to_be_increasing")
def _increasing(kwargs: Dict[str, Any]) -> CompiledWindow:
    return _monotonic_window(kwargs, increasing=True)


@register_window("expect_column_values_to_be_decreasing")
def _decreasing(kwargs: Dict[str, Any]) -> CompiledWindow:
    return _monotonic_window(kwargs, increasing=False)


def compile_window_expectation(
    expectation_type: str, kwargs: Dict[str, Any]
) -> CompiledWindow:
    try:
        compiler = WINDOW_COMPILERS[expectation_type]
    except KeyError:
        raise KeyError(f"no window compiler for {expectation_type!r}")
    return compiler(kwargs)
