"""Domain resolution: (row_condition, null-filters, ignore_row_if) → Columns.

Reference behavior (``execution_engine/sparkdf_execution_engine.py:493-608``):
* ``row_condition`` with ``condition_parser="spark"`` is a raw Spark-SQL
  boolean expression (``F.expr``).
* ``condition_parser="great_expectations"`` is a mini-DSL:
  ``col("x") > 5``, ``col("x") == "str"``, ``col("x").notNull()``
  (reference ``expectations/row_conditions.py:40-167``).
* ``ignore_row_if`` for pair metrics: both_values_are_missing /
  either_value_is_missing / neither (:556-583); for multicolumn:
  all_values_are_missing / any_value_is_missing (:585-606).

Unlike the reference (which materializes a filtered DataFrame per domain),
we return boolean Columns so the planner can fold every domain into a single
bundled aggregation pass via ``F.sum(F.when(domain & cond, 1))``.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import List, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

_DSL_TOKEN = re.compile(
    r"""col\("(?P<col>[^"]+)"\)\s*"""
    r"""(?:(?P<op>>=|<=|!=|==|>|<)\s*(?P<rhs>"[^"]*"|'[^']*'|-?\d+(?:\.\d+)?)"""
    r"""|\.(?P<method>notnull|notNull|isnull|isNull)\(\))"""
)


def _parse_ge_dsl_atom(match: re.Match) -> Column:
    col = F.col(match.group("col"))
    method = match.group("method")
    if method is not None:
        return col.isNotNull() if method.lower() == "notnull" else col.isNull()
    op = match.group("op")
    rhs_raw = match.group("rhs")
    rhs = rhs_raw[1:-1] if rhs_raw[0] in "\"'" else (
        float(rhs_raw) if "." in rhs_raw else int(rhs_raw)
    )
    return {
        ">": col > rhs,
        ">=": col >= rhs,
        "<": col < rhs,
        "<=": col <= rhs,
        "==": col == rhs,
        "!=": col != rhs,
    }[op]


def parse_row_condition(
    row_condition: Optional[str], condition_parser: Optional[str] = None
) -> Optional[Column]:
    """Return a boolean Column for the domain's row_condition, or None."""
    if not row_condition:
        return None
    parser = condition_parser or "great_expectations"
    if parser in ("spark", "spark_sql", "pyspark"):
        return F.expr(row_condition)
    if parser in ("great_expectations", "ge", "great_expectations__experimental__"):
        atoms: List[Column] = []
        pos = 0
        connectors: List[str] = []
        for m in _DSL_TOKEN.finditer(row_condition):
            between = row_condition[pos : m.start()]
            if atoms:
                if "|" in between:
                    connectors.append("|")
                else:
                    connectors.append("&")
            atoms.append(_parse_ge_dsl_atom(m))
            pos = m.end()
        if not atoms:
            raise ValueError(
                f"could not parse row_condition {row_condition!r}"
            )
        out = atoms[0]
        for connector, atom in zip(connectors, atoms[1:]):
            out = (out | atom) if connector == "|" else (out & atom)
        return out
    raise ValueError(f"unsupported condition_parser {parser!r}")


def ignore_row_if_pair(
    column_a: str, column_b: str, ignore_row_if: str
) -> Optional[Column]:
    """Boolean Column that is True for rows KEPT by the pair-domain filter."""
    a, b = F.col(column_a), F.col(column_b)
    if ignore_row_if == "both_values_are_missing":
        return ~(a.isNull() & b.isNull())
    if ignore_row_if == "either_value_is_missing":
        return ~(a.isNull() | b.isNull())
    if ignore_row_if in ("neither", "never"):
        return None
    raise ValueError(f"unrecognized ignore_row_if {ignore_row_if!r}")


def ignore_row_if_multicolumn(
    column_list: List[str], ignore_row_if: str
) -> Optional[Column]:
    cols = [F.col(c) for c in column_list]
    if ignore_row_if == "all_values_are_missing":
        return ~reduce(lambda x, y: x & y, [c.isNull() for c in cols])
    if ignore_row_if == "any_value_is_missing":
        return ~reduce(lambda x, y: x | y, [c.isNull() for c in cols])
    if ignore_row_if in ("neither", "never"):
        return None
    raise ValueError(f"unrecognized ignore_row_if {ignore_row_if!r}")


def combine_conditions(*conds: Optional[Column]) -> Optional[Column]:
    """AND together the non-None boolean Columns; None if all None."""
    present = [c for c in conds if c is not None]
    if not present:
        return None
    return reduce(lambda x, y: x & y, present)


def domain_gate(cond: Optional[Column]) -> Column:
    """A domain condition as an always-defined boolean Column (null-safe:
    a NULL predicate result counts as row-excluded)."""
    if cond is None:
        return F.lit(True)
    return F.coalesce(cond.cast("boolean"), F.lit(False))
