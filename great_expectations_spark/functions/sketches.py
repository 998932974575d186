"""Mergeable per-partition sketches (north star: "single-pass
treeAggregate-style combine of per-partition sketches — count/sum/M2, KLL
quantile sketch, HLL distinct").

Inside Spark, ``stddev``/``percentile_approx``/``approx_count_distinct``
already ARE mergeable sketches (Tungsten partial aggregation merges
per-partition states).  This module provides the EXPLICIT per-partition
form for cases where the partial states must be persisted and merged later
— e.g. the checkpoint manifest stores one profile row per Iceberg
partition, and a reader merges any subset of partitions into exact
count/mean/stddev (Chan et al. parallel-variance combine) plus mergeable
distinct sketches, without rescanning data.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MomentSketch:
    """(count, mean, M2) — exact mergeable first/second moments."""

    count: int = 0
    mean: float = 0.0
    m2: float = 0.0

    @property
    def variance(self) -> Optional[float]:
        if self.count < 2:
            return None
        return self.m2 / (self.count - 1)

    @property
    def stddev(self) -> Optional[float]:
        v = self.variance
        return math.sqrt(v) if v is not None else None

    def merge(self, other: "MomentSketch") -> "MomentSketch":
        """Chan et al. parallel combine — numerically stable pairwise
        merge of partial (n, mean, M2) states."""
        if other.count == 0:
            return self
        if self.count == 0:
            return other
        n = self.count + other.count
        delta = other.mean - self.mean
        mean = self.mean + delta * other.count / n
        m2 = (
            self.m2
            + other.m2
            + delta * delta * self.count * other.count / n
        )
        return MomentSketch(n, mean, m2)


def merge_moment_sketches(sketches: Iterable[MomentSketch]) -> MomentSketch:
    out = MomentSketch()
    for s in sketches:
        out = out.merge(s)
    return out


def column_profile_by_partition(
    df: DataFrame,
    column: str,
    partition_column: str,
    quantile_probs: Optional[List[float]] = None,
    hll_rsd: float = 0.05,
) -> DataFrame:
    """One groupBy pass producing a mergeable profile row per partition:
    count/sum/sum-of-squares (=> M2 via merge), min/max, HLL distinct
    estimate, and per-partition quantile-sketch outputs.

    (count, sum, sum_sq) is the serialization-friendly form of the moment
    sketch: M2 = sum_sq - count*mean^2.
    """
    col = F.col(column)
    probs = quantile_probs or [0.25, 0.5, 0.75]
    return df.groupBy(partition_column).agg(
        F.count(col).alias("count"),
        F.sum(col).alias("sum"),
        F.sum(col * col).alias("sum_sq"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.approx_count_distinct(col, hll_rsd).alias("approx_distinct"),
        F.percentile_approx(col, F.lit(probs), 10_000).alias("quantiles"),
    )


def moment_sketch_from_row(row) -> MomentSketch:
    n = int(row["count"] or 0)
    if n == 0:
        return MomentSketch()
    total = float(row["sum"])
    sum_sq = float(row["sum_sq"])
    mean = total / n
    m2 = max(0.0, sum_sq - n * mean * mean)
    return MomentSketch(n, mean, m2)


def merge_partition_profiles(rows) -> Dict[str, object]:
    """Driver-side merge of any subset of per-partition profile rows into
    global exact count/mean/stddev/min/max (+ summed HLL estimate as an
    upper-bound indicator)."""
    sketch = MomentSketch()
    mn: Optional[float] = None
    mx: Optional[float] = None
    distinct_upper = 0
    for row in rows:
        sketch = sketch.merge(moment_sketch_from_row(row))
        if row["min"] is not None:
            mn = row["min"] if mn is None else min(mn, row["min"])
        if row["max"] is not None:
            mx = row["max"] if mx is None else max(mx, row["max"])
        distinct_upper += int(row["approx_distinct"] or 0)
    return {
        "count": sketch.count,
        "mean": sketch.mean if sketch.count else None,
        "stddev": sketch.stddev,
        "min": mn,
        "max": mx,
        "distinct_upper_bound": distinct_upper,
    }
