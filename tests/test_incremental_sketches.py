"""Incremental distinct counting via per-partition mergeable HLL sketches
(checkpoint/sketches.py).

Contract: a resumed run computes sketches ONLY for unseen partitions
(zero data jobs when nothing is new), the merged estimate equals the
whole-table exact distinct at test cardinalities (DataSketches HLL is
exact in sparse mode), and values shared across partitions are never
double-counted (set union, not sum).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.checkpoint.sketches import PartitionSketchStore


@pytest.fixture(scope="module")
def days(spark):
    # conv ids overlap across days (c0..c9 on d0, c5..c14 on d1) so the
    # merged distinct (15) differs from the per-partition sum (20)
    rows = [("d0", f"c{i}", i) for i in range(10)]
    rows += [("d1", f"c{i}", i * 2) for i in range(5, 15)]
    rows += [(None, "c_nullday", 99)]  # NULL partition must be addressable
    return spark.createDataFrame(rows, "day string, conv_id string, n int")


def test_roundtrip_and_exact_union(spark, days, tmp_path):
    store = PartitionSketchStore(str(tmp_path))
    computed = store.update(days, "day", ["conv_id", "n"])
    assert sorted(computed) == ["None", "d0", "d1"]
    est = store.merged_distinct(spark, ["conv_id", "n"])
    exact = days.agg(
        F.countDistinct("conv_id").alias("c"),
        F.countDistinct("n").alias("n"),
    ).first()
    assert est["conv_id"] == exact["c"] == 16
    assert est["n"] == exact["n"]


def test_resume_computes_only_new_partitions(spark, days, tmp_path):
    store = PartitionSketchStore(str(tmp_path))
    first = store.update(days.filter(F.col("day") == "d0"), "day", ["conv_id"])
    assert first == ["d0"]
    # second call over the FULL table only touches the unseen partitions
    second = store.update(days, "day", ["conv_id"])
    assert sorted(second) == ["None", "d1"]
    # and a fully-resumed call does nothing at all
    assert store.update(days, "day", ["conv_id"]) == []
    est = store.merged_distinct(spark, ["conv_id"])
    assert est["conv_id"] == 16


def test_lg_k_mismatch_refused(spark, days, tmp_path):
    PartitionSketchStore(str(tmp_path), lg_k=12).update(
        days, "day", ["conv_id"]
    )
    other = PartitionSketchStore(str(tmp_path), lg_k=14)
    with pytest.raises(ValueError, match="lg_k"):
        other.load("d0")


def test_unsupported_type_casts_to_string(spark, tmp_path):
    df = spark.createDataFrame(
        [("p", 1.5), ("p", 1.5), ("p", 2.5)], "part string, x double"
    )
    store = PartitionSketchStore(str(tmp_path))
    store.update(df, "part", ["x"])
    assert store.merged_distinct(spark, ["x"])["x"] == 2


def test_run_checkpoint_carries_distinct_estimates(spark, days, tmp_path):
    from great_expectations_spark.checkpoint.runner import run_checkpoint
    from great_expectations_spark.core.suite import ExpectationSuite

    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="conv_id"
    )
    ckpt = str(tmp_path / "ckpt")
    nn = days.filter(F.col("day").isNotNull())
    out = run_checkpoint(
        nn, suite, "day", ckpt, sketch_columns=["conv_id"]
    )
    assert out["success"]
    assert sorted(out["sketch_partitions_computed"]) == ["d0", "d1"]
    assert out["distinct_estimates"]["conv_id"] == 15
    # resumed run: no partition re-validated, no sketch recomputed, the
    # merged estimate still answers from the store
    again = run_checkpoint(
        nn, suite, "day", ckpt, sketch_columns=["conv_id"]
    )
    assert again["partitions_validated_now"] == 0
    assert again["sketch_partitions_computed"] == []
    assert again["distinct_estimates"]["conv_id"] == 15


def test_empty_store_returns_zero(spark, tmp_path):
    store = PartitionSketchStore(str(tmp_path))
    assert store.merged_distinct(spark, ["whatever"]) == {"whatever": 0}
