"""Interactive Validator API + sketches tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.core.validator_api import Validator
from great_expectations_spark.functions import sketches


def test_interactive_validator(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "d")], "id int, name string"
    )
    v = Validator(df, result_format="SUMMARY")
    r1 = v.expect_column_values_to_not_be_null("name")
    assert not r1.success and r1.result["unexpected_count"] == 1
    r2 = v.expect_column_values_to_be_between("id", min_value=1, max_value=3)
    assert r2.success
    r3 = v.expect_column_values_to_be_unique("id")
    assert not r3.success
    r4 = v.expect_table_row_count_to_be_between(min_value=4, max_value=4)
    assert r4.success
    r5 = v.expect_compound_columns_to_be_unique(["id", "name"])
    assert r5.success

    suite = v.get_expectation_suite()
    assert len(suite.expectations) == 5
    full = v.validate()
    assert full.statistics["evaluated_expectations"] == 5

    with pytest.raises(AttributeError):
        v.expect_made_up_thing("x")


def test_moment_sketch_merge_matches_exact(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    a, b, c = rng.normal(5, 2, 1000), rng.normal(-1, 1, 500), rng.normal(0, 7, 2)

    def sk(arr):
        s = sketches.MomentSketch()
        for x in arr:
            s = s.merge(sketches.MomentSketch(1, float(x), 0.0))
        return s

    merged = sketches.merge_moment_sketches([sk(a), sk(b), sk(c)])
    allv = np.concatenate([a, b, c])
    assert merged.count == len(allv)
    assert merged.mean == pytest.approx(allv.mean(), rel=1e-9)
    assert merged.stddev == pytest.approx(allv.std(ddof=1), rel=1e-9)


def test_partition_profiles_merge(spark):
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("part"),
        (F.col("id").cast("double") * 1.5).alias("x"),
    )
    profiles = sketches.column_profile_by_partition(df, "x", "part")
    rows = profiles.collect()
    assert len(rows) == 10
    merged = sketches.merge_partition_profiles(rows)
    exact = df.agg(
        F.count("x"), F.mean("x"), F.stddev_samp("x"), F.min("x"), F.max("x")
    ).first()
    assert merged["count"] == exact[0]
    assert merged["mean"] == pytest.approx(exact[1], rel=1e-9)
    assert merged["stddev"] == pytest.approx(exact[2], rel=1e-6)
    assert merged["min"] == exact[3] and merged["max"] == exact[4]
