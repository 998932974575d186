"""Partition-pruning plan guards for grouped/resumable validation.

SURVEY's Iceberg premise is a partition-pruned source; no Iceberg/Delta
jars exist in this sandbox, so a Hive-partitioned catalog table
(``partitionBy`` + ``saveAsTable``) is the honest stand-in.  These
guards pin the claims the scale notes make:

* grouped user-SQL (the chunked UNION ALL hook): each branch's
  ``partition <=> literal`` filter reaches the source as a
  PartitionFilter, so a chunk's total I/O equals the per-partition
  total — asserted on BOTH the plan string and the executed scan's
  ``numFiles`` metric;
* ``PartitionSketchStore.update``'s todo filter prunes the scan to the
  todo partitions only;
* a resume-skip run (everything covered) issues ZERO Spark jobs.

A refactor that breaks pushdown (e.g. wrapping the partition column in
an expression, or filtering after a repartition) fails here instead of
failing as a full-table scan at 10^5 partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.checkpoint import sketches as sketches_mod
from great_expectations_spark.checkpoint.runner import validate_by_partition
from great_expectations_spark.checkpoint.sketches import PartitionSketchStore
from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.operators import query_ops as query_ops_mod

N_DAYS = 10


@pytest.fixture(scope="module")
def part_table(spark, tmp_path_factory):
    """Hive-partitioned catalog table, exactly ONE file per partition so
    the executed scan's numFiles metric equals partitions-read."""
    df = spark.range(200).select(
        F.concat(F.lit("d"), (F.col("id") % N_DAYS)).alias("day"),
        F.col("id").cast("double").alias("x"),
        F.concat(F.lit("c"), F.col("id") % 37).alias("conv_id"),
    )
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    (
        df.repartition(1)
        .write.mode("overwrite")
        .option("path", warehouse + "/events_partitioned")
        .partitionBy("day")
        .saveAsTable("events_partitioned")
    )
    yield spark.table("events_partitioned")
    spark.sql("DROP TABLE IF EXISTS events_partitioned")


def _scan_nodes(jplan):
    """FileSourceScan nodes under a (possibly adaptive) executed plan."""
    out = []

    def walk(node):
        name = node.nodeName()
        if "Scan parquet" in name or "FileSourceScan" in name:
            out.append(node)
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
            return
        # shuffle/broadcast query-stage wrappers hold their subtree in
        # .plan(); plain nodes expose children()
        try:
            walk(node.plan())
            return
        except Exception:  # noqa: BLE001 — not a QueryStageExec
            pass
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(jplan)
    return out


def _num_files(df) -> int:
    """Sum of the executed scans' numFiles metrics (call AFTER an
    action has run on ``df``)."""
    total = 0
    for node in _scan_nodes(df._jdf.queryExecution().executedPlan()):
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numFiles":
                total += int(kv._2().value())
    return total


def _plan_str(df) -> str:
    # an executed AdaptiveSparkPlan prints final plan + "== Initial
    # Plan ==" section — keep only the final plan so scans count once
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_grouped_user_sql_branches_prune_partitions(
    spark, part_table, monkeypatch
):
    """Every branch of the chunked UNION ALL carries a PartitionFilter
    on the partition column, and the executed chunk reads exactly one
    file per partition — the 'chunk I/O == per-partition I/O' claim."""
    captured = []
    monkeypatch.setattr(
        query_ops_mod, "_GROUPED_SQL_PLAN_OBSERVER", captured.append
    )
    # count_only branch shape: a zero-row inner query would let AQE
    # collapse the executed union to EmptyRelation (scans then live only
    # in materialized-but-dropped query stages), so the guard uses the
    # row-count expectation whose branches always return one row each
    suite = ExpectationSuite("usersql").add(
        "expect_query_row_count_to_be_between",
        query="SELECT x FROM {batch} WHERE x >= 0",
        min_value=0,
        max_value=100_000,
    )
    out = validate_by_partition(part_table, suite, "day")
    assert len(out) == N_DAYS
    assert all(r.success for r in out.values())
    assert len(captured) == 1  # 10 partitions, one 64-wide chunk
    plan = _plan_str(captured[0])
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == N_DAYS  # one branch scan per partition
    for ln in scans:
        assert "PartitionFilters: [" in ln and "day#" in ln.split(
            "PartitionFilters:"
        )[1], ln
        # the predicate moved ENTIRELY to partition pruning
        assert "PartitionFilters: []" not in ln
    # executed: each branch read exactly its own partition's single file
    assert _num_files(captured[0]) == N_DAYS


def test_sketch_update_todo_filter_prunes_scan(
    spark, part_table, tmp_path, monkeypatch
):
    """update()'s todo filter reaches the partitioned source as a
    PartitionFilter: sketching 3 of 10 partitions reads 3 files."""
    captured = []
    monkeypatch.setattr(
        sketches_mod, "_UPDATE_PLAN_OBSERVER", captured.append
    )
    store = PartitionSketchStore(str(tmp_path))
    todo = ["d1", "d4", "d7"]
    done = store.update(
        part_table, "day", ["x"], partitions=todo, kinds=("moments",)
    )
    assert sorted(done) == todo
    assert len(captured) == 1
    plan = _plan_str(captured[0])
    assert "PartitionFilters: [day#" in plan.replace(
        "PartitionFilters: [(day#", "PartitionFilters: [day#"
    ), plan
    assert " IN (d1,d4,d7)" in plan, plan
    assert _num_files(captured[0]) == 3


def test_resume_skip_runs_zero_jobs(spark, part_table, tmp_path, monkeypatch):
    """A fully-covered update() is a pure driver-side resume: no grouped
    job, no scan, zero Spark jobs."""
    store = PartitionSketchStore(str(tmp_path))
    parts = [f"d{i}" for i in range(N_DAYS)]
    store.update(
        part_table, "day", ["x"], partitions=parts, kinds=("moments",)
    )
    captured = []
    monkeypatch.setattr(
        sketches_mod, "_UPDATE_PLAN_OBSERVER", captured.append
    )
    sc = spark.sparkContext
    sc.setJobGroup("gx_resume_skip", "resume")
    try:
        assert store.update(
            part_table, "day", ["x"], partitions=parts, kinds=("moments",)
        ) == []
    finally:
        sc.setJobGroup(None, None)
    assert captured == []
    assert sc.statusTracker().getJobIdsForGroup("gx_resume_skip") == []
