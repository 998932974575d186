#!/usr/bin/env python
"""Grouped-mode scaling evidence: `validate_by_partition` (the 10^12-row
strategy — EVERY partition's whole suite in O(1) Spark jobs) over the
25.4M-turn transcript dataset at local[8] (N) vs local[32] (4N),
interleaved fresh-JVM rounds, per-mode minima.

This is the workload whose thread-scaling tracks executor-scaling best:
the grouped plan carries more compute per scanned byte than the single
suite pass (per-partition conditional counters), so it sits at the
CPU-bound end where 4x threads actually help — the single-table suite is
parquet-scan (memory-bandwidth) bound, which a single socket cannot scale
4x no matter the parallelism.

Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATASET = os.environ.get(
    "SPARK_GRAFT_TRANSCRIPTS", "/tmp/gx_bench_transcripts_2000000_256"
)
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))


def inner(cpus: int) -> None:
    from pyspark.sql import SparkSession

    from great_expectations_spark.checkpoint.runner import (
        validate_by_partition,
    )
    from great_expectations_spark.datagen.transcripts import default_suite

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gx-grouped-scaling")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(DATASET)
    n_turns = df.count()
    suite = default_suite()
    walls = []
    n_parts = 0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        results = validate_by_partition(df, suite, "day")
        n_parts = len(results)
        walls.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "turns": n_turns,
                "partitions": n_parts,
                "walls": walls,
                "best": min(walls),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner-cpus", type=int, default=0)
    args = ap.parse_args()
    if args.inner_cpus:
        inner(args.inner_cpus)
        return

    low, high = 8, 32
    results = {low: [], high: []}
    for round_no in range(ROUNDS):
        for cpus in (low, high):
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--inner-cpus",
                    str(cpus),
                ],
                capture_output=True,
                text=True,
                check=True,
            )
            line = [
                l for l in out.stdout.splitlines() if l.startswith("{")
            ][-1]
            r = json.loads(line)
            results[cpus].append(r)
            print(
                f"round {round_no} local[{cpus}]: best={r['best']}s "
                f"walls={r['walls']}",
                file=sys.stderr,
                flush=True,
            )
    turns = results[low][0]["turns"]
    t_low = min(r["best"] for r in results[low])
    t_high = min(r["best"] for r in results[high])
    print(
        json.dumps(
            {
                "turns": turns,
                "partitions": results[low][0]["partitions"],
                "local[8]_best_sec": t_low,
                "local[32]_best_sec": t_high,
                "local[8]_turns_per_sec": round(turns / t_low, 1),
                "local[32]_turns_per_sec": round(turns / t_high, 1),
                "scaling_efficiency": round((t_low / t_high) / 4, 3),
                "all": {
                    str(c): [r["best"] for r in rs]
                    for c, rs in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
