#!/usr/bin/env python
"""Thread-scaling evidence for the temporal operator family
(functions/temporal.py) on the deterministic transcript corpus.

Workloads over ~24.7M turns (2M conversations, generate_transcripts):

* ``asof``  — enrich every assistant turn with the most recent
  tool-role turn at-or-before it in the same conversation
  (``asof_join``: one union + one per-conv window, single shuffle).
* ``sessionize`` — 1h-gap sessions per conversation + per-session
  sizes (one window shuffle + one groupBy).

Run once per parallelism level (fresh JVM per level is the protocol):

    SPARK_GRAFT_CPUS=8  python jobs/temporal_scaling.py
    SPARK_GRAFT_CPUS=32 python jobs/temporal_scaling.py

Prints one JSON line per run with walls (min of SPARK_GRAFT_REPEATS),
turns/sec, and in-run hypervisor steal; efficiency between two levels is
(T_N / T_4N) / 4 computed by the reader.  Deterministic input only.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from great_expectations_spark.datagen.transcripts import generate_transcripts
from great_expectations_spark.functions.temporal import asof_join, sessionize

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
N_CONV = int(os.environ.get("SPARK_GRAFT_CONVS", "2000000"))
PARTS = int(os.environ.get("SPARK_GRAFT_PARTS", "256"))
DATASET = os.environ.get(
    "SPARK_GRAFT_TRANSCRIPTS",
    f"/tmp/gx_bench_transcripts_{N_CONV}_{PARTS}",
)


def _cpu_steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("gx-temporal-scaling")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(DATASET):
        generate_transcripts(
            spark, n_conversations=N_CONV, partitions=PARTS
        ).write.mode("overwrite").parquet(DATASET)
    df = spark.read.parquet(DATASET)
    n_turns = df.count()

    def asof_run():
        left = df.filter(F.col("role") == "assistant").select(
            "conv_id", "ts", "turn_idx"
        )
        right = (
            df.filter(F.col("role") == "tool")
            .filter(F.col("ts").isNotNull())
            .groupBy("conv_id", "ts")
            .agg(F.max("turn_idx").alias("tool_turn"))
        )
        j = asof_join(left, right, on="ts", by="conv_id")
        return j.agg(
            F.count(F.lit(1)), F.count("tool_turn"), F.sum("tool_turn")
        ).collect()

    def sessionize_run():
        s = sessionize(
            df.filter(
                F.col("conv_id").isNotNull() & F.col("ts").isNotNull()
            ).select("conv_id", "ts"),
            "conv_id",
            "ts",
            gap=3600.0,
        )
        return (
            s.groupBy("conv_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.count(F.lit(1)), F.max("n"))
            .collect()
        )

    out = {"cpus": CPUS, "turns": n_turns, "queries": {}, "steal_pct": {}}
    for name, fn in (("asof", asof_run), ("sessionize", sessionize_run)):
        walls, steals = [], []
        for _ in range(REPEATS):
            b0, s0 = _cpu_steal()
            t0 = time.monotonic()
            fn()
            walls.append(round(time.monotonic() - t0, 2))
            b1, s1 = _cpu_steal()
            steals.append(
                round(100 * (s1 - s0) / max((b1 - b0), 1), 1)
            )
        best = min(walls)
        out["queries"][name] = {
            "walls": walls,
            "best_sec": best,
            "turns_per_sec": round(n_turns / best),
        }
        out["steal_pct"][name] = steals
    print(json.dumps(out))


if __name__ == "__main__":
    main()
