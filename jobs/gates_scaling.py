#!/usr/bin/env python
"""Thread-scaling evidence for the heuristic quality-gate family
(C4 line cleaner + Gopher structural rules, functions/curation.py /
functions/text.py) on the deterministic transcript corpus.

Workload over ~24.7M turns: ONE aggregate over
``gopher_rules(c4_stats(df))`` — both gates are single-projection JVM
expressions (~20 regex/array rules per row), so this measures pure
scan + whole-stage-codegen throughput with zero shuffle and zero
Python workers.

Run once per parallelism level (fresh JVM per level is the protocol):

    SPARK_GRAFT_CPUS=8  python jobs/gates_scaling.py
    SPARK_GRAFT_CPUS=32 python jobs/gates_scaling.py

Prints one JSON line per run; efficiency between two levels is
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
from great_expectations_spark.functions.curation import c4_stats
from great_expectations_spark.functions.text import gopher_rules

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
        .appName("gx-gates-scaling")
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

    def gates_run():
        flagged = gopher_rules(c4_stats(df))
        return flagged.agg(
            F.sum(F.col("c4_keep").cast("long")),
            F.sum(F.col("gopher_keep").cast("long")),
            F.sum("gopher_n_words"),
            F.sum("c4_n_sentences"),
        ).collect()

    out = {"cpus": CPUS, "turns": n_turns, "queries": {}, "steal_pct": {}}
    walls, steals = [], []
    for _ in range(REPEATS):
        b0, s0 = _cpu_steal()
        t0 = time.monotonic()
        gates_run()
        walls.append(round(time.monotonic() - t0, 2))
        b1, s1 = _cpu_steal()
        steals.append(round(100 * (s1 - s0) / max((b1 - b0), 1), 1))
    best = min(walls)
    out["queries"]["c4_gopher"] = {
        "walls": walls,
        "best_sec": best,
        "turns_per_sec": round(n_turns / best),
    }
    out["steal_pct"]["c4_gopher"] = steals
    print(json.dumps(out))


if __name__ == "__main__":
    main()
