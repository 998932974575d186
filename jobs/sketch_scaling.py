#!/usr/bin/env python
"""Thread-scaling evidence for the incremental-stats family
(checkpoint/sketches.py update pass + runner.partition_fingerprints) on
the deterministic transcript corpus.

Workload over ~24.7M turns, 31 day partitions:

* ``sketch_update`` — ONE grouped aggregation computing every
  partition's HLL + top-k state for ``conv_id`` plus HLL + moments for
  ``turn_idx`` (fresh store dir per repeat so resume cannot shortcut
  the measurement).  Wire traffic is one sketch row per (task,
  partition) pair; everything else is scan + object-hash aggregation.
* ``fingerprints`` — the detect-changes pass: rowcount + decimal sum of
  ``xxhash64`` over ALL columns (including the ~hundreds-of-bytes text
  column), grouped by day.  Pure scan + map-side combine.

Run once per (parallelism level, query) — fresh JVM per combination is
the protocol; measuring both queries in one JVM was observed to inflate
the second workload ~3x at 32 threads (heap/GC residue from the
object-hash sketch aggregation), so ``SPARK_GRAFT_QUERY`` isolates them:

    SPARK_GRAFT_QUERY=sketch_update SPARK_GRAFT_CPUS=8  python jobs/sketch_scaling.py
    SPARK_GRAFT_QUERY=sketch_update SPARK_GRAFT_CPUS=32 python jobs/sketch_scaling.py
    SPARK_GRAFT_QUERY=fingerprints  SPARK_GRAFT_CPUS=8  python jobs/sketch_scaling.py
    SPARK_GRAFT_QUERY=fingerprints  SPARK_GRAFT_CPUS=32 python jobs/sketch_scaling.py

Prints one JSON line per run; efficiency between two levels is
(T_N / T_4N) / 4 computed by the reader.  Deterministic input only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

from great_expectations_spark.checkpoint.runner import partition_fingerprints
from great_expectations_spark.checkpoint.sketches import PartitionSketchStore
from great_expectations_spark.datagen.transcripts import generate_transcripts

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
        .appName("gx-sketch-scaling")
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
    # untimed cache warm-up over EVERY column (both workloads read the
    # wide text column): on this single-VM host a cold read of the
    # ~2.4 GB corpus is disk-bandwidth-bound (measured 11-31 s at ANY
    # thread count), which measures the virtio disk, not the engine —
    # on a real cluster aggregate storage bandwidth scales with the
    # executors, so the warm number is the faithful one
    from pyspark.sql import functions as F

    df.agg(
        *[F.count(c) for c in df.columns],
        F.sum(F.length("text")),
    ).collect()

    def sketch_run():
        d = tempfile.mkdtemp(prefix="gx_sketch_scale_")
        try:
            store = PartitionSketchStore(d, lg_k=12, topk_max_items=10_000)
            # per-column kinds -> ONE grouped job for the whole plan
            store.update(
                df, "day",
                {"conv_id": ("hll", "topk"),
                 "turn_idx": ("hll", "moments")},
            )
            return store.merged_moments(["turn_idx"])["turn_idx"]["count"]
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def fingerprint_run():
        return len(partition_fingerprints(df, "day"))

    only = os.environ.get("SPARK_GRAFT_QUERY")
    out = {"cpus": CPUS, "turns": n_turns, "queries": {}, "steal_pct": {}}
    for name, fn in (
        ("sketch_update", sketch_run),
        ("fingerprints", fingerprint_run),
    ):
        if only and name != only:
            continue
        walls, steals = [], []
        for _ in range(REPEATS):
            b0, s0 = _cpu_steal()
            t0 = time.monotonic()
            fn()
            walls.append(round(time.monotonic() - t0, 2))
            b1, s1 = _cpu_steal()
            steals.append(round(100 * (s1 - s0) / max((b1 - b0), 1), 1))
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
