#!/usr/bin/env python
"""Measure the serial-driver Amdahl term closed by intra-suite job
overlap (`SuiteValidator(job_concurrency=)`).

Protocol: one fresh JVM per (mode, round), interleaved rounds across
modes (sequential=1 vs concurrent=8), REPEATS warm suite passes per JVM
over the 25.4M-turn transcript parquet at local[CPUS]; per-mode minimum
of warm passes is the estimator (shared host, hypervisor steal recorded
per run).  Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASET = os.environ.get(
    "SPARK_GRAFT_TRANSCRIPTS", "/tmp/gx_bench_transcripts_2000000_256"
)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "4"))


def _cpu_ticks() -> tuple:
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
    return busy, vals[7] if len(vals) > 7 else 0


def inner() -> None:
    conc = int(sys.argv[2])
    from pyspark.sql import SparkSession

    sys.path.insert(0, REPO)
    import great_expectations_spark as gx
    from great_expectations_spark.datagen.transcripts import default_suite

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("gx-concurrency-overlap")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(DATASET)
    n = df.count()
    suite = default_suite()
    v = gx.SuiteValidator(job_concurrency=conc)
    walls = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        res = v.validate(df, suite, result_format="SUMMARY")
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "turns": n,
        "job_concurrency": conc,
        "success": res.success,
        "n_results": len(res.results),
        "walls": walls,
        "best": min(walls[1:]) if len(walls) > 1 else walls[0],
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        inner()
        return
    modes = {"sequential": 1, "concurrent": 8}
    results: dict[str, list] = {k: [] for k in modes}
    for rnd in range(ROUNDS):
        for name, conc in modes.items():
            t0 = _cpu_ticks()
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner",
                 str(conc)],
                capture_output=True, text=True, check=True, timeout=1800,
            )
            t1 = _cpu_ticks()
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            busy, steal = t1[0] - t0[0], t1[1] - t0[1]
            r["steal_pct"] = round(100 * steal / max(busy + steal, 1), 1)
            results[name].append(r)
            print(f"round {rnd} {name}: best={r['best']}s "
                  f"walls={r['walls']} steal={r['steal_pct']}%",
                  file=sys.stderr, flush=True)
    turns = results["sequential"][0]["turns"]
    t_seq = min(r["best"] for r in results["sequential"])
    t_conc = min(r["best"] for r in results["concurrent"])
    print(json.dumps({
        "turns": turns,
        "cpus": CPUS,
        "dataset": DATASET,
        "sequential_best_sec": t_seq,
        "concurrent_best_sec": t_conc,
        "speedup": round(t_seq / t_conc, 3),
        "sequential_turns_per_sec": round(turns / t_seq, 1),
        "concurrent_turns_per_sec": round(turns / t_conc, 1),
        "all_bests": {k: [r["best"] for r in rs] for k, rs in results.items()},
        "all_steal_pct": {k: [r["steal_pct"] for r in rs]
                          for k, rs in results.items()},
    }))


if __name__ == "__main__":
    main()
