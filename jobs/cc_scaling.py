"""Connected-components scaling evidence: same 1.85M-edge chain-heavy
graph (the label-propagation worst case) at two parallelism levels.

    python jobs/cc_scaling.py [--cpus 8] [--repeats 2]

Prints one JSON line per run: cores, wall seconds, edges/sec.  Pair a
local[8] run with a local[32] run for the two-cluster-size criterion
(this sandbox has no real cluster; parallelism level stands in for
executor count, same protocol as jobs/exec_scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--chains", type=int, default=200_000)
    ap.add_argument("--chain-len", type=int, default=10)
    ap.add_argument("--cross", type=int, default=50_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from great_expectations_spark.functions import dedup

    n, L = args.chains, args.chain_len
    chain = spark.range(n * L).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).filter((F.col("id_a") % L) != L - 1)
    rnd = spark.range(args.cross).select(
        F.abs(F.xxhash64("id") % (n * L)).alias("id_a"),
        F.abs(F.xxhash64(F.col("id") + 7) % (n * L)).alias("id_b"),
    )
    pairs = chain.union(rnd).localCheckpoint(eager=True)
    edges = pairs.count()

    walls = []
    for _ in range(args.repeats):
        t0 = time.time()
        out = dedup.connected_components(pairs, driver_threshold=0)
        n_nodes = out.count()
        walls.append(time.time() - t0)
    wall = min(walls)
    print(
        json.dumps(
            {
                "cores": args.cpus,
                "edges": edges,
                "nodes": n_nodes,
                "wall_sec": round(wall, 2),
                "edges_per_sec": round(edges / wall, 1),
                "samples": [round(w, 2) for w in walls],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
