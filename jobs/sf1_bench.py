#!/usr/bin/env python
"""sf1 (10x) scale evidence: the same jobs at sf0.1 and a deterministic
10x corpus, demonstrating the designs' cost curves hold as data grows.

Two measurements:

1. Suite validation: the full default transcript suite at ~2.5M turns
   (200k conversations) and 10x that (the 2M-conversation scaling
   dataset, ~25.4M turns) — throughput should RISE with scale as fixed
   driver/planning cost amortizes, because the plan's shuffle volume is
   O(partitions), not O(rows).

2. MinHash dedup: `minhash_candidate_pairs` over the sf0.1 documents
   (5k docs) and a deterministic 10x corpus (50k docs = 10 perturbed
   copies; copy i appends an i-dependent token every 8 words, changing
   ~1/8 of shingles so copies are near- but not exact duplicates).
   Candidate-pair count and wall time should grow ~linearly in docs —
   the banding keeps the per-bucket join sub-quadratic.

Deterministic input only (no external data); prints one JSON line.
Run AFTER bench_scaling (never concurrently — shared-host noise).
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

from great_expectations_spark.datagen.transcripts import (
    default_suite,
    generate_transcripts,
)
from great_expectations_spark.functions import dedup
from great_expectations_spark.plans.planner import SuiteValidator

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))


def build_spark() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("gx-sf1-bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _transcripts(spark, n_convs: int, max_text: int) -> str:
    path = f"/tmp/gx_bench_transcripts_{n_convs}_{max_text}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_transcripts(
            spark, n_convs, max_text_chars=max_text
        ).write.mode("overwrite").parquet(path)
    return path


def _docs_10x(spark, base_path: str) -> str:
    """10 near-duplicate copies of the sf0.1 documents: copy i>0 injects
    a copy-dependent token every 8 words so shingle sets overlap ~7/8 —
    near-dup-rich, deterministic, no external data."""
    out = "/tmp/gx_sf1_documents_10x"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        base = spark.read.parquet(base_path).select("doc_id", "text")
        n = base.count()
        copies = [base.withColumn("doc_id", F.col("doc_id").cast("long"))]
        for i in range(1, 10):
            copies.append(
                base.select(
                    (F.col("doc_id").cast("long") + i * n).alias("doc_id"),
                    F.regexp_replace(
                        "text",
                        r"((?:\S+\s+){8})",
                        f"$1c{i} ",
                    ).alias("text"),
                )
            )
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        u.repartition(64).write.mode("overwrite").parquet(out)
    return out


def timed_min(fn, repeats: int = REPEATS) -> tuple:
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        walls.append(round(time.perf_counter() - t0, 3))
    return min(walls), walls, out


def main() -> None:
    spark = build_spark()
    validator = SuiteValidator()
    result = {"cpus": CPUS, "repeats": REPEATS}

    # --- 1. suite validation at two turn scales -------------------------
    suite = default_suite()
    for label, n_convs in (("1x", 200_000), ("10x", 2_000_000)):
        path = _transcripts(spark, n_convs, 256)
        df = spark.read.parquet(path)
        n_turns = df.count()
        wall, walls, res = timed_min(
            lambda: validator.validate(df, suite, result_format="SUMMARY")
        )
        result[f"suite_{label}"] = {
            "turns": n_turns,
            "wall_s": wall,
            "walls": walls,
            "turns_per_sec": round(n_turns / wall, 1),
            "expectations": res.statistics["evaluated_expectations"],
        }

    # --- 2. minhash dedup at 5k and 50k docs ----------------------------
    base_path = os.path.join(SF_DIR, "documents.parquet")
    big_path = _docs_10x(spark, base_path)
    for label, path in (("5k", base_path), ("50k", big_path)):
        df = spark.read.parquet(path).select("doc_id", "text")
        n_docs = df.count()
        wall, walls, _ = timed_min(
            lambda: dedup.minhash_candidate_pairs(
                df, "doc_id", "text", verify_threshold=0.7
            ).count(),
            repeats=REPEATS,
        )
        pairs = dedup.minhash_candidate_pairs(
            df, "doc_id", "text", verify_threshold=0.7
        ).count()
        result[f"minhash_{label}"] = {
            "docs": n_docs,
            "wall_s": wall,
            "walls": walls,
            "pairs": pairs,
            "docs_per_sec": round(n_docs / wall, 1),
        }

    s_small = result["suite_1x"]
    s_big = result["suite_10x"]
    result["suite_throughput_ratio_big_over_small"] = round(
        s_big["turns_per_sec"] / s_small["turns_per_sec"], 2
    )
    m_small = result["minhash_5k"]
    m_big = result["minhash_50k"]
    result["minhash_wall_ratio_10x_data"] = round(
        m_big["wall_s"] / m_small["wall_s"], 2
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
