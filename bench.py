#!/usr/bin/env python
"""Benchmark harness: headline engine workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "extra": {"turns_validated": N, "turns_per_sec": r, "cpus": c}}

The transcripts suite is the north-star workload (turns validated/sec for
the full expectation suite); the other queries cover the heavy operator
families (two-phase uniqueness, referential anti-join, drift split
histograms, MinHash dedup, ANN).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# transcripts table sized relative to sf: sf0.1 -> 50k convs (~600k turns)
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_CONVS = int(os.environ.get("SPARK_GRAFT_CONVS", str(int(500_000 * SF))))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    # shuffle partitioning is a DATA-size decision, not a core-count one:
    # pin it so the only variable between scaling runs is parallelism
    # (8 partitions at 12M rows spills and poisons the comparison)
    shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gx-spark-bench")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # heap must scale with thread count: 32 concurrent tasks' working
        # sets in a small heap GC-thrash and anti-scale
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    from pyspark.sql import functions as F

    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.datagen.transcripts import (
        default_suite,
        generate_transcripts,
    )
    from great_expectations_spark.functions import dedup, similarity
    from great_expectations_spark.functions import text as gxtext
    from great_expectations_spark.plans.planner import SuiteValidator

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extra: dict[str, object] = {"cpus": CPUS, "n_conversations": N_CONVS}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # --- north-star: full suite over the transcript table -----------------
    # Materialize the deterministic transcripts to parquet ONCE (reused
    # across runs and parallelism levels — byte-identical input), then
    # validate against the parquet scan like a real job would.  In-memory
    # persist is deliberately avoided: cache-writes of multi-KB strings
    # serialize on the block manager and anti-scale with thread count.
    max_text = int(os.environ.get("SPARK_GRAFT_MAXTEXT", "20000"))
    transcripts_path = os.environ.get(
        "SPARK_GRAFT_TRANSCRIPTS",
        f"/tmp/gx_bench_transcripts_{N_CONVS}_{max_text}",
    )
    if not os.path.exists(os.path.join(transcripts_path, "_SUCCESS")):
        generate_transcripts(
            spark, N_CONVS, max_text_chars=max_text
        ).write.mode("overwrite").parquet(transcripts_path)
    transcripts = spark.read.parquet(transcripts_path)
    n_turns = transcripts.count()  # materialize outside the timed window
    validator = SuiteValidator()
    res = timed(
        "suite_transcripts",
        lambda: validator.validate(
            transcripts, default_suite(), result_format="SUMMARY"
        ),
    )
    # steady-state (codegen/JIT warmed — what a long-running job sees);
    # best of two warm runs to damp shared-host noise
    timed(
        "suite_transcripts_warm",
        lambda: validator.validate(
            transcripts, default_suite(), result_format="SUMMARY"
        ),
    )
    warm2_t0 = time.perf_counter()
    validator.validate(transcripts, default_suite(), result_format="SUMMARY")
    timings["suite_transcripts_warm"] = round(
        min(timings["suite_transcripts_warm"], time.perf_counter() - warm2_t0),
        3,
    )
    extra["turns_validated"] = n_turns
    extra["turns_per_sec"] = round(
        n_turns / timings["suite_transcripts_warm"], 1
    )
    extra["turns_per_sec_cold"] = round(
        n_turns / timings["suite_transcripts"], 1
    )
    extra["suite_evaluated"] = res.statistics["evaluated_expectations"]

    if os.environ.get("SPARK_GRAFT_ONLY") == "transcripts":
        print(
            json.dumps(
                {
                    "metric": "transcript suite wall time",
                    "value": timings["suite_transcripts_warm"],
                    "unit": "sec",
                    "queries": timings,
                    "sf": SF,
                    "extra": extra,
                }
            )
        )
        spark.stop()
        return

    # --- TPC-H-ish operator workloads -------------------------------------
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    li_suite = (
        ExpectationSuite("lineitem")
        .add("expect_column_values_to_not_be_null", column="l_orderkey")
        .add(
            "expect_column_values_to_be_in_set",
            column="l_returnflag",
            value_set=["A", "N", "R"],
        )
        .add(
            "expect_column_values_to_be_between",
            column="l_quantity",
            min_value=1,
            max_value=50,
        )
        .add("expect_column_mean_to_be_between", column="l_discount", min_value=0)
        .add(
            "expect_column_quantile_values_to_be_between",
            column="l_extendedprice",
            quantile_ranges={
                "quantiles": [0.25, 0.5, 0.75],
                "value_ranges": [[0, None]] * 3,
            },
        )
        .add(
            "expect_column_unique_value_count_to_be_between",
            column="l_partkey",
            min_value=1,
            approximate=True,
        )
    )
    timed(
        "suite_lineitem",
        lambda: validator.validate(lineitem, li_suite, result_format="BASIC"),
    )

    uniq_suite = ExpectationSuite("u").add(
        "expect_compound_columns_to_be_unique",
        column_list=["l_orderkey", "l_linenumber"],
        mostly=0.1,
    )
    timed(
        "compound_unique",
        lambda: validator.validate(lineitem, uniq_suite, result_format="BASIC"),
    )

    ref_suite = ExpectationSuite("r").add(
        "expect_column_values_to_exist_in_other_table",
        column="l_orderkey",
        other_table=orders,
        other_column="o_orderkey",
    )
    timed(
        "referential_anti_join",
        lambda: validator.validate(lineitem, ref_suite, result_format="BASIC"),
    )

    drift_suite = (
        ExpectationSuite("d")
        .add(
            "expect_column_two_sample_ks_to_be_less_than",
            column="value",
            baseline_condition="ts < timestamp '2024-01-15 00:00:00'",
            threshold=0.5,
            bins=[0, 100, 200, 300, 400, 500],
        )
        .add(
            "expect_column_two_sample_chisquare_p_to_be_greater_than",
            column="event_type",
            baseline_condition="ts < timestamp '2024-01-15 00:00:00'",
            p=0.0,
        )
    )
    timed(
        "drift_two_sample",
        lambda: validator.validate(events, drift_suite, result_format="BASIC"),
    )

    timed(
        "text_profile",
        lambda: gxtext.text_profile(documents)
        .agg(
            F.sum("n_tokens"),
            F.avg("quality_score"),
            F.count_distinct("lang_pred"),
        )
        .collect(),
    )

    timed(
        "dedup_minhash",
        lambda: dedup.minhash_candidate_pairs(
            documents, "doc_id", "text", verify_threshold=0.4
        ).count(),
    )
    # steady-state: first run pays Python-worker startup + JIT; at the
    # 100 TB design point those amortize to zero, so report both
    timed(
        "dedup_minhash_warm",
        lambda: dedup.minhash_candidate_pairs(
            documents, "doc_id", "text", verify_threshold=0.4
        ).count(),
    )
    timed(
        "dedup_simhash",
        lambda: dedup.simhash_candidate_pairs(
            documents, "doc_id", "text", max_hamming=10
        ).count(),
    )

    qrow = embeddings.select("embedding").first()
    query = [float(v) for v in qrow["embedding"]]
    emb = embeddings.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    timed(
        "ann_bruteforce_topk",
        lambda: similarity.brute_force_topk(emb, query, 10).collect(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "gx-spark headline suite+operator wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
