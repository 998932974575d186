#!/usr/bin/env python
"""EXECUTOR-scaling evidence via spark-submit + local-cluster mode.

The north rule's criterion is throughput scaling efficiency >= 0.8 going
from N to 4N *executors*, with the job shipped as
`spark-submit --py-files`.  This sandbox has no multi-machine cluster,
but the full Spark distribution at /opt/spark supports
`local-cluster[numWorkers, coresPerWorker, memoryMB]` — Spark's
cluster-mode test harness that launches REAL separate executor JVMs
(own heap, own GC, own python workers, shuffle over the block-transfer
service) with the driver talking to them exactly as it would on a
standalone cluster.  That is one honest rung closer to executor-scaling
than `local[k]` threads sharing one JVM:

  - N level : local-cluster[2,2,M]  -> 2 executors x 2 cores =  4 cores
  - 4N level: local-cluster[8,2,M]  -> 8 executors x 2 cores = 16 cores

Totals (4 vs 16 task slots) are chosen so even the 4N level leaves
headroom on this 32-core host — the remaining gap to a real cluster is
that all executors still share one socket's DRAM bandwidth, which only
penalizes the measurement (a real 4N-node scale-up multiplies bandwidth
with nodes).

Each executor JVM gets `-XX:ActiveProcessorCount=<its granted cores>`.
Without it every JVM sizes GC/JIT/netty thread pools for all 32 host
cores (`Runtime.availableProcessors`), so the 8-executor level runs
8 x ~23 GC threads and degrades pass-over-pass (measured 46 -> 86 s
on identical passes) — an artifact that only exists because the
"cluster" shares one host.  On a real cluster each executor owns its
cores, so capping the pools to the grant is the faithful emulation,
applied identically at both levels.

The job itself is shipped the way the rule says: the package is zipped
and passed via `spark-submit --py-files gx_spark.zip`; the inner driver
imports great_expectations_spark from that zip, not from the repo tree.

Protocol: per level, fresh spark-submit per round (fresh driver AND
executor JVMs), interleaved rounds across levels, REPEATS suite passes
per JVM (first pass is cold planning/JIT; min over passes = warm
steady-state), minima across rounds per level.

Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATASET = os.environ.get(
    "SPARK_GRAFT_TRANSCRIPTS", "/tmp/gx_bench_transcripts_2000000_256"
)
# "suite" = one whole-table SuiteValidator pass; "grouped" =
# validate_by_partition (every day-partition's whole suite in O(1) jobs,
# the 10^12-row strategy).  Inherited by the inner driver via env.
MODE = os.environ.get("SPARK_GRAFT_SCALING_MODE", "suite")
# driver-side intra-suite job concurrency (SuiteValidator job_concurrency);
# 1 = sequential submission, for isolating the serial-driver Amdahl term
JOB_CONCURRENCY = int(os.environ.get("SPARK_GRAFT_JOB_CONCURRENCY", "8"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "4"))
SPARK_SUBMIT = os.environ.get(
    "SPARK_SUBMIT", os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"),
                                 "bin", "spark-submit")
)
# (workers, cores_per_worker): 2x2=4 cores (N) vs 8x2=16 cores (4N).
# Override with SPARK_GRAFT_LEVELS="1x1,4x1" to pick another N-vs-4N
# pair (first entry is N, second 4N) — e.g. 1 vs 4 single-core
# executors isolates executor-scaling from single-socket DRAM
# saturation, which the 16-core level measurably hits.
def _levels() -> dict:
    spec = os.environ.get("SPARK_GRAFT_LEVELS")
    if not spec:
        return {"N": (2, 2), "4N": (8, 2)}
    lo, hi = spec.split(",")
    w1, c1 = (int(x) for x in lo.split("x"))
    w2, c2 = (int(x) for x in hi.split("x"))
    return {"N": (w1, c1), "4N": (w2, c2)}


LEVELS = _levels()
WORKER_MEM_MB = 6144
EXECUTOR_MEM = "5g"


def _cpu_ticks() -> tuple:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    # busy = user+nice+system+irq+softirq ; steal = field 8
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
    steal = vals[7] if len(vals) > 7 else 0
    return busy, steal


def inner() -> None:
    """Runs INSIDE spark-submit; package comes from --py-files."""
    from pyspark.sql import SparkSession

    import great_expectations_spark as gx
    from great_expectations_spark.datagen.transcripts import default_suite

    spark = SparkSession.builder.appName("gx-executor-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if MODE == "cc":
        # connected-components over the chain-heavy worst-case graph
        # (jobs/cc_scaling.py geometry), distributed star rounds forced
        from pyspark.sql import functions as F

        from great_expectations_spark.functions import dedup

        n = int(os.environ.get("SPARK_GRAFT_CC_CHAINS", "500000"))
        L = int(os.environ.get("SPARK_GRAFT_CC_CHAIN_LEN", "10"))
        chain = spark.range(n * L).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        ).filter((F.col("id_a") % L) != L - 1)
        rnd = spark.range(n // 4).select(
            F.abs(F.xxhash64("id") % (n * L)).alias("id_a"),
            F.abs(F.xxhash64(F.col("id") + 7) % (n * L)).alias("id_b"),
        )
        pairs = chain.union(rnd).localCheckpoint(eager=True)
        n_turns = pairs.count()
        walls = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            nodes = dedup.connected_components(
                pairs, driver_threshold=0
            ).count()
            walls.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "turns": n_turns,
            "mode": MODE,
            "nodes": nodes,
            "default_parallelism": spark.sparkContext.defaultParallelism,
            "success": True,
            "walls": walls,
            "best": min(walls),
        }))
        spark.stop()
        return
    if MODE == "curate":
        # full staged curation pipeline (C4 -> Gopher -> exact dedup ->
        # 13-gram decontam -> PII redact -> perplexity filter -> DSIR ->
        # mixture) END TO END, model training INCLUDED in the timed
        # window — the round-5 question is whether the driver-side
        # model-training term (bounded histograms, constant-size)
        # amortizes across executor counts like validation did
        from pyspark.sql import functions as F

        from great_expectations_spark.functions import curation

        df = spark.read.parquet(DATASET)
        # transcript turns carry no terminal punctuation, which C4's
        # line rule (correctly) treats as droppable boilerplate — a
        # trailing period keeps every stage's compute live so the
        # measurement exercises the real pipeline, not an empty one
        docs = df.select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
            F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit("."))
            .alias("text"),
            F.col("role").alias("source"),
        )
        n_turns = docs.count()
        bench_df = docs.filter(
            F.abs(F.xxhash64("doc_id")) % 100_001 == 0
        ).select("text")
        walls = []
        kept = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            train_sample = docs.filter(F.col("doc_id") % 37 == 0)
            ppl_model = curation.train_ngram_lm(
                train_sample, n_buckets=1 << 14
            )
            dsir_model = curation.train_dsir(
                bench_df, train_sample, n_buckets=1 << 14
            )
            out, _rep = curation.curate_corpus(
                docs,
                c4=True,
                c4_kwargs={"min_words_per_line": 1, "min_sentences": 1},
                gopher=True,
                # permissive thresholds: the gate's rule columns all
                # compute (same JVM cost), but chat-turn-shaped text is
                # not judged by web-page priors
                gopher_kwargs={
                    "thresholds": {
                        "min_words": 1,
                        "min_mean_word_len": None,
                        "max_mean_word_len": None,
                        "min_alpha_word_frac": None,
                        "min_stopwords": None,
                        "max_symbol_word_ratio": None,
                    }
                },
                dedup_method="exact",
                benchmark_df=bench_df,
                decontam_n=13,
                redact_kinds=["email"],
                perplexity_model=ppl_model,
                perplexity_max=1e9,
                dsir_model=dsir_model,
                # float fraction -> the distributed approxQuantile-cutoff
                # selection (the documented 10^12-row path).  An int k
                # routes through TakeOrdered, whose driver-side merge of
                # num_partitions x k rows is a SERIAL term: measured
                # ~24 s/pass at k=100k over 64 partitions, capping
                # executor-scaling efficiency at 0.59-0.70 (Amdahl fit in
                # SCALING.md round 5) — the same job at the fraction path
                # keeps selection fully distributed
                dsir_keep=0.08,
                mixture_column="source",
                mixture_weights={
                    "user": 0.4, "assistant": 0.4, "system": 0.1,
                    "tool": 0.1,
                },
                seed="scale",
            )
            kept = out.count()
            walls.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "turns": n_turns,
            "mode": MODE,
            "kept": kept,
            "default_parallelism": spark.sparkContext.defaultParallelism,
            "success": kept is not None and kept > 0,
            "walls": walls,
            "best": min(walls),
        }))
        spark.stop()
        return
    df = spark.read.parquet(DATASET)
    n_turns = df.count()  # materialize FS cache / executor registration
    suite = default_suite()
    validator = gx.SuiteValidator(job_concurrency=JOB_CONCURRENCY)
    walls = []
    success = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        if MODE == "grouped":
            from great_expectations_spark.checkpoint.runner import (
                validate_by_partition,
            )

            results = validate_by_partition(df, suite, "day")
            success = all(r.success for r in results.values())
        else:
            res = validator.validate(df, suite, result_format="SUMMARY")
            success = res.success
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "turns": n_turns,
        "mode": MODE,
        "job_concurrency": JOB_CONCURRENCY,
        "executors": spark.conf.get("spark.executor.instances", "?"),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "success": success,
        "walls": walls,
        "best": min(walls),
    }))
    spark.stop()


def build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "great_expectations_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py") or f.endswith(".json"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


def submit(workers: int, cores: int, zip_path: str) -> dict:
    master = f"local-cluster[{workers},{cores},{WORKER_MEM_MB}]"
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--py-files", zip_path,
        "--conf", "spark.sql.shuffle.partitions=64",
        # 88 x ~22MB input files pack into ~16 scan partitions at the
        # default 128m — a SINGLE task wave at the 4N level, so one
        # hypervisor-steal straggler sets the whole wall.  32m splits
        # give ~64 scan tasks (4 waves at 4N, 16 at N): stragglers
        # average out at both levels.  Same discipline at 100 TB: task
        # split sizing is a property of the data, not the cluster size.
        "--conf", "spark.sql.files.maxPartitionBytes=32m",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.executor.memory={EXECUTOR_MEM}",
        "--conf", "spark.driver.memory=8g",
        "--conf",
        f"spark.executor.extraJavaOptions=-XX:ActiveProcessorCount={cores}",
        "--conf", "spark.driver.extraJavaOptions=-XX:ActiveProcessorCount=4",
        os.path.abspath(__file__), "--inner",
    ]
    t0 = _cpu_ticks()
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, check=True,
        # a 10^8-turn corpus at a single 1-core executor legitimately
        # runs ~45 min per JVM (count + REPEATS passes)
        timeout=int(os.environ.get("SPARK_GRAFT_SUBMIT_TIMEOUT", "1800")),
    )
    t1 = _cpu_ticks()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    busy, steal = t1[0] - t0[0], t1[1] - t0[1]
    r["steal_pct"] = round(100 * steal / max(busy + steal, 1), 1)
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument(
        "--single",
        metavar="WxC",
        help="run ONE spark-submit round at local-cluster[W,C] and print "
        "its JSON (for the quiet-window runner: one fire = one round of "
        "one level, so steal-free windows can be used per-level)",
    )
    args = ap.parse_args()
    if args.inner:
        inner()
        return

    zip_path = "/tmp/gx_spark_pkg.zip"
    build_zip(zip_path)

    if args.single:
        w, c = (int(x) for x in args.single.split("x"))
        r = submit(w, c, zip_path)
        r["level"] = args.single
        print(json.dumps(r))
        return
    results: dict[str, list] = {k: [] for k in LEVELS}
    for round_no in range(ROUNDS):
        for name, (workers, cores) in LEVELS.items():
            r = submit(workers, cores, zip_path)
            results[name].append(r)
            print(
                f"round {round_no} {name} ({workers} exec x {cores} cores):"
                f" best={r['best']}s walls={r['walls']}"
                f" steal={r['steal_pct']}%",
                file=sys.stderr, flush=True,
            )
    turns = results["N"][0]["turns"]
    t_n = min(r["best"] for r in results["N"])
    t_4n = min(r["best"] for r in results["4N"])
    print(json.dumps({
        "turns": turns,
        "mode": MODE,
        "job_concurrency": JOB_CONCURRENCY,
        "dataset": DATASET,
        "levels": {k: f"local-cluster[{w},{c},{WORKER_MEM_MB}]"
                   for k, (w, c) in LEVELS.items()},
        "N_best_sec": t_n,
        "4N_best_sec": t_4n,
        "N_turns_per_sec": round(turns / t_n, 1),
        "4N_turns_per_sec": round(turns / t_4n, 1),
        "scaling_efficiency": round((t_n / t_4n) / 4, 3),
        "all_bests": {k: [r["best"] for r in rs]
                      for k, rs in results.items()},
        "all_steal_pct": {k: [r["steal_pct"] for r in rs]
                          for k, rs in results.items()},
    }))


if __name__ == "__main__":
    main()
