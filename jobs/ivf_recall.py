#!/usr/bin/env python
"""IVF ANN recall evidence: recall@k of ``ivf_topk`` against the exact
brute-force oracle across n_probe settings.

Prints one JSON line and a markdown table row block for BENCH_NOTES.md.

Env:
  SPARK_GRAFT_SF_DIR   embeddings source (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  IVF_QUERIES          number of query vectors (default 20)
  IVF_CLUSTERS         coarse-quantizer k (default 64)
  IVF_PQ_M             also measure IVF-PQ with m subspaces (0 = skip;
                       e.g. 8 -> 8 one-byte codes per vector)
  IVF_PQ_REFINE        PQ re-rank candidate factor (default 4)
  IVF_SCALE            replicate the table this many times with
                       deterministic perturbations (default 1 — real data
                       only; 10 gives the 10x scale point without
                       external data)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_QUERIES = int(os.environ.get("IVF_QUERIES", "20"))
N_CLUSTERS = int(os.environ.get("IVF_CLUSTERS", "64"))
SCALE = int(os.environ.get("IVF_SCALE", "1"))
PQ_M = int(os.environ.get("IVF_PQ_M", "0"))
PQ_REFINE = int(os.environ.get("IVF_PQ_REFINE", "4"))
K = 10
PROBES = [1, 2, 4, 8, 16]


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from great_expectations_spark.functions import similarity

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ivf-recall")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    if SCALE > 1:
        # deterministic 10x scale point without external data: shifted
        # copies with a small id-dependent rotation of component order and
        # an offset — preserves vector-space shape, changes identities
        n = emb.count()
        copies = [emb]
        for c in range(1, SCALE):
            copies.append(
                emb.select(
                    (F.col("vec_id") + F.lit(c * n)).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: x + (F.lit(float(c)) * 0.01) * F.cos(
                            i.cast("double") + F.lit(float(c))
                        ),
                    ).alias("embedding"),
                )
            )
        base = copies[0]
        for c in copies[1:]:
            base = base.union(c)
        emb = base
    emb = emb.repartition(32).persist()
    n_vectors = emb.count()

    queries = [
        [float(v) for v in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()
    ]

    # exact ground truth per query
    truth = []
    for q in queries:
        ids = {
            r["vec_id"]
            for r in similarity.brute_force_topk(emb, q, K).collect()
        }
        truth.append(ids)

    assigned, centroids = similarity.ivf_index(emb, n_clusters=N_CLUSTERS)
    assigned = assigned.persist()
    assigned.count()

    recalls = {}
    for n_probe in PROBES:
        hits = total = 0
        for q, t in zip(queries, truth):
            got = {
                r["vec_id"]
                for r in similarity.ivf_topk(
                    assigned, centroids, q, K, n_probe=n_probe
                ).collect()
            }
            hits += len(got & t)
            total += len(t)
        recalls[n_probe] = round(hits / total, 4)

    pq_recalls = {}
    if PQ_M:
        encoded, pq_cents, codebooks = similarity.ivfpq_index(
            emb, n_clusters=N_CLUSTERS, m=PQ_M
        )
        encoded = encoded.persist()
        encoded.count()
        for n_probe in PROBES:
            hits = total = 0
            for q, t in zip(queries, truth):
                got = {
                    r["vec_id"]
                    for r in similarity.ivfpq_topk(
                        encoded, pq_cents, codebooks, q, K,
                        n_probe=n_probe, refine_factor=PQ_REFINE,
                    ).collect()
                }
                hits += len(got & t)
                total += len(t)
            pq_recalls[n_probe] = round(hits / total, 4)

    result = {
        "metric": "ivf recall@10 vs brute force",
        "sf_dir": SF_DIR,
        "n_vectors": n_vectors,
        "scale_copies": SCALE,
        "n_clusters": N_CLUSTERS,
        "n_queries": N_QUERIES,
        "recall_at_10_by_n_probe": recalls,
        "scan_fraction_by_n_probe": {
            p: round(p / N_CLUSTERS, 4) for p in PROBES
        },
    }
    if PQ_M:
        result["pq_m"] = PQ_M
        result["pq_refine_factor"] = PQ_REFINE
        result["pq_recall_at_10_by_n_probe"] = pq_recalls
    print(json.dumps(result))
    print()
    print(f"| n_probe | scan fraction | recall@10 (n={n_vectors}) |")
    print("|---|---|---|")
    for p in PROBES:
        row = f"| {p} | {p}/{N_CLUSTERS} = {p/N_CLUSTERS:.3f} | {recalls[p]:.4f} |"
        if PQ_M:
            row += f" {pq_recalls[p]:.4f} (pq m={PQ_M}) |"
        print(row)
    spark.stop()


if __name__ == "__main__":
    main()
