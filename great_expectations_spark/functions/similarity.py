"""Similarity search over embedding columns (``array<float>``).

* ``cosine`` / ``dot`` — pure JVM expressions (``zip_with`` + ``aggregate``).
* Brute-force top-k / threshold search against a small broadcast query set
  — the exact baseline.
* LSH (random hyperplane) bucketed search — the scale path: sign-bit
  signatures bucket the table so candidate generation never goes quadratic;
  refinement computes exact cosine on candidates only.
* Embedding near-duplicate pairs — LSH buckets + cosine threshold.

Hyperplanes are generated driver-side from a seeded numpy RNG (tiny:
n_bits × dim floats) and shipped as literal arrays — deterministic across
cluster sizes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.functions._exprutil import array_lit_f64
from great_expectations_spark.functions.dedup import (
    _register_cache,
    release_cached,  # noqa: F401 — re-exported: one registry for dedup+ANN
)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def _vec_lit(vec: Sequence[float]) -> Column:
    return array_lit_f64(vec)


def cosine_to_query(embedding: Column, query: Sequence[float]) -> Column:
    return cosine(embedding, _vec_lit(query))


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector: one projection +
    a k-row total ordering (orderBy + limit => TakeOrdered, no full sort
    materialization)."""
    return (
        df.select(
            F.col(id_column),
            F.round(
                cosine_to_query(F.col(embedding_column), query), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_column))
        .limit(k)
    )


def threshold_neighbors(
    df: DataFrame,
    query: Sequence[float],
    threshold: float,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
) -> DataFrame:
    """All vectors with cosine >= threshold to the query (deterministic
    set — no top-k boundary ties)."""
    return df.select(
        F.col(id_column),
        F.round(cosine_to_query(F.col(embedding_column), query), 6).alias(
            "cos_sim"
        ),
    ).filter(F.col("cos_sim") >= threshold)


def random_hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_signature(
    embedding: Column, planes: np.ndarray
) -> Column:
    """Sign-bit signature as a long (n_bits <= 63): bit i = 1 iff
    dot(v, plane_i) >= 0. JVM-side dot products against literal planes."""
    bits = [
        F.when(dot(embedding, _vec_lit(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in planes
    ]
    sig = F.lit(0).cast("long")
    for i, bit in enumerate(bits):
        sig = sig + (bit.cast("long") * F.lit(1 << i))
    return sig


def query_signature(query_arr: np.ndarray, planes: np.ndarray) -> int:
    """Driver-side sign-bit signature of one query vector.  Matches
    ``lsh_signature``'s per-element left-fold dot product exactly (same
    addition order) so the query lands in the same bucket the executors
    would put it in."""
    qsig = 0
    for i, p in enumerate(planes):
        acc = 0.0
        for x, y in zip(query_arr, p):
            acc += float(x) * float(y)
        if acc >= 0:
            qsig |= 1 << i
    return qsig


def probe_signatures(qsig: int, n_bits: int, max_hamming: int) -> List[int]:
    """All bucket signatures within ``max_hamming`` bit flips of ``qsig``
    (multi-probe set, sum_{h<=H} C(n_bits, h) entries)."""
    from itertools import combinations

    probes = []
    for h in range(max_hamming + 1):
        for combo in combinations(range(n_bits), h):
            s = qsig
            for b in combo:
                s ^= 1 << b
            probes.append(s)
    return probes


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    n_bits: int = 12,
    max_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict to vectors whose LSH bucket is within
    ``max_hamming`` bits of the query's bucket (multi-probe), then exact
    cosine on the candidates.  At 10^12 rows the signature column would be
    precomputed and the table bucketed/partitioned by it, turning probes
    into partition pruning."""
    query_arr = np.asarray(query, dtype=float)
    planes = random_hyperplanes(len(query_arr), n_bits, seed)
    qsig = query_signature(query_arr, planes)
    probe_sigs = probe_signatures(qsig, n_bits, max_hamming)
    sig_col = lsh_signature(F.col(embedding_column), planes)
    candidates = df.withColumn("__sig", sig_col).filter(
        F.col("__sig").isin(probe_sigs)
    )
    return brute_force_topk(
        candidates, list(query_arr), k, id_column, embedding_column
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    n_bits: int = 12,
    seed: int = 42,
    dim: Optional[int] = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by LSH signature,
    self-join within buckets, refine with exact cosine >= threshold.
    Near-identical vectors agree on all sign bits with high probability,
    so recall at thresholds ~0.98 is high while candidate generation stays
    linear-ish in table size."""
    if dim is None:
        # first NON-NULL embedding (a leading NULL row must not poison
        # dim inference for the whole table)
        first = (
            df.filter(F.col(embedding_column).isNotNull())
            .select(F.size(embedding_column).alias("d"))
            .first()
        )
        if first is None:
            # empty-result schema matches the normal path's id type
            id_type = df.schema[id_column].dataType.simpleString()
            return df.sparkSession.createDataFrame(
                [], f"id_a {id_type}, id_b {id_type}, cos_sim double"
            )
        dim = int(first["d"])
    planes = random_hyperplanes(dim, n_bits, seed)
    df = df.filter(F.col(embedding_column).isNotNull())
    sigs = df.select(
        F.col(id_column).alias("__id"),
        F.col(embedding_column).alias("__emb"),
        lsh_signature(F.col(embedding_column), planes).alias("__sig"),
    )
    sigs = _register_cache(sigs)
    # candidate generation on (sig, id) ONLY — the d-dim embedding arrays
    # never travel through the self-join shuffle; payloads re-attach to
    # the (small) candidate set afterwards
    keyed = sigs.select("__id", "__sig")
    l, r = keyed.alias("l"), keyed.alias("r")
    candidates = l.join(
        r,
        (F.col("l.__sig") == F.col("r.__sig"))
        & (F.col("l.__id") < F.col("r.__id")),
    ).select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
    ea = sigs.select(F.col("__id").alias("id_a"), F.col("__emb").alias("__ea"))
    eb = sigs.select(F.col("__id").alias("id_b"), F.col("__emb").alias("__eb"))
    return (
        candidates.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__ea"), F.col("__eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path -------------


def ivf_index(
    df: DataFrame,
    n_clusters: int = 64,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    seed: int = 42,
    train_fraction: Optional[float] = None,
):
    """Build an IVF index: k-means coarse quantizer (Spark MLlib — runs as
    distributed Lloyd iterations) + cluster assignment per vector.

    Returns (assigned_df, centroids) where ``assigned_df`` carries an
    ``__ivf_cluster`` int column and ``centroids`` is an (n_clusters, dim)
    numpy array kept driver-side (tiny).  At 10^12 rows the assigned table
    would be WRITTEN partitioned/bucketed by ``__ivf_cluster`` so probes
    become partition pruning; training runs on a sample
    (``train_fraction``) because the quantizer needs only cluster shape,
    not every point.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    base = df.select(
        F.col(id_column),
        F.col(embedding_column),
        array_to_vector(F.col(embedding_column).cast("array<double>")).alias(
            "__features"
        ),
    )
    train = base if train_fraction is None else base.sample(
        fraction=train_fraction, seed=seed
    )
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="__features",
        predictionCol="__ivf_cluster",
    ).fit(train)
    assigned = model.transform(base).drop("__features")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
) -> DataFrame:
    """IVF search: rank centroids by cosine to the query driver-side (an
    (n_clusters × dim) numpy op), scan only the ``n_probe`` nearest
    inverted lists, exact cosine top-k on the candidates.  With the
    assigned table bucketed by cluster this touches n_probe/n_clusters of
    the data; ``n_probe=n_clusters`` degrades to exact brute force."""
    q = np.asarray(query, dtype=float)
    qn = np.linalg.norm(q)
    cn = np.linalg.norm(centroids, axis=1)
    sims = (centroids @ q) / np.where(cn * qn == 0, 1, cn * qn)
    probes = [int(i) for i in np.argsort(-sims)[:n_probe]]
    candidates = assigned.filter(F.col("__ivf_cluster").isin(probes))
    return brute_force_topk(
        candidates, list(q), k, id_column, embedding_column
    )


# --- IVF-PQ: product-quantized residual codes + JVM ADC scan ---------------
# Reference surface: the ANN "scale path" family (SURVEY §2 beyond-reference
# LLM-pipeline ops).  Design follows Jégou et al., "Product Quantization
# for Nearest Neighbor Search" (TPAMI 2011) / the FAISS IVFPQ index,
# re-expressed Spark-first:
#   * coarse quantizer = distributed MLlib k-means (ivf_index geometry),
#     run in the L2-NORMALIZED space so inner product == cosine;
#   * per-subspace codebooks trained driver-side on a BOUNDED residual
#     sample (the codebooks need cluster shape, not every point — m × 256
#     × dsub floats, kilobytes);
#   * encoding is one vectorized pandas_udf (Arrow batches, pure numpy);
#   * the SEARCH scan is 100% JVM: approx_cos(x) = q̂·c(x) + Σ_j LUT[j,
#     code_j(x)] where the (m × 256) lookup table depends only on the
#     query, flattened into ONE array literal and indexed with
#     element_at inside an aggregate(zip_with(...)) expression — no
#     Python, no UDF, whole-stage codegen keeps the scan vectorized;
#   * exact re-rank of the refine_factor·k best ADC candidates via a
#     bare-id semi-join back to the full vectors.
# At 10^12 rows the encoded table is written partitioned by
# __ivf_cluster (probes become partition pruning) and the scan reads
# ONLY (id, cluster, 2·m-byte code) — with dim=64/m=8 that is a 16×
# column-pruned read vs the float32 vectors; the re-rank join touches
# refine_factor·k rows of the wide table.


def _kmeans_np(
    x: np.ndarray, k: int, seed: int, n_iter: int = 20
) -> np.ndarray:
    """Tiny driver-side Lloyd's k-means (numpy): used per PQ subspace on a
    bounded residual sample.  Deterministic under seed; empty clusters are
    re-seeded from the farthest points."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    k_eff = min(k, n)
    cents = x[rng.choice(n, size=k_eff, replace=False)].astype(np.float64)
    if k_eff < k:  # degenerate tiny sample: pad with repeats
        cents = np.vstack([cents, cents[rng.integers(0, k_eff, k - k_eff)]])
    for _ in range(n_iter):
        # (n, k) squared L2 via ||x||² - 2x·c + ||c||²  (rank by -2x·c+||c||²)
        d = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)
        assign = d.argmin(axis=1)
        far = d[np.arange(n), assign].argsort()[::-1]
        spill = 0
        for j in range(k):
            sel = assign == j
            if sel.any():
                cents[j] = x[sel].mean(axis=0)
            else:
                cents[j] = x[far[spill % n]]
                spill += 1
    return cents.astype(np.float32)


def ivfpq_index(
    df: DataFrame,
    n_clusters: int = 64,
    m: int = 8,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    seed: int = 42,
    train_fraction: Optional[float] = None,
    train_limit: int = 50_000,
):
    """Build an IVF-PQ index over ``embedding_column``.

    Returns ``(encoded, centroids, codebooks)``:

    * ``encoded`` — the input plus ``__ivf_cluster`` (int) and
      ``__pq_code`` (``array<smallint>``, length ``m``, values 0..255);
    * ``centroids`` — (n_clusters × dim) float32, the coarse quantizer in
      the normalized space (driver-side, tiny);
    * ``codebooks`` — (m × 256 × dim/m) float32 residual codebooks.

    ``dim`` must be divisible by ``m``.  All geometry lives in the
    L2-normalized space so the ADC score approximates COSINE similarity
    exactly as ``q̂ · (centroid + decode(code))``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    dim = int(
        df.select(F.size(F.col(embedding_column)).alias("d")).first()["d"]
    )
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")

    nrm = F.sqrt(
        F.aggregate(
            F.col(embedding_column).cast("array<double>"),
            F.lit(0.0),
            lambda acc, v: acc + v * v,
        )
    )
    unit = F.transform(
        F.col(embedding_column).cast("array<double>"),
        lambda v: v / F.when(nrm == 0, F.lit(1.0)).otherwise(nrm),
    )
    base = df.withColumn("__unit", unit).withColumn(
        "__features", array_to_vector(F.col("__unit"))
    )
    train = base if train_fraction is None else base.sample(
        fraction=train_fraction, seed=seed
    )
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="__features",
        predictionCol="__ivf_cluster",
    ).fit(train)
    assigned = model.transform(base).drop("__features")
    centroids = np.vstack(
        [np.asarray(c) for c in model.clusterCenters()]
    ).astype(np.float32)

    # bounded residual sample for the codebooks (driver-side, capped)
    samp = (
        assigned.select("__unit", "__ivf_cluster")
        .limit(train_limit)
        .toPandas()
    )
    vecs = np.vstack(samp["__unit"].to_numpy()).astype(np.float32)
    resid = vecs - centroids[samp["__ivf_cluster"].to_numpy()]
    dsub = dim // m
    codebooks = np.stack(
        [
            _kmeans_np(
                resid[:, j * dsub : (j + 1) * dsub], 256, seed + 1 + j
            )
            for j in range(m)
        ]
    )  # (m, 256, dsub)

    cb_bc = codebooks  # closed over; kilobytes, Arrow ships it per task
    cents_bc = centroids

    @pandas_udf("array<smallint>")
    def _encode(unit_s, cluster_s):
        import pandas as pd

        v = np.vstack(unit_s.to_numpy()).astype(np.float32)
        r = v - cents_bc[cluster_s.to_numpy()]
        codes = np.empty((v.shape[0], m), dtype=np.int16)
        for j in range(m):
            sub = r[:, j * dsub : (j + 1) * dsub]
            cb = cb_bc[j]  # (256, dsub)
            d = (
                -2.0 * (sub @ cb.T)
                + (cb * cb).sum(axis=1)[None, :]
            )
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    encoded = assigned.withColumn(
        "__pq_code", _encode(F.col("__unit"), F.col("__ivf_cluster"))
    ).drop("__unit")
    return encoded, centroids, codebooks


def ivfpq_topk(
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int = 4,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
) -> DataFrame:
    """IVF-PQ search: probe the ``n_probe`` best inverted lists, score
    candidates with the JVM-only ADC expression (no Python in the scan),
    keep ``refine_factor * k`` best by approximate score, exact-cosine
    re-rank those via a bare-id join back to the full vectors.

    Output schema matches ``brute_force_topk``: (id_column, cos_sim) —
    with ``n_probe = n_clusters`` and ``refine_factor`` large enough the
    result EQUALS brute force (the re-rank is exact on candidates)."""
    m, n_codes, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    qhat = (q / (qn if qn else 1.0)).astype(np.float32)

    cterm = centroids @ qhat  # (n_clusters,)
    probes = [int(i) for i in np.argsort(-cterm)[:n_probe]]
    # (m, 256) LUT — query-dependent, cluster-independent
    lut = np.stack(
        [codebooks[j] @ qhat[j * dsub : (j + 1) * dsub] for j in range(m)]
    )
    lut_flat_col = array_lit_f64(lut.reshape(-1))
    cterm_col = array_lit_f64(cterm)

    adc = (
        F.element_at(cterm_col, F.col("__ivf_cluster") + 1)
        + F.aggregate(
            F.zip_with(
                F.col("__pq_code").cast("array<int>"),
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda c, j: F.element_at(
                    lut_flat_col, j * n_codes + c + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    ).alias("approx_score")

    cand = (
        encoded.filter(F.col("__ivf_cluster").isin(probes))
        .select(F.col(id_column), adc)
        .orderBy(F.col("approx_score").desc(), F.col(id_column))
        .limit(max(k * refine_factor, k))
    )
    # exact re-rank: bare-id broadcast semi-join back to the wide vectors
    refined = encoded.join(
        F.broadcast(cand.select(id_column)), on=id_column, how="inner"
    )
    return brute_force_topk(refined, list(q), k, id_column, embedding_column)


def ivfpq_write(
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist an IVF-PQ index: the encoded table goes to
    ``<path>/codes`` PARTITIONED BY ``__ivf_cluster`` — so a probe-limited
    search becomes literal partition pruning (the scan's PartitionFilters
    carry the ``IN (probes)`` predicate and untouched inverted lists are
    never opened) — and the quantizer (centroids + codebooks, kilobytes)
    goes to ``<path>/quantizer.json`` through Spark's Hadoop FileSystem
    API, so ``file://``/``hdfs://``/``s3a://``/``gs://`` all work with no
    extra SDK.  One table serves both phases: the ADC scan reads only
    (id, cluster, code) via parquet column pruning; the exact re-rank
    join reads the embedding column for ``refine_factor·k`` rows only."""
    import json

    encoded.write.mode(mode).partitionBy("__ivf_cluster").parquet(
        f"{path}/codes"
    )
    spark = encoded.sparkSession
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/quantizer.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    payload = json.dumps(
        {
            "centroids": [[float(x) for x in row] for row in centroids],
            "codebooks": [
                [[float(x) for x in code] for code in book]
                for book in codebooks
            ],
        }
    )
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def ivfpq_load(spark, path: str):
    """Load an index written by :func:`ivfpq_write`; returns
    ``(encoded, centroids, codebooks)`` ready for :func:`ivfpq_topk`."""
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/quantizer.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        payload = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    q = json.loads(payload)
    centroids = np.asarray(q["centroids"], dtype=np.float32)
    codebooks = np.asarray(q["codebooks"], dtype=np.float32)
    encoded = spark.read.parquet(f"{path}/codes")
    return encoded, centroids, codebooks


# --- SemDeDup: semantic (embedding-space) deduplication --------------------


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    n_clusters: int = 64,
    seed: int = 42,
    train_fraction: Optional[float] = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public paper): k-means partition the embedding
    space (the :func:`ivf_index` coarse quantizer), compute pairwise
    cosine WITHIN each cluster only, keep pairs ``>= threshold``.

    This is the lower-threshold regime (~0.90-0.97) where
    :func:`embedding_near_dup_pairs`'s sign-LSH bucketing loses recall
    (semantic dups disagree on many hyperplane bits); k-means cells
    capture semantic neighborhoods instead.  Cross-cluster dups are
    deliberately missed — the paper's own semantics, and what bounds the
    quadratic term: expected within-cluster cost is ~n²/k vs n² for
    brute force, and each cluster's self-join co-locates on one shuffle
    key.  The self-join moves ONLY (cluster, id); embeddings re-attach
    to the (small) candidate set by bare-id joins afterwards.

    ``n_clusters`` tunes the recall/cost trade: more clusters = cheaper
    + lower recall.  At 10^12 rows, write ``ivf_index``'s assignment
    partitioned by cluster first and run per-partition.
    """
    if n_clusters <= 1:
        # exact mode: MLlib KMeans needs k >= 2, and one cluster is just
        # the brute-force all-pairs graph
        assigned = df.withColumn("__ivf_cluster", F.lit(0))
    else:
        assigned, _ = ivf_index(
            df, n_clusters, id_column, embedding_column, seed, train_fraction
        )
    base = assigned.select(
        F.col(id_column).alias("__id"),
        F.col(embedding_column).alias("__emb"),
        F.col("__ivf_cluster").alias("__c"),
    )
    base = _register_cache(base)
    keyed = base.select("__id", "__c")
    l, r = keyed.alias("l"), keyed.alias("r")
    candidates = l.join(
        r,
        (F.col("l.__c") == F.col("r.__c"))
        & (F.col("l.__id") < F.col("r.__id")),
    ).select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
    ea = base.select(F.col("__id").alias("id_a"), F.col("__emb").alias("__ea"))
    eb = base.select(F.col("__id").alias("id_b"), F.col("__emb").alias("__eb"))
    return (
        candidates.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__ea"), F.col("__eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 64,
    seed: int = 42,
    train_fraction: Optional[float] = None,
) -> DataFrame:
    """One-call semantic dedup: :func:`semantic_dedup_pairs` ->
    connected components -> keep one row per semantic cluster.  The
    survivor is the cluster's MIN id (deterministic, rerun-stable; the
    paper keeps a centroid-distance-ranked representative — a scoring
    delta, not a structural one, and min-id keeps resume semantics
    exact)."""
    from great_expectations_spark.functions.dedup import near_dedup

    pairs = semantic_dedup_pairs(
        df,
        threshold=threshold,
        id_column=id_column,
        embedding_column=embedding_column,
        n_clusters=n_clusters,
        seed=seed,
        train_fraction=train_fraction,
    )
    return near_dedup(df, id_column, pairs)
