"""Deterministic corpus sharding: the output stage of a curation
pipeline — lay a validated/curated corpus out as size-balanced shards
whose membership and in-shard order are a pure function of the data
(stable across partitionings, cluster sizes, and reruns).

The reference (tmilitino/great_expectations) validates tables but never
writes curated output; the closest surface is its hash sampler
(``execution_engine/split_and_sample/sparkdf_data_sampler.py:142`` —
deterministic bucket membership by hash), which this module extends
from "keep a bucket" to "lay every row into a numbered, size-bounded
bucket, in a canonical order".  Training pipelines need exactly this:
N roughly-equal shards, reproducible byte-for-byte, so a run can be
resumed/diffed and data order is decoupled from Spark's physical
partitioning.

Plan shape (the one that survives 100 TB):

1. canonical order is ``(bucket, id)`` where the bucket is a caller
   column (e.g. source) or ``pmod(xxhash64(id), num_buckets)``;
2. per-bucket totals via ONE partial-agg shuffle → a bounded
   O(num_buckets) driver collect (never O(rows));
3. cumulative base offsets drive a per-bucket window running sum —
   the only per-row shuffle is the window's hash-by-bucket exchange;
4. ``shard = floor(global_offset / per_shard)`` — rows (or token
   mass) per shard, computed without any global single-reducer sort;
5. the writer repartitions by shard id (each shard lands wholly in
   one task → one file per shard directory) and sorts within
   partitions so in-shard order is canonical.

Skew note: balance is by construction — shards are consecutive slices
of the global offset space, so no shard exceeds ``per_shard`` rows (or
``per_shard + max_doc_tokens`` tokens), whatever the key distribution.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["shard_assignments", "write_shards"]

_ID = "__sh_id"
_BUCKET = "__sh_bucket"
_WEIGHT = "__sh_w"
_BASE = "__sh_base"
_LOCAL = "__sh_local"


def _weight_column(
    text_column: Optional[str], n_tokens_column: Optional[str]
) -> Optional[Column]:
    """Row weight for token-balanced sharding; None = row-balanced."""
    if n_tokens_column is not None:
        return F.coalesce(F.col(n_tokens_column).cast("long"), F.lit(0))
    if text_column is not None:
        from great_expectations_spark.functions.text import token_count

        return F.coalesce(
            token_count(F.col(text_column)).cast("long"), F.lit(0)
        )
    return None


def _assignments(
    df: DataFrame,
    id_column: str,
    rows_per_shard: Optional[int],
    tokens_per_shard: Optional[int],
    text_column: Optional[str],
    n_tokens_column: Optional[str],
    bucket_column: Optional[str],
    num_buckets: int,
) -> Tuple[DataFrame, int, int]:
    """(df + ``shard``/``order_idx`` columns, n_shards, total_rows) —
    one bounded collect.  The assignment rides the input frame itself
    (no join back on the id), so null or duplicate ids cannot drop or
    multiply rows; duplicate ids merely make the tie order within their
    bucket partition-dependent (document ids are unique in any sane
    corpus — uniqueness is the caller's contract, not enforced here)."""
    if (rows_per_shard is None) == (tokens_per_shard is None):
        raise ValueError(
            "pass exactly one of rows_per_shard / tokens_per_shard"
        )
    per_shard = (
        rows_per_shard if rows_per_shard is not None else tokens_per_shard
    )
    if per_shard is None or per_shard <= 0:
        raise ValueError(f"per-shard size must be positive, got {per_shard}")

    if tokens_per_shard is not None:
        weight = _weight_column(text_column, n_tokens_column)
        if weight is None:
            raise ValueError(
                "tokens_per_shard needs text_column or n_tokens_column"
            )
    else:
        weight = F.lit(1).cast("long")
    bucket = (
        F.col(bucket_column)
        if bucket_column is not None
        else F.pmod(F.xxhash64(F.col(id_column)), F.lit(num_buckets))
    )
    for reserved in (_BUCKET, _WEIGHT, _LOCAL, _BASE, "__bb"):
        if reserved in df.columns:
            raise ValueError(f"reserved column name in input: {reserved}")
    work = df.withColumn(_BUCKET, bucket).withColumn(_WEIGHT, weight)

    # bounded O(num_buckets) driver step — same shape as
    # packing.pack_concat_chunks phase 1 (one partial-agg row per bucket)
    totals = (
        work.groupBy(_BUCKET)
        .agg(
            F.sum(_WEIGHT).alias("__sum"),
            F.count(F.lit(1)).alias("__rows"),
        )
        .collect()
    )
    base, total_rows, offsets = 0, 0, []
    for row in sorted(totals, key=lambda r: (r[_BUCKET] is None, r[_BUCKET])):
        offsets.append((row[_BUCKET], base))
        base += row["__sum"]
        total_rows += row["__rows"]
    n_shards = max(1, math.ceil(base / per_shard)) if base else (
        1 if total_rows else 0
    )
    bases = df.sparkSession.createDataFrame(
        offsets, schema=work.select(_BUCKET).schema.add(_BASE, "long")
    )

    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(F.col(id_column))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = work.withColumn(
        _LOCAL, F.coalesce(F.sum(_WEIGHT).over(w), F.lit(0))
    )
    out = (
        local.join(
            F.broadcast(bases.withColumnRenamed(_BUCKET, "__bb")),
            local[_BUCKET].eqNullSafe(F.col("__bb")),
            "left",
        )
        .withColumn("order_idx", F.col(_BASE) + F.col(_LOCAL))
        .withColumn(
            "shard",
            F.least(
                F.floor(F.col("order_idx") / per_shard),
                F.lit(max(n_shards - 1, 0)),
            ).cast("int"),
        )
        .select(*df.columns, "shard", "order_idx")
    )
    return out, n_shards, total_rows


def shard_assignments(
    df: DataFrame,
    id_column: str = "doc_id",
    *,
    rows_per_shard: Optional[int] = None,
    tokens_per_shard: Optional[int] = None,
    text_column: Optional[str] = None,
    n_tokens_column: Optional[str] = None,
    bucket_column: Optional[str] = None,
    num_buckets: int = 64,
) -> DataFrame:
    """Assign every row a shard id and a canonical order index.

    Exactly one of ``rows_per_shard`` / ``tokens_per_shard`` must be
    set.  Token balancing weighs each row by ``n_tokens_column`` (or a
    whitespace ``token_count`` of ``text_column``); a row is never
    split, so a token shard may overshoot by at most one document.

    Returns ``(id_column, shard, order_idx)`` — ``order_idx`` is the
    row's global offset (row index, or starting token offset) in the
    canonical ``(bucket, id)`` stream; sorting any shard by it
    reproduces the canonical order.  Deterministic: independent of
    input partitioning and parallelism.  A last shard shorter than
    ``per_shard`` folds into shard ``n_shards - 1`` (no tiny trailing
    shard beyond the computed count).
    """
    out, _, _ = _assignments(
        df,
        id_column,
        rows_per_shard,
        tokens_per_shard,
        text_column,
        n_tokens_column,
        bucket_column,
        num_buckets,
    )
    return out.select(id_column, "shard", "order_idx")


def write_shards(
    df: DataFrame,
    path: str,
    id_column: str = "doc_id",
    *,
    rows_per_shard: Optional[int] = None,
    tokens_per_shard: Optional[int] = None,
    text_column: Optional[str] = None,
    n_tokens_column: Optional[str] = None,
    bucket_column: Optional[str] = None,
    num_buckets: int = 64,
    format: str = "parquet",
    mode: str = "error",
) -> Dict[str, int]:
    """Write ``df`` as deterministic size-balanced shards under
    ``path/shard=K/`` (one file per shard, canonical in-shard order).

    Two full-data exchanges total: the per-bucket window (order
    assignment, computed ON the payload rows — no join back on the id,
    so null/duplicate ids can never drop or multiply rows) and the
    repartition-by-shard before the write; the shard and row counts
    come from the assignment phase's bounded per-bucket collect, so no
    extra driver job scans the corpus.  Returns ``{"n_shards", "rows"}``.
    """
    assigned, n_shards, total_rows = _assignments(
        df,
        id_column,
        rows_per_shard,
        tokens_per_shard,
        text_column,
        n_tokens_column,
        bucket_column,
        num_buckets,
    )
    if n_shards == 0:
        # empty input: write the (empty) frame unpartitioned — a
        # partitionBy write of zero rows leaves no files at all, which
        # a reader cannot infer a schema from
        df.limit(0).withColumn(
            "shard", F.lit(0).cast("int")
        ).write.format(format).mode(mode).save(path)
        return {"n_shards": 0, "rows": 0}
    # each shard hashes to exactly one task → partitionBy emits exactly
    # one file per shard directory; sortWithinPartitions pins the order
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_idx")
        .drop("order_idx")
        .write.format(format)
        .mode(mode)
        .partitionBy("shard")
        .save(path)
    )
    return {"n_shards": n_shards, "rows": total_rows}
