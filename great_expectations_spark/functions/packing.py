"""Sequence packing: variable-length documents -> fixed-size training
blocks (context windows).

The reference (tmilitino/great_expectations) validates corpora but does
not prepare them; this module supplies the packing stage every
large-scale pretraining pipeline runs after curation (closest reference
surface is the hash sampler ``sparkdf_data_sampler.py:142`` — both
assign rows to deterministic buckets; packing additionally lays the
buckets out as a token stream).  Two schemes:

1. :func:`pack_concat_chunks` — the standard GPT-style scheme:
   concatenate all documents in one deterministic global order and
   slice the token stream into fixed ``block_size`` blocks (documents
   may straddle block boundaries).  Implemented as a distributed
   two-phase prefix sum: per-bucket token totals (ONE partial-agg
   shuffle, one collected row per bucket), driver-side cumulative base
   offsets over the bounded bucket list, then a per-bucket window for
   the local running sum — there is never a global single-reducer
   window, and the only per-row shuffle is the window's
   hash-by-bucket exchange.  At 10^12 rows the collect is
   O(num_buckets), not O(rows).

2. :func:`pack_greedy` — no-split packing: each document lands whole
   in exactly one pack of ``capacity`` tokens.  Bounded first-fit
   (-decreasing by default) inside each hash bucket via ONE
   ``mapInPandas`` pass; the open-bin list is capped so executor
   memory is O(max_open_bins) regardless of partition size.  Pack ids
   are globally unique (task partition id in the high bits).

Both schemes are deterministic across partitionings and cluster sizes:
chunk order is (bucket, id) where the bucket is either a caller column
or ``pmod(xxhash64(id), num_buckets)``; greedy bin state depends only
on the bucket's own sorted contents.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from great_expectations_spark.functions.text import WORD_SPLIT, token_count

__all__ = [
    "pack_concat_chunks",
    "pack_greedy",
    "pack_stats",
    "materialize_blocks",
]


def _token_column(
    df: DataFrame,
    text_column: Optional[str],
    n_tokens_column: Optional[str],
) -> Column:
    if n_tokens_column is not None:
        return F.coalesce(
            F.col(n_tokens_column).cast("long"), F.lit(0)
        )
    if text_column is None:
        raise ValueError("pass text_column or n_tokens_column")
    # token_count(NULL) is NULL — a null document packs as 0 tokens
    return F.coalesce(token_count(F.col(text_column)).cast("long"), F.lit(0))


def pack_concat_chunks(
    df: DataFrame,
    id_column: str = "doc_id",
    text_column: Optional[str] = "text",
    n_tokens_column: Optional[str] = None,
    block_size: int = 2048,
    bucket_column: Optional[str] = None,
    num_buckets: int = 64,
    explode: bool = False,
) -> DataFrame:
    """Assign every document its span in the concatenated token stream.

    Canonical stream order is ``(bucket ASC, id ASC)``; the bucket is
    ``bucket_column`` if given (e.g. a source/partition column — then
    the order is fully SQL-replicable), else
    ``pmod(xxhash64(id), num_buckets)`` (a deterministic shuffle of
    documents, which is what a pretraining pipeline wants anyway).

    Returns one row per document:
    ``(id, n_tokens, tok_offset, first_block, last_block, n_blocks)``
    — empty documents get NULL blocks and ``n_blocks = 0``.  With
    ``explode=True``, one row per (document, block) instead:
    ``(id, block_id, doc_tok_start, doc_tok_end, block_tok_start)``
    where ``[doc_tok_start, doc_tok_end)`` is the in-document token
    slice that lands in ``block_id`` starting at in-block position
    ``block_tok_start`` — exactly the plan a writer job needs to
    materialize fixed-size training examples.
    """
    if block_size <= 0:
        raise ValueError(f"block_size must be positive, got {block_size}")
    n = _token_column(df, text_column, n_tokens_column)
    if bucket_column is not None:
        bucket = F.col(bucket_column)
    else:
        bucket = F.pmod(F.xxhash64(F.col(id_column)), F.lit(num_buckets))
    slim = df.select(
        F.col(id_column).alias("__id"),
        bucket.alias("__bucket"),
        n.alias("n_tokens"),
    )

    # phase 1: bounded per-bucket totals (partial agg -> one row/bucket)
    totals = (
        slim.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__sum"))
        .collect()
    )
    base, offsets = 0, []
    for row in sorted(totals, key=lambda r: (r["__bucket"] is None, r["__bucket"])):
        offsets.append((row["__bucket"], base))
        base += row["__sum"]
    bases = df.sparkSession.createDataFrame(
        offsets, schema=slim.select("__bucket").schema.add("__base", "long")
    )

    # phase 2: local running sum inside each bucket + broadcast base
    w = (
        Window.partitionBy("__bucket")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = slim.withColumn(
        "__local", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # null-safe join: a NULL bucket (possible with a caller
    # bucket_column) is a real group — an equi-join would orphan it
    packed = (
        local.join(
            F.broadcast(bases.withColumnRenamed("__bucket", "__bb")),
            local["__bucket"].eqNullSafe(F.col("__bb")),
            "left",
        )
        .withColumn("tok_offset", F.col("__base") + F.col("__local"))
        .select(
            F.col("__id").alias(id_column),
            "n_tokens",
            "tok_offset",
            F.when(
                F.col("n_tokens") > 0,
                F.floor(F.col("tok_offset") / block_size),
            ).alias("first_block"),
            F.when(
                F.col("n_tokens") > 0,
                F.floor(
                    (F.col("tok_offset") + F.col("n_tokens") - 1)
                    / block_size
                ),
            ).alias("last_block"),
        )
        .withColumn(
            "n_blocks",
            F.coalesce(
                F.col("last_block") - F.col("first_block") + 1, F.lit(0)
            ),
        )
    )
    if not explode:
        return packed
    blocks = packed.filter(F.col("n_blocks") > 0).select(
        id_column,
        "n_tokens",
        "tok_offset",
        F.explode(
            F.sequence(F.col("first_block"), F.col("last_block"))
        ).alias("block_id"),
    )
    blk_start = F.col("block_id") * block_size
    blk_end = blk_start + block_size
    doc_start = F.greatest(blk_start - F.col("tok_offset"), F.lit(0))
    doc_end = F.least(
        blk_end - F.col("tok_offset"), F.col("n_tokens")
    )
    return blocks.select(
        id_column,
        "block_id",
        doc_start.alias("doc_tok_start"),
        doc_end.alias("doc_tok_end"),
        F.greatest(
            F.col("tok_offset") - blk_start, F.lit(0)
        ).alias("block_tok_start"),
    )


def pack_greedy(
    df: DataFrame,
    id_column: str = "doc_id",
    text_column: Optional[str] = "text",
    n_tokens_column: Optional[str] = None,
    capacity: int = 2048,
    num_buckets: int = 64,
    decreasing: bool = True,
    max_open_bins: int = 512,
) -> DataFrame:
    """No-split packing: ``(id, n_tokens, pack_id)`` with every pack's
    token sum <= capacity, except documents longer than ``capacity``
    which become singleton oversize packs (flagged ``oversize``).

    Bounded first-fit(-decreasing): documents are hash-bucketed
    (deterministic ``pmod(xxhash64(id), num_buckets)``), each bucket
    sorted by (size DESC, id) — or (id) with ``decreasing=False`` for
    stream-order packing — and packed in ONE ``mapInPandas`` pass whose
    open-bin list is capped at ``max_open_bins`` (the fullest bin is
    closed on overflow), so executor memory is O(max_open_bins) however
    large the bucket.  Pack ids embed the task partition id, so they
    are globally unique without coordination.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    n = _token_column(df, text_column, n_tokens_column)
    slim = df.select(
        F.col(id_column).alias("__id"),
        F.pmod(F.xxhash64(F.col(id_column)), F.lit(num_buckets)).alias(
            "__bucket"
        ),
        n.alias("n_tokens"),
    )
    order = (
        [F.col("__bucket"), F.col("n_tokens").desc(), F.col("__id")]
        if decreasing
        else [F.col("__bucket"), F.col("__id")]
    )
    arranged = slim.repartition(num_buckets, "__bucket").sortWithinPartitions(
        *order
    )
    out_schema = (
        slim.select("__id").schema.add("n_tokens", "long")
        .add("pack_id", "long")
        .add("oversize", "boolean")
    )

    def _pack(batches: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        next_pack = 0
        # open bins: list of [pack_id, remaining]; first-fit scan.
        # Bin state resets at bucket boundaries (a partition holds
        # whole buckets, sorted by bucket) so packing is a pure
        # function of each bucket's own contents.
        open_bins: list = []
        cur_bucket = object()
        for pdf in batches:
            ids = pdf["__id"]
            sizes = pdf["n_tokens"]
            buckets = pdf["__bucket"]
            pack_ids, oversize = [], []
            for size, bucket in zip(sizes, buckets):
                if bucket != cur_bucket:
                    cur_bucket = bucket
                    open_bins = []
                size = int(size) if size == size else 0  # NaN -> 0
                if size > capacity:
                    pack_ids.append((pid << 40) | next_pack)
                    next_pack += 1
                    oversize.append(True)
                    continue
                placed = None
                for bin_ in open_bins:
                    if bin_[1] >= size:
                        placed = bin_
                        break
                if placed is None:
                    placed = [(pid << 40) | next_pack, capacity]
                    next_pack += 1
                    open_bins.append(placed)
                    if len(open_bins) > max_open_bins:
                        open_bins.remove(
                            min(open_bins, key=lambda b: b[1])
                        )
                placed[1] -= size
                pack_ids.append(placed[0])
                oversize.append(False)
            yield pd.DataFrame(
                {
                    "__id": ids,
                    "n_tokens": sizes,
                    "pack_id": pd.Series(pack_ids, dtype="int64"),
                    "oversize": oversize,
                }
            )

    return arranged.mapInPandas(_pack, schema=out_schema).withColumnRenamed(
        "__id", id_column
    )


def materialize_blocks(
    df: DataFrame,
    id_column: str = "doc_id",
    text_column: str = "text",
    block_size: int = 2048,
    bucket_column: Optional[str] = None,
    num_buckets: int = 64,
    tokenizer=None,
) -> DataFrame:
    """Turn the :func:`pack_concat_chunks` slice plan into the actual
    fixed-size training blocks: ``(block_id, tokens array<string>,
    n_tokens)`` where every block except the stream's last has exactly
    ``block_size`` tokens, in canonical stream order.

    All JVM expressions: the document is tokenized once (``tokenizer``
    maps a string column to an array column; default whitespace split,
    empty/null text -> empty array), the slice plan is computed from
    THAT tokenizer's own array sizes (so a custom tokenizer can never
    disagree with the plan), each (doc, block) plan row slices its
    piece with ``F.slice``, and blocks assemble via a groupBy whose
    per-group state is bounded by ``block_size`` tokens — block groups
    cannot be skewed by construction.  Costs one join shuffle (plan
    rows x token arrays, keyed by doc id) plus the groupBy(block_id)
    shuffle, each carrying every token exactly once.
    """

    def _default_tok(c: Column) -> Column:
        t = F.trim(c)
        return F.when(
            c.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
        ).otherwise(F.split(t, WORD_SPLIT))

    tok = tokenizer or _default_tok
    toked = df.select(
        F.col(id_column).alias("__tid"),
        tok(F.col(text_column)).alias("__toks"),
        *([bucket_column] if bucket_column is not None else []),
    ).withColumn(
        # the plan MUST count with the same tokenizer that slices
        "__n_toks",
        F.coalesce(F.size("__toks"), F.lit(0)),
    )
    plan = pack_concat_chunks(
        toked.withColumnRenamed("__tid", id_column),
        id_column=id_column,
        text_column=None,
        n_tokens_column="__n_toks",
        block_size=block_size,
        bucket_column=bucket_column,
        num_buckets=num_buckets,
        explode=True,
    )
    docs = toked.select(F.col("__tid").alias("__id"), "__toks")
    pieces = plan.join(
        docs, plan[id_column] == docs["__id"]
    ).select(
        "block_id",
        "block_tok_start",
        F.slice(
            "__toks",
            F.col("doc_tok_start") + 1,
            F.col("doc_tok_end") - F.col("doc_tok_start"),
        ).alias("__piece"),
    )
    return (
        pieces.groupBy("block_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("block_tok_start").alias("s"),
                                F.col("__piece").alias("p"),
                            )
                        )
                    ),
                    lambda s: s["p"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )


def pack_stats(
    assignments: DataFrame, capacity: int, pack_column: str = "pack_id"
) -> DataFrame:
    """One-row fill summary of a :func:`pack_greedy` assignment:
    ``(n_docs, n_packs, total_tokens, lower_bound, fill_ratio,
    max_pack_tokens)`` where ``lower_bound`` is the perfect-packing
    pack count (one pack per oversize doc + ceil of the remaining
    token mass over capacity) and ``fill_ratio`` the achieved token
    density over non-oversize packs."""
    per_pack = assignments.groupBy(pack_column).agg(
        F.sum("n_tokens").alias("__tok"),
        F.count(F.lit(1)).alias("__docs"),
        F.max(F.col("oversize").cast("int")).alias("__over"),
    )
    fitting = F.coalesce(
        F.sum(F.when(F.col("__over") == 0, F.col("__tok"))), F.lit(0)
    )
    return per_pack.agg(
        F.sum("__docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("__tok").alias("total_tokens"),
        (
            F.sum("__over") + F.ceil(fitting / capacity)
        ).alias("lower_bound"),
        # all-oversize corpora have no non-oversize packs: fill is
        # vacuously perfect (1.0), never NULL
        F.coalesce(
            F.round(
                F.sum(F.when(F.col("__over") == 0, F.col("__tok"))).cast(
                    "double"
                )
                / (
                    F.sum(F.when(F.col("__over") == 0, F.lit(1)))
                    * capacity
                ),
                6,
            ),
            F.lit(1.0),
        ).alias("fill_ratio"),
        F.max("__tok").alias("max_pack_tokens"),
    )
