"""Conversation transcripts -> supervised training examples.

The last step between a curated transcript corpus and an SFT/pretrain
dataloader: render each turn with a deterministic role header, tokenize
it, concatenate a conversation's turns in order, build the per-token
LOSS MASK (supervise assistant turns, attend-only everything else), and
chunk to fixed-length examples.  No reference analog (GE validates, it
does not assemble training data); the shape follows what every public
SFT pipeline does — tokenize SEGMENTS then concatenate ids, which needs
no tokenizer offset-mapping and keeps turn boundaries exact by
construction.

Spark plan (the 10^12-turn shape):

* per-turn render + BPE encode — one projection; the only Python is the
  Arrow-batched ``bpe_encode`` UDF every other tokenizer consumer uses;
* per-conversation assembly — ONE ``groupBy(conv)`` shuffle carrying
  ``(turn_idx, ids, supervised)`` structs; ``array_sort`` orders turns
  INSIDE the aggregated value, so no per-group window sort;
* masking + chunking — pure higher-order functions (``transform`` /
  ``flatten`` / ``slice``) with single-touch lambdas (each element
  evaluated once — the O(tokens²) CodegenFallback trap needs a
  re-evaluated subtree per element, which these do not have);
* one example row per ``max_len`` slice via ``sequence`` + ``explode``.

Hot conversations: a 10^4-turn conversation's tokens pass through one
aggregation buffer — same bounded-by-group-size class as the window
ops; cap upstream (``turn_idx < N``) if a source can produce unbounded
conversations.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.functions.tokenize import bpe_encode


def render_turn(
    role_column: str = "role",
    text_column: str = "text",
    header: bool = True,
) -> Column:
    """Deterministic per-turn text: ``<|role|>\\n`` + text (NULL text
    renders as the bare header, so the turn keeps its position)."""
    body = F.coalesce(F.col(text_column), F.lit(""))
    if not header:
        return body
    # coalesce the role too: concat null-propagates, so a NULL role
    # would silently null the WHOLE rendered turn and drop its text
    # from the token stream
    role = F.coalesce(F.col(role_column), F.lit(""))
    return F.concat(F.lit("<|"), role, F.lit("|>\n"), body)


def build_training_examples(
    df: DataFrame,
    tokenizer: Dict[str, object],
    conv_column: str = "conv_id",
    order_column: str = "turn_idx",
    role_column: str = "role",
    text_column: str = "text",
    max_len: int = 2048,
    supervise_roles: Sequence[str] = ("assistant",),
    header: bool = True,
    drop_unsupervised: bool = True,
) -> DataFrame:
    """One row per fixed-length training example:

    ``(conv_id, example_idx, n_examples, input_ids array<int>,
    loss_mask array<int>, n_supervised int)``

    ``loss_mask[i] = 1`` iff ``input_ids[i]`` came from a turn whose
    role is in ``supervise_roles``.  The final example of a
    conversation is the (possibly short) tail — padding is the
    dataloader's job, not the corpus's.  ``drop_unsupervised`` removes
    examples whose mask is all zeros (nothing to learn from in SFT).
    """
    if max_len <= 0:
        raise ValueError(f"max_len must be positive, got {max_len}")
    roles = [str(r) for r in supervise_roles]

    turn = df.select(
        F.col(conv_column).alias("__conv"),
        F.col(order_column).alias("__idx"),
        F.col(role_column).isin(roles).alias("__sup"),
        bpe_encode(
            render_turn(role_column, text_column, header), tokenizer
        ).alias("__ids"),
    ).withColumn("__ids", F.coalesce(F.col("__ids"), F.array()))

    conv = (
        turn.groupBy("__conv")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__idx", "__ids", "__sup"))
            ).alias("__turns")
        )
        .select(
            "__conv",
            F.flatten(F.col("__turns.__ids")).alias("__all_ids"),
            # per-token supervision flag, single-touch lambda
            F.flatten(
                F.transform(
                    "__turns",
                    lambda t: F.transform(
                        t["__ids"],
                        lambda _tok: F.when(t["__sup"], 1).otherwise(0),
                    ),
                )
            ).alias("__all_mask"),
        )
    )

    n_chunks = F.ceil(F.size("__all_ids") / F.lit(max_len)).cast("int")
    # slice INSIDE the lambda, then explode the already-sliced structs:
    # exploding the chunk INDEX first would duplicate the full
    # conversation arrays once per chunk before slicing — O(len²/max_len)
    # bytes for a hot conversation (observed OOM at ~10^6 tokens)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.alias("example_idx"),
            F.slice(
                "__all_ids", i * max_len + F.lit(1), F.lit(max_len)
            ).alias("input_ids"),
            F.slice(
                "__all_mask", i * max_len + F.lit(1), F.lit(max_len)
            ).alias("loss_mask"),
        ),
    )
    out = (
        conv.filter(F.size("__all_ids") > 0)
        .select(
            F.col("__conv").alias(conv_column),
            n_chunks.alias("n_examples"),
            F.explode(chunks).alias("__chunk"),
        )
        .select(
            conv_column,
            F.col("__chunk.example_idx").alias("example_idx"),
            "n_examples",
            F.col("__chunk.input_ids").alias("input_ids"),
            F.col("__chunk.loss_mask").alias("loss_mask"),
        )
        .withColumn(
            "n_supervised",
            F.aggregate(
                "loss_mask", F.lit(0), lambda acc, m: acc + m
            ),
        )
    )
    if drop_unsupervised:
        out = out.filter(F.col("n_supervised") > 0)
    return out


def example_stats(
    examples: DataFrame, conv_column: str = "conv_id"
) -> DataFrame:
    """Corpus-level sanity aggregate for an example set: totals the
    dataloader contract depends on, one row.  ``conv_column`` names the
    conversation-id column explicitly (never inferred from position —
    a reordered projection would silently count the wrong column)."""
    if conv_column not in examples.columns:
        raise ValueError(
            f"conv_column {conv_column!r} not in example DataFrame "
            f"columns {examples.columns}"
        )
    return examples.agg(
        F.count(F.lit(1)).alias("n_examples"),
        F.countDistinct(conv_column).alias("n_conversations"),
        F.sum(F.size("input_ids")).alias("total_tokens"),
        F.sum("n_supervised").alias("supervised_tokens"),
        F.avg(F.size("input_ids")).alias("avg_example_len"),
    )
