"""Deterministic sampling for corpus work: seed-stable row samples,
per-key top-n samples, and train/holdout splits that do not depend on
Spark's physical partitioning.

The reference's samplers
(``execution_engine/split_and_sample/sparkdf_data_sampler.py``) already
prefer hash-determinism over ``df.sample`` for exactly this reason
(``sample_using_md5``, :142) — ``rand()``-based sampling re-rolls on
every retry/recompute, which silently changes results under task
retries and makes runs non-reproducible.  This module generalizes the
pattern from "mod/md5 bucket keep" to the three shapes a training
pipeline needs, all JVM expressions, all seedable:

* :func:`hash_sample` — keep a deterministic ``fraction`` of rows:
  ``pmod(xxhash64(id, seed), 2^20) < fraction * 2^20``.  Pure
  projection: ZERO shuffles, pushes through any downstream plan.
* :func:`sample_per_key` — at most ``n`` rows per key, chosen by a
  seeded hash order (a distributed deterministic reservoir): one
  window shuffle on the key; each key group streams, so a hot key
  costs one long task, not memory.
* :func:`split_train_holdout` — disjoint-by-construction split of one
  frame into (train, holdout) by the same hash threshold, e.g. to
  carve a decontamination/eval holdout before training.  Both halves
  are filters over the SAME deterministic hash, so a row can never
  land in both, including across separate jobs or cluster sizes.

Sampling-theory note: ``xxhash64`` of an id column is uniform over
64-bit space for any realistic id set, so threshold sampling is an
unbiased Bernoulli(fraction) sample *conditional on distinct ids*;
duplicate ids travel together (by design — sampling is by identity,
not by row position).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_sample", "sample_per_key", "split_train_holdout"]

# threshold resolution: fractions are exact multiples of 2^-20 (~1e-6);
# small enough to be below any practical sampling-rate tolerance
_DENOM = 1 << 20


def _hash_col(
    df: DataFrame, columns: Optional[Sequence[str]], seed: int
) -> Column:
    cols = list(columns) if columns else list(df.columns)
    if not cols:
        raise ValueError("no columns to hash")
    return F.xxhash64(*[F.col(c) for c in cols], F.lit(int(seed)))


def _bucket(df, columns, seed) -> Column:
    return F.pmod(_hash_col(df, columns, seed), F.lit(_DENOM))


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    columns: Optional[Sequence[str]] = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministically keep ~``fraction`` of rows by hash threshold.

    ``columns`` (default: all columns) feed the hash — pass the id
    column so duplicates of one document sample together, or e.g.
    ``["conv_id"]`` so whole conversations stay intact.  Unlike
    ``df.sample`` this is stable under task retries, input reordering,
    and cluster size, and composes as a pure filter (predicate
    pushdown, no shuffle).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(df, columns, seed) < int(round(fraction * _DENOM)))


def sample_per_key(
    df: DataFrame,
    key: Union[str, Sequence[str]],
    n: int,
    *,
    columns: Optional[Sequence[str]] = None,
    seed: int = 0,
) -> DataFrame:
    """At most ``n`` rows per ``key``, deterministically pseudo-random.

    The per-key order is a seeded hash of ``columns`` (default: all
    non-key columns, falling back to the key itself for key-only
    frames) with the hash value as tie-break — a reservoir sample
    whose outcome is a pure function of (data, seed).  ONE window
    shuffle on the key; grouped-streaming execution, so skewed keys
    degrade to a long task rather than an OOM.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    keys: List[str] = [key] if isinstance(key, str) else list(key)
    hash_cols = (
        list(columns)
        if columns
        else [c for c in df.columns if c not in keys] or keys
    )
    h = _hash_col(df, hash_cols, seed)
    w = Window.partitionBy(*keys).orderBy(h.asc(), *[F.col(c) for c in keys])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def split_train_holdout(
    df: DataFrame,
    holdout_fraction: float,
    *,
    columns: Optional[Sequence[str]] = None,
    seed: int = 0,
):
    """Split into ``(train, holdout)`` by deterministic hash threshold.

    Disjoint and exhaustive by construction: both outputs filter the
    same ``pmod(xxhash64(columns, seed), 2^20)`` bucket with
    complementary predicates, so membership is identical however many
    times (or on however many clusters) each half is recomputed.
    ``columns`` defaults to all columns; pass the conversation / doc
    id to keep logical units intact across the split.
    """
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError(
            f"holdout_fraction must be in [0, 1], got {holdout_fraction}"
        )
    cut = int(round(holdout_fraction * _DENOM))
    b = _bucket(df, columns, seed)
    return df.filter(b >= cut), df.filter(b < cut)
