"""Deterministic sharding (functions/shards.py) and deterministic
sampling (functions/sampling.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.functions import shards as sh
from great_expectations_spark.functions import sampling as sa


def _docs(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
        # variable-length text: (id % 17) + 1 words
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 17 + 1).cast("int")),
                lambda i: F.concat(F.lit("w"), i.cast("string")),
            ),
        ).alias("text"),
        (F.col("id") % 5).cast("int").alias("src"),
    )


# ---------------------------------------------------------------------------
# shard_assignments
# ---------------------------------------------------------------------------


def test_row_shards_balanced_and_exhaustive(spark):
    df = _docs(spark)
    a = sh.shard_assignments(df, "doc_id", rows_per_shard=64)
    per = a.groupBy("shard").count().collect()
    assert sum(r["count"] for r in per) == 500
    # every shard except possibly the last holds exactly 64 rows; the
    # final shard absorbs the remainder (500 = 7*64 + 52)
    sizes = {r["shard"]: r["count"] for r in per}
    assert set(sizes) == set(range(8))
    assert all(sizes[s] == 64 for s in range(7))
    assert sizes[7] == 52
    # order_idx is a permutation of 0..n-1
    idx = sorted(r["order_idx"] for r in a.collect())
    assert idx == list(range(500))


def test_shards_deterministic_across_partitioning(spark):
    df = _docs(spark)
    a1 = sh.shard_assignments(df, "doc_id", rows_per_shard=100)
    a2 = sh.shard_assignments(
        df.repartition(13), "doc_id", rows_per_shard=100
    )
    assert sorted(map(tuple, a1.collect())) == sorted(
        map(tuple, a2.collect())
    )


def test_token_shards_respect_weights(spark):
    df = _docs(spark)
    a = sh.shard_assignments(
        df, "doc_id", tokens_per_shard=300, text_column="text"
    )
    joined = (
        a.join(df, "doc_id")
        .withColumn("n_tok", F.size(F.split("text", r"\s+")))
        .groupBy("shard")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    )
    # no shard exceeds tokens_per_shard + max doc length (17); docs are
    # never split, so a shard may overshoot by at most one document
    assert all(r["tok"] <= 300 + 17 for r in joined)
    total = sum(r["tok"] for r in joined)
    assert total == df.select(
        F.sum(F.size(F.split("text", r"\s+")))
    ).collect()[0][0]


def test_shards_caller_bucket_column(spark):
    df = _docs(spark)
    a = sh.shard_assignments(
        df, "doc_id", rows_per_shard=120, bucket_column="src"
    )
    # canonical order is (src, doc_id): order_idx must sort by that key
    rows = (
        a.join(df, "doc_id")
        .select("order_idx", "src", "doc_id")
        .collect()
    )
    by_idx = sorted(rows, key=lambda r: r["order_idx"])
    assert [(r["src"], r["doc_id"]) for r in by_idx] == sorted(
        (r["src"], r["doc_id"]) for r in rows
    )


def test_shards_arg_validation(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError, match="exactly one"):
        sh.shard_assignments(df, "doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        sh.shard_assignments(
            df, "doc_id", rows_per_shard=5, tokens_per_shard=5
        )
    with pytest.raises(ValueError, match="positive"):
        sh.shard_assignments(df, "doc_id", rows_per_shard=0)
    with pytest.raises(ValueError, match="text_column or n_tokens"):
        sh.shard_assignments(df, "doc_id", tokens_per_shard=10)


# ---------------------------------------------------------------------------
# write_shards
# ---------------------------------------------------------------------------


def test_write_shards_one_file_per_shard(spark, tmp_path):
    df = _docs(spark, 300)
    out = str(tmp_path / "shards")
    stats = sh.write_shards(df, out, "doc_id", rows_per_shard=100)
    assert stats == {"n_shards": 3, "rows": 300}
    for k in range(3):
        d = os.path.join(out, f"shard={k}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"shard {k}: {files}"
    back = spark.read.parquet(out)
    assert back.count() == 300
    assert set(back.columns) == {"doc_id", "text", "src", "shard"}
    # membership matches the assignment plan
    plan = {
        r["doc_id"]: r["shard"]
        for r in sh.shard_assignments(
            df, "doc_id", rows_per_shard=100
        ).collect()
    }
    for r in back.select("doc_id", "shard").collect():
        assert plan[r["doc_id"]] == r["shard"]


def test_write_shards_empty_input(spark, tmp_path):
    df = _docs(spark, 10).filter(F.lit(False))
    out = str(tmp_path / "empty")
    stats = sh.write_shards(df, out, "doc_id", rows_per_shard=10)
    assert stats == {"n_shards": 0, "rows": 0}
    assert spark.read.parquet(out).count() == 0


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_unbiased(spark):
    df = _docs(spark, 2000)
    s1 = sa.hash_sample(df, 0.25, columns=["doc_id"], seed=7)
    s2 = sa.hash_sample(df.repartition(9), 0.25, columns=["doc_id"], seed=7)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2
    assert 0.18 <= len(ids1) / 2000 <= 0.32  # ~Binomial(2000, .25)
    # different seed → different sample
    ids3 = sorted(
        r["doc_id"]
        for r in sa.hash_sample(df, 0.25, columns=["doc_id"], seed=8)
        .collect()
    )
    assert ids3 != ids1
    assert sa.hash_sample(df, 0.0).count() == 0
    assert sa.hash_sample(df, 1.0).count() == 2000


def test_sample_per_key_caps_and_determinism(spark):
    df = _docs(spark, 1000)  # 5 src keys x 200 rows
    s = sa.sample_per_key(df, "src", 10, seed=3)
    per = {r["src"]: r["count"] for r in s.groupBy("src").count().collect()}
    assert per == {k: 10 for k in range(5)}
    again = sa.sample_per_key(df.repartition(17), "src", 10, seed=3)
    assert sorted(map(tuple, s.collect())) == sorted(
        map(tuple, again.collect())
    )
    # keys with fewer than n rows keep everything
    small = df.filter(F.col("doc_id") == "doc-1")
    assert sa.sample_per_key(small, "src", 10).count() == 1


def test_split_train_holdout_disjoint_exhaustive(spark):
    df = _docs(spark, 1000)
    train, hold = sa.split_train_holdout(
        df, 0.2, columns=["doc_id"], seed=11
    )
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h)
    assert len(t) + len(h) == 1000
    assert 0.12 <= len(h) / 1000 <= 0.28
    # stable across recomputation/partitioning
    t2, h2 = sa.split_train_holdout(
        df.repartition(5), 0.2, columns=["doc_id"], seed=11
    )
    assert {r["doc_id"] for r in h2.collect()} == h


def test_sampling_validation(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        sa.hash_sample(df, 1.5)
    with pytest.raises(ValueError):
        sa.sample_per_key(df, "src", 0)
    with pytest.raises(ValueError):
        sa.split_train_holdout(df, -0.1)


def test_write_shards_keeps_null_and_duplicate_ids(spark, tmp_path):
    """Assignment rides the payload rows (no join back on the id):
    null ids and duplicate ids land in the output exactly once each."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (2, "d"), (None, "e")],
        "doc_id int, text string",
    )
    path = str(tmp_path / "nulldup_shards")
    report = sh.write_shards(df, path, rows_per_shard=2)
    assert report["rows"] == 5
    back = spark.read.parquet(path)
    assert back.count() == 5
    assert sorted(r["text"] for r in back.collect()) == list("abcde")
    # shard sizes still respect the bound
    sizes = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert sum(sizes.values()) == 5 and max(sizes.values()) <= 3
