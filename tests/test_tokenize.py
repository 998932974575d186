"""BPE tokenizer: hand-checked merges, encode determinism across
partitionings, round-trip contract, persistence, and integration with
materialize_blocks (real token-id training blocks)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.functions.text import BPE_TOKEN
from great_expectations_spark.functions.tokenize import (
    bpe_decode_py,
    bpe_encode,
    bpe_load,
    bpe_save,
    train_bpe,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the rat"),
    (3, "a cat and a rat and a mat"),
    (4, None),
    (5, "THE CAT!"),
]


def _df(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_checked_first_merge(spark):
    # corpus of one repeated word: the most frequent byte pair wins
    df = spark.createDataFrame(
        [(1, "aa aa aa ab")], "doc_id long, text string"
    )
    tok = train_bpe(df, vocab_size=257)
    assert tok["merges"] == [[97, 97]]  # ('a','a') beats ('a','b') 3:1
    ids = (
        df.select(bpe_encode(F.col("text"), tok).alias("ids"))
        .first()["ids"]
    )
    # words: aa aa aa ab -> [256] [256] [256] [256? no: 'ab'=[97,98]]
    assert ids == [256, 256, 256, 97, 98]


def test_encode_deterministic_across_partitionings(spark):
    tok = train_bpe(_df(spark), vocab_size=300)
    a = (
        _df(spark).repartition(1)
        .select("doc_id", bpe_encode(F.col("text"), tok).alias("ids"))
        .collect()
    )
    b = (
        _df(spark).repartition(7)
        .select("doc_id", bpe_encode(F.col("text"), tok).alias("ids"))
        .collect()
    )
    assert {r["doc_id"]: r["ids"] for r in a} == {
        r["doc_id"]: r["ids"] for r in b
    }


def test_roundtrip_and_null(spark):
    tok = train_bpe(_df(spark), vocab_size=300)
    rows = {
        r["doc_id"]: r["ids"]
        for r in _df(spark)
        .select("doc_id", bpe_encode(F.col("text"), tok).alias("ids"))
        .collect()
    }
    assert rows[4] is None  # null text -> null ids
    tok_re = re.compile(BPE_TOKEN)
    for d, t in CORPUS:
        if t is None:
            continue
        want = "".join(tok_re.findall(t.lower()))
        assert bpe_decode_py(rows[d], tok) == want, d


def test_compression_monotone(spark):
    # with enough merges the most frequent words collapse to one token
    tok = train_bpe(_df(spark), vocab_size=400)
    ids = (
        _df(spark, [(1, "the the the")])
        .select(bpe_encode(F.col("text"), tok).alias("ids"))
        .first()["ids"]
    )
    assert len(ids) == 3  # one id per 'the'


def test_save_load(spark, tmp_path):
    tok = train_bpe(_df(spark), vocab_size=280)
    path = f"file://{tmp_path}/bpe.json"
    bpe_save(spark, tok, path)
    tok2 = bpe_load(spark, path)
    assert tok2["vocab_size"] == tok["vocab_size"]
    assert [tuple(m) for m in tok["merges"]] == tok2["merges"]


def test_histogram_plan_is_takeordered(spark):
    # training's only distributed step must not materialize a full sort
    from great_expectations_spark.functions.tokenize import _word_histogram

    df = _df(spark)
    words = F.explode(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(BPE_TOKEN), F.lit(0)
        )
    ).alias("__w")
    q = (
        df.filter(F.col("text").isNotNull())
        .select(words)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__w"))
        .limit(10)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    hist = _word_histogram(df, "text", 3)
    assert hist[0][0] in ("the", "cat", "a")


def test_materialize_blocks_with_bpe_ids(spark):
    from great_expectations_spark.functions.packing import (
        materialize_blocks,
    )

    docs = _df(spark, [r for r in CORPUS if r[1] is not None])
    tok = train_bpe(docs, vocab_size=300)

    def bpe_tok(c):
        return F.coalesce(
            bpe_encode(c, tok), F.array().cast("array<int>")
        )

    blocks = materialize_blocks(
        docs, block_size=8, num_buckets=4, tokenizer=bpe_tok
    ).collect()
    sizes = {r["block_id"]: r["n_tokens"] for r in blocks}
    # every block but the stream's last is exactly full
    last = max(sizes)
    assert all(n == 8 for b, n in sizes.items() if b != last)
    # the blocks carry every token exactly once
    total = sum(sizes.values())
    want = sum(
        len(r["ids"])
        for r in docs.select(
            bpe_encode(F.col("text"), tok).alias("ids")
        ).collect()
    )
    assert total == want
    # and block contents are real ids from this tokenizer's vocab
    flat = [t for r in blocks for t in r["tokens"]]
    assert all(0 <= t < tok["vocab_size"] for t in flat)
