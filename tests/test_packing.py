"""Sequence packing (functions/packing.py): concat-chunk spans vs a
hand prefix-sum, explode coverage, greedy first-fit invariants."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from great_expectations_spark.functions import packing as pk


@pytest.fixture(scope="module")
def sized(spark):
    rows = [
        (i, "src_%d" % (i % 3), n)
        for i, n in enumerate([7, 0, 13, 256, 1, 300, 42, 0, 9, 250])
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )


def _expected_spans(rows, block_size, order_key):
    out, off = {}, 0
    for doc_id, _src, n in sorted(rows, key=order_key):
        if n > 0:
            out[doc_id] = (
                n,
                off,
                off // block_size,
                (off + n - 1) // block_size,
                (off + n - 1) // block_size - off // block_size + 1,
            )
        else:
            out[doc_id] = (n, off, None, None, 0)
        off += n
    return out


def test_chunk_bucket_column_matches_prefix_sum(sized):
    rows = [tuple(r) for r in sized.collect()]
    want = _expected_spans(rows, 64, lambda r: (r[1], r[0]))
    got = pk.pack_concat_chunks(
        sized,
        n_tokens_column="n_tokens",
        text_column=None,
        block_size=64,
        bucket_column="source",
    ).collect()
    assert {
        r["doc_id"]: (
            r["n_tokens"],
            r["tok_offset"],
            r["first_block"],
            r["last_block"],
            r["n_blocks"],
        )
        for r in got
    } == want


def test_chunk_hash_buckets_is_valid_permutation(sized):
    got = sorted(
        pk.pack_concat_chunks(
            sized,
            n_tokens_column="n_tokens",
            text_column=None,
            block_size=64,
            num_buckets=4,
        ).collect(),
        key=lambda r: r["tok_offset"],
    )
    acc = 0
    for r in got:
        assert r["tok_offset"] == acc
        acc += r["n_tokens"]
    total = sum(r["n_tokens"] for r in got)
    assert (
        max(r["last_block"] for r in got if r["last_block"] is not None)
        == (total - 1) // 64
    )


def test_chunk_explode_covers_every_block(sized):
    total = sized.agg(F.sum("n_tokens")).collect()[0][0]
    ex = pk.pack_concat_chunks(
        sized,
        n_tokens_column="n_tokens",
        text_column=None,
        block_size=64,
        bucket_column="source",
        explode=True,
    )
    cov = {
        r["block_id"]: r["filled"]
        for r in ex.groupBy("block_id")
        .agg(
            F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias(
                "filled"
            )
        )
        .collect()
    }
    n_blocks = math.ceil(total / 64)
    assert set(cov) == set(range(n_blocks))
    for b in range(n_blocks - 1):
        assert cov[b] == 64
    assert cov[n_blocks - 1] == total - 64 * (n_blocks - 1)
    # in-block start positions never collide within a block
    starts = ex.groupBy("block_id", "block_tok_start").count()
    assert starts.filter(F.col("count") > 1).count() == 0


def test_chunk_token_counts_from_text(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, ""), (3, None), (4, " x ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in pk.pack_concat_chunks(df, block_size=8).collect()
    }
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_chunk_rejects_bad_block_size(sized):
    with pytest.raises(ValueError):
        pk.pack_concat_chunks(sized, block_size=0)
    with pytest.raises(ValueError):
        pk.pack_concat_chunks(
            sized, text_column=None, n_tokens_column=None
        )


def test_materialize_blocks_content_exact(spark):
    import re

    rows = [
        (i, "src_%d" % (i % 2), " ".join("w%d_%d" % (i, j) for j in range(n)))
        for i, n in enumerate([5, 0, 17, 3, 40, 1, 26])
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        pk.materialize_blocks(
            df, block_size=16, bucket_column="source"
        ).collect(),
        key=lambda r: r["block_id"],
    )
    stream = []
    for _i, _s, t in sorted(rows, key=lambda r: (r[1], r[0])):
        if t.strip():
            stream.extend(re.split(r"\s+", t.strip()))
    flat = [t for r in got for t in r["tokens"]]
    assert flat == stream
    assert all(r["n_tokens"] == 16 for r in got[:-1])
    assert got[-1]["n_tokens"] == len(stream) - 16 * (len(got) - 1)
    assert [r["block_id"] for r in got] == list(range(len(got)))


def _greedy_invariants(assign, capacity, n_docs):
    per = (
        assign.groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.max(F.col("oversize").cast("int")).alias("over"),
            F.count(F.lit(1)).alias("docs"),
        )
        .collect()
    )
    for r in per:
        if r["over"]:
            assert r["docs"] == 1  # oversize docs pack alone
        else:
            assert r["t"] <= capacity
    assert assign.count() == n_docs
    assert assign.select("doc_id").distinct().count() == n_docs


def test_greedy_invariants_and_determinism(sized):
    a1 = pk.pack_greedy(
        sized,
        n_tokens_column="n_tokens",
        text_column=None,
        capacity=128,
        num_buckets=4,
    )
    _greedy_invariants(a1, 128, 10)
    a2 = pk.pack_greedy(
        sized.orderBy(F.rand(3)),
        n_tokens_column="n_tokens",
        text_column=None,
        capacity=128,
        num_buckets=4,
    )
    assert sorted(map(tuple, a1.collect())) == sorted(
        map(tuple, a2.collect())
    )


def test_greedy_stats(sized):
    a = pk.pack_greedy(
        sized,
        n_tokens_column="n_tokens",
        text_column=None,
        capacity=128,
        num_buckets=2,
    )
    s = pk.pack_stats(a, 128).collect()[0]
    assert s["n_docs"] == 10
    assert s["total_tokens"] == 878
    # three oversize docs (256, 300, 250 > 128) pack alone; rest total 72
    assert s["n_packs"] >= s["lower_bound"] == 3 + math.ceil(72 / 128)
    assert s["max_pack_tokens"] == 300  # the oversize doc


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
    capacity=st.integers(min_value=32, max_value=256),
)
def test_greedy_property(spark, sizes, capacity):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    a = pk.pack_greedy(
        df,
        n_tokens_column="n_tokens",
        text_column=None,
        capacity=capacity,
        num_buckets=3,
    )
    _greedy_invariants(a, capacity, len(sizes))
    # first-fit waste bound: any two non-oversize packs in one bucket
    # together exceed capacity, so n_packs <= 2*LB + buckets + oversize
    per = a.groupBy("pack_id").agg(
        F.max(F.col("oversize").cast("int")).alias("over")
    )
    n_over = per.filter("over = 1").count()
    n_packs = per.count() - n_over
    fitting = sum(s for s in sizes if s <= capacity)
    lb = math.ceil(fitting / capacity)
    assert n_packs <= 2 * lb + 3


# ---------------------------------------------------------------------------
# round-4 review-fix regressions
# ---------------------------------------------------------------------------


def test_chunk_null_bucket_column_keeps_docs(spark):
    df = spark.createDataFrame(
        [(1, None, 3), (2, "s1", 2), (3, "s1", 1)],
        "doc_id long, src string, n_tokens long",
    )
    got = {
        r["doc_id"]: r
        for r in pk.pack_concat_chunks(
            df,
            n_tokens_column="n_tokens",
            text_column=None,
            block_size=4,
            bucket_column="src",
        ).collect()
    }
    # the NULL-bucket doc keeps its tokens and a real offset
    assert got[1]["tok_offset"] is not None
    assert got[1]["n_blocks"] >= 1
    offs = sorted((r["tok_offset"], r["n_tokens"]) for r in got.values())
    acc = 0
    for off, n in offs:
        assert off == acc
        acc += n


def test_materialize_blocks_honors_custom_tokenizer(spark):
    df = spark.createDataFrame(
        [(1, "ab-cd ef"), (2, "gh ij-kl")], "doc_id long, text string"
    )
    tok = lambda c: F.split(F.trim(c), r"[\s\-]+")  # noqa: E731
    got = sorted(
        pk.materialize_blocks(df, block_size=2, tokenizer=tok).collect(),
        key=lambda r: r["block_id"],
    )
    flat = [t for r in got for t in r["tokens"]]
    assert sorted(flat) == ["ab", "cd", "ef", "gh", "ij", "kl"]
    assert all(r["n_tokens"] == 2 for r in got)


def test_pack_stats_all_oversize_fill_ratio_defined(spark):
    df = spark.createDataFrame(
        [(1, 500), (2, 600)], "doc_id long, n_tokens long"
    )
    a = pk.pack_greedy(
        df, n_tokens_column="n_tokens", text_column=None, capacity=100
    )
    s = pk.pack_stats(a, 100).collect()[0]
    assert s["fill_ratio"] == 1.0  # vacuous, never NULL
    assert s["lower_bound"] == 2
