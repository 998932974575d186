"""Conversation -> masked training examples (functions/examples.py):
token streams, loss masks, and chunk boundaries verified against a
pure-Python reconstruction using the same trained BPE tokenizer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.functions.examples import (
    build_training_examples,
    example_stats,
    render_turn,
)
from great_expectations_spark.functions.tokenize import train_bpe


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        ("c1", 0, "system", "you are a helpful data engine"),
        ("c1", 1, "user", "count the ducks in the pond"),
        ("c1", 2, "assistant", "there are seven ducks swimming"),
        ("c1", 3, "user", "and the geese"),
        ("c1", 4, "assistant", "three geese joined this morning"),
        ("c2", 0, "user", "hello"),
        ("c2", 1, "assistant", "hello to you"),
        ("c3", 0, "user", "nobody answered this one"),
        ("c4", 0, "user", None),  # null text keeps its position
        ("c4", 1, "assistant", "null handled"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


@pytest.fixture(scope="module")
def tok(spark, convs):
    return train_bpe(
        convs.filter(F.col("text").isNotNull()), "text", vocab_size=300
    )


def _py_encode(tok, text):
    """Driver-side reference encode via the same UDF machinery."""
    import pandas as pd

    from great_expectations_spark.functions import tokenize as tkz

    ranks = {(a, b): i for i, (a, b) in enumerate(tok["merges"])}
    import re

    ids = []
    for w in re.compile(tkz.BPE_TOKEN).findall(text.lower()):
        ids.extend(tkz._encode_word(list(w.encode("utf-8")), ranks))
    return ids


def _py_conv(tok, turns, supervise=("assistant",)):
    ids, mask = [], []
    for _idx, role, text in sorted(turns):
        t = f"<|{role}|>\n" + (text or "")
        tids = _py_encode(tok, t)
        ids.extend(tids)
        mask.extend([1 if role in supervise else 0] * len(tids))
    return ids, mask


def test_examples_match_python_reconstruction(spark, convs, tok):
    got = {
        (r["conv_id"], r["example_idx"]): r
        for r in build_training_examples(
            convs, tok, max_len=16, drop_unsupervised=False
        ).collect()
    }
    raw = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in convs.collect()
    ]
    by_conv = {}
    for c, i, role, text in raw:
        by_conv.setdefault(c, []).append((i, role, text))
    for c, turns in by_conv.items():
        ids, mask = _py_conv(tok, turns)
        n = (len(ids) + 15) // 16
        for k in range(n):
            row = got[(c, k)]
            assert row["input_ids"] == ids[k * 16:(k + 1) * 16], (c, k)
            assert row["loss_mask"] == mask[k * 16:(k + 1) * 16], (c, k)
            assert row["n_examples"] == n
        assert (c, n) not in got  # no phantom chunk


def test_drop_unsupervised_removes_maskless_examples(spark, convs, tok):
    kept = build_training_examples(convs, tok, max_len=16).collect()
    # c3 has no assistant turn at all -> fully dropped
    assert all(r["conv_id"] != "c3" for r in kept)
    assert all(r["n_supervised"] > 0 for r in kept)


def test_mask_counts_equal_assistant_tokens(spark, convs, tok):
    ex = build_training_examples(
        convs, tok, max_len=8, drop_unsupervised=False
    )
    stats = example_stats(ex).first()
    # reference: total and supervised token counts from the Python side
    raw = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in convs.collect()
    ]
    total = sup = 0
    by_conv = {}
    for c, i, role, text in raw:
        by_conv.setdefault(c, []).append((i, role, text))
    for turns in by_conv.values():
        ids, mask = _py_conv(tok, turns)
        total += len(ids)
        sup += sum(mask)
    assert stats["total_tokens"] == total
    assert stats["supervised_tokens"] == sup
    assert stats["n_conversations"] == 4


def test_short_tail_not_padded(spark, convs, tok):
    ex = build_training_examples(
        convs, tok, max_len=1000, drop_unsupervised=False
    ).collect()
    # every conversation fits one example; lengths are the true stream
    for r in ex:
        assert r["n_examples"] == 1 and len(r["input_ids"]) < 1000
        assert len(r["input_ids"]) == len(r["loss_mask"])


def test_render_turn_header_shape(spark):
    df = spark.createDataFrame(
        [("user", "hi"), ("assistant", None), (None, "orphan text")],
        "role string, text string",
    )
    rows = df.select(render_turn().alias("t")).collect()
    assert rows[0]["t"] == "<|user|>\nhi"
    assert rows[1]["t"] == "<|assistant|>\n"
    # a NULL role must not null-propagate through concat and silently
    # drop the turn's text from the token stream
    assert rows[2]["t"] == "<||>\norphan text"


def test_property_random_conversations_match_reference(spark, tok):
    """Property-style differential over randomized conversation shapes:
    any mix of roles / NULL texts / turn counts / max_len reproduces
    the pure-Python token stream, mask, and chunk boundaries exactly."""
    import random

    rng = random.Random(1234)
    words = ["duck", "pond", "geese", "tool", "call", "result", "ok"]
    rows = []
    for ci in range(12):
        n_turns = rng.randint(1, 9)
        for ti in range(n_turns):
            role = rng.choice(["system", "user", "assistant", "tool"])
            text = (
                None
                if rng.random() < 0.15
                else " ".join(rng.choices(words, k=rng.randint(1, 12)))
            )
            rows.append((f"conv{ci}", ti, role, text))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    for max_len in (7, 64, 4096):
        got = {
            (r["conv_id"], r["example_idx"]): r
            for r in build_training_examples(
                df, tok, max_len=max_len, drop_unsupervised=False
            ).collect()
        }
        by_conv = {}
        for c, i, role, text in rows:
            by_conv.setdefault(c, []).append((i, role, text))
        for c, turns in by_conv.items():
            ids, mask = _py_conv(tok, turns)
            if not ids:
                assert not any(k[0] == c for k in got)
                continue
            n = (len(ids) + max_len - 1) // max_len
            for k in range(n):
                row = got[(c, k)]
                lo, hi = k * max_len, (k + 1) * max_len
                assert row["input_ids"] == ids[lo:hi], (c, k, max_len)
                assert row["loss_mask"] == mask[lo:hi], (c, k, max_len)
                assert row["n_supervised"] == sum(mask[lo:hi])
            assert (c, n) not in got


def test_plan_one_shuffle_no_extra_python(spark, convs, tok):
    ex = build_training_examples(convs, tok, max_len=16)
    plan = ex._jdf.queryExecution().executedPlan().toString()
    # the ONLY Python is the Arrow-batched tokenizer
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan
    # one aggregation pair around one exchange (per-conv assembly)
    assert plan.count("Exchange") <= 2, plan  # agg + AQE artifacts


def test_example_stats_explicit_conv_column(spark, convs, tok):
    """example_stats counts conversations by NAME, not position — a
    reordered projection gives the same answer, and a wrong name raises
    instead of silently counting another column (ADVICE r4 #5)."""
    ex = build_training_examples(convs, tok, max_len=8,
                                 drop_unsupervised=False)
    want = example_stats(ex).first().asDict()
    reordered = ex.select(*sorted(ex.columns, reverse=True))
    got = example_stats(reordered).first().asDict()
    assert got == want
    renamed = ex.withColumnRenamed("conv_id", "conversation")
    got2 = example_stats(renamed, conv_column="conversation").first()
    assert got2.asDict() == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="conv_column"):
        example_stats(renamed)
