"""Exact-substring dedup (Lee et al. 2021 ExactSubstr, distributed):
deterministic planted cases + hypothesis differential vs a pure-Python
suffix-scan oracle + physical-plan guard."""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from great_expectations_spark.functions.dedup import (
    _normalize_py,
    remove_repeated_spans,
    repeated_spans,
)


def _py_tokens(t):
    if t is None:
        return []
    norm = _normalize_py(t)
    return norm.split(" ") if norm else []


def _py_spans(rows, n, min_count=2, keep="none"):
    """Independent oracle: literal token-tuple counting (no hashing)."""
    occ = defaultdict(list)
    for d, t in rows:
        ws = _py_tokens(t)
        for i in range(len(ws) - n + 1):
            occ[tuple(ws[i : i + n])].append((d, i + 1))
    dup_pos = defaultdict(list)
    for ps in occ.values():
        if len(ps) >= min_count:
            sel = ps if keep == "none" else [p for p in ps if p != min(ps)]
            for d, p in sel:
                dup_pos[d].append(p)
    spans = {}
    for d, ps in dup_pos.items():
        out = []
        for p in sorted(ps):
            if out and p <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], p + n))
            else:
                out.append((p, p + n))
        spans[d] = out
    return spans


def _py_removed(rows, n, min_count=2, keep="none"):
    spans = _py_spans(rows, n, min_count, keep)
    out = {}
    for d, t in rows:
        if d not in spans:
            out[d] = t
            continue
        ws = _py_tokens(t)
        covered = set()
        for s, e in spans[d]:
            covered.update(range(s, e))
        out[d] = " ".join(
            w for i, w in enumerate(ws, start=1) if i not in covered
        )
    return out


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "intro words then the quick brown fox jumps over something"),
    (3, "a b c a b c"),
    (4, "totally unique content here"),
    (5, None),
    (6, "   "),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spark_spans(spark, rows, n, keep="none", min_count=2):
    got = repeated_spans(
        _df(spark, rows), n=n, keep=keep, min_count=min_count
    ).collect()
    return {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]]
        for r in got
    }


def test_planted_cross_and_within_doc(spark):
    spans = _spark_spans(spark, ROWS, n=3)
    # docs 1/2 share the 6-word sentence; doc 3 repeats within itself
    assert spans == {1: [(1, 7)], 2: [(4, 10)], 3: [(1, 7)]}

    first = _spark_spans(spark, ROWS, n=3, keep="first")
    # canonical first occurrence (min (doc_id, pos)) is exempt
    assert first == {2: [(4, 10)], 3: [(4, 7)]}


def test_stats_columns(spark):
    row = {
        r["doc_id"]: r
        for r in repeated_spans(_df(spark), n=3).collect()
    }[3]
    assert row["n_words"] == 6
    assert row["n_dup_words"] == 6
    assert row["dup_fraction"] == pytest.approx(1.0)


def test_removal_matches_python_oracle(spark):
    want = _py_removed(ROWS, n=3)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(_df(spark), n=3).collect()
    }
    # untouched docs keep their ORIGINAL text (incl. null / whitespace)
    assert got[4] == "totally unique content here"
    assert got[5] is None
    assert got[6] == "   "
    for d in (1, 2, 3):
        assert got[d] == want[d], d


def test_min_count_threshold(spark):
    rows = [(i, "same three words") for i in range(3)] + [
        (9, "pair of dup"), (10, "pair of dup")]
    assert set(_spark_spans(spark, rows, n=3, min_count=3)) == {0, 1, 2}
    assert set(_spark_spans(spark, rows, n=3, min_count=2)) == {
        0, 1, 2, 9, 10}


def test_validates_args(spark):
    with pytest.raises(ValueError):
        repeated_spans(_df(spark), n=0)
    with pytest.raises(ValueError):
        repeated_spans(_df(spark), min_count=1)
    with pytest.raises(ValueError):
        repeated_spans(_df(spark), keep="both")


@settings(max_examples=12, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee".split()), max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=1, max_value=3),
    keep=st.sampled_from(["none", "first"]),
)
def test_differential_vs_python_oracle(spark, texts, n, keep):
    rows = list(enumerate(texts))
    want = _py_spans(rows, n, keep=keep)
    got = _spark_spans(spark, rows, n=n, keep=keep)
    assert got == want
    want_txt = _py_removed(rows, n, keep=keep)
    got_txt = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(
            _df(spark, rows), n=n, keep=keep
        ).collect()
    }
    for d, t in rows:
        if d in want:
            assert got_txt[d] == want_txt[d], (d, t)
        else:
            assert got_txt[d] == t, (d, t)


def test_plan_is_jvm_only(spark):
    out = repeated_spans(_df(spark), n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan
    # the per-doc interval merge happens in a bounded groupBy, and the
    # corpus-side gram count is a map-side-combined hash aggregate
    assert "hashpartitioning(__gram" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_cache_positions_same_result(spark):
    from great_expectations_spark.functions.dedup import release_cached

    plain = _spark_spans(spark, ROWS, n=3)
    got = repeated_spans(_df(spark), n=3, cache_positions=True)
    cached = {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]]
        for r in got.collect()
    }
    assert cached == plain
    assert release_cached() >= 1


def test_substring_duplication_expectation(spark):
    """Suite-level ExactSubstr duplication gate over the planted corpus:
    docs 1/2/3 carry 6 duplicated words each over 30 total -> 0.6."""
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    def run(threshold, **kw):
        suite = ExpectationSuite("dup").add(
            "expect_corpus_substring_duplication_to_be_less_than",
            column="text", n=3, threshold=threshold, **kw,
        )
        r = SuiteValidator().validate(_df(spark), suite).results[0]
        if r.exception_info["raised_exception"]:
            raise AssertionError(r.exception_info["exception_message"])
        return r

    ok = run(0.7, id_column="doc_id")
    assert ok.success
    assert ok.result["observed_value"] == pytest.approx(0.6)
    det = ok.result["details"]
    assert det["duplicated_words"] == 18
    assert det["total_words"] == 30
    assert det["documents_with_duplicates"] == 3

    # same numbers without an id column (synthetic doc ids)
    anon = run(0.5)
    assert not anon.success
    assert anon.result["observed_value"] == pytest.approx(0.6)
