"""Property-based differential tests for the window-path operators:
monotonicity and sequence contiguity (both physical strategies).

The key equivalence the engine promises (window_ops.py docstring): the
skew-immune ``strategy='join'`` contiguity counts EXACTLY what the
window strategy counts, on any input — including duplicate indexes,
nulls, and groups that start above ``first_index``.  Hypothesis hunts
the disagreement; a pure-Python oracle arbitrates.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.plans.planner import SuiteValidator

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

groups = st.sampled_from(["g0", "g1", "g2"])
indexes = st.one_of(st.none(), st.integers(min_value=-2, max_value=12))


def _contig_oracle(data, first_index: int) -> int:
    """Violations = per group, one per DISTINCT index > first_index whose
    predecessor index is absent from the group's (non-null) index set.
    Identical to the window path's per-row count: among duplicate
    indexes only the first ordered row can flag."""
    seen = defaultdict(set)
    for g, i in data:
        if i is not None:
            seen[g].add(i)
    bad = 0
    for g, idxs in seen.items():
        bad += sum(
            1 for i in idxs if i > first_index and (i - 1) not in idxs
        )
    return bad


@given(
    data=st.lists(st.tuples(groups, indexes), min_size=0, max_size=40),
    first_index=st.sampled_from([0, 1]),
)
@settings(**SETTINGS)
def test_contiguity_window_join_and_oracle_agree(
    spark, data, first_index
):
    df = spark.createDataFrame(data, "conv_id string, turn_idx int")
    counts = {}
    for strategy in ("window", "join"):
        suite = ExpectationSuite("prop").add(
            "expect_sequence_to_be_contiguous",
            group_column="conv_id",
            index_column="turn_idx",
            first_index=first_index,
            strategy=strategy,
        )
        res = SuiteValidator().validate(df, suite, result_format="BASIC")
        counts[strategy] = res.results[0].result["unexpected_count"]
    expected = _contig_oracle(data, first_index)
    assert counts["window"] == expected, (counts, data)
    assert counts["join"] == expected, (counts, data)


@given(
    data=st.lists(
        st.tuples(
            groups,
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        ),
        min_size=0,
        max_size=40,
    ),
    strictly=st.booleans(),
)
@settings(**SETTINGS)
def test_increasing_matches_python_oracle(spark, data, strictly):
    # unique per-group order key so "previous row" is unambiguous
    rows = []
    order = defaultdict(int)
    for g, v in data:
        rows.append((g, order[g], v))
        order[g] += 1
    df = spark.createDataFrame(rows, "g string, ord int, v int")
    suite = ExpectationSuite("prop").add(
        "expect_column_values_to_be_increasing",
        column="v",
        partition_by="g",
        order_by="ord",
        strictly=strictly,
    )
    res = SuiteValidator().validate(df, suite, result_format="BASIC")

    bad = 0
    by_g = defaultdict(list)
    for g, o, v in rows:
        by_g[g].append((o, v))
    for g, seq in by_g.items():
        prev = None
        for _, v in sorted(seq):
            if v is None:
                continue
            if prev is not None and (
                v <= prev if strictly else v < prev
            ):
                bad += 1
            prev = v  # engine tracks last NON-NULL value
    assert res.results[0].result["unexpected_count"] == bad, (
        data,
        strictly,
    )


@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.one_of(st.none(), st.integers(0, 5)),
            st.one_of(st.none(), st.integers(0, 5)),
        ),
        min_size=0,
        max_size=30,
    ),
    total=st.integers(min_value=0, max_value=15),
)
@settings(**SETTINGS)
def test_multicolumn_sum_matches_python_oracle(spark, data, total):
    df = spark.createDataFrame(data, "a int, b int, c int")
    suite = ExpectationSuite("prop").add(
        "expect_multicolumn_sum_to_equal",
        column_list=["a", "b", "c"],
        sum_total=total,
    )
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    # reference SPARK-backend semantics: default ignore_row_if is
    # all_values_are_missing (expect_multicolumn_sum_to_equal.py:66), and
    # the Spark condition sums COALESCE(col, 0)
    # (multicolumn_sum_equal.py:40-46) — so a partially null row stays in
    # the domain with its nulls counted as 0.  (The reference's pandas
    # backend uses skipna=False and disagrees with its own Spark backend
    # here; this engine mirrors Spark.)
    domain = [r for r in data if any(v is not None for v in r)]
    bad = sum(
        1 for r in domain if sum(v or 0 for v in r) != total
    )
    assert res.results[0].result["unexpected_count"] == bad, data


@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
            st.booleans(),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_two_sample_ks_matches_python_oracle(spark, data):
    """The one-pass split-histogram KS (both windows in ONE conditional
    agg) must equal the from-scratch binned ECDF statistic."""
    df = spark.createDataFrame(data, "v int, is_base boolean")
    bins = [0, 1, 2, 3, 4, 5]
    suite = ExpectationSuite("prop").add(
        "expect_column_two_sample_ks_to_be_less_than",
        column="v",
        baseline_condition="is_base",
        threshold=0.5,
        bins=bins,
    )
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    got = res.results[0].result["observed_value"]

    def side(flag):
        return [v for v, b in data if v is not None and b == flag]

    base, cur = side(True), side(False)

    def hist(vals):
        counts = [0] * (len(bins) - 1)
        for v in vals:
            for i in range(len(bins) - 1):
                lo, hi = bins[i], bins[i + 1]
                last = i == len(bins) - 2
                if lo <= v < hi or (last and lo <= v <= hi):
                    counts[i] += 1
                    break
        return counts

    hb, hc = hist(base), hist(cur)
    tb, tc = len(base) or 1, len(cur) or 1
    rb = rc = 0.0
    stat = 0.0
    for pb, pc in zip(hb, hc):
        rb += pb / tb
        rc += pc / tc
        stat = max(stat, abs(rb - rc))
    assert got == pytest.approx(stat, abs=1e-12), (data, got, stat)
