"""Property-based differential testing: random data + random expectation
parameters vs an independent pure-Python oracle.

Each hypothesis example builds ONE small DataFrame and validates ONE
bundled suite (a single Spark agg job), then replays every expectation's
semantics in plain Python over the same rows — nulls, NaN, unicode,
strict bounds, mostly thresholds, COMPLETE-format violation multisets.
The Python oracle shares no code with the engine (no Spark expressions,
no planner), so any divergence is a real semantic finding.

Reference semantics being pinned: mostly thresholds and the
success-on-empty (vacuous true) rule from the reference's
``_format_map_output`` family; NaN handling follows the reference's
Spark backend (NaN is a VALUE, not a null — only ``isNull`` rows are
missing).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.plans.planner import SuiteValidator

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic corpus: CI-stable, still varied
)

# ---------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------

ints = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
)
floats = st.one_of(
    st.none(),
    st.floats(allow_nan=True, allow_infinity=False, width=32),
)
texts = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=12,
    ),
)

rows = st.lists(st.tuples(ints, floats, texts), min_size=0, max_size=40)


def _mk_df(spark, data):
    return spark.createDataFrame(
        data, "i int, f float, s string"
    )


def _mostly_ok(unexpected: int, nonnull: int, mostly: float) -> bool:
    # reference: success iff (nonnull - unexpected) / nonnull >= mostly;
    # vacuous true when the domain is empty
    if nonnull == 0:
        return True
    return (nonnull - unexpected) / nonnull >= mostly


# ---------------------------------------------------------------------
# map conditions: one bundled suite per example
# ---------------------------------------------------------------------


@given(
    data=rows,
    lo=st.integers(min_value=-100, max_value=100),
    width=st.integers(min_value=0, max_value=100),
    strict=st.booleans(),
    mostly=st.sampled_from([1.0, 0.9, 0.5]),
    value_set=st.lists(ints.filter(lambda v: v is not None), max_size=4),
)
@settings(**SETTINGS)
def test_map_conditions_match_python_oracle(
    spark, data, lo, width, strict, mostly, value_set
):
    hi = lo + width
    suite = (
        ExpectationSuite("prop")
        .add("expect_column_values_to_not_be_null", column="i")
        .add(
            "expect_column_values_to_be_between",
            column="i",
            min_value=lo,
            max_value=hi,
            strict_min=strict,
            strict_max=strict,
            mostly=mostly,
        )
        .add(
            "expect_column_values_to_be_in_set",
            column="i",
            value_set=value_set or [0],
            mostly=mostly,
        )
        .add(
            "expect_column_value_lengths_to_be_between",
            column="s",
            min_value=1,
            max_value=5,
        )
    )
    res = SuiteValidator().validate(
        _mk_df(spark, data), suite, result_format="BASIC"
    )
    by_type = {
        r.expectation_config.expectation_type: r for r in res.results
    }

    i_vals = [r[0] for r in data]
    nonnull_i = [v for v in i_vals if v is not None]

    # not_null: unexpected = nulls, domain = all rows
    r = by_type["expect_column_values_to_not_be_null"]
    exp_null = sum(1 for v in i_vals if v is None)
    assert r.result["unexpected_count"] == exp_null
    assert r.success == (exp_null == 0)

    # between with strict flags
    r = by_type["expect_column_values_to_be_between"]
    if strict:
        bad = [v for v in nonnull_i if not (lo < v < hi)]
    else:
        bad = [v for v in nonnull_i if not (lo <= v <= hi)]
    assert r.result["unexpected_count"] == len(bad)
    assert r.success == _mostly_ok(len(bad), len(nonnull_i), mostly)

    # in_set
    r = by_type["expect_column_values_to_be_in_set"]
    vs = set(value_set or [0])
    bad = [v for v in nonnull_i if v not in vs]
    assert r.result["unexpected_count"] == len(bad)
    assert r.success == _mostly_ok(len(bad), len(nonnull_i), mostly)

    # value lengths (unicode: Python len == Spark length, both count
    # codepoints)
    r = by_type["expect_column_value_lengths_to_be_between"]
    s_vals = [x[2] for x in data if x[2] is not None]
    bad = [s for s in s_vals if not (1 <= len(s) <= 5)]
    assert r.result["unexpected_count"] == len(bad)


@given(data=rows)
@settings(**SETTINGS)
def test_nan_is_a_value_not_a_null(spark, data):
    """Reference Spark-backend semantics: only isNull rows are missing;
    NaN participates in the domain and FAILS a between check."""
    suite = (
        ExpectationSuite("prop")
        .add("expect_column_values_to_not_be_null", column="f")
        .add(
            "expect_column_values_to_be_between",
            column="f",
            # beyond float32 range so only NaN can fail the bounds
            min_value=-4e38,
            max_value=4e38,
        )
    )
    res = SuiteValidator().validate(
        _mk_df(spark, data), suite, result_format="BASIC"
    )
    f_vals = [r[1] for r in data]
    nulls = sum(1 for v in f_vals if v is None)
    nans = sum(
        1 for v in f_vals if v is not None and math.isnan(v)
    )
    assert res.results[0].result["unexpected_count"] == nulls
    # NaN compares false to both bounds -> unexpected
    assert res.results[1].result["unexpected_count"] == nans
    assert res.results[1].result["element_count"] == len(f_vals)
    assert res.results[1].result["missing_count"] == nulls


# ---------------------------------------------------------------------
# aggregates
# ---------------------------------------------------------------------


@given(data=rows)
@settings(**SETTINGS)
def test_aggregates_match_python_oracle(spark, data):
    suite = (
        ExpectationSuite("prop")
        .add("expect_table_row_count_to_equal", value=len(data))
        .add(
            "expect_column_mean_to_be_between",
            column="i",
            min_value=-1e12,
            max_value=1e12,
        )
        .add(
            "expect_column_distinct_values_to_be_in_set",
            column="i",
            value_set=list(range(-5, 6)),
        )
    )
    res = SuiteValidator().validate(
        _mk_df(spark, data), suite, result_format="BASIC"
    )
    by_type = {
        r.expectation_config.expectation_type: r for r in res.results
    }
    assert by_type["expect_table_row_count_to_equal"].success

    nonnull = [r[0] for r in data if r[0] is not None]
    r = by_type["expect_column_mean_to_be_between"]
    if nonnull:
        assert r.result["observed_value"] == pytest.approx(
            sum(nonnull) / len(nonnull), rel=1e-9
        )
    else:
        assert r.result["observed_value"] is None

    r = by_type["expect_column_distinct_values_to_be_in_set"]
    expect_ok = set(nonnull) <= set(range(-5, 6))
    assert r.success == expect_ok


# ---------------------------------------------------------------------
# uniqueness + COMPLETE violation multiset
# ---------------------------------------------------------------------


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_unique_complete_list_matches_python(spark, data):
    df = spark.createDataFrame(data, "a int, b int")
    suite = ExpectationSuite("prop").add(
        "expect_column_values_to_be_unique", column="a"
    )
    res = SuiteValidator().validate(df, suite, result_format="COMPLETE")
    from collections import Counter

    counts = Counter(r[0] for r in data)
    expected = sorted(
        v for v, c in counts.items() for _ in range(c) if c > 1
    )
    got = sorted(res.results[0].result["unexpected_list"])
    assert got == expected


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_compound_unique_matches_python(spark, data):
    df = spark.createDataFrame(data, "a int, b int")
    suite = ExpectationSuite("prop").add(
        "expect_compound_columns_to_be_unique", column_list=["a", "b"]
    )
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    from collections import Counter

    counts = Counter(data)
    exp = sum(c for c in counts.values() if c > 1)
    assert res.results[0].result["unexpected_count"] == exp


# ---------------------------------------------------------------------
# row conditions compose with map metrics
# ---------------------------------------------------------------------


@given(data=rows, cut=st.integers(min_value=-50, max_value=50))
@settings(**SETTINGS)
def test_row_condition_scopes_the_domain(spark, data, cut):
    suite = ExpectationSuite("prop").add(
        "expect_column_values_to_not_be_null",
        column="s",
        row_condition=f"i > {cut}",
        condition_parser="spark",
    )
    res = SuiteValidator().validate(
        _mk_df(spark, data), suite, result_format="BASIC"
    )
    domain = [r for r in data if r[0] is not None and r[0] > cut]
    exp_null = sum(1 for r in domain if r[2] is None)
    assert res.results[0].result["unexpected_count"] == exp_null
    assert res.results[0].result["element_count"] == len(domain)


# ---------------------------------------------------------------------
# connected components: distributed star rounds vs pure-Python union-find
# ---------------------------------------------------------------------


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture],
          derandomize=True)
def test_connected_components_distributed_matches_union_find(spark, edges):
    """The DISTRIBUTED star-round path (driver_threshold=0) must label any
    random multigraph identically to a from-scratch union-find."""
    from great_expectations_spark.functions import dedup

    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    if not edges:
        pairs = pairs.filter("id_a <> id_a")
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(
            pairs, driver_threshold=0
        ).collect()
    }

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    # relabel every node to its component MIN (union-by-min keeps root
    # minimal already, but path order can vary — recompute per component)
    comp = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    want = {x: min(members) for members in comp.values() for x in members}
    assert got == want


# ---------------------------------------------------------------------
# asof_join vs pandas.merge_asof (independent implementation)
# ---------------------------------------------------------------------

_asof_ts = st.one_of(st.none(), st.integers(min_value=0, max_value=40))
_asof_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", None]),  # key (nullable)
        _asof_ts,                            # ordering value (nullable)
    ),
    min_size=0,
    max_size=25,
)


@settings(**SETTINGS)
@given(
    left_rows=_asof_rows,
    right_rows=_asof_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    exact=st.booleans(),
    tolerance=st.sampled_from([None, 0.0, 3.0, 10.0]),
)
def test_asof_join_differential_vs_pandas(
    spark, left_rows, right_rows, direction, exact, tolerance
):
    """Random nullable keys/timestamps, every direction × exact-match ×
    tolerance combination, vs pandas merge_asof as the oracle.  pandas
    refuses NULL ordering keys, so the oracle drops them and the engine
    rows with NULL ts/key must come back unmatched."""
    import pandas as pd

    from great_expectations_spark.functions.temporal import asof_join

    if direction == "nearest" and not exact:
        # pandas merge_asof(nearest, allow_exact_matches=False) excludes
        # equal ts both ways; semantics covered by the fixed-seed tests,
        # skipped here to keep the combination grid square
        exact = True

    left = [
        (k, None if t is None else float(t), i)
        for i, (k, t) in enumerate(left_rows)
    ]
    # unique (key, ts) right side: equal-ts ties are engine-arbitrary in
    # BOTH engines, so they are out of differential scope
    seen = set()
    right = []
    for j, (k, t) in enumerate(right_rows):
        if (k, t) in seen:
            continue
        seen.add((k, t))
        right.append((k, None if t is None else float(t), float(100 + j)))

    ldf = spark.createDataFrame(left, "k string, t double, lid long")
    rdf = spark.createDataFrame(right, "k string, t double, px double")
    got = {
        r["lid"]: r["px"]
        for r in asof_join(
            ldf, rdf, on="t", by="k", direction=direction,
            allow_exact_matches=exact, tolerance=tolerance,
        ).collect()
    }

    lp = pd.DataFrame(
        [r for r in left if r[0] is not None and r[1] is not None],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        [r for r in right if r[0] is not None and r[1] is not None],
        columns=["k", "t", "px"],
    ).sort_values("t", kind="stable")
    want = {r[2]: None for r in left}  # default: unmatched
    if len(lp):
        merged = pd.merge_asof(
            lp, rp, on="t", by="k", direction=direction,
            allow_exact_matches=exact, tolerance=tolerance,
            suffixes=("", "_r"),
        ) if len(rp) else lp.assign(px=None)
        for r in merged.itertuples():
            want[int(r.lid)] = None if pd.isna(r.px) else float(r.px)
    assert got == want
