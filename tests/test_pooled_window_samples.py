"""Pooled window-group violation samples: the three window-family
expectations sharing one (conv_id, turn_idx) spec must get their
samples from ONE bounded pool job (not one full re-scan each), with
per-member content identical in kind to the dedicated path and a
starvation fallback that never loses rows."""

from __future__ import annotations

import pytest

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.plans.planner import SuiteValidator


@pytest.fixture(scope="module")
def convs(spark):
    # 3 conversations; planted violations:
    #  - conv "dup": duplicate (conv_id, turn_idx) at idx 2
    #  - conv "gap": turn_idx jumps 1 -> 3 (contiguity violation at 3)
    #  - conv "ts":  ts regression at idx 2
    rows = []
    for cid in ("dup", "gap", "ts"):
        idxs = [0, 1, 2, 3]
        if cid == "gap":
            idxs = [0, 1, 3, 4]
        for i, idx in enumerate(idxs):
            ts = 1000 + 10 * i
            if cid == "ts" and idx == 2:
                ts = 1001  # goes backwards
            rows.append((cid, idx, "user", f"t{cid}{idx}", ts))
    # same ts as its twin so non-strict monotonicity stays clean
    # regardless of tie order within the duplicated turn_idx
    rows.append(("dup", 2, "user", "dupe", 1020))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts long"
    )


@pytest.fixture(scope="module")
def window_suite():
    return (
        ExpectationSuite("pooled")
        .add(
            "expect_column_values_to_be_increasing",
            column="ts",
            partition_by="conv_id",
            order_by="turn_idx",
        )
        .add(
            "expect_sequence_to_be_contiguous",
            group_column="conv_id",
            index_column="turn_idx",
        )
        .add(
            "expect_compound_columns_to_be_unique",
            column_list=["conv_id", "turn_idx"],
        )
    )


def _by_type(res):
    return {
        r.expectation_config["expectation_type"]: r for r in res.results
    }


def _spy_pool(monkeypatch, calls):
    orig = SuiteValidator._pooled_window_samples

    def spy(self, df, needy_groups, metrics, rf):
        out = orig(self, df, needy_groups, metrics, rf)
        calls.append(
            {
                "needy": sum(len(g) for g in needy_groups),
                "groups": len(needy_groups),
                "served": len(out),
            }
        )
        return out

    monkeypatch.setattr(SuiteValidator, "_pooled_window_samples", spy)


@pytest.mark.parametrize("jc", [1, 8])
def test_pool_serves_all_shared_window_members(
    spark, convs, window_suite, monkeypatch, jc
):
    calls = []
    _spy_pool(monkeypatch, calls)
    res = SuiteValidator(job_concurrency=jc).validate(
        convs, window_suite, result_format="SUMMARY"
    )
    # one group (conv_id, turn_idx); all three violated members served
    assert calls and calls[-1] == {"needy": 3, "groups": 1, "served": 3}
    by = _by_type(res)

    inc = by["expect_column_values_to_be_increasing"]
    assert inc.success is False
    assert inc.result["unexpected_count"] == 1
    assert inc.result["partial_unexpected_list"] == [1001]

    seq = by["expect_sequence_to_be_contiguous"]
    assert seq.success is False
    assert seq.result["unexpected_count"] == 1
    assert seq.result["partial_unexpected_list"] == [
        {"conv_id": "gap", "turn_idx": 3}
    ]

    uniq = by["expect_compound_columns_to_be_unique"]
    assert uniq.success is False
    # both rows of the duplicated key are flagged (adopted-count parity)
    assert uniq.result["unexpected_count"] == 2
    assert sorted(
        tuple(sorted(d.items()))
        for d in uniq.result["partial_unexpected_list"]
    ) == [
        (("conv_id", "dup"), ("turn_idx", 2)),
        (("conv_id", "dup"), ("turn_idx", 2)),
    ]


def test_pool_carries_index_lineage(spark, convs, window_suite):
    rf = {
        "result_format": "SUMMARY",
        "unexpected_index_column_names": ["conv_id", "turn_idx"],
    }
    res = SuiteValidator(job_concurrency=1).validate(
        convs, window_suite, result_format=rf
    )
    by = _by_type(res)
    inc = by["expect_column_values_to_be_increasing"]
    assert inc.result["partial_unexpected_index_list"] == [
        {"conv_id": "ts", "turn_idx": 2}
    ]


def test_starved_pool_falls_back_to_dedicated_jobs(
    spark, convs, window_suite, monkeypatch
):
    # cap = limit * members * OVERSAMPLE = 0 -> every member starves and
    # must fall back to its dedicated sample job with identical content
    monkeypatch.setattr(SuiteValidator, "_POOL_OVERSAMPLE", 0)
    res = SuiteValidator(job_concurrency=1).validate(
        convs, window_suite, result_format="SUMMARY"
    )
    by = _by_type(res)
    assert by["expect_column_values_to_be_increasing"].result[
        "partial_unexpected_list"
    ] == [1001]
    assert by["expect_sequence_to_be_contiguous"].result[
        "partial_unexpected_list"
    ] == [{"conv_id": "gap", "turn_idx": 3}]
    assert (
        len(
            by["expect_compound_columns_to_be_unique"].result[
                "partial_unexpected_list"
            ]
        )
        == 2
    )


def test_complete_format_bypasses_pool(spark, convs, window_suite, monkeypatch):
    calls = []
    _spy_pool(monkeypatch, calls)
    res = SuiteValidator(job_concurrency=1).validate(
        convs, window_suite, result_format="COMPLETE"
    )
    assert not calls  # COMPLETE keeps the dedicated per-member jobs
    by = _by_type(res)
    assert by["expect_column_values_to_be_increasing"].result[
        "unexpected_list"
    ] == [1001]
