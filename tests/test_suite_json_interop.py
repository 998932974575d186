"""A reference user's on-disk suite JSON loads and runs unchanged.

The reference persists suites as JSON ({expectation_suite_name,
expectations: [{expectation_type, kwargs, meta}], meta, data_asset_type,
ge_cloud_id} — reference ``core/expectation_suite.py``); switching
engines must not require rewriting those files.  Gated on the reference
checkout being present.
"""

from __future__ import annotations

import json
import os

import pytest

from great_expectations_spark.core.suite import ExpectationSuite

REF_SUITES = [
    "/root/reference/examples/demos/primary_keys_in_validation_results/"
    "spark/great_expectations/expectations/visitors_exp.json",
    "/root/reference/tests/test_fixtures/expectation_suites/"
    "parameterized_expectation_suite_fixture.json",
    "/root/reference/tests/test_sets/titanic_expectations.json",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SUITES[0]),
    reason="reference checkout not present",
)


@pytest.mark.parametrize("path", REF_SUITES, ids=os.path.basename)
def test_reference_suite_json_loads(path):
    raw = json.load(open(path))
    suite = ExpectationSuite.from_json(open(path).read())
    assert suite.expectation_suite_name == raw["expectation_suite_name"]
    assert len(suite.expectations) == len(raw["expectations"])
    for ours, theirs in zip(suite.expectations, raw["expectations"]):
        assert ours.expectation_type == theirs["expectation_type"]
    # round-trip re-serializes to a loadable document
    again = ExpectationSuite.from_json(suite.to_json())
    assert [e.expectation_type for e in again.expectations] == [
        e["expectation_type"] for e in raw["expectations"]
    ]


def test_reference_suite_json_validates(spark):
    """The reference's demo suite (in_set over event_type) runs against
    a matching DataFrame and produces per-expectation results."""
    from great_expectations_spark.plans.planner import SuiteValidator

    suite = ExpectationSuite.from_json(open(REF_SUITES[0]).read())
    df = spark.createDataFrame(
        [("page_load",), ("page_view",), ("bogus",)], "event_type string"
    )
    res = SuiteValidator().validate(df, suite, result_format="BASIC")
    assert len(res.results) == 1
    assert res.results[0].success is False
    assert res.results[0].result["unexpected_count"] == 1
