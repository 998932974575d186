"""great_expectations_spark — a from-scratch PySpark-native expectation /
data-validation engine with the semantics of Great Expectations v0.16.1
(reference: tmilitino/great_expectations), re-architected Spark-first.

Key design deltas vs the reference (see SURVEY.md):

* The whole expectation suite compiles into ONE bundled ``df.agg(...)`` pass
  (condition metrics become ``sum(when(unexpected, 1))`` counters; aggregate
  metrics join the same agg), instead of a metric-graph fixpoint issuing many
  Spark jobs (reference: ``execution_engine/sparkdf_execution_engine.py:715-793``).
* Uniqueness / compound-uniqueness use a two-phase hash aggregation
  (map-side combined ``groupBy(value)``) instead of
  ``Window.partitionBy(value)`` over all rows (reference:
  ``expectations/metrics/map_metric_provider/..column_values_unique.py:77-82``)
  which shuffles every row by value and dies on hot keys.
* Monotonicity (increasing/decreasing) is evaluated per partition key
  (``Window.partitionBy(key).orderBy(order)``) instead of the reference's
  single-partition global ``orderBy(lit("constant"))``
  (``column_values_increasing.py:70-150``).
* Per-partition validation of a partitioned table happens in one
  ``groupBy(partition_col)`` pass producing an
  ``ExpectationSuiteValidationResult`` per partition, instead of a driver
  loop over per-partition filters.
"""

from great_expectations_spark.core.result_format import (
    parse_result_format,
    format_map_output,
    mostly_success,
    validate_metric_value_between,
)
from great_expectations_spark.core.results import (
    ExpectationValidationResult,
    ExpectationSuiteValidationResult,
)
from great_expectations_spark.core.suite import (
    ExpectationConfiguration,
    ExpectationSuite,
)
from great_expectations_spark.plans.planner import (
    SuiteValidator,
    registered_expectation_types,
)
from great_expectations_spark.checkpoint.runner import (
    partition_fingerprints,
    run_checkpoint,
    validate_by_partition,
)
from great_expectations_spark.checkpoint.manifest import CheckpointManifest
from great_expectations_spark.checkpoint.sketches import (
    EmptyBatchError,
    NoHistoryError,
    PartitionSketchStore,
)
from great_expectations_spark.core.validator_api import Validator
from great_expectations_spark.operators.table_ops import table_head
from great_expectations_spark.sources.readers import BatchSpec, load_batch
from great_expectations_spark.sources.fluent import DataAsset, Datasource
from great_expectations_spark.sources.sinks import (
    results_to_dataframe,
    write_results,
)
from great_expectations_spark.context import (
    get_context,
    Checkpoint,
    CheckpointResult,
    EphemeralDataContext,
    FileDataContext,
)
__version__ = "0.1.0"

# rule_profiler needs numpy (not a pyspark hard dependency) — exported
# lazily so `import great_expectations_spark` keeps working for the
# validation/checkpoint API in numpy-less environments (PEP 562)
_LAZY = {
    "Rule": "great_expectations_spark.operators.rule_profiler",
    "RuleBasedProfiler": "great_expectations_spark.operators.rule_profiler",
    "onboarding_assistant": "great_expectations_spark.operators.rule_profiler",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )

__all__ = [
    "parse_result_format",
    "format_map_output",
    "mostly_success",
    "validate_metric_value_between",
    "ExpectationValidationResult",
    "ExpectationSuiteValidationResult",
    "ExpectationConfiguration",
    "ExpectationSuite",
    "SuiteValidator",
    "Validator",
    "table_head",
    "registered_expectation_types",
    "run_checkpoint",
    "validate_by_partition",
    "partition_fingerprints",
    "CheckpointManifest",
    "EmptyBatchError",
    "NoHistoryError",
    "PartitionSketchStore",
    "BatchSpec",
    "Datasource",
    "DataAsset",
    "load_batch",
    "results_to_dataframe",
    "write_results",
    "Rule",
    "RuleBasedProfiler",
    "onboarding_assistant",
    "get_context",
    "Checkpoint",
    "CheckpointResult",
    "EphemeralDataContext",
    "FileDataContext",
]
