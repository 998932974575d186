"""V2-API compatibility layer (``great_expectations.dataset``)."""

from great_expectations_spark.dataset.sparkdf_dataset import SparkDFDataset

__all__ = ["SparkDFDataset"]
