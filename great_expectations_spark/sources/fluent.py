"""Fluent datasource API — the reference's ``context.sources.add_spark...``
flow (``datasource/fluent/spark_datasource.py``, ``.../interfaces.py``)
re-expressed without the data-context: a Datasource holds named assets,
an asset builds batches (optionally split by a splitter / thinned by a
sampler from ``sources/splitters.py``), and a batch is just a DataFrame +
its BatchSpec lineage.

    ds = Datasource("lake", spark)
    asset = ds.add_parquet_asset("lineitem", "/data/lineitem.parquet")
    batch = asset.build_batch()                             # whole table
    one = asset.batch_on_column_value("l_returnflag", l_returnflag="A")

Cloud/catalog configuration (reference
``sparkdf_execution_engine.py:284-391`` — Azure account keys, Glue
catalog) is session-level in Spark: pass ``spark_config`` and the options
are applied to the session conf before any read.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from great_expectations_spark.sources.readers import BatchSpec, load_batch
from great_expectations_spark.sources import splitters as sp


@dataclass
class DataAsset:
    """A named, re-readable data asset inside a Datasource."""

    name: str
    spec: BatchSpec
    spark: SparkSession

    def build_batch(self) -> DataFrame:
        return load_batch(self.spark, self.spec)

    def batch_spec_meta(self) -> Dict[str, Any]:
        """Result-meta lineage for batches built from this asset — the
        reference's ``meta["batch_spec"]`` (path/table/format/options)."""
        spec: Dict[str, Any] = {"asset_name": self.name}
        if self.spec.path is not None:
            spec["path"] = self.spec.path
        if self.spec.table is not None:
            spec["table"] = self.spec.table
        if self.spec.format is not None:
            spec["format"] = self.spec.format
        if self.spec.reader_options:
            spec["reader_options"] = dict(self.spec.reader_options)
        if self.spec.dataframe is not None:
            spec["type"] = "runtime_dataframe"
        return {"batch_spec": spec}

    def validate(self, suite, validator=None, **validate_kwargs):
        """Build the batch and validate it, stamping the asset's
        batch_spec lineage into the result meta."""
        from great_expectations_spark.plans.planner import SuiteValidator

        v = validator or SuiteValidator()
        batch_meta = dict(validate_kwargs.pop("batch_meta", {}) or {})
        merged = {**self.batch_spec_meta(), **batch_meta}
        return v.validate(
            self.build_batch(), suite, batch_meta=merged, **validate_kwargs
        )

    # -- splitter / sampler passthroughs (reference splitter parity:
    # batch_identifiers select ONE batch from the split) ------------------

    def batch_on_column_value(
        self, column: str, **batch_identifiers: Any
    ) -> DataFrame:
        return sp.split_on_column_value(
            self.build_batch(), column, batch_identifiers
        )

    def batch_on_date_parts(
        self,
        column: str,
        parts: Optional[List[str]] = None,
        **batch_identifiers: Any,
    ) -> DataFrame:
        return sp.split_on_date_parts(
            self.build_batch(),
            column,
            batch_identifiers,
            parts or ["year", "month", "day"],
        )

    def batch_values(self, column: str, cap: int = 10_000) -> List[Any]:
        """Distinct batch identifiers for a column-value split (sorted).

        Intended for batch-identifier columns (dates, regions, shards).
        The collect is bounded — ``limit(cap + 1)`` rides inside the same
        job, so a high-cardinality column raises instead of streaming
        millions of rows to the driver.
        """
        rows = (
            self.build_batch().select(column).distinct().limit(cap + 1).collect()
        )
        if len(rows) > cap:
            raise ValueError(
                f"column {column!r} has more than {cap} distinct values — "
                "not a batch-identifier column; raise cap= explicitly if "
                "you really want a driver-side collect this large"
            )
        return sorted((r[column] for r in rows), key=str)

    def sample_random(self, fraction: float, seed: int = 42) -> DataFrame:
        return sp.sample_using_random(self.build_batch(), fraction, seed)

    def sample_limit(self, n: int) -> DataFrame:
        return sp.sample_using_limit(self.build_batch(), n)


class Datasource:
    """Named collection of assets over one SparkSession."""

    def __init__(
        self,
        name: str,
        spark: SparkSession,
        spark_config: Optional[Dict[str, str]] = None,
    ) -> None:
        self.name = name
        self.spark = spark
        self.assets: Dict[str, DataAsset] = {}
        # session-level cloud/catalog conf (Azure keys, Glue catalog, ...)
        for key, value in (spark_config or {}).items():
            spark.conf.set(key, value)

    def _add(self, name: str, spec: BatchSpec) -> DataAsset:
        if name in self.assets:
            raise ValueError(f"asset {name!r} already exists")
        asset = DataAsset(name=name, spec=spec, spark=self.spark)
        self.assets[name] = asset
        return asset

    def add_parquet_asset(
        self, name: str, path: str, **reader_options: Any
    ) -> DataAsset:
        return self._add(
            name,
            BatchSpec(
                path=path, format="parquet", reader_options=reader_options
            ),
        )

    def add_csv_asset(
        self, name: str, path: str, **reader_options: Any
    ) -> DataAsset:
        return self._add(
            name,
            BatchSpec(path=path, format="csv", reader_options=reader_options),
        )

    def add_json_asset(
        self, name: str, path: str, **reader_options: Any
    ) -> DataAsset:
        return self._add(
            name,
            BatchSpec(path=path, format="json", reader_options=reader_options),
        )

    def add_orc_asset(
        self, name: str, path: str, **reader_options: Any
    ) -> DataAsset:
        return self._add(
            name,
            BatchSpec(path=path, format="orc", reader_options=reader_options),
        )

    def add_table_asset(self, name: str, table: str) -> DataAsset:
        """Catalog table (Iceberg / Hive / Delta via session catalogs)."""
        return self._add(name, BatchSpec(table=table))

    def add_dataframe_asset(self, name: str, df: DataFrame) -> DataAsset:
        return self._add(name, BatchSpec(dataframe=df))

    def get_asset(self, name: str) -> DataAsset:
        return self.assets[name]
