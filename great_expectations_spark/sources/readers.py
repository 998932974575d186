"""Batch readers — BatchSpec analogue.

Reference behavior (``sparkdf_execution_engine.py:272-490``): the reader
format is guessed from the file extension (csv/tsv/parquet/.parq/.pqt/
delta), explicit schema may be pinned (``StructType.fromJson``), runtime
DataFrames pass through, and cloud/catalog specs configure the session.
Ours adds Iceberg/Delta table reads gated behind availability checks (the
jars aren't in this image).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_EXTENSION_FORMATS = {
    ".csv": "csv",
    ".tsv": "csv",
    ".txt": "csv",
    ".parquet": "parquet",
    ".parq": "parquet",
    ".pqt": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
    ".avro": "avro",
    ".delta": "delta",
}


@dataclass
class BatchSpec:
    """Declarative recipe for materializing a batch DataFrame.

    ``spark_conf`` holds session-level connector configuration applied
    before the read — the cloud/catalog plumbing the reference wires in
    ``sparkdf_execution_engine.py:284-391`` (Azure account keys, Glue/
    Iceberg catalog settings).  Use the helpers ``azure_wasb_conf`` /
    ``glue_catalog_conf`` to build it.
    """

    path: Optional[str] = None
    table: Optional[str] = None  # catalog table (Iceberg/Hive/Delta)
    format: Optional[str] = None
    schema: Optional[Any] = None  # StructType | DDL string | schema JSON
    reader_options: Dict[str, Any] = field(default_factory=dict)
    dataframe: Optional[DataFrame] = None
    spark_conf: Dict[str, str] = field(default_factory=dict)


def azure_wasb_conf(storage_account: str, credential: str) -> Dict[str, str]:
    """Azure Blob (wasb) connector conf (reference
    ``sparkdf_execution_engine.py:309-326``)."""
    return {
        "fs.wasb.impl": "org.apache.hadoop.fs.azure.NativeAzureFileSystem",
        f"fs.azure.account.key.{storage_account}.blob.core.windows.net": (
            credential
        ),
    }


def glue_catalog_conf(
    catalog_name: str = "glue", warehouse: Optional[str] = None
) -> Dict[str, str]:
    """AWS Glue as an Iceberg catalog (reference
    ``GlueDataCatalogBatchSpec``, ``sparkdf_execution_engine.py:355-391``;
    connector jars must be on the classpath)."""
    conf = {
        f"spark.sql.catalog.{catalog_name}": (
            "org.apache.iceberg.spark.SparkCatalog"
        ),
        f"spark.sql.catalog.{catalog_name}.catalog-impl": (
            "org.apache.iceberg.aws.glue.GlueCatalog"
        ),
    }
    if warehouse:
        conf[f"spark.sql.catalog.{catalog_name}.warehouse"] = warehouse
    return conf


def guess_reader_format(path: str) -> str:
    base = path.rstrip("/")
    ext = os.path.splitext(base)[1].lower()
    if ext in _EXTENSION_FORMATS:
        return _EXTENSION_FORMATS[ext]
    if ext == ".gz":
        inner = os.path.splitext(os.path.splitext(base)[0])[1].lower()
        if inner in _EXTENSION_FORMATS:
            return _EXTENSION_FORMATS[inner]
    return "parquet"


def _resolve_schema(schema: Any) -> Optional[T.StructType]:
    if schema is None or isinstance(schema, T.StructType):
        return schema
    if isinstance(schema, str):
        return T.StructType.fromDDL(schema)
    if isinstance(schema, dict):
        return T.StructType.fromJson(schema)
    raise TypeError(f"unsupported schema spec {type(schema)}")


def load_batch(spark: SparkSession, spec: BatchSpec) -> DataFrame:
    for key, value in spec.spark_conf.items():
        spark.conf.set(key, value)
    if spec.dataframe is not None:
        return spec.dataframe
    if spec.table is not None:
        return spark.table(spec.table)
    if spec.path is None:
        raise ValueError("BatchSpec needs one of dataframe/table/path")
    fmt = spec.format or guess_reader_format(spec.path)
    reader = spark.read
    schema = _resolve_schema(spec.schema)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options = {"header": "true", **spec.reader_options}
        if spec.path.endswith(".tsv"):
            options.setdefault("sep", "\t")
        return reader.options(**options).csv(spec.path)
    if fmt in ("delta", "iceberg"):
        if not _format_available(spark, fmt):
            raise RuntimeError(
                f"{fmt} support requires the {fmt} runtime jars on the "
                "classpath (not bundled in this environment)"
            )
        return reader.options(**spec.reader_options).format(fmt).load(spec.path)
    return reader.options(**spec.reader_options).format(fmt).load(spec.path)


def _format_available(spark: SparkSession, fmt: str) -> bool:
    probe_class = {
        "delta": "org.apache.spark.sql.delta.DeltaLog",
        "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
    }[fmt]
    try:
        spark._jvm.java.lang.Class.forName(probe_class)  # type: ignore[union-attr]
        return True
    except Exception:
        return False
