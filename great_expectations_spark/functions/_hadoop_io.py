"""Small-object JSON persistence through Spark's Hadoop FileSystem —
driver-side, any scheme the session reaches (file:// hdfs:// s3a://
abfss:// gs://), zero cloud-SDK dependencies.  Shared by the model
artifacts (BPE tokenizer, LM / quality-classifier dicts); the IVF-PQ
index keeps its own writer (codes are a parquet TABLE, not a JSON
blob)."""

from __future__ import annotations

import json
from typing import Any


def hadoop_json_save(spark, obj: Any, path: str) -> None:
    """Serialize ``obj`` as UTF-8 JSON to ``path`` (overwrite)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def hadoop_json_load(spark, path: str) -> Any:
    """Read UTF-8 JSON from ``path``."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        payload = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(payload)
