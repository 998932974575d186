"""Per-partition mergeable HLL distinct sketches for incremental runs.

The 10^12-row problem this solves: a table-level distinct count
(``approx_count_distinct``) must re-scan EVERY partition on every run,
so a resumed/incremental validation pays the whole table again for one
number.  DataSketches HLL sketches (Spark 4 ``hll_sketch_agg`` /
``hll_union_agg``, JVM-side) are mergeable: this store computes ONE
bounded sketch per (partition, column) for partitions it has not seen,
persists them next to the checkpoint manifest (same atomic-rename,
one-file-per-partition layout — object-store safe), and answers the
table-level question by unioning stored sketches — a driver-side merge
of ``num_partitions`` × ~``2^lg_k``-byte blobs, no re-scan of validated
data.  Estimates are exact while per-partition cardinality stays in the
sketch's sparse mode, and within ~1.6%/sqrt(2^lg_k) beyond it.

Reference analogue: none (the reference recomputes from scratch per
run); the manifest-resume design follows ``checkpoint/manifest.py``
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").
"""

from __future__ import annotations

import base64
import json
import os
from functools import reduce
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from great_expectations_spark.checkpoint.manifest import _safe

# hll_sketch_agg accepts these Spark SQL types natively; anything else is
# cast to string first (stable distinct-by-representation semantics)
_NATIVE_TYPES = {"int", "bigint", "string", "binary"}


def _sketch_input(df: DataFrame, column: str):
    dtype = dict(df.dtypes).get(column)
    if dtype is None:
        raise ValueError(f"column {column!r} not in DataFrame")
    col = F.col(column)
    return col if dtype in _NATIVE_TYPES else col.cast("string")


def _null_safe_isin(column, values: Sequence[Any]):
    """Partition membership that keeps a NULL partition addressable
    (``isin`` drops it; ``eqNullSafe`` per value keeps the predicate
    pushdown-friendly and the value list is manifest-capped)."""
    conds = [column.eqNullSafe(F.lit(v)) for v in values]
    return reduce(lambda a, b: a | b, conds)


class PartitionSketchStore:
    """One JSON record per partition under ``<checkpoint_dir>/sketches/``,
    holding base64 HLL sketch blobs per column; write-to-temp + atomic
    rename, resume by listing — the manifest's coordination-free model."""

    def __init__(self, checkpoint_dir: str, lg_k: int = 12) -> None:
        if not 4 <= int(lg_k) <= 21:
            raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
        self.lg_k = int(lg_k)
        self.directory = os.path.join(checkpoint_dir, "sketches")
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, partition_id: str) -> str:
        return os.path.join(self.directory, f"{_safe(partition_id)}.json")

    def stored_partitions(self) -> Dict[str, str]:
        """{partition_id: record path} for every readable record."""
        out: Dict[str, str] = {}
        for name in sorted(os.listdir(self.directory)):
            if not name.endswith(".json"):
                continue
            path = os.path.join(self.directory, name)
            try:
                with open(path) as f:
                    out[json.load(f)["partition_id"]] = path
            except (ValueError, KeyError, OSError):
                continue  # partial/corrupt record: treat as not-stored
        return out

    def load(self, partition_id: str) -> Dict[str, bytes]:
        with open(self._path(partition_id)) as f:
            data = json.load(f)
        if int(data["lg_k"]) != self.lg_k:
            raise ValueError(
                f"stored sketch for {partition_id!r} has lg_k="
                f"{data['lg_k']}, store expects {self.lg_k} — sketches "
                "with different lg_k must not be silently merged"
            )
        return {
            c: base64.b64decode(b)
            for c, b in data["columns"].items()
        }

    def record(
        self, partition_id: str, column_sketches: Dict[str, bytes]
    ) -> None:
        payload = json.dumps(
            {
                "partition_id": str(partition_id),
                "lg_k": self.lg_k,
                "columns": {
                    c: base64.b64encode(b).decode("ascii")
                    for c, b in column_sketches.items()
                },
            },
            sort_keys=True,
        )
        path = self._path(str(partition_id))
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)

    # -- compute ---------------------------------------------------------

    def update(
        self,
        df: DataFrame,
        partition_column: str,
        columns: Sequence[str],
        partitions: Optional[Sequence[Any]] = None,
    ) -> List[str]:
        """Compute + persist sketches for partitions NOT yet stored, in
        ONE grouped Spark job regardless of partition count.  Returns the
        partition ids computed this call (empty on a fully-resumed run —
        zero Spark jobs touch the data then)."""
        from great_expectations_spark.checkpoint.runner import (
            _collect_partition_values,
        )

        parts = (
            list(partitions)
            if partitions is not None
            else _collect_partition_values(df, partition_column)
        )
        stored = self.stored_partitions()
        todo = [p for p in parts if str(p) not in stored]
        if not todo:
            return []
        aggs = [
            F.hll_sketch_agg(_sketch_input(df, c), self.lg_k).alias(c)
            for c in columns
        ]
        rows = (
            df.filter(_null_safe_isin(F.col(partition_column), todo))
            .groupBy(partition_column)
            .agg(*aggs)
            .collect()
        )
        seen = set()
        for r in rows:
            pid = str(r[partition_column])
            self.record(
                pid,
                {c: bytes(r[c]) for c in columns if r[c] is not None},
            )
            seen.add(pid)
        # a partition whose rows are all filtered away still gets an
        # (empty) record so resume never recomputes it
        for p in todo:
            if str(p) not in seen:
                self.record(str(p), {})
        return [str(p) for p in todo]

    # -- merge -----------------------------------------------------------

    def merged_distinct(
        self, spark: SparkSession, columns: Sequence[str]
    ) -> Dict[str, int]:
        """Union every stored partition's sketches -> table-level distinct
        estimate per column.  One tiny Spark job over
        ``num_partitions`` driver-loaded blobs; the data itself is never
        re-scanned."""
        blobs: List[tuple] = []
        for pid in self.stored_partitions():
            sk = self.load(pid)
            blobs.append(tuple(sk.get(c) for c in columns))
        if not blobs:
            return {c: 0 for c in columns}
        schema = ", ".join(f"`{c}` binary" for c in columns)
        df = spark.createDataFrame(blobs, schema)
        row = df.agg(
            *[
                F.hll_sketch_estimate(F.hll_union_agg(F.col(c))).alias(c)
                for c in columns
            ]
        ).first()
        return {c: int(row[c] or 0) for c in columns}
