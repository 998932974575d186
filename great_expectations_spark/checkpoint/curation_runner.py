"""Checkpointed, resumable CURATION runs — the validation-side
manifest/resume machinery (``checkpoint/runner.py``,
``checkpoint/manifest.py``) applied to the corpus-curation pipeline
(``functions/curation.py curate_corpus``).

At 10^12 rows a curation job runs for hours; a kill must not restart
from zero.  ``curate_by_partition`` processes one table partition at a
time (partition predicates push down to the scan), writes each
partition's curated output to its own directory with
``mode='overwrite'`` (idempotent on retry — a crashed half-written
partition is simply rewritten), records a manifest entry with the
attrition report as payload, and on re-run SKIPS partitions whose entry
is ``done`` under the same configuration hash.  Per-partition lineage
(rows in/out, duration, throughput) mirrors the validation manifest.

Semantics note: every stage runs WITHIN a partition, so dedup /
ExactSubstr / DSIR selection are partition-scoped.  That is the
standard sharded-curation tradeoff; run a global
``dedup_corpus``/``dsir_sample`` pass over the combined output when
cross-partition duplicates matter.

No reference analog (GE validates, it does not curate); the
manifest/resume shape cites the reference's checkpoint result/run
tracking (``checkpoint/checkpoint.py``, ``data_context/store``).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import logging
import os
import uuid
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.checkpoint.manifest import (
    CheckpointManifest,
    ManifestEntry,
)

logger = logging.getLogger(__name__)

__all__ = ["curation_config_hash", "curate_by_partition"]


def _token(value: Any) -> Any:
    """JSON-stable token for one curate_corpus kwarg: DataFrames hash by
    schema (their CONTENT is an input, like the corpus itself — resume
    identity covers configuration, not data versions), dict models by
    their serialized bytes."""
    if isinstance(value, DataFrame):
        return {"__df_schema__": value.schema.simpleString()}
    return value


def curation_config_hash(curate_kwargs: Dict[str, Any]) -> str:
    """Deterministic identity of a curation CONFIGURATION — the analog
    of ``ExpectationSuite.suite_hash`` for resume bookkeeping: same
    kwargs ⇒ same hash ⇒ re-runs resume; any changed stage/threshold/
    model ⇒ new hash ⇒ everything recomputes."""
    canon = json.dumps(
        {k: _token(v) for k, v in sorted(curate_kwargs.items())},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def curate_by_partition(
    df: DataFrame,
    partition_column: str,
    output_path: str,
    checkpoint_dir: str,
    *,
    curate_kwargs: Optional[Dict[str, Any]] = None,
    run_id: Optional[str] = None,
    output_format: str = "parquet",
    write_docs: bool = False,
    persist_input: bool = True,
) -> Dict[str, Any]:
    """Curate every partition of ``df``, resuming past ``done`` ones.

    Per partition: ``curate_corpus(part_df, with_report=True,
    **curate_kwargs)`` → write the survivors to
    ``{output_path}/{partition_column}=<escaped value>/`` (hive-style
    percent-escaping for path-hostile values; NULL uses Hive's
    ``__HIVE_DEFAULT_PARTITION__``; overwrite ⇒ retry-idempotent) →
    record a manifest entry whose payload is the attrition report.
    Returns a summary dict with per-partition entries.

    The resume identity (``config_hash``) covers ``curate_kwargs`` AND
    the output location/format — rerunning against a different
    ``output_path`` recomputes everything, so a ``done`` entry always
    means "THIS output exists".  ``persist_input`` caches each
    partition's input for the duration of its run (the per-stage report
    counts and the final write otherwise each rescan the source).
    ``write_docs=True`` additionally renders each partition's attrition
    report as a Data Docs HTML page under ``{checkpoint_dir}/docs/`` —
    docs rendering is best-effort and never fails the partition.
    """
    from urllib.parse import quote

    from great_expectations_spark.checkpoint.runner import (
        _collect_partition_values,
    )
    from great_expectations_spark.functions.curation import curate_corpus

    curate_kwargs = dict(curate_kwargs or {})
    if "with_report" in curate_kwargs:
        raise ValueError(
            "with_report is owned by curate_by_partition (the report IS "
            "the manifest payload)"
        )
    cfg_hash = curation_config_hash(
        {
            **curate_kwargs,
            "__output_path__": output_path,
            "__output_format__": output_format,
        }
    )
    manifest = CheckpointManifest(checkpoint_dir)
    run_id = run_id or str(uuid.uuid4())

    partitions = _collect_partition_values(df, partition_column)
    done = manifest.completed_partitions(cfg_hash)
    # intersect with the CURRENT partition list: stale manifest entries
    # for partitions absent from this df must not appear in the summary
    current = {str(p) for p in partitions}
    done = {pid: e for pid, e in done.items() if pid in current}
    todo = [p for p in partitions if str(p) not in done]
    logger.info(
        "curation checkpoint: %d partitions, %d already done, %d to run",
        len(partitions), len(done), len(todo),
    )

    def _dir_token(value: Any) -> str:
        # Hive partition-path conventions: NULL sentinel; percent-escape
        # separators and other path-hostile characters (Spark's
        # partition discovery unescapes them on read)
        if value is None:
            return "__HIVE_DEFAULT_PARTITION__"
        return quote(str(value), safe="")

    entries: List[ManifestEntry] = list(done.values())
    for value in todo:
        started = datetime.datetime.now(datetime.timezone.utc)
        pc = F.col(partition_column)
        # null-safe match: `col == lit(None)` is never true in SQL
        # semantics, which would silently curate an empty frame for the
        # NULL partition and drop its rows from the corpus
        part_df = df.filter(
            pc.isNull() if value is None else pc.eqNullSafe(F.lit(value))
        )
        if persist_input:
            part_df = part_df.persist()
        part_dir = os.path.join(
            output_path, f"{partition_column}={_dir_token(value)}"
        )
        try:
            out, report = curate_corpus(
                part_df, with_report=True, **curate_kwargs
            )
            # drop the partition column from the payload (it is encoded
            # in the directory, hive-style) unless curation renamed it
            writer = out.drop(partition_column).write.mode("overwrite")
            getattr(writer, "parquet" if output_format == "parquet"
                    else output_format)(part_dir)
            finished = datetime.datetime.now(datetime.timezone.utc)
            rows_in = int(report[0]["rows"]) if report else 0
            rows_out = int(report[-1]["rows"]) if report else 0
            duration = (finished - started).total_seconds()
            entry = ManifestEntry(
                partition_id=str(value),
                suite_hash=cfg_hash,
                status="done",
                run_id=run_id,
                started_at=started.isoformat(),
                finished_at=finished.isoformat(),
                rows=rows_out,
                duration_sec=round(duration, 3),
                rows_per_sec=(
                    round(rows_in / duration, 1) if duration else 0.0
                ),
                success=True,
            )
            entries.append(
                manifest.record(entry, json.dumps({"report": report}))
            )
            if write_docs:
                # best-effort, OUTSIDE the failure path: a docs hiccup
                # after a successful record must not re-record the
                # partition as failed (the parquet and manifest are
                # already committed) — same never-fail contract as the
                # validation runner's post-validation actions
                try:
                    from great_expectations_spark.render.html import (
                        render_curation_report_html,
                    )

                    docs_dir = os.path.join(checkpoint_dir, "docs")
                    os.makedirs(docs_dir, exist_ok=True)
                    page = render_curation_report_html(
                        report,
                        title=f"curation {partition_column}={value}",
                    )
                    with open(
                        os.path.join(
                            docs_dir,
                            f"curation_{_dir_token(value)}.html",
                        ),
                        "w",
                        encoding="utf-8",
                    ) as f:
                        f.write(page)
                except Exception:  # noqa: BLE001 — docs never fail the run
                    logger.exception(
                        "docs rendering failed for partition %s", value
                    )
        except Exception as exc:  # noqa: BLE001 — survive partition failure
            finished = datetime.datetime.now(datetime.timezone.utc)
            entry = ManifestEntry(
                partition_id=str(value),
                suite_hash=cfg_hash,
                status="failed",
                run_id=run_id,
                started_at=started.isoformat(),
                finished_at=finished.isoformat(),
                rows=0,
                duration_sec=0.0,
                rows_per_sec=0.0,
                success=False,
                error=repr(exc),
            )
            entries.append(
                manifest.record(entry, json.dumps({"error": repr(exc)}))
            )
            logger.exception(
                "curation failed for partition %s", value
            )
        finally:
            if persist_input:
                part_df.unpersist()

    by_status: Dict[str, int] = {}
    for e in entries:
        by_status[e.status] = by_status.get(e.status, 0) + 1
    return {
        "run_id": run_id,
        "config_hash": cfg_hash,
        "partitions": len(partitions),
        "resumed": len(done),
        "executed": len(todo),
        "by_status": by_status,
        "entries": [e.to_json_dict() for e in entries],
        "output_path": output_path,
    }
