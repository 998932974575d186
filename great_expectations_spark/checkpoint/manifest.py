"""Checkpoint manifest: resumable per-partition validation bookkeeping.

Each validated partition writes ONE manifest record file
(``<dir>/manifest/<partition>__<suite_hash>.json``) via write-to-temp +
atomic rename, plus the full suite result JSON under ``<dir>/results/``.
A restarted run lists the manifest once and skips partitions whose record
says ``done`` for the same suite hash — idempotent resume, no coordination
needed (one PUT per partition works on object stores too).

Reference analogue: checkpoint actions persisting validation results
(``checkpoint/actions.py:826-975``); the resume/manifest design is ours
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", str(name))


@dataclass
class ManifestEntry:
    partition_id: str
    suite_hash: str
    status: str  # 'done' | 'failed'
    run_id: str
    started_at: str
    finished_at: str
    rows: int
    duration_sec: float
    rows_per_sec: float
    success: Optional[bool]
    result_path: Optional[str] = None
    error: Optional[str] = None
    # content fingerprint ("rowcount:bit_xor-of-row-hashes") recorded when
    # the run used detect_changes — lets a resume re-validate partitions
    # whose DATA changed (late arrivals), not just unseen ones
    fingerprint: Optional[str] = None

    def to_json_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)


class CheckpointManifest:
    def __init__(self, checkpoint_dir: str) -> None:
        self.checkpoint_dir = checkpoint_dir
        self.manifest_dir = os.path.join(checkpoint_dir, "manifest")
        self.results_dir = os.path.join(checkpoint_dir, "results")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.results_dir, exist_ok=True)

    def _entry_path(self, partition_id: str, suite_hash: str) -> str:
        return os.path.join(
            self.manifest_dir, f"{_safe(partition_id)}__{suite_hash}.json"
        )

    def completed_partitions(self, suite_hash: str) -> Dict[str, ManifestEntry]:
        out: Dict[str, ManifestEntry] = {}
        for name in os.listdir(self.manifest_dir):
            if not name.endswith(f"__{suite_hash}.json"):
                continue
            try:
                with open(os.path.join(self.manifest_dir, name)) as f:
                    data = json.load(f)
                entry = ManifestEntry(**data)
            except (ValueError, TypeError, OSError):
                continue  # partial/corrupt record: treat as not-done
            if entry.status == "done":
                out[entry.partition_id] = entry
        return out

    def _atomic_write(self, path: str, payload: str) -> None:
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def record(
        self,
        entry: ManifestEntry,
        result_json: Optional[str] = None,
    ) -> ManifestEntry:
        if result_json is not None:
            result_path = os.path.join(
                self.results_dir,
                f"{_safe(entry.partition_id)}__{entry.suite_hash}.json",
            )
            self._atomic_write(result_path, result_json)
            entry.result_path = result_path
        self._atomic_write(
            self._entry_path(entry.partition_id, entry.suite_hash),
            json.dumps(entry.to_json_dict(), sort_keys=True),
        )
        return entry

    def all_entries(self) -> List[ManifestEntry]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                try:
                    with open(os.path.join(self.manifest_dir, name)) as f:
                        out.append(ManifestEntry(**json.load(f)))
                except (ValueError, TypeError, OSError):
                    continue
        return out
