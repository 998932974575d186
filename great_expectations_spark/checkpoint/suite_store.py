"""Expectation-suite CRUD over the pluggable store backends.

Reference surface: ``data_context/store/expectations_store.py``
(ExpectationsStore — suite configs persisted by name through any
StoreBackend) and the DataContext verbs built on it
(``add_expectation_suite`` / ``get_expectation_suite`` /
``list_expectation_suite_names`` / ``delete_expectation_suite``,
``data_context/abstract_data_context.py``).

Re-expressed here over the same ``ResultStoreBackend`` protocol the
validation-result stores use (``store_backends.py``), so suites live
wherever results live — a git-friendly directory of JSON files, a
lakehouse table, or a JDBC database — with no second persistence stack.
Design choice vs the reference: the store is *versioned append-only*
(every ``save`` appends a new record keyed by the suite's content hash;
``load`` resolves the latest) rather than update-in-place.  That is the
object-store-native contract (no read-modify-write on S3/ABFS) and gives
suite-definition lineage for free: a stored validation result's
``suite_hash`` pins exactly which suite version produced it.  ``delete``
writes a tombstone record for the same reason.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from great_expectations_spark.checkpoint.store_backends import (
    ResultStoreBackend,
    reject_reserved_key,
)
from great_expectations_spark.core.suite import ExpectationSuite

_TOMBSTONE = "__deleted__"
# suites are namespaced apart from validation results so one backend
# (directory / table) can carry both without key collisions
_NAMESPACE = "suite::"


class SuiteStore:
    """Named, versioned expectation-suite persistence.

    ``save`` returns the content-hash version id; ``load`` returns the
    most recently saved version.  History is retained by every backend
    (the filesystem backend keeps one file per version, the Spark-table
    backend one row per version) for offline lineage queries.
    """

    def __init__(self, backend: ResultStoreBackend) -> None:
        self.backend = backend

    # -- write ----------------------------------------------------------

    def save(self, suite: ExpectationSuite) -> str:
        name = suite.expectation_suite_name
        if not name:
            raise ValueError("suite has no expectation_suite_name")
        # a suite named 'suite::x' would store under 'suite::suite::x' and
        # list back as 'suite::x' — consistent, but indistinguishable from
        # a namespace-forgery attempt on shared backends; reject like the
        # result-store side does (store_backends.reject_reserved_key)
        reject_reserved_key(name)
        version = suite.suite_hash()
        self.backend.append(
            _NAMESPACE + name, version, suite.to_json()
        )
        return version

    def delete(self, suite_name: str) -> None:
        """Tombstone the suite: ``load`` raises afterwards, history stays."""
        reject_reserved_key(suite_name)
        self.backend.append(
            _NAMESPACE + suite_name,
            _TOMBSTONE,
            json.dumps({_TOMBSTONE: True, "suite_name": suite_name}),
        )

    # -- read -----------------------------------------------------------

    def load(self, suite_name: str) -> ExpectationSuite:
        payload = self.backend.latest_payload(_NAMESPACE + suite_name)
        d = json.loads(payload)
        if d.get(_TOMBSTONE):
            raise KeyError(f"expectation suite {suite_name!r} was deleted")
        return ExpectationSuite.from_dict(d)

    def list_suites(self) -> List[str]:
        """Names of live (non-tombstoned) suites in the backend.

        The filesystem backend sanitizes keys (``param_store._safe`` maps
        ``:`` to ``_``), so both the raw and sanitized namespace prefixes
        are recognized; names containing characters the filesystem
        sanitizer rewrites round-trip exactly on table/JDBC backends and
        in sanitized form on the filesystem one (same contract as the
        reference's TupleFilesystemStoreBackend key coercion).
        """
        from great_expectations_spark.checkpoint.param_store import _safe

        names = set()
        for p in {_NAMESPACE, _safe(_NAMESPACE)}:
            # ONE bulk read per prefix (a single Spark job on table
            # backends), not one latest_payload job per candidate name
            for key, payload in self.backend.latest_payloads(p).items():
                try:
                    alive = not json.loads(payload).get(_TOMBSTONE)
                except ValueError:
                    alive = False
                if alive:
                    names.add(key[len(p):])
        return sorted(names)
