"""Validation-result store + URN evaluation-parameter resolution.

Reference surface: ``core/evaluation_parameters.py:274-430`` binds
``urn:great_expectations:validations:<suite>:<metric_path>[:<kwargs>]``
parameters against the data context's validation result store, so suite
B's thresholds can come from suite A's last stored run (chained suites).

This store is a plain directory — one JSON per run per suite plus a
``latest.json`` pointer written atomically — so it works on any shared
filesystem; the URN grammar matches the reference's (``core/urn.py:17-25``):

    urn:great_expectations:validations:<suite_name>:<metric_name>[:<kwargs>]

where ``metric_name`` is a dotted path rooted at an expectation type, e.g.
``expect_table_row_count_to_be_between.result.observed_value``, and the
optional ``kwargs`` segment (``column=l_quantity``) disambiguates between
multiple configurations of the same expectation type.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Dict, Optional

from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
)

URN_PREFIX = "urn:great_expectations:validations:"

_URN = re.compile(
    r"^urn:great_expectations:validations:"
    r"(?P<suite>[A-Za-z0-9_$?=%.&,\-]+):"
    r"(?P<metric>[A-Za-z0-9_$?=%.&,\-]+)"
    r"(?::(?P<kwargs>[A-Za-z0-9_$?=%.&,\-]+))?$"
)


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", str(name))


class ValidationResultStore:
    """Suite-name-keyed store of whole-suite validation results."""

    def __init__(self, directory: str) -> None:
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _suite_dir(self, suite_name: str) -> str:
        path = os.path.join(self.directory, _safe(suite_name))
        os.makedirs(path, exist_ok=True)
        return path

    @staticmethod
    def _atomic_write(path: str, payload: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(payload)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def save(
        self,
        result: ExpectationSuiteValidationResult,
        suite_name: Optional[str] = None,
    ) -> str:
        """Persist a suite result; updates the suite's ``latest`` pointer."""
        name = suite_name or result.meta.get("expectation_suite_name")
        if not name:
            raise ValueError("suite name required (not present in meta)")
        run_id = str(result.meta.get("run_id") or "run")
        suite_dir = self._suite_dir(name)
        payload = result.to_json()
        path = os.path.join(suite_dir, f"{_safe(run_id)}.json")
        self._atomic_write(path, payload)
        self._atomic_write(os.path.join(suite_dir, "latest.json"), payload)
        return path

    def latest(self, suite_name: str) -> Dict[str, Any]:
        path = os.path.join(self._suite_dir(suite_name), "latest.json")
        if not os.path.exists(path):
            raise KeyError(
                f"no stored validation result for suite {suite_name!r}"
            )
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    # -- URN resolution ---------------------------------------------------

    def resolve_urn(self, urn: str) -> Any:
        return resolve_urn_with(self.latest, urn)


def resolve_urn_with(latest_fn, urn: str) -> Any:
    """Resolve a validations URN against ``latest_fn(suite_name) -> stored
    result dict`` — shared by the filesystem store and every
    ``store_backends`` implementation (same grammar, same traversal)."""
    m = _URN.match(urn)
    if m is None:
        raise ValueError(f"not a validations URN: {urn!r}")
    stored = latest_fn(m.group("suite"))
    metric_path = m.group("metric").split(".")
    expectation_type, path = metric_path[0], metric_path[1:]
    want_kwargs = _parse_kwargs_segment(m.group("kwargs"))

    for r in stored.get("results", []):
        config = r.get("expectation_config") or {}
        if config.get("expectation_type") != expectation_type:
            continue
        ckwargs = config.get("kwargs") or {}
        if any(str(ckwargs.get(k)) != v for k, v in want_kwargs.items()):
            continue
        node: Any = r
        for step in path:
            if not isinstance(node, dict) or step not in node:
                raise KeyError(
                    f"URN path {m.group('metric')!r} missing {step!r}"
                )
            node = node[step]
        return node
    raise KeyError(
        f"no stored result for {expectation_type!r}"
        + (f" with {want_kwargs}" if want_kwargs else "")
        + f" in suite {m.group('suite')!r}"
    )


def _parse_kwargs_segment(segment: Optional[str]) -> Dict[str, str]:
    """``column=foo&mostly=0.9`` -> {'column': 'foo', 'mostly': '0.9'}."""
    if not segment:
        return {}
    out: Dict[str, str] = {}
    for part in segment.split("&"):
        if "=" in part:
            k, v = part.split("=", 1)
            out[k] = v
    return out
