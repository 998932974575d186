"""Checkpoint actions — on-result hooks for ``run_checkpoint``.

Reference surface: ``checkpoint/actions.py`` — StoreValidationResultAction
(:826), StoreMetricsAction (:976), and the notification actions (Slack /
email / OpsGenie, :60-500).  This module keeps the same shape — an action
receives every partition's validation result and decides what to do with
it — re-expressed without the reference's data-context coupling:

* actions are plain objects with ``run(ctx)``;
* each declares ``notify_on`` ("all" | "failure" | "success") so alerting
  actions only fire when relevant;
* action errors are logged and never fail the checkpoint run (parity with
  the reference's post-validation action semantics).

Network senders (Slack/webhook) are injected as callables so the engine
stays dependency- and network-free; in production the callable posts to
the real endpoint.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
)

logger = logging.getLogger(__name__)


@dataclass
class ActionContext:
    """Everything an action may need about one validated partition."""

    run_id: str
    suite_name: str
    partition_column: str
    partition_id: str
    result: ExpectationSuiteValidationResult
    entry_status: str  # "done" | "failed"


class CheckpointAction:
    """Base action. ``notify_on`` filters invocations:
    "all" (default), "failure" (only failed/raised partitions),
    "success" (only clean partitions)."""

    notify_on: str = "all"

    def run(self, ctx: ActionContext) -> Any:  # pragma: no cover
        raise NotImplementedError

    def should_run(self, ctx: ActionContext) -> bool:
        if self.notify_on == "all":
            return True
        failed = ctx.entry_status == "failed" or not bool(ctx.result.success)
        return failed if self.notify_on == "failure" else not failed


class FunctionAction(CheckpointAction):
    """Wrap any callable ``fn(ctx)`` as an action."""

    def __init__(
        self, fn: Callable[[ActionContext], Any], notify_on: str = "all"
    ) -> None:
        self.fn = fn
        self.notify_on = notify_on

    def run(self, ctx: ActionContext) -> Any:
        return self.fn(ctx)


class StoreValidationResultAction(CheckpointAction):
    """Persist each partition's full suite result as JSON
    (reference ``checkpoint/actions.py:826`` — store-backed; here a
    directory of ``<run_id>/<partition>.json`` files)."""

    def __init__(self, directory: str) -> None:
        self.directory = directory

    def run(self, ctx: ActionContext) -> str:
        out_dir = os.path.join(self.directory, ctx.run_id)
        os.makedirs(out_dir, exist_ok=True)
        safe = str(ctx.partition_id).replace(os.sep, "_")
        path = os.path.join(out_dir, f"{safe}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(ctx.result.to_json_dict(), f, default=str)
        return path


class StoreMetricsAction(CheckpointAction):
    """Collect requested result metrics per partition (reference
    ``checkpoint/actions.py:976`` — metric store; here an in-memory list
    of flat rows, writable to any sink).

    ``metric_names`` are result-payload keys (e.g. ``observed_value``,
    ``unexpected_count``, ``element_count``); ``statistics`` adds the
    suite-level statistics row.
    """

    def __init__(
        self,
        metric_names: Optional[List[str]] = None,
        statistics: bool = True,
    ) -> None:
        self.metric_names = metric_names or [
            "observed_value", "unexpected_count", "element_count",
        ]
        self.statistics = statistics
        self.rows: List[Dict[str, Any]] = []

    def run(self, ctx: ActionContext) -> int:
        added = 0
        for r in ctx.result.results:
            payload = {
                name: r.result.get(name)
                for name in self.metric_names
                if name in r.result
            }
            if not payload:
                continue
            self.rows.append(
                {
                    "run_id": ctx.run_id,
                    "partition_id": ctx.partition_id,
                    "expectation_type": r.expectation_config.get(
                        "expectation_type"
                    ),
                    "success": bool(r.success),
                    **payload,
                }
            )
            added += 1
        if self.statistics:
            self.rows.append(
                {
                    "run_id": ctx.run_id,
                    "partition_id": ctx.partition_id,
                    "expectation_type": "__suite_statistics__",
                    "success": bool(ctx.result.success),
                    **ctx.result.statistics,
                }
            )
            added += 1
        return added


class NotificationAction(CheckpointAction):
    """Webhook-style notification (stands in for the reference's Slack /
    email / OpsGenie actions).  ``sender(payload_dict)`` does the actual
    delivery; defaults to ``notify_on="failure"`` like alerting setups."""

    def __init__(
        self,
        sender: Callable[[Dict[str, Any]], Any],
        notify_on: str = "failure",
    ) -> None:
        self.sender = sender
        self.notify_on = notify_on

    def run(self, ctx: ActionContext) -> Any:
        stats = ctx.result.statistics or {}
        return self.sender(
            {
                "run_id": ctx.run_id,
                "suite_name": ctx.suite_name,
                "partition": {ctx.partition_column: ctx.partition_id},
                "success": bool(ctx.result.success),
                "status": ctx.entry_status,
                "statistics": stats,
                "failed_expectations": [
                    r.expectation_config.get("expectation_type")
                    for r in ctx.result.results
                    if not r.success
                ],
            }
        )


def run_actions(
    actions: Optional[List[CheckpointAction]], ctx: ActionContext
) -> Dict[str, Any]:
    """Invoke each applicable action; failures are logged, never raised."""
    outcomes: Dict[str, Any] = {}
    for action in actions or []:
        name = type(action).__name__
        try:
            if action.should_run(ctx):
                outcomes[name] = action.run(ctx)
        except Exception as exc:  # noqa: BLE001 — actions must not kill runs
            logger.warning("checkpoint action %s failed: %s", name, exc)
            outcomes[name] = f"error: {exc}"
    return outcomes
