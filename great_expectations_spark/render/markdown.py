"""Minimal validation-result renderer (Data-Docs-lite).

The reference's ``render/`` package (tens of kLoC of Jinja HTML) is out of
scope; this gives the 20% users actually read: a per-run markdown report —
suite verdict, per-expectation table, violation samples — suitable for
PR comments, Slack snippets, or a static docs directory.  Pure Python over
the result JSON shape; no Spark dependency.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Union

from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
)


def _as_dict(result) -> Dict[str, Any]:
    if isinstance(result, ExpectationSuiteValidationResult):
        return result.to_json_dict()
    return result


def _fmt_value(value: Any, max_len: int = 60) -> str:
    text = str(value)
    if len(text) > max_len:
        text = text[: max_len - 1] + "…"
    return text.replace("|", "\\|").replace("\n", " ")


def _domain_of(kwargs: Dict[str, Any]) -> str:
    if kwargs.get("column"):
        return str(kwargs["column"])
    if kwargs.get("column_list"):
        return ", ".join(str(c) for c in kwargs["column_list"])
    if kwargs.get("column_A") or kwargs.get("column_B"):
        return f"{kwargs.get('column_A')} / {kwargs.get('column_B')}"
    if kwargs.get("group_column"):
        return f"{kwargs['group_column']}[{kwargs.get('index_column')}]"
    return ""


def render_suite_result_markdown(
    result: Union[ExpectationSuiteValidationResult, Dict[str, Any]],
    title: Optional[str] = None,
    max_samples: int = 5,
) -> str:
    """One markdown document for one suite validation result."""
    data = _as_dict(result)
    meta = data.get("meta", {})
    stats = data.get("statistics", {})
    name = title or meta.get("expectation_suite_name", "validation")
    ok = bool(data.get("success"))
    lines: List[str] = [
        f"# {'✅' if ok else '❌'} {name}",
        "",
        f"- run: `{meta.get('run_id', '')}`"
        + (
            f" at {meta.get('validation_time')}"
            if meta.get("validation_time")
            else ""
        ),
        f"- expectations: {stats.get('successful_expectations', 0)}/"
        f"{stats.get('evaluated_expectations', 0)} passed "
        f"({stats.get('success_percent', 0):.1f}%)",
        "",
        "| status | expectation | column/domain | observed | unexpected |",
        "|---|---|---|---|---|",
    ]
    failures: List[Dict[str, Any]] = []
    for r in data.get("results", []):
        config = r.get("expectation_config", {})
        kwargs = config.get("kwargs", {})
        res = r.get("result", {}) or {}
        domain = _domain_of(kwargs)
        observed = res.get("observed_value")
        unexpected = res.get("unexpected_count")
        lines.append(
            f"| {'✅' if r.get('success') else '❌'} "
            f"| `{config.get('expectation_type')}` "
            f"| {_fmt_value(domain)} "
            f"| {_fmt_value(observed) if observed is not None else ''} "
            f"| {unexpected if unexpected is not None else ''} |"
        )
        if not r.get("success"):
            failures.append(r)

    for r in failures:
        config = r.get("expectation_config", {})
        res = r.get("result", {}) or {}
        exc = r.get("exception_info") or {}
        lines += ["", f"## ❌ `{config.get('expectation_type')}`", ""]
        if exc.get("raised_exception"):
            lines.append(f"Raised: `{_fmt_value(exc.get('exception_message'))}`")
            continue
        lines.append(f"kwargs: `{_fmt_value(config.get('kwargs'), 120)}`")
        samples = res.get("partial_unexpected_list") or []
        if samples:
            lines.append("")
            lines.append("Sample violations:")
            for v in samples[:max_samples]:
                lines.append(f"- `{_fmt_value(v, 100)}`")
    lines.append("")
    return "\n".join(lines)


def render_checkpoint_summary_markdown(
    summary: Dict[str, Any], title: str = "checkpoint run"
) -> str:
    """Markdown for a ``run_checkpoint`` summary dict (per-partition)."""
    ok = bool(summary.get("success"))
    lines = [
        f"# {'✅' if ok else '❌'} {title}",
        "",
        f"- run: `{summary.get('run_id', '')}`",
        f"- partitions: {summary.get('partitions_done', 0)}/"
        f"{summary.get('partitions_total', 0)} done, "
        f"{summary.get('partitions_skipped_resume', 0)} resumed, "
        f"failures: {len(summary.get('failures', []))}",
        "",
        "| partition | status | success | rows | rows/sec |",
        "|---|---|---|---|---|",
    ]
    for e in summary.get("entries", []):
        lines.append(
            f"| {_fmt_value(e.get('partition_id'))} | {e.get('status')} "
            f"| {'✅' if e.get('success') else '❌'} | {e.get('rows')} "
            f"| {e.get('rows_per_sec')} |"
        )
    lines.append("")
    return "\n".join(lines)


class RenderDocsAction:
    """Checkpoint action: write one markdown report per validated
    partition under ``<directory>/<run_id>/`` (the Data-Docs-lite
    analogue of the reference's UpdateDataDocsAction)."""

    notify_on = "all"

    def __init__(self, directory: str) -> None:
        self.directory = directory

    def should_run(self, ctx) -> bool:
        return True

    def run(self, ctx) -> str:
        out_dir = os.path.join(self.directory, ctx.run_id)
        os.makedirs(out_dir, exist_ok=True)
        safe = str(ctx.partition_id).replace(os.sep, "_")
        path = os.path.join(out_dir, f"{safe}.md")
        doc = render_suite_result_markdown(
            ctx.result,
            title=f"{ctx.suite_name} — {ctx.partition_column}="
            f"{ctx.partition_id}",
        )
        with open(path, "w", encoding="utf-8") as f:
            f.write(doc)
        return path
