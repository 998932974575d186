"""Run-over-run validation regression comparison.

The reference stores every ``ExpectationSuiteValidationResult`` but has
no diff verb — answering "what regressed since yesterday's run?" means
eyeballing two Data Docs pages.  This module compares two stored
results of the same suite per expectation:

* transition per expectation — ``regressed`` (pass→fail), ``fixed``
  (fail→pass), ``stable_pass`` / ``stable_fail``, ``added`` /
  ``removed`` (suite edited between runs);
* metric deltas where both runs carry them — unexpected_percent and
  observed_value;
* a summary with counts and an overall ``regressed`` flag for gating.

Pure driver-side dict work over results that already exist — no Spark
jobs.  ``DataContext.compare_runs`` wires it to the context's
validations store; ``compare_to_markdown`` renders the diff for
notifications / docs.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Union


def _as_dict(result: Any) -> Dict[str, Any]:
    if hasattr(result, "to_json_dict"):
        return result.to_json_dict()
    return result


def _key(config: Dict[str, Any]) -> str:
    """Identity of one expectation across runs: type + domain kwargs
    (value kwargs like min/max excluded, so retuning a threshold still
    lines the expectation up with its previous run)."""
    kwargs = config.get("kwargs") or {}
    domain = {
        k: kwargs[k]
        for k in (
            "column",
            "column_A",
            "column_B",
            "column_list",
            "group_column",
            "index_column",
            "row_condition",
            "query",
        )
        if k in kwargs
    }
    return json.dumps(
        [config.get("expectation_type"), domain], sort_keys=True, default=str
    )


def _num(value: Any) -> Optional[float]:
    return float(value) if isinstance(value, (int, float)) else None


def compare_validation_results(
    before: Union[Dict[str, Any], Any],
    after: Union[Dict[str, Any], Any],
) -> Dict[str, Any]:
    """Per-expectation diff of two suite validation results."""
    a, b = _as_dict(before), _as_dict(after)

    def index(d: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
        out: Dict[str, Dict[str, Any]] = {}
        for r in d.get("results", []):
            out[_key(r.get("expectation_config") or {})] = r
        return out

    ia, ib = index(a), index(b)
    rows: List[Dict[str, Any]] = []
    for key in sorted(set(ia) | set(ib)):
        ra, rb = ia.get(key), ib.get(key)
        etype, domain = json.loads(key)
        row: Dict[str, Any] = {
            "expectation_type": etype,
            "domain": domain,
        }
        if ra is None:
            row["transition"] = "added"
            row["success_after"] = bool(rb["success"])
        elif rb is None:
            row["transition"] = "removed"
            row["success_before"] = bool(ra["success"])
        else:
            sa, sb = bool(ra["success"]), bool(rb["success"])
            row["success_before"], row["success_after"] = sa, sb
            row["transition"] = (
                "stable_pass"
                if sa and sb
                else "stable_fail"
                if not sa and not sb
                else "fixed"
                if not sa
                else "regressed"
            )
            for metric in ("unexpected_percent", "observed_value"):
                va = _num((ra.get("result") or {}).get(metric))
                vb = _num((rb.get("result") or {}).get(metric))
                if va is not None and vb is not None:
                    row[f"{metric}_before"] = va
                    row[f"{metric}_after"] = vb
                    row[f"{metric}_delta"] = vb - va
        rows.append(row)

    counts: Dict[str, int] = {}
    for row in rows:
        counts[row["transition"]] = counts.get(row["transition"], 0) + 1
    return {
        "suite_name": (b.get("meta") or {}).get("expectation_suite_name")
        or (a.get("meta") or {}).get("expectation_suite_name"),
        "run_before": (a.get("meta") or {}).get("run_id"),
        "run_after": (b.get("meta") or {}).get("run_id"),
        "regressed": counts.get("regressed", 0) > 0,
        "counts": counts,
        "expectations": rows,
    }


def compare_to_markdown(diff: Dict[str, Any]) -> str:
    """Render a comparison as a notification-ready markdown block."""
    lines = [
        f"# Validation diff — {diff.get('suite_name')}",
        f"runs: `{diff.get('run_before')}` → `{diff.get('run_after')}`",
        "",
        "| transition | count |",
        "|---|---|",
    ]
    for name, n in sorted(diff["counts"].items()):
        lines.append(f"| {name} | {n} |")
    flagged = [
        r
        for r in diff["expectations"]
        if r["transition"] in ("regressed", "fixed", "added", "removed")
        or abs(r.get("unexpected_percent_delta") or 0.0) > 0.0
    ]
    if flagged:
        lines += [
            "",
            "| expectation | domain | transition | unexpected % Δ |",
            "|---|---|---|---|",
        ]
        for r in flagged:
            delta = r.get("unexpected_percent_delta")
            lines.append(
                "| {t} | `{d}` | {tr} | {delta} |".format(
                    t=r["expectation_type"],
                    d=json.dumps(r["domain"], sort_keys=True),
                    tr=r["transition"],
                    delta="—" if delta is None else f"{delta:+.4f}",
                )
            )
    return "\n".join(lines) + "\n"
