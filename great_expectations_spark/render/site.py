"""Browsable Data Docs SITE (reference contract:
``render/renderer/site_builder.py`` SiteBuilder + DefaultSiteIndexBuilder,
``render/renderer/content_block/*`` column-grouped expectation content
blocks).

The reference builds a static site from Jinja templates: a home index
listing expectation suites and validation runs, per-suite pages whose
expectation "content blocks" are grouped by column, and per-run result
pages.  This module renders the same navigation surface — home index →
suite page (column-grouped expectation blocks + run history) → run page
(partition index) → partition report — as self-contained HTML files with
inline CSS (no Jinja, no asset pipeline).

Everything is driver-side and O(results): site state is a small JSON
file (``_site_state.json``) so incremental runs — including concurrent
checkpoint actions — append rather than rebuild, and every page rewrite
is atomic (temp file + ``os.replace``), matching the reference's
"update data docs after each validation" action semantics.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, List, Optional, Union

from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
)
from great_expectations_spark.render.html import (
    _esc,
    _page,
    _status,
    render_suite_result_html,
)
from great_expectations_spark.render.markdown import _as_dict, _domain_of

# ---------------------------------------------------------------------------
# expectation content blocks (reference render/renderer/content_block/
# expectation_string.py — humanized one-liners, grouped by column)

_TEMPLATES: Dict[str, str] = {
    "expect_column_values_to_not_be_null": "values must not be null",
    "expect_column_values_to_be_null": "values must be null",
    "expect_column_values_to_be_unique": "values must be unique",
    "expect_column_values_to_be_in_set": "values must belong to {value_set}",
    "expect_column_values_to_not_be_in_set": (
        "values must not belong to {value_set}"
    ),
    "expect_column_values_to_be_between": (
        "values must be between {min_value} and {max_value}"
    ),
    "expect_column_value_lengths_to_be_between": (
        "value lengths must be between {min_value} and {max_value}"
    ),
    "expect_column_value_lengths_to_equal": (
        "value lengths must equal {value}"
    ),
    "expect_column_values_to_match_regex": "values must match /{regex}/",
    "expect_column_values_to_not_match_regex": (
        "values must not match /{regex}/"
    ),
    "expect_column_values_to_match_like_pattern": (
        "values must match LIKE pattern {like_pattern}"
    ),
    "expect_column_values_to_be_json_parseable": (
        "values must be parseable JSON"
    ),
    "expect_column_values_to_be_increasing": "values must be increasing",
    "expect_column_values_to_be_decreasing": "values must be decreasing",
    "expect_column_mean_to_be_between": (
        "mean must be between {min_value} and {max_value}"
    ),
    "expect_column_stdev_to_be_between": (
        "standard deviation must be between {min_value} and {max_value}"
    ),
    "expect_column_sum_to_be_between": (
        "sum must be between {min_value} and {max_value}"
    ),
    "expect_column_min_to_be_between": (
        "minimum must be between {min_value} and {max_value}"
    ),
    "expect_column_max_to_be_between": (
        "maximum must be between {min_value} and {max_value}"
    ),
    "expect_column_median_to_be_between": (
        "median must be between {min_value} and {max_value}"
    ),
    "expect_column_quantile_values_to_be_between": (
        "quantiles must fall in the configured ranges"
    ),
    "expect_column_unique_value_count_to_be_between": (
        "distinct count must be between {min_value} and {max_value}"
    ),
    "expect_column_proportion_of_unique_values_to_be_between": (
        "unique proportion must be between {min_value} and {max_value}"
    ),
    "expect_compound_columns_to_be_unique": (
        "column combination must be unique"
    ),
    "expect_select_column_values_to_be_unique_within_record": (
        "values must be unique within each record"
    ),
    "expect_column_pair_values_a_to_be_greater_than_b": (
        "{column_A} must be greater than {column_B}"
    ),
    "expect_column_pair_values_to_be_equal": (
        "{column_A} must equal {column_B}"
    ),
    "expect_multicolumn_sum_to_equal": "row sum must equal {sum_total}",
    "expect_table_row_count_to_be_between": (
        "row count must be between {min_value} and {max_value}"
    ),
    "expect_table_row_count_to_equal": "row count must equal {value}",
    "expect_table_columns_to_match_set": "columns must match the given set",
    "expect_column_values_to_exist_in_other_table": (
        "values must exist in the other table's {other_column}"
    ),
    "expect_sequence_to_be_contiguous": (
        "{index_column} must be contiguous within each {group_column}"
    ),
}


class _Defaulting(dict):
    def __missing__(self, key: str) -> str:
        return "?"


def describe_expectation(config: Dict[str, Any]) -> str:
    """Humanized one-liner for one expectation config (reference
    content-block expectation_string semantics, compact form)."""
    etype = config.get("expectation_type", "?")
    kwargs = config.get("kwargs", {}) or {}
    template = _TEMPLATES.get(etype)
    if template is None:
        shown = {
            k: v
            for k, v in kwargs.items()
            if k not in ("column", "row_condition", "condition_parser")
        }
        text = f"{etype}" + (f" {shown}" if shown else "")
    else:
        text = template.format_map(_Defaulting(kwargs))
    mostly = kwargs.get("mostly")
    if mostly is not None and mostly < 1:
        text += f", at least {float(mostly):.0%} of the time"
    cond = kwargs.get("row_condition")
    if cond:
        text += f" (where {cond})"
    return text


def _blocks_by_column(
    configs: List[Dict[str, Any]],
    statuses: Optional[Dict[int, bool]] = None,
) -> str:
    """Column-grouped expectation content blocks: one <section> per
    domain (column / column pair / table), one humanized line per
    expectation, with latest pass/fail status when available."""
    groups: Dict[str, List[str]] = {}
    for i, config in enumerate(configs):
        domain = _domain_of(config.get("kwargs", {}) or {}) or "table"
        line = _esc(describe_expectation(config), 200)
        if statuses is not None and i in statuses:
            line = f"{_status(statuses[i])} {line}"
        groups.setdefault(str(domain), []).append(f"<li>{line}</li>")
    parts: List[str] = []
    for domain in sorted(groups):
        parts.append(
            f"<h3><code>{_esc(domain)}</code></h3>"
            f"<ul class=\"samples\">{''.join(groups[domain])}</ul>"
        )
    return "\n".join(parts)


# ---------------------------------------------------------------------------


def _safe(name: str) -> str:
    return "".join(
        c if c.isalnum() or c in ("-", "_", ".") else "_" for c in str(name)
    )


def _latest_run(runs: Dict[str, Any]) -> str:
    """Most recently REGISTERED run (monotonic 'seq'), not the
    lexicographically largest id — 'run-9' must not beat 'run-10'.
    Pre-seq states fall back to id order."""
    return max(runs, key=lambda r: (runs[r].get("seq", -1), r))


def _atomic_write(path: str, payload: str) -> None:
    from great_expectations_spark.checkpoint.param_store import (
        ValidationResultStore,
    )

    ValidationResultStore._atomic_write(path, payload)


class SiteBuilder:
    """Incremental static Data Docs site.

    Layout (reference SiteBuilder's expectations/validations split,
    collapsed into one navigable tree)::

        <root>/index.html                      home: suite directory
        <root>/suites/<suite>/index.html       suite page: column-grouped
                                               expectation blocks + runs
        <root>/suites/<suite>/runs/<run>/index.html   run page: partitions
        <root>/suites/<suite>/runs/<run>/<part>.html  partition report

    ``add_validation_result`` is safe to call concurrently (checkpoint
    actions fire from a thread pool) and from successive processes: the
    authoritative state lives in ``_site_state.json`` and every page is
    rewritten atomically from that state.
    """

    def __init__(self, directory: str) -> None:
        self.directory = directory
        self._lock = threading.Lock()
        os.makedirs(directory, exist_ok=True)

    # -- state ----------------------------------------------------------

    @property
    def _state_path(self) -> str:
        return os.path.join(self.directory, "_site_state.json")

    def _load_state(self) -> Dict[str, Any]:
        try:
            with open(self._state_path, encoding="utf-8") as f:
                return json.load(f)
        except (OSError, ValueError):
            return {"suites": {}}

    # -- public ---------------------------------------------------------

    def add_validation_result(
        self,
        result: Union[ExpectationSuiteValidationResult, Dict[str, Any]],
        suite_name: Optional[str] = None,
        run_id: Optional[str] = None,
        partition_id: Optional[str] = None,
    ) -> str:
        """Write the partition report and refresh every index page above
        it; returns the report path."""
        data = _as_dict(result)
        meta = data.get("meta", {}) or {}
        suite = str(
            suite_name or meta.get("expectation_suite_name") or "default"
        )
        run = str(run_id or meta.get("run_id") or "run")
        part = str(partition_id if partition_id is not None else "all")
        stats = data.get("statistics", {}) or {}

        run_dir = os.path.join(
            self.directory, "suites", _safe(suite), "runs", _safe(run)
        )
        os.makedirs(run_dir, exist_ok=True)
        fname = f"{_safe(part)}.html"
        report = render_suite_result_html(
            data, title=f"{suite} — run {run} — {part}"
        )
        crumb = (
            '<p class="meta"><a href="../../../../index.html">docs</a> / '
            f'<a href="../../index.html">{_esc(suite)}</a> / '
            f'<a href="index.html">run {_esc(run)}</a> / {_esc(part)}</p>\n'
        )
        report = report.replace("<body>\n", "<body>\n" + crumb, 1)
        with self._lock:
            _atomic_write(os.path.join(run_dir, fname), report)
            state = self._load_state()
            suite_state = state["suites"].setdefault(
                suite,
                {"configs": [], "runs": {}},
            )
            suite_state["configs"] = [
                r.get("expectation_config", {})
                for r in data.get("results", [])
            ]
            suite_state["statuses"] = {
                str(i): bool(r.get("success"))
                for i, r in enumerate(data.get("results", []))
            }
            run_state = suite_state["runs"].setdefault(
                run, {"partitions": {}, "time": meta.get("validation_time")}
            )
            if "seq" not in run_state:
                # monotonic arrival order: 'latest run' must not depend
                # on lexicographic run ids ('run-9' > 'run-10')
                run_state["seq"] = int(state.get("next_seq", 0))
                state["next_seq"] = run_state["seq"] + 1
            run_state["partitions"][part] = {
                "success": bool(data.get("success")),
                "expectations": (
                    f"{stats.get('successful_expectations', 0)}/"
                    f"{stats.get('evaluated_expectations', 0)}"
                ),
                "file": fname,
            }
            _atomic_write(
                self._state_path, json.dumps(state, indent=1, default=str)
            )
            self._render_run_page(suite, run, run_state)
            self._render_suite_page(suite, suite_state)
            self._render_home(state)
        return os.path.join(run_dir, fname)

    # -- pages ----------------------------------------------------------

    def _render_run_page(
        self, suite: str, run: str, run_state: Dict[str, Any]
    ) -> None:
        parts = run_state["partitions"]
        ok = all(p["success"] for p in parts.values())
        body = [
            '<p class="meta"><a href="../../../../index.html">docs</a> / '
            f'<a href="../../index.html">{_esc(suite)}</a> / '
            f"run {_esc(run)}</p>",
            f"<h1>{_status(ok)} {_esc(suite)} — run {_esc(run)}</h1>",
            f'<p class="meta">{len(parts)} validated partitions</p>',
            "<table><thead><tr><th>partition</th><th>status</th>"
            "<th>expectations</th><th>report</th></tr></thead><tbody>",
        ]
        for part in sorted(parts):
            p = parts[part]
            body.append(
                f"<tr><td>{_esc(part)}</td>"
                f"<td>{_status(p['success'])}</td>"
                f"<td>{_esc(p['expectations'])}</td>"
                f"<td><a href=\"{_esc(p['file'], 200)}\">"
                f"{_esc(p['file'], 200)}</a></td></tr>"
            )
        body.append("</tbody></table>")
        _atomic_write(
            os.path.join(
                self.directory,
                "suites",
                _safe(suite),
                "runs",
                _safe(run),
                "index.html",
            ),
            _page(f"{suite} — run {run}", "\n".join(body)),
        )

    def _render_suite_page(
        self, suite: str, suite_state: Dict[str, Any]
    ) -> None:
        runs = suite_state.get("runs", {})
        statuses = {
            int(k): v for k, v in (suite_state.get("statuses") or {}).items()
        }
        latest_ok = (
            all(
                p["success"]
                for p in runs[_latest_run(runs)]["partitions"].values()
            )
            if runs
            else True
        )
        body = [
            '<p class="meta"><a href="../../index.html">docs</a> / '
            f"{_esc(suite)}</p>",
            f"<h1>{_status(latest_ok)} suite {_esc(suite)}</h1>",
            "<h2>expectations</h2>",
            _blocks_by_column(suite_state.get("configs", []), statuses),
            "<h2>validation runs</h2>",
            "<table><thead><tr><th>run</th><th>time</th><th>status</th>"
            "<th>partitions</th></tr></thead><tbody>",
        ]
        for run in sorted(
            runs, key=lambda r: (runs[r].get("seq", -1), r), reverse=True
        ):
            r = runs[run]
            ok = all(p["success"] for p in r["partitions"].values())
            body.append(
                f"<tr><td><a href=\"runs/{_esc(_safe(run), 200)}/index.html\">"
                f"{_esc(run)}</a></td>"
                f"<td>{_esc(r.get('time') or '')}</td>"
                f"<td>{_status(ok)}</td>"
                f"<td>{len(r['partitions'])}</td></tr>"
            )
        body.append("</tbody></table>")
        _atomic_write(
            os.path.join(
                self.directory, "suites", _safe(suite), "index.html"
            ),
            _page(f"suite {suite}", "\n".join(body)),
        )

    def _render_home(self, state: Dict[str, Any]) -> None:
        suites = state.get("suites", {})
        body = [
            "<h1>Data Docs</h1>",
            f'<p class="meta">{len(suites)} expectation suites</p>',
            "<table><thead><tr><th>suite</th><th>runs</th>"
            "<th>latest run</th><th>latest status</th></tr></thead><tbody>",
        ]
        for suite in sorted(suites):
            runs = suites[suite].get("runs", {})
            latest = _latest_run(runs) if runs else ""
            ok = (
                all(
                    p["success"]
                    for p in runs[latest]["partitions"].values()
                )
                if runs
                else True
            )
            body.append(
                f"<tr><td><a href=\"suites/{_esc(_safe(suite), 200)}/"
                f"index.html\">{_esc(suite)}</a></td>"
                f"<td>{len(runs)}</td><td>{_esc(latest)}</td>"
                f"<td>{_status(ok)}</td></tr>"
            )
        body.append("</tbody></table>")
        _atomic_write(
            os.path.join(self.directory, "index.html"),
            _page("Data Docs", "\n".join(body)),
        )
