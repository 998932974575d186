"""Data-assistant result layer (reference
``experimental/rule_based_profiler/data_assistant/data_assistant.py`` +
``data_assistant_result/data_assistant_result.py``).

The reference's OnboardingDataAssistant wraps a rule pack and returns a
DataAssistantResult: the generated ExpectationSuite plus structured
per-rule metrics/domains and altair plotting.  The rule pack itself
already exists here (``rule_profiler.onboarding_assistant()``); this
module adds the result-object layer on top of
:class:`RuleBasedProfilerResult`:

* per-rule summary — domains profiled, fitted parameters, generated
  expectations — as a structured object, markdown, and an HTML page
  that plugs into the Data Docs site renderer;
* ``plot_data()`` — the exact per-domain fitted-range series the
  reference's altair charts draw, as plain data (altair is not a
  dependency of this engine; any plotting layer can consume the dict).

Everything is driver-side and O(rules × domains); the Spark work all
happened inside ``RuleBasedProfiler.run`` (one screening agg + one
bundled agg per batch).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.operators.rule_profiler import (
    RuleBasedProfiler,
    RuleBasedProfilerResult,
    onboarding_assistant,
)


def _cfg_dict(cfg: Any) -> Dict[str, Any]:
    if hasattr(cfg, "to_json_dict"):
        return cfg.to_json_dict()
    if hasattr(cfg, "expectation_type"):
        return {
            "expectation_type": cfg.expectation_type,
            "kwargs": dict(getattr(cfg, "kwargs", {}) or {}),
        }
    return dict(cfg)


@dataclass
class DataAssistantResult:
    """(reference ``data_assistant_result.py`` DataAssistantResult)

    Structured view over one assistant run: which rules profiled which
    domains, what parameters they fitted, and what suite came out."""

    assistant_name: str
    profiler_result: RuleBasedProfilerResult
    batch_count: int = 1
    _rules: Dict[str, Dict[str, Any]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        pr = self.profiler_result
        for rule_name, domain_ids in pr.rule_domains.items():
            self._rules[rule_name] = {
                "domains": list(domain_ids),
                "parameters": {
                    d: dict(pr.parameters_by_domain.get(d, {}))
                    for d in domain_ids
                },
                "expectations": [
                    _cfg_dict(c)
                    for c in pr.expectations_by_rule.get(rule_name, [])
                ],
            }

    # -- accessors (reference result-object surface) ---------------------

    def get_expectation_suite(
        self, suite_name: Optional[str] = None
    ) -> ExpectationSuite:
        suite = self.profiler_result.suite
        if suite_name:
            # renamed COPY: mutating the shared profiler_result.suite in
            # place would rename every prior caller's suite too
            import json as _json

            suite = ExpectationSuite.from_json(
                _json.dumps(suite.to_json_dict())
            )
            suite.expectation_suite_name = suite_name
        return suite

    @property
    def rules(self) -> Dict[str, Dict[str, Any]]:
        return self._rules

    def show_expectations_by_domain_type(self) -> Dict[str, List[str]]:
        """Domain → humanized expectation lines (reference
        ``show_expectations_by_domain_type``, text form)."""
        from great_expectations_spark.render.site import (
            describe_expectation,
        )

        out: Dict[str, List[str]] = {}
        for summary in self._rules.values():
            for cfg in summary["expectations"]:
                domain = (
                    cfg.get("kwargs", {}).get("column")
                    or cfg.get("kwargs", {}).get("column_list")
                    or "table"
                )
                out.setdefault(str(domain), []).append(
                    describe_expectation(cfg)
                )
        return out

    def plot_data(self) -> Dict[str, Any]:
        """The per-domain fitted-parameter series the reference's altair
        charts render (metric ranges per domain per rule), as plain
        data: ``{rule: {domain: {parameter: value}}}``."""
        return {
            rule: dict(summary["parameters"])
            for rule, summary in self._rules.items()
        }

    # -- rendering --------------------------------------------------------

    def to_markdown(self) -> str:
        lines = [
            f"# data assistant: {self.assistant_name}",
            f"- batches profiled: {self.batch_count}",
            f"- rules: {len(self._rules)}",
            f"- generated expectations: "
            f"{len(self.profiler_result.suite.expectations)}",
            "",
        ]
        from great_expectations_spark.render.site import (
            describe_expectation,
        )

        for rule in sorted(self._rules):
            summary = self._rules[rule]
            lines.append(f"## rule `{rule}`")
            lines.append(
                f"- domains: "
                f"{', '.join(summary['domains']) or '(none matched)'}"
            )
            for domain in summary["domains"]:
                params = summary["parameters"].get(domain) or {}
                for pname in sorted(params):
                    lines.append(f"  - `{domain}` {pname} = {params[pname]}")
            from great_expectations_spark.render.markdown import (
                _domain_of,
            )

            for cfg in summary["expectations"]:
                domain = _domain_of(cfg.get("kwargs", {}) or {}) or "table"
                lines.append(
                    f"- ✅ `{domain}`: {describe_expectation(cfg)}"
                )
            lines.append("")
        return "\n".join(lines)

    def to_html(self) -> str:
        """Self-contained per-rule summary page (same inline-CSS document
        family as the Data Docs site)."""
        from great_expectations_spark.render.html import _esc, _page
        from great_expectations_spark.render.site import (
            describe_expectation,
        )

        parts: List[str] = [
            f"<h1>data assistant: {_esc(self.assistant_name)}</h1>",
            f'<p class="meta">{self.batch_count} batches profiled — '
            f"{len(self._rules)} rules — "
            f"{len(self.profiler_result.suite.expectations)} generated "
            "expectations</p>",
        ]
        for rule in sorted(self._rules):
            summary = self._rules[rule]
            parts.append(f"<h2>rule <code>{_esc(rule)}</code></h2>")
            parts.append(
                "<table><thead><tr><th>domain</th><th>fitted parameters"
                "</th></tr></thead><tbody>"
            )
            for domain in summary["domains"]:
                params = summary["parameters"].get(domain) or {}
                plist = "<br>".join(
                    f"<code>{_esc(k)}</code> = {_esc(v, 120)}"
                    for k, v in sorted(params.items())
                )
                parts.append(
                    f"<tr><td><code>{_esc(domain)}</code></td>"
                    f"<td>{plist}</td></tr>"
                )
            parts.append("</tbody></table>")
            parts.extend(self._rule_charts(rule, summary))
            if summary["expectations"]:
                parts.append('<ul class="samples">')
                parts.extend(
                    f"<li>{_esc(describe_expectation(cfg), 200)}</li>"
                    for cfg in summary["expectations"]
                )
                parts.append("</ul>")
        return _page(f"assistant {self.assistant_name}", "\n".join(parts))

    @staticmethod
    def _rule_charts(rule: str, summary: Dict[str, Any]) -> List[str]:
        """Per-rule inline-SVG charts: one bar chart per numeric fitted
        parameter, bars = domains — the series the reference's altair
        `plot_metrics()` draws, rendered dependency-free."""
        from great_expectations_spark.render.html import _esc, _svg_bars

        def as_point(v: Any) -> Optional[float]:
            # scalars chart directly; the fitted [lo, hi] ranges the
            # multi-batch estimators emit chart as their midpoint
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return float(v)
            if (
                isinstance(v, (list, tuple))
                and len(v) == 2
                and all(
                    isinstance(x, (int, float)) and not isinstance(x, bool)
                    for x in v
                )
            ):
                return (float(v[0]) + float(v[1])) / 2.0
            return None

        by_param: Dict[str, List] = {}
        for domain in summary["domains"]:
            for k, v in (summary["parameters"].get(domain) or {}).items():
                p = as_point(v)
                if p is not None:
                    by_param.setdefault(k, []).append((str(domain), p))
        out: List[str] = []
        for k in sorted(by_param)[:4]:
            series = by_param[k]
            if len(series) < 2:
                continue
            out.append(f"<p><code>{_esc(k)}</code> by domain</p>")
            out.append(
                _svg_bars([d for d, _ in series], [v for _, v in series])
            )
        return out

    def save_html(self, path: str) -> str:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_html())
        return path


def run_onboarding_assistant(
    batches: Sequence[DataFrame],
    suite_name: Optional[str] = None,
    false_positive_rate: float = 0.05,
    estimator: str = "bootstrap",
    max_value_set_cardinality: int = 100,
) -> DataAssistantResult:
    """Run the onboarding rule pack and wrap the profiler output in the
    assistant result object (reference
    ``context.assistants.onboarding.run(batch_request=...)``)."""
    profiler: RuleBasedProfiler = onboarding_assistant(
        false_positive_rate=false_positive_rate,
        estimator=estimator,
        max_value_set_cardinality=max_value_set_cardinality,
    )
    if isinstance(batches, DataFrame):
        batches = [batches]
    result = profiler.run(list(batches), suite_name=suite_name)
    return DataAssistantResult(
        assistant_name=profiler.name,
        profiler_result=result,
        batch_count=len(list(batches)),
    )
