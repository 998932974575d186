"""Expectation configuration + suite model.

Parity notes (reference ``expectations/expectation.py``):
* kwargs split into domain / success / runtime keys (:330-332, :1114-1175);
  we keep a flat kwargs dict and let each operator pull what it needs.
* ``mostly`` defaults to 1.0 and must be in [0, 1] (:2603-2611, :3548-3563).
* evaluation parameters: any kwarg may be ``{"$PARAMETER": "<name>"}``;
  v1 scope is plain lookup substitution (reference
  ``core/evaluation_parameters.py:226-271``).
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


_EXPR_TOKEN = re.compile(
    r"^[\s0-9+\-*/().,a-z_=]*$"  # now()/timedelta(...) arithmetic only
)


def _eval_parameter_expression(expr: str) -> Any:
    """Evaluate the reference's ``now() - timedelta(weeks=52)``-style
    evaluation-parameter expressions (reference
    ``core/evaluation_parameters.py:274-430`` uses a pyparsing grammar;
    ours is a restricted-namespace eval over the same function set)."""
    import datetime as _dt

    if not isinstance(expr, str) or "(" not in expr:
        return None
    if not _EXPR_TOKEN.match(expr):
        return None
    namespace = {
        "now": lambda: _dt.datetime.now(),
        "timedelta": _dt.timedelta,
        "datetime": _dt.datetime,
    }
    try:
        return eval(  # noqa: S307 — namespace is closed, tokens filtered
            expr, {"__builtins__": {}}, namespace
        )
    except Exception:
        return None


@dataclass
class ExpectationConfiguration:
    expectation_type: str
    kwargs: Dict[str, Any] = field(default_factory=dict)
    meta: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        mostly = self.kwargs.get("mostly")
        if mostly is not None:
            if not isinstance(mostly, (int, float)) or isinstance(mostly, bool):
                raise ValueError("'mostly' parameter must be an integer or float")
            if not 0 <= mostly <= 1:
                raise ValueError("'mostly' parameter must be between 0 and 1")

    @property
    def mostly(self) -> float:
        return float(self.kwargs.get("mostly", 1.0))

    def substituted(
        self, evaluation_parameters: Optional[Dict[str, Any]]
    ) -> "ExpectationConfiguration":
        """Resolve ``{"$PARAMETER": name}`` kwargs against the provided
        evaluation parameters (plain lookup, v1 scope)."""
        evaluation_parameters = evaluation_parameters or {}

        def resolve(value: Any) -> Any:
            if isinstance(value, dict) and "$PARAMETER" in value:
                name = value["$PARAMETER"]
                if name in evaluation_parameters:
                    return evaluation_parameters[name]
                # temp-value form: {"$PARAMETER": expr,
                #                   "$PARAMETER.<expr>": value}
                # (reference core/evaluation_parameters.py:226-271)
                temp_key = f"$PARAMETER.{name}"
                if temp_key in value:
                    return value[temp_key]
                evaluated = _eval_parameter_expression(name)
                if evaluated is not None:
                    return evaluated
                raise KeyError(f"evaluation parameter {name!r} not supplied")
            if isinstance(value, list):
                return [resolve(v) for v in value]
            if isinstance(value, dict):
                return {k: resolve(v) for k, v in value.items()}
            return value

        return ExpectationConfiguration(
            expectation_type=self.expectation_type,
            kwargs={k: resolve(v) for k, v in self.kwargs.items()},
            meta=self.meta,
        )

    def to_json_dict(self) -> Dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": self.kwargs,
            "meta": self.meta,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExpectationConfiguration":
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs", {})),
            meta=dict(d.get("meta", {})),
        )


@dataclass
class ExpectationSuite:
    expectation_suite_name: str
    expectations: List[ExpectationConfiguration] = field(default_factory=list)
    evaluation_parameters: Dict[str, Any] = field(default_factory=dict)
    meta: Dict[str, Any] = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> "ExpectationSuite":
        self.expectations.append(
            ExpectationConfiguration(expectation_type, kwargs)
        )
        return self

    def suite_hash(self) -> str:
        """Stable content hash used by the checkpoint manifest for resume
        idempotency."""
        payload = json.dumps(
            [e.to_json_dict() for e in self.expectations], sort_keys=True
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def to_json_dict(self) -> Dict[str, Any]:
        return {
            "expectation_suite_name": self.expectation_suite_name,
            "expectations": [e.to_json_dict() for e in self.expectations],
            "evaluation_parameters": self.evaluation_parameters,
            "meta": self.meta,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_json_dict(), sort_keys=True, default=str)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExpectationSuite":
        return cls(
            expectation_suite_name=d.get("expectation_suite_name", "default"),
            expectations=[
                ExpectationConfiguration.from_dict(e)
                for e in d.get("expectations", [])
            ],
            evaluation_parameters=dict(d.get("evaluation_parameters", {})),
            meta=dict(d.get("meta", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "ExpectationSuite":
        return cls.from_dict(json.loads(s))
