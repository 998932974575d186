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


_EXPR_LEXER = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<name>[a-z_][a-z_0-9]*)"
    r"|(?P<op>[+\-*/(),=]))"
)


def _eval_parameter_expression(expr: str) -> Any:
    """Evaluate the reference's ``now() - timedelta(weeks=52)``-style
    evaluation-parameter expressions (reference
    ``core/evaluation_parameters.py:274-430`` uses a pyparsing grammar).

    This is a tiny recursive-descent parser over exactly now() /
    datetime() / timedelta() calls, numeric literals, and +-*/ arithmetic
    — NOT eval(): attribute access, dunder chains, subscripts, and names
    outside the whitelist are unparseable by construction, so untrusted
    suite JSON cannot escape into the interpreter.  Returns None when the
    string is not such an expression (same contract as before).
    """
    import datetime as _dt

    if not isinstance(expr, str) or "(" not in expr:
        return None

    tokens: List[tuple] = []
    pos = 0
    while pos < len(expr):
        m = _EXPR_LEXER.match(expr, pos)
        if m is None:
            if expr[pos:].strip() == "":
                break
            return None  # unexpected character => not an expression
        if m.group("num") is not None:
            text = m.group("num")
            tokens.append(("num", float(text) if "." in text else int(text)))
        elif m.group("name") is not None:
            tokens.append(("name", m.group("name")))
        else:
            tokens.append(("op", m.group("op")))
        pos = m.end()

    functions = {
        "now": lambda *a, **k: _dt.datetime.now(),
        "timedelta": _dt.timedelta,
        "datetime": _dt.datetime,
    }
    i = 0

    def peek() -> Optional[tuple]:
        return tokens[i] if i < len(tokens) else None

    def take(kind: str, value: Any = None) -> tuple:
        nonlocal i
        tok = peek()
        if tok is None or tok[0] != kind or (
            value is not None and tok[1] != value
        ):
            raise ValueError(f"unexpected token {tok!r}")
        i += 1
        return tok

    def parse_expr() -> Any:
        value = parse_term()
        while peek() == ("op", "+") or peek() == ("op", "-"):
            op = take("op")[1]
            rhs = parse_term()
            value = value + rhs if op == "+" else value - rhs
        return value

    def parse_term() -> Any:
        value = parse_factor()
        while peek() == ("op", "*") or peek() == ("op", "/"):
            op = take("op")[1]
            rhs = parse_factor()
            value = value * rhs if op == "*" else value / rhs
        return value

    def parse_factor() -> Any:
        tok = peek()
        if tok == ("op", "-"):
            take("op", "-")
            return -parse_factor()
        if tok == ("op", "("):
            take("op", "(")
            value = parse_expr()
            take("op", ")")
            return value
        if tok is not None and tok[0] == "num":
            return take("num")[1]
        if tok is not None and tok[0] == "name":
            name = take("name")[1]
            if name not in functions:
                raise ValueError(f"unknown function {name!r}")
            take("op", "(")
            args: List[Any] = []
            kwargs: Dict[str, Any] = {}
            if peek() != ("op", ")"):
                while True:
                    if (
                        peek() is not None
                        and peek()[0] == "name"
                        and i + 1 < len(tokens)
                        and tokens[i + 1] == ("op", "=")
                    ):
                        key = take("name")[1]
                        take("op", "=")
                        kwargs[key] = parse_expr()
                    else:
                        args.append(parse_expr())
                    if peek() == ("op", ","):
                        take("op", ",")
                        continue
                    break
            take("op", ")")
            return functions[name](*args, **kwargs)
        raise ValueError(f"unexpected token {tok!r}")

    try:
        value = parse_expr()
        if i != len(tokens):
            return None
        return value
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
        self,
        evaluation_parameters: Optional[Dict[str, Any]],
        urn_resolver: Optional[Any] = None,
    ) -> "ExpectationConfiguration":
        """Resolve ``{"$PARAMETER": name}`` kwargs against the provided
        evaluation parameters (plain lookup, v1 scope).  Names beginning
        with ``urn:great_expectations:validations:`` resolve through
        ``urn_resolver`` (a callable, e.g.
        ``ValidationResultStore.resolve_urn``) — cross-suite chained
        parameters, reference ``core/evaluation_parameters.py:274-430``."""
        evaluation_parameters = evaluation_parameters or {}

        def resolve(value: Any) -> Any:
            if isinstance(value, dict) and "$PARAMETER" in value:
                name = value["$PARAMETER"]
                if name in evaluation_parameters:
                    return evaluation_parameters[name]
                if isinstance(name, str) and name.startswith(
                    "urn:great_expectations:"
                ):
                    if urn_resolver is None:
                        raise KeyError(
                            f"URN parameter {name!r} requires a "
                            "parameter_store (ValidationResultStore)"
                        )
                    return urn_resolver(name)
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
