"""Column-map condition operators.

Each compiler takes expectation kwargs and returns a :class:`CompiledMap`
whose ``unexpected`` Column is evaluated inside the planner's single bundled
aggregation pass (no per-expectation Spark jobs, unlike the reference's
metric-graph resolution).

Null-prefilter parity (reference
``map_metric_provider/column_condition_partial.py:256-276``): for ordinary
column-map expectations a NULL value is never "unexpected" — the row simply
leaves the denominator.  Only the null/not-null expectations look at all
rows.

Per-condition semantics cite the reference implementation they mirror.
Everything here is JVM-side (`pyspark.sql.functions`); the few checks that
genuinely need Python (strftime, json-schema, dateutil) use Arrow-batched
pandas UDFs — never row-at-a-time Python UDFs.
"""

from __future__ import annotations

import datetime
from typing import Any, Callable, Dict, List, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from great_expectations_spark.plans.specs import CompiledMap

MAP_COMPILERS: Dict[str, Callable[[Dict[str, Any]], CompiledMap]] = {}


def register_map(name: str):
    def deco(fn):
        MAP_COMPILERS[name] = fn
        return fn

    return deco


def _column_map(
    column: str,
    expected: Column,
    *,
    filter_nulls: bool = True,
    denominator: str = "nonnull",
    unexpected: Optional[Column] = None,
) -> CompiledMap:
    col = F.col(column)
    considered = col.isNotNull() if filter_nulls else F.lit(True)
    if unexpected is None:
        # NULL comparison results must not count as unexpected
        unexpected = ~F.coalesce(expected.cast("boolean"), F.lit(True))
    return CompiledMap(
        kind="column_map",
        domain_columns=[column],
        considered=considered,
        unexpected=unexpected,
        denominator=denominator,
        value_expr=col,
    )


# --------------------------------------------------------------------------
# null / not-null  (ref: column_map_metrics/column_values_null.py:36-38,
# column_values_non_null.py:37-38; element-count denominator per
# expect_column_values_to_not_be_null.py:280-325)
# --------------------------------------------------------------------------


@register_map("expect_column_values_to_be_null")
def _be_null(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(
        kwargs["column"],
        expected=col.isNull(),
        filter_nulls=False,
        denominator="element",
        unexpected=col.isNotNull(),
    )


@register_map("expect_column_values_to_not_be_null")
def _not_be_null(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(
        kwargs["column"],
        expected=col.isNotNull(),
        filter_nulls=False,
        denominator="element",
        unexpected=col.isNull(),
    )


# --------------------------------------------------------------------------
# set membership  (ref: column_values_in_set.py:90-108, value_set None => all
# rows expected)
# --------------------------------------------------------------------------


@register_map("expect_column_values_to_be_in_set")
def _in_set(kwargs: Dict[str, Any]) -> CompiledMap:
    value_set = kwargs.get("value_set")
    col = F.col(kwargs["column"])
    expected = F.lit(True) if value_set is None else col.isin(list(value_set))
    return _column_map(kwargs["column"], expected)


@register_map("expect_column_values_to_not_be_in_set")
def _not_in_set(kwargs: Dict[str, Any]) -> CompiledMap:
    if kwargs.get("value_set") is None:
        # parity: the reference raises when value_set is missing/None here
        # (unlike in_set, where None means vacuously-expected)
        raise TypeError(
            "expect_column_values_to_not_be_in_set requires a value_set"
        )
    value_set = list(kwargs["value_set"])
    if any(v is None for v in value_set):
        raise ValueError(
            "value_set may not contain None on the Spark engine (isin "
            "cannot match NULL)"
        )
    col = F.col(kwargs["column"])
    return _column_map(kwargs["column"], ~col.isin(value_set))


# --------------------------------------------------------------------------
# between  (ref: column_values_between.py:301-355 — strict flags, None bound
# => unbounded)
# --------------------------------------------------------------------------


def _bound_literal(value: Any) -> Column:
    if isinstance(value, (datetime.datetime, datetime.date)):
        return F.lit(value)
    return F.lit(value)


def between_condition(
    col: Column,
    min_value: Any = None,
    max_value: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
) -> Column:
    expected = F.lit(True)
    if min_value is not None:
        lo = _bound_literal(min_value)
        expected = expected & (col > lo if strict_min else col >= lo)
    if max_value is not None:
        hi = _bound_literal(max_value)
        expected = expected & (col < hi if strict_max else col <= hi)
    return expected


def _maybe_parse_datetime_bound(value: Any, kwargs: Dict[str, Any]) -> Any:
    """GE's deprecated ``parse_strings_as_datetimes`` coerces string bounds
    to datetimes (``column_values_between.py:301-355``)."""
    if kwargs.get("parse_strings_as_datetimes") and isinstance(value, str):
        from dateutil import parser

        return parser.parse(value)
    return value


@register_map("expect_column_values_to_be_between")
def _between(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    min_value = _maybe_parse_datetime_bound(kwargs.get("min_value"), kwargs)
    max_value = _maybe_parse_datetime_bound(kwargs.get("max_value"), kwargs)
    if min_value is None and max_value is None:
        raise ValueError("min_value and max_value cannot both be None")
    if (
        min_value is not None
        and max_value is not None
        and type(min_value) is type(max_value)
        and not isinstance(min_value, str)
        and min_value > max_value
    ):
        raise ValueError("min_value cannot be greater than max_value")
    expected = between_condition(
        col,
        min_value,
        max_value,
        bool(kwargs.get("strict_min", False)),
        bool(kwargs.get("strict_max", False)),
    )
    out = _column_map(kwargs["column"], expected)

    numeric_bound = any(
        isinstance(v, (int, float)) and not isinstance(v, bool)
        for v in (min_value, max_value)
    )
    if numeric_bound:
        def check(dtype) -> None:
            if isinstance(dtype, T.StringType):
                raise TypeError(
                    "cannot compare string column to numeric min/max bounds"
                )

        out.type_check = check
    return out


# --------------------------------------------------------------------------
# value lengths  (ref: column_value_lengths.py:42-46, 97-98, 190-227)
# --------------------------------------------------------------------------


@register_map("expect_column_value_lengths_to_equal")
def _length_equal(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(
        kwargs["column"], F.length(col) == F.lit(int(kwargs["value"]))
    )


@register_map("expect_column_value_lengths_to_be_between")
def _length_between(kwargs: Dict[str, Any]) -> CompiledMap:
    if kwargs.get("min_value") is None and kwargs.get("max_value") is None:
        raise ValueError("min_value and max_value cannot both be None")
    for bound in ("min_value", "max_value"):
        v = kwargs.get(bound)
        if v is not None and float(v) != int(float(v)):
            raise ValueError(f"{bound} must be an integer")
    col = F.col(kwargs["column"])
    expected = between_condition(
        F.length(col),
        kwargs.get("min_value"),
        kwargs.get("max_value"),
        bool(kwargs.get("strict_min", False)),
        bool(kwargs.get("strict_max", False)),
    )
    out = _column_map(kwargs["column"], expected)
    out.required_column_types = (T.StringType,)
    return out


# --------------------------------------------------------------------------
# regex family  (ref: column_values_match_regex.py:37-38 — Spark `rlike`,
# i.e. Java regex dialect; regex_list any => alternation join, all =>
# concatenated lookaheads, column_values_match_regex_list.py:74-79)
# --------------------------------------------------------------------------


@register_map("expect_column_values_to_match_regex")
def _match_regex(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(kwargs["column"], col.rlike(kwargs["regex"]))


@register_map("expect_column_values_to_not_match_regex")
def _not_match_regex(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(kwargs["column"], ~col.rlike(kwargs["regex"]))


@register_map("expect_column_values_to_match_regex_list")
def _match_regex_list(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    regexes: List[str] = list(kwargs["regex_list"])
    match_on = kwargs.get("match_on", "any")
    if match_on == "any":
        expected = col.rlike("|".join(regexes))
    else:
        expected = col.rlike("".join(f"(?={r})" for r in regexes))
    return _column_map(kwargs["column"], expected)


@register_map("expect_column_values_to_not_match_regex_list")
def _not_match_regex_list(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    expected = ~col.rlike("|".join(kwargs["regex_list"]))
    return _column_map(kwargs["column"], expected)


# --------------------------------------------------------------------------
# LIKE patterns — the reference has SQL-only implementations (Spark skip
# list self_check/util.py:2064-2067); ours supports them natively via
# Column.like.
# --------------------------------------------------------------------------


@register_map("expect_column_values_to_match_like_pattern")
def _match_like(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(kwargs["column"], col.like(kwargs["like_pattern"]))


@register_map("expect_column_values_to_not_match_like_pattern")
def _not_match_like(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(kwargs["column"], ~col.like(kwargs["like_pattern"]))


@register_map("expect_column_values_to_match_like_pattern_list")
def _match_like_list(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    pats = list(kwargs["like_pattern_list"])
    match_on = kwargs.get("match_on", "any")
    conds = [col.like(p) for p in pats]
    expected = conds[0]
    for c in conds[1:]:
        expected = (expected | c) if match_on == "any" else (expected & c)
    return _column_map(kwargs["column"], expected)


@register_map("expect_column_values_to_not_match_like_pattern_list")
def _not_match_like_list(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    expected = F.lit(True)
    for p in kwargs["like_pattern_list"]:
        expected = expected & ~col.like(p)
    return _column_map(kwargs["column"], expected)


# --------------------------------------------------------------------------
# strftime / json / dateutil — Python-semantics checks.  The reference uses
# row-at-a-time Python UDFs (column_values_match_strftime_format.py:34-60,
# column_values_json_parseable.py:29-39, column_values_match_json_schema.py:
# 40-64); we use Arrow-batched pandas UDFs (no per-row Python crossing).
# --------------------------------------------------------------------------


def _strftime_matches(fmt: str):
    @F.pandas_udf(T.BooleanType())
    def matches(s: pd.Series) -> pd.Series:
        parsed = pd.to_datetime(s, format=fmt, errors="coerce")
        return parsed.notna() & s.notna()

    return matches


@register_map("expect_column_values_to_match_strftime_format")
def _match_strftime(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    expected = _strftime_matches(kwargs["strftime_format"])(col)
    out = _column_map(kwargs["column"], expected)
    # GE raises on non-string input columns (parity with the reference's
    # Python strptime UDF TypeError)
    out.required_column_types = (T.StringType,)
    return out


def _json_parseable_udf():
    @F.pandas_udf(T.BooleanType())
    def parseable(s: pd.Series) -> pd.Series:
        import json

        def ok(v):
            if v is None:
                return False
            try:
                json.loads(v)
                return True
            except (TypeError, ValueError):
                return False

        return s.map(ok)

    return parseable


@register_map("expect_column_values_to_be_json_parseable")
def _json_parseable(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    return _column_map(kwargs["column"], _json_parseable_udf()(col))


def _json_schema_matches(schema_json: str):
    @F.pandas_udf(T.BooleanType())
    def matches(s: pd.Series) -> pd.Series:
        import json

        schema = json.loads(schema_json)
        try:
            import jsonschema

            def ok(v):
                if v is None:
                    return False
                try:
                    jsonschema.validate(json.loads(v), schema)
                    return True
                except Exception:
                    return False

        except ImportError:
            from great_expectations_spark.functions.minischema import (
                validate_instance,
            )

            def ok(v):
                if v is None:
                    return False
                try:
                    return validate_instance(json.loads(v), schema)
                except (TypeError, ValueError):
                    return False

        return s.map(ok)

    return matches


@register_map("expect_column_values_to_match_json_schema")
def _match_json_schema(kwargs: Dict[str, Any]) -> CompiledMap:
    import json

    # a malformed SCHEMA is a config error and must raise at compile
    # time (-> exception EVR under catch_exceptions) — the row-level
    # matcher's broad except would otherwise silently report every row
    # as non-matching, conflating bad config with bad data
    try:
        import jsonschema

        jsonschema.validators.validator_for(
            kwargs["json_schema"]
        ).check_schema(kwargs["json_schema"])
    except ImportError:
        from great_expectations_spark.functions.minischema import (
            check_schema,
        )

        check_schema(kwargs["json_schema"])

    col = F.col(kwargs["column"])
    schema_json = json.dumps(kwargs["json_schema"])
    expected = _json_schema_matches(schema_json)(col)
    return _column_map(kwargs["column"], expected)


def _dateutil_parseable_udf():
    @F.pandas_udf(T.BooleanType())
    def parseable(s: pd.Series) -> pd.Series:
        from dateutil import parser as dateutil_parser

        def ok(v):
            if v is None:
                return False
            try:
                dateutil_parser.parse(v)
                return True
            except (TypeError, ValueError, OverflowError):
                return False

        return s.map(ok)

    return parseable


@register_map("expect_column_values_to_be_dateutil_parseable")
def _dateutil_parseable(kwargs: Dict[str, Any]) -> CompiledMap:
    col = F.col(kwargs["column"])
    out = _column_map(kwargs["column"], _dateutil_parseable_udf()(col))
    out.required_column_types = (T.StringType,)
    return out


# --------------------------------------------------------------------------
# PII absence (beyond reference — the transcript-curation gate a
# 10^12-turn pipeline runs before text enters a training corpus; detection
# machinery in functions/curation.py: Java-regex∩RE2 patterns, payment
# cards gated by a pure-SQL Luhn fold — zero UDFs, rides the bundled agg)
# --------------------------------------------------------------------------


@register_map("expect_column_values_to_not_contain_pii")
def _not_contain_pii(kwargs: Dict[str, Any]) -> CompiledMap:
    from great_expectations_spark.functions.curation import pii_counts

    counts = pii_counts(F.col(kwargs["column"]), kwargs.get("kinds"))
    any_pii = None
    for c in counts.values():
        term = F.coalesce(c, F.lit(0)) > 0
        any_pii = term if any_pii is None else (any_pii | term)
    out = _column_map(kwargs["column"], expected=~any_pii)
    out.required_column_types = (T.StringType,)
    return out


@register_map("expect_column_values_to_pass_quality_gate")
def _pass_quality_gate(kwargs: Dict[str, Any]) -> CompiledMap:
    """Heuristic quality gates as a first-class map expectation (no
    reference analog — GE validates, it does not curate; this exposes
    the engine's curation gates through the expectation idiom so a
    suite can assert e.g. "at least 95% of documents pass the Gopher
    rules" with standard ``mostly`` semantics).

    ``gate='gopher'`` — the structural Gopher rules
    (``text.gopher_keep_expr``; ``thresholds=`` overrides/disables per
    rule); ``gate='c4'`` — the C4 page verdict
    (``curation.c4_signals()['keep']``; rule kwargs pass through).
    NULL values leave the denominator (ordinary column-map parity);
    both gates are pure JVM expressions riding the bundled agg."""
    column = kwargs["column"]
    gate = kwargs.get("gate", "gopher")
    if gate == "gopher":
        from great_expectations_spark.functions.text import gopher_keep_expr

        keep = gopher_keep_expr(F.col(column), kwargs.get("thresholds"))
    elif gate == "c4":
        from great_expectations_spark.functions.curation import c4_signals

        c4_keys = (
            "min_words_per_line",
            "min_sentences",
            "line_drop_words",
            "page_drop_phrases",
            "bad_words",
        )
        c4kw = {k: kwargs[k] for k in c4_keys if k in kwargs}
        keep = c4_signals(F.col(column), **c4kw)["keep"]
    else:
        raise ValueError(
            f"gate must be 'gopher' or 'c4', got {gate!r}"
        )
    out = _column_map(column, expected=keep)
    out.required_column_types = (T.StringType,)
    return out


@register_map("expect_column_values_to_be_in_language")
def _be_in_language(kwargs: Dict[str, Any]) -> CompiledMap:
    """Language membership as a map expectation (no reference analog —
    the LLM-pipeline counterpart of ``_to_be_in_set``): a value is
    expected when the Cavnar–Trenkle classifier
    (``langid.language_id_ct``, 20 languages, Arrow-batched — never
    per-row Python) predicts one of ``languages``.  ``classifier=
    'fast'`` swaps in the JVM stopword-argmax heuristic
    (``text.language_id_fast``) for suites that must stay
    whole-stage-codegen pure.  NULL values leave the denominator."""
    column = kwargs["column"]
    languages = kwargs.get("languages") or kwargs.get("language")
    if not languages:
        raise ValueError("languages= is required (a list or one code)")
    if isinstance(languages, str):
        languages = [languages]
    classifier = kwargs.get("classifier", "ct")
    if classifier == "ct":
        from great_expectations_spark.functions.langid import language_id_ct

        pred = language_id_ct(F.col(column))
    elif classifier == "fast":
        from great_expectations_spark.functions.text import language_id_fast

        pred = language_id_fast(F.col(column))
    else:
        raise ValueError(f"classifier must be 'ct' or 'fast': {classifier!r}")
    out = _column_map(column, expected=pred.isin([str(x) for x in languages]))
    out.required_column_types = (T.StringType,)
    return out


def compile_map_expectation(
    expectation_type: str, kwargs: Dict[str, Any]
) -> CompiledMap:
    try:
        compiler = MAP_COMPILERS[expectation_type]
    except KeyError:
        raise KeyError(f"no map compiler for {expectation_type!r}") from None
    return compiler(kwargs)
