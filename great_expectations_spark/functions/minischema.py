"""Minimal JSON-Schema validator used when ``jsonschema`` isn't installed.

Supports the subset the reference's fixtures exercise: ``type``,
``properties``, ``required``, ``enum``, ``items``, ``minimum``/``maximum``,
``minLength``/``maxLength``.  (Reference delegates to the ``jsonschema``
package: ``column_values_match_json_schema.py:40-64``.)
"""

from __future__ import annotations

from typing import Any, Dict

_TYPES = {
    "string": str,
    "integer": int,
    "number": (int, float),
    "boolean": bool,
    "object": dict,
    "array": list,
    "null": type(None),
}


def check_schema(schema: Any) -> None:
    """Fail-fast sanity check of the SCHEMA itself (recursive): a typo'd
    ``type`` name or a non-dict schema is a configuration error and must
    raise at compile time — treating it as "no row matches" would
    conflate bad config with bad data.  Mirrors
    ``jsonschema.Validator.check_schema`` for the subset this module
    validates."""
    if not isinstance(schema, dict):
        raise ValueError(f"json_schema must be an object, got {schema!r}")
    stype = schema.get("type")
    if stype is not None:
        names = stype if isinstance(stype, list) else [stype]
        bad = [n for n in names if n not in _TYPES]
        if bad:
            raise ValueError(
                f"json_schema has unknown type name(s) {bad}; valid "
                f"types are {sorted(_TYPES)}"
            )
    for sub in schema.get("properties", {}).values():
        check_schema(sub)
    items = schema.get("items")
    if isinstance(items, dict):
        check_schema(items)


def validate_instance(instance: Any, schema: Dict[str, Any]) -> bool:
    stype = schema.get("type")
    if stype is not None:
        allowed = stype if isinstance(stype, list) else [stype]
        ok = False
        for name in allowed:
            py = _TYPES.get(name)
            if py is None:
                continue
            if name in ("integer", "number") and isinstance(instance, bool):
                continue
            if isinstance(instance, py):
                ok = True
                break
        if not ok:
            return False

    if "enum" in schema and instance not in schema["enum"]:
        return False

    if isinstance(instance, dict):
        for key in schema.get("required", []):
            if key not in instance:
                return False
        for key, subschema in schema.get("properties", {}).items():
            if key in instance and not validate_instance(instance[key], subschema):
                return False

    if isinstance(instance, list) and "items" in schema:
        items = schema["items"]
        if isinstance(items, dict):
            if not all(validate_instance(v, items) for v in instance):
                return False

    if isinstance(instance, (int, float)) and not isinstance(instance, bool):
        if "minimum" in schema and instance < schema["minimum"]:
            return False
        if "maximum" in schema and instance > schema["maximum"]:
            return False

    if isinstance(instance, str):
        if "minLength" in schema and len(instance) < schema["minLength"]:
            return False
        if "maxLength" in schema and len(instance) > schema["maxLength"]:
            return False

    return True
