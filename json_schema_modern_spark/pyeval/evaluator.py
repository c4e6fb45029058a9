"""Tiny pure-Python JSON Schema evaluator — the differential-testing oracle.

Implements the draft2020-12 keyword subset the Spark compiler supports,
with per-document recursive semantics exactly like the reference
(_evaluate_subschema, /root/reference/lib/JSON/Schema/Modern.pm:691-856):
keywords apply only when the instance type matches, integer ⊂ number,
2.0 is an integer, `if` errors never surface, `not` discards child errors,
anyOf suppresses branch errors on success.

This is NOT the engine — it exists so property-based tests can compare the
set-oriented Spark evaluation against an independent row-at-a-time
implementation on randomly generated (spec, instance) pairs
(tests/test_differential.py).  ~150 lines; no Spark imports.
"""

from __future__ import annotations

import re
from typing import Any


def json_type(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"unsupported instance type {type(v)}")


def _type_matches(v: Any, want: str) -> bool:
    t = json_type(v)
    if t == want:
        return True
    if want == "number" and t == "integer":
        return True
    if want == "integer" and t == "number" and float(v).is_integer():
        return True  # 2.0 is an integer (Utilities.pm:152-156)
    return False


def evaluate(schema: Any, instance: Any) -> bool:
    """True iff `instance` validates against `schema` (flag output)."""
    if schema is True or schema == {}:
        return True
    if schema is False:
        return False

    t = json_type(instance)

    if "type" in schema:
        wants = schema["type"]
        wants = wants if isinstance(wants, list) else [wants]
        if not any(_type_matches(instance, w) for w in wants):
            return False

    if t in ("integer", "number") and not isinstance(instance, bool):
        if "minimum" in schema and not instance >= schema["minimum"]:
            return False
        if "maximum" in schema and not instance <= schema["maximum"]:
            return False
        if "exclusiveMinimum" in schema and not instance > schema["exclusiveMinimum"]:
            return False
        if "exclusiveMaximum" in schema and not instance < schema["exclusiveMaximum"]:
            return False
        if "multipleOf" in schema:
            from decimal import Decimal

            q = Decimal(str(instance)) / Decimal(str(schema["multipleOf"]))
            if q != q.to_integral_value():
                return False

    if t == "string":
        if "minLength" in schema and len(instance) < schema["minLength"]:
            return False
        if "maxLength" in schema and len(instance) > schema["maxLength"]:
            return False
        if "pattern" in schema and not re.search(schema["pattern"], instance):
            return False

    if "enum" in schema and not any(_deep_eq(instance, m) for m in schema["enum"]):
        return False
    if "const" in schema and not _deep_eq(instance, schema["const"]):
        return False

    if t == "array":
        if "minItems" in schema and len(instance) < schema["minItems"]:
            return False
        if "maxItems" in schema and len(instance) > schema["maxItems"]:
            return False
        if schema.get("uniqueItems") is True:
            for i in range(len(instance)):
                for j in range(i + 1, len(instance)):
                    if _deep_eq(instance[i], instance[j]):
                        return False
        n_prefix = 0
        if "prefixItems" in schema:
            subs = schema["prefixItems"]
            n_prefix = len(subs)
            for i, s in enumerate(subs):
                if i < len(instance) and not evaluate(s, instance[i]):
                    return False
        if "items" in schema:
            items = schema["items"]
            if isinstance(items, list):
                # ≤2019-09 array form: positional + additionalItems rest
                n_prefix = len(items)
                for i, s in enumerate(items):
                    if i < len(instance) and not evaluate(s, instance[i]):
                        return False
                if "additionalItems" in schema:
                    for x in instance[n_prefix:]:
                        if not evaluate(schema["additionalItems"], x):
                            return False
            else:
                for x in instance[n_prefix:]:
                    if not evaluate(items, x):
                        return False
        if "contains" in schema or "minContains" in schema or "maxContains" in schema:
            c = schema.get("contains", True)
            matches = sum(1 for x in instance if evaluate(c, x))
            min_c = schema.get("minContains", 1)
            if "contains" in schema and matches < (min_c if min_c is not None else 1):
                if min_c != 0:
                    return False
            if "maxContains" in schema and matches > schema["maxContains"]:
                return False

    if t == "object":
        if "required" in schema and any(k not in instance for k in schema["required"]):
            return False
        if "minProperties" in schema and len(instance) < schema["minProperties"]:
            return False
        if "maxProperties" in schema and len(instance) > schema["maxProperties"]:
            return False
        if "dependentRequired" in schema:
            for p, deps in schema["dependentRequired"].items():
                if p in instance and any(d not in instance for d in deps):
                    return False
        if "dependentSchemas" in schema:
            for p, s in schema["dependentSchemas"].items():
                if p in instance and not evaluate(s, instance):
                    return False
        if "properties" in schema:
            for name, s in schema["properties"].items():
                if name in instance and not evaluate(s, instance[name]):
                    return False
        if "patternProperties" in schema:
            for pat, s in schema["patternProperties"].items():
                for name, v in instance.items():
                    if re.search(pat, name) and not evaluate(s, v):
                        return False
        if "additionalProperties" in schema:
            matched = set(schema.get("properties", {}))
            pats = list(schema.get("patternProperties", {}))
            for name, v in instance.items():
                if name in matched or any(re.search(p, name) for p in pats):
                    continue
                if not evaluate(schema["additionalProperties"], v):
                    return False
        if "propertyNames" in schema:
            for name in instance:
                if not evaluate(schema["propertyNames"], name):
                    return False

    if "allOf" in schema and not all(evaluate(s, instance) for s in schema["allOf"]):
        return False
    if "anyOf" in schema and not any(evaluate(s, instance) for s in schema["anyOf"]):
        return False
    if "oneOf" in schema and sum(evaluate(s, instance) for s in schema["oneOf"]) != 1:
        return False
    if "not" in schema and evaluate(schema["not"], instance):
        return False
    if "if" in schema:
        branch = "then" if evaluate(schema["if"], instance) else "else"
        if branch in schema and not evaluate(schema[branch], instance):
            return False
    return True


def _deep_eq(a: Any, b: Any) -> bool:
    """Type-strict deep equality (is_equal, Utilities.pm:242-299):
    booleans ≠ numbers, integer == equal-valued float, arrays ordered,
    objects unordered."""
    ta, tb = json_type(a), json_type(b)
    if {ta, tb} == {"integer", "number"} or ta == tb == "number" or ta == tb == "integer":
        return float(a) == float(b)
    if ta != tb:
        return False
    if ta == "array":
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    if ta == "object":
        return a.keys() == b.keys() and all(_deep_eq(v, b[k]) for k, v in a.items())
    return a == b
