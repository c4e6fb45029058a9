"""Spec → Spark Column expressions (the set-oriented evaluator core).

The reference evaluates one instance at a time with a recursive interpreter
(_evaluate_subschema, /root/reference/lib/JSON/Schema/Modern.pm:691-856).
This compiler inverts the loop: each keyword becomes ONE whole-column
vectorized expression over a typed DataFrame, so a million rows evaluate in
a single codegen'd pass instead of a million tree walks.

Mapping decisions (documented deviations from pure JSON-document semantics):

- A SQL ``NULL`` in a column/struct-field means *the property is absent*
  (so ``required`` fails on NULL, and value keywords are vacuously true —
  matching how the reference skips keywords for absent properties).
  A NULL *array element* is a JSON ``null`` value (present, type null).
- Instance types are static: the DataFrame schema decides them at compile
  time, so the reference's per-value ``get_type`` checks
  (Utilities.pm:104-164) constant-fold.  The one runtime case kept:
  ``type: integer`` on a fractional column checks ``x == floor(x)``
  (integer ⊂ number, and 2.0 is an integer — Utilities.pm:152-156).
- Error message templates mirror the reference's E() call sites
  (V/Validation.pm, V/Applicator.pm) so violation rows are comparable.
- Regex dialect (documented deviation, mirroring the reference's own
  ECMA-262 deviations — t/zzz-acceptance-draft2020-12.t:49-63): data-plane
  matching (`pattern`, `format`, map-column `patternProperties` /
  `propertyNames`) uses JAVA regex via rlike; compile-time property-name
  matching on struct targets (`patternProperties` / `additionalProperties`
  complement over statically-known field names) uses PYTHON re.  The two
  dialects agree on the common subset (literals, classes, anchors,
  quantifiers, alternation); schemas relying on dialect-specific syntax
  (inline flags, \\p classes, lookbehind variants) may behave differently
  between a struct-typed and a map-typed object column.

Violation rows carry the same three location fields the reference's
ResultNode does (ResultNode.pm:27-96): instance_location (JSON pointer into
the row), keyword_location (pointer through the schema *as evaluated*,
including $ref hops), absolute_keyword_location (canonical URI).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_modern_spark.functions.formats import format_predicate
from json_schema_modern_spark.spec.resolver import (
    SchemaRegistry,
    SpecError,
    json_pointer_escape,
    spec_fingerprint,
)

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("instance_location", T.StringType()),
        T.StructField("keyword_location", T.StringType()),
        T.StructField("absolute_keyword_location", T.StringType()),
        T.StructField("keyword", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("offending_value", T.StringType()),
    ]
)
_VIOL_ARR = T.ArrayType(VIOLATION_SCHEMA)


def _empty_viols() -> Column:
    return F.lit([]).cast(_VIOL_ARR)


@dataclass
class CompileOptions:
    validate_formats: bool = False
    # assert contentEncoding/contentMediaType/contentSchema instead of
    # treating them as annotations (reference: validate_content_schemas,
    # Modern.pm:87-93 / V/Content.pm:42-114)
    validate_content_schemas: bool = False
    # compare number-looking strings numerically for range keywords
    # (reference: stringy_numbers, U.pm:255-261); off by default
    stringy_numbers: bool = False
    # reject schemas containing keywords this engine doesn't recognize
    # (reference: `strict` evaluator option, Modern.pm:104,817-820); off by
    # default — unknown keywords are ignored like annotations
    strict: bool = False
    # collect MetaData annotations (title/description/default/...) so
    # basic_output can report them for valid rows (reference:
    # collect_annotations, Modern.pm:104; annotations from failed
    # subschemas are discarded via per-entry guards).  Off by default,
    # like the reference.
    collect_annotations: bool = False
    # contract flag: array columns contain no null elements (the token-table
    # input_hint guarantees this by construction).  Spark file sources force
    # every schema nullable on read, so this cannot be derived from the
    # DataFrame; when set, the items fast path drops its per-element null
    # conjunct — whose array_compact expansion is a higher-order filter()
    # that de-vectorizes the whole Filter operator.  Off by default:
    # unknown-provenance data keeps the exact null-aware path.
    assume_dense_arrays: bool = False
    max_depth: int = 64          # reference default is 50 (Modern.pm:76-80)
    collect_leaf_errors: bool = True
    # per-keyword compile callbacks (reference: evaluation callbacks,
    # Modern.pm:652-663 / t/callbacks.t).  keyword -> fn(keyword, kloc,
    # akloc, value), fired once per (keyword, traversed location) the
    # compiler processes — including locations reached through $ref /
    # $dynamicRef hops, whose kloc carries the "/$ref" segment, so
    # coverage/telemetry tooling built on the reference's callback seam
    # has the same per-keyword visibility here.  In a set-oriented engine
    # the per-INSTANCE callback has no analogue (keywords evaluate once
    # per column, not once per row); the per-keyword-per-location compile
    # walk is the faithful projection.  The row tier (pyeval) keeps the
    # reference's full per-instance callback semantics.
    callbacks: dict | None = None


@dataclass
class SetCheck:
    """A cross-row check lifted out of the row-local plan (x-* keywords)."""

    kind: str                    # 'unique' | 'ref' | 'drift'
    keyword_location: str
    params: dict[str, Any]


@dataclass
class Compiled:
    ok: Column
    viols: list[Column] = dc_field(default_factory=list)
    # Static coverage annotations for unevaluatedItems/Properties
    # (SURVEY.md §2.4: compile-time coverage analysis replaces the
    # reference's runtime annotation collection, V/Unevaluated.pm:41-144).
    # Entries: (guard, payload) — guard None = unconditional; payload for
    # names: frozenset[str] | "all"; for items: int prefix length | "all".
    cov_names: list = dc_field(default_factory=list)
    cov_items: list = dc_field(default_factory=list)


# --- targets ---------------------------------------------------------------


_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_INT64_MIN, _INT64_MAX = -(2 ** 63), 2 ** 63 - 1


def _num_lit(v):
    """Literal for a schema-supplied number.  Out-of-int64 integers (the
    reference's integers corpus exercises ±2^63±1, which its bignum layer
    handles exactly — Modern.pm uses Math::BigInt) can't ship over py4j as
    longs; they become exact decimal literals (≤38 digits) or, beyond
    decimal range, the nearest double."""
    if isinstance(v, int) and not isinstance(v, bool) \
            and not (_INT64_MIN <= v <= _INT64_MAX):
        from decimal import Decimal
        if abs(v) < 10 ** 38:
            return F.lit(Decimal(v))
        return F.lit(float(v))
    return F.lit(v)



def _json_type_of(dtype: T.DataType) -> str:
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, _INTEGRAL_TYPES):
        return "integer"
    if isinstance(dtype, _NUMERIC_TYPES):
        return "number"
    if isinstance(dtype, (T.DateType, T.TimestampType, T.BinaryType)):
        return "string"  # serialized forms; length/pattern apply post-cast
    raise SpecError(f"unsupported column type for validation: {dtype}")


@dataclass
class Target:
    """A JSON value located somewhere in the row."""

    col: Column | None           # None only for the virtual root object
    dtype: T.DataType | None     # None only for the virtual root object
    ptr: Column                  # instance_location (string column)
    present: Column              # is the value present (non-NULL / row root)
    root_schema: T.StructType | None = None   # set for the virtual root
    # False for targets whose ptr/col reference higher-order-function
    # lambda variables (array elements inside forall/transform, map
    # entries): annotation entries cannot be lifted out of a lambda.
    annotatable: bool = True
    # True for array-element / map-value targets, where a SQL NULL is a
    # PRESENT JSON null (type "null") rather than an absent property.
    # Keyword predicates must then be total: type-gated keywords are
    # vacuously true on null, enum/const/type handle null explicitly —
    # otherwise three-valued SQL NULL would leak into the plan's validity.
    null_is_value: bool = False

    @property
    def is_root(self) -> bool:
        return self.root_schema is not None

    def json_type(self) -> str:
        return "object" if self.is_root else _json_type_of(self.dtype)

    def field_names(self) -> list[str]:
        if self.is_root:
            return [f.name for f in self.root_schema.fields]
        if isinstance(self.dtype, T.StructType):
            return [f.name for f in self.dtype.fields]
        return []

    def get_property(self, name: str) -> "Target | None":
        """Child target for a named property; None if statically absent."""
        if self.is_root:
            if name not in self.root_schema.fieldNames():
                return None
            f = self.root_schema[name]
            col = F.col("`" + name.replace("`", "``") + "`")
            return Target(
                col=col, dtype=f.dataType,
                ptr=F.concat(self.ptr, F.lit("/" + json_pointer_escape(name))),
                present=col.isNotNull(),
            )
        if isinstance(self.dtype, T.StructType):
            if name not in self.dtype.fieldNames():
                return None
            f = self.dtype[name]
            col = self.col.getField(name)
            return Target(
                col=col, dtype=f.dataType,
                ptr=F.concat(self.ptr, F.lit("/" + json_pointer_escape(name))),
                present=self.present & col.isNotNull(),
            )
        return None

    def value_col(self) -> Column:
        """The value as a comparable/printable column."""
        if self.is_root:
            raise SpecError("root object has no single value column")
        return self.col

    def offending_json(self) -> Column:
        if self.is_root:
            return F.lit("{...row...}")
        if isinstance(self.dtype, (T.StructType, T.ArrayType, T.MapType)):
            return F.to_json(self.col)
        return self.col.cast("string")


# --- the compiler ----------------------------------------------------------

_APPLY_TO = {
    # keyword → set of json types it asserts on (vacuous elsewhere);
    # mirrors the `return 1 if not is_type(...)` guards in V/Validation.pm
    "multipleOf": {"number", "integer"},
    "maximum": {"number", "integer"},
    "exclusiveMaximum": {"number", "integer"},
    "minimum": {"number", "integer"},
    "exclusiveMinimum": {"number", "integer"},
    "maxLength": {"string"},
    "minLength": {"string"},
    "pattern": {"string"},
    "format": {"string"},
    "maxItems": {"array"},
    "minItems": {"array"},
    "uniqueItems": {"array"},
    "items": {"array"},
    "prefixItems": {"array"},
    "contains": {"array"},
    "unevaluatedItems": {"array"},
    "maxProperties": {"object"},
    "minProperties": {"object"},
    "required": {"object"},
    "dependentRequired": {"object"},
    "dependencies": {"object"},
    "dependentSchemas": {"object"},
    "properties": {"object"},
    "patternProperties": {"object"},
    "additionalProperties": {"object"},
    "propertyNames": {"object"},
    "unevaluatedProperties": {"object"},
}

_METADATA_KEYWORDS = {
    "title", "description", "default", "deprecated", "readOnly", "writeOnly",
    "examples", "$comment", "$defs", "definitions", "$anchor",
    "$dynamicAnchor", "$recursiveAnchor", "$vocabulary", "$schema", "$id",
    "format_annotation",
    "contentEncoding", "contentMediaType", "contentSchema",
}

# $schema URI → dialect tag (V/Core.pm:134-196 dialect dispatch; the
# engine compiles every dialect with the same keyword set except the
# differences below: array-form items/additionalItems allowed ≤2019-09,
# draft4 boolean exclusiveMaximum/Minimum, $recursiveRef in 2019-09)
_DIALECT_URIS = {
    "https://json-schema.org/draft/2020-12/schema": "2020-12",
    "https://json-schema.org/draft/2019-09/schema": "2019-09",
    "http://json-schema.org/draft-07/schema": "7",
    "http://json-schema.org/draft-06/schema": "6",
    "http://json-schema.org/draft-04/schema": "4",
}


def _detect_dialect(spec: Any) -> str:
    if not isinstance(spec, dict) or "$schema" not in spec:
        return "2020-12"
    uri = str(spec["$schema"]).rstrip("#")
    if uri not in _DIALECT_URIS:
        raise SpecError(f'EXCEPTION: unknown $schema dialect "{spec["$schema"]}"')
    return _DIALECT_URIS[uri]


# vocabularies this engine implements (V/Core.pm:363-395 semantics: a
# REQUIRED vocabulary the evaluator doesn't know must abort compilation;
# optional unknown vocabularies are ignored)
_KNOWN_VOCAB_URIS = {
    f"https://json-schema.org/draft/{d}/vocab/{v}"
    for d in ("2020-12", "2019-09")
    for v in ("core", "applicator", "unevaluated", "validation",
              "meta-data", "format-annotation", "format-assertion",
              "format", "content")
}


def _check_vocabulary(spec: Any) -> None:
    if not isinstance(spec, dict) or "$vocabulary" not in spec:
        return
    vocab = spec["$vocabulary"]
    if not isinstance(vocab, dict) or not all(
            isinstance(v, bool) for v in vocab.values()):
        raise SpecError('"$vocabulary" value must be an object of boolean values')
    from json_schema_modern_spark.spec.vocabulary import registered_uris

    for uri, required in vocab.items():
        if required and uri not in _KNOWN_VOCAB_URIS \
                and uri not in registered_uris():
            raise SpecError(
                f'EXCEPTION: required vocabulary "{uri}" is not supported')


def _shape_check(schema: dict, kloc: str, dialect: str) -> None:
    """Traverse-phase keyword type checks (the reference's
    assert_keyword_type layer, U.pm:866-869 / V/Validation.pm traverse
    subs): malformed specs fail compilation with the reference's message
    shape instead of surfacing as downstream expression errors."""
    def err(kw: str, what: str) -> None:
        n = "n" if what[0] in "aeiou" else ""
        raise SpecError(f"{kw} value is not a{n} {what}"
                        + (f" (at {kloc})" if kloc else ""))

    def is_num(v) -> bool:
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    for kw in ("maximum", "minimum", "exclusiveMaximum", "exclusiveMinimum"):
        v = schema.get(kw)
        if v is None:
            continue
        if isinstance(v, bool):
            if dialect != "4" or kw in ("maximum", "minimum"):
                err(kw, "number")
        elif not is_num(v):
            err(kw, "number")
    for kw in ("maxLength", "minLength", "maxItems", "minItems",
               "maxProperties", "minProperties", "maxContains", "minContains"):
        if kw in schema and (not isinstance(schema[kw], int)
                             or isinstance(schema[kw], bool) or schema[kw] < 0):
            err(kw, "non-negative integer")
    for kw in ("pattern", "format", "contentEncoding", "contentMediaType",
               "$ref", "$dynamicRef", "$anchor", "$dynamicAnchor"):
        if kw in schema and not isinstance(schema[kw], str):
            err(kw, "string")
    if "enum" in schema and not isinstance(schema["enum"], list):
        err("enum", "array")
    if "uniqueItems" in schema and not isinstance(schema["uniqueItems"], bool):
        err("uniqueItems", "boolean")
    if "required" in schema and (not isinstance(schema["required"], list)
                                 or any(not isinstance(x, str) for x in schema["required"])):
        err("required", "array of strings")
    if "dependentRequired" in schema and (
            not isinstance(schema["dependentRequired"], dict)
            or any(not isinstance(v, list)
                   or any(not isinstance(x, str) for x in v)
                   for v in schema["dependentRequired"].values())):
        err("dependentRequired", "object of arrays of strings")
    for kw in ("properties", "patternProperties", "dependentSchemas",
               "$defs", "definitions"):
        if kw in schema and not isinstance(schema[kw], dict):
            err(kw, "object")
    for kw in ("allOf", "anyOf", "oneOf"):
        if kw in schema and (not isinstance(schema[kw], list) or not schema[kw]):
            err(kw, "non-empty array")
    if "prefixItems" in schema and (not isinstance(schema["prefixItems"], list)
                                    or not schema["prefixItems"]):
        err("prefixItems", "non-empty array")


# every keyword the compiler dispatches (strict-mode vocabulary)
_KNOWN_KEYWORDS = (
    set(_APPLY_TO) | _METADATA_KEYWORDS | {
        "$ref", "$dynamicRef", "$recursiveRef", "type", "enum", "const",
        "multipleOf", "maximum", "exclusiveMaximum", "minimum",
        "exclusiveMinimum", "maxLength", "minLength", "pattern",
        "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
        "maxContains", "minContains", "additionalItems",
        "id",  # draft4 base-URI declaration (pre-$id spelling)
        "x-unique", "x-ref", "x-drift",
    }
)


class _Ctx:
    def __init__(self, registry: SchemaRegistry, options: CompileOptions):
        self.registry = registry
        self.options = options
        self.set_checks: list[SetCheck] = []
        self.depth = 0
        # compile-time dynamic scope: the chain of schema resources entered
        # while expanding, outermost first.  Because the compiler INLINES
        # subschemas, this chain at each $dynamicRef site is exactly the
        # runtime dynamic scope the reference maintains (Modern.pm
        # dynamic_scope pushes, Vocabulary.pm:76-94) — so dynamic-anchor
        # resolution here is fully faithful, not a static approximation.
        self.dynamic_scope: list[str] = []
        # collected MetaData annotations (collect_annotations):
        # dicts {ptr: Column, kloc, akloc, keyword, value, guard: Column|None}
        self.annotations: list[dict] = []
        # unresolvable-reference exception nodes recorded during compile
        # ("<kloc>/<kw>: <message>"): data rows hit them lazily (see
        # ref_exception), but spec-checking flows (CLI --check-only)
        # surface them eagerly like the reference's traverse phase would
        self.static_exceptions: list[str] = []


def _match_any_key(patterns: list):
    """Arity-1 key selector for F.filter: key matches ANY of `patterns`
    (explicit closure — Spark higher-order lambdas must not carry default
    args)."""
    def sel(k: Column) -> Column:
        cond = F.lit(False)
        for p in patterns:
            cond = cond | k.rlike(p)
        return cond
    return sel


def _unmatched_key(names: list, patterns: list):
    """Arity-1 key selector: key matched by NEITHER the literal name set
    nor any pattern (the additionalProperties complement)."""
    def sel(k: Column) -> Column:
        cond = F.lit(True)
        if names:
            cond = cond & ~k.isin(names)
        for p in patterns:
            cond = cond & ~k.rlike(p)
        return cond
    return sel


def _num_str(v: Any) -> str:
    """Format a schema number the way the reference's sprintf_num does."""
    if isinstance(v, bool):
        return json.dumps(v)
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return str(v)


def _viol(
    ok: Column, ptr: Column, kloc: str, akloc: str, keyword: str,
    error: Column | str, offending: Column,
) -> Column:
    err = F.lit(error) if isinstance(error, str) else error
    return F.when(ok, _empty_viols()).otherwise(
        F.array(
            F.struct(
                ptr.cast("string").alias("instance_location"),
                F.lit(kloc).alias("keyword_location"),
                F.lit(akloc).alias("absolute_keyword_location"),
                F.lit(keyword).alias("keyword"),
                err.alias("error"),
                offending.cast("string").alias("offending_value"),
            )
        )
    )


def _merge_viols(cols: list[Column]) -> Column:
    if not cols:
        return _empty_viols()
    if len(cols) == 1:
        return cols[0]
    return F.flatten(F.array(*cols))


def _ptr_escape_col(k: Column) -> Column:
    """JSON-pointer escape of a runtime string (RFC6901: ~ → ~0, / → ~1)."""
    return F.regexp_replace(F.regexp_replace(k, "~", "~0"), "/", "~1")


def _name_covered(name: str, payload) -> bool:
    """Static name-coverage test for struct targets (cov_names payloads:
    frozenset of names | "all" | ("pat", regex))."""
    if payload == "all":
        return True
    if isinstance(payload, tuple) and payload[0] == "pat":
        return re.search(payload[1], name) is not None
    return name in payload


def _const_eq(col: Column, v: Any, dtype: T.DataType) -> Column | None:
    """Deep type-strict equality of a column value with a schema constant
    (is_equal semantics, U.pm:242-299: order-insensitive objects,
    order-sensitive arrays, booleans ≠ numbers ≠ strings).  None = the
    constant can never equal a value of this type (statically false);
    nested impossibilities collapse to lit(False).  May yield SQL NULL on
    NULL inputs — callers coalesce."""
    jt = _json_type_of(dtype)
    if isinstance(v, bool):
        return (col == F.lit(v)) if jt == "boolean" else None
    if isinstance(v, (int, float)):
        if jt in ("integer", "number"):
            if jt == "integer" and isinstance(v, float) and v != int(v):
                return None
            if isinstance(v, int) and not (_INT64_MIN <= v <= _INT64_MAX):
                # an int64-decoded column can never hold this constant; a
                # double column compares against the nearest double
                if isinstance(dtype, _INTEGRAL_TYPES):
                    return None
                return col == F.lit(float(v))
            return col == F.lit(v).cast(dtype)
        return None
    if isinstance(v, str):
        return (col == F.lit(v)) if jt == "string" else None
    if v is None:
        return None          # null members handled by the null_is_value path
    if isinstance(v, list) and isinstance(dtype, T.ArrayType):
        conds = [F.size(col) == len(v)]
        for i, x in enumerate(v):
            e = F.element_at(col, i + 1)
            if x is None:
                conds.append(e.isNull())
                continue
            ee = _const_eq(e, x, dtype.elementType)
            conds.append(F.coalesce(ee, F.lit(False)) if ee is not None
                         else F.lit(False))
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if isinstance(v, dict) and isinstance(dtype, T.StructType):
        if set(v) - set(dtype.fieldNames()):
            return F.lit(False)      # constant has a key the type can't hold
        conds = []
        for f in dtype.fields:
            fv = col.getField(f.name)
            if f.name not in v:
                conds.append(fv.isNull())    # absent in const ⇒ absent here
            elif v[f.name] is None:
                conds.append(fv.isNull())
            else:
                ee = _const_eq(fv, v[f.name], f.dataType)
                conds.append(F.coalesce(ee, F.lit(False)) if ee is not None
                             else F.lit(False))
        out = F.lit(True)
        for c in conds:
            out = out & c
        return out
    if isinstance(v, dict) and isinstance(dtype, T.MapType):
        conds = [F.size(col) == len(v)]
        for k, x in v.items():
            conds.append(F.map_contains_key(col, F.lit(k)))
            e = F.element_at(col, F.lit(k))
            if x is None:
                conds.append(F.map_contains_key(col, F.lit(k)) & e.isNull())
            else:
                ee = _const_eq(e, x, dtype.valueType)
                conds.append(F.coalesce(ee, F.lit(False)) if ee is not None
                             else F.lit(False))
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    return None


def _lit_value(v: Any, dtype: T.DataType) -> Column | None:
    """Literal for enum/const comparison against a column of ``dtype``;
    None when the schema value can never equal a value of this type
    (type-strict equality — Utilities.pm:242-299)."""
    jt = _json_type_of(dtype)
    if isinstance(v, bool):
        return F.lit(v) if jt == "boolean" else None
    if isinstance(v, (int, float)):
        if jt in ("integer", "number"):
            if jt == "integer" and isinstance(v, float) and v != int(v):
                return None
            return F.lit(v).cast(dtype)
        return None
    if isinstance(v, str):
        return F.lit(v) if jt == "string" else None
    if v is None:
        return None  # present values are never JSON null under our mapping
    if isinstance(v, list) and isinstance(dtype, T.ArrayType):
        elems = [_lit_value(x, dtype.elementType) for x in v]
        if any(e is None for e in elems):
            return None
        return F.array(*elems).cast(dtype)
    return None


class ColumnCompiler:
    """Compiles one schema document against one DataFrame schema."""

    def __init__(
        self,
        spec: Any,
        df_schema: T.StructType,
        options: CompileOptions | None = None,
        registry: SchemaRegistry | None = None,
    ):
        self.options = options or CompileOptions()
        self.registry = registry or SchemaRegistry()
        self.dialect = _detect_dialect(spec)
        _check_vocabulary(spec)
        self.root_uri = self.registry.add_schema(
            spec, "", dialect=self.dialect)
        self.spec = spec
        self.df_schema = df_schema
        self.ctx = _Ctx(self.registry, self.options)
        self._deps_dispatch = False
        self.fingerprint = spec_fingerprint(spec)

    def compile(self) -> "CompiledPlan":
        root_target = Target(
            col=None, dtype=None, ptr=F.lit(""), present=F.lit(True),
            root_schema=self.df_schema,
        )
        compiled = self._node(self.spec, root_target, kloc="", base=self.root_uri, abs_ptr="")
        return CompiledPlan(
            ok=compiled.ok,
            viols=_merge_viols(compiled.viols),
            set_checks=self.ctx.set_checks,
            fingerprint=self.fingerprint,
            root_uri=self.root_uri,
            annotations=self.ctx.annotations,
            static_exceptions=self.ctx.static_exceptions,
        )

    # -- node dispatch ------------------------------------------------------

    def _node(self, schema: Any, t: Target, kloc: str, base: str, abs_ptr: str) -> Compiled:
        self.ctx.depth += 1
        try:
            if self.ctx.depth > self.options.max_depth:
                raise SpecError(
                    f"EXCEPTION: maximum evaluation depth {self.options.max_depth} exceeded"
                )
            if schema is True or schema == {}:
                return Compiled(ok=F.lit(True))
            if schema is False:
                akloc = self._akloc(base, abs_ptr)
                ok = ~t.present
                off = t.offending_json() if not t.is_root else F.lit("{...row...}")
                return Compiled(ok=ok, viols=[_viol(ok, t.ptr, kloc, akloc, "", "subschema is false", off)])
            if not isinstance(schema, dict):
                raise SpecError(f"invalid subschema at {kloc or '/'}")
            return self._object_schema(schema, t, kloc, base, abs_ptr)
        finally:
            self.ctx.depth -= 1

    def _akloc(self, base: str, abs_ptr: str) -> str:
        if not base:
            return abs_ptr or ""
        return f"{base}#{abs_ptr}" if abs_ptr else base

    def _object_schema(self, schema: dict, t: Target, kloc: str, base: str, abs_ptr: str) -> Compiled:
        _shape_check(schema, kloc, self.dialect)
        if isinstance(schema.get("$schema"), str):
            # a resource root reached via $ref may name a CUSTOM metaschema
            # (registered as another document); its $vocabulary must be
            # well-formed for this dialect — unresolvable or invalid
            # metaschemas abort compilation (vocabulary.json semantics,
            # shared check with the pyeval tier)
            from json_schema_modern_spark.spec.resolver import metaschema_error

            _ms_err = metaschema_error(
                self.registry, self.dialect, schema["$schema"], base)
            if _ms_err:
                raise SpecError(_ms_err)
        if self.options.strict:
            from json_schema_modern_spark.spec.vocabulary import (
                registered_keywords,
            )

            custom_kws = registered_keywords()
            unknown = sorted(k for k in schema
                             if k not in _KNOWN_KEYWORDS and not k.startswith("x-")
                             and k not in custom_kws)
            if unknown:
                # reference strict mode (Modern.pm:817-820)
                raise SpecError(
                    f"unknown keyword{'s' if len(unknown) > 1 else ''} seen in "
                    f"schema: {', '.join(unknown)}")
        if self.options.callbacks:
            for kw, cb in self.options.callbacks.items():
                if kw in schema:
                    ke = json_pointer_escape(kw)
                    cb(kw, f"{kloc}/{ke}",
                       self._akloc(base, f"{abs_ptr}/{ke}"), schema[kw])
        # track $id scope changes for absolute keyword locations / ref bases
        if "$id" in schema:
            res = None
            try:
                res = self.registry.resolve(schema["$id"], base)
            except SpecError:
                pass
            if res is not None and res.node is schema:
                base, abs_ptr = res.canonical_uri, ""

        scope_pushed = False
        if not self.ctx.dynamic_scope or self.ctx.dynamic_scope[-1] != base:
            self.ctx.dynamic_scope.append(base)
            scope_pushed = True
        try:
            return self._object_schema_body(schema, t, kloc, base, abs_ptr)
        finally:
            if scope_pushed:
                self.ctx.dynamic_scope.pop()

    def _object_schema_body(self, schema: dict, t: Target, kloc: str,
                            base: str, abs_ptr: str) -> Compiled:
        oks: list[Column] = []
        viols: list[Column] = []
        jt = t.json_type()

        if self.options.collect_annotations and t.annotatable:
            # MetaData annotations (V/MetaData.pm:42-77) recorded with
            # per-entry guards; basic_output reports them for VALID rows,
            # where every unconditional-path subschema succeeded — so only
            # branch applicators (anyOf/oneOf/not/if, dependentSchemas
            # presence) need runtime guards, applied below
            for _akw in ("title", "description", "default", "deprecated",
                         "readOnly", "writeOnly", "examples"):
                if _akw in schema:
                    self.ctx.annotations.append({
                        "ptr": t.ptr, "kloc": f"{kloc}/{_akw}",
                        "akloc": self._akloc(base, f"{abs_ptr}/{_akw}"),
                        "keyword": _akw, "value": schema[_akw], "guard": None})

        cov_names: list = []
        cov_items: list = []
        # per-entry predicates from map-object keywords on THIS node's
        # target, fused into one forall at the end (see _map_props_kw)
        map_fuse: list = []

        def add(c: Compiled) -> None:
            oks.append(c.ok)
            viols.extend(c.viols)

        def adopt(c: Compiled, guard: Column | None) -> None:
            """Propagate a same-instance child's coverage annotations,
            conditioned on the child actually succeeding (annotations from
            failed subschemas are discarded — U.pm:823-829 semantics)."""
            for g, payload in c.cov_names:
                gg = guard if g is None else (g if guard is None else guard & g)
                cov_names.append((gg, payload))
            for g, payload in c.cov_items:
                gg = guard if g is None else (g if guard is None else guard & g)
                cov_items.append((gg, payload))

        def sub(kw: str, node: Any, target: Target, suffix: str = "") -> Compiled:
            kp = f"{kloc}/{json_pointer_escape(kw)}{suffix}"
            ap = f"{abs_ptr}/{json_pointer_escape(kw)}{suffix}"
            return self._node(node, target, kp, base, ap)

        def E(kw: str, ok: Column, error: Column | str, off: Column | None = None,
              suffix: str = "", null_vacuous: bool = True) -> Compiled:
            kp = f"{kloc}/{json_pointer_escape(kw)}{suffix}"
            ap = f"{abs_ptr}/{json_pointer_escape(kw)}{suffix}"
            offending = off if off is not None else (
                t.offending_json() if not t.is_root else F.lit(None).cast("string")
            )
            if t.null_is_value and null_vacuous:
                # JSON-null value: type-gated keywords are vacuously true
                # (the reference skips keywords whose type doesn't match);
                # keeps the predicate total — no three-valued NULL leaks
                ok = F.when(t.value_col().isNull(), F.lit(True)).otherwise(ok)
            ok = F.when(t.present, ok).otherwise(F.lit(True))
            return Compiled(ok=ok, viols=[_viol(ok, t.ptr, kp, self._akloc(base, ap), kw, error, offending)])

        def applies(kw: str) -> bool:
            want = _APPLY_TO.get(kw)
            return want is None or jt in want or (jt == "integer" and "number" in want)

        def ref_exception(kw: str, msg: str) -> Compiled:
            """Lazy-resolution parity (Modern.pm evaluates $ref on reach;
            pyeval raises EvalError at eval time): a reference that fails
            to RESOLVE compiles to a statically-false node instead of
            aborting compilation, so rows that never consult this branch
            (if:false/then, untaken anyOf arms) stay valid — the corpus's
            badRef "good references in schemas" contract.  Granularity
            deviation vs the reference (whole-evaluation abort when
            reached) is recorded in docs/DEVIATIONS.md."""
            self.ctx.static_exceptions.append(f"{kloc}/{kw}: {msg}")
            ok = ~t.present
            off = t.offending_json() if not t.is_root else F.lit(None).cast("string")
            return Compiled(ok=ok, viols=[_viol(
                ok, t.ptr, f"{kloc}/{kw}", self._akloc(base, f"{abs_ptr}/{kw}"),
                kw, f"EXCEPTION: {msg}", off)])

        # ---- Core: $ref / $dynamicRef ------------------------------------
        if "$ref" in schema:
            try:
                res = self.registry.resolve(schema["$ref"], base)
            except SpecError as exc:
                res, child = None, ref_exception("$ref", str(exc))
            if res is not None:
                child = self._node(
                    res.node, t, kloc=f"{kloc}/$ref", base=res.base_uri,
                    abs_ptr=res.pointer if res.canonical_uri == res.base_uri else "",
                )
            add(child)
            adopt(child, child.ok)
            if self.dialect in ("4", "6", "7"):
                # drafts 4-7: $ref MASKS every sibling keyword — the ref
                # target is the whole schema (V/Core.pm draft≤7 dispatch)
                return Compiled(ok=child.ok, viols=viols,
                                cov_names=cov_names, cov_items=cov_items)
        if "$dynamicRef" in schema and self.dialect == "2020-12":
            # full dynamic-scope semantics (V/Core.pm:327-361): resolve
            # like $ref first; if the landing spot carries the matching
            # $dynamicAnchor, re-resolve through the dynamic scope with the
            # OUTERMOST declaration winning.  The compiler's inlining chain
            # is the runtime dynamic scope, so this is exact.  In earlier
            # dialects $dynamicRef is an unknown keyword and is ignored
            # (the unknownKeyword corpus).
            from urllib.parse import urldefrag, urljoin

            ref = schema["$dynamicRef"]
            try:
                res = self.registry.resolve(ref, base)
            except SpecError as exc:
                res, child = None, ref_exception("$dynamicRef", str(exc))
            if res is not None:
                _, frag = urldefrag(urljoin(base, ref))
                if frag and not frag.startswith("/") and isinstance(res.node, dict) \
                        and res.node.get("$dynamicAnchor") == frag:
                    dyn = self.registry.resolve_dynamic(frag, self.ctx.dynamic_scope)
                    if dyn is not None:
                        res = dyn
                child = self._node(res.node, t, kloc=f"{kloc}/$dynamicRef", base=res.base_uri, abs_ptr="")
            add(child)
            adopt(child, child.ok)
        if "$recursiveRef" in schema and self.dialect == "2019-09":
            # 2019-09 predecessor (V/Core.pm:262-279): resolve statically
            # like $ref (ANY URI value — the recursive-dynamic corpus
            # points one at a boolean schema); ONLY if the landing spot
            # declares $recursiveAnchor:true does the ref re-resolve
            # against the OUTERMOST in-scope resource declaring a
            # recursive anchor.  Other dialects ignore it as unknown.
            ref = schema["$recursiveRef"]
            try:
                res = self.registry.resolve(ref, base)
                if isinstance(res.node, dict) \
                        and res.node.get("$recursiveAnchor") is True:
                    for outer in self.ctx.dynamic_scope:
                        if outer in self.registry.recursive_anchors:
                            res = self.registry.resolve(ref, outer)
                            break
            except SpecError as exc:
                res, child = None, ref_exception("$recursiveRef", str(exc))
            if res is not None:
                child = self._node(res.node, t, kloc=f"{kloc}/$recursiveRef",
                                   base=res.base_uri, abs_ptr="")
            add(child)
            adopt(child, child.ok)

        # ---- Validation vocabulary ---------------------------------------
        if "type" in schema:
            add(self._type_kw(schema["type"], t, E))

        if "enum" in schema and not t.is_root:
            eqs = [c for c in (_const_eq(t.value_col(), v, t.dtype)
                               for v in schema["enum"]) if c is not None]
            ok = F.lit(False)
            for c in eqs:
                ok = ok | F.coalesce(c, F.lit(False))
            if t.null_is_value:
                # type-strict equality: JSON null matches only a null member
                null_ok = F.lit(any(v is None for v in schema["enum"]))
                ok = F.when(t.value_col().isNull(), null_ok).otherwise(ok)
            add(E("enum", ok, "value does not match", null_vacuous=False))
        if "const" in schema and not t.is_root:
            c = _const_eq(t.value_col(), schema["const"], t.dtype)
            ok = F.lit(False) if c is None else F.coalesce(c, F.lit(False))
            if t.null_is_value:
                ok = F.when(t.value_col().isNull(),
                            F.lit(schema["const"] is None)).otherwise(ok)
            add(E("const", ok, "value does not match", null_vacuous=False))

        if "multipleOf" in schema and applies("multipleOf"):
            m = schema["multipleOf"]
            if not isinstance(m, (int, float)) or isinstance(m, bool) or m <= 0:
                raise SpecError("multipleOf value is not a positive number")
            v = t.value_col()
            if isinstance(t.dtype, _INTEGRAL_TYPES) and float(m).is_integer():
                ok = (v % _num_lit(int(m))) == 0
            else:
                # bignum-exact float modulo (V/Validation.pm:119-123) →
                # fixed-point decimal pmod; exact within 38 digits
                dec = "decimal(38,12)"
                ok = F.pmod(v.cast(dec), _num_lit(m).cast(dec)) == F.lit(0).cast(dec)
            add(E("multipleOf", ok, f"value is not a multiple of {_num_str(m)}"))
        elif "multipleOf" in schema and self.options.stringy_numbers and jt == "string":
            # stringy_numbers applies to ALL numeric keywords (U.pm:255-261),
            # multipleOf included; a non-numeric string stays vacuously valid
            m = schema["multipleOf"]
            if not isinstance(m, (int, float)) or isinstance(m, bool) or m <= 0:
                raise SpecError("multipleOf value is not a positive number")
            dec = "decimal(38,12)"
            v = t.value_col().cast("string").try_cast(dec)
            ok = F.when(v.isNull(), F.lit(True)).otherwise(
                F.pmod(v, F.lit(m).cast(dec)) == F.lit(0).cast(dec))
            add(E("multipleOf", ok, f"value is not a multiple of {_num_str(m)}"))

        # draft4 couples exclusiveMaximum/Minimum as BOOLEANS modifying
        # maximum/minimum (V/Validation.pm:129-143); detect that form and
        # fold it into the base keyword's comparison
        d4_ex_max = self.dialect == "4" and schema.get("exclusiveMaximum") is True
        d4_ex_min = self.dialect == "4" and schema.get("exclusiveMinimum") is True
        for kw, op, msg in (
            ("maximum", "le", "value is greater than %s"),
            ("exclusiveMaximum", "lt", "value is greater than or equal to %s"),
            ("minimum", "ge", "value is less than %s"),
            ("exclusiveMinimum", "gt", "value is less than or equal to %s"),
        ):
            if kw in schema and isinstance(schema[kw], bool):
                if self.dialect != "4" or kw not in ("exclusiveMaximum", "exclusiveMinimum"):
                    raise SpecError(f"{kw} value is not a number")
                continue                 # draft4 boolean form — folded below
            if kw == "maximum" and d4_ex_max:
                op, msg = "lt", "value is greater than or equal to %s"
            if kw == "minimum" and d4_ex_min:
                op, msg = "gt", "value is less than or equal to %s"
            if kw in schema and applies(kw):
                b = _num_lit(schema[kw])
                v = t.value_col()
                ok = {"le": v <= b, "lt": v < b, "ge": v >= b, "gt": v > b}[op]
                add(E(kw, ok, msg % _num_str(schema[kw])))
            elif kw in schema and self.options.stringy_numbers and jt == "string":
                # optional coercion: number-looking strings compared
                # numerically (U.pm:255-261, V/Validation.pm:74-75); a
                # non-numeric string stays vacuously valid (not a number)
                b = _num_lit(schema[kw])
                v = t.value_col().cast("string").try_cast("double")
                cmp = {"le": v <= b, "lt": v < b, "ge": v >= b, "gt": v > b}[op]
                add(E(kw, F.when(v.isNull(), F.lit(True)).otherwise(cmp),
                      msg % _num_str(schema[kw])))

        if "maxLength" in schema and applies("maxLength"):
            n = schema["maxLength"]
            add(E("maxLength", F.length(t.value_col().cast("string")) <= n, f"length is greater than {n}"))
        if "minLength" in schema and applies("minLength"):
            n = schema["minLength"]
            add(E("minLength", F.length(t.value_col().cast("string")) >= n, f"length is less than {n}"))
        if "pattern" in schema and applies("pattern"):
            # partial match, like the reference's =~ (V/Validation.pm:217-228);
            # Java regex dialect — same deviation class the reference accepts
            # vs ECMA-262 (t/zzz-acceptance-draft2020-12.t:54-60)
            add(E("pattern", t.value_col().cast("string").rlike(schema["pattern"]), "pattern does not match"))

        # ---- content vocabulary (assertion mode only; annotation-only by
        # default per 2020-12 — V/Content.pm:42-114, Modern.pm:87-93) ------
        if self.options.validate_content_schemas and jt == "string" and (
            "contentEncoding" in schema or "contentMediaType" in schema
        ):
            add(self._content_kw(schema, t, kloc, base, abs_ptr, E))

        if "format" in schema and isinstance(schema["format"], str) \
                and self.options.collect_annotations and t.annotatable:
            # the format name is ALWAYS annotated when the keyword is
            # evaluated, independent of assertion mode
            # (FormatAnnotation.pm:47-48: A($state, $schema->{format})
            # before the validate_formats check)
            self._annotate(t, kloc, base, abs_ptr, "format",
                           value=schema["format"])
        if "format" in schema and self.options.validate_formats and applies("format"):
            pred = format_predicate(schema["format"], t.value_col().cast("string"))
            if pred is not None:
                add(E("format", pred, f"not a valid {schema['format']}"))

        if "maxItems" in schema and applies("maxItems"):
            n = schema["maxItems"]
            add(E("maxItems", F.size(t.value_col()) <= n, f"array has more than {n} item{'s' if n != 1 else ''}"))
        if "minItems" in schema and applies("minItems"):
            n = schema["minItems"]
            add(E("minItems", F.size(t.value_col()) >= n, f"array has fewer than {n} item{'s' if n != 1 else ''}"))
        if schema.get("uniqueItems") is True and applies("uniqueItems"):
            v = t.value_col()
            add(E("uniqueItems", F.size(F.array_distinct(v)) == F.size(v), "items are not unique"))

        # ---- array applicators -------------------------------------------
        n_prefix = 0
        # prefixItems exists only in 2020-12; earlier dialects ignore it
        # as an unknown keyword (the unknownKeyword corpus)
        if "prefixItems" in schema and applies("prefixItems") \
                and self.dialect == "2020-12":
            subs = schema["prefixItems"]
            n_prefix = len(subs)
            for i, s in enumerate(subs):
                elem = self._elem_target(t, F.lit(i))
                present_i = t.present & (F.size(t.value_col()) > i)
                elem = Target(col=elem.col, dtype=elem.dtype, ptr=elem.ptr, present=present_i,
                              null_is_value=True)
                _amark = len(self.ctx.annotations)
                add(sub("prefixItems", s, elem, suffix=f"/{i}"))
                self._gate_annotations(_amark, present_i)
            cov_items.append((None, n_prefix))
            if self.options.collect_annotations and t.annotatable \
                    and jt == "array":
                # largest evaluated index, or true when the whole array was
                # covered (V/Applicator.pm:314)
                self._annotate(
                    t, kloc, base, abs_ptr, "prefixItems",
                    value_col=F.when(F.size(t.value_col()) <= n_prefix,
                                     F.lit("true"))
                               .otherwise(F.lit(str(n_prefix - 1))))

        if "items" in schema and applies("items"):
            items = schema["items"]
            if isinstance(items, list):
                # array form (≤2019-09): positional subschemas, with
                # `additionalItems` as the rest-schema
                # (V/Applicator.pm:250-274); the reference rejects it in
                # 2020-12 with this same error (:254)
                if self.dialect == "2020-12":
                    raise SpecError('array form of "items" not supported in draft2020-12')
                for i, s in enumerate(items):
                    elem = self._elem_target(t, F.lit(i))
                    present_i = t.present & (F.size(t.value_col()) > i)
                    elem = Target(col=elem.col, dtype=elem.dtype, ptr=elem.ptr,
                                  present=present_i, null_is_value=True)
                    _amark = len(self.ctx.annotations)
                    add(sub("items", s, elem, suffix=f"/{i}"))
                    self._gate_annotations(_amark, present_i)
                n_prefix = len(items)
                cov_items.append((None, n_prefix))
                if "additionalItems" in schema:
                    add(self._items_kw(schema["additionalItems"], t, n_prefix,
                                       kloc, base, abs_ptr, kw="additionalItems"))
                    cov_items.append((None, "all"))
            else:
                add(self._items_kw(items, t, n_prefix, kloc, base, abs_ptr))
                cov_items.append((None, "all"))
                if self.options.collect_annotations and t.annotatable \
                        and jt == "array":
                    # schema-form items always annotates true after
                    # evaluating the rest of the array (V/Applicator.pm:349)
                    self._annotate(t, kloc, base, abs_ptr, "items",
                                   value=True)

        # min/maxContains are evaluated INSIDE the contains keyword and do
        # nothing without it (V/Applicator.pm:357-405: they live in
        # _eval_keyword_contains, which only runs when `contains` exists)
        if "contains" in schema and applies("contains"):
            c = self._contains_kw(schema, t, kloc, base, abs_ptr)
            add(c)
            adopt(c, None)   # element-predicate coverage for unevaluatedItems

        # ---- object keywords ---------------------------------------------
        if "required" in schema and applies("required"):
            add(self._required_kw(schema["required"], t, E))
        if "dependentRequired" in schema and applies("dependentRequired") \
                and (self.dialect in ("2019-09", "2020-12")
                     or self._deps_dispatch):
            for prop, deps in schema["dependentRequired"].items():
                pt = t.get_property(prop)
                if pt is None:
                    continue
                dep_ok = F.lit(True)
                missing = []
                for d in deps:
                    dt_ = t.get_property(d)
                    present = dt_.present if dt_ is not None else F.lit(False)
                    dep_ok = dep_ok & present
                    missing.append(F.when(~present, F.lit(d)))
                ok = F.when(pt.present, dep_ok).otherwise(F.lit(True))
                add(E("dependentRequired", ok, "not all dependencies are satisfied"))
        if "dependentSchemas" in schema and applies("dependentSchemas") \
                and (self.dialect in ("2019-09", "2020-12")
                     or self._deps_dispatch):
            # the dispatch flag authorizes THIS synthetic node only: a
            # literal dependent* keyword nested inside a draft4-7
            # `dependencies` subschema is unknown in that dialect and must
            # NOT inherit the dispatch (the reference compiles the nested
            # subschema under the document's own dialect)
            _dispatch = self._deps_dispatch
            self._deps_dispatch = False
            try:
                for prop, s in schema["dependentSchemas"].items():
                    pt = t.get_property(prop)
                    if pt is None:
                        continue
                    _amark = len(self.ctx.annotations)
                    child = sub("dependentSchemas", s, t, suffix=f"/{json_pointer_escape(prop)}")
                    self._gate_annotations(_amark, pt.present)
                    ok = F.when(pt.present, child.ok).otherwise(F.lit(True))
                    gated = [F.when(pt.present, v).otherwise(_empty_viols()) for v in child.viols]
                    add(Compiled(ok=ok, viols=gated))
                    adopt(child, pt.present & child.ok)
            finally:
                self._deps_dispatch = _dispatch

        # draft4-7 keyword; 2019-09+ ignore it (replaced by dependent*)
        if "dependencies" in schema and applies("dependencies") \
                and self.dialect in ("4", "6", "7"):
            # draft4-7 keyword: array form ≡ dependentRequired, schema form
            # ≡ dependentSchemas, dispatched at compile time
            # (V/Applicator.pm:190-245).  Documented deviation: violation
            # keyword_locations read /dependentRequired | /dependentSchemas
            # (the dispatched form), not /dependencies
            arrays = {k: v for k, v in schema["dependencies"].items()
                      if isinstance(v, list)}
            schemas = {k: v for k, v in schema["dependencies"].items()
                       if not isinstance(v, list)}
            self._deps_dispatch = True   # lets dependent* through the
            try:                          # 2019-09+ dialect gate below
                if arrays:
                    add(self._object_schema({"dependentRequired": arrays}, t,
                                            kloc, base, abs_ptr))
                if schemas:
                    add(self._object_schema({"dependentSchemas": schemas}, t,
                                            kloc, base, abs_ptr))
            finally:
                self._deps_dispatch = False

        if "maxProperties" in schema and applies("maxProperties"):
            n = schema["maxProperties"]
            add(E("maxProperties", self._prop_count(t) <= n,
                  f"object has more than {n} propert{'ies' if n != 1 else 'y'}"))
        if "minProperties" in schema and applies("minProperties"):
            n = schema["minProperties"]
            add(E("minProperties", self._prop_count(t) >= n,
                  f"object has fewer than {n} propert{'ies' if n != 1 else 'y'}"))

        annotating = (self.options.collect_annotations and t.annotatable
                      and jt == "object")
        matched_names: set[str] = set()
        if "properties" in schema and applies("properties"):
            prop_present: list = []
            for name, s in schema["properties"].items():
                pt = t.get_property(name)
                matched_names.add(name)
                if pt is None:
                    if isinstance(t.dtype, T.MapType):
                        if not annotating:
                            # join the node's single fused map_entries pass
                            # (sel: exact key) instead of an element_at +
                            # map_contains_key pair: with a DERIVED map
                            # column every extra reference re-builds the
                            # map after filter pushdown inlines it — the
                            # fused plan references the column once
                            add(self._map_props_kw(
                                s, t, (lambda k, _n=name: k == _n),
                                kw="properties",
                                suffix=f"/{json_pointer_escape(name)}",
                                summary_msg="not all properties are valid",
                                kloc=kloc, base=base, abs_ptr=abs_ptr,
                                emit_summary=False, fuse=map_fuse))
                            continue
                        pt = self._map_value_target(t, name)
                    else:
                        continue
                prop_present.append((name, pt.present))
                _amark = len(self.ctx.annotations)
                add(sub("properties", s, pt, suffix=f"/{json_pointer_escape(name)}"))
                # absent property ⇒ subtree not evaluated ⇒ no annotations
                self._gate_annotations(_amark, pt.present)
            if annotating:
                # evaluated-names annotation (V/Applicator.pm:448)
                self._annotate_names("properties", prop_present, t,
                                     kloc, base, abs_ptr)

        is_map = isinstance(t.dtype, T.MapType)
        pattern_res: list[str] = []
        if "patternProperties" in schema and applies("patternProperties"):
            pat_matched: list = []
            pat_children: list[Compiled] = []
            for pat, s in schema["patternProperties"].items():
                pattern_res.append(pat)
                if is_map:
                    # open-properties map column: the subschema applies to
                    # every entry whose KEY matches at runtime
                    # (V/Applicator.pm:453-490); Java-regex dialect, same
                    # deviation class as `pattern`
                    c = self._map_props_kw(
                        s, t, (lambda k, _p=pat: k.rlike(_p)),
                        kw="patternProperties",
                        suffix=f"/{json_pointer_escape(pat)}",
                        summary_msg="not all properties are valid",
                        kloc=kloc, base=base, abs_ptr=abs_ptr,
                        emit_summary=False, fuse=map_fuse)
                    add(c)
                    pat_children.append(c)
                    cov_names.append((None, ("pat", pat)))
                else:
                    for name in t.field_names():
                        if re.search(pat, name):
                            matched_names.add(name)
                            pt = t.get_property(name)
                            if not any(n == name for n, _ in pat_matched):
                                pat_matched.append((name, pt.present))
                            _amark = len(self.ctx.annotations)
                            add(sub("patternProperties", s, pt, suffix=f"/{json_pointer_escape(pat)}"))
                            self._gate_annotations(_amark, pt.present)
            if annotating:
                # matched-names annotation (V/Applicator.pm:487, uniqstr)
                if is_map:
                    self._annotate_map_keys(
                        "patternProperties", _match_any_key(pattern_res), t,
                        kloc, base, abs_ptr)
                else:
                    self._annotate_names("patternProperties", pat_matched, t,
                                         kloc, base, abs_ptr)
            if pat_children:
                # ONE summary row per patternProperties keyword, however
                # many patterns fail (Result shape parity: the reference
                # emits a single 'not all properties are valid' rollup)
                ok_pp = F.lit(True)
                for c in pat_children:
                    ok_pp = ok_pp & c.kw_ok
                add(Compiled(ok=F.lit(True), viols=[_viol(
                    ok_pp, t.ptr, f"{kloc}/patternProperties",
                    self._akloc(base, f"{abs_ptr}/patternProperties"),
                    "patternProperties", "not all properties are valid",
                    F.lit(None).cast("string"))]))

        if "additionalProperties" in schema and applies("additionalProperties"):
            s = schema["additionalProperties"]
            if is_map:
                names = sorted(matched_names)
                pats = list(pattern_res)

                def _extra_sel(k: Column, _names=names, _pats=pats) -> Column:
                    cond = F.lit(True)
                    if _names:
                        cond = cond & ~k.isin(_names)
                    for p in _pats:
                        cond = cond & ~k.rlike(p)
                    return cond

                add(self._map_props_kw(
                    s, t, _extra_sel, kw="additionalProperties", suffix="",
                    summary_msg="not all additional properties are valid",
                    kloc=kloc, base=base, abs_ptr=abs_ptr, fuse=map_fuse,
                    sel_all=not names and not pats))
                if annotating:
                    self._annotate_map_keys(
                        "additionalProperties",
                        _unmatched_key(names, pats), t, kloc, base, abs_ptr)
            else:
                extras = [n for n in t.field_names() if n not in matched_names
                          and not any(re.search(p, n) for p in pattern_res)]
                for name in extras:
                    pt = t.get_property(name)
                    _amark = len(self.ctx.annotations)
                    add(sub("additionalProperties", s, pt))
                    self._gate_annotations(_amark, pt.present)
                if annotating:
                    # evaluated-extras annotation (V/Applicator.pm:523)
                    self._annotate_names(
                        "additionalProperties",
                        [(n, t.get_property(n).present) for n in extras],
                        t, kloc, base, abs_ptr)

        if "propertyNames" in schema and applies("propertyNames"):
            s = schema["propertyNames"]
            if is_map:
                add(self._map_propertynames_kw(s, t, kloc, base, abs_ptr,
                                               fuse=map_fuse))
            else:
                for name in t.field_names():
                    # the name is only validated when the property is PRESENT
                    # (NULL column = absent property in our data model) — gate
                    # on the property's own presence, not the object's
                    pt = t.get_property(name)
                    present = pt.present if pt is not None else F.lit(False)
                    nt = Target(col=F.lit(name), dtype=T.StringType(), ptr=t.ptr,
                                present=present)
                    add(sub("propertyNames", s, nt))

        # coverage produced by this level's property keywords (statically
        # known on typed rows/structs — the schema fixes the name set)
        if matched_names:
            cov_names.append((None, frozenset(matched_names)))
        if "additionalProperties" in schema and applies("additionalProperties"):
            cov_names.append((None, "all"))

        # ---- in-place applicators ----------------------------------------
        if "allOf" in schema:
            children = [sub("allOf", s, t, suffix=f"/{i}") for i, s in enumerate(schema["allOf"])]
            for c in children:
                add(c)
                adopt(c, c.ok)
        if "anyOf" in schema:
            children = []
            for i, s in enumerate(schema["anyOf"]):
                _amark = len(self.ctx.annotations)
                c = sub("anyOf", s, t, suffix=f"/{i}")
                self._gate_annotations(_amark, c.ok)
                children.append(c)
            any_ok = F.lit(False)
            for c in children:
                any_ok = any_ok | c.ok
            any_ok = F.when(t.present, any_ok).otherwise(F.lit(True))
            for c in children:
                adopt(c, c.ok)
            gated = [F.when(any_ok, _empty_viols()).otherwise(v) for c in children for v in c.viols]
            gated.append(_viol(any_ok, t.ptr, f"{kloc}/anyOf", self._akloc(base, f"{abs_ptr}/anyOf"),
                               "anyOf", "no subschemas are valid", F.lit(None).cast("string")))
            add(Compiled(ok=any_ok, viols=gated))
        if "oneOf" in schema:
            children = []
            for i, s in enumerate(schema["oneOf"]):
                _amark = len(self.ctx.annotations)
                c = sub("oneOf", s, t, suffix=f"/{i}")
                self._gate_annotations(_amark, c.ok)
                children.append(c)
            for c in children:
                adopt(c, c.ok)
            count = sum((c.ok.cast("int") for c in children), F.lit(0))
            ok = F.when(t.present, count == 1).otherwise(F.lit(True))
            valid_ids = F.concat_ws(", ", F.array_compact(F.array(
                *[F.when(c.ok, F.lit(str(i))) for i, c in enumerate(children)])))
            msg = F.when(count == 0, F.lit("no subschemas are valid")).otherwise(
                F.concat(F.lit("multiple subschemas are valid: "), valid_ids))
            gated = [F.when(count != 0, _empty_viols()).otherwise(v) for c in children for v in c.viols]
            gated.append(_viol(ok, t.ptr, f"{kloc}/oneOf", self._akloc(base, f"{abs_ptr}/oneOf"),
                               "oneOf", msg, F.lit(None).cast("string")))
            add(Compiled(ok=ok, viols=gated))
        if "not" in schema:
            _amark = len(self.ctx.annotations)
            child = sub("not", schema["not"], t)
            self._gate_annotations(_amark, F.lit(False))
            ok = F.when(t.present, ~child.ok).otherwise(F.lit(True))
            # inner errors are discarded (V/Applicator.pm:133-145)
            add(Compiled(ok=ok, viols=[_viol(ok, t.ptr, f"{kloc}/not",
                self._akloc(base, f"{abs_ptr}/not"), "not", "subschema is valid",
                F.lit(None).cast("string"))]))
        if "if" in schema:
            _m_if = len(self.ctx.annotations)
            if_c = self._node(schema["if"], t, f"{kloc}/if", base, f"{abs_ptr}/if")
            self._gate_annotations(_m_if, if_c.ok)
            _m_then = len(self.ctx.annotations)
            then_c = sub("then", schema["then"], t) if "then" in schema else Compiled(ok=F.lit(True))
            self._gate_annotations(_m_then, if_c.ok)
            _m_else = len(self.ctx.annotations)
            else_c = sub("else", schema["else"], t) if "else" in schema else Compiled(ok=F.lit(True))
            self._gate_annotations(_m_else, ~F.coalesce(if_c.ok, F.lit(False)))
            ok = F.when(~t.present, F.lit(True)).when(if_c.ok, then_c.ok).otherwise(else_c.ok)
            adopt(if_c, if_c.ok)
            adopt(then_c, if_c.ok & then_c.ok)
            adopt(else_c, ~if_c.ok & else_c.ok)
            gated = [F.when(if_c.ok, v).otherwise(_empty_viols()) for v in then_c.viols]
            gated += [F.when(if_c.ok, _empty_viols()).otherwise(v) for v in else_c.viols]
            gated = [F.when(t.present, v).otherwise(_empty_viols()) for v in gated]
            add(Compiled(ok=ok, viols=gated))

        # ---- unevaluatedItems / unevaluatedProperties ---------------------
        # Evaluated last (after all coverage contributions are known) —
        # the reference enforces the same ordering (V/Applicator.pm:37-45).
        # Static coverage analysis with when()-guarded conditional branches
        # replaces runtime annotation collection (V/Unevaluated.pm:41-144);
        # `contains`-based item coverage is a documented TODO subset,
        # mirroring the reference's own acceptance-test skips.
        if "unevaluatedProperties" in schema and applies("unevaluatedProperties"):
            s = schema["unevaluatedProperties"]
            if is_map:
                # runtime coverage over map entries: a key is covered when a
                # successful in-scope keyword claimed it — statically for
                # name sets, by regex for patternProperties, guarded for
                # conditional branches (V/Unevaluated.pm:100-144)
                if not any(g is None and p == "all" for g, p in cov_names):
                    payloads = list(cov_names)

                    def _uncov_sel(k: Column, _ps=payloads) -> Column:
                        cov = F.lit(False)
                        for g, p in _ps:
                            if p == "all":
                                c = F.lit(True)
                            elif isinstance(p, tuple) and p[0] == "pat":
                                c = k.rlike(p[1])
                            elif p:
                                c = k.isin(sorted(p))
                            else:
                                c = F.lit(False)
                            if g is not None:
                                c = F.coalesce(g, F.lit(False)) & c
                            cov = cov | c
                        return ~cov

                    add(self._map_props_kw(
                        s, t, _uncov_sel, kw="unevaluatedProperties", suffix="",
                        summary_msg="not all additional properties are valid",
                        kloc=kloc, base=base, abs_ptr=abs_ptr, fuse=map_fuse))
            else:
                for name in t.field_names():
                    if any(g is None and _name_covered(name, p) for g, p in cov_names):
                        continue            # statically covered
                    guards = [g for g, p in cov_names
                              if g is not None and _name_covered(name, p)]
                    covered = F.lit(False)
                    for g in guards:
                        covered = covered | F.coalesce(g, F.lit(False))
                    pt = t.get_property(name)
                    if pt is None:
                        continue
                    child = sub("unevaluatedProperties", s, pt)
                    add(Compiled(
                        ok=F.when(covered, F.lit(True)).otherwise(child.ok),
                        viols=[F.when(covered, _empty_viols()).otherwise(v)
                               for v in child.viols],
                    ))
            cov_names.append((None, "all"))

        if "unevaluatedItems" in schema and applies("unevaluatedItems"):
            s = schema["unevaluatedItems"]
            if not any(g is None and p == "all" for g, p in cov_items):
                all_cov = F.lit(False)
                for g, p in cov_items:
                    if p == "all" and g is not None:
                        all_cov = all_cov | F.coalesce(g, F.lit(False))
                static_prefix = max((p for g, p in cov_items
                                     if g is None and isinstance(p, int)), default=0)
                n_cov = F.lit(static_prefix)
                for g, p in cov_items:
                    if g is not None and isinstance(p, int):
                        n_cov = F.greatest(n_cov, F.when(F.coalesce(g, F.lit(False)),
                                                         F.lit(p)).otherwise(F.lit(0)))
                # element-predicate coverage: contains' matched elements
                # count as evaluated (reference matched-index annotations)
                epreds = [(g, p[1]) for g, p in cov_items
                          if isinstance(p, tuple) and p[0] == "epred"]
                arr = t.value_col()
                et = t.dtype.elementType
                if not epreds:
                    rest = F.slice(arr, n_cov + 1, F.greatest(F.size(arr) - n_cov, F.lit(0)))
                    ok_inner = self._items_ok_peephole(s, t.dtype, rest)
                    if ok_inner is None:
                        def _uneval_pred(x: Column) -> Column:
                            elem = Target(col=x, dtype=et, ptr=t.ptr, present=F.lit(True),
                                          null_is_value=True, annotatable=False)
                            return self._node(s, elem, f"{kloc}/unevaluatedItems",
                                              base, f"{abs_ptr}/unevaluatedItems").ok
                        ok_inner = F.forall(rest, _uneval_pred)
                else:
                    def _uneval_elem_ok(x: Column, i: Column) -> Column:
                        elem = Target(col=x, dtype=et, ptr=t.ptr, present=F.lit(True),
                                      null_is_value=True, annotatable=False)
                        covered = i < n_cov
                        for g, es in epreds:
                            m = self._node(es, elem, f"{kloc}/contains",
                                           base, f"{abs_ptr}/contains").ok
                            covered = covered | (
                                m if g is None else F.coalesce(g, F.lit(False)) & m)
                        return covered | self._node(
                            s, elem, f"{kloc}/unevaluatedItems",
                            base, f"{abs_ptr}/unevaluatedItems").ok
                    ok_inner = F.forall(
                        F.transform(arr, _uneval_elem_ok), lambda b: b)
                ok = F.when(~t.present | all_cov, F.lit(True)) \
                    .otherwise(F.coalesce(ok_inner, F.lit(True)))
                add(Compiled(ok=ok, viols=[_viol(
                    ok, t.ptr, f"{kloc}/unevaluatedItems",
                    self._akloc(base, f"{abs_ptr}/unevaluatedItems"),
                    "unevaluatedItems",
                    "subschema is not valid against all additional items",
                    F.lit(None).cast("string"))]))
            cov_items.append((None, "all"))

        # ---- x-* extension keywords (set-oriented; runner executes) -------
        for kw in ("x-unique", "x-ref", "x-drift"):
            if kw in schema:
                self.ctx.set_checks.append(SetCheck(
                    kind=kw[2:], keyword_location=f"{kloc}/{kw}", params={"value": schema[kw]},
                ))

        # ---- registered custom vocabularies (add_vocabulary seam,
        # Modern.pm:940-956) — dispatched in evaluation_order AFTER the
        # built-in keywords, wrapped with the same presence gating and
        # violation bookkeeping ----------------------------------------
        from json_schema_modern_spark.spec.vocabulary import (
            registered_keywords,
        )

        for kw, (_voc, ks) in registered_keywords().items():
            if kw not in schema:
                continue
            if ks.traverse is not None:
                try:
                    ks.traverse(schema[kw])
                except ValueError as exc:
                    raise SpecError(
                        f"{kw} {exc} (at {kloc or '/'})") from exc
            if ks.types is not None and not (
                    jt in ks.types
                    or (jt == "integer" and "number" in ks.types)):
                continue
            if ks.compile is None or t.is_root:
                continue
            pred = ks.compile(schema[kw], t.value_col(), jt)
            if pred is None:
                continue
            add(E(kw, F.coalesce(pred, F.lit(False)), ks.error))

        if map_fuse:
            # ONE interpreted map_entries pass for ALL this node's map
            # keywords: ∀e.(p₁∧…∧pₙ) ≡ (∀e.p₁)∧…∧(∀e.pₙ), and SQL
            # three-valued logic agrees (false∧null=false; all-true with a
            # null gives null, coalesced true on both shapes)
            _fns = tuple(map_fuse)

            def _fused_pred(e: Column) -> Column:
                # single-param signature: Spark HOFs dispatch on arity
                c = _fns[0](e)
                for fn in _fns[1:]:
                    c = c & fn(e)
                return c

            fused_ok = F.when(
                t.present,
                F.coalesce(F.forall(F.map_entries(t.value_col()), _fused_pred),
                           F.lit(True))).otherwise(F.lit(True))
            oks.append(fused_ok)

        ok_all = F.lit(True)
        for o in oks:
            ok_all = ok_all & o
        return Compiled(ok=ok_all, viols=viols, cov_names=cov_names, cov_items=cov_items)

    # -- helpers ------------------------------------------------------------

    def _gate_annotations(self, start: int, guard: Column) -> None:
        """Apply a success/branch guard to annotations collected since
        `start` (annotations from failed/untaken subschemas are discarded —
        U.pm:823-829)."""
        for a in self.ctx.annotations[start:]:
            a["guard"] = guard if a["guard"] is None else (a["guard"] & guard)

    def _annotate(self, t: Target, kloc: str, base: str, abs_ptr: str,
                  keyword: str, value: Any = None,
                  value_col: Column | None = None) -> None:
        """Record one annotation entry.  Static values are JSON-encoded at
        compile time; `value_col` carries a row-dependent value as a
        JSON-text Column (the applicator annotations — evaluated property
        names — are per-row in a MapType/struct world)."""
        self.ctx.annotations.append({
            "ptr": t.ptr, "kloc": f"{kloc}/{keyword}",
            "akloc": self._akloc(base, f"{abs_ptr}/{keyword}"),
            "keyword": keyword, "value": value, "value_col": value_col,
            "guard": None})

    def _annotate_names(self, kw: str, pairs: list, t: Target, kloc: str,
                        base: str, abs_ptr: str) -> None:
        """Applicator annotation whose value is the list of property names
        the keyword evaluated on this row (V/Applicator.pm:448,487,523 —
        properties/patternProperties/additionalProperties push the names
        seen; name order is sorted here where the reference's Perl hash
        iteration is unspecified).  `pairs` = (name, presence Column)."""
        if pairs:
            arr = F.array_sort(F.array_compact(F.array(
                *[F.when(p, F.lit(n)) for n, p in pairs])))
        else:
            arr = F.array().cast("array<string>")
        self._annotate(t, kloc, base, abs_ptr, kw, value_col=F.to_json(arr))

    def _annotate_map_keys(self, kw: str, key_sel, t: Target, kloc: str,
                           base: str, abs_ptr: str) -> None:
        """Same as _annotate_names for an open-properties MapType column:
        the evaluated names are the runtime keys `key_sel` selects."""
        keys = F.array_sort(F.filter(F.map_keys(t.value_col()), key_sel))
        self._annotate(t, kloc, base, abs_ptr, kw, value_col=F.to_json(keys))

    def _type_kw(self, want: Any, t: Target, E) -> Compiled:
        wants = want if isinstance(want, list) else [want]
        if not wants:
            raise SpecError("type array is empty")
        for w in wants:
            if w not in ("null", "boolean", "object", "array", "string", "number", "integer"):
                raise SpecError(f'unrecognized type "{w}"')
        jt = t.json_type()
        got = jt
        if t.null_is_value and "null" not in wants:
            # a JSON-null element has runtime type "null" even though the
            # static element type matches — the check cannot constant-fold
            nonnull = self._type_kw_nonnull(wants, t)
            return E("type", F.when(t.value_col().isNull(), F.lit(False))
                     .otherwise(nonnull),
                     f"got null or {got}, not {', '.join(wants)}",
                     null_vacuous=False)
        if jt in wants or (jt == "integer" and "number" in wants):
            return Compiled(ok=F.lit(True))
        if jt == "number" and "integer" in wants:
            if self.dialect == "4":
                # draft4 legacy_ints (U.pm:141-147): an integer is "a JSON
                # number without a fraction part" AS WRITTEN — a
                # fractional-typed column is never an integer, even at 2.0
                return E("type", F.lit(False), "got number, not integer")
            # ≥draft6: 2.0 is an integer (Utilities.pm:152-156); holds for
            # Double/Float and Decimal alike (floor round-trips)
            v = t.value_col()
            ok = v == F.floor(v).cast(t.dtype)
            return E("type", ok, f"got number, not integer")
        plural = "one of " if len(wants) > 1 else ""
        return E("type", F.lit(False), f"got {got}, not {plural}{', '.join(wants)}")

    def _type_kw_nonnull(self, wants: list, t: Target) -> Column:
        """Runtime type check for a definitely-non-null value (the static
        dtype decides, with the integer⊂number / 2.0-is-integer cases)."""
        jt = t.json_type()
        if jt in wants or (jt == "integer" and "number" in wants):
            return F.lit(True)
        if jt == "number" and "integer" in wants:
            v = t.value_col()
            return v == F.floor(v).cast(t.dtype)
        return F.lit(False)

    def _prop_count(self, t: Target) -> Column:
        if t.is_root:
            return sum((F.col(n).isNotNull().cast("int") for n in t.field_names()), F.lit(0))
        if isinstance(t.dtype, T.MapType):
            return F.size(t.value_col())
        if isinstance(t.dtype, T.StructType):
            return sum((t.col.getField(n).isNotNull().cast("int") for n in t.field_names()), F.lit(0))
        return F.lit(0)

    def _required_kw(self, names: list[str], t: Target, E) -> Compiled:
        missing_flags = []
        ok = F.lit(True)
        for name in names:
            pt = t.get_property(name)
            if pt is None and isinstance(t.dtype, T.MapType):
                present = F.map_contains_key(t.value_col(), F.lit(name))
            else:
                present = pt.present if pt is not None else F.lit(False)
            ok = ok & present
            missing_flags.append(F.when(~present, F.lit(name)))
        missing = F.array_compact(F.array(*missing_flags))
        msg = F.concat(
            F.lit("object is missing propert"),
            F.when(F.size(missing) > 1, F.lit("ies: ")).otherwise(F.lit("y: ")),
            F.concat_ws(", ", missing),
        )
        return E("required", ok, msg)

    def _elem_target(self, t: Target, idx: Column, col: Column | None = None) -> Target:
        et = t.dtype.elementType
        c = col if col is not None else F.get(t.value_col(), idx)
        return Target(
            col=c, dtype=et,
            ptr=F.concat(t.ptr, F.lit("/"), idx.cast("string")),
            present=t.present,  # element exists; NULL element = JSON null value
            null_is_value=True,
        )

    def _map_value_target(self, t: Target, name: str) -> Target:
        vt = t.dtype.valueType
        col = F.element_at(t.value_col(), F.lit(name))
        return Target(
            col=col, dtype=vt,
            ptr=F.concat(t.ptr, F.lit("/" + json_pointer_escape(name))),
            present=t.present & F.map_contains_key(t.value_col(), F.lit(name)),
            null_is_value=True,  # a present map key with NULL value = JSON null
        )

    def _map_props_kw(self, s: Any, t: Target, sel, kw: str, suffix: str,
                      summary_msg: str, kloc: str, base: str, abs_ptr: str,
                      emit_summary: bool = True, fuse: list | None = None,
                      sel_all: bool = False) -> Compiled:
        """Object keyword over a MapType(String, V) column: the subschema
        applies to every entry whose key ``sel(key)`` selects.

        Used for patternProperties (key rlike pattern), additionalProperties
        (complement of properties ∪ patternProperties) and
        unevaluatedProperties (complement of the coverage set) —
        V/Applicator.pm:453-526, V/Unevaluated.pm:100-144.

        ok-path: Spark HOFs are CodegenFallback (interpreted), so the
        per-entry predicate is expensive per map keyword.  Two peepholes:

        - ``sel_all`` (selector covers every key, e.g. additionalProperties
          with no sibling properties/patternProperties) + range-only value
          schema → ``array_min/array_max(map_values(col))`` collection
          expressions, fully codegen'd (precedent: _items_ok_peephole).
        - ``fuse``: instead of one forall PER keyword, the per-entry
          predicate is appended to the node-level fuse list and the caller
          emits a SINGLE forall whose body conjoins every map keyword's
          predicate — ∀e.(p∧q) ≡ (∀e.p)∧(∀e.q), measured ~3.5× on the
          ok path with 3 map keywords.  The returned Compiled.ok is then
          the keyword's OWN forall, used only inside the violation columns
          (evaluated on failing rows post-filter); the caller must exclude
          it from the node's ok conjunction.

        Violation detail (per-entry child viols at /<escaped key>) is
        computed only for rows that already failed."""
        vt = t.dtype.valueType
        kp = f"{kloc}/{json_pointer_escape(kw)}{suffix}"
        ap = f"{abs_ptr}/{json_pointer_escape(kw)}{suffix}"
        kp_sum = f"{kloc}/{json_pointer_escape(kw)}"
        ap_sum = f"{abs_ptr}/{json_pointer_escape(kw)}"
        entries = F.map_entries(t.value_col())

        def ent_target(e: Column) -> Target:
            return Target(col=e["value"], dtype=vt,
                          ptr=F.concat(t.ptr, F.lit("/"), _ptr_escape_col(e["key"])),
                          present=F.lit(True), null_is_value=True,
                          annotatable=False)

        def ent_ok(e: Column) -> Column:
            return ~sel(e["key"]) | self._node(s, ent_target(e), kp, base, ap).ok

        ok_inner = None
        fused = False
        if sel_all:
            ok_inner = self._items_ok_peephole(
                s, T.ArrayType(vt, t.dtype.valueContainsNull),
                F.map_values(t.value_col()))
        if ok_inner is None:
            if fuse is not None:
                fuse.append(ent_ok)
                fused = True
            ok_inner = F.forall(entries, ent_ok)
        ok = F.when(t.present, F.coalesce(ok_inner, F.lit(True))) \
            .otherwise(F.lit(True))

        def ent_viols(e: Column) -> Column:
            c = self._node(s, ent_target(e), kp, base, ap)
            return F.when(sel(e["key"]), _merge_viols(c.viols)).otherwise(_empty_viols())

        leaf = F.when(ok, _empty_viols()).otherwise(F.flatten(F.transform(entries, ent_viols)))
        node_ok = F.lit(True) if fused else ok
        if not emit_summary:
            out = Compiled(ok=node_ok, viols=[leaf])
        else:
            summary = _viol(ok, t.ptr, kp_sum, self._akloc(base, ap_sum), kw,
                            summary_msg, F.lit(None).cast("string"))
            out = Compiled(ok=node_ok, viols=[leaf, summary])
        # the keyword's own full predicate, for callers that gate rollup
        # summary rows on it (always evaluated post-filter, failing rows only)
        out.kw_ok = ok
        return out

    def _map_propertynames_kw(self, s: Any, t: Target, kloc: str, base: str,
                              abs_ptr: str, fuse: list | None = None) -> Compiled:
        """propertyNames over MapType: every KEY validates against the
        subschema (V/Applicator.pm:528-548).  With ``fuse``, the key
        predicate joins the node's single fused map_entries forall (see
        _map_props_kw) instead of paying its own interpreted pass."""
        kp = f"{kloc}/propertyNames"
        ap = f"{abs_ptr}/propertyNames"
        keys = F.map_keys(t.value_col())

        def name_target(k: Column) -> Target:
            return Target(col=k, dtype=T.StringType(),
                          ptr=F.concat(t.ptr, F.lit("/"), _ptr_escape_col(k)),
                          present=F.lit(True), annotatable=False)

        def name_ok(k: Column) -> Column:
            return self._node(s, name_target(k), kp, base, ap).ok

        fused = False
        if fuse is not None:
            fuse.append(lambda e: name_ok(e["key"]))
            fused = True
        ok = F.when(t.present, F.coalesce(F.forall(keys, name_ok), F.lit(True))) \
            .otherwise(F.lit(True))

        def name_viols(k: Column) -> Column:
            return _merge_viols(self._node(s, name_target(k), kp, base, ap).viols)

        leaf = F.when(ok, _empty_viols()).otherwise(F.flatten(F.transform(keys, name_viols)))
        summary = _viol(ok, t.ptr, kp, self._akloc(base, ap), "propertyNames",
                        "not all property names are valid", F.lit(None).cast("string"))
        return Compiled(ok=F.lit(True) if fused else ok, viols=[leaf, summary])

    def _items_kw(self, items_schema: Any, t: Target, n_prefix: int,
                  kloc: str, base: str, abs_ptr: str, kw: str = "items") -> Compiled:
        """items (2020-12) / additionalItems (≤2019-09): every element
        after the positional prefix validates against one subschema.

        ok path: F.forall over the slice — stays in whole-stage codegen.
        Violations: transform-with-index building per-element violation
        arrays, flattened (only evaluated for rows that fail).
        """
        arr = t.value_col()
        et = t.dtype.elementType
        kp, ap = f"{kloc}/{kw}", f"{abs_ptr}/{kw}"

        def elem_compiled(x: Column, i: Column) -> Compiled:
            idx = i + F.lit(n_prefix)
            elem = Target(col=x, dtype=et,
                          ptr=F.concat(t.ptr, F.lit("/"), idx.cast("string")),
                          present=F.lit(True), null_is_value=True,
                          annotatable=False)
            return self._node(items_schema, elem, kp, base, ap)

        rest = arr if n_prefix == 0 else F.slice(arr, n_prefix + 1, F.greatest(F.size(arr) - n_prefix, F.lit(0)))
        ok_inner = self._items_ok_peephole(items_schema, t.dtype, rest)
        if ok_inner is None:
            ok_inner = F.forall(rest, lambda x: elem_compiled(x, F.lit(0)).ok)
        ok = F.when(t.present, F.coalesce(ok_inner, F.lit(True))).otherwise(F.lit(True))

        def viols_of(x: Column, i: Column) -> Column:
            return _merge_viols(elem_compiled(x, i).viols)

        leaf = F.flatten(F.transform(rest, viols_of))
        leaf = F.when(ok, _empty_viols()).otherwise(leaf)
        adj = "additional " if kw == "additionalItems" else ""
        summary = _viol(ok, t.ptr, kp, self._akloc(base, ap), kw,
                        f"subschema is not valid against all {adj}items",
                        F.lit(None).cast("string"))
        return Compiled(ok=ok, viols=[leaf, summary])

    _RANGE_ONLY_KEYS = {"type", "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"}

    def _items_ok_peephole(self, items_schema: Any, arr_type: T.ArrayType, rest: Column) -> Column | None:
        """Fast ok-path for the hot case (token-id range checks over huge
        int arrays): Spark's higher-order functions (forall/transform) are
        CodegenFallback — interpreted per element — while array_min/array_max
        are ordinary codegen'd collection expressions.  For an element
        schema that is purely numeric range checks, ``forall(arr, pred)``
        ≡ ``array_min(arr) >= lo AND array_max(arr) <= hi`` (NULL elements
        are JSON nulls, for which numeric keywords are vacuously true and
        which array_min/max skip — same semantics either way; a ``type``
        keyword re-introduces the null check via array_compact).

        Measured at 200k rows × ~700 tokens (local[32]): ~4-10× over the
        forall path.  The per-element violation-detail path is unchanged —
        it only evaluates for rows this predicate already failed.
        """
        if not isinstance(items_schema, dict) or not items_schema:
            return None
        if not set(items_schema) <= self._RANGE_ONLY_KEYS:
            return None
        et = arr_type.elementType
        if not isinstance(et, _NUMERIC_TYPES):
            return None
        want = items_schema.get("type")
        wants = want if isinstance(want, list) else [want] if want is not None else []
        if wants and not set(wants) <= {"integer", "number"}:
            return None
        if "integer" in wants and not set(wants) & {"number"} and not isinstance(et, _INTEGRAL_TYPES):
            return None  # fractional col: needs per-element floor check
        conds = []
        if "minimum" in items_schema:
            conds.append(F.array_min(rest) >= F.lit(items_schema["minimum"]))
        if "exclusiveMinimum" in items_schema:
            conds.append(F.array_min(rest) > F.lit(items_schema["exclusiveMinimum"]))
        if "maximum" in items_schema:
            conds.append(F.array_max(rest) <= F.lit(items_schema["maximum"]))
        if "exclusiveMaximum" in items_schema:
            conds.append(F.array_max(rest) < F.lit(items_schema["exclusiveMaximum"]))
        if wants and arr_type.containsNull and not self.options.assume_dense_arrays:
            # type: integer/number fails on JSON-null elements.  Only
            # needed when the schema admits null elements: with a
            # containsNull=false read schema (the token-table contract —
            # see sources.sequences.TOKEN_SCHEMA) this conjunct compiles
            # away entirely.  When it is needed, array_compact is the
            # least-bad exact check: its RuntimeReplaceable expansion is a
            # higher-order filter(), which de-vectorizes the Filter
            # operator (measured ~64 s vs ~25 s per 9.6M rows at 4 cores);
            # the codegen'd alternative, sort_array, is 4× worse still
            # (boxing sort of every array: ~255 s) — correctness wins.
            conds.append(F.size(F.array_compact(rest)) == F.size(rest))
        if not conds:
            return None
        ok = conds[0]
        for c in conds[1:]:
            ok = ok & c
        return F.coalesce(ok, F.lit(True))

    def _content_kw(self, schema: dict, t: Target, kloc: str, base: str,
                    abs_ptr: str, E) -> Compiled:
        """contentEncoding / contentMediaType / contentSchema assertions.

        The reference decodes per row through its media-type registry
        (V/Content.pm:42-114, decoders U.pm:481-743); here each stage is a
        whole-column expression: base64 validity by regex+shape, JSON
        well-formedness via try_parse_json (NULL on bad input), and
        contentSchema by deriving a Spark struct schema from the subschema's
        type annotations and recursing on the from_json result."""
        v = t.value_col().cast("string")
        out = []
        oks = []
        decoded = v
        enc = schema.get("contentEncoding")
        if enc is not None:
            if enc == "base64":
                ok_enc = v.rlike(r"^[A-Za-z0-9+/\s]*={0,2}\s*$") & \
                    (F.length(F.regexp_replace(v, r"\s", "")) % 4 == 0)
                decoded = F.unbase64(F.regexp_replace(v, r"\s", "")).cast("string")
            elif enc == "base64url":
                # RFC4648 §5 urlsafe alphabet, padding optional
                # (Modern.pm:1240-1250): translate -_ → +/ and re-pad to a
                # multiple of 4 before the JVM decoder
                s = F.regexp_replace(v, r"\s", "")
                ok_enc = s.rlike(r"^[A-Za-z0-9_\-]*={0,2}$") & \
                    (F.length(F.regexp_replace(s, "=", "")) % 4 != 1)
                tr = F.translate(F.regexp_replace(s, "=", ""), "-_", "+/")
                padded = F.concat(
                    tr,
                    F.when(F.length(tr) % 4 == 2, F.lit("=="))
                     .when(F.length(tr) % 4 == 3, F.lit("="))
                     .otherwise(F.lit("")),
                )
                decoded = F.unbase64(padded).cast("string")
            elif enc in ("identity", ""):
                ok_enc = F.lit(True)
            else:
                # unknown encoding: annotation only (reference aborts only
                # in strict FormatAssertion-style vocab; keep lenient)
                ok_enc = F.lit(True)
            c = E("contentEncoding", ok_enc,
                  f"could not decode {enc} string")
            out.extend(c.viols)
            oks.append(c.ok)
            decoded = F.when(c.ok, decoded)
        mt = schema.get("contentMediaType")
        # resolve through the media-type registry: parameter stripping
        # ("text/plain;charset=utf-8" matches the "text/*" row), wildcard
        # lookup order exact > suffix > type/* > */*, and custom
        # register_media_type entries (Utilities.pm:695-742).  Resolution
        # happens ONCE at compile time — contentMediaType is a schema
        # literal — so the per-row work stays whole-column expressions.
        from ..spec.media_types import get_media_type

        entry = get_media_type(mt) if mt is not None else None
        mtl = entry.handler if entry is not None else None
        cs_target: Target | None = None
        if mtl == "json":
            parsed_ok = F.try_parse_json(decoded).isNotNull() | decoded.isNull()
            c = E("contentMediaType", parsed_ok,
                  f"could not decode string as {mt}")
            out.extend(c.viols)
            oks.append(c.ok)
            if "contentSchema" in schema:
                sub_schema = _spark_schema_from_spec(schema["contentSchema"])
                if sub_schema is not None:
                    parsed = F.from_json(decoded, sub_schema)
                    cs_target = Target(col=parsed, dtype=sub_schema, ptr=t.ptr,
                                       present=t.present & parsed.isNotNull())
        elif mtl == "text":
            # text/* registry entry (U.pm:557-569): any string decodes;
            # contentSchema sees the decoded STRING.  The charset
            # parameter participates in MATCHING above; Column-tier
            # values are already UTF-8 Spark strings, so the decode
            # itself is identity (the python tier applies charset).
            cs_target = Target(col=decoded, dtype=T.StringType(), ptr=t.ptr,
                               present=t.present & decoded.isNotNull())
        elif mtl == "octet-stream":
            pass  # opaque bytes — anything decodes (U.pm:548-555)
        elif mtl == "ndjson":
            # every non-blank line must parse as JSON (U.pm:600-616)
            lines = F.filter(F.split(decoded, "\n"),
                             lambda ln: F.length(F.trim(ln)) > 0)
            nd_ok = F.forall(lines, lambda ln: F.try_parse_json(ln).isNotNull()) \
                | decoded.isNull()
            c = E("contentMediaType", nd_ok, f"could not decode string as {mt}")
            out.extend(c.viols)
            oks.append(c.ok)
        elif mtl == "form":
            # k=v pairs joined by & (U.pm:571-598); contentSchema sees the
            # parsed MAP — composing with the MapType object keywords
            form_ok = decoded.rlike(r"^([^=&]*=[^=&]*(&[^=&]*=[^=&]*)*)?$") \
                | decoded.isNull()
            c = E("contentMediaType", form_ok, f"could not decode string as {mt}")
            out.extend(c.viols)
            oks.append(c.ok)
            if "contentSchema" in schema:
                parsed = F.str_to_map(decoded, F.lit("&"), F.lit("="))
                cs_target = Target(col=parsed,
                                   dtype=T.MapType(T.StringType(), T.StringType()),
                                   ptr=t.ptr,
                                   present=t.present & c.ok & decoded.isNotNull())
        # unmatched media types, and custom register_media_type entries
        # that carry only a python decoder (no Column handler): annotation
        # only — same as the reference's decoder-less registry rows
        # (U.pm:668 "return if not $definition->{decode}")
        if cs_target is not None and "contentSchema" in schema:
            child = self._node(schema["contentSchema"], cs_target,
                               f"{kloc}/contentSchema",
                               base, f"{abs_ptr}/contentSchema")
            oks.append(child.ok)
            out.extend(child.viols)
        ok_all = F.lit(True)
        for o in oks:
            ok_all = ok_all & o
        return Compiled(ok=ok_all, viols=out)

    def _contains_kw(self, schema: dict, t: Target, kloc: str, base: str, abs_ptr: str) -> Compiled:
        arr = t.value_col()
        et = t.dtype.elementType
        contains_schema = schema.get("contains", True)

        def elem_ok(x: Column) -> Column:
            elem = Target(col=x, dtype=et, ptr=t.ptr, present=F.lit(True),
                          null_is_value=True, annotatable=False)
            return self._node(contains_schema, elem, f"{kloc}/contains", base, f"{abs_ptr}/contains").ok

        matches = F.size(F.filter(arr, elem_ok))
        min_c = schema.get("minContains", 1)
        max_c = schema.get("maxContains")
        out_oks = []
        out_viols = []

        def loc(kw: str) -> tuple[str, str]:
            return f"{kloc}/{kw}", self._akloc(base, f"{abs_ptr}/{kw}")

        cov_items: list = []
        if "contains" in schema:
            if min_c == 0:
                ok = F.lit(True)
            else:
                ok = F.when(t.present, matches >= 1).otherwise(F.lit(True))
            out_oks.append(ok)
            kp, ap = loc("contains")
            out_viols.append(_viol(ok, t.ptr, kp, ap, "contains",
                                   "subschema is not valid against any item", F.lit(None).cast("string")))
            # matching ELEMENTS count as evaluated for unevaluatedItems
            # (the reference's matched-index annotation,
            # V/Applicator.pm:360-381 + V/Unevaluated.pm:41-98), guarded on
            # the contains keyword succeeding (failed-subschema annotations
            # are discarded)
            cov_items.append((ok, ("epred", contains_schema)))
        if max_c is not None:
            ok = F.when(t.present, matches <= max_c).otherwise(F.lit(True))
            out_oks.append(ok)
            kp, ap = loc("maxContains")
            out_viols.append(_viol(ok, t.ptr, kp, ap, "maxContains",
                                   f"array contains more than {max_c} matching item{'s' if max_c != 1 else ''}",
                                   F.lit(None).cast("string")))
        if "minContains" in schema and "contains" in schema and min_c > 1:
            ok = F.when(t.present, matches >= min_c).otherwise(F.lit(True))
            out_oks.append(ok)
            kp, ap = loc("minContains")
            out_viols.append(_viol(ok, t.ptr, kp, ap, "minContains",
                                   f"array contains fewer than {min_c} matching item{'s' if min_c != 1 else ''}",
                                   F.lit(None).cast("string")))
        ok_all = F.lit(True)
        for o in out_oks:
            ok_all = ok_all & o
        return Compiled(ok=ok_all, viols=out_viols, cov_items=cov_items)


@dataclass
class CompiledPlan:
    ok: Column
    viols: Column
    set_checks: list[SetCheck]
    fingerprint: str
    root_uri: str
    # collected MetaData annotations (collect_annotations option):
    # {ptr: Column, kloc, akloc, keyword, value, guard: Column|None}
    annotations: list = dc_field(default_factory=list)
    # "<kloc>/<kw>: <msg>" per unresolvable reference compiled to a lazy
    # exception node — spec-checking flows treat any entry as a traverse
    # error; data validation leaves them lazy (docs/DEVIATIONS.md)
    static_exceptions: list = dc_field(default_factory=list)


def _spark_schema_from_spec(spec: Any) -> T.StructType | None:
    """Derive a Spark struct schema from a JSON-Schema subschema's type
    annotations, so contentSchema can validate decoded JSON without the
    caller supplying a parallel DDL.  Returns None when the subschema has
    no usable `properties`/`type` info (validation then degrades to
    well-formedness only)."""
    def typ(s: Any) -> T.DataType:
        if not isinstance(s, dict):
            return T.StringType()
        jt = s.get("type")
        if isinstance(jt, list):
            jt = next((x for x in jt if x != "null"), None)
        if jt == "integer":
            return T.LongType()
        if jt == "number":
            return T.DoubleType()
        if jt == "boolean":
            return T.BooleanType()
        if jt == "array":
            return T.ArrayType(typ(s.get("items", {})))
        if jt == "object" or "properties" in s:
            obj = _spark_schema_from_spec(s)
            return obj if obj is not None else T.MapType(T.StringType(), T.StringType())
        return T.StringType()

    if not isinstance(spec, dict) or "properties" not in spec:
        return None
    fields = [T.StructField(name, typ(s)) for name, s in spec["properties"].items()]
    return T.StructType(fields) if fields else None


def compile_spec(
    spec: Any,
    df_schema: T.StructType,
    options: CompileOptions | None = None,
    registry: SchemaRegistry | None = None,
) -> CompiledPlan:
    return ColumnCompiler(spec, df_schema, options, registry).compile()
