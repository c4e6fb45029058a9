"""Metaschema self-validation: the ``validate_schema`` flow.

Mirrors the reference's ``validate_schema`` (Modern.pm:491-511): first the
candidate schema is evaluated AS INSTANCE DATA against its declared
metaschema (``$schema``, else the engine default draft2020-12) using the
pure-Python evaluator — schemas are small documents, so the recursive
driver-side tier is the right executor, exactly like the reference runs
this through its ordinary ``evaluate``.  Only if that passes does the
traverse pass run (SchemaRegistry walk: $id/$anchor/$ref/$vocabulary
well-formedness) — "the traversal pass will validate all constraints that
weren't handled by the metaschema" (Modern.pm:504).

The metaschemas themselves are the official json-schema.org documents
bundled under ``spec/metaschemas/`` (the reference ships the same files in
share/ — METASCHEMA_URIS, Modern.pm:60-67).

No Spark imports — unit-testable standalone and usable from the CLI
driver before any cluster work starts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from importlib import resources as _ilres
from typing import Any

from json_schema_modern_spark.pyeval.full import EvalError, PyEvaluator
from json_schema_modern_spark.spec.resolver import SchemaRegistry, SpecError

# dialect key -> (metaschema root URI, bundled files) — Modern.pm:60-67
METASCHEMA_URIS = {
    "2020-12": "https://json-schema.org/draft/2020-12/schema",
    "2019-09": "https://json-schema.org/draft/2019-09/schema",
    "7": "http://json-schema.org/draft-07/schema",
    "6": "http://json-schema.org/draft-06/schema",
    "4": "http://json-schema.org/draft-04/schema",
}
_URI_TO_DIALECT = {u: d for d, u in METASCHEMA_URIS.items()}
# trailing empty fragment is the same resource (draft-0x $ids carry '#')
_URI_TO_DIALECT.update({u + "#": d for d, u in METASCHEMA_URIS.items()})

_BUNDLE_DIRS = {
    "2020-12": "draft2020-12",
    "2019-09": "draft2019-09",
    "7": "draft7",
    "6": "draft6",
    "4": "draft4",
}

DEFAULT_DIALECT = "2020-12"

_evaluators: dict[str, PyEvaluator] = {}


def _bundle_root():
    return _ilres.files("json_schema_modern_spark.spec") / "metaschemas"


def metaschema_evaluator(dialect: str = DEFAULT_DIALECT) -> PyEvaluator:
    """A PyEvaluator preloaded with the bundled metaschema documents for
    `dialect` (the vocabulary metaschemas of 2019-09/2020-12 register as
    their own $id'd resources, so the root schema's absolute $refs
    resolve).  Cached per dialect — the reference similarly registers the
    share/ documents once per evaluator instance."""
    if dialect not in _BUNDLE_DIRS:
        raise SpecError(f"unknown specification dialect {dialect!r}")
    ev = _evaluators.get(dialect)
    if ev is None:
        # metaschema formats are annotation-only at this tier: 2020-12
        # binds format-annotation (no assertion), and the traverse pass
        # owns URI well-formedness — matching the reference, where
        # validate_schema's metaschema run does not hard-assert formats
        ev = PyEvaluator(validate_formats=False, dialect=dialect)
        root = _bundle_root() / _BUNDLE_DIRS[dialect]
        files = [root / "schema.json"]
        meta = root / "meta"
        if meta.is_dir():
            files.extend(sorted(meta.iterdir(), key=lambda p: p.name))
        # the official output-format schema ships alongside the
        # metaschemas (reference CACHED_METASCHEMAS, Modern.pm:1064,1073:
        # ".../output/schema" → share/draftX/output/schema.json), so
        # user $refs to the output-schema URI resolve
        out = root / "output" / "schema.json"
        if out.is_file():
            files.append(out)
        for f in files:
            ev.add_schema(json.loads(f.read_text()))
        _evaluators[dialect] = ev
    return ev


def validate_output_document(doc: Any,
                             dialect: str = DEFAULT_DIALECT) -> "SchemaValidationResult":
    """Self-hosting check of a validation-output document (the parsed
    JSON of one `basic_output()` / `strict_basic_output()` row) against
    the OFFICIAL output-format schema bundled from the reference's
    share/draft{2020-12,2019-09}/output/schema.json — the same documents
    the reference registers at Modern.pm:1064/1073."""
    if dialect not in ("2020-12", "2019-09"):
        raise SpecError(
            f"no output-format schema is published for dialect {dialect!r}")
    ev = metaschema_evaluator(dialect)
    uri = f"https://json-schema.org/draft/{dialect}/output/schema"
    try:
        ok = ev.evaluate_uri(uri, doc)
    except EvalError as e:
        return SchemaValidationResult(valid=False, errors=[str(e)])
    return SchemaValidationResult(
        valid=bool(ok),
        errors=[] if ok else [f"document does not match {uri}"])


@dataclass
class SchemaValidationResult:
    """validate_schema outcome: the reference's Result reduced to what the
    driver tier reports (valid flag + stringified errors)."""

    valid: bool
    errors: list[str] = field(default_factory=list)

    def __bool__(self) -> bool:
        return self.valid


def dialect_of(schema: Any, default: str = DEFAULT_DIALECT) -> str:
    """Dialect key for a schema document ($schema, else the default)."""
    if isinstance(schema, dict) and isinstance(schema.get("$schema"), str):
        d = _URI_TO_DIALECT.get(schema["$schema"])
        if d is None:
            raise SpecError(
                f"custom metaschema {schema['$schema']!r} is not registered")
        return d
    return default


def validate_schema(schema: Any,
                    default_dialect: str = DEFAULT_DIALECT) -> SchemaValidationResult:
    """Is `schema` itself a valid schema document?  Two passes, in the
    reference's order (Modern.pm:491-511):

    1. evaluate `schema` as an instance against its metaschema
       ($schema-declared, else `default_dialect`'s) with the bundled
       official metaschema documents;
    2. the traverse pass (registry walk) for constraints the metaschema
       cannot express: $id/$anchor/$ref URI well-formedness, duplicate
       anchors, $vocabulary shape (t/invalid-schemas semantics).
    """
    if isinstance(schema, bool):
        return SchemaValidationResult(True)
    if not isinstance(schema, dict):
        return SchemaValidationResult(
            False, [f"schema must be object or boolean, "
                    f"got {type(schema).__name__}"])

    try:
        dialect = dialect_of(schema, default_dialect)
    except SpecError as exc:
        return SchemaValidationResult(False, [str(exc)])

    try:
        ev = metaschema_evaluator(dialect)
        ok = ev.evaluate_uri(METASCHEMA_URIS[dialect], schema)
    except (SpecError, EvalError) as exc:
        return SchemaValidationResult(False, [f"EXCEPTION: {exc}"])
    if not ok:
        return SchemaValidationResult(
            False, [f"schema is not valid against metaschema "
                    f"{METASCHEMA_URIS[dialect]!r}"])

    try:
        SchemaRegistry().add_schema(schema, "tag:validate-schema:root",
                                    dialect=dialect)
    except SpecError as exc:
        return SchemaValidationResult(False, [str(exc)])

    return SchemaValidationResult(True)
