"""Metaschema self-validation (the validate_schema flow, Modern.pm:491-511)
plus the reference's own invalid-schemas corpus.

``tests/corpus/invalid-schemas/`` is a verbatim vendored copy of
``/root/reference/t/invalid-schemas/*.json`` — acceptance-format data files
whose schemas are all MALFORMED: the reference runs them through the
ordinary evaluate path for draft2019-09 and draft2020-12
(t/invalid-schemas.t) and every test must come back invalid because the
schema is rejected at traverse/evaluation time, never because the data
failed a keyword.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from json_schema_modern_spark.pyeval.full import EvalError, PyEvaluator
from json_schema_modern_spark.pyeval.metaschema import (
    METASCHEMA_URIS,
    metaschema_evaluator,
    validate_schema,
)
from json_schema_modern_spark.spec.resolver import SpecError

CORPUS = pathlib.Path(__file__).parent / "corpus" / "invalid-schemas"
FILES = sorted(CORPUS.glob("*.json"))


# ---------------------------------------------------------------------------
# tier 1: the corpus through the evaluate path (invalid-schemas.t semantics)


@pytest.mark.parametrize("dialect", ["2019-09", "2020-12"])
@pytest.mark.parametrize("path", FILES, ids=[p.stem for p in FILES])
def test_invalid_schemas_corpus(path, dialect):
    mismatches = []
    for gi, group in enumerate(json.loads(path.read_text())):
        ev = PyEvaluator(validate_formats=True, dialect=dialect)
        uri = f"https://corpus.invalid/{path.stem}/{gi}"
        add_err = None
        try:
            root = ev.add_schema(group["schema"], uri)
        except (SpecError, EvalError) as exc:
            add_err = str(exc)  # exception Result: every test is invalid
        for test in group["tests"]:
            if add_err is not None:
                got = False
            else:
                try:
                    got = ev.evaluate_uri(root, test["data"])
                except (SpecError, EvalError):
                    got = False
            if got is not test["valid"]:
                mismatches.append(
                    f"[{group['description']}] / [{test['description']}]: "
                    f"want {test['valid']}, got {got}")
    assert not mismatches, "\n".join(mismatches)


def test_corpus_complete():
    n = sum(len(g["tests"]) for p in FILES for g in json.loads(p.read_text()))
    assert len(FILES) == 3 and n >= 8, (len(FILES), n)


# ---------------------------------------------------------------------------
# tier 2: validate_schema — schema-as-instance against the bundled
# metaschema, then the traverse pass


def test_corpus_schemas_fail_validate_schema():
    """Every schema in the invalid-schemas corpus is rejected by
    validate_schema (either tier)."""
    survivors = []
    for path in FILES:
        for gi, group in enumerate(json.loads(path.read_text())):
            if validate_schema(group["schema"]).valid:
                survivors.append(f"{path.stem}#{gi}: {group['description']}")
    assert not survivors, "\n".join(survivors)


VALID = [
    True,
    {},
    {"type": "object", "properties": {"a": {"type": "integer"}}},
    {"$schema": "https://json-schema.org/draft/2020-12/schema",
     "$id": "https://example.com/x", "type": "string"},
    # array-form items is legal under its own dialect...
    {"$schema": "http://json-schema.org/draft-07/schema#",
     "items": [{"type": "string"}], "additionalItems": False},
    # ...as is draft4's boolean exclusiveMinimum
    {"$schema": "http://json-schema.org/draft-04/schema#",
     "minimum": 3, "exclusiveMinimum": True},
    {"$schema": "https://json-schema.org/draft/2019-09/schema",
     "$recursiveAnchor": True, "type": "object"},
    # the 2020-12 metaschema validates ITSELF
    json.loads((pathlib.Path(__file__).parents[1] / "json_schema_modern_spark"
                / "spec" / "metaschemas" / "draft2020-12"
                / "schema.json").read_text()),
]

INVALID = [
    "not a schema",
    {"type": None},
    {"type": ["string", None]},
    {"type": "unicorn"},
    {"minimum": "5"},
    {"required": "name"},
    {"properties": {"x": {"pattern": 5}}},
    {"items": [{"type": "string"}]},          # array form invalid in 2020-12
    {"exclusiveMinimum": True},               # boolean form invalid in 2020-12
    {"$defs": {"a": {"$anchor": "x"}, "b": {"$anchor": "x"}}},  # traverse tier
    {"$defs": {"foo": {"$ref": "http://foo^bar/path"}}},
    {"$vocabulary": {"https://foo.com": "not-bool"}},
    {"$schema": "https://my.custom/metaschema"},  # unregistered metaschema
    {"unevaluatedProperties": 5},
    {"pattern": "["},                             # regex syntax at traverse
    {"patternProperties": {"(": {}}},
]


@pytest.mark.parametrize("schema", VALID,
                         ids=[f"valid{i}" for i in range(len(VALID))])
def test_validate_schema_accepts(schema):
    res = validate_schema(schema)
    assert res.valid, res.errors


@pytest.mark.parametrize("schema", INVALID,
                         ids=[f"invalid{i}" for i in range(len(INVALID))])
def test_validate_schema_rejects(schema):
    res = validate_schema(schema)
    assert not res.valid
    assert res.errors


def test_bundled_metaschemas_register():
    """Every bundled dialect's metaschema loads and registers under its
    canonical URI (Modern.pm METASCHEMA_URIS)."""
    for dialect, uri in METASCHEMA_URIS.items():
        ev = metaschema_evaluator(dialect)
        assert uri in ev.registry.resources, (dialect, uri)


def test_errors_reported_not_raised():
    res = validate_schema({"$defs": {"bad": {"$ref": "https://ಠ_ಠ.com"}}})
    assert not res.valid
    assert any("URI-reference" in e for e in res.errors)
