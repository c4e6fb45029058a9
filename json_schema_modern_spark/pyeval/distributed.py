"""Distributed full-JSON validation: the python evaluation tier running
INSIDE Spark executors via ``mapInPandas``.

The compiled Column tier (the fast path) needs a decode schema — a Spark
type the instances round-trip losslessly.  Real corpora carry documents
that have none: JSON null properties, mixed-type arrays, empty objects,
integers beyond int64.  The reference evaluates those per document
(Modern.pm's evaluate); this module is the same per-document model made
horizontal: each executor runs the complete python tier
(``pyeval.full.PyEvaluator`` — 2907/2907 on the vendored acceptance
corpora) over Arrow record batches, no shuffle anywhere, so a 10^12-row
JSON column validates shuffle-free at whatever parallelism the cluster
has.  Throughput is per-document Python (~10-50k docs/s/core depending on
document size) — one to two orders below the codegen'd Column tier —
which is why it is the COVERAGE tier: route the typed bulk through
``validate()``/``validate_json_strings()`` and only the shapeless
remainder through here (the same split the corpus harness applies,
tests/corpus/results/spark-additional-tests.txt).

Scale notes:
- per-EXECUTOR evaluator cache keyed by the registry fingerprint: the
  schema registry builds once per worker process, not per batch;
- the spec rides in the serialized closure (schema documents are KB-sized
  — the same payload the compiled tier broadcasts);
- output is (id columns, _valid, _viols) with the engine-wide violation
  struct, so ``ValidationResult.flag()/basic_output()/violations`` work
  unchanged.  Per-keyword violation detail is the typed tier's feature;
  this tier reports document-level results the way the reference's
  exception Results do (one root-location row per invalid document).
"""

from __future__ import annotations

import json
from typing import Any, Iterator

# per-worker-process cache: fingerprint -> ready PyEvaluator.  Lives for
# the lifetime of the Python worker (Spark reuses workers across batches
# and tasks), so registry construction amortizes to once per executor.
_EVALUATOR_CACHE: dict[str, Any] = {}


def _build_evaluator(blob: str):
    from json_schema_modern_spark.pyeval.full import PyEvaluator

    cfg = json.loads(blob)
    ev = PyEvaluator(validate_formats=cfg["validate_formats"],
                     dialect=cfg["dialect"])
    for uri, schema, dialect in cfg["extra"]:
        ev.registry.add_schema(schema, uri, dialect=dialect)
    root = ev.registry.add_schema(cfg["spec"], cfg.get("root_uri", ""),
                                  dialect=cfg["dialect"])
    return ev, root


def _get_evaluator(key: str, blob: str):
    if key not in _EVALUATOR_CACHE:
        _EVALUATOR_CACHE[key] = _build_evaluator(blob)
    return _EVALUATOR_CACHE[key]


def _exception_viol(error: str, offending: str | None) -> dict:
    return {"instance_location": "", "keyword_location": "",
            "absolute_keyword_location": None, "keyword": "",
            "error": error, "offending_value": offending}


def evaluate_json_column(df, json_col: str, id_cols: list[str],
                         blob: str, key: str):
    """(id columns, _valid, _viols) for every row of ``df`` — full-JSON
    python-tier evaluation, embarrassingly parallel (mapInPandas, zero
    shuffle).  ``blob`` is the JSON-encoded evaluator config
    (spec/extra/dialect/validate_formats), ``key`` its cache fingerprint."""
    import pyspark.sql.types as T

    from json_schema_modern_spark.compiler.column_compiler import _VIOL_ARR

    # per-document evaluation is CPU-bound pure Python: a narrow input
    # (one small parquet file → one partition) would serialize the whole
    # pass onto one core.  Round-robin up to the cluster's parallelism —
    # the shuffle moves only (id, payload) strings and is overlapped by
    # the eval win; at real scale inputs already have >cores partitions
    # and this branch never triggers.  Streaming plans have no static
    # partition count (.rdd is illegal) — the micro-batch engine already
    # parallelizes per source partition, so leave them untouched.
    if not df.isStreaming:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)

    out_fields = [df.schema[c] for c in id_cols]
    out_schema = T.StructType(
        list(out_fields)
        + [T.StructField("_valid", T.BooleanType()),
           T.StructField("_viols", _VIOL_ARR)])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from json_schema_modern_spark.pyeval.full import EvalError
        from json_schema_modern_spark.spec.resolver import SpecError

        ev, root = _get_evaluator(key, blob)
        for pdf in batches:
            valid: list[bool] = []
            viols: list[list[dict] | None] = []
            for payload in pdf[json_col]:
                if payload is None:
                    valid.append(False)
                    viols.append([_exception_viol(
                        "EXCEPTION: invalid JSON string", None)])
                    continue
                try:
                    inst = json.loads(payload)
                except (TypeError, ValueError):
                    valid.append(False)
                    viols.append([_exception_viol(
                        "EXCEPTION: invalid JSON string", str(payload))])
                    continue
                try:
                    ok = ev.evaluate_uri(root, inst)
                except (EvalError, SpecError) as exc:
                    valid.append(False)
                    viols.append([_exception_viol(
                        f"EXCEPTION: {exc}", payload)])
                    continue
                valid.append(bool(ok))
                viols.append([] if ok else [_exception_viol(
                    "document failed schema evaluation (python tier)",
                    payload)])
            out = pdf[id_cols].copy()
            out["_valid"] = pd.Series(valid, index=pdf.index, dtype="bool")
            out["_viols"] = pd.Series(viols, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(run, out_schema)
