"""Constraint mining: profile columns in one pass, infer a JSON-Schema.

The reference ships the EVALUATE direction only — a schema arrives and
documents are judged against it (JSON::Schema::Modern lib/JSON/Schema/
Modern.pm evaluate/validate).  At 100 TB the schema usually does NOT
arrive: a new batch lands and the pipeline needs constraints derived from
trusted data to screen it.  This module closes that loop Spark-first:

  column_profile  — ONE map-side-combined agg pass over the table
                    (the same never-one-job-per-column shape as
                    stats.column_stats), plus a second bounded pass that
                    harvests enum candidates ONLY for columns the first
                    pass proved low-cardinality — collect_set is never
                    evaluated on a high-cardinality column, so the agg
                    state stays O(max_enum) per column at any row count.
  infer_schema    — profile rows → a draft2020-12 schema dict (type /
                    required / minimum / maximum / minLength / maxLength /
                    enum), consumable by the package's own compiler.
  mined_schema    — sample-profile → screen workflow: mine constraints
                    from a trusted split and return the schema ready for
                    Validator(...).validate(rest) — violation rows carry
                    the standard keyword / instance-location shape, so a
                    mined schema is indistinguishable downstream from an
                    authored one.

Scale notes: the only driver-side materialization is the profile itself —
O(columns) rows with enum lists capped at max_enum — never row data.  The
profile pass shuffles per-partition partial states only (O(partitions)).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUM_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
              T.FloatType, T.DoubleType, T.DecimalType)
_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _json_type(dt: T.DataType) -> str:
    if isinstance(dt, _INT_TYPES):
        return "integer"
    if isinstance(dt, _NUM_TYPES):
        return "number"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    return "string"


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    max_enum: int = 16,
    exact_distinct: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """(column, inferred_type, n_rows, null_count, min, max, distinct_count,
    min_length, max_length, enum_vals) — one row per column.

    Pass 1 is a single agg (map-side combine; the shuffle carries one
    partial-state row per partition).  distinct_count uses Spark's HLL++
    sketch by default (`approx_count_distinct`, rsd) — `exact_distinct=True`
    swaps in count(DISTINCT) for oracle-exact comparisons.  min/max are
    taken in the column's NATIVE ordering and cast to string only for the
    unified output row.  min_length/max_length are codepoint lengths,
    string columns only (the semantics of minLength/maxLength,
    column_compiler.py:969-973).

    Pass 2 harvests enum candidates ONLY for string columns whose pass-1
    distinct estimate clears max_enum (HLL widened by 3·rsd so a sketch
    under-estimate cannot smuggle a high-cardinality column into
    collect_set); it aggregates sort_array(collect_set(col)) for those
    columns alone — bounded state, deterministic order — and a final
    length(...) <= max_enum re-check discards any column the widened
    sketch still missed.  Columns that skip pass 2 report enum_vals NULL.
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    total = F.count(F.lit(1))
    aggs = [total.alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"{c}__dist"))
        else:
            aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__dist"))
        if isinstance(schema[c], T.StringType):
            aggs.append(F.min(F.length(col)).alias(f"{c}__lmin"))
            aggs.append(F.max(F.length(col)).alias(f"{c}__lmax"))
    wide = df.agg(*aggs).collect()[0].asDict()  # O(columns) scalars

    # pass 2: enum candidates, gated on the pass-1 cardinality evidence
    margin = 1.0 if exact_distinct else 1.0 + 3.0 * rsd
    enum_cols = [
        c for c in cols
        if isinstance(schema[c], T.StringType)
        and wide[f"{c}__dist"] <= max_enum * margin
    ]
    enum_vals: dict[str, list[str]] = {}
    if enum_cols:
        row = df.agg(*[
            F.sort_array(F.collect_set(F.col(c))).alias(c) for c in enum_cols
        ]).collect()[0].asDict()
        enum_vals = {c: v for c, v in row.items() if len(v) <= max_enum}

    out = []
    for c in cols:
        out.append((
            c,
            _json_type(schema[c]),
            int(wide["_n"]),
            int(wide[f"{c}__nulls"]),
            wide[f"{c}__min"],
            wide[f"{c}__max"],
            int(wide[f"{c}__dist"]),
            wide.get(f"{c}__lmin"),
            wide.get(f"{c}__lmax"),
            enum_vals.get(c),
        ))
    return df.sparkSession.createDataFrame(
        out,
        "column string, inferred_type string, n_rows bigint, null_count bigint, "
        "min string, max string, distinct_count bigint, "
        "min_length int, max_length int, enum_vals array<string>",
    )


def infer_schema(
    df: DataFrame,
    columns: list[str] | None = None,
    max_enum: int = 16,
    exact_distinct: bool = False,
    numeric_bounds: bool = True,
    string_lengths: bool = False,
) -> dict[str, Any]:
    """Mine a draft2020-12 schema dict from the data: per column its JSON
    type (nullable columns get the [t, "null"] union), numeric
    minimum/maximum from the observed range, optional minLength/maxLength,
    and enum for low-cardinality string columns; required lists every
    column with zero observed NULLs.  The result compiles through the
    package's own Validator — a mined schema is downstream-identical to an
    authored one (the reverse direction of the reference's evaluate,
    Modern.pm; mining has no reference analogue)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    prof = column_profile(df, columns=columns, max_enum=max_enum,
                          exact_distinct=exact_distinct).collect()
    props: dict[str, Any] = {}
    required: list[str] = []
    for r in prof:
        dt = schema[r.column]
        sub: dict[str, Any] = {}
        t = r.inferred_type
        sub["type"] = t if r.null_count == 0 else [t, "null"]
        if r.null_count == 0:
            required.append(r.column)
        if numeric_bounds and t in ("integer", "number") and r.min is not None:
            cast = int if t == "integer" else float
            sub["minimum"], sub["maximum"] = cast(r.min), cast(r.max)
        if r.enum_vals is not None:
            sub["enum"] = list(r.enum_vals) + (
                [None] if r.null_count > 0 else [])
        elif string_lengths and t == "string" and r.min_length is not None:
            sub["minLength"], sub["maxLength"] = r.min_length, r.max_length
        props[r.column] = sub
    return {"type": "object", "properties": props, "required": required}


def mined_schema(
    train: DataFrame,
    columns: list[str] | None = None,
    **kw: Any,
) -> dict[str, Any]:
    """Sample-profile → screen: mine constraints from a trusted split and
    return the schema for Validator(mined).validate(rest).  The profile
    is the only driver-side data (O(columns), enum lists ≤ max_enum)."""
    return infer_schema(train, columns=columns, **kw)
