"""json_schema_modern_spark — a PySpark-native constraint-validation engine.

A from-scratch, set-oriented reimplementation of the evaluation semantics of
karenetheridge/JSON-Schema-Modern (JSON Schema draft2020-12) over columnar
Spark DataFrames.  Where the reference interprets one JSON document at a time
with a recursive per-keyword tree walk
(/root/reference/lib/JSON/Schema/Modern.pm:691-856), this engine compiles the
schema once on the driver into a DAG of Spark ``Column`` expressions and
evaluates every keyword as a whole-column vectorized pass, letting Catalyst
do predicate pushdown, column pruning and whole-stage codegen.

Public API:

    from json_schema_modern_spark import Validator, get_spark
    v = Validator(spec_dict)
    result = v.validate(df)           # ValidationResult
    result.violations                 # DataFrame (one row per error)
    result.valid_col                  # Column usable in df.withColumn
    result.flag(df)                   # bool — global pass/fail
"""

from json_schema_modern_spark.session import get_spark
from json_schema_modern_spark.validator import ValidationResult, Validator

__all__ = ["Validator", "ValidationResult", "get_spark"]
__version__ = "0.1.0"
