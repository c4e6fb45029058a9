from json_schema_modern_spark.compiler.column_compiler import (
    CompiledPlan,
    CompileOptions,
    compile_spec,
)

__all__ = ["CompiledPlan", "CompileOptions", "compile_spec"]
