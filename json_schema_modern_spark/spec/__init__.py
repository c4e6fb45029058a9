from json_schema_modern_spark.spec.resolver import SchemaRegistry, SpecError

__all__ = ["SchemaRegistry", "SpecError"]
