from json_schema_modern_spark.functions.formats import FORMAT_REGEX, format_predicate

__all__ = ["FORMAT_REGEX", "format_predicate"]
