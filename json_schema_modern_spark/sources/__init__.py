from json_schema_modern_spark.sources.sequences import (
    SOURCE_DICT_ROWS,
    sequences_df,
    source_dict_df,
)
from json_schema_modern_spark.sources.tableio import TableIO

__all__ = ["sequences_df", "source_dict_df", "SOURCE_DICT_ROWS", "TableIO"]
