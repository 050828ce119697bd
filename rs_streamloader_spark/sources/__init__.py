from rs_streamloader_spark.sources.copy_reader import (
    align_columns,
    apply_time_format,
    enforce_max_error,
    read_body,
    truncate_columns,
)
from rs_streamloader_spark.sources.normalize import to_dataframe

__all__ = [
    "align_columns",
    "apply_time_format",
    "enforce_max_error",
    "read_body",
    "to_dataframe",
    "truncate_columns",
]
