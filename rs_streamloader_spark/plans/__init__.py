from rs_streamloader_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
    "wholestage_codegen_spans",
]
