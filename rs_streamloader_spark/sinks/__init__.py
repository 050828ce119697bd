from rs_streamloader_spark.sinks.native import NativeTableSink
from rs_streamloader_spark.sinks.redshift import RedshiftSink
from rs_streamloader_spark.sinks.redshift_sql import make_queries
from rs_streamloader_spark.sinks.transaction import transaction_query

__all__ = ["NativeTableSink", "RedshiftSink", "make_queries", "transaction_query"]
