from rs_streamloader_spark.sources.normalize import to_dataframe

__all__ = ["to_dataframe"]
