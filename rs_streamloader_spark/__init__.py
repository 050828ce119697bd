"""rs_streamloader_spark — a PySpark-native analytics/loading engine.

A from-scratch reimplementation of the *capabilities* of
OTooleMichael/rs-streamloader (reference: /root/reference, MIT), built
Spark-first:

- ``Loader``: the reference's orchestration surface (insert /
  trunc_insert / upsert, staged part writes + manifest, cleanup
  policies, retries, events) re-expressed over DataFrame writes
  (reference lib/RedshiftLoader.ts).
- ``operators``: the relational surface (joins, aggregations, windows,
  set ops, scalar functions) the reference delegates to Redshift SQL,
  provided natively via Catalyst (SURVEY.md §2.4).
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text
  analysis, multimodal column plumbing — designed for 100 TB scale.
"""

from rs_streamloader_spark.config import (
    CleanupPolicy,
    CopySettings,
    LoaderOptions,
    TableRef,
    merge_options,
    parse_table,
)
from rs_streamloader_spark.errors import LoaderError
from rs_streamloader_spark.loader import Loader, LoaderFactory

__version__ = "0.1.0"

__all__ = [
    "CleanupPolicy",
    "CopySettings",
    "Loader",
    "LoaderError",
    "LoaderFactory",
    "LoaderOptions",
    "TableRef",
    "merge_options",
    "parse_table",
]
