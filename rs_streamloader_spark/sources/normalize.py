"""Ingestion normalizer: anything → DataFrame (SURVEY.md §2.1 S1-S4).

The reference accepts ``Readable | string | Buffer | AsyncGenerator``
(/root/reference/lib/types.ts:22-23) and converts everything to
newline-delimited JSON on its way to S3
(lib/utils.ts:20-79). The Spark-native equivalents:

- DataFrame            → passthrough (already a plan)
- path str             → ``spark.read`` with the configured format
- str / bytes body     → parsed as JSONL (the reference's wire format)
- list[dict]           → ``createDataFrame``
- iterator / generator → batched ``createDataFrame`` + union, giving
  bounded-memory ingestion analogous to the reference's backpressured
  generator→Readable bridge (utils.ts:41-63)
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

GENERATOR_BATCH_ROWS = 10_000


def _jsonl_to_df(spark: SparkSession, text: str, schema=None) -> DataFrame:
    lines = [ln for ln in text.splitlines() if ln.strip()]
    return spark.createDataFrame([json.loads(ln) for ln in lines], schema=schema)


def _csv_text_to_df(
    spark: SparkSession, text: str, schema=None, copy_settings=None
) -> DataFrame:
    """CSV string body → DataFrame honoring the CSV COPY knobs; the
    reference uploads string bodies verbatim and lets COPY parse them
    per the format settings, so CSV text is part of the contract."""
    lines = [ln for ln in text.splitlines() if ln.strip()]
    reader = spark.read
    if copy_settings is not None:
        if copy_settings.quote is not None:
            reader = reader.option("quote", copy_settings.quote)
        if copy_settings.delimiter is not None:
            reader = reader.option("sep", copy_settings.delimiter)
        if copy_settings.ignore_header:
            reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(spark.sparkContext.parallelize(lines))


def _batched(it: Iterator[dict], size: int) -> Iterator[list[dict]]:
    batch: list[dict] = []
    for row in it:
        batch.append(row)
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch


def to_dataframe(
    spark: SparkSession,
    body: Any,
    fmt: str = "json",
    schema=None,
    copy_settings=None,
) -> DataFrame:
    """Normalize an upload body to a DataFrame (reference
    ``ensureS3BodyAcceptable``, utils.ts:65-79 — except lazy: nothing
    is materialized until the load starts). Path bodies are read with
    the full COPY-knob mapping (sources.copy_reader) when
    ``copy_settings`` is given."""
    if isinstance(body, DataFrame):
        return body
    if isinstance(body, bytes):
        body = body.decode("utf-8")
    if isinstance(body, str):
        if "\n" in body or body.lstrip().startswith("{"):
            # inline text body: parse per the configured COPY format
            # (the reference uploads the string verbatim and COPY
            # parses it — utils.ts:66-68)
            if fmt == "csv":
                return _csv_text_to_df(
                    spark, body, schema=schema, copy_settings=copy_settings
                )
            return _jsonl_to_df(spark, body, schema=schema)
        # otherwise treat as a path readable by Spark
        if copy_settings is not None:
            from rs_streamloader_spark.sources.copy_reader import read_body

            # forward the configured columnMap so reader-level
            # 'auto ignorecase' engages on the Loader path too
            return read_body(
                spark,
                body,
                copy_settings,
                schema=schema,
                column_map=copy_settings.column_map,
            )
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.format(fmt).load(body)
    if isinstance(body, dict):  # a single row object — one record
        return spark.createDataFrame([body], schema=schema)
    if isinstance(body, list):
        return spark.createDataFrame(body, schema=schema)
    if isinstance(body, (Iterator, Iterable)):
        out: DataFrame | None = None
        for batch in _batched(iter(body), GENERATOR_BATCH_ROWS):
            df = spark.createDataFrame(batch, schema=schema)
            # ragged dict keys across batches infer different schemas —
            # align by name, null-filling the gaps
            out = df if out is None else out.unionByName(df, allowMissingColumns=True)
        if out is None:
            raise ValueError("empty generator body")
        return out
    raise TypeError(f"unsupported body type: {type(body)!r}")
