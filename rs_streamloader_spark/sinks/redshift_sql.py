"""Redshift COPY / load-mode SQL generation (SURVEY.md §2.1 S8-S9,
§2.2 M1-M5).

Template-compatible with the reference's ``makeQueries``
(/root/reference/lib/RedshiftLoader.ts:337-393) with two deliberate
fixes: identifiers are quoted against injection (the reference
documents its templates as injectable — README.md:36-38, 239-240) and
the ``aws_iam_rol`` typo in the credentials builder (lib/utils.ts:157)
is corrected.
"""

from __future__ import annotations

from dataclasses import dataclass

from rs_streamloader_spark.config import (
    CopySettings,
    TableRef,
    quote_ident,
)


def create_copy_cred_string(aws: dict) -> str:
    """Credentials clause (lib/utils.ts:151-162; typo fixed)."""
    if aws.get("iam_role"):
        return f"aws_iam_role={aws['iam_role']}"
    parts = [
        f"aws_access_key_id={aws.get('access_key_id', '')}",
        f"aws_secret_access_key={aws.get('secret_access_key', '')}",
    ]
    if aws.get("session_token"):
        parts.append(f"token={aws['session_token']}")
    return ";".join(parts)


def create_format(cs: CopySettings) -> str:
    """FORMAT clause (lib/RedshiftLoader.ts:388-393)."""
    fmt = cs.format.upper()
    if fmt == "JSON":
        if cs.column_map == "jsonpaths" and cs.jsonpaths:
            return f"JSON '{cs.jsonpaths}'"
        return f"JSON '{cs.column_map}'"
    if fmt == "CSV":
        out = "CSV"
        if cs.quote:
            out += f" QUOTE '{cs.quote}'"
        if cs.delimiter:
            out += f" DELIMITER '{cs.delimiter}'"
        if cs.ignore_header:
            out += f" IGNOREHEADER {int(cs.ignore_header)}"
        return out
    return fmt  # AVRO | PARQUET | ORC verbatim


# COPY from columnar formats accepts none of the row-format knobs
# (GZIP/TIMEFORMAT/ENCODING/TRUNCATECOLUMNS/MAXERROR) — Redshift
# rejects the statement outright. The reference appends them
# unconditionally (lib/RedshiftLoader.ts:353-363), which breaks its
# own PARQUET/ORC passthrough; gating them is a deliberate fix, like
# the aws_iam_rol typo.
_COLUMNAR_FORMATS = {"PARQUET", "ORC"}


def copy_sql(
    table: TableRef,
    manifest_url: str,
    cred_string: str,
    cs: CopySettings,
) -> str:
    """COPY statement (lib/RedshiftLoader.ts:353-363)."""
    clauses = [
        f"COPY {table.qualified}",
        f"FROM '{manifest_url}'",
        f"CREDENTIALS AS '{cred_string}'",
        "MANIFEST",
        create_format(cs),
    ]
    if cs.format.upper() not in _COLUMNAR_FORMATS:
        if cs.gzip:
            clauses.append("GZIP")
        if cs.time_format:
            clauses.append(f"TIMEFORMAT '{cs.time_format}'")
        if cs.encoding and cs.encoding != "UTF8":
            clauses.append(f"ENCODING {cs.encoding}")
        if cs.truncate_cols:
            clauses.append("TRUNCATECOLUMNS")
        clauses.append(f"MAXERROR {int(cs.max_error)}")
    return " ".join(clauses) + ";"


@dataclass
class QueryPlan:
    """The reference's planner IR: ``{q: string[], cleanUp?: string}``
    (RedshiftLoader.ts:337-341)."""

    queries: list[str]
    clean_up: str | None = None


def make_queries(
    upload_type: str,
    table: TableRef,
    loading_table: TableRef,
    manifest_url: str,
    cred_string: str,
    cs: CopySettings,
    id_field: str = "id",
    remove_temp_table: bool = True,
) -> QueryPlan:
    """Load-mode plans (RedshiftLoader.ts:337-386).

    INSERT          → [COPY target]                       (:364-366)
    TRUNCATE_INSERT → [TRUNCATE target, COPY target]      (:367-368)
    UPSERT          → transactional staged merge          (:369-384)
    """
    if upload_type == "INSERT":
        return QueryPlan([copy_sql(table, manifest_url, cred_string, cs)])
    if upload_type == "TRUNCATE_INSERT":
        return QueryPlan(
            [
                f"TRUNCATE {table.qualified};",
                copy_sql(table, manifest_url, cred_string, cs),
            ]
        )
    # UPSERT (default branch in the reference)
    tmp = loading_table.qualified
    tgt = table.qualified
    idf = quote_ident(id_field)
    queries = [
        "BEGIN;",
        f"DROP TABLE IF EXISTS {tmp};",
        f"CREATE TABLE {tmp} (LIKE {tgt});",
        copy_sql(loading_table, manifest_url, cred_string, cs),
        f"DELETE FROM {tgt} WHERE {idf} IN (SELECT {idf} FROM {tmp});",
        f"INSERT INTO {tgt} SELECT * FROM {tmp};",
    ]
    if remove_temp_table:
        queries.append(f"DROP TABLE {tmp};")
    queries.append("COMMIT;")
    return QueryPlan(queries, clean_up=f"DROP TABLE IF EXISTS {tmp};")


# M6 createTable: documented in the reference (README.md:52) but never
# implemented in lib/ — supplied here so the loader surface is complete.
# Spark → Redshift type lowering; complex types land in SUPER.
_REDSHIFT_TYPES = {
    "ByteType": "SMALLINT",
    "ShortType": "SMALLINT",
    "IntegerType": "INTEGER",
    "LongType": "BIGINT",
    "FloatType": "REAL",
    "DoubleType": "DOUBLE PRECISION",
    "StringType": "VARCHAR(65535)",
    "BooleanType": "BOOLEAN",
    "TimestampType": "TIMESTAMP",
    "TimestampNTZType": "TIMESTAMP",
    "DateType": "DATE",
    "BinaryType": "VARBYTE",
}


def redshift_type(dt) -> str:
    from pyspark.sql.types import DecimalType

    if isinstance(dt, DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    return _REDSHIFT_TYPES.get(type(dt).__name__, "SUPER")


def create_table_sql(table: TableRef, schema, if_not_exists: bool = True) -> str:
    """``CREATE TABLE`` DDL from a Spark schema (M6). ``schema`` is a
    StructType or DDL string; identifiers quoted like every other
    template here."""
    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    cols = ", ".join(
        f"{quote_ident(f.name)} {redshift_type(f.dataType)}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {ine}{table.qualified} ({cols});"
