"""Configuration layer: options dataclasses, 3-layer default merge,
table-name parsing, staging-name generation.

Contracts mirrored from the reference:

- 3-layer default merge (library defaults ← factory defaults ←
  per-job options) with ``copy_settings`` deep-merged —
  /root/reference/lib/utils.ts:99-138.
- Table-name parsing: ``"schema.table"`` splits on the first ``.``;
  bare names get empty schema; a partial ``loading_table`` inherits
  missing fields from the target — utils.ts:139-149,
  lib/RedshiftLoader.ts:67-74.
- Job identity: a ``job_time`` timestamp (reference format
  ``yyyyLLdd_HHmmss``, RedshiftLoader.ts:10-12, 66) plus per-part
  UUIDs; staged part key ``{prefix}{job_time}_prt_{i}_{uuid}.txt``
  (RedshiftLoader.ts:146) and staging table
  ``{table}_temp_{job_time}_{uuid}`` (RedshiftLoader.ts:343-350).
- Cleanup policy ``ALWAYS | SUCCESS | NEVER`` with boolean aliases
  (True→ALWAYS, False→NEVER) — lib/types.ts:63, lib/utils.ts:105.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass, field, replace
from datetime import datetime, timezone
from enum import Enum
from typing import Any, Callable, Union


class CleanupPolicy(str, Enum):
    ALWAYS = "ALWAYS"
    SUCCESS = "SUCCESS"
    NEVER = "NEVER"

    @classmethod
    def coerce(cls, value: "CleanupPolicy | str | bool | None") -> "CleanupPolicy":
        """Accept enum, string, or the reference's boolean aliases
        (types.ts:63: ``true``→ALWAYS, ``false``→NEVER)."""
        if value is None:
            return cls.SUCCESS
        if isinstance(value, cls):
            return value
        if isinstance(value, bool):
            return cls.ALWAYS if value else cls.NEVER
        try:
            return cls(str(value).upper())
        except ValueError as exc:
            raise ValueError(f"invalid s3_cleanup policy: {value!r}") from exc


@dataclass(frozen=True)
class TableRef:
    """Parsed table identifier (types.ts:15-20)."""

    table: str
    schema: str = ""

    @property
    def qualified(self) -> str:
        """Qualified name, quoted against identifier injection — the
        reference documents its templates as injectable
        (README.md:36-38, 239-240); we harden instead."""
        if self.schema:
            return f"{quote_ident(self.schema)}.{quote_ident(self.table)}"
        return quote_ident(self.table)

    @property
    def dotted(self) -> str:
        return f"{self.schema}.{self.table}" if self.schema else self.table


_IDENT_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# Common SQL/Redshift reserved words that pass the bare-identifier
# regex but break generated statements when emitted unquoted ('COPY
# order ...'). Not exhaustive — exotic names still quote via the regex
# path; this catches the ones people actually name tables/columns.
_RESERVED = frozenset(
    """
    all and any as asc between by case cast check column constraint
    create cross current_date current_time default delete desc distinct
    drop else end except exists false for foreign from full group
    having in inner insert intersect into is join left like limit
    natural not null of offset on or order outer primary references
    right select table then to true union unique update user using
    values when where with
    """.split()
)


def quote_ident(name: str) -> str:
    """Quote an SQL identifier unless it is already a safe bare name
    (and not a reserved word)."""
    if _IDENT_OK.match(name) and name.lower() not in _RESERVED:
        return name
    return '"' + name.replace('"', '""') + '"'


TableNameLike = Union[str, TableRef, dict]


def parse_table(name: TableNameLike) -> TableRef:
    """``"s.t"`` → TableRef(t, s); bare → empty schema; dict/TableRef
    passthrough (utils.ts:139-149)."""
    if isinstance(name, TableRef):
        return name
    if isinstance(name, dict):
        return TableRef(table=name["table"], schema=name.get("schema", ""))
    if not isinstance(name, str) or not name:
        raise ValueError(f"invalid table name: {name!r}")
    if "." in name:
        schema, table = name.split(".", 1)
        return TableRef(table=table, schema=schema)
    return TableRef(table=name)


def resolve_loading_table(
    target: TableRef, loading: TableNameLike | None
) -> TableRef:
    """Loading (staging) table inherits missing fields from the target
    (RedshiftLoader.ts:67-74, 258-266). With no loading table given, a
    unique per-job staging name is derived at load time instead."""
    if loading is None:
        return target
    ref = parse_table(loading)
    if not ref.schema and target.schema:
        ref = replace(ref, schema=target.schema)
    return ref


def job_time(now: datetime | None = None) -> str:
    """Reference format ``yyyyLLdd_HHmmss`` (RedshiftLoader.ts:10-12)."""
    now = now or datetime.now(timezone.utc)
    return now.strftime("%Y%m%d_%H%M%S")


def staging_table_name(target: TableRef, jtime: str | None = None) -> TableRef:
    """``{table}_temp_{job_time}_{uuid}`` (RedshiftLoader.ts:343-350)."""
    jtime = jtime or job_time()
    suffix = uuid.uuid4().hex[:8]
    return TableRef(table=f"{target.table}_temp_{jtime}_{suffix}", schema=target.schema)


def part_key(prefix: str, jtime: str, i: int) -> str:
    """``{prefix}{jobTime}_prt_{i}_{uuid}.txt`` (RedshiftLoader.ts:146)."""
    return f"{prefix}{jtime}_prt_{i}_{uuid.uuid4().hex}.txt"


@dataclass(frozen=True)
class CopySettings:
    """COPY-format knobs (types.ts:24-50). On the Spark-native path
    these map to reader/writer options; on the Redshift sink they are
    rendered into the COPY statement (RedshiftLoader.ts:351-363,
    388-393)."""

    format: str = "JSON"  # JSON | AVRO | CSV | PARQUET | ORC
    gzip: bool = False
    time_format: str = "auto"  # auto | epochsecs | epochmillisecs | <pattern>
    max_error: int = 0
    truncate_cols: bool = False
    column_map: str = "auto"  # auto | auto ignorecase | jsonpaths
    jsonpaths: str | None = None
    quote: str | None = None
    delimiter: str | None = None
    ignore_header: int = 0
    encoding: str = "UTF8"

    def merged_with(self, overrides: "CopySettings | dict | None") -> "CopySettings":
        """Deep-merge semantics of the reference's ``copySettings``
        (utils.ts:119-138): override fields win, unset fields keep the
        base value.

        A DICT override deep-merges (only the provided keys change); a
        ``CopySettings`` INSTANCE is a full replacement — a frozen
        dataclass cannot distinguish untouched fields from fields
        explicitly set to their default, so an instance is taken as
        the complete, authoritative settings object. Use dicts for
        layered partial overrides."""
        if overrides is None:
            return self
        if isinstance(overrides, CopySettings):
            overrides = overrides.__dict__
        unknown = [k for k in overrides if k not in self.__dict__]
        if unknown:
            # same contract as merge_options' top-level check — a typo
            # like 'maxerror' must not silently keep the default
            raise ValueError(f"unknown copy_settings key(s): {unknown}")
        return replace(self, **overrides)


FilePrefix = Union[str, Callable[..., str]]


class _Unset:
    """Sentinel distinguishing 'field never set on this layer' from a
    field explicitly set to a value that happens to equal the library
    default — the distinction JS object layers get for free
    (utils.ts:119-138) and a plain dataclass default cannot express."""

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return "<UNSET>"


UNSET: Any = _Unset()

# Library defaults (layer 0 of the merge). Field comments cite the
# reference defaults they mirror.
LIB_DEFAULTS: dict[str, Any] = {
    "table": None,
    "loading_table": None,
    "id_field": "id",  # utils.ts:101
    "s3_bucket": None,
    "file_prefix": "",  # str or fn(loader)->str (types.ts:55)
    "s3_cleanup": CleanupPolicy.SUCCESS,
    "remove_temp_table": True,  # utils.ts:102
    "debug": False,
    "max_retries": 4,  # core.ts:13
    "backoff_base_s": 1.0,  # core.ts:50 (1000·3^n ms)
    "backoff_factor": 3.0,
    # Spark-native knobs (no reference analogue):
    "staging_format": "json",  # staged parts: json (reference JSONL) | parquet
    "max_records_per_file": 100_000,  # split heuristic README.md:360-366
    "aws": None,  # explicit credentials (RedshiftLoader.ts:80-91)
}


@dataclass
class LoaderOptions:
    """Per-job options (types.ts:24-83), layered per utils.ts:119-138.
    Untouched fields stay UNSET so a later merge knows the user never
    set them; ``merge_options`` resolves everything to concrete values
    (the object the Loader actually consumes)."""

    table: TableNameLike | None = UNSET
    loading_table: TableNameLike | None = UNSET
    id_field: str = UNSET
    s3_bucket: str | None = UNSET
    file_prefix: FilePrefix = UNSET
    s3_cleanup: CleanupPolicy | str | bool = UNSET
    remove_temp_table: bool = UNSET
    debug: bool = UNSET
    copy_settings: CopySettings = UNSET
    max_retries: int = UNSET
    backoff_base_s: float = UNSET
    backoff_factor: float = UNSET
    staging_format: str = UNSET
    max_records_per_file: int = UNSET
    aws: dict | None = UNSET


def merge_options(
    options: LoaderOptions | dict | None,
    defaults: LoaderOptions | dict | None = None,
) -> LoaderOptions:
    """3-layer merge: library defaults ← ``defaults`` ← ``options``,
    with ``copy_settings`` deep-merged (utils.ts:119-138). Explicitly
    set fields win even when they equal a library default."""
    merged: dict[str, Any] = {}
    cs = CopySettings()
    for layer in (defaults, options):
        if layer is None:
            continue
        if isinstance(layer, LoaderOptions):
            layer = {k: v for k, v in layer.__dict__.items() if v is not UNSET}
        layer = dict(layer)
        layer_cs = layer.pop("copy_settings", None)
        unknown = [k for k in layer if k not in LIB_DEFAULTS]
        if unknown:
            raise ValueError(f"unknown loader option(s): {unknown}")
        merged.update(layer)
        cs = cs.merged_with(layer_cs)
    resolved = {**LIB_DEFAULTS, **merged}
    resolved["s3_cleanup"] = CleanupPolicy.coerce(resolved["s3_cleanup"])
    out = LoaderOptions(**resolved)
    out.copy_settings = cs
    return out
