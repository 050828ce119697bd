"""Registry of named queries with optional DuckDB oracle SQL.

Each operator the engine claims (SURVEY.md §2) registers here as a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus,
when SQL-expressible, an equivalent ANSI-SQL oracle string DuckDB can
run over the same parquet tables. The driver's correctness gate
compares the two at sf=0.01 (row count + schema + order-insensitive
value hash), so every computed column is aliased identically on both
sides and doubles are rounded identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: Optional[str]  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register ``fn`` as query ``name`` with DuckDB
    ``oracle`` SQL (None → non-SQL-expressible, rows-only check)."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap
