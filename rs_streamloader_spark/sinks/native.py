"""Native (Spark-managed) table sink: append / overwrite / keyed
upsert over parquet paths (SURVEY.md §2.2 M1-M5).

The reference's three load modes (lib/RedshiftLoader.ts:267-275,
337-386) re-expressed for a lake table:

- INSERT          → ``mode("append")``
- TRUNCATE_INSERT → ``mode("overwrite")``
- UPSERT          → DELETE-then-INSERT as a relational rewrite:
  ``target ANTI-JOIN updates ON id`` ∪ ``updates``, committed by
  versioned-directory swap (staging write + atomic pointer flip), the
  plain-parquet stand-in for a Delta ``MERGE INTO``.

Reference upsert semantics are preserved exactly: duplicate ids
*within* a batch all survive (the reference COPYs every temp row into
the target — RedshiftLoader.ts:379-380). ``dedupe='last'`` opts into
the saner latest-wins variant via a ranking window.

Scale: the anti-join shuffles on the id; updates are typically << target,
so AQE broadcasts them. No driver-side row handling anywhere.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class NativeTableSink:
    """A parquet table rooted at ``{root}/current`` with versioned
    commits for atomic replace."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    @property
    def current_path(self) -> str:
        return f"{self.root}/current"

    def exists(self) -> bool:
        from rs_streamloader_spark.staging import _fs_and_path

        fs, jpath, _ = _fs_and_path(self.spark, self.current_path)
        return bool(fs.exists(jpath))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.current_path)

    def insert(self, df: DataFrame) -> None:
        """M1: append parts to the table (RedshiftLoader.ts:364-366)."""
        df.write.mode("append").parquet(self.current_path)

    def trunc_insert(self, df: DataFrame) -> None:
        """M2: TRUNCATE + COPY ≈ overwrite (RedshiftLoader.ts:367-368)."""
        df.write.mode("overwrite").parquet(self.current_path)

    def upsert(self, updates: DataFrame, id_field: str = "id", dedupe: str | None = None) -> None:
        """M3: keyed upsert (RedshiftLoader.ts:369-384).

        ``dedupe=None`` replicates reference semantics (all update rows
        land, even duplicate ids); ``dedupe='last'`` keeps one row per
        id via a ranking window (latest physical order wins is
        undefined in the reference, so we require a deterministic
        variant: the max over remaining columns' struct).
        """
        if dedupe == "last":
            others = [c for c in updates.columns if c != id_field]
            w = Window.partitionBy(id_field).orderBy(
                *[F.col(c).desc_nulls_last() for c in others]
            )
            updates = (
                updates.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        elif dedupe is not None:
            raise ValueError(f"unknown dedupe mode: {dedupe!r}")

        if not self.exists():
            merged = updates
        else:
            target = self.read()
            keep = target.join(
                updates.select(id_field).distinct(), on=id_field, how="left_anti"
            )
            merged = keep.unionByName(updates)

        # versioned commit: write to a fresh dir, then flip the pointer
        version_path = f"{self.root}/v_{uuid.uuid4().hex}"
        merged.write.mode("errorifexists").parquet(version_path)
        self._swap(version_path)

    def _swap(self, new_path: str) -> None:
        from rs_streamloader_spark.staging import _fs_and_path

        fs, cur, jvm = _fs_and_path(self.spark, self.current_path)
        hadoop_path = jvm.org.apache.hadoop.fs.Path
        if fs.exists(cur):
            old = hadoop_path(f"{self.root}/old_{uuid.uuid4().hex}")
            fs.rename(cur, old)
            fs.rename(hadoop_path(new_path), cur)
            fs.delete(old, True)
        else:
            fs.rename(hadoop_path(new_path), cur)
