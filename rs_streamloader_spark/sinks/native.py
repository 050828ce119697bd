"""Native (Spark-managed) table sink: append / overwrite / keyed
upsert over parquet paths (SURVEY.md §2.2 M1-M5).

The reference's three load modes (lib/RedshiftLoader.ts:267-275,
337-386) re-expressed for a lake table:

- INSERT          → append into the live version directory
- TRUNCATE_INSERT → write a new version, retire the old
- UPSERT          → DELETE-then-INSERT as a relational rewrite:
  ``target ANTI-JOIN updates ON id`` ∪ ``updates``, committed as a new
  version — the plain-parquet stand-in for a Delta ``MERGE INTO``.

Commit protocol: versioned directories ``v_<n>_<uuid>`` where the
commit marker is the ``_SUCCESS`` file Spark's output committer writes
atomically at job completion. Readers resolve the committed version
with the highest ``n`` — there is no pointer file to corrupt and no
rename window: a crash mid-write leaves an uncommitted (ignored)
directory, a crash after commit but before old-version cleanup leaves
two committed versions of which the newer wins deterministically.
Leftover directories are retired on the next successful commit.

Reference upsert semantics are preserved exactly: duplicate ids
*within* a batch all survive (the reference COPYs every temp row into
the target — RedshiftLoader.ts:379-380). ``dedupe='last'`` opts into
the saner latest-wins variant via a ranking window.

Scale: the anti-join shuffles on the id; updates are typically << target,
so AQE broadcasts them. No driver-side row handling anywhere.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_VERSION_RE = re.compile(r"^v_(\d+)_[0-9a-f]+$")


class NativeTableSink:
    """A parquet table rooted at ``{root}``, stored as committed
    version directories (see module docstring for the protocol)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    # ------------------------------------------------------------------
    # version resolution
    # ------------------------------------------------------------------
    def _fs(self, path: str):
        from rs_streamloader_spark.staging import _fs_and_path

        return _fs_and_path(self.spark, path)

    def _committed_versions(self) -> list[tuple[int, str]]:
        """(n, dirname) for every version dir carrying a commit marker
        (``_SUCCESS`` at its root, or — for tables created by
        ``insert_batch`` — inside a batch subdirectory)."""
        fs, root, _ = self._fs(self.root)
        if not fs.exists(root):
            return []
        out = []
        for status in fs.listStatus(root):
            if not status.isDirectory():
                continue
            name = status.getPath().getName()
            m = _VERSION_RE.match(name)
            if not m:
                continue
            vdir = f"{self.root}/{name}"
            fs2, success, _ = self._fs(f"{vdir}/_SUCCESS")
            committed = fs2.exists(success)
            if not committed:
                # tables created by insert()/insert_batch() carry the
                # marker inside their first write subdir
                for sub in fs.listStatus(status.getPath()):
                    if sub.isDirectory():
                        fs3, s3, _ = self._fs(
                            f"{vdir}/{sub.getPath().getName()}/_SUCCESS"
                        )
                        if fs3.exists(s3):
                            committed = True
                            break
            if committed:
                out.append((int(m.group(1)), name))
        return sorted(out)

    def _committed_data_paths(self) -> list[str]:
        """Readable data roots inside the live version: the version
        root itself when it carries a job-level ``_SUCCESS`` (trunc/
        upsert writes), plus every write subdir that carries its own
        marker. Subdirs without a marker are in-flight or crashed
        writes and are never read — this is what makes appends
        crash-consistent rather than partially visible."""
        vdir = self.current_path
        fs, jpath, _ = self._fs(vdir)
        paths = []
        fs2, success, _ = self._fs(f"{vdir}/_SUCCESS")
        if fs2.exists(success):
            paths.append(vdir)
        for status in fs.listStatus(jpath):
            if status.isDirectory():
                sub = status.getPath().getName()
                fs3, s3, _ = self._fs(f"{vdir}/{sub}/_SUCCESS")
                if fs3.exists(s3):
                    paths.append(f"{vdir}/{sub}")
        return paths

    def _live(self) -> tuple[int, str] | None:
        versions = self._committed_versions()
        return versions[-1] if versions else None

    def _new_version_path(self, n: int) -> str:
        return f"{self.root}/v_{n}_{uuid.uuid4().hex[:8]}"

    def _retire_below(self, keep_n: int, keep_name: str) -> None:
        """Delete committed and stale uncommitted dirs older than the
        winner (best-effort; failures leave garbage, never bad reads)."""
        fs, root, _ = self._fs(self.root)
        if not fs.exists(root):
            return
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            m = _VERSION_RE.match(name)
            if m and name != keep_name and int(m.group(1)) <= keep_n:
                fs.delete(status.getPath(), True)

    # ------------------------------------------------------------------
    # public surface
    # ------------------------------------------------------------------
    @property
    def current_path(self) -> str:
        live = self._live()
        if live is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return f"{self.root}/{live[1]}"

    def exists(self) -> bool:
        return self._live() is not None

    def read(self) -> DataFrame:
        # union of committed data roots only — in-flight/crashed append
        # subdirs are invisible; mergeSchema so appends that widened
        # the schema surface every column (missing → NULL)
        paths = self._committed_data_paths()
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def create_table(self, schema, if_not_exists: bool = True) -> None:
        """M6 ``createTable`` (reference README.md:52, unimplemented in
        its lib/): commit an empty version carrying the schema, so
        subsequent reads/appends see the declared columns. No-op when
        the table already exists and ``if_not_exists``."""
        from pyspark.sql.types import StructType

        if self.exists():
            if if_not_exists:
                return
            raise FileExistsError(f"table already exists under {self.root}")
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        empty = self.spark.createDataFrame([], schema)
        empty.write.parquet(self._new_version_path(1))

    def insert(self, df: DataFrame) -> None:
        """M1: append parts to the table (RedshiftLoader.ts:364-366).
        Each append is its own commit subdir (own ``_SUCCESS``), so a
        crash mid-append leaves an ignored directory — never a
        partially visible batch inside a committed version."""
        live = self._live()
        vdir = (
            self._new_version_path(1) if live is None else f"{self.root}/{live[1]}"
        )
        df.write.parquet(f"{vdir}/ins_{uuid.uuid4().hex[:8]}")

    def insert_batch(self, df: DataFrame, batch_id: int) -> None:
        """Idempotent append: each batch owns the subdirectory
        ``batch_<id>`` of the live version and writes it with
        overwrite, so a replayed batch (streaming checkpoint recovery)
        lands exactly once instead of duplicating — the batchId-keyed
        staging contract of SURVEY.md §2.4's exactly-once row."""
        live = self._live()
        vdir = (
            self._new_version_path(1) if live is None else f"{self.root}/{live[1]}"
        )
        df.write.mode("overwrite").parquet(f"{vdir}/batch_{batch_id}")

    def trunc_insert(self, df: DataFrame) -> None:
        """M2: TRUNCATE + COPY ≈ overwrite (RedshiftLoader.ts:367-368)."""
        live = self._live()
        n = 1 if live is None else live[0] + 1
        path = self._new_version_path(n)
        df.write.parquet(path)
        self._retire_below(n, path.rsplit("/", 1)[1])

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
            if not others:
                # id-only updates: nothing to order by — any row of a
                # key is "the" row
                updates = updates.dropDuplicates([id_field])
            else:
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

        live = self._live()
        if live is None:
            merged = updates
            n = 1
            cached = None
        else:
            # updates feeds BOTH the anti-join key side and the union —
            # cache it so the staged source (or an expensive upstream
            # plan) is computed once, not twice, in the write job
            cached = updates.cache()
            target = self.read()
            keep = target.join(
                cached.select(id_field).distinct(), on=id_field, how="left_anti"
            )
            # schema drift between target and updates NULL-fills the
            # gaps (COPY 'auto' semantics) instead of erroring
            merged = keep.unionByName(cached, allowMissingColumns=True)
            n = live[0] + 1

        path = self._new_version_path(n)
        try:
            merged.write.parquet(path)
        finally:
            if cached is not None:
                cached.unpersist()
        self._retire_below(n, path.rsplit("/", 1)[1])
