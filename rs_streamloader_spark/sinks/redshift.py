"""Redshift COPY sink: the reference's full load path re-expressed as
a pluggable Loader sink (SURVEY.md §3.2 steps 4-5).

The Spark job stages partitioned parts + a COPY manifest (staging.py);
this sink then drives the warehouse side exactly like the reference:
``makeQueries`` template SQL (sinks/redshift_sql.py, byte-compatible
with /root/reference/lib/RedshiftLoader.ts:337-386) executed through
the transactional runner with backoff retry and stl_load_errors
introspection (sinks/transaction.py ≈ lib/core.ts). The pool is
duck-typed (``PoolLike``), so tests — and any pg driver — plug in the
same way the reference's jest specs fake ``pg.Pool``
(lib/RedshiftLoader.spec.ts:69-77).
"""

from __future__ import annotations

from rs_streamloader_spark.config import (
    CopySettings,
    TableNameLike,
    TableRef,
    parse_table,
    resolve_loading_table,
    staging_table_name,
)
from rs_streamloader_spark.sinks.redshift_sql import (
    create_copy_cred_string,
    create_table_sql,
    make_queries,
)
from rs_streamloader_spark.sinks.transaction import PoolLike, transaction_query
from rs_streamloader_spark.staging import StageResult, to_copy_url


class RedshiftSink:
    """Drives COPY-based loads against a Redshift-protocol warehouse.

    ``connect`` is any zero-arg callable returning a client with
    ``query(sql)`` / ``release()`` (lib/types.ts:84-87)."""

    def __init__(
        self,
        connect: PoolLike,
        table: TableNameLike,
        loading_table: TableNameLike | None = None,
        aws: dict | None = None,
        copy_settings: CopySettings | None = None,
        remove_temp_table: bool = True,
        max_retries: int = 4,
        backoff_base_s: float = 1.0,
        backoff_factor: float = 3.0,
    ) -> None:
        self.connect = connect
        self.table: TableRef = parse_table(table)
        self.loading_table: TableRef | None = (
            resolve_loading_table(self.table, loading_table) if loading_table else None
        )
        self.aws = aws or {}
        self.copy_settings = copy_settings or CopySettings()
        self.remove_temp_table = remove_temp_table
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s
        self.backoff_factor = backoff_factor
        self.executed: list[str] = []  # last plan, for events/debugging

    def create_table(self, schema, if_not_exists: bool = True) -> str:
        """M6 ``createTable``: documented by the reference (README.md:52)
        but never implemented in its lib/ — DDL is generated from the
        Spark schema and executed through the same transactional
        runner as the load plans."""
        sql = create_table_sql(self.table, schema, if_not_exists=if_not_exists)
        self.executed = [sql]
        return transaction_query(
            self.connect,
            [sql],
            max_retries=self.max_retries,
            backoff_base_s=self.backoff_base_s,
            backoff_factor=self.backoff_factor,
        )

    def load_staged(
        self,
        stage: StageResult,
        upload_type: str,
        id_field: str = "id",
        dedupe: str | None = None,
    ) -> str:
        """Run the load-mode SQL plan against the staged manifest.
        ``dedupe`` is a native-sink feature — the reference COPYs every
        temp row (RedshiftLoader.ts:379-380), so it is rejected here to
        avoid silently diverging semantics."""
        if dedupe is not None:
            raise ValueError(
                "dedupe is not supported by the Redshift sink "
                "(reference upsert keeps all staged rows); "
                "dedupe before staging or use NativeTableSink"
            )
        if not stage.manifest_path:
            raise ValueError("stage has no manifest; call write_manifest first")
        # A configured loading_table is only a BASE name: the per-load
        # temp table is always uniquified ({base}_temp_{jobtime}_{uuid},
        # RedshiftLoader.ts:343-350) so concurrent upserts sharing a
        # config never DROP each other's staging table — and the
        # configured name itself is never dropped.
        loading = staging_table_name(self.loading_table or self.table)
        plan = make_queries(
            upload_type,
            self.table,
            loading,
            to_copy_url(stage.manifest_path),
            create_copy_cred_string(self.aws),
            self.copy_settings,
            id_field=id_field,
            remove_temp_table=self.remove_temp_table,
        )
        self.executed = list(plan.queries)
        return transaction_query(
            self.connect,
            plan.queries,
            plan.clean_up,
            max_retries=self.max_retries,
            backoff_base_s=self.backoff_base_s,
            backoff_factor=self.backoff_factor,
        )
