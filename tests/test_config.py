"""Config/identity layer contract tests (reference behavior:
lib/utils.ts:81-162, lib/RedshiftLoader.ts:67-74 — see SURVEY.md §2.3
E12-E14)."""

from __future__ import annotations

import re

import pytest

from rs_streamloader_spark.config import (
    CleanupPolicy,
    CopySettings,
    LoaderOptions,
    TableRef,
    job_time,
    merge_options,
    parse_table,
    part_key,
    quote_ident,
    resolve_loading_table,
    staging_table_name,
)
from rs_streamloader_spark.errors import LoaderError, redact_credentials


class TestParseTable:
    def test_schema_table_split(self):
        assert parse_table("analytics.events") == TableRef("events", "analytics")

    def test_bare_name_empty_schema(self):
        assert parse_table("events") == TableRef("events", "")

    def test_dict_passthrough(self):
        assert parse_table({"table": "t", "schema": "s"}) == TableRef("t", "s")

    def test_loading_table_inherits_schema(self):
        # RedshiftLoader.ts:67-74: loading table inherits missing schema
        target = parse_table("warehouse.facts")
        loading = resolve_loading_table(target, "facts_stage")
        assert loading == TableRef("facts_stage", "warehouse")

    def test_loading_table_explicit_schema_wins(self):
        target = parse_table("warehouse.facts")
        loading = resolve_loading_table(target, "stage.facts_stage")
        assert loading == TableRef("facts_stage", "stage")

    def test_invalid(self):
        with pytest.raises(ValueError):
            parse_table("")


class TestQuoting:
    def test_safe_ident_unquoted(self):
        assert quote_ident("events") == "events"

    def test_injection_quoted(self):
        # the reference documents its templates as SQL-injectable
        # (README.md:239-240); ours must neutralize the payload
        evil = 'x"; DROP TABLE users; --'
        q = quote_ident(evil)
        assert q.startswith('"') and q.endswith('"')
        assert '""' in q  # embedded quote doubled

    def test_qualified(self):
        assert TableRef("t", "s").qualified == "s.t"


class TestCleanupPolicy:
    def test_bool_aliases(self):
        # types.ts:63: true→ALWAYS, false→NEVER
        assert CleanupPolicy.coerce(True) is CleanupPolicy.ALWAYS
        assert CleanupPolicy.coerce(False) is CleanupPolicy.NEVER

    def test_default_success(self):
        assert CleanupPolicy.coerce(None) is CleanupPolicy.SUCCESS

    def test_string(self):
        assert CleanupPolicy.coerce("never") is CleanupPolicy.NEVER

    def test_invalid(self):
        with pytest.raises(ValueError):
            CleanupPolicy.coerce("SOMETIMES")


class TestMergeOptions:
    def test_three_layer_merge(self):
        # utils.ts:119-138: library defaults ← factory ← per-job
        merged = merge_options(
            {"id_field": "event_id"},
            {"id_field": "ignored", "s3_bucket": "from-factory"},
        )
        assert merged.id_field == "event_id"
        assert merged.s3_bucket == "from-factory"
        assert merged.max_retries == 4  # library default survives

    def test_copy_settings_deep_merge(self):
        merged = merge_options(
            {"copy_settings": {"gzip": True}},
            {"copy_settings": {"max_error": 10, "gzip": False}},
        )
        assert merged.copy_settings.gzip is True  # per-job wins
        assert merged.copy_settings.max_error == 10  # factory survives
        assert merged.copy_settings.format == "JSON"  # library default

    def test_unknown_option_rejected(self):
        with pytest.raises(ValueError, match="unknown loader option"):
            merge_options({"tabel": "typo"})

    def test_explicit_default_equal_value_beats_factory_default(self):
        # a per-job field explicitly set to the library default must
        # still override a conflicting factory default (regression:
        # the old merge filtered LoaderOptions fields equal to the
        # library default, silently inverting the user's choice)
        from rs_streamloader_spark.config import CleanupPolicy, LoaderOptions

        merged = merge_options(
            LoaderOptions(s3_cleanup=CleanupPolicy.SUCCESS),
            {"s3_cleanup": "NEVER"},
        )
        assert merged.s3_cleanup is CleanupPolicy.SUCCESS

    def test_untouched_field_takes_factory_default(self):
        from rs_streamloader_spark.config import CleanupPolicy, LoaderOptions

        merged = merge_options(LoaderOptions(debug=True), {"s3_cleanup": "NEVER"})
        assert merged.s3_cleanup is CleanupPolicy.NEVER
        assert merged.debug is True


class TestIdentity:
    def test_job_time_format(self):
        # yyyyLLdd_HHmmss (RedshiftLoader.ts:10-12)
        assert re.fullmatch(r"\d{8}_\d{6}", job_time())

    def test_part_key_shape(self):
        # {prefix}{jobTime}_prt_{i}_{uuid}.txt (RedshiftLoader.ts:146)
        key = part_key("pfx_", "20260813_120000", 3)
        assert re.fullmatch(r"pfx_20260813_120000_prt_3_[0-9a-f]{32}\.txt", key)

    def test_staging_table_name(self):
        # {table}_temp_{jobTime}_{uuid} (RedshiftLoader.ts:343-350)
        ref = staging_table_name(TableRef("facts", "wh"), "20260813_120000")
        assert ref.schema == "wh"
        assert re.fullmatch(r"facts_temp_20260813_120000_[0-9a-f]{8}", ref.table)


class TestRedaction:
    def test_credentials_scrubbed(self):
        # utils.ts:91
        sql = "COPY t FROM 's3://x' CREDENTIALS AS 'aws_iam_role=arn:secret' MANIFEST"
        assert "arn:secret" not in redact_credentials(sql)
        assert "CREDENTIALS ='SECRET_XXXX'" in redact_credentials(sql)

    def test_loader_error_redacts_query(self):
        err = LoaderError("RS_COPY_ERROR", "boom", query="CREDENTIALS AS 'k=v'\nnext")
        assert "k=v" not in err.query
        assert "next" in err.query


def test_quote_ident_quotes_reserved_words():
    from rs_streamloader_spark.config import quote_ident

    assert quote_ident("order") == '"order"'
    assert quote_ident("USER") == '"USER"'
    assert quote_ident("safe_name") == "safe_name"
    assert quote_ident("weird name") == '"weird name"'
