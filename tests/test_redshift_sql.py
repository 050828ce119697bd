"""Redshift SQL generation contract tests (templates:
/root/reference/lib/RedshiftLoader.ts:337-393; SURVEY.md §2.2)."""

from __future__ import annotations

from rs_streamloader_spark.config import CopySettings, TableRef
from rs_streamloader_spark.sinks.redshift_sql import (
    copy_sql,
    create_copy_cred_string,
    create_format,
    make_queries,
)

TGT = TableRef("facts", "wh")
TMP = TableRef("facts_temp_x", "wh")
CRED = "aws_iam_role=arn:aws:iam::1:role/loader"
MANIFEST = "s3://bucket/stage/manifest.json"


class TestCredentials:
    def test_iam_role(self):
        # utils.ts:151-162 — with the aws_iam_rol typo fixed
        s = create_copy_cred_string({"iam_role": "arn:aws:iam::1:role/x"})
        assert s == "aws_iam_role=arn:aws:iam::1:role/x"
        assert "aws_iam_rol=" not in s.replace("aws_iam_role=", "")

    def test_keys_with_token(self):
        s = create_copy_cred_string(
            {"access_key_id": "AK", "secret_access_key": "SK", "session_token": "TK"}
        )
        assert s == "aws_access_key_id=AK;aws_secret_access_key=SK;token=TK"


class TestFormat:
    def test_json_auto(self):
        assert create_format(CopySettings()) == "JSON 'auto'"

    def test_jsonpaths(self):
        cs = CopySettings(column_map="jsonpaths", jsonpaths="s3://b/paths.json")
        assert create_format(cs) == "JSON 's3://b/paths.json'"

    def test_csv_options(self):
        cs = CopySettings(format="CSV", quote='"', delimiter="|", ignore_header=1)
        assert create_format(cs) == "CSV QUOTE '\"' DELIMITER '|' IGNOREHEADER 1"

    def test_parquet_verbatim(self):
        assert create_format(CopySettings(format="PARQUET")) == "PARQUET"


class TestCopySql:
    def test_clauses(self):
        cs = CopySettings(gzip=True, time_format="epochmillisecs", truncate_cols=True, max_error=5)
        sql = copy_sql(TGT, MANIFEST, CRED, cs)
        for frag in [
            "COPY wh.facts",
            f"FROM '{MANIFEST}'",
            f"CREDENTIALS AS '{CRED}'",
            "MANIFEST",
            "JSON 'auto'",
            "GZIP",
            "TIMEFORMAT 'epochmillisecs'",
            "TRUNCATECOLUMNS",
            "MAXERROR 5",
        ]:
            assert frag in sql, frag


    def test_columnar_copy_omits_row_format_clauses(self):
        # PARQUET/ORC COPY rejects GZIP/TIMEFORMAT/ENCODING/
        # TRUNCATECOLUMNS/MAXERROR — none may be emitted
        cs = CopySettings(
            format="PARQUET", gzip=True, truncate_cols=True, max_error=5,
            encoding="UTF16LE",
        )
        sql = copy_sql(TGT, MANIFEST, CRED, cs)
        for bad in ["GZIP", "TIMEFORMAT", "ENCODING", "TRUNCATECOLUMNS", "MAXERROR"]:
            assert bad not in sql, bad
        assert sql.endswith("MANIFEST PARQUET;")


class TestMakeQueries:
    def test_insert_single_copy(self):
        # RedshiftLoader.ts:364-366
        plan = make_queries("INSERT", TGT, TMP, MANIFEST, CRED, CopySettings())
        assert len(plan.queries) == 1
        assert plan.queries[0].startswith("COPY wh.facts")
        assert plan.clean_up is None

    def test_truncate_insert(self):
        # RedshiftLoader.ts:367-368
        plan = make_queries("TRUNCATE_INSERT", TGT, TMP, MANIFEST, CRED, CopySettings())
        assert plan.queries[0] == "TRUNCATE wh.facts;"
        assert plan.queries[1].startswith("COPY wh.facts")

    def test_upsert_sequence(self):
        # RedshiftLoader.ts:369-384: BEGIN, DROP, CREATE LIKE, COPY tmp,
        # DELETE semi-join, INSERT SELECT, DROP, COMMIT + cleanUp
        plan = make_queries(
            "UPSERT", TGT, TMP, MANIFEST, CRED, CopySettings(), id_field="id"
        )
        q = plan.queries
        assert q[0] == "BEGIN;"
        assert q[1] == "DROP TABLE IF EXISTS wh.facts_temp_x;"
        assert q[2] == "CREATE TABLE wh.facts_temp_x (LIKE wh.facts);"
        assert q[3].startswith("COPY wh.facts_temp_x")
        assert q[4] == (
            "DELETE FROM wh.facts WHERE id IN (SELECT id FROM wh.facts_temp_x);"
        )
        assert q[5] == "INSERT INTO wh.facts SELECT * FROM wh.facts_temp_x;"
        assert q[6] == "DROP TABLE wh.facts_temp_x;"
        assert q[7] == "COMMIT;"
        assert plan.clean_up == "DROP TABLE IF EXISTS wh.facts_temp_x;"

    def test_upsert_keep_temp_table(self):
        # removeTempTable=false skips the DROP (utils.ts:102)
        plan = make_queries(
            "UPSERT", TGT, TMP, MANIFEST, CRED, CopySettings(), remove_temp_table=False
        )
        assert "DROP TABLE wh.facts_temp_x;" not in plan.queries
        assert plan.queries[-1] == "COMMIT;"

    def test_id_field_injection_hardened(self):
        # README.md:239-240 documents idField as injectable; ours quotes
        plan = make_queries(
            "UPSERT", TGT, TMP, MANIFEST, CRED, CopySettings(),
            id_field='id"; DROP TABLE users; --',
        )
        delete = plan.queries[4]
        # the payload must appear only inside a quoted identifier
        assert '"id""; DROP TABLE users; --"' in delete
