"""Engine-semantics pins for the XML ingestion family (r15).

The xml_ingest_extract / xml_xpath_structure oracles ENCODE probed
Spark behaviors (from_xml whole-record NULL on truncation, entity
decode, xpath throwing on malformed input). These pins fail loudly if
an engine upgrade shifts any of those behaviors, instead of surfacing
as an opaque oracle hash break.
"""

from pyspark.sql import functions as F

from rs_streamloader_spark.operators.webtext import _XML_SCHEMA, _synth_xml


def _parse_one(spark, doc_id, source, lang, text):
    df = spark.createDataFrame(
        [(doc_id, source, lang, text)], "doc_id long, source string, lang string, text string"
    )
    return df.select(
        _synth_xml().alias("x"),
        F.from_xml(_synth_xml(), _XML_SCHEMA).alias("p"),
    ).collect()[0]


def test_wellformed_record_parses_fully(spark):
    r = _parse_one(spark, 8, "src8", "en", "alpha beta gamma")
    p = r["p"]
    assert p["_id"] == 8
    assert p["lang"] == "en"
    # 1 + 8%3 = 3 <t> children collected into the array field
    assert p["tags"]["t"] == ["t1", "t2", "t3"]
    assert p["meta"]["_src"] == "src8" and p["meta"]["_q"] == 8
    # &amp; decoded inside the slug, numeric charref to chr(97+8%26)
    assert p["slug"] == "alpha&beta"
    assert p["mark"] == chr(97 + 8 % 26)
    assert r["x"].endswith("</doc>")


def test_truncated_record_is_whole_record_null(spark):
    # doc_id % 17 == 9 -> torn after '<tags>': PERMISSIVE from_xml
    # must yield the all-NULL struct (probed engine behavior the
    # oracle's is_malformed slice depends on)
    r = _parse_one(spark, 9, "src9", "de", "uno dos")
    p = r["p"]
    assert all(p[k] is None for k in ("_id", "lang", "tags", "meta", "slug", "mark"))
    assert not r["x"].endswith("</doc>")


def test_single_word_doc_has_no_amp_slug(spark):
    r = _parse_one(spark, 4, "src4", "fr", "solo")
    assert r["p"]["slug"] == "solo"
    # 1 + 4%3 = 2 children
    assert r["p"]["tags"]["t"] == ["t4", "t5"]


def test_gated_xpath_never_throws_on_torn_rows(spark):
    # xpath_* raises on malformed XML; the operators gate every pull
    # behind a lazily-evaluated CASE WHEN — pin that the gated plan
    # survives a torn row and returns NULL for it
    df = spark.createDataFrame(
        [(9, "s", "en", "a b"), (10, "s", "en", "c d")],
        "doc_id long, source string, lang string, text string",
    )
    out = (
        df.select("doc_id", _synth_xml().alias("x"))
        .select(
            "doc_id",
            F.when(
                F.col("x").endswith("</doc>"),
                F.expr("xpath_long(x, '/doc/meta/@q')"),
            ).alias("q"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["q"] is None and out[1]["q"] == 10
