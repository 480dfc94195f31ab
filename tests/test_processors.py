"""Update-processor chain laws (index/processors.py vs the
FieldMutating factory semantics in solr/core/.../update/processor/)."""

import pytest

from lucene_solr_spark.index import processors as P
from pyspark.sql import Row, functions as F


@pytest.fixture(scope="module")
def batch(spark):
    return spark.createDataFrame(
        [(1, "  Hello <b>World</b> 42  ", ["b", "a", "b"], "17", None),
         (2, "&lt;tag&gt; &amp; more", ["z"], "x", None),
         (3, "", [], None, None)],
        "doc_id INT, text STRING, tags ARRAY<STRING>, num STRING, "
        "ts STRING")


def _one(df, doc_id, col):
    return df.filter(F.col("doc_id") == doc_id).collect()[0][col]


def test_trim_truncate_order_matters(spark, batch):
    c = P.chain(P.trim("text"), P.truncate("text", 5))
    assert _one(c(batch), 1, "text") == "Hello"
    # reversed order truncates before trimming -> different result
    c2 = P.chain(P.truncate("text", 5), P.trim("text"))
    assert _one(c2(batch), 1, "text") == "Hel"


def test_regex_replace_literal_quoting(spark, batch):
    # literalReplacement=true (default): '$' in replacement is inert
    c = P.regex_replace("text", "[0-9]+", "$9")
    assert "$9" in _one(c(batch), 1, "text")
    # literal=False: $0 is the match backreference
    c2 = P.regex_replace("text", "[0-9]+", "<$0>", literal=False)
    assert "<42>" in _one(c2(batch), 1, "text")


def test_html_strip_tags_and_entities(spark, batch):
    c = P.html_strip("text")
    assert _one(c(batch), 1, "text") == "  Hello World 42  "
    assert _one(c(batch), 2, "text") == "<tag> & more"


def test_remove_blank_then_default(spark, batch):
    c = P.chain(P.remove_blank("text"), P.default_value("text", "?"))
    assert _one(c(batch), 3, "text") == "?"
    assert _one(c(batch), 1, "text").strip() != "?"


def test_ignore_and_clone(spark, batch):
    out = P.chain(P.clone("text", "copy"), P.ignore("text"))(batch)
    assert "text" not in out.columns and "copy" in out.columns


def test_multivalued_family(spark, batch):
    out = P.chain(P.clone("tags", "t1"), P.first_value("t1"),
                  P.clone("tags", "t2"), P.last_value("t2"),
                  P.clone("tags", "t3"), P.min_value("t3"),
                  P.clone("tags", "t4"), P.max_value("t4"),
                  P.clone("tags", "t5"), P.uniq("t5"),
                  P.clone("tags", "t6"), P.concat_values("t6", "|"),
                  P.count_field_values("tags", "n"))(batch)
    r = out.filter(F.col("doc_id") == 1).collect()[0]
    assert (r["t1"], r["t2"], r["t3"], r["t4"]) == ("b", "b", "a", "b")
    assert r["t5"] == ["b", "a"] and r["t6"] == "b|a|b"
    assert r["n"] == 3


def test_parse_mutate_if_parseable(spark, batch):
    out = P.parse_long("num")(batch)
    vals = {r["doc_id"]: r["num"] for r in out.collect()}
    assert vals[1] == 17 and vals[2] is None and vals[3] is None


def test_timestamp_and_field_length(spark, batch):
    out = P.chain(P.timestamp("ts", "2026-08-21T00:00:00Z"),
                  P.field_length("text", "len"))(batch)
    assert _one(out, 1, "ts") == "2026-08-21T00:00:00Z"
    assert _one(out, 1, "len") == 25


def test_uuid_deterministic_mode(spark, batch):
    a = P.uuid("uid", seed="s")(batch).select("doc_id", "uid")
    b = P.uuid("uid", seed="s")(batch).select("doc_id", "uid")
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))
    u = _one(a, 1, "uid")
    assert len(u) == 36 and u.count("-") == 4 and u[14] == "4"
    c = P.uuid("uid", seed="other")(batch)
    assert _one(c, 1, "uid") != u


def test_ignore_large_document_filters(spark, batch):
    out = P.ignore_large_document(10)(batch)
    ids = {r["doc_id"] for r in out.collect()}
    assert 3 in ids and 1 not in ids


def test_skip_existing_anti_join(spark, batch):
    existing = spark.createDataFrame([Row(doc_id=1), Row(doc_id=9)])
    out = P.skip_existing(existing, ["doc_id"])(batch)
    assert {r["doc_id"] for r in out.collect()} == {2, 3}
