"""Solr Parallel SQL handler: parser + compile laws on tiny
collections (driver parity for q_sql_* in tools/verify_contract.py)."""

import pytest

from lucene_solr_spark.search.sql_handler import SolrSQL, SQLParseError


@pytest.fixture(scope="module")
def colls(spark):
    docs = spark.createDataFrame(
        [(0, "en", 10), (1, "en", 20), (2, "de", 30), (3, "de", 40),
         (4, "fr", 50)],
        "doc_id long, lang string, n_chars long")
    return {"documents": docs}


def test_select_where_order_limit(spark, colls):
    h = SolrSQL(colls)
    out = h.execute("SELECT doc_id, n_chars FROM documents "
                    "WHERE n_chars >= 20 AND lang != 'fr' "
                    "ORDER BY n_chars DESC LIMIT 2").collect()
    assert [(r.doc_id, r.n_chars) for r in out] == [(3, 40), (2, 30)]


def test_group_by_having(spark, colls):
    h = SolrSQL(colls)
    out = h.execute("SELECT lang, count(*), sum(n_chars) FROM documents "
                    "GROUP BY lang HAVING count(*) > 1 "
                    "ORDER BY lang ASC").collect()
    assert [(r.lang, r["count"], r.sum_n_chars) for r in out] == [
        ("de", 2, 70), ("en", 2, 30)]


def test_text_predicate_is_fulltext(spark, colls):
    """Equality on the text field routes through text_search
    (SolrFilter.java's query translation), not a string compare."""
    calls = []

    def ts(coll, q):
        calls.append((coll, q))
        return spark.createDataFrame([(0,), (2,)], "doc_id long")

    h = SolrSQL(colls, text_search=ts)
    out = h.execute("SELECT doc_id FROM documents WHERE text = 'hello' "
                    "ORDER BY doc_id ASC").collect()
    assert calls == [("documents", "hello")]
    assert [r.doc_id for r in out] == [0, 2]


def test_parse_errors(spark, colls):
    h = SolrSQL(colls)
    with pytest.raises(SQLParseError):
        h.execute("SELECT doc_id FROM nope")
    with pytest.raises(SQLParseError):
        h.execute("SELECT doc_id, count(*) FROM documents")  # ungrouped
    with pytest.raises(SQLParseError):
        h.execute("SELECT doc_id FROM documents GROUP BY lang")
    with pytest.raises(SQLParseError):
        h.execute("SELECT doc_id FROM documents LIMIT 5 trailing")


def test_aggregates_without_group(spark, colls):
    h = SolrSQL(colls)
    [r] = h.execute("SELECT count(*), min(n_chars), max(n_chars) "
                    "FROM documents").collect()
    assert (r["count"], r.min_n_chars, r.max_n_chars) == (5, 10, 50)
