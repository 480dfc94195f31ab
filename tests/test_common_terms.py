"""CommonTermsQuery (lucene/queries/src/java/org/apache/lucene/queries/
CommonTermsQuery.java:158-219): df-based high/low classification, the
required-low + optional-high composition, the all-high conjunction
fallback, absent-term-is-low, and engine == DuckDB oracle parity."""

import duckdb
import math
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import Searcher
from lucene_solr_spark.search.oracle import OracleBuilder
from lucene_solr_spark.search.query import Bool, Term

# "the" in 6/8 docs (high at maxtf=0.5: 6 > ceil(0.5*8)=4);
# "scan" in exactly 4 docs (== cutoff -> LOW, strict >);
# "join"/"dup" rare
DOCS = [
    (0, "the join table", "en", "s0"),
    (1, "the scan merge", "en", "s1"),
    (2, "the scan dup", "de", "s2"),
    (3, "the scan window", "en", "s3"),
    (4, "the scan batch", "fr", "s4"),
    (5, "the merge window", "en", "s5"),
    (6, "join dup merge", "en", "s6"),
    (7, "window batch vector", "en", "s7"),
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cterms") / "documents.parquet")
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    se = Searcher(build_index(spark.read.parquet(p)))
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{p}/*.parquet'")
    return se, con


def _both(se, con, terms, maxtf, k=10):
    ast = se.common_terms(terms, maxtf)
    eng = [(r.doc_id, r.score) for r in se.topk(ast, k).collect()]
    sql = OracleBuilder().common_terms_topk_sql(terms, maxtf, k)
    ora = [(int(a), float(b)) for a, b in con.execute(sql).fetchall()]
    assert eng == ora, (terms, maxtf)
    return ast, eng


def test_classification_and_required_low(corpus):
    se, con = corpus
    ast, eng = _both(se, con, ("the", "join"), 0.5)
    # "the" (df=6 > 4) is high -> optional; "join" (df=2) low -> required
    assert isinstance(ast, Bool) and len(ast.must) == 1 and len(ast.should) == 1
    docids = [d for d, _ in eng]
    # only docs containing "join" match; doc 7 (neither) and docs with
    # only "the" (1-5) are excluded
    assert set(docids) == {0, 6}
    # doc 0 matches join AND the -> higher score than doc 6 (join only,
    # same dl) is not guaranteed (idf of the is low) but both present
    assert len(eng) == 2


def test_cutoff_is_strictly_greater(corpus):
    se, con = corpus
    # df("scan") = 4 == ceil(0.5 * 8) -> LOW (strict >), so it is required
    ast, eng = _both(se, con, ("scan", "the"), 0.5)
    assert {d for d, _ in eng} == {1, 2, 3, 4}


def test_all_high_conjunction_fallback(corpus):
    se, con = corpus
    # both common at a tiny threshold -> conjunction of the two
    ast, eng = _both(se, con, ("the", "scan"), 0.1)
    assert {d for d, _ in eng} == {1, 2, 3, 4}
    # matches Bool MUST of both
    ref = [(r.doc_id, r.score)
           for r in se.topk(Bool(must=(Term("the"), Term("scan"))),
                            10).collect()]
    assert eng == ref


def test_absent_term_classifies_low(corpus):
    se, con = corpus
    # absent term joins the low group (termStates == null branch):
    # low group = {zzzabsent} can never match -> empty result both sides
    _, eng = _both(se, con, ("zzzabsent", "the"), 0.5)
    assert eng == []


def test_all_low_plain_should(corpus):
    se, con = corpus
    ast, eng = _both(se, con, ("join", "dup"), 0.5)
    assert {d for d, _ in eng} == {0, 2, 6}
    ref = [(r.doc_id, r.score)
           for r in se.topk(Bool(should=(Term("join"), Term("dup"))),
                            10).collect()]
    assert eng == ref
