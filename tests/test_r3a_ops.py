"""Round-3a ops: ReversedWildcard (leading-wildcard via the reversed
term dictionary), XML CoreParser family, hierarchical path facets —
law tests (driver parity in tools/verify_contract.py)."""

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ReversedWildcard
# ---------------------------------------------------------------------------

def test_reversed_wildcard_is_a_wildcard():
    from lucene_solr_spark.search.query import ReversedWildcard, Wildcard
    q = ReversedWildcard("*er")
    assert isinstance(q, Wildcard)
    assert q.pattern == "*er"


def test_reversed_wildcard_same_hits_as_plain_wildcard(spark):
    """The reversed-dictionary access path must return the identical
    result set + scores as the plain LIKE sweep — the factory changes
    the access path, never the semantics
    (ReversedWildcardFilterFactory.java)."""
    import __spark_entry__ as e
    from lucene_solr_spark.search.query import ReversedWildcard, Wildcard
    se = e._searcher(spark, SF)
    a = [(r.doc_id, r.score)
         for r in se.topk(ReversedWildcard("*er"), 10).collect()]
    b = [(r.doc_id, r.score)
         for r in se.topk(Wildcard("*er"), 10).collect()]
    assert a == b and a


def test_reversed_wildcard_predicate_prefix_shape(spark):
    """reverse(pattern) puts the wildcard at the END: the predicate is
    LIKE 're%' over reverse(term) — verified by matching the term
    dictionary both ways."""
    import __spark_entry__ as e
    from lucene_solr_spark.search.engine import term_predicate
    from lucene_solr_spark.search.query import ReversedWildcard
    se = e._searcher(spark, SF)
    terms = se.ix.term_stats.select("term")
    via_rev = {r.term for r in
               terms.filter(term_predicate(ReversedWildcard("*er")))
               .collect()}
    via_like = {r.term for r in
                terms.filter("term LIKE '%er'").collect()}
    assert via_rev == via_like and via_rev


def test_reversed_wildcard_inner_wildcards(spark):
    """Patterns with inner ? also reverse correctly: '*d?r' reversed is
    'r?d*'."""
    import __spark_entry__ as e
    from lucene_solr_spark.search.engine import term_predicate
    from lucene_solr_spark.search.query import ReversedWildcard
    se = e._searcher(spark, SF)
    terms = se.ix.term_stats.select("term")
    got = {r.term for r in
           terms.filter(term_predicate(ReversedWildcard("*d?r"))).collect()}
    want = {r.term for r in
            terms.filter("term LIKE '%d_r'").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# XML CoreParser
# ---------------------------------------------------------------------------

def test_xml_parses_boolean_with_occurs():
    from lucene_solr_spark.search.query import Bool, Term
    from lucene_solr_spark.search.xmlparser import parse_xml
    q = parse_xml(
        '<BooleanQuery>'
        '<Clause occurs="must"><TermQuery>A</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>b</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>'
        '<Clause occurs="filter"><TermQuery>d</TermQuery></Clause>'
        '</BooleanQuery>')
    assert q == Bool(must=(Term("a"),), should=(Term("b"),),
                     must_not=(Term("c"),), filter=(Term("d"),))


def test_xml_boost_attribute_wraps():
    from lucene_solr_spark.search.query import Boost, Term
    from lucene_solr_spark.search.xmlparser import parse_xml
    assert parse_xml('<TermQuery boost="2.5">x</TermQuery>') == \
        Boost(Term("x"), 2.5)
    # boost=1 does not wrap (TermQueryBuilder.java:38 'if boost != 1f')
    assert parse_xml('<TermQuery boost="1.0">x</TermQuery>') == Term("x")


def test_xml_dismax_and_userquery():
    from lucene_solr_spark.search.parser import parse
    from lucene_solr_spark.search.query import DisMax, Term
    from lucene_solr_spark.search.xmlparser import parse_xml
    q = parse_xml(
        '<DisjunctionMaxQuery tieBreaker="0.3">'
        '<TermQuery>a</TermQuery>'
        '<UserQuery>"table hash"</UserQuery>'
        '</DisjunctionMaxQuery>')
    assert isinstance(q, DisMax) and q.tiebreak == 0.3
    assert q.clauses[0] == Term("a")
    assert q.clauses[1] == parse('"table hash"')


def test_xml_terms_query_analyzes():
    from lucene_solr_spark.search.query import Bool, Term
    from lucene_solr_spark.search.xmlparser import parse_xml
    q = parse_xml('<TermsQuery minimumNumberShouldMatch="2">'
                  "Big Table, hash!</TermsQuery>")
    assert q == Bool(should=(Term("big"), Term("table"), Term("hash")),
                     minimum_should_match=2)


def test_xml_spannear_ordered_and_unordered():
    from lucene_solr_spark.search.query import SpanNear, SpanOr
    from lucene_solr_spark.search.xmlparser import parse_xml
    o = parse_xml('<SpanNear slop="2" inOrder="true">'
                  "<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm>"
                  "</SpanNear>")
    assert o == SpanNear(("a", "b"), 2)
    u = parse_xml('<SpanNear slop="2">'
                  "<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm>"
                  "</SpanNear>")
    assert u == SpanOr((SpanNear(("a", "b"), 2), SpanNear(("b", "a"), 2)))


def test_xml_range_query():
    from lucene_solr_spark.search.query import TermRange
    from lucene_solr_spark.search.xmlparser import parse_xml
    q = parse_xml('<RangeQuery lowerTerm="Query" upperTerm="sort" '
                  'includeUpper="false"/>')
    assert q == TermRange("query", "sort", True, False)


def test_xml_errors():
    from lucene_solr_spark.search.xmlparser import XmlParseError, parse_xml
    with pytest.raises(XmlParseError):
        parse_xml("<NoSuchQuery>x</NoSuchQuery>")
    with pytest.raises(XmlParseError):
        parse_xml("<BooleanQuery><TermQuery>a</TermQuery></BooleanQuery>")
    with pytest.raises(XmlParseError):  # invalid occurs (case-sens filter)
        parse_xml('<BooleanQuery><Clause occurs="FILTER">'
                  "<TermQuery>a</TermQuery></Clause></BooleanQuery>")
    with pytest.raises(XmlParseError):  # SpanNear without slop
        parse_xml("<SpanNear><SpanTerm>a</SpanTerm>"
                  "<SpanTerm>b</SpanTerm></SpanNear>")
    with pytest.raises(XmlParseError):  # malformed document
        parse_xml("<TermQuery>a")


def test_xml_end_to_end_equals_hand_ast(spark):
    """The registered p_xml spec must score identically to the same
    tree built by hand — the parser adds nothing to semantics."""
    import __spark_entry__ as e
    from lucene_solr_spark.search.parser import parse
    from lucene_solr_spark.search.query import Bool, Boost, DisMax, Term
    se = e._searcher(spark, SF)
    hand = Bool(
        must=(Term("hash"),),
        should=(DisMax((Boost(Term("dup"), 1.5), parse('"table hash"')),
                       0.2),),
        must_not=(Term("slow"),))
    a = [(r.doc_id, r.score)
         for r in se.topk(e.parse_xml(e.XML_SPECS["p_xml"]), 10).collect()]
    b = [(r.doc_id, r.score) for r in se.topk(hand, 10).collect()]
    assert a == b and a


# ---------------------------------------------------------------------------
# hierarchical path facets
# ---------------------------------------------------------------------------

def test_path_facet_parent_counts_are_child_sums(spark):
    """Taxonomy law (FastTaxonomyFacetCounts): a depth-1 node's count
    equals the sum of its depth-2 children's counts (every doc has a
    full path here, so no 'other' remainder)."""
    import __spark_entry__ as e
    rows = e._q_path_facet(spark, SF)
    # pull the FULL table (no limit) for the law check
    from pyspark.sql import functions as F
    se = e._searcher(spark, SF)
    from lucene_solr_spark.search.query import Term
    m = se.matching(Term(e._FACET_TERM))
    j = se.ix.source.join(m, "docid")
    full = (j.select(F.explode(F.array(
        F.col("source"),
        F.concat_ws("/", "source", "lang"))).alias("path"))
        .groupBy("path").count().collect())
    counts = {r.path: r["count"] for r in full}
    parents = {p: c for p, c in counts.items() if "/" not in p}
    for p, c in parents.items():
        kids = sum(v for k, v in counts.items()
                   if k.startswith(p + "/"))
        assert kids == c, (p, c, kids)
    assert rows.count() == min(15, len(counts))
