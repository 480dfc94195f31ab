"""Classic query-parser tests (QueryParser.jj grammar subset) — pure
python, no Spark. Mirrors TestQueryParser's canonical assertions
(lucene/queryparser/src/test/.../classic/TestQueryParser.java)."""

import pytest

from lucene_solr_spark.search.parser import QueryParseError, parse
from lucene_solr_spark.search.query import (
    Bool, Boost, Fuzzy, Phrase, Prefix, SpanNear, Term, TermRange, Wildcard,
)


def test_single_term():
    assert parse("Hello") == Term("hello")


def test_implicit_or():
    assert parse("hello world") == Bool(
        should=(Term("hello"), Term("world")))


def test_and():
    assert parse("a AND b") == Bool(must=(Term("a"), Term("b")))
    assert parse("a && b") == Bool(must=(Term("a"), Term("b")))


def test_or_keyword():
    assert parse("a OR b") == Bool(should=(Term("a"), Term("b")))


def test_plus_minus():
    q = parse("+apache -jakarta lucene")
    assert q == Bool(must=(Term("apache"),),
                     should=(Term("lucene"),),
                     must_not=(Term("jakarta"),))


def test_not():
    q = parse("lucene NOT jakarta")
    assert q == Bool(should=(Term("lucene"),),
                     must_not=(Term("jakarta"),))


def test_phrase():
    assert parse('"hello world"') == Phrase(("hello", "world"))


def test_phrase_single_token_collapses_to_term():
    assert parse('"hello"') == Term("hello")


def test_phrase_slop_becomes_scored_sloppy_phrase():
    # "a b"~n is a scored PhraseQuery with slop in the reference
    # (QueryParserBase.getFieldQuery); SpanNear remains the fallback for
    # repeated terms (no-repeats matcher limitation)
    assert parse('"hello world"~2') == Phrase(("hello", "world"), 2)
    assert parse('"ho my my"~2') == SpanNear(("ho", "my", "my"), 2)


def test_grouping():
    q = parse("(a OR b) AND c")
    assert q == Bool(must=(Bool(should=(Term("a"), Term("b"))), Term("c")))


def test_boost():
    assert parse("hello^2.5") == Boost(Term("hello"), 2.5)
    assert parse("(a b)^2") == Boost(
        Bool(should=(Term("a"), Term("b"))), 2.0)


def test_prefix_and_wildcard():
    assert parse("hel*") == Prefix("hel")
    assert parse("h?llo") == Wildcard("h?llo")
    assert parse("he*lo") == Wildcard("he*lo")


def test_fuzzy():
    assert parse("roam~") == Fuzzy("roam", 2)
    assert parse("roam~1") == Fuzzy("roam", 1)


def test_range():
    assert parse("[alpha TO omega]") == TermRange(
        "alpha", "omega", include_lower=True, include_upper=True)
    assert parse("{alpha TO omega}") == TermRange(
        "alpha", "omega", include_lower=False, include_upper=False)


def test_field_prefix():
    assert parse("text:hello") == Term("hello")
    with pytest.raises(QueryParseError):
        parse("title:hello")


def test_leaf_analysis_matches_index_analyzer():
    # mixed case + punctuation runs through the simple analyzer
    assert parse("Hello-World") == Phrase(("hello", "world"))
    assert parse("FOO42") == Term("foo42")


def test_empty_query_raises():
    with pytest.raises(QueryParseError):
        parse("   ")


def test_and_promotes_previous_optional():
    q = parse("a b AND c")
    assert q == Bool(must=(Term("b"), Term("c")),
                     should=(Term("a"),))


def test_complex_phrase_wildcard_slot():
    """ComplexPhraseQueryParser shape: '"table ha*"' becomes a
    PhraseWildcard with a literal slot and a pattern slot; boost
    wraps it; a sloppy quoted phrase keeps its Phrase form."""
    from lucene_solr_spark.search.query import PhraseWildcard
    assert parse('"table ha*"') == PhraseWildcard(("table", "ha*"))
    assert parse('"table ha*"^2') == Boost(
        PhraseWildcard(("table", "ha*")), 2.0)
    assert parse('"Qu?ck table"') == PhraseWildcard(("qu?ck", "table"))
    assert parse('"table hash"~2') == Phrase(("table", "hash"), 2)


def test_surround_parser_shapes():
    """Surround parser (queryparser/surround): W/N proximity + boolean
    operators compile to the span AST; unsupported nestings reject."""
    from lucene_solr_spark.search.query import SpanNear, SpanOr
    from lucene_solr_spark.search.surround import parse_surround
    assert parse_surround("table W hash") == SpanNear(("table", "hash"), 0)
    assert parse_surround("table 3W hash") == SpanNear(("table", "hash"), 2)
    assert parse_surround("a W b W c") == SpanNear(("a", "b", "c"), 0)
    assert parse_surround("a 2N b") == SpanOr(
        (SpanNear(("a", "b"), 1), SpanNear(("b", "a"), 1)))
    q = parse_surround("a NOT b")
    assert q == Bool(must=(Term("a"),), must_not=(Term("b"),))
    assert parse_surround("a AND b OR c") == Bool(
        should=(Bool(must=(Term("a"), Term("b"))), Term("c")))
    with pytest.raises(QueryParseError):
        parse_surround("a 2W b 2W c")
    with pytest.raises(QueryParseError):
        parse_surround("(a W b) 2N c")
