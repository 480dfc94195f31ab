"""SimpleQueryParser state-machine laws.

Mirrors the behaviors documented in
lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java (and its TestSimpleQueryParser):
operator accumulation with occur-change nesting (buildQueryTree
:434-470), NOT via MUST_NOT + SHOULD MatchAll (:440-447), double
negation (:199), graceful degradation on unclosed quotes/parens
(:264-267, :327-330), fuzziness parsing (:481 parseFuzziness) and the
edit-distance cap at 2.
"""

from lucene_solr_spark.search.query import (
    Bool, Fuzzy, MatchAll, Phrase, Prefix, Term,
)
from lucene_solr_spark.search.simple_parser import parse_simple


def test_single_term():
    assert parse_simple("table") == Term("table")


def test_default_operator_is_or():
    q = parse_simple("table hash")
    assert q == Bool(should=(Term("table"), Term("hash")))


def test_and_operator_accumulates():
    q = parse_simple("table + hash + join")
    assert q == Bool(must=(Term("table"), Term("hash"), Term("join")))


def test_operator_change_nests_previous_top():
    # token1 | token2 + token3: (t1 OR t2) evaluated first, then AND t3
    # (class javadoc example)
    q = parse_simple("table | hash + join")
    inner = Bool(should=(Term("table"), Term("hash")))
    assert q == Bool(must=(inner, Term("join")))


def test_negation_wraps_matchall():
    q = parse_simple("-slow")
    assert q == Bool(should=(MatchAll(),), must_not=(Term("slow"),))


def test_double_negation_cancels():
    assert parse_simple("--slow") == Term("slow")


def test_precedence_subquery():
    q = parse_simple("table + (hash | merge)")
    assert q == Bool(must=(Term("table"),
                           Bool(should=(Term("hash"), Term("merge")))))


def test_phrase_and_near():
    assert parse_simple('"sort batch"') == Phrase(("sort", "batch"), 0)
    assert parse_simple('"sort batch"~3') == Phrase(("sort", "batch"), 3)


def test_prefix_and_fuzzy():
    assert parse_simple("vec*") == Prefix("vec")
    assert parse_simple("quer~1") == Fuzzy("quer", 1)
    # bare ~ = automatic fuzziness 2; cap at the Levenshtein max (2)
    assert parse_simple("quer~") == Fuzzy("quer", 2)
    assert parse_simple("quer~9") == Fuzzy("quer", 2)
    # ~0 degrades to a plain term
    assert parse_simple("quer~0") == Term("quer")


def test_unclosed_quote_is_extraneous():
    # the opening quote is ignored; the rest parses as bare terms
    q = parse_simple('"sort batch')
    assert q == Bool(should=(Term("sort"), Term("batch")))


def test_unclosed_paren_is_extraneous():
    q = parse_simple("(sort batch")
    assert q == Bool(should=(Term("sort"), Term("batch")))


def test_stray_close_paren_skipped():
    assert parse_simple(")table") == Term("table")


def test_empty_group_resets_pending_operator():
    # '+ ()' consumed the AND; following term joins with default OR
    q = parse_simple("table + () hash")
    assert q == Bool(should=(Term("table"), Term("hash")))


def test_escape_operator():
    # escaped '+' is a literal character, analyzed away by the
    # tokenizer into the surrounding term text
    q = parse_simple(r"table\+hash")
    assert q == Bool(should=(Term("table"), Term("hash")))


def test_leading_operators_ignored():
    # '+' with no previous token has nothing to AND with
    assert parse_simple("+table") == Term("table")
    assert parse_simple("| table") == Term("table")


def test_empty_string_matches_nothing():
    assert parse_simple("") == Bool()


def test_mixed_chain_shape():
    # the p_simple spec string end-to-end
    q = parse_simple(
        'table + (hash | merge) -slow "sort batch"~3 quer~1 vec*')
    inner = Bool(should=(Term("hash"), Term("merge")))
    a = Bool(must=(Term("table"), inner))
    neg = Bool(should=(MatchAll(),), must_not=(Term("slow"),))
    assert q == Bool(should=(a, neg, Phrase(("sort", "batch"), 3),
                             Fuzzy("quer", 1), Prefix("vec")))
