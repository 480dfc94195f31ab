"""Lucene RegExp dialect translation laws (round-3 VERDICT item 4).

RegexpQuery patterns are the RegExp.java automaton dialect, not Java
regex. The translator (search/regexp.py) must (a) translate every
supported operator to a Java/RE2/Python-common regex, (b) REJECT with
a typed error what has no translation (a&b, ~a, <name>), and (c)
never silently reinterpret Java-isms ('^'/'$' literal, '\\d' = 'd').
"""
import re

import duckdb
import pytest

from lucene_solr_spark.search.oracle import OracleBuilder
from lucene_solr_spark.search.query import Regexp
from lucene_solr_spark.search.regexp import (
    RegexpSyntaxError, RegexpUnsupported, lucene_regexp_to_java)


def full(pattern, s):
    return re.match("(?:%s)\\Z" % lucene_regexp_to_java(pattern), s) \
        is not None


# -- typed rejection / predicate-algebra support -----------------------

def tree_full(pattern, s):
    from lucene_solr_spark.search.regexp import lucene_regexp_to_tree

    def ev(node):
        if node[0] == "re":
            return re.match("(?:%s)\\Z" % node[1], s) is not None
        if node[0] == "and":
            return all(ev(x) for x in node[1])
        return not ev(node[1])
    return ev(lucene_regexp_to_tree(pattern))


def test_intersection_nested_rejected_top_level_supported():
    # round 4: inside a concatenation the automaton-algebra path
    # translates it (DFA product + state elimination)
    import re
    rx = re.compile(lucene_regexp_to_java("(ab&a.*)c"))
    assert rx.fullmatch("abc")
    assert not rx.fullmatch("aac") and not rx.fullmatch("ab")
    # where it spans a whole (sub)pattern it IS the predicate AND
    assert not tree_full("a&b", "a")      # L(a) ∩ L(b) = {}
    assert not tree_full("a&b", "b")
    assert tree_full("(ab|ba)&(a.*)", "ab")
    assert not tree_full("(ab|ba)&(a.*)", "ba")


def test_complement_nested_rejected_top_level_supported():
    # round 4: '~y' bound inside the concat now compiles via the
    # complement DFA
    import re
    rx = re.compile(lucene_regexp_to_java("x~yz"))
    # x ~(y) z: 'xz' (middle "" != "y") and 'xaz' match; 'xyz' not
    assert rx.fullmatch("xz") and rx.fullmatch("xaz")
    assert not rx.fullmatch("xyz")
    assert tree_full("~(abc)", "abd")
    assert not tree_full("~(abc)", "abc")
    assert tree_full("abc&~(abd)", "abc")
    assert not tree_full("abd&~(abd)", "abd")
    assert tree_full("~(~(ab))", "ab")   # double complement


def test_named_automaton_rejected():
    with pytest.raises(RegexpUnsupported):
        lucene_regexp_to_java("<myname>")


def test_syntax_errors():
    for bad in ["(ab", "[ab", "a{", "a{2", '"unclosed', "<1-", "<->"]:
        with pytest.raises((RegexpSyntaxError, RegexpUnsupported)):
            lucene_regexp_to_java(bad)


# -- dialect semantics (vs Java regex defaults) ------------------------

def test_anchors_are_literal():
    assert full("a^b", "a^b")
    assert not full("a^b", "ab")
    assert full("$", "$")


def test_backslash_is_single_char_escape():
    # '\d' is the letter d in the dialect, not a digit class
    assert full(r"\d", "d")
    assert not full(r"\d", "5")
    assert full(r"a\.b", "a.b")
    assert not full(r"a\.b", "axb")


def test_dot_matches_newline():
    assert full("a.b", "a\nb")
    assert full(".*", "x\ny")


def test_quoted_string_and_empty_parens():
    assert full('"a.c"', "a.c")
    assert not full('"a.c"', "abc")
    assert full("()", "")
    assert full("a()b", "ab")


def test_class_and_quantifiers():
    assert full("[a-c]+", "abccba")
    assert not full("[a-c]+", "abd")
    assert full("[^a-c]", "z")
    assert full("[^a-c]", "\n")     # negated class includes newline
    assert full("ab{2,3}", "abbb")
    assert not full("ab{2,3}", "ab")
    assert full("(ab|cd)*", "abcdab")


# -- numerical intervals (Automata.makeDecimalInterval) ----------------

def test_interval_same_width_is_fixed_digits():
    # <1-3>: width 1 fixed — no leading zeros
    for s in ["1", "2", "3"]:
        assert full("<1-3>", s)
    for s in ["0", "4", "01", "10", ""]:
        assert not full("<1-3>", s)
    # <01-03>: width 2 fixed — zero-padded exactly
    for s in ["01", "02", "03"]:
        assert full("<01-03>", s)
    for s in ["1", "001", "04"]:
        assert not full("<01-03>", s)


def test_interval_mixed_width_allows_leading_zeros():
    pat = "<5-103>"
    import random
    rng = random.Random(3)
    for v in list(range(0, 130)) + [1000, 5103]:
        assert full(pat, str(v)) == (5 <= v <= 103)
    # arbitrary leading zeros accepted
    assert full(pat, "007")
    assert full(pat, "0103")
    assert not full(pat, "0104")
    # reversed bounds normalize
    assert full("<103-5>", "50")


def test_interval_in_context():
    assert full("v<1-12>x", "v7x")
    assert full("v<1-12>x", "v12x")
    assert not full("v<1-12>x", "v13x")


# -- three-way engine/oracle/python agreement --------------------------

@pytest.mark.parametrize("pattern", [
    "s.*k", "w[0-9]*7", "ok|w12", "a[bc]{1,2}d", "<1-31>",
    "x<00-99>", '"lit"[de]?',
])
def test_duckdb_python_agree(pattern):
    vocab = ["sk", "sock", "stark", "s\nk", "w7", "w127", "w997",
             "ok", "w12", "abd", "abcd", "abccd", "ad", "7", "31",
             "032", "x07", "x7", "lit", "litd", "lite", "litde"]
    jre = lucene_regexp_to_java(pattern)
    ob = OracleBuilder(table="documents", id_col="doc_id",
                       text_col="text")
    pred = ob._term_pred(Regexp(pattern))
    con = duckdb.connect()
    vals = ", ".join("('" + v.replace("'", "''").replace("\n", "' || chr(10) || '") + "')"
                     for v in vocab)
    duck = {r[0] for r in con.execute(
        f"SELECT term FROM (VALUES {vals}) t(term) WHERE {pred}"
    ).fetchall()}
    py = {v for v in vocab if re.match("(?:%s)\\Z" % jre, v)}
    assert duck == py


def test_spark_matches_python(spark):
    vocab = ["sk", "sock", "stark", "w7", "w127", "ok", "w12",
             "x07", "31", "v7x"]
    from lucene_solr_spark.search.engine import term_predicate
    df = spark.createDataFrame([(v,) for v in vocab], "term string")
    for pattern in ["s.*k", "w[0-9]*7", "<1-31>", "v<1-12>x"]:
        got = {r["term"] for r in
               df.filter(term_predicate(Regexp(pattern))).collect()}
        jre = lucene_regexp_to_java(pattern)
        assert got == {v for v in vocab
                       if re.match("(?:%s)\\Z" % jre, v)}


def test_repeat_min_greater_than_max_is_empty_language():
    # RegExp.java parses a{3,2}; Operations.repeat gives the EMPTY
    # language — must match nothing, not throw at query time
    jre = lucene_regexp_to_java("a{3,2}")
    for s in ["", "a", "aa", "aaa"]:
        assert re.match("(?:%s)\\Z" % jre, s) is None
    assert full("x|a{3,2}", "x")
    assert not full("x|a{3,2}", "aaa")


def test_union_branch_algebra_composes_as_or():
    from lucene_solr_spark.search.regexp import lucene_regexp_to_tree

    def ev(pattern, s):
        def w(node):
            if node[0] == "re":
                return re.match("(?:%s)\\Z" % node[1], s) is not None
            if node[0] == "and":
                return all(w(x) for x in node[1])
            if node[0] == "or":
                return any(w(x) for x in node[1])
            return not w(node[1])
        return w(lucene_regexp_to_tree(pattern))

    # ~(.*k)|foo : anything not ending in k, or exactly foo
    assert ev("~(.*k)|foo", "foo")
    assert ev("~(.*k)|foo", "bar")
    assert not ev("~(.*k)|foo", "mark")
    # precedence: & binds tighter than |
    assert ev("a&b|c", "c")
    assert not ev("a&b|c", "a")
    # pure-regex unions stay one leaf
    assert lucene_regexp_to_tree("ab|cd")[0] == "re"
