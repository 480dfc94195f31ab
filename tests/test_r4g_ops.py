"""Round-4g laws: the small TokenFilter family."""

import duckdb
import pytest

from lucene_solr_spark.analysis.filters import (ngrams_py,
                                                ngrams_sql_array,
                                                possessive_strip_py,
                                                possessive_strip_sql)


def test_ngram_emission_order_is_position_major():
    # NGramTokenFilter.java:99-134: outer start pos, inner gram size
    assert ngrams_py("abcd", 2, 3) == ["ab", "abc", "bc", "bcd", "cd"]
    assert ngrams_py("ab", 2, 3) == ["ab"]
    assert ngrams_py("a", 2, 3) == []
    assert ngrams_py("a", 2, 3, preserve_original=True) == ["a"]


def test_ngram_sql_twin_matches_python():
    for term in ("stream", "ab", "abc", "window"):
        sql = ngrams_sql_array("t", 2, 3, dialect="duckdb")
        got = duckdb.sql(
            f"SELECT {sql} FROM (VALUES ('{term}')) v(t)"
        ).fetchone()[0]
        assert got == ngrams_py(term, 2, 3), term


def test_possessive_strip_variants():
    # EnglishPossessiveFilter.java:45-50: ' ’ ＇ + s/S
    assert possessive_strip_py("choir's") == "choir"
    assert possessive_strip_py("fox’S") == "fox"
    assert possessive_strip_py("fox＇s") == "fox"
    assert possessive_strip_py("weren’t") == "weren’t"   # not s
    assert possessive_strip_py("s") == "s"               # too short
    assert possessive_strip_py("'s") == ""


def test_possessive_sql_twin():
    sql = possessive_strip_sql("t", dialect="duckdb")
    for term in ("choir's", "fox’S", "fox＇s", "weren’t", "dogs"):
        got = duckdb.sql(
            f"SELECT {sql} FROM (VALUES ('{term.replace(chr(39), chr(39) * 2)}')) v(t)"
        ).fetchone()[0]
        assert got == possessive_strip_py(term), term


# --- round-4h: the remaining interval combinators as registered rows ------

def test_not_containing_and_contained_by_laws():
    from lucene_solr_spark.search.intervals import (
        IContainedBy, IMaxGaps, INotContaining, IOrdered, ITerm,
        interval_freq, intervals_of)
    o = IMaxGaps(6, IOrdered((ITerm("a"), ITerm("b"))))
    pos = {"a": [0, 10], "b": [2, 12], "c": [1]}
    # ordered minimal intervals: (0,2) and (10,12); 'c'@1 sits in (0,2)
    assert intervals_of(INotContaining(o, ITerm("c")), pos) == [(10, 12)]
    assert intervals_of(IContainedBy(ITerm("c"), o), pos) == [(1, 1)]
    # absent 'c': every big interval survives notContaining,
    # containedBy yields nothing
    pos2 = {"a": [0], "b": [2]}
    assert intervals_of(INotContaining(o, ITerm("c")), pos2) == [(0, 2)]
    assert intervals_of(IContainedBy(ITerm("c"), o), pos2) == []
    # minExtent: big side for notContaining (2), small for containedBy
    # (1) — so a matched point contributes freq exactly 1
    assert interval_freq(IContainedBy(ITerm("c"), o), pos) == 1.0
