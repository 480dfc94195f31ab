"""Round-4: mid-pattern RegExp automaton algebra (& / ~ anywhere, via
symbolic DFA product/complement + GNFA state elimination —
search/regexp.py:_algebra_to_regex; reference behavior:
RegExp.java:897 makeIntersection, :563 complement).

Laws are checked by brute-force language enumeration over a small
alphabet: the translated regex's language must equal the set algebra
of its parts' languages."""

import itertools
import re

import pytest

from lucene_solr_spark.search.regexp import (RegexpUnsupported,
                                             lucene_regexp_to_java,
                                             lucene_regexp_to_tree)


def _lang(pattern: str, alphabet="abc", maxlen=4):
    rx = re.compile(lucene_regexp_to_java(pattern))
    out = set()
    for n in range(maxlen + 1):
        for tup in itertools.product(alphabet, repeat=n):
            s = "".join(tup)
            if rx.fullmatch(s):
                out.add(s)
    return out


def test_intersection_law_whole():
    a = _lang("(a|b)*")
    b = _lang("a(a|b|c)*")
    assert _lang("((a|b)*&a(a|b|c)*)") == a & b


def test_mid_concat_complement():
    got = _lang("a~(b)c")
    want = {s for n in range(5)
            for s in map("".join, itertools.product("abc", repeat=n))
            if len(s) >= 2 and s[0] == "a" and s[-1] == "c"
            and s[1:-1] != "b"}
    assert got == want


def test_double_complement_is_identity():
    assert _lang("~(~(ab))c") == {"abc"}


def test_mid_concat_intersections():
    assert _lang("(a&(a|b))(b&(a|b))") == {"ab"}
    assert _lang("ab(c&d)e") == set()          # empty intersection
    assert _lang("x(a&[ab])y", alphabet="xay") == {"xay"}


def test_repeat_over_algebra():
    assert _lang("((a|b)&(a|c)){2}") == {"aa"}
    assert _lang("((a|b)&(a|c))*") == {"", "a", "aa", "aaa", "aaaa"}


def test_complement_of_empty_language():
    got = _lang("a(~(#))c")
    assert "ac" in got and "abc" in got and "abbc" in got
    assert all(s[0] == "a" and s[-1] == "c" for s in got)


def test_de_morgan():
    assert _lang("(~(a|b))c") == _lang("(~(a)&~(b))c")


def test_algebra_with_interval():
    # numbers 2..11 that are also two chars long; mixed-width bounds
    # allow leading zeros (makeDecimalInterval), so 02..09, 10, 11 —
    # restricted to the 0/1/2 test alphabet -> 02, 10, 11
    got = _lang("(<2-11>&..)", alphabet="012", maxlen=3)
    assert got == {"02", "10", "11"}


def test_tree_still_cheap_for_whole_pattern():
    t = lucene_regexp_to_tree("s.*&~(.*k)")
    assert t[0] == "and"          # predicate path, no state blowup


def test_tree_compiles_mid_pattern_to_leaf():
    t = lucene_regexp_to_tree("s~(.*o.*)")
    assert t[0] == "re"
    rx = re.compile(t[1])
    assert rx.fullmatch("sxyz")
    assert not rx.fullmatch("sxoz")
    assert not rx.fullmatch("xyz")


def test_named_automaton_still_typed_rejection():
    with pytest.raises(RegexpUnsupported):
        lucene_regexp_to_java("<myname>")


def test_python_java_duckdb_portability():
    import duckdb
    pats = ["a~(b)c", "(a&(a|b))(b&(a|b))", "s~(.*o.*)",
            "((a|b)&(a|c)){2}", "~(~(ab))c"]
    strings = ["", "a", "ab", "abc", "ac", "abbc", "sxyz", "sxoz",
               "aa", "ba"]
    con = duckdb.connect()
    for p in pats:
        rx = re.compile(lucene_regexp_to_java(p))
        for s in strings:
            want = rx.fullmatch(s) is not None
            got = con.execute(
                "SELECT regexp_matches(?, ?)",
                [s, "^(?:" + rx.pattern + ")$"]).fetchone()[0]
            assert got == want, (p, s)


def test_surrogate_only_class_never_matches():
    """Advisor edge (round 4): a complement whose alphabet partition
    block lies entirely inside the surrogate gap used to emit an
    empty class `[]`, which re/RE2 mis-parse as match-anything.  The
    translated regex must treat the surrogate-only class as
    never-matching, and must stay compilable."""
    pat = "a~([\ud800-\udfff])b"
    rx = re.compile(lucene_regexp_to_java(pat))
    # ~(surrogate-char) over BMP text = "anything but one lone
    # surrogate" — every normal middle (incl. empty) matches
    assert rx.fullmatch("ab")
    assert rx.fullmatch("axb")
    assert rx.fullmatch("axyb")
    assert not rx.fullmatch("a")
    # the emitted regex must not contain an empty character class
    assert "[]" not in lucene_regexp_to_java(pat)
