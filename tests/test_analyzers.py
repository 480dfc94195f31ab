"""Tokenizer parity fixtures (FIXTURES.md §5).

Pins the UAX#29 cases the standard analyzer must honor
(StandardTokenizer.java:29-69; default pipeline = tokenize + lowercase,
no stopwords — StandardAnalyzer.java:52-54).
"""

from lucene_solr_spark.analysis.analyzers import (
    simple_tokenize, standard_tokenize,
)


def toks(text):
    return standard_tokenize(text)[0]


def test_ascii_words_and_lowercase():
    assert toks("Hello World FOO") == ["hello", "world", "foo"]


def test_apostrophe_joins_letters():
    assert toks("don't can't o'brien") == ["don't", "can't", "o'brien"]


def test_numbers_with_separators():
    assert toks("pi is 3.14 and 1,000 items") == \
        ["pi", "is", "3.14", "and", "1,000", "items"]


def test_midnumlet_dot_joins_same_class_only():
    assert toks("example.com a.1 1.a") == ["example.com", "a", "1", "1", "a"]


def test_comma_numbers_only():
    assert toks("a,b 1,2") == ["a", "b", "1,2"]


def test_mixed_alnum_single_token():
    assert toks("x86 utf8 3com") == ["x86", "utf8", "3com"]


def test_underscore_joins():
    assert toks("snake_case_name") == ["snake_case_name"]


def test_cjk_per_char_katakana_run():
    assert toks("日本語 ソフトウェア") == ["日", "本", "語", "ソフトウェア"]


def test_unicode_lowercase_sigma():
    assert toks("ΣIGMA") == ["σigma"]


def test_max_token_length_chops():
    # StandardTokenizer.setMaxTokenLength javadoc: over-long runs are
    # CHOPPED into maxTokenLength-sized tokens (buffer == max length;
    # nothing is dropped at default settings) — fuzz-verified against
    # the reference DFA
    terms, pos = standard_tokenize("a " + "x" * 300 + " b")
    assert terms == ["a", "x" * 255, "x" * 45, "b"]
    assert pos == [0, 1, 2, 3]


def test_positions_sequential():
    terms, pos = standard_tokenize("one two three")
    assert pos == [0, 1, 2]


def test_empty_and_punct_only():
    assert standard_tokenize("") == ([], [])
    assert standard_tokenize("!!! ... ???") == ([], [])


def test_simple_tokenizer_ascii_alnum():
    assert simple_tokenize("Hello, World! x86_foo 3.14") == \
        ["hello", "world", "x86", "foo", "3", "14"]
