"""Porter stemmer, stop filter, shingle filter, english analyzer."""

import pytest

from lucene_solr_spark.analysis.analyzers import english_analyze
from lucene_solr_spark.analysis.filters import (
    ENGLISH_STOP_WORDS, porter_stem, shingles_of, stop_filter,
)

# vectors follow the published algorithm / the reference
# PorterStemmer.java behavior (first matching suffix per step)
PORTER_VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("searching", "search"), ("indexes", "index"),
    ("generalization", "gener"), ("probate", "probat"),
    ("controller", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", PORTER_VECTORS)
def test_porter_vectors(word, expected):
    assert porter_stem(word) == expected


def test_porter_idempotent_on_short_words():
    for w in ("a", "ab", "be", "is"):
        assert porter_stem(w) == w


def test_stop_filter_preserves_position_gaps():
    toks = ["the", "quick", "fox", "and", "the", "dog"]
    out_t, out_p = stop_filter(toks, list(range(len(toks))))
    assert out_t == ["quick", "fox", "dog"]
    assert out_p == [1, 2, 5]      # gaps preserved (StopFilter posIncr)


def test_shingles():
    assert shingles_of(["a", "b", "c"], 2) == ["a b", "b c"]
    assert shingles_of(["a"], 2) == []


def test_english_analyze_pipeline():
    terms, pos = english_analyze("The controllers were searching indexes")
    assert terms == ["control", "were", "search", "index"]
    assert pos == [1, 2, 3, 4]     # 'the' dropped, gap preserved


def test_english_index_end_to_end(spark):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.engine import Searcher
    from lucene_solr_spark.search.query import Phrase, Term
    df = spark.createDataFrame(
        [(0, "the controllers searched the indexes"),
         (1, "a controller searches an index"),
         (2, "nothing relevant here")],
        "doc_id long, text string")
    se = Searcher(build_index(df, analyzer="english"))
    # morphological variants collapse to one stem on BOTH sides when the
    # query text runs through the same pipeline
    hits = {r.docid for r in se.matching(Term("control")).collect()}
    assert hits == {0, 1}
    hits2 = {r.docid for r in se.matching(Term("index")).collect()}
    assert hits2 == {0, 1}
    # positions survive stemming+stopping: "searched the indexes" is a
    # sloppy phrase with a 1-gap at the dropped stopword
    ph = {r.doc_id for r in se.topk(Phrase(("search", "index"), 1), 10)
          .collect()}
    assert 0 in ph and 1 in ph


def test_edge_ngrams_py():
    from lucene_solr_spark.analysis.filters import edge_ngrams_py
    assert edge_ngrams_py("stream") == ["st", "str", "stre"]
    assert edge_ngrams_py("st") == ["st"]
    assert edge_ngrams_py("s") == []          # shorter than min_gram
    assert edge_ngrams_py("s", min_gram=1) == ["s"]
    assert edge_ngrams_py("table", 1, 3) == ["t", "ta", "tab"]


def test_edge_ngrams_sql_matches_py(spark):
    from lucene_solr_spark.analysis.filters import (
        edge_ngrams_py, edge_ngrams_sql_array,
    )
    rows = spark.sql(
        f"SELECT w, {edge_ngrams_sql_array('w')} AS g FROM VALUES "
        f"('stream'), ('st'), ('s'), ('table') AS v(w)").collect()
    for r in rows:
        assert list(r.g) == edge_ngrams_py(r.w), r.w


def test_date_math_laws():
    """DateMathParser.java semantics: left-to-right evaluation,
    calendar-aware month clamp, rounding before/after arithmetic."""
    import pytest as _pytest
    from lucene_solr_spark.analysis.datemath import (
        DateMathError, parse_date_math,
    )
    iso = lambda s: parse_date_math(s).isoformat()  # noqa: E731
    assert iso("2024-01-05T07:40:12Z/DAY+12HOUR-30MINUTE") == \
        "2024-01-05T11:30:00"
    assert iso("2024-01-31T10:00:00Z+1MONTH") == "2024-02-29T10:00:00"
    assert iso("2023-01-31T10:00:00Z+1MONTH") == "2023-02-28T10:00:00"
    # order matters: round-then-add != add-then-round
    assert iso("2024-03-15T10:20:30Z/HOUR+90MINUTES") == \
        "2024-03-15T11:30:00"
    assert iso("2024-03-15T10:20:30Z+90MINUTES/HOUR") == \
        "2024-03-15T11:00:00"
    assert iso("2024-01-01T00:00:00Z-1DAY/MONTH") == "2023-12-01T00:00:00"
    assert iso("2024-06-10T00:00:00Z/YEAR") == "2024-01-01T00:00:00"
    with _pytest.raises(DateMathError):
        parse_date_math("2024-01-01T00:00:00Z+1FORTNIGHT")
    with _pytest.raises(DateMathError):
        parse_date_math("2024-01-01T00:00:00Z/2DAY")
