"""eDisMax parser (ExtendedDismaxQParser.java) + FieldTerm (StrField
term query): mm spec math vs SolrPluginUtils.calculateMinShouldMatch,
qf aliasing, operator-driven mm disable, pf/pf2 phrase boosts, and
engine == DuckDB oracle parity for every composed AST."""

import duckdb
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.edismax import (
    calculate_min_should_match, edismax,
)
from lucene_solr_spark.search.engine import Searcher
from lucene_solr_spark.search.oracle import OracleBuilder
from lucene_solr_spark.search.query import (
    Bool, Boost, DisMax, FieldTerm, Phrase, Term,
)

DOCS = [
    (0, "join merge window", "en", "s0"),
    (1, "join merge dup table", "en", "s1"),
    (2, "window dup scan", "de", "s0"),
    (3, "merge window dup join", "fr", None),
    (4, "table hash join", "de", "s1"),
    (5, "scan table hash batch", "en", "s0"),
    (6, "dup dup merge", "en", None),
    (7, "window join merge table", "de", "s2"),
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("edismax") / "documents.parquet")
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    se = Searcher(build_index(spark.read.parquet(p)))
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{p}/*.parquet'")
    return se, con


def _parity(se, con, ast, k=10):
    eng = [(r.doc_id, r.score) for r in se.topk(ast, k).collect()]
    sql = OracleBuilder().topk_sql(ast, k)
    ora = [(int(a), float(b)) for a, b in con.execute(sql).fetchall()]
    assert eng == ora, ast
    return eng


# -- SolrPluginUtils.calculateMinShouldMatch (SolrPluginUtils.java:671) --

MM_TABLE = [
    # (optional clause count, spec, expected)
    (4, "3", 3), (2, "3", 2), (4, "-1", 3), (3, "-4", 0),
    (4, "75%", 3), (5, "66%", 3), (4, "-25%", 3), (4, "0%", 0),
    (4, "100%", 4), (10, "-30%", 7),
    # conditional specs, evaluated left to right
    (1, "2<-25% 9<-3", 1), (2, "2<-25% 9<-3", 2),
    (5, "2<-25% 9<-3", 4), (9, "2<-25% 9<-3", 7),
    (10, "2<-25% 9<-3", 7), (16, "3<-25%", 12),
    (4, "2<75%", 3), (2, "2<75%", 2),
]


def test_mm_table():
    for n, spec, expected in MM_TABLE:
        assert calculate_min_should_match(n, spec) == expected, (n, spec)


def test_mm_invalid():
    with pytest.raises(ValueError):
        calculate_min_should_match(3, "<50%")


# -- AST shape ----------------------------------------------------------

def test_qf_aliasing_shape():
    ast = edismax("join", qf={"text": 1.0, "lang": 2.0}, tie=0.1)
    assert ast == DisMax((Term("join"),
                          Boost(FieldTerm("lang", "join"), 2.0)), 0.1)


def test_mm_applied_and_operators_disable_it():
    ast = edismax("join merge dup", qf={"text": 1.0}, mm="67%")
    assert isinstance(ast, Bool) and ast.minimum_should_match == 2
    # explicit operators with no user mm -> mm off (0%)
    ast = edismax("+join merge dup", qf={"text": 1.0})
    assert isinstance(ast, Bool) and ast.minimum_should_match == 0
    # ...but a user-provided mm survives operators
    ast = edismax("+join merge dup", qf={"text": 1.0}, mm="100%")
    assert ast.minimum_should_match == 2


def test_pf_whole_and_shingles():
    ast = edismax("join merge table", qf={"text": 1.0},
                  pf={"text": 5.0}, pf2={"text": 2.0}, ps2=1)
    assert isinstance(ast, Bool) and len(ast.should) == 2
    whole, bigrams = ast.should
    assert whole == Boost(Phrase(("join", "merge", "table")), 5.0)
    assert bigrams == Boost(Bool(should=(
        Phrase(("join", "merge"), 1), Phrase(("merge", "table"), 1))), 2.0)


def test_fielded_clause_no_aliasing():
    ast = edismax("lang:de join", qf={"text": 1.0, "lang": 4.0})
    assert isinstance(ast, Bool)
    assert FieldTerm("lang", "de") in ast.should


# -- engine == oracle parity -------------------------------------------

def test_fieldterm_parity(corpus):
    se, con = corpus
    hits = _parity(se, con, FieldTerm("lang", "en"))
    assert [d for d, _ in hits] == [0, 1, 5, 6]
    # absent value -> empty on both backends
    assert _parity(se, con, FieldTerm("lang", "zz")) == []
    # boost multiplies the idf/(1+k1) constant
    b = _parity(se, con, Boost(FieldTerm("lang", "de"), 2.5))
    u = _parity(se, con, FieldTerm("lang", "de"))
    assert b[0][1] == pytest.approx(2.5 * u[0][1])


def test_edismax_parity_matrix(corpus):
    se, con = corpus
    cases = [
        edismax("join merge window dup", qf={"text": 1.0, "lang": 2.0},
                tie=0.1, mm="50%", pf={"text": 3.0}),
        edismax("table hash", qf={"text": 1.0}, pf={"text": 3.0}, ps=2),
        edismax("+join merge -scan", qf={"text": 1.0, "source": 2.0}),
        edismax("lang:de join", qf={"text": 1.0, "lang": 4.0}),
        edismax("join merge table", qf={"text": 1.0},
                pf2={"text": 2.0}, ps2=1),
        edismax("join merge window dup scan", qf={"text": 1.0},
                mm="2<-25% 4<-50%"),
        edismax("join AND merge OR dup", qf={"text": 1.0, "source": 2.0},
                tie=0.5),
        edismax("join dup", qf={"text": 1.0},
                bq=(Boost(Term("table"), 1.5),)),
    ]
    for ast in cases:
        _parity(se, con, ast)


def test_edismax_string_field_wins_ties(corpus):
    se, con = corpus
    # lang:"de" boosted high enough that de docs outrank pure text hits
    hits = _parity(se, con, edismax(
        "de join", qf={"text": 1.0, "lang": 10.0}, tie=0.0))
    top_ids = [d for d, _ in hits[:3]]
    assert set(top_ids) <= {2, 4, 7}   # the de docs
