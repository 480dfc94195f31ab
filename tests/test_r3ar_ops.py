"""Round-3ar ops: the function qparser family — funcparser
(FunctionQParser.java:48 grammar + ValueSourceParser.java:85
sources, twin Catalyst/SQL compilers) and the new local-params
qparsers {!func} {!frange} {!field} {!raw} {!maxscore} {!switch}."""

import math

import duckdb
import pytest

from lucene_solr_spark.search.funcparser import (FuncParseError,
                                                 compile_col,
                                                 compile_sql,
                                                 parse_func)
from lucene_solr_spark.search.localparams import (FRange, FuncScore,
                                                  LocalParamsError,
                                                  local_query)
from lucene_solr_spark.search.query import (Bool, DisMax, Phrase,
                                            Term)

SF = "/root/testdata/sf0.001"


# -- funcparser: parse + twin-compile laws ----------------------------------

CASES = [
    ("sum(3, 4, 5)", 12.0),
    ("sub(10, product(2, 3))", 4.0),
    ("div(7, 2)", 3.5),
    ("min(3, 9, 1.5)", 1.5),
    ("max(3, 9, 1.5)", 9.0),
    ("abs(sub(2, 9))", 7.0),
    ("log(100)", 2.0),
    ("ln(exp(3))", 3.0),
    ("sqrt(pow(3, 4))", 9.0),
    ("floor(2.7)", 2.0),
    ("ceil(2.2)", 3.0),
    ("map(5, 0, 10, 99)", 99.0),
    ("map(15, 0, 10, 99)", 15.0),
    ("map(15, 0, 10, 99, -1)", -1.0),
    ("if(gt(3, 2), 10, 20)", 10.0),
    ("if(lte(3, 2), 10, 20)", 20.0),
    ("if(eq(4, 4), 1, 0)", 1.0),
]


def test_twin_compilers_agree_on_constants(spark):
    from pyspark.sql import functions as F
    con = duckdb.connect()
    one = spark.range(1)
    for text, want in CASES:
        ast = parse_func(text)
        got_col = one.select(
            compile_col(ast, {}).alias("v")).collect()[0]["v"]
        got_sql = con.execute(
            "SELECT " + compile_sql(ast, {})).fetchone()[0]
        assert got_col == pytest.approx(want, abs=1e-12), text
        assert got_sql == pytest.approx(want, abs=1e-12), text


def test_field_reference_and_nesting(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(100,), (250,)], ["n_chars"])
    ast = parse_func("ln(sum(n_chars, 1))")
    vals = [r["v"] for r in df.select(
        compile_col(ast, {"n_chars": F.col("n_chars")}).alias("v"))
        .collect()]
    assert vals[0] == pytest.approx(math.log(101.0), abs=1e-12)
    assert vals[1] == pytest.approx(math.log(251.0), abs=1e-12)
    # field(name) quoting form parses to the same AST
    assert parse_func('field("n_chars")') == parse_func("n_chars")


def test_parse_errors(spark):
    for bad in ["", "sum(", "sub(1)", "map(1, 2)", "nosuch(1)",
                "scale(n_chars, 0, 1)"]:
        with pytest.raises(FuncParseError):
            ast = parse_func(bad)
            compile_col(ast, {})


# -- local-params qparsers ---------------------------------------------------

def test_func_qparser_returns_spec(spark):
    spec = local_query("{!func}sum(n_chars, 1)")
    assert isinstance(spec, FuncScore)
    assert spec.func.name == "sum"


def test_frange_qparser_bounds(spark):
    spec = local_query("{!frange l=2 u=8 incu=false}n_chars")
    assert isinstance(spec, FRange)
    assert spec.lower == 2.0 and spec.upper == 8.0
    assert spec.incl is True and spec.incu is False
    with pytest.raises(LocalParamsError):
        local_query("{!frange}n_chars")


def test_field_qparser_analysis(spark):
    assert local_query("{!field f=text}Merge Sort") \
        == Phrase(("merge", "sort"))
    assert local_query("{!field f=text}MERGE") == Term("merge")
    with pytest.raises(LocalParamsError):
        local_query("{!field f=text}!!!")


def test_raw_qparser_no_analysis(spark):
    assert local_query("{!raw f=text}Merge") == Term("Merge")


def test_maxscore_groups_should_into_dismax(spark):
    q = local_query("{!maxscore}merge sort join")
    assert isinstance(q, Bool)
    assert len(q.should) == 1
    dm = q.should[0]
    assert isinstance(dm, DisMax)
    assert dm.clauses == (Term("merge"), Term("sort"), Term("join"))
    assert dm.tiebreak == 0.0
    # non-disjunction parses pass through unchanged
    assert local_query("{!maxscore}+merge") \
        == local_query("{!lucene}+merge")


def test_switch_qparser(spark):
    params = {"qq": "merge"}
    tmpl = ("{!switch case.a='merge' case.b='{!term}Sort' "
            "default='join'}")
    assert local_query(tmpl + "a", params) == Term("merge")
    assert local_query(tmpl + "b", params) == Term("Sort")
    assert local_query(tmpl + "zz", params) == Term("join")
    with pytest.raises(LocalParamsError):
        local_query("{!switch case.a='x'}b", params)


def test_func_topk_against_duckdb(spark):
    # end-to-end: the same {!func} scored over the real corpus on
    # both engines
    from pyspark.sql import functions as F
    expr = "{!func}div(map(n_chars, 0, 300, 1000.0), sum(doc_id, 2))"
    spec = local_query(expr)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    eng = [(r["doc_id"], r["score"]) for r in docs.select(
        F.col("doc_id"),
        F.round(compile_col(spec.func,
                            {"n_chars": F.col("n_chars"),
                             "doc_id": F.col("doc_id")}), 6)
        .alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id")).limit(5)
        .collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    sql = compile_sql(spec.func, {"n_chars": "d.n_chars",
                                  "doc_id": "d.doc_id"})
    ora = [(int(a), float(b)) for a, b in con.execute(
        f"SELECT d.doc_id, ROUND({sql}, 6) AS s FROM documents d "
        "ORDER BY s DESC, d.doc_id ASC LIMIT 5").fetchall()]
    assert eng == ora
