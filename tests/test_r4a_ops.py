"""Round-4a laws: index-statistic ValueSources + exists()/def().

Reference semantics pinned here:
- ValueSourceParser.java:646-717 registers docfreq/totaltermfreq(+ttf)/
  sumtotaltermfreq(+sttf)/idf/termfreq/tf/norm/maxdoc/numdocs — all
  need the IndexSearcher bound into the context map at createWeight
  time (NormValueSource.java:58); funcparser mirrors that with an
  explicit ctx mapping over collect_index_sources triples.
- TFValueSource.java:40: tf = similarity.tf(freq) = sqrt(freq)
  (ClassicSimilarity.java:46), freq 0 when the term misses the doc.
- IDFValueSource.java:55: idf = sim.idf(df, maxDoc) =
  ln((maxDoc+1)/(df+1)) + 1 (ClassicSimilarity.java:62).
- ValueSourceParser.java:778 exists(), :935 def() — row-local.
"""

import duckdb
import pytest

from lucene_solr_spark.search.funcparser import (FuncParseError,
                                                 collect_index_sources,
                                                 compile_sql,
                                                 parse_func)


def _sql1(expr, cols=None, ctx=None):
    sql = compile_sql(parse_func(expr), cols or {}, ctx)
    return duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]


# --- grammar ---------------------------------------------------------------

def test_quoted_term_literal_parses():
    ast = parse_func("docfreq(text,'some term')")
    assert ast.args[1].name == "str"
    assert ast.args[1].field == "some term"
    ast2 = parse_func('docfreq(text,"dq")')
    assert ast2.args[1].field == "dq"


def test_bare_term_and_numeric_term_accepted():
    # parseTerm accepts bare words; a numeric term is the literal's text
    assert collect_index_sources(parse_func("docfreq(text,join)")) == \
        {("docfreq", "text", "join")}
    assert collect_index_sources(parse_func("docfreq(year,2020)")) == \
        {("docfreq", "year", "2020")}


def test_alias_canonicalization():
    # alias("totaltermfreq","ttf"); alias("sumtotaltermfreq","sttf")
    assert collect_index_sources(parse_func("ttf(text,a)")) == \
        {("totaltermfreq", "text", "a")}
    assert collect_index_sources(parse_func("sttf(text)")) == \
        {("sumtotaltermfreq", "text", "")}


def test_collect_walks_nested_tree():
    ast = parse_func("sum(product(tf(text,a), idf(text,a)), "
                     "norm(text), maxdoc(), ln(sum(numdocs(), 1)))")
    assert collect_index_sources(ast) == {
        ("tf", "text", "a"), ("idf", "text", "a"),
        ("norm", "text", ""), ("maxdoc", "", ""),
        ("numdocs", "", "")}


def test_arity_errors():
    for bad in ("docfreq(text)", "norm()", "maxdoc(x)",
                "def(a)", "exists()", "tf(a,b,c)"):
        with pytest.raises(FuncParseError):
            compile_sql(parse_func(bad), {"a": "a", "x": "x",
                                          "text": "text"},
                        {("docfreq", "text", ""): "0"})


def test_no_ctx_raises_with_pointer():
    with pytest.raises(FuncParseError, match="index context"):
        compile_sql(parse_func("idf(text,a)"), {})


def test_missing_ctx_key_raises():
    with pytest.raises(FuncParseError, match="missing"):
        compile_sql(parse_func("idf(text,a)"), {},
                    {("idf", "text", "b"): "1.0"})


# --- row-local exists()/def() ---------------------------------------------

def test_def_field_coalesces():
    cols = {"f": "NULL"}
    assert _sql1("def(f, -1)", cols) == -1.0
    cols = {"f": "7"}
    assert _sql1("def(f, -1)", cols) == 7.0


def test_def_computed_source_passthrough():
    # DefFunction on a non-field source: the source always exists,
    # so the default never applies
    assert _sql1("def(sum(2, 3), -1)") == 5.0


def test_exists_field_and_computed():
    assert _sql1("exists(f)", {"f": "NULL"}) == 0.0
    assert _sql1("exists(f)", {"f": "0"}) == 1.0   # 0 still exists
    assert _sql1("exists(sum(1, 2))") == 1.0


def test_exists_unknown_field_raises():
    with pytest.raises(FuncParseError):
        compile_sql(parse_func("exists(nope)"), {"f": "f"})


# --- semantics through a DuckDB micro-index --------------------------------

def test_tf_idf_norm_formulas_against_micro_corpus():
    """Hand-checkable corpus: 3 docs; term 'a' in docs 0 (freq 2) and
    1 (freq 1); doc lengths 4, 1, 3 (all < 40, SmallFloat-exact)."""
    import math
    n, df = 3, 2
    idf = math.log((n + 1.0) / (df + 1.0)) + 1.0
    ctx = {("tf", "text", "a"): "SQRT(CAST(freq AS DOUBLE))",
           ("idf", "text", "a"):
               f"(LN((CAST({n} AS DOUBLE) + 1.0) / "
               f"(CAST({df} AS DOUBLE) + 1.0)) + 1.0)",
           ("norm", "text", ""):
               "(CASE WHEN qdl > 0 THEN CAST(1.0 AS DOUBLE) / "
               "SQRT(CAST(qdl AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END)"}
    sql = compile_sql(
        parse_func("product(tf(text,'a'), idf(text,'a'), norm(text))"),
        {}, ctx)
    rows = duckdb.sql(
        "WITH t(freq, qdl, i) AS (VALUES (2, 4, 0), (1, 1, 1), "
        f"(0, 3, 2)) SELECT {sql} AS v FROM t ORDER BY i").fetchall()
    got = [r[0] for r in rows]
    exp = [math.sqrt(2) * idf / math.sqrt(4), 1.0 * idf / 1.0, 0.0]
    assert got == pytest.approx(exp, abs=1e-12)


def test_norm_zero_length_is_zero():
    # TFIDFSimilarity normTable[0] = 0 — empty docs norm to 0, not inf
    ctx = {("norm", "text", ""):
           "(CASE WHEN qdl > 0 THEN CAST(1.0 AS DOUBLE) / "
           "SQRT(CAST(qdl AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END)"}
    sql = compile_sql(parse_func("norm(text)"), {}, ctx)
    v = duckdb.sql(
        f"WITH t(qdl) AS (VALUES (0)) SELECT {sql} FROM t").fetchone()[0]
    assert v == 0.0


def test_index_sources_compose_with_row_local_tree():
    # constants fold into arbitrary arithmetic like any other source
    ctx = {("docfreq", "text", "a"): "CAST(5 AS DOUBLE)",
           ("maxdoc", "", ""): "CAST(100 AS DOUBLE)"}
    v = _sql1("div(maxdoc(), sum(docfreq(text,'a'), 3))", None, ctx)
    assert v == pytest.approx(100.0 / 8.0)
