"""Round-3 ADVICE regressions: quote-aware function-arg lexing, NULL
semantics of concat() across both compilers, MultiPassIndexSplitter
--seq floor-width parts, RemoveBlankField's length-0-only rule, and
SQL quote escaping in analysis/funcparser emitters."""
import duckdb
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.filters import pattern_replace_sql
from lucene_solr_spark.index.processors import remove_blank
from lucene_solr_spark.search.funcparser import (
    FuncParseError, _split_args, compile_col, compile_sql, parse_func)


def test_split_args_quote_aware():
    assert _split_args("f, ','") == ["f", "','"]
    assert _split_args("concat(a, ','), b") == ["concat(a, ',')", "b"]
    # unbalanced paren INSIDE quotes must not corrupt the depth
    assert _split_args("'text:(a', b") == ["'text:(a'", "b"]
    assert _split_args('f, "x,y", g') == ["f", '"x,y"', "g"]
    # backslash-escaped quote inside a quoted arg
    assert _split_args(r"'a\'b', c") == [r"'a\'b'", "c"]


def test_concat_comma_literal_parses():
    node = parse_func("concat(lang, ',')")
    assert node.name == "concat" and len(node.args) == 2


def test_concat_null_parity_spark_vs_duckdb(spark):
    """Spark F.concat returns NULL when any operand is NULL; the SQL
    emission must match (DuckDB CONCAT() would skip NULLs)."""
    node = parse_func("concat(a, b)")
    cols = {"a": "a", "b": "b"}
    df = spark.createDataFrame(
        [("x", "y"), ("x", None), (None, "y")], "a string, b string")
    got = [r[0] for r in df.select(
        compile_col(node, {"a": F.col("a"), "b": F.col("b")})).collect()]
    sql = compile_sql(node, cols)
    oracle = [r[0] for r in duckdb.sql(
        f"SELECT {sql} FROM (VALUES ('x','y'), ('x',NULL), "
        f"(NULL,'y')) t(a,b)").fetchall()]
    assert got == oracle == ["xy", None, None]


def test_quoted_literal_sql_escaping():
    node = parse_func("concat(a, \"it's\")")
    sql = compile_sql(node, {"a": "a"})
    # well-formed: the embedded quote is doubled
    assert "'it''s'" in sql
    assert duckdb.sql(
        f"SELECT {sql} FROM (VALUES ('x')) t(a)").fetchone()[0] == "xit's"


def test_pattern_replace_sql_escapes_quotes():
    sql = pattern_replace_sql("c", "o'", "X'", dialect="duckdb")
    got = duckdb.sql(
        f"SELECT {sql} FROM (VALUES ('fo''ba')) t(c)").fetchone()[0]
    assert got == "fX'ba"


def test_remove_blank_keeps_whitespace_only(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, "x"), (4, None)], "id int, f string")
    out = {r["id"]: r["f"] for r in remove_blank("f")(df).collect()}
    assert out[1] is None          # zero-length removed
    assert out[2] == "  "          # whitespace-only KEPT (reference)
    assert out[3] == "x"
    assert out[4] is None


def test_split_round_robin_seq_floor(spark, xs_transcripts, tmp_path):
    """10 docs / 3 sequential parts -> 3/3/4 (floor width, the LAST
    part absorbs the remainder), matching MultiPassIndexSplitter
    --seq's partLen = maxDoc/numParts lo/hi computation."""
    from lucene_solr_spark.index.splitter import split_round_robin
    from lucene_solr_spark.index.writer import IndexWriter

    corpus = xs_transcripts.limit(10).drop("docid")
    w = IndexWriter.create(spark, str(tmp_path / "ix"),
                           docs_per_segment=128)
    w.append_raw(corpus)
    parts = split_round_robin(
        spark, w.path, [str(tmp_path / f"p{i}") for i in range(3)],
        sequential=True)
    assert [p.doc_count for p in parts] == [3, 3, 4]


def test_quoted_literal_backslash_unescape():
    # StrParser unescapes \' inside quoted args; the quote-aware
    # lexer delivers the raw text, parse_func unescapes
    node = parse_func(r"concat(a, 'it\'s')")
    assert node.args[1].field == "it's"
    sql = compile_sql(node, {"a": "a"})
    assert duckdb.sql(
        f"SELECT {sql} FROM (VALUES ('x')) t(a)").fetchone()[0] \
        == "xit's"
