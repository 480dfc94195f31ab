"""Round-3m ops: ComplexPhrase parser, point-in-set filter,
length-bias diagnostic."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ComplexPhraseQueryParser (the ninth parser family)
# ---------------------------------------------------------------------------

def test_complex_phrase_compiles_to_engine_nodes():
    from lucene_solr_spark.search.complexphrase import (
        ComplexPhraseError, parse_complex_phrase)
    from lucene_solr_spark.search.query import (Bool, MultiPhrase,
                                                Phrase, PhraseWildcard,
                                                Term, Wildcard)
    q = parse_complex_phrase('+"ha* join" "table (hash merge)"')
    assert isinstance(q, Bool)
    assert isinstance(q.must[0], PhraseWildcard)
    assert q.must[0].slots == ("ha*", "join")
    assert isinstance(q.should[0], MultiPhrase)
    assert q.should[0].slots == (("table",), ("hash", "merge"))

    q2 = parse_complex_phrase('"slow batch"~2')
    assert q2 == Phrase(("slow", "batch"), slop=2)

    q3 = parse_complex_phrase('scan -"table hash" wild*')
    assert isinstance(q3, Bool)
    assert Term("scan") in q3.should
    assert any(isinstance(s, Wildcard) for s in q3.should)
    assert q3.must_not == (Phrase(("table", "hash")),)


def test_complex_phrase_documented_divergences():
    from lucene_solr_spark.search.complexphrase import (
        ComplexPhraseError, parse_complex_phrase)
    with pytest.raises(ComplexPhraseError):
        parse_complex_phrase('"ha* (a b)"')          # mixed mechanisms
    with pytest.raises(ComplexPhraseError):
        parse_complex_phrase('"ha* join"~2')         # slop + pattern
    with pytest.raises(ComplexPhraseError):
        parse_complex_phrase('-"only negative"')
    with pytest.raises(ComplexPhraseError):
        parse_complex_phrase('"a () b"')             # empty group


def test_complex_phrase_end_to_end_equals_ast(spark):
    """The parsed query scores identically to the hand-built AST."""
    import __spark_entry__ as entry
    from lucene_solr_spark.search.complexphrase import (
        parse_complex_phrase)
    from lucene_solr_spark.search.query import (Bool, MultiPhrase,
                                                PhraseWildcard)
    se = entry._searcher(spark, SF)
    got = [tuple(r) for r in se.topk(
        parse_complex_phrase(entry._CPX_Q), 10).collect()]
    ast = Bool(must=(PhraseWildcard(("ha*", "join")),),
               should=(MultiPhrase((("table",), ("hash", "merge"))),))
    want = [tuple(r) for r in se.topk(ast, 10).collect()]
    assert got == want and got


# ---------------------------------------------------------------------------
# point-in-set
# ---------------------------------------------------------------------------

def test_point_in_set_is_exact_membership(spark):
    import __spark_entry__ as entry
    from lucene_solr_spark.search.query import Term
    se = entry._searcher(spark, SF)
    nmap = {r["docid"]: r["n_chars"]
            for r in se.ix.source.select("docid", "n_chars").collect()}
    scored = {r["docid"]: round(r["score"], 6)
              for r in se.scored(Term("scan")).collect()}
    vals = set(entry._PIS_VALUES)
    want = sorted(((d, s) for d, s in scored.items()
                   if nmap[d] in vals),
                  key=lambda x: (-x[1], x[0]))[:10]
    got = [(r["doc_id"], r["score"])
           for r in entry._q_point_in_set(spark, SF).collect()]
    assert got == want and got
    assert len(want) < len(scored)   # the set actually filters


# ---------------------------------------------------------------------------
# len_bias
# ---------------------------------------------------------------------------

def test_len_bias_python_twin(spark):
    from lucene_solr_spark.textops.ops import fasttext_score, len_bias
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = {r["doc_id"]: (r["prob"], r["n_tokens"])
         for r in fasttext_score(docs).collect()}
    lang = {r["doc_id"]: r["lang"]
            for r in docs.select("doc_id", "lang").collect()}
    groups = {}
    for d, (p, n) in s.items():
        groups.setdefault(lang[d], []).append((p, float(n)))

    got = {r["lang"]: r for r in len_bias(docs).collect()}
    assert set(got) == set(groups)
    for l, xs in groups.items():
        n = float(len(xs))
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        sxx = sum(x * x for x, _ in xs)
        syy = sum(y * y for _, y in xs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        r_want = (0.0 if vx <= 0 or vy <= 0
                  else (n * sxy - sx * sy) / (math.sqrt(vx)
                                              * math.sqrt(vy)))
        r = got[l]
        assert r["n"] == len(xs)
        assert math.isclose(r["mean_len"], sy / n, abs_tol=1e-6)
        assert math.isclose(r["mean_reward"], sx / n, abs_tol=1e-6)
        assert math.isclose(r["len_reward_corr"], r_want, abs_tol=1e-5)
        assert -1.0 <= r["len_reward_corr"] <= 1.0


def test_len_bias_zero_variance_is_zero(spark):
    from pyspark.sql import Row
    from lucene_solr_spark.textops.ops import len_bias
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="xx", text="same text here") for i in
         range(4)])
    r = len_bias(df).collect()[0]
    assert r["len_reward_corr"] == 0.0
