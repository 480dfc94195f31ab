"""Round-2x: scoreNodes tf-idf node scoring, featuresSelection
information gain, train() batch-gradient logistic regression,
WordDelimiterGraphFilter — law + parity tests (driver parity in
tools/verify_contract.py)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter
# ---------------------------------------------------------------------------

# javadoc examples (WordDelimiterGraphFilter.java:47-94) for the
# implemented flag subset: generateWordParts + generateNumberParts +
# splitOnCaseChange + splitOnNumerics + stemEnglishPossessive
WDGF_CASES = [
    ("PowerShot", ["power", "shot"]),
    ("500-42", ["500", "42"]),
    ("wi-fi", ["wi", "fi"]),
    ("wi-fi-4000", ["wi", "fi", "4000"]),
    ("TransAM", ["trans", "am"]),
    ("O'Neil's", ["o", "neil"]),
    ("SD500", ["sd", "500"]),
    ("j2se", ["j", "2", "se"]),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("ABCDef", ["abc", "def"]),
    ("plain", ["plain"]),
]


def test_wdgf_python_model_javadoc_cases():
    from lucene_solr_spark.analysis.worddelim import wdgf_tokens
    for text, want in WDGF_CASES:
        assert wdgf_tokens(text) == want, text


def test_wdgf_catenate_all():
    from lucene_solr_spark.analysis.worddelim import wdgf_tokens
    assert wdgf_tokens("wi-fi", catenate_all=True) == ["wi", "fi", "wifi"]
    assert wdgf_tokens("O'Neil's", catenate_all=True)[-1] == "oneil"


def test_wdgf_duckdb_sql_matches_python_model():
    import duckdb
    from lucene_solr_spark.analysis.worddelim import (
        catenate_all_sql, wdgf_tokens, word_delimiter_tokens_sql)
    con = duckdb.connect()
    toks = word_delimiter_tokens_sql("s", "duckdb")
    cat = catenate_all_sql("s", "duckdb")
    for text, _ in WDGF_CASES:
        got, gotcat = con.execute(
            f"SELECT {toks}, {cat} FROM (SELECT ? AS s)", [text]
        ).fetchone()
        assert got == wdgf_tokens(text), text
        full = wdgf_tokens(text, catenate_all=True)
        assert (gotcat or None) == (full[-1] if full else None), text


def test_wdgf_spark_sql_matches_python_model(spark):
    from pyspark.sql import functions as F
    from lucene_solr_spark.analysis.worddelim import (
        catenate_all_sql, wdgf_tokens, word_delimiter_tokens_sql)
    df = spark.createDataFrame([(t,) for t, _ in WDGF_CASES], "s string")
    toks = word_delimiter_tokens_sql("s", "spark")
    cat = catenate_all_sql("s", "spark")
    for r in df.select("s", F.expr(toks).alias("t"),
                       F.expr(cat).alias("c")).collect():
        assert r.t == wdgf_tokens(r.s), r.s
        full = wdgf_tokens(r.s, catenate_all=True)
        assert (r.c or None) == (full[-1] if full else None), r.s


# ---------------------------------------------------------------------------
# featuresSelection / igain
# ---------------------------------------------------------------------------

def _h(p):
    if p <= 0 or p >= 1:
        return 0.0
    return -p * math.log(p) - (1 - p) * math.log(1 - p)


def test_igain_matches_hand_formula(spark):
    """4-doc corpus checked against the IGainTermsQParserPlugin
    formula (:156-205) computed by hand."""
    from lucene_solr_spark.search.mlstreams import features_selection
    # docs: 1:+ {a,b} 2:+ {a} 3:- {b} 4:- {c}
    postings = spark.createDataFrame(
        [("a", 1), ("b", 1), ("a", 2), ("b", 3), ("c", 4)],
        "term string, docid long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 0)], "docid long, outcome int")
    out = {r.term_s: r for r in
           features_selection(postings, labels, 3).collect()}
    n, npos = 4.0, 2.0
    # term a: df=2 xc=2
    want_a = _h(npos / n) - ((2 / n) * _h(2 / 2)
                             + (1 - 2 / n) * _h((npos - 2) / (n - 2 + 1)))
    assert out["a"].score_f == pytest.approx(want_a, abs=1e-12)
    assert out["a"].idf_d == pytest.approx(math.log(n / 3), abs=1e-12)
    # term c: df=1 xc=0
    want_c = _h(npos / n) - ((1 / n) * _h(0 / 1)
                             + (1 - 1 / n) * _h((npos - 0) / (n - 1 + 1)))
    assert out["c"].score_f == pytest.approx(want_c, abs=1e-12)
    # a perfectly separates 2 of 4 docs; it must outrank b (df=2 xc=1
    # — an uninformative split, though the formula's +1 smoothing in
    # the not-contains denominator keeps its gain slightly above 0)
    assert out["a"].index_i < out["b"].index_i
    want_b = _h(npos / n) - ((2 / n) * _h(1 / 2)
                             + (1 - 2 / n) * _h((npos - 1) / (n - 2 + 1)))
    assert out["b"].score_f == pytest.approx(want_b, abs=1e-12)
    assert out["a"].score_f > out["b"].score_f


def test_igain_num_terms_and_ids(spark):
    from lucene_solr_spark.search.mlstreams import features_selection
    postings = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "term string, docid long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 0)], "docid long, outcome int")
    rows = features_selection(postings, labels, 2, "myset").collect()
    assert len(rows) == 2
    assert [r.index_i for r in rows] == [1, 2]
    assert rows[0].id == "myset_1"
    assert all(r.featureSet_s == "myset" for r in rows)


# ---------------------------------------------------------------------------
# train / logistic regression
# ---------------------------------------------------------------------------

def _train_numpy(xs, ys, alpha, iters):
    """Independent numpy model of the batch-gradient form."""
    import numpy as np
    X = np.asarray(xs, dtype=float)
    y = np.asarray(ys, dtype=float)
    w = np.ones(X.shape[1])
    hist = []
    for _ in range(iters):
        sig = 1.0 / (1.0 + np.exp(-(X @ w)))
        err = float(np.abs(sig - y).sum())
        w = w - alpha * ((sig - y) @ X)
        hist.append((w.copy(), err))
    return hist


def test_train_logit_matches_numpy_model(spark):
    """Spark plan vs independent numpy batch-GD on a crafted corpus,
    including the reference's postings-first doc selection (docs
    without any feature term do not train) and idf*(1+ln tf)
    features."""
    from lucene_solr_spark.search.mlstreams import train_logit
    postings = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 1), ("a", 2, 1),
         ("b", 3, 3), ("a", 4, 1), ("b", 4, 2)],
        "term string, docid long, tf long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 0), (5, 1)],
        "docid long, outcome int")
    n_docs = 5
    out = train_logit(postings, labels, ["a", "b"], alpha=0.1,
                      max_iterations=4, n_docs=n_docs)
    rows = out.collect()
    assert len(rows) == 4 * 3

    idf_a = math.log(n_docs / (3 + 1.0))  # df(a)=3
    idf_b = math.log(n_docs / (3 + 1.0))  # df(b)=3

    def x(tf, idf):
        return idf * (1 + math.log(tf))

    # doc 5 has no feature term -> excluded (TextLogisticRegression
    # QParserPlugin.java:170-193 builds vectors postings-first)
    xs = [[1, x(2, idf_a), x(1, idf_b)],
          [1, x(1, idf_a), 0.0],
          [1, 0.0, x(3, idf_b)],
          [1, x(1, idf_a), x(2, idf_b)]]
    ys = [1, 1, 0, 0]
    hist = _train_numpy(xs, ys, 0.1, 4)
    for r in rows:
        w_want, err_want = hist[r.iteration_i - 1]
        assert r.weight == pytest.approx(w_want[r.idx], abs=1e-9)
        assert r.error == pytest.approx(err_want, abs=1e-9)


def test_train_logit_error_decreases_on_separable_data(spark):
    """On linearly separable data the start-weights error must shrink
    across iterations (sanity that the step direction is right)."""
    from lucene_solr_spark.search.mlstreams import train_logit
    postings = spark.createDataFrame(
        [("pos", d, 3) for d in range(10)]
        + [("neg", d, 3) for d in range(10, 20)],
        "term string, docid long, tf long")
    labels = spark.createDataFrame(
        [(d, 1 if d < 10 else 0) for d in range(20)],
        "docid long, outcome int")
    out = train_logit(postings, labels, ["pos", "neg"], alpha=0.05,
                      max_iterations=5, n_docs=20)
    errs = [r.error for r in out.filter("idx = 0")
            .orderBy("iteration_i").collect()]
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < errs[0]


# ---------------------------------------------------------------------------
# scoreNodes
# ---------------------------------------------------------------------------

def test_scorenodes_formula(spark):
    """ScoreNodesStream.java:243 on a crafted edge collection."""
    from lucene_solr_spark.search.streams import StreamEvaluator
    edges = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, "y"), (4, "z")],
        "user long, etype string")
    seeds = spark.createDataFrame([(1,), (2,)], "user long")
    ev = StreamEvaluator({"edges": edges, "seeds": seeds})
    out = {r.node: r for r in ev.eval(
        'scoreNodes(nodes(edges, search(seeds, q="*:*", fl="user"), '
        'walk="user->user", gather="etype"), '
        'collection=edges, field=etype)').collect()}
    num_docs = 6
    # x: termFreq=3 (edges reached from users 1,2), docFreq=3
    assert out["x"].numDocs == num_docs
    assert out["x"].docFreq == 3
    want = (math.log(3) + 1.0) * (math.log((num_docs + 1) / (3 + 1.0)) + 1.0)
    assert out["x"].nodeScore == pytest.approx(want, abs=1e-12)
    # y: termFreq=1 -> ln(1)+1 = 1
    want_y = 1.0 * (math.log((num_docs + 1) / (2 + 1.0)) + 1.0)
    assert out["y"].nodeScore == pytest.approx(want_y, abs=1e-12)
    assert "z" not in out  # not reached from the seed set
