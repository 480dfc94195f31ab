"""Round-3af ops: the labeled-matrix surface —
TermVectorsEvaluator.java:73 (tf-idf doc x term matrix with row/column
labels + the docFreqs attribute), TopFeaturesEvaluator.java:40
(per-row top-k positive values, TreeSet pollLast tie order),
Set/Get{Row,Column}LabelsEvaluator.java, GetAttribute(s)Evaluator.java,
and solr/core handler/AnalyzeEvaluator.java:53 feeding the terms
field. Engine results are checked against a line-for-line python twin
of the reference's doWork loops."""

import math

import pytest

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog fox"),
    (2, "quick brown foxes leap over lazy dogs in summer"),
    (3, "the lazy dog sleeps while the quick fox runs"),
    (4, "merge policies compact segments into bigger segments"),
    (5, "lazy quick brown dogs over foxes jumps jumps"),
]


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return StreamEvaluator({"docs": df})


def _tokenize(text):
    import re
    return [t.lower() for t in re.findall(r"[A-Za-z0-9]+", text)]


def _term_vectors_twin(docs, min_len=3, min_df=0.05, max_df=0.5,
                       excludes=()):
    """Line-for-line python twin of TermVectorsEvaluator.doWork
    (TermVectorsEvaluator.java:73-186)."""
    doc_freqs = {}
    row_labels = []
    terms_per_doc = []
    for did, text in docs:
        terms = _tokenize(text)
        terms_per_doc.append(terms)
        row_labels.append(str(did))
        seen = set()
        for term in terms:
            if len(term) < min_len:
                continue
            if any(e in term for e in excludes):
                continue
            if term not in seen:
                seen.add(term)
                doc_freqs[term] = doc_freqs.get(term, 0) + 1
    n = len(docs)
    mn, mx = int(n * min_df), int(n * max_df)
    doc_freqs = {t: c for t, c in sorted(doc_freqs.items())
                 if mn <= c <= mx}
    features = list(doc_freqs)          # TreeMap order = sorted
    rows = []
    for terms in terms_per_doc:
        tf = {}
        for term in terms:
            if term in doc_freqs:
                tf[term] = tf.get(term, 0) + 1
        rows.append([
            math.sqrt(tf.get(f, 0))
            * (math.log((n + 1) / float(doc_freqs[f] + 1)) + 1.0)
            for f in features])
    return rows, row_labels, features, doc_freqs


def _top_features_twin(row, features, k):
    """TopFeaturesEvaluator.getMaxIndexes: top-k positive values,
    value DESC then index DESC on ties (TreeSet pollLast)."""
    pairs = [(v, i) for i, v in enumerate(row) if v > 0]
    pairs.sort(reverse=True)            # (v, i) desc == pollLast order
    return [features[i] for _, i in pairs[:k]]


def _run(spark, expr):
    return _ev(spark).eval(expr).collect()[0]


TV_EXPR = ('let(a=select(search(docs, q="*:*", fl="doc_id,text", '
           'sort="doc_id asc"), doc_id as id, analyze(text) as terms), '
           'm=termVectors(a, minTermLength={mtl}, minDocFreq={mn}, '
           'maxDocFreq={mx}{exc}), '
           'tuple(rows=m, rl=getRowLabels(m), cl=getColumnLabels(m), '
           'tf=topFeatures(m, {k}), dfq=getAttribute(m, "docFreqs")))')


def test_term_vectors_matches_reference_twin(spark):
    r = _run(spark, TV_EXPR.format(mtl=3, mn=0.0, mx=0.6, k=3, exc=""))
    rows, rl, feats, dfs = _term_vectors_twin(DOCS, 3, 0.0, 0.6)
    assert r["rl"] == rl
    assert r["cl"] == feats
    assert [[round(v, 9) for v in row] for row in r["rows"]] == \
        [[round(v, 9) for v in row] for row in rows]
    assert [(s["t"], s["d"]) for s in r["dfq"]] == list(dfs.items())
    for got, row in zip(r["tf"], rows):
        assert got == _top_features_twin(row, feats, 3)


def test_doc_freq_gate_and_min_term_length(spark):
    """'the'/'fox'/'in' fall to minTermLength=4; terms over
    maxDocFreq and under minDocFreq prune — (int) truncation on both
    bounds (TermVectorsEvaluator.java:140-141)."""
    r = _run(spark, TV_EXPR.format(mtl=4, mn=0.4, mx=0.8, k=2, exc=""))
    rows, rl, feats, dfs = _term_vectors_twin(DOCS, 4, 0.4, 0.8)
    assert r["cl"] == feats and len(feats) > 0
    assert all(len(t) >= 4 for t in feats)
    # df gate: int(5*0.4)=2 <= df <= int(5*0.8)=4
    assert all(2 <= d <= 4 for d in dfs.values())
    assert [(s["t"], s["d"]) for s in r["dfq"]] == list(dfs.items())


def test_exclude_substring(spark):
    """exclude= drops any term CONTAINING an excluded substring
    (term.indexOf(exclude) > -1, TermVectorsEvaluator.java:116)."""
    r = _run(spark, TV_EXPR.format(mtl=3, mn=0.0, mx=0.6, k=3,
                                   exc=', exclude="fox,dog"'))
    rows, rl, feats, dfs = _term_vectors_twin(
        DOCS, 3, 0.0, 0.6, excludes=("fox", "dog"))
    assert r["cl"] == feats
    assert not any("fox" in t or "dog" in t for t in r["cl"])


def test_top_features_tie_order_is_index_desc(spark):
    """Equal values tie-break by HIGHER index first (TreeSet<Pair>
    pollLast with index-ascending compareTo)."""
    ev = _ev(spark)
    out = ev.eval(
        'let(z=tuple(x=1), tuple(tf=topFeatures(setColumnLabels('
        'matrix(array(2, 5, 5, 1)), array(a, b, c, d)), 3)))')
    assert out.collect()[0]["tf"] == [["c", "b", "a"]]


def test_top_features_skips_non_positive(spark):
    ev = _ev(spark)
    out = ev.eval(
        'tuple(tf=topFeatures(setColumnLabels('
        'matrix(array(0, 3, sub(0, 2), 1)), array(a, b, c, d)), 4))')
    assert out.collect()[0]["tf"] == [["b", "d"]]


def test_set_get_labels_roundtrip_and_tostring(spark):
    """setRowLabels converts numeric labels to strings
    (SetRowLabelsEvaluator.java:46: o.toString())."""
    ev = _ev(spark)
    out = ev.eval(
        'tuple(rl=getRowLabels(setRowLabels(matrix(array(1, 2), '
        'array(3, 4)), array(10, 20))), '
        'cl=getColumnLabels(setColumnLabels(matrix(array(1, 2)), '
        'array(x, y))))')
    r = out.collect()[0]
    assert r["rl"] == ["10", "20"]
    assert r["cl"] == ["x", "y"]


def test_get_labels_requires_labels(spark):
    ev = _ev(spark)
    with pytest.raises(Exception, match="label"):
        ev.eval('tuple(rl=getRowLabels(matrix(array(1, 2))))')


def test_get_attribute_unknown_key_raises(spark):
    ev = _ev(spark)
    with pytest.raises(Exception, match="attribute|matrix"):
        ev.eval('tuple(x=getAttribute(matrix(array(1)), "nope"))')


def test_matrix_value_renders_as_rows(spark):
    """A labeled matrix bound as a tuple value renders its data rows
    (the reference serializes Matrix as the row list); unlabeled
    matrix math accepts the labeled object via getData() unwrap."""
    ev = _ev(spark)
    out = ev.eval(
        'let(m=setRowLabels(matrix(array(1, 2), array(3, 4)), '
        'array(r1, r2)), '
        'tuple(rows=m, gs=grandSum(m), t0=rowAt(transpose(m), 0), '
        'rc=rowCount(m), cc=columnCount(m), sr=sumRows(m)))')
    r = out.collect()[0]
    assert r["rows"] == [[1.0, 2.0], [3.0, 4.0]]
    assert r["gs"] == 10.0
    assert r["t0"] == [1.0, 3.0]
    assert (r["rc"], r["cc"]) == (2, 2)
    assert r["sr"] == [3.0, 7.0]


def test_analyze_matches_simple_tokenizer(spark):
    from lucene_solr_spark.analysis.analyzers import simple_tokenize
    ev = _ev(spark)
    out = ev.eval('select(search(docs, q="*:*", fl="doc_id,text", '
                  'sort="doc_id asc"), doc_id, analyze(text) as t)')
    got = {r["doc_id"]: r["t"] for r in out.collect()}
    for did, text in DOCS:
        assert got[did] == simple_tokenize(text)


def test_term_vectors_requires_id_and_terms(spark):
    ev = _ev(spark)
    with pytest.raises(Exception, match="id and terms|bound let"):
        ev.eval('let(a=search(docs, q="*:*", fl="doc_id,text", '
                'sort="doc_id asc"), '
                'tuple(m=termVectors(a)))')


def test_doc_freq_percentage_validated(spark):
    ev = _ev(spark)
    with pytest.raises(Exception, match="between 0 and 1"):
        ev.eval(TV_EXPR.format(mtl=3, mn=0.0, mx=1.5, k=3, exc=""))
