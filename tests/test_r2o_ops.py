"""Round-2o: TimeSeriesStream gap-fill, FetchStream enrichment,
euclidean kNN score transform, HyperLogLog cardinality — laws vs
python/numpy recomputation (driver parity in tools/verify_contract.py)."""

import datetime as dt

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _evaluator(spark, events):
    from lucene_solr_spark.search.streams import StreamEvaluator
    return StreamEvaluator({"events": events})


@pytest.fixture(scope="module")
def tiny_events(spark):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [(i, base + dt.timedelta(minutes=m), "error", float(v))
            for i, (m, v) in enumerate(
                [(0, 1.0), (1, 2.0), (12, 4.0), (31, 8.0), (59, 16.0)])]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double")


def test_timeseries_gapfill_law(spark, tiny_events):
    """Every bucket in [start, end) appears exactly once; empty buckets
    are zero-filled (TimeSeriesStream.java:420); occupied buckets carry
    the exact count/sum."""
    ev = _evaluator(spark, tiny_events)
    out = ev.eval(
        'timeseries(events, q="event_type:error", field="ts", '
        'start="2024-03-01T00:00:00Z", end="2024-03-01T01:00:00Z", '
        'gap="+15MINUTES", count(*), sum(value))').collect()
    got = [(r.ts, r["count"], r.sum_value) for r in out]
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    exp = [(base, 3, 7.0),
           (base + dt.timedelta(minutes=15), 0, 0.0),
           (base + dt.timedelta(minutes=30), 1, 8.0),
           (base + dt.timedelta(minutes=45), 1, 16.0)]
    assert got == exp


def test_timeseries_end_exclusive(spark, tiny_events):
    """A row exactly at end is excluded; bucket spine never emits the
    end boundary."""
    ev = _evaluator(spark, tiny_events)
    out = ev.eval(
        'timeseries(events, q="*:*", field="ts", '
        'start="2024-03-01T00:00:00Z", end="2024-03-01T00:59:00Z", '
        'gap="+59MINUTES", count(*))').collect()
    assert len(out) == 1
    assert out[0]["count"] == 4  # the minute-59 row is outside


def test_fetch_left_join_passthrough(spark):
    """FetchStream: tuples with no collection match pass through with
    null-filled fetch fields."""
    from lucene_solr_spark.search.streams import StreamEvaluator
    stream = spark.createDataFrame(
        [(1, 10), (2, 99)], "sid long, key long")
    coll = spark.createDataFrame(
        [(10, "en", 7)], "doc_id long, lang string, n_chars long")
    ev = StreamEvaluator({"s": stream, "d": coll})
    ev.collections["s"] = stream
    out = ev.eval('fetch(d, search(s, q="*:*", fl="sid,key", '
                  'sort="sid asc"), on="key=doc_id", fl="lang,n_chars")')
    rows = {r.sid: (r.lang, r.n_chars) for r in out.collect()}
    assert rows == {1: ("en", 7), 2: (None, None)}


def test_l2_topk_law(spark):
    """score = round(1/(1 + ||v-q||^2), 6), descending with id ASC
    tie-break — vs numpy."""
    from lucene_solr_spark.vector.ann import l2_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    got = [(r.vec_id, r.score) for r in l2_topk(emb, 0, k=10).collect()]
    q = vecs[0]
    exp = sorted(((round(1.0 / (1.0 + float(np.sum((v - q) ** 2))), 6), i)
                  for i, v in vecs.items() if i != 0),
                 key=lambda t: (-t[0], t[1]))[:10]
    assert got == [(i, s) for s, i in exp]


def test_hll_sql_matches_python_twin(spark):
    """The generated register/rho SQL reproduces hll_py exactly in
    BOTH engines on a known value set."""
    import duckdb
    from lucene_solr_spark.textops.sketches import (
        hll_estimate_sql, hll_py, hll_reg_sql, hll_rho_sql)
    vals = [f"doc-{i}" for i in range(400)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS v", [vals])
    d_est = con.execute(
        f"WITH r AS (SELECT {hll_reg_sql('v')} AS reg, "
        f"MAX({hll_rho_sql('v')}) AS mrho FROM t GROUP BY 1) "
        + hll_estimate_sql("r")).fetchone()[0]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    df.selectExpr(f"{hll_reg_sql('v')} AS reg",
                  f"{hll_rho_sql('v')} AS rho") \
        .groupBy("reg").agg({"rho": "max"}) \
        .withColumnRenamed("max(rho)", "mrho") \
        .createOrReplaceTempView("hll_t")
    s_est = spark.sql(hll_estimate_sql("hll_t")).first()[0]
    assert d_est == s_est == hll_py(vals)


def test_hll_estimate_accuracy():
    """Estimate within 5 standard errors (5 * 1.04/sqrt(256) = 32.5%)
    of truth across two magnitudes; small range is near-exact via
    linear counting."""
    from lucene_solr_spark.textops.sketches import hll_py
    for n in (100, 2000, 20000):
        est = hll_py(f"value-{i}" for i in range(n))
        assert abs(est - n) / n < 0.325, (n, est)


def test_bloom_pos_three_way_parity(spark):
    """bloom_pos_sql == bloom_pos_py in BOTH engines over words that
    exercise several positions."""
    import duckdb
    from lucene_solr_spark.textops.sketches import (
        bloom_pos_py, bloom_pos_sql)
    words = [f"w{i}" for i in range(50)] + ["merge", "join", "zebra"]
    con = duckdb.connect()
    for bits in (256, 4096):
        got_d = [con.execute(
            "SELECT " + bloom_pos_sql(f"'{w}'", bits)).fetchone()[0]
            for w in words]
        df = spark.createDataFrame([(w,) for w in words], "w string")
        got_s = [r[0] for r in df.selectExpr(
            bloom_pos_sql("w", bits) + " AS p").collect()]
        exp = [bloom_pos_py(w, bits) for w in words]
        assert got_d == exp == got_s, bits


def test_bloom_no_false_negatives():
    """Every inserted value answers MAYBE (FuzzySet.java:216 — a set
    bit can never be missed); absent values collide at small masks."""
    from lucene_solr_spark.textops.sketches import bloom_pos_py
    vocab = [f"term{i}" for i in range(200)]
    occupied = {bloom_pos_py(t, 256) for t in vocab}
    assert all(bloom_pos_py(t, 256) in occupied for t in vocab)
    absent = [f"zz{i}" for i in range(100)]
    fp = sum(bloom_pos_py(t, 256) in occupied for t in absent)
    assert 0 < fp < 100  # the MAYBE false-positive path is live


def _profile_sig_py(text, quant_rate=0.01, min_len=2):
    """Python twin of TextProfileSignature.java:66-137 (deterministic
    tok-ASC tie order)."""
    import hashlib
    import re
    from collections import Counter
    toks = [t for t in re.findall(r"[a-z0-9]+", text.lower())
            if len(t) > min_len]
    if not toks:
        return hashlib.md5(b"").hexdigest()
    tf = Counter(toks)
    mf = max(tf.values())
    quant = round(mf * quant_rate)
    if quant < 2:
        quant = 2 if mf > 1 else 1
    prof = sorted(((t, (c // quant) * quant) for t, c in tf.items()
                   if (c // quant) * quant >= quant),
                  key=lambda tc: (-tc[1], tc[0]))
    body = "\n".join(f"{t} {c}" for t, c in prof)
    return hashlib.md5(body.encode()).hexdigest()


def test_text_profile_signature_law(spark):
    """Engine signature == python twin, including: all-unique tokens
    (quant=1 keeps everything), repeated tokens (quant=2 discards
    singletons), short-token discard, and the empty-profile md5('')
    path. Near-dup robustness: reordering and singleton noise do not
    change the signature once counts repeat."""
    from lucene_solr_spark.textops.ops import text_profile_signature
    docs = [
        (0, "alpha beta gamma delta"),
        (1, "alpha alpha alpha beta beta noise filler words here"),
        (2, "beta beta alpha alpha alpha other single tokens again"),
        (3, "a b c xy"),                       # all tokens too short
        (4, ""),
        (5, "alpha, ALPHA! alpha; beta beta?"),  # punct/casing folds
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.profile_sig
           for r in text_profile_signature(df).collect()}
    for i, t in docs:
        assert got[i] == _profile_sig_py(t), (i, t)
    # docs 1 and 2 share the quantized profile (alpha 2, beta 2):
    # singleton noise is discarded at quant=2, so the signature matches
    assert got[1] == got[2]
    assert got[3] == got[4] == _profile_sig_py("")
