"""Round-2b surfaces: streaming expressions, relatedness, elevation,
repetition signals, dup clusters, stratified sampling."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.relatedness import relatedness_sql
from lucene_solr_spark.search.streams import (
    StreamEvaluator, parse_stream,
)
from lucene_solr_spark.textops.ops import (
    dup_clusters, repetition_signals, sample_stratified,
)


# ---------------------------------------------------------------------------
# streaming expression parser
# ---------------------------------------------------------------------------

def test_parse_nested_expr():
    e = parse_stream(
        'rollup(innerJoin(search(documents, q="text:join", '
        'fl="a,b", sort="a asc"), search(events, q="x:y"), '
        'on="a=b"), over="lang", count(*), sum(value))')
    assert e.name == "rollup"
    assert e.params["over"] == "lang"
    join = e.args[0]
    assert join.name == "innerJoin" and join.params["on"] == "a=b"
    s1, s2 = join.args
    assert s1.args[0] == "documents" and s1.params["q"] == "text:join"
    # quoted commas stay inside the param value
    assert s1.params["fl"] == "a,b"
    aggs = [a.name for a in e.args[1:]]
    assert aggs == ["count", "sum"]
    assert e.args[2].args == ["value"]


def test_parse_select_as_and_having():
    e = parse_stream('select(search(c), doc_id as id, lang)')
    assert e.args[1] == "doc_id as id" and e.args[2] == "lang"
    h = parse_stream("having(search(c), gt(n, 5))")
    assert h.args[1].name == "gt" and h.args[1].args == ["n", "5"]


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_stream("not an expression")


# ---------------------------------------------------------------------------
# stream evaluator combinators
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def streams_env(spark):
    docs = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "de", 30), (4, "fr", 40)],
        "doc_id long, lang string, n long")
    ev = spark.createDataFrame(
        [(1, "error", 1.5), (1, "ok", 9.0), (3, "error", 2.5),
         (9, "error", 4.0)],
        "user_id long, event_type string, value double")
    return StreamEvaluator({"documents": docs, "events": ev})


def test_stream_innerjoin_rollup(streams_env):
    out = streams_env.eval(
        'rollup(innerJoin(search(documents, fl="doc_id,lang,n", '
        'sort="doc_id asc"), search(events, q="event_type:error", '
        'fl="user_id,value", sort="user_id asc"), on="doc_id=user_id"), '
        'over="lang", count(*), sum(value), max(n))')
    rows = {r["lang"]: (r["count"], r["sum_value"], r["max_n"])
            for r in out.collect()}
    assert rows == {"en": (1, 1.5, 10), "de": (1, 2.5, 30)}


def test_stream_setops_unique_top_merge(streams_env):
    # set-op keys must agree on both sides: rename via select(... as ...)
    inter = streams_env.eval(
        'intersect(search(documents, fl="doc_id", sort="doc_id asc"), '
        'select(search(events, q="event_type:error"), user_id as doc_id), '
        'on="doc_id")')
    assert sorted(r["doc_id"] for r in inter.collect()) == [1, 3]
    comp = streams_env.eval(
        'complement(search(documents, fl="doc_id", sort="doc_id asc"), '
        'select(search(events, q="event_type:error"), user_id as doc_id), '
        'on="doc_id")')
    assert sorted(r["doc_id"] for r in comp.collect()) == [2, 4]
    top = streams_env.eval(
        'top(search(documents, fl="doc_id,n"), n=2, sort="n desc")')
    assert [r["doc_id"] for r in top.collect()] == [4, 3]
    uniq = streams_env.eval('unique(search(documents), over="lang")')
    assert sorted(r["lang"] for r in uniq.collect()) == ["de", "en", "fr"]
    merged = streams_env.eval(
        'merge(search(documents, fl="doc_id", sort="doc_id asc"), '
        'select(search(events, q="event_type:error"), user_id as doc_id), '
        'on="doc_id asc")')
    assert [r["doc_id"] for r in merged.collect()] == [1, 1, 2, 3, 3, 4, 9]


def test_stream_having_and_range_q(streams_env):
    hv = streams_env.eval(
        'having(rollup(search(events, fl="user_id,value", '
        'sort="user_id asc"), over="user_id", count(*)), gt(count, 1))')
    assert [r["user_id"] for r in hv.collect()] == [1]
    rng = streams_env.eval(
        'search(events, q="value:[2.0 TO 5.0]", fl="user_id,value", '
        'sort="user_id asc")')
    assert [r["user_id"] for r in rng.collect()] == [3, 9]


def test_stream_hashjoin_broadcasts(streams_env):
    out = streams_env.eval(
        'hashJoin(search(documents, fl="doc_id,lang"), '
        'select(search(events, q="event_type:error"), user_id as doc_id, '
        'value), on="doc_id")')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


# ---------------------------------------------------------------------------
# relatedness (RelatednessAgg.computeRelatedness parity)
# ---------------------------------------------------------------------------

def _relatedness_py(fg, fgs, bg, bgs):
    bg_prob = bg / bgs
    num = fg - fgs * bg_prob
    den = math.sqrt(fgs * bg_prob * (1 - bg_prob)) or 1e-10
    z = num / den

    def sig(o, s):
        return (z + o) / (s + abs(z + o))

    r = 0.2 * (sig(-80, 50) + sig(-30, 30) + sig(0, 30) + sig(30, 30)
               + sig(80, 50))
    return math.floor(r * 1e5 + 0.5) / 1e5


@pytest.mark.parametrize("fg,fgs,bg,bgs", [
    (10, 20, 15, 1000),   # strongly over-represented
    (1, 20, 900, 1000),   # under-represented
    (5, 5, 5, 5),         # degenerate: bg_prob == 1 -> denom 0 path
    (0, 10, 3, 100),
])
def test_relatedness_sql_matches_python(fg, fgs, bg, bgs):
    import duckdb
    got = duckdb.connect().execute(
        "SELECT " + relatedness_sql(str(fg), str(fgs), str(bg), str(bgs))
    ).fetchone()[0]
    assert got == pytest.approx(_relatedness_py(fg, fgs, bg, bgs), abs=0)


def test_relatedness_monotone_in_fg():
    vals = [_relatedness_py(fg, 50, 40, 10000) for fg in (0, 5, 20, 50)]
    assert vals == sorted(vals)


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------

def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"),            # dup ratio 0.75, one bigram repeated
         (2, "one two three four"),  # all distinct
         (3, "x"),                  # single token: no bigrams
         (4, "")],                  # empty
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[1]["dup_tok_ratio"] == 0.75
    assert rows[1]["top_bigram_frac"] == 1.0
    assert not rows[1]["gopher_ok"]
    assert rows[2]["dup_tok_ratio"] == 0.0
    assert rows[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[3]["top_bigram_frac"] == 0.0
    assert rows[4]["dup_tok_ratio"] == 0.0 and rows[4]["n_tokens"] == 0
    assert rows[2]["gopher_ok"] is False  # top bigram 1/3 > 0.2
    assert rows[3]["gopher_ok"] is True


# ---------------------------------------------------------------------------
# dup clusters (connected components)
# ---------------------------------------------------------------------------

def test_dup_clusters_transitive(spark):
    # docs 1/2 identical, 2/3 near-identical, 4/5 identical, 6 unique:
    # {1,2,3} must land in ONE cluster even if (1,3) alone were below
    # the pair threshold — connected components, not pairwise cliques.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " extra"),
         (4, "one two three four five six seven"),
         (5, "one two three four five six seven"),
         (6, "totally different words nothing shared here at all")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dup_clusters(df, threshold=0.5).collect()}
    assert rows[1]["cluster"] == rows[2]["cluster"] == rows[3]["cluster"] == 1
    assert rows[4]["cluster"] == rows[5]["cluster"] == 4
    assert 6 not in rows          # no edges -> singleton, not emitted
    assert rows[1]["is_rep"] and not rows[2]["is_rep"]
    assert rows[4]["is_rep"] and not rows[5]["is_rep"]


def test_dup_clusters_chain_converges(spark):
    # a 5-doc chain (each adjacent pair shares most shingles) exercises
    # multi-round propagation: diameter 4 > 1 round
    toks = ["w%d" % i for i in range(12)]
    docs = []
    for i in range(5):
        docs.append((i + 10, " ".join(toks[i:i + 8])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r["cluster"]
            for r in dup_clusters(df, threshold=0.3).collect()}
    assert rows and len(set(rows.values())) == 1
    assert set(rows.values()) == {10}


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def test_sample_stratified_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
        "doc_id long, lang string")
    a = sorted(r["doc_id"] for r in sample_stratified(df).collect())
    b = sorted(r["doc_id"] for r in
               sample_stratified(df.repartition(7)).collect())
    assert a == b                       # partition-invariant
    assert 0 < len(a) < 400
    # keep rate ~ 3/16 in each stratum
    out = sample_stratified(df)
    per = {r["stratum"]: r["n"] for r in
           out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    for n in per.values():
        assert 200 * 3 / 16 * 0.5 < n < 200 * 3 / 16 * 1.8
    assert out.filter(F.col("bucket") >= 3).count() == 0


# ---------------------------------------------------------------------------
# soundex (phonetic filter)
# ---------------------------------------------------------------------------

def test_soundex_known_vectors():
    from lucene_solr_spark.analysis.filters import soundex_py
    # canonical commons-codec / Knuth vectors
    assert soundex_py("robert") == "R163"
    assert soundex_py("rupert") == "R163"
    assert soundex_py("ashcraft") == "A261"   # h/w collapse rule
    assert soundex_py("tymczak") == "T522"
    assert soundex_py("pfister") == "P236"    # first-letter code dedup
    assert soundex_py("jackson") == "J250"
    assert soundex_py("a") == "A000"


@pytest.mark.parametrize("word", [
    "robert", "ashcraft", "pfister", "honeyman", "merge", "x",
    "aaaa", "bbbb", "rrrr",
])
def test_soundex_sql_matches_python(word):
    import duckdb
    from lucene_solr_spark.analysis.filters import soundex_py, soundex_sql
    got = duckdb.connect().execute(
        "SELECT " + soundex_sql(f"'{word}'", "duckdb")).fetchone()[0]
    assert got == soundex_py(word)


def test_soundex_spark_duckdb_dialects_agree(spark):
    import duckdb
    from lucene_solr_spark.analysis.filters import soundex_sql
    words = ["robert", "ashcraft", "pfister", "window", "merge", "tymczak"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    sp = {r["w"]: r["k"] for r in df.selectExpr(
        "w", soundex_sql("w", "spark") + " AS k").collect()}
    con = duckdb.connect()
    for w in words:
        dk = con.execute(
            "SELECT " + soundex_sql(f"'{w}'", "duckdb")).fetchone()[0]
        assert sp[w] == dk


# ---------------------------------------------------------------------------
# monitor / percolator
# ---------------------------------------------------------------------------

def test_monitor_match_batch(spark):
    from lucene_solr_spark.search.monitor import MonitorQuery, match_batch
    docs = spark.createDataFrame(
        [(1, "the quick join and merge job"),
         (2, "join only here"),
         (3, "scan this table"),
         (4, "scan slow table"),
         (5, "merge Join MERGE case test")],
        "doc_id long, text string")
    qs = [
        MonitorQuery("jm", ("join", "merge")),
        MonitorQuery("scan_ok", ("scan",), ("slow",)),
        MonitorQuery("absent", ("zzznope",)),
    ]
    got = sorted((r["query_id"], r["doc_id"])
                 for r in match_batch(docs, qs).collect())
    assert got == [("jm", 1), ("jm", 5), ("scan_ok", 3)]


def test_monitor_requires_queries(spark):
    from lucene_solr_spark.search.monitor import match_batch
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        match_batch(docs, [])


def test_monitor_presearcher_broadcasts(spark):
    from lucene_solr_spark.search.monitor import MonitorQuery, match_batch
    docs = spark.createDataFrame(
        [(1, "join merge")], "doc_id long, text string")
    out = match_batch(docs, [MonitorQuery("q", ("join",))])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# drill sideways law: each dim's counts exclude its own drill-down
# ---------------------------------------------------------------------------

def test_drill_sideways_law(spark, monkeypatch):
    import __spark_entry__ as em
    # tiny corpus where the law is hand-checkable
    docs = spark.createDataFrame(
        [(0, "the a", "en", "s1", 5), (1, "the b", "en", "s2", 5),
         (2, "the c", "de", "s1", 5), (3, "the d", "de", "s2", 5),
         (4, "nope", "en", "s1", 4)],
        "doc_id long, text string, lang string, source string, n_chars long")
    monkeypatch.setattr(em, "_documents", lambda s, d: docs)
    em._SE.pop("mem", None), em._IX.pop("mem", None)
    monkeypatch.setattr(em, "_DS_LANG", "en")
    monkeypatch.setattr(em, "_DS_SOURCE", "s1")
    rows = {(r["dim"], r["value"]): r["n"]
            for r in em._q_drill_sideways(spark, "mem").collect()}
    # lang counts over base AND source=s1 (doc 4 doesn't match base)
    assert rows[("lang", "en")] == 1 and rows[("lang", "de")] == 1
    # source counts over base AND lang=en
    assert rows[("source", "s1")] == 1 and rows[("source", "s2")] == 1
    em._SE.pop("mem", None), em._IX.pop("mem", None)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_shape_and_invariance(spark):
    from lucene_solr_spark.textops.ops import pack_sequences
    docs = spark.createDataFrame(
        [(i, f"doc {i} has words w{i} x{i} y{i} z{i}!") for i in range(40)],
        "doc_id long, text string")
    out = pack_sequences(docs, seq_len=16).collect()
    rows = {r["seq_id"]: r for r in out}
    n_total = sum(r["n_tokens"] for r in out)
    assert n_total > 0
    last = max(rows)
    for sid, r in rows.items():
        assert r["n_tokens"] == (16 if sid != last else r["n_tokens"])
        assert 0 < r["n_tokens"] <= 16
    assert sorted(rows) == list(range(last + 1))  # dense seq ids
    # partition-invariance: the 2-pass prefix sum must not depend on
    # the input partitioning
    out2 = pack_sequences(docs.repartition(7), seq_len=16,
                          num_partitions=3).collect()
    a = sorted((r["seq_id"], r["n_tokens"], r["n_docs"], r["checksum"])
               for r in out)
    b = sorted((r["seq_id"], r["n_tokens"], r["n_docs"], r["checksum"])
               for r in out2)
    assert a == b
    # re-executing the SAME returned plan must not re-sample the range
    # partitioning (offsets were computed against the staged one): a
    # second collect has to be byte-identical to the first
    plan = pack_sequences(docs, seq_len=16)
    c1 = sorted(map(tuple, plan.collect()))
    c2 = sorted(map(tuple, plan.collect()))
    assert c1 == c2 == sorted(map(tuple, out))


def test_monitor_randomized_vs_naive(spark):
    """Property check: match_batch == a naive per-(query, doc) python
    matcher over random corpora and random conjunction queries."""
    import random
    from lucene_solr_spark.search.monitor import MonitorQuery, match_batch
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 9))))
            for i in range(60)]
    qs = []
    for qi in range(12):
        must = tuple(rng.sample(vocab, rng.randint(1, 3)))
        mnot = tuple(rng.sample(vocab, rng.randint(0, 2)))
        qs.append(MonitorQuery(f"q{qi}", must, mnot))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted((r["query_id"], r["doc_id"])
                 for r in match_batch(df, qs).collect())
    exp = []
    for q in qs:
        for did, text in docs:
            toks = set(text.split())
            if set(q.must) <= toks and not (set(q.must_not) & toks):
                exp.append((q.query_id, did))
    assert got == sorted(exp)
