"""Pluggable similarities: Classic TF-IDF, LMDirichlet, Boolean
(SEARCH/similarities/{ClassicSimilarity,LMDirichletSimilarity,
BooleanSimilarity}.java) — engine == DuckDB oracle on every scored
shape, plus the BaseSimilarityTestCase-style law sweeps
(test-framework/.../BaseSimilarityTestCase.java:280-345: score finite,
non-negative, monotone in freq, anti-monotone in df / doc length)."""

import duckdb
import math
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.engine import Searcher
from lucene_solr_spark.search.oracle import OracleBuilder
from lucene_solr_spark.search.query import (
    Bool, Boost, DisMax, Phrase, Synonym, Term,
)
from lucene_solr_spark.search.similarities import (
    BM25Similarity, BooleanSimilarity, ClassicSimilarity,
    LMDirichletSimilarity, SIMILARITIES,
)

# varied doc lengths + tf so the similarities disagree on ranking
DOCS = [
    (0, "join merge join hash table scan the the the", "en", "s0"),
    (1, "join", "en", "s1"),
    (2, "merge hash merge merge the table", "de", "s2"),
    (3, "scan table join merge hash scan the sort sort window batch "
        "stream vector dup key line fast slow query spark batch join "
        "the the the the the the the the the the the the the", "en", None),
    (4, "table hash", "fr", "s4"),
    (5, "the the the the the the the the", "en", "s5"),
    (6, "dup window vector join hash", "en", "s6"),
]

QUERIES = [
    Term("join"),
    Term("the"),
    Bool(should=(Term("join"), Term("merge"), Term("table"))),
    Bool(must=(Term("join"), Term("hash")), must_not=(Term("dup"),)),
    Bool(must=(Term("table"),), should=(Term("scan"),)),
    Synonym(("join", "merge")),
    Phrase(("hash", "table")),
    DisMax((Term("join"), Term("table")), 0.3),
    Bool(should=(Boost(Term("join"), 2.0), Term("hash"))),
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sims") / "documents.parquet")
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    ix = build_index(spark.read.parquet(p))
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{p}/*.parquet'")
    return ix, con


def _cmp(ix, con, sim, q, k=10):
    se = Searcher(ix, similarity=sim)
    ob = OracleBuilder(similarity=sim)
    eng = [(r.doc_id, r.score) for r in se.topk(q, k).collect()]
    ora = [(int(a), float(b))
           for a, b in con.execute(ob.topk_sql(q, k)).fetchall()]
    assert eng == ora, f"{type(sim).__name__ if sim else 'BM25'}: {q}"
    return eng


@pytest.mark.parametrize("simname", ["classic", "lmdirichlet", "boolean"])
def test_engine_matches_oracle(corpus, simname):
    ix, con = corpus
    sim = SIMILARITIES[simname]()
    for q in QUERIES:
        _cmp(ix, con, sim, q)


def test_pluggable_bm25_matches_default_path(corpus):
    """BM25Similarity through the pluggable funnel returns exactly the
    default path's results (same stats, same double formula)."""
    ix, con = corpus
    for q in QUERIES:
        a = _cmp(ix, con, BM25Similarity(), q)
        b = _cmp(ix, con, None, q)
        assert a == b


def test_classic_formula_laws():
    """ClassicSimilarity.java:39-62: idf anti-monotone in df; score
    monotone in tf, anti-monotone in doc length."""
    sim = ClassicSimilarity()
    n, sumttf = 1000, 50000
    idfs = [sim.weight(df, 10, n, sumttf) for df in (1, 10, 100, 1000)]
    assert idfs == sorted(idfs, reverse=True) and all(w > 0 for w in idfs)
    w = sim.weight(10, 20, n, sumttf)

    def score(tf, dl):
        return w * math.sqrt(tf) / math.sqrt(dl)

    assert score(1, 10) < score(4, 10) < score(9, 10)
    assert score(4, 100) < score(4, 10) < score(4, 1)


def test_lmdirichlet_clamp_and_monotonicity():
    """LMDirichletSimilarity.java:73-78: non-negative (clamped), monotone
    in tf; a very common term in a long doc scores exactly 0."""
    sim = LMDirichletSimilarity()
    mu = sim.mu

    def score(tf, dl, ttf, sumttf):
        p = sim.weight(0, ttf, 0, sumttf)  # mu * collection probability
        s = math.log(1 + tf / p) + math.log(mu / (dl + mu))
        return max(s, 0.0)

    # rare term: positive, monotone in tf
    s1, s2 = score(1, 20, 5, 100000), score(3, 20, 5, 100000)
    assert 0 < s1 < s2
    # very common term (half the collection), tf=1, long doc -> clamped 0
    assert score(1, 5000, 50000, 100000) == 0.0


def test_boolean_similarity_scores_are_boost_sums(corpus):
    """BooleanSimilarity.java:47-60: score == sum of matched clause
    boosts, independent of tf/df/length."""
    ix, con = corpus
    se = Searcher(ix, similarity=BooleanSimilarity())
    q = Bool(should=(Boost(Term("join"), 2.0), Term("hash")))
    rows = {r.doc_id: r.score for r in se.topk(q, 10).collect()}
    # doc 0: join+hash -> 3.0; doc 1: join only -> 2.0; doc 4: hash -> 1.0
    assert rows[0] == 3.0 and rows[1] == 2.0 and rows[4] == 1.0


def test_sweetspot_engine_matches_oracle(corpus):
    from lucene_solr_spark.search.similarities import SweetSpotSimilarity
    ix, con = corpus
    sim = SweetSpotSimilarity(ln_min=2, ln_max=8, steepness=0.5,
                              tf_base=1.5, tf_min=2.0)
    for q in QUERIES:
        _cmp(ix, con, sim, q)


def test_sweetspot_degrades_to_classic(corpus):
    """SweetSpotSimilarity.java:104-106 javadoc check: with
    min=max=1, steepness=0.5, baselineTf base=min=0 the formula IS
    ClassicSimilarity (1/sqrt(x) norm, sqrt(tf))."""
    from lucene_solr_spark.search.similarities import SweetSpotSimilarity
    ix, con = corpus
    degraded = SweetSpotSimilarity(ln_min=1, ln_max=1, steepness=0.5,
                                   tf_base=0.0, tf_min=0.0)
    for q in QUERIES:
        a = _cmp(ix, con, degraded, q)
        b = _cmp(ix, con, ClassicSimilarity(), q)
        assert [(d, round(s, 9)) for d, s in a] == \
            [(d, round(s, 9)) for d, s in b], q


def test_sweetspot_plateau_law():
    """Every length inside [min, max] norms to exactly 1.0; outside it
    decays; tf below tf_min is flat at base."""
    from lucene_solr_spark.search.similarities import SweetSpotSimilarity
    sim = SweetSpotSimilarity(ln_min=4, ln_max=10, steepness=0.5,
                              tf_base=1.5, tf_min=2.0)

    def norm(x):
        return 1.0 / math.sqrt(
            0.5 * (abs(x - 4) + abs(x - 10) - 6) + 1.0)

    for x in (4, 5, 7, 10):
        assert norm(x) == 1.0
    assert norm(3) < 1.0 and norm(11) < 1.0 and norm(40) < norm(11)
