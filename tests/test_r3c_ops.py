"""Round-3c ops: TermAutomatonQuery path compiler, Gopher quality
signals, fastText-style hashed linear classifier inference."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# TermAutomaton
# ---------------------------------------------------------------------------

def test_term_automaton_different_length_paths():
    from lucene_solr_spark.search.query import Bool, Phrase, Term
    from lucene_solr_spark.search.term_automaton import TermAutomaton
    ta = TermAutomaton()
    s0, s1, s2 = (ta.create_state() for _ in range(3))
    ta.set_accept(s2)
    ta.add_transition(s0, s1, "wi")
    ta.add_transition(s1, s2, "fi")
    ta.add_transition(s0, s2, "WIFI")   # single-hop synonym path
    q = ta.finish()
    assert isinstance(q, Bool)
    assert set(q.should) == {Phrase(("wi", "fi")), Term("wifi")}


def test_term_automaton_single_path_unwraps():
    from lucene_solr_spark.search.query import Phrase
    from lucene_solr_spark.search.term_automaton import (
        token_stream_to_query,
    )
    assert token_stream_to_query([["a", "b"]]) == Phrase(("a", "b"))


def test_term_automaton_cycle_raises():
    from lucene_solr_spark.search.term_automaton import (
        TermAutomaton, TermAutomatonError,
    )
    ta = TermAutomaton()
    s0, s1 = ta.create_state(), ta.create_state()
    ta.set_accept(s1)
    ta.add_transition(s0, s1, "a")
    ta.add_transition(s1, s0, "b")   # back edge
    ta.add_transition(s1, s1, "c")   # self loop
    with pytest.raises(TermAutomatonError):
        ta.finish()


def test_term_automaton_no_accept_raises():
    from lucene_solr_spark.search.term_automaton import (
        TermAutomaton, TermAutomatonError,
    )
    ta = TermAutomaton()
    ta.create_state()
    with pytest.raises(TermAutomatonError):
        ta.finish()


def test_term_automaton_equals_hand_disjunction(spark):
    """The registered automaton must score exactly like the manual
    disjunction of its paths (the acyclic-automaton equivalence)."""
    import __spark_entry__ as e
    from lucene_solr_spark.search.query import Bool, Phrase
    se = e._searcher(spark, SF)
    hand = Bool(should=(Phrase(("agg", "join")),
                        Phrase(("table", "hash", "join"))))
    a = [(r.doc_id, r.score)
         for r in se.topk(e.token_stream_to_query(e._TA_PATHS),
                          10).collect()]
    b = [(r.doc_id, r.score) for r in se.topk(hand, 10).collect()]
    assert a == b and a


# ---------------------------------------------------------------------------
# Gopher signals
# ---------------------------------------------------------------------------

def test_gopher_signals_hand_case(spark):
    from lucene_solr_spark.textops.ops import gopher_signals
    df = spark.createDataFrame(
        [(0, "the small table and the big scan"),   # 7 words
         (1, "### --- !!!")],                        # no alpha words
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            gopher_signals(df, min_words=5, max_words=10).collect()}
    r0 = rows[0]
    assert r0.n_words == 7
    assert r0.mean_word_len == round((3 + 5 + 5 + 3 + 3 + 3 + 4) / 7, 6)
    assert r0.alpha_word_frac == 1.0
    assert r0.n_stop == 3  # the, and, the
    assert r0.gopher_ok is True
    r1 = rows[1]
    assert r1.n_words == 0 and r1.alpha_word_frac == 0.0
    assert r1.gopher_ok is False


def test_gopher_mean_word_len_gate(spark):
    from lucene_solr_spark.textops.ops import gopher_signals
    df = spark.createDataFrame(
        [(0, "the a of and aa bb")],  # mean len (3+1+2+3+2+2)/6 < 3
        "doc_id long, text string")
    r = gopher_signals(df, min_words=1, max_words=99).collect()[0]
    assert r.mean_word_len < 3.0 and r.gopher_ok is False


# ---------------------------------------------------------------------------
# fastText-style classifier
# ---------------------------------------------------------------------------

def test_fasttext_matches_python_model(spark):
    """Engine inference == python model of the same hash/weight/mean
    pipeline."""
    import hashlib
    from lucene_solr_spark.textops.ops import (
        _FT_BUCKETS, _FT_SEED, fasttext_score,
    )
    texts = ["table hash join", "dup dup dup", "", "the quick value"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: r for r in fasttext_score(df).collect()}
    for i, tx in enumerate(texts):
        toks = [t.lower() for t in
                __import__("re").findall("[A-Za-z0-9]+", tx)]
        wsum = 0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:6], 16) \
                % _FT_BUCKETS
            wsum += (b * _FT_SEED) % 2001 - 1000
        dl = max(len(toks), 1)
        logit = round(wsum / (1000.0 * dl), 6)
        prob = round(1.0 / (1.0 + math.exp(-logit)), 6)
        assert got[i].n_tokens == len(toks)
        assert got[i].logit == logit
        assert got[i].prob == prob
        assert got[i].label == (prob >= 0.5)


def test_fasttext_weights_are_bounded(spark):
    from lucene_solr_spark.textops.ops import fasttext_score
    import __spark_entry__ as e
    d = e._documents(spark, SF)
    rows = fasttext_score(d).collect()
    assert len(rows) == d.count()
    for r in rows:
        assert -1.0 <= r.logit <= 1.0      # weights in [-1000,1000]/1000
        assert 0.0 <= r.prob <= 1.0
