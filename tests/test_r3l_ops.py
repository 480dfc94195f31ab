"""Round-3l ops: {!parent}/{!child} block-join qparsers,
cross-collection join, best-of-n selection."""

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# {!parent} / {!child} local-params parsing
# ---------------------------------------------------------------------------

def test_parent_child_specs():
    from lucene_solr_spark.search.localparams import (ChildBlock,
                                                      LocalParamsError,
                                                      ParentBlock,
                                                      local_query)
    from lucene_solr_spark.search.query import Term
    pb = local_query("{!parent which=conv score=max}dup")
    assert isinstance(pb, ParentBlock) and pb.score_mode == "max"
    assert isinstance(pb.child, Term) or pb.child is not None
    assert local_query("{!parent which=conv}dup").score_mode == "none"
    cb = local_query("{!child of=conv}dup")
    assert isinstance(cb, ChildBlock)
    with pytest.raises(LocalParamsError):
        local_query("{!parent which=title:x}dup")   # derived blocks only
    with pytest.raises(LocalParamsError):
        local_query("{!parent which=conv score=sum}dup")
    with pytest.raises(LocalParamsError):
        local_query("{!child of=type:parent}dup")


def test_parent_block_python_twin(spark):
    """Parent score = max child score within the derived conv block
    (ToParentBlockJoinQuery ScoreMode.Max)."""
    import __spark_entry__ as entry
    from lucene_solr_spark.search.query import Term
    se = entry._searcher(spark, SF)
    child = {r["docid"]: round(r["score"], 6)
             for r in se.scored(Term("dup")).collect()}
    best = {}
    for d, s in child.items():
        c = d // 8
        best[c] = max(best.get(c, 0.0), s)
    want = sorted(((c, round(s, 6)) for c, s in best.items()),
                  key=lambda x: (-x[1], x[0]))[:10]
    got = [(r["conv_id"], r["score"])
           for r in entry._p_parent(spark, SF).collect()]
    assert got == want and got


def test_child_block_returns_whole_blocks(spark):
    """{!child}: every turn of a matching conv appears — block
    membership, not per-turn matching."""
    import __spark_entry__ as entry
    from lucene_solr_spark.search.query import Term
    se = entry._searcher(spark, SF)
    hits = {r["docid"] // 8 for r in se.matching(Term("dup")).collect()}
    rows = entry._p_child(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["conv_id"] == r["doc_id"] // 8
        assert r["conv_id"] in hits
    # the first matching conv contributes all of its existing turns
    first = min(hits)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    expect_turns = {d for d in range(first * 8, first * 8 + 8)
                    if d < n_docs}
    got_turns = {r["doc_id"] for r in rows
                 if r["conv_id"] == first}
    assert got_turns == expect_turns


# ---------------------------------------------------------------------------
# cross-collection join
# ---------------------------------------------------------------------------

def test_xc_join_filters_by_foreign_keys(spark):
    import __spark_entry__ as entry
    from lucene_solr_spark.search.query import Term
    ev = spark.read.parquet(f"{SF}/events.parquet")
    keys = {r["user_id"] for r in
            ev.filter("event_type = 'error' AND value >= 150.0")
            .select("user_id").collect()}
    se = entry._searcher(spark, SF)
    scored = {r["docid"]: round(r["score"], 6)
              for r in se.scored(Term("join")).collect()}
    want = sorted(((d, s) for d, s in scored.items() if d in keys),
                  key=lambda x: (-x[1], x[0]))[:10]
    got = [(r["doc_id"], r["score"])
           for r in entry._q_xc_join(spark, SF).collect()]
    assert got == want and got
    # the join actually excludes something
    assert len(want) < len(scored)


# ---------------------------------------------------------------------------
# best_of_n
# ---------------------------------------------------------------------------

def test_best_of_n_python_twin(spark):
    from lucene_solr_spark.textops.ops import (best_of_n,
                                               fasttext_score,
                                               pref_pairs)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    probs = {r["doc_id"]: r["prob"]
             for r in fasttext_score(docs).collect()}
    convs = {}
    for d, p in probs.items():
        if (d % 8) % 2 == 1:
            convs.setdefault(d // 8, []).append((d, p))

    got = {r["conv_id"]: r for r in best_of_n(docs).collect()}
    assert set(got) == set(convs)   # n=1 convs included
    for c, cand in convs.items():
        best = min(cand, key=lambda t: (-t[1], t[0]))
        r = got[c]
        assert (r["best_id"], r["best_prob"]) == best
        assert r["n_candidates"] == len(cand)

    # consistency with pref_pairs: same winner wherever both emit
    pp = {r["conv_id"]: r["chosen_id"]
          for r in pref_pairs(docs).collect()}
    for c, chosen in pp.items():
        assert got[c]["best_id"] == chosen
