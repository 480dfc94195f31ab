"""Late round-2 operators: DirectSpellChecker-style spellcheck,
per-doc term vectors, multi-passage highlighting, IVF-Flat ANN —
structural checks plus engine-vs-oracle parity on real testdata.
(The full driver-contract parity for these runs in
tools/verify_contract.py; these tests pin the algorithmic laws.)"""

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


# -- spellcheck -------------------------------------------------------------

def test_spell_dist_transposition_is_one(spark):
    """'srot' -> 'sort' is classic-levenshtein 2 but Damerau 1; the
    shared expression must report 1 (DirectSpellChecker uses the
    transposition-aware LuceneLevenshteinDistance)."""
    from __spark_entry__ import _spell_dist_sql
    d = _spell_dist_sql("srot", col="t")
    row = spark.sql(
        f"SELECT CAST({d} AS INT) AS dist FROM VALUES ('sort') AS v(t)"
    ).collect()
    assert row[0].dist == 1
    con = duckdb.connect()
    assert con.execute(
        f"SELECT CAST({d} AS INT) FROM (VALUES ('sort')) v(t)"
    ).fetchone()[0] == 1


def test_spellcheck_ranks_distance_then_df(spark):
    from __spark_entry__ import _q_spellcheck
    rows = _q_spellcheck(spark, SF).collect()
    assert len(rows) >= 2
    assert rows[0].term == "sort" and rows[0].dist == 1
    # ordering law: dist ASC, then df DESC, then term ASC
    keys = [(r.dist, -r.df, r.term) for r in rows]
    assert keys == sorted(keys)


# -- term vectors -----------------------------------------------------------

def test_term_vectors_match_reanalysis(spark, docs):
    """The term vector read from postings equals re-analyzing the
    stored text (TermVectorsReader contract: same analyzer, same
    positions)."""
    from __spark_entry__ import _TV_DOC, _q_term_vectors
    # round-5: the registry row is flattened to scalar
    # (term, tf, pos_idx, pos) rows (driver canon cannot sort array
    # cells); reassemble the per-term position lists here
    tv = {}
    for r in _q_term_vectors(spark, SF).orderBy(
            "term", "pos_idx").collect():
        tf, ps = tv.setdefault(r.term, (r.tf, []))
        ps.append(r.pos)
    tv = {t: (tf, ps) for t, (tf, ps) in tv.items()}
    text = docs.filter(F.col("doc_id") == _TV_DOC).collect()[0].text
    import re
    toks = [t.lower() for t in re.findall(r"[A-Za-z0-9]+", text)]
    expect = {}
    for i, t in enumerate(toks):
        expect.setdefault(t, []).append(i)
    assert tv == {t: (len(ps), ps) for t, ps in expect.items()}


# -- multi-passage highlighting --------------------------------------------

def test_highlight_best_passage_law(spark, docs):
    """Every returned (doc, passage, score): score equals the number of
    query-term occurrences whose position FLOOR(pos/8) == passage, and
    no other passage in that doc beats (score DESC, passage ASC)."""
    from __spark_entry__ import _HLB_TERMS, _HLB_W, _q_highlight_best
    rows = _q_highlight_best(spark, SF).collect()
    assert rows, "fixture terms must occur in the corpus"
    import re
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in rows:
        toks = [t.lower() for t in
                re.findall(r"[A-Za-z0-9]+", texts[r.doc_id])]
        per_passage = {}
        for i, t in enumerate(toks):
            if t in _HLB_TERMS:
                p = i // _HLB_W
                per_passage[p] = per_passage.get(p, 0) + 1
        best = min(per_passage.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r.passage, r.p_score) == (best[0], best[1])


# -- IVF-Flat ANN -----------------------------------------------------------

def test_ivf_assign_is_nearest_centroid(emb):
    """Spot-check: each vector's assigned cell is its argmax-cosine
    centroid (ROUND(,6) DESC, cent_id ASC tie rule)."""
    from lucene_solr_spark.vector.ann import cosine_topk, ivf_assign
    asg = {r.vec_id: r.cent_id
           for r in ivf_assign(emb, stride=37).collect()}
    cents = sorted(asg.values())
    assert set(cents) <= {r.vec_id for r in
                          emb.filter("vec_id % 37 = 0").collect()}
    # verify one non-centroid vector's assignment exhaustively
    import numpy as np
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    cids = sorted({c for c in asg.values()} |
                  {v for v in vecs if v % 37 == 0})
    for probe in [1, 2, 3]:
        v = vecs[probe]
        best = min(
            ((-round(float(v @ vecs[c]) /
                     (np.linalg.norm(v) * np.linalg.norm(vecs[c])), 6), c)
             for c in cids))
        assert asg[probe] == best[1]


def test_ivf_topk_scores_are_exact_cosines(emb):
    """IVF returns a subset of the corpus scored identically to the
    brute-force kernel (approximation affects WHICH vectors, never
    their scores)."""
    from lucene_solr_spark.vector.ann import cosine_topk, ivf_topk
    exact_all = {r.vec_id: r.cos
                 for r in cosine_topk(emb, 0, 10 ** 6).collect()}
    ivf = [(r.vec_id, r.cos) for r in ivf_topk(emb, 0, 10).collect()]
    assert len(ivf) == 10
    for vid, cos in ivf:
        assert abs(exact_all[vid] - cos) < 1e-9
    # scores descend with vec_id tie-break
    keys = [(-cos, vid) for vid, cos in ivf]
    assert keys == sorted(keys)


def test_ivf_probe_widening_monotone_recall(emb):
    """Probing more cells can only improve (or keep) recall of the
    exact top-10 — the IVF contract that makes nprobe a knob."""
    from lucene_solr_spark.vector.ann import cosine_topk, ivf_topk
    exact = {r.vec_id for r in cosine_topk(emb, 0, 10).collect()}
    rec = []
    for nprobe in (1, 2, 14):
        got = {r.vec_id
               for r in ivf_topk(emb, 0, 10, nprobe=nprobe).collect()}
        rec.append(len(got & exact))
    assert rec[0] <= rec[1] <= rec[2]
    assert rec[2] == 10  # probing every cell == brute force


# -- function score + join -------------------------------------------------

def test_function_score_multiplies_bm25(spark, docs):
    """FunctionScoreQuery law: combined score == bm25 * ln(1+n_chars)
    per doc, and ranking follows the combined score."""
    from __spark_entry__ import _FS_TERM, _q_function_score, _searcher
    from lucene_solr_spark.search.query import Term
    import math
    se = _searcher(spark, SF)
    base = {r.docid: r.score
            for r in se.scored(Term(_FS_TERM)).collect()}
    chars = {r.doc_id: r.n_chars for r in docs.collect()}
    rows = _q_function_score(spark, SF).collect()
    assert rows
    for r in rows:
        expect = round(base[r.doc_id] * math.log(1.0 + chars[r.doc_id]), 6)
        assert abs(r.score - expect) < 1e-9
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_join_field_is_semi_join(spark):
    """JoinUtil ScoreMode.None law: result = scored to-docs whose id
    appears in the from-side key set; never multiplies rows."""
    from __spark_entry__ import _JOIN_TERM, _q_join_field, _searcher
    from lucene_solr_spark.search.query import Term
    from pyspark.sql import functions as F
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .filter(F.col("event_type") == "error"))
    keys = {r.user_id for r in ev.collect()}
    rows = _q_join_field(spark, SF).collect()
    assert rows
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert set(ids) <= keys


# -- geo distance -----------------------------------------------------------

def test_geo_distance_haversine_law(spark):
    """Every returned row: dist_km equals an independent numpy
    haversine of the derived coordinates, all under the radius, sorted
    nearest-first."""
    import numpy as np
    from __spark_entry__ import _GEO_KM, _q_geo_distance
    rows = _q_geo_distance(spark, SF).collect()
    assert rows
    for r in rows:
        lat = ((r.doc_id * 7919) % 18000) / 100.0 - 90.0
        lon = ((r.doc_id * 104729) % 36000) / 100.0 - 180.0
        la, lo = np.radians(lat), np.radians(lon)
        d = 6371.0088 * 2 * np.arcsin(np.sqrt(
            np.sin(la / 2) ** 2 + np.cos(0.0) * np.cos(la)
            * np.sin(lo / 2) ** 2))
        assert abs(r.dist_km - round(float(d), 6)) < 1e-6
        assert r.dist_km < _GEO_KM
    keys = [(r.dist_km, r.doc_id) for r in rows]
    assert keys == sorted(keys)


# -- TermsComponent ---------------------------------------------------------

def test_terms_enum_bounds_and_order(spark):
    """TermsComponent law (TermsComponent.java, sort=count): every
    term in [lower, upper) with df >= mincount, ordered df DESC then
    term ASC, df equal to the true distinct-doc count."""
    from __spark_entry__ import _q_terms_enum, _searcher
    se = _searcher(spark, SF)
    truth = {r.term: r.df for r in se.ix.term_stats.collect()}
    rows = _q_terms_enum(spark, SF).collect()
    assert rows
    for r in rows:
        assert "m" <= r.term < "q" and r.df >= 5
        assert r.df == truth[r.term]
    keys = [(-r.df, r.term) for r in rows]
    assert keys == sorted(keys)
    # nothing eligible was dropped (limit not hit at this sf)
    eligible = {t for t, df in truth.items()
                if "m" <= t < "q" and df >= 5}
    if len(eligible) <= 15:
        assert {r.term for r in rows} == eligible


# -- interval facets --------------------------------------------------------

def test_facet_interval_overlap_law(spark, docs):
    """IntervalFacets law: a doc is counted in EVERY interval that
    contains it (intervals overlap), zero-count intervals kept."""
    from __spark_entry__ import (
        _FACET_TERM, _INTERVAL_SPECS, _q_facet_interval, _searcher,
    )
    se = _searcher(spark, SF)
    match = {r.docid for r in
             se.matching(__import__(
                 'lucene_solr_spark.search.query',
                 fromlist=['Term']).Term(_FACET_TERM)).collect()}
    chars = {r.docid: r.n_chars for r in se.ix.source
             .select("docid", "n_chars").collect()}
    rows = {r.interval: r.n for r in _q_facet_interval(spark, SF).collect()}
    assert set(rows) == {lbl for lbl, _ in _INTERVAL_SPECS}
    def inside(lbl, v):
        return {"[0,150]": 0 <= v <= 150,
                "(100,300]": 100 < v <= 300,
                "(200,*)": v > 200}[lbl]
    for lbl, _ in _INTERVAL_SPECS:
        assert rows[lbl] == sum(
            1 for d in match if inside(lbl, chars[d]))
    # overlap sanity: totals exceed the matching-doc count iff overlap
    assert sum(rows.values()) >= len(match)


# -- SpanPayloadCheckQuery ----------------------------------------------------

def test_payload_check_laws(spark):
    """PayloadCheck laws vs the plain TermQuery it wraps
    (SpanPayloadCheckQuery.java:56): (1) its match set is a subset of
    the term's; (2) accepted counts over all 7 payload values partition
    tf exactly; (3) a doc whose every occurrence carries the required
    payload scores identically to the unfiltered term."""
    from lucene_solr_spark.search.query import PayloadCheck, Term
    from __spark_entry__ import _searcher
    se = _searcher(spark, SF)
    term = "merge"
    base = {r.docid: r.score for r in se.scored(Term(term)).collect()}
    per_payload = {}
    for v in range(1, 8):
        per_payload[v] = {r.docid: r.score for r in
                          se.scored(PayloadCheck(term, v)).collect()}
        assert set(per_payload[v]) <= set(base)
    # partition law on raw counts
    post = {r.docid: list(r.positions) for r in
            se.ix.postings.filter(F.col("term") == term)
            .select("docid", "positions").collect()}
    for d, ps in post.items():
        accepted = {v: sum(1 for p in ps if 1 + p % 7 == v)
                    for v in range(1, 8)}
        assert sum(accepted.values()) == len(ps)
        for v in range(1, 8):
            assert (d in per_payload[v]) == (accepted[v] > 0)
        # single-payload docs score exactly like the raw term
        vals = {1 + p % 7 for p in ps}
        if len(vals) == 1:
            (v,) = vals
            assert per_payload[v][d] == pytest.approx(base[d], abs=1e-12)


# -- multi-select faceting ----------------------------------------------------

def test_facet_multiselect_exclusion_law(spark):
    """Tagged-filter exclusion law (SimpleFacets excludeSet): the lang
    facet is computed WITHOUT the lang filter (so every lang with a
    matching doc in the selected sources appears), while the source
    facet still applies the lang filter; the source-facet total equals
    the fully-filtered lang bucket count restricted to those sources
    computed independently."""
    from lucene_solr_spark.search.query import Term
    from __spark_entry__ import (
        _FACET_TERM, _MS_LANG, _MS_SOURCES, _q_facet_multiselect,
        _searcher,
    )
    se = _searcher(spark, SF)
    m = (se.matching(Term(_FACET_TERM))
         .join(se.ix.source.select("docid", "lang", "source"), "docid")
         .collect())
    rows = _q_facet_multiselect(spark, SF).collect()
    lang_counts = {r.value: r.n for r in rows if r.dim == "lang"}
    src_counts = {r.value: r.n for r in rows if r.dim == "source"}
    exp_lang = {}
    exp_src = {}
    for r in m:
        if r.source in _MS_SOURCES:
            exp_lang[r.lang] = exp_lang.get(r.lang, 0) + 1
        if r.lang == _MS_LANG:
            exp_src[r.source] = exp_src.get(r.source, 0) + 1
    assert lang_counts == exp_lang
    assert src_counts == exp_src
    # multi-select point: the selected lang's siblings keep counts
    assert set(lang_counts) == {r.lang for r in m
                                if r.source in _MS_SOURCES}


# -- JoinUtil ScoreMode.Total / Avg -------------------------------------------

def test_join_totavg_aggregation_law(spark):
    """TermsWithScoreCollector law: per join key, total == sum of
    from-side scores and avg == total / occurrence count; every to-side
    hit carries its key's aggregates."""
    from lucene_solr_spark.search.query import Term
    from __spark_entry__ import _q_join_totavg, _searcher
    se = _searcher(spark, SF)
    fr = (se.scored(Term("dup"))
          .join(se.ix.source.select("docid", "lang"), "docid").collect())
    agg = {}
    for r in fr:
        s, n = agg.get(r.lang, (0.0, 0))
        agg[r.lang] = (s + r.score, n + 1)
    lang_of = {r.docid: r.lang for r in
               se.ix.source.select("docid", "lang").collect()}
    for row in _q_join_totavg(spark, SF).collect():
        lg = lang_of[row.doc_id]
        s, n = agg[lg]
        assert row.score_total == pytest.approx(round(s, 6), abs=2e-6)
        assert row.score_avg == pytest.approx(round(s / n, 6), abs=2e-6)
