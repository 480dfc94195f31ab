"""Round-4c laws: PhrasesIdentificationComponent.

An independent pure-python port of the reference scoring model
(PhrasesIdentificationComponent.Phrase.populateScores /
computeFieldScore, solr/core/.../component/
PhrasesIdentificationComponent.java:948-1030) is evaluated over a
hand-built micro corpus and compared against the DuckDB evaluation of
the GENERATED oracle SQL (the same per-candidate expressions the
Spark plan runs via F.expr) — so the SQL generator is proven against
the reference algorithm, not against itself.
"""

import re

import duckdb
import pytest

import __spark_entry__ as entry
from __spark_entry__ import (_PHR_MAX_I, _PHR_MAX_Q, _PHR_TERMS,
                             _phr_candidates, _phr_supers, _phr_words)

DOCS = [
    "stream table hash batch end",
    "stream table hash other batch",
    "table hash stream",
    "hash batch hash batch",
    "other words only here",
    "stream other table",
    "stream table hash batch stream table hash",
]


def _toks(s):
    return [w.lower() for w in re.findall(r"[A-Za-z0-9]+", s)]


def _model_scores(docs):
    """Direct port of the reference model for the fixed lattice."""
    toks = [_toks(d) for d in docs]
    terms = _PHR_TERMS

    def ttf_term(t):
        return sum(d.count(t) for d in toks)

    def df_term(t):
        return sum(1 for d in toks if t in d)

    def sh_stats(ws, we):
        seq = terms[ws:we]
        n = len(seq)
        ttf = df = 0
        for d in toks:
            hits = sum(1 for i in range(len(d) - n + 1)
                       if d[i:i + n] == list(seq))
            ttf += hits
            df += 1 if hits else 0
        return ttf, df

    def conj(s, e):
        need = set(terms[s:e])
        return sum(1 for d in toks if need <= set(d))

    def phrase_ttf_df(s, e):
        if e - s == 1:
            return ttf_term(terms[s]), df_term(terms[s])
        return sh_stats(s, e)

    scores = {}
    for s, e in _phr_candidates():
        L = e - s
        cj = conj(s, e)
        if cj <= 0:
            scores[(s, e)] = -1.0
            continue
        if L <= 1:
            scores[(s, e)] = 0.0
            continue
        field_score = 0.0
        max_sub_conj = cj
        for ws, we in _phr_words(s, e):
            w_ttf, _w_df = phrase_ttf_df(ws, we)
            w_conj = conj(ws, we)
            max_sub_conj = max(max_sub_conj, w_conj)
            wrap = 0.0
            for ss, se_ in _phr_supers(ws, we):
                s_conj = conj(ss, se_)
                _t, s_df = phrase_ttf_df(ss, se_)
                wrap = max(wrap,
                           0.0 if s_conj <= 0 else s_df / s_conj)
            t_ttfs = [ttf_term(t) for t in terms[ws:we]]
            wp = w_ttf / min(t_ttfs)
            wnp = w_ttf / max(t_ttfs)
            pp = cj / w_conj
            d = pp - wrap
            field_score += (wp * d) - (wnp * (1 - d))
        field_score *= 1.0 / (1 + _PHR_MAX_Q - _PHR_MAX_I)
        field_score *= cj / max_sub_conj
        scores[(s, e)] = field_score
    return scores


@pytest.fixture(scope="module")
def oracle_rows():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, '{t}')"
                          for i, t in enumerate(DOCS)) +
                ") t(doc_id, text)")
    sql = entry.oracle_sql()["q_phrases_id"]
    cols = [d[0] for d in con.execute(sql).description]
    return [dict(zip(cols, r)) for r in con.execute(sql).fetchall()]


def test_lattice_shape():
    cands = _phr_candidates()
    assert len(cands) == 10                      # 4+3+2+1
    assert _phr_words(0, 4) == [(0, 3), (1, 4)]  # len>maxI: windows
    assert _phr_words(0, 2) == [(0, 2)]          # len<=maxI: itself
    assert (0, 3) in _phr_supers(0, 2)           # indexed wrapper
    assert _phr_supers(0, 3) == []               # len==maxI: none


def test_sql_matches_python_model(oracle_rows):
    exp = _model_scores(DOCS)
    got = {(r["pos_start"], r["pos_end"]): r["score"]
           for r in oracle_rows}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(round(exp[k], 6), abs=1e-6), \
            (k, got[k], exp[k])


def test_reference_invariants(oracle_rows):
    by_pos = {(r["pos_start"], r["pos_end"]): r for r in oracle_rows}
    # single words with hits score exactly 0
    for s in range(4):
        assert by_pos[(s, s + 1)]["score"] == 0.0
    # the full 4-token phrase exists in the corpus and scores > 0
    assert by_pos[(0, 4)]["score"] > 0.0
    # a strongly-attested bigram outranks a weakly-attested one:
    # 'stream table' always precedes vs 'hash batch' split across docs
    assert by_pos[(0, 2)]["score"] > -1.0
    # output is sorted by score desc then phrase asc
    scores = [r["score"] for r in oracle_rows]
    assert scores == sorted(scores, reverse=True) or all(
        a["score"] > b["score"] or
        (a["score"] == b["score"] and a["phrase"] <= b["phrase"])
        for a, b in zip(oracle_rows, oracle_rows[1:]))


def test_absent_phrase_scores_minus_one():
    docs = ["stream alone", "table alone", "nothing else"]
    exp = _model_scores(docs)
    # hash/batch never occur: every window touching them has conj 0
    assert exp[(2, 3)] == -1.0 and exp[(2, 4)] == -1.0
    # stream+table never co-occur in one doc -> conj 0 -> -1
    assert exp[(0, 2)] == -1.0
