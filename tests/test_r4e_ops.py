"""Round-4e laws: FuzzyLikeThisQuery.

Independent python port of the reference flow (FuzzyLikeThisQuery.
java:188-243 addTerms + :277-320 rewrite + the ClassicSimilarity
scoring of df=1 TermQueries) evaluated over a micro corpus and
compared against the DuckDB run of the GENERATED oracle SQL — the
same expressions the Spark plan executes."""

import math
import re

import duckdb
import pytest

import __spark_entry__ as entry
from __spark_entry__ import (_FLT_MAX_NUM_TERMS, _FLT_TERMS,
                             _flt_variants)

DOCS = [
    "table stream merge",          # clean doc
    "tabel stream stream",         # the misspelling itself indexed
    "cable label stream table",    # lev-1 neighbours of 'table'
    "merge window vector",         # no fuzzy hits
    "stream table table stream",
]


def _toks(s):
    return [w.lower() for w in re.findall(r"[A-Za-z0-9]+", s)]


def _lev(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _model(docs):
    toks = [_toks(d) for d in docs]
    n_docs = len(docs)
    vocab = sorted({t for d in toks for t in d})
    df = {t: sum(1 for d in toks if t in d) for t in vocab}

    def idf(d):
        return math.log((n_docs + 1.0) / (d + 1.0)) + 1.0

    selected = []          # (term, vscore)
    for s in _FLT_TERMS:
        cands = []
        for c in vocab:
            if c == s:
                cands.append((c, 0))
            elif _lev(c, s) == 1 or c in _flt_variants(s):
                cands.append((c, 1))
        if not cands:
            continue       # numVariants == 0: source dropped
        scored = []
        for c, ed in cands:
            boost = 1.0 if ed == 0 else \
                1.0 - ed / min(len(c), len(s))
            scored.append((c, boost))
        scored.sort(key=lambda x: (-x[1], x[0]))
        scored = scored[:50]
        src_df = df.get(s, 0)
        avg_df = sum(df[c] for c, _ in scored) // len(scored)
        df_eff = src_df if src_df > 0 else avg_df
        for c, boost in scored:
            selected.append((c, boost * boost * idf(df_eff)))
    selected.sort(key=lambda x: (-x[1], x[0]))
    selected = selected[:_FLT_MAX_NUM_TERMS]

    idf1 = math.log((n_docs + 1.0) / 2.0) + 1.0
    scores = {}
    for i, d in enumerate(toks):
        total = 0.0
        for term, vscore in selected:
            tf = d.count(term)
            if tf:
                total += (vscore * idf1) * math.sqrt(tf) \
                    / math.sqrt(len(d))   # dl < 40: SmallFloat exact
        if total:
            scores[i] = round(total, 6)
    return selected, scores


@pytest.fixture(scope="module")
def oracle_rows():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, '{t}')"
                          for i, t in enumerate(DOCS)) +
                ") t(doc_id, text)")
    sql = entry.oracle_sql()["q_fuzzy_like_this"]
    return con.execute(sql).fetchall()


def test_sql_matches_python_model(oracle_rows):
    _sel, exp = _model(DOCS)
    got = {int(d): s for d, s in oracle_rows}
    assert got == {k: pytest.approx(v, abs=1e-6)
                   for k, v in exp.items()}


def test_model_laws():
    sel, scores = _model(DOCS)
    terms = [t for t, _ in sel]
    # the exact term 'stream' (boost 1) is selected
    assert "stream" in terms
    # 'table' enters as a transposition variant of 'tabel'
    assert "table" in terms
    # 'xqz' has no variants: nothing selected from it
    assert not any(_lev(t, "xqz") <= 1 for t in terms)
    # df rule: 'tabel' IS indexed (doc 1) so its variants all use
    # df('tabel'); its rare df gives a high idf, so the 'tabel'
    # exact variant outscores same-boost variants of 'stream'
    tabel_score = dict(sel).get("tabel")
    stream_score = dict(sel).get("stream")
    assert tabel_score is not None and tabel_score > stream_score
    # doc 3 has no matching term at distance <= 1
    assert 3 not in scores
