"""Rank-identity gate: engine float32 top-k vs an independent
brute-force numpy oracle implementing the published Lucene BM25 math.

This is the in-repo stand-in for Lucene's CheckHits/IndexSearcher
assertions (CheckHits.java:578-587): the oracle scores EVERY matching
doc exhaustively with the exact float32 formula and quantized norms;
the engine must return identical top-k docIDs and identical float32
score bits under the (score DESC, docid ASC) tie-break.
"""

import math
import re

import numpy as np
import pytest

from lucene_solr_spark.search.engine import Searcher
from lucene_solr_spark.search.query import Bool, Phrase, Term

K1, B = 1.2, 0.75


# --------------------------------------------------------------------------
# independent oracle (pure numpy/python; no engine imports beyond data)
# --------------------------------------------------------------------------

def _tokenize(text):
    return [t.lower() for t in re.findall(r"[A-Za-z0-9]+", text or "")]


def _norm_byte(dl):
    if dl < 24:
        return dl
    j = dl - 24
    if j < 8:
        return 24 + j
    shift = j.bit_length() - 4
    enc = ((j >> shift) & 0x07) | ((shift + 1) << 3)
    return 24 + enc


def _decode(b):
    if b < 24:
        return b
    j = b - 24
    bits, shift = j & 0x07, (j >> 3) - 1
    return 24 + (bits if shift == -1 else (bits | 0x08) << shift)


class Oracle:
    def __init__(self, rows):  # rows: [(docid, text)]
        self.docs = {}
        self.post = {}
        for docid, text in rows:
            toks = _tokenize(text)
            self.docs[docid] = _norm_byte(len(toks))
            for p, t in enumerate(toks):
                self.post.setdefault(t, {}).setdefault(docid, []).append(p)
        self.n = len(self.docs)
        self.sum_ttf = sum(
            len(ps) for d in self.post.values() for ps in d.values())
        self.avgdl = np.float32(self.sum_ttf / float(self.n))
        table = np.array([_decode(b) for b in range(256)], dtype=np.float32)
        self.cache = (np.float32(1.0) / (np.float32(K1) * (
            (np.float32(1) - np.float32(B))
            + np.float32(B) * table / self.avgdl))).astype(np.float32)

    def idf(self, term):
        df = len(self.post.get(term, {}))
        if df == 0:
            return None
        return np.float32(
            math.log(1 + (self.n - df + 0.5) / (df + 0.5)))

    def _term_scores(self, term):
        w = self.idf(term)
        if w is None:
            return {}
        out = {}
        for docid, ps in self.post[term].items():
            nb = self.docs[docid]
            f = np.float32(len(ps))
            out[docid] = np.float32(
                w - w / (np.float32(1) + f * self.cache[nb]))
        return out

    def topk(self, query, k=10):
        """query: ('term', t) | ('and', [t..]) | ('or', [t..]) |
        ('phrase', [t..])"""
        kind, arg = query
        if kind == "term":
            scores = self._term_scores(arg)
        elif kind in ("and", "or"):
            per = [self._term_scores(t) for t in arg]
            scores = {}
            ids = (set.intersection(*(set(p) for p in per))
                   if kind == "and" else set().union(*per))
            for d in ids:
                s = 0.0  # double accumulation, then narrow
                for p in per:
                    if d in p:
                        s += float(p[d])
                scores[d] = np.float32(s)
        elif kind == "phrase":
            w = 0.0
            for t in arg:
                i = self.idf(t)
                if i is None:
                    return []
                w += float(i)
            w = np.float32(w)
            scores = {}
            first = self.post[arg[0]]
            for d, ps in first.items():
                if any(d not in self.post[t] for t in arg[1:]):
                    continue
                freq = sum(
                    1 for p in ps
                    if all(p + i in self.post[arg[i]][d]
                           for i in range(1, len(arg))))
                if freq:
                    nb = self.docs[d]
                    scores[d] = np.float32(
                        w - w / (np.float32(1)
                                 + np.float32(freq) * self.cache[nb]))
        else:
            raise ValueError(kind)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, np.float32(s)) for d, s in ranked[:k]]


# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus(xs_transcripts):
    rows = [(r["docid"], r["text"])
            for r in xs_transcripts.select("docid", "text").collect()]
    return rows


@pytest.fixture(scope="module")
def oracle(corpus):
    return Oracle(corpus)


@pytest.fixture(scope="module")
def searcher(xs_index):
    return Searcher(xs_index)


def _engine_topk32(searcher, ast, k):
    return [(r["doc_id"], np.float32(r["score"]))
            for r in searcher.topk32(ast, k).collect()]


def _pick_terms(oracle):
    by_df = sorted(oracle.post.items(), key=lambda kv: -len(kv[1]))
    common = by_df[0][0]
    mid = by_df[len(by_df) // 3][0]
    rare = by_df[-1][0]
    return common, mid, rare


@pytest.mark.parametrize("k", [1, 10])
def test_term_queries_rank_identical(searcher, oracle, k):
    for t in _pick_terms(oracle):
        want = oracle.topk(("term", t), k)
        got = _engine_topk32(searcher, Term(t), k)
        assert got == want, t


@pytest.mark.parametrize("k", [1, 10])
def test_bool_and_or_rank_identical(searcher, oracle, k):
    common, mid, rare = _pick_terms(oracle)
    want = oracle.topk(("and", [common, mid]), k)
    got = _engine_topk32(
        searcher, Bool(must=(Term(common), Term(mid))), k)
    assert got == want
    want = oracle.topk(("or", [mid, rare, common]), k)
    got = _engine_topk32(
        searcher, Bool(should=(Term(mid), Term(rare), Term(common))), k)
    assert got == want


def test_phrase_rank_identical(searcher, oracle, corpus):
    # find a bigram that actually occurs
    for _, text in corpus:
        toks = _tokenize(text)
        if len(toks) >= 2:
            big = (toks[0], toks[1])
            break
    want = oracle.topk(("phrase", list(big)), 10)
    got = _engine_topk32(searcher, Phrase(big), 10)
    assert got == want


def test_hot_term_skew_present(oracle):
    """The datagen's hot terms must create real skew (df > 20% of docs)."""
    dfs = sorted((len(d) for d in oracle.post.values()), reverse=True)
    assert dfs[0] > 0.2 * oracle.n
