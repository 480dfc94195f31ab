"""Round-2m: product quantization (encode + ADC search) — laws vs
numpy recomputation (driver parity in tools/verify_contract.py)."""

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
STRIDE, M = 37, 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def vecs(emb):
    return {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}


def _subs(v, m=M):
    d = len(v) // m
    return [v[i * d:(i + 1) * d] for i in range(m)]


def test_pq_encode_argmin(spark, emb, vecs):
    """Every code is the argmin-L2 centroid of its subspace (rounded
    distance, ties to lowest centroid id), M rows per vector."""
    from lucene_solr_spark.vector.ann import pq_encode
    rows = pq_encode(emb, stride=STRIDE, m=M).collect()
    cents = sorted(i for i in vecs if i % STRIDE == 0)
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.m] = (r.code, r.d)
    assert set(by_vec) == set(vecs)
    for v_id, per_m in by_vec.items():
        assert sorted(per_m) == list(range(M))
        vs = _subs(vecs[v_id])
        for m, (code, d) in per_m.items():
            best = min((round(float(np.sum((vs[m] - _subs(vecs[c])[m])
                                           ** 2)), 6), c)
                       for c in cents)
            assert (best[1], best[0]) == (code, d), (v_id, m)


def test_pq_adc_law(spark, emb, vecs):
    """adist(v) == sum over m of round(L2^2(q_m, centroid(code_m)), 6)
    and the result is ascending with vec_id tie-break."""
    from lucene_solr_spark.vector.ann import pq_encode, pq_topk
    from __spark_entry__ import _PQ_Q
    codes = {(r.vec_id, r.m): r.code
             for r in pq_encode(emb, stride=STRIDE, m=M).collect()}
    got = [(r.vec_id, r.adist)
           for r in pq_topk(emb, _PQ_Q, k=10, stride=STRIDE,
                            m=M).collect()]
    assert len(got) == 10
    qs = _subs(vecs[_PQ_Q])
    exp = {}
    for v_id in vecs:
        if v_id == _PQ_Q:
            continue
        s = sum(round(float(np.sum(
            (qs[m] - _subs(vecs[codes[(v_id, m)]])[m]) ** 2)), 6)
            for m in range(M))
        exp[v_id] = round(s, 6)
    want = sorted(exp.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    assert got == want


def test_pq_beats_random_on_neighbor_order(spark, emb, vecs):
    """Sanity: ADC distance correlates with exact L2 — the PQ top-10
    mean EXACT distance is below the corpus mean exact distance."""
    from lucene_solr_spark.vector.ann import pq_topk
    from __spark_entry__ import _PQ_Q
    got = [r.vec_id for r in pq_topk(emb, _PQ_Q, k=10, stride=STRIDE,
                                     m=M).collect()]
    q = vecs[_PQ_Q]
    exact = {v: float(np.sum((q - vecs[v]) ** 2))
             for v in vecs if v != _PQ_Q}
    mean_all = sum(exact.values()) / len(exact)
    mean_top = sum(exact[v] for v in got) / len(got)
    assert mean_top < mean_all
