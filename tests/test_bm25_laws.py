"""BaseSimilarityTestCase-style law tests for the float32 BM25 kernel.

The reference's harness (lucene/test-framework/src/java/org/apache/
lucene/search/similarities/BaseSimilarityTestCase.java:280-363) sweeps
random corpus stats x (freq, norm) and asserts: score finite, >= 0,
monotone in freq, anti-monotone in norm-decoded length and in docFreq.
Same laws here via hypothesis over the same ranges (FIXTURES.md §4).
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.search.bm25 import (
    avgdl32, idf32, norm_inverse_cache, score32,
)

stats = st.tuples(
    st.integers(min_value=1, max_value=2**31 - 1),   # docCount
    st.integers(min_value=1, max_value=2**20),       # freq
    st.integers(min_value=0, max_value=255),         # norm byte
)


@settings(max_examples=300, deadline=None)
@given(stats, st.data())
def test_score_finite_nonneg_monotone(s, data):
    doc_count, freq, nb = s
    df = data.draw(st.integers(min_value=1, max_value=doc_count))
    sum_ttf = data.draw(st.integers(min_value=doc_count,
                                    max_value=doc_count * 1000))
    cache = norm_inverse_cache(avgdl32(sum_ttf, doc_count))
    w = idf32(df, doc_count)
    sc = float(score32([freq], [nb], w, cache)[0])
    assert math.isfinite(sc)
    assert sc >= 0.0
    # monotone in freq
    sc2 = float(score32([freq + 1], [nb], w, cache)[0])
    assert sc2 >= sc
    # anti-monotone in df (idf decreases)
    if df < doc_count:
        w2 = idf32(df + 1, doc_count)
        assert float(score32([freq], [nb], w2, cache)[0]) <= sc


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2, max_value=10**9),
       st.integers(min_value=1, max_value=2**16))
def test_anti_monotone_in_length(doc_count, freq):
    cache = norm_inverse_cache(avgdl32(doc_count * 20, doc_count))
    w = idf32(1, doc_count)
    scores = score32([freq] * 256, list(range(256)), w, cache)
    # LENGTH_TABLE is non-decreasing in the byte value, so scores must be
    # non-increasing
    assert (np.diff(scores) <= 1e-9).all()


def test_idf_avgdl_reference_values():
    # idf(df=1, N=1) = ln(1 + 0.5/1.5) = ln(4/3)
    assert abs(float(idf32(1, 1)) - math.log(4 / 3)) < 1e-6
    assert float(avgdl32(100, 10)) == np.float32(10.0)


def test_score_formula_bits():
    """Pin exact float32 bits for a hand-computed case (k1=1.2, b=0.75)."""
    doc_count, df, sum_ttf = 64, 8, 640   # avgdl = 10
    freq, dl = 3, 10                      # norm byte for dl=10 is 10
    cache = norm_inverse_cache(avgdl32(sum_ttf, doc_count))
    w = idf32(df, doc_count)
    got = float(score32([freq], [10], w, cache)[0])
    # replicate with explicit float32 steps
    idf = np.float32(math.log(1 + (64 - 8 + 0.5) / (8 + 0.5)))
    inv = np.float32(1.0) / (np.float32(1.2) * (
        (np.float32(1) - np.float32(0.75))
        + np.float32(0.75) * np.float32(10.0) / np.float32(10.0)))
    want = float(idf - idf / (np.float32(1) + np.float32(freq) * inv))
    assert np.float32(got) == np.float32(want)
