"""SmallFloat int4/byte4 quantization — spec tests.

Mirrors the semantics of lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:100-169 (longToInt4/int4ToLong/intToByte4/byte4ToInt)
with an independent re-derivation used as the check.
"""

import numpy as np
import pytest

from lucene_solr_spark.codecs import smallfloat as sf


def spec_quantize(i: int) -> int:
    """Independent spec: values < 40 exact; else 24 + (i-24) truncated to
    4 significant bits."""
    if i < 40:
        return i
    j = i - 24
    shift = j.bit_length() - 4
    return 24 + ((j >> shift) << shift)


def test_exact_below_40():
    for i in range(40):
        assert sf.quantize_length(i) == i


def test_spec_equivalence_wide():
    for i in list(range(0, 4096)) + [2**k + d for k in range(12, 31)
                                     for d in (-1, 0, 1)]:
        assert sf.quantize_length(i) == spec_quantize(i), i


def test_monotone_and_idempotent():
    prev = -1
    for i in range(0, 10000):
        q = sf.quantize_length(i)
        assert q <= i
        assert q >= prev          # monotone non-decreasing
        assert sf.quantize_length(q) == q   # idempotent
        prev = q


def test_byte_range_and_roundtrip():
    for i in range(0, 100000, 37):
        b = sf.int_to_byte4(i)
        assert 0 <= b <= 255
        assert sf.byte4_to_int(b) == sf.quantize_length(i)


def test_length_table_matches():
    # LENGTH_TABLE is float32 (like BM25Similarity's cache), so large
    # decoded lengths round to the nearest float32
    for b in range(256):
        assert sf.LENGTH_TABLE[b] == np.float32(sf.byte4_to_int(b))


def test_numpy_vectorized_matches_scalar():
    arr = np.concatenate([np.arange(0, 5000),
                          2 ** np.arange(4, 31, dtype=np.int64)])
    got = sf.quantize_length_np(arr)
    want = np.array([sf.quantize_length(int(x)) for x in arr])
    assert (got == want).all()


@pytest.mark.parametrize("fn,pyfn", [
    (sf.qdl_sql, sf.quantize_length),
    (sf.norm_byte_sql, sf.int_to_byte4),
])
def test_sql_ladders_match_python(fn, pyfn):
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, {fn('i')} FROM range(0, 3000) t(i)").fetchall()
    for i, v in rows:
        assert v == pyfn(i), (i, v)
    big = [2**k + d for k in range(12, 31) for d in (-1, 0, 1)]
    vals = ", ".join(f"({x})" for x in big)
    rows = con.execute(
        f"SELECT i, {fn('i')} FROM (VALUES {vals}) t(i)").fetchall()
    for i, v in rows:
        assert v == pyfn(i), (i, v)
