"""Lucene SmallFloat int4 norm quantization, re-derived for numpy and SQL.

Semantics (reference: lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:100-169, BM25Similarity LENGTH_TABLE
lucene/core/.../search/similarities/BM25Similarity.java:106-126):

- ``longToInt4(i)``: float-like encoding of a positive long keeping 4
  significant bits; values < 8 are "subnormal" (exact).
- ``intToByte4(i)``: byte encoding built on longToInt4 with an offset of
  NUM_FREE_VALUES = 255 - longToInt4(2**31 - 1) = 24 free low values, so
  every value < 40 round-trips exactly and larger values keep 4
  significant bits of (i - 24), shifted back by +24 on decode.

The field length (number of tokens after analysis, minus
position-increment-0 overlaps) is encoded with ``intToByte4`` into the
per-doc norm byte; BM25 decodes it through a 256-entry table. Any engine
that wants Lucene-rank-identical scores must apply this exact lossy
quantization.

This module provides three equivalent implementations:
 1. scalar python (spec / tests),
 2. vectorized numpy (the scoring kernel's LENGTH_TABLE),
 3. a portable SQL CASE expression (parses in both Spark SQL and DuckDB)
    computing quantize(dl) = byte4ToInt(intToByte4(dl)) directly, so the
    engine's JVM-side plan and the DuckDB oracle share bit-identical
    integer math.
"""

from __future__ import annotations

import numpy as np

# 255 - longToInt4(Integer.MAX_VALUE) == 255 - 231
NUM_FREE_VALUES = 24


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only positive values")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # top (implicit) bit cleared
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Encode field length -> unsigned norm byte [0, 255]."""
    if i < 0:
        raise ValueError("only positive values")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode unsigned norm byte [0, 255] -> quantized field length."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


def quantize_length(i: int) -> int:
    """byte4ToInt(intToByte4(i)) — the lossy round trip BM25 sees."""
    return byte4_to_int(int_to_byte4(i))


# LENGTH_TABLE[b] = byte4ToInt(b) as float32, exactly BM25Similarity's cache.
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float32)
# integer variant for double-precision mode
LENGTH_TABLE_INT = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def int_to_byte4_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over a non-negative int array."""
    a = np.asarray(arr, dtype=np.int64)
    if (a < 0).any():
        raise ValueError("only positive values")
    out = a.copy()
    big = a >= NUM_FREE_VALUES
    j = a[big] - NUM_FREE_VALUES
    # bit_length via log2 is unsafe at boundaries; use frexp-free approach:
    # for int64 < 2**53 we can still not trust float log2 — compute with
    # successive shifts on the (small) number of distinct magnitudes.
    nb = np.zeros_like(j)
    tmp = j.copy()
    while (tmp > 0).any():
        nz = tmp > 0
        nb[nz] += 1
        tmp = tmp >> 1
    shift = np.maximum(nb - 4, 0)
    sub = nb < 4
    enc = ((j >> shift) & 0x07) | ((shift + 1) << 3)
    enc[sub] = j[sub]
    out[big] = NUM_FREE_VALUES + enc
    return out.astype(np.int64)


def quantize_length_np(arr: np.ndarray) -> np.ndarray:
    return LENGTH_TABLE_INT[int_to_byte4_np(arr)]


def qdl_sql(dl_expr: str, max_bits: int = 31) -> str:
    """Portable SQL expression for quantize_length(dl_expr).

    quantize(dl) = dl                          if dl < 40
                 = 24 + j - (j % 2**(k-3))     else, j = dl-24, 2**k <= j < 2**(k+1)

    (j >= 16 whenever dl >= 40, so k >= 4 and the shift k-3 >= 1.)
    Pure integer CASE/modulo arithmetic: parses identically in Spark SQL
    and DuckDB, giving bit-identical results in engine and oracle.
    """
    e = f"({dl_expr})"
    j = f"({e} - 24)"
    branches = []
    for k in range(4, max_bits):
        lo, p = 1 << k, 1 << (k - 3)
        branches.append(f"WHEN {j} < {lo * 2} THEN {j} - ({j} % {p})")
    ladder = " ".join(branches)
    return f"(CASE WHEN {e} < 40 THEN {e} ELSE 24 + (CASE {ladder} END) END)"


def norm_byte_sql(dl_expr: str, max_bits: int = 31) -> str:
    """Portable SQL for intToByte4(dl) as an unsigned int in [0, 255].

    dl < 24             -> dl
    j = dl - 24 < 8     -> 24 + j                       (subnormal)
    2**k <= j < 2**(k+1), k >= 3
                        -> 24 + (k-2)*8 + (j // 2**(k-3)) % 8
    (shift = k-3, encoded = (shift+1)<<3 | ((j >> shift) & 7))
    """
    e = f"({dl_expr})"
    j = f"({e} - 24)"
    branches = [f"WHEN {j} < 8 THEN {j}"]
    for k in range(3, max_bits):
        hi = 1 << (k + 1)
        shift = k - 3
        p = 1 << shift
        branches.append(
            f"WHEN {j} < {hi} THEN {(shift + 1) * 8} + "
            f"CAST(({j} - ({j} % {p})) / {p} AS BIGINT) % 8"
        )
    ladder = " ".join(branches)
    return (
        f"(CASE WHEN {e} < 24 THEN {e} ELSE 24 + (CASE {ladder} END) END)"
    )
