"""HyperLogLog cardinality as portable shared SQL.

Solr's StatsComponent ``cardinality`` option and the JSON facet ``hll``
aggregate estimate distinct counts with HyperLogLog (solr/core/src/java/
org/apache/solr/handler/component/StatsValuesFactory.java — the HLL
branch of StatsValues; backed by the java-hll library). The estimator
here is classic HLL (Flajolet, Fusy, Gandouet, Meunier 2007) with the
small-range linear-counting correction, built so the IDENTICAL SQL text
runs in Spark whole-stage codegen and in the DuckDB oracle:

- hash: md5 of the value's string form (a shared builtin; Solr hashes
  with murmur — same estimator, different hash family, documented
  divergence),
- register index: first ``b`` hex nibbles,
- rho: 1 + count of leading zero BITS in the next 13 nibbles (52 bits),
  computed by a generated nested-CASE over hex nibbles — no UDF.

At 100 TB this is the right shape: per-row scalar work in codegen, one
(register, max rho) partial aggregation — 2^b rows total out of the
map side — then a single-row final estimate. Nothing is ever collected.
"""

from __future__ import annotations

HLL_B = 8                 # 2^8 = 256 registers; rel. error 1.04/16 = 6.5%
HLL_M = 1 << HLL_B
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_RHO_NIBBLES = 13         # 52 bits of rho material -> max rho 53

_HEX = "0123456789abcdef"


def _nibble(hexpr: str, pos: int) -> str:
    """0-based value of hex nibble ``pos`` (1-based in substr)."""
    return f"(instr('{_HEX}', substr({hexpr}, {pos}, 1)) - 1)"


def hll_reg_sql(col: str) -> str:
    """Register index 0..2^b-1 from the first b bits (b/4 nibbles)."""
    h = f"md5(CAST({col} AS STRING))"
    parts = []
    for i in range(HLL_B // 4):
        parts.append(f"{_nibble(h, i + 1)} * {16 ** (HLL_B // 4 - 1 - i)}")
    return "(" + " + ".join(parts) + ")"


def _nibble_lz(v: str) -> str:
    """Leading zero bits of a nibble value known to be nonzero."""
    return (f"(CASE WHEN {v} >= 8 THEN 0 WHEN {v} >= 4 THEN 1 "
            f"WHEN {v} >= 2 THEN 2 ELSE 3 END)")


def hll_rho_sql(col: str) -> str:
    """rho = 1 + leading zero bits of the 52-bit suffix (capped 53)."""
    h = f"md5(CAST({col} AS STRING))"
    start = HLL_B // 4 + 1
    expr = "52"  # all-zero suffix
    for pos in range(start + _RHO_NIBBLES - 1, start - 1, -1):
        off = pos - start  # nibbles before this one
        v = _nibble(h, pos)
        expr = (f"(CASE WHEN {v} = 0 THEN {expr} "
                f"ELSE {4 * off} + {_nibble_lz(v)} END)")
    return f"(1 + {expr})"


def hll_estimate_sql(reg_table: str) -> str:
    """Final estimate over ``reg_table(reg, mrho)`` (present registers
    with their max rho): raw harmonic-mean estimate with the
    linear-counting small-range correction (Flajolet et al. 2007 Fig. 3
    — the same correction HLL implementations including java-hll
    apply)."""
    m = HLL_M
    raw = (f"({HLL_ALPHA!r}e0 * {m} * {m} / "
           f"(({m} - COUNT(*)) * 1.0e0 + SUM(power(2.0e0, -mrho))))")
    zeros = f"({m} - COUNT(*))"
    est = (f"(CASE WHEN {raw} <= 2.5e0 * {m} AND {zeros} > 0 "
           f"THEN {m} * ln(CAST({m} AS DOUBLE) / {zeros}) "
           f"ELSE {raw} END)")
    return (f"SELECT CAST(ROUND({est}, 0) AS BIGINT) AS hll_card "
            f"FROM {reg_table}")


BLOOM_BITS = 4096         # FuzzySet bloomSize mask 2^12 - 1


def bloom_pos_sql(col: str, bits: int = BLOOM_BITS) -> str:
    """Bloom bit position for a value — the k=1 scheme of Lucene's
    BloomFilteringPostingsFormat (lucene/codecs/src/java/org/apache/
    lucene/codecs/bloom/FuzzySet.java:234-240: ONE hash masked by
    bloomSize = 2^n - 1). Hash family: leading md5 nibbles instead of
    FuzzySet's MurmurHash2 (same estimator semantics, documented
    divergence); identical SQL text runs in both engines."""
    n_nibbles = max(1, (bits - 1).bit_length() // 4)
    h = f"md5(CAST({col} AS STRING))"
    parts = [f"{_nibble(h, i + 1)} * {16 ** (n_nibbles - 1 - i)}"
             for i in range(n_nibbles)]
    return f"(({' + '.join(parts)}) % {bits})"


def bloom_pos_py(value: str, bits: int = BLOOM_BITS) -> int:
    """Python twin of bloom_pos_sql (law tests)."""
    import hashlib
    n_nibbles = max(1, (bits - 1).bit_length() // 4)
    h = hashlib.md5(str(value).encode()).hexdigest()
    return int(h[:n_nibbles], 16) % bits


def hll_py(values) -> int:
    """Python twin of the SQL pipeline (law tests)."""
    import hashlib
    import math
    regs = [0] * HLL_M
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(h[: HLL_B // 4], 16)
        suffix = h[HLL_B // 4: HLL_B // 4 + _RHO_NIBBLES]
        bits = bin(int(suffix, 16))[2:].zfill(_RHO_NIBBLES * 4)
        lz = len(bits) - len(bits.lstrip("0"))
        rho = 1 + (52 if lz == _RHO_NIBBLES * 4 else lz)
        regs[reg] = max(regs[reg], rho)
    s = sum(2.0 ** -r for r in regs)
    raw = HLL_ALPHA * HLL_M * HLL_M / s
    zeros = regs.count(0)
    if raw <= 2.5 * HLL_M and zeros > 0:
        return round(HLL_M * math.log(HLL_M / zeros))
    return round(raw)
