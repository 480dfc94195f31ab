"""Solr RandomSortField semantics (solr/core/src/java/org/apache/solr/
schema/RandomSortField.java:66-88): a deterministic pseudo-random total
order per (seed, doc) from Thomas Wang's hash32shift, used for
reproducible random sampling of results (sort=random_<seed> asc).

The reference seeds with fieldName.hashCode() + docBase + indexVersion
(:86) — environment-bound by design, so each dynamic field name gives a
different stable shuffle.  Here the seed is an explicit query parameter
(the engine's docids are index-stable, so there is no docBase), and the
hash itself is reproduced BIT-EXACTLY: every step of hash32shift (:68)
is emulated on an unsigned-32 view in BIGINT arithmetic, emitted as
dialect-specific SQL so Spark (whole-stage codegen) and the DuckDB
oracle compute the identical signed-int32 key.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def wang_hash32(key: int) -> int:
    """Pure-python reference: Java int semantics of hash32shift."""
    key &= _M32
    key = ((key ^ _M32) + ((key << 15) & _M32)) & _M32   # ~key + (key<<15)
    key ^= key >> 12                                      # key ^ (key>>>12)
    key = (key + ((key << 2) & _M32)) & _M32              # key + (key<<2)
    key ^= key >> 4                                       # key ^ (key>>>4)
    key = (key * 2057) & _M32                             # key * 2057
    key ^= key >> 16                                      # key ^ (key>>>16)
    return key - (1 << 32) if key >= (1 << 31) else key   # signed view


def wang_hash32_sql(col: str, seed: int, dialect: str) -> str:
    """SQL for wang_hash32(col + seed) as a signed int32 in BIGINT.

    dialect 'spark' uses shiftleft/shiftright + ``^``; 'duckdb' uses
    ``<<``/``>>`` + xor().  Both mask to 32 bits after every wrapping
    step, exactly mirroring Java's int overflow.
    """
    if dialect == "spark":
        def shl(e, n):
            return f"shiftleft({e}, {n})"

        def shr(e, n):
            return f"shiftright({e}, {n})"

        def xor(a, b):
            return f"({a} ^ {b})"
    elif dialect == "duckdb":
        def shl(e, n):
            return f"({e} << {n})"

        def shr(e, n):
            return f"({e} >> {n})"

        def xor(a, b):
            return f"xor({a}, {b})"
    else:  # pragma: no cover
        raise ValueError(dialect)

    m = _M32
    k0 = f"((CAST({col} AS BIGINT) + {seed}) & {m})"
    s1 = f"(({xor(k0, m)} + ({shl(k0, 15)} & {m})) & {m})"
    s2 = f"{xor(s1, shr(s1, 12))}"
    s3 = f"(({s2} + ({shl(s2, 2)} & {m})) & {m})"
    s4 = f"{xor(s3, shr(s3, 4))}"
    s5 = f"(({s4} * 2057) & {m})"
    s6 = f"{xor(s5, shr(s5, 16))}"
    return (f"(CASE WHEN {s6} >= 2147483648 "
            f"THEN {s6} - 4294967296 ELSE {s6} END)")
