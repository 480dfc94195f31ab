"""Payload functions over position-keyed payloads — both SQL dialects.

The reference attaches a byte payload to each token occurrence during
analysis (lucene/analysis/common/src/java/org/apache/lucene/analysis/
payloads/DelimitedPayloadTokenFilter.java:42) and folds the payloads of
the occurrences a span query matched with a PayloadFunction
(lucene/queries/src/java/org/apache/lucene/queries/payloads/
PayloadFunction.java:33 and its Min/Max/Average/Sum subclasses).

Here the per-occurrence payload is produced by a deterministic encoder
over the occurrence's position —  payload(pos) = 1 + (pos mod 7)  — the
pluggable stand-in for the DelimitedPayloadTokenFilter + PayloadDecoder
pair (the corpus carries no in-band ``term|payload`` markup).  Both the
Spark engine and the DuckDB oracle evaluate the SAME encoder formula so
scores stay bit-identical: payload values are small integers (exact in
float64), the fold visits positions in ascending order on both sides
(the index stores positions sorted; the oracle lists them ORDER BY
pos), and avg divides the exact integer sum by tf.
"""

from __future__ import annotations

FUNCS = ("min", "max", "avg", "sum")


def payload_factor_sql(positions: str, tf: str, func: str,
                       dialect: str) -> str:
    """SQL for the folded payload factor of one posting row.

    ``positions``: array/list column expression of int positions
    (ascending).  ``tf``: occurrence count expression.  ``dialect``:
    ``spark`` or ``duckdb``.
    """
    if func not in FUNCS:
        raise ValueError(f"unknown PayloadFunction {func!r}")
    if dialect == "spark":
        arr = (f"transform({positions}, "
               f"p -> 1.0D + CAST(p % 7 AS DOUBLE))")
        total = f"aggregate({arr}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        if func == "sum":
            return total
        if func == "avg":
            return f"({total}) / CAST({tf} AS DOUBLE)"
        return f"array_{func}({arr})"
    if dialect == "duckdb":
        arr = (f"list_transform({positions}, "
               f"p -> 1.0 + CAST(p % 7 AS DOUBLE))")
        total = f"list_sum({arr})"
        if func == "sum":
            return total
        if func == "avg":
            return f"({total}) / CAST({tf} AS DOUBLE)"
        return f"list_aggregate({arr}, '{func}')"
    raise ValueError(f"unknown dialect {dialect!r}")


def payload_check_tf_sql(positions: str, payload: int,
                         dialect: str) -> str:
    """SQL counting the occurrences whose payload equals ``payload`` —
    the accept test of SpanPayloadCheckQuery (queries/payloads/
    SpanPayloadCheckQuery.java:56, PayloadMatcher collector): spans
    whose payload differs are rejected, and the scorer's freq is the
    number of ACCEPTED spans (each single-term span has sloppyFreq 1).
    Same deterministic position-keyed encoder as payload_factor_sql."""
    v = int(payload)
    if dialect == "spark":
        return (f"size(filter({positions}, "
                f"p -> 1 + p % 7 = {v}))")
    if dialect == "duckdb":
        return (f"len(list_filter({positions}, "
                f"p -> 1 + p % 7 = {v}))")
    raise ValueError(f"unknown dialect {dialect!r}")
