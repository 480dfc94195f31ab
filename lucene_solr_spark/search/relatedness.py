"""Solr JSON-facet relatedness() scoring as portable SQL.

Reproduces ``RelatednessAgg.computeRelatedness`` (solr/core/src/java/
org/apache/solr/search/facet/RelatednessAgg.java:473-488) textually so
the Spark engine and the DuckDB oracle evaluate the identical IEEE
operation sequence:

    bg_prob = bg_count / bg_size
    num     = fg_count - fg_size * bg_prob
    denom   = sqrt(fg_size * bg_prob * (1 - bg_prob))   (0 -> 1e-10)
    z       = num / denom
    result  = 0.2 * sig(z,-80,50) + 0.2 * sig(z,-30,30)
            + 0.2 * sig(z,  0,30) + 0.2 * sig(z, 30,30)
            + 0.2 * sig(z, 80,50)
    sig(x,o,s) = (x+o) / (s + abs(x+o))                 (sigmoidHelper)

rounded to 5 digits with Math.round semantics (floor(x*1e5 + 0.5)/1e5 —
``roundTo5Digits``, RelatednessAgg.java:495). Only +,-,*,/ and
sqrt/abs/floor appear, all bit-specified by IEEE-754, so the two
backends hash-match without a rounding epsilon.
"""

from __future__ import annotations


def relatedness_sql(fg_count: str, fg_size: str,
                    bg_count: str, bg_size: str) -> str:
    """SQL text of computeRelatedness over four numeric expressions."""
    bg_prob = f"(CAST({bg_count} AS DOUBLE) / ({bg_size}))"
    num = f"(({fg_count}) - ({fg_size}) * {bg_prob})"
    raw_den = f"sqrt(({fg_size}) * {bg_prob} * (1 - {bg_prob}))"
    den = f"(CASE WHEN {raw_den} = 0 THEN 1e-10 ELSE {raw_den} END)"
    z = f"({num} / {den})"

    def sig(off: int, scale: int) -> str:
        return f"(({z} + {off}) / ({scale} + abs({z} + {off})))"

    total = " + ".join(
        f"0.2 * {sig(off, scale)}"
        for off, scale in ((-80, 50), (-30, 30), (0, 30), (30, 30),
                           (80, 50)))
    return f"(FLOOR(({total}) * 1e5 + 0.5) / 1e5)"
