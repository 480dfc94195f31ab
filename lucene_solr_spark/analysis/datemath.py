"""Solr date math (solr/core/src/java/org/apache/solr/util/
DateMathParser.java): an instant followed by any sequence of
``+N UNIT`` / ``-N UNIT`` adjustments and ``/UNIT`` roundings,
evaluated strictly left to right (DateMathParser.java parseMath loop).

Example: ``2024-01-05T07:40:12Z/DAY+12HOUR-30MINUTE`` →
2024-01-05T11:30:00Z.

The parser runs at plan-build time and yields a plain timestamp
literal, so both the Spark plan and the DuckDB oracle compare against
the identical constant — date math never executes per-row (same as
Solr, which resolves the expression once per request).

Units: YEAR MONTH DAY DATE HOUR HOURS MINUTE MINUTES SECOND SECONDS
MILLI MILLIS MILLISECOND MILLISECONDS (DateMathParser.CALENDAR_UNITS).
MONTH arithmetic clamps the day like java.time (Jan 31 + 1MONTH =
Feb 29/28).
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

_UNIT_CANON = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI",
    "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}

_OP_RE = re.compile(r"([+\-/])(\d*)([A-Z]+)")

_TD = {
    "DAY": timedelta(days=1),
    "HOUR": timedelta(hours=1),
    "MINUTE": timedelta(minutes=1),
    "SECOND": timedelta(seconds=1),
    "MILLI": timedelta(milliseconds=1),
}


class DateMathError(ValueError):
    pass


def _add_months(dt: datetime, n: int) -> datetime:
    m = dt.month - 1 + n
    y = dt.year + m // 12
    m = m % 12 + 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=d)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=dt.microsecond // 1000 * 1000)
    raise DateMathError(f"unknown rounding unit {unit}")


def parse_date_math(expr: str) -> datetime:
    """Evaluate a full Solr date-math string: instant + operations."""
    m = re.match(r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?)Z?",
                 expr)
    if not m:
        raise DateMathError(f"no instant at the start of {expr!r}")
    base = datetime.fromisoformat(m.group(1))
    return apply_math(base, expr[m.end():])


def apply_math(dt: datetime, math: str) -> datetime:
    pos = 0
    for op in _OP_RE.finditer(math):
        if op.start() != pos:
            raise DateMathError(f"unparsable date math at {math[pos:]!r}")
        pos = op.end()
        sign, num, unit_raw = op.group(1), op.group(2), op.group(3)
        unit = _UNIT_CANON.get(unit_raw)
        if unit is None:
            raise DateMathError(f"unknown unit {unit_raw!r}")
        if sign == "/":
            if num:
                raise DateMathError("rounding takes no count")
            dt = _round_down(dt, unit)
            continue
        n = int(num or 1) * (1 if sign == "+" else -1)
        if unit == "YEAR":
            dt = _add_months(dt, 12 * n)
        elif unit == "MONTH":
            dt = _add_months(dt, n)
        else:
            dt = dt + n * _TD[unit]
    if pos != len(math):
        raise DateMathError(f"trailing junk {math[pos:]!r}")
    return dt
