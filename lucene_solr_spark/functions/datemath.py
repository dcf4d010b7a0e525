"""Solr date-math expression parser (SURVEY.md §2.10).

Mirrors `[U] solr/core/src/java/org/apache/solr/util/DateMathParser.java`:
an anchor (``NOW`` or an ISO-8601 instant) followed by operations —
``/UNIT`` rounds DOWN to the unit, ``+N UNIT`` / ``-N UNIT`` shift.
Units: YEAR(S), MONTH(S), DAY(S)/DATE, HOUR(S), MINUTE(S), SECOND(S),
MILLI(S)/MILLISECOND(S).

    parse_date_math("NOW/DAY+7DAYS", now=datetime(...))
    parse_date_math("2024-01-15T10:30:00Z/MONTH+1MONTH-3DAYS")

Pure driver-side function -> a Python datetime, usable directly as a
Catalyst literal in range filters/facets (so the comparison itself
stays a pushed-down JVM predicate).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

__all__ = ["parse_date_math"]

_OP_RE = re.compile(r"(/([A-Z]+))|([+-])(\d+)([A-Z]+)")

_UNITS = {
    "YEAR": "year", "YEARS": "year",
    "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day",
    "HOUR": "hour", "HOURS": "hour",
    "MINUTE": "minute", "MINUTES": "minute",
    "SECOND": "second", "SECONDS": "second",
    "MILLI": "milli", "MILLIS": "milli",
    "MILLISECOND": "milli", "MILLISECONDS": "milli",
}


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    if unit == "milli":
        return dt.replace(microsecond=dt.microsecond // 1000 * 1000)
    raise ValueError(f"unknown unit {unit!r}")


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(year=dt.year + n)
    if unit == "month":
        # calendar month shift with day clamping (java.time semantics)
        total = (dt.year * 12 + dt.month - 1) + n
        y, m = divmod(total, 12)
        m += 1
        import calendar

        day = min(dt.day, calendar.monthrange(y, m)[1])
        return dt.replace(year=y, month=m, day=day)
    delta = {
        "day": timedelta(days=n), "hour": timedelta(hours=n),
        "minute": timedelta(minutes=n), "second": timedelta(seconds=n),
        "milli": timedelta(milliseconds=n),
    }[unit]
    return dt + delta


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    expr = expr.strip()
    if expr.startswith("NOW"):
        dt = now if now is not None else datetime.utcnow()
        rest = expr[3:]
    else:
        m = re.match(r"([0-9T:.\-]+)(Z?)", expr)
        if not m:
            raise ValueError(f"bad date-math anchor in {expr!r}")
        iso = m.group(1)
        dt = datetime.fromisoformat(iso)
        rest = expr[m.end():]
    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if not m:
            raise ValueError(f"bad date-math op at {rest[pos:]!r}")
        if m.group(1):  # /UNIT round
            unit = _UNITS.get(m.group(2))
            if unit is None:
                raise ValueError(f"unknown unit {m.group(2)!r}")
            dt = _round_down(dt, unit)
        else:
            sign = 1 if m.group(3) == "+" else -1
            unit = _UNITS.get(m.group(5))
            if unit is None:
                raise ValueError(f"unknown unit {m.group(5)!r}")
            dt = _add(dt, sign * int(m.group(4)), unit)
        pos = m.end()
    return dt
