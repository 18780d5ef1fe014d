"""Timestamp-list generation — the ``timestamps(start, end, period)``
overloads of the reference (``MapReducer.java:297-394``; generator
``oshdb-util/.../time/OSHDBTimestamps.java:133-195``): ISO8601
start/end plus an ISO period (P1Y, P1M, P1D, PT1H, ...) expand to the
sorted epoch-seconds list that drives snapshot probes and interval
flooring.

Semantics ported: intervals step forward from ``start`` by the period;
the list always contains ``start`` and every step ``<= end``; calendar
periods (years/months) add calendar units (so Jan 31 + P1M clamps to
the month end, like java.time plus-months), fixed periods (days,
hours, minutes, seconds) add exact seconds. ``from_end=True`` mirrors
the reference's from-end mode (steps backwards from ``end``)."""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

_PERIOD_RE = re.compile(
    r"^P(?:(?P<y>\d+)Y)?(?:(?P<mo>\d+)M)?(?:(?P<w>\d+)W)?(?:(?P<d>\d+)D)?"
    r"(?:T(?:(?P<h>\d+)H)?(?:(?P<mi>\d+)M)?(?:(?P<s>\d+)S)?)?$"
)


def parse_period(period: str) -> dict[str, int]:
    m = _PERIOD_RE.match(period)
    if not m or period == "P":
        raise ValueError(f"invalid ISO8601 period: {period!r}")
    g = {k: int(v) for k, v in m.groupdict().items() if v}
    if not g:
        raise ValueError(f"empty ISO8601 period: {period!r}")
    return g


def parse_iso(ts: str) -> datetime:
    """ISO8601 datetime or date, interpreted as UTC."""
    if re.match(r"^\d{4}-\d{2}-\d{2}$", ts):
        ts += "T00:00:00"
    dt = datetime.fromisoformat(ts.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def _add_period(dt: datetime, p: dict[str, int], sign: int = 1) -> datetime:
    months = sign * (p.get("y", 0) * 12 + p.get("mo", 0))
    if months:
        total = dt.year * 12 + (dt.month - 1) + months
        y, mo = divmod(total, 12)
        day = min(dt.day, calendar.monthrange(y, mo + 1)[1])  # java.time clamp
        dt = dt.replace(year=y, month=mo + 1, day=day)
    delta = timedelta(
        weeks=p.get("w", 0),
        days=p.get("d", 0),
        hours=p.get("h", 0),
        minutes=p.get("mi", 0),
        seconds=p.get("s", 0),
    )
    return dt + sign * delta


def timestamps(
    start: str, end: str, period: str | None = None, from_end: bool = False
) -> list[int]:
    """Sorted epoch-seconds list: [start] and [end] alone if no period;
    otherwise regular steps within [start, end]."""
    t0, t1 = parse_iso(start), parse_iso(end)
    if t1 < t0:
        raise ValueError("end before start")
    if period is None:
        out = {int(t0.timestamp()), int(t1.timestamp())}
        return sorted(out)
    p = parse_period(period)
    out_dt: list[datetime] = []
    if from_end:
        cur = t1
        while cur >= t0:
            out_dt.append(cur)
            nxt = _add_period(cur, p, sign=-1)
            if nxt >= cur:
                raise ValueError("zero-length period")
            cur = nxt
    else:
        cur = t0
        while cur <= t1:
            out_dt.append(cur)
            nxt = _add_period(cur, p, sign=1)
            if nxt <= cur:
                raise ValueError("zero-length period")
            cur = nxt
    return sorted(int(d.timestamp()) for d in out_dt)
