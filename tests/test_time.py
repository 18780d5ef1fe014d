"""ISO8601 timestamp-list generation (OSHDBTimestamps.java:133-195
semantics): regular periods, calendar clamping, from-end mode."""

from __future__ import annotations

import pytest

from oshdb_spark.functions.time import parse_iso, parse_period, timestamps


def test_no_period_gives_endpoints():
    assert timestamps("2024-01-01", "2024-02-01") == [1704067200, 1706745600]


def test_monthly_period():
    got = timestamps("2014-01-01", "2014-04-01", "P1M")
    assert got == [
        int(parse_iso(d).timestamp())
        for d in ("2014-01-01", "2014-02-01", "2014-03-01", "2014-04-01")
    ]


def test_month_end_clamps_like_java_time():
    # Jan 31 + P1M -> Feb 29 (2024 is a leap year), like java.time plusMonths
    got = timestamps("2024-01-31", "2024-03-31", "P1M")
    assert got == [
        int(parse_iso(d).timestamp())
        for d in ("2024-01-31", "2024-02-29", "2024-03-29")
    ]


def test_fixed_periods_and_time_component():
    got = timestamps("2024-01-01T00:00:00", "2024-01-01T06:00:00", "PT2H")
    assert len(got) == 4 and got[1] - got[0] == 7200


def test_from_end_mode():
    got = timestamps("2024-01-03", "2024-01-10", "P2D", from_end=True)
    # steps back from the end: 10th, 8th, 6th, 4th (3rd excluded)
    assert got == [
        int(parse_iso(d).timestamp())
        for d in ("2024-01-04", "2024-01-06", "2024-01-08", "2024-01-10")
    ]


def test_invalid_period_rejected():
    with pytest.raises(ValueError):
        parse_period("PX")
    with pytest.raises(ValueError):
        timestamps("2024-01-01", "2024-01-02", "P")


def test_week_period():
    got = timestamps("2024-01-01", "2024-01-31", "P1W")
    assert len(got) == 5 and all(b - a == 7 * 86400 for a, b in zip(got, got[1:]))
