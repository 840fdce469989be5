"""Polars duration-string grammar → Spark-usable components.

The reference accepts duration strings like ``"3d12h4m25s"``, ``"1mo"``,
``"1q"``, ``"1y"``, ``"1i"`` (index count) wherever a window/offset length is
needed (``/root/reference/lib/polars/utils/various.rb`` —
``parse_as_duration_string``; consumers: ``group_by_dynamic``
``lazy_frame.rb:1416``, ``rolling_*_by`` ``expr.rb:3964``, ``offset_by``
``date_time_expr.rb:1258``).

We parse into a :class:`Duration` of (months, microseconds, index_count).
Calendar units (mo/q/y) cannot be converted to a fixed microsecond span; ops
that need a fixed span (range-frame windows) reject them, ops that can use
calendar arithmetic (``offset_by`` → ``add_months``) handle them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_UNIT_US = {
    "ns": 1e-3,  # truncated to whole us downstream (Spark timestamps are us)
    "us": 1,
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60 * 1_000_000,
    "h": 3600 * 1_000_000,
    "d": 86400 * 1_000_000,
    "w": 7 * 86400 * 1_000_000,
}
_UNIT_MONTHS = {"mo": 1, "q": 3, "y": 12}

_TOKEN = re.compile(r"(-?\d+)(ns|us|ms|mo|m|s|h|d|w|q|y|i)")


@dataclass(frozen=True)
class Duration:
    months: int = 0
    microseconds: int = 0
    index_count: int = 0
    negative: bool = False

    @property
    def is_calendar(self) -> bool:
        return self.months != 0

    @property
    def is_index(self) -> bool:
        return self.index_count != 0

    def total_seconds(self) -> float:
        if self.is_calendar:
            raise ValueError("calendar duration (mo/q/y) has no fixed length in seconds")
        return self.microseconds / 1e6

    def sql_interval(self) -> str:
        """Spark SQL INTERVAL literal (mixed month/us durations unsupported)."""
        if self.months and self.microseconds:
            raise ValueError("mixed calendar+clock duration not representable as one INTERVAL")
        if self.months:
            return f"INTERVAL '{self.months}' MONTH"
        secs = self.microseconds / 1e6
        return f"INTERVAL '{secs}' SECOND"


def parse_duration(s: str) -> Duration:
    """Parse a polars duration string. Raises ValueError on junk."""
    s = s.strip().lower().replace(" ", "")
    if not s:
        raise ValueError("empty duration string")
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    pos = 0
    months = 0
    us = 0.0
    idx = 0
    for m in _TOKEN.finditer(s):
        if m.start() != pos:
            raise ValueError(f"invalid duration string: {s!r}")
        pos = m.end()
        n, unit = int(m.group(1)), m.group(2)
        if unit == "i":
            idx += n
        elif unit in _UNIT_MONTHS:
            months += n * _UNIT_MONTHS[unit]
        else:
            us += n * _UNIT_US[unit]
    if pos != len(s):
        raise ValueError(f"invalid duration string: {s!r}")
    sign = -1 if neg else 1
    return Duration(months=sign * months, microseconds=sign * int(us),
                    index_count=sign * idx, negative=neg)
