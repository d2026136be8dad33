"""Reference-parity query-date parsing (reference
``queries/_utilities_query_builder.py:23-77``).

The reference normalizes every ``start_date`` / ``end_date`` / ``timestamps``
parameter before building SQL:

- date-only strings expand to whole-day bounds — ``YYYY-MM-DD`` becomes
  ``...T00:00:00+00:00`` as a start and ``...T23:59:59+00:00`` as an end;
- bare ``YYYY-MM-DDTHH:MM:SS`` strings gain an explicit UTC offset;
- ``YYYY-MM-DD±zz:zz`` (date with offset) gets the day-bound time inserted
  between date and offset;
- datetimes at exactly midnight are treated as date-only starts.

Engine-native formats the reference doesn't enumerate (space-separated
timestamps, fractional seconds) pass through unchanged for ``ts_to_us`` to
parse — the reference raises there, but this engine's ops accept them
natively so rejecting would only break engine callers.
"""

from __future__ import annotations

from datetime import datetime, time


def _matches(dt: str, fmt: str) -> bool:
    try:
        datetime.strptime(dt, fmt)
        return True
    except ValueError:
        return False


def parse_query_date(dt, is_end_date: bool = False, exclude_date_format: bool = False) -> str:
    if isinstance(dt, datetime):
        if dt.time() == time.min and not is_end_date:
            if dt.tzinfo is not None:
                dt = datetime.strftime(dt, "%Y-%m-%d%z")
            else:
                dt = str(dt.date())
        else:
            # isoformat keeps sub-second precision (strftime without %f
            # silently truncated microseconds, shifting bounds by up to 1s)
            dt = dt.isoformat()
    dt = str(dt)

    day_bound = "T23:59:59" if is_end_date else "T00:00:00"
    if _matches(dt, "%Y-%m-%d") and not exclude_date_format:
        return dt + day_bound + "+00:00"
    if _matches(dt, "%Y-%m-%dT%H:%M:%S"):
        return dt + "+00:00"
    if _matches(dt, "%Y-%m-%dT%H:%M:%S%z"):
        return dt
    if _matches(dt, "%Y-%m-%d%z"):
        return dt[0:10] + day_bound + dt[10:]
    return dt


def parse_dates(parameters_dict: dict) -> dict:
    """Normalize the date parameters in place (reference ``_parse_dates``)."""
    p = parameters_dict
    if p.get("start_date") is not None:
        p["start_date"] = parse_query_date(p["start_date"])
    if p.get("end_date") is not None:
        p["end_date"] = parse_query_date(p["end_date"], is_end_date=True)
    if p.get("timestamps"):
        p["timestamps"] = [
            parse_query_date(t, exclude_date_format=True) for t in p["timestamps"]
        ]
    return p


__all__ = ["parse_query_date", "parse_dates"]
