"""Window assignment — pure numpy/Arrow, vectorized.

Tumbling windows reproduce the reference's start-aligned bucket rule: the SQL
``window(ts, rate, rate, offset)`` with ``offset = start_date.timestamp() %
interval`` (reference ``_time_series_query_builder.py:43-63,102-113``) makes
buckets aligned to ``start_date``, NOT to the epoch.  We express the same thing
directly: ``window_start = start + floor((ts - start) / interval) * interval``.

Sliding and session windows do not exist in the reference (SURVEY.md §2.9);
their semantics here are the standard definitions:
- sliding(size, slide): a timestamp t belongs to every window
  ``[w, w+size)`` with ``w ≡ start (mod slide)`` and ``w <= t < w+size``.
- session(gap): per key, consecutive events <= gap apart share a session;
  the session window is ``[min(ts), max(ts)+gap)``.

All timestamps are int64 microseconds since the epoch (UTC-naive, matching
Arrow/DuckDB defaults).
"""

from __future__ import annotations

import numpy as np


def tumbling_window_start(ts_us: np.ndarray, start_us: int, interval_us: int) -> np.ndarray:
    """Start-aligned tumbling bucket start for each timestamp (int64 us).

    floor-division semantics hold for timestamps before ``start_us`` too
    (numpy // floors toward -inf for int64).
    """
    ts = np.asarray(ts_us, dtype=np.int64)
    return start_us + ((ts - start_us) // interval_us) * interval_us


def sliding_window_starts(ts_us: np.ndarray, start_us: int, size_us: int, slide_us: int):
    """(row_index, window_start) pairs — each row replicated once per window.

    Returns (idx, win_start) int64 arrays; number of windows per row is
    ceil(size/slide) at most.
    """
    ts = np.asarray(ts_us, dtype=np.int64)
    # Last window containing t starts at the slide-aligned floor of t.
    last = start_us + ((ts - start_us) // slide_us) * slide_us
    k = int(-(-size_us // slide_us))  # ceil(size/slide) candidate windows
    idx = np.repeat(np.arange(len(ts), dtype=np.int64), k)
    starts = (last[:, None] - np.arange(k, dtype=np.int64)[None, :] * slide_us).ravel()
    keep = (starts <= ts[idx]) & (ts[idx] < starts + size_us)
    return idx[keep], starts[keep]


def session_ids(sorted_ts_us: np.ndarray, gap_us: int) -> np.ndarray:
    """Session id (0..n-1) per event for ONE key's time-sorted events."""
    ts = np.asarray(sorted_ts_us, dtype=np.int64)
    if len(ts) == 0:
        return np.zeros(0, dtype=np.int64)
    new_session = np.empty(len(ts), dtype=bool)
    new_session[0] = True
    new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    return np.cumsum(new_session) - 1
