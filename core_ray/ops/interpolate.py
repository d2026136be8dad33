"""``interpolate`` and ``interpolation_at_time`` queries.

Reference semantics:
- ``interpolate`` (``_time_series_query_builder.py:242-301,908-1042``): resample
  grid per tag (LAST value per start-aligned bucket), then linear interpolation
  across NULL buckets using the previous/next non-null grid values
  (``LAG/LEAD(... ) IGNORE NULLS``), falling back to forward-fill when no next
  value exists, NULL when no previous value exists.
- ``interpolation_at_time`` (``:1191-1316``): interpolate raw events at
  arbitrary requested timestamps (events deduplicated per (tag, ts) by min),
  ffill past the last event, NULL before the first.

Grid values are exact selections (last/min), not float averages: engine and
oracle then interpolate from bit-identical doubles and round exactly once at
the end — float-summation-order noise cannot flip the rounded output.

``IGNORE NULLS`` lag/lead has no Arrow primitive (SURVEY.md §7.4) — implemented
as numpy forward/backward index propagation inside per-tag sorted groups.

Scale design: ``interpolate`` shuffles only per-batch window partials (resample
pattern) and runs the ordered pass per tag in ``map_groups``;
``interpolation_at_time`` shuffles per-(tag, ts) deduplicated events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..schema import interval_us
from .common import TS, EVENTS_SPEC, SeriesSpec, normalize, read_events, round4, ts_to_us
from .resample import merge_partials, partial_window_aggregates


def _prev_next_nonnull(vals: np.ndarray):
    """Indices of previous/next non-NaN value for each position (-1 = none)."""
    n = len(vals)
    idx = np.arange(n)
    has = ~np.isnan(vals)
    prev = np.where(has, idx, -1)
    np.maximum.accumulate(prev, out=prev)
    nxt = np.where(has, idx, n)
    nxt = n - 1 - np.maximum.accumulate((n - 1 - nxt)[::-1])[::-1]
    nxt[nxt >= n] = -1
    return prev, nxt


def linear_fill(ts_us: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """The reference's interpolation arms over one sorted series:
    value present -> keep; prev & next -> linear; prev only -> ffill;
    else NaN."""
    prev, nxt = _prev_next_nonnull(vals)
    out = vals.copy()
    need = np.isnan(vals)
    both = need & (prev >= 0) & (nxt >= 0)
    if both.any():
        p, nx = prev[both], nxt[both]
        t = ts_us[both].astype(np.float64)
        pt, nt = ts_us[p].astype(np.float64), ts_us[nx].astype(np.float64)
        out[both] = vals[p] + (vals[nx] - vals[p]) * (t - pt) / (nt - pt)
    ffill = need & (prev >= 0) & (nxt < 0)
    if ffill.any():
        out[ffill] = vals[prev[ffill]]
    return out


def _interp_group(start_us: int, end_us: int, ival: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        m = merge_partials(g)
        # Grid value = LAST event value of the bucket (exact selection, no
        # float summation) so engine and oracle interpolate from bit-identical
        # doubles; rounding happens once, at the end.
        m["v"] = m["vlast"]
        grid = np.arange(start_us, end_us + 1, ival, dtype=np.int64)
        vals = np.full(len(grid), np.nan)
        pos = (m["ws"].to_numpy(dtype=np.int64) - start_us) // ival
        ok = (pos >= 0) & (pos < len(grid))
        vals[pos[ok]] = m["v"].to_numpy()[ok]
        out = pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": grid.astype("datetime64[us]"),
                # NaN (no previous value exists) -> NULL, matching the SQL arm.
                "Value": pd.array(round4(linear_fill(grid, vals)), dtype="Float64"),
            }
        )
        return out

    return fn


def interpolate(
    source: str | ray.data.Dataset,
    *,
    start: str,
    end: str,
    rate: int | float,
    unit: str = "minute",
    tags: list[str] | None = None,
    include_bad: bool = True,
    spec: SeriesSpec = EVENTS_SPEC,
    display_tz: str | None = None,
) -> ray.data.Dataset:
    start_us, end_us = ts_to_us(start), ts_to_us(end)
    ival = interval_us(rate, unit)
    ds = read_events(source, spec) if isinstance(source, str) else source
    ds = normalize(ds, spec, start_us=start_us, end_us=end_us, tags=tags, include_bad=include_bad)
    partials = ds.map_batches(partial_window_aggregates(start_us, ival), batch_format="pyarrow")
    from .common import grouped_map

    out = grouped_map(partials, [TS.TAG], _interp_group(start_us, end_us, ival))
    if display_tz is not None:
        from .common import apply_display_tz

        out = apply_display_tz(out, start, display_tz)
    return out


def _dedup_partials(batch: pa.Table) -> pa.Table:
    """Per-(tag, ts) MIN-value dedup partials (exact selection — engine and
    oracle agree bit-for-bit, unlike a float avg)."""
    if len(batch) == 0:
        return pa.table(
            {
                TS.TAG: pa.array([], pa.string()),
                TS.TS_US: pa.array([], pa.int64()),
                "vmin": pa.array([], pa.float64()),
            }
        )
    out = batch.group_by([TS.TAG, TS.TS_US], use_threads=False).aggregate(
        [("Value", "min")]
    )
    return out.rename_columns([TS.TAG, TS.TS_US, "vmin"])


def _at_time_group(req_us: np.ndarray):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(TS.TS_US, sort=True).agg(vmin=("vmin", "min")).reset_index()
        xp = m[TS.TS_US].to_numpy(dtype=np.int64)
        fp = m["vmin"].to_numpy()
        t = np.asarray(req_us, dtype=np.int64)
        pos = np.searchsorted(xp, t, side="right")
        exact = np.searchsorted(xp, t, side="left") < pos  # t present in xp
        out = np.full(len(t), np.nan)
        # exact hit
        out[exact] = fp[np.searchsorted(xp, t[exact], side="left")]
        # interior: prev = pos-1, next = pos
        interior = ~exact & (pos > 0) & (pos < len(xp))
        p = pos[interior] - 1
        tt = t[interior].astype(np.float64)
        pt, nt = xp[p].astype(np.float64), xp[p + 1].astype(np.float64)
        out[interior] = fp[p] + (fp[p + 1] - fp[p]) * (tt - pt) / (nt - pt)
        # past the end: ffill
        tail = ~exact & (pos == len(xp)) & (len(xp) > 0)
        out[tail] = fp[-1]
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": t.astype("datetime64[us]"),
                "Value": pd.array(round4(out), dtype="Float64"),
            }
        )

    return fn


def interpolation_at_time(
    source: str | ray.data.Dataset,
    *,
    timestamps: list[str],
    tags: list[str] | None = None,
    include_bad: bool = True,
    window_days: int | None = None,
    spec: SeriesSpec = EVENTS_SPEC,
) -> ray.data.Dataset:
    """``window_days`` bounds the scan to [min(ts) - w, max(ts) + w] days —
    the reference's ``window_length`` lookback knob (its raw-data window is
    widened by window_length days around the requested timestamps); None
    scans the full series."""
    req_us = np.array(sorted(ts_to_us(t) for t in timestamps), dtype=np.int64)
    ds = read_events(source, spec) if isinstance(source, str) else source
    bounds = {}
    if window_days is not None and len(req_us):
        w = int(window_days) * 86_400_000_000
        bounds = {"start_us": int(req_us[0]) - w, "end_us": int(req_us[-1]) + w}
    ds = normalize(ds, spec, tags=tags, include_bad=include_bad, **bounds)
    partials = ds.map_batches(_dedup_partials, batch_format="pyarrow")
    from .common import grouped_map

    return grouped_map(partials, [TS.TAG], _at_time_group(req_us))
