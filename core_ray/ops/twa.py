"""``time_weighted_average`` query — the flagship per-key ordered operator.

Reference semantics (``_time_series_query_builder.py:1424-1567``, detailed in
SURVEY.md §2.1): per tag and start-aligned tumbling window, the trapezoidal
(``step=False``) or step (``step=True``) time-weighted mean of the series,
honoring Bad-status gaps:

1. scan widened by ``lookback`` intervals each side so boundary interpolation
   has context (reference widens by ±window_length days);
2. forward-fill the last *Good* value over Bad events
   (``last_value(x, true) OVER (...)``, ref ``:1453-1454``);
3. synthesize a boundary point at every window edge, its value linearly
   interpolated between the surrounding events' ffilled values (step mode:
   previous value), its status forward-filled (ref ``:1473-1474``);
4. per segment between consecutive points: ``good_minutes = Δt/60s`` if the
   segment starts in Good status else 0 (ref ``:1475-1479``);
   contribution = ``(v_i+v_{i+1})/2 * good_minutes`` (linear) or
   ``v_i * good_minutes`` (step);
5. per window: ``sum(contrib)/sum(good_minutes)`` (ref ``:1480``), clipped to
   ``[start, end)`` (ref ``:1481``); windows with zero good minutes emit no row.

Because a boundary point exists at every window edge, no segment crosses a
window — the whole computation is a single vectorized numpy pass per tag.

Scale note: the per-tag ordered pass shuffles raw events by TagName.  For
series too large for one group, the scale path is (TagName, time-chunk)
grouping with halo events replicated into neighboring chunks; the chunked
variant shares this kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..schema import interval_us
from ..windows import tumbling_window_start
from .common import TS, EVENTS_SPEC, SeriesSpec, normalize, read_events, round4, ts_to_us


def twa_kernel(
    ev_ts: np.ndarray,
    ev_val: np.ndarray,
    ev_good: np.ndarray,
    start_us: int,
    end_us: int,
    ival: int,
    step: bool,
):
    """Windowed TWA for ONE tag's time-sorted events. Returns (ws, value)."""
    # 2. ffill of last Good value (NaN before the first Good event).
    v_eff = np.where(ev_good, ev_val, np.nan)
    good_idx = np.where(ev_good, np.arange(len(ev_ts)), -1)
    np.maximum.accumulate(good_idx, out=good_idx)
    v_eff = np.where(good_idx >= 0, ev_val[good_idx.clip(0)], np.nan)

    # 3. boundary points at every window edge in [start, end].
    b = np.arange(start_us, end_us + 1, ival, dtype=np.int64)
    pe = np.searchsorted(ev_ts, b, side="right") - 1  # last event <= boundary
    ne = np.searchsorted(ev_ts, b, side="right")  # first event > boundary
    has_pe, has_ne = pe >= 0, ne < len(ev_ts)
    bv = np.full(len(b), np.nan)
    if step:
        bv[has_pe] = v_eff[pe[has_pe]]
    else:
        both = has_pe & has_ne
        p, nx = pe[both], ne[both]
        pt, nt = ev_ts[p].astype(np.float64), ev_ts[nx].astype(np.float64)
        t = b[both].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            interp = v_eff[p] + (v_eff[nx] - v_eff[p]) * (t - pt) / (nt - pt)
        exact = ev_ts[p] == b[both]  # boundary coincides with an event
        bv[both] = np.where(exact, v_eff[p], interp)
        only_prev = has_pe & ~has_ne
        bv[only_prev] = v_eff[pe[only_prev]]
    b_good = np.zeros(len(b), dtype=bool)
    b_good[has_pe] = ev_good[pe[has_pe]]

    # merged point sequence
    ts = np.concatenate([ev_ts, b])
    vals = np.concatenate([v_eff, bv])
    good = np.concatenate([ev_good, b_good])
    order = np.argsort(ts, kind="stable")
    ts, vals, good = ts[order], vals[order], good[order]

    if len(ts) < 2:
        return np.empty(0, dtype=np.int64), np.empty(0)

    # 4. segments
    dt_min = (ts[1:] - ts[:-1]).astype(np.float64) / 60e6
    v0, v1 = vals[:-1], vals[1:]
    valid = good[:-1] & ~np.isnan(v0)
    if not step:
        valid &= ~np.isnan(v1)
    mins = np.where(valid, dt_min, 0.0)
    contrib = np.where(valid, (v0 * mins if step else (v0 + v1) / 2.0 * mins), 0.0)

    # 5. per-window reduce, clipped to [start, end)
    ws = tumbling_window_start(ts[:-1], start_us, ival)
    keep = (ws >= start_us) & (ws < end_us)
    ws, mins, contrib = ws[keep], mins[keep], contrib[keep]
    uw, inv = np.unique(ws, return_inverse=True)
    sum_min = np.bincount(inv, weights=mins, minlength=len(uw))
    sum_con = np.bincount(inv, weights=contrib, minlength=len(uw))
    nz = sum_min > 0
    return uw[nz], sum_con[nz] / sum_min[nz]


def _twa_group(start_us: int, end_us: int, ival: int, step, step_map: dict | None):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([TS.TS_US, TS.VALUE], kind="mergesort")
        tag = g[TS.TAG].iloc[0]
        # reference routes step/linear PER TAG from the metadata Step flag
        # (``_time_series_query_builder.py:1455-1472``)
        tag_step = bool(step_map.get(tag, False)) if step_map is not None else bool(step)
        ws, val = twa_kernel(
            g[TS.TS_US].to_numpy(dtype=np.int64),
            g[TS.VALUE].to_numpy(dtype=np.float64),
            (g[TS.STATUS] != "Bad").to_numpy(),
            start_us,
            end_us,
            ival,
            tag_step,
        )
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": ws.astype("datetime64[us]"),
                "Value": round4(val),
            }
        )

    return fn


def time_weighted_average(
    source: str | ray.data.Dataset,
    *,
    start: str,
    end: str,
    rate: int | float,
    unit: str = "minute",
    step: bool | str = False,
    metadata: dict | None = None,
    lookback_intervals: int = 1,
    tags: list[str] | None = None,
    spec: SeriesSpec = EVENTS_SPEC,
) -> ray.data.Dataset:
    start_us, end_us = ts_to_us(start), ts_to_us(end)
    ival = interval_us(rate, unit)
    ds = read_events(source, spec) if isinstance(source, str) else source
    ds = normalize(
        ds,
        spec,
        start_us=start_us - lookback_intervals * ival,
        end_us=end_us + lookback_intervals * ival,
        tags=tags,
    )
    from .common import grouped_map

    # step="metadata": per-tag routing from the metadata Step flag; the
    # metadata side is broadcast (tiny), never shuffled
    step_map = None
    if step == "metadata":
        step_map = {
            k: bool(v["Step"] if isinstance(v, dict) else v)
            for k, v in (metadata or {}).items()
        }
    return grouped_map(ds, [TS.TAG], _twa_group(start_us, end_us, ival, step, step_map))
