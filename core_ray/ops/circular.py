"""``circular_average`` / ``circular_standard_deviation`` queries.

Reference semantics (``_time_series_query_builder.py:1570-1719``), implemented
faithfully including the TIME-DIFFERENCE WEIGHTING of consecutive samples:

1. ``raw_events``: DISTINCT (ms-truncated ts, tag, value) in [start, end].
2. ``date_array``: a spine of timestamps start + k*interval per tag.
3. ``window_events``: FULL OUTER JOIN of spine and raw rows on
   (tag, floor-second equality); spine-only rows carry NULL value.
4. Per tag ordered by ts: θ = mod(value - lower, range)·2π/range;
   ``Time_Difference`` = ms-diff to previous row / 86400000 (days);
   pairwise running mean of cos/sin over (previous, current) IGNORING NULLS
   (``AVG OVER ... ROWS BETWEEN 1 PRECEDING AND CURRENT ROW``), rescaled to a
   unit vector, then weighted by Time_Difference.
5. Per (tag, epoch-aligned tumbling window): C = Σ(td·ĉ)/Σtd,
   S = Σ(td·ŝ)/Σtd (numerator sums skip NULL terms, denominator does not);
   R = min(1, √(C²+S²)) with Spark's ``array_min`` NULL-skip (NULL → 1);
   average = mod(2π + atan2(S, C), 2π)·range/2π  (NULL if C/S NULL);
   stddev  = √(−2 ln R)·range/2π                 (0.0 when R → 1 via NULL).

Determinism refinement: the reference orders only by ts, which is ambiguous
when two samples share a (merged) timestamp; both engine and oracle order by
(ts, value) — identical semantics except on those reference-undefined ties.

Scale design: one ``grouped_map`` pass per tag — state is bounded by the
query's [start, end] row count per tag (same shape as TWA); only (tag, ts,
value) rows shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..schema import interval_us
from .common import EVENTS_SPEC, TS, SeriesSpec, grouped_map, normalize, read_events, round4, ts_to_us

TWO_PI = 2.0 * np.pi


def _weighted_tag_stats(
    tms: np.ndarray,
    vals: np.ndarray,
    start_us: int,
    end_us: int,
    ival_us: int,
    lower: float,
    upper: float,
    kind: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Steps 2-5 of the module docstring for ONE tag's (ms-truncated,
    distinct, sorted-by-(ts,value)) samples. Returns (window_start_us, value)
    with NaN marking SQL NULL."""
    rng = upper - lower
    # spine + full outer join on floor-second
    spine = np.arange(start_us, end_us + 1, ival_us, dtype=np.int64)
    raw_sec = tms // 1_000_000
    spine_sec = spine // 1_000_000
    matched_raw = np.isin(raw_sec, spine_sec)
    ts_join = np.where(matched_raw, raw_sec * 1_000_000, tms)
    spine_only = spine[~np.isin(spine_sec, raw_sec)]
    ts_all = np.concatenate([ts_join, spine_only])
    v_all = np.concatenate([vals, np.full(len(spine_only), np.nan)])
    order = np.lexsort((v_all, ts_all))  # NaN sorts last per tie (NULLS LAST)
    ts_all, v_all = ts_all[order], v_all[order]

    theta = np.fmod(v_all - lower, rng) * (TWO_PI / rng)
    cosv, sinv = np.cos(theta), np.sin(theta)
    ms = ts_all // 1000
    td = np.empty(len(ts_all))
    td[0] = np.nan
    td[1:] = (ms[1:] - ms[:-1]) / 86400000.0

    # pairwise (prev, cur) mean ignoring NULLs
    pc_, ps_ = np.full(len(ts_all), np.nan), np.full(len(ts_all), np.nan)
    pc_[1:], ps_[1:] = cosv[:-1], sinv[:-1]
    cnt = (~np.isnan(pc_)).astype(np.int64) + (~np.isnan(cosv)).astype(np.int64)
    with np.errstate(invalid="ignore"):
        ac = np.where(cnt > 0, np.nan_to_num(pc_) + np.nan_to_num(cosv), np.nan) / np.maximum(cnt, 1)
        asn = np.where(cnt > 0, np.nan_to_num(ps_) + np.nan_to_num(sinv), np.nan) / np.maximum(cnt, 1)
        vec = np.sqrt(ac * ac + asn * asn)
        dca = td * (ac / vec)
        dsa = td * (asn / vec)

    ws = (ts_all // ival_us) * ival_us  # epoch-aligned (Spark WINDOW().START)
    uws, inv = np.unique(ws, return_inverse=True)

    def nsum(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ok = ~np.isnan(x)
        s = np.bincount(inv[ok], weights=x[ok], minlength=len(uws))
        n = np.bincount(inv[ok], minlength=len(uws))
        return s, n

    s_dca, n_dca = nsum(dca)
    s_dsa, n_dsa = nsum(dsa)
    s_td, n_td = nsum(td)
    with np.errstate(invalid="ignore", divide="ignore"):
        ct = np.where((n_dca > 0) & (n_td > 0), s_dca / s_td, np.nan)
        st = np.where((n_dsa > 0) & (n_td > 0), s_dsa / s_td, np.nan)
        if kind == "average":
            rad = np.mod(TWO_PI + np.arctan2(st, ct), TWO_PI)
            out = rad * rng / TWO_PI  # reference adds +0, not +lower
        else:
            r = np.minimum(1.0, np.sqrt(ct * ct + st * st))
            r = np.where(np.isnan(r), 1.0, r)  # array_min skips NULL -> 1
            out = np.sqrt(np.maximum(-2.0 * np.log(r), 0.0)) * rng / TWO_PI
    return uws, out


def _finalize(start_us, end_us, ival, lower, upper, kind):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        tag = g[TS.TAG].iloc[0]
        tms = (g[TS.TS_US].to_numpy() // 1000) * 1000  # ms truncate
        vals = g[TS.VALUE].to_numpy()
        # SELECT DISTINCT over (ms-ts, value)
        key = np.stack([tms, vals.view(np.int64)], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        first.sort()
        tms, vals = tms[first], vals[first]
        order = np.lexsort((vals, tms))
        uws, out = _weighted_tag_stats(
            tms[order], vals[order], start_us, end_us, ival, lower, upper, kind
        )
        return pd.DataFrame(
            {
                "TagName": tag,
                "EventTime": uws.astype("datetime64[us]"),
                "Value": pd.array(round4(out), dtype="Float64"),
            }
        )

    return fn


def _circular(kind: str):
    def op(
        source: str | ray.data.Dataset,
        *,
        start: str,
        end: str,
        rate: int | float,
        unit: str = "minute",
        lower_bound: float = 0.0,
        upper_bound: float = 360.0,
        tags: list[str] | None = None,
        include_bad: bool = True,
        spec: SeriesSpec = EVENTS_SPEC,
    ) -> ray.data.Dataset:
        start_us, end_us = ts_to_us(start), ts_to_us(end)
        ival = interval_us(rate, unit)
        ds = read_events(source, spec) if isinstance(source, str) else source
        ds = normalize(
            ds, spec, start_us=start_us, end_us=end_us, tags=tags, include_bad=include_bad
        )
        return grouped_map(
            ds, [TS.TAG], _finalize(start_us, end_us, ival, lower_bound, upper_bound, kind)
        )

    return op


circular_average = _circular("average")
circular_stddev = _circular("stddev")
