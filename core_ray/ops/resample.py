"""``resample`` query: start-aligned tumbling-window aggregate per tag.

Reference semantics: ``_sample_query`` / ``_build_resample_query``
(``_time_series_query_builder.py:183-239,671-770``): tumbling windows aligned
to ``start_date`` (offset rule ``:43-63``), aggregate in
{first, last, avg, min, max} (+ count/sum here) grouped by
``(TagName, window_start)``; ``fill=True`` left-joins the full interval spine
so empty buckets appear with NULL.

Scale design: per-batch PARTIAL aggregation inside ``map_batches`` (Arrow hash
aggregate, one partial row per (tag, window) per batch) followed by a small
``groupby(TagName).map_groups`` merge — the all-to-all shuffle moves partials,
never raw events.  Ties on EventTime break by (ts, value) ascending so first =
min value among ties and last = max value among ties — deterministic and
matched by the DuckDB oracle's ``row_number() OVER (ORDER BY ts, value)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..windows import tumbling_window_start
from ..schema import interval_us
from .common import (
    TS,
    EVENTS_SPEC,
    SeriesSpec,
    normalize,
    read_events,
    round4,
    ts_to_us,
)

AGG_METHODS = ("avg", "min", "max", "first", "last", "count", "sum")

_PARTIAL_AGGS = [
    ("Value", "count"),
    ("Value", "sum"),
    ("cents", "sum"),
    ("Value", "min"),
    ("Value", "max"),
    ("Value", "first"),
    ("Value", "last"),
    ("ts_us", "min"),
    ("ts_us", "max"),
]


def partial_window_aggregates(start_us: int, ival_us: int, scale: int | None = None):
    """map_batches fn: one partial-aggregate row per (TagName, ws) per batch.

    ``scale``: exact-decimal accumulation — values are also summed as
    ``rint(value * scale)`` int64, so the cross-batch merge is EXACT integer
    arithmetic (order-insensitive), used by avg to avoid float-summation-order
    nondeterminism at rounding boundaries."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_partials()
        ws = tumbling_window_start(batch[TS.TS_US].to_numpy(), start_us, ival_us)
        batch = batch.append_column("ws", pa.array(ws))
        cents = (
            np.rint(batch[TS.VALUE].to_numpy() * scale).astype(np.int64)
            if scale
            else np.zeros(len(batch), dtype=np.int64)
        )
        batch = batch.append_column("cents", pa.array(cents))
        # Sort so Arrow's order-sensitive first/last hash kernels see
        # (ts, value)-ascending rows; use_threads=False keeps them stable.
        batch = batch.sort_by([(TS.TS_US, "ascending"), (TS.VALUE, "ascending")])
        out = batch.group_by([TS.TAG, "ws"], use_threads=False).aggregate(_PARTIAL_AGGS)
        return out.rename_columns(
            [TS.TAG, "ws", "cnt", "vsum", "vsumc", "vmin", "vmax", "vfirst", "vlast",
             "ts_min", "ts_max"]
        )

    return fn


def _empty_partials() -> pa.Table:
    return pa.table(
        {
            TS.TAG: pa.array([], pa.string()),
            "ws": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "vsum": pa.array([], pa.float64()),
            "vsumc": pa.array([], pa.int64()),
            "vmin": pa.array([], pa.float64()),
            "vmax": pa.array([], pa.float64()),
            "vfirst": pa.array([], pa.float64()),
            "vlast": pa.array([], pa.float64()),
            "ts_min": pa.array([], pa.int64()),
            "ts_max": pa.array([], pa.int64()),
        }
    )


def merge_partials(g: pd.DataFrame) -> pd.DataFrame:
    """Merge per-batch partials for one tag into one row per window."""
    gb = g.groupby("ws", sort=True)
    out = gb.agg(
        cnt=("cnt", "sum"),
        vsum=("vsum", "sum"),
        vsumc=("vsumc", "sum"),
        vmin=("vmin", "min"),
        vmax=("vmax", "max"),
    )
    # first = value of the partial whose (ts_min, vfirst) is lexicographically
    # smallest; last symmetric with (ts_max, vlast) largest.
    gs = g.sort_values(["ws", "ts_min", "vfirst"], kind="mergesort")
    out["vfirst"] = gs.groupby("ws", sort=True)["vfirst"].first()
    gs = g.sort_values(["ws", "ts_max", "vlast"], kind="mergesort")
    out["vlast"] = gs.groupby("ws", sort=True)["vlast"].last()
    out = out.reset_index()
    out.insert(0, "TagName", g[TS.TAG].iloc[0])
    return out


def _finalize(agg: str, start_us: int, end_us: int, ival_us: int, fill: bool,
              scale: int | None = None):
    col = {
        "avg": None,
        "min": "vmin",
        "max": "vmax",
        "first": "vfirst",
        "last": "vlast",
        "sum": "vsum",
        "count": "cnt",
    }[agg]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        m = merge_partials(g)
        if agg == "avg" and scale:
            # exact int sum -> /scale -> /count: the same two IEEE divisions
            # as the oracle's DECIMAL formulation, deterministic at any
            # parallelism or row order
            val = (m["vsumc"] / float(scale)) / m["cnt"]
        elif agg == "avg":
            val = m["vsum"] / m["cnt"]
        else:
            val = m[col].astype(np.float64)
        out = pd.DataFrame(
            {"TagName": m["TagName"], "ws": m["ws"], "Value": round4(val)}
        )
        if fill:
            grid = np.arange(start_us, end_us + 1, ival_us, dtype=np.int64)
            full = pd.DataFrame({"ws": grid})
            full["TagName"] = g[TS.TAG].iloc[0]
            out = full.merge(out, on=["TagName", "ws"], how="left")
            # Missing buckets are NULL (reference fill semantics), not NaN.
            out["Value"] = out["Value"].astype("Float64")
        out["EventTime"] = out["ws"].astype("datetime64[us]")
        return out[["TagName", "EventTime", "Value"]]

    return fn


def resample(
    source: str | ray.data.Dataset,
    *,
    start: str,
    end: str,
    rate: int | float,
    unit: str = "minute",
    agg: str = "avg",
    fill: bool = False,
    tags: list[str] | None = None,
    include_bad: bool = True,
    exact_decimals: int | None = None,
    spec: SeriesSpec = EVENTS_SPEC,
    display_tz: str | None = None,
) -> ray.data.Dataset:
    """``exact_decimals``: treat values as fixed-point with that many decimal
    places and accumulate avg sums as exact integers — deterministic under
    any shuffle/summation order (float sums can flip a 4-decimal rounding
    boundary depending on order).

    ``display_tz``: the reference's output stage shifts every query's
    EventTime into the display timezone (start-date offset when ``"infer"``,
    or an explicit ``"+HH:MM"``) — window ASSIGNMENT still happens on
    absolute instants (``_time_series_query_builder.py:96-113``)."""
    if agg not in AGG_METHODS:
        raise ValueError(f"agg must be one of {AGG_METHODS}")
    start_us, end_us = ts_to_us(start), ts_to_us(end)
    ival = interval_us(rate, unit)
    ds = read_events(source, spec) if isinstance(source, str) else source
    ds = normalize(ds, spec, start_us=start_us, end_us=end_us, tags=tags, include_bad=include_bad)
    if agg == "avg":
        # reference applies SELECT DISTINCT to the raw slice whenever the
        # aggregate is avg (``_time_series_query_builder.py:92-93``) so
        # duplicated samples don't bias the mean
        from .common import bucketed_distinct

        keys = [TS.TAG, TS.TS_US, TS.STATUS, TS.VALUE]
        ds = bucketed_distinct(ds, keys, keys)
    scale = 10 ** exact_decimals if exact_decimals is not None else None
    partials = ds.map_batches(
        partial_window_aggregates(start_us, ival, scale), batch_format="pyarrow"
    )
    from .common import grouped_map

    out = grouped_map(
        partials, [TS.TAG], _finalize(agg, start_us, end_us, ival, fill, scale)
    )
    if display_tz is not None:
        from .common import apply_display_tz

        out = apply_display_tz(out, start, display_tz)
    return out
