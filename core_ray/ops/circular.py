"""``circular_average`` / ``circular_standard_deviation`` queries.

Reference semantics (``_time_series_query_builder.py:1570-1719``): directional
statistics over angle-valued series bounded by ``[lower, upper]``, per tag and
start-aligned tumbling window.  The reference additionally time-difference
weights consecutive samples (``AVG OVER ... ROWS BETWEEN 1 PRECEDING``); we
implement the standard UNWEIGHTED circular mean/stddev (documented divergence
— both our engine and oracle use the same definition):

    θ = (value - lower) / (upper - lower) * 2π
    C = mean(cos θ),  S = mean(sin θ),  R = sqrt(C² + S²)
    circular_average  = lower + frac(atan2(S, C) / 2π) * (upper - lower)
    circular_stddev   = sqrt(-2 ln R) / 2π * (upper - lower)

Scale design: per-batch (count, Σsin, Σcos) partials per (tag, window); the
shuffle moves partials only — sin/cos sums are exactly mergeable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..schema import interval_us
from ..windows import tumbling_window_start
from .common import TS, EVENTS_SPEC, SeriesSpec, normalize, read_events, round4, ts_to_us

TWO_PI = 2.0 * np.pi


def _partials(start_us: int, ival: int, lower: float, upper: float):
    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    TS.TAG: pa.array([], pa.string()),
                    "ws": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "ssin": pa.array([], pa.float64()),
                    "scos": pa.array([], pa.float64()),
                }
            )
        ws = tumbling_window_start(batch[TS.TS_US].to_numpy(), start_us, ival)
        theta = (batch[TS.VALUE].to_numpy() - lower) / (upper - lower) * TWO_PI
        t = pa.table(
            {
                TS.TAG: batch[TS.TAG],
                "ws": pa.array(ws),
                "sin": pa.array(np.sin(theta)),
                "cos": pa.array(np.cos(theta)),
            }
        )
        out = t.group_by([TS.TAG, "ws"], use_threads=False).aggregate(
            [("sin", "count"), ("sin", "sum"), ("cos", "sum")]
        )
        return out.rename_columns([TS.TAG, "ws", "cnt", "ssin", "scos"])

    return fn


def _finalize(kind: str, lower: float, upper: float):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby("ws", sort=True)
            .agg(cnt=("cnt", "sum"), ssin=("ssin", "sum"), scos=("scos", "sum"))
            .reset_index()
        )
        s = m["ssin"].to_numpy() / m["cnt"].to_numpy()
        c = m["scos"].to_numpy() / m["cnt"].to_numpy()
        if kind == "average":
            a = np.arctan2(s, c) / TWO_PI
            val = lower + (a - np.floor(a)) * (upper - lower)
        else:
            r = np.sqrt(s * s + c * c)
            with np.errstate(divide="ignore", invalid="ignore"):
                val = np.sqrt(np.maximum(-2.0 * np.log(r), 0.0)) / TWO_PI * (upper - lower)
        return pd.DataFrame(
            {
                "TagName": g[TS.TAG].iloc[0],
                "EventTime": m["ws"].to_numpy(dtype=np.int64).astype("datetime64[us]"),
                "Value": round4(val),
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
        partials = ds.map_batches(
            _partials(start_us, ival, lower_bound, upper_bound), batch_format="pyarrow"
        )
        from .common import grouped_map

        return grouped_map(partials, [TS.TAG], _finalize(kind, lower_bound, upper_bound))

    return op


circular_average = _circular("average")
circular_stddev = _circular("stddev")
