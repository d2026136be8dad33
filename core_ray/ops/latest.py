"""``latest`` query: most recent event per tag (and most recent Good event).

Reference semantics: the ``..._events_latest`` table maintained by
``pcdm_latest_to_delta.py:151-240`` and queried by ``_latest_query``
(``_time_series_query_builder.py:1363-1421``).  In the batch query form this
is an argmax-by-EventTime per TagName; the streaming form (keyed registers in
actor state) lives in ``core_ray.streaming``.

Ties on EventTime break by max Value (deterministic; oracle uses
``row_number() OVER (ORDER BY ts DESC, value DESC)``).

Scale design: per-batch argmax partial (one row per tag per batch, carrying
both the latest and the latest-Good row) then a tiny per-tag merge — no
raw-row shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .common import TS, EVENTS_SPEC, SeriesSpec, normalize, read_events


def _argmax_rows(batch: pa.Table) -> pa.Table:
    """One row per tag: the (ts, value)-max row of the batch."""
    batch = batch.sort_by([(TS.TS_US, "descending"), (TS.VALUE, "descending")])
    out = batch.group_by([TS.TAG], use_threads=False).aggregate(
        [("ts_us", "first"), ("Status", "first"), ("Value", "first")]
    )
    return out.rename_columns([TS.TAG, TS.TS_US, TS.STATUS, TS.VALUE])


def _partials(batch: pa.Table) -> pa.Table:
    empty = pa.table(
        {
            TS.TAG: pa.array([], pa.string()),
            TS.TS_US: pa.array([], pa.int64()),
            TS.STATUS: pa.array([], pa.string()),
            TS.VALUE: pa.array([], pa.float64()),
            "good_ts": pa.array([], pa.int64()),
            "good_val": pa.array([], pa.float64()),
        }
    )
    if len(batch) == 0:
        return empty
    top = _argmax_rows(batch)
    good = batch.filter(pc.not_equal(batch[TS.STATUS], "Bad"))
    if len(good):
        g = _argmax_rows(good).select([TS.TAG, TS.TS_US, TS.VALUE])
        g = g.rename_columns([TS.TAG, "good_ts", "good_val"])
        top = top.join(g, keys=[TS.TAG], join_type="left outer")
    else:
        top = top.append_column("good_ts", pa.nulls(len(top), pa.int64()))
        top = top.append_column("good_val", pa.nulls(len(top), pa.float64()))
    return top.select(empty.column_names)


def _merge(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values([TS.TS_US, TS.VALUE], ascending=False, kind="mergesort")
    top = g.iloc[0]
    gg = g.dropna(subset=["good_ts"]).sort_values(
        ["good_ts", "good_val"], ascending=False, kind="mergesort"
    )
    if len(gg):
        good_ts = np.int64(gg["good_ts"].iloc[0]).astype("datetime64[us]")
        good_val = float(gg["good_val"].iloc[0])
    else:
        good_ts, good_val = np.datetime64("NaT", "us"), float("nan")
    return pd.DataFrame(
        {
            "TagName": [top[TS.TAG]],
            "EventTime": [np.int64(top[TS.TS_US]).astype("datetime64[us]")],
            "Status": [top[TS.STATUS]],
            "Value": [float(top[TS.VALUE])],
            "GoodEventTime": [good_ts],
            "GoodValue": [good_val],
        }
    )


def latest(
    source: str | ray.data.Dataset,
    *,
    tags: list[str] | None = None,
    spec: SeriesSpec = EVENTS_SPEC,
    display_tz: str | None = None,
) -> ray.data.Dataset:
    """``display_tz`` must be an explicit "+HH:MM" offset here — latest has
    no query start date to infer from (the reference takes the zone from the
    query parameters)."""
    ds = read_events(source, spec) if isinstance(source, str) else source
    ds = normalize(ds, spec, tags=tags)
    partials = ds.map_batches(_partials, batch_format="pyarrow")
    from .common import apply_display_tz, grouped_map

    out = grouped_map(partials, [TS.TAG], _merge)
    if display_tz is not None:
        out = apply_display_tz(out, "2000-01-01T00:00:00", display_tz)
    return out
