"""``plot`` query: OHLC-style decimation per (TagName, bucket).

Reference semantics: ``_plot_query`` (``_time_series_query_builder.py:
800-855,1045-1188``): per tag and tumbling bucket emit the min, max, first and
last **Good** values plus the first **Bad** ("Exception") value, then UNPIVOT
to long rows ``(TagName, EventTime, Aggregation, Value)``.  Buckets are
start-aligned like resample.  Rows whose aggregate has no input (e.g. no Bad
event in the bucket) are omitted, matching UNPIVOT's NULL-dropping.

Scale design: reuses the resample partial-aggregate pattern — Good and Bad
rows produce separate per-batch partials; the shuffle moves partials only.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..schema import interval_us
from .common import TS, EVENTS_SPEC, SeriesSpec, normalize, read_events, round4, ts_to_us
from .resample import merge_partials, partial_window_aggregates, _empty_partials


def _partials(start_us: int, ival: int):
    base = partial_window_aggregates(start_us, ival)

    def fn(batch: pa.Table) -> pa.Table:
        good_mask = pc.not_equal(batch[TS.STATUS], "Bad")
        good = base(batch.filter(good_mask))
        bad = base(batch.filter(pc.invert(good_mask)))
        good = good.append_column("is_bad", pa.array([False] * len(good), pa.bool_()))
        bad = bad.append_column("is_bad", pa.array([True] * len(bad), pa.bool_()))
        return pa.concat_tables([good, bad])

    return fn


def _finalize(g: pd.DataFrame) -> pd.DataFrame:
    tag = g[TS.TAG].iloc[0]
    parts = []
    good = g[~g["is_bad"]]
    if len(good):
        m = merge_partials(good)
        m = m.rename(columns={"vmin": "Min", "vmax": "Max", "vfirst": "First", "vlast": "Last"})
        parts.append(
            m.melt(
                id_vars=["ws"],
                value_vars=["Min", "Max", "First", "Last"],
                var_name="Aggregation",
                value_name="Value",
            )
        )
    bad = g[g["is_bad"]]
    if len(bad):
        m = merge_partials(bad)[["ws", "vfirst"]].rename(columns={"vfirst": "Value"})
        m["Aggregation"] = "Exception"
        parts.append(m[["ws", "Aggregation", "Value"]])
    if not parts:
        return pd.DataFrame(
            {"TagName": [], "EventTime": pd.array([], dtype="datetime64[us]"),
             "Aggregation": [], "Value": []}
        )
    out = pd.concat(parts, ignore_index=True)
    out["Value"] = round4(out["Value"])
    out.insert(0, "TagName", tag)
    out["EventTime"] = out["ws"].astype("datetime64[us]")
    return out[["TagName", "EventTime", "Aggregation", "Value"]]


def plot(
    source: str | ray.data.Dataset,
    *,
    start: str,
    end: str,
    rate: int | float,
    unit: str = "minute",
    tags: list[str] | None = None,
    spec: SeriesSpec = EVENTS_SPEC,
    display_tz: str | None = None,
) -> ray.data.Dataset:
    start_us, end_us = ts_to_us(start), ts_to_us(end)
    ival = interval_us(rate, unit)
    ds = read_events(source, spec) if isinstance(source, str) else source
    ds = normalize(ds, spec, start_us=start_us, end_us=end_us, tags=tags)
    partials = ds.map_batches(_partials(start_us, ival), batch_format="pyarrow")
    from .common import apply_display_tz, grouped_map

    out = grouped_map(partials, [TS.TAG], _finalize)
    if display_tz is not None:
        out = apply_display_tz(out, start, display_tz)
    return out
