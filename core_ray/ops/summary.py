"""``summary`` query: per-tag stats over the time range.

Reference semantics: ``_summary_query`` / ``_build_summary_query``
(``_time_series_query_builder.py:304-382,1722-1814``): Count, Avg, Min, Max,
StDev, Sum, Var per TagName (reference casts to decimal(10,2); we round to the
engine-wide 4 decimals).  StDev/Var are SAMPLE statistics (ddof=1), matching
both Spark's ``stddev``/``variance`` and DuckDB's defaults.

Scale design: per-batch moment partials (count, sum, sum of squares, min, max)
inside ``map_batches``; the shuffle moves one row per tag per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .common import TS, EVENTS_SPEC, SeriesSpec, normalize, read_events, round4, ts_to_us


def _partials(batch: pa.Table) -> pa.Table:
    if len(batch) == 0:
        return pa.table(
            {
                TS.TAG: pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "vsum": pa.array([], pa.float64()),
                "vsq": pa.array([], pa.float64()),
                "vmin": pa.array([], pa.float64()),
                "vmax": pa.array([], pa.float64()),
            }
        )
    v = batch[TS.VALUE]
    batch = batch.append_column("v2", pa.array(np.square(v.to_numpy())))
    out = batch.group_by([TS.TAG], use_threads=False).aggregate(
        [("Value", "count"), ("Value", "sum"), ("v2", "sum"), ("Value", "min"), ("Value", "max")]
    )
    return out.rename_columns([TS.TAG, "cnt", "vsum", "vsq", "vmin", "vmax"])


def _merge(g: pd.DataFrame) -> pd.DataFrame:
    n = int(g["cnt"].sum())
    s = float(g["vsum"].sum())
    sq = float(g["vsq"].sum())
    mean = s / n
    var = (sq - n * mean * mean) / (n - 1) if n > 1 else np.nan
    var = max(var, 0.0) if not np.isnan(var) else var
    return pd.DataFrame(
        {
            "TagName": [g[TS.TAG].iloc[0]],
            "Count": [float(n)],
            "Avg": round4(mean),
            "Min": [float(g["vmin"].min())],
            "Max": [float(g["vmax"].max())],
            "StDev": round4(np.sqrt(var)),
            "Sum": round4(s),
            "Var": round4(var),
        }
    )


def summary(
    source: str | ray.data.Dataset,
    *,
    start: str,
    end: str,
    tags: list[str] | None = None,
    include_bad: bool = True,
    spec: SeriesSpec = EVENTS_SPEC,
) -> ray.data.Dataset:
    ds = read_events(source, spec) if isinstance(source, str) else source
    ds = normalize(
        ds, spec, start_us=ts_to_us(start), end_us=ts_to_us(end), tags=tags, include_bad=include_bad
    )
    partials = ds.map_batches(_partials, batch_format="pyarrow")
    from .common import grouped_map

    return grouped_map(partials, [TS.TAG], _merge)
