"""Weather query variants (reference
``queries/weather/_weather_query_builder.py:79-186`` — SURVEY.md §2.1/§2.3):
raw and latest over forecast tables with lat/lon POINT or GRID-BOX predicates,
as vectorized filter ``map_batches``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _geo_filter(
    ds: ray.data.Dataset,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    point: tuple[float, float] | None = None,
    box: tuple[float, float, float, float] | None = None,  # (lat_min, lat_max, lon_min, lon_max)
    strict_box: bool = False,
    tol: float = 1e-6,
) -> ray.data.Dataset:
    """``strict_box=True`` uses exclusive bounds — the reference's grid SQL
    is ``lat > min AND lat < max`` (``_weather_query_builder.py:89-92``)."""

    def fn(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy()
        lon = batch[lon_col].to_numpy()
        if point is not None:
            mask = (np.abs(lat - point[0]) <= tol) & (np.abs(lon - point[1]) <= tol)
        elif box is not None:
            la0, la1, lo0, lo1 = box
            if strict_box:
                mask = (lat > la0) & (lat < la1) & (lon > lo0) & (lon < lo1)
            else:
                mask = (lat >= la0) & (lat <= la1) & (lon >= lo0) & (lon <= lo1)
        else:
            mask = np.ones(len(lat), dtype=bool)
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def _ts_between(
    ds: ray.data.Dataset, col: str, start_us: int | None, end_us: int | None
) -> ray.data.Dataset:
    if start_us is None and end_us is None:
        return ds

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch[col], pa.timestamp("us")), pa.int64())
        mask = None
        if start_us is not None:
            mask = pc.greater_equal(t, start_us)
        if end_us is not None:
            m2 = pc.less_equal(t, end_us)
            mask = m2 if mask is None else pc.and_(mask, m2)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def weather_raw(
    ds: ray.data.Dataset,
    *,
    start_us: int | None = None,
    end_us: int | None = None,
    ts_col: str = "forecast_time",
    run_col: str | None = None,
    run_start_us: int | None = None,
    run_end_us: int | None = None,
    **geo,
) -> ray.data.Dataset:
    """Raw forecast slice with time + forecast-run-time + point/box
    predicates (reference raw point/grid WHERE clauses,
    ``_weather_query_builder.py:87-92``)."""
    ds = _geo_filter(ds, **geo)
    ds = _ts_between(ds, ts_col, start_us, end_us)
    if run_col is not None:
        ds = _ts_between(ds, run_col, run_start_us, run_end_us)
    return ds


def weather_latest(
    ds: ray.data.Dataset,
    *,
    key_cols: list[str] = ("lat", "lon"),
    ts_col: str = "forecast_time",
    **geo,
) -> ray.data.Dataset:
    """Most recent forecast row per grid cell within the point/box filter."""
    import pandas as pd

    from ..ops.common import grouped_map

    ds = _geo_filter(ds, **geo)

    def latest_row(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(ts_col, kind="mergesort").tail(1)

    return grouped_map(ds, list(key_cols), latest_row)
