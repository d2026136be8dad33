"""Fluent weather query builder (reference
``queries/weather/weather_query_builder.py:39-343``): ``connect`` ->
``source`` -> ``raw_point`` / ``latest_point`` / ``raw_grid`` /
``latest_grid`` with the reference's parameter names, as a facade over
``core_ray/sources/weather.py``.

Semantics mirrored from the reference SQL
(``_weather_query_builder.py:79-104``): point queries match lat/lon exactly,
grid queries use STRICT bounds (``lat > min AND lat < max``), raw queries
filter both the valid timestamp and the forecast-run timestamp ranges, and
``measurement`` filters the tag column by suffix.  Results are lazy
Datasets (pandas when ``limit`` is set).
"""

from __future__ import annotations

from typing import Union

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ...ops import paginate
from ...ops.common import ts_to_us
from ...sources.weather import weather_latest, weather_raw
from .._dates import parse_query_date


def _start_us(dt) -> int:
    return ts_to_us(parse_query_date(dt))


def _end_us(dt) -> int:
    return ts_to_us(parse_query_date(dt, is_end_date=True))


class WeatherQueryBuilder:
    def __init__(self):
        self.connection = None
        self.data_source = None
        self.tagname_column = "TagName"
        self.timestamp_column = "EventTime"
        self.forecast_run_timestamp_column = "EnqueuedTime"
        self.status_column: Union[str, None] = "Status"
        self.value_column = "Value"
        self.latitude_column = "Latitude"
        self.longitude_column = "Longitude"

    def connect(self, connection=None):
        self.connection = connection
        return self

    def source(
        self,
        source,
        tagname_column: str = "TagName",
        timestamp_column: str = "EventTime",
        forecast_run_timestamp_column: str = "EnqueuedTime",
        status_column: Union[str, None] = "Status",
        value_column: str = "Value",
        latitude_column: str = "Latitude",
        longitude_column: str = "Longitude",
    ):
        self.data_source = source
        self.tagname_column = tagname_column
        self.timestamp_column = timestamp_column
        self.forecast_run_timestamp_column = forecast_run_timestamp_column
        self.status_column = status_column
        self.value_column = value_column
        self.latitude_column = latitude_column
        self.longitude_column = longitude_column
        return self

    def _ds(self) -> ray.data.Dataset:
        src = self.data_source
        if src is None:
            raise ValueError("source is required")
        if isinstance(src, str):
            return ray.data.read_parquet(src)
        return src

    def _measurement_filter(self, ds: ray.data.Dataset, measurement: str | None):
        if measurement is None:
            return ds
        col = self.tagname_column
        pat = f"%_{measurement}"

        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.match_like(t[col], pat))

        return ds.map_batches(fn, batch_format="pyarrow")

    def _finish(self, ds, limit: int | None, sort_cols: list[str]):
        if limit is not None:
            return paginate(ds, sort_cols, limit=int(limit))
        return ds.sort(sort_cols)

    def _sort_cols(self, ds) -> list[str]:
        names = set(ds.schema().names)
        if self.tagname_column in names:
            return [self.tagname_column]
        ordered = [self.latitude_column, self.longitude_column, self.timestamp_column]
        return [c for c in ordered if c in names] or list(sorted(names))[:1]

    def raw_point(
        self,
        start_date: str,
        end_date: str,
        forecast_run_start_date: str,
        forecast_run_end_date: str,
        lat: float,
        lon: float,
        limit: int | None = None,
        measurement: str | None = None,
    ):
        ds = weather_raw(
            self._ds(),
            start_us=_start_us(start_date),
            end_us=_end_us(end_date),
            ts_col=self.timestamp_column,
            run_col=self.forecast_run_timestamp_column,
            run_start_us=_start_us(forecast_run_start_date),
            run_end_us=_end_us(forecast_run_end_date),
            lat_col=self.latitude_column,
            lon_col=self.longitude_column,
            point=(lat, lon),
        )
        ds = self._measurement_filter(ds, measurement)
        return self._finish(ds, limit, self._sort_cols(ds))

    def raw_grid(
        self,
        start_date: str,
        end_date: str,
        forecast_run_start_date: str,
        forecast_run_end_date: str,
        min_lat: float,
        min_lon: float,
        max_lat: float,
        max_lon: float,
        limit: int | None = None,
        measurement: str | None = None,
    ):
        ds = weather_raw(
            self._ds(),
            start_us=_start_us(start_date),
            end_us=_end_us(end_date),
            ts_col=self.timestamp_column,
            run_col=self.forecast_run_timestamp_column,
            run_start_us=_start_us(forecast_run_start_date),
            run_end_us=_end_us(forecast_run_end_date),
            lat_col=self.latitude_column,
            lon_col=self.longitude_column,
            box=(min_lat, max_lat, min_lon, max_lon),
            strict_box=True,
        )
        ds = self._measurement_filter(ds, measurement)
        return self._finish(ds, limit, self._sort_cols(ds))

    def latest_point(
        self, lat: float, lon: float, limit: int | None = None, measurement: str | None = None
    ):
        # measurement is a WHERE predicate in the reference SQL — it must
        # restrict the rows BEFORE the latest-per-cell reduction
        ds = weather_latest(
            self._measurement_filter(self._ds(), measurement),
            key_cols=[self.latitude_column, self.longitude_column],
            ts_col=self.timestamp_column,
            lat_col=self.latitude_column,
            lon_col=self.longitude_column,
            point=(lat, lon),
        )
        return self._finish(ds, limit, self._sort_cols(ds))

    def latest_grid(
        self,
        min_lat: float,
        min_lon: float,
        max_lat: float,
        max_lon: float,
        limit: int | None = None,
        measurement: str | None = None,
    ):
        ds = weather_latest(
            self._measurement_filter(self._ds(), measurement),
            key_cols=[self.latitude_column, self.longitude_column],
            ts_col=self.timestamp_column,
            lat_col=self.latitude_column,
            lon_col=self.longitude_column,
            box=(min_lat, max_lat, min_lon, max_lon),
            strict_box=True,
        )
        return self._finish(ds, limit, self._sort_cols(ds))
