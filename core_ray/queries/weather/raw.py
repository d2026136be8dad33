"""Reference-parity ``get_grid`` / ``get_point`` parameter-dict wrappers for
raw weather forecast queries (reference ``queries/weather/raw.py:20,81``),
facades over :class:`WeatherQueryBuilder`.

A "connection" in the reference is a SQL warehouse handle; here the ambient
Ray session plays that role, so the leading connection argument is accepted
and ignored for drop-in call-site compatibility.  ``parameters_dict`` uses
the reference's names: ``source``, ``start_date``, ``end_date``,
``forecast_run_start_date``, ``forecast_run_end_date``,
``timestamp_column`` (default ``EventTime``),
``forecast_run_timestamp_column`` (default ``EnqueuedTime``), ``lat``/``lon``
(point) or ``min_lat``/``min_lon``/``max_lat``/``max_lon`` (grid),
``measurement``, ``limit``.
"""

from __future__ import annotations

from .weather_query_builder import WeatherQueryBuilder


def _builder(p: dict) -> WeatherQueryBuilder:
    b = WeatherQueryBuilder().connect()
    return b.source(
        p["source"],
        tagname_column=p.get("tagname_column", "TagName"),
        timestamp_column=p.get("timestamp_column", "EventTime"),
        forecast_run_timestamp_column=p.get(
            "forecast_run_timestamp_column", "EnqueuedTime"
        ),
        status_column=p.get("status_column", "Status"),
        value_column=p.get("value_column", "Value"),
        latitude_column=p.get("latitude_column", "Latitude"),
        longitude_column=p.get("longitude_column", "Longitude"),
    )


def get_grid(connection: object, parameters_dict: dict | None = None):
    """Raw weather forecast rows inside a strict lat/lon box (reference
    ``raw.py:20``: ``raw_grid`` SQL arm)."""
    p = parameters_dict if parameters_dict is not None else connection
    return _builder(p).raw_grid(
        start_date=p["start_date"],
        end_date=p["end_date"],
        forecast_run_start_date=p["forecast_run_start_date"],
        forecast_run_end_date=p["forecast_run_end_date"],
        min_lat=p["min_lat"],
        min_lon=p["min_lon"],
        max_lat=p["max_lat"],
        max_lon=p["max_lon"],
        limit=p.get("limit"),
        measurement=p.get("measurement"),
    )


def get_point(connection: object, parameters_dict: dict | None = None):
    """Raw weather forecast rows at an exact lat/lon point (reference
    ``raw.py:81``: ``raw_point`` SQL arm)."""
    p = parameters_dict if parameters_dict is not None else connection
    return _builder(p).raw_point(
        start_date=p["start_date"],
        end_date=p["end_date"],
        forecast_run_start_date=p["forecast_run_start_date"],
        forecast_run_end_date=p["forecast_run_end_date"],
        lat=p["lat"],
        lon=p["lon"],
        limit=p.get("limit"),
        measurement=p.get("measurement"),
    )


__all__ = ["get_grid", "get_point"]
