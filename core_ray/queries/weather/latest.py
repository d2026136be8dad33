"""Reference-parity ``get_grid`` / ``get_point`` parameter-dict wrappers for
latest-forecast weather queries (reference ``queries/weather/latest.py:20,72``),
facades over :class:`WeatherQueryBuilder`.  Same conventions as
:mod:`core_ray.queries.weather.raw`."""

from __future__ import annotations

from .raw import _builder


def get_grid(connection: object, parameters_dict: dict | None = None):
    """Latest forecast per grid cell inside a strict lat/lon box (reference
    ``latest.py:20``: ``latest_grid`` SQL arm)."""
    p = parameters_dict if parameters_dict is not None else connection
    return _builder(p).latest_grid(
        min_lat=p["min_lat"],
        min_lon=p["min_lon"],
        max_lat=p["max_lat"],
        max_lon=p["max_lon"],
        limit=p.get("limit"),
        measurement=p.get("measurement"),
    )


def get_point(connection: object, parameters_dict: dict | None = None):
    """Latest forecast at an exact lat/lon point (reference ``latest.py:72``:
    ``latest_point`` SQL arm)."""
    p = parameters_dict if parameters_dict is not None else connection
    return _builder(p).latest_point(
        lat=p["lat"],
        lon=p["lon"],
        limit=p.get("limit"),
        measurement=p.get("measurement"),
    )


__all__ = ["get_grid", "get_point"]
