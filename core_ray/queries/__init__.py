"""Public query API surface (reference ``queries/``): the fluent
``TimeSeriesQueryBuilder`` plus per-query ``get(connection,
parameters_dict)`` modules, all facades over ``core_ray/ops``."""

from .sql import SQLQueryBuilder
from .time_series import TimeSeriesQueryBuilder
from .weather import WeatherQueryBuilder

__all__ = ["SQLQueryBuilder", "TimeSeriesQueryBuilder", "WeatherQueryBuilder"]
