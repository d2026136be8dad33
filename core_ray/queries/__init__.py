"""Public query API surface (reference ``queries/``): the fluent
``TimeSeriesQueryBuilder`` plus per-query ``get(connection,
parameters_dict)`` modules, all facades over ``core_ray/ops``."""

from .time_series import TimeSeriesQueryBuilder

__all__ = ["TimeSeriesQueryBuilder"]
