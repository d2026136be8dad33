from .time_series_query_builder import TimeSeriesQueryBuilder
from . import (
    batch,
    circular_average,
    circular_standard_deviation,
    interpolate,
    interpolation_at_time,
    latest,
    metadata,
    plot,
    raw,
    resample,
    summary,
    time_weighted_average,
)

__all__ = [
    "TimeSeriesQueryBuilder",
    "batch", "circular_average", "circular_standard_deviation",
    "interpolate", "interpolation_at_time", "latest", "metadata", "plot",
    "raw", "resample", "summary", "time_weighted_average",
]
