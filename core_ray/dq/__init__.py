"""Data-quality operators (reference ``pipelines/data_quality/`` —
SURVEY.md §2.6 manipulation + §2.7 monitoring), re-expressed Ray-Data-first.

Manipulation operators return a filtered/transformed Dataset; monitoring
operators return a Dataset of findings (log-record analog)."""

from .manipulation import (
    duplicate_detection,
    interval_filtering,
    k_sigma_anomaly_filter,
    mad_anomaly_filter,
    out_of_range_filter,
    flatline_filter,
    missing_value_imputation,
    gaussian_smoothing,
    normalize,
    denormalize,
)
from .reduction import dimensionality_reduction, identify_missing_data_pattern
from .monitoring import (
    check_value_ranges,
    flatline_detection,
    identify_missing_intervals,
    moving_average,
    cusum_detection,
)
from .forecasting import (
    arima_forecast,
    holt_forecast,
    seasonal_decompose,
    data_binning,
    knn_regressor,
    linear_regression,
)

__all__ = [
    "duplicate_detection",
    "interval_filtering",
    "k_sigma_anomaly_filter",
    "mad_anomaly_filter",
    "out_of_range_filter",
    "flatline_filter",
    "missing_value_imputation",
    "gaussian_smoothing",
    "normalize",
    "denormalize",
    "check_value_ranges",
    "cusum_detection",
    "flatline_detection",
    "identify_missing_intervals",
    "moving_average",
    "dimensionality_reduction",
    "identify_missing_data_pattern",
    "linear_regression",
    "arima_forecast",
    "holt_forecast",
    "seasonal_decompose",
    "data_binning",
    "knn_regressor",
]
