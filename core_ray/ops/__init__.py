"""Time-series query operators (Ray-Data-native re-expressions of the
reference's SQL query semantics — reference
``queries/time_series/_time_series_query_builder.py``)."""

from .common import TS, SeriesSpec, normalize, ts_to_us
from .raw import raw
from .resample import resample
from .summary import summary
from .latest import latest
from .plot import plot
from .interpolate import interpolate, interpolation_at_time
from .twa import time_weighted_average
from .circular import circular_average, circular_stddev
from .output import pivot, unpivot, uom_join, to_json_rows, paginate, metadata_table
from .write import write_partitioned_resumable

__all__ = [
    "TS",
    "SeriesSpec",
    "normalize",
    "ts_to_us",
    "raw",
    "resample",
    "summary",
    "latest",
    "plot",
    "interpolate",
    "interpolation_at_time",
    "time_weighted_average",
    "circular_average",
    "circular_stddev",
    "pivot",
    "unpivot",
    "uom_join",
    "metadata_table",
    "to_json_rows",
    "paginate",
    "write_partitioned_resumable",
]
