"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
time weighted average query (reference ``queries/time_series/time_weighted_average.py``)."""

from ._impl import time_weighted_average_get as get

__all__ = ["get"]
