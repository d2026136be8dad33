"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
resample query (reference ``queries/time_series/resample.py``)."""

from ._impl import resample_get as get

__all__ = ["get"]
