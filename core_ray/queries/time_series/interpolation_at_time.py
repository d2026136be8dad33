"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
interpolation at time query (reference ``queries/time_series/interpolation_at_time.py``)."""

from ._impl import interpolation_at_time_get as get

__all__ = ["get"]
