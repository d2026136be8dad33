"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
interpolate query (reference ``queries/time_series/interpolate.py``)."""

from ._impl import interpolate_get as get

__all__ = ["get"]
