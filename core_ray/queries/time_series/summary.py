"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
summary query (reference ``queries/time_series/summary.py``)."""

from ._impl import summary_get as get

__all__ = ["get"]
