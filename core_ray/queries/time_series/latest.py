"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
latest query (reference ``queries/time_series/latest.py``)."""

from ._impl import latest_get as get

__all__ = ["get"]
