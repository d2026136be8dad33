"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
raw query (reference ``queries/time_series/raw.py``)."""

from ._impl import raw_get as get

__all__ = ["get"]
