"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
metadata query (reference ``queries/time_series/metadata.py``)."""

from ._impl import metadata_get as get

__all__ = ["get"]
