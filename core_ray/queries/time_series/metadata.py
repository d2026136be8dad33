"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
metadata query (reference ``queries/metadata.py:20``; also reachable here so
``queries.time_series`` carries the full op set)."""

from ._impl import metadata_get as get

__all__ = ["get"]
