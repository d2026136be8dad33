"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
batch query (reference ``queries/time_series/batch.py``)."""

from ._impl import batch_get as get

__all__ = ["get"]
