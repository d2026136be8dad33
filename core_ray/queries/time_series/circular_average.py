"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
circular average query (reference ``queries/time_series/circular_average.py``)."""

from ._impl import circular_average_get as get

__all__ = ["get"]
