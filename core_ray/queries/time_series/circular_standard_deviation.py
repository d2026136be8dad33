"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
circular standard deviation query (reference ``queries/time_series/circular_standard_deviation.py``)."""

from ._impl import circular_standard_deviation_get as get

__all__ = ["get"]
