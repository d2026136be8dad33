"""Reference-parity ``get(connection, parameters_dict)`` wrapper for the
plot query (reference ``queries/time_series/plot.py``)."""

from ._impl import plot_get as get

__all__ = ["get"]
