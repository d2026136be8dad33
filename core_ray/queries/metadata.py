"""Reference-parity top-level metadata query module (reference
``queries/metadata.py:20`` exposes ``get(connection, parameters_dict)`` at the
package top level, beside the ``time_series``/``weather``/``sql`` subpackages).
"""

from .time_series._impl import metadata_get as get

__all__ = ["get"]
